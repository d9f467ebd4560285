package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming ORDERED-funnel detection — the event-time-correct streaming
  * dual of [[graft.operators.Relational.funnel]] and the engine's
  * CEP-class sequence matcher: per user, detect progression through
  * stage₁ → stage₂ → … with each step STRICTLY after the previous, and
  * emit an advancement record the moment it becomes FINAL.
  *
  * Why not advance on arrival order: at scale events arrive out of
  * order routinely, and an arrival-order fold would both miss
  * progressions (stage-2 event arriving before its stage-1 anchor) and
  * emit wrong anchors (a later-arriving EARLIER stage-1 event must win —
  * batch semantics anchor at the MINIMUM qualifying time). Instead every
  * stage event buffers in keyed state and arms an EVENT-TIME timer at
  * its own timestamp; when the watermark passes, all events at or below
  * it are final, and the processor folds them IN EVENT-TIME ORDER into
  * the user's (stage, t) progress — the same emit-on-watermark
  * discipline as [[StreamingAttribution]]. Within-watermark disorder
  * therefore cannot change the result (spec'd by delivering a stage-1
  * anchor one batch AFTER its stage-2 event).
  *
  * State is bounded: pending events above the watermark (watermark-delay
  * × per-user rate) plus one (stage, t) pair per user.
  */
object StreamingFunnel {

  case class FEv(user_id: Long, event_type: String, ts: Timestamp)
  case class PendingEv(tpe: String, tsMs: Long)
  case class Progress(stage: Int, tMs: Long)
  case class Advance(user_id: Long, stage: Int, event_type: String,
      ts: Timestamp, hours_from_prev: Option[Double])

  class FunnelProcessor(stages: Array[String])
      extends StatefulProcessor[Long, FEv, Advance] {
    @transient private var pending: ListState[PendingEv] = _
    @transient private var progress: ValueState[Progress] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[PendingEv](
        "pending", Encoders.product[PendingEv], TTLConfig.NONE)
      progress = getHandle.getValueState[Progress](
        "progress", Encoders.product[Progress], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[FEv],
        timers: TimerValues): Iterator[Advance] = {
      rows.foreach { e =>
        if (stages.contains(e.event_type)) {
          pending.appendValue(PendingEv(e.event_type, e.ts.getTime))
          // finality timer: fires once the watermark passes this event
          getHandle.registerTimer(e.ts.getTime)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Advance] = {
      val wm = expired.getExpiryTimeInMs()
      val (due, later) = pending.get().toList.partition(_.tsMs <= wm)
      if (later.isEmpty) pending.clear() else pending.put(later.toArray)
      var p = Option(progress.get()).getOrElse(Progress(0, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[Advance]
      // equal-ts order is irrelevant: an advance needs ts STRICTLY above
      // the previous stage's anchor, so at most one equal-ts event applies
      due.sortBy(_.tsMs).foreach { e =>
        if (p.stage < stages.length && e.tpe == stages(p.stage) &&
          (p.stage == 0 || e.tsMs > p.tMs)) {
          val hours = if (p.stage == 0) None
          else Some(((e.tsMs - p.tMs) / 1000L).toDouble / 3600.0)
          p = Progress(p.stage + 1, e.tsMs)
          out += Advance(key, p.stage, e.tpe, new Timestamp(e.tsMs), hours)
        }
      }
      progress.update(p)
      out.iterator
    }
  }

  def detect(spark: SparkSession, events: Dataset[FEv],
      stages: Seq[String] = Seq("signup", "view", "click", "purchase"),
      watermarkDelay: String = "10 seconds"): Dataset[Advance] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(stages.toArray),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
