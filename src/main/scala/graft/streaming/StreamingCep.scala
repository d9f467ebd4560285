package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.operators.Cep.CepStep

/** Streaming GENERALIZED CEP with negation — the event-time dual of
  * [[graft.operators.Cep.matchPattern]]: per user, match a declarative
  * pattern of positive steps with per-gap veto types ("A then B without
  * C in W"), emitting a match the moment it is FINAL under the
  * watermark. [[StreamingFunnel]] covers the linear all-positive case;
  * this adds arbitrary step chains with negation, which an arrival-order
  * fold cannot get right at all: a LATE-arriving veto event (the C in
  * "without C") must retract a completion that a naive fold would
  * already have emitted.
  *
  * Same finality discipline as the funnel: every relevant event buffers
  * in keyed state and arms an event-time timer at its own timestamp;
  * when the watermark passes, due events fold IN EVENT-TIME ORDER into
  * the user's open matches. Because every pattern comparison is a
  * STRICT inequality (next step strictly after the previous; vetoes
  * strictly inside the gap), equal-timestamp fold order cannot change
  * the outcome — the exact argument the batch operator's oracle makes.
  *
  * Fold semantics (mirrors the batch operator exactly):
  *  - a step-0 event OPENS a match (per-anchor: every anchor event
  *    matches independently);
  *  - an event of an open match's next expected type ADVANCES it if
  *    strictly after the previous step and within `windowHours` of the
  *    anchor — unless a veto event fell strictly before it inside the
  *    gap, which kills the match permanently (batch picks the earliest
  *    completion, then vetoes it: any later completion would have the
  *    same veto strictly inside);
  *  - an event of the gap's `without` set records the gap's earliest
  *    veto time;
  *  - a QUANTIFIED step (minReps/maxReps — Kleene) counts repetitions
  *    and completes at the minReps-th occurrence (veto checked against
  *    that completion time, so a late veto INSIDE the repetition run
  *    still retracts); after it completes, further occurrences of its
  *    type keep counting, and exceeding maxReps before the next step
  *    completes kills the match — the batch operator's ceiling rule;
  *  - a match whose window closes below the watermark is dropped (a
  *    cleanup timer at anchor+W guarantees this even for idle users).
  *
  * State is bounded: pending events above the watermark plus open
  * matches within their W-sized windows.
  */
object StreamingCep {

  case class CEv(user_id: Long, event_id: Long, event_type: String,
      ts: Timestamp)
  case class PendEv(eventId: Long, tpe: String, tsUs: Long)
  /** reps = occurrences folded into the CURRENT (quantified) step so
    * far; run = total occurrences of the PREVIOUS step's type since
    * that step's gap opened — the maxReps ceiling counter.
    */
  case class OpenM(anchorId: Long, stage: Int, times: Seq[Long],
      vetoUs: Long, reps: Int, run: Int)
  case class CepMatch(user_id: Long, anchor_id: Long, times_us: Seq[Long])

  private val NoVeto = Long.MinValue

  /** Full-microsecond event time (Timestamp.getTime truncates to ms;
    * batch compares epoch MICROS, and a strict inequality at sub-ms
    * distance must not collapse into a tie).
    */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  class CepProcessor(steps: Array[CepStep], windowUs: Long)
      extends StatefulProcessor[Long, CEv, CepMatch] {
    @transient private var pending: ListState[PendEv] = _
    @transient private var open: ListState[OpenM] = _

    private val relevant: Set[String] =
      steps.map(_.tpe).toSet ++ steps.flatMap(_.without)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[PendEv](
        "pending", Encoders.product[PendEv], TTLConfig.NONE)
      open = getHandle.getListState[OpenM](
        "open", Encoders.product[OpenM], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[CEv],
        timers: TimerValues): Iterator[CepMatch] = {
      rows.foreach { e =>
        if (relevant.contains(e.event_type)) {
          pending.appendValue(PendEv(e.event_id, e.event_type, micros(e.ts)))
          // finality timer at the event's own time (ms-ceiling so the
          // expiry watermark covers the full microsecond value); anchors
          // also arm a window-close cleanup timer
          val msCeil = (micros(e.ts) + 999L) / 1000L
          getHandle.registerTimer(msCeil)
          if (e.event_type == steps(0).tpe)
            getHandle.registerTimer(msCeil + windowUs / 1000L + 1L)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[CepMatch] = {
      val wmUs = expired.getExpiryTimeInMs() * 1000L
      val (due, later) = pending.get().toList.partition(_.tsUs <= wmUs)
      if (later.isEmpty) pending.clear() else pending.put(later.toArray)
      var opens = open.get().toList
      val out = scala.collection.mutable.ArrayBuffer.empty[CepMatch]
      // equal-timestamp fold order: EARLIER pattern steps first. Every
      // plain-step and veto comparison is strict, so tie order cannot
      // change those; the run-ceiling COUNT is the one tie-sensitive
      // quantity — batch's ceiling is strict (completion < the
      // (maxReps+1)-th occurrence, Cep.scala `col(cur) < col(c)`), so a
      // run event at the SAME timestamp as the next step's completion
      // must fold FIRST and blow the ceiling before the completion can
      // advance the match. Veto-only types (stepIdx −1) fold earliest,
      // which is inert: vetoes only ever compare strictly.
      def stepIdx(tpe: String): Int = steps.indexWhere(_.tpe == tpe)
      due.sortBy(e => (e.tsUs, stepIdx(e.tpe))).foreach { e =>
        opens = opens.flatMap { m =>
          if (e.tsUs > m.times.head + windowUs) None // window closed
          else {
            val gap = steps(m.stage)
            val prevStep = steps(m.stage - 1)
            val prev = m.times.last
            if (e.tpe == gap.tpe && e.tsUs > prev) {
              val newReps = m.reps + 1
              if (newReps < gap.minReps)
                Some(m.copy(reps = newReps)) // collecting repetitions
              else if (m.vetoUs != NoVeto && m.vetoUs < e.tsUs)
                None // earliest completion vetoed -> match dead
              else {
                val adv = m.copy(stage = m.stage + 1,
                  times = m.times :+ e.tsUs, vetoUs = NoVeto,
                  reps = 0, run = newReps)
                if (adv.stage == steps.length) {
                  out += CepMatch(key, adv.anchorId, adv.times)
                  None // completed
                } else Some(adv)
              }
            } else if (prevStep.maxReps.isDefined &&
                e.tpe == prevStep.tpe && e.tsUs > prev) {
              // the previous quantified step's run continues: blowing
              // its ceiling before this step completes kills the match
              val newRun = m.run + 1
              if (newRun > prevStep.maxReps.get) None
              else Some(m.copy(run = newRun))
            } else if (gap.without.contains(e.tpe) && e.tsUs > prev)
              Some(m.copy(vetoUs =
                if (m.vetoUs == NoVeto) e.tsUs else math.min(m.vetoUs, e.tsUs)))
            else Some(m)
          }
        }
        // per-anchor: every step-0 event opens its own match, including
        // one that just advanced an existing match of the same type
        if (e.tpe == steps(0).tpe)
          opens = OpenM(e.eventId, 1, Seq(e.tsUs), NoVeto, 0, 0) :: opens
      }
      // drop matches that can no longer complete: any completing event
      // must have ts <= anchor+W, and everything at or below wm has
      // already folded
      opens = opens.filter(_.times.head + windowUs > wmUs)
      if (opens.isEmpty) open.clear() else open.put(opens.toArray)
      out.iterator
    }
  }

  def detect(spark: SparkSession, events: Dataset[CEv],
      steps: Seq[CepStep], windowHours: Int = 24,
      watermarkDelay: String = "10 seconds"): Dataset[CepMatch] = {
    import spark.implicits._
    require(steps.size >= 2 && steps.head.without.isEmpty &&
      steps.head.minReps == 1 && steps.head.maxReps.isEmpty,
      s"bad pattern: $steps")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new CepProcessor(steps.toArray, windowHours * 3600L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
