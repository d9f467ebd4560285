package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming AS-OF join — the event-time streaming dual of
  * [[graft.operators.AsofJoin.asofJoin]] (unbounded lookback, inclusive):
  * every left probe is answered with the latest right row at-or-before its
  * timestamp, emitted only once the watermark passes the probe (so every
  * right row that could possibly be the answer has either arrived or been
  * declared late). This is the Flink-style temporal join Spark lacks; the
  * windowed [[StreamingAttribution]] is its bounded-lookback sibling.
  *
  * The state story is what makes unbounded lookback streamable at all:
  * buffering right-side history would grow without bound, but once the
  * watermark passes a right row, all STILL-ANSWERABLE probes have
  * timestamps beyond the watermark too — so of the rights at-or-under the
  * watermark, only the LATEST can ever be an answer again. State is
  * therefore one committed right VALUE per key plus the in-flight rows
  * still inside the watermark delay: O(delay x rate), not O(history),
  * exactly the compaction a temporal-table join runs.
  *
  * Late LEFT rows (ts already under the watermark when they arrive)
  * follow the standard late-data contract: Spark's watermark filter drops
  * them before they reach the operator. The processor still guards the
  * case defensively (answering immediately — the answer set of a
  * sub-watermark probe is already complete), because the filter's cut is
  * the PREVIOUS batch's watermark and rows can land in the gap.
  */
object StreamingAsofJoin {

  /** `side` 0 = right (reference rows), 1 = left (probe rows). */
  case class In(k: Long, side: Int, id: Long, ts: Timestamp)
  case class Buffered(id: Long, tsMs: Long)
  case class Matched(k: Long, left_id: Long, left_ts: Timestamp,
      right_id: Option[Long], right_ts: Option[Timestamp])

  class AsofProcessor extends StatefulProcessor[Long, In, Matched] {
    @transient private var committed: ValueState[Buffered] = _
    @transient private var pendingRights: ListState[Buffered] = _
    @transient private var pendingLefts: ListState[Buffered] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      committed = getHandle.getValueState[Buffered](
        "committed", Encoders.product[Buffered], TTLConfig.NONE)
      pendingRights = getHandle.getListState[Buffered](
        "rights", Encoders.product[Buffered], TTLConfig.NONE)
      pendingLefts = getHandle.getListState[Buffered](
        "lefts", Encoders.product[Buffered], TTLConfig.NONE)
    }

    /** Latest right at-or-before `tsMs` across committed + pending;
      * (ts, id) max makes equal-timestamp rights deterministic.
      */
    private def answer(tsMs: Long): Option[Buffered] = {
      val cands = (Option(committed.get()).toList ++ pendingRights.get())
        .filter(_.tsMs <= tsMs)
      if (cands.isEmpty) None else Some(cands.maxBy(b => (b.tsMs, b.id)))
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
        timers: TimerValues): Iterator[Matched] = {
      val wm = timers.getCurrentWatermarkInMs()
      val out = Seq.newBuilder[Matched]
      rows.foreach { r =>
        val b = Buffered(r.id, r.ts.getTime)
        if (r.side == 0) {
          pendingRights.appendValue(b)
          // compaction-only timer: a key that never sees another row would
          // otherwise keep this right in the pending list forever
          getHandle.registerTimer(b.tsMs + 1)
        } else if (b.tsMs <= wm) {
          // late probe: its answer set is already complete — answer now
          // (an emission timer at b.tsMs would already be expired)
          val m = answer(b.tsMs)
          out += Matched(key, b.id, new Timestamp(b.tsMs),
            m.map(_.id), m.map(x => new Timestamp(x.tsMs)))
        } else {
          pendingLefts.appendValue(b)
          getHandle.registerTimer(b.tsMs)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Matched] = {
      val wm = expired.getExpiryTimeInMs()
      // answer due probes BEFORE compacting: a due probe may need a right
      // that compaction is about to supersede
      val (due, stillPending) =
        pendingLefts.get().toList.partition(_.tsMs <= wm)
      if (stillPending.isEmpty) pendingLefts.clear()
      else pendingLefts.put(stillPending.toArray)
      val results = due.sortBy(b => (b.tsMs, b.id)).map { b =>
        val m = answer(b.tsMs)
        Matched(key, b.id, new Timestamp(b.tsMs),
          m.map(_.id), m.map(x => new Timestamp(x.tsMs)))
      }
      // compact: of the rights at-or-under the watermark, only the latest
      // can answer any future probe (future probes have ts > wm)
      val (settled, inFlight) =
        pendingRights.get().toList.partition(_.tsMs <= wm)
      if (settled.nonEmpty) {
        val latest = (settled ++ Option(committed.get()).toList)
          .maxBy(b => (b.tsMs, b.id))
        committed.update(latest)
        if (inFlight.isEmpty) pendingRights.clear()
        else pendingRights.put(inFlight.toArray)
      }
      results.iterator
    }
  }

  /** `watermarkDelay` bounds out-of-order arrival on BOTH sides (they
    * share the union stream's watermark).
    */
  def asofStream(spark: SparkSession, in: Dataset[In],
      watermarkDelay: String = "10 seconds"): Dataset[Matched] = {
    import spark.implicits._
    in.withWatermark("ts", watermarkDelay)
      .groupByKey(_.k)
      .transformWithState(new AsofProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
