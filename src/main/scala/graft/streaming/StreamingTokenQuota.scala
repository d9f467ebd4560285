package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming token-budget admission — per-key ingestion quota ("this
  * tenant/source gets N tokens"): admit each document if its tokens
  * still fit the key's remaining budget, in EVENT-TIME order,
  * first-fit (a rejected document consumes nothing, so a later smaller
  * one can still fit — quota admission, not q110's selection-prefix
  * rule). Arrival order must NOT decide who gets the budget —
  * out-of-order delivery is routine — so admission waits for the
  * watermark and replays each key's rows in (ts, id) order. The
  * admitted set is therefore a pure function of the event-time order,
  * identical under ANY batching, for every row that arrives ahead of
  * the watermark — the spec pins that determinism against a local fold
  * reference.
  *
  * Watermark-GAP rows (the same caveat StreamingAsofJoin documents for
  * late probes): a row whose ts is at-or-under the current eviction
  * watermark but past the previous batch's late-filter cut is not
  * dropped — its (already-expired) timer fires and it folds in (ts, id)
  * order among that firing's due rows — but rows with LATER event
  * times admitted in earlier batches have already consumed budget, and
  * those emissions cannot be recalled. A gap row is therefore admitted
  * against the budget REMAINING at its fold point, not the budget it
  * would have seen under total event-time order; which rows land in
  * the gap depends on batch placement. This is the one
  * batching-dependent edge — inherent to emitting admissions eagerly
  * while accepting sub-watermark input instead of dropping it.
  *
  * State per key: ONE running total (the fold survives forever — a
  * closed quota stays closed) plus the in-flight rows still inside the
  * watermark delay and their emission timers. O(delay x rate), not
  * O(history) — the same compaction discipline as the temporal join.
  */
object StreamingTokenQuota {

  case class Doc(key: String, doc_id: Long, ts: Timestamp, n_tokens: Long)
  case class Buffered(doc_id: Long, tsMs: Long, n: Long)
  case class Admitted(key: String, doc_id: Long, ts: Timestamp,
      n_tokens: Long, cum_tokens: Long)

  class QuotaProcessor(budget: Long)
      extends StatefulProcessor[String, Doc, Admitted] {
    @transient private var total: ValueState[Long] = _
    @transient private var pending: ListState[Buffered] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, TTLConfig.NONE)
      pending = getHandle.getListState[Buffered](
        "pending", Encoders.product[Buffered], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Doc],
        timers: TimerValues): Iterator[Admitted] = {
      rows.foreach { d =>
        pending.appendValue(Buffered(d.doc_id, d.ts.getTime, d.n_tokens))
        getHandle.registerTimer(d.ts.getTime)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Admitted] = {
      val wm = expired.getExpiryTimeInMs()
      val (due, still) = pending.get().toList.partition(_.tsMs <= wm)
      if (still.isEmpty) pending.clear() else pending.put(still.toArray)
      var cum = if (total.exists()) total.get() else 0L
      val out = due.sortBy(b => (b.tsMs, b.doc_id)).flatMap { b =>
        // the q110 prefix rule, keyed: inclusive-cum must fit the budget;
        // a rejected doc still ADVANCES nothing (its tokens are not
        // consumed), so later smaller docs can still fit — quota
        // admission, not packing
        if (cum + b.n <= budget) {
          cum += b.n
          Some(Admitted(key, b.doc_id, new Timestamp(b.tsMs), b.n, cum))
        } else None
      }
      total.update(cum)
      out.iterator
    }
  }

  def admit(spark: SparkSession, docs: Dataset[Doc], budgetTokens: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Admitted] = {
    import spark.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(new QuotaProcessor(budgetTokens),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
