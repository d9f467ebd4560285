package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig, TimerValues, ValueState}

/** Streaming threshold-crossing alerts — q94's large-volume-order detection
  * as a live monitor: emit an alert for an order THE MOMENT its running
  * line-quantity total crosses the threshold, exactly once per order, no
  * matter how its lines split across micro-batches.
  *
  * Why not a windowed aggregation: the quantity total isn't windowed (an
  * order's lines arrive over an unbounded span), and append-mode streaming
  * aggregations only emit on watermark close — a monitor must fire on the
  * CROSSING row. So this is the O11 per-record stateful escape hatch:
  * per-key ValueState holds (running total, already-alerted), rows fold
  * into it ONE AT A TIME on arrival, and the transition from below- to
  * above-threshold emits the single alert carrying the running total AT
  * the crossing row — so the payload is identical no matter where
  * micro-batch boundaries fall. (A whole-batch fold is not: lines
  * [6, 5, 100] against threshold 10 would report 111 when they share a
  * batch but 11 when [6, 5] and [100] split — per-row folding reports 11,
  * the total at the crossing row, under every batching.)
  *
  * State is two scalars per open order — bounded by live keys, not stream
  * history. The `ttl` parameter bounds it further for abandoned orders:
  * expiry trades state size for an at-most-once re-alert risk on a
  * post-expiry straggler line (the expired key folds from zero again).
  * TTL is processing-time-based, so a non-NONE ttl switches the processor
  * to `TimeMode.ProcessingTime`.
  */
object ThresholdAlerts {

  case class Line(l_orderkey: Long, l_quantity: Double)
  case class Alert(o_orderkey: Long, total_qty: Double)

  // NOT private: the state encoder's generated code must access the class
  // (a private case class forces a janino compile failure + interpreted
  // fallback on EVERY state update)
  case class Acc(total: Double, alerted: Boolean)

  class CrossingProcessor(threshold: Double, ttl: TTLConfig)
      extends StatefulProcessor[Long, Line, Alert] {
    @transient private var acc: ValueState[Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Acc]("acc", Encoders.product[Acc], ttl)

    override def handleInputRows(orderKey: Long, rows: Iterator[Line],
        timers: TimerValues): Iterator[Alert] = {
      val prev = if (acc.exists()) acc.get() else Acc(0.0, alerted = false)
      // fold row by row: the alert payload is the running total at the
      // FIRST crossing row, not the whole-batch fold — batch-boundary
      // placement must never change what the alert reports
      var total = prev.total
      var alerted = prev.alerted
      var fireAt = 0.0
      var fire = false
      rows.foreach { r =>
        total += r.l_quantity
        if (!alerted && total > threshold) {
          alerted = true; fire = true; fireAt = total
        }
      }
      acc.update(Acc(total, alerted))
      if (fire) Iterator.single(Alert(orderKey, fireAt)) else Iterator.empty
    }
  }

  /** Alerts for orders whose cumulative quantity exceeds `threshold`.
    * `ttl` expires idle per-order state (TTLConfig.NONE keeps it forever);
    * expiry re-arms the alert for that order — documented at-most-once.
    */
  def largeOrderAlerts(spark: SparkSession, lines: Dataset[Line],
      threshold: Double = 250.0,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Alert] = {
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    lines
      .groupByKey(_.l_orderkey)
      .transformWithState(new CrossingProcessor(threshold, ttl),
        timeMode, OutputMode.Append())
  }
}
