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
  * into it on arrival, and the transition from below- to above-threshold
  * emits the single alert. State is two scalars per open order — bounded
  * by live keys, not stream history; production would add a TTL for
  * abandoned orders (the TTLConfig hook below), which trades state for
  * the at-most-once re-alert risk on a post-expiry straggler line.
  */
object ThresholdAlerts {

  case class Line(l_orderkey: Long, l_quantity: Double)
  case class Alert(o_orderkey: Long, total_qty: Double)

  private case class Acc(total: Double, alerted: Boolean)

  class CrossingProcessor(threshold: Double)
      extends StatefulProcessor[Long, Line, Alert] {
    @transient private var acc: ValueState[Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Acc]("acc", Encoders.product[Acc],
        TTLConfig.NONE)

    override def handleInputRows(orderKey: Long, rows: Iterator[Line],
        timers: TimerValues): Iterator[Alert] = {
      val prev = if (acc.exists()) acc.get() else Acc(0.0, alerted = false)
      val total = prev.total + rows.map(_.l_quantity).sum
      val crossed = !prev.alerted && total > threshold
      acc.update(Acc(total, prev.alerted || crossed))
      if (crossed) Iterator.single(Alert(orderKey, total)) else Iterator.empty
    }
  }

  /** Alerts for orders whose cumulative quantity exceeds `threshold`. */
  def largeOrderAlerts(spark: SparkSession, lines: Dataset[Line],
      threshold: Double = 250.0): Dataset[Alert] = {
    import spark.implicits._
    lines
      .groupByKey(_.l_orderkey)
      .transformWithState(new CrossingProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
