package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming windowed top-k — "most active users per tumbling window",
  * emitted exactly once per window WHEN THE WATERMARK CLOSES IT. Spark
  * cannot express this declaratively: a rank over a streaming windowed
  * aggregation is an aggregation-on-aggregation, unsupported in append
  * mode — so this is a genuine custom-operator case (the O11 Processor
  * escape hatch, same surface as [[StreamingAttribution]]).
  *
  * Shape: keyed by WINDOW START; per-key MapState holds user→count for
  * that window only; one event-time timer at window end emits the ranked
  * top-k and CLEARS the window's state, so state is bounded by
  * (#open windows × #active users/window) — not by stream history. The
  * in-flight map is the same partial-aggregation idea as a batch
  * map-side combine: rows collapse to counts on arrival, never buffer.
  */
object StreamingTopK {

  case class Ev(user_id: Long, event_type: String, ts: Timestamp)
  case class WindowTopK(window_start: Timestamp, rank: Int, user_id: Long,
      n_events: Long)

  class TopKProcessor(windowMs: Long, k: Int)
      extends StatefulProcessor[Long, Ev, WindowTopK] {
    @transient private var counts: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[Long, Long](
        "counts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(windowStart: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[WindowTopK] = {
      rows.foreach { e =>
        val prev = if (counts.containsKey(e.user_id)) counts.getValue(e.user_id) else 0L
        counts.updateValue(e.user_id, prev + 1L)
      }
      // fires once the event-time watermark passes the window end
      // (re-registration of the same instant is idempotent)
      getHandle.registerTimer(windowStart + windowMs)
      Iterator.empty
    }

    override def handleExpiredTimer(windowStart: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[WindowTopK] = {
      val top = counts.iterator().toList
        .sortBy { case (user, n) => (-n, user) }
        .take(k)
      counts.clear() // the window is closed; drop its state entirely
      top.iterator.zipWithIndex.map { case ((user, n), i) =>
        WindowTopK(new Timestamp(windowStart), i + 1, user, n)
      }
    }
  }

  /** Top-`k` users by event count per tumbling window of `windowMs`,
    * ranked (count desc, user asc — total order, deterministic).
    */
  def topKPerWindow(spark: SparkSession, events: Dataset[Ev], windowMs: Long,
      k: Int, watermarkDelay: String = "10 seconds"): Dataset[WindowTopK] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => math.floorDiv(e.ts.getTime, windowMs) * windowMs)
      .transformWithState(new TopKProcessor(windowMs, k),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
