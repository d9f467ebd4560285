package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming click attribution — the event-time-correct streaming dual of
  * the batch as-of join ([[graft.operators.EventJoins.clickAttribution]]):
  * for every click, the LATEST view by the same user with
  * `view.ts <= click.ts` within the window, or none.
  *
  * A processing-order match (emit on click arrival) would silently drop
  * attributions whenever a view ARRIVES after its click (out-of-order
  * delivery — routine at scale). Instead each click buffers in keyed state
  * and arms an EVENT-TIME timer at its own timestamp: the timer fires only
  * once the watermark passes, i.e. once every view that could possibly
  * match (view.ts <= click.ts) has either arrived or is declared late —
  * the same emit-on-watermark discipline Spark's outer interval join uses
  * (SURVEY §7.4.1). View state is evicted once the watermark guarantees no
  * future click can reach back to it (ts < watermark − window), so state
  * is bounded by the window × per-key rate.
  *
  * Reference anchor: this is the O6 'before'-window join
  * (`TimeoutJoinTest.scala:75-79`) sharpened to latest-match-only, built
  * on the O11 Processor-API surface (`TopicShifter.scala:22-37`) —
  * per-record state + timers, here with RocksDB-backed keyed state.
  */
object StreamingAttribution {

  case class Ev(user_id: Long, event_type: String, event_id: Long, ts: Timestamp)
  case class Buffered(id: Long, tsMs: Long)
  case class Attribution(user_id: Long, click_id: Long, click_ts: Timestamp,
      view_id: Option[Long], view_ts: Option[Timestamp])

  class AttributionProcessor(windowMs: Long)
      extends StatefulProcessor[Long, Ev, Attribution] {
    @transient private var views: ListState[Buffered] = _
    @transient private var clicks: ListState[Buffered] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      views = getHandle.getListState[Buffered](
        "views", Encoders.product[Buffered], TTLConfig.NONE)
      clicks = getHandle.getListState[Buffered](
        "clicks", Encoders.product[Buffered], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Attribution] = {
      rows.foreach { e =>
        val b = Buffered(e.event_id, e.ts.getTime)
        e.event_type match {
          case "view" =>
            views.appendValue(b)
            // cleanup timer: WITHOUT it a key that only ever sees views
            // would never enter handleExpiredTimer and its view state
            // would leak forever; past ts + window the view can no longer
            // match any future click (the +1 puts the eviction bound
            // strictly past this view), so the eviction pass may run
            getHandle.registerTimer(b.tsMs + windowMs + 1)
          case "click" =>
            clicks.appendValue(b)
            // fires when the event-time watermark passes the click's ts
            getHandle.registerTimer(b.tsMs)
          case _ => // other event types don't participate
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Attribution] = {
      val wm = expired.getExpiryTimeInMs()
      val allViews = views.get().toList
      val (due, pendingClicks) = clicks.get().toList.partition(_.tsMs <= wm)
      if (pendingClicks.isEmpty) clicks.clear() else clicks.put(pendingClicks.toArray)
      // evict views no remaining or future click can reach: future clicks
      // have ts > wm, so they only need views with ts > wm - window
      val keep = allViews.filter(_.tsMs >= wm - windowMs)
      if (keep.isEmpty) views.clear() else views.put(keep.toArray)
      due.sortBy(c => (c.tsMs, c.id)).iterator.map { c =>
        val m = allViews
          .filter(v => v.tsMs <= c.tsMs && v.tsMs >= c.tsMs - windowMs)
          .sortBy(v => (v.tsMs, v.id)).lastOption
        Attribution(key, c.id, new Timestamp(c.tsMs),
          m.map(_.id), m.map(v => new Timestamp(v.tsMs)))
      }
    }
  }

  /** `watermarkDelay` bounds how out-of-order events may arrive; `window`
    * is the attribution lookback (both SQL interval strings' millis).
    */
  def attribute(spark: SparkSession, events: Dataset[Ev], windowMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Attribution] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor(windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
