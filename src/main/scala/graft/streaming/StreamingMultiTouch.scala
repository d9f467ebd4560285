package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming U-shaped MULTI-TOUCH attribution — the event-time-correct
  * streaming dual of [[graft.operators.EventJoins.multiTouchAttribution]]
  * (q174): when a purchase becomes FINAL (the watermark passes its
  * timestamp, so every view that could belong to its lookback window has
  * either arrived or is declared late), the full journey is assembled
  * from buffered view state and EXACTLY 10⁶ ppm of credit distributes
  * 40/20/40 over it with the same integer floor-division formula as the
  * batch operator — emit-on-arrival would mis-credit every journey whose
  * first touch arrives late (and first touches carry 40%).
  *
  * Same state discipline as [[StreamingAttribution]]: views evict once
  * the watermark guarantees no future purchase can reach back
  * (ts < wm − window), purchases leave state when credited — state is
  * O(window × per-key rate), never O(history).
  */
object StreamingMultiTouch {

  case class Ev(user_id: Long, event_type: String, event_id: Long,
      ts: Timestamp)
  case class Buffered(id: Long, tsMs: Long)
  case class Credit(user_id: Long, p_id: Long, view_id: Long,
      pos: Int, n: Int, credit_ppm: Long)

  /** The q174 position-credit formula on integer ppm — shared shape with
    * the batch SQL expression (parity is spec-asserted).
    */
  def positionCreditPpm(pos: Int, n: Int): Long = {
    require(pos >= 1 && pos <= n && n >= 1, s"bad pos=$pos n=$n")
    if (n == 1) 1000000L
    else if (n == 2) 500000L
    else if (pos == 1 || pos == n) 400000L
    else {
      val base = Math.floorDiv(200000L, n - 2L)
      base + (if (pos == 2) 200000L - base * (n - 2L) else 0L)
    }
  }

  class MultiTouchProcessor(windowMs: Long)
      extends StatefulProcessor[Long, Ev, Credit] {
    @transient private var views: ListState[Buffered] = _
    @transient private var purchases: ListState[Buffered] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      views = getHandle.getListState[Buffered](
        "views", Encoders.product[Buffered], TTLConfig.NONE)
      purchases = getHandle.getListState[Buffered](
        "purchases", Encoders.product[Buffered], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Credit] = {
      rows.foreach { e =>
        val b = Buffered(e.event_id, e.ts.getTime)
        e.event_type match {
          case "view" =>
            views.appendValue(b)
            // cleanup timer so view-only keys don't leak state forever
            getHandle.registerTimer(b.tsMs + windowMs + 1)
          case "purchase" =>
            purchases.appendValue(b)
            getHandle.registerTimer(b.tsMs)
          case _ =>
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Credit] = {
      val wm = expired.getExpiryTimeInMs()
      val allViews = views.get().toList
      val (due, pending) = purchases.get().toList.partition(_.tsMs <= wm)
      if (pending.isEmpty) purchases.clear()
      else purchases.put(pending.toArray)
      val keep = allViews.filter(_.tsMs >= wm - windowMs)
      if (keep.isEmpty) views.clear() else views.put(keep.toArray)
      due.sortBy(p => (p.tsMs, p.id)).iterator.flatMap { p =>
        val journey = allViews
          .filter(v => v.tsMs <= p.tsMs && v.tsMs >= p.tsMs - windowMs)
          .sortBy(v => (v.tsMs, v.id))
        val n = journey.length
        journey.zipWithIndex.map { case (v, i) =>
          Credit(key, p.id, v.id, i + 1, n, positionCreditPpm(i + 1, n))
        }
      }
    }
  }

  def attribute(spark: SparkSession, events: Dataset[Ev], windowMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Credit] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new MultiTouchProcessor(windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
