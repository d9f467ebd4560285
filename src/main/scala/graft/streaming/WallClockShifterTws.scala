package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** The wall-clock shifter on Spark 4's `transformWithState` API — same
  * semantics as [[WallClockShifter]] (hold each record until wall-clock
  * `record.ts + delay`, emit unchanged; already-old records flow straight
  * through), but with REAL per-key timers
  * (`registerTimer`) instead of flatMapGroupsWithState's single group
  * timeout: each buffered record arms its own timer, so a key receiving a
  * steady trickle still releases earlier records on time rather than
  * resetting one shared timeout.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState state lives
  * in per-state column families, which the default HDFS-backed provider
  * does not support.
  */
object WallClockShifterTws {
  import WallClockShifter.{Pending, Rec}

  class ShiftProcessor(delayMs: Long) extends StatefulProcessor[String, Rec, Rec] {
    @transient private var buffer: ListState[Pending] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buffer = getHandle.getListState[Pending](
        "pending", Encoders.product[Pending], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Rec],
        timers: TimerValues): Iterator[Rec] = {
      val now = timers.getCurrentProcessingTimeInMs()
      // dueAt anchored to the record's EVENT timestamp (reference
      // semantics, TopicShifter.scala:29-31); records already past due
      // emit on this very batch instead of arming a stale timer
      val (due, pending) = rows.map { r =>
        Pending(r.value, r.ts.getTime, r.ts.getTime + delayMs)
      }.toList.partition(_.dueAt <= now)
      pending.foreach { p =>
        buffer.appendValue(p)
        getHandle.registerTimer(p.dueAt)
      }
      due.iterator.map(p => Rec(key, p.value, new Timestamp(p.ts)))
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Rec] = {
      val now = expired.getExpiryTimeInMs()
      val (due, pending) = buffer.get().toList.partition(_.dueAt <= now)
      if (pending.isEmpty) buffer.clear() else buffer.put(pending.toArray)
      due.iterator.map(p => Rec(key, p.value, new Timestamp(p.ts)))
    }
  }

  def shift(spark: SparkSession, events: Dataset[Rec], delayMs: Long): Dataset[Rec] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new ShiftProcessor(delayMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
