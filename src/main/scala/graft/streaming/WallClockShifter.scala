package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Wall-clock-faithful re-implementation of the reference's headline custom
  * operator, the topic shifter (`/root/reference/src/test/scala/me/dummy/
  * TopicShifter.scala:22-37`): re-emit every record unchanged — same key,
  * value, and EVENT timestamp — but no earlier than wall-clock
  * `record.ts + delayMs`. This matches the reference exactly: it sleeps
  * `diff = ts − (now − delay)` and forwards immediately when `diff <= 0`
  * (`TopicShifter.scala:29-33`), i.e. the hold is anchored to the record's
  * EVENT time, not its arrival time — on replay/backlog/restart,
  * already-old records flow straight through instead of being re-delayed.
  *
  * The reference holds records by sleeping the stream thread
  * (`Thread.sleep(diff)`, `TopicShifter.scala:32`), which serializes the
  * pipeline. Here the hold is state + a processing-time timer
  * (`flatMapGroupsWithState` with `ProcessingTimeTimeout`): records buffer
  * in keyed state, a timer fires at the earliest due emission, and emission
  * happens on the firing micro-batch — throughput is partition-parallel and
  * nothing blocks.
  *
  * Note the event-time variant ([[StreamingEventJoins.timeShift]]) is what
  * downstream joins actually need (SURVEY §7.4.2); this operator exists for
  * fidelity with the reference's delivery-time semantics ("process a topic
  * with a delay", `README.md:20`).
  */
object WallClockShifter {

  case class Rec(key: String, value: String, ts: Timestamp)
  /** Buffered record awaiting its delivery time (public: encoder codegen). */
  case class Pending(value: String, ts: Long, dueAt: Long)

  def shift(spark: SparkSession, events: Dataset[Rec], delayMs: Long): Dataset[Rec] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[Pending], Rec](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, rows: Iterator[Rec], state: GroupState[List[Pending]]) =>
          val now = System.currentTimeMillis()
          // dueAt anchored to the record's EVENT timestamp (reference
          // semantics, TopicShifter.scala:29-31): a record already older
          // than the delay is due immediately
          val buffered = state.getOption.getOrElse(Nil) ++
            rows.map(r => Pending(r.value, r.ts.getTime, r.ts.getTime + delayMs))
          val (due, pending) = buffered.partition(_.dueAt <= now)
          if (pending.nonEmpty) {
            state.update(pending)
            state.setTimeoutDuration(math.max(1L, pending.map(_.dueAt).min - now))
          } else {
            state.remove()
          }
          due.iterator.map(p => Rec(key, p.value, new Timestamp(p.ts)))
      }
  }
}
