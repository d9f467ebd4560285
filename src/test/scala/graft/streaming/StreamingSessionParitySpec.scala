package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class UEvt(user_id: Long, ts: Timestamp)

/** Batch ≡ stream parity for `Relational.sessionize` (q34's expression) on
  * OUT-OF-ORDER input where a late event spans a gap boundary: two open
  * sessions that a late-but-in-watermark event later BRIDGES into one.
  * This is the timing-equivalence risk SURVEY §7.4.1 calls out — a
  * session store that closed sessions eagerly (or keyed them by arrival
  * order) would emit the split pair and could never retract it in append
  * mode. Spark's session store merges open windows on late arrivals, so
  * the closed-session output must equal the batch run over the same rows.
  */
class StreamingSessionParitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(hms: String) = Timestamp.valueOf(s"2024-01-01 $hms")

  test("closed sessions equal batch when a late event bridges a gap boundary") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[UEvt]
    // watermark 5 min: the bridge event below arrives 2 batches late but
    // within the delay, so the store must still merge across it
    val sessions = Relational.sessionize(
      in.toDF().withWatermark("ts", "5 minutes"), gap = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    val all = scala.collection.mutable.ArrayBuffer.empty[UEvt]
    def add(evts: UEvt*): Unit = { all ++= evts; in.addData(evts: _*); q.processAllAvailable() }
    try {
      // user 1: two events 2 min apart — two OPEN sessions for now.
      // user 2: out-of-order within the batch + a separate later burst.
      add(UEvt(1, ts("10:00:00")), UEvt(1, ts("10:02:00")),
        UEvt(2, ts("10:00:30")), UEvt(2, ts("10:00:10")), UEvt(2, ts("10:03:30")))
      // the LATE bridge: 60 s from both neighbors — exactly ON the
      // inclusive gap bound on each side, so user 1's two sessions must
      // merge into one spanning [10:00:00, 10:02:00]
      add(UEvt(1, ts("10:01:00")))
      // heartbeats close everything (two rounds: the batch that advances
      // the watermark and the batch that flushes against it)
      add(UEvt(99, ts("10:30:00")))
      add(UEvt(99, ts("10:40:00")))
    } finally q.stop()

    val streamed = spark.table("sess_parity")
      .as[(Long, Timestamp, Timestamp, Long)].collect()
      .filter(_._1 != 99L).toSet
    val batch = Relational.sessionize(all.toSeq.toDF(), gap = "1 minute")
      .as[(Long, Timestamp, Timestamp, Long)].collect()
      .filter(_._1 != 99L).toSet
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // the bridge must have produced ONE 3-event session for user 1, not
    // the split pair that existed before it arrived
    assert(streamed.filter(_._1 == 1L) ==
      Set((1L, ts("10:00:00"), ts("10:02:00"), 3L)))
    assert(streamed.filter(_._1 == 2L) == Set(
      (2L, ts("10:00:10"), ts("10:00:30"), 2L),
      (2L, ts("10:03:30"), ts("10:03:30"), 1L)))
  }
}
