package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time correctness of streaming attribution: out-of-order arrival
  * (view delivered AFTER its click) must still attribute, emission happens
  * only once the watermark passes the click, and results equal the batch
  * as-of join on the same rows.
  */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._
  import StreamingAttribution._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("out-of-order views attribute; emission waits for the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    // the watermark delay DECLARES how out-of-order delivery may be; the
    // late view below arrives 30 min after the click, inside the 1h bound
    val out = StreamingAttribution.attribute(spark, in.toDS(),
      windowMs = 3600 * 1000L, watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // batch 1: the CLICK arrives before its matching view
      in.addData(Ev(1L, "click", 100L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // batch 2: the matching view arrives late (event-time EARLIER), plus
      // an unrelated user's view
      in.addData(
        Ev(1L, "view", 10L, ts("2024-01-01 10:00:00")),
        Ev(2L, "view", 50L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // click ts (10:30) is ahead of the watermark -> nothing emitted yet
      assert(spark.table("attr_out").count() == 0,
        "attribution emitted before the watermark passed the click")
      // heartbeats push the watermark (max ts - 1h) past the click's 10:30
      in.addData(Ev(99L, "view", 999L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData(Ev(99L, "view", 998L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val rows = spark.table("attr_out").as[Attribution].collect()
      assert(rows.length == 1, s"expected 1 attribution, got ${rows.toSeq}")
      val a = rows.head
      assert(a.user_id == 1L && a.click_id == 100L && a.view_id.contains(10L),
        s"late view not attributed: $a")
    } finally {
      q.stop()
      // do NOT conf.unset the provider here: unset falls below the
      // session-builder default to the hard default (HDFSBacked), and
      // every transformWithState suite that runs later in the same
      // shared session then fails with
      // STATE_STORE_MULTIPLE_COLUMN_FAMILIES
    }
  }

  test("view-only keys evict their state once the watermark passes ts + window") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    val out = StreamingAttribution.attribute(spark, in.toDS(),
      windowMs = 3600 * 1000L, watermarkDelay = "1 second")
    val q = out.writeStream.format("memory").queryName("attr_evict")
      .outputMode("append").start()
    try {
      // a user with ONLY views — no click ever arrives for key 7
      in.addData(Ev(7L, "view", 1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // advance the watermark far past view.ts + window
      in.addData(Ev(99L, "view", 999L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      in.addData(Ev(99L, "view", 998L, ts("2024-01-01 18:00:00")))
      q.processAllAvailable()
      in.addData(Ev(99L, "view", 997L, ts("2024-01-01 22:00:00")))
      q.processAllAvailable()
      // nothing attributes (no clicks), and the buffered view rows for
      // key 7 must be gone from the state store
      assert(spark.table("attr_evict").count() == 0)
      val p = q.lastProgress
      assert(p != null && p.stateOperators.nonEmpty)
      val totalStateRows = p.stateOperators.map(_.numRowsTotal).sum
      // only key 99's most recent views (inside watermark - window) may
      // remain; key 7's 10:00 view must have been evicted
      assert(totalStateRows <= 2, s"state not evicted: $totalStateRows rows")
    } finally {
      q.stop()
      // do NOT conf.unset the provider here: unset falls below the
      // session-builder default to the hard default (HDFSBacked), and
      // every transformWithState suite that runs later in the same
      // shared session then fails with
      // STATE_STORE_MULTIPLE_COLUMN_FAMILIES
    }
  }

  test("streaming attribution equals the batch as-of join on the same rows") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // deterministic little scenario incl. equal-ts tiebreak and no-match
    val evs = Seq(
      Ev(1L, "view", 1L, ts("2024-01-01 09:40:00")),
      Ev(1L, "view", 2L, ts("2024-01-01 09:50:00")),
      Ev(1L, "click", 3L, ts("2024-01-01 10:00:00")),
      Ev(2L, "view", 4L, ts("2024-01-01 10:00:00")),
      Ev(2L, "view", 5L, ts("2024-01-01 10:00:00")), // equal ts: id 5 wins
      Ev(2L, "click", 6L, ts("2024-01-01 10:00:00")),
      Ev(3L, "click", 7L, ts("2024-01-01 10:00:00")), // no view at all
      Ev(4L, "view", 8L, ts("2024-01-01 08:00:00")),
      Ev(4L, "click", 9L, ts("2024-01-01 10:00:00")), // view too old
    )
    val in = MemoryStream[Ev]
    val out = StreamingAttribution.attribute(spark, in.toDS(), 3600 * 1000L, "1 second")
    val q = out.writeStream.format("memory").queryName("attr_parity")
      .outputMode("append").start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      in.addData(Ev(99L, "view", 999L, ts("2024-01-01 12:00:00"))) // watermark push
      q.processAllAvailable()
      in.addData(Ev(99L, "view", 998L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("attr_parity").as[Attribution].collect()
        .map(a => (a.click_id, a.view_id)).toMap
      val batch = graft.operators.EventJoins.clickAttribution(
        evs.toDF().select($"event_id", $"ts", $"user_id", $"event_type"), "1 HOUR")
        .select($"click_id", $"view_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(streamed == batch, s"streaming=$streamed batch=$batch")
      assert(streamed == Map(3L -> Some(2L), 6L -> Some(5L), 7L -> None, 9L -> None))
      // duplicate-timer path: two clicks at the SAME ts for one key both
      // register the same event-time timer — must not throw or drop one
      in.addData(
        Ev(5L, "view", 20L, ts("2024-01-01 13:30:00")),
        Ev(5L, "click", 21L, ts("2024-01-01 14:00:00")),
        Ev(5L, "click", 22L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      in.addData(Ev(99L, "view", 997L, ts("2024-01-01 16:00:00")))
      q.processAllAvailable()
      in.addData(Ev(99L, "view", 996L, ts("2024-01-01 17:00:00")))
      q.processAllAvailable()
      val dup = spark.table("attr_parity").as[Attribution].collect()
        .map(a => (a.click_id, a.view_id)).toMap
      assert(dup.get(21L).contains(Some(20L)) && dup.get(22L).contains(Some(20L)),
        s"equal-ts clicks mishandled: $dup")
    } finally {
      q.stop()
      // do NOT conf.unset the provider here: unset falls below the
      // session-builder default to the hard default (HDFSBacked), and
      // every transformWithState suite that runs later in the same
      // shared session then fails with
      // STATE_STORE_MULTIPLE_COLUMN_FAMILIES
    }
  }
}
