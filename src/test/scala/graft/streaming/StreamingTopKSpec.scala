package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Windowed top-k: per-window ranking emitted only at watermark close,
  * state dropped per closed window, parity with the batch formulation.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._
  import StreamingTopK._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val H = 3600 * 1000L

  test("per-window ranks emitted at watermark close; equal to batch ranking") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    val out = StreamingTopK.topKPerWindow(spark, in.toDS(), windowMs = H, k = 2,
      watermarkDelay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      // window [10:00, 11:00): user 1 x3, user 2 x2, user 3 x1
      in.addData(
        Ev(1L, "view", ts("2024-01-01 10:00:01")),
        Ev(1L, "view", ts("2024-01-01 10:10:00")),
        Ev(2L, "view", ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      in.addData(
        Ev(2L, "click", ts("2024-01-01 10:25:00")),
        Ev(1L, "click", ts("2024-01-01 10:40:00")),
        Ev(3L, "view", ts("2024-01-01 10:50:00")))
      q.processAllAvailable()
      // watermark (max ts - 10s) still inside the window -> nothing out
      assert(spark.table("topk_out").count() == 0,
        "top-k emitted before the window closed")
      // window [11:00, 12:00): user 3 x2 — and its events advance the
      // watermark past 11:00, closing the FIRST window
      in.addData(
        Ev(3L, "view", ts("2024-01-01 11:30:00")),
        Ev(3L, "view", ts("2024-01-01 11:35:00")))
      q.processAllAvailable()
      val w1 = spark.table("topk_out").as[WindowTopK].collect().toSet
      assert(w1 == Set(
        WindowTopK(ts("2024-01-01 10:00:00"), 1, 1L, 3L),
        WindowTopK(ts("2024-01-01 10:00:00"), 2, 2L, 2L)),
        s"window-1 ranking wrong: $w1")
      // close the second window with a heartbeat
      in.addData(Ev(99L, "view", ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val all = spark.table("topk_out").as[WindowTopK].collect().toSet
      assert(all.contains(WindowTopK(ts("2024-01-01 11:00:00"), 1, 3L, 2L)),
        s"window-2 missing: $all")
      // k=2 cap respected everywhere; ranks dense from 1
      all.groupBy(_.window_start).foreach { case (_, rows) =>
        assert(rows.size <= 2)
        assert(rows.map(_.rank).toSeq.sorted == (1 to rows.size))
      }
    } finally q.stop()
  }

  test("tie-break is deterministic: equal counts rank by user id") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    val out = StreamingTopK.topKPerWindow(spark, in.toDS(), windowMs = H, k = 3,
      watermarkDelay = "1 second")
    val q = out.writeStream.format("memory").queryName("topk_tie_out")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(7L, "view", ts("2024-01-01 10:01:00")),
        Ev(5L, "view", ts("2024-01-01 10:02:00")),
        Ev(9L, "view", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      in.addData(Ev(99L, "view", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("topk_tie_out").as[WindowTopK].collect()
        .filter(_.window_start == ts("2024-01-01 10:00:00"))
        .sortBy(_.rank).map(_.user_id).toSeq
      assert(rows == Seq(5L, 7L, 9L), s"tie-break not by user id: $rows")
    } finally q.stop()
  }
}
