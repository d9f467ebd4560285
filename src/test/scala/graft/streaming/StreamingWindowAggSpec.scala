package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation in append mode: windows emit
  * exactly once, after the watermark closes them — the same `window()`
  * expression as the batch q28.
  */
class StreamingWindowAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("tumbling 1-minute counts emit once per closed window") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Evt]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute").as("w"), $"key")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("start"), $"key", $"n")
    val q = agg.writeStream.format("memory").queryName("winagg_out")
      .outputMode("append").start()
    try {
      in.addData(Evt("a", "x", ts(0, 5)), Evt("a", "x", ts(0, 20)), Evt("b", "x", ts(0, 40)))
      q.processAllAvailable()
      // window [10:00, 10:01) still open — nothing emitted yet
      assert(spark.table("winagg_out").count() == 0)
      // advance watermark past the window end + delay
      in.addData(Evt("hb", "x", ts(2, 0)))
      q.processAllAvailable()
      in.addData(Evt("hb", "x", ts(3, 0)))
      q.processAllAvailable()
      val rows = spark.table("winagg_out")
        .select($"start", $"key", $"n").as[(Timestamp, String, Long)]
        .collect().filter(_._2 != "hb").toSet
      assert(rows == Set(
        (ts(0, 0), "a", 2L),
        (ts(0, 0), "b", 1L)))
    } finally q.stop()
  }

  test("sliding windows emit each closed window once; events count in both covering windows") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Evt]
    // q92's expression shape: 1-minute windows sliding every 30s — each
    // event belongs to exactly 2 windows
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "1 minute", "30 seconds").as("w"), $"key")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("start"), $"key", $"n")
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode("append").start()
    try {
      // one event at 10:00:45 — covered by windows [10:00:00) and [10:00:30)
      in.addData(Evt("a", "x", ts(0, 45)))
      q.processAllAvailable()
      in.addData(Evt("hb", "x", ts(3, 0)))
      q.processAllAvailable()
      in.addData(Evt("hb", "x", ts(4, 0)))
      q.processAllAvailable()
      val rows = spark.table("slide_out")
        .select($"start", $"key", $"n").as[(Timestamp, String, Long)]
        .collect().filter(_._2 == "a").toSet
      assert(rows == Set(
        (ts(0, 0), "a", 1L),
        (ts(0, 30), "a", 1L)))
    } finally q.stop()
  }

  test("session windows (gap merge) emit once closed, same semantics as batch q34") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Evt]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy($"key", session_window($"ts", "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"key", $"w.start".as("session_start"), $"n")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // a: two events 30s apart (one session); b: one event
      in.addData(Evt("a", "x", ts(0, 0)), Evt("a", "x", ts(0, 30)), Evt("b", "x", ts(0, 45)))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // sessions still open
      // advance the watermark far past session ends -> emit-on-close
      in.addData(Evt("hb", "x", ts(5, 0)))
      q.processAllAvailable()
      in.addData(Evt("hb", "x", ts(9, 0)))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"key", $"session_start", $"n").as[(String, Timestamp, Long)]
        .collect().filter(_._1 != "hb").toSet
      assert(rows == Set(
        ("a", ts(0, 0), 2L),
        ("b", ts(0, 45), 1L)))
    } finally q.stop()
  }
}
