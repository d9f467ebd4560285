package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")

  test("dropDuplicates keeps first occurrence across micro-batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Evt]
    val out = StreamingDedup.exactForever(in.toDF(), Seq("key"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(Evt("a", "v1", ts(0)), Evt("b", "v2", ts(1)))
      q.processAllAvailable()
      in.addData(Evt("a", "v1-dup-later-batch", ts(5)), Evt("c", "v3", ts(6)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("dedup_out").select("key", "value")
      .as[(String, String)].collect().toMap
    assert(rows == Map("a" -> "v1", "b" -> "v2", "c" -> "v3"))
  }

  test("watermark-bounded dedup: dups within the horizon dropped, state evicted") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Evt]
    val out = StreamingDedup.exactWithinWatermark(in.toDF(), Seq("key"), "ts", "5 seconds")
    val q = out.writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      in.addData(Evt("a", "v1", ts(0)), Evt("a", "dup-same-batch", ts(1)))
      q.processAllAvailable()
      in.addData(Evt("a", "dup-within-horizon", ts(3)))
      q.processAllAvailable()
      // advance the watermark far past a's horizon, then re-send the key:
      // state for "a" has been evicted, so it's treated as new
      in.addData(Evt("z", "advance", ts(59)))
      q.processAllAvailable()
      in.addData(Evt("a", "post-eviction", ts(58)))
      q.processAllAvailable()
      val values = spark.table("dedup_wm_out").select("value").as[String].collect().toSet
      assert(values.contains("v1") && !values.contains("dup-same-batch")
        && !values.contains("dup-within-horizon"))
      assert(values.contains("post-eviction"),
        s"state not evicted after watermark passed: $values")
    } finally q.stop()
  }
}
