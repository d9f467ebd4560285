package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming multi-touch: stream ≡ batch credits on real data (split
  * across batches), and the late-first-touch case emit-on-arrival would
  * mis-credit.
  */
class StreamingMultiTouchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val DayMs = 24L * 3600L * 1000L

  test("late-arriving FIRST touch still gets its 40% (event-time journeys)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, Timestamp)]
    val q = StreamingMultiTouch.attribute(spark,
      in.toDF().toDF("user_id", "event_type", "event_id", "ts")
        .as[StreamingMultiTouch.Ev],
      windowMs = DayMs, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("mt_out")
      .outputMode("append").start()
    try {
      // batch 1: second+third touches and the purchase
      in.addData((1L, "view", 11L, ts("2024-01-05 09:00:00")),
        (1L, "view", 12L, ts("2024-01-05 10:00:00")),
        (1L, "purchase", 13L, ts("2024-01-05 10:30:00")))
      q.processAllAvailable()
      // batch 2: the TRUE first touch arrives late (within the watermark)
      in.addData((1L, "view", 10L, ts("2024-01-05 08:45:00")))
      q.processAllAvailable()
      // flush: watermark passes the purchase, journey finalizes
      in.addData((9L, "flush", 99L, ts("2024-01-05 23:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("mt_out").as[StreamingMultiTouch.Credit]
      .collect().map(c => c.view_id -> ((c.pos, c.n, c.credit_ppm))).toMap
    // n=3: late view 10 is position 1 with 400000; 11 interior 200000;
    // 12 last 400000
    assert(got == Map(10L -> ((1, 3, 400000L)), 11L -> ((2, 3, 200000L)),
      12L -> ((3, 3, 400000L))), s"got $got")
  }

  test("stream credits == batch q174 on sf0.001 events split across batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id", $"ts")
      .as[(Long, String, Long, Timestamp)].collect().sortBy(_._4.getTime)
    val in = MemoryStream[(Long, String, Long, Timestamp)]
    val q = StreamingMultiTouch.attribute(spark,
      in.toDF().toDF("user_id", "event_type", "event_id", "ts")
        .as[StreamingMultiTouch.Ev],
      windowMs = DayMs, watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("mt_par")
      .outputMode("append").start()
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      in.addData(h1.toSeq: _*)
      q.processAllAvailable()
      in.addData(h2.toSeq: _*)
      q.processAllAvailable()
      in.addData((999999L, "flush", 0L, ts("2030-01-01 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("mt_par").as[StreamingMultiTouch.Credit]
      .groupBy($"user_id", $"view_id")
      .agg(sum($"credit_ppm").as("credit_ppm"),
        count(lit(1)).as("n_purchases_credited"))
    val batch = graft.operators.EventJoins
      .multiTouchAttribution(graft.Tables.events(spark, sf))
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
