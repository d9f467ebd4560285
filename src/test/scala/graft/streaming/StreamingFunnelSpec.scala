package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming funnel: event-time correctness under cross-batch disorder
  * (the case an arrival-order fold gets wrong), strict-ordering
  * semantics, and parity with the batch funnel's reach counts.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("late-arriving stage-1 anchor still yields the full ordered funnel") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingFunnel.detect(spark,
      in.toDF().toDF("user_id", "event_type", "ts")
        .as[StreamingFunnel.FEv],
      watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // batch 1: the user's view+click arrive BEFORE the signup anchor
      in.addData((1L, "view", ts("2024-01-05 09:00:00")),
        (1L, "click", ts("2024-01-05 10:00:00")),
        (3L, "signup", ts("2024-01-05 09:30:00")),
        (3L, "view", ts("2024-01-05 09:30:00")))
      q.processAllAvailable()
      // batch 2: the signup (earlier event time, still above the
      // watermark — batch 1's max ts 10:00 − 2h = 08:00) and the purchase
      in.addData((1L, "signup", ts("2024-01-05 08:30:00")),
        (1L, "purchase", ts("2024-01-05 11:00:00")))
      q.processAllAvailable()
      // batch 3: watermark flush (non-stage type advances event time only)
      in.addData((99L, "flush", ts("2024-01-05 23:59:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_out")
      .as[StreamingFunnel.Advance].collect()
    val u1 = got.filter(_.user_id == 1L).sortBy(_.stage)
    assert(u1.map(a => (a.stage, a.event_type)).toSeq ===
      Seq((1, "signup"), (2, "view"), (3, "click"), (4, "purchase")),
      s"got ${u1.toSeq}")
    assert(u1.map(_.hours_from_prev).toSeq ===
      Seq(None, Some(0.5), Some(1.0), Some(1.0)))
    // user 3: view at the SAME ts as signup — strictly-after fails
    val u3 = got.filter(_.user_id == 3L)
    assert(u3.map(a => (a.stage, a.event_type)).toSeq === Seq((1, "signup")),
      s"got ${u3.toSeq}")
  }

  test("stream reach counts == batch funnel on sf0.001 events") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts")
      .as[(Long, String, Timestamp)].collect().sortBy(_._3.getTime)
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingFunnel.detect(spark,
      in.toDF().toDF("user_id", "event_type", "ts")
        .as[StreamingFunnel.FEv],
      watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("funnel_par")
      .outputMode("append").start()
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      in.addData(h1.toSeq: _*)
      q.processAllAvailable()
      in.addData(h2.toSeq: _*)
      q.processAllAvailable()
      in.addData((999999L, "flush", ts("2030-01-01 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val streamCounts = spark.table("funnel_par")
      .as[StreamingFunnel.Advance].collect()
      .groupBy(_.stage).view.mapValues(_.length.toLong).toMap
    val batchCounts = graft.operators.Relational
      .funnel(graft.Tables.events(spark, sf))
      .select($"stage", $"n_users").as[(Int, Long)].collect().toMap
    assert(streamCounts === batchCounts,
      s"stream=$streamCounts batch=$batchCounts")
  }
}
