package graft.streaming

import graft.SparkSpec
import graft.operators.Graph
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** q189 windowed basket pairs: batch hand-trace (support floor, basket
  * cap, set semantics) and stream ≡ batch parity per closed day over
  * sf0.001 events.
  */
class StreamingBasketPairsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch: hand-traced supports, caps, and set semantics") {
    // day 0 baskets: u1{A,B,C}, u2{A,B}, u3{A,B} (B twice — sets dedup);
    // u4 has a single item (excluded); u5 is oversized (excluded)
    val rows = Seq(
      (0L, 1L, 10L), (0L, 1L, 20L), (0L, 1L, 30L),
      (0L, 2L, 10L), (0L, 2L, 20L),
      (0L, 3L, 10L), (0L, 3L, 20L), (0L, 3L, 20L),
      (0L, 4L, 10L)) ++
      (1L to 25L).map(i => (0L, 5L, 100L + i))
    val got = Graph.windowedBasketPairs(
      rows.toDF("d", "b", "it"), "d", "b", "it",
      minSupport = 2, maxBasketSize = 20)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 10L, 20L, 3L)), s"got $got")
    // with the floor at 1, the minority pairs appear too
    val all = Graph.windowedBasketPairs(
      rows.toDF("d", "b", "it"), "d", "b", "it",
      minSupport = 1, maxBasketSize = 20)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(all === Set((0L, 10L, 20L, 3L), (0L, 10L, 30L, 1L),
      (0L, 20L, 30L, 1L)), s"got $all")
  }

  test("days do not mix") {
    val rows = Seq((0L, 1L, 10L), (0L, 1L, 20L),
      (1L, 1L, 10L), (1L, 1L, 20L))
    val got = Graph.windowedBasketPairs(rows.toDF("d", "b", "it"),
      "d", "b", "it", minSupport = 1, maxBasketSize = 20)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 10L, 20L, 1L), (1L, 10L, 20L, 1L)))
  }

  test("stream pairs == batch q189 per closed day on sf0.001 events") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("ts"))
      .filter(col("item").isNotNull)
      .as[(Long, Long, Timestamp)].collect().sortBy(_._3.getTime)
    val in = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamingBasketPairs.detect(spark,
      in.toDF().toDF("user_id", "item", "ts")
        .as[StreamingBasketPairs.BEv],
      minSupport = 2, maxBasketSize = 20, watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("basket_pairs")
      .outputMode("append").start()
    try {
      val (h1, h2) = src.splitAt(src.length / 2)
      in.addData(h1.toSeq: _*)
      q.processAllAvailable()
      in.addData(h2.toSeq: _*)
      q.processAllAvailable()
      in.addData((999999L, 1L, ts("2030-01-01 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("basket_pairs")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Graph.windowedBasketPairs(
      graft.Tables.events(spark, sf)
        .filter(col("event_type") === "view")
        .select(
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
            .as("d"),
          col("user_id").as("b"),
          get_json_object(col("props"), "$.k").cast("long").as("it")),
      "d", "b", "it", minSupport = 2, maxBasketSize = 20)
      .as[(Long, Long, Long, Long)].collect().toSet
    // every sf0.001 day closes under the flush watermark
    assert(stream === batch,
      s"stream-only=${(stream -- batch).take(3)} batch-only=${(batch -- stream).take(3)}")
  }
}
