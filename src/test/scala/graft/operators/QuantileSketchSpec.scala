package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q168 quantile-sketch gate: exact percentiles pinned by hand, and the
  * GK rank-contract flag holding across accuracies and partitionings
  * (the sketch's merge order varies; the contract must not).
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact percentiles on a hand distribution; flag holds") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 1..100 for one type: p50 = 50.5 (interpolated), p95 = 95.05
    val ev = (1 to 100).map(i => ("x", i.toDouble, ts("2024-01-05 08:00:00")))
      .toDF("event_type", "value", "ts")
    val got = Relational.quantileSketchValidated(ev)
      .as[(String, Long, Double, Double, Double, Int)].head()
    assert(got._1 === "x" && got._2 === 100L)
    assert(got._3 === 50.5 && math.abs(got._4 - 95.05) < 1e-9)
    assert(got._6 === 1, "rank contract must hold")
  }

  test("rank-contract flag is stable across accuracy and partitioning") {
    val ev = graft.Tables.events(spark, sf)
    for (acc <- Seq(10, 1000, 100000); parts <- Seq(1, 7)) {
      val flags = Relational
        .quantileSketchValidated(ev.repartition(parts), accuracy = acc)
        .select(col("approx_rank_ok")).as[Int].collect()
      assert(flags.forall(_ == 1), s"accuracy=$acc parts=$parts: $flags")
    }
  }
}
