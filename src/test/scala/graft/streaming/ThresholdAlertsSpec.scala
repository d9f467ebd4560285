package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** q94's streaming analogue: the alert fires on the crossing row, exactly
  * once per order, independent of how lines split across micro-batches —
  * and the alerted-order set equals the batch formulation's.
  */
class ThresholdAlertsSpec extends SparkSpec {
  import spark.implicits._
  import ThresholdAlerts._

  test("alert fires once at the crossing, even with lines split across batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Line]
    val out = ThresholdAlerts.largeOrderAlerts(spark, in.toDS(), threshold = 10.0)
    val q = out.writeStream.format("memory").queryName("alerts_out")
      .outputMode("append").start()
    try {
      // order 1 approaches but stays below; order 2 crosses in batch 1
      in.addData(Line(1L, 6.0), Line(2L, 11.0))
      q.processAllAvailable()
      assert(spark.table("alerts_out").as[Alert].collect().toSet ==
        Set(Alert(2L, 11.0)))
      // order 1 crosses now (6+5=11); order 2 grows but must NOT re-alert
      in.addData(Line(1L, 5.0), Line(2L, 100.0))
      q.processAllAvailable()
      assert(spark.table("alerts_out").as[Alert].collect().toSet ==
        Set(Alert(2L, 11.0), Alert(1L, 11.0)))
      // further lines on already-alerted orders stay silent
      in.addData(Line(1L, 1.0))
      q.processAllAvailable()
      assert(spark.table("alerts_out").count() == 2)
    } finally q.stop()
  }

  test("alerted-order set equals the batch q94 threshold set on real lineitem") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val li = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity").as[Line].collect()
    val in = MemoryStream[Line]
    val out = ThresholdAlerts.largeOrderAlerts(spark, in.toDS(), threshold = 200.0)
    val q = out.writeStream.format("memory").queryName("alerts_real")
      .outputMode("append").start()
    try {
      // deliver in two arbitrary chunks to exercise cross-batch folding
      val (a, b) = li.splitAt(li.length / 2)
      in.addData(a.toIndexedSeq); q.processAllAvailable()
      in.addData(b.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("alerts_real").as[Alert].collect()
        .map(_.o_orderkey).toSet
      val batch = graft.Tables.lineitem(spark, sf)
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("t"))
        .filter($"t" > 200.0).select($"l_orderkey").as[Long].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      // exactly one alert per order
      assert(spark.table("alerts_real").count() == streamed.size)
    } finally q.stop()
  }
}
