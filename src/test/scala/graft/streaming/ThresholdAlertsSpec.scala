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

  test("alert payload is the running total at the crossing row, not the batch fold") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Line]
    val out = ThresholdAlerts.largeOrderAlerts(spark, in.toDS(), threshold = 10.0)
    val q = out.writeStream.format("memory").queryName("alerts_payload")
      .outputMode("append").start()
    try {
      // all three lines share a batch: a whole-batch fold would report 111,
      // but the crossing row is the second (6+5=11) — the payload must be
      // 11 here exactly as it would be if [6,5] and [100] split batches
      in.addData(Line(7L, 6.0), Line(7L, 5.0), Line(7L, 100.0))
      q.processAllAvailable()
      assert(spark.table("alerts_payload").as[Alert].collect().toSet ==
        Set(Alert(7L, 11.0)))
      // and the split-batch delivery agrees
      in.addData(Line(8L, 6.0), Line(8L, 5.0))
      q.processAllAvailable()
      in.addData(Line(8L, 100.0))
      q.processAllAvailable()
      assert(spark.table("alerts_payload").as[Alert].collect().toSet ==
        Set(Alert(7L, 11.0), Alert(8L, 11.0)))
    } finally q.stop()
  }

  test("expired state re-arms the alert — the documented at-most-once TTL tradeoff") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // a TTL'd processor runs in TimeMode.ProcessingTime, where the operator
    // reports shouldRunAnotherBatch=true unconditionally (it must keep
    // waking to service expiry) — so the query NEVER reaches the
    // no-new-data latch: `processAllAvailable` would block forever and
    // even Trigger.AvailableNow cannot terminate it. A continuous monitor
    // is the intended production shape; the testable form is an EVENTUAL
    // assertion — poll the sink under a deadline, then stop the query.
    val in = MemoryStream[Line]
    val out = ThresholdAlerts.largeOrderAlerts(spark, in.toDS(),
      threshold = 10.0,
      ttl = org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofMillis(100)))
    def awaitAlerts(expect: Set[Alert], timeoutMs: Long = 90000): Unit = {
      val deadline = System.nanoTime + timeoutMs * 1000000L
      var got = Set.empty[Alert]
      while (System.nanoTime < deadline && got != expect) {
        Thread.sleep(100)
        got = spark.table("alerts_ttl").as[Alert].collect().toSet
      }
      assert(got == expect)
    }
    val q = out.writeStream.format("memory").queryName("alerts_ttl")
      .outputMode("append").start()
    try {
      in.addData(Line(1L, 11.0))
      awaitAlerts(Set(Alert(1L, 11.0)))
      // let the 100ms TTL lapse: the key's state expires, so a straggler
      // line folds from zero and re-crosses — the at-most-once re-alert.
      // (Without expiry, alerted=true would persist and the straggler
      // would emit nothing — test 1 pins that non-TTL behavior.)
      Thread.sleep(1000)
      in.addData(Line(1L, 12.0))
      awaitAlerts(Set(Alert(1L, 11.0), Alert(1L, 12.0)))
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
