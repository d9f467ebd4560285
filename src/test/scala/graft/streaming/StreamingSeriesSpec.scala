package graft.streaming

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The daily-series monitors over STREAMED state: the `(d, r, c)` daily
  * aggregate is a sum-monoid, so StreamingStats.dailySeriesStream plus
  * the FromDaily verdict entries (ccf/adf/kpss) is the streaming dual
  * of q318/q319/q320 — one bounded-state stream, three monitors. Pins
  * each verdict over the streamed snapshot against the batch test on
  * everything fed so far.
  */
case class DayOrder(d: Long, price: Double)

class StreamingSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("ccf/adf/kpss over streamed daily cells equal the batch tests") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 50 days, variable per-day order counts, drifting prices
    val evs = (0 until 160).map { i =>
      val d = i % 50
      DayOrder(d.toLong,
        100.0 + 3.0 * d + ((i * 2654435761L % 40 + 40) % 40).toDouble)
    }
    val in = MemoryStream[DayOrder]
    // CENT grid feeds the CCF; the dollar-grid monitors get their own
    // state below (two monitors, two grids — the operators' contract)
    val cents = StreamingStats.dailySeriesStream(in.toDF(), col("d"),
      col("price"))
    assert(cents.isStreaming)
    val q = cents.writeStream.format("memory").queryName("day_cells")
      .outputMode("complete").start()
    // sort before comparing: a multi-row result's collect order is
    // plan-dependent (the full-suite flake of 2026-08-16)
    def rows1(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    try {
      in.addData(evs.take(70): _*)
      q.processAllAvailable()
      in.addData(evs.drop(70): _*)
      q.processAllAvailable()
      val snap = spark.table("day_cells")
        .select(col("d"), col("r"), col("c"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(snap.size <= 50, s"state must stay day-bounded: ${snap.size}")
      val daily = snap.toDF("d", "r", "c")
      // batch equivalents on an orders-shaped frame of the same rows
      val orders = evs.toDF("dd", "o_totalprice")
        .withColumn("o_orderdate",
          to_timestamp(lit("1970-01-01 00:00:00")) +
            make_dt_interval(col("dd")))
      assert(rows1(Relational.ccfFromDaily(daily)) ===
        rows1(Relational.ccfDaily(orders)))
      // dollar-grid state for the unit-root / stationarity monitors
      val dollars = snap.map { case (d, _, _) => d }.distinct.sorted
        .map { d =>
          (d, evs.filter(_.d == d).map(e => math.round(e.price)).sum)
        }.toDF("d", "r")
      assert(rows1(Relational.adfFromDaily(dollars)) ===
        rows1(Relational.adfTest(orders)))
      assert(rows1(Relational.kpssFromDaily(dollars)) ===
        rows1(Relational.kpssTest(orders)))
    } finally q.stop()
  }
}
