package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The round-17 two-sample battery over STREAMED state: every rank test
  * reads the same `(v, na, t)` cell table, so the watermark-free
  * bounded-state histogram stream (StreamingStats.twoGroupCellsStream)
  * plus the cells-level verdict entries (lepageVerdict /
  * brunnerMunzelVerdict / andersonDarlingVerdict / cucconiVerdict) IS
  * the streaming dual of q311/q313/q314/q317 — one stream, four
  * monitors. This spec pins each verdict over the streamed snapshot
  * against its batch test on everything fed so far.
  */
class StreamingTwoSampleSpec extends SparkSpec {
  import spark.implicits._

  test("lepage/BM/AD/cucconi over streamed cells equal the batch tests") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // drifting cohorts + a third group the stream must exclude
    val evs = (0 until 90).map { i =>
      val g = if (i % 6 == 5) "X" else if (i % 2 == 0) "R" else "N"
      val v = (i * 2654435761L % 9 + 9) % 9 +
        (if (g == "N") 3L else 0L) + (if (i % 7 == 0) 1L else 0L)
      GroupedValue(g, v)
    }
    val in = MemoryStream[GroupedValue]
    val out = StreamingStats.twoGroupCellsStream(in.toDF(),
      col("g"), col("v"), groupA = "R", groupB = "N")
    val q = out.writeStream.format("memory").queryName("ts_cells")
      .outputMode("complete").start()
    def rows1(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    try {
      in.addData(evs.take(40): _*)
      q.processAllAvailable()
      in.addData(evs.drop(40): _*)
      q.processAllAvailable()
      // snapshot the sink view (the StreamingKsSpec discipline: the
      // verdicts reference the cell frame more than once)
      val snap = spark.table("ts_cells")
        .select(col("v"), col("na"), col("t"))
        .as[(Long, Long, Long)].collect().toSeq
      val cells = snap.toDF("v", "na", "t")
      val batch = evs.toDF("g", "v")
      assert(rows1(Stats.lepageVerdict(cells)) ===
        rows1(Stats.lepage(batch, "g", col("v"), "R", "N")))
      assert(rows1(Stats.brunnerMunzelVerdict(cells)) ===
        rows1(Stats.brunnerMunzel(batch, "g", col("v"), "R", "N")))
      assert(rows1(Stats.andersonDarlingVerdict(cells)) ===
        rows1(Stats.andersonDarling2(batch, "g", col("v"), "R", "N")))
      assert(rows1(Stats.cucconiVerdict(cells)) ===
        rows1(Stats.cucconi(batch, "g", col("v"), "R", "N")))
      // the verdicts actually fired on real data (both groups present)
      val le = Stats.lepageVerdict(cells)
        .as[(Long, Long, Double, Double, Double)].collect().head
      assert(le._1 > 0 && le._2 > 0 && !le._5.isNaN, s"$le")
    } finally q.stop()
  }

  test("G-test over streamed contingency cells equals the batch test") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = (0 until 80).map { i =>
      GroupedValue(if (i % 3 == 0) "p" else "q", (i * 7 % 5).toLong)
    }
    val in = MemoryStream[GroupedValue]
    val out = StreamingStats.contingencyCellsStream(in.toDF(),
      col("g"), col("v"))
    val q = out.writeStream.format("memory").queryName("g_cells")
      .outputMode("complete").start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      val snap = spark.table("g_cells")
        .select(col("a"), col("b"), col("o"))
        .as[(String, Long, Long)].collect().toSeq
      val got = Stats.gTestVerdict(snap.toDF("a", "b", "o"))
        .collect().toSeq.map(_.toSeq)
      val want = Stats.gTest(evs.toDF("g", "v"), col("g"), col("v"))
        .collect().toSeq.map(_.toSeq)
      assert(got === want)
    } finally q.stop()
  }
}
