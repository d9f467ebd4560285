package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class BlockedValue(blk: String, trt: Long, v: Double)
case class StratumFlags(g: String, x: Long, y: Long)

/** Streaming duals of the round-17 blocked/stratified verdict layer:
  * the Friedman family (q327/q335/q339) reads the `(blk, trt, n, s)`
  * cell table, q342 the `(g, n, c)` trial/success cells, q329 the
  * per-stratum 2×2 cells — each a watermark-free bounded-state
  * sum-monoid aggregation (the twoGroupCellsStream device). This spec
  * pins every verdict over the streamed snapshot against its batch
  * test on everything fed so far.
  */
class StreamingBlockedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("friedman/kendallW/page over streamed block cells equal batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // complete 5-block × 3-treatment design, planted ordered effect +
    // deterministic noise, fed in two micro-batches
    val evs = for {
      b <- 0 until 5; t <- 1 to 3; r <- 0 until 4
    } yield BlockedValue(s"b$b", t.toLong,
      t * 2.0 + ((b * 31 + t * 17 + r * 7) % 5) * 0.25)
    val in = MemoryStream[BlockedValue]
    val out = StreamingStats.blockCellsStream(in.toDF(),
      col("blk"), col("trt"), col("v"))
    val q = out.writeStream.format("memory").queryName("blk_cells")
      .outputMode("complete").start()
    try {
      in.addData(evs.take(25): _*)
      q.processAllAvailable()
      in.addData(evs.drop(25): _*)
      q.processAllAvailable()
      // snapshot the sink view (memory-sink views cannot be
      // self-joined; the rank machinery references cells twice)
      val snap = spark.table("blk_cells")
        .select(col("blk"), col("trt"), col("n"),
          col("s").cast("long"))
        .as[(String, Long, Long, Long)].collect().toSeq
      val cells = snap.toDF("blk", "trt", "n", "s")
      val batch = evs.toDF("blk", "trt", "v")
      assert(rows(Stats.friedmanVerdict(cells)) ===
        rows(Stats.friedman(batch, col("blk"), col("trt"), col("v"))))
      assert(rows(Stats.kendallWVerdict(cells)) ===
        rows(Stats.kendallW(batch, col("blk"), col("trt"), col("v"))))
      assert(rows(Stats.pageTrendVerdict(cells)) ===
        rows(Stats.pageTrend(batch, col("blk"), col("trt"), col("v"))))
      // the planted ascending effect actually fires: Page z > 0 and
      // the design is complete (no NaN)
      val pg = Stats.pageTrendVerdict(cells)
        .as[(Long, Long, Double, Double)].collect().head
      assert(pg._1 === 5L && pg._2 === 3L && pg._4 > 1.0, s"$pg")
    } finally q.stop()
  }

  test("two-proportion z over streamed group-flag cells equals batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // group R converts ~2/3, N ~1/3, plus a third group the stream
    // must exclude
    val evs = (0 until 60).map { i =>
      val g = if (i % 5 == 4) "X" else if (i % 2 == 0) "R" else "N"
      val x = if (g == "R") (if (i % 3 == 0) 0L else 1L)
        else (if (i % 3 == 0) 1L else 0L)
      GroupedValue(g, x)
    }
    val in = MemoryStream[GroupedValue]
    val out = StreamingStats.groupFlagCellsStream(in.toDF(),
      col("g"), col("v"), groupA = "R", groupB = "N")
    val q = out.writeStream.format("memory").queryName("prop_cells")
      .outputMode("complete").start()
    try {
      in.addData(evs.take(30): _*)
      q.processAllAvailable()
      in.addData(evs.drop(30): _*)
      q.processAllAvailable()
      val snap = spark.table("prop_cells")
        .select(col("g"), col("n"), col("c"))
        .as[(String, Long, Long)].collect().toSeq
      val cells = snap.toDF("g", "n", "c")
      val batch = evs.toDF("g", "v")
      assert(rows(Stats.twoProportionZVerdict(cells, "R", "N")) ===
        rows(Stats.twoProportionZ(batch, "g", col("v"), "R", "N")))
      // both groups present, a real z fired
      val z = Stats.twoProportionZVerdict(cells, "R", "N")
        .select(col("z_score")).as[Double].collect().head
      assert(!z.isNaN && z > 0.0, s"z=$z")
    } finally q.stop()
  }

  test("Mantel-Haenszel over streamed strata cells equals batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two strata with opposite marginal mixes (the Simpson shape)
    val evs = (0 until 80).map { i =>
      val g = if (i % 2 == 0) "s1" else "s2"
      val x = if ((i / 2) % 2 == 0) 1L else 0L
      val y = if (g == "s1") (if (x == 1L && i % 3 != 0) 1L else 0L)
        else (if (x == 0L && i % 3 == 0) 1L else 0L)
      StratumFlags(g, x, y)
    }
    val in = MemoryStream[StratumFlags]
    val out = StreamingStats.strataCellsStream(in.toDF(),
      col("g"), col("x"), col("y"))
    val q = out.writeStream.format("memory").queryName("mh_cells")
      .outputMode("complete").start()
    try {
      in.addData(evs.take(40): _*)
      q.processAllAvailable()
      in.addData(evs.drop(40): _*)
      q.processAllAvailable()
      val snap = spark.table("mh_cells")
        .select(col("g"), col("a"), col("b"), col("c"), col("dd"))
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      val cells = snap.toDF("g", "a", "b", "c", "dd")
      val batch = evs.toDF("g", "x", "y")
      assert(rows(Stats.mantelHaenszelVerdict(cells)) ===
        rows(Stats.mantelHaenszel(batch, col("g"), col("x"),
          col("y"))))
      val mh = Stats.mantelHaenszelVerdict(cells)
        .as[(Long, Double, Double)].collect().head
      assert(mh._1 === 2L && !mh._2.isNaN, s"$mh")
    } finally q.stop()
  }
}
