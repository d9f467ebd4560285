package graft.streaming

import graft.SparkSpec
import graft.operators.Resampling
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class KeyedValue(k: Long, x: Long)
case class LabeledValue(k: Long, isA: Boolean, x: Long)

/** q344/q345 over STREAMED replicate cells: the bootstrap/permutation
  * cell frames are sum-monoids (B+1 / S+1 bounded rows), so a
  * watermark-free streaming aggregation plus the cells-level verdicts
  * IS the streaming dual — a CI / p-value that updates per micro-batch.
  * Pins the verdicts over the streamed snapshot against the batch
  * cells on everything fed so far.
  */
class StreamingResamplingSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("bootstrap CI over streamed replicate cells equals batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = (1 to 50).map(i => KeyedValue(i.toLong,
      1000L + (i % 9) * 250L))
    val in = MemoryStream[KeyedValue]
    val out = StreamingResampling.bootstrapCellsStream(in.toDF(),
      col("k"), col("x"), bReps = 32)
    val q = out.writeStream.format("memory").queryName("boot_cells")
      .outputMode("complete").start()
    try {
      in.addData(evs.take(20): _*)
      q.processAllAvailable()
      in.addData(evs.drop(20): _*)
      q.processAllAvailable()
      val snap = spark.table("boot_cells")
        .select(col("b"), col("nw"), col("sw").cast("long"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(snap.size === 33, s"state rows: ${snap.size}") // B+1 cells
      val cells = snap.toDF("b", "nw", "sw")
      val batchCells = Resampling.bootstrapCells(
        evs.toDF("k", "x"), col("k"), col("x"), 32)
      val got = rows(Resampling.bootstrapCiFromCells(cells))
      val want = rows(Resampling.bootstrapCiFromCells(batchCells))
      assert(got === want)
      // identity replicate carries the exact un-resampled totals
      val id = snap.find(_._1 == 0L).get
      assert(id._2 === 50L && id._3 === evs.map(_.x).sum, s"$id")
    } finally q.stop()
  }

  test("permutation p over streamed cells equals batch; updates with data") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // planted effect: group A pays ~double
    val evs = (1 to 40).map { i =>
      val a = i % 2 == 0
      LabeledValue(i.toLong, a, if (a) 2000L + i else 1000L + i)
    }
    val in = MemoryStream[LabeledValue]
    val out = StreamingResampling.permCellsStream(in.toDF(),
      col("k"), col("isA"), col("x"), nPerms = 60)
    val q = out.writeStream.format("memory").queryName("perm_cells")
      .outputMode("complete").start()
    try {
      in.addData(evs.take(15): _*)
      q.processAllAvailable()
      val snap1 = spark.table("perm_cells")
        .select(col("s"), col("n1"), col("n0"),
          col("s1").cast("long"), col("s0").cast("long"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val mid = Resampling.permutationTestFromCells(
        snap1.toDF("s", "n1", "n0", "s1", "s0"))
        .as[(Long, Long, Double, Long, Double)].collect().head
      in.addData(evs.drop(15): _*)
      q.processAllAvailable()
      val snap2 = spark.table("perm_cells")
        .select(col("s"), col("n1"), col("n0"),
          col("s1").cast("long"), col("s0").cast("long"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(snap2.size === 61, s"state rows: ${snap2.size}") // S+1
      val cells = snap2.toDF("s", "n1", "n0", "s1", "s0")
      val batchCells = Resampling.permCells(
        evs.toDF("k", "isA", "x"), col("k"), col("isA"), col("x"), 60)
      val got = rows(Resampling.permutationTestFromCells(cells))
      val want = rows(Resampling.permutationTestFromCells(batchCells))
      assert(got === want)
      // more evidence, smaller p: the full-stream p is no larger than
      // the mid-stream p on this planted effect, and is near the
      // add-one floor 1/61
      val fin = Resampling.permutationTestFromCells(cells)
        .as[(Long, Long, Double, Long, Double)].collect().head
      assert(fin._5 <= mid._5, s"mid $mid -> fin $fin")
      assert(fin._5 <= 0.1, s"$fin")
    } finally q.stop()
  }

  test("bootstrap cells survive stop/restart: no loss, no double count") {
    val root = java.nio.file.Files.createTempDirectory("graft_boot_rec")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    val all = (1 to 60).map(i => (i.toLong, 500L + (i % 11) * 100L))
      .toDF("k", "x")
    val partA = all.filter(col("k") <= 30L)
    partA.coalesce(1).write.mode("append").parquet(srcDir)
    def cellsOf(name: String): Seq[(Long, Long, Long)] =
      spark.table(name)
        .select(col("b"), col("nw"), col("sw").cast("long"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def batchCells(df: org.apache.spark.sql.DataFrame)
        : Seq[(Long, Long, Long)] =
      Resampling.bootstrapCells(df, col("k"), col("x"), 16)
        .select(col("b"), col("nw"), col("sw").cast("long"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    def start(name: String) = StreamingResampling.bootstrapCellsStream(
        graft.sources.KafkaIO.parquetStream(spark, srcDir, all.schema),
        col("k"), col("x"), bReps = 16)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start("boot_rec1")
    q1.processAllAvailable()
    q1.stop()
    assert(cellsOf("boot_rec1") === batchCells(partA))
    // new data lands while the query is DOWN
    all.filter(col("k") > 30L).coalesce(1).write.mode("append")
      .parquet(srcDir)
    val q2 = start("boot_rec2")
    q2.processAllAvailable()
    q2.stop()
    // restored state + only-new input == the batch cells of everything
    assert(cellsOf("boot_rec2") === batchCells(all))
  }
}
