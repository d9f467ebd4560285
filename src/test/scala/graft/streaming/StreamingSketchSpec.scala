package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Count-Min (q232's dual): latest emitted cell values equal
  * the batch sketch of everything fed so far, with d·w bounded state
  * and no watermark.
  */
case class SketchDoc(doc_id: Long, text: String)

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode cells converge to the batch sketch, state bounded") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      SketchDoc(1L, "join scan join hash table"),
      SketchDoc(2L, "sort merge sort window sort"),
      SketchDoc(3L, "join hash hash the fast"),
      SketchDoc(4L, "the the scan merge window"))
    val in = MemoryStream[SketchDoc]
    val out = StreamingSketch.countMinCellsStream(in.toDF(), "text",
      depth = 3, width = 32)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      // mid-stream: cells equal the batch sketch of the first two docs
      val mid = spark.table("cms_cells")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val midBatch = Sketches.countMinCells(docs.take(2).toDF(), "text",
          depth = 3, width = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(mid === midBatch)
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val fin = spark.table("cms_cells")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val finBatch = Sketches.countMinCells(docs.toDF(), "text",
          depth = 3, width = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(fin === finBatch)
      // the whole state is at most d*w cells
      assert(fin.size <= 3 * 32)
    } finally q.stop()
  }

  test("sketch state survives stop/restart: no loss, no double counting") {
    val root = java.nio.file.Files.createTempDirectory("graft_cms_rec")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val half = docs.count() / 2
    val partA = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") < half)
    partA.coalesce(1).write.mode("append").parquet(srcDir)
    def cellsOf(name: String) = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    def batchCells(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinCells(df, "text", depth = 3, width = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    def start(name: String) = StreamingSketch.countMinCellsStream(
        graft.sources.KafkaIO.parquetStream(spark, srcDir, docs.schema),
        "text", depth = 3, width = 32)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start("cms_rec1")
    q1.processAllAvailable()
    q1.stop()
    assert(cellsOf("cms_rec1") === batchCells(partA))
    // new data lands while the query is DOWN
    docs.filter(org.apache.spark.sql.functions.col("doc_id") >= half)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start("cms_rec2")
    q2.processAllAvailable()
    q2.stop()
    // restored state + only-new input == the batch sketch of everything
    assert(cellsOf("cms_rec2") === batchCells(docs))
  }
}
