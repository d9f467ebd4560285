package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming HLL registers (q239's dual): latest emitted register
  * values equal the batch build of everything fed so far — mid-stream
  * AND at end — with |sources|·64 bounded state, no watermark, and
  * stop/restart recovery (the q232-dual gate set, applied to the
  * max-merge sketch).
  */
case class HllDoc(doc_id: Long, source: String, text: String)

class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private def regMap(rows: Array[org.apache.spark.sql.Row])
      : Map[(String, Long), Long] =
    rows.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def batchRegs(df: org.apache.spark.sql.DataFrame) =
    regMap(Sketches.hllRegisters(df, "text", "source").collect())

  test("update-mode registers converge to the batch build, state bounded") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      HllDoc(1L, "web", "join scan join hash table"),
      HllDoc(2L, "web", "sort merge sort window sort"),
      HllDoc(3L, "pdf", "join hash hash the fast"),
      HllDoc(4L, "pdf", "the the scan merge window"))
    val in = MemoryStream[HllDoc]
    val out = StreamingSketch.hllRegistersStream(in.toDF(), "text",
      "source")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      // mid-stream: registers equal the batch build of the first feed
      assert(regMap(spark.table("hll_regs").collect()) ===
        batchRegs(docs.take(2).toDF()))
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val fin = regMap(spark.table("hll_regs").collect())
      assert(fin === batchRegs(docs.toDF()))
      // duplicates never inflate a max-register; state <= |sources|*64
      assert(fin.size <= 2 * 64)
    } finally q.stop()
  }

  test("minhash dual: update-mode slots converge to the batch sig table") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      HllDoc(1L, "web", "join scan join hash table"),
      HllDoc(2L, "pdf", "sort merge sort window sort"),
      HllDoc(3L, "web", "join hash hash the fast"),
      HllDoc(4L, "pdf", "the the scan merge window"))
    def batchSig(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      df.select(col("source").as("src"),
          explode(split(graft.operators.TextShingles
            .normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .select(col("src"),
          graft.functions.PolyHashExprs.polyHash(col("word")).as("ph"))
        .withColumn("i", explode(sequence(lit(0L), lit(15L))))
        .select(col("src"), col("i"),
          pmod((col("ph") + col("i")) * lit(2654435761L),
            lit(1000000007L)).as("h"))
        .groupBy(col("src"), col("i")).agg(min(col("h")).as("mh"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    }
    val in = MemoryStream[HllDoc]
    val q = StreamingSketch.minhashSketchStream(in.toDF(), "text",
        "source", numHashes = 16)
      .writeStream.format("memory").queryName("mh_sig")
      .outputMode("complete").start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      assert(regMap(spark.table("mh_sig").collect()) ===
        batchSig(docs.take(2).toDF()))
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val fin = regMap(spark.table("mh_sig").collect())
      assert(fin === batchSig(docs.toDF()))
      assert(fin.size <= 2 * 16)
    } finally q.stop()
  }

  test("register state survives stop/restart: restored maxes, no loss") {
    val root = java.nio.file.Files.createTempDirectory("graft_hll_rec")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
    val half = docs.count() / 2
    val partA = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") < half)
    partA.coalesce(1).write.mode("append").parquet(srcDir)
    def start(name: String) = StreamingSketch.hllRegistersStream(
        graft.sources.KafkaIO.parquetStream(spark, srcDir, docs.schema),
        "text", "source")
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start("hll_rec1")
    q1.processAllAvailable()
    q1.stop()
    assert(regMap(spark.table("hll_rec1").collect()) === batchRegs(partA))
    // new data lands while the query is DOWN
    docs.filter(org.apache.spark.sql.functions.col("doc_id") >= half)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start("hll_rec2")
    q2.processAllAvailable()
    q2.stop()
    // restored registers max-merged with only-new input == batch of all
    assert(regMap(spark.table("hll_rec2").collect()) === batchRegs(docs))
  }
}
