package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming KMV (q297's dual): the TypedImperativeAggregate runs AS
  * the streaming aggregation — complete-mode output equals the batch
  * sketch over everything fed so far, and state is one k-slot buffer
  * per source.
  */
case class KmvDoc(source: String, text: String)

class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  test("complete-mode KMV buffers converge to the batch sketch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text"))
      .as[KmvDoc].collect().toSeq
    val in = MemoryStream[KmvDoc]
    val out = StreamingSketch.kmvSketchStream(in.toDF(), "text",
      "source", k = 16)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    def slots(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    def batch(xs: Seq[KmvDoc]) = slots(
      Sketches.kmvSourceSketch(xs.toDF("source", "text"), "text", k = 16)
        .groupBy(col("source"))
        .agg(sort_array(collect_list(col("h"))).as("sk")))
    try {
      val (first, rest) = docs.splitAt(docs.size / 2)
      in.addData(first: _*)
      q.processAllAvailable()
      assert(slots(spark.table("kmv_stream")) === batch(first))
      in.addData(rest: _*)
      q.processAllAvailable()
      val fin = spark.table("kmv_stream")
      assert(slots(fin) === batch(docs))
      // state bound: one row (one buffer) per source
      assert(fin.count() ===
        docs.map(_.source).distinct.size.toLong)
    } finally q.stop()
  }
}
