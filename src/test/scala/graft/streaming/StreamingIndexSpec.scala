package graft.streaming

import graft.SparkSpec
import graft.operators.{TextAnalysis, TextShingles}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental inverted-index maintenance: the SAME bounded smallest-k
  * aggregation that builds the batch index (q100) runs as an update-mode
  * streaming aggregation — new documents fold into per-token df counts and
  * capped postings without recomputing the index, because both aggregates
  * are mergeable (count; sorted k-slot buffer). After all batches the live
  * view equals the batch build over the union of inputs.
  */
class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode index equals the batch build after incremental batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDS().toDF("doc_id", "text")
    val smallestK = udaf(new TextAnalysis.SmallestKLongsAgg(20))
    val out = docs
      .select($"doc_id", explode(array_distinct(
        split(TextShingles.normalize($"text"), " "))).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count(lit(1)).as("df"), smallestK($"doc_id").as("postings"))
    val q = out.writeStream.format("memory").queryName("live_index")
      .outputMode("update").start()
    try {
      val batch1 = Seq((5L, "apple banana apple"), (3L, "apple cherry"))
      val batch2 = Seq((1L, "apple  banana"), (9L, "banana solo"))
      in.addData(batch1.toIndexedSeq); q.processAllAvailable()
      in.addData(batch2.toIndexedSeq); q.processAllAvailable()
      // update mode re-emits changed rows; latest state per token wins
      val live = spark.table("live_index")
        .groupBy($"token")
        .agg(max(struct($"df", $"postings")).as("s"))
        .select($"token", $"s.df", array_join($"s.postings", ",").as("p"))
        .as[(String, Long, String)].collect().toSet
      val batch = TextAnalysis.invertedIndex(
        (batch1 ++ batch2).toDF("doc_id", "text"), "text", "doc_id",
        minDf = 1L, cap = 20)
        .as[(String, Long, String)].collect().toSet
      assert(live == batch && live.nonEmpty)
      assert(live.contains(("apple", 3L, "1,3,5")))
    } finally q.stop()
  }
}
