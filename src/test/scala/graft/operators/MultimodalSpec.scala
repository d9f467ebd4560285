package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media plumbing: binary payloads decode partition-parallel with stable features") {
    val docs = Tables.documents(spark, sf).limit(100)
    val media = Multimodal.withMediaColumn(docs).repartition(7) // prove partition-parallel
    val feats = Multimodal.decodeFeatures(spark, media).cache()
    assert(feats.count() == 100)
    val r = feats.filter($"doc_id" === 0).head()
    // n_bytes must equal utf-8 length of the text
    val expectedLen = docs.filter($"doc_id" === 0)
      .select(length(encode($"text", "UTF-8"))).as[Int].head()
    assert(r.n_bytes == expectedLen.toLong)
    assert(r.width >= 1 && r.height >= 1)
    assert(r.mean_intensity > 0 && r.mean_intensity < 256)
    // deterministic across recomputation
    val again = Multimodal.decodeFeatures(spark, media)
      .filter($"doc_id" === 0).head()
    assert(again == r)
    feats.unpersist()
  }

  test("multimodal join projects text metadata + vector norm") {
    val out = Multimodal.multimodalJoin(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf))
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "n_chars", "label", "vec_norm"))
    assert(out.filter($"vec_norm" <= 0).count() == 0)
  }
}
