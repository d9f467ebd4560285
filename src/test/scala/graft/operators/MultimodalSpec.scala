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

  test("resize: deterministic pixel buffer sized to target dims") {
    val media = Multimodal.withMediaColumn(Tables.documents(spark, sf).limit(20))
    val resized = Multimodal.resize(spark, media, 8, 8).collect()
    assert(resized.length == 20)
    resized.foreach { r =>
      assert(r.width == 8 && r.height == 8)
      assert(r.pixels.nonEmpty && r.pixels.length <= 64)
    }
    val again = Multimodal.resize(spark, media, 8, 8).collect()
    assert(resized.map(_.pixels.toSeq).toSet == again.map(_.pixels.toSeq).toSet)
  }

  test("frame sampling fans one payload out to ordered frame rows") {
    val media = Multimodal.withMediaColumn(Tables.documents(spark, sf).limit(5))
    val frames = Multimodal.frameSample(spark, media, frameBytes = 32, every = 2)
      .collect().groupBy(_.doc_id)
    assert(frames.size == 5)
    frames.values.foreach { fs =>
      val idxs = fs.map(_.frame_idx).sorted.toSeq
      assert(idxs == idxs.distinct && idxs.forall(_ % 2 == 0))
      fs.foreach(f => assert(f.data.length <= 32 && f.offset == f.frame_idx * 32L))
    }
  }

  test("multimodal join projects text metadata + vector norm") {
    val out = Multimodal.multimodalJoin(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf))
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "n_chars", "label", "vec_norm"))
    assert(out.filter($"vec_norm" <= 0).count() == 0)
  }
}
