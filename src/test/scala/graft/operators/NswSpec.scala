package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q186 NSW graph ANN: exhaustive-parameter exactness, measured recall
  * vs brute force on sf0.001 embeddings, and partition invariance.
  */
class NswSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.Tables.embeddings(spark, sf)
  private def probes = emb.filter(col("vec_id") < 10)

  test("one cell + ef >= corpus: beam search degenerates to exact top-k") {
    // nCentroids=1 puts everything in one graph; ef=600 > corpus keeps
    // every visited node, and NSW search starting anywhere reaches the
    // whole connected graph -> must equal brute force exactly
    val nsw = Nsw.nswTopK(emb, probes, k = 10, nCentroids = 1, nProbe = 1,
      m = 8, ef = 600)
      .select("probe_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    val bf = Similarity.bruteForceTopK(emb, probes, k = 10)
      .select("probe_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(nsw === bf, s"nsw-only=${(nsw -- bf).take(5)}")
  }

  test("measured recall@10 at the q32 operating point clears the floor") {
    val nsw = Nsw.nswTopK(emb, probes, k = 10, nCentroids = 16, nProbe = 4,
      m = 8, ef = 32)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(emb, probes, k = 10)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (bf & nsw).size.toDouble / bf.size
    info(f"nsw recall@10 vs brute force: $recall%.3f")
    assert(recall >= 0.4, s"recall $recall under the q186 floor")
  }

  test("nsw output is partition-invariant") {
    val a = Nsw.nswTopK(emb, probes, 10, 16, 4, 8, 32)
    val b = Nsw.nswTopK(emb.repartition(9), probes, 10, 16, 4, 8, 32)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("validated gate emits the exact rows and an in-band flag") {
    val v = Nsw.nswTopKValidated(emb, probes, 10)
    val flags = v.select("recall_ok").distinct().as[Int].collect().toSeq
    assert(flags === Seq(1), s"recall_ok=$flags")
    val rows = v.select("probe_id", "vec_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(emb, probes, 10)
      .select("probe_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(rows === bf)
  }
}
