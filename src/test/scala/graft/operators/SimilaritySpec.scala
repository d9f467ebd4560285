package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val probes = emb.filter($"vec_id" < 5)

  test("aggregate top-k equals window-rank top-k exactly") {
    val a = Similarity.bruteForceTopK(emb, probes, 10)
      .orderBy("probe_id", "rank").collect().toSeq
    val b = Similarity.windowTopK(emb, probes, 10)
      .orderBy("probe_id", "rank").collect().toSeq
    assert(a == b)
  }

  test("top-1 of a probe against itself-included corpus is near-identical vector") {
    // probe 0 vs corpus including an exact duplicate of itself under a new id
    val dup = emb.filter($"vec_id" === 0)
      .withColumn("vec_id", lit(9999L))
    val corpus = emb.unionByName(dup)
    val top = Similarity.bruteForceTopK(corpus, probes.filter($"vec_id" === 0), 1)
      .select("vec_id", "sim").as[(Long, Double)].head()
    assert(top._1 == 9999L && math.abs(top._2 - 1.0) < 1e-9)
  }

  test("IVF top-k: cell-pruned search recovers most true top-1 neighbors") {
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(emb, probes, 10, nCentroids = 8, nProbe = 4)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    assert(ivf.size == exact.size)
    val hits = ivf.count { case (p, v) => exact.get(p).contains(v) }
    assert(hits >= 3, s"IVF recall@1 was $hits/${ivf.size}")
    // every reported sim must equal the exact cosine (no approximation in scoring)
    val anyRow = Similarity.ivfTopK(emb, probes, 10, nCentroids = 8, nProbe = 4)
      .filter($"sim" > 1.0 + 1e-9)
    assert(anyRow.count() == 0)
  }

  test("LSH top-k: bucketed results are a subset of brute-force scoring with decent top-1 recall") {
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    val approx = Similarity.lshTopK(emb, probes, 10, dim = 64, bits = 4, tables = 16)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    // every probe must return candidates from its cells
    assert(approx.size == exact.size)
    // OR-amplified LSH (12 tables × 6 bits) should recover most true top-1s
    val hits = approx.count { case (p, v) => exact.get(p).contains(v) }
    assert(hits >= 3, s"LSH recall@1 was $hits/${approx.size}")
  }
}
