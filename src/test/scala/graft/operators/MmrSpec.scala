package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q164 MMR diversified top-k: the diversity property it exists for, the
  * λ=1 degeneration to plain relevance ranking, and grid determinism.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def emb: org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")

  test("mmr interleaves a diverse cluster plain top-k would bury") {
    // probe at e1; cluster A = three near-copies of the probe (rel ~1,
    // mutual sim ~1); cluster B rotated toward e2 (rel ~0.8, mutual sim
    // ~1). Plain top-3 = all of A. With a diversity-heavy λ = 0.3 the
    // near-copy penalty (~λ·rel − (1−λ)·1) buries A's clones and MMR
    // must alternate clusters: A, B, A, B.
    def v(x: Double, y: Double): Seq[Float] =
      Seq(x.toFloat, y.toFloat, 0.0f, 0.0f)
    val probe = Seq((0L, v(1.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, v(1.0, 0.0)),
      (10L, v(1.0, 0.01)), (11L, v(1.0, 0.02)), (12L, v(1.0, 0.03)),
      (20L, v(0.8, 0.6)), (21L, v(0.8, 0.61)), (22L, v(0.8, 0.62)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(corpus, probe, k = 4, c = 6, lambdaNum = 3)
      .orderBy(col("rank")).select(col("vec_id")).as[Long].collect()
    assert(got(0) === 10L, s"rank 1 must be the plain argmax: ${got.toSeq}")
    assert(got(1) >= 20L,
      s"rank 2 must jump to the diverse cluster: ${got.toSeq}")
    // once one B is in, B's own clones are equally penalized and A's
    // higher relevance wins again — the exact grid sequence is
    // deterministic, so pin it (plain top-4 would be 10,11,12,20)
    assert(got.toSeq === Seq(10L, 22L, 12L, 11L), s"got ${got.toSeq}")
  }

  test("lambda = 1.0 degenerates to plain relevance order on the grid") {
    val probes = emb.filter(col("vec_id") < 3)
    val got = Similarity.mmrTopK(emb, probes, k = 8, c = 24, lambdaNum = 10)
      .select(col("probe_id"), col("rank"), col("vec_id"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // independent mini-reference: pool by raw ordering, then micro-grid
    // relevance sort (ties to the smaller id) — the λ=1 greedy collapses
    // to exactly this
    val expect = Similarity.windowTopK(emb, probes, 24)
      .select(col("probe_id"), col("vec_id"), col("sim"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues { rows =>
        rows.map { case (_, id, s) =>
          val rel = BigDecimal(s * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          (id, rel)
        }.sortBy { case (id, rel) => (-rel, id) }.take(8).map(_._1).toSeq
      }.toMap
    assert(got === expect)
  }

  test("mmr output is partition-invariant (grid determinism)") {
    val probes = emb.filter(col("vec_id") < 3)
    val a = Similarity.mmrTopK(emb, probes, k = 8, c = 24)
    val b = Similarity.mmrTopK(emb.repartition(13), probes, k = 8, c = 24)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
