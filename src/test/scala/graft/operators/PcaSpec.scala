package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA projection (q227): straight-line reference parity on an inline
  * corpus, dominant-variance property and repartition invariance on
  * real embeddings, and the guards.
  */
class PcaSpec extends SparkSpec {

  /** Single-threaded replica of Pca.pcaProject — same grids, same
    * fold orders.
    */
  private def reference(vecs: Seq[(Long, Array[Float])], dim: Int,
      qs: Long, iters: Int): Map[Long, Long] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => Math.round(qs.toDouble * x.toDouble))
    }
    val n = q.size.toLong
    val s = new Array[Long](dim)
    val g = Array.ofDim[Long](dim, dim)
    q.foreach { case (_, v) =>
      for (i <- 0 until dim) {
        s(i) += v(i)
        for (j <- i until dim) g(i)(j) += v(i) * v(j)
      }
    }
    val c = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      c(i)(j) = (BigInt(n) * g(i)(j) - BigInt(s(i)) * s(j)).toDouble
      c(j)(i) = c(i)(j)
    }
    var u = Array.fill(dim)(1000000000L)
    for (_ <- 0 until iters) {
      val v = (0 until dim).map { i =>
        var acc = 0.0
        for (j <- 0 until dim) acc += c(i)(j) * u(j).toDouble
        acc
      }
      val m = v.map(math.abs).max
      u = v.map(x => Math.round(1.0e9 * x / m)).toArray
    }
    var ss = 0.0
    for (i <- 0 until dim) ss += u(i).toDouble * u(i).toDouble
    val unit = u.map(_.toDouble / math.sqrt(ss))
    q.map { case (id, v) =>
      var acc = 0.0
      for (j <- 0 until dim) acc += v(j).toDouble * unit(j)
      id -> Math.round(acc)
    }.toMap
  }

  test("projection matches the straight-line reference (dim 4)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map { id =>
      // correlated structure: dominant direction ~(1, 1, 0.2, -0.1)
      val a = rnd.nextFloat() - 0.5f
      id -> Array(a + 0.02f * rnd.nextFloat(), a - 0.02f * rnd.nextFloat(),
        0.2f * a + 0.05f * rnd.nextFloat(), -0.1f * a)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Pca.pcaProject(df, "embedding", "vec_id", dim = 4,
        quantScale = 1000L, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(vecs, 4, 1000L, 8))
  }

  test("pc1 variance dominates every coordinate axis on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val proj = Pca.pcaProject(emb, "embedding", "vec_id")
      .collect().map(_.getLong(1).toDouble)
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    val vPc = variance(proj.toSeq)
    // per-axis variance in the same q units
    val qRows = emb.select(transform(col("embedding"), x =>
        round(lit(10000.0) * x.cast("double")).cast("long")).as("q"))
      .collect().map(_.getSeq[Long](0))
    val axisVars = (0 until 64).map(i =>
      variance(qRows.map(_(i).toDouble).toSeq))
    assert(vPc >= axisVars.max,
      s"pc1 variance $vPc below best axis ${axisVars.max}")
  }

  test("repartition-invariant and rerun-deterministic") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = Pca.pcaProject(emb, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Pca.pcaProject(emb.repartition(13), "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("top components: comp 0 equals pc1; components near-orthogonal") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val comps = Pca.pcaTopComponents(emb, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pc1 = Pca.pcaProject(emb, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val byComp = comps.groupBy(_._2).view
      .mapValues(_.map(t => t._1 -> t._3).toMap).toMap
    assert(byComp.keySet === Set(0, 1, 2))
    assert(byComp(0) === pc1)
    // (the synthetic embeddings are near-isotropic — eigengap ~1% —
    // so strict variance ORDERING is asserted on crafted anisotropic
    // data below; here deflation's near-orthogonality is the check)
    def corr(a: Map[Long, Long], b: Map[Long, Long]): Double = {
      val ids = a.keys.toSeq
      val xa = ids.map(a(_).toDouble); val xb = ids.map(b(_).toDouble)
      val ma = xa.sum / xa.size; val mb = xb.sum / xb.size
      val cov = ids.indices.map(i => (xa(i) - ma) * (xb(i) - mb)).sum
      cov / math.sqrt(xa.map(x => (x - ma) * (x - ma)).sum *
        xb.map(x => (x - mb) * (x - mb)).sum)
    }
    // 0.15 not 0.05: with a ~1% eigengap 12 power iterations return a
    // direction slightly off the true eigenvector, so deflation leaves
    // a residual correlation of that size (measured 0.10 here)
    assert(math.abs(corr(byComp(0), byComp(1))) < 0.15)
    assert(math.abs(corr(byComp(0), byComp(2))) < 0.15)
    assert(math.abs(corr(byComp(1), byComp(2))) < 0.15)
  }

  test("top components: variance ordering on anisotropic data") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // axis variances ~ 100 : 10 : 1 : 0.1 along rotated directions
    val vecs = (0L until 120L).map { id =>
      val a = (rnd.nextFloat() - 0.5f) * 2f
      val b = (rnd.nextFloat() - 0.5f) * 0.6f
      val c = (rnd.nextFloat() - 0.5f) * 0.2f
      val d = (rnd.nextFloat() - 0.5f) * 0.06f
      id -> Array(a + d, a - d, b + c, b - c)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val comps = Pca.pcaTopComponents(df, "embedding", "vec_id",
        components = 3, dim = 4, quantScale = 10000L, iters = 30)
      .collect().map(r => (r.getInt(1), r.getLong(2).toDouble))
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    val v = (0 to 2).map(c =>
      variance(comps.filter(_._1 == c).map(_._2).toSeq))
    assert(v(0) > v(1) && v(1) > v(2), s"variances not ordered: $v")
  }

  test("random projection: exact integer fold, JL distances preserved") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val proj = Pca.randomProjection(emb, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byVec = proj.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    // straight-line check on one vector
    val qRows = emb.select(col("vec_id"), transform(col("embedding"),
        x => round(lit(10000.0) * x.cast("double")).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val someId = qRows.keys.head
    val q = qRows(someId)
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 16).foreach { t =>
      val want = (0 until 64).map { j =>
        val d = md.digest(s"${j}_$t".getBytes("UTF-8"))
        q(j) * (1L - 2L * ((d(0) >> 4) & 0x1))
      }.sum
      assert(byVec(someId)(t) == want, s"t=$t")
    }
    // JL property: projected distance^2 / k tracks the original
    // distance^2 within a generous constant for sampled pairs
    val ids = qRows.keys.toSeq.sorted.take(20)
    for (a <- ids.take(5); b <- ids.drop(5).take(10)) {
      val d2 = (0 until 64).map(j =>
        (qRows(a)(j) - qRows(b)(j)).toDouble).map(x => x * x).sum
      val p2 = (0 until 16).map(t =>
        (byVec(a)(t) - byVec(b)(t)).toDouble).map(x => x * x).sum / 16.0
      // k=16 is a loose sketch (Var(p2/d2) ~ 2/k); the band checks
      // distance preservation, not tight JL concentration
      assert(p2 > d2 / 3.0 && p2 < d2 * 3.0,
        s"pair ($a,$b): d2=$d2 p2=$p2")
    }
  }

  test("guards: wrong declared dim fails loudly; parameter ranges") {
    import spark.implicits._
    val df = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pca.pcaProject(df, "embedding", "vec_id", dim = 4).collect()
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] {
      Pca.pcaProject(df, "embedding", "vec_id", dim = 1)
    }
    intercept[IllegalArgumentException] {
      Pca.pcaProject(df, "embedding", "vec_id", dim = 2, quantScale = 1L)
    }
  }
}
