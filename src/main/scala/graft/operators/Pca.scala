package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Principal-component analysis of the embedding corpus — the
  * dimensionality/structure audit of a training-data pipeline (embedding
  * drift, dominant-direction inspection, whitening prep). Computes the
  * dominant principal component of the CENTERED second-moment matrix by
  * power iteration and projects every vector onto it.
  *
  * Exactness discipline (the q193/q225 grid rules, matrix form):
  *  - Vectors quantize per element to an integer grid
  *    (`round(quantScale·x)`), so the second-moment sums are EXACT
  *    BIGINTs — order-independent under any partitioning and
  *    bit-identical across engines.
  *  - The centered matrix is formed WITHOUT division:
  *    C = n·Σqqᵀ − (Σq)(Σq)ᵀ (scaled covariance — same eigenvectors),
  *    all integer; a loud `require` checks every cell fits double-exact
  *    range (2^53) before the one lossless int→double conversion.
  *  - Power iteration runs d-bounded on the driver (the matrix is d×d —
  *    parameter-sized by contract, like the BPE merge table): every
  *    float sum is a FIXED LEFT FOLD (mirrored by `list_reduce` in the
  *    oracle), and after each multiply the vector is rescaled by its
  *    max-abs element and rounded back to the 1e-9 integer grid, so
  *    drift cannot compound across iterations.
  *  - The projection is one fold per row over codegen'd array ops with
  *    the unit eigenvector entering as plan literals.
  *
  * Scale: one narrow scan computes per-partition partial grammians via
  * mapPartitions (d + d(d+1)/2 longs per PARTITION — the legitimate
  * per-partition imperative case, cf. ExactSubstr's dense-rank
  * adjudication: a d²-wide explode/self-join would shuffle N·d² rows
  * where this ships numPartitions·d² longs); the driver folds the
  * partition rows exactly (BigInt, ≤ numPartitions rows by contract).
  * The projection pass is map-only. Nothing else shuffles.
  */
object Pca {

  private def quantized(emb: DataFrame, vecCol: String, idCol: String,
      quantScale: Long): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x =>
        round(lit(quantScale.toDouble) * x.cast("double")).cast("long"))
        .as("q"))

  /** Exact centered second-moment matrix C = n·Σqqᵀ − (Σq)(Σq)ᵀ as
    * double-exact values (loud failure past 2^53) — the per-partition
    * grammian pass described above.
    */
  private def centeredMatrix(qDf: DataFrame, dim: Int)
      : Array[Array[Double]] = {
    val spark = qDf.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val partials = qDf.select(col("q")).as[Array[Long]]
      .mapPartitions { it =>
        var n = 0L
        val s = new Array[Long](dim)
        val g = new Array[Long](tri)
        while (it.hasNext) {
          val q = it.next()
          require(q.length == dim,
            s"embedding length ${q.length} != declared dim $dim")
          n += 1
          var i = 0
          var t = 0
          while (i < dim) {
            s(i) += q(i)
            var j = i
            while (j < dim) { g(t) += q(i) * q(j); t += 1; j += 1 }
            i += 1
          }
        }
        Iterator.single((n, s, g))
      }.collect()
    val n = partials.map(_._1).sum
    require(n > 0, "pca over an empty corpus")
    val sTot = new Array[Long](dim)
    val gTot = new Array[Long](tri)
    partials.foreach { case (_, s, g) =>
      var i = 0
      while (i < dim) { sTot(i) += s(i); i += 1 }
      var t = 0
      while (t < tri) { gTot(t) += g(t); t += 1 }
    }
    val c = Array.ofDim[Double](dim, dim)
    val maxExact = BigInt(1L << 53)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cell = BigInt(n) * gTot(t) - BigInt(sTot(i)) * sTot(j)
        require(cell.abs < maxExact,
          s"covariance cell ($i,$j)=$cell exceeds double-exact range; " +
            "lower quantScale")
        c(i)(j) = cell.toDouble
        c(j)(i) = c(i)(j)
        t += 1
        j += 1
      }
      i += 1
    }
    c
  }

  /** Power iteration on the 1e-9 grid (fixed left folds, max-abs
    * rescale + grid round per iteration); returns the UNIT eigenvector
    * (fold-ordered norm).
    */
  private def dominantUnit(c: Array[Array[Double]], dim: Int,
      iters: Int): Array[Double] = {
    var u = Array.fill(dim)(1000000000L)
    var it = 0
    while (it < iters) {
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * u(j).toDouble; j += 1 }
        v(i) = acc
        i += 1
      }
      var m = 0.0
      v.foreach(x => if (math.abs(x) > m) m = math.abs(x))
      require(m > 0, s"power iteration degenerated at iteration $it " +
        "(zero matrix-vector product)")
      // round half AWAY FROM ZERO (-2.5 -> -3), matching both DuckDB
      // round() and Spark round() — Math.round is half-up toward
      // +infinity (-2.5 -> -2) and would diverge the grid from the
      // q227/q233 oracles on a negative exact-.5 tie
      u = v.map(x => Math.copySign(
        Math.floor(Math.abs(1.0e9 * x / m) + 0.5), x).toLong)
      it += 1
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += u(i).toDouble * u(i).toDouble; i += 1 }
    val norm = math.sqrt(ss)
    u.map(_.toDouble / norm)
  }

  /** Q227: (vec_id, pc1_q) — every vector's projection onto the
    * dominant principal component, in `quantScale⁻¹` units of the
    * original embedding space, grid-rounded.
    */
  def pcaProject(emb: DataFrame, vecCol: String, idCol: String,
      dim: Int = 64, quantScale: Long = 10000L, iters: Int = 12)
      : DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim out of range: $dim")
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    require(quantScale >= 100L && quantScale <= 100000000L,
      s"quantScale out of range: $quantScale")
    val qDf = quantized(emb, vecCol, idCol, quantScale)
    val unit = dominantUnit(centeredMatrix(qDf, dim), dim, iters).toSeq
    qDf.select(col("vec_id"),
      round(aggregate(
        zip_with(col("q"), typedlit(unit), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)).cast("long").as("pc1_q"))
  }

  /** Q237: JOHNSON–LINDENSTRAUSS random projection — reduce the
    * embedding dimension with a seeded Rademacher (±1) matrix
    * (Achlioptas 2003: sign matrices satisfy the JL lemma), the cheap
    * scale path when downstream ops only need distances approximately:
    * ||Rq_a − Rq_b||²/k ≈ ||q_a − q_b||². Signs derive from the
    * parity of md5("j_t")'s first hex digit — NOT the repo's affine
    * mod-hash chain, deliberately: parities of a·x mod p over the
    * dense x = j·k+t grid are LINEARLY structured (measured row dot
    * products up to 62/64 — a near-rank-deficient matrix that
    * destroys the JL property; md5 measures ≤22/64, the true
    * random-matrix scale). Both engines replay md5 identically, so
    * the ENTIRE operator stays exact integer arithmetic — quantized
    * inputs, ±1 literals, BIGINT fold — with zero float ops. One
    * map-only pass, the sign matrix as plan literals.
    *
    * Output: (vec_id, t, y) — k rows per vector, y in quantScale⁻¹
    * units (unscaled: divide by √k for distance-calibrated values).
    */
  def randomProjection(emb: DataFrame, vecCol: String, idCol: String,
      k: Int = 16, dim: Int = 64, quantScale: Long = 10000L)
      : DataFrame = {
    require(k >= 2 && k <= 1024, s"k out of range: $k")
    require(dim >= 2 && dim <= 4096, s"dim out of range: $dim")
    require(quantScale >= 100L && quantScale <= 100000000L,
      s"quantScale out of range: $quantScale")
    val qDf = quantized(emb, vecCol, idCol, quantScale)
    val md = java.security.MessageDigest.getInstance("MD5")
    def signOf(j: Int, t: Int): Long = {
      val d = md.digest(s"${j}_$t".getBytes("UTF-8"))
      1L - 2L * ((d(0) >> 4) & 0x1)
    }
    val signs: Seq[Seq[Long]] = (0 until k).map(t =>
      (0 until dim).map(j => signOf(j, t)))
    qDf.select(col("vec_id") +: signs.zipWithIndex.map { case (sg, t) =>
      aggregate(zip_with(col("q"), typedlit(sg), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as(s"y$t")
    }: _*)
      .select(col("vec_id"), posexplode(array(
        (0 until k).map(t => col(s"y$t")): _*)).as(Seq("t", "y")))
      .select(col("vec_id"), col("t"), col("y"))
  }

  /** Q233: top-R principal components by DEFLATION — after each
    * component, subtract its rank-1 term from the matrix
    * (C' = C − λ·u·uᵀ with λ the fold-ordered Rayleigh numerator
    * uᵀCu over the UNIT vector) and re-run the same grid power
    * iteration; all arithmetic stays the mirrored double chain, so the
    * oracle unrolls R identical blocks. Returns (vec_id, comp,
    * score_q) — comp 0 is the dominant component; projections are one
    * map-only pass with all R unit vectors as plan literals.
    */
  def pcaTopComponents(emb: DataFrame, vecCol: String, idCol: String,
      components: Int = 3, dim: Int = 64, quantScale: Long = 10000L,
      iters: Int = 12): DataFrame = {
    require(components >= 1 && components <= 16,
      s"components out of range: $components")
    require(dim >= 2 && dim <= 4096, s"dim out of range: $dim")
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    require(quantScale >= 100L && quantScale <= 100000000L,
      s"quantScale out of range: $quantScale")
    val qDf = quantized(emb, vecCol, idCol, quantScale)
    val c = centeredMatrix(qDf, dim)
    val units = Seq.newBuilder[Seq[Double]]
    var comp = 0
    while (comp < components) {
      val unit = dominantUnit(c, dim, iters)
      units += unit.toSeq
      if (comp < components - 1) {
        // λ = uᵀ C u, fixed fold order (inner j then outer i)
        var lambda = 0.0
        var i = 0
        while (i < dim) {
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += c(i)(j) * unit(j); j += 1 }
          lambda += unit(i) * acc
          i += 1
        }
        i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) {
            c(i)(j) = c(i)(j) - lambda * unit(i) * unit(j)
            j += 1
          }
          i += 1
        }
      }
      comp += 1
    }
    val all = units.result()
    qDf.select(col("vec_id") +: all.zipWithIndex.map { case (u, r) =>
      round(aggregate(
        zip_with(col("q"), typedlit(u), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)).cast("long").as(s"s$r")
    }: _*)
      .select(col("vec_id"), posexplode(array(
        all.indices.map(r => col(s"s$r")): _*)).as(Seq("comp", "score_q")))
      .select(col("vec_id"), col("comp"), col("score_q"))
  }

}
