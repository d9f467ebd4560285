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
    val spark = emb.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2

    val qDf = emb.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x =>
        round(lit(quantScale.toDouble) * x.cast("double")).cast("long"))
        .as("q"))

    // per-partition partial grammian: one row of (n, Σq, upper-tri Σqqᵀ)
    // per partition — driver table bounded by numPartitions by contract
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

    // C = n·G − s·sᵀ in BigInt, then ONE lossless conversion to double
    // (loud failure if any cell exceeds 2^53 — lower quantScale)
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

    // power iteration on the 1e-9 grid: fixed left folds, max-abs
    // rescale + grid round per iteration (mirrored in the oracle)
    var u = Array.fill(dim)(1000000000L)
    var it = 0
    while (it < iters) {
      val v = new Array[Double](dim)
      var i2 = 0
      while (i2 < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i2)(j) * u(j).toDouble; j += 1 }
        v(i2) = acc
        i2 += 1
      }
      var m = 0.0
      v.foreach(x => if (math.abs(x) > m) m = math.abs(x))
      require(m > 0, s"power iteration degenerated at iteration $it " +
        "(zero matrix-vector product)")
      u = v.map(x => Math.round(1.0e9 * x / m))
      it += 1
    }
    // unit eigenvector: fold-ordered norm, one divide per component
    var ss = 0.0
    var i3 = 0
    while (i3 < dim) { ss += u(i3).toDouble * u(i3).toDouble; i3 += 1 }
    val norm = math.sqrt(ss)
    val unit = u.map(_.toDouble / norm).toSeq

    qDf.select(col("vec_id"),
      round(aggregate(
        zip_with(col("q"), typedlit(unit), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)).cast("long").as("pc1_q"))
  }
}
