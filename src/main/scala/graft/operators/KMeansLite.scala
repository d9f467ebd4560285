package graft.operators

/** Minimal Lloyd's k-means over L2-normalized vectors (spherical k-means),
  * run driver-side on a bounded sample — the coarse quantizer for
  * [[Similarity.ivfTopK]]. Deterministic: seeded initialization, fixed
  * iteration count. Deliberately dependency-free (no MLlib) so the IVF
  * operator stays a pure column-expression pipeline plus this tiny
  * training step.
  */
object KMeansLite {

  private def normalize(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0) v else v.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Returns `k` L2-normalized centroids (fewer if the sample is smaller). */
  def fit(sample: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    val dim = sample.head.length
    val data = sample.map(normalize)
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, data.length)
    var centroids = rnd.shuffle(data.indices.toList).take(kk).map(data).toArray

    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      data.foreach { v =>
        var best = 0; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < kk) {
          val s = dot(v, centroids(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cluster's centroid
        else normalize(sums(c))
      }
    }
    centroids
  }

  /** Standard (non-spherical) Lloyd's: argmin-L2 assignment, mean update,
    * NO normalization — the product-quantization codebook trainer, where
    * codewords must approximate raw subvectors (a normalized codeword
    * would systematically overshoot short subvectors and break the ADC
    * inner-product identity). Deterministic like [[fit]].
    */
  def fitL2(sample: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, sample.length)
    var centroids = rnd.shuffle(sample.indices.toList).take(kk).map(sample).toArray

    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      sample.foreach { v =>
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < kk) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }
}
