package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HITS (q278) and degree assortativity (q279): grid-exact one-round
  * hand references, symmetry invariants, and brute-force Pearson
  * cross-checks.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("q278 HITS one round: hand-computed grid scores on a tiny web") {
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("src", "dst")
    val got = Graph.hitsScores(e, "src", "dst", iters = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // ar: 10 -> 2e6, 11/12 -> 1e6; am = 2e6 -> a(10)=1e6, a(11/12)=5e5
    assert(got(10L) === ((0L, 1000000L)))
    assert(got(11L) === ((0L, 500000L)))
    assert(got(12L) === ((0L, 500000L)))
    // hr: 1 -> 1e6+5e5+5e5 = 2e6, 2 -> 1e6; hm = 2e6
    assert(got(1L) === ((1000000L, 0L)))
    assert(got(2L) === ((500000L, 0L)))
  }

  test("q278 HITS: symmetric complete bipartite graph scores all-equal") {
    val e = (for { u <- Seq(1L, 2L); v <- Seq(10L, 11L) } yield (u, v))
      .toDF("src", "dst")
    val got = Graph.hitsScores(e, "src", "dst", iters = 3)
      .as[(Long, Long, Long)].collect()
    got.foreach { r =>
      if (r._1 < 10) assert(r._2 === 1000000L && r._3 === 0L, s"$r")
      else assert(r._2 === 0L && r._3 === 1000000L, s"$r")
    }
  }

  test("q279 assortativity: star = -1, regular cycle = NaN, brute Pearson") {
    def assort(pairs: Seq[(Long, Long)]): Double =
      Graph.degreeAssortativity(pairs.toDF("a", "b"), "a", "b")
        .select(col("assortativity")).as[Double].collect().head
    assert(assort(Seq((0L, 1L), (0L, 2L), (0L, 3L))) === -1.0)
    assert(assort(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))).isNaN)
    // mixed graph vs brute-force Pearson over directed orientations
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L))
    val und = pairs.flatMap(p => Seq(p, p.swap)).distinct
    val deg = und.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    val xs = und.map(e => deg(e._1).toDouble)
    val ys = und.map(e => deg(e._2).toDouble)
    val m = und.size
    val num = m * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum
    val den = math.sqrt(m * xs.map(a => a * a).sum - xs.sum * xs.sum) *
      math.sqrt(m * ys.map(b => b * b).sum - ys.sum * ys.sum)
    assert(math.abs(assort(pairs) - num / den) < 1e-6)
  }
}
