package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resampling inference (q344/q345): the full deterministic chains —
  * seeded-hash uniforms, Poisson inverse-CDF weights, hash-parity
  * permutation sides — recomputed in plain Scala and matched EXACTLY
  * against the engine (the chains are integer arithmetic + one double
  * divide, so equality is bitwise, not approximate), plus directional
  * sanity pins.
  */
class ResamplingSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def hashChain(gid: Long): Long =
    ((gid % 1000003L) * 2654435761L) >> 16

  private def uniform(gid: Long): Double =
    ((hashChain(gid) % 1048576L) + 1L).toDouble / 1048577.0

  // percentile_disc(p): smallest value whose cume_dist >= p
  private def pctDisc(sorted: Seq[Double], p: Double): Double =
    sorted(math.ceil(p * sorted.size).toInt.max(1) - 1)

  test("q344 bootstrap CI: bitwise-equal to the Scala replay; brackets the mean") {
    val rows = (1 to 40).map(i => (i.toLong, 10.0 + (i % 7) * 3.5))
    val orders = rows.toDF("o_orderkey", "o_totalprice")
    val got = Resampling.bootstrapMeanCi(orders, bReps = 64)
      .as[(Long, Long, Double, Double, Double)].collect().head
    // replay: per (row, b) Poisson(1) weight from the inverse CDF
    val cents = rows.map { case (k, p) => k -> math.round(100.0 * p) }
    val means = (1L to 64L).map { b =>
      val ws = cents.map { case (k, x) =>
        val u = uniform(k * 67L + b)
        val w =
          if (u < 0.3678794412) 0L else if (u < 0.7357588823) 1L
          else if (u < 0.9196986029) 2L else if (u < 0.9810118431) 3L
          else 4L
        (w, w * x)
      }
      ws.map(_._2).sum.toDouble / ws.map(_._1).sum.toDouble
    }.sorted
    val mean = cents.map(_._2).sum.toDouble / cents.size
    val want = (64L, 40L, r6(mean),
      r6(pctDisc(means, 0.025)), r6(pctDisc(means, 0.975)))
    assert(got === want, s"$got vs $want")
    assert(got._4 <= got._3 && got._3 <= got._5, s"CI brackets mean: $got")
  }

  test("q345 permutation test: bitwise-equal replay; effect direction") {
    def li(rows: Seq[(Long, Long, String, Double)]) =
      rows.toDF("l_orderkey", "l_linenumber", "l_returnflag",
        "l_extendedprice")
    // no-effect data: identical value mix in both groups -> p well
    // above the add-one floor
    val flat = (1 to 30).map { i =>
      (i.toLong, 1L, if (i % 2 == 0) "R" else "N",
        50.0 + (i % 5) * 2.0)
    }
    val gotFlat = Resampling.permutationMeanTest(li(flat), nPerms = 100)
      .as[(Long, Long, Double, Long, Double)].collect().head
    assert(gotFlat._4 === 100L)
    assert(gotFlat._5 > 0.2, s"flat p: $gotFlat")
    // planted effect: R pays double -> tiny p (the add-one floor is
    // 1/101); replay the whole chain
    val eff = (1 to 30).map { i =>
      val g = if (i % 2 == 0) "R" else "N"
      (i.toLong, 1L, g, if (g == "R") 100.0 + i else 50.0 + i)
    }
    val got = Resampling.permutationMeanTest(li(eff), nPerms = 100)
      .as[(Long, Long, Double, Long, Double)].collect().head
    val base = eff.map { case (k, ln, g, p) =>
      (k * 10L + ln, g, math.round(100.0 * p)) }
    val nA = base.count(_._2 == "R").toLong
    val nB = base.count(_._2 == "N").toLong
    val obs = base.filter(_._2 == "R").map(_._3).sum.toDouble / nA -
      base.filter(_._2 == "N").map(_._3).sum.toDouble / nB
    val ge = (1L to 100L).count { s =>
      val sides = base.map { case (k, _, x) =>
        ((hashChain(k * 131L + s) % 2L), x) }
      val (s1, n1) = (sides.filter(_._1 == 1L).map(_._2).sum,
        sides.count(_._1 == 1L))
      val (s0, n0) = (sides.filter(_._1 == 0L).map(_._2).sum,
        sides.count(_._1 == 0L))
      val diff = s1.toDouble / n1 - s0.toDouble / n0
      math.abs(diff) >= math.abs(obs)
    }
    val want = (nA, nB, r6(obs), 100L, r6((1.0 + ge) / 101.0))
    assert(got === want, s"$got vs $want")
    assert(got._5 <= 0.05, s"planted effect p: $got")
  }

  test("q345 determinism: identical result on a re-run") {
    val rows = (1 to 20).map { i =>
      (i.toLong, 1L, if (i % 2 == 0) "R" else "N", 10.0 + i)
    }
    val df = rows.toDF("l_orderkey", "l_linenumber", "l_returnflag",
      "l_extendedprice")
    val a = Resampling.permutationMeanTest(df, nPerms = 50)
      .collect().toSeq.map(_.toSeq)
    val b = Resampling.permutationMeanTest(df, nPerms = 50)
      .collect().toSeq.map(_.toSeq)
    assert(a === b)
  }
}
