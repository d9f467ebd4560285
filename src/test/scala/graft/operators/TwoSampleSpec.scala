package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q289–q296 two-sample / distribution-shift battery: hand-computed
  * references, degenerate-input NaN behavior, and tie-break pins.
  */
class TwoSampleSpec extends SparkSpec {
  import spark.implicits._

  private def li(a: Seq[Long], b: Seq[Long]) =
    (a.map(("R", _)) ++ b.map(("N", _)))
      .toDF("l_returnflag", "l_quantity")

  test("q289 KS: identical groups D=0; planted shift D and location exact") {
    val same = Stats.ks2Sample(li(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Long)].collect().head
    assert(same._3 === 0.0 && same._4 === 1L, s"$same")
    // a=[1,2,3,4], b=[3,4,5,6]: max gap 8/16 = 0.5, first at v=2
    val got = Stats.ks2Sample(li(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Long)].collect().head
    assert(got === ((4L, 4L, 0.5, 2L)), s"$got")
  }

  test("q290 CvM: identical groups T=0; hand-integrated reference") {
    val same = Stats.cramerVonMises(li(Seq(1L, 2L), Seq(1L, 2L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double)].collect().head
    assert(same._3 === 0.0, s"$same")
    // a=[1,2,3,4], b=[3,4,5,6]: Σ tΔ² = 1.375, T = 16/64·1.375
    val got = Stats.cramerVonMises(li(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double)].collect().head
    assert(got === ((4L, 4L, 0.34375)), s"$got")
  }

  test("q294 Cliff's delta: sign, magnitude and CLES from literal pairs") {
    // a=[1,2], b=[2,3]: gt=0, lt=3, eq=1 → δ=−0.75, CLES=0.125
    val got = Stats.cliffsDelta(li(Seq(1L, 2L), Seq(2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got === ((2L, 2L, -0.75, 0.125)), s"$got")
    // symmetry: swapping the groups flips δ, reflects CLES
    val rev = Stats.cliffsDelta(li(Seq(2L, 3L), Seq(1L, 2L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(rev._3 === 0.75 && rev._4 === 0.875, s"$rev")
  }

  test("q291 Wasserstein-1: identical cohorts 0; unit and two-step shifts") {
    def docs(a: Seq[Long], b: Seq[Long]) =
      (a.map(("A", _)) ++ b.map(("B", _))).toDF("c", "v")
    def w1(a: Seq[Long], b: Seq[Long]): Double =
      Stats.wasserstein1(docs(a, b), col("c") === "A", col("v"))
        .as[(Long, Long, Double)].collect().head._3
    assert(w1(Seq(1L, 2L), Seq(1L, 2L)) === 0.0)
    assert(w1(Seq(1L, 2L), Seq(2L, 3L)) === 1.0) // every unit moves 1
    assert(w1(Seq(1L, 1L), Seq(5L, 5L)) === 4.0)
    // asymmetric mass: {1,1,4} vs {4}: F-gaps 2/3 on [1,4) → W1 = 2
    assert(w1(Seq(1L, 1L, 4L), Seq(4L)) === 2.0)
  }

  private def orders(days: Seq[Long], dollars: Seq[Double],
      prio: Seq[String] = Seq.empty) = {
    val p = if (prio.isEmpty) days.map(_ => "1-URGENT") else prio
    days.lazyZip(dollars).lazyZip(p).toSeq
      .map { case (d, r, pp) =>
        (java.time.LocalDate.ofEpochDay(d).toString, r, pp) }
      .toDF("o_orderdate", "o_totalprice", "o_orderpriority")
  }

  test("q292 runs test: hand sequence, all-median NaN degenerate") {
    // daily [1,1,5,5,9]$ → median 500c; drops the 5s; signs 0,0,1 →
    // runs=2, n1=1, n2=2, z = (2 − 7/3)/sqrt(2/9)
    val got = Relational.runsTest(orders(Seq(1L, 2L, 3L, 4L, 5L),
      Seq(1.0, 1.0, 5.0, 5.0, 9.0)))
      .as[(Long, Long, Long, Double)].collect().head
    val z = BigDecimal((2.0 - 7.0 / 3.0) / math.sqrt(2.0 / 9.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === 1L && got._2 === 2L && got._3 === 2L, s"$got")
    assert(math.abs(got._4 - z) < 1e-9, s"z: $got vs $z")
    // constant series: everything equals the median → NaN, no throw
    val const = Relational.runsTest(orders(Seq(1L, 2L, 3L),
      Seq(2.0, 2.0, 2.0))).as[(Long, Long, Long, Double)].collect().head
    assert(const._4.isNaN, s"$const")
  }

  test("q293 Pettitt: planted level shift found at the step day") {
    // [1,1,1,9,9,9] over days 10..15: K=9 at the 3rd day
    val got = Relational.pettittChangePoint(orders(
      (10L to 15L).toSeq, Seq(1.0, 1.0, 1.0, 9.0, 9.0, 9.0)))
      .as[(Long, Long, Long)].collect().head
    assert(got === ((6L, 12L, 9L)), s"$got")
    // constant series: all U_t = 0, earliest day wins the tie
    val flat = Relational.pettittChangePoint(orders(
      (10L to 13L).toSeq, Seq(3.0, 3.0, 3.0, 3.0)))
      .as[(Long, Long, Long)].collect().head
    assert(flat === ((4L, 10L, 0L)), s"$flat")
  }

  test("q295 stump: pure split found with exact zero impurity") {
    val df = (Seq(1L, 1L, 2L).map(("A", _)) ++ Seq(3L, 3L).map(("N", _)))
      .toDF("l_returnflag", "l_quantity")
    val got = Stats.giniStump(df, "l_returnflag", col("l_quantity"),
      Seq("A", "N", "R"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got === ((5L, 2L, 0.0, 0.48)), s"$got")
    // labels outside the declared domain are excluded
    val noisy = df.union(Seq(("X", 9L)).toDF("l_returnflag", "l_quantity"))
    val got2 = Stats.giniStump(noisy, "l_returnflag", col("l_quantity"),
      Seq("A", "N", "R")).as[(Long, Long, Double, Double)].collect().head
    assert(got2 === got, s"$got2")
  }

  test("q300 Hodges-Lehmann: weighted lower median of literal pair diffs") {
    // a=[1,2], b=[2,3]: diffs [-2,-1,-1,0] → median -1
    val got = Stats.hodgesLehmannShift(li(Seq(1L, 2L), Seq(2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long)].collect().head
    assert(got === ((4L, -1L)), s"$got")
    // identical groups: every diff distribution is symmetric around 0
    val same = Stats.hodgesLehmannShift(li(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long)].collect().head
    assert(same === ((9L, 0L)), s"$same")
  }

  test("q301 PACF: hand Durbin-Levinson on an alternating series") {
    // daily [1,2,1,2]$: ρ1=-0.75, ρ2=0.5, ρ3=-0.25 →
    // φ22 = -1/7, φ33 = 1/6
    val got = Relational.pacfDaily(orders(Seq(1L, 2L, 3L, 4L),
      Seq(1.0, 2.0, 1.0, 2.0)))
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 === 4L)
    assert(math.abs(got._2 - (-0.75)) < 2e-6, s"$got")
    assert(math.abs(got._3 - (-1.0 / 7.0)) < 2e-6, s"$got")
    assert(math.abs(got._4 - (1.0 / 6.0)) < 2e-6, s"$got")
  }

  test("q302 per-source KS: disjoint sources are maximally drifted") {
    val df = (Seq(1L, 2L).map(("A", _)) ++ Seq(3L, 4L).map(("B", _)))
      .toDF("source", "v")
    val got = Stats.sourceKsDrift(df, col("source"), col("v"))
      .as[(String, Long, Double, Long)].collect().sortBy(_._1)
    assert(got === Seq(("A", 2L, 1.0, 2L), ("B", 2L, 1.0, 2L)), s"$got")
  }

  test("q303 quantile shift: pure location shift moves every decile equally") {
    val got = Stats.quantileShift(li(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length === 9)
    assert(got.forall(_._4 === -2L), s"${got.toSeq}")
    val same = Stats.quantileShift(li(Seq(1L, 2L), Seq(1L, 2L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Long, Long)].collect()
    assert(same.forall(_._4 === 0L), s"${same.toSeq}")
  }

  test("q304 energy distance: zero iff identical; point masses = 2·distance") {
    def e(a: Seq[Long], b: Seq[Long]): Double =
      Stats.energyDistance(li(a, b), "l_returnflag", col("l_quantity"),
        "R", "N").as[(Long, Long, Double)].collect().head._3
    assert(e(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === 0.0)
    assert(e(Seq(0L, 0L), Seq(2L, 2L)) === 4.0)
  }

  test("q305 Kuiper: sums both one-sided gaps where KS sees only one") {
    def v(a: Seq[Long], b: Seq[Long]) =
      Stats.kuiper2Sample(li(a, b), "l_returnflag", col("l_quantity"),
        "R", "N").as[(Long, Long, Double)].collect().head
    assert(v(Seq(1L, 2L), Seq(1L, 2L))._3 === 0.0)
    assert(v(Seq(1L, 2L), Seq(3L, 4L))._3 === 1.0)
    // a=[1,4] straddles b=[2,3]: D+ = D- = 0.5 → V = 1, KS D = 0.5
    assert(v(Seq(1L, 4L), Seq(2L, 3L))._3 === 1.0)
    val ks = Stats.ks2Sample(li(Seq(1L, 4L), Seq(2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Long)].collect().head
    assert(ks._3 === 0.5)
  }

  test("q306 seasonal MK: monotone fortnight gives S=7, var=7") {
    val got = Relational.seasonalMannKendall(orders(
      (1L to 14L).toSeq, (1 to 14).map(_.toDouble)))
      .as[(Long, Long, Double, Double)].collect().head
    val z = BigDecimal(6.0 / math.sqrt(7.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === 14L && got._2 === 7L && got._3 === 7.0, s"$got")
    assert(math.abs(got._4 - z) < 1e-9, s"z: $got vs $z")
  }

  test("q307 Ljung-Box: brute-force reference; n<=7 answers NaN") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val got = Relational.ljungBox(orders((1L to 10L).toSeq, vals))
      .as[(Long, Double)].collect().head
    // reference from double deviations (scale cancels in ρ)
    val cents = vals.map(_ * 100)
    val m = cents.sum / 10
    val dv = cents.map(_ - m)
    val c0 = dv.map(x => x * x).sum
    val rho = (1 to 7).map(k =>
      (k until 10).map(i => dv(i) * dv(i - k)).sum / c0)
    val q = 10.0 * 12.0 * rho.zipWithIndex
      .map { case (r, i) => r * r / (10.0 - (i + 1)) }.sum
    assert(got._1 === 10L)
    assert(math.abs(got._2 - q) < 1e-3, s"$got vs $q")
    val short = Relational.ljungBox(orders((1L to 4L).toSeq,
      Seq(1.0, 2.0, 1.0, 2.0))).as[(Long, Double)].collect().head
    assert(short._2.isNaN, s"$short")
  }

  test("q308 Mood's median: 2x2 hand table; identical groups chi2=0") {
    // a=[1,2,5,6], b=[3,4,7,8]: pooled median 5; above: a 1, b 2 →
    // chi2 = 8·(1·2−3·2)²/(4·4·3·5) = 128/240
    val got = Stats.moodsMedianTest(li(Seq(1L, 2L, 5L, 6L), Seq(3L, 4L, 7L, 8L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Long, Long, Double)].collect().head
    val chi = BigDecimal(128.0 / 240.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === 4L && got._2 === 4L && got._3 === 1L &&
      got._4 === 2L, s"$got")
    assert(math.abs(got._5 - chi) < 1e-9, s"$got vs $chi")
    val same = Stats.moodsMedianTest(li(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(same._5 === 0.0, s"$same")
  }

  test("q309 Ansari-Bradley: straddling group scores low, z = -sqrt(3)") {
    // a=[1,4] (extremes), b=[2,3] (center): AB=2, E=3, Var=1/3
    val got = Stats.ansariBradley(li(Seq(1L, 4L), Seq(2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    val z = BigDecimal(-math.sqrt(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === 2L && got._2 === 2L && got._3 === 2.0, s"$got")
    assert(math.abs(got._4 - z) < 1e-9, s"$got vs $z")
    // a single distinct value: Var = 0 → NaN, no throw
    val flat = Stats.ansariBradley(li(Seq(5L, 5L), Seq(5L, 5L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(flat._4.isNaN, s"$flat")
  }

  test("q296 PSI: hand mix shift; stable mix gives PSI=0") {
    // days 1-2: 10×P1 + 10×P2; days 3-4: 5×P1 + 15×P2
    val d1 = Seq.fill(10)(1L) ++ Seq.fill(10)(2L)
    val p1 = Seq.fill(10)("P1") ++ Seq.fill(10)("P2")
    val d2 = Seq.fill(5)(3L) ++ Seq.fill(15)(4L)
    val p2 = Seq.fill(5)("P1") ++ Seq.fill(15)("P2")
    val got = Relational.psiPriorityShift(orders(d1 ++ d2,
      Seq.fill(40)(1.0), p1 ++ p2))
      .as[(Long, Long, Long, Double)].collect().head
    val psi = BigDecimal(0.25 * math.log(2.0) +
      -0.25 * math.log(2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === 20L && got._2 === 20L && got._3 === 2L, s"$got")
    assert(math.abs(got._4 - psi) < 1e-9, s"psi: $got vs $psi")
    val same = Relational.psiPriorityShift(orders(d1 ++ d1.map(_ + 2L),
      Seq.fill(40)(1.0), p1 ++ p1))
      .as[(Long, Long, Long, Double)].collect().head
    assert(same._4 === 0.0, s"$same")
  }

  test("q311 Anderson-Darling: identical groups 0; hand-summed shift") {
    val same = Stats.andersonDarling2(li(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double)].collect().head
    assert(same._3 === 0.0, s"$same")
    // a=[1,2,3,4], b=[3,4,5,6]: Σ t·D²/(16·H(8−H)) over the first five
    // blocks = 1/7 + 1/3 + 1/2 + 2/3 + 1/7 = 1.785714 on the 1e9 grid
    val got = Stats.andersonDarling2(
      li(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double)].collect().head
    assert(got === ((4L, 4L, 1.785714)), s"$got")
  }

  test("q312 Jonckheere-Terpstra: hand trend, tie-corrected variance") {
    // g1=[1,2], g2=[2,3], g3=[3,4]: JT = 3.5 + 4 + 3.5 = 11,
    // E = 6, Var = 420/72 + 0 + 24/240 = 5.9333, z = 2.052677
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L),
      (3L, 4L)).toDF("g", "v")
    val got = Stats.jonckheereTerpstra(df, col("g"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got === ((3L, 6L, 11.0, 2.052677)), s"$got")
    // reversing the group order flips the trend's sign
    val rev = Stats.jonckheereTerpstra(df, -col("g"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(rev._4 === -2.052677, s"$rev")
  }

  test("q313 Lepage: identical groups give z=0 components and L=0") {
    val same = Stats.lepage(li(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(same === ((3L, 3L, 0.0, 0.0, 0.0)), s"$same")
    // one distinct value: both variances degenerate -> NaN
    val flat = Stats.lepage(li(Seq(5L, 5L), Seq(5L, 5L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(flat._5.isNaN, s"$flat")
    // single pooled row (nn=1): the tie-correction divisor nn(nn-1) is
    // 0 — must answer NaN, not an ANSI divide-by-zero (ADVICE r17)
    val one = Stats.lepage(li(Seq(5L), Seq.empty),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(one._1 === 1L && one._2 === 0L &&
      one._3.isNaN && one._4.isNaN && one._5.isNaN, s"$one")
  }

  test("q314 Cucconi: no-tie hand case lands exactly on C=0.3") {
    // a=[1,3], b=[2,4]: U=20, V=10, E=15, Var=43, rho=-121/129 ->
    // U*=5/sqrt(43), V*=-U*, C=0.3 exactly
    val got = Stats.cucconi(li(Seq(1L, 3L), Seq(2L, 4L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got === ((2L, 2L, 0.762493, -0.762493, 0.3)), s"$got")
  }

  test("q315 Cochran-Armitage: hand trend z=2; flat rate z=0") {
    def df(rows: Seq[(Long, Long)]) = rows.toDF("s", "y")
    // s=1: 0/2, s=2: 1/2, s=3: 2/2 -> T=2, Var=1, z=2
    val got = Stats.cochranArmitage(df(Seq((1L, 0L), (1L, 0L), (2L, 1L),
      (2L, 0L), (3L, 1L), (3L, 1L))), col("s"), col("y"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got === ((3L, 6L, 3L, 2.0, 2.0)), s"$got")
    val flat = Stats.cochranArmitage(df(Seq((1L, 1L), (1L, 0L), (2L, 1L),
      (2L, 0L))), col("s"), col("y"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(flat._4 === 0.0 && flat._5 === 0.0, s"$flat")
  }

  test("q316 McNemar: discordant hand counts; no-discordant NaN") {
    def df(rows: Seq[(Long, Long)]) = rows.toDF("x", "y")
    val got = Stats.mcnemar(df(Seq((1L, 0L), (1L, 0L), (1L, 0L),
      (0L, 1L), (1L, 1L), (1L, 1L), (0L, 0L))), col("x"), col("y"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got === ((7L, 3L, 1L, 1.0, 0.25)), s"$got")
    val none = Stats.mcnemar(df(Seq((1L, 1L), (0L, 0L))),
      col("x"), col("y"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(none._4.isNaN && none._5.isNaN, s"$none")
  }

  test("q317 Brunner-Munzel: identical groups 0; scipy-checked shift") {
    val same = Stats.brunnerMunzel(li(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(same._3 === 0.5 && same._4 === 0.0, s"$same")
    // a=[1,2,3,4], b=[3,4,5,6]: pooled means 3 vs 6, Sx=Sy=0.5,
    // sig=4 -> p_hat = 0.875, W = 16·3/(8·2) = 3
    val got = Stats.brunnerMunzel(
      li(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)),
      "l_returnflag", col("l_quantity"), "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got === ((4L, 4L, 0.875, 3.0)), s"$got")
  }
}
