package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hypothesis tests (q269–q272): known-answer references computed by
  * hand, invariance pins (shift/scale behavior, independence → zero
  * association), and boundary cases (equal groups → t = 0).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def groups(a: Seq[Double], b: Seq[Double]) =
    (a.map(("A", _)) ++ b.map(("B", _)))
      .toDF("g", "x")

  test("q269 Welch: identical groups give t=0; known reference matches") {
    val eq = Stats.welchTTest(
      groups(Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0, 2.0, 3.0, 4.0)),
      "g", "x", "A", "B")
      .select(col("t_stat")).as[Double].collect().head
    assert(eq === 0.0)
    // hand reference: a = [1,2,3,4,5], b = [2,4,6,8,10] (dollars)
    val got = Stats.welchTTest(
      groups(Seq(1, 2, 3, 4, 5).map(_.toDouble),
        Seq(2, 4, 6, 8, 10).map(_.toDouble)), "g", "x", "A", "B")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    // cents: a mean 300 var 25000; b mean 600 var 100000
    val se1 = 25000.0 / 5; val se2 = 100000.0 / 5
    val t = (300.0 - 600.0) / math.sqrt(se1 + se2)
    val df = math.pow(se1 + se2, 2) /
      (se1 * se1 / 4 + se2 * se2 / 4)
    assert(got._1 === 5L && got._2 === 5L)
    assert(math.abs(got._5 - t) < 1e-6, s"t: $got vs $t")
    assert(math.abs(got._6 - df) < 1e-3, s"df: $got vs $df")
  }

  test("q270 ANOVA: equal group means give F=0; known 3-group reference") {
    val flat = Stats.anovaF(
      groups(Seq(1.0, 2.0, 3.0), Seq(2.0, 1.0, 3.0)), "g", "x")
      .select(col("f_stat")).as[Double].collect().head
    assert(flat === 0.0)
    // three groups, textbook one-way: [1,2,3], [2,3,4], [6,7,8]
    val df3 = (Seq(1, 2, 3).map(v => ("g1", v.toDouble)) ++
      Seq(2, 3, 4).map(v => ("g2", v.toDouble)) ++
      Seq(6, 7, 8).map(v => ("g3", v.toDouble))).toDF("g", "x")
    val got = Stats.anovaF(df3, "g", "x")
      .as[(Long, Long, Double, Double)].collect().head
    // cents means 200/300/700, grand 400; ssb = 3*(200²+100²+300²)=42e4...
    // ssb = 3*((200-400)² + (300-400)² + (700-400)²) = 3*140000 = 420000
    // ssw = 3 groups * 2*100² ... each group ss = (100²+0+100²)=20000 → 60000
    val f = (420000.0 / 2) / (60000.0 / 6)
    assert(got._1 === 3L && got._2 === 9L)
    assert(math.abs(got._3 - f) < 1e-4, s"F: $got vs $f")
    assert(math.abs(got._4 - 420000.0 / 480000.0) < 1e-6)
  }

  test("q271 Mann-Whitney: symmetric groups give z=0; known U with ties") {
    def li(a: Seq[Long], b: Seq[Long]) =
      (a.map(("R", _)) ++ b.map(("N", _)))
        .toDF("l_returnflag", "l_quantity")
    val sym = Stats.mannWhitneyU(li(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "l_returnflag", "l_quantity", "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(sym._3 === 4.5 && sym._4 === 0.0, s"sym: $sym")
    // a = [1,2,2], b = [2,3]: midranks 1, 3, 3 | 3, 5
    // R1 = 7, U1 = 7 - 6 = 1
    val got = Stats.mannWhitneyU(li(Seq(1L, 2L, 2L), Seq(2L, 3L)),
      "l_returnflag", "l_quantity", "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 === 3L && got._2 === 2L && got._3 === 1.0, s"$got")
    // z = (U - n1n2/2)/sqrt(n1n2/12 * ((N+1) - (t³-t)/(N(N-1))))
    // ties: value 2 has t=3 → 24; sigma² = 6/12 * (6 - 24/20) = 2.4
    val z = (1.0 - 3.0) / math.sqrt(2.4)
    assert(math.abs(got._4 - BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"z: $got vs $z")
    // degenerate inputs answer NaN, never an ANSI zero-divide
    // (ADVICE r17): single pooled row (nn=1, divisor nn(nn-1)=0)...
    val one = Stats.mannWhitneyU(li(Seq(1L), Seq.empty),
      "l_returnflag", "l_quantity", "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(one._1 === 1L && one._2 === 0L && one._4.isNaN, s"$one")
    // ...and all pooled values tied (sig2 = 0)
    val tied = Stats.mannWhitneyU(li(Seq(7L, 7L), Seq(7L, 7L)),
      "l_returnflag", "l_quantity", "R", "N")
      .as[(Long, Long, Double, Double)].collect().head
    assert(tied._4.isNaN, s"$tied")
  }

  test("q288 Brown-Forsythe: equal spreads F~0, planted spread found, brute F") {
    // identical deviation structure in every group -> F = 0
    val same = Stats.brownForsythe(
      groups(Seq(1.0, 2.0, 3.0), Seq(11.0, 12.0, 13.0)), "g", "x")
      .as[(Long, Long, Double, Double)].collect().head
    assert(same._3 === 0.0, s"equal spreads: $same")
    // group B spread 10x wider; brute reference with the disc median
    // (smallest value with cume_dist >= 0.5)
    val a = Seq(10.0, 11.0, 12.0, 13.0, 14.0)
    val b = Seq(10.0, 30.0, 50.0, 70.0, 90.0)
    val got = Stats.brownForsythe(groups(a, b), "g", "x")
      .as[(Long, Long, Double, Double)].collect().head
    def discMedian(vs: Seq[Long]): Long =
      vs.sorted.apply((vs.size + 1) / 2 - 1)
    val ca = a.map(v => math.round(100.0 * v))
    val cb = b.map(v => math.round(100.0 * v))
    val za = ca.map(v => math.abs(v - discMedian(ca)))
    val zb = cb.map(v => math.abs(v - discMedian(cb)))
    val all = za ++ zb
    val gm = all.sum.toDouble / all.size
    val ssb = za.size * math.pow(za.sum.toDouble / za.size - gm, 2) +
      zb.size * math.pow(zb.sum.toDouble / zb.size - gm, 2)
    val ssw = za.map(v => math.pow(v - za.sum.toDouble / za.size, 2)).sum +
      zb.map(v => math.pow(v - zb.sum.toDouble / zb.size, 2)).sum
    val f = (ssb / 1) / (ssw / (all.size - 2))
    assert(got._1 === 2L && got._2 === 10L)
    assert(math.abs(got._3 - f) < 1e-4, s"F: $got vs $f")
    assert(got._3 > 5.0, s"spread difference should be loud: $got")
  }

  test("q282 Kruskal-Wallis: identical groups H=0; brute reference with ties") {
    def li(rows: Seq[(String, Long)]) =
      rows.toDF("l_returnflag", "l_quantity")
    val same = Stats.kruskalWallisH(
      li(Seq("A", "B", "C").flatMap(g =>
        Seq(1L, 2L, 3L).map((g, _)))), "l_returnflag", "l_quantity")
      .as[(Long, Long, Double, Double)].collect().head
    assert(same._3 === 0.0 && same._4 === 0.0, s"identical: $same")
    // brute-force H on mixed data with ties
    val data = Seq(("A", 1L), ("A", 2L), ("A", 2L), ("B", 2L),
      ("B", 5L), ("B", 7L), ("C", 3L), ("C", 3L), ("C", 9L), ("C", 9L))
    val got = Stats.kruskalWallisH(li(data), "l_returnflag",
      "l_quantity").as[(Long, Long, Double, Double)].collect().head
    val n = data.size
    val mid = data.map(_._2).sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.size }
    val byG = data.groupBy(_._1)
    val a = byG.values.map { g =>
      val rg = g.map(r => mid(r._2)).sum; rg * rg / g.size
    }.sum
    val hraw = 12.0 / (n * (n + 1.0)) * a - 3 * (n + 1.0)
    val tie = data.map(_._2).groupBy(identity).values
      .map(g => g.size.toLong * g.size * g.size - g.size).sum
    val hc = hraw / (1.0 - tie.toDouble / (n.toDouble * n * n - n))
    assert(got._1 === 3L && got._2 === n.toLong)
    assert(math.abs(got._3 - hraw) < 1e-6, s"H: $got vs $hraw")
    assert(math.abs(got._4 - hc) < 1e-6, s"Hc: $got vs $hc")
  }

  test("q273 Spearman: perfect monotone = 1, reversal = -1, tie reference") {
    def li(rows: Seq[(Long, Long)]) = rows.toDF("x", "y")
    def rho(rows: Seq[(Long, Long)]) =
      Stats.spearmanRho(li(rows), col("x"), col("y"))
        .select(col("spearman_rho")).as[Double].collect().head
    assert(rho((1L to 8L).map(v => (v, v * 3))) === 1.0)
    assert(rho((1L to 8L).map(v => (v, 20 - v))) === -1.0)
    // brute-force midrank reference on data with ties
    val data = Seq((1L, 2L), (1L, 5L), (2L, 2L), (3L, 4L), (3L, 4L),
      (4L, 1L), (4L, 6L), (5L, 6L))
    def midranks(vs: Seq[Long]): Map[Long, Double] =
      vs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
    val rx = midranks(data.map(_._1)); val ry = midranks(data.map(_._2))
    val n = data.size
    val xs = data.map(d => rx(d._1)); val ys = data.map(d => ry(d._2))
    val mx = xs.sum / n; val my = ys.sum / n
    val sxy = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sxx = xs.map(a => (a - mx) * (a - mx)).sum
    val syy = ys.map(b => (b - my) * (b - my)).sum
    val want = sxy / math.sqrt(sxx * syy)
    assert(math.abs(rho(data) - want) < 1e-6, s"rho vs brute: $want")
  }

  test("q274 Kendall tau-b: monotone = 1, brute-force pair reference with ties") {
    def li(rows: Seq[(Long, Long)]) = rows.toDF("x", "y")
    def tau(rows: Seq[(Long, Long)]) =
      Stats.kendallTauB(li(rows), col("x"), col("y"), 1L, 10L)
        .as[(Long, Long, Long, Double)].collect().head
    assert(tau((1L to 8L).map(v => (v, v)))._4 === 1.0)
    assert(tau((1L to 8L).map(v => (v, 9 - v)))._4 === -1.0)
    val data = Seq((1L, 2L), (1L, 5L), (2L, 2L), (3L, 4L), (3L, 4L),
      (4L, 1L), (4L, 6L), (5L, 6L), (5L, 2L), (2L, 9L))
    val got = tau(data)
    // brute force over all pairs
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L
    for (i <- data.indices; j <- data.indices if i < j) {
      val s = (data(i)._1 - data(j)._1) * (data(i)._2 - data(j)._2)
      if (data(i)._1 == data(j)._1) tx += 1
      if (data(i)._2 == data(j)._2) ty += 1
      if (data(i)._1 != data(j)._1 && data(i)._2 != data(j)._2) {
        if (s > 0) nc += 1 else nd += 1
      }
    }
    val n0 = data.size.toLong * (data.size - 1) / 2
    val want = (nc - nd).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(got._2 === nc && got._3 === nd, s"pair counts: $got vs $nc/$nd")
    assert(math.abs(got._4 - want) < 1e-6, s"tau vs brute: $got vs $want")
  }

  test("q272 contingency: independence gives chi2=0, V=0, MI=0; perfect association") {
    // build directly on (a, b) columns — the operator takes Columns
    val ind = (for { a <- Seq("x", "y"); b <- Seq(0L, 1L); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val gi = Stats.contingencyStats(ind, col("a"), col("b"))
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(gi === ((20L, 2L, 2L, 0.0, 0.0, 0.0)))
    // perfect association: a==x ⇔ b==0, 10 rows each cell
    val per = (Seq.fill(10)(("x", 0L)) ++ Seq.fill(10)(("y", 1L)))
      .toDF("a", "b")
    val gp = Stats.contingencyStats(per, col("a"), col("b"))
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(gp._4 === 20.0 && gp._5 === 1.0, s"perfect: $gp")
    assert(math.abs(gp._6 - math.log(2.0)) < 1e-6, s"MI: $gp")
  }

  test("q322 Bartlett: equal variances T=0; degenerate groups NaN") {
    val eq = Stats.bartlett(groups(Seq(10.0, 20.0), Seq(10.0, 20.0)),
      "g", "x").as[(Long, Long, Double)].collect().head
    assert(eq === ((2L, 4L, 0.0)), s"$eq")
    // very different spreads: large positive T
    val spread = Stats.bartlett(
      groups(Seq(10.0, 10.01, 9.99, 10.02, 9.98),
        Seq(10.0, 200.0, 5.0, 400.0, 1.0)), "g", "x")
      .as[(Long, Long, Double)].collect().head
    assert(spread._3 > 10.0, s"$spread")
    // a single-row group makes the statistic undefined
    val single = Stats.bartlett(groups(Seq(10.0), Seq(10.0, 20.0)),
      "g", "x").as[(Long, Long, Double)].collect().head
    assert(single._3.isNaN, s"$single")
    // a constant group has zero variance: ln undefined -> NaN
    val const = Stats.bartlett(groups(Seq(5.0, 5.0, 5.0),
      Seq(10.0, 20.0)), "g", "x")
      .as[(Long, Long, Double)].collect().head
    assert(const._3.isNaN, s"$const")
  }

  test("q324 Welch ANOVA: identical groups F=0, df2 exact; degenerate NaN") {
    val eq = Stats.welchAnova(
      groups(Seq(10.0, 20.0, 30.0), Seq(10.0, 20.0, 30.0)), "g", "x")
      .as[(Long, Long, Double, Double)].collect().head
    // equal w, equal m: A = 0; s3 = 2*(1/2)^2/2 = 0.25, df2 = 3/0.75
    assert(eq === ((2L, 6L, 0.0, 4.0)), s"$eq")
    val single = Stats.welchAnova(groups(Seq(10.0), Seq(10.0, 20.0)),
      "g", "x").as[(Long, Long, Double, Double)].collect().head
    assert(single._3.isNaN && single._4.isNaN, s"$single")
  }

  test("q325 Tukey HSD: hand MSE gives q=4 on the planted pair") {
    // A=[10,20], B=[30,40] dollars: MSE = 5e5 cents^2, diff = -2000,
    // q = 2000/sqrt(5e5/2 * (1/2 + 1/2)) = 4
    val got = Stats.tukeyHsd(groups(Seq(10.0, 20.0), Seq(30.0, 40.0)),
      "g", "x")
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(got.length === 1, s"${got.toSeq}")
    assert(got.head === (("A", "B", 2L, 2L, -2000.0, 4.0)),
      s"${got.head}")
  }

  test("q326 odds ratio: hand 2x2 OR=4 RR=2 with Wald CI; zero cell NaN") {
    def pairsDf(rows: Seq[(Long, Long)]) = rows.toDF("x", "y")
    val got = Stats.oddsRatio(pairsDf(Seq((1L, 1L), (1L, 1L), (1L, 0L),
      (0L, 1L), (0L, 0L), (0L, 0L))), col("x"), col("y"))
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert((got._1, got._2, got._3, got._4) === ((2L, 1L, 1L, 2L)),
      s"$got")
    assert(got._5 === 4.0 && got._6 === 2.0, s"$got")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val se = math.sqrt(1.0 / 2 + 1.0 / 1 + 1.0 / 1 + 1.0 / 2)
    assert(got._7 === r6(math.exp(math.log(4.0) - 1.96 * se)), s"$got")
    assert(got._8 === r6(math.exp(math.log(4.0) + 1.96 * se)), s"$got")
    val zero = Stats.oddsRatio(pairsDf(Seq((1L, 1L), (0L, 0L))),
      col("x"), col("y"))
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(zero._5.isNaN && zero._7.isNaN, s"$zero")
  }

  test("q327 Friedman: consistent ordering hits the b=2,k=3 maximum 4") {
    def cells(rows: Seq[(Long, String, Double)]) =
      rows.toDF("blk", "trt", "v")
    val consistent = cells(Seq(
      (0L, "t1", 10.0), (0L, "t2", 20.0), (0L, "t3", 30.0),
      (1L, "t1", 15.0), (1L, "t2", 25.0), (1L, "t3", 35.0)))
    val got = Stats.friedman(consistent, col("blk"), col("trt"),
      col("v")).as[(Long, Long, Double)].collect().head
    assert(got === ((2L, 3L, 4.0)), s"$got")
    // a block missing a treatment: incomplete design -> NaN
    val incomplete = cells(Seq(
      (0L, "t1", 10.0), (0L, "t2", 20.0), (0L, "t3", 30.0),
      (1L, "t1", 15.0), (1L, "t2", 25.0)))
    val bad = Stats.friedman(incomplete, col("blk"), col("trt"),
      col("v")).as[(Long, Long, Double)].collect().head
    assert(bad._3.isNaN, s"$bad")
  }

  test("q329 Mantel-Haenszel: homogeneous strata recover OR=4; zero den NaN") {
    def strata(rows: Seq[(Long, Long, Long)]) = rows.toDF("g", "x", "y")
    // two identical strata, each a 2/1/1/2 table (OR 4)
    val one = Seq((1L, 1L), (1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L),
      (0L, 0L))
    val rows = one.map { case (x, y) => (0L, x, y) } ++
      one.map { case (x, y) => (1L, x, y) }
    val got = Stats.mantelHaenszel(strata(rows), col("g"), col("x"),
      col("y")).as[(Long, Double, Double)].collect().head
    assert(got === ((2L, 4.0, 4.0)), s"$got")
    // concordant-only data: every stratum b=c=0 -> denominator 0 -> NaN
    val conc = Stats.mantelHaenszel(
      strata(Seq((0L, 1L, 1L), (0L, 0L, 0L), (1L, 1L, 1L))),
      col("g"), col("x"), col("y"))
      .as[(Long, Double, Double)].collect().head
    assert(conc._2.isNaN, s"$conc")
  }

  test("q330 Hedges g: hand pooled-SD case; J = 4/7 small-sample shrink") {
    val got = Stats.hedgesG(groups(Seq(10.0, 20.0), Seq(30.0, 40.0)),
      "g", "x", "A", "B")
      .as[(Long, Long, Double, Double)].collect().head
    // sp2 = 5e5 cents^2, d = -2000/sqrt(5e5), g = d * (1 - 3/7)
    assert(got._1 === 2L && got._2 === 2L, s"$got")
    assert(got._3 === -2.828427 && got._4 === -1.616244, s"$got")
    // identical groups: d = 0, g = 0
    val eq = Stats.hedgesG(groups(Seq(10.0, 20.0), Seq(10.0, 20.0)),
      "g", "x", "A", "B")
      .as[(Long, Long, Double, Double)].collect().head
    assert(eq._3 === 0.0 && eq._4 === 0.0, s"$eq")
  }

  test("q331 Poisson two-rate: hand cohort counts, conditional-binomial z") {
    // cohort A (even ids): 3 users, 2 purchases; B (odd): 2 users, 2
    val rows = Seq((0L, "purchase"), (2L, "purchase"), (4L, "view"),
      (1L, "purchase"), (1L, "purchase"), (3L, "view"))
    val df = rows.toDF("user_id", "event_type")
    val got = Stats.poissonTwoRate(df)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    assert((got._1, got._2, got._3, got._4) === ((3L, 2L, 2L, 2L)),
      s"$got")
    assert(got._5 === 0.666667 && got._6 === 1.0, s"$got")
    // z = (2 - 4*0.6)/sqrt(4*0.6*0.4)
    assert(got._7 === -0.408248, s"$got")
  }

  test("q332 ICC(1,1): hand two-group decomposition = 7/9") {
    // groups [10,20] vs [30,40] dollars: MSB=4e6, MSW=5e5, k0=2
    // ICC = 3.5e6/4.5e6 = 0.777778
    val df = Seq((0L, 10.0), (0L, 20.0), (1L, 30.0), (1L, 40.0))
      .toDF("g", "v")
    val got = Stats.icc1(df, col("g"), col("v"))
      .as[(Long, Long, Double)].collect().head
    assert(got === ((2L, 4L, 0.777778)), s"$got")
    // one group only: between-group variance undefined -> NaN
    val one = Stats.icc1(Seq((0L, 10.0), (0L, 20.0)).toDF("g", "v"),
      col("g"), col("v")).as[(Long, Long, Double)].collect().head
    assert(one._3.isNaN, s"$one")
  }

  test("q333 Cronbach alpha: identical items 1.0; orthogonal mix ~0") {
    val same = Stats.cronbachAlpha(
      Seq((1.0, 1.0, 1.0), (2.0, 2.0, 2.0), (3.0, 3.0, 3.0))
        .toDF("a", "b", "c"),
      Seq(col("a"), col("b"), col("c")))
      .as[(Long, Long, Double)].collect().head
    assert(same === ((3L, 3L, 1.0)), s"$same")
    // balanced orthogonal design: item variances sum to the total
    // variance -> alpha = 0 (up to the 1e-6 rounding grid)
    val mix = Stats.cronbachAlpha(
      Seq((1.0, 1.0, 2.0), (1.0, 2.0, 1.0), (2.0, 1.0, 1.0),
        (2.0, 2.0, 2.0)).toDF("a", "b", "c"),
      Seq(col("a"), col("b"), col("c")))
      .as[(Long, Long, Double)].collect().head
    assert(math.abs(mix._3) < 1e-6, s"$mix")
  }

  test("q335 Kendall W: perfect agreement 1.0; incomplete design NaN") {
    def cells(rows: Seq[(Long, String, Double)]) =
      rows.toDF("blk", "trt", "v")
    val consistent = cells(Seq(
      (0L, "t1", 10.0), (0L, "t2", 20.0), (0L, "t3", 30.0),
      (1L, "t1", 15.0), (1L, "t2", 25.0), (1L, "t3", 35.0)))
    val got = Stats.kendallW(consistent, col("blk"), col("trt"),
      col("v")).as[(Long, Long, Double)].collect().head
    assert(got === ((2L, 3L, 1.0)), s"$got")
    // blocks in OPPOSITE order: rank sums equalize -> W = 0
    val opposed = cells(Seq(
      (0L, "t1", 10.0), (0L, "t2", 20.0), (0L, "t3", 30.0),
      (1L, "t1", 35.0), (1L, "t2", 25.0), (1L, "t3", 15.0)))
    val w0 = Stats.kendallW(opposed, col("blk"), col("trt"),
      col("v")).as[(Long, Long, Double)].collect().head
    assert(w0._3 === 0.0, s"$w0")
    val incomplete = cells(Seq((0L, "t1", 1.0), (0L, "t2", 2.0),
      (1L, "t1", 3.0)))
    val bad = Stats.kendallW(incomplete, col("blk"), col("trt"),
      col("v")).as[(Long, Long, Double)].collect().head
    assert(bad._3.isNaN, s"$bad")
  }

  test("q336 split-half: perfect halves SB=1; anti-correlated NaN") {
    def halves(rows: Seq[(Double, Double)]) = rows.toDF("a", "b")
    val perfect = Stats.splitHalf(
      halves(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0))),
      col("a"), col("b")).as[(Long, Double, Double)].collect().head
    assert(perfect === ((3L, 1.0, 1.0)), s"$perfect")
    val anti = Stats.splitHalf(
      halves(Seq((1.0, -1.0), (2.0, -2.0), (3.0, -3.0))),
      col("a"), col("b")).as[(Long, Double, Double)].collect().head
    assert(anti._2 === -1.0 && anti._3.isNaN, s"$anti")
    val flat = Stats.splitHalf(halves(Seq((1.0, 5.0), (2.0, 5.0))),
      col("a"), col("b")).as[(Long, Double, Double)].collect().head
    assert(flat._2.isNaN, s"$flat")
  }

  test("q339 Page trend: perfect ascent z=2, descent z=-2") {
    def cells(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("blk", "trt", "v")
    val up = cells(Seq((0L, 1L, 10.0), (0L, 2L, 20.0), (0L, 3L, 30.0),
      (1L, 1L, 11.0), (1L, 2L, 21.0), (1L, 3L, 31.0)))
    val got = Stats.pageTrend(up, col("blk"), col("trt"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    // L = 1*2 + 2*4 + 3*6 = 28, E = 24, V = 4
    assert(got === ((2L, 3L, 28.0, 2.0)), s"$got")
    val down = cells(Seq((0L, 1L, 30.0), (0L, 2L, 20.0), (0L, 3L, 10.0),
      (1L, 1L, 31.0), (1L, 2L, 21.0), (1L, 3L, 11.0)))
    val rev = Stats.pageTrend(down, col("blk"), col("trt"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(rev._3 === 20.0 && rev._4 === -2.0, s"$rev")
  }

  test("q340 Cochran Q: hand 3x3 presence table Q=3; degenerate NaN") {
    def flags(rows: Seq[(Long, Long, Long)]) = rows.toDF("s", "j", "x")
    val got = Stats.cochranQ(flags(Seq(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 0L),
      (2L, 1L, 1L), (2L, 2L, 0L), (2L, 3L, 0L),
      (3L, 1L, 1L), (3L, 2L, 1L), (3L, 3L, 1L))),
      col("s"), col("j"), col("x"))
      .as[(Long, Long, Double)].collect().head
    // C=(3,2,1), T=6, R=(2,1,3): num = 6*(14-12)=12, den = 18-14=4
    assert(got === ((3L, 3L, 3.0)), s"$got")
    // every subject all-1: den = kT - ΣR² = 0 -> NaN
    val allOne = Stats.cochranQ(flags(Seq((1L, 1L, 1L), (1L, 2L, 1L),
      (2L, 1L, 1L), (2L, 2L, 1L))), col("s"), col("j"), col("x"))
      .as[(Long, Long, Double)].collect().head
    assert(allOne._3.isNaN, s"$allOne")
  }

  test("q341 sign test: balanced-at-half z=0, one-sided hand z; all ties NaN") {
    def pairsDf(rows: Seq[(Long, Long)]) = rows.toDF("x", "y")
    val bal = Stats.signTest(pairsDf(Seq((1L, 2L), (1L, 3L), (2L, 1L),
      (2L, 2L))), col("x"), col("y"))
      .as[(Long, Long, Long, Double)].collect().head
    // pos=2, neg=1, m=3: |2-1.5|-0.5 = 0 -> z = 0
    assert(bal === ((4L, 2L, 1L, 0.0)), s"$bal")
    val up = Stats.signTest(pairsDf(Seq((1L, 2L), (1L, 2L), (1L, 2L))),
      col("x"), col("y"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(up._4 === 1.154701, s"$up")
    val ties = Stats.signTest(pairsDf(Seq((5L, 5L), (7L, 7L))),
      col("x"), col("y"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(ties._4.isNaN, s"$ties")
  }

  test("q342 two-proportion z: equal rates z=0; all-zero Wilson floor is 0") {
    def fl(rows: Seq[(String, Long)]) = rows.toDF("g", "x")
    val eq = Stats.twoProportionZ(fl(Seq(("A", 1L), ("A", 0L),
      ("B", 1L), ("B", 0L))), "g", col("x"), "A", "B")
      .as[(Long, Long, Double, Double, Double, Double, Double,
        Double, Double)].collect().head
    assert(eq._3 === 0.5 && eq._4 === 0.5 && eq._5 === 0.0, s"$eq")
    assert(eq._6 === eq._8 && eq._7 === eq._9, s"$eq")
    // p = 0 at n = 2: the Wilson lower bound lands exactly on 0
    // ((0.9604 - 1.96*0.49)/2.9208), where a Wald CI would go negative
    val zero = Stats.twoProportionZ(fl(Seq(("A", 0L), ("A", 0L),
      ("B", 1L), ("B", 1L))), "g", col("x"), "A", "B")
      .as[(Long, Long, Double, Double, Double, Double, Double,
        Double, Double)].collect().head
    assert(zero._3 === 0.0 && zero._6 === 0.0, s"$zero")
    assert(zero._5 < 0.0, s"$zero")
  }

  test("q323 G-test: independence G=0; perfect association 8 ln 2 on the grid") {
    def cellsDf(rows: Seq[(String, Long)]) = rows.toDF("a", "b")
    // product structure: O = E everywhere -> every ln term 0
    val ind = Stats.gTest(cellsDf(Seq(("x", 0L), ("x", 1L), ("y", 0L),
      ("y", 1L))), col("a"), col("b"))
      .as[(Long, Long, Double)].collect().head
    assert(ind === ((4L, 1L, 0.0)), s"$ind")
    // diagonal 2x2: G = 2 * (4 * 2ln2)/2 ... = 8 ln 2 after the 1e9 grid
    val dep = Stats.gTest(cellsDf(Seq(("x", 0L), ("x", 0L), ("y", 1L),
      ("y", 1L))), col("a"), col("b"))
      .as[(Long, Long, Double)].collect().head
    assert(dep._1 === 4L && dep._2 === 1L, s"$dep")
    assert(math.abs(dep._3 - 8.0 * math.log(2.0)) < 1e-6, s"$dep")
  }
}
