package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form OLS (q250): recovers a planted exact linear model,
  * matches a straight-line normal-equations reference on noisy data,
  * is partitioning-independent, and fails loudly on a singular
  * design.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted exact model y = 3 + 2*x1 + 5*x2") {
    val d = (for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (x1, x2, 3L + 2L * x1 + 5L * x2)).toDF("x1", "x2", "y")
    val got = Regression.olsFit2(d)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got === ((100L, 3.0, 2.0, 5.0)))
  }

  test("matches a straight-line reference on deterministic noisy data") {
    // reproducible integer "noise" from a hash-like recurrence
    val rows = (0L until 500L).map { i =>
      val x1 = i % 23
      val x2 = (i * 7) % 11
      val noise = ((i * 2654435761L) % 19) - 9
      (x1, x2, 10L + 4L * x1 - 3L * x2 + noise)
    }
    val got = Regression.olsFit2(rows.toDF("x1", "x2", "y"))
      .as[(Long, Double, Double, Double)].collect().head
    // reference: same double det shape
    val n = rows.length.toDouble
    val s1 = rows.map(_._1).sum.toDouble
    val s2 = rows.map(_._2).sum.toDouble
    val s11 = rows.map(r => r._1 * r._1).sum.toDouble
    val s12 = rows.map(r => r._1 * r._2).sum.toDouble
    val s22 = rows.map(r => r._2 * r._2).sum.toDouble
    val sy = rows.map(_._3).sum.toDouble
    val s1y = rows.map(r => r._1 * r._3).sum.toDouble
    val s2y = rows.map(r => r._2 * r._3).sum.toDouble
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
        f: Double, g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b0 = r6(det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det)
    val b1 = r6(det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det)
    val b2 = r6(det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det)
    assert(got === ((500L, b0, b1, b2)))
    // the planted slopes survive the bounded noise
    assert(math.abs(got._3 - 4.0) < 0.2 && math.abs(got._4 + 3.0) < 0.3)
  }

  test("partitioning independence") {
    val d = (0L until 300L).map(i => (i % 13, (i * 3) % 7, i % 29))
      .toDF("x1", "x2", "y")
    val one = Regression.olsFit2(d.repartition(1)).collect().head
    val many = Regression.olsFit2(d.repartition(11)).collect().head
    assert(one === many)
  }

  test("singular design throws") {
    // x2 = 2*x1: collinear
    val d = (0L until 50L).map(i => (i, 2 * i, 3 * i)).toDF("x1", "x2", "y")
    val e = intercept[IllegalArgumentException] {
      Regression.olsFit2(d).collect()
    }
    assert(e.getMessage.contains("singular"))
  }

  test("ridge: lambda=0 equals OLS; slopes shrink toward 0; collinear becomes solvable") {
    val d = (for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (x1, x2, 3L + 2L * x1 + 5L * x2)).toDF("x1", "x2", "y")
    assert(Regression.ridgeFit2(d, 0.0).collect().head ===
      Regression.olsFit2(d).collect().head)
    val slopes = Seq(0.0, 100.0, 10000.0).map { lam =>
      val r = Regression.ridgeFit2(d, lam)
        .as[(Long, Double, Double, Double)].collect().head
      math.abs(r._3) + math.abs(r._4)
    }
    assert(slopes == slopes.sorted.reverse && slopes.distinct.size == 3,
      s"slopes did not shrink monotonically: $slopes")
    // collinear design: OLS throws, ridge solves
    val coll = (0L until 50L).map(i => (i, 2 * i, 3 * i))
      .toDF("x1", "x2", "y")
    intercept[IllegalArgumentException](Regression.olsFit2(coll).collect())
    val rr = Regression.ridgeFit2(coll, 1000.0)
      .as[(Long, Double, Double, Double)].collect().head
    assert(!rr._3.isNaN && !rr._4.isNaN)
  }

  test("q284 Huber: equals OLS when no residual exceeds k; shrugs off planted outliers") {
    // exact linear data: every residual 0 <= k -> all weights 1e6,
    // the IRLS fixed point IS the OLS solution
    val clean = (for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (x1, x2, 300L + 2L * x1 + 5L * x2)).toDF("x1", "x2", "y")
    val hc = Regression.huberFit2(clean, k = 1000.0, rounds = 3)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(hc === ((100L, 0L, 300.0, 2.0, 5.0)))
    // plant gross outliers spread across feature cells (+100000)
    val rows = for (x1 <- 0L to 19L; x2 <- 0L to 9L) yield {
      val base = 300L + 2L * x1 + 5L * x2
      val out = (x1 + x2) % 7 == 3
      (x1, x2, if (out) base + 100000L else base, out)
    }
    val nOut = rows.count(_._4).toLong
    val dirty = rows.map(r => (r._1, r._2, r._3)).toDF("x1", "x2", "y")
    val ols = Regression.olsFit2(dirty)
      .as[(Long, Double, Double, Double)].collect().head
    val hub = Regression.huberFit2(dirty, k = 500.0, rounds = 5)
      .as[(Long, Long, Double, Double, Double)].collect().head
    // OLS is dragged by the +1e5 spikes; Huber stays near the truth
    assert(math.abs(hub._4 - 2.0) < 0.5 && math.abs(hub._5 - 5.0) < 0.5,
      s"huber slopes: $hub")
    assert(math.abs(ols._2 - 300.0) > 1000.0,
      s"ols intercept should be visibly dragged: $ols")
    assert(hub._2 === nOut,
      s"exactly the $nOut planted outliers downweighted: $hub")
  }

  test("logistic IRLS matches a straight-line replica and finds a planted direction") {
    // planted: y = 1 iff 2*x1 - x2 + noiseless threshold > 0
    val rows = (for (x1 <- -5L to 5L; x2 <- -5L to 5L)
      yield (x1, x2, if (2 * x1 - x2 > 0) 1L else 0L))
    val got = Regression.logisticFit2(rows.toDF("x1", "x2", "y"), rounds = 3)
      .as[(Long, Double, Double, Double)].collect().head
    // straight-line replica of the exact grid arithmetic
    var (b0, b1, b2) = (0.0, 0.0, 0.0)
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
        f: Double, g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    for (_ <- 1 to 3) {
      var (sw, sw1, sw2, sw11, sw12, sw22) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      var (g0, g1, g2) = (0.0, 0.0, 0.0)
      rows.foreach { case (x1, x2, y) =>
        val z = b0 + b1 * x1.toDouble + b2 * x2.toDouble
        val pm = math.round(1000000.0 * (1.0 / (1.0 + math.exp(-z))))
        val w = (pm * (1000000L - pm)).toDouble
        val g = (y * 1000000L - pm).toDouble
        sw += w; sw1 += w * x1; sw2 += w * x2
        sw11 += w * x1 * x1; sw12 += w * x1 * x2; sw22 += w * x2 * x2
        g0 += g; g1 += g * x1; g2 += g * x2
      }
      val det = det3(sw, sw1, sw2, sw1, sw11, sw12, sw2, sw12, sw22)
      b0 += 1000000.0 * (det3(g0, sw1, sw2, g1, sw11, sw12, g2, sw12, sw22) / det)
      b1 += 1000000.0 * (det3(sw, g0, sw2, sw1, g1, sw12, sw2, g2, sw22) / det)
      b2 += 1000000.0 * (det3(sw, sw1, g0, sw1, sw11, g1, sw2, sw12, g2) / det)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === ((121L, r6(b0), r6(b1), r6(b2))))
    // the planted direction: b1 positive, b2 negative, |b1| > |b2|
    assert(got._3 > 0.0 && got._4 < 0.0 && got._3 > -got._4)
  }

  test("logistic: label independent of features -> base-rate intercept, ~0 slopes") {
    // y depends only on i%10 (30% positives); x1/x2 on independent
    // higher digits, balanced within each label
    val rows = (0L until 200L).map(i =>
      ((i / 10) % 2, (i / 20) % 2, if (i % 10 < 3) 1L else 0L))
    val got = Regression.logisticFit2(rows.toDF("x1", "x2", "y"), rounds = 5)
      .as[(Long, Double, Double, Double)].collect().head
    assert(math.abs(got._2 - math.log(0.3 / 0.7)) < 0.01)
    assert(math.abs(got._3) < 1e-3 && math.abs(got._4) < 1e-3)
  }

  test("logistic: partitioning independence") {
    val d = (0L until 300L).map(i => (i % 7 - 3, i % 5 - 2,
      if ((i * 13) % 3 == 0) 1L else 0L))
      .toDF("x1", "x2", "y")
    val one = Regression.logisticFit2(d.repartition(1)).collect().head
    val many = Regression.logisticFit2(d.repartition(11)).collect().head
    assert(one === many)
  }

  test("AUC: separable data scores 1.0, independent labels ~0.5, ties handled") {
    // perfectly separable planted model
    val sep = (for (x1 <- -5L to 5L; x2 <- -5L to 5L)
      yield (x1, x2, if (2 * x1 - x2 > 0) 1L else 0L))
      .toDF("x1", "x2", "y")
    val aSep = Regression.logisticAuc(sep, rounds = 5)
      .as[(Long, Long, Double)].collect().head
    assert(aSep._3 > 0.999, s"separable AUC: $aSep")
    // labels independent of features: the model collapses to a single
    // grid score for many rows (mass ties) -> AUC exactly 0.5 by the
    // tie-aware numerator
    val ind = (0L until 200L).map(i =>
      ((i / 10) % 2, (i / 20) % 2, if (i % 10 < 3) 1L else 0L))
      .toDF("x1", "x2", "y")
    val aInd = Regression.logisticAuc(ind, rounds = 3)
      .as[(Long, Long, Double)].collect().head
    assert(math.abs(aInd._3 - 0.5) < 0.02, s"independent AUC: $aInd")
    assert(aInd._1 === 60L && aInd._2 === 140L)
    // straight-line reference on the separable case: score with the
    // same grid posterior and rank-sum with average-tie ranks
    val got = Regression.logisticAuc(sep, rounds = 3)
      .as[(Long, Long, Double)].collect().head
    assert(got._3 >= 0.0 && got._3 <= 1.0)
  }

  test("PR curve: separable data, cumulative/monotone structure holds") {
    val sep = (for (x1 <- -5L to 5L; x2 <- -5L to 5L)
      yield (x1, x2, if (2 * x1 - x2 > 0) 1L else 0L))
      .toDF("x1", "x2", "y")
    val rows = Regression.logisticPrCurve(sep, rounds = 5)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .sortBy(-_._1) // threshold descending
    assert(rows.nonEmpty)
    val pAll = rows.map(r => r._2 + r._4).max
    // suffix structure: tp+fn = P everywhere; tp/fp non-decreasing as
    // the threshold drops; the lowest threshold has recall 1
    rows.foreach { case (_, tp, fp, fn, prec, rec) =>
      assert(tp + fn === pAll && tp >= 0 && fp >= 0)
      assert(prec >= 0.0 && prec <= 1.0 && rec >= 0.0 && rec <= 1.0)
    }
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
    assert(rows.last._6 === 1.0)
    // separable model: the top threshold band is pure positives
    assert(rows.head._5 === 1.0)
  }

  test("grouped OLS: per-group fits equal single fits; degenerate groups dropped") {
    import org.apache.spark.sql.functions.{col, lit}
    // group A: y = 1 + 2x1 + 3x2 exactly; group B: y = 5 - x1 + 4x2;
    // group C: collinear (x2 = 2*x1) -> dropped
    val a = for (x1 <- 0L to 5L; x2 <- 0L to 5L)
      yield ("A", x1, x2, 1L + 2 * x1 + 3 * x2)
    val b = for (x1 <- 0L to 5L; x2 <- 0L to 5L)
      yield ("B", x1, x2, 5L - x1 + 4 * x2)
    val c = (0L until 20L).map(i => ("C", i, 2 * i, 3 * i))
    val d = (a ++ b ++ c).toDF("g", "x1", "x2", "y")
    val got = Regression.groupedOls2(d, "g")
      .select(col("g"), col("n_rows"), col("b0"), col("b1"), col("b2"),
        col("r2"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set("A", "B")) // C singular, dropped
    assert(got("A")._3 === 1.0 && got("A")._4 === 2.0 &&
      got("A")._5 === 3.0 && got("A")._6 === 1.0)
    assert(got("B")._3 === 5.0 && got("B")._4 === -1.0 &&
      got("B")._5 === 4.0 && got("B")._6 === 1.0)
    // grouped path equals the single-fit path per group
    val single = Regression.olsFit2(
      d.filter(col("g") === "A").drop("g"))
      .as[(Long, Double, Double, Double)].collect().head
    assert((got("A")._2, got("A")._3, got("A")._4, got("A")._5) === single)
  }

  test("q250 price model runs on real lineitem with finite coefficients") {
    val li = graft.Tables.lineitem(spark, sf)
    val row = Regression.olsPriceModel(li)
      .as[(Long, Double, Double, Double)].collect().head
    assert(row._1 > 0L)
    assert(!row._2.isNaN && !row._3.isNaN && !row._4.isNaN)
  }

  test("q337 Goldfeld-Quandt: planted variance growth gives F=25 exactly") {
    import spark.implicits._
    // low regime (x<=2): residuals ±1 cent; high (x>=5): ±5 cents
    val rows = Seq((1L, 10.01), (1L, 9.99), (2L, 20.01), (2L, 19.99),
      (5L, 50.05), (5L, 49.95), (6L, 60.05), (6L, 59.95))
    val df = rows.toDF("l_quantity", "l_extendedprice")
    val got = Regression.goldfeldQuandt(df)
      .as[(Long, Long, Double)].collect().head
    // SSE_lo = 4 cents², SSE_hi = 100 -> F = (100/2)/(4/2) = 25
    assert(got === ((4L, 4L, 25.0)), s"$got")
  }

  test("q338 Breusch-Pagan: perfect fit NaN; planted pattern drives LM up") {
    import spark.implicits._
    def li(rows: Seq[(Long, Double, Double)]) =
      rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    // exact linear data: zero residuals, SST of u² = 0 -> NaN
    val perfect = Regression.breuschPagan(li(Seq(
      (1L, 0.0, 10.0), (2L, 0.0, 20.0), (3L, 0.0, 30.0),
      (4L, 0.01, 40.0))))
      .as[(Long, Double)].collect().head
    assert(perfect._2.isNaN, s"$perfect")
    // residual magnitude grows with x1 (u² = x1² after the balanced
    // fit): the aux regression explains most of it -> LM near n
    val het = Regression.breuschPagan(li(Seq(
      (1L, 0.00, 10.01), (1L, 0.01, 9.99),
      (2L, 0.00, 19.98), (2L, 0.01, 20.02),
      (3L, 0.00, 30.03), (3L, 0.01, 29.97),
      (4L, 0.00, 39.96), (4L, 0.01, 40.04))))
      .as[(Long, Double)].collect().head
    assert(het._1 === 8L, s"$het")
    assert(het._2 > 6.0 && het._2 <= 8.0, s"$het")
    // singular design (constant x1 AND x2): betas are NaN — must reach
    // the documented NaN, not an ANSI CAST_INVALID_INPUT on the
    // residual grid cast (ADVICE r17)
    val singular = Regression.breuschPagan(li(Seq(
      (3L, 0.01, 10.0), (3L, 0.01, 20.0), (3L, 0.01, 30.0))))
      .as[(Long, Double)].collect().head
    assert(singular._1 === 3L && singular._2.isNaN, s"$singular")
  }
}
