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

  test("q250 price model runs on real lineitem with finite coefficients") {
    val li = graft.Tables.lineitem(spark, sf)
    val row = Regression.olsPriceModel(li)
      .as[(Long, Double, Double, Double)].collect().head
    assert(row._1 > 0L)
    assert(!row._2.isNaN && !row._3.isNaN && !row._4.isNaN)
  }
}
