package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DP median via the exponential mechanism (q231): straight-line
  * reference parity, support membership, high-ε concentration, and
  * repartition invariance.
  */
class DpMedianSpec extends SparkSpec {

  /** Single-threaded replica — same histogram, utility, weight grid,
    * hash uniform, and inversion.
    */
  private def reference(rows: Seq[(Long, Long)], eps: Double)
      : Map[Long, Long] = {
    rows.groupBy(_._1).map { case (g, xs) =>
      val hist = xs.map(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = xs.size.toLong
      var cum = 0L
      val scored = hist.map { case (v, nv) =>
        cum += nv
        (v, -math.max(cum - nv, n - cum))
      }
      val umax = scored.map(_._2).max
      val mw = scored.map { case (v, u) =>
        (v, Math.round(1000000.0 * math.exp(eps / 2.0 * (u - umax).toDouble)))
      }
      val w = mw.map(_._2).sum
      val m = 1048576L
      val h = ((g % 1000003L) * 2654435761L) >> 16
      val r = ((h % m) + 1).toDouble / (m + 1).toDouble
      val t = math.floor(r * w.toDouble).toLong
      var cw = 0L
      val pick = mw.collectFirst {
        case (v, x) if { cw += x; cw > t } => v
      }.get
      g -> pick
    }
  }

  private def asCustomer(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.map { case (g, v) => (g, v.toDouble / 100.0) }
      .toDF("c_nationkey", "c_acctbal")
  }

  test("release matches the straight-line reference") {
    val rnd = new scala.util.Random(5)
    val rows = for (g <- 0L until 6L; _ <- 0 until 40)
      yield (g, (rnd.nextInt(20001) - 10000).toLong)
    val got = Governance.dpMedianRelease(asCustomer(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === reference(rows, 0.5))
    // group sizes survive too
    val ns = Governance.dpMedianRelease(asCustomer(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ns.values.toSet === Set(40L))
  }

  test("released value is always an observed value of its group") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val got = Governance.dpMedianRelease(customer)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val support = customer
      .select(col("c_nationkey").cast("long"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    got.foreach { case (g, v) =>
      assert(support.contains((g, v)), s"nation $g released $v")
    }
  }

  test("high epsilon concentrates on a maximum-utility value") {
    val rows = (0L until 5L).flatMap(g =>
      (1L to 101L).map(v => (g, v * 100)))
    val got = Governance.dpMedianRelease(asCustomer(rows), eps = 10.0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 101 distinct values, odd count: the unique max-utility candidate
    // is the true median 5100; at eps=10 a candidate d ranks away
    // weighs round(1e6·e^(-5d)) — zero beyond d=2 — so ANY uniform
    // lands within two rank steps (200 cents) of the median
    got.foreach { case (g, v) =>
      assert(math.abs(v - 5100L) <= 200L, s"group $g -> $v")
    }
  }

  test("repartition-invariant and guards") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val a = Governance.dpMedianRelease(customer)
      .collect().map(_.toSeq).toSet
    val b = Governance.dpMedianRelease(customer.repartition(11))
      .collect().map(_.toSeq).toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      Governance.dpMedianRelease(customer, eps = 0.0)
    }
  }
}
