package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FastSS edit-distance-1 fuzzy self-join (q251): exact all-pairs
  * truth from the deletion-neighborhood candidates — substitution,
  * insertion, AND deletion pairs — with no false positives.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("equals brute-force all-pairs on a mixed-edit corpus") {
    val names = Seq(
      "alpha", "alphb",   // substitution
      "beta", "betax",    // insertion
      "gamma", "gama",    // deletion
      "delta", "unrelated", "alpha") // exact duplicate (dist 0)
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val got = Linkage.lev1Neighbors(df, "name", "id")
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      i <- names.indices; j <- names.indices if i < j
      d = lev(names(i), names(j)) if d <= 1
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(got === want && want.exists(_._3 == 0L) &&
      want.size >= 4)
  }

  test("real customers: every emitted pair verified, count matches brute force") {
    val cust = graft.Tables.customer(spark, sf)
    val got = Linkage.lev1Neighbors(cust, "c_name", "c_custkey")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.forall(_._3 <= 1L))
    val names = cust.select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)].collect()
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names if ia < ib
      if lev(na, nb) <= 1
    } yield (ia, ib)).toSet
    assert(got.map(p => (p._1, p._2)).toSet === brute)
  }
}
