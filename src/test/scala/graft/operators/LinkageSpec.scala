package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q191 Fellegi-Sunter linkage: hand-replicated u/weights, null-safe
  * agreement, block isolation, and the score threshold.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("weights match the hand-replicated log-odds") {
    // one block; field f: values A,A,B,C -> u = (4+1+1)/16 = 0.375
    val df = Seq((1L, "x", "A"), (2L, "x", "A"), (3L, "x", "B"),
      (4L, "x", "C")).toDF("id", "blk", "f")
    val got = Linkage.fellegiSunter(df, "id", Seq("blk"), Seq("f"),
      m = 0.9, minScore = -100.0)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val u = 6.0 / 16.0
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wAgree = r6(math.log(0.9 / u))
    val wDis = r6(math.log((1.0 - 0.9) / (1.0 - u)))
    assert(got((1L, 2L)) === ((1, wAgree)), s"got $got")
    assert(got((1L, 3L)) === ((0, wDis)))
    assert(got.size === 6, "all blocked pairs emitted under a low floor")
  }

  test("null fields agree null-safely; blocks do not mix") {
    val df = Seq((1L, "x", null), (2L, "x", null), (3L, "y", null))
      .toDF("id", "blk", "f")
    val got = Linkage.fellegiSunter(df, "id", Seq("blk"), Seq("f"),
      m = 0.9, minScore = -100.0)
      .select("id_a", "id_b", "n_agree").as[(Long, Long, Int)]
      .collect().toSet
    // (1,2) share a block and agree on NULL = NULL; 3 is in another block
    assert(got === Set((1L, 2L, 1)), s"got $got")
  }

  test("score threshold keeps only probable matches on sf0.001 customers") {
    val c = graft.Tables.customer(spark, sf).select(
      col("c_custkey").as("id"),
      col("c_mktsegment").as("b1"),
      col("c_nationkey").as("f1"),
      floor(col("c_acctbal") / lit(1000.0)).cast("long").as("f2"),
      substring(col("c_name"), -2, 1).as("f3"),
      substring(col("c_name"), -1, 1).as("f4"))
    val all = Linkage.fellegiSunter(c, "id", Seq("b1"),
      Seq("f1", "f2", "f3", "f4"), 0.9, minScore = -1000.0)
    val kept = Linkage.fellegiSunter(c, "id", Seq("b1"),
      Seq("f1", "f2", "f3", "f4"), 0.9, minScore = 0.0)
    val nAll = all.count(); val nKept = kept.count()
    assert(nKept > 0, "threshold must keep some probable matches")
    assert(nKept < nAll, "threshold must drop the bulk of non-matches")
    assert(kept.filter(col("score") <= 0.0).count() === 0L)
  }
}
