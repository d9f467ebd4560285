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

  // ---- q193 emRefine -------------------------------------------------

  /** Straight-line EM reference over explicit agreement vectors,
    * replicating the engine's grid math (1e-6 posterior rounding,
    * integer micro sums, double divisions from longs).
    */
  private def emRef(gs: Seq[Seq[Int]], u0: Seq[Double], rounds: Int,
      p0: Double = 0.1, m0: Double = 0.9): (Double, Seq[Double], Seq[Double]) = {
    val nf = u0.size
    var p = p0
    var mm = Seq.fill(nf)(m0)
    var uu = u0
    (1 to rounds).foreach { _ =>
      val ws = gs.map { g =>
        var num = p; var alt = 1.0 - p
        (0 until nf).foreach { i =>
          num *= (if (g(i) == 1) mm(i) else 1.0 - mm(i))
          alt *= (if (g(i) == 1) uu(i) else 1.0 - uu(i))
        }
        BigDecimal(1000000.0 * (num / (num + alt)))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      val n = gs.size.toLong
      val sw = ws.sum
      p = sw.toDouble / (n * 1000000L).toDouble
      mm = (0 until nf).map { i =>
        gs.zip(ws).map { case (g, w) => w * g(i) }.sum.toDouble / sw.toDouble
      }
      uu = (0 until nf).map { i =>
        val swg = gs.zip(ws).map { case (g, w) => w * g(i) }.sum
        val sg = gs.map(_(i).toLong).sum
        (sg * 1000000L - swg).toDouble / (n * 1000000L - sw).toDouble
      }
    }
    (p, mm, uu)
  }

  private def r6d(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("emRefine matches the straight-line grid reference") {
    // one block of 5 records; field f: A,A,A,B,C -> agreements vary
    val df = Seq((1L, "x", "A"), (2L, "x", "A"), (3L, "x", "A"),
      (4L, "x", "B"), (5L, "x", "C")).toDF("id", "blk", "f")
    val got = Linkage.emRefine(df, "id", Seq("blk"), Seq("f"), rounds = 2)
      .as[(String, Double, Double, Double)].collect().toSeq
    // pairs (i<j): g=1 for (1,2),(1,3),(2,3); g=0 for the other 7
    val gs = Seq(1, 1, 1, 0, 0, 0, 0, 0, 0, 0).map(Seq(_))
    // u0 = (9+1+1)/25
    val (p, mm, uu) = emRef(gs, Seq(11.0 / 25.0), rounds = 2)
    assert(got === Seq(("f", r6d(p), r6d(mm.head), r6d(uu.head))),
      s"got $got expect ($p, $mm, $uu)")
  }

  test("emRefine is partition-invariant (grid sums)") {
    val c = graft.Tables.customer(spark, sf).select(
      col("c_custkey").as("id"), col("c_mktsegment").as("b1"),
      col("c_nationkey").as("f1"),
      substring(col("c_name"), -1, 1).as("f2"))
    val a = Linkage.emRefine(c, "id", Seq("b1"), Seq("f1", "f2"), 2)
    val b = Linkage.emRefine(c.repartition(7), "id", Seq("b1"),
      Seq("f1", "f2"), 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
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

  test("oversized block fails loudly with the offending key") {
    // block "hot" holds 5 records: occupancy 5 > cap 4 must refuse;
    // cap 5 must pass and emit all C(5,2)+C(2,2) pairs
    val df = ((1L to 5L).map(i => (i, "hot", i % 2)) ++
      Seq((6L, "cold", 0L), (7L, "cold", 1L))).toDF("id", "blk", "f")
    val e = intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(df, "id", Seq("blk"), Seq("f"),
        m = 0.9, minScore = -100.0, maxBlockOccupancy = 4L).count()
    }
    assert(e.getMessage.contains("occupancy"), e.getMessage)
    assert(e.getMessage.contains("blk=hot"), e.getMessage)
    assert(e.getMessage.contains("occupancy=5"), e.getMessage)
    val ok = Linkage.fellegiSunter(df, "id", Seq("blk"), Seq("f"),
      m = 0.9, minScore = -100.0, maxBlockOccupancy = 5L).count()
    assert(ok === 11L, s"got $ok")
    // emRefine shares the guard
    val e2 = intercept[IllegalArgumentException] {
      Linkage.emRefine(df, "id", Seq("blk"), Seq("f"), rounds = 1,
        maxBlockOccupancy = 4L).count()
    }
    assert(e2.getMessage.contains("blk=hot"), e2.getMessage)
  }

  test("q202 golden records: mode tie-break, max rule, singleton passthrough") {
    // cluster {1,2,3,4}: nat 10 x2, 20 x2 (tie -> min 10); bal max 9.0
    // cluster {6,7}: nat 30 x1, 20 x1 (tie -> min 20)
    // singleton {9}: passes through verbatim
    val recs = Seq(
      (1L, 10, 3.0), (2L, 10, 9.0), (3L, 20, 1.0), (4L, 20, 2.0),
      (6L, 30, 5.0), (7L, 20, 4.0),
      (9L, 40, 7.0)).toDF("id", "nat", "bal")
    // transitive chain 1-2, 2-3, 3-4 (NOT a clique: closure is the point)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L))
      .toDF("ida", "idb")
    val got = Linkage.goldenRecords(recs, "id", pairs, "ida", "idb",
      modeCols = Seq("nat"), maxCols = Seq("bal"))
      .as[(Long, Long, Int, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 10, 9.0), (6L, 2L, 20, 5.0), (9L, 1L, 40, 7.0)), got.toSeq)
  }
}
