package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-lookup kernel + q208 negative sampling: boundary exactness,
  * search fuzz vs a linear reference, guards, and a straight-line
  * replica of the full sampling pipeline on a tiny corpus.
  */
class RangeLookupSpec extends SparkSpec {
  import spark.implicits._

  test("boundaries: r lands in [lo, hi) exactly") {
    // weights a:3 (0..2), b:1 (3), c:5 (4..8)
    val bounds = Seq(3L, 4L, 9L)
    val vals = Seq("a", "b", "c")
    val got = (0L to 8L).map(Tuple1(_)).toDF("r")
      .select(RangeLookupExprs.lookup(col("r"), bounds, vals))
      .as[String].collect().toSeq
    assert(got == Seq("a", "a", "a", "b", "c", "c", "c", "c", "c"))
  }

  test("fuzz: binary search equals a linear scan") {
    val rnd = new scala.util.Random(7)
    val weights = (1 to 200).map(_ => 1L + rnd.nextInt(50))
    val bounds = weights.scanLeft(0L)(_ + _).tail
    val vals = (1 to 200).map(i => s"w$i")
    val rs = (1 to 500).map(_ =>
      (rnd.nextDouble() * bounds.last).toLong min (bounds.last - 1))
    val got = rs.map(Tuple1(_)).toDF("r")
      .select(RangeLookupExprs.lookup(col("r"), bounds, vals))
      .as[String].collect().toSeq
    val want = rs.map(r => vals(bounds.indexWhere(r < _)))
    assert(got == want)
  }

  test("out-of-range draw throws; malformed bounds rejected") {
    val e = intercept[Exception] {
      Seq(Tuple1(9L)).toDF("r")
        .select(RangeLookupExprs.lookup(col("r"), Seq(3L, 9L), Seq("a", "b")))
        .collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      new RangeTable(Seq(3L, 3L), Seq("a", "b")).lookup(0L)
    }
  }

  test("q208 pipeline equals a straight-line replica on a tiny corpus") {
    val docs = Seq((1L, "x y z x"), (2L, "y x")).toDF("doc_id", "text")
    val got = graft.operators.NegativeSampling
      .skipgramWithNegatives(docs, "text", "doc_id",
        window = 1, negatives = 2)
      .as[(String, String, Long, Long, String)].collect().toSet
    // replica: tokens, +-1 pairs, unigram cum by token asc, seeded draws
    val toksByDoc = Map(1L -> Seq("x", "y", "z", "x"), 2L -> Seq("y", "x"))
    val pairs = toksByDoc.values.flatMap { ts =>
      ts.zipWithIndex.flatMap { case (c, i) =>
        Seq(i - 1, i + 1).filter(j => j >= 0 && j < ts.size)
          .map(j => (c, ts(j)))
      }
    }.groupBy(identity).map { case (p, o) => (p._1, p._2, o.size.toLong) }
    val counts = toksByDoc.values.flatten
      .groupBy(identity).map { case (w, o) => (w, o.size.toLong) }
      .toSeq.sortBy(_._1)
    val bounds = counts.map(_._2).scanLeft(0L)(_ + _).tail
    val total = bounds.last
    def poly(s: String): Long =
      s.foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % 1000000007L)
    val want = pairs.flatMap { case (c, x, n) =>
      (1L to 2L).map { k =>
        val gid = (poly(s"$c $x") * 31 + k) % 1000000007L
        val draw = (((gid % 1000003L) * 2654435761L) >> 16) % total
        val neg = counts(bounds.indexWhere(draw < _))._1
        (c, x, n, k, neg)
      }
    }.toSet
    assert(got == want, s"${got.diff(want)} / ${want.diff(got)}")
  }
}
