package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q177 join-key skew report: hand-computed shares/entropy on planted
  * skew, the direction the diagnostic exists for, and grid determinism.
  */
class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("planted hot key: shares and entropy are exact") {
    // hot: 90 rows of key 7 + 10 distinct singletons
    val rows = Seq.fill(90)(7L) ++ (100L to 109L)
    val df = rows.map(Tuple1(_)).toDF("k")
    val got = Skew.joinKeySkewReport(df, Seq("k"))
      .as[(String, Long, Long, Long, Long, Double)].head()
    val (_, n, d, top1, top10, h) = got
    assert((n, d, top1) == ((100L, 11L, 900000L)))
    // top-10 = hot key + 9 singletons = 99 rows
    assert(top10 === 990000L)
    // exact entropy: 0.9 ln(1/0.9) + 10 * 0.01 ln(100), each term on the
    // 1e-9 grid before the exact sum
    def t(p: Double) = math.rint(-p * math.log(p) * 1e9) / 1e9
    val expect = BigDecimal(t(0.9) + 10 * t(0.01))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h === expect, s"entropy $h vs $expect")
  }

  test("string join keys report real shares, not a long-cast NULL collapse") {
    // a string key column must NOT degrade to n_distinct=1/top1=1e6
    // (the old cast-to-long bug nulled every row)
    val df = (Seq.fill(3)("us-east") ++ Seq("eu-west", "ap-south"))
      .map(Tuple1(_)).toDF("region")
    val got = Skew.joinKeySkewReport(df, Seq("region"))
      .as[(String, Long, Long, Long, Long, Double)].head()
    val (_, n, d, top1, _, _) = got
    assert((n, d, top1) == ((5L, 3L, 600000L)), s"got $got")
  }

  test("uniform keys approach ln(n); hot keys depress entropy") {
    val uniform = (1L to 64L).map(Tuple1(_)).toDF("k")
    val hU = Skew.joinKeySkewReport(uniform, Seq("k"))
      .select(col("entropy")).as[Double].head()
    assert(math.abs(hU - math.log(64.0)) < 1e-6)
    val hot = (Seq.fill(63)(1L) ++ Seq(2L)).map(Tuple1(_)).toDF("k")
    val hH = Skew.joinKeySkewReport(hot, Seq("k"))
      .select(col("entropy")).as[Double].head()
    assert(hH < 0.1 && hH < hU)
  }

  test("wilson interval: hand case, containment, and the small-n widening") {
    import graft.operators.Relational
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // day 1: 4 viewers, 1 converts (conversion needs BOTH same day);
    // a purchase-only user must not count as a trial or a conversion
    val ev = ((1L to 4L).map(u =>
      (u, "view", ts("2024-01-05 08:00:00"))) ++ Seq(
      (1L, "purchase", ts("2024-01-05 09:00:00")),
      (9L, "purchase", ts("2024-01-05 09:00:00"))))
      .toDF("user_id", "event_type", "ts")
    val r = Relational.conversionWilson(ev)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    val (_, trials, conv, rate, lo, hi) = r
    assert((trials, conv, rate) == ((4L, 1L, 0.25)))
    // Wilson hand-check: z=1.96, n=4, p=0.25
    val z = 1.96; val n = 4.0; val p = 0.25; val z2 = z * z
    val c0 = p + z2 / (2.0 * n)
    val m = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    val d = 1.0 + z2 / n
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(lo === r6((c0 - m) / d) && hi === r6((c0 + m) / d),
      s"got ($lo, $hi)")
    assert(lo >= 0.0 && hi <= 1.0 && lo < rate && rate < hi)
  }

  test("ab z-test: hand counts, pooled z, significance verdict") {
    import graft.operators.Relational
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // arm 0 (even users): user-days 2@d1, 4@d1 -> 2 trials, 1 converts;
    // arm 1 (odd): 1@d1, 3@d1 -> 2 trials, both convert
    val ev = Seq(
      (2L, "view", ts("2024-01-05 08:00:00")),
      (2L, "purchase", ts("2024-01-05 09:00:00")),
      (4L, "view", ts("2024-01-05 08:00:00")),
      (1L, "view", ts("2024-01-05 08:00:00")),
      (1L, "purchase", ts("2024-01-05 09:00:00")),
      (3L, "view", ts("2024-01-05 08:00:00")),
      (3L, "purchase", ts("2024-01-05 09:00:00")))
      .toDF("user_id", "event_type", "ts")
    val r = Relational.abConversionZ(ev)
      .as[(Long, Long, Long, Long, Double, Double, Double, Int)].head()
    assert((r._1, r._2, r._3, r._4) == ((2L, 1L, 2L, 2L)))
    // z = (0.5 - 1.0)/sqrt(0.75*0.25*(1/2+1/2)) = -1.154701
    assert(r._5 === 0.5 && r._6 === 1.0)
    assert(r._7 === -1.154701 && r._8 === 0, s"got $r")
  }

  test("lang confusion: diagonal recall and off-diagonal cells in ppm") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      ("en", "the cat and the dog of the town is that it was for"),
      ("en", "the house and garden of it is that"),
      ("de", "der hund und die katze ist nicht ein problem"),
      ("de", "the quick brown fox jumps over the lazy dog")) // mislabeled
      .toDF("lang", "text")
    val got = TextAnalysis.langConfusion(docs, "text", "lang")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("en", "en")) == ((2L, 1000000L)))
    assert(got(("de", "de")) == ((1L, 500000L)))
    assert(got(("de", "en")) == ((1L, 500000L)), s"got $got")
  }

  test("power-law fit: exact-power-of-two binning and a perfect-fit line") {
    import graft.operators.TextAnalysis
    // lengths planted on exact powers of two: 2^k appears 2^(8-k) times
    // -> ln(count) = 8 ln2 - 1.0 * ln(center): slope exactly -1, r2 = 1
    val rows = (for (k <- 2 to 6; _ <- 1 to (1 << (8 - k)))
      yield (1 << k).toLong).map(Tuple1(_)).toDF("n_chars")
    val got = TextAnalysis.docLengthPowerLaw(rows, "n_chars")
      .as[(Long, Long, Double, Double, Double)].collect()
    val bins = got.map(r => r._1 -> r._2).toMap
    // the integer binning must put 2^k in bin k, not k-1 (the float-log
    // trap this binning exists to avoid)
    assert(bins == Map(2L -> 64L, 3L -> 32L, 4L -> 16L, 5L -> 8L,
      6L -> 4L), s"got $bins")
    assert(got.forall(r => r._3 === -1.0 && r._5 === 1.0),
      s"slope/r2: ${got.head}")
  }

  test("report is partition-invariant on real lineitem keys") {
    val li = graft.Tables.lineitem(spark, sf)
    val a = Skew.joinKeySkewReport(li, Seq("l_partkey", "l_suppkey"))
    val b = Skew.joinKeySkewReport(li.repartition(13),
      Seq("l_partkey", "l_suppkey"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
