package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-15 lexical/sketch-union family (q245-q249): shard-merge
  * identity for the global HLL, known-value and invariant checks for
  * Zipf slope, KL drift, transition entropy, and pairwise JS.
  */
class LexicalDriftSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("q245: shard max-merge equals the direct global register build") {
    // direct build: every word under ONE pseudo-source
    val direct = Sketches.hllGlobalDistinct(
      docs.withColumn("source", lit("all")), "text", "source")
      .select(col("n_exact"), col("hll_est"), col("reg_zeros"))
      .collect().head
    val merged = Sketches.hllGlobalDistinct(docs, "text", "source")
      .select(col("n_exact"), col("hll_est"), col("reg_zeros"))
      .collect().head
    assert(merged === direct)
    val row = Sketches.hllGlobalDistinct(docs, "text", "source")
      .collect().head
    assert(row.getAs[Long]("n_sources") > 1L)
    assert(row.getAs[Long]("hll_est") > 0L)
  }

  test("q246: zipf slope matches a straight-line OLS on a known corpus") {
    // freqs 8,4,2,1 over ranks 1..4
    val text = (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++
      Seq.fill(2)("cc") ++ Seq("dd")).mkString(" ")
    val df = Seq(("s1", text)).toDF("source", "text")
    val got = TextAnalysis.zipfSlope(df, "text", "source")
      .as[(String, Long, Double)].collect().head
    val xs = (1 to 4).map(r => math.round(1000.0 * math.log(r)))
    val ys = Seq(8L, 4L, 2L, 1L).map(f => math.round(1000.0 * math.log(f.toDouble)))
    val n = 4L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = BigDecimal((n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === (("s1", 4L, slope)))
    // natural-ish corpus: slope negative for every source
    TextAnalysis.zipfSlope(docs, "text", "source")
      .as[(String, Long, Double)].collect()
      .foreach { case (_, _, s) => assert(s < 0.0) }
  }

  test("q247: identical sources have KL 0; a skewed source is positive") {
    val base = "aa bb cc dd"
    val df = Seq(("s1", base), ("s2", base), ("skew", "aa aa aa aa"))
      .toDF("source", "text")
    val kl = TextAnalysis.sourceLexicalDrift(df, "text", "source")
      .select(col("source"), col("kl_corpus"))
      .as[(String, Double)].collect().toMap
    assert(kl("s1") === kl("s2"))
    assert(kl("skew") > kl("s1"))
    // entropies: uniform-4 source = ln 4; constant source = 0
    val ent = TextAnalysis.sourceLexicalDrift(df, "text", "source")
      .select(col("source"), col("entropy"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(ent("s1") - math.log(4.0)) < 1e-3)
    assert(math.abs(ent("skew")) < 1e-3) // 0 up to grid resolution
  }

  test("q248: deterministic chains have 0 transition entropy, branching > 0") {
    val df = Seq(
      ("det", "aa bb aa bb aa bb aa bb"), // every x has one successor
      ("br", "aa bb aa cc aa bb aa cc")) // aa branches 50/50
      .toDF("source", "text")
    val ent = TextAnalysis.sourceBigramEntropy(df, "text", "source")
      .select(col("source"), col("transition_entropy"))
      .as[(String, Double)].collect().toMap
    assert(ent("det") === 0.0)
    assert(ent("br") > 0.0 && ent("br") < math.log(2.0) + 1e-6)
  }

  test("q261 burstiness: a bursty word outranks a uniform one; VMR reference") {
    // "zz" appears 10x in ONE doc of 20; "aa" once in every doc
    val texts = (0 until 20).map { i =>
      if (i == 0) ("aa " + Seq.fill(10)("zz").mkString(" "))
      else "aa filler" + i.toString.takeRight(1)
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.wordBurstiness(df, "text", "doc_id",
      k = 50, minDocs = 1L)
      .select(col("word"), col("vmr"), col("rank"))
      .as[(String, Double, Int)].collect()
    val byWord = got.map(r => r._1 -> r._2).toMap
    assert(byWord("zz") > byWord("aa"))
    assert(got.minBy(_._3)._1 === "zz") // rank 1
    // straight-line VMR for zz: counts = (10, 0 x19), n=20
    val n = 20.0
    val (sc, sc2) = (10.0, 100.0)
    val want = ((sc2 - sc * sc / n) / (n - 1.0)) / (sc / n)
    assert(math.abs(byWord("zz") -
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    // uniform word: variance 0 -> VMR 0
    assert(byWord("aa") === 0.0)
  }

  test("q262 hapax: all-distinct source ratio 1, all-repeated source 0") {
    val df = Seq(
      ("fresh", "alpha beta gamma delta"),
      ("dup", "same same same words words")).toDF("source", "text")
    val got = TextAnalysis.hapaxRatio(df, "text", "source")
      .select(col("source"), col("vocab"), col("hapax"),
        col("hapax_ratio"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("fresh") === (("fresh", 4L, 4L, 1.0)))
    assert(got("dup") === (("dup", 2L, 0L, 0.0)))
  }

  test("q249: JS is 0 for identical sources, bounded by ln 2, omits disjoint pairs") {
    val df = Seq(
      ("s1", "aa bb cc"), ("s2", "aa bb cc"),
      ("other", "aa zz zz"), ("alien", "qq rr ss"))
      .toDF("source", "text")
    val rows = TextAnalysis.sourceJsDivergence(df, "text", "source")
      .select(col("src_a"), col("src_b"), col("js"))
      .as[(String, String, Double)].collect()
    val m = rows.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("s1", "s2")) === 0.0)
    rows.foreach { case (_, _, js) =>
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-6)
    }
    // alien shares no word with s1/s2 — those pairs are omitted
    assert(!m.contains(("alien", "s1")) && !m.contains(("s1", "alien")))
    assert(m.contains(("alien", "other")) === false)
    // real corpus: full pair coverage (shared vocab), all within bounds
    val real = TextAnalysis.sourceJsDivergence(docs, "text", "source")
      .as[(String, String, Long, Double)].collect()
    assert(real.length === 190) // C(20, 2)
    real.foreach { case (_, _, nc, js) =>
      assert(nc > 0 && js >= 0.0 && js <= math.log(2.0) + 1e-6)
    }
  }
}
