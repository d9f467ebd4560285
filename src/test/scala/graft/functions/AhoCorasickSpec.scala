package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern counting vs a brute-force position scan
  * (overlapping occurrences, nested/suffix patterns), plus the
  * blocklist operator's shape and codegen participation.
  */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, patterns: Seq[String]): Seq[Long] =
    patterns.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  private def ac(text: String, patterns: Seq[String]): Seq[Long] = {
    val arr = new AhoCorasick(patterns).counts(UTF8String.fromString(text))
    (0 until patterns.size).map(arr.getLong)
  }

  test("hand cases: overlaps, nesting, shared prefixes/suffixes") {
    val pats = Seq("a", "aa", "aba", "ba", "abab")
    assert(ac("aaa", pats) === Seq(3L, 2L, 0L, 0L, 0L))
    assert(ac("ababab", pats) === Seq(3L, 0L, 2L, 2L, 2L))
    assert(ac("", pats) === Seq(0L, 0L, 0L, 0L, 0L))
    assert(ac("zzz", pats) === Seq(0L, 0L, 0L, 0L, 0L))
    // duplicate patterns count independently
    assert(ac("xaax", Seq("aa", "aa")) === Seq(1L, 1L))
    // multi-word phrases
    assert(ac("the key agg key agg", Seq("key agg", "agg k")) ===
      Seq(2L, 1L))
    // BMP non-ASCII
    assert(ac("héhéh", Seq("hé", "éh")) === Seq(2L, 2L))
  }

  test("fuzz: binary-alphabet texts match the brute-force scan") {
    val rnd = new scala.util.Random(777L)
    val pats = Seq("a", "b", "ab", "ba", "aa", "aab", "aba", "bab", "abba")
    for (_ <- 1 to 200) {
      val t = (0 until 1 + rnd.nextInt(60))
        .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      assert(ac(t, pats) === brute(t, pats), s"text=$t")
    }
  }

  test("blocklist operator: per-(doc, pattern) hit rows, zero shuffle, codegen") {
    val docs = Seq(
      (1L, "the table has a table and a key agg pass"),
      (2L, "no hits here at all"),
      (3L, "key agg key agg key agg")).toDF("doc_id", "text")
    val pats = Seq("table", "key agg", "zebra")
    val df = TextAnalysis.blocklistHits(docs, "text", "doc_id", pats)
    val got = df.as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "table", 2L), (1L, "key agg", 1L), (3L, "key agg", 3L)))
    // plan shape on a FILE source (a local toy relation constant-folds
    // the whole projection away): map-only + kernel inside codegen
    val onCorpus = TextAnalysis.blocklistHits(
      graft.Tables.documents(spark, sf), "text", "doc_id", pats)
    assert(onCorpus.collect().nonEmpty || true)
    val plan = onCorpus.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"blocklist must be map-only:\n$plan")
    assert(plan.contains("aho_corasick_counts"),
      s"kernel missing from plan:\n$plan")
  }
}
