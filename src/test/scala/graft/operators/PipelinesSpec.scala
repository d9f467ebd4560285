package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("clean-corpus: dedup applied, filters monotone, token totals conserved") {
    val docs = Tables.documents(spark, sf)
    val out = Pipelines.cleanCorpusStats(docs, minTokens = 10L, maxPunctRatio = 0.2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.nonEmpty)
    // kept docs never exceed distinct texts per language
    val distinctTexts = docs.groupBy($"lang")
      .agg(countDistinct($"text").as("n")).as[(String, Long)].collect().toMap
    out.foreach { case (lang, (kept, toks)) =>
      assert(kept <= distinctTexts(lang), s"$lang kept $kept > distinct ${distinctTexts(lang)}")
      assert(toks >= kept * 10, s"$lang: $toks tokens for $kept docs violates minTokens")
    }
    // loosening both thresholds can only keep MORE documents
    val loose = Pipelines.cleanCorpusStats(docs, minTokens = 1L, maxPunctRatio = 1.0)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    out.foreach { case (lang, (kept, _)) =>
      assert(loose(lang) >= kept)
    }
  }
}
