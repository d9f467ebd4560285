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

  test("trainSplit: deterministic, order-independent, respects percentages") {
    val docs = graft.Tables.documents(spark, sf)
    val a = Pipelines.trainSplit(docs, "doc_id")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // rerun over a different physical layout -> identical assignment
    val b = Pipelines.trainSplit(docs.repartition(7), "doc_id")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // bucket boundaries define the split label exactly
    a.foreach { case (id, bucket, split) =>
      assert(bucket == math.floorMod(id * 2654435761L, 100L))
      val expect = if (bucket < 80) "train" else if (bucket < 90) "valid" else "test"
      assert(split == expect, s"doc $id")
    }
    // every split is populated and train dominates (multiplicative hashing
    // spreads sequential ids near-uniformly over buckets)
    val byS = a.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byS.keySet == Set("train", "valid", "test"))
    assert(byS("train") > byS("valid") && byS("train") > byS("test"))
  }

  test("stratifiedSample: per-stratum rates honored exactly and deterministically") {
    val docs = graft.Tables.documents(spark, sf)
    val rates = Map("en" -> 50, "de" -> 30, "fr" -> 20, "es" -> 10)
    val out = Pipelines.stratifiedSample(docs, "doc_id", "lang", rates, defaultPct = 100)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    // membership is exactly the bucket predicate — no rng, no order effects
    val all = docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    val expect = all.filter { case (id, lang) =>
      math.floorMod(id * 2654435761L, 100L) < rates.getOrElse(lang, 100)
    }.toSet
    assert(out == expect && out.nonEmpty && out.size < all.length)
    // unlisted strata use the default rate (here: keep everything)
    val perLang = all.groupBy(_._2).view.mapValues(_.length).toMap
    val keptPerLang = out.groupBy(_._2).view.mapValues(_.size).toMap
    perLang.keys.filterNot(rates.contains).foreach { lang =>
      assert(keptPerLang.getOrElse(lang, 0) == perLang(lang), s"default rate broke $lang")
    }
    // rate 0 excludes a stratum entirely
    val none = Pipelines.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0), defaultPct = 100)
    assert(none.filter($"lang" === "en").isEmpty)
  }
}
