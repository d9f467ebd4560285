package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q169 TextRank keywords: hub words outrank leaves, determinism, and
  * the normalization/self-loop edges.
  */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("a hub word adjoining many distinct words outranks its leaves") {
    val docs = Seq("hub alpha", "hub beta", "hub gamma", "hub delta",
      "solo duo").map(Tuple1(_)).toDF("text")
    val got = TextAnalysis.textRankKeywords(docs, "text", topK = 10)
      .select(col("word"), col("rank")).as[(String, Long)].collect().toMap
    assert(got("hub") > got("alpha"), s"got $got")
    assert(got("hub") > got("solo"))
    // leaves of the same hub tie exactly on the integer grid
    assert(got("alpha") === got("beta"))
    // the isolated pair is a symmetric 2-cycle: exact fixed point 1e6
    assert(got("solo") === 1000000L && got("duo") === 1000000L)
  }

  test("self-adjacency and case/whitespace normalize away") {
    val docs = Seq(("Hub  hub ALPHA"), ("hub beta")).map(Tuple1(_))
      .toDF("text")
    val words = TextAnalysis.textRankKeywords(docs, "text", topK = 10)
      .select(col("word")).as[String].collect().toSet
    // "hub hub" self-loop dropped; casing folded
    assert(words === Set("hub", "alpha", "beta"))
  }

  test("textrank is partition-invariant on sf0.001 documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = TextAnalysis.textRankKeywords(docs, "text", topK = 20)
    val b = TextAnalysis.textRankKeywords(docs.repartition(9), "text",
      topK = 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
