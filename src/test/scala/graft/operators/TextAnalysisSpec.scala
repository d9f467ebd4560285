package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat and the dog, in the house!", "en"),
    (2L, "der hund und die katze ist nicht da", "de"),
    (3L, "le chat est une petite chose du jour", "fr"),
    (4L, "el perro es una cosa del dia que pasa", "es"),
    (5L, "zzz qqq xxx", "zh"),
    (6L, "", "en"),
  ).toDF("doc_id", "text", "lang")

  test("tokenCount: whitespace semantics incl. empty string") {
    val counts = docs.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts(1L) == 8L)
    assert(counts(6L) == 0L)
  }

  test("langId picks the stopword-majority language, und when no hits") {
    val pred = TextAnalysis.langId(docs, "text", "doc_id")
      .as[(Long, String)].collect().toMap
    assert(pred(1L) == "en")
    assert(pred(2L) == "de")
    assert(pred(3L) == "fr")
    assert(pred(4L) == "es")
    assert(pred(5L) == "und")
  }

  test("quality: ratios bounded and deterministic") {
    val q = TextAnalysis.quality(docs, "text", "doc_id").collect()
    assert(q.length == docs.count())
    q.foreach { r =>
      val punct = r.getAs[Double]("punct_ratio")
      val stop = r.getAs[Double]("stopword_ratio")
      assert(punct >= 0 && punct <= 1)
      assert(stop >= 0)
    }
  }

  test("fingerprint: order-sensitive, stable, bounded") {
    val fps = docs.filter($"doc_id" <= 2)
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    val again = docs.filter($"doc_id" <= 2)
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps == again)
    assert(fps(1L) != fps(2L))
    assert(fps.values.forall(v => v >= 0 && v < 1000000007L))
    // order sensitivity: reversed word order must change the fingerprint
    val rev = Seq((1L, "house the in, dog the and cat the")).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint($"text")).as[Long].head()
    assert(rev != fps(1L))
  }

  test("bpe-ish token estimate counts word pieces and punctuation") {
    val n = Seq(("hello, world 42!")).toDF("text")
      .select(TextAnalysis.bpeTokenCount($"text")).as[Long].head()
    // hello | , | world | 4 | 2 | !
    assert(n == 6L)
  }

  test("native RollingHashExpr is bit-identical to the HOF formulation") {
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val native = docs.select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    val hof = docs.select($"doc_id", TextAnalysis.fingerprintHof($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(native == hof)
    // empty-string path: HOF folds over [""] with ascii("")=0 -> 0
    val empty = Seq(Tuple1("")).toDF("text")
      .select(TextAnalysis.fingerprint($"text"), TextAnalysis.fingerprintHof($"text"))
      .as[(Long, Long)].head()
    assert(empty == ((0L, 0L)))
  }

  test("tfidf: rare terms outscore ubiquitous ones; ranks deterministic") {
    val docs = Seq(
      (1L, "common common zebra"),
      (2L, "common yak"),
      (3L, "common common common"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .select($"doc_id", $"term", $"rank").as[(Long, String, Long)].collect().toSet
    // "common" appears in all 3 docs -> idf = ln(1) = 0; unique terms win
    assert(out.contains((1L, "zebra", 1L)))
    assert(out.contains((2L, "yak", 1L)))
    // counts: every doc emits at most k=2 distinct terms
    val byDoc = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byDoc.values.forall(_ <= 2))
  }
}
