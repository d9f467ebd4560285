package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming winnowing quote gate: stream ≡ batch screen, plus the
  * structural guarantee — a verbatim quote of >= k + w - 1 characters
  * from an indexed doc ALWAYS flags, even embedded in otherwise-novel
  * text (the case the whole-document MinHash gate can miss).
  */
class StreamingQuoteGateSpec extends SparkSpec {
  import spark.implicits._

  test("stream screening == batch screen; embedded quote flagged, novel passes") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val corpus = docs.take(30).toSeq.toDF("doc_id", "text")
    val k = 8; val w = 4
    val index = StreamingQuoteGate.corpusIndex(corpus, "text", "doc_id",
      k, w).cache()

    // quote: k+w-1-plus chars lifted verbatim from a corpus doc, embedded
    // in novel context — MUST flag (the winnowing guarantee); the quote
    // must survive normalization, so take it from the normalized text
    val normed = docs(5)._2.trim.toLowerCase.replaceAll("\\s+", " ")
    val quote = normed.substring(10, 10 + math.max(k + w - 1, 40))
    val quoting = (2000L,
      s"zzq wvx unrelated opening $quote and an unrelated zzk closing")
    val novel = (2001L, "qzv wkj xbt completely novel drivel nothing " +
      "shared with any corpus document qpx mlr")
    val verbatim = (2002L, docs(3)._2)

    val in = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Map[Long, Map[Long, (Long, Int)]]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("quote_gate").toString
    val q = StreamingQuoteGate.gate(
      in.toDF().toDF("doc_id", "text"), index, "text", "doc_id", ckpt,
      (df, id) => out.synchronized {
        out(id) = df.select($"doc_id", $"shared_fps", $"quotes_corpus")
          .as[(Long, Long, Int)].collect()
          .map { case (d, s, f) => d -> (s, f) }.toMap
      }, k, w, minShared = 1)
    try {
      in.addData(quoting, novel)
      q.processAllAvailable()
      in.addData(verbatim)
      q.processAllAvailable()
    } finally q.stop()
    val got = out.values.flatten.toMap

    // parity with the batch screen over the same rows
    val expect = StreamingQuoteGate.screen(
      Seq(quoting, novel, verbatim).toDF("doc_id", "text"),
      index, "text", "doc_id", k, w, minShared = 1)
      .select($"doc_id", $"shared_fps", $"quotes_corpus")
      .as[(Long, Long, Int)].collect()
      .map { case (d, s, f) => d -> (s, f) }.toMap
    assert(got === expect, s"stream=$got batch=$expect")

    assert(got(2000L)._2 === 1, s"embedded quote must flag: ${got(2000L)}")
    assert(got(2001L)._2 === 0, s"novel doc must pass: ${got(2001L)}")
    assert(got(2002L)._2 === 1 && got(2002L)._1 > got(2000L)._1,
      "verbatim copy must flag with more shared fps than the short quote")
    index.unpersist()
  }
}
