package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CdcChunksExpr]] against a local windowed-recompute reference (the
  * kernel rolls the hash in O(1) per position — the reference recomputes
  * each window from scratch, so agreement pins the rolling update), plus
  * the contract properties: lossless reconstruction and the
  * shift-resilience that is CDC's whole reason to exist.
  */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L
  private val K = 8
  private val D = 64

  private def refChunks(t: String): Seq[String] = {
    val cps = t.codePoints().toArray
    val m = cps.length
    if (m == 0) return Seq.empty
    if (m < K) return Seq(t)
    def winHash(end: Int): Long = { // end = 1-based inclusive
      var acc = 0L
      var j = end - K
      while (j < end) { acc = (acc * 31L + cps(j)) % P; j += 1 }
      acc
    }
    // utf16 offset per code point for slicing
    val offs = new Array[Int](m + 1)
    var i = 0
    for (c <- 0 until m) { offs(c) = i; i += Character.charCount(cps(c)) }
    offs(m) = t.length
    val out = Seq.newBuilder[String]
    var start = 0
    for (end <- K to m) {
      if (winHash(end) % D == 0) {
        out += t.substring(offs(start), offs(end)); start = end
      }
    }
    if (start < m) out += t.substring(offs(start))
    out.result()
  }

  private def inputs = {
    val crafted = Seq(
      "", "x", "exactly8", "shorter",
      "héllo wörld héllo wörld héllo wörld wieder",
      "日本語のテキストの繰り返し日本語のテキストとその続き",
      "😀😁😂😃😄😅😆😇 astral plane chunking check 😀😁😂😃",
      "a" * 500
    ).toDF("t")
    spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.operators.TextShingles.normalize(col("text")).as("t"))
      .limit(200)
      .unionAll(crafted)
  }

  test("native cdc_chunks == windowed-recompute local reference") {
    val rows = inputs.select(col("t"),
      CdcChunksExpr.cdcChunks(col("t"), K, D).as("chunks"))
      .as[(String, Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, got) =>
      assert(got == refChunks(t), s"divergence on: $t")
    }
  }

  test("chunks reconstruct the input losslessly") {
    val bad = inputs.select(col("t"),
      concat_ws("", CdcChunksExpr.cdcChunks(col("t"), K, D)).as("rejoined"))
      .filter(col("t") =!= col("rejoined"))
    assert(bad.count() === 0)
  }

  test("shift resilience: a prefix insertion leaves the chunk tail aligned") {
    // the CDC contract: prepending text changes chunking only NEAR the
    // edit — fixed-stride chunking (q132) would misalign every chunk.
    // The suffix of the chunk list re-synchronizes once a boundary past
    // the edit is reached.
    val doc = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val edited = "INSERTED PREFIX " + doc
    val Seq(a, b) = Seq(doc, edited).toDF("t")
      .select(CdcChunksExpr.cdcChunks(col("t"), K, D).as("c"))
      .as[Seq[String]].collect().toSeq
    val common = a.toSet.intersect(b.toSet)
    assert(common.nonEmpty,
      s"no chunk survived a prefix edit — not content-defined:\n$a\n$b")
    // the original's tail chunks all survive verbatim
    assert(a.last == b.last, s"tails differ: ${a.last} vs ${b.last}")
  }
}
