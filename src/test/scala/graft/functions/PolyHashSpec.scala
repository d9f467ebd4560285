package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The engine-independent polynomial hash family ([[PolyHashExprs]]) —
  * checked against plain-Scala references (the same arithmetic the
  * DuckDB oracle's list_reduce computes), plus the winnowing paper's
  * structural guarantees.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private val Mod = PolyHashExprs.Mod
  private val Base = PolyHashExprs.Base

  private def refHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  private def refWindowHashes(s: String, k: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) Seq.empty
    else (0 to cps.length - k).map { p =>
      var acc = 0L
      (0 until k).foreach(j => acc = (acc * Base + cps(p + j)) % Mod)
      acc
    }
  }

  private def refWinnow(kh: Seq[Long], w: Int): Seq[Long] =
    if (kh.size < w) Seq.empty
    else (0 to kh.size - w).map { j =>
      val win = kh.slice(j, j + w)
      val m = win.min
      val idx = j + win.lastIndexOf(m) // rightmost min, 0-based k-gram index
      m * PolyHashExprs.PosEncode + (idx + 1)
    }.distinct.sorted

  private def inputs: Seq[String] = {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).limit(100).as[String].collect().toSeq
    corpus ++ Seq("", "a", "héllo wörld", "日本語テキスト",
      "😀😁😂😃😄😅😆😇", "aaaaaaaaaaaaaaaa", "exactly8", "short")
  }

  test("poly_hash == the base-31/1e9+7 code-point fold") {
    val strs = inputs
    val got = strs.toDF("t")
      .select(PolyHashExprs.polyHash(col("t")).as("h"))
      .as[Long].collect().toSeq
    assert(got === strs.map(refHash))
  }

  test("poly_window_hashes == per-position k-gram reference (k=8)") {
    val strs = inputs
    val got = strs.toDF("t")
      .select(PolyHashExprs.polyWindowHashes(col("t"), 8).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(got === strs.map(refWindowHashes(_, 8)))
  }

  test("winnow_select == naive rightmost-min reference (w=4)") {
    val strs = inputs
    val got = strs.toDF("t")
      .select(PolyHashExprs.winnowSelect(
        PolyHashExprs.polyWindowHashes(col("t"), 8), 4).as("s"))
      .as[Seq[Long]].collect().toSeq
    assert(got === strs.map(s => refWinnow(refWindowHashes(s, 8), 4)))
  }

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    // the SIGMOD 2003 theorem: any common substring of k + w - 1 chars
    // forces at least one common selected HASH (positions differ)
    val k = 8
    val w = 4
    val shared = "this exact fragment is long enough to matter"
    val a = s"left context before $shared and then a tail"
    val b = s"completely different opening $shared unrelated ending"
    def fps(s: String): Set[Long] =
      refWinnow(refWindowHashes(s, k), w).map(_ / PolyHashExprs.PosEncode).toSet
    assert(shared.length >= k + w - 1)
    assert(fps(a).intersect(fps(b)).nonEmpty)
  }

  test("winnowing density is ~2/(w+1) of positions") {
    val w = 4
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].collect().mkString(" ")
    val kh = refWindowHashes(text, 8)
    val n = refWinnow(kh, w).size.toDouble / kh.size
    assert(n > 0.2 && n < 0.6, s"density $n outside the expected band")
  }
}
