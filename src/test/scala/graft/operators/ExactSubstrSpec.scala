package graft.operators

import graft.SparkSpec
import graft.functions.CommonPrefixLenExpr
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** ExactSubstr suffix-ranking dedup vs a LOCAL SUFFIX-ARRAY REFERENCE:
  * the reference sorts every (doc, pos) suffix lexicographically, takes
  * each position's max LCP with its two order-neighbors (the classic
  * suffix-array longest-match identity), caps at windowCap, thresholds
  * at minLen, and island-merges — the single-node form of the exact
  * algorithm the operator distributes.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private case class Ref(marked: Seq[(Long, Long, Long)],
      spans: Seq[(Long, Long, Long, Long, Long)])

  /** Local suffix-array reference (uncapped sort, capped report). */
  private def reference(docs: Seq[(Long, String)], minLen: Int,
      windowCap: Int): Ref = {
    val suffixes = for {
      (id, t) <- docs if t.length >= minLen
      p <- 1 to t.length
    } yield (id, p.toLong, t.substring(p - 1))
    val sorted = suffixes.sortBy(_._3)
    def lcp(a: String, b: String): Int = CommonPrefixLenExpr.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))
    val marked = sorted.indices.flatMap { i =>
      val here = sorted(i)._3
      val withPrev = if (i > 0) lcp(here, sorted(i - 1)._3) else 0
      val withNext =
        if (i < sorted.size - 1) lcp(here, sorted(i + 1)._3) else 0
      val m = math.min(windowCap, math.max(withPrev, withNext))
      if (m >= minLen) Some((sorted(i)._1, sorted(i)._2, m.toLong))
      else None
    }.sortBy(r => (r._1, r._2))
    val spans = marked.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
      val ps = rows.sortBy(_._2)
      val islands = ps.tail.foldLeft(Vector(Vector(ps.head))) { (acc, r) =>
        if (r._2 - acc.last.last._2 > minLen) acc :+ Vector(r)
        else acc.init :+ (acc.last :+ r)
      }
      islands.map { is =>
        (id, is.head._2, is.last._2 - is.head._2 + minLen,
          is.size.toLong, is.map(_._3).max)
      }
    }
    Ref(marked, spans)
  }

  private def runOperator(docs: Seq[(Long, String)], minLen: Int,
      windowCap: Int, inputParts: Int = 3) = {
    val df = docs.toDF("doc_id", "text").repartition(inputParts)
    val pos = ExactSubstr
      .duplicatedPositions(df, "text", "doc_id", minLen, windowCap)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val spans = ExactSubstr
      .maximalSpans(df, "text", "doc_id", minLen, windowCap)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    (pos, spans)
  }

  private def check(docs: Seq[(Long, String)], minLen: Int,
      windowCap: Int, inputParts: Int = 3): Unit = {
    val ref = reference(docs, minLen, windowCap)
    val (pos, spans) = runOperator(docs, minLen, windowCap, inputParts)
    assert(pos == ref.marked, s"positions diverge for docs=$docs")
    assert(spans == ref.spans.sortBy(r => (r._1, r._2)),
      s"spans diverge for docs=$docs")
  }

  test("planted 100-char cross-doc block emits ONE maximal span, not fixed windows") {
    // unique prefixes/suffixes, one shared 100-char middle; W=64 < 100:
    // marked starts chain across the cap and merge into the full span
    val shared = (0 until 100).map(i => ('a' + (i * 7 % 26)).toChar)
      .mkString
    val d1 = "0123456789" * 3 + shared + "zyxwvutsrq"
    val d2 = "qrstuvwxyz" * 3 + shared + "9876543210"
    val docs = Seq((1L, d1), (2L, d2))
    val (_, spans) = runOperator(docs, 40, 64)
    assert(spans.map(s => (s._1, s._2, s._3)) ==
      Seq((1L, 31L, 100L), (2L, 31L, 100L)), spans.toString)
    // max_match capped at windowCap even though the true match is 100
    assert(spans.forall(_._5 == 64L), spans.toString)
    check(docs, 40, 64)
  }

  test("within-doc repetition: two disjoint spans in one document") {
    val phrase = "the quick brown fox jumps over the lazy dog #" // 46
    val doc = "A" * 20 + phrase + "B" * 30 + phrase + "C" * 20
    val docs = Seq((7L, doc))
    val (_, spans) = runOperator(docs, 40, 64)
    assert(spans.size == 2, spans.toString)
    assert(spans.map(_._3).forall(_ == phrase.length.toLong),
      spans.toString)
    check(docs, 40, 64)
  }

  test("all-unique corpus marks nothing (and exits the rounds early)") {
    val docs = Seq(
      (1L, ('a' to 'z').mkString + ('A' to 'Z').mkString),
      (2L, ('0' to '9').mkString + "!@#$%^&*()[]{}<>:;,.?/~`-=_+|"))
    val (pos, spans) = runOperator(docs, 8, 16)
    assert(pos.isEmpty && spans.isEmpty)
  }

  test("identical documents mark every position; span covers the whole doc") {
    val t = "graft exact substring duplication span test!" // 44 chars
    val docs = Seq((1L, t), (2L, t))
    val (pos, spans) = runOperator(docs, 40, 64)
    // starts 1..len-40+1 are marked; shorter tails cannot reach minLen
    assert(pos.count(_._1 == 1L) == t.length - 40 + 1)
    assert(spans.map(s => (s._2, s._3)).distinct ==
      Seq((1L, t.length.toLong)))
    check(docs, 40, 64)
  }

  test("fuzz: binary-alphabet corpora match the suffix-array reference") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 12) {
      val docs = (1L to (2 + rnd.nextInt(4)).toLong).map { id =>
        val n = 30 + rnd.nextInt(120)
        id -> (0 until n).map(_ => if (rnd.nextBoolean()) 'a' else 'b')
          .mkString
      }
      check(docs, minLen = 6, windowCap = 16,
        inputParts = 1 + rnd.nextInt(6))
    }
  }

  test("fuzz: word-salad corpora at a 12-char threshold match the reference") {
    val rnd = new scala.util.Random(8080L)
    val vocab = Vector("spark", "table", "scan", "row", "agg", "key")
    for (_ <- 1 to 8) {
      val docs = (1L to 4L).map { id =>
        id -> (0 until 10 + rnd.nextInt(30))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      check(docs, minLen = 12, windowCap = 16)
    }
  }

  test("partition invariance: 1-partition and 7-partition inputs agree") {
    val rnd = new scala.util.Random(99L)
    val docs = (1L to 5L).map { id =>
      id -> (0 until 200).map(_ => if (rnd.nextInt(3) == 0) 'x' else 'y')
        .mkString
    }
    val a = runOperator(docs, 6, 16, inputParts = 1)
    val b = runOperator(docs, 6, 16, inputParts = 7)
    assert(a == b)
  }

  test("match_len reports the exact (uncapped-within-window) longest match") {
    // two docs share exactly 50 chars from aligned starts, then diverge;
    // period-26 construction: the longest SELF-overlap is 50-26=24 < 40,
    // so only the aligned cross-doc match reaches the threshold
    val shared = (0 until 50).map(i => ('a' + (i * 11 % 26)).toChar)
      .mkString
    assert(shared.length == 50)
    val docs = Seq((1L, shared + "AAAAAAAAAA"), (2L, shared + "BBBBBBBBBB"))
    val (pos, _) = runOperator(docs, 40, 64)
    // the suffix at pos 1 of each doc matches the other for exactly 50
    assert(pos.filter(_._2 == 1L).map(_._3).distinct == Seq(50L))
    check(docs, 40, 64)
  }

  test("removeSpans cuts exactly the reference spans out of each doc") {
    // identical docs (fully covered -> empty), a partial overlap pair,
    // an untouched doc, and a doc shorter than minLen (passes through)
    val t = "exact duplicated span removal unit test 0123456789!" // > 40
    val shared = (0 until 60).map(i => ('a' + (i * 7 % 26)).toChar)
      .mkString
    val docs = Seq(
      (1L, t), (2L, t),
      (3L, "PREFIX-3##" + shared + "##SUFFIX-3"),
      (4L, "prefix-4@@" + shared + "@@suffix-4"),
      (5L, ('A' to 'Z').mkString + ('0' to '9').mkString),
      (6L, "short doc"))
    val minLen = 40
    val ref = reference(docs, minLen, 64)
    def refClean(id: Long, text: String): String = {
      val spans = ref.spans.filter(_._1 == id).sortBy(_._2)
      val keptB = new StringBuilder
      var cursor = 1L
      spans.foreach { case (_, a, l, _, _) =>
        keptB ++= text.substring(cursor.toInt - 1, a.toInt - 1)
        cursor = a + l
      }
      keptB ++= text.substring(cursor.toInt - 1)
      keptB.toString
    }
    val got = ExactSubstr.removeSpans(
        docs.toDF("doc_id", "text"), "text", "doc_id", minLen, 64)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === docs.map(_._1).toSet, "every doc passes through")
    docs.foreach { case (id, text) =>
      val want = refClean(id, text)
      val (_, clean, nSpans, removed, kept) = got(id)
      assert(clean === want, s"doc $id cleaned text diverges")
      assert(kept === want.length.toLong, s"doc $id kept_chars")
      assert(removed === (text.length - want.length).toLong,
        s"doc $id removed_chars")
      assert(nSpans === ref.spans.count(_._1 == id).toLong,
        s"doc $id n_spans")
    }
    // the identical pair is fully covered
    assert(got(1L)._2 === "" && got(2L)._2 === "")
    // the short and unique docs pass through verbatim
    assert(got(5L)._2 === docs(4)._2 && got(6L)._2 === "short doc")
  }

  /** Gram-identity reference for cross-corpus marking: a train position
    * is covered iff its minLen-gram occurs anywhere in the bench side.
    */
  private def crossReference(train: Seq[(Long, String)],
      bench: Seq[(Long, String)], minLen: Int)
      : Seq[(Long, Long, Long, Long)] = {
    val benchGrams = bench.flatMap { case (_, t) =>
      (1 to t.length - minLen + 1).map(p => t.substring(p - 1, p - 1 + minLen))
    }.toSet
    train.flatMap { case (id, t) =>
      val marked = (1 to t.length - minLen + 1).filter(p =>
        benchGrams.contains(t.substring(p - 1, p - 1 + minLen)))
      if (marked.isEmpty) Nil
      else {
        val islands = marked.tail.foldLeft(Vector(Vector(marked.head))) {
          (acc, p) =>
            if (p - acc.last.last > minLen) acc :+ Vector(p)
            else acc.init :+ (acc.last :+ p)
        }
        islands.map(is => (id, is.head.toLong,
          is.last.toLong - is.head + minLen, is.size.toLong))
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("cross-corpus spans mark ONLY bench-shared substrings (not in-train dups)") {
    val benchPhrase = (0 until 55).map(i => ('a' + (i * 7 % 26)).toChar)
      .mkString
    val trainDup = (0 until 50).map(i => ('a' + (i * 11 % 26)).toChar)
      .mkString.toUpperCase
    val train = Seq(
      (1L, "t1-head##" + benchPhrase + "##t1-tail"), // contaminated
      (2L, "t2-head~~" + trainDup + "~~t2-tail"),    // in-train dup only
      (3L, "t3-head!!" + trainDup + "!!t3-tail"),    // in-train dup only
      (4L, ('a' to 'z').mkString + ('A' to 'Z').mkString)) // clean
    val bench = Seq((9L, "bench-pre//" + benchPhrase + "//bench-post"))
    val want = crossReference(train, bench, 40)
    val got = ExactSubstr.crossCorpusSpans(
        train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        "text", "doc_id", minLen = 40, windowCap = 64)
      .select(col("doc_id"), col("span_start"), col("span_len"),
        col("n_dup_starts"))
      .as[(Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got === want, s"got $got want $want")
    // the contaminated doc's span is exactly the 55-char bench phrase;
    // the in-train duplicate pair must NOT mark (q194 semantics would)
    assert(got.map(_._1).toSet === Set(1L))
    assert(got.head._3 === 55L)
    val sameSide = ExactSubstr.maximalSpans(
        train.toDF("doc_id", "text"), "text", "doc_id", 40, 64)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(sameSide.map(_._1).toSet === Set(2L, 3L),
      "q194 semantics mark the in-train pair (sanity split)")
  }

  test("cross-corpus fuzz: word-salad corpora match the gram reference") {
    val rnd = new scala.util.Random(4242L)
    val vocab = Vector("spark", "table", "scan", "row", "agg", "key")
    for (_ <- 1 to 8) {
      def mk(n: Int) = (0 until n)
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val train = (1L to 4L).map(id => id -> mk(10 + rnd.nextInt(25)))
      val bench = (1L to 2L).map(id => id -> mk(10 + rnd.nextInt(25)))
      val want = crossReference(train, bench, 12)
      val got = ExactSubstr.crossCorpusSpans(
          train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
          "text", "doc_id", minLen = 12, windowCap = 16)
        .select(col("doc_id"), col("span_start"), col("span_len"),
          col("n_dup_starts"))
        .as[(Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      assert(got === want, s"train=$train bench=$bench")
    }
  }

  test("prefix-doubling path (windowCap > directSortCap) is bit-identical to the direct sort") {
    // r19: windowCap <= spark.graft.exactSubstr.directSortCap (default
    // 256) takes ONE range sort on the capped prefix; above it the
    // seeded prefix-doubling rank pipeline runs. Both must produce the
    // identical marked set — (rank, rank-at-offset, id, pos) is
    // order-isomorphic to (capped prefix, id, pos) — so the doubling
    // path is forced here via the conf knob and checked against both
    // the direct path and the suffix-array reference.
    val rnd = new scala.util.Random(777L)
    val docs = (1L to 4L).map { id =>
      id -> (0 until 120).map(_ => if (rnd.nextInt(3) == 0) 'a' else 'b')
        .mkString
    }
    val direct = runOperator(docs, 6, 16)
    spark.conf.set("spark.graft.exactSubstr.directSortCap", "8")
    try {
      val doubled = runOperator(docs, 6, 16)
      assert(doubled == direct, "paths diverge")
      check(docs, 6, 16) // doubling path vs the suffix-array reference
      // cross-corpus marking under the doubling path too
      val vocab = Vector("spark", "table", "scan", "row", "agg", "key")
      def mk(n: Int) = (0 until n)
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val train = (1L to 3L).map(id => id -> mk(12 + rnd.nextInt(20)))
      val bench = (1L to 2L).map(id => id -> mk(12 + rnd.nextInt(20)))
      val want = crossReference(train, bench, 12)
      val got = ExactSubstr.crossCorpusSpans(
          train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
          "text", "doc_id", minLen = 12, windowCap = 16)
        .select(col("doc_id"), col("span_start"), col("span_len"),
          col("n_dup_starts"))
        .as[(Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      assert(got === want, s"cross diverges: got $got want $want")
    } finally spark.conf.unset("spark.graft.exactSubstr.directSortCap")
  }

  test("common_prefix_len: UTF-8 boundary safety and plain ASCII walk") {
    def l(a: String, b: String): Int = CommonPrefixLenExpr.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))
    assert(l("", "anything") == 0)
    assert(l("abc", "abd") == 2)
    assert(l("abc", "abc") == 3)
    assert(l("abc", "abcdef") == 3)
    // multi-byte: é = 2 bytes; strings diverge INSIDE the second é's
    // encoding (é vs è share their first byte) — the partial char must
    // not count
    assert(l("aébé", "aébè") == 3)
    assert(l("日本語", "日本話") == 2)
    // supplementary plane (4-byte, counted as ONE code point)
    assert(l("a😀b", "a😀c") == 2)
  }
}
