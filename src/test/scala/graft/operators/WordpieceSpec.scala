package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece family (q228/q229): trainer vs straight-line reference,
  * greedy-encode kernel fuzz vs a plain Scala walker, [UNK] semantics,
  * and candidates/trainer round-1 agreement.
  */
class WordpieceSpec extends SparkSpec {

  /** Straight-line score-ranked trainer: same weighting, same double
    * score chain, same (score DESC, l, r) order, same greedy
    * left-to-right merge application with the one-symbol lookbehind.
    */
  private def refTrain(docs: Seq[String], numMerges: Int)
      : Seq[(Int, String, String, Long, Long, Long)] = {
    val freq = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var words: Map[Vector[String], Long] = freq.map { case (w, f) =>
      w.split("").filter(_.nonEmpty).toVector -> f
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = Seq.newBuilder[(Int, String, String, Long, Long, Long)]
    for (rank <- 1 to numMerges) {
      val symCounts = words.toSeq.flatMap { case (syms, f) =>
        syms.map(_ -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val pairCounts = words.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val best = pairCounts.toSeq.map { case ((l, r), n) =>
        val score =
          n.toDouble / (symCounts(l).toDouble * symCounts(r).toDouble)
        (score, l, r, n)
      }.minBy { case (s, l, r, _) => (-s, l, r) }
      val (_, l, r, n) = best
      out += ((rank, l, r, n, symCounts(l), symCounts(r)))
      words = words.toSeq.map { case (syms, f) =>
        val b = Vector.newBuilder[String]
        var pend: Option[String] = None
        syms.foreach { x =>
          pend match {
            case None => pend = Some(x)
            case Some(p) if p == l && x == r =>
              b += (l + r); pend = None
            case Some(p) => b += p; pend = Some(x)
          }
        }
        pend.foreach(b += _)
        (b.result(), f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    out.result()
  }

  /** Plain greedy longest-match walker mirroring the kernel. */
  private def refEncode(word: String, vocab: Set[String],
      maxSub: Int): Int = {
    var pos = 0
    var cnt = 0
    while (pos < word.length) {
      val cps = {
        val b = Seq.newBuilder[Int]
        var o = pos
        var k = 0
        while (k < maxSub && o < word.length) {
          o += Character.charCount(word.codePointAt(o))
          b += o
          k += 1
        }
        b.result()
      }
      val hit = cps.reverseIterator.find { e =>
        val piece = word.substring(pos, e)
        vocab.contains(if (pos > 0) "##" + piece else piece)
      }
      hit match {
        case Some(e) => pos = e; cnt += 1
        case None => return -1
      }
    }
    cnt
  }

  private val corpus = Seq(
    "the fast scan the fast join", "slow merge the scan scan",
    "fast fast the the scan join merge", "merge scan the fast slow")

  test("trainer matches the straight-line reference") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val got = Wordpiece.wordpieceTrainMerges(docs, "text", numMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === refTrain(corpus, 6))
  }

  test("candidates round-1 top pair equals the trainer's first merge") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val cand = Wordpiece.wordpiecePairCandidates(docs, "text", k = 5)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    val first = Wordpiece.wordpieceTrainMerges(docs, "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).head
    assert(cand === first)
  }

  test("encode kernel fuzzes bit-for-bit against the plain walker") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde"
    def piece(): String =
      (0 until (1 + rnd.nextInt(3)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 20).foreach { trial =>
      val vocab = ((0 until 12).map(_ => piece()) ++
        (0 until 12).map(_ => "##" + piece())).distinct
      val words = (0 until 60).map(_ => (0 until 1 + rnd.nextInt(8))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = Wordpiece.wordpieceTokenStats(docs, "text", "doc_id",
          vocab, maxSub = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3))).toMap
      val vset = vocab.toSet
      words.zipWithIndex.foreach { case (w, i) =>
        val c = refEncode(w, vset, 3)
        val want = if (c < 0) (1L, 1L, 1L) else (1L, c.toLong, 0L)
        assert(got(i.toLong) === want,
          s"trial $trial word '$w' vocab $vocab")
      }
    }
  }

  test("[UNK] semantics: greedy dead ends take the whole word") {
    import spark.implicits._
    val docs = Seq((1L, "dup"), (2L, "order"), (3L, "table"),
      (4L, "customer"), (5L, "")).toDF("doc_id", "text")
    val got = Wordpiece.wordpieceTokenStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got(1L) === ((1L, 1L, 1L))) // du· dead end -> [UNK]
    assert(got(2L) === ((1L, 1L, 1L))) // or· dead end -> [UNK]
    assert(got(3L) === ((1L, 2L, 0L))) // ta ##ble
    assert(got(4L) === ((1L, 5L, 0L))) // cu ##st ##o ##m ##er
    assert(got(5L) === ((0L, 0L, 0L))) // empty text
  }

  test("code-point walk: supplementary characters are one symbol") {
    import spark.implicits._
    val astral = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"a$astral"), (2L, astral))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "##" + astral, astral)
    val got = Wordpiece.wordpieceTokenStats(docs, "text", "doc_id",
        vocab, maxSub = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((2L, 0L))) // a + ##<astral>
    assert(got(2L) === ((1L, 0L)))
  }

  test("fertility rollup equals the per-doc kernels aggregated") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Wordpiece.tokenizerFertility(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val wp = Wordpiece.wordpieceTokenStats(docs, "text", "doc_id")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("nd"), sum(col("ws_tokens")).as("ws"),
        sum(col("wp_tokens")).as("wp"), sum(col("unk_words")).as("un"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val bpe = BpeTrain.bpeTokenStats(docs, "text", "doc_id")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang")).agg(sum(col("bpe_tokens")).as("bp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === wp.keySet)
    got.foreach { case (lang, (nd, ws, bp, wpT, un)) =>
      assert((nd, ws, wpT, un) === wp(lang), s"lang $lang wp side")
      assert(bp === bpe(lang), s"lang $lang bpe side")
    }
  }

  test("parameter guards") {
    import spark.implicits._
    val docs = Seq("a").toDF("text")
    intercept[IllegalArgumentException] {
      Wordpiece.wordpieceTrainMerges(docs, "text", 0)
    }
    intercept[IllegalArgumentException] {
      Wordpiece.wordpiecePairCandidates(docs, "text", 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.WordPieceEncodeExpr(null, Seq("a"), 0)
    }
  }
}
