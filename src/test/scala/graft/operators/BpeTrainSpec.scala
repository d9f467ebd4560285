package graft.operators

import graft.SparkSpec
import scala.collection.mutable

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // ---- local reference BPE (Sennrich-style, greedy left-to-right merge,
  // (count DESC, left ASC, right ASC) argmax) ----
  private def applyMergeLocal(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refBpe(corpus: Seq[String],
      n: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .groupMapReduce { case (w, _) =>
        w.split("").filter(_.nonEmpty).toVector
      } { case (_, f) => f }(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to n) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      assert(counts.nonEmpty, s"reference ran dry at rank $rank")
      val ((l, r), c) = counts.toSeq
        .minBy { case ((l, r), c) => (-c, l, r) }
      out += ((rank, l, r, c))
      words = words.toSeq
        .map { case (syms, f) => applyMergeLocal(syms, l, r) -> f }
        .groupMapReduce(_._1)(_._2)(_ + _)
    }
    out.result()
  }

  test("bpeTrainMerges: known corpus learns the hand-computable merge sequence") {
    // aaab x2, cd x3: r1 (a,a)=4 beats (c,d)=3; r2 (c,d)=3; r3 is a TIE
    // between (a,b)=2 and (aa,a)=2 -> lexicographic left wins (a,b);
    // r4 merges the leftovers (aa, ab)
    val docs = Seq("aaab aaab cd", "cd cd").toDF("text")
    val got = BpeTrain.bpeTrainMerges(docs, "text", 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1, "a", "a", 4L), (2, "c", "d", 3L),
      (3, "a", "b", 2L), (4, "aa", "ab", 2L)))
    assert(got == refBpe(Seq("aaab aaab cd", "cd cd"), 4))
  }

  test("bpeTrainMerges: throws loudly when the corpus runs out of pairs") {
    val docs = Seq("ab ab").toDF("text")
    // merges: (a,b) -> then every word is a single symbol: rank 2 must throw
    val e = intercept[IllegalStateException] {
      BpeTrain.bpeTrainMerges(docs, "text", 2)
    }
    assert(e.getMessage.contains("rank 2"))
  }

  test("bpeTrainMerges equals the local reference on real documents") {
    val real = graft.Tables.documents(spark, sf)
    val texts = real.select($"text").as[String].collect().toSeq
    val got = BpeTrain.bpeTrainMerges(real, "text", 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == refBpe(texts, 3), s"divergence: $got")
  }

  test("bpePairCandidates matches a brute-force count; ties break on pair text") {
    val docs = Seq("abab cdcd", "ab cd xy").toDF("text")
    // pairs: abab -> ab, ba, ab; cdcd -> cd, dc, cd; ab -> ab; cd -> cd;
    // xy -> xy  =>  ab:3, cd:3, ba:1, dc:1, xy:1
    val got = BpeTrain.bpePairCandidates(docs, "text", k = 10)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(got == Seq(("ab", 3L, 1), ("cd", 3L, 2),
      ("ba", 1L, 3), ("dc", 1L, 4), ("xy", 1L, 5)))
  }

  // local reference encode: the same greedy left-to-right fold, per word
  private def refEncode(text: String,
      merges: Seq[(String, String)]): (Long, Long) = {
    val words = Option(text).getOrElse("")
      .replaceAll("[\\u001F\\u001E]", "")
      .split("\\s+").filter(_.nonEmpty)
    val bpe = words.map { w =>
      merges.foldLeft(w.split("").filter(_.nonEmpty).toVector) {
        case (syms, (l, r)) => applyMergeLocal(syms, l, r)
      }.length.toLong
    }.sum
    (words.length.toLong, bpe)
  }

  test("bpeTokenStats: hand-checkable corpus under the default merges") {
    // "the then in": t+h->th, th+e->the (one token); "then"->the,n (2);
    // "in" -> i+n->in (1); "aaaa": (a,a) not in DefaultMerges -> 4 chars
    val docs = Seq((1L, "the then in"), (2L, "aaaa"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = BpeTrain.bpeTokenStats(docs, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 3L, 4L), (2L, 1L, 4L), (3L, 0L, 0L),
      (4L, 0L, 0L)))
  }

  test("bpeTokenStats equals the local reference encode on real documents") {
    val real = graft.Tables.documents(spark, sf)
    val texts = real.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    val got = BpeTrain.bpeTokenStats(real, "text", "doc_id")
      .as[(Long, Long, Long)].collect()
    assert(got.length == texts.size)
    got.foreach { case (id, ws, bpe) =>
      val (rw, rb) = refEncode(texts(id), BpeTrain.DefaultMerges)
      assert((ws, bpe) == ((rw, rb)), s"doc $id: got ($ws,$bpe) want ($rw,$rb)")
    }
  }

  test("bpeTokenStats: ordered merges compose (later merges see earlier output)") {
    // (t,h) then (th,e): "the" is 1 token only because merge 2 builds on
    // merge 1's output — under the reversed order it stays 2 tokens
    val docs = Seq((1L, "the")).toDF("doc_id", "text")
    val fwd = BpeTrain.bpeTokenStats(docs, "text", "doc_id",
      merges = Seq("t" -> "h", "th" -> "e"))
      .as[(Long, Long, Long)].collect().head
    val rev = BpeTrain.bpeTokenStats(docs, "text", "doc_id",
      merges = Seq("th" -> "e", "t" -> "h"))
      .as[(Long, Long, Long)].collect().head
    assert(fwd == ((1L, 1L, 1L)), s"got $fwd")
    assert(rev == ((1L, 1L, 2L)), s"got $rev")
  }

  test("bpeTokenStats native == HOF formulation (real docs + edge cases)") {
    // the native BpeEncodeExpr must reproduce the Catalyst-HOF fold
    // bit-for-bit: real corpus plus the edge shapes (control delimiters,
    // multi-byte code points, repeated merges, ws-only, tabs/newlines)
    val edge = Seq(
      (900L, "a\u001Fb\u001E c"), (901L, ""), (902L, "  \t\n "),
      (903L, "héllo wörld éé"), (904L, "tthe ththe aaaa"),
      (905L, "x")).toDF("doc_id", "text")
    val real = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
      .unionByName(edge)
    val nat = BpeTrain.bpeTokenStats(real, "text", "doc_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val hof = BpeTrain.bpeTokenStatsHof(real, "text", "doc_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(nat == hof)
  }
}
