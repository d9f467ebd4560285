package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM Viterbi kernel: hand lattices, the tie-break contract,
  * loud unsegmentability, and a fuzz pass against an exhaustive
  * enumeration reference (all segmentations, min cost, smallest-split
  * ties).
  */
class UnigramViterbiSpec extends SparkSpec {
  import spark.implicits._

  private def seg(words: Seq[String], vocab: Seq[(String, Long)],
      maxLen: Int = 4): Seq[Seq[String]] =
    words.toDF("w")
      .select(UnigramViterbiExprs.segment(col("w"), vocab, maxLen))
      .as[Seq[String]].collect().toSeq

  test("min-cost path wins over greedy-longest") {
    // 'abc': pieces ab(10)+c(1)=11 vs a(1)+bc(2)=3 vs abc(20) vs
    // a+b+c=1+5+1=7 -> a,bc
    val vocab = Seq("a" -> 1L, "b" -> 5L, "c" -> 1L, "ab" -> 10L,
      "bc" -> 2L, "abc" -> 20L)
    assert(seg(Seq("abc"), vocab) == Seq(Seq("a", "bc")))
  }

  test("cost ties resolve to the smallest split (longest final piece)") {
    // 'ab': a(2)+b(3)=5 and ab(5)=5 tie -> j=0 wins: single piece 'ab'
    val vocab = Seq("a" -> 2L, "b" -> 3L, "ab" -> 5L)
    assert(seg(Seq("ab"), vocab) == Seq(Seq("ab")))
  }

  test("empty word segments to the empty array; unsegmentable throws") {
    assert(seg(Seq(""), Seq("a" -> 1L)) == Seq(Seq()))
    val e = intercept[Exception] {
      seg(Seq("ax"), Seq("a" -> 1L))
    }
    assert(e.getMessage != null)
  }

  test("fuzz: equals exhaustive enumeration with the same tie rule") {
    val rnd = new scala.util.Random(4321)
    for (trial <- 1 to 30) {
      val chars = "abcd"
      // random vocab: all single chars + random multi-grams
      val multi = (1 to 10).map { _ =>
        val l = 2 + rnd.nextInt(3)
        (0 until l).map(_ => chars(rnd.nextInt(4))).mkString
      }.distinct
      val vocab = (chars.map(c => c.toString -> (1L + rnd.nextInt(20))) ++
        multi.map(m => m -> (1L + rnd.nextInt(20)))).toMap.toSeq
      val vm = vocab.toMap
      val words = (1 to 15).map(_ =>
        (0 until (1 + rnd.nextInt(8))).map(_ => chars(rnd.nextInt(4))).mkString)
      val got = seg(words, vocab)
      words.zip(got).foreach { case (w, g) =>
        val want = UnigramViterbiSpec.bestSegmentation(w, vm, 4)
        assert(g == want, s"trial $trial '$w': $g vs $want")
      }
    }
  }

  test("q207 prune: dropped multis re-route through the char floor") {
    // corpus where 'ab' dominates but keepMulti = 0 prunes ALL multis:
    // every word must re-segment via single chars (the coverage rule)
    val docs = Seq((1L, "ab ab abb")).toDF("doc_id", "text")
    val got = graft.operators.UnigramLm
      .unigramPrunedCounts(docs, "text", keepMulti = 0,
        maxPieceLen = 2, maxWordLen = 4)
      .as[(String, Long)].collect().toMap
    // pruned vocab = chars only: a, b -> 'ab' x2 = a,b; 'abb' = a,b,b
    assert(got == Map("a" -> 3L, "b" -> 4L), got)
    // with keepMulti = 1 the top multi ('ab') survives and re-appears
    val kept = graft.operators.UnigramLm
      .unigramPrunedCounts(docs, "text", keepMulti = 1,
        maxPieceLen = 2, maxWordLen = 4)
      .as[(String, Long)].collect().toMap
    assert(kept.contains("ab"), kept)
  }

  test("q206 pipeline: tiny corpus piece usage is exact") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ab b")).toDF("doc_id", "text")
    val got = graft.operators.UnigramLm
      .unigramPieceCounts(docs, "text", maxPieceLen = 2, maxWordLen = 4)
      .as[(String, Long)].collect().toMap
    // words: aa x2, ab x2, b x1. seed pieces (weighted): a: aa contributes
    // 2 positions x2 + ab 1 x2 = 6; b: ab x2 + b x1 = 3; aa: 2; ab: 2.
    // total 13. costs: a < b < aa = ab (by count). Check via replica:
    def cost(c: Long) = math.floor(
      (0.0 - math.log(c.toDouble / 13.0)) * 1000000.0).toLong
    // 'aa': a+a = 2*cost(6) vs aa = cost(2): 2*ln(13/6) vs ln(13/2):
    // 1.546 vs 1.872 -> split wins -> pieces a,a
    assert(2 * cost(6) < cost(2))
    // 'ab': a+b vs ab: ln(13/6)+ln(13/3)=2.24 vs ln(13/2)=1.87 -> ab wins
    assert(cost(6) + cost(3) > cost(2))
    assert(got == Map("a" -> 4L, "ab" -> 2L, "b" -> 1L), got)
  }
}

object UnigramViterbiSpec {
  /** Exhaustive reference: enumerate every segmentation, min total
    * cost; ties prefer the lexicographically-smallest SPLIT VECTOR of
    * the backward walk — i.e. at each suffix boundary the smallest
    * start index (longest final piece), applied right-to-left, which
    * is exactly the DP's backward tie structure.
    */
  def bestSegmentation(w: String, vocab: Map[String, Long],
      maxLen: Int): Seq[String] = {
    if (w.isEmpty) return Seq.empty
    // replicate the DP independently with a recursive memo (different
    // code shape from the kernel's iterative arrays)
    val memo = scala.collection.mutable.Map[Int, Option[(Long, Int)]]()
    def best(i: Int): Option[(Long, Int)] = { // (cost to i, chosen j)
      if (i == 0) return Some((0L, -1))
      memo.getOrElseUpdate(i, {
        val cands = for {
          j <- math.max(0, i - maxLen) until i
          prev <- best(j)
          c <- vocab.get(w.substring(j, i))
        } yield (prev._1 + c, j)
        if (cands.isEmpty) None
        else Some(cands.minBy(t => (t._1, t._2)))
      })
    }
    best(w.length) match {
      case None => throw new IllegalStateException(s"unsegmentable: $w")
      case Some(_) =>
        var pos = w.length
        var out = List.empty[String]
        while (pos > 0) {
          val j = best(pos).get._2
          out = w.substring(j, pos) :: out
          pos = j
        }
        out
    }
  }
}
