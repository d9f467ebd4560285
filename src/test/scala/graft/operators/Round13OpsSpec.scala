package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 corpus-diagnostics family: the vocabulary coverage curve
  * (frequency-group arithmetic == a word-level brute force), source
  * sketch similarity (engine sketch == an independent scala replica;
  * exact set numbers == scala set ops), and Heaps'-law vocabulary
  * growth.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- q216 coverage curve ------------------------------------------

  private def bruteCoverage(words: Seq[String], pct: Long): (Long, Long, Long) = {
    val hist = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
    val total = hist.map(_._2).sum
    val needed = (pct * total + 99) / 100
    var cum = 0L
    var k = 0L
    val it = hist.iterator
    while (cum < needed && it.hasNext) { cum += it.next()._2; k += 1 }
    (k, needed, total)
  }

  test("coverageCurve == word-level brute force on random corpora") {
    val rnd = new scala.util.Random(1313)
    for (trial <- 1 to 5) {
      val vocab = (1 to 20).map(i => s"w$i")
      val docs = (1L to 30L).map { i =>
        (i, (1 to 3 + rnd.nextInt(20))
          .map(_ => vocab(math.min(rnd.nextInt(20), rnd.nextInt(20))))
          .mkString(" "))
      }
      val words = docs.flatMap(_._2.split(" ")).toSeq
      val got = TextAnalysis.coverageCurve(
          docs.toDF("doc_id", "text"), "text", Seq(50, 90, 99))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      Seq(50L, 90L, 99L).foreach { pct =>
        assert(got(pct) === bruteCoverage(words, pct),
          s"trial $trial pct $pct")
      }
      // more mass needs at least as many words
      assert(got(50L)._1 <= got(90L)._1 && got(90L)._1 <= got(99L)._1)
    }
  }

  test("coverageCurve: threshold guard and the 100% edge") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val full = TextAnalysis.coverageCurve(docs, "text", Seq(100))
      .as[(Long, Long, Long, Long)].collect().head
    assert(full._2 === 2L && full._3 === 4L && full._4 === 4L)
    intercept[IllegalArgumentException] {
      TextAnalysis.coverageCurve(docs, "text", Seq(0))
    }
  }

  // --- q217 source sketch similarity --------------------------------

  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)

  test("sourceMinhashSimilarity == independent scala sketch + set ops") {
    val rnd = new scala.util.Random(1717)
    val vocab = (1 to 40).map(i => s"tok$i")
    val docs = (1L to 24L).map { i =>
      (i, s"src${i % 4}", (1 to 12)
        .map(_ => vocab(rnd.nextInt(40))).mkString(" "))
    }
    val got = Dedup.sourceMinhashSimilarity(
        docs.toDF("doc_id", "source", "text"), "text", "source")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val sets = docs.groupBy(_._2).view
      .mapValues(_.flatMap(_._3.split(" ")).toSet).toMap
    def sig(s: Set[String]): Seq[Long] = (0L until 64L).map { i =>
      s.map(w => ((polyHash(w) + i) * 2654435761L) % 1000000007L).min
    }
    val sigs = sets.view.mapValues(sig).toMap
    for {
      a <- sets.keys; b <- sets.keys if a < b
    } {
      val matches = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      val inter = (sets(a) & sets(b)).size.toLong
      val uni = (sets(a) | sets(b)).size.toLong
      assert(got((a, b)) === ((matches, inter, uni)), s"pair ($a,$b)")
    }
    // identical sources would match every slot; sanity: self-similarity
    // via a duplicated source
    val dup = docs ++ docs.map { case (i, _, t) => (i + 100L, "srcdup", t) }
    val g2 = Dedup.sourceMinhashSimilarity(
        dup.filter(d => d._2 == "src0" || d._2 == "srcdup")
          .map(d => (d._1, if (d._2 == "srcdup") "srcB" else "srcA", d._3))
          .toDF("doc_id", "source", "text"), "text", "source")
      .as[(String, String, Long, Long, Long)].collect()
    val all = sets.values.reduce(_ ++ _)
    val a0 = sets("src0")
    g2.foreach { case (_, _, m, ix, un) =>
      assert(ix <= un && m <= 64L)
      assert(un >= a0.size.toLong && un <= all.size.toLong)
    }
  }

  // --- q219 vocabulary growth ---------------------------------------

  test("vocabGrowth buckets first occurrences and accumulates exactly") {
    // 10 docs, doc i introduces gram chain shifted by i — every doc
    // contributes new trigrams; doc ids 0..9 map to buckets 0..9
    val docs = (0L to 9L).map { i =>
      (i, (0 to 5).map(j => s"t${i * 2 + j}").mkString(" "))
    }
    val got = TextAnalysis.vocabGrowth(
        docs.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("bucket")
      .as[(Long, Long, Long)].collect()
    // brute force: trigram -> first doc
    val first = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (i, t) =>
      val toks = t.split(" ")
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .foreach(g => if (!first.contains(g)) first(g) = i)
    }
    val want = first.values.groupBy(id => id * 10 / 10).view
      .mapValues(_.size.toLong).toMap
    got.foreach { case (b, nw, _) =>
      assert(nw === want(b), s"bucket $b")
    }
    assert(got.last._3 === first.size.toLong, "cumulative must end at |V|")
    assert(got.map(_._2).sum === first.size.toLong)
    // cumulative is the running sum of new_words
    assert(got.map(_._3).toSeq === got.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
  }

  // --- q220 frame-level perceptual dedup ----------------------------

  test("frameDhashDups == scala brute force on planted frame-sharing twins") {
    val rnd = new scala.util.Random(2020)
    def bytes(n: Int) = Array.fill(n)(rnd.nextInt(256).toByte)
    val base = (1L to 30L).map(i => (i, bytes(80 + rnd.nextInt(400))))
    // twins replace the HEAD 10 bytes: frames past the first identical
    val twins = base.take(10).map { case (i, b) =>
      val t = b.clone(); (0 until 10).foreach(j => t(j) = 0x7e.toByte)
      (i + 100L, t)
    }
    val corpus = base ++ twins
    val media = corpus.toDF("doc_id", "payload")
      .select(col("doc_id"), lit("video").as("media_type"), col("payload"))
    val got = Multimodal.frameDhashDups(spark, media, minShared = 1L)
      .as[(Long, Long, Long)].collect().toSet
    // independent replay of frameSample geometry + kernel + df-cap
    val fps = corpus.map { case (id, b) =>
      val nFrames = math.max(1, b.length / 64)
      id -> (0 until nFrames by 2)
        .map(k => graft.functions.DHashExpr.compute(
          b.slice(k * 64, math.min(k * 64 + 64, b.length)))).toSet
    }
    val df = fps.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val okFp = df.filter { case (_, c) => c >= 2 && c <= 50 }.keySet
    val want = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      shared = (fa & fb & okFp).size.toLong
      if shared >= 1L
    } yield (ia, ib, shared)).toSet
    assert(got === want,
      s"engine-only=${(got -- want).take(3)} brute-only=${(want -- got).take(3)}")
    assert(want.exists { case (a, b, _) => b == a + 100L },
      "no planted twin pair surfaced")
  }

  // --- q221 curriculum order ----------------------------------------

  test("curriculumOrder interleaves strata while difficulty rises") {
    val rnd = new scala.util.Random(2121)
    val docs = (1L to 40L).map { i =>
      (i, s"s${i % 3}", 10L + rnd.nextInt(100))
    }
    val got = Pipelines.curriculumOrder(
        docs.toDF("doc_id", "stratum", "difficulty"),
        "doc_id", "stratum", "difficulty")
      .as[(Long, String, Long, Long)].collect()
    assert(got.length === 40)
    // positions unique; position mod |strata| IS the stratum index
    assert(got.map(_._4).distinct.length === 40)
    val strata = docs.map(_._2).distinct.sorted
    got.foreach { case (_, s, rk, posn) =>
      assert(posn === rk * strata.length + strata.indexOf(s))
    }
    // within a stratum, difficulty is non-decreasing in position
    val diff = docs.map(d => d._1 -> d._3).toMap
    got.groupBy(_._2).values.foreach { rows =>
      val ordered = rows.sortBy(_._4).map(r => diff(r._1))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
  }
}
