package graft.operators

import graft.SparkSpec
import scala.collection.mutable

/** Pins [[Wordpiece.wordpieceTrainMergesBatched]] against a local
  * reference implementing EXACTLY the batched rules (one scored count
  * table per round, top-batchK pairwise symbol-disjoint acceptance,
  * skip-on-conflict, (score DESC, l ASC, r ASC) order, greedy
  * left-to-right application in acceptance order), plus the
  * degenerate-batch equivalence (batchK=1 == the sequential trainer)
  * and the job-count bound that is the whole point of batching.
  */
class WordpieceTrainBatchedSpec extends SparkSpec {
  import spark.implicits._

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

  /** Local batched reference — same acceptance walk as the engine,
    * including the batchK*8 candidate-list truncation and the
    * n/(ln·rn) double score.
    */
  private def refBatched(corpus: Seq[String], n: Int, batchK: Int)
      : Seq[(Int, String, String, Long, Long, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .map(_.filterNot(c => c == '\u001F' || c == '\u001E'))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .groupMapReduce { case (w, _) =>
        w.split("").filter(_.nonEmpty).toVector
      } { case (_, f) => f }(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long, Long, Long)]
    var done = 0
    while (done < n) {
      val pc = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      val sc = mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((syms, f) <- words) {
        syms.foreach(s => sc(s) += f)
        for (i <- 0 until syms.length - 1) pc((syms(i), syms(i + 1))) += f
      }
      assert(pc.nonEmpty, s"reference ran dry at rank ${done + 1}")
      val top = pc.toSeq
        .map { case ((l, r), c) =>
          (l, r, c, sc(l), sc(r),
            c.toDouble / (sc(l).toDouble * sc(r).toDouble))
        }
        .sortBy { case (l, r, _, _, _, s) => (-s, l, r) }
        .take(batchK * 8)
      val touched = mutable.Set.empty[String]
      val accepted = Seq.newBuilder[(String, String, Long, Long, Long)]
      var k = 0
      top.iterator.takeWhile(_ => k < batchK && done + k < n).foreach {
        case (l, r, c, ln, rn, _) =>
          if (!touched(l) && !touched(r) && !touched(l + r)) {
            accepted += ((l, r, c, ln, rn)); touched ++= Seq(l, r, l + r)
            k += 1
          }
      }
      accepted.result().foreach { case (l, r, c, ln, rn) =>
        done += 1
        out += ((done, l, r, c, ln, rn))
        words = words.toSeq
          .map { case (syms, f) => applyMergeLocal(syms, l, r) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private type Row6 = (Int, String, String, Long, Long, Long)

  test("batched trainer: known corpus, one round accepts disjoint pairs in score order") {
    // "cd" x3 scores (c,d)=3/(3·3)=0.333 on top; the "aaab" family
    // chains through 'a' so only its best-scored member survives the
    // round-1 walk and the rest defer to recounted later rounds.
    val corpus = Seq("aaab aaab cd", "cd cd")
    val docs = corpus.toDF("text")
    val got = Wordpiece
      .wordpieceTrainMergesBatched(docs, "text", 4, batchK = 4)
      .as[Row6].collect().toSeq.sortBy(_._1)
    assert(got == refBatched(corpus, 4, 4), s"divergence: $got")
    // the conflict rule pinned: rank-1 and rank-2 merges share no symbol
    val Seq(m1, m2) = got.take(2).map(m => Set(m._2, m._3, m._2 + m._3))
    assert(m1.intersect(m2).isEmpty)
  }

  test("batchK=1 degenerates to the sequential trainer") {
    val docs = Seq("aaab aaab cd", "cd cd").toDF("text")
    val seq = Wordpiece.wordpieceTrainMerges(docs, "text", 4)
      .as[Row6].collect().toSeq.sortBy(_._1)
    val bat = Wordpiece
      .wordpieceTrainMergesBatched(docs, "text", 4, batchK = 1)
      .as[Row6].collect().toSeq.sortBy(_._1)
    assert(bat == seq)
  }

  test("batched trainer == local reference at numMerges=64 within the job bound") {
    val real = graft.Tables.documents(spark, sf)
    val texts = real.select($"text").as[String].collect().toSeq
    val numMerges = 64
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        val df = Wordpiece.wordpieceTrainMergesBatched(real, "text",
          numMerges)
        val rows = df.as[Row6].collect().toSeq.sortBy(_._1)
        val deadline = System.nanoTime() + 10_000_000_000L
        var last = -1
        while (jobs != last && System.nanoTime() < deadline) {
          last = jobs; Thread.sleep(300)
        }
        rows
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(got == refBatched(texts, numMerges, 16), s"divergence: $got")
    // the throughput claim: per round a bounded handful of jobs (count
    // scan + two broadcast builds + checkpoint materialization), never
    // a job per merge
    assert(jobs <= numMerges,
      s"batched trainer ran $jobs jobs for $numMerges merges")
  }

  test("batched trainer throws loudly when the corpus runs out of pairs") {
    val docs = Seq("ab ab").toDF("text")
    val e = intercept[IllegalStateException] {
      Wordpiece.wordpieceTrainMergesBatched(docs, "text", 2, batchK = 4)
    }
    assert(e.getMessage.contains("rank 2"))
  }
}
