package graft.operators

import graft.SparkSpec
import scala.collection.mutable

/** Pins [[BpeTrain.bpeTrainMergesBatched]] against a local reference
  * implementing EXACTLY the batched rules (one count table per round,
  * top-batchK pairwise-disjoint acceptance, skip-on-conflict,
  * (count DESC, pair ASC) order, greedy left-to-right application in
  * acceptance order), plus the degenerate-batch equivalence (batchK=1 ==
  * the sequential trainer) and the job-count bound that is the whole
  * point of batching.
  */
class BpeTrainBatchedSpec extends SparkSpec {
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
    * including the batchK*8 candidate-list truncation.
    */
  private def refBatched(corpus: Seq[String], n: Int,
      batchK: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .groupMapReduce { case (w, _) =>
        w.split("").filter(_.nonEmpty).toVector
      } { case (_, f) => f }(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var done = 0
    while (done < n) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      assert(counts.nonEmpty, s"reference ran dry at rank ${done + 1}")
      val top = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .take(batchK * 8)
      val touched = mutable.Set.empty[String]
      val accepted = Seq.newBuilder[(String, String, Long)]
      var k = 0
      top.iterator.takeWhile(_ => k < batchK && done + k < n).foreach {
        case ((l, r), c) =>
          if (!touched(l) && !touched(r) && !touched(l + r)) {
            accepted += ((l, r, c)); touched ++= Seq(l, r, l + r); k += 1
          }
      }
      accepted.result().foreach { case (l, r, c) =>
        done += 1
        out += ((done, l, r, c))
        words = words.toSeq
          .map { case (syms, f) => applyMergeLocal(syms, l, r) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("batched trainer: known corpus, one round accepts disjoint pairs in order") {
    // aaab x2, cd x3: counts (a,a)=4, (c,d)=3, (a,b)=2. Walk: accept
    // (a,a); (a,b) SKIPPED (shares 'a'); accept (c,d) — so rank 2 is
    // (c,d) and (a,b)-family defers to round 2, where the recount gives
    // (aa,ab)... the batched ranks differ from sequential only in how
    // the chained 'a' family resolves.
    val docs = Seq("aaab aaab cd", "cd cd").toDF("text")
    val got = BpeTrain.bpeTrainMergesBatched(docs, "text", 4, batchK = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == refBatched(Seq("aaab aaab cd", "cd cd"), 4, 4),
      s"divergence: $got")
    // round 1 pins the skip rule: (a,a) accepted, (a,b) skipped (shares
    // 'a'), (c,d) accepted — so rank 2 is (c,d)
    assert(got.take(2).map(m => (m._2, m._3)) == Seq("a" -> "a", "c" -> "d"))
  }

  test("batchK=1 degenerates to the sequential trainer") {
    val docs = Seq("aaab aaab cd", "cd cd").toDF("text")
    val seq = BpeTrain.bpeTrainMerges(docs, "text", 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val bat = BpeTrain.bpeTrainMergesBatched(docs, "text", 4, batchK = 1)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
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
        val df = BpeTrain.bpeTrainMergesBatched(real, "text", numMerges)
        val rows = df.as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
        // listener events are delivered async; poll until the count is
        // quiescent (bounded) instead of touching the private listenerBus
        val deadline = System.nanoTime() + 10_000_000_000L
        var last = -1
        while (jobs != last && System.nanoTime() < deadline) {
          last = jobs; Thread.sleep(300)
        }
        rows
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(got == refBatched(texts, numMerges, 16), s"divergence: $got")
    // the throughput claim: one count scan per ROUND (plus its eager
    // checkpoint and the final collect), not per merge
    assert(jobs <= numMerges / 4,
      s"batched trainer ran $jobs jobs for $numMerges merges " +
        s"(bound ${numMerges / 4})")
  }

  test("batched trainer throws loudly when the corpus runs out of pairs") {
    val docs = Seq("ab ab").toDF("text")
    val e = intercept[IllegalStateException] {
      BpeTrain.bpeTrainMergesBatched(docs, "text", 2, batchK = 4)
    }
    assert(e.getMessage.contains("rank 2"))
  }
}
