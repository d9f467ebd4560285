package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bin-blocked interval overlap join: exactly-once emission across bin
  * boundaries, inclusive bounds, guards, fuzz vs brute force, and the
  * no-nested-loop plan shape the operator exists for.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def join(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)],
      w: Long, cap: Long = 10000L) =
    IntervalJoin.overlapJoin(
      l.toDF("lid", "ls", "le"), "ls", "le",
      r.toDF("rid", "rs", "re"), "rs", "re", w, cap)

  test("pairs sharing MANY bins emit exactly once; bounds are inclusive") {
    // width 10: left [5, 35] covers bins 0..3; right [8, 32] covers 0..3
    // -> 4 shared bins, ONE row
    val got = join(Seq((1L, 5L, 35L)), Seq((2L, 8L, 32L)), 10L)
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)))
    // touching endpoints overlap (inclusive): [0,10] vs [10,20]
    assert(join(Seq((1L, 0L, 10L)), Seq((2L, 10L, 20L)), 7L).count() == 1L)
    // disjoint by one: [0,9] vs [10,20]
    assert(join(Seq((1L, 0L, 9L)), Seq((2L, 10L, 20L)), 7L).count() == 0L)
  }

  test("fuzz: equals the brute-force cross join at several bin widths") {
    val rnd = new scala.util.Random(99)
    val l = (1L to 120L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(80))
    }
    val r = (1001L to 1120L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(80))
    }
    val want = (for {
      (li, ls, le) <- l; (ri, rs, re) <- r
      if ls <= re && rs <= le
    } yield (li, ri)).sorted
    for (w <- Seq(3L, 17L, 64L, 2048L)) {
      val got = join(l, r, w).select("lid", "rid")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"width $w: ${got.size} vs ${want.size}")
    }
  }

  test("guards: bin-copy cap, negative grid, column collision") {
    val e = intercept[IllegalArgumentException] {
      join(Seq((1L, 0L, 1000000L)), Seq((2L, 0L, 5L)), 10L, cap = 100L)
    }
    assert(e.getMessage.contains("bins") && e.getMessage.contains("left"))
    val e2 = intercept[IllegalArgumentException] {
      join(Seq((1L, -5L, 5L)), Seq((2L, 0L, 5L)), 10L)
    }
    assert(e2.getMessage.contains("negative"))
    val e3 = intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(
        Seq((1L, 0L, 1L)).toDF("id", "s", "e"), "s", "e",
        Seq((2L, 0L, 1L)).toDF("id", "rs", "re"), "rs", "re", 10L)
    }
    assert(e3.getMessage.contains("collision"))
  }

  test("streaming dual: append-mode overlap join ≡ batch on the same rows") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(5)
    // micros-scale intervals (the watermark column is timestamp_micros)
    val base = 1700000000000000L
    val l = (1L to 40L).map { i =>
      val s = base + rnd.nextInt(500000); (i, s, s + rnd.nextInt(40000))
    }
    val r = (1001L to 1040L).map { i =>
      val s = base + rnd.nextInt(500000); (i, s, s + rnd.nextInt(40000))
    }
    val want = (for {
      (li, ls, le) <- l; (ri, rs, re) <- r
      if ls <= re && rs <= le
    } yield (li, ri)).sorted
    assert(want.nonEmpty)
    val inL = MemoryStream[(Long, Long, Long)]
    val inR = MemoryStream[(Long, Long, Long)]
    // the two batches arrive out of event-time order — the watermark
    // delay must cover that disorder or the second batch drops as late
    val out = IntervalJoin.overlapJoinStream(
      inL.toDF().toDF("lid", "ls", "le"), "ls", "le",
      inR.toDF().toDF("rid", "rs", "re"), "rs", "re",
      binWidth = 16384L, maxIntervalLen = 40000L,
      watermarkDelay = "600 seconds")
    assert(out.isStreaming)
    val q = out.select("lid", "rid").writeStream.format("memory")
      .queryName("sij_out").outputMode("append").start()
    try {
      inL.addData(l.take(20): _*); inR.addData(r.take(20): _*)
      q.processAllAvailable()
      inL.addData(l.drop(20): _*); inR.addData(r.drop(20): _*)
      q.processAllAvailable()
      // advance both watermarks past every interval end so the final
      // joins flush
      inL.addData((9999L, base + 10000000L, base + 10000001L))
      inR.addData((9998L, base + 10000000L, base + 10000001L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sij_out").as[(Long, Long)].collect()
      .filter(p => p._1 != 9999L && p._2 != 9998L).toSeq.sorted
    assert(got == want, s"${got.size} vs ${want.size}")
  }

  test("streaming guards: negative grid and over-length intervals fail loudly") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def chain(t: Throwable): String = {
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    }
    def failWith(row: (Long, Long, Long), name: String): String = {
      val inL = MemoryStream[(Long, Long, Long)]
      val inR = MemoryStream[(Long, Long, Long)]
      val out = IntervalJoin.overlapJoinStream(
        inL.toDF().toDF("lid", "ls", "le"), "ls", "le",
        inR.toDF().toDF("rid", "rs", "re"), "rs", "re",
        binWidth = 100L, maxIntervalLen = 1000L)
      val q = out.select("lid", "rid").writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try chain(intercept[Exception] {
        inL.addData(row); inR.addData((1L, 0L, 10L))
        q.processAllAvailable()
      }) finally q.stop()
    }
    // a negative start would silently land one bin off in `div` binning
    assert(failWith((1L, -5L, 5L), "sij_guard_neg").contains("negative"))
    // an interval longer than maxIntervalLen would break the watermark
    // eviction bound and silently drop pairs
    assert(failWith((1L, 100L, 5000L), "sij_guard_len")
      .contains("maxIntervalLen"))
  }

  test("the plan is an equi-join on the bin, never a nested loop") {
    val l = (1L to 50L).map(i => (i, i * 10, i * 10 + 25))
    val r = (1L to 50L).map(i => (i + 100, i * 10 + 5, i * 10 + 30))
    val df = join(l, r, 16L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join") || plan.contains("join"), plan)
    df.count() // executes cleanly
  }
}
