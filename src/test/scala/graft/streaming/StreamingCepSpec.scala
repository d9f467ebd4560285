package graft.streaming

import graft.SparkSpec
import graft.operators.Cep
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming generalized CEP with negation: the late-arriving veto event
  * (the case an arrival-order fold emits a wrong match), per-anchor
  * openings, and stream ≡ batch parity on sf0.001 events.
  */
class StreamingCepSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val pattern = Seq(
    Cep.CepStep("view"),
    Cep.CepStep("click", without = Seq("error")),
    Cep.CepStep("purchase", without = Seq("view")))

  private def startQuery(in: MemoryStream[(Long, Long, String, Timestamp)],
      name: String, wmDelay: String) =
    StreamingCep.detect(spark,
      in.toDF().toDF("user_id", "event_id", "event_type", "ts")
        .as[StreamingCep.CEv],
      pattern, windowHours = 24, watermarkDelay = wmDelay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

  test("late-arriving veto retracts a completion a naive fold would emit") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = startQuery(in, "cep_late_veto", "2 hours")
    try {
      // batch 1: user 1's full positive chain arrives; watermark after
      // this batch is 11:00 − 2h = 09:00 — the click/purchase are NOT
      // final yet. user 2 is the veto-free control.
      in.addData(
        (1L, 10L, "view", ts("2024-01-05 09:00:00")),
        (1L, 11L, "click", ts("2024-01-05 10:00:00")),
        (1L, 12L, "purchase", ts("2024-01-05 11:00:00")),
        (2L, 20L, "view", ts("2024-01-05 09:00:00")),
        (2L, 21L, "click", ts("2024-01-05 10:00:00")),
        (2L, 22L, "purchase", ts("2024-01-05 11:00:00")))
      q.processAllAvailable()
      // batch 2: the error arrives LATE (event time 09:30, inside user
      // 1's view→click gap, still above the watermark)
      in.addData((1L, 13L, "error", ts("2024-01-05 09:30:00")))
      q.processAllAvailable()
      // batch 3: watermark flush
      in.addData((99L, 90L, "flush", ts("2024-01-06 23:59:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cep_late_veto")
      .as[StreamingCep.CepMatch].collect()
    assert(!got.exists(_.user_id == 1L),
      s"late veto must kill user 1's match: ${got.toSeq}")
    val u2 = got.filter(_.user_id == 2L)
    val base = ts("2024-01-05 09:00:00").getTime * 1000L
    assert(u2.map(m => (m.anchor_id, m.times_us)).toSeq ===
      Seq((20L, Seq(base, base + 3600L * 1000000L,
        base + 2L * 3600L * 1000000L))), s"got ${u2.toSeq}")
  }

  test("per-anchor: a mid-chain view opens its own match and vetoes the first") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = startQuery(in, "cep_anchor", "1 hour")
    try {
      // anchor 10's click→purchase gap contains view 20 -> vetoed;
      // anchor 20's own chain completes (same trace as the batch spec)
      in.addData(
        (1L, 10L, "view", ts("2024-01-05 01:00:00")),
        (1L, 11L, "click", ts("2024-01-05 02:00:00")),
        (1L, 20L, "view", ts("2024-01-05 02:30:00")),
        (1L, 21L, "click", ts("2024-01-05 03:00:00")),
        (1L, 13L, "purchase", ts("2024-01-05 04:00:00")))
      q.processAllAvailable()
      in.addData((99L, 90L, "flush", ts("2024-01-06 23:59:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cep_anchor").as[StreamingCep.CepMatch].collect()
    assert(got.map(_.anchor_id).toSet === Set(20L), s"got ${got.toSeq}")
  }

  private val kleene = Seq(
    Cep.CepStep("view"),
    Cep.CepStep("click", without = Seq("error"),
      minReps = 2, maxReps = Some(3)),
    Cep.CepStep("purchase"))

  private def startKleene(in: MemoryStream[(Long, Long, String, Timestamp)],
      name: String, wmDelay: String) =
    StreamingCep.detect(spark,
      in.toDF().toDF("user_id", "event_id", "event_type", "ts")
        .as[StreamingCep.CEv],
      kleene, windowHours = 24, watermarkDelay = wmDelay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()

  test("kleene: a LATE veto inside the repetition run retracts the completion") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = startKleene(in, "cep_kleene_late", "3 hours")
    try {
      // user 1: view, click, click (completes the {2,3} step at 11:00),
      // purchase — all above watermark after batch 1. user 2 control.
      in.addData(
        (1L, 10L, "view", ts("2024-01-05 09:00:00")),
        (1L, 11L, "click", ts("2024-01-05 10:00:00")),
        (1L, 12L, "click", ts("2024-01-05 11:00:00")),
        (1L, 13L, "purchase", ts("2024-01-05 12:00:00")),
        (2L, 20L, "view", ts("2024-01-05 09:00:00")),
        (2L, 21L, "click", ts("2024-01-05 10:00:00")),
        (2L, 22L, "click", ts("2024-01-05 11:00:00")),
        (2L, 23L, "purchase", ts("2024-01-05 12:00:00")))
      q.processAllAvailable()
      // the error lands LATE, event-time 10:30 — INSIDE user 1's
      // repetition run, strictly before its completing click at 11:00
      in.addData((1L, 19L, "error", ts("2024-01-05 10:30:00")))
      q.processAllAvailable()
      in.addData((99L, 90L, "flush", ts("2024-01-06 23:59:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cep_kleene_late")
      .as[StreamingCep.CepMatch].collect()
    assert(!got.exists(_.user_id == 1L),
      s"late in-run veto must kill user 1: ${got.toSeq}")
    val base = ts("2024-01-05 09:00:00").getTime * 1000L
    assert(got.filter(_.user_id == 2L).map(_.times_us).toSeq ===
      Seq(Seq(base, base + 2L * 3600L * 1000000L,
        base + 3L * 3600L * 1000000L)), s"got ${got.toSeq}")
  }

  test("kleene: blowing the maxReps ceiling before the next step kills the match") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = startKleene(in, "cep_kleene_ceil", "10 seconds")
    try {
      in.addData(
        // user 1: FOUR clicks before the purchase -> dead
        (1L, 10L, "view", ts("2024-01-05 09:00:00")),
        (1L, 11L, "click", ts("2024-01-05 09:10:00")),
        (1L, 12L, "click", ts("2024-01-05 09:20:00")),
        (1L, 13L, "click", ts("2024-01-05 09:30:00")),
        (1L, 14L, "click", ts("2024-01-05 09:40:00")),
        (1L, 15L, "purchase", ts("2024-01-05 10:00:00")),
        // user 2: purchase between 3rd and 4th click -> alive
        (2L, 20L, "view", ts("2024-01-05 09:00:00")),
        (2L, 21L, "click", ts("2024-01-05 09:10:00")),
        (2L, 22L, "click", ts("2024-01-05 09:20:00")),
        (2L, 23L, "click", ts("2024-01-05 09:30:00")),
        (2L, 25L, "purchase", ts("2024-01-05 09:35:00")),
        (2L, 24L, "click", ts("2024-01-05 09:40:00")))
      q.processAllAvailable()
      in.addData((99L, 90L, "flush", ts("2024-01-06 23:59:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cep_kleene_ceil")
      .as[StreamingCep.CepMatch].collect()
    assert(got.map(_.user_id).toSet === Set(2L), s"got ${got.toSeq}")
  }

  test("kleene: ceiling COLLISION — next step at the same ts as the " +
      "(maxReps+1)-th rep kills the match, matching batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = startKleene(in, "cep_kleene_collide", "10 seconds")
    val ev = Seq(
      // user 1: the purchase lands at EXACTLY the 4th click's timestamp
      // — batch's ceiling is strict (cur < ceil), so the match dies; a
      // completion-first tie fold would wrongly emit it
      (1L, 10L, "view", ts("2024-01-05 09:00:00")),
      (1L, 11L, "click", ts("2024-01-05 09:10:00")),
      (1L, 12L, "click", ts("2024-01-05 09:20:00")),
      (1L, 13L, "click", ts("2024-01-05 09:30:00")),
      (1L, 14L, "click", ts("2024-01-05 09:40:00")),
      (1L, 15L, "purchase", ts("2024-01-05 09:40:00")),
      // user 2: veto at the SAME ts as the completing 2nd click — veto
      // must be STRICTLY inside the gap, so the match survives (guards
      // the fix from overcorrecting: rep-first must not veto-first-kill)
      (2L, 20L, "view", ts("2024-01-05 09:00:00")),
      (2L, 21L, "click", ts("2024-01-05 09:10:00")),
      (2L, 22L, "click", ts("2024-01-05 09:20:00")),
      (2L, 29L, "error", ts("2024-01-05 09:20:00")),
      (2L, 25L, "purchase", ts("2024-01-05 09:35:00")))
    try {
      in.addData(ev: _*)
      q.processAllAvailable()
      in.addData((99L, 90L, "flush", ts("2024-01-06 23:59:00")))
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("cep_kleene_collide")
      .as[StreamingCep.CepMatch].collect()
      .map(m => (m.user_id, m.anchor_id, m.times_us.toList)).toSet
    val batch = Cep.matchPattern(
        ev.toDF("user_id", "event_id", "event_type", "ts"), kleene, 24)
      .selectExpr("user_id", "anchor_id", "t0_us", "t1_us", "t2_us")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, List(r._3, r._4, r._5))).toSet
    assert(batch.map(_._1) === Set(2L), s"batch sanity: $batch")
    assert(stream === batch,
      s"stream-only=${stream -- batch} batch-only=${batch -- stream}")
  }

  test("kleene stream == batch on seeded collision-dense random streams") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(9012)
    val types = Array("view", "click", "click", "purchase", "error")
    val base = ts("2024-01-05 00:00:00").getTime
    (1 to 8).foreach { trial =>
      // coarse 10-second grid over 40 s: same-timestamp completions,
      // ceiling breakers, and vetoes are the point (the batch fuzz's
      // collision discipline, replayed through the streaming fold)
      val ev = (1 to 24).map { i =>
        (1L + rnd.nextInt(3), trial * 1000L + i,
          types(rnd.nextInt(types.length)),
          new Timestamp(base + rnd.nextInt(4) * 10000L))
      }
      val in = MemoryStream[(Long, Long, String, Timestamp)]
      val q = startKleene(in, s"cep_kleene_fuzz_$trial", "10 seconds")
      try {
        in.addData(ev: _*)
        q.processAllAvailable()
        in.addData((99L, 90L, "flush", ts("2024-01-06 23:59:00")))
        q.processAllAvailable()
      } finally q.stop()
      val stream = spark.table(s"cep_kleene_fuzz_$trial")
        .as[StreamingCep.CepMatch].collect()
        .map(m => (m.user_id, m.anchor_id, m.times_us.toList)).toSet
      val batch = Cep.matchPattern(
          ev.toDF("user_id", "event_id", "event_type", "ts"), kleene, 24)
        .selectExpr("user_id", "anchor_id", "t0_us", "t1_us", "t2_us")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, List(r._3, r._4, r._5))).toSet
      assert(stream === batch,
        s"trial $trial: stream-only=${(stream -- batch).take(3)} " +
          s"batch-only=${(batch -- stream).take(3)} events=${ev.toList}")
    }
  }

  test("kleene stream matches == batch operator on sf0.001 events") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .as[(Long, Long, String, Timestamp)].collect().sortBy(_._4.getTime)
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = startKleene(in, "cep_kleene_parity", "10 seconds")
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      in.addData(h1.toSeq: _*)
      q.processAllAvailable()
      in.addData(h2.toSeq: _*)
      q.processAllAvailable()
      in.addData((999999L, 999L, "flush", ts("2030-01-01 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("cep_kleene_parity")
      .as[StreamingCep.CepMatch].collect()
      .map(m => (m.user_id, m.anchor_id, m.times_us(0), m.times_us(1),
        m.times_us(2))).toSet
    val batch = Cep.matchPattern(graft.Tables.events(spark, sf), kleene, 24)
      .selectExpr("user_id", "anchor_id", "t0_us", "t1_us", "t2_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(stream === batch,
      s"stream-only=${(stream -- batch).take(3)} batch-only=${(batch -- stream).take(3)}")
  }

  test("stream matches == batch q185 operator on sf0.001 events") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .as[(Long, Long, String, Timestamp)].collect().sortBy(_._4.getTime)
    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = startQuery(in, "cep_parity", "10 seconds")
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      in.addData(h1.toSeq: _*)
      q.processAllAvailable()
      in.addData(h2.toSeq: _*)
      q.processAllAvailable()
      in.addData((999999L, 999L, "flush", ts("2030-01-01 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("cep_parity").as[StreamingCep.CepMatch]
      .collect()
      .map(m => (m.user_id, m.anchor_id, m.times_us(0), m.times_us(1),
        m.times_us(2))).toSet
    val batch = Cep.matchPattern(graft.Tables.events(spark, sf), pattern, 24)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(stream === batch,
      s"stream-only=${(stream -- batch).take(3)} batch-only=${(batch -- stream).take(3)}")
  }
}
