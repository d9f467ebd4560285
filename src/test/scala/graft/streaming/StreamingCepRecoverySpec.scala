package graft.streaming

import graft.SparkSpec
import graft.operators.Cep
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

/** CEP open-match state survives stop/restart: a query killed mid-match
  * resumes from the RocksDB checkpoint — the anchor and gap-veto state
  * persist, so a veto event arriving in the NEXT incarnation still kills
  * a match opened before the stop, and completions emit exactly once
  * (the O13 per-record-commit guarantee applied to pattern state, cf.
  * StreamingFunnelRecoverySpec).
  */
class StreamingCepRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val pattern = Seq(
    Cep.CepStep("view"),
    Cep.CepStep("click", without = Seq("error")),
    Cep.CepStep("purchase", without = Seq("view")))

  test("matches complete exactly once across a stop/restart; vetoes persist") {
    val root = java.nio.file.Files.createTempDirectory("cep_rec")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    val schema = Seq((1L, 1L, "x", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts").schema
    def writeBatch(rows: Seq[(Long, Long, String, Timestamp)]): Unit =
      rows.toDF("user_id", "event_id", "event_type", "ts")
        .coalesce(1).write.mode("append").parquet(srcDir)

    val matches = new ConcurrentLinkedQueue[(Long, Long, Seq[Long])]()
    def start() = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
        .as[StreamingCep.CEv]
      StreamingCep.detect(spark, stream, pattern, windowHours = 24,
        watermarkDelay = "10 seconds")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingCep.CepMatch],
              _: Long) =>
            b.collect().foreach(m =>
              matches.add((m.user_id, m.anchor_id, m.times_us)))
        }
        .start()
    }

    // incarnation 1: user 1 anchors and clicks (finalized by the
    // flush); user 2's full chain completes and EMITS before the stop
    writeBatch(Seq(
      (1L, 10L, "view", ts("2024-01-05 08:00:00")),
      (1L, 11L, "click", ts("2024-01-05 09:00:00")),
      (2L, 20L, "view", ts("2024-01-05 08:00:00")),
      (2L, 21L, "click", ts("2024-01-05 08:30:00")),
      (2L, 22L, "purchase", ts("2024-01-05 09:00:00")),
      (99L, 90L, "flush", ts("2024-01-05 12:00:00"))))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(matches.size() === 1, s"pre-restart: $matches")

    // while the query is DOWN: user 1's second view lands inside the
    // click->purchase gap (must veto via PERSISTED state), then the
    // purchase; user 3 starts fresh and completes
    writeBatch(Seq(
      (1L, 12L, "view", ts("2024-01-05 13:00:00")),
      (1L, 13L, "purchase", ts("2024-01-05 14:00:00")),
      (3L, 30L, "view", ts("2024-01-05 13:00:00")),
      (3L, 31L, "click", ts("2024-01-05 13:30:00")),
      (3L, 32L, "purchase", ts("2024-01-05 14:00:00")),
      (99L, 91L, "flush", ts("2024-01-05 20:00:00"))))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = matches.toArray.map(_.asInstanceOf[(Long, Long, Seq[Long])])
    // user 2 exactly once (not re-emitted after restart); user 1's
    // anchor-10 match killed by the view at 13:00 (persisted open-match
    // state) and its anchor-12 view finds no click after it; user 3
    // completes post-restart. NOTE user 1's view 12 opens a fresh
    // anchor whose click gap stays empty -> no match.
    assert(got.count(_._1 == 2L) === 1, s"got ${got.toSeq}")
    assert(!got.exists(_._1 == 1L), s"got ${got.toSeq}")
    assert(got.count(_._1 == 3L) === 1, s"got ${got.toSeq}")
    val u3 = got.find(_._1 == 3L).get
    assert(u3._2 === 30L)
  }

  test("kleene repetition and run-ceiling counters persist across restart") {
    val kleene = Seq(
      Cep.CepStep("view"),
      Cep.CepStep("click", without = Seq("error"),
        minReps = 2, maxReps = Some(3)),
      Cep.CepStep("purchase"))
    val root = java.nio.file.Files.createTempDirectory("cep_rec_k")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    val schema = Seq((1L, 1L, "x", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts").schema
    def writeBatch(rows: Seq[(Long, Long, String, Timestamp)]): Unit =
      rows.toDF("user_id", "event_id", "event_type", "ts")
        .coalesce(1).write.mode("append").parquet(srcDir)
    val matches = new ConcurrentLinkedQueue[(Long, Long, Seq[Long])]()
    def start() = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
        .as[StreamingCep.CEv]
      StreamingCep.detect(spark, stream, kleene, windowHours = 24,
        watermarkDelay = "10 seconds")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingCep.CepMatch],
              _: Long) =>
            b.collect().foreach(m =>
              matches.add((m.user_id, m.anchor_id, m.times_us)))
        }
        .start()
    }
    // incarnation 1: user 1 is mid-REPETITION (1 of 2 clicks); user 2
    // has already burned the whole 3-click budget (run counter = 3)
    writeBatch(Seq(
      (1L, 10L, "view", ts("2024-01-05 08:00:00")),
      (1L, 11L, "click", ts("2024-01-05 09:00:00")),
      (2L, 20L, "view", ts("2024-01-05 08:00:00")),
      (2L, 21L, "click", ts("2024-01-05 08:20:00")),
      (2L, 22L, "click", ts("2024-01-05 08:40:00")),
      (2L, 23L, "click", ts("2024-01-05 09:00:00")),
      (99L, 90L, "flush", ts("2024-01-05 12:00:00"))))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(matches.isEmpty, s"nothing completes pre-restart: $matches")
    // while down: user 1's SECOND click (completes the {2,3} step via
    // the persisted reps counter) then the purchase; user 2's FOURTH
    // click (blows the persisted run ceiling) then a purchase that must
    // NOT match
    writeBatch(Seq(
      (1L, 12L, "click", ts("2024-01-05 13:00:00")),
      (1L, 13L, "purchase", ts("2024-01-05 14:00:00")),
      (2L, 24L, "click", ts("2024-01-05 13:00:00")),
      (2L, 25L, "purchase", ts("2024-01-05 14:00:00")),
      (99L, 91L, "flush", ts("2024-01-05 20:00:00"))))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = matches.toArray.map(_.asInstanceOf[(Long, Long, Seq[Long])])
    val base = ts("2024-01-05 08:00:00").getTime * 1000L
    assert(got.toSeq === Seq((1L, 10L, Seq(base,
      ts("2024-01-05 13:00:00").getTime * 1000L,
      ts("2024-01-05 14:00:00").getTime * 1000L))), s"got ${got.toSeq}")
  }
}
