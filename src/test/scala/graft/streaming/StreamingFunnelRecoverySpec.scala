package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

/** Funnel state survives stop/restart: a query killed between stages
  * resumes from the RocksDB checkpoint — earlier advances are not
  * re-emitted, and post-restart stages anchor on the PERSISTED
  * pre-restart stage time (the O13 per-record-commit guarantee applied
  * to CEP state, cf. StreamingRecoverySpec for plain delivery).
  */
class StreamingFunnelRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel advances exactly once across a stop/restart") {
    val root = java.nio.file.Files.createTempDirectory("funnel_rec")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    val schema = Seq((1L, "x", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts").schema
    def writeBatch(rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("user_id", "event_type", "ts")
        .coalesce(1).write.mode("append").parquet(srcDir)

    val advances =
      new ConcurrentLinkedQueue[(Long, Int, String, Option[Double])]()
    def start() = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
        .as[StreamingFunnel.FEv]
      StreamingFunnel.detect(spark, stream, watermarkDelay = "10 seconds")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingFunnel.Advance],
              _: Long) =>
            b.collect().foreach(a => advances.add(
              (a.user_id, a.stage, a.event_type, a.hours_from_prev)))
        }
        .start()
    }

    // incarnation 1: stages 1-2 + a flush that pushes the watermark past
    // them, so both advances emit BEFORE the stop
    writeBatch(Seq((1L, "signup", ts("2024-01-05 08:00:00")),
      (1L, "view", ts("2024-01-05 09:00:00")),
      (99L, "flush", ts("2024-01-05 12:00:00"))))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(advances.size() === 2, s"pre-restart: $advances")

    // new stage events arrive while the query is DOWN
    writeBatch(Seq((1L, "click", ts("2024-01-05 13:00:00")),
      (1L, "purchase", ts("2024-01-05 14:00:00")),
      (99L, "flush", ts("2024-01-05 20:00:00"))))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = advances.toArray
      .map(_.asInstanceOf[(Long, Int, String, Option[Double])])
      .filter(_._1 == 1L).sortBy(_._2)
    assert(got.toSeq === Seq(
      (1L, 1, "signup", None),
      (1L, 2, "view", Some(1.0)),
      // 13:00 anchors on the PERSISTED stage-2 time 09:00 -> 4h
      (1L, 3, "click", Some(4.0)),
      (1L, 4, "purchase", Some(1.0))), s"got ${got.toSeq}")
  }
}
