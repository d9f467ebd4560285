package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KS drift monitor: stream ≡ per-batch batch reference, the
  * no-drift / shifted-batch directions, and the one-sided-type alert.
  */
class StreamingDriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def report(
      rows: Array[(String, Long, Long, Long, Option[Double], Boolean)]) =
    rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("per-batch stream reports == batch ksOfBatch; drift directions") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // baseline: 'x' uniform on {1..10}; 'y' constant 5
    val baseRows = (1 to 10).map(i => ("x", i.toDouble)) ++
      (1 to 10).map(_ => ("y", 5.0))
    val base = StreamingDriftMonitor
      .baselineCounts(baseRows.toDF("event_type", "value")).cache()

    // batch 1: same distributions -> no drift on x/y
    val b1 = (1 to 10).map(i => ("x", i.toDouble)) ++
      (1 to 10).map(_ => ("y", 5.0))
    // batch 2: x shifted by +100 (total drift), plus a brand-new type 'z'
    val b2 = (1 to 10).map(i => ("x", i + 100.0)) ++
      (1 to 5).map(_ => ("z", 1.0))

    val in = MemoryStream[(String, Double)]
    val out = scala.collection.mutable.Map[Long,
      Map[String, (Long, Long, Long, Option[Double], Boolean)]]()
    val ckpt = java.nio.file.Files.createTempDirectory("drift_mon").toString
    val q = StreamingDriftMonitor.monitor(
      in.toDF().toDF("event_type", "value"), base, ckpt,
      (df, id) => out.synchronized {
        out(id) = report(df
          .select($"event_type", $"n_a", $"n_b", $"d_num", $"ks_d", $"drifted")
          .as[(String, Long, Long, Long, Option[Double], Boolean)].collect())
      })
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // parity with the pure-batch form, batch by batch
    val exp1 = report(StreamingDriftMonitor
      .ksOfBatch(b1.toDF("event_type", "value"), base)
      .select($"event_type", $"n_a", $"n_b", $"d_num", $"ks_d", $"drifted")
      .as[(String, Long, Long, Long, Option[Double], Boolean)].collect())
    val exp2 = report(StreamingDriftMonitor
      .ksOfBatch(b2.toDF("event_type", "value"), base)
      .select($"event_type", $"n_a", $"n_b", $"d_num", $"ks_d", $"drifted")
      .as[(String, Long, Long, Long, Option[Double], Boolean)].collect())
    assert(out(0L) === exp1, s"batch0 ${out(0L)} vs $exp1")
    assert(out(1L) === exp2, s"batch1 ${out(1L)} vs $exp2")

    // directions: identical batch -> D=0, not drifted
    assert(out(0L)("x") == ((10L, 10L, 0L, Some(0.0), false)))
    assert(out(0L)("y") == ((10L, 10L, 0L, Some(0.0), false)))
    // shifted x -> D=1 (disjoint supports), drifted
    assert(out(1L)("x") == ((10L, 10L, 100L, Some(1.0), true)))
    // new type z: baseline side empty -> null D, conservative alert
    assert(out(1L)("z") == ((5L, 0L, 0L, None, true)))
    // vanished type y (absent from batch 2): alert too
    assert(out(1L)("y") == ((0L, 10L, 0L, None, true)))
    base.unpersist()
  }
}
