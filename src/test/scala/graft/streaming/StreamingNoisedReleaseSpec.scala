package graft.streaming

import graft.SparkSpec
import graft.operators.Governance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** q205's noised release as a LIVE privacy-preserving dashboard: the
  * identical operator on an unbounded event stream in UPDATE mode.
  * Because the Laplace draw is seeded by the GROUP (not the rows), a
  * group's released value depends only on its current true count —
  * re-emissions stay consistent as counts grow, and the final state
  * equals the batch release over the same rows (stream ≡ batch
  * parity, the repo's streaming-dual contract).
  */
case class Ev205(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingNoisedReleaseSpec extends SparkSpec {
  import spark.implicits._

  test("noised release on a stream: update mode, final state ≡ batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(d: Int, s: Int) =
      java.sql.Timestamp.valueOf(f"2024-02-$d%02d 00:00:$s%02d")
    val rows =
      (1 to 7).map(i => Ev205(i.toLong, t(1, i), 1L, "a", 0.0)) ++
        (1 to 3).map(i => Ev205(100L + i, t(1, i), 2L, "b", 0.0)) ++
        (1 to 5).map(i => Ev205(200L + i, t(2, i), 1L, "a", 0.0))
    val in = MemoryStream[Ev205]
    val out = Governance.noisedDailyRelease(in.toDF(), Seq("a", "b"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("noised_out")
      .outputMode("update").start()
    try {
      in.addData(rows.take(6): _*)
      q.processAllAvailable()
      in.addData(rows.drop(6): _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("noised_out")
      .withColumn("__b", org.apache.spark.sql.functions
        .monotonically_increasing_id())
      .orderBy("__b").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Governance
      .noisedDailyRelease(rows.toDF(), Seq("a", "b"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(live == batch, s"live $live vs batch $batch")
  }
}
