package graft.streaming

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** q79's changelog compaction as a LIVE materialized view: the same
  * `latestSnapshot` aggregation on an unbounded change stream in UPDATE
  * mode — each micro-batch re-emits only the keys it touched, and the
  * memory sink's last row per key IS the current snapshot. This is the
  * CDC pattern where batch q79 is the nightly rebuild and this query is
  * the intra-day view; both run the IDENTICAL operator.
  */
case class Change(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    event_type: String, value: Double)

class StreamingSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("latestSnapshot on a change stream: update mode converges per key") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val in = MemoryStream[Change]
    val out = Relational.latestSnapshot(in.toDF())
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("snapshot_out")
      .outputMode("update").start()
    try {
      in.addData(
        Change(1L, t(1), 10L, "view", 1.0),
        Change(2L, t(1), 11L, "view", 2.0))
      q.processAllAvailable()
      // batch 2: u1 advances (later ts), u2 gets a LATE row (earlier ts —
      // must NOT win), u3 appears
      in.addData(
        Change(1L, t(5), 12L, "click", 3.0),
        Change(2L, t(0), 13L, "error", 9.0),
        Change(3L, t(2), 14L, "buy", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    // last emitted row per key is the live snapshot
    val snap = spark.table("snapshot_out")
      .withColumn("__batch", org.apache.spark.sql.functions
        .monotonically_increasing_id())
      .orderBy("__batch")
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("last_type"), r.getDouble(3))))
      .toMap
    assert(snap == Map(
      1L -> (("click", 3.0)),
      2L -> (("view", 2.0)), // late arrival lost to the state's later ts
      3L -> (("buy", 4.0))))
  }
}
