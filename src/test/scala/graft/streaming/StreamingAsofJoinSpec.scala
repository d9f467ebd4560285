package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time correctness of the streaming as-of join: out-of-order right
  * rows still answer, emission waits for the watermark, results equal the
  * batch [[graft.operators.AsofJoin]] on the same rows, and right-side
  * state compacts to one committed row once the watermark passes.
  */
class StreamingAsofJoinSpec extends SparkSpec {
  import spark.implicits._
  import StreamingAsofJoin._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def right(k: Long, id: Long, t: String) = In(k, 0, id, ts(t))
  private def left(k: Long, id: Long, t: String) = In(k, 1, id, ts(t))

  test("probe answered with latest right at-or-before; emission waits for watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[In]
    val out = StreamingAsofJoin.asofStream(spark, in.toDS(), "1 hour")
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // the probe arrives BEFORE the right row that should answer it
      // (out-of-order); a stale right and an equal-timestamp right probe
      // the (ts, id) tie-break too
      in.addData(
        left(1L, 100L, "2024-01-01 10:30:00"),
        right(1L, 10L, "2024-01-01 09:00:00"))
      q.processAllAvailable()
      in.addData(right(1L, 11L, "2024-01-01 10:15:00"))
      q.processAllAvailable()
      assert(spark.table("asof_out").count() == 0,
        "emitted before the watermark passed the probe")
      // heartbeat pushes the watermark (max ts − 1h) past the probe
      in.addData(right(9L, 999L, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      in.addData(right(9L, 998L, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      val rows = spark.table("asof_out").as[Matched].collect()
      assert(rows.length == 1, s"expected 1 match, got ${rows.toSeq}")
      val m = rows.head
      assert(m.k == 1L && m.left_id == 100L && m.right_id.contains(11L) &&
        m.right_ts.contains(ts("2024-01-01 10:15:00")),
        s"wrong as-of answer: $m")
    } finally q.stop()
  }

  test("stream equals batch asofJoin on the same shuffled rows") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // three keys, rights interleaved around probes, delivered out of order
    val rights = Seq(
      (1L, 10L, "2024-01-01 09:00:00"), (1L, 11L, "2024-01-01 10:00:00"),
      (1L, 12L, "2024-01-01 11:00:00"),
      (2L, 20L, "2024-01-01 10:30:00"),
      (3L, 30L, "2024-01-01 12:00:00"))
    val probes = Seq(
      (1L, 100L, "2024-01-01 09:30:00"), (1L, 101L, "2024-01-01 10:00:00"),
      (1L, 102L, "2024-01-01 23:00:00"),
      (2L, 200L, "2024-01-01 10:00:00"), // before key 2's only right → None
      (3L, 300L, "2024-01-01 12:00:00")) // equal ts → inclusive
    val in = MemoryStream[In]
    val out = StreamingAsofJoin.asofStream(spark, in.toDS(), "2 hours")
    val q = out.writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    try {
      // two deliberately out-of-order batches, each staying inside the
      // 2h watermark bound (batch 2's oldest row, 09:00, is within 2h of
      // batch 1's max, 10:30 — any further and the engine would rightly
      // drop it as late, which the late-drop test below pins separately)
      in.addData(
        left(1L, 100L, probes(0)._3), right(1L, 11L, rights(1)._3),
        right(2L, 20L, rights(3)._3))
      q.processAllAvailable()
      in.addData(
        right(1L, 10L, rights(0)._3), left(1L, 101L, probes(1)._3),
        right(1L, 12L, rights(2)._3), left(2L, 200L, probes(3)._3),
        right(3L, 30L, rights(4)._3), left(3L, 300L, probes(4)._3),
        left(1L, 102L, probes(2)._3))
      q.processAllAvailable()
      // push the watermark far past every probe
      in.addData(right(9L, 999L, "2024-01-02 12:00:00"))
      q.processAllAvailable()
      in.addData(right(9L, 998L, "2024-01-02 13:00:00"))
      q.processAllAvailable()
      val streamed = spark.table("asof_parity").as[Matched].collect()
        .map(m => (m.k, m.left_id) -> ((m.right_id, m.right_ts))).toMap
      // batch reference on the same rows
      val l = probes.map { case (k, id, t) => (k, id, ts(t)) }
        .toDF("k", "left_id", "ts")
      val r = rights.map { case (k, id, t) => (k, id, ts(t)) }
        .toDF("k", "right_id", "ts")
      val batch = graft.operators.AsofJoin
        .asofJoin(l, r, "k", "ts", Seq("right_id"))
        .select($"k", $"left_id", $"right_id", $"asof_ts")
        .as[(Long, Long, Option[Long], Option[Timestamp])].collect()
        .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
      assert(streamed == batch,
        s"stream/batch divergence:\n stream=$streamed\n batch=$batch")
    } finally q.stop()
  }

  test("a probe already under the watermark on arrival is dropped, not answered") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[In]
    val out = StreamingAsofJoin.asofStream(spark, in.toDS(), "10 seconds")
    val q = out.writeStream.format("memory").queryName("asof_late")
      .outputMode("append").start()
    try {
      in.addData(right(1L, 1L, "2024-01-01 10:00:00"),
        right(9L, 999L, "2024-01-01 12:00:00")) // watermark → 11:59:50
      q.processAllAvailable()
      in.addData(left(1L, 100L, "2024-01-01 10:30:00")) // 1.5h late
      q.processAllAvailable()
      in.addData(right(9L, 998L, "2024-01-01 14:00:00"))
      q.processAllAvailable()
      assert(spark.table("asof_late").count() == 0,
        "late probe was not dropped")
    } finally q.stop()
  }

  test("keyed state survives stop/restart: a probe buffered before the restart answers after it") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[In]
    val out = StreamingAsofJoin.asofStream(spark, in.toDS(), "10 seconds")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_asof_ckpt").toString
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink (same pattern as StreamingRecoverySpec)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Matched]()
    def start() = out.writeStream
      .option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Matched], _: Long) =>
        batch.collect().foreach(got.add)
      }
      .start()
    val q1 = start()
    try {
      in.addData(right(1L, 10L, "2024-01-01 10:00:00"),
        left(1L, 100L, "2024-01-01 10:30:00"))
      q1.processAllAvailable()
      // watermark has not passed the probe: both sit in RocksDB state
      assert(got.isEmpty)
    } finally q1.stop()
    // restart from the checkpoint; heartbeats push the watermark past the
    // probe — the answer must come from state written BEFORE the restart
    val q2 = start()
    try {
      in.addData(right(9L, 999L, "2024-01-01 12:00:00"))
      q2.processAllAvailable()
      in.addData(right(9L, 998L, "2024-01-01 13:00:00"))
      q2.processAllAvailable()
      val rows = got.toArray(Array.empty[Matched]).toSet
      assert(rows == Set(Matched(1L, 100L, ts("2024-01-01 10:30:00"),
        Some(10L), Some(ts("2024-01-01 10:00:00")))),
        s"state lost across restart: $rows")
    } finally q2.stop()
  }

  test("right-side state compacts to one committed row once the watermark passes") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[In]
    val out = StreamingAsofJoin.asofStream(spark, in.toDS(), "10 seconds")
    val q = out.writeStream.format("memory").queryName("asof_compact")
      .outputMode("append").start()
    try {
      // a long history of rights, all far under the watermark after the
      // heartbeat — compaction must keep answering from the committed
      // LATEST (id 5), not lose it with the evicted pending list
      in.addData((1 to 5).map(i =>
        right(1L, i.toLong, f"2024-01-01 0$i%d:00:00")): _*)
      q.processAllAvailable()
      in.addData(right(9L, 999L, "2024-01-01 20:00:00")) // watermark → 19:59:50
      q.processAllAvailable()
      // probe AFTER compaction: answer must be the committed id 5
      in.addData(left(1L, 100L, "2024-01-01 21:00:00"))
      q.processAllAvailable()
      in.addData(right(9L, 998L, "2024-01-02 09:00:00"))
      q.processAllAvailable()
      val rows = spark.table("asof_compact").as[Matched].collect()
        .filter(_.left_id == 100L)
      assert(rows.length == 1 && rows.head.right_id.contains(5L),
        s"compacted answer wrong: ${rows.toSeq}")
    } finally q.stop()
  }
}
