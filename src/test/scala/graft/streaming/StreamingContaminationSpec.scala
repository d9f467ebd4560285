package graft.streaming

import graft.SparkSpec
import graft.operators.Contamination
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Live contamination screening: incoming documents checked against a
  * static benchmark set per micro-batch. The stateless formulation
  * (benchmark gram arrays broadcast, per-pair `array_intersect`) has no
  * aggregation, so it runs in append mode with zero state — a doc is
  * screened in the batch it arrives, and the stream never accumulates.
  */
class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static contamination screening, append mode, stateless") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = Seq(
      Doc(900L, "alpha beta gamma delta epsilon zeta"),
      Doc(901L, "one two three four five six")).toDF()
    val in = MemoryStream[Doc]
    val out = Contamination.overlapPairsStateless(
      in.toDF(), bench, "text", "doc_id", n = 4, minShared = 2)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("contam_out")
      .outputMode("append").start()
    try {
      in.addData(
        Doc(1L, "alpha beta gamma delta epsilon zeta"), // full overlap
        Doc(2L, "totally unrelated text goes here now"))
      q.processAllAvailable()
      in.addData(
        Doc(3L, "zero one two three four five six end"), // 3 shared 4-grams
        Doc(4L, "more clean content in this batch too"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("contam_out")
      .select("train_id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 900L, 3L), (3L, 901L, 3L)))
  }
}
