package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming two-group histogram (q289's dual): latest emitted cells
  * equal the batch histogram of everything fed so far, the KS verdict
  * over them equals the batch KS, and state stays |domain|-bounded.
  */
case class GroupedValue(g: String, v: Long)

class StreamingKsSpec extends SparkSpec {
  import spark.implicits._

  test("complete-mode cells and KS verdict converge to the batch test") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two drifting cohorts over a 12-value domain, plus a THIRD group
    // the stream must EXCLUDE (the batch contract filters isin(A, B);
    // pre-fix, X rows silently landed in the implicit B side)
    val evs = (0 until 80).map { i =>
      val g = if (i % 5 == 4) "X" else if (i % 2 == 0) "R" else "N"
      val v = (i * 2654435761L % 12 + 12) % 12 + (if (g == "N") 2L else 0L)
      GroupedValue(g, v)
    }
    val in = MemoryStream[GroupedValue]
    val out = StreamingStats.twoGroupCellsStream(in.toDF(),
      col("g"), col("v"), groupA = "R", groupB = "N")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("ks_cells")
      .outputMode("complete").start()
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    def batchHist(xs: Seq[GroupedValue]) =
      Stats.twoGroupHist(xs.toDF("g", "v"), "g", col("v"), "R", "N")
    try {
      in.addData(evs.take(30): _*)
      q.processAllAvailable()
      assert(cellsOf(spark.table("ks_cells")) ===
        cellsOf(batchHist(evs.take(30))))
      in.addData(evs.drop(30): _*)
      q.processAllAvailable()
      val fin = spark.table("ks_cells")
      assert(cellsOf(fin) === cellsOf(batchHist(evs)))
      // state bound: at most |domain| cells
      assert(fin.count() <= 14L)
      // KS verdict over streamed cells equals the batch test
      // (snapshot the sink view — ksVerdict references it twice)
      val snap = fin.select(col("v"), col("na"), col("t"))
        .as[(Long, Long, Long)].collect().toSeq
      val vStream = Stats.ksVerdict(snap.toDF("v", "na", "t"))
        .as[(Long, Long, Double, Long)].collect().head
      val vBatch = Stats.ks2Sample(evs.toDF("g", "v"), "g", col("v"),
        "R", "N").as[(Long, Long, Double, Long)].collect().head
      assert(vStream === vBatch)
    } finally q.stop()
  }
}
