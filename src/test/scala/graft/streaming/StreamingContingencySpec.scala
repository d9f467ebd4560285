package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming contingency cells (q272's dual): latest emitted cells
  * equal the batch cell table of everything fed so far, the verdict
  * over them equals the batch verdict, and state stays |A|·|B|-bounded.
  */
case class LabeledEvent(et: String, dow: Long)

class StreamingContingencySpec extends SparkSpec {
  import spark.implicits._

  test("complete-mode cells and verdict converge to the batch audit") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = (0 until 60).map { i =>
      LabeledEvent(Seq("click", "view", "error")(i % 3),
        (i * 2654435761L % 7 + 7) % 7)
    }
    val in = MemoryStream[LabeledEvent]
    val out = StreamingStats.contingencyCellsStream(in.toDF(),
      col("et"), col("dow"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("cont_cells")
      .outputMode("complete").start()
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    try {
      in.addData(evs.take(25): _*)
      q.processAllAvailable()
      val mid = cellsOf(spark.table("cont_cells"))
      val midBatch = cellsOf(evs.take(25).toDF("et", "dow")
        .groupBy(col("et").as("a"), col("dow").as("b"))
        .agg(count(lit(1)).as("o")))
      assert(mid === midBatch)
      in.addData(evs.drop(25): _*)
      q.processAllAvailable()
      val fin = spark.table("cont_cells")
      assert(cellsOf(fin) === cellsOf(evs.toDF("et", "dow")
        .groupBy(col("et").as("a"), col("dow").as("b"))
        .agg(count(lit(1)).as("o"))))
      // state bound: at most |A|*|B| cells
      assert(fin.count() <= 3L * 7L)
      // the verdict over streamed cells equals the batch audit
      // (snapshot the sink view first — the verdict self-joins the
      // cell table, and a memory-sink view can't be self-joined)
      val snap = fin.select(col("a"), col("b"), col("o"))
        .as[(String, Long, Long)].collect().toSeq
      val vStream = Stats.contingencyVerdict(snap.toDF("a", "b", "o"))
        .as[(Long, Long, Long, Double, Double, Double)].collect().head
      val vBatch = Stats.contingencyStats(evs.toDF("et", "dow"),
        col("et"), col("dow"))
        .as[(Long, Long, Long, Double, Double, Double)].collect().head
      assert(vStream === vBatch)
    } finally q.stop()
  }
}
