package graft.streaming

import graft.SparkSpec
import graft.operators.{Nsw, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental ANN index maintenance: streamed appends under the pinned
  * quantizer keep recall at the measured floor, and a resnapshot makes
  * the maintained index BIT-IDENTICAL to a from-scratch batch rebuild
  * on the accumulated corpus.
  */
class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val K = 10

  private def recallOf(approx: Set[(Long, Long)],
      exact: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0
    else approx.intersect(exact).size.toDouble / exact.size

  test("streamed appends serve searches at the recall floor; resnapshot == batch rebuild") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    // 70% base snapshot; the rest arrives as three micro-batches
    val basePart = emb.filter(col("vec_id") % 10 < 7)
    val streamRows = emb.filter(col("vec_id") % 10 >= 7)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)

    val idx = new StreamingAnnIndex.MaintainedAnnIndex(basePart, k = K)
    val in = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ann_maintain").toString
    val q = StreamingAnnIndex.maintain(
      in.toDF().toDF("vec_id", "embedding"), idx, ckpt)
    try {
      streamRows.grouped(math.max(1, streamRows.length / 3 + 1))
        .foreach { batch =>
          in.addData(batch.toSeq: _*)
          q.processAllAvailable()
        }
    } finally q.stop()

    val probes = emb.filter(col("vec_id") < 10)
    val full = idx.corpus()
    // the maintained index must actually contain the streamed rows
    assert(full.count() === emb.count(), "append lost rows")

    // 1. recall vs the exact truth over the ACCUMULATED corpus at the
    //    q186 floor — the incremental graph serves before any rebuild
    val approx = idx.search(probes)
      .select(col("probe_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(full, probes, K)
      .select(col("probe_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val r = recallOf(approx, exact)
    assert(r >= 0.4, f"incremental recall $r%.3f below floor 0.4")

    // 2. searches are deterministic between appends
    val again = idx.search(probes)
      .select(col("probe_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(again === approx)

    // 3. a found streamed vector: at least one exact-truth neighbor from
    //    the streamed partition is served by the incremental index
    //    (appends are searchable, not just stored)
    val streamedServed = approx.exists { case (_, v) => v % 10 >= 7 }
    assert(streamedServed, "no streamed vector ever surfaced in a search")

    // 4. resnapshot: retrained quantizer + rebuilt order == the batch
    //    operator from scratch on the same corpus, bit-identical rows
    idx.resnapshot()
    val served = idx.search(probes)
      .as[(Long, Long, Double, Long)].collect().toSet
    val rebuilt = Nsw.nswTopK(full, probes, K)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(served === rebuilt,
      s"resnapshot diverged from batch rebuild: only-served=${(served -- rebuilt).take(3)} only-batch=${(rebuilt -- served).take(3)}")
  }

  test("resnapshot cadence fires inside the stream (refreshing form)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val basePart = emb.filter(col("vec_id") % 10 < 8)
    val streamRows = emb.filter(col("vec_id") % 10 >= 8)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val idx = new StreamingAnnIndex.MaintainedAnnIndex(basePart, k = K)
    val in = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ann_maintain2").toString
    // resnapshot after every 2 batches; feed exactly 2
    val q = StreamingAnnIndex.maintain(
      in.toDF().toDF("vec_id", "embedding"), idx, ckpt,
      resnapshotEvery = 2)
    try {
      streamRows.grouped(math.max(1, streamRows.length / 2 + 1))
        .foreach { batch =>
          in.addData(batch.toSeq: _*)
          q.processAllAvailable()
        }
    } finally q.stop()
    val probes = emb.filter(col("vec_id") < 10)
    val served = idx.search(probes)
      .as[(Long, Long, Double, Long)].collect().toSet
    val rebuilt = Nsw.nswTopK(idx.corpus(), probes, K)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(served === rebuilt,
      "cadenced resnapshot must equal the batch rebuild")
  }

  test("a replayed batch id is a no-op (at-least-once foreachBatch)") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val basePart = emb.filter(col("vec_id") % 10 < 8)
    val b0 = emb.filter(col("vec_id") % 10 === 8)
    val b1 = emb.filter(col("vec_id") % 10 === 9)
    val probes = emb.filter(col("vec_id") < 10)
    val idx = new StreamingAnnIndex.MaintainedAnnIndex(basePart, k = K)
    idx.append(b0, 0L)
    val n = idx.corpus().count()
    val got = idx.search(probes)
      .as[(Long, Long, Double, Long)].collect().toSet
    // the failure-replay sequence: batch 0 delivered again after a
    // crash between append and checkpoint commit
    idx.append(b0, 0L)
    assert(idx.corpus().count() === n, "replay duplicated index rows")
    assert(idx.search(probes)
      .as[(Long, Long, Double, Long)].collect().toSet === got,
      "replay changed search results")
    // fresh ids still append
    idx.append(b1, 1L)
    assert(idx.corpus().count() === n + b1.count())
  }
}
