package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Winnowing

/** Streaming verbatim-quote detection via winnowing fingerprints
  * (license-text / benchmark-contamination spotting at ingest): incoming
  * documents are flagged when they share at least `minShared` winnowing
  * fingerprint hashes with an indexed reference corpus. The winnowing
  * guarantee (Schleimer et al. 2003) makes the gate's floor structural:
  * ANY verbatim quote of >= k + w - 1 characters from an indexed
  * document is certain to produce at least one shared fingerprint —
  * unlike the MinHash gate ([[StreamingNearDup]]), whose whole-document
  * similarity blocks near-dups but can miss a short quote inside an
  * otherwise-novel document.
  *
  * Shape mirrors StreamingNearDup: the index is built ONCE per corpus
  * snapshot (distinct fp longs — 8 bytes per fingerprint, ~2/(w+1) per
  * corpus character), each micro-batch is a stateless probe (no state
  * grows with stream history), and checkpointing gives exactly-once
  * batch delivery to the sink.
  */
object StreamingQuoteGate {

  /** Distinct fingerprint hashes of the reference corpus — persist once
    * per snapshot. At scale: a bucketed table on fp.
    */
  def corpusIndex(corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    Winnowing.fingerprints(corpus, textCol, idCol, k, w)
      .select(col("fp")).distinct()

  /** Pure batch logic (also the spec's reference): each batch doc with
    * its shared-fingerprint count and quote flag.
    */
  def screen(batch: DataFrame, index: DataFrame, textCol: String,
      idCol: String, k: Int = 8, w: Int = 4,
      minShared: Int = 3): DataFrame = {
    val probe = Winnowing.fingerprints(batch, textCol, idCol, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val counts = probe.join(index, Seq("fp"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("shared_fps"))
    batch.join(
      counts.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_outer")
      .withColumn("shared_fps", coalesce(col("shared_fps"), lit(0L)))
      .withColumn("quotes_corpus",
        (col("shared_fps") >= minShared).cast("int"))
  }

  /** Wire the screen onto a stream via foreachBatch; same pinned-index
    * semantics as [[StreamingNearDup.ingestGate]] (the index plan's file
    * listing is fixed at construction; swap snapshots via the refreshing
    * thunk form if needed).
    */
  def gate(stream: DataFrame, index: DataFrame, textCol: String,
      idCol: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit,
      k: Int = 8, w: Int = 4, minShared: Int = 3): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        sink(screen(b, index, textCol, idCol, k, w, minShared), batchId)
      }
      .start()
}
