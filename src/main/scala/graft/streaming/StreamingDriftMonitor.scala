package graft.streaming

import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DISTRIBUTION-DRIFT monitor — the continuous form of the q160
  * two-sample KS statistic: every micro-batch of an event stream is
  * compared, per event type, against a PINNED baseline distribution (the
  * corpus-so-far / last-known-good week), and batches whose
  * Kolmogorov–Smirnov D exceeds a threshold are flagged. This is the
  * ingest-side tripwire a training pipeline runs in front of the batch
  * analytics: a upstream schema slip, a unit change (ms→s), or a bot
  * flood shifts the VALUE distribution long before daily aggregates
  * notice, and KS sees shape (variance blow-ups, bimodal splits) that
  * mean/σ monitors miss.
  *
  * Architecture mirrors [[StreamingNearDup]]: the baseline reduces ONCE
  * to per-(type, 1e-6-grid value) counts (support-bounded, not
  * corpus-sized — cache it or publish it from the batch pipeline), and
  * each micro-batch runs pure stateless batch logic through
  * `foreachBatch` — per-batch grid reduction, full-outer merge with the
  * baseline counts, and the shared integer-exact KS core
  * ([[Relational.ksFromCounts]]). No streaming state grows with history;
  * the stream stays exactly-once via the checkpointed batch ids.
  */
object StreamingDriftMonitor {

  /** Reduce a baseline corpus to the pinned per-(event_type, grid-value)
    * count table the monitor probes. Publish once per baseline snapshot.
    */
  def baselineCounts(baseline: DataFrame): DataFrame =
    baseline
      .select(col("event_type"),
        round(col("value") * 1e6).cast("long").as("vq"))
      .groupBy(col("event_type"), col("vq"))
      .agg(count(lit(1)).as("cb"))

  /** Pure batch logic (also the spec's reference): KS of one batch
    * against the pinned baseline counts. Emits one row per event type
    * present in EITHER side: (event_type, n_a = batch count, n_b =
    * baseline count, d_num, ks_d, drifted). A type absent from one side
    * has no distribution to compare: ks_d emits null and `drifted` is
    * true — a brand-new or vanished event type is itself drift.
    */
  def ksOfBatch(batch: DataFrame, baseCounts: DataFrame,
      alertD: Double = 0.3): DataFrame = {
    val pa = batch
      .select(col("event_type"),
        round(col("value") * 1e6).cast("long").as("vq"))
      .groupBy(col("event_type"), col("vq"))
      .agg(count(lit(1)).as("ca"))
    val merged = pa.join(baseCounts, Seq("event_type", "vq"), "full_outer")
      .select(col("event_type"), col("vq"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val degenerate = col("n_a") === 0 || col("n_b") === 0
    Relational.ksFromCounts(merged)
      // one-sided types: no distribution to compare — null out the IEEE
      // 0/0 and alert conservatively
      .withColumn("ks_d", when(degenerate, lit(null)).otherwise(col("ks_d")))
      .withColumn("drifted",
        when(degenerate, lit(true)).otherwise(col("ks_d") > lit(alertD)))
  }

  /** Wire the monitor onto a stream. `baseCounts` follows the PINNED
    * snapshot semantics of [[StreamingNearDup.ingestGate]] (file listings
    * pin at DataFrame creation; cache it to serve every batch from
    * memory). Each batch's report rows go to `sink` tagged with the
    * batch id; the stream itself is passed through untouched — this is a
    * monitor, not a gate.
    */
  def monitor(stream: DataFrame, baseCounts: DataFrame, checkpoint: String,
      sink: (DataFrame, Long) => Unit,
      alertD: Double = 0.3): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        sink(ksOfBatch(b, baseCounts, alertD), batchId)
      }
      .start()
}
