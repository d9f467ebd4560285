package graft.streaming

import graft.operators.Nsw
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** INCREMENTAL ANN INDEX MAINTENANCE — streaming inserts into the
  * NSW-per-IVF-cell index ([[graft.operators.Nsw]]), the
  * [[StreamingNearDup]] pinned/refreshing split applied to a graph
  * index. Mirrors how production vector stores run (FAISS
  * IVF `add()` + periodic retrain):
  *
  *  - SNAPSHOT: the coarse quantizer (centroids) is trained once on the
  *    base corpus and PINNED; the base vectors are cell-assigned under
  *    it with the batch operator's deterministic build order.
  *  - APPEND (per micro-batch, via `foreachBatch`): arriving vectors
  *    are cell-assigned under the SAME pinned quantizer and appended to
  *    their cell's build order AFTER everything already indexed (ord =
  *    (batch+1)·2^42 + insertKey — batch-then-hash order). Because NSW
  *    insertion IS "search the graph built so far, link to the m
  *    nearest", appending to a kept graph and rebuilding in the same
  *    order are the same algorithm — the index the searcher sees is
  *    exactly the incrementally-inserted graph, and a search costs no
  *    more than the batch operator on the same corpus. Appends never
  *    move old vectors between cells (assignments are pinned), so
  *    admission/search results are stable across the snapshot's
  *    lifetime — the pinned-form consistency contract.
  *  - RESNAPSHOT (on a cadence — every N batches, or when drift
  *    accumulates): base := base ∪ deltas, quantizer retrained with the
  *    batch operator's exact sampling discipline, deltas cleared. After
  *    a resnapshot, [[MaintainedAnnIndex.search]] is BIT-IDENTICAL to
  *    [[graft.operators.Nsw.nswTopK]] rebuilt from scratch on the
  *    accumulated corpus (parity-spec'd) — the refreshing form's batch-
  *    boundary snapshot swap.
  *
  * Scale: cells stay the unit of parallelism and memory; the delta log
  * is a plain append-only vector table (here an in-memory union chain,
  * truncated by localCheckpoint per append; in production a parquet
  * append target). Between snapshots, recall can sag as the data
  * drifts away from the pinned centroids — the spec measures the
  * incremental index against the brute-force truth at the q186 floor.
  */
object StreamingAnnIndex {

  private val BatchOrdStride = 1L << 42 // insertKey < 2^41

  /** Driver-held maintained index: pinned quantizer + append log.
    * Thread-confined to the streaming query's foreachBatch thread plus
    * the caller's search thread between batches (the usual driver-side
    * index-state contract).
    */
  final class MaintainedAnnIndex(
      corpus0: DataFrame,
      val k: Int = 10,
      val nCentroids: Int = 16,
      val nProbe: Int = 4,
      val m: Int = 8,
      val ef: Int = 32,
      val sampleSize: Int = 2048) {

    private var centroids: Array[Array[Double]] = _
    private var base: DataFrame = _          // (vec_id, v, cell, ord)
    private var delta: Option[DataFrame] = None
    // highest batchId already indexed: foreachBatch is at-least-once,
    // so a batch replayed after a failure between append and checkpoint
    // commit must be skipped, not indexed twice
    private var lastApplied: Long = Long.MinValue

    snapshot(corpus0)

    private def assign(corpus: DataFrame, ordCol: org.apache.spark.sql.Column)
        : DataFrame =
      corpus.select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
          .as("v"),
        Nsw.bestCellCol(centroids, col("embedding")).as("cell"),
        ordCol.as("ord"))

    private def snapshot(corpus: DataFrame): Unit = {
      centroids = Nsw.trainCentroids(corpus, nCentroids, sampleSize)
      base = assign(corpus, Nsw.insertKeyCol(col("vec_id")))
        .localCheckpoint(true)
      delta = None
    }

    /** Append one micro-batch of (vec_id, embedding) rows under the
      * pinned quantizer; they index after everything already present.
      * IDEMPOTENT per batchId: a replayed batch (at-least-once
      * foreachBatch) is a no-op, which is what makes [[maintain]]'s
      * exactly-once claim true for the index's lifetime.
      */
    def append(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastApplied) return
      lastApplied = batchId
      val ord = lit((batchId + 1L) * BatchOrdStride) +
        Nsw.insertKeyCol(col("vec_id"))
      val d = assign(batch, ord)
      // localCheckpoint truncates the union chain AND pins the rows so
      // a replayed source cannot change history under the index
      val merged = delta.map(_.union(d)).getOrElse(d)
        .localCheckpoint(true)
      delta = Some(merged)
    }

    /** Search the CURRENT index — snapshot plus all appended deltas,
      * each cell's graph in pinned-then-arrival insertion order.
      */
    def search(probes: DataFrame): DataFrame = synchronized {
      val assigned = delta.map(base.union).getOrElse(base)
      Nsw.searchAssigned(assigned,
        Nsw.probeCells(probes, centroids, nProbe), k, m, ef)
    }

    /** Promote snapshot ∪ deltas to a fresh snapshot: retrain the
      * quantizer with the batch operator's sampling discipline and
      * rebuild the deterministic base order. After this, [[search]] ==
      * [[graft.operators.Nsw.nswTopK]] on the accumulated corpus.
      */
    def resnapshot(): Unit = synchronized {
      val all = delta.map(base.union).getOrElse(base)
        .select(col("vec_id"), col("v").as("embedding"))
      snapshot(all)
    }

    /** Accumulated corpus as (vec_id, embedding) — the batch-rebuild
      * comparator the parity spec uses.
      */
    def corpus(): DataFrame = synchronized {
      delta.map(base.union).getOrElse(base)
        .select(col("vec_id"), col("v").as("embedding"))
    }
  }

  /** Wire maintenance onto a vector stream: every micro-batch appends
    * to the index; every `resnapshotEvery` batches the quantizer
    * retrains and the graphs rebuild (the refreshing cadence; 0 = never,
    * the pinned form). Effectively exactly-once for the index's
    * lifetime: foreachBatch delivers at-least-once, and
    * [[MaintainedAnnIndex.append]] skips replayed batch ids.
    */
  def maintain(stream: DataFrame, index: MaintainedAnnIndex,
      checkpoint: String, resnapshotEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        index.append(b, batchId)
        if (resnapshotEvery > 0 && (batchId + 1) % resnapshotEvery == 0)
          index.resnapshot()
      }
      .start()
}
