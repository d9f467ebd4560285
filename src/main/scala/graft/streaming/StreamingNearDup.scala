package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming NEAR-duplicate ingest gate — the approximate counterpart of
  * [[StreamingDedup.againstStaticCorpus]]: admit arriving documents whose
  * text is not a near-duplicate (char-shingle Jaccard ≥ t) of anything in
  * a static indexed corpus.
  *
  * Architecture: the corpus side is PRE-INDEXED once into an LSH bucket
  * table (band, h, hs) — at 100 TB this is a bucketed/partitioned table
  * maintained by the batch pipeline, not recomputed per stream. Each
  * micro-batch then (1) shingles+signs its docs inline (native codegen'd
  * expressions), (2) probes the index with a bucket equi-join, (3)
  * verifies candidates with exact Jaccard on the hashed sets, and (4)
  * anti-joins the verified-match ids back. Steps 2–4 need a per-batch
  * `distinct` on matched ids, which pure Structured Streaming would treat
  * as unbounded stateful aggregation — so the gate runs through
  * `foreachBatch`, the standard production device for per-batch
  * relational logic: the stream stays exactly-once (checkpointed batch
  * ids), and the per-batch plan is ordinary Catalyst batch planning with
  * all of the batch operators' scale properties (the probe join is
  * stateless: no streaming state grows with history).
  */
object StreamingNearDup {

  /** Build the corpus LSH index: one row per (band, h) bucket membership,
    * carrying the member's hashed shingle set for verification. Persist /
    * write this once per corpus snapshot; at scale, bucket it on (band, h).
    */
  def corpusIndex(corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    Dedup.charShingleSets(corpus, textCol, idCol, shingleK)
      .select(col("id").as("corpus_id"), col("hs"),
        graft.functions.MinHashSignatureExpr
          .minhashSignature(col("hs"), numHashes).as("sig"))
      .withColumn("bh", explode(Dedup.bandHashes(col("sig"), bands, rows)))
      .select(col("bh.band"), col("bh.h"), col("corpus_id"),
        col("hs").as("corpus_hs"))
  }

  /** The per-batch gate (pure batch logic — also the spec's reference):
    * admit docs from `batch` with no verified near-dup in `index`.
    */
  def admitNew(batch: DataFrame, index: DataFrame, textCol: String,
      idCol: String, shingleK: Int = 5, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val probe = Dedup.charShingleSets(batch, textCol, idCol, shingleK)
      .select(col("id"), col("hs"),
        graft.functions.MinHashSignatureExpr
          .minhashSignature(col("hs"), numHashes).as("sig"))
      .withColumn("bh", explode(Dedup.bandHashes(col("sig"), bands, rows)))
      .select(col("bh.band"), col("bh.h"), col("id"), col("hs"))
    val matched = probe
      .join(index, Seq("band", "h"))
      .filter(graft.functions.HashedSetExprs
        .sortedLongJaccard(col("hs"), col("corpus_hs")) >= threshold)
      .select(col("id")).distinct()
    batch.join(matched.withColumnRenamed("id", idCol), Seq(idCol),
      "left_anti")
  }

  /** Wire the gate onto a stream: every micro-batch is filtered through
    * [[admitNew]] and handed to `sink`. Returns the started query.
    *
    * INDEX-REFRESH SEMANTICS (pinned form): `index` is a DataFrame whose
    * PLAN is re-executed every micro-batch — but what that re-execution
    * sees is fixed at construction time for the common shapes: a file
    * source pins its FILE LISTING when the DataFrame is created (a
    * snapshot directory swapped underneath it is NOT picked up — new
    * files are invisible, replaced files error), and a `.cache()`d index
    * serves every batch from the materialized blocks. So this overload
    * means "gate against THIS corpus snapshot for the stream's
    * lifetime" — the right semantics when admission decisions must be
    * consistent across a run. For a corpus that is re-indexed while the
    * stream runs, use [[ingestGateRefreshing]].
    */
  def ingestGate(stream: DataFrame, index: DataFrame, textCol: String,
      idCol: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): StreamingQuery =
    ingestGateRefreshing(stream, () => index, textCol, idCol, checkpoint,
      sink, shingleK, numHashes, bands, threshold)

  /** The refreshing form: `indexSource` is re-invoked at EVERY
    * micro-batch, so a snapshot swap (e.g. the batch pipeline published
    * a new corpus index directory and repointed a symlink/manifest)
    * takes effect at the NEXT batch boundary — each batch is gated
    * against exactly one index snapshot, never a mix. The thunk should
    * construct a fresh DataFrame (fresh file listing); admission
    * decisions already made in earlier batches are NOT revisited (the
    * gate is append-only — replaying history against a new index is a
    * batch job, not a streaming concern).
    */
  def ingestGateRefreshing(stream: DataFrame, indexSource: () => DataFrame,
      textCol: String, idCol: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        sink(admitNew(b, indexSource(), textCol, idCol, shingleK, numHashes,
          bands, threshold), batchId)
      }
      .start()

  // --- MEDIA (perceptual dHash) gate — the q214 family's streaming dual

  /** Corpus dHash index: one row per (chunk, value) bucket membership,
    * carrying the fingerprint for exact Hamming verification. Same
    * publication contract as [[corpusIndex]]: built once per corpus
    * snapshot by the batch pipeline, bucketed on (c, v) at scale.
    */
  def mediaCorpusIndex(corpus: DataFrame, payloadCol: String,
      idCol: String): DataFrame =
    corpus.select(col(idCol).as("corpus_id"),
        graft.functions.DHashExpr.dhash(col(payloadCol)).as("corpus_fp"))
      .withColumn("chunk", explode(Dedup.dhashChunksOf(col("corpus_fp"))))
      .select(col("chunk.c"), col("chunk.v"), col("corpus_id"),
        col("corpus_fp"))

  /** Per-batch media gate (pure batch logic — also the spec's
    * reference): admit media with no indexed payload within Hamming
    * `maxDist`. Pigeonhole-EXACT for maxDist <= 2 (the q214 banding):
    * the probe is a chunk equi-join, the verify one bit_count, so a
    * batch costs posting-list work, never batch × corpus.
    */
  def admitNewMedia(batch: DataFrame, index: DataFrame,
      payloadCol: String, idCol: String, maxDist: Int = 2): DataFrame = {
    Dedup.requireDhashDist(maxDist)
    val probe = batch.select(col(idCol).as("id"),
        graft.functions.DHashExpr.dhash(col(payloadCol)).as("fp"))
      .withColumn("chunk", explode(Dedup.dhashChunksOf(col("fp"))))
      .select(col("chunk.c"), col("chunk.v"), col("id"), col("fp"))
    val matched = probe
      .join(index, Seq("c", "v"))
      .filter(bit_count(col("fp").bitwiseXOR(col("corpus_fp"))) <= maxDist)
      .select(col("id")).distinct()
    batch.join(matched.withColumnRenamed("id", idCol), Seq(idCol),
      "left_anti")
  }

  /** Wire the media gate onto a stream — same foreachBatch device and
    * index-refresh semantics as [[ingestGateRefreshing]] (the thunk is
    * re-invoked per batch; pass `() => index` for the pinned form).
    */
  def mediaIngestGate(stream: DataFrame, indexSource: () => DataFrame,
      payloadCol: String, idCol: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit, maxDist: Int = 2): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        sink(admitNewMedia(b, indexSource(), payloadCol, idCol, maxDist),
          batchId)
      }
      .start()
}
