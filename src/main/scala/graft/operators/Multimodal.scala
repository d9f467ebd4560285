package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (mandated extension): media payloads are
  * opaque `binary` columns with typed metadata travelling alongside. The
  * decode step is STUBBED with a deterministic fake (the real image/audio
  * codecs are not in this container) — everything around it (schema, batch
  * shape, partition-parallel execution, metadata extraction) is real Spark.
  *
  * Scale notes: decode runs in `mapPartitions` over a `Dataset[MediaRow]`,
  * i.e. executor-side, batch-at-a-time, no driver collect; upstream column
  * pruning still applies because the binary column is selected explicitly.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the "multimodal column"
    * pattern — binary + descriptor struct).
    */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Output of the (stubbed) decoder: fixed-shape feature record. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_intensity: Double)

  /** Attach a synthetic binary media payload to each document (UTF-8 bytes
    * of the text — a stand-in for real image bytes; deterministic).
    */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("image")).otherwise(lit("audio")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — a real deployment would call an image/audio codec here
    * (per partition, batched). The fake is deterministic in the payload
    * bytes so specs and the oracle can verify the plumbing end-to-end:
    * width/height are parsed from byte lengths, intensity is the mean byte.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        // deterministic fake of a codec's output shape
        val width = math.max(1, n % 97)
        val height = math.max(1, n / math.max(1, width))
        // exact integer sum then one IEEE double division — deterministic
        // and oracle-reproducible without any rounding step
        val mean =
          if (n == 0) 0.0
          else r.payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
        MediaFeatures(r.doc_id, r.media_type, n.toLong, width, height, mean)
      }
    }
  }

  /** A decoded-and-resized media record: payload replaced by the (stubbed)
    * resized pixel buffer, dimensions updated.
    */
  case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, pixels: Array[Byte])

  /** STUB resize: a real deployment calls the codec's scaler per partition;
    * the fake downsamples the payload bytes by striding so output size
    * tracks the target dims deterministically. The Spark-side shape —
    * typed Dataset in, typed Dataset out, executor-side batches — is real.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val target = math.max(1, w * h)
        val stride = math.max(1, r.payload.length / target)
        val px = r.payload.indices.by(stride).take(target)
          .map(r.payload).toArray
        ResizedMedia(r.doc_id, r.media_type, w, h, px)
      }
    }
  }

  /** A sampled frame from a (stubbed) video payload. */
  case class Frame(doc_id: Long, frame_idx: Int, offset: Long, data: Array[Byte])

  /** STUB frame-sampling: emits every `every`-th fixed-size slice of the
    * payload as a "frame" (a real implementation seeks keyframes). One
    * input row explodes to many frame rows — the flatMap shape matches how
    * a real sampler fans out, and downstream operators (dedup, embedding)
    * consume frames as ordinary rows.
    */
  def frameSample(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, every: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = math.max(1, r.payload.length / frameBytes)
      (0 until nFrames by every).map { i =>
        val off = i * frameBytes
        Frame(r.doc_id, i, off.toLong,
          r.payload.slice(off, math.min(off + frameBytes, r.payload.length)))
      }
    }
  }

  /** Q220: FRAME-LEVEL perceptual dedup — which media items share
    * perceptually-identical sampled frames (re-encoded uploads, clipped
    * copies, shared intros): [[frameSample]]'s slices each fingerprint
    * with the fixed-grid dHash kernel ([[graft.functions.DHashExpr]]),
    * and items sharing >= `minShared` DISTINCT frame fingerprints pair
    * up through a plain fp equi-join — posting lists per fingerprint,
    * never item × item. `dfCap` drops fingerprints present in more
    * than `dfCap` items (black frames, standard intros — the hub
    * fingerprints that would otherwise square the join), and the >= 2
    * floor prunes singleton fps before the self-join; both are the
    * df-capped-bucket discipline of the passage-dedup family. Frame
    * membership is per-item DISTINCT, so repeated frames inside one
    * item count once.
    */
  def frameDhashDups(spark: SparkSession, media: DataFrame,
      minShared: Long = 1L, frameBytes: Int = 64, every: Int = 2,
      dfCap: Long = 50L): DataFrame = {
    require(minShared >= 1L, s"minShared out of range: $minShared")
    require(dfCap >= 2L, s"dfCap must allow pairs: $dfCap")
    val fps = frameSample(spark, media, frameBytes, every).toDF()
      .select(col("doc_id"),
        graft.functions.DHashExpr.dhash(col("data")).as("fp"))
      .distinct()
    val ok = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
      .select(col("fp"))
    val cand = fps.join(ok, Seq("fp"))
    cand.select(col("fp"), col("doc_id").as("doc_a"))
      .join(cand.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Q9: documents ⋈ embeddings on id — the multimodal join: text metadata
    * plus vector-derived features in one row. Plain equi-join; Catalyst
    * broadcasts whichever side is small, both sides column-pruned at scan.
    */
  def multimodalJoin(docs: DataFrame, emb: DataFrame): DataFrame =
    docs.join(emb, docs("doc_id") === emb("vec_id"), "inner")
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        col("label").cast("long").as("label"),
        // native l2Norm promotes floats per element inside the fused loop —
        // bit-identical to the cast-then-fold formulation the oracle uses
        round(l2Norm(col("embedding")), 6).as("vec_norm"))
}
