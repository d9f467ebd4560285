package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q206: UNIGRAM-LM tokenizer estimation (Kudo 2018 — the SentencePiece
  * unigram model), the probability-based tokenizer family next to the
  * merge-based BPE (q59/q111/q119): estimate a piece model from corpus
  * substring statistics, then tokenize by minimum-cost Viterbi path
  * through the piece lattice ([[graft.functions.UnigramViterbiExprs]])
  * and report corpus-weighted piece usage — the seed-vocab +
  * segmentation E-step that unigram training iterates.
  *
  * Pipeline shape (the BPE-training discipline): ONE corpus shuffle
  * builds the word histogram; everything after runs on DISTINCT words
  * weighted by their counts — the corpus is never re-scanned, and at
  * 100 TB the histogram IS the reduction (word-shaped data Zipf-caps
  * the distinct count). The seed piece table (all substrings up to
  * `maxPieceLen` of distinct words, occurrence-weighted) reduces to a
  * driver-bounded vocab (loud cap, the BPE-merge-table contract) whose
  * −ln-probability costs ship into generated code as micro-grid
  * literals; segmentation is then a single codegen'd DP per distinct
  * word.
  *
  * Exactness: costs are floor((0 − ln(cnt/total))·10⁶) — one mirrored
  * IEEE division, one ln (the q165/q177 ln-parity precedent), one
  * multiply, one floor; the DP is integer micro arithmetic with the
  * smallest-split tie-break, so segmentations are bit-identical across
  * engines and partitionings.
  */
object UnigramLm {

  /** Corpus word histogram: (word, wcnt), length-capped by contract. */
  def wordHistogram(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wcnt"))

  /** Occurrence-weighted seed piece counts over the histogram. */
  def seedPieceCounts(hist: DataFrame, maxPieceLen: Int): DataFrame =
    hist
      .withColumn("i", explode(sequence(lit(1), length(col("word")))))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("i") + lit(1)))))
      .select(expr("substring(word, i, l)").as("piece"), col("wcnt"))
      .groupBy(col("piece"))
      .agg(sum(col("wcnt")).as("cnt"))

  /** (piece, count) rows → micro-grid −ln costs, mirrored literal by
    * literal in the oracle's cost CTEs.
    */
  private def toCosts(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = counts.map(_._2).sum
    counts.map { case (piece, cnt) =>
      val p = cnt.toDouble / total.toDouble
      (piece, math.floor((0.0 - math.log(p)) * 1000000.0).toLong)
    }
  }

  /** Corpus-weighted piece usage of the Viterbi segmentation under
    * `vocab` — the unigram E-step as a frame.
    */
  private def usageCounts(hist: DataFrame, vocab: Seq[(String, Long)],
      maxPieceLen: Int): DataFrame =
    hist
      .select(col("wcnt"),
        explode(graft.functions.UnigramViterbiExprs.segment(
          col("word"), vocab, maxPieceLen)).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("wcnt")).as("n_uses"))

  /** Seed vocab as (piece, count), cap-probed BEFORE the collect
    * ([[DriverTables.collectCapped]] — the guard must fire without the
    * driver ever materializing an oversized table).
    */
  private[operators] def seedCounts(hist: DataFrame, maxPieceLen: Int,
      maxVocab: Int): Seq[(String, Long)] =
    DriverTables.collectCapped(seedPieceCounts(hist, maxPieceLen),
        maxVocab, "unigram seed vocab",
        "raise maxVocab deliberately or lower maxPieceLen")
      .toSeq.map(r => (r.getString(0), r.getLong(1)))

  /** The full q206 pipeline: histogram → seed model → Viterbi
    * segmentation → weighted piece usage (piece, n_uses).
    */
  def unigramPieceCounts(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 16,
      maxVocab: Int = 262144): DataFrame = {
    val hist = wordHistogram(docs, textCol, maxWordLen)
      .localCheckpoint(false) // feeds the seed AND the segmentation pass
    usageCounts(hist, toCosts(seedCounts(hist, maxPieceLen, maxVocab)),
      maxPieceLen)
  }

  /** Q207: the PRUNE step of unigram training — SentencePiece's
    * vocabulary-size iteration: keep only the `keepMulti` most-used
    * multi-character pieces from the seed E-step (ties by piece value,
    * the q202 discipline) PLUS every single character at a usage floor
    * of 1 (SentencePiece's character-coverage rule — characters are
    * never pruned, so every word keeps a path by construction), then
    * re-estimate costs over the shrunken vocabulary and re-segment.
    * Words whose favorite pieces were pruned re-route through the
    * survivors — the usage counts genuinely shift, which is what makes
    * pruning an iteration and not a projection.
    *
    * Same scale posture as [[unigramPieceCounts]]: the corpus is
    * touched once by the histogram; both E-steps are single passes
    * over distinct words; the vocab stays driver-bounded by contract.
    */
  def unigramPrunedCounts(docs: DataFrame, textCol: String,
      keepMulti: Int = 8, maxPieceLen: Int = 4, maxWordLen: Int = 16,
      maxVocab: Int = 262144): DataFrame = {
    require(keepMulti >= 0, s"keepMulti out of range: $keepMulti")
    val hist = wordHistogram(docs, textCol, maxWordLen)
      .localCheckpoint(false)
    val seed = seedCounts(hist, maxPieceLen, maxVocab)
    val v1 = toCosts(seed)
    val used = usageCounts(hist, v1, maxPieceLen).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val kept = used.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, n) => (-n, p) }.take(keepMulti)
    val chars = seed.map(_._1).filter(_.length == 1).distinct
      .map(c => (c, used.getOrElse(c, 1L)))
    usageCounts(hist, toCosts(kept ++ chars), maxPieceLen)
  }
}
