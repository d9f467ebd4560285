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

  /** The full q206 pipeline: histogram → seed model → Viterbi
    * segmentation → weighted piece usage (piece, n_uses).
    */
  def unigramPieceCounts(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 16,
      maxVocab: Int = 262144): DataFrame = {
    val hist = wordHistogram(docs, textCol, maxWordLen)
      .localCheckpoint(false) // feeds the seed AND the segmentation pass
    val seed = seedPieceCounts(hist, maxPieceLen).collect()
    require(seed.nonEmpty, "unigram: empty corpus")
    require(seed.length <= maxVocab,
      s"unigram: seed vocab ${seed.length} exceeds cap $maxVocab — " +
        "raise maxVocab deliberately or lower maxPieceLen")
    val total = seed.map(_.getLong(1)).sum
    val vocab: Seq[(String, Long)] = seed.toSeq.map { r =>
      val p = r.getLong(1).toDouble / total.toDouble
      (r.getString(0),
        math.floor((0.0 - math.log(p)) * 1000000.0).toLong)
    }
    hist
      .select(col("wcnt"),
        explode(graft.functions.UnigramViterbiExprs.segment(
          col("word"), vocab, maxPieceLen)).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("wcnt")).as("n_uses"))
  }
}
