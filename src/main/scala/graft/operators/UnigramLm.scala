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
    emRounds(hist, seedCounts(hist, maxPieceLen, maxVocab),
      Seq(keepMulti), maxPieceLen).last
  }

  /** E-step usage frames for `keeps.length + 1` EM rounds: round 1
    * segments under the seed model; after every non-final round the
    * vocabulary prunes to the round's `keeps(r-1)` most-used
    * multi-character pieces (ties by piece) plus the character floor,
    * and costs re-estimate from the round's usage — Kudo 2018's
    * iterate-then-shrink loop in hard-EM form. Non-final usage frames
    * are lazily checkpointed so the prune collect and any downstream
    * read execute the E-step once; the collect is bounded by
    * construction (usage pieces are a subset of the round's vocab,
    * itself cap-probed at the seed).
    */
  private def emRounds(hist: DataFrame, seed: Seq[(String, Long)],
      keeps: Seq[Int], maxPieceLen: Int): Seq[DataFrame] = {
    val charsInv = seed.map(_._1).filter(_.length == 1).distinct
    var vocab = seed
    (1 to keeps.length + 1).map { r =>
      val usage = usageCounts(hist, toCosts(vocab), maxPieceLen)
      if (r > keeps.length) usage
      else {
        val u = usage.localCheckpoint(false)
        val used = u.collect()
          .map(x => (x.getString(0), x.getLong(1))).toMap
        val kept = used.toSeq.filter(_._1.length > 1)
          .sortBy { case (p, n) => (-n, p) }.take(keeps(r - 1))
        vocab = kept ++ charsInv.map(c => (c, used.getOrElse(c, 1L)))
        u
      }
    }
  }

  /** Q215: the FULL unigram-LM EM loop (Kudo 2018) — q206's E-step and
    * q207's prune+re-estimate M-step iterated to a fixed round count
    * with a SHRINKING keep schedule (SentencePiece's vocabulary-size
    * iteration; a same-size re-estimation round is a fixed point on
    * word-histogram corpora, so the shrink is what makes every round
    * move). Emits ONE row per (round, piece): the piece-usage table of
    * every round, so the oracle pins per-round parity, not just the
    * final state.
    *
    * Scale posture unchanged from q206/q207: the corpus is shuffled
    * once into the word histogram; each round is one segmentation pass
    * over DISTINCT words (Zipf-capped) with vocab costs shipped as
    * codegen literals; driver tables stay cap-probed/bounded.
    */
  def unigramEmCounts(docs: DataFrame, textCol: String,
      keeps: Seq[Int] = Seq(12, 8, 5), maxPieceLen: Int = 4,
      maxWordLen: Int = 16, maxVocab: Int = 262144): DataFrame = {
    require(keeps.nonEmpty && keeps.forall(_ >= 0),
      s"bad keep schedule: $keeps")
    val hist = wordHistogram(docs, textCol, maxWordLen)
      .localCheckpoint(false)
    emRounds(hist, seedCounts(hist, maxPieceLen, maxVocab),
        keeps, maxPieceLen)
      .zipWithIndex
      .map { case (u, i) =>
        u.select(lit(i + 1L).as("em_round"), col("piece"), col("n_uses"))
      }
      .reduce(_.union(_))
  }
}
