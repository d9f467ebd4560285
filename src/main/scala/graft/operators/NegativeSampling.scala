package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q208: SKIP-GRAM PAIRS WITH NEGATIVE SAMPLING (Mikolov et al. 2013)
  * — the contrastive-training table a word2vec-style run consumes:
  * positives are (center, context) co-occurrences within a ±window
  * over token positions; each positive pair gets `negatives` sampled
  * words drawn from the corpus unigram distribution. Sampling is
  * SEEDED per (pair, draw) through the polynomial-hash +
  * multiplicative-hash device (the q165/q205 determinism contract:
  * reproducible, oracle-checkable; swap a true RNG in production),
  * and resolves against the vocabulary's cumulative weights with the
  * O(log|V|) [[graft.functions.RangeLookupExprs]] kernel — no
  * per-draw join, no re-scan. Weights are the RAW unigram counts
  * (exact integers; word2vec's count^0.75 flattening is deliberately
  * not applied — pow() is not bit-portable across engines, and the
  * integer grid is the repo's exactness contract).
  *
  * Scale: one corpus shuffle for token positions (q54's tokenizer),
  * per-doc lag/lead windows for the pairs (partitioned by doc), one
  * map-side-combinable count to the pair table, one to the vocab.
  * The vocab collect is driver-bounded by contract (Zipf caps
  * distinct words; the loud `maxVocab` guard holds the envelope).
  * Draw resolution is a codegen'd binary search per row.
  */
object NegativeSampling {

  def skipgramWithNegatives(docs: DataFrame, textCol: String,
      idCol: String, window: Int = 2, negatives: Int = 2,
      maxVocab: Int = 1 << 22): DataFrame = {
    require(window >= 1 && window <= 8, s"window out of range: $window")
    require(negatives >= 1 && negatives <= 16,
      s"negatives out of range: $negatives")
    val toks = TextAnalysis.tokenPositions(docs, textCol, idCol)
      .localCheckpoint(false) // feeds the pair pass AND the vocab
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val ctxs = (-window to window).filter(_ != 0).map { o =>
      if (o < 0) lag(col("token"), -o).over(w)
      else lead(col("token"), o).over(w)
    }
    val pairs = toks
      .select(col("token").as("center"), array(ctxs: _*).as("ctxs"))
      .select(col("center"), explode(col("ctxs")).as("context"))
      .filter(col("context").isNotNull)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n_pos"))
    // Cap-probed BEFORE the collect (DriverTables.collectCapped): the
    // guard fires without the driver materializing an oversized vocab.
    val vocab = DriverTables.collectCapped(
        toks.groupBy(col("token")).agg(count(lit(1)).as("cnt")),
        maxVocab, "negative-sampling vocab",
        "the cumulative table must stay executor-shippable — raise " +
          "maxVocab deliberately or pre-filter the corpus")
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val bounds = vocab.map(_._2).scanLeft(0L)(_ + _).tail
    val total = bounds.last
    val gid = pmod(
      graft.functions.PolyHashExprs.polyHash(
        concat_ws(" ", col("center"), col("context"))) * lit(31L) +
        col("k"),
      lit(1000000007L))
    val draw = pmod(
      shiftright(pmod(gid, lit(1000003L)) * lit(2654435761L), 16),
      lit(total))
    pairs
      .withColumn("k", explode(sequence(lit(1L), lit(negatives.toLong))))
      .withColumn("negative", graft.functions.RangeLookupExprs.lookup(
        draw, bounds.toSeq, vocab.map(_._1).toSeq))
      .select(col("center"), col("context"), col("n_pos"), col("k"),
        col("negative"))
  }
}
