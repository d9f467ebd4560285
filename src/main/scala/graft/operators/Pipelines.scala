package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus-preparation pipeline compositions — the actual
  * product use-case the individual operators exist for: a user of this
  * engine runs exactly this shape over raw crawl text before training.
  * Composing them in one plan (rather than materializing between steps)
  * lets Catalyst collapse the projections: dedup, quality scoring, and
  * filtering all ride the SAME scan + single aggregation shuffle chain.
  */
object Pipelines {

  /** Q40: clean-corpus stats — exact-dedup the documents (keep lowest id
    * per text), score quality, drop low-quality docs (too few tokens /
    * too much punctuation), report per-language kept-doc and token
    * counts. Output stays in exact integers, so the result is
    * partitioning-independent and oracle-checkable bit-for-bit.
    */
  /** Q49: deterministic hash-bucket train/valid/test assignment — the
    * split a training pipeline runs last, and one that must be (a)
    * shuffle-free (a pure projection), (b) stable across engines and
    * re-runs (no `rand()`), and (c) independent of row order. Bucket =
    * `(id * 2654435761) mod 100` (Knuth multiplicative hashing) — plain
    * 64-bit integer arithmetic reproducible in any engine, no library
    * hash dependency.
    */
  def trainSplit(docs: DataFrame, idCol: String,
      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    val bucket = pmod(col(idCol) * lit(2654435761L), lit(100L))
    docs.select(
      col(idCol), bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test").as("split"))
  }

  /** Q56: deterministic stratified sampling — per-stratum keep rates for
    * rebalancing a skewed corpus (the "too much English" problem). Same
    * multiplicative-hash bucket as [[trainSplit]], compared against a
    * per-stratum rate: shuffle-free, engine-reproducible, and stable under
    * re-runs — `df.sample`/`rand()` guarantee none of those (their output
    * depends on partitioning), which is why a pipeline that must be
    * auditable samples by key hash instead.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
      ratesPct: Map[String, Int], defaultPct: Int): DataFrame = {
    val bucket = pmod(col(idCol) * lit(2654435761L), lit(100L))
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (stratum, pct)) =>
      when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }

  def cleanCorpusStats(docs: DataFrame,
      minTokens: Long = 10L, maxPunctRatio: Double = 0.2): DataFrame = {
    val deduped = docs
      .groupBy(col("text"))
      .agg(min(struct(col("doc_id"), col("lang"))).as("keep"))
      .select(col("keep.lang").as("lang"), col("text"))
    val scored = deduped.select(
      col("lang"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      (size(regexp_extract_all(col("text"), lit("[^\\w\\s]"), lit(0))).cast("double") /
        greatest(length(col("text")).cast("double"), lit(1.0))).as("punct_ratio"))
    scored
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("total_tokens"))
  }
}
