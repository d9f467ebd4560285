package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WordNgramsExpr

/** Benchmark-contamination detection — the eval-integrity gate every
  * LLM training pipeline runs before a model ships: find training
  * documents that share verbatim word n-grams with a held-out benchmark
  * set, so they can be reported and dropped.
  *
  * Scale shape (the asymmetry IS the design): benchmarks are MBs even
  * when the training corpus is 100 TB, so the benchmark side's exploded
  * n-grams BROADCAST and the training side never shuffles its text — the
  * only exchange is the final (train_id, bench_id) count aggregation,
  * which carries ids and counts, not grams. n-gram construction is the
  * native codegen'd [[WordNgramsExpr]] (one fused loop per doc, distinct
  * grams in first-occurrence order).
  */
object Contamination {

  /** `(id-as-alias, __g: distinct n-gram array)` projection shared by both
    * formulations: normalize into an attribute FIRST (TextShingles
    * performance contract), then one native pass builds the gram array.
    */
  private def gramsOf(df: DataFrame, textCol: String, idCol: String,
      idAlias: String, gramAlias: String, n: Int): DataFrame = df
    .select(col(idCol).as(idAlias), TextShingles.normalize(col(textCol)).as("__norm"))
    .select(col(idAlias), WordNgramsExpr.wordNgrams(col("__norm"), n).as(gramAlias))

  /** All (train doc, benchmark doc) pairs sharing at least `minShared`
    * distinct word `n`-grams of normalized text, with the overlap fraction
    * relative to the TRAIN doc's gram count (asymmetric by intent: "how
    * much of this training doc is benchmark material").
    *
    * Output: `train_id, bench_id, n_shared, overlap` — deterministic
    * (counts + exact arithmetic, no floats before the final round).
    */
  def ngramOverlapPairs(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 4, minShared: Long = 2): DataFrame = {
    val t = gramsOf(train, textCol, idCol, "train_id", "__g", n).select(
      col("train_id"), size(col("__g")).as("__n_train"),
      explode(col("__g")).as("gram"))
    val b = gramsOf(bench, textCol, idCol, "bench_id", "__g", n).select(
      col("bench_id"), explode(col("__g")).as("gram"))
    t.join(broadcast(b), Seq("gram"))
      // grams are distinct per doc on both sides, so plain count(*) per
      // pair IS the distinct-shared-gram count — no countDistinct state
      .groupBy(col("train_id"), col("bench_id"), col("__n_train"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("train_id"), col("bench_id"), col("n_shared"),
        round(col("n_shared") / col("__n_train").cast("double"), 6).as("overlap"))
  }

  /** Stateless formulation of [[ngramOverlapPairs]] for unbounded
    * streams: the benchmark docs broadcast WITH their gram arrays, and
    * the per-pair shared-gram count is `array_intersect` map-side — no
    * aggregation, no state, so the SAME expression runs on a streaming
    * DataFrame in append mode (StreamingContaminationSpec) and every
    * incoming document is screened within its own micro-batch.
    * Batch-equivalent to [[ngramOverlapPairs]] (ContaminationSpec
    * asserts set equality); prefer the aggregated form for batch — it
    * never materializes a per-pair row for non-colliding pairs, where
    * this form visits all |stream| × |bench| pairs (fine exactly
    * because bench is small).
    */
  def overlapPairsStateless(docs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 4, minShared: Long = 2): DataFrame = {
    val t = gramsOf(docs, textCol, idCol, "train_id", "__tg", n)
    val b = gramsOf(bench, textCol, idCol, "bench_id", "__bg", n)
    t.crossJoin(broadcast(b))
      .select(col("train_id"), col("bench_id"),
        size(array_intersect(col("__tg"), col("__bg"))).cast("long").as("n_shared"),
        size(col("__tg")).as("__n_train"))
      .filter(col("n_shared") >= minShared)
      .select(col("train_id"), col("bench_id"), col("n_shared"),
        round(col("n_shared") / col("__n_train").cast("double"), 6).as("overlap"))
  }

  /** The training corpus minus every document flagged by
    * [[ngramOverlapPairs]] — broadcast anti-join on the flagged ids (the
    * flagged set is at most benchmark-sized × a small multiplier, never
    * corpus-sized), so the corpus again moves zero bytes through a
    * shuffle.
    */
  def decontaminate(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 4, minShared: Long = 2): DataFrame = {
    val flagged = ngramOverlapPairs(train, bench, textCol, idCol, n, minShared)
      .select(col("train_id")).distinct()
    train.join(broadcast(flagged), col(idCol) === col("train_id"), "left_anti")
  }

  /** Q141: EXACT verbatim-substring contamination — (train doc, benchmark
    * doc) pairs sharing at least one identical `windowChars`-character
    * substring of normalized text at ANY alignment, with the count of
    * distinct shared windows. The char-level, alignment-free member of
    * the contamination ladder: [[ngramOverlapPairs]]'s word 4-grams miss
    * benchmark text that survives tokenization drift (punctuation glued
    * to a word, a digit reformatted) or that duplicates below the n-gram
    * granularity; a 40-char sliding window catches any verbatim run ≥
    * `windowChars` chars regardless of word boundaries — the
    * decontamination test of "Deduplicating Training Data Makes Language
    * Models Better" (Lee et al. 2022, arXiv:2107.06499 §4.2) applied
    * train-vs-eval instead of train-vs-train.
    *
    * Scale shape: the benchmark side stays MBs at any corpus scale, so
    * its distinct window hashes BROADCAST; the training side is a
    * map-only pass — the fused stride-1 kernel
    * ([[graft.functions.WindowHashExprs]], zero per-position string
    * allocation) emits (train_id, hash) pairs of 16 bytes that die at
    * the broadcast-hash-join probe unless they match. The only exchange
    * is the final (train_id, bench_id) count aggregation over MATCHED
    * rows. Window equality is hash equality (xxhash64 over the window
    * bytes): a false pair needs a 64-bit collision between a benchmark
    * window and a training window — ~n_bench·n_train/2^64 expected
    * corpus-wide, the same standing collision audit as q137/q140 (their
    * oracles recompute on raw text, so a collision would surface as a
    * hash-compare failure, not silent corruption).
    */
  def substringOverlapPairs(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, windowChars: Int = 40): DataFrame = {
    import graft.functions.WindowHashExprs
    def wins(df: DataFrame, alias: String) = df
      .select(col(idCol).as(alias), TextShingles.normalize(col(textCol)).as("__norm"))
      .select(col(alias),
        explode(WindowHashExprs.windowHashes(col("__norm"), windowChars))
          .as("win_hash"))
    wins(train, "train_id")
      .join(broadcast(wins(bench, "bench_id")), Seq("win_hash"))
      // window hashes are distinct per doc on both sides (the kernel
      // dedups), so count(*) per pair IS the distinct-shared-window count
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared_windows"))
  }

  /** The training corpus minus every document sharing a verbatim
    * `windowChars`-char substring with the benchmark set — the
    * substring-exact analogue of [[decontaminate]], same broadcast
    * anti-join shape (flagged ids are bounded by the docs that actually
    * collide with benchmark material).
    */
  def decontaminateExact(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, windowChars: Int = 40): DataFrame = {
    val flagged = substringOverlapPairs(train, bench, textCol, idCol, windowChars)
      .select(col("train_id")).distinct()
    train.join(broadcast(flagged), col(idCol) === col("train_id"), "left_anti")
  }

  /** Q192: MIN-K%-PROB membership/contamination scoring (Shi et al.
    * 2023) — the model-side dual of the verbatim-overlap detectors
    * above: a document the reference model has SEEN scores unusually
    * high probability even on its rarest tokens, so the mean negative
    * log-likelihood of the k% LEAST-probable (highest-surprisal) tokens
    * separates seen from unseen far better than the full-document mean
    * (which common tokens dominate). Here the "model" is the corpus's
    * own add-1-smoothed unigram LM over the q159 train split — the
    * repo's standing held-out discipline — so the score is fully
    * engine-reproducible.
    *
    * Exactness: per-token surprisal −ln((c+1)/(N+V)) on the 1e-6 micro
    * grid (the q133/q159 chain, literal-mirrored); the top-k% cut is a
    * row_number over (mic DESC, position) — a boundary tie can pick
    * either token, but tied tokens have EQUAL mic, so the selected SUM
    * is tie-invariant; k = ceil(n·kPct/100) in integer arithmetic.
    *
    * Scale: unigram counts are one map-side-combinable aggregate; the
    * probability join hits the vocabulary-bounded count table; both
    * windows partition BY DOCUMENT (bounded by document length, never
    * corpus-wide).
    */
  def minKProbScore(docs: DataFrame, textCol: String, idCol: String,
      kPct: Int = 20): DataFrame = {
    require(kPct >= 1 && kPct <= 100, s"kPct out of range: $kPct")
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    val counts = docs.filter(col(idCol) % 10 =!= 7)
      .select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nv = counts.agg(sum(col("c")).as("N"), count(lit(1)).as("V"))
    val held = docs.filter(col(idCol) % 10 === 7)
      .select(col(idCol).as("doc_id"), posexplode(toks).as(Seq("i", "tok")))
    val mic = round(-log(
        (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("N") + col("V")).cast("double")) * 1e6).cast("long")
    val scored = held.join(counts, Seq("tok"), "left")
      .crossJoin(broadcast(nv))
      .select(col("doc_id"), col("i"), mic.as("mic"))
    val wRank = Window.partitionBy(col("doc_id"))
      .orderBy(col("mic").desc, col("i"))
    scored
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("k", expr(s"(n * $kPct + 99) div 100"))
      .filter(col("rn") <= col("k"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), max(col("k")).as("k_tokens"),
        (sum(col("mic").cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("__s"))
      .select(col("doc_id"), col("n_tokens"), col("k_tokens"),
        round(col("__s") / col("k_tokens"), 6).as("mink_nll"))
  }
}
