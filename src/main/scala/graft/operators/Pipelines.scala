package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * re-runs (no `rand()`), and (c) independent of row order — plain
    * 64-bit integer arithmetic reproducible in any engine, no library
    * hash dependency. See [[hashBucket]] for the formula and why a bare
    * `(id * mult) mod 100` would NOT work.
    */
  def trainSplit(docs: DataFrame, idCol: String,
      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    val bucket = hashBucket(col(idCol))
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
    val bucket = hashBucket(col(idCol))
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (stratum, pct)) =>
      when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }

  /** Deterministic 0..99 bucket from a non-negative integer id:
    * `((id mod 1000003) * 2654435761) >> 16) mod 100`.
    *
    * Why not the textbook `(id * 2654435761) mod 100`? Because 2654435761
    * is coprime to 100, that form is a BIJECTION of `id mod 100` — any id
    * scheme with non-uniform residues mod 100 (block, strided, or sharded
    * allocation) yields skewed or fully degenerate splits. Taking HIGH
    * bits of the product (`>> 16`) before reducing mod 100 mixes every
    * input bit into the bucket: consecutive ids step the shifted value by
    * ~40503.4, so strided id schemes spread across all 100 buckets.
    *
    * The `mod 1000003` (prime) pre-reduction bounds the multiplicand so
    * the product ≤ 1000002 × 2654435761 ≈ 2.7e15 can never overflow a
    * signed 64-bit integer — Spark 4 runs ANSI mode by default, where a
    * bare `id * 2654435761` THROWS for id ≳ 3.47e9 rather than wrapping
    * (and DuckDB errors on BIGINT overflow too, so wraparound is not
    * engine-portable anyway). Ids that collide mod 1000003 share a bucket
    * by construction, which is harmless for percentage splits.
    *
    * Negative ids THROW instead of bucketing: Spark's `pmod` returns
    * non-negative remainders while SQL `%` in other engines (DuckDB
    * oracles included) keeps the dividend's sign — a negative id would
    * silently land in different buckets per engine. Splits must be
    * reproducible across engines, so an id scheme that goes negative has
    * to fail loudly, not drift.
    */
  def hashBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val guarded = when(id < 0, raise_error(
      concat(lit("hashBucket: negative id "), id.cast("string"),
        lit(" — bucket assignment is not engine-portable for negative ids"))))
      .otherwise(id)
    pmod(shiftright(pmod(guarded, lit(1000003L)) * lit(2654435761L), 16), lit(100L))
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

  /** Q76: deterministic k-per-group sample — the "give me 10 example docs
    * per language" primitive, reproducible across runs and engines (no
    * `rand()`): rank rows within each group by ([[hashBucket]], id) and
    * keep the first `k`. ALWAYS equals the unfiltered ranking
    * (PipelinesSpec asserts it, including on a deliberately rare group).
    *
    * Scale shape: the ranking window never sees a whole large group —
    * rows are PRE-FILTERED to the `prefilterPct` smallest buckets, and
    * because bucket is the window's PRIMARY sort key the global
    * k-smallest all live in that slice whenever it holds ≥ k rows for
    * the group. Groups whose prefiltered slice holds FEWER than k rows
    * (rare/small groups — with uniform mixing that needs group size
    * ≲ k·100/prefilterPct; includes groups with ZERO surviving rows, so
    * the count comes from the FULL input, not the survivors) are ranked
    * over ALL their rows instead, so the sample is never silently short,
    * biased, or missing a group. Cost: one extra counting aggregate over
    * the input (map-side partial, one row per group); the window still
    * sorts ~prefilterPct% of every large group instead of all of it.
    */
  def groupSample(docs: DataFrame, idCol: String, groupCol: String,
      k: Int = 10, prefilterPct: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__b"), col(idCol))
    val withB = docs.withColumn("__b", hashBucket(col(idCol)))
    // survivor counts per group from the FULL input: a survivors-only
    // aggregate could never emit a zero-count group, which would silently
    // drop groups whose rows ALL hash above the cutoff
    val deficient = withB
      .groupBy(col(groupCol))
      .agg(sum(when(col("__b") < prefilterPct, 1L).otherwise(0L)).as("__n"))
      .filter(col("__n") < k)
      .select(col(groupCol), lit(true).as("__deficient"))
    withB
      .join(broadcast(deficient), Seq(groupCol), "left")
      .filter(col("__b") < prefilterPct || col("__deficient").isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col(groupCol), col("rank"))
  }

  /** Q102: sequence packing — assign documents to fixed-capacity training
    * sequences ("packs") by contiguous fill, the batch-prep step between a
    * cleaned corpus and a pretraining run. Global greedy packing is a
    * serial fold (inherently one partition — the skew trap), so the
    * industrial shape is SHARD-LOCAL packing: documents hash into shards,
    * each shard packs its documents in deterministic (id) order by running
    * token count, and pack capacity overflows SPLIT across the boundary
    * (`is_split` marks them) exactly as a token-stream packer would.
    * All arithmetic is integer-exact: the running sum, the pack id
    * (`(cum−1) div capacity`), and the split flag are reproducible on any
    * engine and any partitioning. The window partitions by shard — state
    * bounded by docs/shard, parallelism = shard count, no global sort.
    */
  def packSequences(docs: DataFrame, idCol: String,
      capacity: Long = 2048L, shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same engine-portable multiplicative hash as [[hashBucket]] (xxhash64
    // has no cross-engine equivalent), reduced mod `shards` directly so the
    // distribution stays uniform — and the same negative-id guard: pmod vs
    // SQL % diverge on negative ids, so they fail loudly instead of
    // sharding differently per engine
    val guarded = when(col(idCol) < 0, raise_error(
      concat(lit("packSequences: negative id "), col(idCol).cast("string"),
        lit(" — shard assignment is not engine-portable for negative ids"))))
      .otherwise(col(idCol))
    val shard = pmod(
      shiftright(pmod(guarded, lit(1000003L)) * lit(2654435761L), 16),
      lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a doc occupies token positions (cum−n+1)..cum; its pack ids are the
    // integer-DIV (not `/`, which is double division in Spark SQL) of the
    // zero-based first and last positions — differing ids mean the doc
    // straddles a pack boundary and gets split. A ZERO-token doc occupies
    // no positions, so its pack is defined explicitly as the pack the next
    // token would land in (cum div capacity) and it is never split:
    // without the branch, a shard-FIRST empty doc computes (−1) div
    // capacity, where Spark `div` truncates toward zero (0) but
    // standard-SQL `//` floors (−1) — the one operand that could go
    // negative, and the engines disagree on it. Every branch here keeps
    // the dividend ≥ 0, where div and // agree.
    val endPack = when(col("n_tokens") === 0L,
        expr(s"cum_tokens div ${capacity}L"))
      .otherwise(expr(s"(cum_tokens - 1) div ${capacity}L"))
    val startPack = expr(s"(cum_tokens - n_tokens) div ${capacity}L")
    docs
      .select(col(idCol).as("doc_id"), shard.as("shard"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(
        col("shard"), col("doc_id"), col("n_tokens"), col("cum_tokens"),
        endPack.as("pack_id"),
        (endPack =!= startPack).cast("int").as("is_split"))
  }

  /** Q105: the full corpus-preparation pipeline as ONE declarative plan —
    * the capstone composition this library exists for: exact dedup (keep
    * lowest id per text) → quality filter (token count + punctuation
    * ratio) → benchmark decontamination (4-gram overlap anti-join) →
    * deterministic train/valid/test split → per-(lang, split) summary.
    * Because nothing materializes between stages, Catalyst collapses the
    * projections: the corpus is scanned once for the dedup aggregation
    * and once inside the contamination gram join's train side, the
    * benchmark side broadcasts, and the split is a pure projection — the
    * same shuffle budget as running dedup alone plus the gram join.
    * Every stage is individually oracled (q6/q40/q69/q85/q49); this query
    * oracles their COMPOSITION, where stage-ordering bugs (e.g. splitting
    * before dedup, which leaks near-identical docs across splits) would
    * show up as count drift.
    */
  def corpusPrep(docs: DataFrame, benchMod: Int = 10, benchRem: Int = 7,
      minTokens: Long = 10L, maxPunctRatio: Double = 0.2,
      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    val train = docs.filter(pmod(col("doc_id"), lit(benchMod)) =!= benchRem)
    val bench = docs.filter(pmod(col("doc_id"), lit(benchMod)) === benchRem)
    val deduped = train
      .groupBy(col("text"))
      .agg(min(struct(col("doc_id"), col("lang"))).as("keep"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"),
        col("text"))
    val quality = deduped
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("punct_ratio",
        size(regexp_extract_all(col("text"), lit("[^\\w\\s]"), lit(0))).cast("double") /
          greatest(length(col("text")).cast("double"), lit(1.0)))
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
    val clean = Contamination.decontaminate(quality, bench, "text", "doc_id",
      n = 4, minShared = 2)
    val bucket = hashBucket(col("doc_id"))
    clean
      .select(col("lang"), col("n_tokens"),
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + validPct, "valid")
          .otherwise("test").as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }

  /** Q116: the q105 capstone with the passage-level stage (q108) composed
    * in — the full modern prep pipeline: exact-dedup → passage-strip →
    * quality → decontaminate → split, ONE plan, with in-plan
    * observability ([[Observe]]) at the stage boundaries: ingest
    * row/empty-text counts, dedup survivors, post-decontamination
    * survivors — the numbers a 100 TB run is operated by, computed as
    * accumulators on the same pass (read them from
    * `queryExecution.observedMetrics` after the action; the streaming
    * ingest equivalent surfaces per batch via
    * [[graft.streaming.MetricsChannel]]).
    *
    * The passage stage dedups 20-token chunks CORPUS-WIDE across the
    * already-exact-deduped train docs (first occurrence by (doc_id, idx)
    * survives), re-tokenizes the STRIPPED text for quality scoring, and
    * the final split aggregate also reports how many duplicated chunks
    * each (lang, split) cell shed — boilerplate-shedding made visible in
    * the corpus report.
    */
  def corpusPrepV2(docs: DataFrame, benchMod: Int = 10, benchRem: Int = 7,
      chunkTokens: Int = 20, minTokens: Long = 10L,
      maxPunctRatio: Double = 0.2, trainPct: Int = 80,
      validPct: Int = 10): DataFrame = {
    val train = Observe.textIngest(
      docs.filter(pmod(col("doc_id"), lit(benchMod)) =!= benchRem),
      "graft_prep_ingest", "text")
    val bench = docs.filter(pmod(col("doc_id"), lit(benchMod)) === benchRem)
    val deduped = Observe.survivors(
      train.groupBy(col("text"))
        .agg(min(struct(col("doc_id"), col("lang"))).as("keep"))
        .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"),
          col("text")),
      "graft_prep_dedup")
    // r19 (measured, guide §2): the exact-dedup groupBy's output is
    // ~1 MB at sf0.1, so AQE coalesced it to ONE partition and the
    // whole downstream chain (passage chunk hashing, token counting,
    // punctuation regex — the pipeline's CPU-heavy text kernels) ran
    // single-task (~3 s of 1-task stages). Per-doc work is
    // partition-independent; spread it to session parallelism.
    val stripped = Dedup
      .passageDedup(Hashing.repartitionForCompute(deduped, "doc_id"),
        "text", "doc_id", chunkTokens, carry = Seq("lang"))
      .select(col("doc_id"), col("lang"), col("text_stripped").as("text"),
        col("n_dup_chunks"))
    val quality = stripped
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("punct_ratio",
        size(regexp_extract_all(col("text"), lit("[^\\w\\s]"), lit(0))).cast("double") /
          greatest(length(col("text")).cast("double"), lit(1.0)))
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
    val clean = Observe.survivors(
      Contamination.decontaminate(quality, bench, "text", "doc_id",
        n = 4, minShared = 2),
      "graft_prep_clean")
    val bucket = hashBucket(col("doc_id"))
    clean
      .select(col("lang"), col("n_tokens"), col("n_dup_chunks"),
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + validPct, "valid")
          .otherwise("test").as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_dup_chunks")).as("dup_chunks"))
  }

  /** Q117: corpus snapshot diff — classify every document across two
    * corpus versions as added / removed / changed / unchanged: the
    * between-crawls bookkeeping every refreshed training corpus needs
    * (what moved, and how many tokens it cost) before re-running the
    * expensive dedup/quality stages on the delta only.
    *
    * Shape at scale: ONE full-outer join on the id — each side projects
    * (id, xxhash64(text), token count, carry) first, so the join
    * compares 8-byte content hashes, never shuffles or compares full
    * texts, and the join's equality is the only data-sized work. Carry
    * columns resolve new-side-first (added/changed rows have no old
    * version; removed rows fall back to the old side's values).
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String, carry: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select((col(idCol).as(s"id_$tag") +:
        xxhash64(col(textCol)).as(s"h_$tag") +:
        TextAnalysis.tokenCount(col(textCol)).as(s"tokens_$tag") +:
        carry.map(c => col(c).as(s"${c}_$tag"))): _*)
    val o = side(oldDocs, "old")
    val n = side(newDocs, "new")
    o.join(n, col("id_old") === col("id_new"), "full_outer")
      .select(
        (coalesce(col("id_new"), col("id_old")).as(idCol) +:
          when(col("id_old").isNull, "added")
            .when(col("id_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged").as("change") +:
          coalesce(col("tokens_old"), lit(0L)).as("n_tokens_old") +:
          coalesce(col("tokens_new"), lit(0L)).as("n_tokens_new") +:
          carry.map(c =>
            coalesce(col(s"${c}_new"), col(s"${c}_old")).as(c))): _*)
  }

  /** Q118: data-mixture plan — the "solver" step of corpus mixing: given
    * per-language target weights and a total token budget, report what
    * each language can contribute (`tokens_available`), what the mixture
    * asks of it (`target_tokens` = weight × budget), the resulting
    * deterministic keep rate (to feed [[stratifiedSample]] /
    * [[tokenBudgetSelect]]), and the planned tokens (capped by
    * availability — an under-resourced language contributes everything
    * it has; re-normalizing the shortfall across other languages is a
    * POLICY choice left to the caller, not silently applied).
    *
    * One aggregation over the corpus (map-side partial sums of token
    * counts), then languages-sized arithmetic — the plan is a
    * #languages-row table, computable at any corpus size.
    */
  def mixturePlan(docs: DataFrame, langCol: String, textCol: String,
      targetWeights: Map[String, Double], budgetTokens: Long): DataFrame = {
    val weight = targetWeights.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (l, w)) =>
        when(col(langCol) === l, lit(w)).otherwise(acc)
      }
    docs
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("tokens_available"))
      .withColumn("target_tokens",
        floor(weight * lit(budgetTokens.toDouble)).cast("long"))
      .withColumn("planned_tokens",
        least(col("tokens_available"), col("target_tokens")))
      .withColumn("keep_rate",
        round(col("planned_tokens").cast("double") /
          greatest(col("tokens_available").cast("double"), lit(1.0)), 6))
  }

  /** Q95: per-group z-score feature scaling — normalize a numeric column
    * against its group's mean and sample stddev, the standard pre-training
    * feature transform. Deliberately NOT a `Window.partitionBy(group)`:
    * with a handful of groups a window would funnel the entire fact table
    * through that many partitions (the 100 TB skew trap). Instead the
    * per-group moments aggregate map-side into a groups-sized table that
    * BROADCASTS back onto the facts — the big side is never re-keyed, so
    * the only full-data cost is the scan itself. Zero-variance groups
    * yield NULL z-scores (the engine-portable degenerate contract, as in
    * q80's corr guard); 6-dp rounding absorbs partial-sum reorder noise.
    */
  def zscoreNormalize(events: DataFrame): DataFrame = {
    val stats = events
      .groupBy(col("event_type").as("st_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
    events
      .join(broadcast(stats), col("event_type") === col("st_type"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        round(when(col("sd") > 0, (col("value") - col("mu")) / col("sd")), 6)
          .as("z"))
  }

  /** Q112: per-group winsorization — clip a numeric feature at its
    * group's [lo, hi] percentiles, flagging clipped rows: the outlier
    * treatment that precedes z-scoring when tails are heavy (clip, THEN
    * standardize — q95's broadcast-moments companion). Same scale shape
    * as q95: percentile bounds reduce to a groups-sized table that
    * BROADCASTS back onto the facts — deliberately NOT a window, so the
    * fact table is never re-keyed and the only full-data cost is the
    * scan. `percentile_cont` interpolation runs on DOUBLE in both
    * engines (the q86-established exactness), and the clipped value
    * rounds to the 6-dp grid.
    */
  def winsorize(events: DataFrame, lo: Double = 0.01,
      hi: Double = 0.99): DataFrame = {
    val bounds = events
      .groupBy(col("event_type").as("b_type"))
      .agg(
        expr(s"percentile_cont($lo) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE))")
          .as("p_lo"),
        expr(s"percentile_cont($hi) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE))")
          .as("p_hi"))
    events
      .join(broadcast(bounds), col("event_type") === col("b_type"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        round(least(greatest(col("value"), col("p_lo")), col("p_hi")), 6)
          .as("value_w"),
        (col("value") < col("p_lo") || col("value") > col("p_hi"))
          .cast("int").as("clipped"))
  }

  // -------- Q110: token-budget corpus selection (data mixing) ------------

  /** The per-doc selection score: stopword density (q13's formula exactly
    * — rounded to the 6-dp grid, so every engine orders identically).
    * Higher = more natural running text.
    */
  private def selectionScore(text: Column): Column = {
    val toks = TextAnalysis.tokenCount(text)
    val stop = size(regexp_extract_all(lower(text),
      lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0))).cast("double")
    round(stop / greatest(toks.cast("double"), lit(1.0)), 6)
  }

  private def scoredDocs(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      selectionScore(col("text")).as("score"))

  /** Reference formulation of the greedy selection: per language, walk
    * docs best-score-first (doc_id tie-break) and keep the longest prefix
    * whose running token count stays within the budget. ONE window over
    * the full corpus — correct, but partitions by `lang`, so at 100 TB a
    * dominant language funnels through one sort. Kept as the
    * spec/equivalence reference; [[tokenBudgetSelect]] is the production
    * path.
    */
  def tokenBudgetGreedy(docs: DataFrame, budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scoredDocs(docs)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") <= budgetTokens)
      .drop("__cum")
  }

  /** Q110: token-budget corpus selection — per language, the best-scoring
    * docs whose cumulative token count fits a budget: the data-mixing
    * primitive ("give me the top N billion tokens of each language,
    * quality-first"). Output ≡ [[tokenBudgetGreedy]] (spec-pinned), but
    * the plan never sorts the corpus:
    *
    *   1. ONE aggregation by (lang, score) → per-bucket token totals. The
    *     bucket table is BOUNDED by the score grid (6-dp ratios in [0,1] ⇒
    *     ≤ 1e6 buckets/lang) regardless of corpus size.
    *   2. A window over that tiny table finds each language's cutoff: full
    *     buckets (whole bucket fits under what remains), ONE boundary
    *     bucket (budget runs out inside it), the rest out.
    *   3. Bucket verdicts broadcast back onto the docs: full-bucket docs
    *     pass with NO per-doc ordering at all; only the boundary bucket —
    *     one score value per language — pays a within-bucket cumsum.
    *
    * So nothing corpus-sized ever shuffles or sorts: the corpus-side
    * costs are column-pruned scans + one map-side-combinable aggregation
    * (Spark plans trees, not DAGs, so the full/boundary branches each
    * re-evaluate the projected scan — scans parallelize freely; it is the
    * exchange, not the scan, that chokes at 100 TB, and the only
    * exchanges here carry the bounded bucket table and the one-bucket
    * boundary slice). Greedy-prefix equivalence holds bucket-wise because the
    * running sum is monotone: every doc in a bucket wholly under budget
    * has inclusive-cum ≤ budget, every doc past the boundary bucket has
    * cum > budget, and inside the boundary bucket the doc_id-ordered
    * within-cum offset by the better-buckets total reproduces the global
    * cum exactly (zero-token docs included — they ride whichever side of
    * the overflow point their (score, doc_id) puts them on, both here and
    * in the reference window).
    */
  def tokenBudgetSelect(docs: DataFrame, budgetTokens: Long = 5000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scoredDocs(docs)
    val wb = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = base
      .groupBy(col("lang"), col("score"))
      .agg(sum(col("n_tokens")).as("__bucket_toks"))
      .withColumn("__cum_before",
        coalesce(sum(col("__bucket_toks")).over(wb), lit(0L)))
      .withColumn("__kind",
        when(col("__cum_before") + col("__bucket_toks") <= budgetTokens,
          lit("full"))
          .when(col("__cum_before") <= budgetTokens, lit("boundary"))
          .otherwise(lit("out")))
      .filter(col("__kind") =!= "out")
    val joined = base.join(broadcast(buckets), Seq("lang", "score"))
    val full = joined.filter(col("__kind") === "full")
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("score"))
    val wIn = Window.partitionBy(col("lang"), col("score"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("__kind") === "boundary")
      .withColumn("__cum",
        col("__cum_before") + sum(col("n_tokens")).over(wIn))
      .filter(col("__cum") <= budgetTokens)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("score"))
    full.unionByName(boundary)
  }

  /** Q135: incremental SCD-2 apply — merge a batch of changes into a
    * slowly-changing-dimension table (the Delta/Iceberg MERGE pattern,
    * composed from relational primitives): closed history rows and
    * untouched keys' current rows PASS THROUGH with no window and no
    * per-key work; only the touched keys' current rows union the new
    * change rows and pay one small re-window. Work is O(|changes| +
    * |touched current rows|), never O(|history|) — on a 100 TB dimension
    * with a daily change feed, that is the difference between a merge
    * and a rebuild.
    *
    * Inputs: `dim` in q84 shape + an `event_id` ordering column
    * (user_id, event_type, value, valid_from, valid_to, is_current,
    * event_id); `changes` as (user_id, event_type, value, ts, event_id).
    * Within-key ordering is (valid_from, event_id); correctness of the
    * pass-through requires every change ts ≥ the key's current
    * valid_from (true whenever changes postdate the dim snapshot — the
    * caller's contract). The q135 oracle is the strongest possible
    * check: incremental apply ≡ FULL REBUILD over the concatenated
    * history (q84's window, recomputed from scratch by DuckDB).
    */
  def applyScd2(dim: DataFrame, changes: DataFrame): DataFrame = {
    val out = Seq("user_id", "event_type", "value", "valid_from",
      "valid_to", "is_current").map(col)
    val touched = changes.select(col("user_id")).distinct()
    val closed = dim.filter(col("is_current") === 0)
    val untouchedCurrent = dim.filter(col("is_current") === 1)
      .join(touched, Seq("user_id"), "left_anti")
    val touchedCurrent = dim.filter(col("is_current") === 1)
      .join(touched, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from"), col("event_id"))
    val newRows = changes.select(col("user_id"), col("event_type"),
      col("value"), col("ts").as("valid_from"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    val rebuilt = touchedCurrent.unionByName(newRows)
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from"),
        lead(col("valid_from"), 1).over(w).as("valid_to"),
        lead(col("valid_from"), 1).over(w).isNull.cast("int")
          .as("is_current"))
    closed.select(out: _*)
      .unionByName(untouchedCurrent.select(out: _*))
      .unionByName(rebuilt.select(out: _*))
  }

  /** Q136: temperature-scaled mixture resampling — EXECUTE a data-mixture
    * plan by down-sampling over-represented groups: per-group keep rate
    * r_g ∝ w_g^(1/T) normalized so the largest weight keeps 100%
    * (T = 1 reproduces the weights; T → ∞ flattens toward uniform — the
    * multilingual-LM sampling-temperature device). Rates are computed
    * DRIVER-SIDE from the tiny weight map, floored to integer percents,
    * and embedded as plan literals; membership is the engine-portable
    * multiplicative hash ([[hashBucket]]) on doc_id, so the kept set is
    * deterministic, engine-independent, and reproducible — no RNG state,
    * and the same doc keeps/drops identically on any cluster. Map-only:
    * zero shuffles (the q49 sampling pattern, per-group rates).
    */
  /** The q136 rate table: w^(1/T) normalized to the max, floored to
    * integer percents. Public so the oracle builder derives its CASE
    * literals from the same arithmetic.
    */
  def temperatureRatePct(weights: Map[String, Double],
      temperature: Double): Map[String, Int] = {
    val pow = weights.view.mapValues(w =>
      math.pow(w, 1.0 / temperature)).toMap
    val mx = pow.values.max
    pow.view.mapValues(p => math.floor(100.0 * p / mx).toInt).toMap
  }

  def temperatureSample(docs: DataFrame, langCol: String, idCol: String,
      weights: Map[String, Double], temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be > 0: $temperature")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be positive: $weights")
    val ratePct = temperatureRatePct(weights, temperature)
    val rateCol = ratePct.foldLeft(lit(0)) { case (acc, (lang, pct)) =>
      when(col(langCol) === lang, lit(pct)).otherwise(acc)
    }
    docs
      .withColumn("rate_pct", rateCol)
      .withColumn("bucket", hashBucket(col(idCol)))
      .filter(col("bucket") < col("rate_pct"))
      .select(col(idCol), col(langCol), col("bucket").cast("long")
        .as("bucket"), col("rate_pct").cast("long").as("rate_pct"))
  }

  /** Q132: sliding-window document chunking — the RAG/embedding prep step
    * that turns each document into overlapping token-window chunks of
    * `chunkTokens` tokens advancing by `stride` (stride < chunkTokens ⇒
    * overlap). Output: (doc_id, chunk_idx, chunk_text, n_tokens), one row
    * per chunk, chunk 0 first; a document shorter than one window yields
    * exactly one (possibly short) chunk; an empty/whitespace doc yields
    * none.
    *
    * Scale design: tokenize → posexplode over the stride grid → slice +
    * rejoin is a MAP-ONLY expansion on the corpus scan (no shuffle, no
    * window function) — each input row expands to ceil(max(n−overlap,1)
    * / stride) output rows in place, so a 100 TB corpus chunks at scan
    * bandwidth. Contrast with the passage-dedup chunker (q108), which
    * fingerprints fixed NON-overlapping chunks for dedup — this one
    * preserves text for retrieval embedding.
    */
  def chunkDocuments(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int = 20, stride: Int = 10): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride ($stride) <= chunkTokens ($chunkTokens)")
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    // last window START (1-based): the largest stride-grid point not past
    // the end; windows fully inside a previous one are not re-emitted
    val lastStart = {
      val n = size(col("__toks"))
      (ceil((greatest(n - lit(chunkTokens), lit(0)).cast("double")) /
        stride) * stride + 1).cast("int")
    }
    docs
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), lastStart, lit(stride)),
          s => slice(col("__toks"), s, lit(chunkTokens)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** Q133: unigram-LM scoring — the perplexity-proxy quality signal: score
    * each document by the average surprisal of its tokens under the
    * corpus's OWN unigram distribution (self-scored ⇒ no OOV, no
    * smoothing): nll = −Σ log(c_tok/N) / n_tokens. Low-probability token
    * soup scores high; natural repeated-vocabulary text scores low — the
    * classic cheap stand-in for a real LM perplexity filter.
    *
    * Scale design: one aggregation builds the (token, count) table (the
    * only corpus-sized shuffle), the scalar N broadcasts, and the per-doc
    * score joins tokens→counts then re-aggregates by doc — both on
    * already-tokenized compact rows. Determinism: each token's surprisal
    * is rounded to the 1e-6 grid and summed EXACTLY (micros→decimal, the
    * decSum device), so the per-doc sum is partitioning- and
    * engine-order-independent; only log() itself must agree across
    * engines (it does — same IEEE doubles, cf. the q36 idf precedent).
    */
  def unigramSurprisal(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    val tokenized = docs.select(col(idCol), explode(toks).as("tok"))
    val counts = tokenized.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("N"))
    val surprisalMicros =
      round(-log(col("c").cast("double") / col("N").cast("double")) * 1e6)
        .cast("long")
    tokenized
      .join(counts, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(surprisalMicros.cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("sum_nll"))
      .withColumn("avg_nll", round(col("sum_nll") / col("n_tokens"), 6))
      .withColumn("sum_nll", round(col("sum_nll"), 6))
  }

  /** Q139: interpolated BIGRAM-LM scoring — the one-step-up sibling of
    * [[unigramSurprisal]]: each token after the first is scored by the
    * Jelinek-Mercer mixture λ·P(cur|prev) + (1−λ)·P(cur), the classic
    * backoff that keeps unseen-in-context tokens finite; the first token
    * (no context) scores by its unigram alone. Context probability is
    * P(cur|prev) = c2(prev,cur) / Σ_x c2(prev,x) — the denominator is
    * derived FROM the bigram table (occurrences of prev as a context),
    * so the distribution sums to exactly 1 per context.
    *
    * Scale design: two corpus-sized aggregations (unigram + bigram
    * counts, both map-side combinable) and the per-doc re-aggregate;
    * every probability join hits a VOCABULARY-bounded table (Heaps' law
    * — AQE broadcasts them when they fit, shuffles on their own keys
    * when not). Determinism follows q133's discipline exactly: per-token
    * surprisal rounds to the 1e-6 grid, sums as decimal micros (order-
    * independent), and the λ mixture is computed in IEEE double on both
    * engines (the oracle casts its literals to DOUBLE — DuckDB would
    * otherwise evaluate 1 − 0.7 in exact decimal and desync the grid
    * rounding of boundary terms).
    */
  def bigramSurprisal(docs: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.7): DataFrame = {
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    val base = docs.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
    val firsts = base.select(col(idCol), col("__toks").getItem(0).as("cur"))
    val bigrams = base
      .select(col(idCol), explode(zip_with(
        slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val c1 = docs.select(explode(toks).as("cur"))
      .groupBy(col("cur")).agg(count(lit(1)).as("c1"))
    val n = c1.agg(sum(col("c1")).as("N"))
    val c2 = bigrams.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c2"))
    val cf = c2.groupBy(col("prev")).agg(sum(col("c2")).as("cf"))
    val uniP = col("c1").cast("double") / col("N").cast("double")
    val firstTerms = firsts
      .join(c1, Seq("cur"))
      .crossJoin(broadcast(n))
      .select(col(idCol), round(-log(uniP) * 1e6).cast("long").as("mic"))
    val biTerms = bigrams
      .join(c2, Seq("prev", "cur"))
      .join(cf, Seq("prev"))
      .join(c1, Seq("cur"))
      .crossJoin(broadcast(n))
      .select(col(idCol), round(-log(
        lit(lambda) * (col("c2").cast("double") / col("cf").cast("double")) +
          (lit(1.0) - lit(lambda)) * uniP) * 1e6).cast("long").as("mic"))
    firstTerms.unionByName(biTerms)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("mic").cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("sum_nll"))
      .withColumn("avg_nll", round(col("sum_nll") / col("n_tokens"), 6))
      .withColumn("sum_nll", round(col("sum_nll"), 6))
  }

  /** Q140: CONTENT-DEFINED-CHUNK dedup statistics — chunk every document
    * at content-defined boundaries ([[graft.functions.CdcChunksExpr]]:
    * rolling-hash cut points, the rsync/LBFS device) and report, per
    * document, how many of its chunks also occur in OTHER documents.
    * This is the storage-dedup view of the corpus: fixed-stride chunks
    * (q132) lose all alignment after one insertion, while CDC chunks
    * re-align — so `shared_chunks` finds the shifted copies q108's
    * token-chunk passage dedup misses.
    *
    * Scale design: the chunk expansion is a map-only native kernel above
    * the id-repartitioned scan (single-row-group parallelism, cf.
    * charShingleSets); the document-frequency aggregate and the back-
    * join count on xxhash64(chunk) LONGS, so chunk text never shuffles
    * corpus-wide — one 8-byte-keyed exchange that the df aggregate and
    * the probe join share, exactly the q138 shape. The oracle groups on
    * the raw chunk text, so the engine's hash-collision budget is
    * audited by every run (q137 precedent).
    */
  def cdcDedupStats(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, modulus: Int = 64): DataFrame = {
    val occ = Hashing.repartitionForCompute(
      docs.select(col(idCol).as("id"), col(textCol).as("__txt")), "id")
      .select(col("id"), explode(graft.functions.CdcChunksExpr.cdcChunks(
        graft.operators.TextShingles.normalize(col("__txt")), k, modulus))
        .as("chunk"))
      .select(col("id"), xxhash64(col("chunk")).as("h"))
    val hashed = Hashing.repartitionForCompute(occ, "h")
    val dfTab = hashed
      .groupBy(col("h"))
      .agg(count_distinct(col("id")).as("df"))
    hashed
      .join(dfTab, Seq("h"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum((col("df") >= 2).cast("long")).as("shared_chunks"))
      .withColumnRenamed("id", idCol)
  }

  /** Q134: Z-ORDER clustering key — interleaves the low `bitsPerDim` bits
    * of two integer dimensions into one locality-preserving sort key, the
    * standard multi-dimensional data-layout device (Delta/Iceberg OPTIMIZE
    * ZORDER): writing a 100 TB fact table sorted by z(k1, k2) gives every
    * file a tight min-max envelope on BOTH dimensions, so per-file skipping
    * prunes scans filtered on either key — a single-column sort can only
    * serve one. The key is a pure bit-interleave (column expressions,
    * codegen'd, map-only); the demo query buckets lineitem by the top bits
    * of z(l_partkey, l_suppkey) and emits each bucket's count + per-dim
    * min/max envelope — integers only, so the oracle replays the formula
    * exactly.
    */
  def zorderKey(a: Column, b: Column, bitsPerDim: Int = 21): Column = {
    require(bitsPerDim > 0 && bitsPerDim <= 31, s"bitsPerDim: $bitsPerDim")
    (0 until bitsPerDim).map { i =>
      (shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) *
        lit(1L << (2 * i))) +
        (shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) *
          lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The q134 demo over [[zorderKey]]: bucket the key range
    * proportionally ((z·buckets) div (max_z+1) — integer-exact in any
    * engine, and adaptive to the keys' actual magnitude, where a fixed
    * top-bit shift would put every small-key row in bucket 0) and show
    * each bucket's min-max envelope on both dimensions — the per-file
    * skipping statistics a z-ordered 100 TB write would give the scan
    * planner. The scalar max broadcasts; the fact table aggregates once.
    */
  def zorderLayout(lineitem: DataFrame, buckets: Int = 64,
      bitsPerDim: Int = 21): DataFrame = {
    val zdf = lineitem.withColumn("z",
      zorderKey(col("l_partkey"), col("l_suppkey"), bitsPerDim))
    val mx = zdf.agg(max(col("z")).as("mz"))
    zdf.crossJoin(broadcast(mx))
      .withColumn("zbucket", expr(s"(z * $buckets) div (mz + 1)"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"),
        max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"),
        max(col("l_suppkey")).as("max_supp"))
  }

  /** Q153: the q134 layout demo on the HILBERT curve — same proportional
    * bucketing and per-bucket min-max envelopes, but keyed by
    * [[graft.functions.HilbertKeyExpr]] instead of the bit interleave.
    * Hilbert's unit-step property (consecutive keys are grid neighbors —
    * no z-curve seam jumps) tightens the per-file envelopes that drive
    * multi-dimensional scan skipping; the spec measures the improvement
    * against q134 directly. Same scale shape: one codegen'd key
    * expression, a broadcast scalar max, one aggregation.
    */
  def hilbertLayout(lineitem: DataFrame, buckets: Int = 64,
      bits: Int = 21): DataFrame = {
    val hdf = lineitem.withColumn("h",
      graft.functions.HilbertKeyExpr.hilbertKey(
        col("l_partkey"), col("l_suppkey"), bits))
    val mx = hdf.agg(max(col("h")).as("mh"))
    hdf.crossJoin(broadcast(mx))
      .withColumn("hbucket", expr(s"(h * $buckets) div (mh + 1)"))
      .groupBy(col("hbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"),
        max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"),
        max(col("l_suppkey")).as("max_supp"))
  }

  /** Per-(id, shard) rendezvous score — the q49 engine-reproducible
    * multiplicative-hash convention (Knuth constant, BIGINT-exact in any
    * engine): mix the shard index into the id with a large prime stride,
    * then scatter. Shared with the oracle builder.
    */
  private def hrwScore(id: Column, shard: Int): Column = {
    // bounded intermediates (no BIGINT overflow under ANSI): id is folded
    // to < 1e6 before the Knuth multiply, the product + shard stride is
    // folded to 32 bits, and the xor-fold breaks the multiply's
    // monotonicity — without it the argmax degenerates to "largest
    // pre-wrap shard" and the assignment is not a hash at all
    val x = pmod(pmod(id, lit(1000003L)) * lit(2654435761L) +
      lit(shard.toLong * 40503L), lit(4294967296L))
    pmod(x.bitwiseXOR(shiftright(x, 16)) * lit(49157L), lit(1048573L))
  }

  /** Q145: rendezvous (highest-random-weight) shard assignment — the
    * stable output-layout primitive of an INCREMENTALLY rebuilt dataset:
    * doc → argmax over shards of a per-(doc, shard) hash score. Unlike
    * `id mod N` (where changing N remaps ~everything, invalidating every
    * downstream cache/bucket), removing a shard under HRW moves ONLY the
    * documents that lived on the removed shard — ~1/N of the data — and
    * every other doc's assignment is provably unchanged (its argmax set
    * lost a non-winning candidate). The query emits assignments under
    * `numShards` and under `numShards−1` plus the `moved` flag; the
    * minimal-movement property is `moved ⟺ shard = numShards−1`, spec-
    * asserted and visible to the oracle. Map-only, zero shuffle: the
    * per-shard scores are `numShards` codegen'd integer expressions and
    * the argmax is one `greatest` over (score, shard-tiebreak) structs —
    * no explode, no per-row array. Tiebreak: smallest shard index
    * (encoded as the NEGATED index inside the max).
    */
  /** Q190: OUTPUT-FILE BIN PACKING — assign each document to a
    * fixed-budget output bin (the "compact to ~1 GB files" step every
    * corpus writer runs): per language, docs in id order fill bins of
    * `targetUnits` (bin = the doc's START offset div target, so a doc
    * never splits and bins overflow by at most one doc — the standard
    * streaming-fill contract).
    *
    * The interesting part is HOW the per-lang running offset is
    * computed at scale: the naive form is `sum(size) OVER (PARTITION BY
    * lang ORDER BY id)` — and a language is most of a corpus, so that
    * window is the same single-task global sort q169's replan removed.
    * This is the TWO-PASS RANGE-PARTITIONED form: (1) range-repartition
    * by (lang, id) and take each partition's per-lang PARTIAL sum — a
    * tiny (numPartitions × langs) table; (2) prefix-sum those partials
    * driver-side (bounded rows — the KMeansLite/sample discipline) and
    * broadcast-join the offsets back, adding a within-partition running
    * sum whose window is keyed by (partition id, lang) — every window
    * group is at most one partition's rows, so no task ever sorts more
    * than its partition. The FINAL cumulative value is independent of
    * where the range boundaries fall (prefix sums are associative), so
    * the result is partition-invariant — spec'd against the plain
    * global-window form.
    *
    * Works on any monotone size proxy (chars here; bytes in
    * production). Range-partitioner boundaries come from sampling, but
    * they only decide WHERE the partials split, never the result.
    */
  def packedFileBins(docs: DataFrame, langCol: String, idCol: String,
      sizeCol: String, targetUnits: Long = 100000L,
      numPartitions: Int = 32): DataFrame = {
    require(targetUnits >= 1 && numPartitions >= 1,
      s"bad params: target=$targetUnits parts=$numPartitions")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(langCol).as("lang"),
        col(idCol).cast("long").as("doc_id"),
        col(sizeCol).cast("long").as("sz"))
      .repartitionByRange(numPartitions, col("lang"), col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      // LOAD-BEARING determinism pin ([[Pinning]]): the range
      // partitioner samples, so a re-evaluation could draw different
      // boundaries — pass 1's collected partials and pass 2's rows must
      // see the SAME __pid assignment, i.e. the same materialized
      // shuffle output; reliable checkpoint when configured
      .transform(Pinning.pin(_))
    // pass 1: per-(partition, lang) partials — numPartitions × |langs|
    // rows, driver-bounded by construction
    val partials = base.groupBy(col("__pid"), col("lang"))
      .agg(sum(col("sz")).as("__psum"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets: Map[(Int, String), Long] = partials
      .groupBy(_._2).flatMap { case (lang, rows) =>
        val sorted = rows.sortBy(_._1)
        val prefix = sorted.scanLeft(0L)(_ + _._3)
        sorted.map(_._1).zip(prefix).map { case (pid, off) =>
          (pid, lang) -> off
        }
      }
    val offCol = {
      // bounded literal map: (pid, lang) -> offset of everything before
      val entries = offsets.toSeq.flatMap { case ((pid, lang), off) =>
        Seq(concat_ws("\u0000", lit(pid), lit(lang)), lit(off))
      }
      element_at(map(entries: _*),
        concat_ws("\u0000", col("__pid"), col("lang")))
    }
    // pass 2: within-partition running sum — window groups are at most
    // one range partition's rows, never a corpus-wide lang
    val w = Window.partitionBy(col("__pid"), col("lang"))
      .orderBy(col("doc_id"))
    base
      .withColumn("__cum", sum(col("sz")).over(w) + offCol)
      .select(col("lang"), col("doc_id"), col("sz"),
        expr(s"(__cum - sz) div ${targetUnits}L").as("bin"))
  }

  def rendezvousShards(docs: DataFrame, idCol: String,
      numShards: Int = 16): DataFrame = {
    require(numShards >= 2, s"numShards: $numShards")
    def argmax(n: Int): Column = if (n == 1) lit(0) else {
      val best = greatest((0 until n).map(s =>
        struct(hrwScore(col(idCol), s).as("sc"), lit(-s).as("ns"))): _*)
      (-best.getField("ns")).cast("int")
    }
    docs.select(col(idCol).as("doc_id"),
        argmax(numShards).as("shard"),
        argmax(numShards - 1).as("shard_after_removal"))
      .withColumn("moved",
        (col("shard") =!= col("shard_after_removal")).cast("int"))
  }

  /** Q151: DSIR importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023) — score
    * every raw document by how target-like its hashed n-gram feature
    * distribution is: weight(doc) = Σ_tokens log(p_target(bucket) /
    * p_raw(bucket)), with unigram features hashed into `buckets` bins and
    * add-α smoothing on both distributions. Documents with high weight
    * resemble the target domain (here: the `targetLang` slice standing in
    * for "high-quality reference corpus"); resampling by weight is the
    * DSIR selection step.
    *
    * Scale design: the feature distributions are one map-side-combinable
    * aggregation over hashed tokens to a FIXED `buckets`-sized table;
    * the per-bucket log-ratio table (≤ buckets rows) broadcasts back onto
    * the token stream (map-only probe), and only (doc, micros) pairs
    * shuffle for the per-doc sum. Determinism follows q133's grid
    * discipline: each bucket's log-ratio is rounded to the 1e-6 grid once
    * (one log per BUCKET, not per token), summed exactly as decimal
    * micros — partition-order- and engine-independent. The bucket hash is
    * the engine-reproducible base-31 polynomial
    * ([[graft.functions.PolyHashExprs]]), so the oracle rebuilds the
    * identical buckets.
    */
  def dsirWeights(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, targetLang: String = "en", buckets: Int = 1024,
      alpha: Double = 0.5): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      explode(filter(
        split(TextShingles.normalize(coalesce(col(textCol), lit(""))), " "),
        t => t =!= "")).as("tok"))
    // ONE corpus-sized pass: reduce the token stream to per-(doc, bucket)
    // counts immediately (map-side combinable), then MATERIALIZE the
    // reduced table (lazy localCheckpoint, the PPJoin-prefix device) so
    // its three consumers — raw distribution, target distribution,
    // per-doc scorer — share one scan. ReuseExchange alone cannot unify
    // them: Catalyst pushes the lang filter BELOW the aggregation for
    // the target branch and prunes lang out of the raw branch, so the
    // three subtrees differ and each would re-read the corpus. The
    // checkpointed table is docs × ≤buckets rows — at 100 TB, a
    // persisted intermediate dataset, not a cache crutch.
    val db = toks.select(col("doc_id"), col("lang"),
      pmod(graft.functions.PolyHashExprs.polyHash(col("tok")),
        lit(buckets.toLong)).as("bkt"))
      .groupBy(col("doc_id"), col("lang"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val raw = db.groupBy(col("bkt")).agg(sum(col("c")).as("rc"))
    val tgt = db.filter(col("lang") === targetLang)
      .groupBy(col("bkt")).agg(sum(col("c")).as("tc"))
    val dist = raw.join(tgt, Seq("bkt"), "left_outer")
      .select(col("bkt"), col("rc"), coalesce(col("tc"), lit(0L)).as("tc"))
    val totals = dist.agg(sum(col("rc")).as("R"), sum(col("tc")).as("T"))
    val lr = dist.crossJoin(broadcast(totals))
      .select(col("bkt"),
        round(log(
          ((col("tc").cast("double") + lit(alpha)) /
            (col("T").cast("double") + lit(alpha * buckets))) /
          ((col("rc").cast("double") + lit(alpha)) /
            (col("R").cast("double") + lit(alpha * buckets)))) * 1e6)
          .cast("long").as("lr6"))
    // c·lr6 stays far inside long range (c ≤ doc tokens, |lr6| ≤ ~2e7);
    // the decimal sum keeps the per-doc total exact and order-independent
    db.join(broadcast(lr), Seq("bkt"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        (sum((col("c") * col("lr6")).cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("weight"))
      .withColumn("weight", round(col("weight"), 6))
  }

  /** Q159: STUPID-BACKOFF TRIGRAM-LM scoring of a HELD-OUT split — the
    * top of the q133→q139 LM ladder and the first member where backoff
    * is actually live: q133/q139 self-score the corpus, so every n-gram
    * they look up exists by construction; here counts come from the
    * TRAIN split (`doc_id % holdMod != holdRem`, the q49/q141 split
    * convention) and the HELD-OUT docs are scored against them, so
    * unseen trigrams/bigrams/unigrams all occur and the Brants et al.
    * 2007 "stupid backoff" chain S₃ = c₃/cf₂ | α·S₂, S₂ = c₂/cf₁ | α·S₁
    * does real work. S₁ is add-one smoothed ((c₁+1)/(N+V)) so the chain
    * terminates finitely on OOV tokens; position 1 scores by S₁,
    * position 2 by S₂, the rest by S₃ — exactly the score a distributed
    * KenLM-style perplexity filter computes per document.
    *
    * Scale design: the count tables (c1/c2/c3 + their context sums) are
    * n-gram-VOCABULARY-bounded (Heaps' law), built by map-side-combinable
    * aggregations over the train split; the held-out side explodes
    * (cur, prev, prev2) once and left-joins the count tables — AQE
    * broadcasts each that fits, shuffles on its own gram key when not.
    * The scalar (N, V) pair broadcasts. Per-token surprisal rounds to
    * the 1e-6 grid and sums as exact decimal micros (q133 discipline):
    * partition- and engine-order-independent; only ln() and the IEEE
    * double chain must agree across engines, and the backoff products
    * associate identically because the oracle mirrors this exact CASE
    * nesting (α literals cast to DOUBLE there — the q139 lesson).
    */
  /** Q235: INTERPOLATED KNESER-NEY bigram surprisal (Kneser & Ney
    * 1995; Chen & Goodman 1999's interpolated form) — the canonical LM
    * smoothing, completing the family next to add-one unigram (q133),
    * bigram (q139) and stupid-backoff trigram (q159) surprisal:
    * {{{ P(w|u) = max(c(u,w)−D, 0)/c(u) + D·N1+(u·)/c(u) · Pcont(w) }}}
    * with the continuation probability Pcont(w) = (N1+(·w)+1)/(B+V)
    * (add-one so held-out-only words stay finite; B = bigram types,
    * V = train vocab), D = 0.75 fixed. Doc starts and unseen contexts
    * fall back to Pcont.
    *
    * Determinism: every count is an exact BIGINT; each token's
    * probability is ONE literal-mirrored double chain rounded to the
    * 1e-6 micro grid (the q159 shell), so per-doc sums are exact
    * DECIMAL sums of micro units.
    *
    * Scale: three map-side-combinable count aggregations over the
    * train split (bigram/context/continuation — each vocabulary²-
    * bounded, never corpus-bounded), two 1-row broadcast totals, and
    * one scoring join per held-out token. No windows, no driver data.
    */
  def kneserNeySurprisal(docs: DataFrame, textCol: String,
      idCol: String, holdMod: Int = 10, holdRem: Int = 7,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount out of range: $discount")
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    val isHeld = pmod(col(idCol), lit(holdMod)) === lit(holdRem)
    val trainT = docs.filter(!isHeld)
      .select(toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(posexplode(col("__toks")).as(Seq("pos", "cur")),
        col("__toks"))
      .select(col("cur"),
        when(col("pos") >= 1, element_at(col("__toks"), col("pos")))
          .as("p1"))
    val bg = trainT.filter(col("p1").isNotNull)
      .groupBy(col("p1"), col("cur")).agg(count(lit(1)).as("c2"))
    val ctx = bg.groupBy(col("p1"))
      .agg(sum(col("c2")).as("cu"), count(lit(1)).as("n1f"))
    val contw = bg.groupBy(col("cur")).agg(count(lit(1)).as("nb"))
    val bTot = bg.agg(count(lit(1)).as("B"))
    val vTot = trainT.select(col("cur")).distinct()
      .agg(count(lit(1)).as("V"))
    val held = docs.filter(isHeld)
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("pos", "cur")))
      .select(col(idCol), col("pos"), col("cur"),
        when(col("pos") >= 1, element_at(col("__toks"), col("pos")))
          .as("p1"))
    val pc = (coalesce(col("nb"), lit(0L)) + lit(1L)).cast("double") /
      (col("B") + col("V")).cast("double")
    val s2 = greatest(coalesce(col("c2"), lit(0L)).cast("double") -
        lit(discount), lit(0.0)) / col("cu").cast("double") +
      lit(discount) * col("n1f").cast("double") /
        col("cu").cast("double") * pc
    val s = when(col("pos") === 0, pc)
      .when(col("cu").isNotNull, s2)
      .otherwise(pc)
    held
      .join(bg, Seq("p1", "cur"), "left")
      .join(ctx, Seq("p1"), "left")
      .join(contw, Seq("cur"), "left")
      .crossJoin(broadcast(bTot))
      .crossJoin(broadcast(vTot))
      .select(col(idCol), round(-log(s) * 1e6).cast("long").as("mic"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("mic").cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("sum_nll"))
      .withColumn("avg_nll", round(col("sum_nll") / col("n_tokens"), 6))
      .withColumn("sum_nll", round(col("sum_nll"), 6))
  }

  def trigramBackoffSurprisal(docs: DataFrame, textCol: String,
      idCol: String, holdMod: Int = 10, holdRem: Int = 7,
      alpha: Double = 0.4): DataFrame = {
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    val isHeld = pmod(col(idCol), lit(holdMod)) === lit(holdRem)
    val trainT = docs.filter(!isHeld)
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("pos", "cur")))
      .select(col("cur"),
        when(col("pos") >= 1, element_at(col("__toks"), col("pos")))
          .as("p1"),
        when(col("pos") >= 2, element_at(col("__toks"), col("pos") - 1))
          .as("p2"))
    val c1 = trainT.groupBy(col("cur")).agg(count(lit(1)).as("c1"))
    val nv = c1.agg(sum(col("c1")).as("N"), count(lit(1)).as("V"))
    val c2 = trainT.filter(col("p1").isNotNull)
      .groupBy(col("p1"), col("cur")).agg(count(lit(1)).as("c2"))
    val cf1 = c2.groupBy(col("p1")).agg(sum(col("c2")).as("cf1"))
    val c3 = trainT.filter(col("p2").isNotNull)
      .groupBy(col("p2"), col("p1"), col("cur"))
      .agg(count(lit(1)).as("c3"))
    val cf2 = c3.groupBy(col("p2"), col("p1")).agg(sum(col("c3")).as("cf2"))
    val held = docs.filter(isHeld)
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("pos", "cur")))
      .select(col(idCol), col("pos"), col("cur"),
        when(col("pos") >= 1, element_at(col("__toks"), col("pos")))
          .as("p1"),
        when(col("pos") >= 2, element_at(col("__toks"), col("pos") - 1))
          .as("p2"))
    val s1 = (coalesce(col("c1"), lit(0L)) + lit(1L)).cast("double") /
      (col("N") + col("V")).cast("double")
    val s2 = when(col("c2").isNotNull,
      col("c2").cast("double") / col("cf1").cast("double"))
      .otherwise(lit(alpha) * s1)
    val s3 = when(col("c3").isNotNull,
      col("c3").cast("double") / col("cf2").cast("double"))
      .otherwise(lit(alpha) * s2)
    val s = when(col("pos") === 0, s1)
      .when(col("pos") === 1, s2)
      .otherwise(s3)
    held
      .join(c1, Seq("cur"), "left")
      .join(c2, Seq("p1", "cur"), "left")
      .join(cf1, Seq("p1"), "left")
      .join(c3, Seq("p2", "p1", "cur"), "left")
      .join(cf2, Seq("p2", "p1"), "left")
      .crossJoin(broadcast(nv))
      .select(col(idCol),
        round(-log(s) * 1e6).cast("long").as("mic"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("mic").cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("sum_nll"))
      .withColumn("avg_nll", round(col("sum_nll") / col("n_tokens"), 6))
      .withColumn("sum_nll", round(col("sum_nll"), 6))
  }

  /** Q171: INCREMENTAL AGGREGATE maintenance — refresh a materialized
    * per-(user, event_type) daily-rollup from a CHANGE BATCH without
    * touching history: the q135 discipline applied to aggregates instead
    * of dimension rows. The previous aggregate snapshot (built from days
    * < `cutoverDay`) full-outer-merges with the delta batch's own
    * aggregate — counts add, sums add (decimal-exact micros), last_ts
    * takes the max — so work is O(|snapshot keys| + |delta|), never a
    * rescan of the full fact history. On a 100 TB events table with a
    * daily feed, that is the difference between a merge and a rebuild.
    *
    * Additivity is the whole contract: every maintained measure must be
    * a commutative monoid (count, micro-sum, max). Non-additive measures
    * (exact medians) need the full rebuild this operator exists to
    * avoid — which is exactly why the ORACLE here is the full rebuild
    * over ALL days (the q135 strongest-oracle trick): any merge bug,
    * lost key, or double-counted delta desyncs it.
    */
  def incrementalDailyAgg(events: DataFrame,
      cutoverDay: Int = 25): DataFrame = {
    def agg(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 1e6).cast("decimal(18,0)")).as("vmic"),
          max(unix_micros(col("ts"))).as("last_us"))
    val prev = agg(events.filter(dayofmonth(col("ts")) < cutoverDay))
    val delta = agg(events.filter(dayofmonth(col("ts")) >= cutoverDay))
    prev.select(col("user_id"), col("event_type"), col("n").as("n_a"),
        col("vmic").as("v_a"), col("last_us").as("t_a"))
      .join(delta.select(col("user_id"), col("event_type"),
        col("n").as("n_b"), col("vmic").as("v_b"), col("last_us").as("t_b")),
        Seq("user_id", "event_type"), "full_outer")
      .select(col("user_id"), col("event_type"),
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L)))
          .as("n_events"),
        ((coalesce(col("v_a"), lit(0L).cast("decimal(18,0)")) +
          coalesce(col("v_b"), lit(0L).cast("decimal(18,0)"))) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("sum_value"),
        greatest(coalesce(col("t_a"), lit(Long.MinValue)),
          coalesce(col("t_b"), lit(Long.MinValue))).as("last_us"))
      .withColumn("sum_value", round(col("sum_value"), 6))
  }

  /** Q172: EXACT-SIZE proportional holdout — select exactly `totalK`
    * rows, allocated across strata by the largest-remainder method
    * (Hamilton apportionment): k_i = ⌊n_i·K/N⌋, then the K − Σ⌊·⌋
    * leftover seats go to the strata with the largest integer
    * remainders n_i·K − k_i·N (ties by stratum name). Per-stratum rate
    * sampling (q56) cannot do this: independent rounding drifts the
    * global size by ±|strata| rows, and an eval set that is "about 1%"
    * is not a budget. Membership within each stratum follows the q165
    * hash order (reproducible, partition-invariant, rand()-free).
    *
    * Everything is INTEGER arithmetic — quotas, remainders, seat ranks —
    * so both engines allocate identical k_i and select identical rows.
    * Scale: two windows over the STRATA-BOUNDED count table (seat
    * assignment), one scalar broadcast, and one per-stratum ranked
    * top-k_i over the corpus (the only corpus-sized work).
    */
  def proportionalHoldout(docs: DataFrame, idCol: String,
      stratumCol: String, totalK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(totalK >= 1, s"totalK must be >= 1, got $totalK")
    val cnt = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    // "nt", not "N": Spark resolves case-insensitively by default, so a
    // column named N is ambiguous against n
    val tot = cnt.agg(sum(col("n")).as("nt"))
    val quota = cnt.crossJoin(broadcast(tot))
      .withColumn("k0", expr(s"(n * $totalK) div nt"))
      .withColumn("rem", col("n") * lit(totalK.toLong) - col("k0") * col("nt"))
    val spare = quota.agg((lit(totalK.toLong) - sum(col("k0"))).as("R"))
    // strata-bounded global windows (seat ranking over |strata| rows)
    val seatW = Window.orderBy(col("rem").desc, col(stratumCol))
    val alloc = quota.crossJoin(broadcast(spare))
      .withColumn("seat", row_number().over(seatW))
      .select(col(stratumCol), col("n").as("n_stratum"),
        (col("k0") + (col("seat") <= col("R")).cast("long")).as("k_alloc"))
    val h = {
      val guarded = when(col(idCol) < 0, raise_error(
        concat(lit("proportionalHoldout: negative id "),
          col(idCol).cast("string"))))
        .otherwise(col(idCol))
      shiftright(pmod(guarded, lit(1000003L)) * lit(2654435761L), 16)
    }
    val selW = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(idCol))
    docs.select(col(stratumCol), col(idCol), h.as("__h"))
      .join(alloc, Seq(stratumCol))
      .withColumn("sel_rank", row_number().over(selW).cast("long"))
      .filter(col("sel_rank") <= col("k_alloc"))
      .select(col(stratumCol), col(idCol), col("sel_rank"),
        col("n_stratum"), col("k_alloc"))
  }

  /** Q165: WEIGHTED sampling without replacement, k per stratum — the
    * Efraimidis–Spirakis A-ES scheme (IPL 2006): each record draws a key
    * ln(u)/w from a uniform u and its weight w, and the k LARGEST keys
    * per stratum are exactly a weight-proportional without-replacement
    * sample. This is the quality-weighted subsampler a curation pipeline
    * uses where [[stratifiedSample]]'s flat per-stratum rates can't
    * prefer better documents: here w = n_chars + 1 (longer docs
    * proportionally likelier; +1 keeps empty docs drawable).
    *
    * Determinism: u comes from the repo's engine-portable multiplicative
    * hash on the id ([[hashBucket]]'s device widened to 2²⁰ buckets,
    * +1/(M+1) so u ∈ (0,1] and ln is finite) — NOT `rand()`, whose
    * output depends on partitioning. The key needs only ln and one
    * division (IEEE-identical across engines, q36/q133 precedent), and
    * ties break by id, so the sample is reproducible, auditable, and
    * engine-exact — the properties that make hash sampling the
    * production device.
    *
    * Scale: the key is a map-only expression; per-stratum top-k is the
    * one shuffle (TakeOrdered-class work; a windowed rank here since k
    * rows per stratum are tiny). No global sort, no driver data.
    */
  def weightedSample(docs: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val m = 1048576L // 2^20
    val guarded = when(col(idCol) < 0, raise_error(
      concat(lit("weightedSample: negative id "), col(idCol).cast("string"),
        lit(" — the hash is not engine-portable for negative ids"))))
      .otherwise(col(idCol))
    val h = shiftright(pmod(guarded, lit(1000003L)) * lit(2654435761L), 16)
    val u = (pmod(h, lit(m)) + lit(1L)).cast("double") /
      lit((m + 1).toDouble)
    val key = log(u) / (col(weightCol) + lit(1L)).cast("double")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("es_key").desc, col(idCol))
    docs
      .select(col(stratumCol), col(idCol), col(weightCol), key.as("es_key"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("es_key", round(col("es_key"), 6))
  }

  /** Q221: CURRICULUM TRAINING ORDER — a deterministic easy-to-hard,
    * stratum-interleaved position for every document: within each
    * stratum documents rank by (difficulty asc, id), and the global
    * position is `rank · |strata| + stratum_index`, which walks strata
    * round-robin while difficulty rises — the epoch-order generator a
    * curriculum run consumes instead of a seeded shuffle (auditable,
    * stable under re-runs and re-partitioning; positions of unequal
    * strata leave gaps, which is harmless for ORDER BY consumption).
    *
    * Scale: the per-stratum rank window partitions BY STRATUM (the
    * corpus-sized frame never funnels through one task); the stratum
    * index table is one row per stratum (window over an aggregate,
    * PlanSpec-enrolled) and broadcasts.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, stratumCol: String,
      difficultyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rankW = Window.partitionBy(col(stratumCol))
      .orderBy(col(difficultyCol), col(idCol))
    val sidxW = Window.orderBy(col(stratumCol))
    val strata = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .select(col(stratumCol),
        (row_number().over(sidxW) - 1).cast("long").as("sidx"))
      .crossJoin(broadcast(
        docs.select(col(stratumCol)).distinct().agg(
          count(lit(1)).as("n_strata"))))
    docs.select(col(idCol), col(stratumCol),
        (row_number().over(rankW) - 1).cast("long").as("rank_in_stratum"))
      .join(broadcast(strata), Seq(stratumCol))
      .select(col(idCol), col(stratumCol), col("rank_in_stratum"),
        (col("rank_in_stratum") * col("n_strata") + col("sidx"))
          .as("position"))
  }
}
