package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a declared operator from SURVEY §2; entries
  * with a matching key in [[oracleSql]] are hash-checked against DuckDB
  * running that SQL over the same parquet tables (column names must match —
  * both sides alias identically).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventJoins.clickedDisplays(Tables.events(spark, "/root/testdata/sf0.001"), "1 HOUR")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_clicked_display" -> ((s, dir) =>
      EventJoins.clickedDisplays(Tables.events(s, dir), "1 HOUR")),
    "q2_missed_display" -> ((s, dir) =>
      EventJoins.missedDisplays(Tables.events(s, dir), "1 HOUR")),
    "q3_time_shift" -> ((s, dir) =>
      EventJoins.timeShift(Tables.events(s, dir), "ts", "1 HOUR", "events", "1h")),
    "q4_join_merge_json" -> ((s, dir) =>
      EventJoins.joinMergeJson(Tables.events(s, dir), "1 HOUR")),
    "q5_view_outcomes" -> ((s, dir) =>
      EventJoins.viewOutcomes(Tables.events(s, dir), "1 HOUR")),
    "q6_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "text", "doc_id", Seq("lang", "n_chars"))),
    "q7_similarity_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), 10)
    }),
    "q8_text_stats" -> ((s, dir) =>
      TextAnalysis.langStats(Tables.documents(s, dir))),
    "q9_multimodal_join" -> ((s, dir) =>
      Multimodal.multimodalJoin(Tables.documents(s, dir), Tables.embeddings(s, dir))),
    // --- training-pipeline extensions (SQL-oracled where expressible) ---
    // q10/q11 validated forms (q29 pattern): exact near-dup pairs are the
    // DuckDB-oracled rows; recall_ok pins the LSH operator in-band. The
    // raw operators (minhashNearDups / simhashNearDups) stay the
    // production surface, spec-pinned in DedupSpec.
    "q10_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashValidated(Tables.documents(s, dir), "text", "doc_id",
        shingleK = 5, numHashes = 64, bands = 16, threshold = 0.7,
        recallFloor = 0.9)),
    "q11_dedup_simhash" -> ((s, dir) =>
      // measured recall: 0.72 (sf0.01) / 0.73 (sf0.1) — floor 0.6. The
      // exact pair set is threshold-insensitive on this corpus (identical
      // across [0.5, 0.9]: near-dups sit far above, non-dups far below),
      // so the gate runs at 0.7 where the PPJoin prefixes are smallest.
      Dedup.simhashValidated(Tables.documents(s, dir), "text", "doc_id",
        maxDist = 3, shingleK = 5, exactThreshold = 0.7, recallFloor = 0.6)),
    "q12_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "text", "doc_id", "lang",
        n = 3, threshold = 0.5)),
    "q13_text_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir), "text", "doc_id")),
    "q14_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(Tables.documents(s, dir), "text", "doc_id")),
    "q15_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        org.apache.spark.sql.functions.col("doc_id"),
        TextAnalysis.fingerprint(org.apache.spark.sql.functions.col("text")).as("fp"))),
    "q16_media_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(s,
        Multimodal.withMediaColumn(Tables.documents(s, dir))).toDF()),
    // q17 validated form (q29 pattern): exact brute-force top-k rows are
    // the DuckDB-oracled output; recall_ok pins lshTopK in-band.
    "q17_similarity_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // measured recall@10: 0.86 (sf0.01) / 0.90 (sf0.1) — floor 0.8
      Similarity.lshTopKValidated(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), 10,
        dim = 64, bits = 4, tables = 16, recallFloor = 0.8)
    }),
    // --- relational coverage (SURVEY §2.2 categories Spark adds) ---
    "q19_disjunctive_revenue" -> ((s, dir) =>
      Relational.disjunctiveBracketRevenue(Tables.lineitem(s, dir),
        Tables.part(s, dir))),
    "q20_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(Tables.lineitem(s, dir))),
    "q21_revenue_by_nation" -> ((s, dir) =>
      Relational.revenueByNation(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    "q22_supplier_monthly" -> ((s, dir) =>
      Relational.supplierMonthly(Tables.lineitem(s, dir))),
    "q23_returns_rollup" -> ((s, dir) =>
      Relational.returnsRollup(Tables.lineitem(s, dir))),
    "q24_view_click_sets" -> ((s, dir) =>
      Relational.viewClickSets(Tables.events(s, dir))),
    "q25_customers_no_orders" -> ((s, dir) =>
      Relational.customersWithoutOrders(Tables.customer(s, dir), Tables.orders(s, dir),
        minPrice = 300000.0)),
    "q26_top_orders" -> ((s, dir) =>
      Relational.topOrders(Tables.orders(s, dir), 20)),
    "q27_distinct_users" -> ((s, dir) =>
      Relational.distinctUsers(Tables.events(s, dir))),
    "q28_daily_windows" -> ((s, dir) =>
      Relational.dailyEventCounts(Tables.events(s, dir))),
    // q29 validated form: deterministic columns + in-band flag are oracled;
    // the raw-estimate operator (approxDistinctUsers) stays spec-pinned
    "q29_approx_distinct" -> ((s, dir) =>
      Relational.approxDistinctValidated(Tables.events(s, dir))),
    "q30_json_extract" -> ((s, dir) =>
      JsonOps.propsStats(Tables.events(s, dir))),
    "q31_json_render" -> ((s, dir) =>
      JsonOps.joinMergeStructJson(Tables.events(s, dir), "1 HOUR")),
    // q32 validated form (q29 pattern): exact brute-force top-k rows are
    // the DuckDB-oracled output; recall_ok pins ivfTopK (kmeans quantizer,
    // nProbe=4 of 16 cells — recall floor set from the measured operating
    // point; the distributional assert stays in SimilaritySpec).
    "q32_similarity_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // measured recall@10: 0.49 (sf0.01) / 0.51 (sf0.1) at nProbe=4 of 16
      // cells (the 25%-of-index scale trade) — floor 0.4
      Similarity.ivfTopKValidated(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), 10,
        nCentroids = 16, nProbe = 4, recallFloor = 0.4)
    }),
    // --- round-2 additions: point-in-time / session / range-join surface ---
    "q33_click_attribution" -> ((s, dir) =>
      EventJoins.clickAttribution(Tables.events(s, dir), "1 HOUR")),
    "q34_sessions" -> ((s, dir) =>
      Relational.sessionize(Tables.events(s, dir), "30 minutes")),
    "q35_price_bands" -> ((s, dir) =>
      Relational.ordersByPriceBand(s, Tables.orders(s, dir))),
    "q36_tfidf_terms" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "text", "doc_id", k = 3)),
    "q37_value_percentiles" -> ((s, dir) =>
      Relational.valuePercentiles(Tables.events(s, dir))),
    "q41_order_price_ranks" -> ((s, dir) =>
      Relational.orderPriceRanks(Tables.orders(s, dir))),
    "q42_top_terms_per_lang" -> ((s, dir) =>
      TextAnalysis.topTermsPerLang(Tables.documents(s, dir), k = 5)),
    "q43_orders_profile" -> ((s, dir) =>
      Relational.ordersProfile(Tables.orders(s, dir))),
    // q44 validated form: per-probe exact counts + CMS-contract flag are
    // oracled; the raw-sketch operator (userActivitySketch) stays spec-pinned
    "q44_activity_sketch" -> ((s, dir) =>
      Relational.cmsProbesValidated(Tables.events(s, dir))),
    "q40_clean_corpus" -> ((s, dir) =>
      Pipelines.cleanCorpusStats(Tables.documents(s, dir))),
    "q45_media_resize" -> ((s, dir) =>
      Multimodal.resize(s,
        Multimodal.withMediaColumn(Tables.documents(s, dir)), w = 8, h = 8)
        .toDF()
        .select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("pixels")).cast("int").as("n_px"),
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("pixels")).as("px_md5"))),
    "q39_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(s,
        Multimodal.withMediaColumn(Tables.documents(s, dir)), frameBytes = 64, every = 2)
        .toDF()
        .select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("frame_idx"),
          org.apache.spark.sql.functions.col("offset"),
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("data")).as("frame_md5"))),
    "q38_embedding_quant" -> ((s, dir) =>
      Tables.embeddings(s, dir).select(
        org.apache.spark.sql.functions.col("vec_id"),
        graft.functions.QuantizeExprs.quantizeStats(
          org.apache.spark.sql.functions.col("embedding")).as("st"))
        .select(
          org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("st").getItem(0).as("scale"),
          org.apache.spark.sql.functions.col("st").getItem(1).as("max_abs_err"),
          org.apache.spark.sql.functions.col("st").getItem(2).as("mse"))),
    // --- round-3 additions: corpus QA / PII / ingestion / splitting ---
    "q46_quality_rules" -> ((s, dir) =>
      TextAnalysis.qualityRules(Tables.documents(s, dir), "text", "doc_id")),
    "q47_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(Tables.documents(s, dir), "text", "doc_id")),
    "q48_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val even = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      val odd = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
      Dedup.incrementalExact(even, odd, "text", "doc_id", Seq("lang", "n_chars"))
    }),
    "q49_train_split" -> ((s, dir) =>
      Pipelines.trainSplit(Tables.documents(s, dir), "doc_id")),
    "q50_orc_roundtrip" -> ((s, dir) =>
      graft.sources.ColumnarFormats.orcRoundTripStats(s, Tables.documents(s, dir),
        s"/tmp/graft_orc_${dir.replaceAll("[^A-Za-z0-9]", "_")}")),
    "q51_bloom_semi_join" -> ((s, dir) =>
      RuntimeFilters.urgentLineitemSummary(Tables.lineitem(s, dir), Tables.orders(s, dir))),
    "q52_event_pivot" -> ((s, dir) =>
      Relational.eventTypePivot(Tables.events(s, dir))),
    "q53_price_distribution" -> ((s, dir) =>
      Relational.orderPriceDistribution(Tables.orders(s, dir))),
    "q54_token_positions" -> ((s, dir) =>
      TextAnalysis.tokenPositions(Tables.documents(s, dir), "text", "doc_id")),
    "q55_dedup_clusters" -> ((s, dir) =>
      Dedup.clusterPairs(
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), "text", "doc_id", "lang",
          n = 3, threshold = 0.5),
        "doc_a", "doc_b")),
    "q56_stratified_sample" -> ((s, dir) =>
      Pipelines.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
          ratesPct = Map("en" -> 50, "de" -> 30, "fr" -> 20, "es" -> 10), defaultPct = 100)
        .select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.col("n_chars"))),
    "q57_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(Tables.embeddings(s, dir))),
    "q58_moving_average" -> ((s, dir) =>
      Relational.dailyRevenueMovingAvg(Tables.orders(s, dir))),
    "q59_bpe_tokens" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Tables.documents(s, dir).select(
        f.col("doc_id"),
        TextAnalysis.tokenCount(f.col("text")).as("n_ws"),
        TextAnalysis.bpeTokenCount(f.col("text")).as("n_bpe"),
        f.round(TextAnalysis.bpeTokenCount(f.col("text")).cast("double") /
          f.greatest(TextAnalysis.tokenCount(f.col("text")).cast("double"), f.lit(1.0)), 6)
          .as("bpe_per_word"))
    }),
    "q60_price_histogram" -> ((s, dir) =>
      Relational.priceHistogram(Tables.orders(s, dir))),
    // q62: the correlated-LATERAL surface — exercised through spark.sql on
    // the session catalog (Catalyst decorrelates the per-row TOP-1 subquery
    // into a join; the DataFrame-API formulation of the same result is
    // q26/q41's window path).
    "q62_top_order_lateral" -> ((s, dir) => {
      Catalog.registerTables(s, dir)
      s.sql(
        """SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
          |       t.o_orderkey AS o_orderkey, t.o_totalprice AS o_totalprice
          |FROM customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t""".stripMargin)
    }),
    "q63_returns_cube" -> ((s, dir) =>
      Relational.returnsCube(Tables.lineitem(s, dir))),
    "q64_props_map" -> ((s, dir) =>
      JsonOps.propsMapStats(Tables.events(s, dir))),
    "q65_user_active_days" -> ((s, dir) =>
      Relational.userActiveDays(Tables.events(s, dir))),
    "q66_funnel" -> ((s, dir) =>
      Relational.funnelStages(Tables.events(s, dir))),
    "q67_view_click_outer" -> ((s, dir) =>
      Relational.viewClickOuter(Tables.events(s, dir))),
    "q68_upsert" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val o = Tables.orders(s, dir)
      val updates = o.filter(f.col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", f.col("o_totalprice") * 1.1)
      val inserts = o.filter(f.col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", f.col("o_orderkey") + 10000000L)
      Relational.upsert(o, updates.unionByName(inserts), "o_orderkey")
    }),
    // --- round-4 additions: corpus integrity + behavioral analytics ---
    "q69_contamination" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val d = Tables.documents(s, dir)
      Contamination.ngramOverlapPairs(
        d.filter(f.pmod(f.col("doc_id"), f.lit(10)) =!= 7),
        d.filter(f.pmod(f.col("doc_id"), f.lit(10)) === 7),
        "text", "doc_id", n = 4, minShared = 2)
    }),
    "q70_nfc_normalize" -> ((s, dir) =>
      TextAnalysis.normalizeUnicode(Tables.documents(s, dir), "text", "doc_id")),
    "q71_cohort_retention" -> ((s, dir) =>
      Relational.cohortRetention(Tables.events(s, dir))),
    "q72_event_transitions" -> ((s, dir) =>
      Relational.eventTransitions(Tables.events(s, dir))),
    "q73_heavy_tokens" -> ((s, dir) =>
      TextAnalysis.heavyTokens(Tables.documents(s, dir), "text", relThreshold = 0.002)),
    "q74_sentence_stats" -> ((s, dir) =>
      TextAnalysis.sentenceStats(Tables.documents(s, dir), "text", "doc_id")),
    "q75_domain_counts" -> ((s, dir) =>
      TextAnalysis.domainCounts(Tables.documents(s, dir), "text", "doc_id")),
    "q76_group_sample" -> ((s, dir) =>
      Pipelines.groupSample(Tables.documents(s, dir), "doc_id", "lang",
        k = 10, prefilterPct = 20)),
    "q77_bigram_pmi" -> ((s, dir) =>
      TextAnalysis.bigramPmi(Tables.documents(s, dir), "text", minCount = 5)),
    // q78 validated form: n_days + exact distinct + in-band flag are
    // oracled; RelationalSpec still asserts union-of-dailies == direct
    // estimate on the raw operator (activityRollup).
    "q78_activity_rollup" -> ((s, dir) =>
      Relational.hllRollupValidated(Tables.events(s, dir))),
    "q79_latest_snapshot" -> ((s, dir) =>
      Relational.latestSnapshot(Tables.events(s, dir))),
    "q80_value_stats" -> ((s, dir) =>
      Relational.valueStatsProfile(Tables.events(s, dir))),
    "q81_local_supplier_volume" -> ((s, dir) =>
      Relational.localSupplierVolume(
        Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),
    "q82_calendar_profile" -> ((s, dir) =>
      Relational.orderCalendarProfile(Tables.orders(s, dir))),
    "q83_grouping_sets" -> ((s, dir) =>
      Relational.returnsGroupingSets(Tables.lineitem(s, dir))),
    "q84_change_history" -> ((s, dir) =>
      Relational.changeHistory(Tables.events(s, dir))),
    "q86_group_quartiles" -> ((s, dir) =>
      Relational.groupPriceQuartiles(Tables.orders(s, dir))),
    "q87_market_share" -> ((s, dir) =>
      Relational.marketShare(
        Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir),
        Tables.part(s, dir))),
    "q88_stats_unpivot" -> ((s, dir) =>
      Relational.eventStatsUnpivot(Tables.events(s, dir))),
    "q89_fuzzy_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir), "text", "doc_id", "lang")),
    "q90_gap_fill" -> ((s, dir) =>
      Relational.dailyGapFill(Tables.events(s, dir))),
    "q91_disc_percentiles" -> ((s, dir) =>
      Relational.groupPriceDiscretePercentiles(Tables.orders(s, dir))),
    "q92_sliding_windows" -> ((s, dir) =>
      Relational.slidingEventCounts(Tables.events(s, dir))),
    "q85_decontaminated" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val d = Tables.documents(s, dir)
      Contamination.decontaminate(
        d.filter(f.pmod(f.col("doc_id"), f.lit(10)) =!= 7),
        d.filter(f.pmod(f.col("doc_id"), f.lit(10)) === 7),
        "text", "doc_id", n = 4, minShared = 2)
        .select(f.col("doc_id"), f.col("lang"), f.col("n_chars"))
    }),
    "q61_byte_entropy" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Tables.documents(s, dir)
        .select(f.col("doc_id"),
          graft.functions.ByteEntropyExpr.byteEntropy(f.col("text")).as("e"))
        .select(f.col("doc_id"),
          f.col("e").getItem(0).cast("long").as("n_bytes"),
          f.col("e").getItem(1).cast("long").as("n_distinct_bytes"),
          f.round(f.col("e").getItem(2), 6).as("entropy_nats"))
    }),
    "q18_embedding_neardup" -> ((s, dir) =>
      // synthetic embeddings are near-orthogonal (max pairwise cosine ~0.45);
      // 0.35 exercises the verify-filter path with non-trivial output. LSH
      // recall at such a LOW threshold is inherently partial (the 0.95+
      // near-dup regime, where recall ≥ 0.95, is asserted in DedupSpec);
      // every emitted pair is exact-verified, so precision is 1.0.
      // Validated form (q29 pattern): the all-pairs exact cosine set is
      // the DuckDB-oracled output; recall_ok pins embeddingNearDups at its
      // measured low-threshold operating point (0.148 sf0.01 / 0.175
      // sf0.1 — the 8x8 family is tuned for the 0.95 regime, where
      // DedupSpec asserts >= 0.95 on perturbed near-dups) — floor 0.1.
      Dedup.embeddingNearDupsValidated(Tables.embeddings(s, dir), "vec_id",
        dim = 64, threshold = 0.35, recallFloor = 0.1)),
    "q93_small_qty_revenue" -> ((s, dir) =>
      Relational.smallQuantityRevenue(
        Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q94_large_orders" -> ((s, dir) =>
      Relational.largeQuantityOrders(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir))),
    "q95_zscore" -> ((s, dir) =>
      Pipelines.zscoreNormalize(Tables.events(s, dir))),
    "q96_mode_per_user" -> ((s, dir) =>
      Relational.modePerUser(Tables.events(s, dir))),
    "q97_chi_square" -> ((s, dir) =>
      Relational.contingencyChiSquare(Tables.events(s, dir))),
    "q98_lone_late_supplier" -> ((s, dir) =>
      Relational.loneLateSupplier(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.supplier(s, dir))),
    "q99_daily_trend" -> ((s, dir) =>
      Relational.dailyTrend(Tables.events(s, dir))),
    "q100_inverted_index" -> ((s, dir) =>
      TextAnalysis.invertedIndex(Tables.documents(s, dir), "text", "doc_id")),
    "q101_robust_stats" -> ((s, dir) =>
      Relational.robustPriceStats(Tables.orders(s, dir))),
    "q102_pack_sequences" -> ((s, dir) =>
      Pipelines.packSequences(Tables.documents(s, dir), "doc_id",
        capacity = 256L, shards = 16)),
    "q103_custdist" -> ((s, dir) =>
      Relational.customerOrderDistribution(
        Tables.customer(s, dir), Tables.orders(s, dir))),
    "q104_idle_rich" -> ((s, dir) =>
      Relational.idleRichCustomers(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.nation(s, dir))),
    "q105_corpus_prep" -> ((s, dir) =>
      Pipelines.corpusPrep(Tables.documents(s, dir))),
    "q106_state_at" -> ((s, dir) =>
      Relational.stateAtTime(Tables.events(s, dir))),
    "q107_hours_listagg" -> ((s, dir) =>
      Relational.hourProfileCsv(Tables.events(s, dir))),
    "q108_passage_dedup" -> ((s, dir) =>
      Dedup.passageDedup(Tables.documents(s, dir), "text", "doc_id",
        chunkTokens = 20)),
    "q109_asof_attribution" -> ((s, dir) =>
      AsofJoin.purchaseClickAsof(Tables.events(s, dir))),
    "q110_token_budget" -> ((s, dir) =>
      Pipelines.tokenBudgetSelect(Tables.documents(s, dir),
        budgetTokens = 5000L)),
    "q111_bpe_candidates" -> ((s, dir) =>
      BpeTrain.bpePairCandidates(Tables.documents(s, dir), "text", k = 20)),
    "q112_winsorize" -> ((s, dir) =>
      Pipelines.winsorize(Tables.events(s, dir))),
    "q113_priority_returns" -> ((s, dir) =>
      Relational.priorityReturnCheck(Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    "q114_returned_items" -> ((s, dir) =>
      Relational.returnedItemReport(Tables.lineitem(s, dir),
        Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir))),
    "q115_promo_share" -> ((s, dir) =>
      Relational.promoRevenueShare(Tables.lineitem(s, dir),
        Tables.part(s, dir))),
    // --- round-7 additions ---
    "q116_corpus_prep_v2" -> ((s, dir) =>
      Pipelines.corpusPrepV2(Tables.documents(s, dir))),
    // q117: the two "crawl versions" derive deterministically from the one
    // documents table (old = ids outside the %10==3 slice; new = all ids,
    // with %13==0 texts revised) so both engines see identical inputs.
    "q117_corpus_diff" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, dir)
      val oldV = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      val newV = docs.withColumn("text",
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(col("text"), lit(" revised"))).otherwise(col("text")))
      Pipelines.corpusDiff(oldV, newV, "doc_id", "text", carry = Seq("lang"))
        .groupBy(col("lang"), col("change"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens_old")).as("tokens_old"),
          sum(col("n_tokens_new")).as("tokens_new"))
    }),
    "q118_mixture_plan" -> ((s, dir) =>
      Pipelines.mixturePlan(Tables.documents(s, dir), "lang", "text",
        targetWeights = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1),
        budgetTokens = 100000L)),
    "q119_bpe_encode" -> ((s, dir) =>
      BpeTrain.bpeTokenStats(Tables.documents(s, dir), "text", "doc_id")),
    "q120_semantic_dedup" -> ((s, dir) =>
      // SemDeDup k-means-cell blocking at the q18 operating point
      // (threshold 0.35 on near-orthogonal synthetic embeddings).
      // Measured recall of the nAssign=4 assignment vs the exact
      // all-pairs set: 0.963 sf0.01 / 0.954 sf0.1 — floor 0.9. The
      // DuckDB-oracled output is the exact pair set (precision 1.0:
      // every emitted pair is exact-verified); recall_ok is the
      // in-band gate the oracle pins to 1.
      Dedup.semanticDedupValidated(Tables.embeddings(s, dir), "vec_id",
        threshold = 0.35, nCells = 16, nAssign = 4, recallFloor = 0.9)),
    "q121_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, dir), "text", "doc_id")),
    "q122_bloom_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val even = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      val odd = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
      // same split as q48; floor 0.95 vs fpp=0.01 (measured loss ~fpp)
      Dedup.bloomDedupValidated(even, odd, "text", "doc_id",
        Seq("lang", "n_chars"), expectedCorpusDocs = 100000L)
    }),
    "q123_cheapest_supplier" -> ((s, dir) =>
      Relational.cheapestRegionalSupplier(Tables.lineitem(s, dir),
        Tables.part(s, dir), Tables.supplier(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    "q124_part_concentration" -> ((s, dir) =>
      Relational.partValueConcentration(Tables.lineitem(s, dir))),
    // --- round-8 additions: the remaining TPC-H shapes ---
    "q125_shipping_priority" -> ((s, dir) =>
      Relational.shippingPriority(Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q126_forecast_revenue" -> ((s, dir) =>
      Relational.forecastRevenue(Tables.lineitem(s, dir))),
    "q127_volume_shipping" -> ((s, dir) =>
      Relational.volumeShipping(Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir),
        Tables.nation(s, dir))),
    "q128_product_profit" -> ((s, dir) =>
      Relational.productProfit(Tables.lineitem(s, dir), Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir))),
    "q129_top_supplier" -> ((s, dir) =>
      Relational.topSupplier(Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "q130_supplier_variety" -> ((s, dir) =>
      Relational.supplierPartVariety(Tables.lineitem(s, dir),
        Tables.part(s, dir), Tables.supplier(s, dir))),
    "q131_dominant_suppliers" -> ((s, dir) =>
      Relational.dominantSuppliers(Tables.lineitem(s, dir),
        Tables.part(s, dir), Tables.supplier(s, dir))),
    "q132_doc_chunks" -> ((s, dir) =>
      Pipelines.chunkDocuments(Tables.documents(s, dir), "text", "doc_id")),
    "q133_unigram_surprisal" -> ((s, dir) =>
      Pipelines.unigramSurprisal(Tables.documents(s, dir), "text", "doc_id")),
    "q134_zorder_layout" -> ((s, dir) =>
      Pipelines.zorderLayout(Tables.lineitem(s, dir))),
    // q135: the dim snapshot is the pre-cutoff SCD-2 (q84's window +
    // event_id as the ordering column) and the change feed is everything
    // after — the oracle rebuilds from the FULL history, so the
    // incremental merge must equal a from-scratch rebuild.
    "q135_scd2_apply" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
      val ev = Tables.events(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val dim = ev.filter(col("ts") < cutoff).select(
        col("user_id"), col("event_type"), col("value"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        lead(col("ts"), 1).over(w).isNull.cast("int").as("is_current"),
        col("event_id"))
      Pipelines.applyScd2(dim, ev.filter(col("ts") >= cutoff)
        .select(col("user_id"), col("event_type"), col("value"),
          col("ts"), col("event_id")))
    }),
    "q136_temperature_sample" -> ((s, dir) =>
      Pipelines.temperatureSample(Tables.documents(s, dir), "lang", "doc_id",
        TemperatureWeights, temperature = 2.0)),
    "q137_substring_dups" -> ((s, dir) =>
      Dedup.substringDupPairs(Tables.documents(s, dir), "text", "doc_id")),
    // q138: minDocs=3 — the synthetic corpus has no true licenses (max
    // window df is 3-4), so the report surfaces its repeated sentence
    // fragments instead
    "q138_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateWindows(Tables.documents(s, dir), "text", "doc_id",
        minDocs = 3)),
    "q139_bigram_surprisal" -> ((s, dir) =>
      Pipelines.bigramSurprisal(Tables.documents(s, dir), "text", "doc_id")),
    "q140_cdc_dedup" -> ((s, dir) =>
      Pipelines.cdcDedupStats(Tables.documents(s, dir), "text", "doc_id")),
    // q141: same train/bench split as q69; windowChars=40 per Lee et al.
    "q141_substring_contamination" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val d = Tables.documents(s, dir)
      Contamination.substringOverlapPairs(
        d.filter(f.pmod(f.col("doc_id"), f.lit(10)) =!= 7),
        d.filter(f.pmod(f.col("doc_id"), f.lit(10)) === 7),
        "text", "doc_id", windowChars = 40)
    }),
    "q142_quality_classifier" -> ((s, dir) =>
      TextAnalysis.qualityClassifier(Tables.documents(s, dir), "text", "doc_id")),
    "q143_domain_concentration" -> ((s, dir) =>
      TextAnalysis.domainConcentration(Tables.documents(s, dir), "text", "doc_id")),
    "q144_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir), "text", "doc_id")),
    "q145_rendezvous_shards" -> ((s, dir) =>
      Pipelines.rendezvousShards(Tables.documents(s, dir), "doc_id")),
    "q146_containment_dups" -> ((s, dir) =>
      Dedup.containmentDups(Tables.documents(s, dir), "text", "doc_id",
        n = 3, minGrams = 10, threshold = 0.6)),
    "q147_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, dir), "text",
        "doc_id", blockChars = 2, keyChars = 30, window = 5, n = 3,
        threshold = 0.5)),
    "q148_winnow_fingerprints" -> ((s, dir) =>
      Winnowing.fingerprints(Tables.documents(s, dir), "text", "doc_id",
        k = 8, w = 4)),
    "q149_ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(Tables.documents(s, dir), "text", "doc_id",
        n = 3)),
    "q150_winnow_dups" -> ((s, dir) =>
      Winnowing.dupPairs(Tables.documents(s, dir), "text", "doc_id",
        k = 8, w = 4, dfMax = 20, minShared = 10)),
    "q151_dsir_weights" -> ((s, dir) =>
      Pipelines.dsirWeights(Tables.documents(s, dir), "text", "doc_id",
        "lang", targetLang = "en", buckets = 1024, alpha = 0.5)),
    // q152: measured recall@10 of the PQ+rerank index (m=16 4-dim
    // subspaces, 16x-rerank): 1.0 (sf0.001) / 0.99 (sf0.01) / 0.96
    // (sf0.1) — floor 0.85
    "q152_similarity_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopKValidated(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), 10,
        dim = 64, m = 16, ksub = 16, rerank = 16, recallFloor = 0.85)
    }),
    "q153_hilbert_layout" -> ((s, dir) =>
      Pipelines.hilbertLayout(Tables.lineitem(s, dir))),
    // q154: the salted join's oracle is the PLAIN join — the gate itself
    // proves salting preserves join semantics exactly
    "q154_salted_join" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Skew.saltedJoin(
        Tables.lineitem(s, dir),
        Tables.part(s, dir).withColumnRenamed("p_partkey", "l_partkey"),
        "l_partkey", salt = 8)
        .groupBy(f.col("p_brand"))
        .agg(
          f.sum((f.col("l_extendedprice") *
            (f.lit(1.0) - f.col("l_discount"))).cast("decimal(18,6)"))
            .cast("double").as("revenue"),
          f.count(f.lit(1)).as("n_lines"))
    }),
    "q155_bm25" -> ((s, dir) =>
      TextAnalysis.bm25Scores(Tables.documents(s, dir), "text", "doc_id",
        Bm25QueryTerms)),
    "q156_containment_prune" -> ((s, dir) =>
      Dedup.containmentPrune(Tables.documents(s, dir), "text", "doc_id",
        n = 3, minGrams = 10, threshold = 0.6)),
    "q157_anomaly_windows" -> ((s, dir) =>
      Relational.dailyAnomalyWindows(Tables.events(s, dir),
        trailing = 7, sigma = 2.0)),
    // q158: customer↔supplier interaction bipartite (both edge
    // orientations); node ids disambiguate by PARITY (customer 2k,
    // supplier 2k+1) — an offset scheme collides once keys outgrow it
    // (custkey = 150k·SF passes 1e6 at SF≈7). Ranks are exact integer
    // micro-units, so the oracle unrolls the same 4 power-iteration
    // rounds as CTEs and matches bit-for-bit
    "q158_pagerank" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val e0 = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          f.col("o_orderkey") === f.col("l_orderkey"))
        .select(f.col("o_custkey").as("c"), f.col("l_suppkey").as("sk"))
        .distinct()
      val edges = e0.select(f.explode(f.array(
        f.struct((f.col("c") * f.lit(2L)).as("src"),
          (f.col("sk") * f.lit(2L) + f.lit(1L)).as("dst")),
        f.struct((f.col("sk") * f.lit(2L) + f.lit(1L)).as("src"),
          (f.col("c") * f.lit(2L)).as("dst")))).as("e"))
        .select(f.col("e.src").as("src"), f.col("e.dst").as("dst"))
      Graph.pageRankMicros(edges, "src", "dst", iters = 4)
        .select(
          f.when(f.col("node") % 2 === 1, f.lit("supplier"))
            .otherwise(f.lit("customer")).as("kind"),
          f.expr("node div 2").as("key"),
          f.col("rank"))
    }),
    "q159_trigram_backoff" -> ((s, dir) =>
      Pipelines.trigramBackoffSurprisal(Tables.documents(s, dir),
        "text", "doc_id")),
    "q160_ks_drift" -> ((s, dir) =>
      Relational.ksDrift(Tables.events(s, dir), splitDay = 15)),
    "q161_coactivity" -> ((s, dir) =>
      EventJoins.coActivityPairs(Tables.events(s, dir))),
    "q162_dup_span_ladder" -> ((s, dir) =>
      Dedup.dupSpanLadder(Tables.documents(s, dir), "text", "doc_id",
        widths = Seq(20, 40, 80))),
    // q163: triangle diagnostics over q146's containment-dup graph
    "q163_dup_graph_triangles" -> ((s, dir) =>
      Graph.triangleStats(
        Dedup.containmentDups(Tables.documents(s, dir), "text", "doc_id",
          n = 3, minGrams = 10, threshold = 0.6),
        "doc_a", "doc_b")),
    // q164: greedy runs on an integer grid, so the oracle unrolls the
    // same k selection steps as chained CTEs and matches exactly
    "q164_mmr_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.mmrTopK(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
        k = 8, c = 24)
    }),
    "q165_weighted_sample" -> ((s, dir) =>
      Pipelines.weightedSample(Tables.documents(s, dir), "doc_id", "lang",
        "n_chars", k = 5)),
    "q166_funnel" -> ((s, dir) =>
      Relational.funnel(Tables.events(s, dir))),
    "q167_readability" -> ((s, dir) =>
      TextAnalysis.readability(Tables.documents(s, dir), "text", "doc_id")),
    "q168_quantile_sketch" -> ((s, dir) =>
      Relational.quantileSketchValidated(Tables.events(s, dir))),
    "q169_textrank" -> ((s, dir) =>
      TextAnalysis.textRankKeywords(Tables.documents(s, dir), "text",
        topK = 20)),
    // q170: q158's graph with edge MULTIPLICITY (lineitem count per
    // customer-supplier pair) driving proportional rank flow
    "q170_pagerank_weighted" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val e0 = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          f.col("o_orderkey") === f.col("l_orderkey"))
        .groupBy(f.col("o_custkey").as("c"), f.col("l_suppkey").as("sk"))
        .agg(f.count(f.lit(1)).as("w"))
      val edges = e0.select(f.explode(f.array(
        f.struct((f.col("c") * f.lit(2L)).as("src"),
          (f.col("sk") * f.lit(2L) + f.lit(1L)).as("dst"), f.col("w")),
        f.struct((f.col("sk") * f.lit(2L) + f.lit(1L)).as("src"),
          (f.col("c") * f.lit(2L)).as("dst"), f.col("w")))).as("e"))
        .select(f.col("e.src").as("src"), f.col("e.dst").as("dst"),
          f.col("e.w").as("w"))
      Graph.pageRankMicrosWeighted(edges, "src", "dst", "w", iters = 4)
        .select(
          f.when(f.col("node") % 2 === 1, f.lit("supplier"))
            .otherwise(f.lit("customer")).as("kind"),
          f.expr("node div 2").as("key"),
          f.col("rank"))
    }),
    // q171: the oracle is the FULL REBUILD over all days — the merge's
    // strongest equivalence check (q135 precedent)
    "q171_incremental_agg" -> ((s, dir) =>
      Pipelines.incrementalDailyAgg(Tables.events(s, dir))),
    // q172: exactly 100 rows at EVERY scale factor — the exact-size
    // invariant per-stratum rate sampling cannot give
    "q172_proportional_holdout" -> ((s, dir) =>
      Pipelines.proportionalHoldout(Tables.documents(s, dir), "doc_id",
        "lang", totalK = 100)),
    // q173: deterministic synchronous LPA over the q158 bipartite
    "q173_label_propagation" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val e0 = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          f.col("o_orderkey") === f.col("l_orderkey"))
        .select(f.col("o_custkey").as("c"), f.col("l_suppkey").as("sk"))
        .distinct()
      val edges = e0.select(f.explode(f.array(
        f.struct((f.col("c") * f.lit(2L)).as("src"),
          (f.col("sk") * f.lit(2L) + f.lit(1L)).as("dst")),
        f.struct((f.col("sk") * f.lit(2L) + f.lit(1L)).as("src"),
          (f.col("c") * f.lit(2L)).as("dst")))).as("e"))
        .select(f.col("e.src").as("src"), f.col("e.dst").as("dst"))
      Graph.labelPropagation(edges, "src", "dst", iters = 4)
        .select(
          f.when(f.col("node") % 2 === 1, f.lit("supplier"))
            .otherwise(f.lit("customer")).as("kind"),
          f.expr("node div 2").as("key"),
          f.col("lbl").as("community"))
    }),
    "q174_multitouch" -> ((s, dir) =>
      EventJoins.multiTouchAttribution(Tables.events(s, dir),
        windowHours = 24)),
    "q176_event_trigrams" -> ((s, dir) =>
      Relational.eventTrigramPatterns(Tables.events(s, dir),
        minSupportUsers = 5)),
    "q177_skew_report" -> ((s, dir) =>
      Skew.joinKeySkewReport(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))),
    "q178_conversion_ci" -> ((s, dir) =>
      Relational.conversionWilson(Tables.events(s, dir))),
    "q179_ab_ztest" -> ((s, dir) =>
      Relational.abConversionZ(Tables.events(s, dir))),
    "q180_lang_confusion" -> ((s, dir) =>
      TextAnalysis.langConfusion(Tables.documents(s, dir), "text", "lang")),
    "q181_markov_kstep" -> ((s, dir) =>
      Relational.markovKStep(Tables.events(s, dir), steps = 4)),
    "q183_length_powerlaw" -> ((s, dir) =>
      TextAnalysis.docLengthPowerLaw(Tables.documents(s, dir), "n_chars")),
    // q182: baskets = orders, items = parts on the order's lineitems
    "q182_basket_pairs" -> ((s, dir) =>
      Graph.basketPairLift(
        Tables.lineitem(s, dir).select(
          org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2, maxBasketSize = 20)),
    // q184: 2-core of the q146/q163 containment dup graph — 4
    // synchronous peel rounds (documented fixed-round semantics; the
    // oracle unrolls the same rounds as CTEs)
    "q184_kcore" -> ((s, dir) =>
      Graph.kCorePeel(
        Dedup.containmentDups(Tables.documents(s, dir), "text", "doc_id",
          n = 3, minGrams = 10, threshold = 0.6),
        "doc_a", "doc_b", k = 2, rounds = 4)),
    // q185: generalized CEP with negation — view, then click with no
    // error in the gap, then purchase with no second view in the gap,
    // all within 24h of the anchor view
    "q185_cep_match" -> ((s, dir) =>
      Cep.matchPattern(Tables.events(s, dir), Seq(
        Cep.CepStep("view"),
        Cep.CepStep("click", without = Seq("error")),
        Cep.CepStep("purchase", without = Seq("view"))),
        windowHours = 24)),
    // q186: graph-based ANN (NSW per IVF cell) — the validated gate
    // emits the exact top-10 rows + recall_ok at the measured floor.
    // Cell selection is the same quantizer as q32, so recall tracks the
    // IVF operating point exactly: measured recall@10 0.56 (sf0.001) /
    // 0.49 (sf0.01) / 0.51 (sf0.1) vs IVF's 0.49/0.51 — ef=32 makes the
    // within-cell beam effectively exhaustive at these cell sizes, so
    // the nProbe=4-of-16 cell hit rate is the binding constraint.
    // Floor 0.4 (the q32 margin discipline)
    "q186_similarity_nsw" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Nsw.nswTopKValidated(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), 10,
        nCentroids = 16, nProbe = 4, m = 8, ef = 32, recallFloor = 0.4)
    }),
    // q187: GPT-2 regex pretokenizer gate — native lookahead-free
    // scanner, losslessness pinned by DuckDB, token-sequence parity vs
    // the literal java.util.regex pattern pinned in-band
    "q187_gpt2_pretok" -> ((s, dir) =>
      TextAnalysis.gpt2PretokenGate(Tables.documents(s, dir), "text",
        "doc_id")),
    // q188: bounded-depth harmonic centrality over the containment dup
    // graph — 3 synchronous BFS levels, integer micro-harmonic sums
    "q188_harmonic" -> ((s, dir) =>
      Graph.harmonicCentrality(
        Dedup.containmentDups(Tables.documents(s, dir), "text", "doc_id",
          n = 3, minGrams = 10, threshold = 0.6),
        "doc_a", "doc_b", maxDepth = 3)),
    // q189: per-day basket pairs — baskets are (day, user), items ride
    // the props JSON key on view events. minSupport=1 at test SFs: the
    // synthetic item space (k in 0..99) makes same-day cross-user pair
    // repeats vanishingly rare, and a floor of 2 would gate an empty
    // (vacuous) oracle
    "q189_daily_basket_pairs" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Graph.windowedBasketPairs(
        Tables.events(s, dir)
          .filter(f.col("event_type") === "view")
          .select(
            f.datediff(f.to_date(f.col("ts")), f.lit("1970-01-01"))
              .cast("long").as("d"),
            f.col("user_id").as("b"),
            f.get_json_object(f.col("props"), "$.k").cast("long").as("it")),
        "d", "b", "it", minSupport = 1, maxBasketSize = 20)
    }),
    // q190: output-file bin packing via the two-pass range-partitioned
    // cumulative sum (the scale-safe form of a per-lang global window)
    "q190_file_bins" -> ((s, dir) =>
      Pipelines.packedFileBins(Tables.documents(s, dir), "lang", "doc_id",
        "n_chars", targetUnits = 100000L)),
    // q191: Fellegi-Sunter record-linkage weights — block on
    // mktsegment; compare nation, acctbal k-bucket, and the last two
    // name digits; emit probable matches (score > 0, needs >= 2
    // agreeing fields at these u's)
    "q191_record_linkage" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Linkage.fellegiSunter(
        Tables.customer(s, dir).select(
          f.col("c_custkey").as("id"),
          f.col("c_mktsegment").as("b1"),
          f.col("c_nationkey").as("f1"),
          f.floor(f.col("c_acctbal") / f.lit(1000.0)).cast("long").as("f2"),
          f.substring(f.col("c_name"), -2, 1).as("f3"),
          f.substring(f.col("c_name"), -1, 1).as("f4")),
        "id", Seq("b1"), Seq("f1", "f2", "f3", "f4"),
        m = 0.9, minScore = 0.0)
    }),
    // q192: Min-K%-prob membership scoring over the q159 held-out split
    "q192_mink_prob" -> ((s, dir) =>
      Contamination.minKProbScore(Tables.documents(s, dir), "text",
        "doc_id", kPct = 20)),
    // q193: EM-refined (p, m, u) over q191's blocked agreement vectors
    // — 2 unrolled rounds, grid-exact posteriors
    "q193_linkage_em" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Linkage.emRefine(
        Tables.customer(s, dir).select(
          f.col("c_custkey").as("id"),
          f.col("c_mktsegment").as("b1"),
          f.col("c_nationkey").as("f1"),
          f.floor(f.col("c_acctbal") / f.lit(1000.0)).cast("long").as("f2"),
          f.substring(f.col("c_name"), -2, 1).as("f3"),
          f.substring(f.col("c_name"), -1, 1).as("f4")),
        "id", Seq("b1"), Seq("f1", "f2", "f3", "f4"), rounds = 2)
    }),
    // q175: supplier-supplier similarity via shared customers
    "q175_item_cf" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Graph.itemCosineSimilarity(
        Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir),
            f.col("o_orderkey") === f.col("l_orderkey"))
          .select(f.col("o_custkey").as("u"), f.col("l_suppkey").as("it")),
        "u", "it", maxCustDeg = 50, minCo = 2)
    }),
    // q194: ExactSubstr maximal duplicated spans (suffix ranking); the
    // oracled columns are the span geometry — max_match has no cheap SQL
    // form and is spec'd against a local suffix array instead
    "q194_exact_substr" -> ((s, dir) =>
      ExactSubstr.maximalSpans(Tables.documents(s, dir), "text", "doc_id",
          minLen = 40, windowCap = 64)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("span_start"),
          org.apache.spark.sql.functions.col("span_len"),
          org.apache.spark.sql.functions.col("n_dup_starts"))),
    // q195: CEP with a KLEENE step — view, then 2-to-3 clicks with no
    // error inside the run's used gap, then purchase before a 4th
    // click, within 24h of the anchor
    "q195_cep_kleene" -> ((s, dir) =>
      Cep.matchPattern(Tables.events(s, dir), Seq(
        Cep.CepStep("view"),
        Cep.CepStep("click", without = Seq("error"),
          minReps = 2, maxReps = Some(3)),
        Cep.CepStep("purchase")),
        windowHours = 24)),
    // q196: the ExactSubstr REMOVAL step — cut the maximal duplicated
    // spans out of every document; content verified via the
    // engine-independent polynomial fingerprint of the cleaned text
    "q196_exact_substr_clean" -> ((s, dir) =>
      ExactSubstr.removeSpans(Tables.documents(s, dir), "text", "doc_id",
          minLen = 40, windowCap = 64)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("n_spans"),
          org.apache.spark.sql.functions.col("removed_chars"),
          org.apache.spark.sql.functions.col("kept_chars"),
          graft.functions.PolyHashExprs
            .polyHash(org.apache.spark.sql.functions.col("text_clean"))
            .as("clean_fp"))),
    // q197: suffix-level cross-corpus decontamination — maximal spans of
    // TRAIN docs occurring verbatim in the held-out bench slice (the
    // q69/q141 split); in-train duplication does not mark
    "q197_cross_substr" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val d = Tables.documents(s, dir)
      ExactSubstr.crossCorpusSpans(
          d.filter(f.pmod(f.col("doc_id"), f.lit(10)) =!= 7),
          d.filter(f.pmod(f.col("doc_id"), f.lit(10)) === 7),
          "text", "doc_id", minLen = 40, windowCap = 64)
        .select(f.col("doc_id"), f.col("span_start"), f.col("span_len"),
          f.col("n_dup_starts"))
    }),
    // q198: blocklist phrase hits — one Aho-Corasick pass over the
    // corpus for the whole pattern list, overlapping occurrences
    // counted ("a a" exercises overlap at corpus scale)
    "q198_blocklist_hits" -> ((s, dir) =>
      TextAnalysis.blocklistHits(Tables.documents(s, dir), "text",
        "doc_id", BlocklistPatterns)),
    // q199: k-anonymity generalization ladder — the whole ladder in one
    // grouping-sets shuffle (release-gate governance audit)
    "q199_kanon_ladder" -> ((s, dir) =>
      Governance.kAnonymityLadder(Tables.customer(s, dir))),
    // q200: Markov removal-effect attribution — data-driven channel
    // credit from journey absorption probabilities (vs q174's
    // positional heuristics); one corpus window pass + exact
    // micro-grid value iteration on the tiny transition matrix
    "q200_markov_attribution" -> ((s, dir) =>
      Relational.markovRemovalEffect(Tables.events(s, dir))),
    // q201: Jaro-Winkler title linkage on the native codegen kernel —
    // prefix-blocked candidates, byte-walk scoring, micro-grid output
    "q201_jaro_titles" -> ((s, dir) =>
      Dedup.jaroWinklerTitlePairs(Tables.documents(s, dir), "text",
        "doc_id")),
    // q202: golden-record survivorship — rule-blocked customer matches
    // clustered (clusterPairs) and merged per deterministic rules:
    // nation by mode (tie -> min), balance by max, id by cluster min
    "q202_golden_record" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val base = Tables.customer(s, dir).select(
        f.col("c_custkey").as("id"),
        f.col("c_mktsegment").as("seg"),
        f.floor(f.col("c_acctbal") / f.lit(1000.0)).as("b1k"),
        f.substring(f.col("c_name"), -1, 1).as("sfx"),
        f.col("c_nationkey").as("nat"),
        f.col("c_acctbal").as("bal"))
      val keys = Seq("seg", "b1k", "sfx")
      val pairs = base
        .select((keys.map(f.col) :+ f.col("id").as("ida")): _*)
        .join(base.select((keys.map(f.col) :+ f.col("id").as("idb")): _*),
          keys)
        .filter(f.col("ida") < f.col("idb"))
        .select(f.col("ida"), f.col("idb"))
      Linkage.goldenRecords(base, "id", pairs, "ida", "idb",
        modeCols = Seq("nat"), maxCols = Seq("bal"))
    }),
    // q203: UNKEYED interval-overlap join (bin-blocked range join) —
    // user sessions x global error-incident windows, exact overlap
    // accounting; the naive plan is a BroadcastNestedLoopJoin
    "q203_session_incidents" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val ev = Tables.events(s, dir)
      val sessions = Relational.sessionize(ev).select(
        f.col("user_id"),
        f.unix_micros(f.col("session_start")).as("s_start"),
        f.unix_micros(f.col("session_end")).as("s_end"))
      val incidents = ev.filter(f.col("event_type") === "error").select(
        (f.unix_micros(f.col("ts")) - f.lit(300000000L)).as("i_start"),
        (f.unix_micros(f.col("ts")) + f.lit(300000000L)).as("i_end"))
      IntervalJoin.overlapJoin(sessions, "s_start", "s_end",
          incidents, "i_start", "i_end", binWidth = 3600000000L)
        .groupBy(f.col("user_id"), f.col("s_start"))
        .agg(f.count(f.lit(1)).as("n_incidents"),
          f.sum(f.least(f.col("s_end"), f.col("i_end")) -
            f.greatest(f.col("s_start"), f.col("i_start")))
            .cast("long").as("overlap_micros"))
    }),
    // q204: l-diversity audit — homogeneity-attack exposure per QI
    // class (k-anonymity's blind spot), deterministic dominant value
    "q204_ldiversity" -> ((s, dir) =>
      Governance.lDiversityAudit(Tables.customer(s, dir))),
    // q205: seeded-Laplace noised release of daily event counts —
    // the DP release shape with the deterministic uniform device
    "q205_noised_release" -> ((s, dir) =>
      Governance.noisedDailyRelease(Tables.events(s, dir),
        NoisedReleaseTypes)),
    // q206: unigram-LM tokenizer (SentencePiece seed + Viterbi E-step)
    // — the probability tokenizer next to BPE, on the native DP kernel
    "q206_unigram_lm" -> ((s, dir) =>
      UnigramLm.unigramPieceCounts(Tables.documents(s, dir), "text")),
    // q207: the prune iteration — keep top-8 multi-char pieces +
    // the character floor, re-segment (SentencePiece's size step)
    "q207_unigram_prune" -> ((s, dir) =>
      UnigramLm.unigramPrunedCounts(Tables.documents(s, dir), "text")),
    // q208: skip-gram positives + seeded unigram negative sampling on
    // the O(log|V|) cumulative-range kernel
    "q208_negative_sampling" -> ((s, dir) =>
      NegativeSampling.skipgramWithNegatives(Tables.documents(s, dir),
        "text", "doc_id")),
    // q209: right-censored time-to-conversion — Nelson-Aalen cumulative
    // hazard, integer-exact (no libm), risk sets by suffix sum over the
    // bounded duration-day histogram
    "q209_survival_hazard" -> ((s, dir) =>
      Survival.nelsonAalenHazard(Tables.events(s, dir))),
    // q210: t-closeness — per-class total-variation distance from the
    // global sensitive distribution on the micro grid (skewness attack)
    "q210_tcloseness" -> ((s, dir) =>
      Governance.tClosenessAudit(Tables.customer(s, dir))),
    // q211: reliability diagram + ECE terms for the lang-ID scorer —
    // model-eval calibration on the micro grid
    "q211_calibration" -> ((s, dir) =>
      TextAnalysis.langCalibration(Tables.documents(s, dir))),
    // q212: Pareto/ABC inventory classes by cross-multiplied cumulative
    // share — no float share ever materializes
    "q212_pareto_parts" -> ((s, dir) =>
      Relational.paretoAbc(Tables.lineitem(s, dir))),
    // q213: per-day peak concurrent sessions — sweep-line over q34's
    // session intervals, day-partitioned running sum
    "q213_peak_sessions" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val ses = Relational.sessionize(Tables.events(s, dir)).select(
        f.unix_micros(f.col("session_start")).as("ss"),
        f.unix_micros(f.col("session_end")).as("se"))
      IntervalJoin.dailyPeakOverlap(ses, "ss", "se")
    }),
    // q214: perceptual (dHash) near-dup over the media BYTES — the
    // multimodal dedup member. Near-identical media planted by a
    // one-byte same-length perturbation (one grid cell touched ->
    // Hamming <= 2, the kernel's stability contract), replayed
    // identically by the oracle; the 21-bit banded join is EXACT for
    // maxDist 2, so engine == the oracle's all-pairs Hamming scan.
    "q214_dhash_neardups" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val docs = Tables.documents(s, dir)
        .select(f.col("doc_id"), f.col("text"))
      val twins = docs.filter(f.pmod(f.col("doc_id"), f.lit(10)) === 0)
        .select((f.col("doc_id") + f.lit(1000000L)).as("doc_id"),
          f.concat(f.substring(f.col("text"), 1, 23), f.lit("~"),
            f.expr("substring(text, 25)")).as("text"))
      val media = docs.union(twins).select(f.col("doc_id"),
        f.encode(f.col("text"), "UTF-8").as("payload"))
      Dedup.dhashNearDups(media, "payload", "doc_id", maxDist = 2)
    }),
    // q215: the FULL unigram-LM EM loop — q206's E-step + q207's
    // prune/re-estimate M-step iterated over a shrinking keep schedule
    // (12 -> 8 -> 5 multis); one row per (round, piece) so the oracle
    // pins EVERY round's piece-usage table, not just the final state
    "q215_unigram_em" -> ((s, dir) =>
      UnigramLm.unigramEmCounts(Tables.documents(s, dir), "text")),
    // q216: vocabulary coverage curve — minimal vocab size reaching
    // 50/90/99% token mass, computed over distinct FREQUENCIES (the
    // sqrt-bounded frame), never a vocab-sized global sort
    "q216_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.coverageCurve(Tables.documents(s, dir), "text")),
    // q217: source-level similarity via unionable minhash sketches +
    // validation-priced exact set intersections (the q10/q11 gate form)
    "q217_source_sketch_sim" -> ((s, dir) =>
      Dedup.sourceMinhashSimilarity(Tables.documents(s, dir), "text",
        "source")),
    // q218: per-source duplication rate — ExactSubstr maximal spans
    // rolled up to the source dimension (the report that drives
    // source-level filtering decisions)
    "q218_source_dup_rate" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val docs = Tables.documents(s, dir)
      val perDoc = ExactSubstr.maximalSpans(docs, "text", "doc_id",
          minLen = 40, windowCap = 64)
        .groupBy(f.col("doc_id"))
        .agg(f.sum(f.col("span_len")).as("dup_chars"))
      docs.select(f.col("doc_id"), f.col("source"),
          f.length(f.col("text")).cast("long").as("nc"))
        .join(perDoc, Seq("doc_id"), "left_outer")
        .groupBy(f.col("source"))
        .agg(f.count(f.lit(1)).as("n_docs"),
          f.sum(f.coalesce(f.col("dup_chars"), f.lit(0L))).as("dup_chars"),
          f.sum(f.col("nc")).as("total_chars"))
        .withColumn("dup_ppm", TextAnalysis.idiv(
          f.col("dup_chars") * f.lit(1000000L), f.col("total_chars")))
    }),
    // q219: Heaps'-law vocabulary growth — new and cumulative distinct
    // word trigrams per doc-id decile (each gram counted at its FIRST
    // document; single words saturate instantly on a fixed vocabulary)
    "q219_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(Tables.documents(s, dir), "text",
        "doc_id")),
    // q220: frame-level perceptual dedup — items sharing sampled-frame
    // dHash fingerprints; twins planted by replacing the HEAD bytes
    // (frames past the first stay byte-identical)
    "q220_frame_dedup" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val docs = Tables.documents(s, dir)
        .select(f.col("doc_id"), f.col("text"))
      val twins = docs.filter(f.pmod(f.col("doc_id"), f.lit(7)) === 0)
        .select((f.col("doc_id") + f.lit(1000000L)).as("doc_id"),
          f.concat(f.lit("~~~~~~~~~~"),
            f.expr("substring(text, 11)")).as("text"))
      val media = docs.union(twins).select(f.col("doc_id"),
        f.lit("video").as("media_type"),
        f.encode(f.col("text"), "UTF-8").as("payload"))
      Multimodal.frameDhashDups(s, media, minShared = 1L)
    }),
    // q221: deterministic curriculum order — easy-to-hard by n_chars,
    // strata (langs) interleaved round-robin
    "q221_curriculum_order" -> ((s, dir) =>
      Pipelines.curriculumOrder(Tables.documents(s, dir), "doc_id",
        "lang", "n_chars")),
    // q222: Mondrian multidimensional k-anonymization — median-cut the
    // (balance cents x nation) QI space until no side can keep k rows;
    // release leaf boxes + counts (every box covers >= k individuals)
    "q222_mondrian_kanon" -> ((s, dir) =>
      Governance.mondrianAnonymize(Tables.customer(s, dir))),
    // q223: the row-level Mondrian RELEASE — every customer mapped to
    // their leaf's generalized box (the table a consumer joins)
    "q223_mondrian_release" -> ((s, dir) =>
      Governance.mondrianRelease(Tables.customer(s, dir))),
    // q224: l-diversity audit OF the Mondrian release — k-anonymity
    // does not bound attribute disclosure; this does, per leaf box
    "q224_mondrian_diversity" -> ((s, dir) =>
      Governance.mondrianDiversity(Tables.customer(s, dir))),
    // q225: pLSA topic model (Hofmann 1999) — 3 fixed EM rounds on the
    // 1e-9 integer grid (the q193 discipline, distributed-parameter
    // form); one row per (round, topic, word) so the oracle pins every
    // round including the hash-seeded init
    "q225_plsa_topics" -> ((s, dir) =>
      TopicModel.plsaTopicRounds(Tables.documents(s, dir), "text")),
    // q226: the final doc-topic mixtures — the table a mixture planner
    // or topic-balance audit joins
    "q226_plsa_doc_topics" -> ((s, dir) =>
      TopicModel.plsaDocTopics(Tables.documents(s, dir), "text")),
    // q227: dominant principal component of the embedding corpus —
    // exact integer grammian (per-partition partials), driver power
    // iteration on the 1e-9 grid, map-only projection pass
    "q227_pca_projection" -> ((s, dir) =>
      Pca.pcaProject(Tables.embeddings(s, dir), "embedding", "vec_id")),
    // q228: WordPiece merge candidates — q111's single-round table
    // ranked by the likelihood score n/(ln·rn) instead of raw count
    "q228_wordpiece_candidates" -> ((s, dir) =>
      Wordpiece.wordpiecePairCandidates(Tables.documents(s, dir),
        "text", k = 20)),
    // q229: per-doc token stats under the fixed WordPiece vocabulary —
    // greedy longest-match native kernel, [UNK] on dead ends (q119's
    // shape for the third tokenizer)
    "q229_wordpiece_tokens" -> ((s, dir) =>
      Wordpiece.wordpieceTokenStats(Tables.documents(s, dir), "text",
        "doc_id")),
    // q230: pLSA production inference — classify docs against the
    // trained topic-word table with one EM fold-in step (the streaming
    // gate's per-batch path, grid-exact like training)
    // r19: train + fold-in through the one shared pinned doc-term
    // counts frame (plsaAssign) — the assignTopics(docs, plsaModel(..))
    // form re-aggregated token counts the trainer had already pinned;
    // result bit-identical (same counts rows, same final pwz)
    "q230_plsa_assign" -> ((s, dir) =>
      TopicModel.plsaAssign(Tables.documents(s, dir), "text")),
    // q231: DP median per nation via the exponential mechanism —
    // integer utilities, 1e-6-grid weights, one seeded uniform per
    // group, exact cumulative-weight inversion
    "q231_dp_median" -> ((s, dir) =>
      Governance.dpMedianRelease(Tables.customer(s, dir))),
    // q232: Count-Min heavy hitters — d·w unionable counters, exact
    // top-k as the validation price, overcount = collision error
    "q232_countmin_hitters" -> ((s, dir) =>
      Sketches.countMinHeavyHitters(Tables.documents(s, dir), "text")),
    // q233: top-3 principal components by deflation — per-vector
    // projections, comp 0 dominant
    "q233_pca_components" -> ((s, dir) =>
      Pca.pcaTopComponents(Tables.embeddings(s, dir), "embedding",
        "vec_id")),
    // q234: cross-tokenizer fertility per language — both native
    // kernels in one map-only pass, one aggregation
    "q234_tokenizer_fertility" -> ((s, dir) =>
      Wordpiece.tokenizerFertility(Tables.documents(s, dir), "text",
        "lang")),
    // q235: interpolated Kneser-Ney bigram surprisal — the canonical
    // LM smoothing, scored on the q159 held-out split
    "q235_kneser_ney" -> ((s, dir) =>
      Pipelines.kneserNeySurprisal(Tables.documents(s, dir), "text",
        "doc_id")),
    // q236: Kaplan-Meier product-limit curve — q209's direct
    // survival-probability companion, integer-exact via the micro-grid
    // recurrence over the bounded duration-day table
    "q236_kaplan_meier" -> ((s, dir) =>
      Survival.kaplanMeier(Tables.events(s, dir))),
    // q237: Johnson-Lindenstrauss sign projection — 64 -> 16 dims,
    // exact integer arithmetic end to end, map-only
    "q237_random_projection" -> ((s, dir) =>
      Pca.randomProjection(Tables.embeddings(s, dir), "embedding",
        "vec_id")),
    // q238: per-source embedding-centroid drift — exact BIGINT
    // centroid sums (cosine is scale-invariant), source-table pairs
    "q238_source_drift" -> ((s, dir) =>
      Similarity.sourceCentroidDrift(Tables.documents(s, dir),
        Tables.embeddings(s, dir))),
    // q239: per-source HyperLogLog distinct-word estimate — 64
    // max-mergeable registers, exact distinct as the validation price
    "q239_hll_distinct" -> ((s, dir) =>
      Sketches.hllSourceDistinct(Tables.documents(s, dir), "text",
        "source")),
    // q240: the WordPiece TRAINER itself, oracled — 6 unrolled
    // score-ranked merge rounds (the Mondrian/EM unroll discipline
    // upgrading the trainer from spec-pinned to hash-checked)
    "q240_wordpiece_train" -> ((s, dir) =>
      Wordpiece.wordpieceTrainMerges(Tables.documents(s, dir), "text",
        numMerges = 6)),
    // q241: the BPE trainer oracled the same way — count-ranked
    "q241_bpe_train" -> ((s, dir) =>
      BpeTrain.bpeTrainMerges(Tables.documents(s, dir), "text",
        numMerges = 6)),
    // q242-q244: the mergeable sketches as TypedImperativeAggregate
    // SQL aggregates — one fixed-size buffer per (partition, group) on
    // the wire; each oracled against the SAME DuckDB chain as its
    // cell/register-table sibling (q232/q239/q217), proving the
    // aggregate path bit-identical
    "q242_cms_agg" -> ((s, dir) =>
      Sketches.countMinCellsAgg(Tables.documents(s, dir), "text")),
    "q243_hll_agg" -> ((s, dir) =>
      Sketches.hllSourceDistinctAgg(Tables.documents(s, dir), "text")),
    "q244_minhash_agg" -> ((s, dir) =>
      Sketches.sourceMinhashSketchAgg(Tables.documents(s, dir), "text")),
    // q245: GLOBAL distinct estimate by max-merging the per-source HLL
    // shards — the engine only ever merges the (src, j, mj) shard
    // table; the oracle builds registers from the undivided corpus
    "q245_hll_union" -> ((s, dir) =>
      Sketches.hllGlobalDistinct(Tables.documents(s, dir), "text",
        "source")),
    // q246: Zipf rank-frequency slope per source — grid-integer OLS
    // over each source's top-32 vocabulary, natural-language diagnostic
    "q246_zipf_slope" -> ((s, dir) =>
      TextAnalysis.zipfSlope(Tables.documents(s, dir), "text",
        "source")),
    // q247: per-source unigram KL vs corpus + token entropy —
    // distribution-level drift, grid-integer numerators
    "q247_source_kl" -> ((s, dir) =>
      TextAnalysis.sourceLexicalDrift(Tables.documents(s, dir), "text",
        "source")),
    // q248: per-source bigram transition entropy — sequence-level
    // predictability, same grid device
    "q248_bigram_entropy" -> ((s, dir) =>
      TextAnalysis.sourceBigramEntropy(Tables.documents(s, dir), "text",
        "source")),
    // q249: pairwise Jensen-Shannon divergence between sources —
    // symmetric bounded drift matrix, grid-integer shared terms +
    // closed-form only-word remainders
    "q249_source_js" -> ((s, dir) =>
      TextAnalysis.sourceJsDivergence(Tables.documents(s, dir), "text",
        "source")),
    // q250: closed-form OLS — one scan to the exact moment sums,
    // Cramer on nine driver scalars; price ~ quantity + discount
    "q250_ols_price" -> ((s, dir) =>
      Regression.olsPriceModel(Tables.lineitem(s, dir))),
    // q251: edit-distance-1 fuzzy self-join via the FastSS deletion
    // neighborhood — candidates from an equi-join on deletion keys,
    // exact levenshtein verification, never all-pairs
    "q251_fuzzy_join" -> ((s, dir) =>
      Linkage.lev1Neighbors(Tables.customer(s, dir), "c_name",
        "c_custkey")),
    // q252: the q250 fit under ridge λ=1e6 — same one-scan sums, the
    // penalty on the non-intercept diagonal
    "q252_ridge_price" -> ((s, dir) =>
      Regression.ridgePriceModel(Tables.lineitem(s, dir))),
    // q253: RFM segmentation — exact discrete-percentile boundaries
    // broadcast over the per-customer rollup, map-only scoring (no
    // global ntile window)
    "q253_rfm_segments" -> ((s, dir) =>
      Relational.rfmSegments(Tables.orders(s, dir))),
    // q254: logistic regression via IRLS — 3 Newton rounds, one
    // scalar aggregation per round, driver state = 3 doubles; oracle
    // unrolls the rounds (the Mondrian/EM discipline)
    "q254_logit" -> ((s, dir) =>
      Regression.logitSegmentModel(Tables.customer(s, dir))),
    // q255: simplified silhouette per label — cluster-quality audit,
    // exact integer centroid distances, K·d broadcast scoring pass
    "q255_silhouette" -> ((s, dir) =>
      Similarity.labelSilhouette(Tables.embeddings(s, dir))),
    // q256: exact in-sample ROC AUC of the q254 model — the grid
    // score makes the histogram bounded, so the ranking never touches
    // corpus-sized windows
    "q256_logit_auc" -> ((s, dir) =>
      Regression.logitSegmentAuc(Tables.customer(s, dir))),
    // q257: the model's precision/recall curve — one row per distinct
    // grid score, suffix sums over the bounded histogram
    "q257_pr_curve" -> ((s, dir) =>
      Regression.logitSegmentPrCurve(Tables.customer(s, dir))),
    // q258: GROUPED OLS — one model per nation fit entirely in the
    // plan (Cramer as column expressions over per-group exact sums)
    "q258_grouped_ols" -> ((s, dir) =>
      Regression.groupedOlsNation(Tables.orders(s, dir),
        Tables.customer(s, dir))),
    // q259: daily-revenue autocorrelation at lags 1..7 — exact
    // integer deviations, HUGEINT/decimal covariances, lag self-join
    // over the bounded day series
    "q259_revenue_acf" -> ((s, dir) =>
      Relational.revenueAcf(Tables.orders(s, dir))),
    // q260: day-of-week seasonality index — q259's lag-7 companion,
    // pure epoch-day arithmetic
    "q260_dow_seasonality" -> ((s, dir) =>
      Relational.dowSeasonality(Tables.orders(s, dir))),
    // q261: word burstiness (per-doc count VMR incl. zero docs) —
    // keyword-vs-glue diagnostic, windowless top-k
    "q261_burstiness" -> ((s, dir) =>
      TextAnalysis.wordBurstiness(Tables.documents(s, dir), "text",
        "doc_id")),
    // q262: hapax-legomena ratio per source — Zipf-tail health
    "q262_hapax_ratio" -> ((s, dir) =>
      TextAnalysis.hapaxRatio(Tables.documents(s, dir), "text",
        "source")),
    // q263: Theil-Sen robust daily-revenue trend — all day pairs via
    // the equi lag-join device (no BNLJ), median of pairwise slopes
    "q263_theil_sen" -> ((s, dir) =>
      Relational.theilSenTrend(Tables.orders(s, dir))),
    // q264: revenue Gini across customers — exact rank/cents sums
    // over the customer dimension, one mirrored divide
    "q264_gini" -> ((s, dir) =>
      Relational.revenueGini(Tables.orders(s, dir))),
    // q265: Benford first-digit audit of order totals — integer
    // digit plumbing, log10 expectations
    "q265_benford" -> ((s, dir) =>
      Relational.benfordAudit(Tables.orders(s, dir))),
    // q266: referential-integrity audit across every FK edge —
    // orphans + dead dimension rows, distinct-key joins only
    "q266_ref_integrity" -> ((s, dir) =>
      Relational.refIntegrityAudit(Tables.lineitem(s, dir),
        Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.part(s, dir), Tables.supplier(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    // q267: market-basket lift over order baskets at brand grain —
    // basket self-join on the order key, windowless top-k
    "q267_basket_lift" -> ((s, dir) =>
      Relational.basketLift(Tables.lineitem(s, dir),
        Tables.part(s, dir))),
    // q268: dup-cluster size histogram + singleton row — the dedup
    // run's report card, over the q55 cluster labels
    "q268_dup_cluster_sizes" -> ((s, dir) =>
      Dedup.dupClusterSizes(Tables.documents(s, dir), "text",
        "doc_id", "lang")),
    // q269: Welch's t-test URGENT vs LOW order totals — exact
    // six-scalar moments, one mirrored double chain
    "q269_welch_ttest" -> ((s, dir) =>
      Stats.welchTTest(Tables.orders(s, dir), "o_orderpriority",
        "o_totalprice", "1-URGENT", "5-LOW")),
    // q270: one-way ANOVA F across order priorities — per-group
    // moments, s_g²/n_g on the 1e6-cents² grid
    "q270_anova_f" -> ((s, dir) =>
      Stats.anovaF(Tables.orders(s, dir), "o_orderpriority",
        "o_totalprice")),
    // q271: Mann-Whitney U on quantities R vs N — tie-aware midranks
    // over the 50-value histogram, exact ×2 rank grid
    "q271_mann_whitney" -> ((s, dir) =>
      Stats.mannWhitneyU(Tables.lineitem(s, dir), "l_returnflag",
        "l_quantity", "R", "N")),
    // q272: event-type × day-of-week association — χ²/Cramér's V/MI
    // from micro-gridded cell terms over the 35-cell table
    "q272_contingency" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.contingencyStats(Tables.events(s, dir),
        f.col("event_type"),
        f.pmod(f.datediff(f.to_date(f.col("ts")),
          f.lit("1970-01-01")) + f.lit(4), f.lit(7)).cast("long"))
    }),
    // q273: Spearman/Pearson discount↔quantity — midranks from the
    // marginal histograms, exact joint-cell moment sums
    "q273_spearman" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.spearmanRho(Tables.lineitem(s, dir),
        f.round(f.lit(100.0) * f.col("l_discount")).cast("long"),
        f.col("l_quantity").cast("long"))
    }),
    // q274: Kendall τ-b discount↔quantity — dense-grid 2-D prefix
    // concordance counts, no row pairs anywhere
    "q274_kendall_tau" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.kendallTauB(Tables.lineitem(s, dir),
        f.round(f.lit(100.0) * f.col("l_discount")).cast("long"),
        f.col("l_quantity").cast("long"), yMin = 1L, yMax = 50L)
    }),
    // q275: CUSUM change-point on daily revenue — exact integer
    // deviations, one day-dimension window, deterministic argmax
    "q275_cusum" -> ((s, dir) =>
      Relational.cusumChangePoint(Tables.orders(s, dir))),
    // q276: truncated binary-kernel EWMA of daily revenue — 16 exact
    // power-of-two taps via the lag explode-join device
    "q276_ewma" -> ((s, dir) =>
      Relational.ewmaDaily(Tables.orders(s, dir))),
    // q277: Mann-Kendall trend test — pairwise signs over the lag-join
    // pair set, tie-corrected variance, continuity-corrected z
    "q277_mann_kendall" -> ((s, dir) =>
      Relational.mannKendallTrend(Tables.orders(s, dir))),
    // q278: HITS hubs/authorities on the directed customer→supplier
    // graph — grid-normalized mutual reinforcement, 3 rounds
    "q278_hits" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val e0 = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          f.col("o_orderkey") === f.col("l_orderkey"))
        .select(f.col("o_custkey").as("c"), f.col("l_suppkey").as("sk"))
        .distinct()
      val edges = e0.select((f.col("c") * f.lit(2L)).as("src"),
        (f.col("sk") * f.lit(2L) + f.lit(1L)).as("dst"))
      Graph.hitsScores(edges, "src", "dst", iters = 3)
        .select(f.when(f.col("node") % 2 === 1, f.lit("supplier"))
          .otherwise(f.lit("customer")).as("kind"),
          f.expr("node div 2").as("key"),
          f.col("hub_score"), f.col("auth_score"))
    }),
    // q279: degree assortativity of the undirected customer↔supplier
    // graph — exact five-moment sums over the doubled edge list
    "q279_assortativity" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val e0 = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          f.col("o_orderkey") === f.col("l_orderkey"))
        .select(f.col("o_custkey").as("c"), f.col("l_suppkey").as("sk"))
        .distinct()
      Graph.degreeAssortativity(
        e0.select((f.col("c") * f.lit(2L)).as("u"),
          (f.col("sk") * f.lit(2L) + f.lit(1L)).as("v")), "u", "v")
    }),
    // q280: frequent brand TRIPLES over order baskets — apriori-pruned
    // level-3 mining, windowless top-k
    "q280_basket_triples" -> ((s, dir) =>
      Relational.basketTriples(Tables.lineitem(s, dir),
        Tables.part(s, dir))),
    // q281: Cohen's kappa of the lang-ID heuristic vs the declared
    // label — chance-corrected agreement, exact integer core
    "q281_cohen_kappa" -> ((s, dir) =>
      TextAnalysis.cohenKappa(Tables.documents(s, dir), "text",
        "lang")),
    // q282: Kruskal-Wallis H on quantities across return flags —
    // histogram midranks, exact group rank sums, fold-ordered Σ R²/n
    "q282_kruskal_wallis" -> ((s, dir) =>
      Stats.kruskalWallisH(Tables.lineitem(s, dir), "l_returnflag",
        "l_quantity")),
    // q283: Durbin-Watson on daily-revenue trend residuals — exact
    // moment-sum OLS, integer-cent residual grid, day-lag window
    "q283_durbin_watson" -> ((s, dir) =>
      Relational.durbinWatson(Tables.orders(s, dir))),
    // q284: Huber robust price model — OLS init + 3 IRLS rounds on
    // the 1e6 weight grid, bounded-influence coefficients
    "q284_huber_price" -> ((s, dir) =>
      Regression.huberPriceModel(Tables.lineitem(s, dir))),
    // q285: Grubbs test on daily revenue — exact integer deviation
    // argmax, moment variance, one mirrored G
    "q285_grubbs" -> ((s, dir) =>
      Relational.grubbsOutlier(Tables.orders(s, dir))),
    // q286: seasonal-naive MASE — lag-7 forecast MAE scaled by the
    // lag-1 naive MAE, exact integer error sums on day equi-joins
    "q286_mase" -> ((s, dir) =>
      Relational.seasonalNaiveMase(Tables.orders(s, dir))),
    // q287: Jarque-Bera normality of daily revenue — exact coarse
    // raw moments, mirrored skew/kurtosis/JB chain
    "q287_jarque_bera" -> ((s, dir) =>
      Relational.jarqueBera(Tables.orders(s, dir))),
    // q288: Brown-Forsythe spread-equality across priorities — F on
    // absolute deviations from exact per-group medians
    "q288_brown_forsythe" -> ((s, dir) =>
      Stats.brownForsythe(Tables.orders(s, dir), "o_orderpriority",
        "o_totalprice")),
    // q289: two-sample Kolmogorov-Smirnov on quantities, R vs N —
    // exact integer max-ECDF-gap over the value histogram
    "q289_ks_two_sample" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.ks2Sample(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q290: two-sample Cramér-von Mises on the discount grid, R vs N
    // — the integrated ECDF gap, per-cell terms on the 1e-9 grid
    "q290_cramer_von_mises" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.cramerVonMises(Tables.lineitem(s, dir), "l_returnflag",
        f.round(f.lit(100.0) * f.col("l_discount")), "R", "N")
    }),
    // q291: Wasserstein-1 drift of whitespace-token counts between
    // the even- and odd-numbered document sources
    "q291_wasserstein_drift" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.wasserstein1(Tables.documents(s, dir),
        f.expr("cast(substr(source, 4) as int) % 2 = 0"),
        f.expr("length(text) - length(replace(text, ' ', '')) + 1"))
    }),
    // q292: Wald-Wolfowitz runs test on daily revenue — does the
    // above/below-median sequence mix, clump, or alternate?
    "q292_runs_test" -> ((s, dir) =>
      Relational.runsTest(Tables.orders(s, dir))),
    // q293: Pettitt rank change-point on daily revenue — the
    // distribution-free sibling of q275, O(days) via the rank identity
    "q293_pettitt" -> ((s, dir) =>
      Relational.pettittChangePoint(Tables.orders(s, dir))),
    // q294: Cliff's delta + CLES effect size on quantities, R vs N —
    // exact pair counts from the q271 histogram
    "q294_cliffs_delta" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.cliffsDelta(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q295: decision-stump split of quantity predicting returnflag —
    // weighted Gini over per-class cumulative histograms
    "q295_gini_stump" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.giniStump(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), Seq("A", "N", "R"))
    }),
    // q296: PSI of the priority mix, first vs second half of the
    // date range — the categorical drift gate
    "q296_psi_shift" -> ((s, dir) =>
      Relational.psiPriorityShift(Tables.orders(s, dir))),
    // q297-q299: the KMV (bottom-k) distinct sketch — the
    // order-statistic member of the mergeable-aggregate family
    "q297_kmv_sketch" -> ((s, dir) =>
      Sketches.kmvSourceSketch(Tables.documents(s, dir), "text")),
    "q298_kmv_distinct" -> ((s, dir) =>
      Sketches.kmvSourceDistinct(Tables.documents(s, dir), "text")),
    // q299: global bottom-k via shard merge; the oracle builds it
    // directly from the undivided corpus (union mergeability proof)
    "q299_kmv_union" -> ((s, dir) =>
      Sketches.kmvGlobalSketch(Tables.documents(s, dir), "text")),
    // q300: Hodges-Lehmann shift of quantities, R vs N — the robust
    // location-shift scalar from the difference histogram
    "q300_hodges_lehmann" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.hodgesLehmannShift(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q301: PACF lags 1-3 of daily revenue — Durbin-Levinson unrolled
    // over q259's exact ACF chain
    "q301_pacf" -> ((s, dir) =>
      Relational.pacfDaily(Tables.orders(s, dir))),
    // q302: per-source KS drift of token counts vs rest-of-corpus —
    // q289 run for every shard in one pass over the dense grid
    "q302_source_ks_drift" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.sourceKsDrift(Tables.documents(s, dir), f.col("source"),
        f.expr("length(text) - length(replace(text, ' ', '')) + 1"))
    }),
    // q303: per-decile quantile shift of quantities, R vs N — WHERE
    // on the distribution the cohorts moved
    "q303_quantile_shift" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.quantileShift(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q304: energy distance, R vs N quantities — the metric-aware
    // two-sample statistic from the |domain|² pair table
    "q304_energy_distance" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.energyDistance(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q305: Kuiper V = D⁺ + D⁻ on the discount grid, R vs N
    "q305_kuiper" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.kuiper2Sample(Tables.lineitem(s, dir), "l_returnflag",
        f.round(f.lit(100.0) * f.col("l_discount")), "R", "N")
    }),
    // q306: seasonal Mann-Kendall — q277 within each weekday, summed
    "q306_seasonal_mk" -> ((s, dir) =>
      Relational.seasonalMannKendall(Tables.orders(s, dir))),
    // q307: Ljung-Box portmanteau over ACF lags 1-7
    "q307_ljung_box" -> ((s, dir) =>
      Relational.ljungBox(Tables.orders(s, dir))),
    // q308: Mood's median test, R vs N quantities — 2×2 χ² of
    // above-pooled-median counts
    "q308_moods_median" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.moodsMedianTest(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q309: Ansari-Bradley scale test on the discount grid, R vs N —
    // inward-folded midrank scores, tie-conditional moments
    "q309_ansari_bradley" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.ansariBradley(Tables.lineitem(s, dir), "l_returnflag",
        f.round(f.lit(100.0) * f.col("l_discount")), "R", "N")
    }),
    // q310: per-source-pair KMV Jaccard — Broder sketch similarity
    // from the q297 state, exact word-set Jaccard as validation
    "q310_kmv_jaccard" -> ((s, dir) =>
      Sketches.kmvPairJaccard(Tables.documents(s, dir), "text")),
    // q311: Anderson-Darling two-sample on quantities, R vs N —
    // tail-weighted omnibus (discrete Scholz-Stephens A², k=2)
    "q311_anderson_darling" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.andersonDarling2(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q312: Jonckheere-Terpstra ordered trend — do quantities shift
    // monotonically with line number? (tie-corrected z)
    "q312_jonckheere" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.jonckheereTerpstra(Tables.lineitem(s, dir),
        f.col("l_linenumber"), f.col("l_quantity"))
    }),
    // q313: Lepage location-scale omnibus on the discount grid, R vs
    // N — z_Wilcoxon² + z_AnsariBradley² off one histogram
    "q313_lepage" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.lepage(Tables.lineitem(s, dir), "l_returnflag",
        f.round(f.lit(100.0) * f.col("l_discount")), "R", "N")
    }),
    // q314: Cucconi location-scale test on quantities, R vs N —
    // squared-rank U/V with null correlation rho
    "q314_cucconi" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.cucconi(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q315: Cochran-Armitage trend — is the F(inalized)-status rate
    // monotone in order priority (scores 1..5)?
    "q315_cochran_armitage" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.cochranArmitage(Tables.orders(s, dir),
        f.substring(f.col("o_orderpriority"), 1, 1).cast("int"),
        (f.col("o_orderstatus") === "F").cast("int"))
    }),
    // q316: McNemar paired flags — per customer, has-F-order vs
    // has-O-order; discordant-count chi2 with continuity correction
    "q316_mcnemar" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val per = Tables.orders(s, dir).groupBy(f.col("o_custkey"))
        .agg(f.max((f.col("o_orderstatus") === "F").cast("long"))
            .as("x"),
          f.max((f.col("o_orderstatus") === "O").cast("long")).as("y"))
      Stats.mcnemar(per, f.col("x"), f.col("y"))
    }),
    // q317: Brunner-Munzel on quantities, R vs N — nonparametric
    // Behrens-Fisher (unequal-variance rank test), all-integer S_i
    "q317_brunner_munzel" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.brunnerMunzel(Tables.lineitem(s, dir), "l_returnflag",
        f.col("l_quantity"), "R", "N")
    }),
    // q318: cross-correlation daily revenue x daily order count at
    // lags -7..7 — the lead-lag diagnostic (q259's ACF, two series)
    "q318_ccf_daily" -> ((s, dir) =>
      Relational.ccfDaily(Tables.orders(s, dir))),
    // q319: augmented Dickey-Fuller unit root on daily revenue —
    // exact-moment OLS of the lag frame, t on the level coefficient
    "q319_adf_test" -> ((s, dir) =>
      Relational.adfTest(Tables.orders(s, dir))),
    // q320: KPSS level stationarity (lag-0) — partial sums of the
    // n-scaled deviations over the day table
    "q320_kpss_test" -> ((s, dir) =>
      Relational.kpssTest(Tables.orders(s, dir))),
    // q321: Chow structural break at the calendar midpoint — two
    // half-range trend fits vs pooled, exact-moment SSEs
    "q321_chow_test" -> ((s, dir) =>
      Relational.chowTest(Tables.orders(s, dir))),
    // q322: Bartlett variance equality across order priorities —
    // sorted-fold ln reductions, standard correction
    "q322_bartlett" -> ((s, dir) =>
      Stats.bartlett(Tables.orders(s, dir), "o_orderpriority",
        "o_totalprice")),
    // q323: G-test (log-likelihood ratio) on the q272 cells —
    // observed-cells-only ln terms on the 1e9 grid
    "q323_g_test" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.gTest(Tables.events(s, dir), f.col("event_type"),
        f.pmod(f.datediff(f.to_date(f.col("ts")),
          f.lit("1970-01-01")) + f.lit(4), f.lit(7)).cast("long"))
    }),
    // q324: Welch's ANOVA across order priorities — unequal-variance
    // one-way F, two sorted k-element folds
    "q324_welch_anova" -> ((s, dir) =>
      Stats.welchAnova(Tables.orders(s, dir), "o_orderpriority",
        "o_totalprice")),
    // q325: Tukey HSD pairwise q over the priority groups — the q270
    // post-hoc, Tukey-Kramer unequal-n form
    "q325_tukey_hsd" -> ((s, dir) =>
      Stats.tukeyHsd(Tables.orders(s, dir), "o_orderpriority",
        "o_totalprice")),
    // q326: odds ratio / relative risk with Wald CI on the q316
    // per-customer paired flags
    "q326_odds_ratio" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val per = Tables.orders(s, dir).groupBy(f.col("o_custkey"))
        .agg(f.max((f.col("o_orderstatus") === "F").cast("long"))
            .as("x"),
          f.max((f.col("o_orderstatus") === "O").cast("long")).as("y"))
      Stats.oddsRatio(per, f.col("x"), f.col("y"))
    }),
    // q327: Friedman two-way rank test — priority effect blocked by
    // day-of-week, exact cross-multiplied within-block ranks
    "q327_friedman" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.friedman(Tables.orders(s, dir),
        f.pmod(f.datediff(f.to_date(f.col("o_orderdate")),
          f.lit("1970-01-01")) + f.lit(4), f.lit(7)).cast("long"),
        f.col("o_orderpriority"), f.col("o_totalprice"))
    }),
    // q328: two-group log-rank — id-parity cohorts over the q209
    // survival semantics, O−E / V sums on the 1e9 grid
    "q328_log_rank" -> ((s, dir) =>
      graft.operators.Survival.logRank(Tables.events(s, dir))),
    // q329: Mantel-Haenszel pooled OR across customer nations —
    // q326's association controlled for geography
    "q329_mantel_haenszel" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val per = Tables.orders(s, dir).groupBy(f.col("o_custkey"))
        .agg(f.max((f.col("o_orderstatus") === "F").cast("long"))
            .as("x"),
          f.max((f.col("o_orderstatus") === "O").cast("long")).as("y"))
        .join(Tables.customer(s, dir)
          .select(f.col("c_custkey").as("o_custkey"),
            f.col("c_nationkey")), Seq("o_custkey"))
      Stats.mantelHaenszel(per, f.col("c_nationkey").cast("long"),
        f.col("x"), f.col("y"))
    }),
    // q330: Cohen's d / Hedges' g for R vs N extended prices — the
    // standardized effect size q269's t only hints at
    "q330_hedges_g" -> ((s, dir) =>
      Stats.hedgesG(Tables.lineitem(s, dir), "l_returnflag",
        "l_extendedprice", "R", "N")),
    // q331: two-group Poisson rate test — purchase rate per user in
    // the id-parity cohorts, conditional-binomial z
    "q331_poisson_rate" -> ((s, dir) =>
      Stats.poissonTwoRate(Tables.events(s, dir))),
    // q332: ICC(1,1) of order values grouped by weekday — one-way
    // random-effects variance decomposition with the unequal-n k0
    "q332_icc" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.icc1(Tables.orders(s, dir),
        f.pmod(f.datediff(f.to_date(f.col("o_orderdate")),
          f.lit("1970-01-01")) + f.lit(4), f.lit(7)).cast("long"),
        f.col("o_totalprice"))
    }),
    // q333: Cronbach's alpha over the lineitem rate items
    // (quantity/discount/tax on the cents grid)
    "q333_cronbach" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.cronbachAlpha(Tables.lineitem(s, dir),
        Seq(f.col("l_quantity"), f.col("l_discount"), f.col("l_tax")))
    }),
    // q334: Bartels rank von Neumann on daily revenue — rank-based
    // serial randomness (runs test upgraded)
    "q334_bartels_rvn" -> ((s, dir) =>
      Relational.bartelsRvn(Tables.orders(s, dir))),
    // q335: Kendall's W — q327's agreement effect size off the same
    // exact within-block ranks
    "q335_kendall_w" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.kendallW(Tables.orders(s, dir),
        f.pmod(f.datediff(f.to_date(f.col("o_orderdate")),
          f.lit("1970-01-01")) + f.lit(4), f.lit(7)).cast("long"),
        f.col("o_orderpriority"), f.col("o_totalprice"))
    }),
    // q336: split-half reliability (quantity vs discount+tax) with
    // the Spearman-Brown step-up
    "q336_split_half" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.splitHalf(Tables.lineitem(s, dir), f.col("l_quantity"),
        f.col("l_discount") + f.col("l_tax"))
    }),
    // q337: Goldfeld-Quandt heteroskedasticity — low/high quantity
    // regimes by exact percentile cuts, per-regime 2x2-Cramer SSEs
    "q337_goldfeld_quandt" -> ((s, dir) =>
      Regression.goldfeldQuandt(Tables.lineitem(s, dir))),
    // q338: Breusch-Pagan LM on the q250 price model — in-plan beta,
    // cents-grid residuals, one aux exact-moment regression
    "q338_breusch_pagan" -> ((s, dir) =>
      Regression.breuschPagan(Tables.lineitem(s, dir))),
    // q339: Page's trend — ordered priority effect within weekday
    // blocks (q312's question, blocked)
    "q339_page_trend" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.pageTrend(Tables.orders(s, dir),
        f.pmod(f.datediff(f.to_date(f.col("o_orderdate")),
          f.lit("1970-01-01")) + f.lit(4), f.lit(7)).cast("long"),
        f.substring(f.col("o_orderpriority"), 1, 1).cast("int"),
        f.col("o_totalprice"))
    }),
    // q340: Cochran's Q — per-customer quarter-presence flags, did
    // propensity differ across quarters
    "q340_cochran_q" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.cochranQ(Tables.orders(s, dir), f.col("o_custkey"),
        f.quarter(f.to_date(f.col("o_orderdate"))).cast("long"),
        f.lit(1L))
    }),
    // q342: two-proportion z + Wilson intervals — discounted-line
    // rate, R vs N
    "q342_two_proportion" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      Stats.twoProportionZ(Tables.lineitem(s, dir), "l_returnflag",
        (f.col("l_discount") > 0.0).cast("long"), "R", "N")
    }),
    // q341: sign test — per-customer order counts, first vs second
    // calendar half (the q321 midpoint device)
    "q341_sign_test" -> ((s, dir) => {
      val f = org.apache.spark.sql.functions
      val daily = Tables.orders(s, dir).select(f.col("o_custkey"),
        f.datediff(f.to_date(f.col("o_orderdate")),
          f.lit("1970-01-01")).cast("long").as("d"))
      val mid = daily.agg(
        f.floor((f.min(f.col("d")) + f.max(f.col("d"))) / f.lit(2L))
          .cast("long").as("mid"))
      val per = daily.crossJoin(f.broadcast(mid))
        .groupBy(f.col("o_custkey"))
        .agg(f.sum(f.when(f.col("d") <= f.col("mid"), f.lit(1L))
            .otherwise(f.lit(0L))).as("x"),
          f.sum(f.when(f.col("d") > f.col("mid"), f.lit(1L))
            .otherwise(f.lit(0L))).as("y"))
      Stats.signTest(per, f.col("x"), f.col("y"))
    }),
    // q343: scalable Theil-Sen — q263's production variant on the
    // deterministic dyadic lag ladder (days·13 pairs, not days·4000)
    "q343_theil_sen_ladder" -> ((s, dir) =>
      Relational.theilSenTrendLadder(Tables.orders(s, dir))),
    // q344: Poisson-bootstrap CI for the mean order value — seeded-hash
    // replicate weights, exact integer weighted sums, percentile_disc
    // bounds over the 64 replicate means
    "q344_bootstrap_ci" -> ((s, dir) =>
      Resampling.bootstrapMeanCi(Tables.orders(s, dir))),
    // q345: randomization test for the R-vs-N mean price difference —
    // 100 deterministic hash-parity label reassignments, add-one p
    "q345_permutation_test" -> ((s, dir) =>
      Resampling.permutationMeanTest(Tables.lineitem(s, dir))),
  )

  /** q205's released group universe (plan literal, mirrored in the
    * oracle; sorted — the index is the noise seed).
    */
  val NoisedReleaseTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** q198's fixed phrase list (plan literal, mirrored in the oracle). */
  val BlocklistPatterns: Seq[String] =
    Seq("table", "key agg", "row scan", "value", "fast", "a a")

  /** q155 query terms, shared with the oracle builder. */
  private val Bm25QueryTerms: Seq[String] = Seq("table", "join", "scan", "hash")

  /** q136 parameters, shared with the oracle builder. */
  private val TemperatureWeights: Map[String, Double] = Map(
    "en" -> 0.4, "zh" -> 0.2, "de" -> 0.15, "fr" -> 0.15, "es" -> 0.1)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_clicked_display" ->
      """SELECT c.user_id AS user_id, v.event_id AS view_id, c.event_id AS click_id,
        |       v.ts AS view_ts, c.ts AS click_ts
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts""".stripMargin,
    "q2_missed_display" ->
      """SELECT v.user_id AS user_id, v.event_id AS event_id, v.ts AS ts
        |FROM events v
        |WHERE v.event_type = 'view'
        |  AND NOT EXISTS (
        |    SELECT 1 FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = v.user_id
        |      AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR)""".stripMargin,
    "q3_time_shift" ->
      """SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type,
        |       value, props, 'events.1h' AS stream
        |FROM events""".stripMargin,
    "q4_join_merge_json" ->
      """SELECT c.user_id AS user_id,
        |       '{"display":{"event_id":' || v.event_id || '},"click":{"event_id":' || c.event_id || '}}' AS payload
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts""".stripMargin,
    "q5_view_outcomes" ->
      """SELECT v.event_id AS event_id, v.user_id AS user_id, v.ts AS ts,
        |       CASE WHEN EXISTS (
        |         SELECT 1 FROM events c
        |         WHERE c.event_type = 'click' AND c.user_id = v.user_id
        |           AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR)
        |       THEN 'joined' ELSE 'missed' END AS status
        |FROM events v WHERE v.event_type = 'view'""".stripMargin,
    "q6_dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,
    "q7_similarity_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 10),
        |cand AS (
        |  SELECT probe_id, e.vec_id,
        |         list_dot_product(p, v) /
        |         (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(v, v))) AS s
        |  FROM probes, e WHERE e.vec_id != probe_id)
        |SELECT probe_id, vec_id, round(s, 6) AS sim, rank FROM (
        |  SELECT probe_id, vec_id, s,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rank
        |  FROM cand) WHERE rank <= 10""".stripMargin,
    "q8_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
        |       CAST(sum(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "q9_multimodal_join" ->
      """SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars,
        |       CAST(e.label AS BIGINT) AS label,
        |       round(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                   CAST(e.embedding AS DOUBLE[]))), 6) AS vec_norm
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin,
    // q10/q11 (validated near-dup gates): the oracle recomputes the EXACT
    // near-dup pair set and its exact Jaccard (the deterministic columns)
    // and pins recall_ok to the constant 1 — a wrong pair, a wrong
    // similarity, or an out-of-band LSH recall all fail the hash compare.
    // Spark computes Jaccard over xxhash64'd element sets (HashedSetExprs:
    // a 64-bit collision perturbs one pair's Jaccard by ~1/|set| with
    // ~1e-13 odds); the oracle computes it over the raw string sets — the
    // values agree absent such a collision.
    "q10_dedup_minhash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(length(nt) - 4, 1) + 1),
        |      i -> nt[i:i+4])) AS g
        |  FROM (SELECT doc_id,
        |          regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS nt
        |        FROM documents))
        |SELECT doc_a, doc_b, round(j, 6) AS jaccard, 1 AS recall_ok FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         len(list_intersect(a.g, b.g)) /
        |         CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS j
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |WHERE j >= 0.7""".stripMargin,
    "q11_dedup_simhash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(length(nt) - 4, 1) + 1),
        |      i -> nt[i:i+4])) AS g
        |  FROM (SELECT doc_id,
        |          regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS nt
        |        FROM documents))
        |SELECT doc_a, doc_b, round(j, 6) AS jaccard, 1 AS recall_ok FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         len(list_intersect(a.g, b.g)) /
        |         CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS j
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |WHERE j >= 0.7""".stripMargin,
    "q12_dedup_ngram" ->
      """WITH d AS (SELECT doc_id, lang,
        |  list_distinct(list_transform(
        |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
        |  FROM documents)
        |SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         len(list_intersect(a.g, b.g)) / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS j
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |WHERE j >= 0.5""".stripMargin,
    "q13_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured,
        |  CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |  round(len(regexp_extract_all(text, '[^\w\s]')) / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
        |  round(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) / greatest(CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS DOUBLE), 1.0), 6) AS stopword_ratio,
        |  round(CAST(length(text) AS DOUBLE) / greatest(CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS DOUBLE), 1.0), 6) AS mean_token_len
        |FROM documents""".stripMargin,
    "q14_lang_id" ->
      """SELECT doc_id,
        |  CASE WHEN greatest(h_en, h_de, h_fr, h_es) <= 0 THEN 'und'
        |       WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
        |       WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
        |       WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
        |       ELSE 'es' END AS lang_pred
        |FROM (SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS h_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|eine|zu|den)\b')) AS h_de,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|des|du|que|pas)\b')) AS h_fr,
        |  len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|del|que|por|con|para)\b')) AS h_es
        |  FROM documents)""".stripMargin,
    "q15_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ''),
        |                     c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents""".stripMargin,
    // q16: the STUB decode is deterministic byte arithmetic, so it IS
    // DuckDB-expressible (blob hex + per-byte list fold) — promoted to a
    // full hash-checked oracle row.
    "q16_media_features" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |         encode(text) AS p
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, media_type, octet_length(p) AS n, hex(p) AS hx FROM b)
        |SELECT doc_id, media_type,
        |  CAST(n AS BIGINT) AS n_bytes,
        |  CAST(greatest(1, n % 97) AS INTEGER) AS width,
        |  CAST(greatest(1, n // greatest(1, greatest(1, n % 97))) AS INTEGER) AS height,
        |  CAST(list_sum(list_transform(range(1, n + 1),
        |        i -> (strpos('0123456789ABCDEF', hx[2*i-1]) - 1) * 16
        |           + (strpos('0123456789ABCDEF', hx[2*i]) - 1))) AS DOUBLE) / n AS mean_intensity
        |FROM m""".stripMargin,
    // q17/q32 (validated ANN): the oracle recomputes the exact brute-force
    // top-k (the proven q7 shape) and pins recall_ok to 1 — wrong
    // neighbors/scores/ranks or an out-of-band index recall all fail the
    // hash compare.
    "q17_similarity_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 10),
        |cand AS (
        |  SELECT probe_id, e.vec_id,
        |         list_dot_product(p, v) /
        |         (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(v, v))) AS s
        |  FROM probes, e WHERE e.vec_id != probe_id)
        |SELECT probe_id, vec_id, round(s, 6) AS sim, rank, 1 AS recall_ok FROM (
        |  SELECT probe_id, vec_id, s,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rank
        |  FROM cand) WHERE rank <= 10""".stripMargin,
    "q32_similarity_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 10),
        |cand AS (
        |  SELECT probe_id, e.vec_id,
        |         list_dot_product(p, v) /
        |         (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(v, v))) AS s
        |  FROM probes, e WHERE e.vec_id != probe_id)
        |SELECT probe_id, vec_id, round(s, 6) AS sim, rank, 1 AS recall_ok FROM (
        |  SELECT probe_id, vec_id, s,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rank
        |  FROM cand) WHERE rank <= 10""".stripMargin,
    // q18 (validated near-dup gate): exact all-pairs cosine set, oracled;
    // recall_ok pins the hyperplane-LSH operator at its measured
    // low-threshold operating point.
    "q18_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT id_a, id_b, round(s, 6) AS sim, 1 AS recall_ok FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_dot_product(a.v, b.v) /
        |         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS s
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE s >= 0.35""".stripMargin,
    // q19: the disjunctive brackets evaluate identically in both engines;
    // revenue uses the shared integer-micros exact-sum kernel.
    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |       AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
        |       AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q20_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q21_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q22_supplier_monthly" ->
      """WITH monthly AS (
        |  SELECT l_suppkey, date_trunc('month', l_shipdate) AS month,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(20,6)) AS revenue
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, month, CAST(revenue AS DOUBLE) AS revenue,
        |  CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY revenue DESC, month) AS BIGINT) AS rank_in_supp,
        |  CAST(lag(revenue, 1) OVER (PARTITION BY l_suppkey ORDER BY month) AS DOUBLE) AS prev_revenue,
        |  CAST(sum(revenue) OVER (PARTITION BY l_suppkey ORDER BY month
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
        |FROM monthly""".stripMargin,
    "q23_returns_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q24_view_click_sets" ->
      """SELECT 'view_only' AS tag, user_id FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        |UNION ALL
        |SELECT 'both' AS tag, user_id FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click')""".stripMargin,
    "q25_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""".stripMargin,
    "q26_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q27_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q30_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,
    "q31_json_render" ->
      """SELECT c.user_id AS user_id,
        |  to_json(struct_pack(view_id := v.event_id, click_id := c.event_id))::VARCHAR AS payload
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts""".stripMargin,
    "q28_daily_windows" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q33_click_attribution" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id, c.ts AS click_ts,
        |  (SELECT v.event_id FROM events v
        |   WHERE v.event_type = 'view' AND v.user_id = c.user_id
        |     AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_id,
        |  (SELECT v.ts FROM events v
        |   WHERE v.event_type = 'view' AND v.user_id = c.user_id
        |     AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_ts
        |FROM events c WHERE c.event_type = 'click'""".stripMargin,
    "q34_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // q45: like q39, the ASCII corpus makes DuckDB's per-character
    // substring equivalent to the byte striding of the stub resizer.
    "q45_media_resize" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |s AS (SELECT doc_id, text, n, greatest(1, n // 64) AS stride FROM b)
        |SELECT doc_id,
        |  CAST(least(64, len(range(0, n, stride))) AS INTEGER) AS n_px,
        |  md5(array_to_string(list_transform(
        |        range(1, least(64, len(range(0, n, stride))) + 1),
        |        k -> substring(text, CAST((k - 1) * stride + 1 AS BIGINT), 1)), '')) AS px_md5
        |FROM s""".stripMargin,
    "q40_clean_corpus" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents),
        |k AS (SELECT lang, text FROM d WHERE rn = 1),
        |q AS (
        |  SELECT lang,
        |         len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS n_tokens,
        |         len(regexp_extract_all(text, '[^\w\s]')) /
        |           greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio
        |  FROM k)
        |SELECT lang, count(*) AS n_docs_kept,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM q
        |WHERE n_tokens >= 10 AND punct_ratio <= 0.2
        |GROUP BY lang""".stripMargin,
    // q39: the frame payloads are byte slices of the (all-ASCII) text
    // corpus, so DuckDB's character substring + md5(VARCHAR) — which
    // hashes the UTF-8 bytes — reproduces the byte-slice digests exactly.
    "q39_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |f AS (
        |  SELECT doc_id, n, text,
        |         unnest(range(0, greatest(n // 64, 1), 2)) AS i
        |  FROM b)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |       CAST(i * 64 AS BIGINT) AS "offset",
        |       md5(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_md5
        |FROM f""".stripMargin,
    "q42_top_terms_per_lang" ->
      """WITH t AS (
        |  SELECT lang,
        |         unnest(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |c AS (SELECT lang, term, count(*) AS n FROM t GROUP BY 1, 2)
        |SELECT lang, term, n, rank FROM (
        |  SELECT lang, term, n,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS BIGINT) AS rank
        |  FROM c) WHERE rank <= 5""".stripMargin,
    "q43_orders_profile" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_totalprice,
        |  count(DISTINCT o_orderstatus) AS distinct_status,
        |  count(DISTINCT o_orderpriority) AS distinct_priority,
        |  count(DISTINCT o_custkey) AS distinct_custkeys,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  min(o_orderdate) AS first_order,
        |  max(o_orderdate) AS last_order
        |FROM orders""".stripMargin,
    "q41_order_price_ranks" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "q37_value_percentiles" ->
      """SELECT event_type,
        |       quantile_cont(value, 0.5) AS p50,
        |       quantile_cont(value, 0.95) AS p95,
        |       quantile_cont(value, 0.99) AS p99,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q38_embedding_quant" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |err AS (SELECT vec_id, scale, len(v) AS n,
        |  CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
        |       ELSE list_transform(v, x ->
        |         x - scale * greatest(-127.0, least(127.0, floor(x / scale + 0.5))))
        |  END AS errs
        |  FROM s)
        |SELECT vec_id, scale,
        |  list_max(list_transform(errs, x -> abs(x))) AS max_abs_err,
        |  list_reduce(list_prepend(0.0, list_transform(errs, x -> x * x)),
        |              (a, b) -> a + b) / n AS mse
        |FROM err""".stripMargin,
    "q36_tfidf_terms" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(c) AS n_toks FROM tf GROUP BY 1),
        |dfr AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |         (CAST(tf.c AS DOUBLE) / dl.n_toks) * ln(n.n_docs / dfr.dfreq) AS score
        |  FROM tf
        |  JOIN dl USING (doc_id)
        |  JOIN dfr USING (term)
        |  CROSS JOIN n)
        |SELECT doc_id, term, round(score, 6) AS tfidf, rank FROM (
        |  SELECT doc_id, term, score,
        |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
        |  FROM s) WHERE rank <= 3""".stripMargin,
    "q35_price_bands" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('micro', 0.0, 25000.0),
        |  ('small', 25000.0, 80000.0),
        |  ('mid', 80000.0, 200000.0),
        |  ('large', 200000.0, 350000.0),
        |  ('jumbo', 350000.0, 1000000.0))
        |SELECT band, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders o JOIN bands b
        |  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        |GROUP BY band""".stripMargin,
    // q46: rule thresholds compare the UNROUNDED ratios in both engines;
    // the rounded ratio columns are display-only.
    "q46_quality_rules" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
        |ta AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |              CAST(count(*) AS BIGINT) AS n_distinct,
        |              CAST(max(c) AS BIGINT) AS top_token_c
        |       FROM tc GROUP BY 1),
        |bgl AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM d),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg FROM bgl),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        |ba AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_c FROM bc GROUP BY 1),
        |j AS (SELECT ta.doc_id, n_toks, n_distinct, top_token_c,
        |             CAST(coalesce(ba.top_bigram_c, 0) AS BIGINT) AS top_bigram_c,
        |             n_distinct / greatest(CAST(n_toks AS DOUBLE), 1.0) AS ttr_raw,
        |             top_token_c / greatest(CAST(n_toks AS DOUBLE), 1.0) AS tok_raw,
        |             CAST(coalesce(ba.top_bigram_c, 0) AS BIGINT)
        |               / greatest(CAST(n_toks AS DOUBLE) - 1.0, 1.0) AS bg_raw
        |      FROM ta LEFT JOIN ba ON ta.doc_id = ba.doc_id)
        |SELECT doc_id, n_toks, n_distinct, top_token_c, top_bigram_c,
        |  round(ttr_raw, 6) AS ttr,
        |  round(tok_raw, 6) AS top_token_frac,
        |  round(bg_raw, 6) AS top_bigram_frac,
        |  CAST(n_toks < 15 AS INTEGER) AS r_short,
        |  CAST(ttr_raw < 0.4 AS INTEGER) AS r_low_div,
        |  CAST(tok_raw > 0.12 AS INTEGER) AS r_rep_token,
        |  CAST(bg_raw > 0.06 AS INTEGER) AS r_rep_bigram,
        |  CAST(n_toks >= 15 AND ttr_raw >= 0.4 AND tok_raw <= 0.12
        |       AND bg_raw <= 0.06 AS INTEGER) AS keep
        |FROM j""".stripMargin,
    // q47: counts are staged exactly like the replacements (emails counted
    // on raw text, phones on email-redacted, IPs on phone-redacted) — in
    // BOTH engines — so the audit counts always equal the substitutions
    // actually made, even when patterns overlap.
    "q47_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id || '@example.com or +1-555-' ||
        |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |         ' ip 10.0.' || (doc_id % 256) || '.7' AS t
        |  FROM documents),
        |s1 AS (
        |  SELECT doc_id, t,
        |         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                        '<EMAIL>', 'g') AS t1
        |  FROM p),
        |s2 AS (
        |  SELECT doc_id, t, t1,
        |         regexp_replace(t1, '\+?\d[\d-]{6,}\d', '<PHONE>', 'g') AS t2
        |  FROM s1)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t1, '\+?\d[\d-]{6,}\d')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t2, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(t2, '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM s2""".stripMargin,
    "q48_incremental_dedup" ->
      """SELECT b.doc_id AS doc_id, b.lang AS lang, b.n_chars AS n_chars
        |FROM documents b
        |WHERE b.doc_id % 2 = 1
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents c
        |    WHERE c.doc_id % 2 = 0 AND c.text = b.text)""".stripMargin,
    "q49_train_split" ->
      """SELECT doc_id,
        |       ((((doc_id % 1000003) * 2654435761) >> 16) % 100) AS bucket,
        |       CASE WHEN ((((doc_id % 1000003) * 2654435761) >> 16) % 100) < 80 THEN 'train'
        |            WHEN ((((doc_id % 1000003) * 2654435761) >> 16) % 100) < 90 THEN 'valid'
        |            ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    // q50: the oracle reads the PARQUET source directly — matching hashes
    // prove the engine's ORC write→read hop changed nothing.
    "q50_orc_roundtrip" ->
      """SELECT lang,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(fp) AS BIGINT) AS fp_sum
        |FROM (
        |  SELECT lang, n_chars,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ''),
        |                       c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |  FROM documents)
        |GROUP BY lang""".stripMargin,
    // q51: the bloom pass is an optimization only — the oracle is the
    // plain exact semi-join.
    "q51_bloom_semi_join" ->
      """SELECT l_returnflag,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem l
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,
    "q52_event_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup
        |FROM events GROUP BY 1""".stripMargin,
    "q53_price_distribution" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q54_token_positions" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
        |FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM d)""".stripMargin,
    // q55: the oracle computes the same components via a recursive CTE
    // (transitive closure + min label) over the q12-shape pairs.
    "q55_dedup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |      i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
        |  FROM documents),
        |p AS (
        |  SELECT t.a, t.b FROM (
        |    SELECT a.doc_id AS a, b.doc_id AS b,
        |           len(list_intersect(a.g, b.g)) / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS j
        |    FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id) t
        |  WHERE t.j >= 0.5),
        |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach(id, lab) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.id)
        |SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id""".stripMargin,
    "q56_stratified_sample" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE ((((doc_id % 1000003) * 2654435761) >> 16) % 100) <
        |  CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30
        |            WHEN 'fr' THEN 20 WHEN 'es' THEN 10 ELSE 100 END""".stripMargin,
    "q57_label_centroids" ->
      """SELECT label, CAST(i - 1 AS INTEGER) AS dim,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
        |        / (count(*) * 1000000.0), 6) AS mean_val
        |FROM (SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i
        |      FROM embeddings)
        |GROUP BY label, i""".stripMargin,
    // q58: the windowed sum stays exact DECIMAL inside the frame; only the
    // final division happens in double (identical IEEE op both engines).
    "q58_moving_average" ->
      """WITH daily AS (
        |  SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
        |         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT CAST(epoch_day AS BIGINT) AS epoch_day,
        |  CAST(rev AS DOUBLE) AS day_revenue,
        |  CAST(sum(rev) OVER w AS DOUBLE) AS sum_win,
        |  round(CAST(sum(rev) OVER w AS DOUBLE) / (count(*) OVER w), 6) AS avg_win
        |FROM daily
        |WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q59_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
        |  round(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS DOUBLE)
        |        / greatest(CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS DOUBLE), 1.0), 6) AS bpe_per_word
        |FROM documents""".stripMargin,
    "q60_price_histogram" ->
      """SELECT bucket,
        |       0.0 + bucket * 25000.0 AS bucket_lo,
        |       count(*) AS n_orders
        |FROM (
        |  SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), 0.0), 19.0) AS INTEGER) AS bucket
        |  FROM orders)
        |GROUP BY bucket""".stripMargin,
    // q61: the corpus is ASCII so bytes == characters; group-sum float
    // noise (~1e-16) is far inside the 1e-6 rounding grid.
    "q61_byte_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM freq GROUP BY 1)
        |SELECT f.doc_id AS doc_id,
        |  CAST(t.n AS BIGINT) AS n_bytes,
        |  CAST(count(*) AS BIGINT) AS n_distinct_bytes,
        |  round(-sum((c / t.n) * ln(c / t.n)), 6) AS entropy_nats
        |FROM freq f JOIN tot t ON f.doc_id = t.doc_id
        |GROUP BY f.doc_id, t.n""".stripMargin,
    "q62_top_order_lateral" ->
      """SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
        |       t.o_orderkey AS o_orderkey, t.o_totalprice AS o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t""".stripMargin,
    "q63_returns_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    // q64: the oracle parses the props strings with regexes so it needs no
    // DuckDB json extension (LOAD json is not guaranteed in the checker);
    // Spark runs the REAL map<string,bigint> parse+explode. ALL key/value
    // pairs are extracted (positionally-aligned unnest of the two lists),
    // mirroring the full map explode — so multi-key props rows stay in
    // parity rather than silently comparing only the first pair.
    "q64_props_map" ->
      """WITH kv AS (
        |  SELECT regexp_extract_all(props, '"(\w+)"\s*:', 1) AS ks,
        |         regexp_extract_all(props, ':\s*(-?\d+)', 1) AS vs
        |  FROM events),
        |x AS (SELECT unnest(ks) AS k, CAST(unnest(vs) AS BIGINT) AS v FROM kv)
        |SELECT k,
        |  count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(min(v) AS BIGINT) AS min_v,
        |  CAST(max(v) AS BIGINT) AS max_v
        |FROM x GROUP BY 1""".stripMargin,
    "q65_user_active_days" ->
      """SELECT user_id, count(DISTINCT date_trunc('day', ts)) AS n_active_days
        |FROM events GROUP BY user_id""".stripMargin,
    "q66_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |        AND e.ts <= v.t1 + INTERVAL 1 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |        AND e.ts <= c.t2 + INTERVAL 1 DAY GROUP BY 1)
        |SELECT stage, count(*) AS n_users FROM (
        |  SELECT v.user_id,
        |    1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |      + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS stage
        |  FROM v LEFT JOIN c ON v.user_id = c.user_id
        |         LEFT JOIN p ON v.user_id = p.user_id)
        |GROUP BY stage""".stripMargin,
    "q67_view_click_outer" ->
      """WITH v AS (SELECT user_id AS v_user, count(*) AS n_views FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT user_id AS c_user, count(*) AS n_clicks FROM events
        |      WHERE event_type = 'click' GROUP BY 1)
        |SELECT coalesce(v_user, c_user) AS user_id,
        |  coalesce(n_views, 0) AS n_views,
        |  coalesce(n_clicks, 0) AS n_clicks,
        |  CASE WHEN v_user IS NULL THEN 'click_only'
        |       WHEN c_user IS NULL THEN 'view_only'
        |       ELSE 'both' END AS presence
        |FROM v FULL OUTER JOIN c ON v_user = c_user""".stripMargin,
    "q68_upsert" ->
      """WITH changes AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |         o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
        |       coalesce(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |       coalesce(c.o_totalprice, b.o_totalprice) AS o_totalprice,
        |       coalesce(c.o_orderdate, b.o_orderdate) AS o_orderdate,
        |       coalesce(c.o_orderpriority, b.o_orderpriority) AS o_orderpriority
        |FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey""".stripMargin,
    // q69: same n-gram construction as q12's oracle (list machinery), but
    // the pairing is the train/bench slice split and the join is via
    // unnest (gram-level equi-join) — the all-pairs list_intersect form
    // would be quadratic in documents at sf0.1.
    "q69_contamination" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 3, 1) + 1),
        |      i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+3], ' '))) AS g
        |  FROM documents),
        |t AS (SELECT doc_id AS train_id, len(g) AS n_train, unnest(g) AS gram
        |      FROM d WHERE doc_id % 10 <> 7),
        |b AS (SELECT doc_id AS bench_id, unnest(g) AS gram
        |      FROM d WHERE doc_id % 10 = 7)
        |SELECT train_id, bench_id, count(*) AS n_shared,
        |       round(count(*) / CAST(any_value(n_train) AS DOUBLE), 6) AS overlap
        |FROM t JOIN b USING (gram)
        |GROUP BY train_id, bench_id
        |HAVING count(*) >= 2""".stripMargin,
    // q70: chr(769)/chr(776) are the combining acute/diaeresis — the
    // decomposed suffix Spark appends as literal ́/̈ escapes.
    "q70_nfc_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' no' || chr(776) || 'el #' || doc_id AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(t) AS BIGINT) AS n_chars_raw,
        |  CAST(length(nfc_normalize(t)) AS BIGINT) AS n_chars_nfc,
        |  nfc_normalize(t) AS nfc
        |FROM u""".stripMargin,
    "q71_cohort_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |c AS (SELECT user_id, day,
        |             min(day) OVER (PARTITION BY user_id) AS cohort_day
        |      FROM d)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |       count(DISTINCT user_id) AS n_users
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q72_event_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS curr_type, count(*) AS n
        |FROM o WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // q73: both engines compare in DOUBLE (CAST before multiplying) so the
    // threshold boundary is the same IEEE arithmetic on each side.
    "q73_heavy_tokens" ->
      """WITH c AS (
        |  SELECT unnest(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) AS term
        |  FROM documents),
        |n AS (SELECT term, count(*) AS n FROM c GROUP BY 1),
        |tot AS (SELECT sum(n) AS total FROM n)
        |SELECT term, n, round(n / CAST(total AS DOUBLE), 6) AS frac
        |FROM n, tot
        |WHERE n >= CAST(total AS DOUBLE) * 0.002""".stripMargin,
    "q74_sentence_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[^.!?]+[.!?]*')) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |  round(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) /
        |        CAST(greatest(len(regexp_extract_all(text, '[^.!?]+[.!?]*')), 1) AS DOUBLE), 6)
        |    AS mean_sentence_toks,
        |  CAST(coalesce(list_max(list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
        |    s -> length(trim(s)))), 0) AS BIGINT) AS max_sentence_chars
        |FROM documents""".stripMargin,
    "q75_domain_counts" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    text || ' see https://site' || (doc_id % 50) || '.example.org/page/' || doc_id ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' and http://tracker.common.net/pixel' ELSE '' END AS t
        |  FROM documents),
        |x AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://([^/\s]+)', 1)) AS domain
        |      FROM u)
        |SELECT domain, count(*) AS n_mentions, count(DISTINCT doc_id) AS n_docs
        |FROM x GROUP BY 1""".stripMargin,
    // q77: ln() is the same natural log on both sides (precedent: q36's
    // idf); probabilities are assembled in DOUBLE before the single ln.
    "q77_bigram_pmi" ->
      """WITH t AS (
        |  SELECT string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |uc AS (
        |  SELECT term, count(*) AS c FROM (SELECT unnest(toks) AS term FROM t)
        |  GROUP BY 1),
        |bc AS (
        |  SELECT bg, count(*) AS c_ab FROM (
        |    SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
        |                  i -> toks[i] || ' ' || toks[i+1])) AS bg
        |    FROM t)
        |  GROUP BY 1 HAVING count(*) >= 5),
        |n1 AS (SELECT CAST(sum(c) AS DOUBLE) AS n1 FROM uc),
        |n2 AS (SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n2 FROM t)
        |SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
        |       c_ab,
        |       round(ln((c_ab / n2) / ((a.c / n1) * (b.c / n1))), 6) AS pmi
        |FROM bc
        |JOIN uc a ON a.term = string_split(bg, ' ')[1]
        |JOIN uc b ON b.term = string_split(bg, ' ')[2]
        |CROSS JOIN n1 CROSS JOIN n2""".stripMargin,
    "q79_latest_snapshot" ->
      """SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,
    // q80: co-moment aggregates use the textbook sample definitions in
    // both engines; round(6) absorbs partial-sum reorder noise (~1e-15).
    "q80_value_stats" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(value), 6) AS mean_value,
        |  round(stddev_samp(value), 6) AS sd_value,
        |  round(covar_samp(value, CAST(date_part('hour', ts) AS DOUBLE)), 6) AS cov_hour,
        |  round(corr(value, CAST(date_part('hour', ts) AS DOUBLE)), 6) AS corr_hour
        |FROM events GROUP BY 1""".stripMargin,
    // q81: (1 - l_discount) is ONE double op (same IEEE result in both
    // engines); everything after is DECIMAL-exact, so the revenue sums
    // are partitioning-independent and hash-comparable.
    "q81_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |           CAST(1 - l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    // q82: Spark weekday()+1 == DuckDB isodow (1=Monday..7=Sunday); both
    // week functions are ISO. The bare dayofweek functions DISAGREE
    // between the engines (1=Sunday vs 0=Sunday) and are not used.
    "q82_calendar_profile" ->
      """SELECT quarter(o_orderdate) AS qtr,
        |       isodow(o_orderdate) AS dow_iso,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       count(DISTINCT isoyear(o_orderdate) * 100 + week(o_orderdate)) AS n_weeks,
        |       CAST(sum(CASE WHEN o_orderdate = last_day(CAST(o_orderdate AS DATE))
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_month_end
        |FROM orders GROUP BY 1, 2""".stripMargin,
    // q83: GROUPING() in DuckDB emits the same bitmask as Spark's
    // grouping_id() (q63 precedent).
    "q83_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q84_change_history" ->
      """SELECT user_id, event_type, value,
        |       ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |            AS INTEGER) AS is_current
        |FROM events""".stripMargin,
    // q86: percentile_cont WITHIN GROUP is the same ANSI form in both
    // engines; input cast to DOUBLE pre-aggregate so interpolation runs
    // in identical IEEE arithmetic.
    "q86_group_quartiles" ->
      """SELECT o_orderpriority,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25,
        |  percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS median_price,
        |  percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p75,
        |  count(*) AS n_orders,
        |  percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) -
        |    percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS iqr
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // q87: revenue multiplies in DOUBLE and quantizes the product to
    // DECIMAL(18,6) pre-sum (q20 kernel); the ratio divides two
    // DOUBLE-cast sums — identical IEEE arithmetic on both sides.
    "q87_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(
        |    CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |                  THEN CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))
        |                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY 1""".stripMargin,
    // q88: SQL-standard UNPIVOT in the FROM clause — DuckDB's native
    // unpivot, same fold as Dataset.unpivot.
    "q88_stats_unpivot" ->
      """WITH s AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n_events,
        |  round(avg(value), 6) AS avg_value, round(max(value), 6) AS max_value
        |  FROM events GROUP BY event_type)
        |SELECT * FROM s
        |UNPIVOT (metric_value FOR metric IN (n_events, avg_value, max_value))""".stripMargin,
    // q89: the oracle enumerates ALL same-lang pairs and applies the
    // identical candidate floor + edit-distance cap — exact because the
    // engine's prefix-filtered candidate generation is exact for its
    // Jaccard predicate.
    "q89_fuzzy_pairs" ->
      """WITH d AS (SELECT doc_id, lang,
        |  list_distinct(list_transform(
        |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g,
        |  regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS nt
        |  FROM documents),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nt AS ta, b.nt AS tb,
        |         len(list_intersect(a.g, b.g)) / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS j
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id),
        |v AS (SELECT doc_a, doc_b, ta, tb, levenshtein(ta, tb) AS dist
        |      FROM cand WHERE j >= 0.3)
        |SELECT doc_a, doc_b, CAST(dist AS BIGINT) AS edit_distance,
        |       round(1.0 - dist / greatest(CAST(greatest(length(ta), length(tb)) AS DOUBLE), 1.0), 6) AS similarity
        |FROM v
        |WHERE dist <= 0.25 * greatest(length(ta), length(tb))""".stripMargin,
    // q90: generate_series spine per group + IGNORE NULLS running
    // last_value — both engines' default window frame is RANGE UNBOUNDED
    // PRECEDING..CURRENT ROW, so the forward fill matches; day(ts) ==
    // Spark dayofmonth.
    "q90_gap_fill" ->
      """WITH kept AS (SELECT * FROM events WHERE day(ts) % 3 <> 0),
        |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |  round(sum(value), 6) AS day_value, count(*) AS n_events
        |  FROM kept GROUP BY 1, 2),
        |spine AS (SELECT event_type,
        |  CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
        |                              CAST(max(day) AS TIMESTAMP),
        |                              INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM daily GROUP BY event_type)
        |SELECT s.event_type,
        |  CAST(datediff('day', DATE '1970-01-01', s.day) AS BIGINT) AS epoch_day,
        |  COALESCE(d.n_events, 0) AS n_events,
        |  d.day_value,
        |  last_value(d.day_value IGNORE NULLS)
        |    OVER (PARTITION BY s.event_type ORDER BY s.day) AS filled_value,
        |  CAST(d.day_value IS NULL AS INT) AS is_gap
        |FROM spine s LEFT JOIN daily d USING (event_type, day)""".stripMargin,
    // q91: percentile_disc returns an order statistic (no interpolation),
    // so the only parity concern is the shared DOUBLE input cast.
    "q91_disc_percentiles" ->
      """SELECT o_orderstatus,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25_disc,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS median_disc,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p75_disc,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // q92: every event lands in exactly duration/slide = 2 windows whose
    // starts are epoch-aligned slide multiples — the unnest(range(0,2))
    // expansion reproduces Spark's window() assignment exactly;
    // make_timestamp keeps the start a plain TIMESTAMP (to_timestamp
    // would yield TIMESTAMPTZ and drift the schema).
    "q92_sliding_windows" ->
      """SELECT make_timestamp(CAST((floor(epoch(ts) / 300) * 300 - i.i * 300)
        |         * 1000000 AS BIGINT)) AS w_start,
        |       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events, (SELECT unnest(range(0, 2)) AS i) i
        |GROUP BY 1, 2""".stripMargin,
    // q85: q69's pair detection re-expressed as the anti-join that a
    // training pipeline actually ships — train docs with NO benchmark
    // collision at the q69 threshold.
    "q85_decontaminated" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 3, 1) + 1),
        |      i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+3], ' '))) AS g
        |  FROM documents),
        |t AS (SELECT doc_id AS train_id, unnest(g) AS gram
        |      FROM d WHERE doc_id % 10 <> 7),
        |b AS (SELECT doc_id AS bench_id, unnest(g) AS gram
        |      FROM d WHERE doc_id % 10 = 7),
        |flagged AS (
        |  SELECT train_id FROM t JOIN b USING (gram)
        |  GROUP BY train_id, bench_id HAVING count(*) >= 2)
        |SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE doc_id % 10 <> 7
        |  AND doc_id NOT IN (SELECT train_id FROM flagged)""".stripMargin,
    // q76: the oracle is the UNFILTERED ranking — the operator's bucket
    // prefilter is a pure optimization (groups whose prefiltered slice
    // can't fill k are re-ranked over all their rows), so the public
    // contract IS the plain top-k per group.
    "q76_group_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         ((((doc_id % 1000003) * 2654435761) >> 16) % 100) AS bkt
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY bkt, doc_id) AS rank
        |  FROM b)
        |SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,
    // q93: the oracle keeps the textbook correlated-subquery form — the
    // operator's aggregate+join decorrelation must be value-identical.
    // Quantities are integral so 0.2*avg is the same IEEE double on both
    // engines; revenue sums go through the micros-decimal kernel.
    "q93_small_qty_revenue" ->
      """SELECT p_brand,
        |  round(CAST(sum(CAST(round(l_extendedprice * 1000000) AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (
        |  SELECT 0.2 * (sum(l_quantity) / count(*)) FROM lineitem l2
        |  WHERE l2.l_partkey = lineitem.l_partkey)
        |GROUP BY p_brand""".stripMargin,
    // q94: IN-over-HAVING in the oracle; single aggregation + joins in
    // the operator. Integral quantities → exact sums → portable '>'.
    "q94_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |       sum(l_quantity) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice""".stripMargin,
    // q95: the oracle uses the window form (fine single-node); the
    // operator broadcasts a per-group stats table instead — same values.
    "q95_zscore" ->
      """SELECT event_id, event_type, value,
        |  round(CASE WHEN stddev_samp(value) OVER (PARTITION BY event_type) > 0
        |    THEN (value - avg(value) OVER (PARTITION BY event_type))
        |         / stddev_samp(value) OVER (PARTITION BY event_type) END, 6) AS z
        |FROM events""".stripMargin,
    // q96: deterministic mode — ties break to the lexicographically
    // smallest type on BOTH engines (the operator encodes the tiebreak in
    // its max_by key; the oracle orders explicitly).
    "q96_mode_per_user" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, event_type, n,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY n DESC, event_type) AS rk
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, n AS n_events
        |FROM r WHERE rk = 1""".stripMargin,
    // q97: expected counts divide exact integer products — identical
    // doubles on both engines; 6-dp rounding on the chi-square terms.
    "q97_chi_square" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hr, n,
        |  round(CAST(rn * cn AS DOUBLE) / gn, 6) AS expected,
        |  round(pow(n - CAST(rn * cn AS DOUBLE) / gn, 2)
        |        / (CAST(rn * cn AS DOUBLE) / gn), 6) AS chi2_term
        |FROM (
        |  SELECT event_type, hr, n,
        |    sum(n) OVER (PARTITION BY event_type) AS rn,
        |    sum(n) OVER (PARTITION BY hr) AS cn,
        |    sum(n) OVER () AS gn
        |  FROM cells)""".stripMargin,
    // q98: the oracle keeps Q21's EXISTS / NOT-EXISTS formulation; the
    // operator collapses both into one grouped pass over lineitem.
    "q98_lone_late_supplier" ->
      """SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    // q99: daily sums go through the micros-decimal kernel FIRST so the
    // regression inputs are engine-identical doubles; regr_* co-moments
    // then round to 6 dp (the q80 convention).
    "q99_daily_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 1000000) AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE) AS rev
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_days,
        |  round(regr_slope(rev, CAST(datediff('day', DATE '2024-01-01', day) AS DOUBLE)), 6) AS slope,
        |  round(regr_intercept(rev, CAST(datediff('day', DATE '2024-01-01', day) AS DOUBLE)), 6) AS intercept,
        |  round(regr_r2(rev, CAST(datediff('day', DATE '2024-01-01', day) AS DOUBLE)), 6) AS r2
        |FROM daily GROUP BY event_type
        |HAVING count(*) >= 2""".stripMargin,
    // q100: same whitespace normalization as the contamination pipeline;
    // postings compare as CSV text (array stringification differs between
    // parquet readers).
    "q100_inverted_index" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS df,
        |  array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings_csv
        |FROM t WHERE token <> ''
        |GROUP BY token HAVING count(*) >= 2""".stripMargin,
    // q101: DuckDB's mad() IS median(|x − median|) with the same
    // interpolated-median semantics as percentile_cont — the operator's
    // two-pass broadcast formulation must match it exactly.
    "q101_robust_stats" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(median(CAST(o_totalprice AS DOUBLE)), 6) AS median_price,
        |  round(mad(CAST(o_totalprice AS DOUBLE)), 6) AS mad
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // q102: pure integer arithmetic end to end — portable multiplicative
    // hash for the shard, running-sum window, integer-div pack ids.
    "q102_pack_sequences" ->
      """WITH t AS (
        |  SELECT ((((doc_id % 1000003) * 2654435761) >> 16) % 16) AS shard,
        |    doc_id,
        |    CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT shard, doc_id, n_tokens, cum_tokens,
        |  CAST(CASE WHEN n_tokens = 0 THEN cum_tokens // 256
        |            ELSE (cum_tokens - 1) // 256 END AS BIGINT) AS pack_id,
        |  CAST(CASE WHEN n_tokens = 0 THEN cum_tokens // 256
        |            ELSE (cum_tokens - 1) // 256 END
        |       <> (cum_tokens - n_tokens) // 256
        |       AS INTEGER) AS is_split
        |FROM c""".stripMargin,
    // q103: LEFT join keeps zero-order customers; count(o_orderkey)
    // counts only matches — the canonical Q13 form on both engines.
    "q103_custdist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    // q104: the avg-balance threshold cross-multiplies in exact integer
    // micros (bal·n > sum) — no float average, no boundary drift; HUGEINT
    // on the DuckDB side mirrors Spark's decimal(38,0) widening.
    "q104_idle_rich" ->
      """WITH a AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 1000000) AS BIGINT)) AS HUGEINT) AS sum_mic,
        |         count(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 1000000) AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE) AS totacctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |CROSS JOIN a
        |WHERE CAST(round(c_acctbal * 1000000) AS HUGEINT) * n_pos > sum_mic
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_totalprice > 300000)
        |GROUP BY n_name""".stripMargin,
    // q105: the q40 (dedup+quality) and q85 (4-gram decontamination) and
    // q49 (hash split) oracle fragments composed in the same order the
    // operator composes the stages.
    "q105_corpus_prep" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 <> 7),
        |d AS (
        |  SELECT doc_id, lang, text,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM t),
        |k AS (SELECT doc_id, lang, text FROM d WHERE rn = 1),
        |q AS (
        |  SELECT doc_id, lang, text,
        |         CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |         len(regexp_extract_all(text, '[^\w\s]')) /
        |           greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio
        |  FROM k),
        |qq AS (SELECT doc_id, lang, text, n_tokens FROM q
        |       WHERE n_tokens >= 10 AND punct_ratio <= 0.2),
        |tg AS (SELECT doc_id AS train_id,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 3, 1) + 1),
        |           i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+3], ' ')))) AS gram
        |       FROM qq),
        |bg AS (SELECT doc_id AS bench_id,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 3, 1) + 1),
        |           i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+3], ' ')))) AS gram
        |       FROM documents WHERE doc_id % 10 = 7),
        |flagged AS (
        |  SELECT DISTINCT train_id FROM tg JOIN bg USING (gram)
        |  GROUP BY train_id, bench_id HAVING count(*) >= 2),
        |clean AS (
        |  SELECT lang, n_tokens,
        |    CASE WHEN ((((doc_id % 1000003) * 2654435761) >> 16) % 100) < 80 THEN 'train'
        |         WHEN ((((doc_id % 1000003) * 2654435761) >> 16) % 100) < 90 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM qq WHERE doc_id NOT IN (SELECT train_id FROM flagged))
        |SELECT lang, split, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM clean GROUP BY lang, split""".stripMargin,
    // q106: the q84 interval derivation filtered to one instant — each
    // user contributes exactly its state row at T.
    "q106_state_at" ->
      """WITH h AS (
        |  SELECT user_id, event_type, value, ts AS valid_from,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM events)
        |SELECT event_type, count(*) AS n_users,
        |  round(CAST(sum(CAST(round(value * 1000000) AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE), 6) AS sum_value
        |FROM h
        |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        |GROUP BY event_type""".stripMargin,
    // q107: string_agg with an explicit ORDER BY — the engines only agree
    // because BOTH impose the order (the operator sorts after collect_set;
    // an unordered listagg would be partition-dependent).
    "q107_hours_listagg" ->
      """WITH d AS (
        |  SELECT DISTINCT event_type, CAST(hour(ts) AS INTEGER) AS hr
        |  FROM events)
        |SELECT event_type, count(*) AS n_hours,
        |       string_agg(hr, ',' ORDER BY hr) AS hours_csv
        |FROM d GROUP BY event_type""".stripMargin,
    // q29/q44/q78 (validated sketch forms): the oracle recomputes every
    // DETERMINISTIC column exactly and pins est_ok to the constant 1 — so
    // a wrong key, count, ground truth, or an out-of-band estimate all
    // fail the hash compare. Only the raw register contents stay
    // unoracled (they are engine-specific by nature).
    "q29_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users_exact,
        |  1 AS est_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q44_activity_sketch" ->
      """SELECT event_type, user_id, count(*) AS exact_n, 1 AS est_ok
        |FROM events WHERE user_id % 50 = 0
        |GROUP BY event_type, user_id""".stripMargin,
    "q78_activity_rollup" ->
      """SELECT event_type,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS n_users_exact,
        |  1 AS est_ok
        |FROM events GROUP BY event_type""".stripMargin,
    // q108: same whitespace tokenization as q102 (regexp_extract_all \S+ ==
    // Spark split-on-\s+ minus empties), 20-token chunks incl. the ragged
    // tail, dup marks via windows over the chunk text, ordered string_agg
    // for the strip — coalesce('') because DuckDB's string_agg of zero
    // non-null chunks is NULL where Spark's concat_ws is ''.
    "q108_passage_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |c0 AS (
        |  SELECT doc_id, toks,
        |    unnest(range((len(toks) + 19) // 20)) AS i
        |  FROM t),
        |c AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS idx,
        |    array_to_string(
        |      toks[(CAST(i AS INTEGER)*20+1):(CAST(i AS INTEGER)*20+20)],
        |      ' ') AS chunk
        |  FROM c0),
        |m AS (
        |  SELECT doc_id, idx, chunk,
        |    count(*) OVER (PARTITION BY chunk) AS occ,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |  FROM c)
        |SELECT doc_id,
        |  count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  round(CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS dup_ratio,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx),
        |           '') AS text_stripped
        |FROM m GROUP BY doc_id""".stripMargin,
    // q109: DuckDB's native ASOF LEFT JOIN is the oracle for the Spark
    // union+window formulation — clicks pre-reduced per (user, ts) so the
    // match is deterministic; date_diff('second') counts second-boundary
    // crossings, which equals the floor-epoch difference Spark computes
    // via unix_timestamp.
    "q109_asof_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
        |  c.ts AS click_ts, c.click_id,
        |  CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin,
    // q110: the oracle is the straightforward window-greedy form — the
    // Spark side computes the identical selection via bucket cutoffs
    // (no corpus-wide sort); their equivalence is also spec-pinned.
    // Score formula is byte-identical to q13's stopword_ratio.
    "q110_token_budget" ->
      """WITH s AS (
        |  SELECT lang, doc_id,
        |    CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |    round(len(regexp_extract_all(lower(text),
        |            '\b(the|a|an|and|or|of|to|in|is|it)\b'))
        |          / greatest(CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'))
        |                     AS DOUBLE), 1.0), 6) AS score
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (
        |    PARTITION BY lang ORDER BY score DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM s)
        |SELECT lang, doc_id, n_tokens, score FROM c WHERE cum <= 5000""".stripMargin,
    // q111: first-round BPE merge candidates — adjacent character pairs
    // inside whitespace tokens, weighted by occurrence, top-20 by
    // (count DESC, pair ASC). Both engines slice pairs with 1-based
    // character-addressed substr, so multi-byte text agrees.
    "q111_bpe_candidates" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS word
        |  FROM documents),
        |p AS (
        |  SELECT substr(word, CAST(i AS INTEGER) + 1, 2) AS pair
        |  FROM (SELECT word, unnest(range(length(word) - 1)) AS i
        |        FROM w WHERE length(word) >= 2)),
        |c AS (SELECT pair, count(*) AS n FROM p GROUP BY pair)
        |SELECT pair, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER) AS rank
        |FROM c QUALIFY rank <= 20""".stripMargin,
    // q112: percentile bounds per group, clip + flag — percentile_cont on
    // DOUBLE agrees bit-for-bit across engines (q86 established), and the
    // clipped value rounds to the 6-dp grid.
    "q112_winsorize" ->
      """WITH b AS (
        |  SELECT event_type AS b_type,
        |    percentile_cont(0.01) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS p_lo,
        |    percentile_cont(0.99) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS p_hi
        |  FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value,
        |  round(least(greatest(value, p_lo), p_hi), 6) AS value_w,
        |  CAST(value < p_lo OR value > p_hi AS INTEGER) AS clipped
        |FROM events JOIN b ON event_type = b_type""".stripMargin,
    // q113-q115: the TPC-H Q4/Q10/Q14 shapes (EXISTS semi-join,
    // returned-item top-k, conditional-aggregate ratio), adapted to the
    // driver schema; revenue via the shared integer-micros kernel.
    "q113_priority_returns" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q114_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |       AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1995-01-01'
        |  AND o_orderdate < DATE '1995-01-01' + INTERVAL 90 DAY
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q115_promo_share" ->
      """WITH j AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |    CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |         AS DECIMAL(18,6)) AS rev,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    AS promo_revenue,
        |  CAST(sum(rev) AS DOUBLE) AS total_revenue,
        |  round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |        / CAST(sum(rev) AS DOUBLE), 6) AS promo_share
        |FROM j GROUP BY month""".stripMargin,
    // q116: q105's composition with the q108 passage stage spliced in
    // between exact dedup and quality — the chunk CTEs are q108's (proven
    // tokenization/strip parity), run over the deduped train docs; quality
    // re-tokenizes the STRIPPED text; split/decontamination as in q105.
    "q116_corpus_prep_v2" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 <> 7),
        |d AS (
        |  SELECT doc_id, lang, text,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM t),
        |k AS (SELECT doc_id, lang, text FROM d WHERE rn = 1),
        |tk AS (SELECT doc_id, lang, regexp_extract_all(text, '[^ \t\n\x0B\f\r]+') AS toks FROM k),
        |c0 AS (
        |  SELECT doc_id, lang, toks,
        |    unnest(range((len(toks) + 19) // 20)) AS i
        |  FROM tk),
        |c AS (
        |  SELECT doc_id, lang, CAST(i AS INTEGER) AS idx,
        |    array_to_string(
        |      toks[(CAST(i AS INTEGER)*20+1):(CAST(i AS INTEGER)*20+20)],
        |      ' ') AS chunk
        |  FROM c0),
        |m AS (
        |  SELECT doc_id, lang, idx, chunk,
        |    count(*) OVER (PARTITION BY chunk) AS occ,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |  FROM c),
        |s AS (
        |  SELECT doc_id, lang,
        |    coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx),
        |             '') AS text,
        |    CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
        |  FROM m GROUP BY doc_id, lang),
        |q AS (
        |  SELECT doc_id, lang, text, n_dup_chunks,
        |         CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |         len(regexp_extract_all(text, '[^\w\s]')) /
        |           greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio
        |  FROM s),
        |qq AS (SELECT doc_id, lang, text, n_tokens, n_dup_chunks FROM q
        |       WHERE n_tokens >= 10 AND punct_ratio <= 0.2),
        |tg AS (SELECT doc_id AS train_id,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 3, 1) + 1),
        |           i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+3], ' ')))) AS gram
        |       FROM qq),
        |bg AS (SELECT doc_id AS bench_id,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 3, 1) + 1),
        |           i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+3], ' ')))) AS gram
        |       FROM documents WHERE doc_id % 10 = 7),
        |flagged AS (
        |  SELECT DISTINCT train_id FROM tg JOIN bg USING (gram)
        |  GROUP BY train_id, bench_id HAVING count(*) >= 2),
        |clean AS (
        |  SELECT lang, n_tokens, n_dup_chunks,
        |    CASE WHEN ((((doc_id % 1000003) * 2654435761) >> 16) % 100) < 80 THEN 'train'
        |         WHEN ((((doc_id % 1000003) * 2654435761) >> 16) % 100) < 90 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM qq WHERE doc_id NOT IN (SELECT train_id FROM flagged))
        |SELECT lang, split, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(sum(n_dup_chunks) AS BIGINT) AS dup_chunks
        |FROM clean GROUP BY lang, split""".stripMargin,
    // q117: the version derivation mirrors the Spark side exactly; token
    // counts via the proven \S+ == split-on-\s+ equivalence.
    "q117_corpus_diff" ->
      """WITH o AS (
        |  SELECT doc_id, lang, text,
        |         CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS toks
        |  FROM documents WHERE doc_id % 10 <> 3),
        |n AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN doc_id % 13 = 0 THEN text || ' revised'
        |              ELSE text END AS text
        |  FROM documents),
        |n2 AS (
        |  SELECT doc_id, lang, text,
        |         CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS toks
        |  FROM n),
        |j AS (
        |  SELECT coalesce(n2.lang, o.lang) AS lang,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n2.doc_id IS NULL THEN 'removed'
        |         WHEN o.text <> n2.text THEN 'changed'
        |         ELSE 'unchanged' END AS change,
        |    coalesce(o.toks, 0) AS toks_old,
        |    coalesce(n2.toks, 0) AS toks_new
        |  FROM o FULL OUTER JOIN n2 ON o.doc_id = n2.doc_id)
        |SELECT lang, change, count(*) AS n_docs,
        |       CAST(sum(toks_old) AS BIGINT) AS tokens_old,
        |       CAST(sum(toks_new) AS BIGINT) AS tokens_new
        |FROM j GROUP BY lang, change""".stripMargin,
    "q118_mixture_plan" ->
      """WITH t AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'))) AS BIGINT)
        |      AS tokens_available
        |  FROM documents GROUP BY lang),
        |w AS (
        |  SELECT *, CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2
        |                      WHEN 'fr' THEN 0.2 WHEN 'es' THEN 0.1
        |                      ELSE 0.0 END AS wt
        |  FROM t)
        |SELECT lang, n_docs, tokens_available,
        |  CAST(floor(wt * 100000.0) AS BIGINT) AS target_tokens,
        |  least(tokens_available, CAST(floor(wt * 100000.0) AS BIGINT))
        |    AS planned_tokens,
        |  round(least(tokens_available, CAST(floor(wt * 100000.0) AS BIGINT))
        |        / greatest(CAST(tokens_available AS DOUBLE), 1.0), 6)
        |    AS keep_rate
        |FROM w""".stripMargin,
    // q120 (validated, q18 pattern): the exact cosine pair set is the
    // oracled output; recall_ok pins the k-means-cell SemDeDup blocking
    // at its measured operating point (0.963 sf0.01 / 0.954 sf0.1).
    "q120_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT id_a, id_b, round(s, 6) AS sim, 1 AS recall_ok FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_dot_product(a.v, b.v) /
        |         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS s
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE s >= 0.35""".stripMargin,
    // q123 (TPC-H Q2 shape): correlated min decorrelated explicitly —
    // per-(part,supplier) min unit price, per-part min, equality join
    // back, ties kept. Unit cost is exact integer micro-units
    // ((price-cents · 1e4) // quantity) — the round(price/qty, 6)
    // double form hit the half-even-vs-half-up tie class at sf0.1
    "q123_cheapest_supplier" ->
      """WITH sup AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |costs AS (
        |  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.n_name,
        |         min((CAST(round(l_extendedprice * 100) AS BIGINT)
        |              * 10000) // CAST(l_quantity AS BIGINT))
        |           AS unit_cost_micro
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'LARGE'
        |  JOIN sup s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5),
        |m AS (
        |  SELECT p_partkey, min(unit_cost_micro) AS min_cost
        |  FROM costs GROUP BY 1)
        |SELECT c.p_partkey, c.p_name, c.s_name, c.n_name,
        |       c.unit_cost_micro
        |FROM costs c JOIN m ON c.p_partkey = m.p_partkey
        |WHERE c.unit_cost_micro = m.min_cost""".stripMargin,
    // q124 (TPC-H Q11 shape): global-scalar HAVING — the comparison runs
    // in exact decimal (pv*n > 1.2*total) so no engine's summation order
    // can flip a borderline part; only display columns drop to double.
    "q124_part_concentration" ->
      """WITH t AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |        AS DECIMAL(18,6))) AS pv
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT sum(pv) AS tot, count(*) AS n FROM t)
        |SELECT l_partkey AS p_partkey,
        |  round(CAST(pv AS DOUBLE), 4) AS part_value,
        |  round(CAST(pv AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS value_share
        |FROM t, g
        |WHERE pv * n > CAST(1.2 AS DECIMAL(6,4)) * tot""".stripMargin,
    // q125 (TPC-H Q3 shape): the limit is safe to oracle because the
    // ORDER BY is total (revenue desc, date, orderkey) — both engines
    // pick the same 10 rows even under revenue ties.
    "q125_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000)
        |      AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-06-01'
        |  AND l_shipdate > DATE '1998-06-01'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    // q126 (TPC-H Q6 shape): scan-only revenue forecast; the engine-side
    // point is PushedFilters + 3-column ReadSchema, the oracle is a
    // direct translation.
    "q126_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * l_discount * 1000000)
        |      AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // q127 (TPC-H Q7 shape): two directed nation pairs, year extracted
    // from ship date; revenue in the exact micros grid.
    "q127_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000)
        |      AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |WHERE (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_21')
        |   OR (sn.n_name = 'NATION_21' AND cn.n_name = 'NATION_19')
        |GROUP BY 1, 2, 3""".stripMargin,
    // q128 (TPC-H Q9 shape, adapted — no partsupp): cost proxied as
    // 0.8*p_retailprice*l_quantity; multiplication order matches the
    // Spark expression term-for-term so the doubles agree bit-for-bit
    // before the exact micros rounding.
    "q128_product_profit" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)
        |        - 0.8 * p_retailprice * l_quantity) * 1000000)
        |      AS DECIMAL(18,0))) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2""".stripMargin,
    // q129 (TPC-H Q15 shape): the max-revenue compare runs on the exact
    // micros integers — ties kept, no double-equality fragility.
    "q129_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000)
        |        AS DECIMAL(18,0))) AS micros
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01'
        |    AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(micros / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    AS total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE micros = (SELECT max(micros) FROM rev)""".stripMargin,
    // q130 (TPC-H Q16 shape, adapted): NOT IN is null-safe here
    // (s_suppkey non-null); engine side uses a broadcast left-anti join.
    "q130_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size BETWEEN 1 AND 8
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    // q131 (TPC-H Q20 shape, adapted): integral quantities → exact sums →
    // the share threshold compare is engine-independent.
    "q131_dominant_suppliers" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= DATE '1996-01-01'
        |    AND l_shipdate < DATE '1997-01-01'
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT l_partkey, sum(supp_qty) AS part_qty FROM shipped GROUP BY 1)
        |SELECT s.l_partkey AS p_partkey, s_name, supp_qty,
        |  round(supp_qty / part_qty, 6) AS qty_share
        |FROM shipped s
        |JOIN tot t ON s.l_partkey = t.l_partkey
        |JOIN supplier ON s_suppkey = s.l_suppkey
        |WHERE 100 * supp_qty > 30 * part_qty""".stripMargin,
    // q122 (validated, q48 semantics): the oracled rows are the EXACT
    // new-doc set; recall_ok pins the zero-shuffle bloom gate's
    // false-positive loss under its 0.95 floor (fpp = 0.01).
    "q122_bloom_dedup" ->
      """SELECT b.doc_id AS doc_id, b.lang AS lang, b.n_chars AS n_chars,
        |       1 AS recall_ok
        |FROM documents b
        |WHERE b.doc_id % 2 = 1
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents c
        |    WHERE c.doc_id % 2 = 0 AND c.text = b.text)""".stripMargin,
    // q121: the repetition counters recomputed with DuckDB list functions
    // (list_transform over generate_series builds the n-grams in place, no
    // unnest for the distinct counts) + one unnest/groupBy pass for the
    // duplicate-token character coverage — the shuffling formulation the
    // Spark side deliberately avoids (RepetitionStatsExpr is map-only).
    "q121_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks, len(toks) AS n_toks,
        |    list_transform(generate_series(1, len(toks)-1),
        |      i -> toks[i]||' '||toks[i+1]) AS g2,
        |    list_transform(generate_series(1, len(toks)-2),
        |      i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) AS g3
        |  FROM t),
        |occ AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |cnt AS (SELECT doc_id, tok, count(*) AS c FROM occ GROUP BY 1, 2),
        |chars AS (
        |  SELECT doc_id,
        |    CAST(sum(c * len(tok)) AS BIGINT) AS chars_total,
        |    CAST(sum(CASE WHEN c >= 2 THEN c * len(tok) ELSE 0 END) AS BIGINT)
        |      AS chars_dup_tok
        |  FROM cnt GROUP BY 1),
        |m AS (
        |  SELECT g.doc_id,
        |    CAST(g.n_toks AS BIGINT) AS n_toks,
        |    CAST(len(g.g2) AS BIGINT) AS total_2grams,
        |    CAST(len(list_distinct(g.g2)) AS BIGINT) AS distinct_2grams,
        |    CAST(len(g.g3) AS BIGINT) AS total_3grams,
        |    CAST(len(list_distinct(g.g3)) AS BIGINT) AS distinct_3grams,
        |    coalesce(c.chars_total, 0) AS chars_total,
        |    coalesce(c.chars_dup_tok, 0) AS chars_dup_tok,
        |    1.0 - len(list_distinct(g.g2))
        |      / greatest(CAST(len(g.g2) AS DOUBLE), 1.0) AS f2,
        |    1.0 - len(list_distinct(g.g3))
        |      / greatest(CAST(len(g.g3) AS DOUBLE), 1.0) AS f3,
        |    coalesce(c.chars_dup_tok, 0)
        |      / greatest(CAST(coalesce(c.chars_total, 0) AS DOUBLE), 1.0) AS fc
        |  FROM g LEFT JOIN chars c ON g.doc_id = c.doc_id)
        |SELECT doc_id, n_toks, total_2grams, distinct_2grams, total_3grams,
        |  distinct_3grams, chars_total, chars_dup_tok,
        |  round(f2, 6) AS dup_2gram_frac,
        |  round(f3, 6) AS dup_3gram_frac,
        |  round(fc, 6) AS dup_tok_char_frac,
        |  CAST(f2 <= 0.30 AND f3 <= 0.20 AND fc <= 0.60 AS INT) AS keep
        |FROM m""".stripMargin,
    // q119: greedy left-to-right BPE merging is exactly non-overlapping
    // string replace on a delimited symbol string — each symbol is wrapped
    // chr(31)<sym>chr(30) so adjacent pairs share no delimiter character
    // (a bare-space join would under-merge "a a a a": the consumed
    // trailing space is shared between adjacent pairs) and a merge
    // pattern can never match a suffix of a longer symbol. The replace
    // chain is GENERATED from BpeTrain.DefaultMerges so the two engines
    // cannot drift. Token count = number of chr(31) markers left.
    "q119_bpe_encode" -> bpeEncodeOracleSql,
    // q132: sliding token-window chunking; the chunk grid (starts 1,
    // 1+stride, …, covering the tail once) replays in generate_series.
    "q132_doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        |e AS (SELECT doc_id, toks,
        |        unnest(generate_series(0,
        |          CAST(ceil(greatest(n - 20, 0) / 10.0) AS BIGINT))) AS k
        |      FROM g)
        |SELECT doc_id, k AS chunk_idx,
        |  array_to_string(list_slice(toks, 1 + 10*k, 10*k + 20), ' ')
        |    AS chunk_text,
        |  CAST(len(list_slice(toks, 1 + 10*k, 10*k + 20)) AS BIGINT)
        |    AS n_tokens
        |FROM e""".stripMargin,
    // q133: unigram surprisal — per-token −ln(c/N) rounded to the 1e-6
    // grid and summed exactly (the decSum device), so the doc sums are
    // order-independent in both engines.
    "q133_unigram_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |n AS (SELECT sum(c) AS N FROM c),
        |j AS (SELECT t.doc_id,
        |        CAST(round(-ln((CAST(c.c AS DOUBLE)) / (CAST(n.N AS DOUBLE)))
        |          * 1000000) AS DECIMAL(18,0)) AS mic
        |      FROM tok t JOIN c USING (tok), n)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE), 6)
        |    AS sum_nll,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    / count(*), 6) AS avg_nll
        |FROM j GROUP BY 1""".stripMargin,
    // q134: z-order bucket envelopes; the bit-interleave formula is
    // GENERATED from the same (bitsPerDim, buckets) parameters the engine
    // uses, so the engines cannot drift.
    "q134_zorder_layout" -> zorderOracleSql,
    // q135: the oracle is the FULL REBUILD over the whole event history
    // (q84's window verbatim) — the incremental merge must reproduce it
    // exactly, untouched keys included.
    "q135_scd2_apply" ->
      """SELECT user_id, event_type, value,
        |       ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |            AS INTEGER) AS is_current
        |FROM events""".stripMargin,
    // q136: CASE literals generated from the same rate arithmetic the
    // engine embeds; membership is the shared multiplicative hash.
    "q136_temperature_sample" -> temperatureOracleSql,
    // q137: the oracle pairs on the ACTUAL substrings where the engine
    // pairs on xxhash64(window) — count equality is also a standing
    // hash-collision audit (a collision would desync n_shared_windows).
    "q137_substring_dups" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |w AS (
        |  SELECT DISTINCT doc_id, sub FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(t) - 39),
        |        i -> substr(t, i, 40))) AS sub
        |    FROM t WHERE len(t) >= 40)),
        |df AS (SELECT sub, count(*) AS c FROM w GROUP BY 1),
        |ok AS (SELECT w.doc_id, w.sub FROM w JOIN df USING (sub)
        |       WHERE df.c BETWEEN 2 AND 20)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       count(*) AS n_shared_windows
        |FROM ok a JOIN ok b ON a.sub = b.sub AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "q138_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |w AS (
        |  SELECT DISTINCT doc_id, win FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(t) - 39),
        |        i -> substr(t, i, 40))) AS win
        |    FROM t WHERE len(t) >= 40))
        |SELECT win, count(*) AS n_docs
        |FROM w GROUP BY 1 HAVING count(*) >= 3""".stripMargin,
    // q139: q133's grid discipline extended to the bigram mixture; the λ
    // literals are CAST to DOUBLE so DuckDB computes the mixture in IEEE
    // double like the engine (its bare decimals would evaluate 1 - 0.7
    // exactly and desync grid rounding of boundary terms).
    "q139_bigram_surprisal" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, toks[i] AS cur,
        |         CASE WHEN i > 1 THEN toks[i - 1] ELSE NULL END AS prev
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        |        FROM d)),
        |c1 AS (SELECT cur, count(*) AS c1 FROM t GROUP BY 1),
        |n AS (SELECT sum(c1) AS N FROM c1),
        |c2 AS (SELECT prev, cur, count(*) AS c2 FROM t
        |       WHERE prev IS NOT NULL GROUP BY 1, 2),
        |cf AS (SELECT prev, sum(c2) AS cf FROM c2 GROUP BY 1),
        |terms AS (
        |  SELECT t.doc_id,
        |    CAST(round(-ln(CASE WHEN t.prev IS NULL
        |      THEN CAST(c1.c1 AS DOUBLE) / CAST(n.N AS DOUBLE)
        |      ELSE CAST(0.7 AS DOUBLE)
        |             * (CAST(c2.c2 AS DOUBLE) / CAST(cf.cf AS DOUBLE))
        |           + (1 - CAST(0.7 AS DOUBLE))
        |             * (CAST(c1.c1 AS DOUBLE) / CAST(n.N AS DOUBLE)) END)
        |      * 1000000) AS DECIMAL(18,0)) AS mic
        |  FROM t
        |  JOIN c1 USING (cur)
        |  LEFT JOIN c2 ON c2.prev = t.prev AND c2.cur = t.cur
        |  LEFT JOIN cf ON cf.prev = t.prev, n)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE), 6)
        |    AS sum_nll,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    / count(*), 6) AS avg_nll
        |FROM terms GROUP BY 1""".stripMargin,
    // q140: the oracle recomputes every window hash (the k-char
    // polynomial fold, q15's ascii-per-char convention), derives the cut
    // points, slices the chunks, and groups on the raw chunk TEXT where
    // the engine groups on xxhash64 — the standing collision audit.
    "q140_cdc_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |cps AS (
        |  SELECT doc_id, t, len(t) AS n,
        |    list_transform(string_split(t, ''),
        |                   c -> CAST(ascii(c) AS BIGINT)) AS cs
        |  FROM t WHERE len(t) > 0),
        |b AS (
        |  SELECT doc_id, t, n,
        |    list_filter(range(8, n + 1), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i-7:i]),
        |        (a, x) -> (a * 31 + x) % 1000000007) % 64 = 0) AS ends
        |  FROM cps),
        |bl AS (
        |  SELECT doc_id, t,
        |    CASE WHEN len(ends) > 0 AND ends[-1] = n THEN ends
        |         ELSE list_append(ends, n) END AS es
        |  FROM b),
        |ch AS (
        |  SELECT doc_id,
        |    substr(t, CASE WHEN i = 1 THEN 1 ELSE es[i - 1] + 1 END,
        |      es[i] - CASE WHEN i = 1 THEN 0 ELSE es[i - 1] END) AS chunk
        |  FROM (SELECT doc_id, t, es, unnest(range(1, len(es) + 1)) AS i
        |        FROM bl)),
        |df AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY 1)
        |SELECT ch.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS shared_chunks
        |FROM ch JOIN df USING (chunk) GROUP BY 1""".stripMargin,
    // q141: the oracle joins on the raw 40-char window STRINGS where the
    // engine joins on xxhash64 — the standing collision audit (cf. q137/
    // q140). range(1, n+2-w) is end-exclusive: i in 1..n-w+1.
    "q141_substring_contamination" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |tw AS (
        |  SELECT doc_id AS train_id,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 40 + 2),
        |      i -> substr(t, i, 40)))) AS win
        |  FROM n WHERE doc_id % 10 <> 7 AND len(t) >= 40),
        |bw AS (
        |  SELECT doc_id AS bench_id,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 40 + 2),
        |      i -> substr(t, i, 40)))) AS win
        |  FROM n WHERE doc_id % 10 = 7 AND len(t) >= 40)
        |SELECT t.train_id AS train_id, b.bench_id AS bench_id,
        |  count(*) AS n_shared_windows
        |FROM tw t JOIN bw b USING (win)
        |GROUP BY 1, 2""".stripMargin,
    // q142: every feature is an exact ppm integer (floor division //, all
    // operands non-negative) and the weights are integers, so score_micro
    // is BIGINT arithmetic — no float boundary anywhere.
    "q142_quality_classifier" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(coalesce(text, '')) AS BIGINT) AS nc,
        |    CAST(len(regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS nt,
        |    CAST(len(regexp_extract_all(lower(coalesce(text, '')),
        |      '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS BIGINT) AS ns,
        |    CAST(len(regexp_extract_all(coalesce(text, ''), '[^\w\s]')) AS BIGINT) AS np,
        |    CAST(len(regexp_extract_all(coalesce(text, ''), '[0-9]')) AS BIGINT) AS nd
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    (ns * 1000000) // greatest(nt, 1) AS stop_ppm,
        |    (np * 1000000) // greatest(nc, 1) AS punct_ppm,
        |    (nd * 1000000) // greatest(nc, 1) AS digit_ppm,
        |    least(((nc * 1000000) // greatest(nt, 1)) // 1000, 20000)
        |      AS mean_tok_len_milli
        |  FROM f)
        |SELECT doc_id, stop_ppm, punct_ppm, digit_ppm, mean_tok_len_milli,
        |  -2500000 + 30 * stop_ppm - 15 * punct_ppm - 10 * digit_ppm
        |    + 200 * mean_tok_len_milli AS score_micro,
        |  CAST((-2500000 + 30 * stop_ppm - 15 * punct_ppm - 10 * digit_ppm
        |    + 200 * mean_tok_len_milli) > 0 AS INTEGER) AS keep
        |FROM p""".stripMargin,
    // q143: q75's synthetic-URL construction verbatim; shares on the exact
    // ppm grid — one floor division at the end of exact BIGINT sums.
    "q143_domain_concentration" ->
      """WITH u AS (
        |  SELECT doc_id, text || ' see https://site' ||
        |    CAST(doc_id % 50 AS VARCHAR) || '.example.org/page/' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' and http://tracker.common.net/pixel' ELSE '' END AS tu
        |  FROM documents),
        |d AS (SELECT doc_id,
        |        unnest(regexp_extract_all(tu, 'https?://([^/\s]+)', 1)) AS domain
        |      FROM u),
        |c AS (SELECT domain, count(*) AS n_mentions FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_mentions) AS BIGINT) AS N,
        |               CAST(sum(n_mentions * n_mentions) AS BIGINT) AS sumsq
        |        FROM c),
        |r AS (SELECT domain, n_mentions,
        |        CAST(row_number() OVER (ORDER BY n_mentions DESC, domain)
        |          AS INTEGER) AS rank,
        |        CAST(sum(n_mentions) OVER (ORDER BY n_mentions DESC, domain
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM c)
        |SELECT rank, domain, n_mentions,
        |  (n_mentions * 1000000) // tot.N AS share_ppm,
        |  (cum * 1000000) // tot.N AS cum_share_ppm,
        |  (tot.sumsq * 1000000) // (tot.N * tot.N) AS hhi_ppm
        |FROM r, tot""".stripMargin,
    // q144: word-BIGRAM units (the whitespace-token vocab of this corpus
    // is 31 entries — any vocab covers it; bigrams have ~900); vocab =
    // top-500 under the TOTAL order (count desc, gram asc) via
    // row_number — deterministic at the cutoff, = the engine's
    // orderBy+limit. Docs with < 2 tokens have no gram rows (absent on
    // both sides). range(1, len) is end-exclusive: i in 1..len-1.
    "q144_vocab_coverage" ->
      """WITH ts AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(lower(trim(coalesce(text, ''))), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |    ' ') AS ts
        |  FROM documents),
        |t AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |        i -> ts[i] || ' ' || ts[i + 1])) AS tok
        |      FROM ts),
        |c AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
        |v AS (SELECT tok FROM (
        |        SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS r
        |        FROM c) WHERE r <= 500)
        |SELECT t.doc_id AS doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  (CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // count(*) AS oov_ppm
        |FROM t LEFT JOIN v ON t.tok = v.tok
        |GROUP BY 1""".stripMargin,
    // q145: the HRW score is the q49 multiplicative-hash convention plus
    // an xor-fold (bounded BIGINT-exact in both engines); argmax via
    // row_number under the same (score desc, shard asc) total order as
    // the engine's struct-greatest.
    "q145_rendezvous_shards" ->
      """WITH s AS (
        |  SELECT doc_id, unnest(range(0, 16)) AS s FROM documents),
        |x AS (SELECT doc_id, s,
        |        ((doc_id % 1000003) * 2654435761 + s * 40503)
        |          % 4294967296 AS x
        |      FROM s),
        |sc AS (SELECT doc_id, s,
        |        (xor(x, x >> 16) * 49157) % 1048573 AS sc
        |       FROM x),
        |a16 AS (SELECT doc_id, s FROM (
        |          SELECT doc_id, s, row_number() OVER (
        |            PARTITION BY doc_id ORDER BY sc DESC, s) AS r
        |          FROM sc) WHERE r = 1),
        |a15 AS (SELECT doc_id, s FROM (
        |          SELECT doc_id, s, row_number() OVER (
        |            PARTITION BY doc_id ORDER BY sc DESC, s) AS r
        |          FROM sc WHERE s < 15) WHERE r = 1)
        |SELECT a16.doc_id AS doc_id,
        |  CAST(a16.s AS INTEGER) AS shard,
        |  CAST(a15.s AS INTEGER) AS shard_after_removal,
        |  CAST(a16.s <> a15.s AS INTEGER) AS moved
        |FROM a16 JOIN a15 USING (doc_id)""".stripMargin,
    // q146: exact all-pairs containment over word 3-grams (the engine's
    // hashed sets mirror the string sets at the documented collision odds)
    "q146_containment_dups" ->
      """WITH d AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
        |  FROM documents),
        |f AS (SELECT * FROM d WHERE len(g) >= 10)
        |SELECT doc_a, doc_b, round(c, 6) AS containment FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         len(list_intersect(a.g, b.g)) /
        |           CAST(least(len(a.g), len(b.g)) AS DOUBLE) AS c
        |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
        |WHERE c >= 0.6""".stripMargin,
    // q147: the SNM window self-join written out directly — blocks on the
    // first 2 normalized chars, sorts by the 30-char key, compares each
    // record to its 5 successors
    "q147_sorted_neighborhood" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS nt,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |      i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
        |  FROM documents),
        |k AS (SELECT doc_id, g, nt[1:2] AS blk, nt[1:30] AS key FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY blk ORDER BY key, doc_id) AS rn FROM k)
        |SELECT least(doc_a0, doc_b0) AS doc_a, greatest(doc_a0, doc_b0) AS doc_b,
        |       round(j, 6) AS jaccard
        |FROM (
        |  SELECT a.doc_id AS doc_a0, b.doc_id AS doc_b0,
        |         len(list_intersect(a.g, b.g)) /
        |           CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS j
        |  FROM r a JOIN r b ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 5)
        |WHERE j >= 0.5""".stripMargin,
    // q148/q150: the winnowing k-gram hash is the engine-reproducible
    // base-31/1e9+7 polynomial over code points; rightmost-min via the
    // reversed-slice list_position; (hash, pos) encoded as
    // hash*1048576+pos for list_distinct (struct histograms are
    // unsupported), decoded on output
    "q148_winnow_fingerprints" ->
      """WITH nt AS (SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS nt FROM documents),
        |ch AS (SELECT doc_id, list_transform(string_split(nt, ''), c -> CAST(ascii(c) AS BIGINT)) AS cs FROM nt),
        |kh AS (SELECT doc_id, list_transform(range(1, greatest(len(cs) - 7, 0) + 1),
        |         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+7]),
        |                (acc, x) -> (acc * 31 + x) % 1000000007)) AS kh
        |       FROM ch WHERE len(cs) >= 8),
        |sel AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(kh) - 3, 0) + 1),
        |           j -> list_min(kh[j:j+3]) * 1048576 +
        |                (j + 4 - list_position(list_reverse(kh[j:j+3]), list_min(kh[j:j+3]))))) AS enc
        |        FROM kh WHERE len(kh) >= 4)
        |SELECT doc_id, enc % 1048576 AS pos, enc // 1048576 AS fp
        |FROM (SELECT doc_id, unnest(enc) AS enc FROM sel)""".stripMargin,
    "q149_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' ')))) AS g
        |  FROM documents),
        |m AS (SELECT g, min(doc_id) AS fd FROM t GROUP BY 1)
        |SELECT t.doc_id AS doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN m.fd = t.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN m.fd = t.doc_id THEN 1 ELSE 0 END) /
        |    CAST(count(*) AS DOUBLE), 6) AS novelty
        |FROM t JOIN m ON t.g = m.g GROUP BY 1""".stripMargin,
    "q150_winnow_dups" ->
      """WITH nt AS (SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS nt FROM documents),
        |ch AS (SELECT doc_id, list_transform(string_split(nt, ''), c -> CAST(ascii(c) AS BIGINT)) AS cs FROM nt),
        |kh AS (SELECT doc_id, list_transform(range(1, greatest(len(cs) - 7, 0) + 1),
        |         i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+7]),
        |                (acc, x) -> (acc * 31 + x) % 1000000007)) AS kh
        |       FROM ch WHERE len(cs) >= 8),
        |fp AS (SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(kh) - 3, 0) + 1),
        |           j -> list_min(kh[j:j+3])))) AS fp
        |       FROM kh WHERE len(kh) >= 4),
        |df AS (SELECT fp, count(*) AS df FROM fp GROUP BY 1),
        |k AS (SELECT fp.doc_id, fp.fp FROM fp JOIN df USING (fp) WHERE df BETWEEN 2 AND 20)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |FROM k a JOIN k b USING (fp)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 10""".stripMargin,
    // q151: one log per BUCKET rounded to the 1e-6 grid, then exact
    // decimal sums (q133's discipline); alpha = 0.5, buckets = 1024 so
    // the smoothing denominators are +512.0 in double on both engines
    "q151_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    unnest(list_filter(string_split(regexp_replace(lower(trim(coalesce(text, ''))), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '), t -> t <> '')) AS w
        |  FROM documents),
        |b AS (SELECT doc_id, lang,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
        |          (acc, x) -> (acc * 31 + x) % 1000000007) % 1024 AS bkt
        |      FROM toks),
        |rc AS (SELECT bkt, count(*) AS rc FROM b GROUP BY 1),
        |tc AS (SELECT bkt, count(*) AS tc FROM b WHERE lang = 'en' GROUP BY 1),
        |d AS (SELECT rc.bkt, rc.rc, coalesce(tc.tc, 0) AS tc FROM rc LEFT JOIN tc USING (bkt)),
        |tot AS (SELECT sum(rc) AS R, sum(tc) AS T FROM d),
        |lr AS (SELECT d.bkt,
        |         CAST(round(ln(((CAST(tc AS DOUBLE) + 0.5) / (CAST(T AS DOUBLE) + 512.0)) /
        |                       ((CAST(rc AS DOUBLE) + 0.5) / (CAST(R AS DOUBLE) + 512.0))) * 1000000)
        |           AS DECIMAL(18,0)) AS lr6
        |       FROM d, tot)
        |SELECT b.doc_id AS doc_id, b.lang AS lang, count(*) AS n_tokens,
        |  round(CAST(sum(lr.lr6) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE), 6) AS weight
        |FROM b JOIN lr USING (bkt) GROUP BY 1, 2""".stripMargin,
    // q152 (validated ANN): same exact brute-force oracle shape as
    // q17/q32; recall_ok pins the PQ index at its measured floor
    "q152_similarity_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 10),
        |cand AS (
        |  SELECT probe_id, e.vec_id,
        |         list_dot_product(p, v) /
        |         (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(v, v))) AS s
        |  FROM probes, e WHERE e.vec_id != probe_id)
        |SELECT probe_id, vec_id, round(s, 6) AS sim, rank, 1 AS recall_ok FROM (
        |  SELECT probe_id, vec_id, s,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rank
        |  FROM cand) WHERE rank <= 10""".stripMargin,
    // q153: the 21-level rotate-and-accumulate written out as chained
    // CTEs, GENERATED from the same (bits, buckets) the engine uses
    "q153_hilbert_layout" -> hilbertOracleSql,
    "q154_salted_join" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |       AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    // q155: Lucene-style BM25 with per-term 1e-6-grid contributions
    // summed exactly; query terms generated from the shared constant
    "q155_bm25" -> bm25OracleSql,
    // q156: q146's pair set + the loser rule (smaller gram set, ties to
    // the higher id) as a NOT-IN prune over the sized corpus
    "q156_containment_prune" ->
      """WITH d AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
        |  FROM documents),
        |f AS (SELECT doc_id, g FROM d WHERE len(g) >= 10),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |             len(a.g) AS na, len(b.g) AS nb
        |      FROM f a JOIN f b ON a.doc_id < b.doc_id
        |      WHERE len(list_intersect(a.g, b.g)) /
        |              CAST(least(len(a.g), len(b.g)) AS DOUBLE) >= 0.6),
        |losers AS (SELECT DISTINCT
        |    CASE WHEN na < nb THEN doc_a
        |         WHEN nb < na THEN doc_b
        |         ELSE greatest(doc_a, doc_b) END AS doc_id
        |  FROM p)
        |SELECT doc_id, len(g) AS n_grams FROM d
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    // q157: mean/σ from INTEGER window sums (Σn, Σn²) so both engines
    // compute identical doubles; only complete 7-day frames emit
    "q157_anomaly_windows" ->
      """WITH daily AS (
        |  SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, epoch_day, n,
        |    sum(n) OVER w AS s1, sum(n * n) OVER w AS s2, count(*) OVER w AS cnt
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, epoch_day, n,
        |  round(CAST(s1 AS DOUBLE) / 7.0, 6) AS trail_mean,
        |  round(sqrt(greatest((CAST(s2 AS DOUBLE) -
        |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0, 0.0)), 6)
        |    AS trail_std,
        |  CAST(abs(CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0) >
        |    2.0 * sqrt(greatest((CAST(s2 AS DOUBLE) -
        |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0, 0.0))
        |    AS INTEGER) AS is_anomaly
        |FROM win WHERE cnt = 7""".stripMargin,
    // q158: ranks live on an exact integer micro-grid (floor division
    // only), so the oracle unrolls the same 4 power-iteration rounds and
    // matches bit-for-bit; every sum casts back to BIGINT (DuckDB sums
    // widen to HUGEINT, which pandas would float-ify)
    "q158_pagerank" ->
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
         |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS MATERIALIZED (
         |      SELECT 2 * c AS src, 2 * sk + 1 AS dst FROM e0
         |      UNION ALL
         |      SELECT 2 * sk + 1 AS src, 2 * c AS dst FROM e0),
         |${pageRankRoundsSql(4)}
         |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
         |         AS kind,
         |       node // 2 AS key,
         |       rnk AS "rank"
         |FROM r4""".stripMargin,
    // q159: counts from the train split, held-out docs scored with the
    // same nested backoff CASE (association order matters for IEEE
    // parity); α literals cast to DOUBLE — the q139 lesson
    "q159_trigram_backoff" ->
      """WITH trd AS (
        |  SELECT regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents WHERE doc_id % 10 <> 7),
        |trt AS (
        |  SELECT toks[i] AS cur,
        |         CASE WHEN i > 1 THEN toks[i - 1] END AS p1,
        |         CASE WHEN i > 2 THEN toks[i - 2] END AS p2
        |  FROM (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM trd)),
        |c1 AS (SELECT cur, count(*) AS c1 FROM trt GROUP BY 1),
        |nv AS (SELECT CAST(sum(c1) AS BIGINT) AS N, count(*) AS V FROM c1),
        |c2 AS (SELECT p1, cur, count(*) AS c2 FROM trt
        |       WHERE p1 IS NOT NULL GROUP BY 1, 2),
        |cf1 AS (SELECT p1, CAST(sum(c2) AS BIGINT) AS cf1 FROM c2 GROUP BY 1),
        |c3 AS (SELECT p2, p1, cur, count(*) AS c3 FROM trt
        |       WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |cf2 AS (SELECT p2, p1, CAST(sum(c3) AS BIGINT) AS cf2 FROM c3
        |        GROUP BY 1, 2),
        |hd AS (
        |  SELECT doc_id, toks FROM (
        |    SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+') AS toks
        |    FROM documents WHERE doc_id % 10 = 7)
        |  WHERE len(toks) > 0),
        |tt AS (
        |  SELECT doc_id, i, toks[i] AS cur,
        |         CASE WHEN i > 1 THEN toks[i - 1] END AS p1,
        |         CASE WHEN i > 2 THEN toks[i - 2] END AS p2
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        |        FROM hd)),
        |terms AS (
        |  SELECT tt.doc_id,
        |    CAST(round(-ln(CASE WHEN tt.i = 1 THEN
        |        CAST(coalesce(c1.c1, 0) + 1 AS DOUBLE)
        |          / CAST(nv.N + nv.V AS DOUBLE)
        |      WHEN tt.i = 2 THEN
        |        CASE WHEN c2.c2 IS NOT NULL
        |          THEN CAST(c2.c2 AS DOUBLE) / CAST(cf1.cf1 AS DOUBLE)
        |          ELSE CAST(0.4 AS DOUBLE) *
        |            (CAST(coalesce(c1.c1, 0) + 1 AS DOUBLE)
        |              / CAST(nv.N + nv.V AS DOUBLE)) END
        |      ELSE
        |        CASE WHEN c3.c3 IS NOT NULL
        |          THEN CAST(c3.c3 AS DOUBLE) / CAST(cf2.cf2 AS DOUBLE)
        |          ELSE CAST(0.4 AS DOUBLE) * (CASE WHEN c2.c2 IS NOT NULL
        |            THEN CAST(c2.c2 AS DOUBLE) / CAST(cf1.cf1 AS DOUBLE)
        |            ELSE CAST(0.4 AS DOUBLE) *
        |              (CAST(coalesce(c1.c1, 0) + 1 AS DOUBLE)
        |                / CAST(nv.N + nv.V AS DOUBLE)) END) END
        |      END) * 1000000) AS DECIMAL(18,0)) AS mic
        |  FROM tt
        |  LEFT JOIN c1 USING (cur)
        |  LEFT JOIN c2 ON c2.p1 = tt.p1 AND c2.cur = tt.cur
        |  LEFT JOIN cf1 ON cf1.p1 = tt.p1
        |  LEFT JOIN c3 ON c3.p2 = tt.p2 AND c3.p1 = tt.p1 AND c3.cur = tt.cur
        |  LEFT JOIN cf2 ON cf2.p2 = tt.p2 AND cf2.p1 = tt.p1, nv)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE), 6)
        |    AS sum_nll,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    / count(*), 6) AS avg_nll
        |FROM terms GROUP BY 1""".stripMargin,
    // q160: D's numerator is exact integers (max|cumA·nB − cumB·nA|);
    // every sum casts back to BIGINT before the window/products
    "q160_ks_drift" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vq,
        |         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS a
        |  FROM events),
        |g AS (SELECT event_type, vq, CAST(sum(a) AS BIGINT) AS ca,
        |             CAST(sum(1 - a) AS BIGINT) AS cb
        |      FROM p GROUP BY 1, 2),
        |c AS (SELECT event_type,
        |        CAST(sum(ca) OVER (PARTITION BY event_type ORDER BY vq)
        |          AS BIGINT) AS cuma,
        |        CAST(sum(cb) OVER (PARTITION BY event_type ORDER BY vq)
        |          AS BIGINT) AS cumb
        |      FROM g),
        |t AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS n_a,
        |             CAST(sum(cb) AS BIGINT) AS n_b
        |      FROM g GROUP BY 1)
        |SELECT event_type, max(n_a) AS n_a, max(n_b) AS n_b,
        |  max(abs(cuma * n_b - cumb * n_a)) AS d_num,
        |  round(CAST(max(abs(cuma * n_b - cumb * n_a)) AS DOUBLE) /
        |        CAST(max(n_a) * max(n_b) AS DOUBLE), 6) AS ks_d
        |FROM c JOIN t USING (event_type)
        |GROUP BY 1""".stripMargin,
    // q161: the oracle runs the PLAIN theta self-join the binned engine
    // plan exists to avoid — same pair set proves candidate completeness
    "q161_coactivity" ->
      """WITH s AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         CAST(min(epoch_us(ts)) AS BIGINT) AS s,
        |         CAST(max(epoch_us(ts)) AS BIGINT) AS e
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.day AS day, count(*) AS overlap_pairs
        |      FROM s a JOIN s b ON a.day = b.day AND a.user_id < b.user_id
        |       AND a.s <= b.e AND b.s <= a.e
        |      GROUP BY 1),
        |n AS (SELECT day, count(*) AS n_users FROM s GROUP BY 1)
        |SELECT CAST(datediff('day', DATE '1970-01-01', n.day) AS BIGINT)
        |         AS epoch_day,
        |       n_users, CAST(coalesce(p.overlap_pairs, 0) AS BIGINT)
        |         AS overlap_pairs
        |FROM n LEFT JOIN p USING (day)""".stripMargin,
    // q162: the oracle materializes every ladder window as a STRING and
    // groups on it where the engine groups xxhash64 longs — the standing
    // collision audit (q137/q140/q141 convention); every input doc gets
    // a row (0 = clean)
    "q162_dup_span_ladder" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, 20 AS w,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 20 + 2),
        |      i -> substr(t, i, 20)))) AS win
        |  FROM n WHERE len(t) >= 20
        |  UNION ALL
        |  SELECT doc_id, 40 AS w,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 40 + 2),
        |      i -> substr(t, i, 40)))) AS win
        |  FROM n WHERE len(t) >= 40
        |  UNION ALL
        |  SELECT doc_id, 80 AS w,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 80 + 2),
        |      i -> substr(t, i, 80)))) AS win
        |  FROM n WHERE len(t) >= 80),
        |d AS (SELECT w, win FROM u GROUP BY 1, 2 HAVING count(*) >= 2),
        |m AS (SELECT u.doc_id, max(u.w) AS mw FROM u JOIN d USING (w, win)
        |      GROUP BY 1)
        |SELECT n.doc_id, CAST(coalesce(m.mw, 0) AS INTEGER) AS max_dup_win
        |FROM n LEFT JOIN m USING (doc_id)""".stripMargin,
    // q163: q146's pair derivation, then triangles by the orientation-free
    // id-ordered triple join (the engine's degree-ordered orientation
    // finds the same set — triangles are orientation-independent)
    "q163_dup_graph_triangles" ->
      """WITH d AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
        |  FROM documents),
        |f AS (SELECT * FROM d WHERE len(g) >= 10),
        |p AS (SELECT doc_a, doc_b FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         len(list_intersect(a.g, b.g)) /
        |           CAST(least(len(a.g), len(b.g)) AS DOUBLE) AS c
        |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
        |  WHERE c >= 0.6),
        |deg AS (SELECT id, count(*) AS degree FROM (
        |    SELECT doc_a AS id FROM p UNION ALL SELECT doc_b FROM p)
        |  GROUP BY 1),
        |tri AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
        |        FROM p e1 JOIN p e2 ON e2.doc_a = e1.doc_b
        |        JOIN p e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        |tn AS (SELECT id, count(*) AS nt FROM (
        |    SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY 1)
        |SELECT deg.id AS doc_id, deg.degree,
        |  CAST(coalesce(tn.nt, 0) AS BIGINT) AS n_triangles,
        |  round(CASE WHEN deg.degree >= 2
        |    THEN CAST(2 * coalesce(tn.nt, 0) AS DOUBLE) /
        |         CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
        |    ELSE CAST(0 AS DOUBLE) END, 6) AS clustering
        |FROM deg LEFT JOIN tn USING (id)""".stripMargin,
    "q164_mmr_topk" -> mmrOracleSql,
    // q165: the A-ES key needs only ln + one division over the repo's
    // multiplicative hash — both engines compute identical doubles
    "q165_weighted_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id, n_chars,
        |         ((doc_id % 1000003) * 2654435761) >> 16 AS hh
        |  FROM documents),
        |k AS (
        |  SELECT lang, doc_id, n_chars,
        |         ln(CAST((hh % 1048576) + 1 AS DOUBLE) /
        |            CAST(1048577 AS DOUBLE)) /
        |           CAST(n_chars + 1 AS DOUBLE) AS key
        |  FROM h)
        |SELECT lang, doc_id, n_chars, round(key, 6) AS es_key,
        |       CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY key DESC, doc_id) AS rank FROM k)
        |WHERE rank <= 5""".stripMargin,
    // q166: chained first-touch stage CTEs; latency sums integer SECONDS
    // before one mirrored double division chain
    "q166_funnel" ->
      """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(s1.t) AS t
        |       FROM events e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(s2.t2) AS t
        |       FROM events e JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > s2.t2
        |       GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(s3.t2) AS t
        |       FROM events e JOIN s3 ON s3.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s3.t2
        |       GROUP BY 1),
        |r AS (
        |  SELECT 1 AS stage, 'signup' AS event_type, count(*) AS n_users,
        |         CAST(NULL AS DOUBLE) AS avg_hours_from_prev FROM s1
        |  UNION ALL
        |  SELECT 2, 'view', count(*),
        |         round(CAST(sum((t2 - t) // 1000000) AS DOUBLE) / count(*)
        |           / 3600.0, 6) FROM s2
        |  UNION ALL
        |  SELECT 3, 'click', count(*),
        |         round(CAST(sum((t2 - t) // 1000000) AS DOUBLE) / count(*)
        |           / 3600.0, 6) FROM s3
        |  UNION ALL
        |  SELECT 4, 'purchase', count(*),
        |         round(CAST(sum((t2 - t) // 1000000) AS DOUBLE) / count(*)
        |           / 3600.0, 6) FROM s4)
        |SELECT * FROM r WHERE n_users > 0""".stripMargin,
    // q167: integer regex-run counts (identical in Java regex and RE2 for
    // these classes) + one literal-mirrored double expression
    "q167_readability" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+')) AS BIGINT)
        |    AS words,
        |  CAST(greatest(len(regexp_extract_all(coalesce(text, ''),
        |    '[.!?]+')), 1) AS BIGINT) AS sentences,
        |  CAST(len(regexp_extract_all(coalesce(text, ''),
        |    '[aeiouyAEIOUY]+')) AS BIGINT) AS syllables,
        |  round(CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) *
        |        (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE) *
        |        (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)), 6)
        |    AS fre
        |FROM documents
        |WHERE len(regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+')) > 0"""
        .stripMargin,
    // q168: exact percentiles are the oracle-checked columns (q37
    // parity); the GK rank-contract flag pins to 1 (q29 pattern)
    "q168_quantile_sketch" ->
      """SELECT event_type, count(*) AS n_events,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  quantile_cont(value, 0.99) AS p99,
        |  1 AS approx_rank_ok
        |FROM events GROUP BY event_type""".stripMargin,
    // q169: word-adjacency graph + the shared exact pagerank rounds.
    // Node ids here are the raw word STRINGS where the engine rides
    // xxhash64 longs — rank values are id-independent (the iteration
    // sums over neighbors, never compares ids), so this is the standing
    // collision audit: a hash collision engine-side merges two nodes
    // and fails the compare
    "q169_textrank" ->
      s"""WITH n AS (SELECT regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')
         |             AS t FROM documents),
         |tk AS (SELECT list_filter(string_split(t, ' '), x -> x <> '')
         |         AS toks FROM n),
         |ap AS MATERIALIZED (
         |  SELECT DISTINCT least(toks[i], toks[i + 1]) AS wa,
         |                  greatest(toks[i], toks[i + 1]) AS wb
         |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i
         |        FROM tk WHERE len(toks) > 1)
         |  WHERE toks[i] != toks[i + 1]),
         |e AS MATERIALIZED (
         |  SELECT wa AS src, wb AS dst FROM ap
         |  UNION ALL
         |  SELECT wb AS src, wa AS dst FROM ap),
         |${pageRankRoundsSql(4)}
         |SELECT word, rnk AS "rank", CAST(pos AS BIGINT) AS pos FROM (
         |  SELECT node AS word, rnk,
         |         row_number() OVER (ORDER BY rnk DESC, node) AS pos
         |  FROM r4)
         |WHERE pos <= 20""".stripMargin,
    // q170: weighted rounds — rank flows in proportion to edge weight,
    // still floor division only
    "q170_pagerank_weighted" ->
      s"""WITH e0 AS (SELECT o_custkey AS c, l_suppkey AS sk,
         |              count(*) AS w
         |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |            GROUP BY 1, 2),
         |e AS MATERIALIZED (
         |      SELECT 2 * c AS src, 2 * sk + 1 AS dst, w FROM e0
         |      UNION ALL
         |      SELECT 2 * sk + 1 AS src, 2 * c AS dst, w FROM e0),
         |${pageRankWeightedRoundsSql(4)}
         |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
         |         AS kind,
         |       node // 2 AS key,
         |       rnk AS "rank"
         |FROM r4""".stripMargin,
    // q171: full rebuild — one aggregate over ALL events; the engine's
    // snapshot+delta merge must land on identical rows
    "q171_incremental_agg" ->
      """SELECT user_id, event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(round(value * 1000000) AS DECIMAL(18,0))) /
        |    CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE), 6) AS sum_value,
        |  CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
        |FROM events GROUP BY 1, 2""".stripMargin,
    // q172: integer Hamilton apportionment + the q165 hash order — every
    // sum cast back to BIGINT per the HUGEINT convention
    "q172_proportional_holdout" ->
      """WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cnt),
        |quota AS (SELECT lang, n, (n * 100) // nt AS k0,
        |                 n * 100 - ((n * 100) // nt) * nt AS rem
        |          FROM cnt, tot),
        |spare AS (SELECT CAST(100 - sum(k0) AS BIGINT) AS R FROM quota),
        |alloc AS (SELECT lang, n AS n_stratum,
        |            k0 + CASE WHEN row_number() OVER (ORDER BY rem DESC,
        |              lang) <= R THEN 1 ELSE 0 END AS k_alloc
        |          FROM quota, spare),
        |h AS (SELECT lang, doc_id,
        |        ((doc_id % 1000003) * 2654435761) >> 16 AS hh
        |      FROM documents),
        |r AS (SELECT h.lang, h.doc_id,
        |        CAST(row_number() OVER (PARTITION BY h.lang
        |          ORDER BY h.hh, h.doc_id) AS BIGINT) AS sel_rank,
        |        a.n_stratum, CAST(a.k_alloc AS BIGINT) AS k_alloc
        |      FROM h JOIN alloc a USING (lang))
        |SELECT lang, doc_id, sel_rank, n_stratum, k_alloc
        |FROM r WHERE sel_rank <= k_alloc""".stripMargin,
    // q173: the same 4 synchronous rounds unrolled — per-node label
    // histogram, pick (count DESC, label ASC)
    "q173_label_propagation" ->
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
         |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS MATERIALIZED (
         |      SELECT 2 * c AS src, 2 * sk + 1 AS dst FROM e0
         |      UNION ALL
         |      SELECT 2 * sk + 1 AS src, 2 * c AS dst FROM e0),
         |${lpaRoundsSql(4)}
         |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
         |         AS kind,
         |       node // 2 AS key,
         |       lbl AS community
         |FROM l4""".stripMargin,
    // q174: integer ppm credits; the per-purchase invariant sum = 1e6 is
    // what makes the floor-division remainder pinning matter
    "q174_multitouch" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS pt
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS vt
        |      FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.user_id, p.p_id, v.view_id, v.vt
        |      FROM p JOIN v ON v.user_id = p.user_id
        |       AND v.vt <= p.pt AND v.vt >= p.pt - 86400000000),
        |r AS (SELECT user_id, p_id, view_id,
        |        row_number() OVER (PARTITION BY p_id ORDER BY vt, view_id)
        |          AS pos,
        |        count(*) OVER (PARTITION BY p_id) AS n
        |      FROM j),
        |c AS (SELECT user_id, view_id,
        |        CASE WHEN n = 1 THEN 1000000
        |             WHEN n = 2 THEN 500000
        |             WHEN pos = 1 OR pos = n THEN 400000
        |             ELSE (200000 // (n - 2)) +
        |                  CASE WHEN pos = 2
        |                       THEN 200000 - (200000 // (n - 2)) * (n - 2)
        |                       ELSE 0 END
        |        END AS credit
        |      FROM r)
        |SELECT user_id, view_id, CAST(sum(credit) AS BIGINT) AS credit_ppm,
        |       count(*) AS n_purchases_credited
        |FROM c GROUP BY 1, 2""".stripMargin,
    // q175: the capped co-occurrence join written out plainly; degrees on
    // the same capped set so the cosine is internally consistent
    "q175_item_cf" ->
      """WITH i0 AS (SELECT DISTINCT o_custkey AS u, l_suppkey AS it
        |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |ud AS (SELECT u, count(*) AS udeg FROM i0 GROUP BY 1),
        |i AS MATERIALIZED (
        |  SELECT i0.u, i0.it FROM i0 JOIN ud USING (u) WHERE udeg <= 50),
        |d AS (SELECT it, count(*) AS deg FROM i GROUP BY 1),
        |p AS (SELECT a.it AS it_a, b.it AS it_b, count(*) AS co
        |      FROM i a JOIN i b ON a.u = b.u AND a.it < b.it
        |      GROUP BY 1, 2)
        |SELECT p.it_a, p.it_b, p.co,
        |  round(CAST(p.co AS DOUBLE) /
        |        sqrt(CAST(da.deg * db.deg AS DOUBLE)), 6) AS cosine
        |FROM p JOIN d da ON da.it = p.it_a JOIN d db ON db.it = p.it_b
        |WHERE p.co >= 2""".stripMargin,
    // q176: the same (ts, event_id) total order drives DuckDB's lag
    "q176_event_trigrams" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lag(event_type, 2) OVER w AS t1,
        |         lag(event_type, 1) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT t1, t2, event_type AS t3,
        |       count(DISTINCT user_id) AS support_users,
        |       count(*) AS n_occurrences
        |FROM s WHERE t1 IS NOT NULL
        |GROUP BY 1, 2, 3
        |HAVING count(DISTINCT user_id) >= 5""".stripMargin,
    // q177: integer ppm shares; entropy terms on a 1e-9 grid summed as
    // exact decimal nanos (the q133 device at finer grain)
    "q177_skew_report" ->
      """WITH u AS (
        |  SELECT 'l_orderkey' AS key_col, l_orderkey AS v FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
        |c AS (SELECT key_col, v, count(*) AS c FROM u GROUP BY 1, 2),
        |r AS (SELECT key_col, v, c,
        |        row_number() OVER (PARTITION BY key_col
        |          ORDER BY c DESC, v) AS rk,
        |        CAST(sum(c) OVER (PARTITION BY key_col) AS BIGINT) AS nt
        |      FROM c),
        |t AS (SELECT key_col, c, rk, nt,
        |        CAST(round(-(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE)) *
        |          ln(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE)) * 1000000000)
        |          AS DECIMAL(20,0)) AS term
        |      FROM r)
        |SELECT key_col, max(nt) AS n_rows, count(*) AS n_distinct,
        |  (max(c) * 1000000) // max(nt) AS top1_ppm,
        |  (CAST(sum(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS BIGINT)
        |     * 1000000) // max(nt) AS top10_ppm,
        |  round(CAST(sum(term) / CAST(1000000000 AS DECIMAL(10,0))
        |    AS DOUBLE), 6) AS entropy
        |FROM t GROUP BY 1""".stripMargin,
    // q178: one literal-mirrored IEEE chain (every literal cast to
    // DOUBLE); counts exact
    "q178_conversion_ci" ->
      """WITH pu AS (
        |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |           AS BIGINT) AS epoch_day, user_id,
        |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS p
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT epoch_day,
        |         CAST(sum(v) AS BIGINT) AS trials,
        |         CAST(sum(v * p) AS BIGINT) AS conversions
        |  FROM pu GROUP BY 1),
        |c AS (SELECT epoch_day, trials, conversions,
        |        CAST(conversions AS DOUBLE) / CAST(trials AS DOUBLE) AS p,
        |        CAST(trials AS DOUBLE) AS n,
        |        CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2
        |      FROM d WHERE trials > 0)
        |SELECT epoch_day, trials, conversions, round(p, 6) AS rate,
        |  round(((p + z2 / (CAST(2.0 AS DOUBLE) * n)) -
        |    CAST(1.96 AS DOUBLE) *
        |      sqrt(p * (CAST(1.0 AS DOUBLE) - p) / n +
        |        z2 / (CAST(4.0 AS DOUBLE) * n * n))) /
        |    (CAST(1.0 AS DOUBLE) + z2 / n), 6) AS wilson_lo,
        |  round(((p + z2 / (CAST(2.0 AS DOUBLE) * n)) +
        |    CAST(1.96 AS DOUBLE) *
        |      sqrt(p * (CAST(1.0 AS DOUBLE) - p) / n +
        |        z2 / (CAST(4.0 AS DOUBLE) * n * n))) /
        |    (CAST(1.0 AS DOUBLE) + z2 / n), 6) AS wilson_hi
        |FROM c""".stripMargin,
    // q179: same user-DAY conversion semantics as q178 (lifetime
    // conversion saturates to 1 here and zeroes the z denominator)
    "q179_ab_ztest" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS p
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY user_id, CAST(ts AS DATE)),
        |a AS (
        |  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN v ELSE 0 END)
        |           AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN v * p ELSE 0 END)
        |           AS BIGINT) AS x_a,
        |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN v ELSE 0 END)
        |           AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN v * p ELSE 0 END)
        |           AS BIGINT) AS x_b
        |  FROM pu),
        |c AS (
        |  SELECT n_a, x_a, n_b, x_b,
        |         CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |         CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        |         CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
        |           AS pool
        |  FROM a)
        |SELECT n_a, x_a, n_b, x_b,
        |  round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
        |  round((pa - pb) / sqrt(pool * (CAST(1.0 AS DOUBLE) - pool) *
        |    (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE) +
        |     CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))), 6) AS z_stat,
        |  CAST(abs((pa - pb) / sqrt(pool * (CAST(1.0 AS DOUBLE) - pool) *
        |    (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE) +
        |     CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)))) >
        |    CAST(1.96 AS DOUBLE) AS INTEGER) AS significant
        |FROM c""".stripMargin,
    // q180: the q14 heuristic replayed per doc, then the row-normalized
    // confusion cells (recall reads off the diagonal)
    "q180_lang_confusion" ->
      """WITH pred AS (
        |  SELECT lang AS lang_declared,
        |    CASE WHEN greatest(h_en, h_de, h_fr, h_es) <= 0 THEN 'und'
        |         WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
        |         WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
        |         WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
        |         ELSE 'es' END AS lang_pred
        |  FROM (SELECT lang,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS h_en,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|eine|zu|den)\b')) AS h_de,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|des|du|que|pas)\b')) AS h_fr,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|del|que|por|con|para)\b')) AS h_es
        |    FROM documents)),
        |cells AS (SELECT lang_declared, lang_pred, count(*) AS n
        |          FROM pred GROUP BY 1, 2),
        |t AS (SELECT lang_declared,
        |        CAST(sum(n) AS BIGINT) AS rt FROM cells GROUP BY 1)
        |SELECT c.lang_declared, c.lang_pred, c.n,
        |       (c.n * 1000000) // t.rt AS row_ppm
        |FROM cells c JOIN t USING (lang_declared)""".stripMargin,
    // q181: the same 4 integer flow rounds unrolled (q158 discipline on
    // a row-stochastic matrix)
    "q181_markov_kstep" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev
        |  FROM events),
        |tr AS (SELECT prev, event_type AS cur, count(*) AS c
        |       FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |trr AS MATERIALIZED (
        |  SELECT prev, cur, c,
        |         CAST(sum(c) OVER (PARTITION BY prev) AS BIGINT) AS rs
        |  FROM tr),
        |st AS MATERIALIZED (SELECT DISTINCT prev FROM trr),
        |v0 AS (SELECT prev AS state,
        |         1000000 // (SELECT count(*) FROM st) AS mass FROM st),
        |v1 AS MATERIALIZED (
        |  SELECT state, CAST(sum(mass) AS BIGINT) AS mass FROM (
        |    SELECT t.cur AS state,
        |           CAST(sum((v.mass * t.c) // t.rs) AS BIGINT) AS mass
        |    FROM trr t JOIN v0 v ON v.state = t.prev GROUP BY 1
        |    UNION ALL
        |    SELECT v.state, v.mass FROM v0 v
        |    WHERE v.state NOT IN (SELECT prev FROM st))
        |  GROUP BY 1),
        |v2 AS MATERIALIZED (
        |  SELECT state, CAST(sum(mass) AS BIGINT) AS mass FROM (
        |    SELECT t.cur AS state,
        |           CAST(sum((v.mass * t.c) // t.rs) AS BIGINT) AS mass
        |    FROM trr t JOIN v1 v ON v.state = t.prev GROUP BY 1
        |    UNION ALL
        |    SELECT v.state, v.mass FROM v1 v
        |    WHERE v.state NOT IN (SELECT prev FROM st))
        |  GROUP BY 1),
        |v3 AS MATERIALIZED (
        |  SELECT state, CAST(sum(mass) AS BIGINT) AS mass FROM (
        |    SELECT t.cur AS state,
        |           CAST(sum((v.mass * t.c) // t.rs) AS BIGINT) AS mass
        |    FROM trr t JOIN v2 v ON v.state = t.prev GROUP BY 1
        |    UNION ALL
        |    SELECT v.state, v.mass FROM v2 v
        |    WHERE v.state NOT IN (SELECT prev FROM st))
        |  GROUP BY 1),
        |v4 AS MATERIALIZED (
        |  SELECT state, CAST(sum(mass) AS BIGINT) AS mass FROM (
        |    SELECT t.cur AS state,
        |           CAST(sum((v.mass * t.c) // t.rs) AS BIGINT) AS mass
        |    FROM trr t JOIN v3 v ON v.state = t.prev GROUP BY 1
        |    UNION ALL
        |    SELECT v.state, v.mass FROM v3 v
        |    WHERE v.state NOT IN (SELECT prev FROM st))
        |  GROUP BY 1)
        |SELECT state, mass AS mass_micros FROM v4""".stripMargin,
    // q182: capped basket pair join; lift on pure integers
    "q182_basket_pairs" ->
      """WITH b0 AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS it
        |            FROM lineitem),
        |sz AS (SELECT b, count(*) AS bs FROM b0 GROUP BY 1),
        |i AS MATERIALIZED (
        |  SELECT b0.b, b0.it FROM b0 JOIN sz USING (b) WHERE bs <= 20),
        |tot AS (SELECT count(DISTINCT b) AS nb FROM i),
        |s AS (SELECT it, count(*) AS cnt FROM i GROUP BY 1),
        |p AS (SELECT a.it AS it_a, b2.it AS it_b, count(*) AS co
        |      FROM i a JOIN i b2 ON a.b = b2.b AND a.it < b2.it
        |      GROUP BY 1, 2)
        |SELECT p.it_a, p.it_b, p.co,
        |  (p.co * tot.nb * 1000000) // (sa.cnt * sb.cnt) AS lift_ppm
        |FROM p JOIN s sa ON sa.it = p.it_a JOIN s sb ON sb.it = p.it_b, tot
        |WHERE p.co >= 2""".stripMargin,
    // q183: integer log2 binning (binary-string length — float log can
    // misbin exact powers of two); regr_* parity per q99
    "q183_length_powerlaw" ->
      """WITH b AS (
        |  SELECT CAST(length(bin(CAST(n_chars AS BIGINT))) - 1 AS BIGINT)
        |           AS bin,
        |         count(*) AS n_docs
        |  FROM documents WHERE n_chars > 0 GROUP BY 1),
        |f AS (
        |  SELECT regr_slope(ln(CAST(n_docs AS DOUBLE)),
        |           ln(power(CAST(2.0 AS DOUBLE), CAST(bin AS DOUBLE))))
        |           AS slope,
        |         regr_intercept(ln(CAST(n_docs AS DOUBLE)),
        |           ln(power(CAST(2.0 AS DOUBLE), CAST(bin AS DOUBLE))))
        |           AS intercept,
        |         regr_r2(ln(CAST(n_docs AS DOUBLE)),
        |           ln(power(CAST(2.0 AS DOUBLE), CAST(bin AS DOUBLE))))
        |           AS r2
        |  FROM b)
        |SELECT b.bin, b.n_docs, round(f.slope, 6) AS slope,
        |       round(f.intercept, 6) AS intercept, round(f.r2, 6) AS r2
        |FROM b, f""".stripMargin,
    // q184: q163's pair derivation, then the same 4 synchronous peel
    // rounds unrolled — per-round live degree via the alive-endpoint
    // join, peel-all-below-k at once
    "q184_kcore" ->
      s"""WITH d AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
         |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
         |  FROM documents),
         |f AS (SELECT * FROM d WHERE len(g) >= 10),
         |p AS (SELECT doc_a, doc_b FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         len(list_intersect(a.g, b.g)) /
         |           CAST(least(len(a.g), len(b.g)) AS DOUBLE) AS c
         |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
         |  WHERE c >= 0.6),
         |e AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM p
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM p),
         |${kCoreRoundsSql(k = 2, rounds = 4)}
         |SELECT node AS doc_id, peel_round, deg,
         |       CAST(CASE WHEN peel_round = 0 THEN 1 ELSE 0 END
         |         AS INTEGER) AS in_kcore
         |FROM (${(1 to 4).map(t =>
              s"SELECT node, CAST($t AS BIGINT) AS peel_round, deg " +
                s"FROM kd$t WHERE deg < 2").mkString("\n  UNION ALL ")}
         |  UNION ALL
         |  SELECT node, CAST(0 AS BIGINT) AS peel_round, deg
         |  FROM kdfin)""".stripMargin,
    // q185: each positive step is one min-aggregate join (earliest
    // event strictly after the previous step, within 24h of the
    // anchor); each veto is one NOT EXISTS over the gap the match
    // actually used — integer micros end to end
    "q185_cep_match" ->
      """WITH a AS (SELECT user_id, event_id AS anchor_id,
        |             CAST(epoch_us(ts) AS BIGINT) AS t0_us
        |           FROM events WHERE event_type = 'view'),
        |s1 AS (SELECT a.user_id, a.anchor_id, a.t0_us,
        |         CAST(min(epoch_us(b.ts)) AS BIGINT) AS t1_us
        |       FROM a JOIN events b ON b.user_id = a.user_id
        |        AND b.event_type = 'click'
        |        AND epoch_us(b.ts) > a.t0_us
        |        AND epoch_us(b.ts) <= a.t0_us + 86400000000
        |       GROUP BY 1, 2, 3),
        |v1 AS (SELECT * FROM s1 m WHERE NOT EXISTS (
        |         SELECT 1 FROM events c WHERE c.user_id = m.user_id
        |          AND c.event_type = 'error'
        |          AND epoch_us(c.ts) > m.t0_us
        |          AND epoch_us(c.ts) < m.t1_us)),
        |s2 AS (SELECT m.user_id, m.anchor_id, m.t0_us, m.t1_us,
        |         CAST(min(epoch_us(b.ts)) AS BIGINT) AS t2_us
        |       FROM v1 m JOIN events b ON b.user_id = m.user_id
        |        AND b.event_type = 'purchase'
        |        AND epoch_us(b.ts) > m.t1_us
        |        AND epoch_us(b.ts) <= m.t0_us + 86400000000
        |       GROUP BY 1, 2, 3, 4)
        |SELECT user_id, anchor_id, t0_us, t1_us, t2_us
        |FROM s2 m WHERE NOT EXISTS (
        |  SELECT 1 FROM events c WHERE c.user_id = m.user_id
        |   AND c.event_type = 'view'
        |   AND epoch_us(c.ts) > m.t1_us
        |   AND epoch_us(c.ts) < m.t2_us)""".stripMargin,
    // q186: the q32 oracle shape — exact top-10 (q7 parity) with the
    // NSW recall flag pinned to 1
    "q186_similarity_nsw" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 10),
        |cand AS (
        |  SELECT probe_id, e.vec_id,
        |         list_dot_product(p, v) /
        |         (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(v, v))) AS s
        |  FROM probes, e WHERE e.vec_id != probe_id)
        |SELECT probe_id, vec_id, round(s, 6) AS sim, rank, 1 AS recall_ok FROM (
        |  SELECT probe_id, vec_id, s,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rank
        |  FROM cand) WHERE rank <= 10""".stripMargin,
    // q188: q163's pair derivation + 3 unrolled synchronous BFS levels
    // (each frontier expands from the previous FRESH set, anti-joined
    // against everything visited); harmonic as exact 1e6 // dist sums
    "q188_harmonic" ->
      s"""WITH d AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
         |    i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
         |  FROM documents),
         |f AS (SELECT * FROM d WHERE len(g) >= 10),
         |p AS (SELECT doc_a, doc_b FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         len(list_intersect(a.g, b.g)) /
         |           CAST(least(len(a.g), len(b.g)) AS DOUBLE) AS c
         |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
         |  WHERE c >= 0.6),
         |e AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM p
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM p),
         |${bfsRoundsSql(3)}
         |SELECT root AS doc_id, count(*) AS n_reached,
         |       CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_micro
         |FROM (${(1 to 3).map(t =>
              s"SELECT root, node, $t AS dist FROM bh$t")
              .mkString("\n  UNION ALL ")})
         |GROUP BY 1""".stripMargin,
    // q189: distinct (day, user, item) -> basket-size cap -> id-ordered
    // pair self-join (the oracle's plain form of the engine's array
    // fan-out) -> per-day support with the min-support floor
    "q189_daily_basket_pairs" ->
      """WITH x AS (
        |  SELECT DISTINCT
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d,
        |    user_id AS b,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS it
        |  FROM events
        |  WHERE event_type = 'view'
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |ok AS (SELECT d, b FROM (
        |    SELECT d, b, count(*) AS n FROM x GROUP BY 1, 2)
        |  WHERE n BETWEEN 2 AND 20),
        |p AS (SELECT x1.d, x1.it AS it_a, x2.it AS it_b
        |      FROM x x1
        |      JOIN x x2 ON x2.d = x1.d AND x2.b = x1.b AND x1.it < x2.it
        |      JOIN ok ON ok.d = x1.d AND ok.b = x1.b)
        |SELECT d AS epoch_day, it_a, it_b, count(*) AS support
        |FROM p GROUP BY 1, 2, 3""".stripMargin,
    // q191: u estimates as exact integer ratios in one mirrored IEEE
    // division; weights literal-mirrored (1.0 - 0.9 written out, never
    // a folded 0.1 — the q139 lesson); blocked pairs via the same
    // equi-join
    "q191_record_linkage" ->
      """WITH c AS (SELECT c_custkey AS id, c_mktsegment AS b1,
        |    c_nationkey AS f1,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS f2,
        |    substr(c_name, length(c_name) - 1, 1) AS f3,
        |    substr(c_name, length(c_name), 1) AS f4
        |  FROM customer),
        |u1 AS (SELECT CAST(sum(n * n) AS DOUBLE) /
        |         (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS u
        |       FROM (SELECT count(*) AS n FROM c GROUP BY f1)),
        |u2 AS (SELECT CAST(sum(n * n) AS DOUBLE) /
        |         (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS u
        |       FROM (SELECT count(*) AS n FROM c GROUP BY f2)),
        |u3 AS (SELECT CAST(sum(n * n) AS DOUBLE) /
        |         (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS u
        |       FROM (SELECT count(*) AS n FROM c GROUP BY f3)),
        |u4 AS (SELECT CAST(sum(n * n) AS DOUBLE) /
        |         (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS u
        |       FROM (SELECT count(*) AS n FROM c GROUP BY f4)),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |        CASE WHEN a.f1 IS NOT DISTINCT FROM b.f1 THEN 1 ELSE 0 END AS g1,
        |        CASE WHEN a.f2 IS NOT DISTINCT FROM b.f2 THEN 1 ELSE 0 END AS g2,
        |        CASE WHEN a.f3 IS NOT DISTINCT FROM b.f3 THEN 1 ELSE 0 END AS g3,
        |        CASE WHEN a.f4 IS NOT DISTINCT FROM b.f4 THEN 1 ELSE 0 END AS g4
        |      FROM c a JOIN c b ON a.b1 = b.b1 AND a.id < b.id)
        |SELECT id_a, id_b, n_agree, score FROM (
        |  SELECT id_a, id_b, g1 + g2 + g3 + g4 AS n_agree,
        |    round(
        |      (CASE WHEN g1 = 1 THEN ln(CAST(0.9 AS DOUBLE) / u1.u)
        |        ELSE ln((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)) /
        |                (CAST(1.0 AS DOUBLE) - u1.u)) END) +
        |      (CASE WHEN g2 = 1 THEN ln(CAST(0.9 AS DOUBLE) / u2.u)
        |        ELSE ln((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)) /
        |                (CAST(1.0 AS DOUBLE) - u2.u)) END) +
        |      (CASE WHEN g3 = 1 THEN ln(CAST(0.9 AS DOUBLE) / u3.u)
        |        ELSE ln((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)) /
        |                (CAST(1.0 AS DOUBLE) - u3.u)) END) +
        |      (CASE WHEN g4 = 1 THEN ln(CAST(0.9 AS DOUBLE) / u4.u)
        |        ELSE ln((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)) /
        |                (CAST(1.0 AS DOUBLE) - u4.u)) END), 6) AS score
        |  FROM p, u1, u2, u3, u4)
        |WHERE score > 0.0""".stripMargin,
    // q192: q159's add-1 train-split surprisal chain, then the top-k%
    // cut per doc — boundary ties share a mic value, so the selected
    // sum is tie-invariant; k in integer arithmetic
    "q192_mink_prob" ->
      """WITH trt AS (
        |  SELECT unnest(regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+'))
        |    AS tok
        |  FROM documents WHERE doc_id % 10 <> 7),
        |c AS (SELECT tok, count(*) AS c FROM trt GROUP BY 1),
        |nv AS (SELECT CAST(sum(c) AS BIGINT) AS N, count(*) AS V FROM c),
        |hd AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        |        FROM (SELECT doc_id,
        |                regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+')
        |                  AS toks
        |              FROM documents WHERE doc_id % 10 = 7))),
        |j AS (SELECT h.doc_id, h.i,
        |        CAST(round(-ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) /
        |          CAST(nv.N + nv.V AS DOUBLE)) * 1000000)
        |          AS DECIMAL(18,0)) AS mic
        |      FROM hd h LEFT JOIN c USING (tok), nv),
        |r AS (SELECT doc_id, mic,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY mic DESC, i) AS rn,
        |        count(*) OVER (PARTITION BY doc_id) AS n
        |      FROM j)
        |SELECT doc_id, max(n) AS n_tokens, max(k) AS k_tokens,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    / max(k), 6) AS mink_nll
        |FROM (SELECT doc_id, mic, rn, n, (n * 20 + 99) // 100 AS k FROM r)
        |WHERE rn <= k GROUP BY 1""".stripMargin,
    // q193: the EM rounds unrolled (generator keeps the association
    // order in lock-step with the engine's fold)
    "q193_linkage_em" -> emLinkageOracleSql(2),
    // q190: the oracle runs the PLAIN per-lang window cumsum the
    // engine's two-pass form exists to avoid — identical final offsets
    // prove the partial-prefix algebra
    "q190_file_bins" ->
      """SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS sz,
        |  (CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id)
        |     AS BIGINT) - n_chars) // 100000 AS bin
        |FROM documents""".stripMargin,
    // q187: DuckDB cannot replay the lookahead split — it pins the
    // losslessness invariant (summed pretoken chars == len(text)) and
    // the in-band reference-implementation parity flag
    "q187_gpt2_pretok" ->
      """SELECT doc_id,
        |  CAST(len(coalesce(text, '')) AS BIGINT) AS n_chars_total,
        |  1 AS parity_ok
        |FROM documents""".stripMargin,
    // q194: INDEPENDENT algorithm — the suffix-ranking engine result
    // must equal the gram-group-count form (a position is covered by a
    // duplicated >=40-char substring iff its 40-gram occurs twice;
    // islands of covered starts are the maximal spans)
    "q194_exact_substr" ->
      """WITH g AS (
        |  SELECT doc_id, pos, substr(text, CAST(pos AS INTEGER), 40) AS gram
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, len(text) - 39)) AS pos
        |        FROM documents WHERE len(text) >= 40)),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN pos - lag(pos) OVER
        |               (PARTITION BY doc_id ORDER BY pos) > 40
        |             THEN 1 ELSE 0 END AS brk
        |      FROM m),
        |s AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM i)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 40 - min(pos) AS BIGINT) AS span_len,
        |  CAST(count(*) AS BIGINT) AS n_dup_starts
        |FROM s GROUP BY doc_id, grp""".stripMargin,
    // q195: the kleene step as window order statistics — t1 = the
    // 2nd click (rn = 2), the run ceiling = the 4th (rn = 4) applied to
    // the purchase completion AFTER its min-aggregate, exactly the
    // engine's post-aggregation filter; veto = NOT EXISTS on the gap
    // the match used
    "q195_cep_kleene" ->
      """WITH a AS (SELECT user_id, event_id AS anchor_id,
        |             CAST(epoch_us(ts) AS BIGINT) AS t0_us
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT a.user_id, a.anchor_id, a.t0_us,
        |        CAST(epoch_us(b.ts) AS BIGINT) AS t
        |      FROM a JOIN events b ON b.user_id = a.user_id
        |       AND b.event_type = 'click'
        |       AND epoch_us(b.ts) > a.t0_us
        |       AND epoch_us(b.ts) <= a.t0_us + 86400000000),
        |r AS (SELECT user_id, anchor_id, t0_us, t,
        |        row_number() OVER (PARTITION BY user_id, anchor_id
        |                           ORDER BY t) AS rn,
        |        count(*) OVER (PARTITION BY user_id, anchor_id) AS n1
        |      FROM c),
        |s1 AS (SELECT m2.user_id, m2.anchor_id, m2.t0_us, m2.t AS t1_us,
        |         CAST(m2.n1 AS BIGINT) AS n1_reps, m4.t AS ceil_t
        |       FROM (SELECT * FROM r WHERE rn = 2) m2
        |       LEFT JOIN (SELECT user_id, anchor_id, t FROM r
        |                  WHERE rn = 4) m4
        |         ON m4.user_id = m2.user_id
        |        AND m4.anchor_id = m2.anchor_id),
        |v1 AS (SELECT * FROM s1 m WHERE NOT EXISTS (
        |         SELECT 1 FROM events e2 WHERE e2.user_id = m.user_id
        |          AND e2.event_type = 'error'
        |          AND epoch_us(e2.ts) > m.t0_us
        |          AND epoch_us(e2.ts) < m.t1_us)),
        |s2 AS (SELECT m.user_id, m.anchor_id, m.t0_us, m.t1_us,
        |         m.n1_reps, m.ceil_t,
        |         CAST(min(epoch_us(b.ts)) AS BIGINT) AS t2_us
        |       FROM v1 m JOIN events b ON b.user_id = m.user_id
        |        AND b.event_type = 'purchase'
        |        AND epoch_us(b.ts) > m.t1_us
        |        AND epoch_us(b.ts) <= m.t0_us + 86400000000
        |       GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT user_id, anchor_id, t0_us, t1_us, n1_reps, t2_us
        |FROM s2 WHERE ceil_t IS NULL OR t2_us < ceil_t""".stripMargin,
    // q196: q194's independent span derivation + segment reconstruction
    // (lag over spans -> kept segments -> string_agg) + the q15
    // code-point polynomial fold over the cleaned text
    "q196_exact_substr_clean" ->
      """WITH g AS (
        |  SELECT doc_id, pos, substr(text, CAST(pos AS INTEGER), 40) AS gram
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, len(text) - 39)) AS pos
        |        FROM documents WHERE len(text) >= 40)),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN pos - lag(pos) OVER
        |               (PARTITION BY doc_id ORDER BY pos) > 40
        |             THEN 1 ELSE 0 END AS brk
        |      FROM m),
        |s AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM i),
        |sp AS (SELECT doc_id, min(pos) AS a, max(pos) + 40 - 1 AS b
        |       FROM s GROUP BY doc_id, grp),
        |seg AS (
        |  SELECT doc_id,
        |    coalesce(lag(b + 1) OVER (PARTITION BY doc_id ORDER BY a),
        |             CAST(1 AS BIGINT)) AS sa,
        |    a - 1 AS sb
        |  FROM sp
        |  UNION ALL
        |  SELECT sp.doc_id, max(sp.b) + 1, max(CAST(len(dd.text) AS BIGINT))
        |  FROM sp JOIN documents dd ON dd.doc_id = sp.doc_id
        |  GROUP BY sp.doc_id),
        |cl AS (
        |  SELECT d2.doc_id,
        |    string_agg(CASE WHEN seg.sb >= seg.sa
        |      THEN substr(d2.text, CAST(seg.sa AS INTEGER),
        |                  CAST(seg.sb - seg.sa + 1 AS INTEGER))
        |      ELSE '' END, '' ORDER BY seg.sa) AS clean
        |  FROM documents d2 JOIN seg ON seg.doc_id = d2.doc_id
        |  GROUP BY d2.doc_id),
        |st AS (SELECT doc_id, count(*) AS n_spans,
        |         sum(b - a + 1) AS removed_chars
        |       FROM sp GROUP BY doc_id)
        |SELECT dd.doc_id,
        |  CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(st.removed_chars, 0) AS BIGINT) AS removed_chars,
        |  CAST(len(dd.text) - coalesce(st.removed_chars, 0) AS BIGINT)
        |    AS kept_chars,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(coalesce(cl.clean, dd.text), ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS clean_fp
        |FROM documents dd
        |LEFT JOIN st ON st.doc_id = dd.doc_id
        |LEFT JOIN cl ON cl.doc_id = dd.doc_id""".stripMargin,
    // q197: the cross-corpus marking as a gram semi-join — train grams
    // IN the bench gram set, islands as in q194
    "q197_cross_substr" ->
      """WITH tg AS (
        |  SELECT doc_id, pos, substr(text, CAST(pos AS INTEGER), 40) AS gram
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, len(text) - 39)) AS pos
        |        FROM documents WHERE doc_id % 10 <> 7 AND len(text) >= 40)),
        |bg AS (
        |  SELECT DISTINCT substr(text, CAST(pos AS INTEGER), 40) AS gram
        |  FROM (SELECT text,
        |          unnest(generate_series(1, len(text) - 39)) AS pos
        |        FROM documents WHERE doc_id % 10 = 7 AND len(text) >= 40)),
        |m AS (SELECT doc_id, pos FROM tg
        |      WHERE gram IN (SELECT gram FROM bg)),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN pos - lag(pos) OVER
        |               (PARTITION BY doc_id ORDER BY pos) > 40
        |             THEN 1 ELSE 0 END AS brk
        |      FROM m),
        |s AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM i)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 40 - min(pos) AS BIGINT) AS span_len,
        |  CAST(count(*) AS BIGINT) AS n_dup_starts
        |FROM s GROUP BY doc_id, grp""".stripMargin,
    // q198: position-wise substring equality counts — the overlapping-
    // occurrence semantics the automaton implements, computed the
    // brute-force way
    "q198_blocklist_hits" ->
      """WITH pats(pat) AS (VALUES ('table'), ('key agg'), ('row scan'),
        |                          ('value'), ('fast'), ('a a')),
        |pos AS (SELECT doc_id, text, unnest(generate_series(1, len(text))) AS p
        |        FROM documents),
        |h AS (SELECT doc_id, pat, count(*) AS n_hits
        |      FROM pos CROSS JOIN pats
        |      WHERE p + len(pat) - 1 <= len(text)
        |        AND substr(text, CAST(p AS INTEGER), len(pat)) = pat
        |      GROUP BY 1, 2)
        |SELECT doc_id, pat, CAST(n_hits AS BIGINT) AS n_hits FROM h""".stripMargin,
    // q199: class sizes per ladder level (UNION of GROUP BYs — the
    // oracle may re-scan; the engine must not), then the per-level
    // rollup. Balance bands are floor(x / literal double) mirrored.
    "q199_kanon_ladder" ->
      """WITH base AS MATERIALIZED (
        |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 100.0) AS BIGINT) AS b100,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b1k
        |  FROM customer),
        |cls AS (
        |  SELECT CAST(0 AS BIGINT) AS level, count(*) AS k_class
        |    FROM base GROUP BY nat, seg, b100
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), count(*) FROM base GROUP BY nat, seg, b1k
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), count(*) FROM base GROUP BY nat, seg
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), count(*) FROM base GROUP BY seg)
        |SELECT level, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(k_class) AS BIGINT) AS k_min,
        |  CAST(sum(CASE WHEN k_class < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS risky_classes,
        |  CAST(sum(CASE WHEN k_class < 5 THEN k_class ELSE 0 END) AS BIGINT)
        |    AS risky_rows,
        |  CASE WHEN min(k_class) >= 5 THEN 1 ELSE 0 END AS anonymous
        |FROM cls GROUP BY level""".stripMargin,
    // q200: journey transitions + 5 unrolled value-iteration scenarios
    // (base + one per removed channel), built by the generator below
    "q200_markov_attribution" -> markovRemovalOracleSql(12),
    // q201: DuckDB's jaro_winkler_similarity was fuzz-matched
    // bit-for-bit against the engine kernel (33k pairs: ASCII,
    // multi-byte UTF-8, long strings), so the double compares and the
    // micro floor are exact cross-engine
    "q201_jaro_titles" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id, substr(text, 1, 40) AS title FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        jaro_winkler_similarity(a.title, b.title) AS jw
        |      FROM d a JOIN d b
        |        ON substr(a.title, 1, 2) = substr(b.title, 1, 2)
        |       AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(floor(jw * 1000000.0) AS BIGINT) AS jw_micros
        |FROM p WHERE jw >= CAST(0.90 AS DOUBLE)""".stripMargin,
    // q202: the pair rule is an exact equi-block, so components equal
    // blocks — the oracle groups directly (sound BECAUSE the rule is an
    // equivalence relation; the engine still runs the generic
    // pairs -> components -> survivorship path). Mode tie-break is the
    // deterministic rank window, never bare arg_max.
    "q202_golden_record" ->
      """WITH c AS MATERIALIZED (
        |  SELECT c_custkey AS id, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b1k,
        |    substr(c_name, -1, 1) AS sfx, c_nationkey AS nat,
        |    c_acctbal AS bal
        |  FROM customer),
        |g AS (SELECT seg, b1k, sfx, CAST(min(id) AS BIGINT) AS cluster_id,
        |        CAST(count(*) AS BIGINT) AS n_members, max(bal) AS bal
        |      FROM c GROUP BY 1, 2, 3),
        |mv AS (SELECT seg, b1k, sfx, nat, count(*) AS n
        |       FROM c GROUP BY 1, 2, 3, 4),
        |mr AS (SELECT seg, b1k, sfx, nat,
        |         rank() OVER (PARTITION BY seg, b1k, sfx
        |                      ORDER BY n DESC, nat ASC) AS r
        |       FROM mv)
        |SELECT g.cluster_id, g.n_members, mr.nat, g.bal
        |FROM g JOIN mr ON g.seg = mr.seg AND g.b1k = mr.b1k
        |  AND g.sfx = mr.sfx AND mr.r = 1""".stripMargin,
    // q203: q34's session derivation + a plain range join (DuckDB's
    // IEJoin handles the inequality natively; the ENGINE must not BNLJ
    // — its bin-blocked plan is asserted in IntervalJoinSpec)
    "q203_session_incidents" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |sx AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b),
        |ses AS MATERIALIZED (
        |  SELECT user_id, epoch_us(min(ts)) AS s_start,
        |         epoch_us(max(ts)) AS s_end
        |  FROM sx GROUP BY user_id, sid),
        |inc AS MATERIALIZED (
        |  SELECT epoch_us(ts) - 300000000 AS i_start,
        |         epoch_us(ts) + 300000000 AS i_end
        |  FROM events WHERE event_type = 'error'),
        |p AS (SELECT ses.user_id, ses.s_start, ses.s_end,
        |             inc.i_start, inc.i_end
        |      FROM ses JOIN inc
        |        ON ses.s_start <= inc.i_end AND inc.i_start <= ses.s_end)
        |SELECT user_id, s_start, CAST(count(*) AS BIGINT) AS n_incidents,
        |  CAST(sum(least(s_end, i_end) - greatest(s_start, i_start))
        |    AS BIGINT) AS overlap_micros
        |FROM p GROUP BY user_id, s_start""".stripMargin,
    // q204: per-class sensitive-value counts, dominant value by the
    // deterministic (count desc, value asc) rank, integer micro share
    "q204_ldiversity" ->
      """WITH c AS MATERIALIZED (
        |  SELECT c_nationkey AS nat,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b1k,
        |    c_mktsegment AS sens
        |  FROM customer),
        |cv AS (SELECT nat, b1k, sens, count(*) AS n
        |       FROM c GROUP BY 1, 2, 3),
        |cls AS (SELECT nat, b1k, CAST(sum(n) AS BIGINT) AS k_class,
        |          CAST(count(*) AS BIGINT) AS l_distinct
        |        FROM cv GROUP BY 1, 2),
        |top AS (SELECT nat, b1k, sens, n,
        |          rank() OVER (PARTITION BY nat, b1k
        |                       ORDER BY n DESC, sens ASC) AS r
        |        FROM cv)
        |SELECT cls.nat, cls.b1k, cls.k_class, cls.l_distinct,
        |  top.sens AS top_sensitive,
        |  CAST((top.n * 1000000) // cls.k_class AS BIGINT)
        |    AS top_share_micros,
        |  CASE WHEN cls.l_distinct >= 3 THEN 1 ELSE 0 END AS diverse
        |FROM cls JOIN top ON cls.nat = top.nat AND cls.b1k = top.b1k
        |  AND top.r = 1""".stripMargin,
    // q205: the multiplicative-hash uniform + inverse-CDF Laplace,
    // every double literal and association mirrored (the q139/q165
    // discipline; // 65536 == the engine's shiftright-16 on non-neg)
    "q205_noised_release" ->
      """WITH d AS MATERIALIZED (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS epoch_day,
        |    count(*) AS n
        |  FROM events
        |  WHERE event_type IN ('click','error','purchase','signup','view')
        |  GROUP BY 1, 2),
        |g AS (SELECT event_type, epoch_day, n,
        |        epoch_day * 5 + CASE event_type
        |          WHEN 'click' THEN 0 WHEN 'error' THEN 1
        |          WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
        |          WHEN 'view' THEN 4 END AS gid
        |      FROM d),
        |u AS (SELECT event_type, epoch_day, n,
        |        CAST((((gid % 1000003) * 2654435761) // 65536) % 1048576
        |          + 1 AS DOUBLE) / CAST(1048577 AS DOUBLE) AS uu
        |      FROM g),
        |nz AS (SELECT event_type, epoch_day, n,
        |        (CAST(0.0 AS DOUBLE) -
        |          ((CAST(2.0 AS DOUBLE) * sign(uu - CAST(0.5 AS DOUBLE)))
        |            * ln(CAST(1.0 AS DOUBLE)
        |              - CAST(2.0 AS DOUBLE) * abs(uu - CAST(0.5 AS DOUBLE)))))
        |          AS noise
        |      FROM u)
        |SELECT event_type, epoch_day,
        |  greatest(CAST(0 AS BIGINT),
        |    CAST(n AS BIGINT) + CAST(floor(noise) AS BIGINT)) AS released
        |FROM nz""".stripMargin,
    // q206: the Viterbi DP unrolled position-by-position (generator
    // below) — rank (cost ASC, split ASC) mirrors the kernel's
    // strict-< ascending-j tie-break; ln/floor mirrored on the grid
    "q206_unigram_lm" ->
      unigramOracleSql(maxWordLen = 16, maxPieceLen = 4, pruneKeep = None),
    // q207: the same machinery chained — prune to top-8 multis + the
    // character floor, then a second unrolled Viterbi pass
    "q207_unigram_prune" ->
      unigramOracleSql(maxWordLen = 16, maxPieceLen = 4,
        pruneKeep = Some(8)),
    // q208: positional self-join pairs (== the engine's dense-position
    // lag/lead windows), q15's list_reduce polynomial for the seed,
    // range join against the cumulative table (the ENGINE uses the
    // binary-search kernel instead — no per-draw join)
    "q208_negative_sampling" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |                 ' ') AS toks
        |  FROM documents),
        |t AS MATERIALIZED (
        |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        |        FROM d)),
        |p AS MATERIALIZED (
        |  SELECT a.token AS center, b.token AS context,
        |    CAST(count(*) AS BIGINT) AS n_pos
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id
        |    AND b.pos BETWEEN a.pos - 2 AND a.pos + 2 AND b.pos <> a.pos
        |  GROUP BY 1, 2),
        |v AS MATERIALIZED (SELECT token, count(*) AS cnt FROM t
        |                   GROUP BY token),
        |cum AS MATERIALIZED (
        |  SELECT token, cnt,
        |    sum(cnt) OVER (ORDER BY token ROWS UNBOUNDED PRECEDING)
        |      AS cum_hi
        |  FROM v),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
        |ks AS (SELECT CAST(unnest(generate_series(1, 2)) AS BIGINT) AS k),
        |neg AS (
        |  SELECT p.center, p.context, p.n_pos, ks.k,
        |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(p.center || ' ' || p.context,
        |                                    ''),
        |                       c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) * 31 + ks.k)
        |      % 1000000007) AS gid
        |  FROM p CROSS JOIN ks),
        |r AS (SELECT center, context, n_pos, k,
        |        (((gid % 1000003) * 2654435761) // 65536)
        |          % (SELECT total FROM tot) AS draw
        |      FROM neg)
        |SELECT r.center, r.context, r.n_pos, r.k, c.token AS negative
        |FROM r JOIN cum c
        |  ON r.draw < c.cum_hi AND r.draw >= c.cum_hi - c.cnt""".stripMargin,
    // q209: per-user durations -> day histogram -> suffix-sum risk
    // sets -> integer hazard steps; censoring at the global last day
    "q209_survival_hazard" ->
      """WITH ed AS (
        |  SELECT user_id, event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d
        |  FROM events),
        |pu AS (SELECT user_id, min(d) AS day0,
        |         min(CASE WHEN event_type = 'purchase' THEN d END) AS pday
        |       FROM ed GROUP BY 1),
        |oe AS (SELECT max(d) AS obs_end FROM ed),
        |dur AS (SELECT
        |          CASE WHEN pday IS NOT NULL THEN pday - day0
        |               ELSE obs_end - day0 END AS t,
        |          CASE WHEN pday IS NOT NULL THEN 1 ELSE 0 END AS ev
        |        FROM pu, oe),
        |bt AS (SELECT t, count(*) AS n_at_t, CAST(sum(ev) AS BIGINT) AS d
        |       FROM dur GROUP BY t),
        |r AS (SELECT t, d,
        |        CAST(sum(n_at_t) OVER (ORDER BY t DESC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |      FROM bt),
        |h AS (SELECT t, n_risk, d, (d * 1000000) // n_risk AS step
        |      FROM r WHERE d > 0)
        |SELECT t, n_risk, d AS d_events,
        |  CAST(step AS BIGINT) AS hazard_step_micros,
        |  CAST(sum(step) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_hazard_micros
        |FROM h""".stripMargin,
    // q236: q209's duration-day derivation + the integer product-limit
    // recurrence replayed as a recursive CTE (floor division per step)
    "q236_kaplan_meier" ->
      """WITH RECURSIVE ed AS (
        |  SELECT user_id, event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d
        |  FROM events),
        |pu AS (SELECT user_id, min(d) AS day0,
        |         min(CASE WHEN event_type = 'purchase' THEN d END) AS pday
        |       FROM ed GROUP BY 1),
        |oe AS (SELECT max(d) AS obs_end FROM ed),
        |dur AS (SELECT
        |          CASE WHEN pday IS NOT NULL THEN pday - day0
        |               ELSE obs_end - day0 END AS t,
        |          CASE WHEN pday IS NOT NULL THEN 1 ELSE 0 END AS ev
        |        FROM pu, oe),
        |bt AS (SELECT t, count(*) AS n_at_t, CAST(sum(ev) AS BIGINT) AS d
        |       FROM dur GROUP BY t),
        |r AS (SELECT t, d,
        |        CAST(sum(n_at_t) OVER (ORDER BY t DESC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |      FROM bt),
        |st AS MATERIALIZED (
        |  SELECT t, n_risk, d,
        |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn
        |  FROM r WHERE d > 0),
        |km AS (
        |  SELECT rn, t, n_risk, d,
        |    (1000000 * (n_risk - d)) // n_risk AS s
        |  FROM st WHERE rn = 1
        |  UNION ALL
        |  SELECT n.rn, n.t, n.n_risk, n.d,
        |    (km.s * (n.n_risk - n.d)) // n.n_risk
        |  FROM km JOIN st n ON n.rn = km.rn + 1)
        |SELECT t, n_risk, d AS d_events, CAST(s AS BIGINT) AS km_ppm
        |FROM km""".stripMargin,
    // q237: the md5-parity sign matrix (affine mod-hash parities are
    // linearly structured on the dense j,t grid), integer folds
    "q237_random_projection" ->
      """WITH qv AS MATERIALIZED (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(10000.0 * CAST(x AS DOUBLE)) AS BIGINT))
        |    AS q
        |  FROM embeddings),
        |ts AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS t)
        |SELECT vec_id, t,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(0, 64),
        |      j -> q[j + 1] * (1 - 2 * ((strpos('0123456789abcdef',
        |        substr(md5(CAST(j AS VARCHAR) || '_'
        |          || CAST(t AS VARCHAR)), 1, 1)) - 1) % 2)))),
        |    (a, x) -> a + x) AS BIGINT) AS y
        |FROM qv CROSS JOIN ts""".stripMargin,
    // q238: integer centroid sums + one mirrored fold/sqrt/div chain
    "q238_source_drift" ->
      """WITH j AS MATERIALIZED (
        |  SELECT d.source AS src, list_transform(e.embedding,
        |    x -> CAST(round(10000.0 * CAST(x AS DOUBLE)) AS BIGINT))
        |    AS q
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |ce AS MATERIALIZED (
        |  SELECT src, i, CAST(sum(q[i + 1]) AS BIGINT) AS c
        |  FROM j CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
        |  GROUP BY 1, 2),
        |cn AS (SELECT src, count(*) AS n FROM j GROUP BY 1),
        |cv AS MATERIALIZED (
        |  SELECT ce.src AS src, cn.n AS n, list(ce.c ORDER BY ce.i)
        |    AS c
        |  FROM ce JOIN cn ON cn.src = ce.src GROUP BY 1, 2),
        |pr AS (
        |  SELECT a.src AS src_a, b.src AS src_b, a.n AS n_a,
        |    b.n AS n_b,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 64),
        |        i -> a.c[i + 1] * b.c[i + 1])), (x, y) -> x + y) AS dp,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 64),
        |        i -> a.c[i + 1] * a.c[i + 1])), (x, y) -> x + y) AS na2,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 64),
        |        i -> b.c[i + 1] * b.c[i + 1])), (x, y) -> x + y) AS nb2
        |  FROM cv a JOIN cv b ON a.src < b.src)
        |SELECT src_a, src_b, n_a, n_b,
        |  round(CAST(dp AS DOUBLE)
        |    / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))),
        |    6) AS cos
        |FROM pr WHERE na2 > 0 AND nb2 > 0""".stripMargin,
    // q239: the register derivation replayed — shared hash chain,
    // integer rank ladder, dyadic indicator sum (1.0/(1<<M), never
    // pow), the alpha_64 chain, ln small-range correction
    "q239_hll_distinct" ->
      s"""WITH w AS MATERIALIZED (
        |  SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |ph AS MATERIALIZED (
        |  SELECT src, w, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM w),
        |hj AS (SELECT src, ph % 64 AS j,
        |         (ph * 2654435761) % 1000000007 AS h
        |       FROM ph),
        |rg AS MATERIALIZED (
        |  SELECT src, j, max(CASE WHEN h >= 536870912 THEN 1 WHEN h >= 268435456 THEN 2 WHEN h >= 134217728 THEN 3 WHEN h >= 67108864 THEN 4 WHEN h >= 33554432 THEN 5 WHEN h >= 16777216 THEN 6 WHEN h >= 8388608 THEN 7 WHEN h >= 4194304 THEN 8 WHEN h >= 2097152 THEN 9 WHEN h >= 1048576 THEN 10 WHEN h >= 524288 THEN 11 WHEN h >= 262144 THEN 12 WHEN h >= 131072 THEN 13 WHEN h >= 65536 THEN 14 WHEN h >= 32768 THEN 15 WHEN h >= 16384 THEN 16 WHEN h >= 8192 THEN 17 WHEN h >= 4096 THEN 18 WHEN h >= 2048 THEN 19 WHEN h >= 1024 THEN 20 WHEN h >= 512 THEN 21 WHEN h >= 256 THEN 22 WHEN h >= 128 THEN 23 WHEN h >= 64 THEN 24 WHEN h >= 32 THEN 25 WHEN h >= 16 THEN 26 WHEN h >= 8 THEN 27 WHEN h >= 4 THEN 28 WHEN h >= 2 THEN 29 WHEN h >= 1 THEN 30 ELSE 31 END) AS mj
        |  FROM hj GROUP BY 1, 2),
        |ps AS (
        |  SELECT src, count(*) AS present,
        |    sum(1.0 / (CAST(1 AS BIGINT) << CAST(mj AS INTEGER)))
        |      AS psum
        |  FROM rg GROUP BY 1),
        |es AS (
        |  SELECT src, 64 - present AS zeros,
        |    psum + CAST(64 - present AS DOUBLE) AS isum
        |  FROM ps),
        |ee AS (
        |  SELECT src, zeros,
        |    0.709 * 64.0 * 64.0 / isum AS raw
        |  FROM es),
        |fin AS (
        |  SELECT src, zeros,
        |    CASE WHEN raw <= 160.0 AND zeros > 0
        |      THEN CAST(round(64.0 * ln(64.0
        |        / CAST(zeros AS DOUBLE))) AS BIGINT)
        |      ELSE CAST(round(raw) AS BIGINT) END AS est
        |  FROM ee),
        |ex AS (SELECT src, count(*) AS n_exact FROM w GROUP BY 1)
        |SELECT ex.src AS source, CAST(ex.n_exact AS BIGINT) AS n_exact,
        |  fin.est AS hll_est, CAST(fin.zeros AS BIGINT) AS reg_zeros
        |FROM ex JOIN fin ON fin.src = ex.src""".stripMargin,
    // q240: six unrolled trainer rounds — symbol lists via delimited
    // regex groups, weighted pair/symbol counts, the double-score
    // argmax (score DESC, l, r), merge applied with the q119 replace
    // device (delimited tokens make matches exact and non-overlapping,
    // replicating the greedy lookbehind fold)
    "q240_wordpiece_train" -> wordpieceTrainOracleSql(rounds = 6),
    // q241: the same unroll, plain-count argmax, 4-column output
    "q241_bpe_train" ->
      wordpieceTrainOracleSql(rounds = 6, scored = false),
    // q242: q232's cell derivation, cells as the output — the
    // aggregate path must reproduce the cell-table path bit-for-bit
    "q242_cms_agg" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS w
        |  FROM documents),
        |cnt AS MATERIALIZED (
        |  SELECT w, count(*) AS n FROM toks WHERE w <> '' GROUP BY w),
        |ph AS MATERIALIZED (
        |  SELECT w, n, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM cnt),
        |bk AS (
        |  SELECT n, i, ((ph + i) * 2654435761) % 1000000007 % 512 AS b
        |  FROM ph CROSS JOIN
        |    (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS i))
        |SELECT i, b, CAST(sum(n) AS BIGINT) AS cn FROM bk
        |GROUP BY 1, 2""".stripMargin,
    // q243: q239's register + estimate chain, estimate columns only
    // (the aggregate is the production path; q239 carries the exact
    // validation)
    "q243_hll_agg" ->
      s"""WITH w AS MATERIALIZED (
        |  SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |ph AS MATERIALIZED (
        |  SELECT src, w, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM w),
        |hj AS (SELECT src, ph % 64 AS j,
        |         (ph * 2654435761) % 1000000007 AS h
        |       FROM ph),
        |rg AS MATERIALIZED (
        |  SELECT src, j, max(CASE WHEN h >= 536870912 THEN 1 WHEN h >= 268435456 THEN 2 WHEN h >= 134217728 THEN 3 WHEN h >= 67108864 THEN 4 WHEN h >= 33554432 THEN 5 WHEN h >= 16777216 THEN 6 WHEN h >= 8388608 THEN 7 WHEN h >= 4194304 THEN 8 WHEN h >= 2097152 THEN 9 WHEN h >= 1048576 THEN 10 WHEN h >= 524288 THEN 11 WHEN h >= 262144 THEN 12 WHEN h >= 131072 THEN 13 WHEN h >= 65536 THEN 14 WHEN h >= 32768 THEN 15 WHEN h >= 16384 THEN 16 WHEN h >= 8192 THEN 17 WHEN h >= 4096 THEN 18 WHEN h >= 2048 THEN 19 WHEN h >= 1024 THEN 20 WHEN h >= 512 THEN 21 WHEN h >= 256 THEN 22 WHEN h >= 128 THEN 23 WHEN h >= 64 THEN 24 WHEN h >= 32 THEN 25 WHEN h >= 16 THEN 26 WHEN h >= 8 THEN 27 WHEN h >= 4 THEN 28 WHEN h >= 2 THEN 29 WHEN h >= 1 THEN 30 ELSE 31 END) AS mj
        |  FROM hj GROUP BY 1, 2),
        |ps AS (
        |  SELECT src, count(*) AS present,
        |    sum(1.0 / (CAST(1 AS BIGINT) << CAST(mj AS INTEGER)))
        |      AS psum
        |  FROM rg GROUP BY 1),
        |es AS (
        |  SELECT src, 64 - present AS zeros,
        |    psum + CAST(64 - present AS DOUBLE) AS isum
        |  FROM ps),
        |ee AS (
        |  SELECT src, zeros,
        |    0.709 * 64.0 * 64.0 / isum AS raw
        |  FROM es)
        |SELECT src AS source,
        |  CASE WHEN raw <= 160.0 AND zeros > 0
        |    THEN CAST(round(64.0 * ln(64.0
        |      / CAST(zeros AS DOUBLE))) AS BIGINT)
        |    ELSE CAST(round(raw) AS BIGINT) END AS hll_est,
        |  CAST(zeros AS BIGINT) AS reg_zeros
        |FROM ee""".stripMargin,
    // q245: q239's register chain WITHOUT the source grouping — the
    // oracle's direct global build must equal the engine's shard
    // max-merge (sketch-union mergeability, hash-checked)
    "q245_hll_union" ->
      s"""WITH w AS MATERIALIZED (
        |  SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |dw AS MATERIALIZED (SELECT DISTINCT w FROM w),
        |ph AS MATERIALIZED (
        |  SELECT w, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM dw),
        |hj AS (SELECT ph % 64 AS j,
        |         (ph * 2654435761) % 1000000007 AS h
        |       FROM ph),
        |rg AS MATERIALIZED (
        |  SELECT j, max(CASE WHEN h >= 536870912 THEN 1 WHEN h >= 268435456 THEN 2 WHEN h >= 134217728 THEN 3 WHEN h >= 67108864 THEN 4 WHEN h >= 33554432 THEN 5 WHEN h >= 16777216 THEN 6 WHEN h >= 8388608 THEN 7 WHEN h >= 4194304 THEN 8 WHEN h >= 2097152 THEN 9 WHEN h >= 1048576 THEN 10 WHEN h >= 524288 THEN 11 WHEN h >= 262144 THEN 12 WHEN h >= 131072 THEN 13 WHEN h >= 65536 THEN 14 WHEN h >= 32768 THEN 15 WHEN h >= 16384 THEN 16 WHEN h >= 8192 THEN 17 WHEN h >= 4096 THEN 18 WHEN h >= 2048 THEN 19 WHEN h >= 1024 THEN 20 WHEN h >= 512 THEN 21 WHEN h >= 256 THEN 22 WHEN h >= 128 THEN 23 WHEN h >= 64 THEN 24 WHEN h >= 32 THEN 25 WHEN h >= 16 THEN 26 WHEN h >= 8 THEN 27 WHEN h >= 4 THEN 28 WHEN h >= 2 THEN 29 WHEN h >= 1 THEN 30 ELSE 31 END) AS mj
        |  FROM hj GROUP BY 1),
        |ps AS (
        |  SELECT count(*) AS present,
        |    sum(1.0 / (CAST(1 AS BIGINT) << CAST(mj AS INTEGER)))
        |      AS psum
        |  FROM rg),
        |es AS (
        |  SELECT 64 - present AS zeros,
        |    psum + CAST(64 - present AS DOUBLE) AS isum
        |  FROM ps),
        |ee AS (SELECT zeros, 0.709 * 64.0 * 64.0 / isum AS raw FROM es),
        |fin AS (
        |  SELECT zeros,
        |    CASE WHEN raw <= 160.0 AND zeros > 0
        |      THEN CAST(round(64.0 * ln(64.0
        |        / CAST(zeros AS DOUBLE))) AS BIGINT)
        |      ELSE CAST(round(raw) AS BIGINT) END AS est
        |  FROM ee),
        |ex AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n_sources,
        |              CAST(count(DISTINCT w) AS BIGINT) AS n_exact
        |       FROM w)
        |SELECT ex.n_sources, ex.n_exact, fin.est AS hll_est,
        |  CAST(fin.zeros AS BIGINT) AS reg_zeros
        |FROM ex CROSS JOIN fin""".stripMargin,
    // q246: the OLS chain replayed — milli-grid ln, exact BIGINT sums,
    // one mirrored divide + round
    "q246_zipf_slope" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS w
        |  FROM documents),
        |wc AS MATERIALIZED (
        |  SELECT source, w, count(*) AS f FROM toks WHERE w <> ''
        |  GROUP BY 1, 2),
        |rk AS MATERIALIZED (
        |  SELECT source,
        |    CAST(round(1000.0 * ln(CAST(rank AS DOUBLE))) AS BIGINT) AS x,
        |    CAST(round(1000.0 * ln(CAST(f AS DOUBLE))) AS BIGINT) AS y
        |  FROM (SELECT source, f,
        |          row_number() OVER (PARTITION BY source
        |                             ORDER BY f DESC, w) AS rank
        |        FROM wc)
        |  WHERE rank <= 32),
        |ag AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_top,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM rk GROUP BY 1 HAVING count(*) >= 2)
        |SELECT source, n_top,
        |  round(CAST(n_top * sxy - sx * sy AS DOUBLE) /
        |        CAST(n_top * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
        |FROM ag""".stripMargin,
    // q247: the KL/entropy chain replayed — double ln-argument with
    // the mirrored multiplication shape, grid round, exact BIGINT
    // numerators, one mirrored divide per output
    "q247_source_kl" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS w
        |  FROM documents),
        |wc AS MATERIALIZED (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS f FROM toks
        |  WHERE w <> '' GROUP BY 1, 2),
        |cw AS MATERIALIZED (
        |  SELECT w, CAST(sum(f) AS BIGINT) AS cw FROM wc GROUP BY 1),
        |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS nn FROM cw),
        |terms AS MATERIALIZED (
        |  SELECT wc.source, wc.f,
        |    CAST(sum(wc.f) OVER (PARTITION BY wc.source) AS BIGINT) AS ns,
        |    cw.cw, (SELECT nn FROM tot) AS nn
        |  FROM wc JOIN cw ON cw.w = wc.w),
        |gr AS (
        |  SELECT source, f, ns,
        |    CAST(round(1000.0 * ln((CAST(f AS DOUBLE) * CAST(nn AS DOUBLE))
        |      / (CAST(ns AS DOUBLE) * CAST(cw AS DOUBLE)))) AS BIGINT) AS r,
        |    CAST(round(1000.0 * ln(CAST(f AS DOUBLE))) AS BIGINT) AS lf
        |  FROM terms),
        |ag AS (
        |  SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_vocab,
        |    CAST(sum(f * r) AS BIGINT) AS klg,
        |    CAST(sum(f * lf) AS BIGINT) AS hfg
        |  FROM gr GROUP BY 1)
        |SELECT source, n_tokens, n_vocab,
        |  round(CAST(klg AS DOUBLE)
        |    / (1000.0 * CAST(n_tokens AS DOUBLE)), 6) AS kl_corpus,
        |  round(ln(CAST(n_tokens AS DOUBLE)) - CAST(hfg AS DOUBLE)
        |    / (1000.0 * CAST(n_tokens AS DOUBLE)), 6) AS entropy
        |FROM ag""".stripMargin,
    // q248: the transition-entropy chain replayed — per-source bigram
    // counts from the token arrays, left-context totals, grid ln
    "q248_bigram_entropy" ->
      """WITH tk AS (
        |  SELECT source, list_filter(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '),
        |    t -> t <> '') AS t
        |  FROM documents),
        |bg AS MATERIALIZED (
        |  SELECT source, t[CAST(i AS INTEGER)] AS x,
        |    t[CAST(i AS INTEGER) + 1] AS y,
        |    CAST(count(*) AS BIGINT) AS bxy
        |  FROM (SELECT source, t, unnest(range(1, len(t))) AS i FROM tk)
        |  GROUP BY 1, 2, 3),
        |lx AS MATERIALIZED (
        |  SELECT source, x, CAST(sum(bxy) AS BIGINT) AS bx
        |  FROM bg GROUP BY 1, 2),
        |gr AS (
        |  SELECT bg.source, bg.bxy,
        |    CAST(round(1000.0 * ln(CAST(lx.bx AS DOUBLE)
        |      / CAST(bg.bxy AS DOUBLE))) AS BIGINT) AS r
        |  FROM bg JOIN lx ON lx.source = bg.source AND lx.x = bg.x)
        |SELECT source, CAST(sum(bxy) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(bxy * r) AS DOUBLE)
        |    / (1000.0 * CAST(sum(bxy) AS DOUBLE)), 6) AS transition_entropy
        |FROM gr GROUP BY 1""".stripMargin,
    // q249: the JS chain replayed — shared-word grid terms via the
    // word self-join, only-word remainders via (n - sum_shared)·ln2
    "q249_source_js" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS w
        |  FROM documents),
        |wc AS MATERIALIZED (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS f FROM toks
        |  WHERE w <> '' GROUP BY 1, 2),
        |tt AS MATERIALIZED (
        |  SELECT source, CAST(sum(f) AS BIGINT) AS n FROM wc GROUP BY 1),
        |sh AS MATERIALIZED (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    a.f AS fa, b.f AS fb, ta.n AS na, tb.n AS nb,
        |    CAST(round(1000.0 * ln(
        |      (2.0 * CAST(a.f AS DOUBLE) * CAST(tb.n AS DOUBLE))
        |      / (CAST(a.f AS DOUBLE) * CAST(tb.n AS DOUBLE)
        |         + CAST(b.f AS DOUBLE) * CAST(ta.n AS DOUBLE))))
        |      AS BIGINT) AS ra,
        |    CAST(round(1000.0 * ln(
        |      (2.0 * CAST(b.f AS DOUBLE) * CAST(ta.n AS DOUBLE))
        |      / (CAST(a.f AS DOUBLE) * CAST(tb.n AS DOUBLE)
        |         + CAST(b.f AS DOUBLE) * CAST(ta.n AS DOUBLE))))
        |      AS BIGINT) AS rb
        |  FROM wc a JOIN wc b ON a.w = b.w AND a.source < b.source
        |  JOIN tt ta ON ta.source = a.source
        |  JOIN tt tb ON tb.source = b.source),
        |ag AS (
        |  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_common,
        |    CAST(max(na) AS BIGINT) AS na, CAST(max(nb) AS BIGINT) AS nb,
        |    CAST(sum(fa * ra) AS BIGINT) AS ag,
        |    CAST(sum(fb * rb) AS BIGINT) AS bg,
        |    CAST(sum(fa) AS BIGINT) AS fab,
        |    CAST(sum(fb) AS BIGINT) AS fbb
        |  FROM sh GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common,
        |  round((CAST(ag + (na - fab)
        |           * CAST(round(1000.0 * ln(2.0)) AS BIGINT) AS DOUBLE)
        |         / CAST(na AS DOUBLE)
        |       + CAST(bg + (nb - fbb)
        |           * CAST(round(1000.0 * ln(2.0)) AS BIGINT) AS DOUBLE)
        |         / CAST(nb AS DOUBLE)) / (2.0 * 1000.0), 6) AS js
        |FROM ag""".stripMargin,
    // q250: the normal-equations chain replayed — exact HUGEINT moment
    // sums cast to DOUBLE, the same fixed 3x3 determinant shape
    // a(ei-fh) - b(di-fg) + c(dh-eg), one mirrored divide per beta
    "q250_ols_price" ->
      """WITH d AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
        |    CAST(round(100.0 * l_discount) AS BIGINT) AS x2,
        |    CAST(round(100.0 * l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nl,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1,
        |    CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x1 * x1) AS DOUBLE) AS s11,
        |    CAST(sum(x1 * x2) AS DOUBLE) AS s12,
        |    CAST(sum(x2 * x2) AS DOUBLE) AS s22,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x1 * y) AS DOUBLE) AS s1y,
        |    CAST(sum(x2 * y) AS DOUBLE) AS s2y
        |  FROM d),
        |dets AS (
        |  SELECT nl,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2) AS det1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM s)
        |SELECT nl AS n_rows, round(det0 / det, 6) AS b0,
        |  round(det1 / det, 6) AS b1, round(det2 / det, 6) AS b2
        |FROM dets""".stripMargin,
    // q284: OLS init + three unrolled Huber IRLS rounds + the final
    // downweight census
    "q284_huber_price" -> huberOracleSql(rounds = 3),
    // q285: the Grubbs chain replayed — integer deviation argmax,
    // exact moment variance, one mirrored G
    "q285_grubbs" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS epoch_day,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r) AS BIGINT) AS s,
        |    CAST(sum(r * r) AS HUGEINT) AS q
        |  FROM daily),
        |dv AS (
        |  SELECT d.epoch_day, t.n, t.s, t.q,
        |    abs(d.r * t.n - t.s) AS dev
        |  FROM daily d CROSS JOIN tot t
        |  ORDER BY dev DESC, epoch_day LIMIT 1)
        |SELECT n AS n_days, CAST(epoch_day AS BIGINT)
        |    AS outlier_epoch_day,
        |  round(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE), 4)
        |    AS dev_cents,
        |  round(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE)
        |    / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
        |      * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0)), 6) AS g_stat
        |FROM dv""".stripMargin,
    // q286: the MASE chain replayed — lag-1/lag-7 equi-join error
    // sums, mirrored MAE ratio
    "q286_mase" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |e1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(abs(c.r - p.r)) AS BIGINT) AS e1
        |  FROM daily p JOIN daily c ON c.d = p.d + 1),
        |e7 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n7,
        |    CAST(sum(abs(c.r - p.r)) AS BIGINT) AS e7
        |  FROM daily p JOIN daily c ON c.d = p.d + 7)
        |SELECT n1 AS n_pairs_1, n7 AS n_pairs_7,
        |  round(CAST(e1 AS DOUBLE) / CAST(n1 AS DOUBLE), 4)
        |    AS mae_naive1_cents,
        |  round(CAST(e7 AS DOUBLE) / CAST(n7 AS DOUBLE), 4)
        |    AS mae_naive7_cents,
        |  round((CAST(e7 AS DOUBLE) / CAST(n7 AS DOUBLE))
        |    / (CAST(e1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6)
        |    AS mase_seasonal
        |FROM e1 CROSS JOIN e7""".stripMargin,
    // q287: the Jarque-Bera chain replayed — floor-div coarse units,
    // floor-mean anchoring, exact anchored moments, mirrored
    // central-moment chain
    "q287_jarque_bera" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |    AS BIGINT) // 100000 AS rs
        |  FROM orders
        |  GROUP BY datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE))),
        |anchor AS (
        |  SELECT CAST(sum(rs) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS a0
        |  FROM daily),
        |dev AS (
        |  SELECT d.rs - a.a0 AS dv FROM daily d CROSS JOIN anchor a),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dv) AS BIGINT) AS m1,
        |    CAST(sum(dv * dv) AS BIGINT) AS q2,
        |    CAST(sum(dv * dv * dv) AS BIGINT) AS q3,
        |    CAST(sum(dv * dv * dv * dv) AS HUGEINT) AS q4
        |  FROM dev),
        |c1 AS (
        |  SELECT n, CAST(m1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    q2, q3, q4
        |  FROM mom),
        |c2 AS (
        |  SELECT n, mu,
        |    CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE) - mu * mu AS m2,
        |    CAST(q3 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 3.0 * mu * (CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 2.0 * mu * mu * mu AS m3,
        |    CAST(q4 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 4.0 * mu * (CAST(q3 AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 6.0 * mu * mu * (CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM c1),
        |c3 AS (
        |  SELECT n,
        |    CASE WHEN m2 = 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE m3 / (sqrt(m2) * m2) END AS sk,
        |    CASE WHEN m2 = 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE m4 / (m2 * m2) - 3.0 END AS ku
        |  FROM c2)
        |SELECT n AS n_days, round(sk, 6) AS skewness,
        |  round(ku, 6) AS excess_kurtosis,
        |  round(CAST(n AS DOUBLE) / 6.0 * (sk * sk + ku * ku / 4.0), 4)
        |    AS jb_stat
        |FROM c3""".stripMargin,
    // q288: the Brown-Forsythe chain replayed — percentile_disc group
    // medians, |c − med| deviations, the q270 F chain verbatim
    "q288_brown_forsythe" ->
      """WITH base AS MATERIALIZED (
        |  SELECT o_orderpriority AS g,
        |    CAST(round(100.0 * o_totalprice) AS BIGINT) AS c
        |  FROM orders),
        |med AS (
        |  SELECT g, percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
        |    AS med
        |  FROM base GROUP BY 1),
        |z AS MATERIALIZED (
        |  SELECT b.g, abs(b.c - m.med) AS c
        |  FROM base b JOIN med m USING (g)),
        |per AS MATERIALIZED (
        |  SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(c) AS BIGINT) AS sg,
        |    sum(c * c) AS qg
        |  FROM z GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS s, sum(qg) AS q,
        |    list_reduce(list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE) ORDER BY g), (a, b) -> a + b) AS a
        |  FROM per),
        |fin AS (
        |  SELECT k, n,
        |    a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssb,
        |    CAST(q AS DOUBLE) - a AS ssw
        |  FROM tot),
        |fd AS (
        |  SELECT k, n, ssb, ssw,
        |    CASE WHEN k = 1 OR n = k THEN CAST('NaN' AS DOUBLE)
        |      ELSE ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
        |    END AS fden
        |  FROM fin)
        |SELECT k AS k_groups, n AS n_rows,
        |  round(CASE WHEN isnan(fden) OR fden = 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE ssb / (CAST(k AS DOUBLE) - 1.0) / fden END, 6)
        |    AS f_stat,
        |  round(CASE WHEN ssb + ssw = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE ssb / (ssb + ssw) END, 6) AS eta_sq
        |FROM fd""".stripMargin,
    // q289: the KS chain replayed — two-group histogram, cumulative
    // counts, exact integer gap argmax, one mirrored divide
    "q289_ks_two_sample" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (
        |  SELECT v,
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(sum(t - na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        |  FROM h),
        |g AS (SELECT v, abs(ca * n2 - cb * n1) AS gap, n1, n2
        |      FROM c CROSS JOIN tot)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(gap AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END, 6)
        |    AS d_stat,
        |  v AS d_location
        |FROM g ORDER BY gap DESC, v LIMIT 1""".stripMargin,
    // q290: the CvM chain replayed — same histogram, per-cell t·Δ²
    // terms on the 1e-9 grid, one mirrored final expression
    "q290_cramer_von_mises" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(round(100.0 * l_discount) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (
        |  SELECT t,
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(sum(t - na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        |  FROM h),
        |w AS (
        |  SELECT n1, n2,
        |    CASE WHEN n1 = 0 OR n2 = 0 THEN 0
        |      ELSE CAST(round(
        |        (CAST(ca AS DOUBLE) / CAST(n1 AS DOUBLE)
        |          - CAST(cb AS DOUBLE) / CAST(n2 AS DOUBLE))
        |        * (CAST(ca AS DOUBLE) / CAST(n1 AS DOUBLE)
        |          - CAST(cb AS DOUBLE) / CAST(n2 AS DOUBLE))
        |        * CAST(t AS DOUBLE) * 1.0e9) AS BIGINT) END AS wg
        |  FROM c CROSS JOIN tot),
        |ag AS (SELECT max(n1) AS n1, max(n2) AS n2,
        |              CAST(sum(wg) AS BIGINT) AS wsum FROM w)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(wsum AS DOUBLE) / 1.0e9
        |      * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) END, 6)
        |    AS cvm_t
        |FROM ag""".stripMargin,
    // q291: the Wasserstein chain replayed — token-count histogram,
    // gap·|cumA·n2 − cumB·n1| exact integer terms, one divide
    "q291_wasserstein_drift" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (
        |  SELECT v,
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(sum(t - na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
        |    coalesce(lead(v) OVER (ORDER BY v) - v, 0) AS gap
        |  FROM h),
        |ag AS (SELECT max(n1) AS n1, max(n2) AS n2,
        |    CAST(sum(gap * abs(ca * n2 - cb * n1)) AS BIGINT) AS wx
        |  FROM c CROSS JOIN tot)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(wx AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END, 6)
        |    AS w1
        |FROM ag""".stripMargin,
    // q292: the runs-test chain replayed — percentile_disc median,
    // median-equal days dropped, lag flips, mirrored z
    "q292_runs_test" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS epoch_day,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |med AS (SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY r)
        |          AS med FROM daily),
        |sgn AS (
        |  SELECT epoch_day, CASE WHEN r > med THEN 1 ELSE 0 END AS s
        |  FROM daily CROSS JOIN med WHERE r <> med),
        |fl AS (
        |  SELECT s, CASE WHEN lag(s) OVER (ORDER BY epoch_day) IS NULL
        |    OR lag(s) OVER (ORDER BY epoch_day) <> s
        |    THEN 1 ELSE 0 END AS flip
        |  FROM sgn),
        |ag AS (SELECT CAST(coalesce(sum(s), 0) AS BIGINT) AS n1,
        |  CAST(coalesce(sum(1 - s), 0) AS BIGINT) AS n2,
        |  CAST(coalesce(sum(flip), 0) AS BIGINT) AS runs FROM fl),
        |fin AS (
        |  SELECT n1, n2, runs,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn,
        |    2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) AS p2
        |  FROM ag),
        |fd AS (
        |  SELECT n1, n2, runs, nn, p2,
        |    CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 = 1
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE p2 * (p2 - nn) / (nn * nn * (nn - 1.0)) END AS sig2
        |  FROM fin)
        |SELECT n1 AS n_above, n2 AS n_below, runs AS n_runs,
        |  round(CASE WHEN isnan(sig2) OR sig2 = 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(runs AS DOUBLE) - (p2 / nn + 1.0)) / sqrt(sig2)
        |    END, 6) AS z_score
        |FROM fd""".stripMargin,
    // q293: the Pettitt chain replayed — daily-value midranks on the
    // ×2 grid, the rank identity U_t = Σr2 − t(n+1), exact argmax
    "q293_pettitt" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS epoch_day,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |h AS (SELECT r AS v, CAST(count(*) AS BIGINT) AS t
        |      FROM daily GROUP BY 1),
        |rk AS (
        |  SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM h),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |u AS (
        |  SELECT d.epoch_day, t.n,
        |    CAST(sum(rk.r2) OVER (ORDER BY d.epoch_day ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - CAST(row_number() OVER (ORDER BY d.epoch_day)
        |        AS BIGINT) * (t.n + 1) AS uu,
        |    row_number() OVER (ORDER BY d.epoch_day) AS tidx
        |  FROM daily d JOIN rk ON rk.v = d.r CROSS JOIN tot t)
        |SELECT n AS n_days, CAST(epoch_day AS BIGINT)
        |    AS change_epoch_day,
        |  CAST(abs(uu) AS BIGINT) AS k_stat
        |FROM u WHERE tidx < n
        |ORDER BY abs(uu) DESC, epoch_day LIMIT 1""".stripMargin,
    // q294: the Cliff's-delta chain replayed — strictly-below prefix
    // sums, gt/eq exact pair counts, lt by complement
    "q294_cliffs_delta" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (SELECT na, t,
        |    coalesce(sum(t - na) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cblt
        |  FROM h),
        |ag AS (SELECT CAST(sum(na * cblt) AS BIGINT) AS gt,
        |              CAST(sum(na * (t - na)) AS BIGINT) AS eq FROM c),
        |fin AS (SELECT n1, n2, gt, eq, n1 * n2 - gt - eq AS lt
        |        FROM ag CROSS JOIN tot)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END, 6)
        |    AS cliffs_delta,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (2.0 * CAST(gt AS DOUBLE) + CAST(eq AS DOUBLE))
        |      / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END, 6)
        |    AS cles
        |FROM fin""".stripMargin,
    // q295: the stump chain replayed — per-class cumulative counts,
    // the weighted-Gini expression on the 1e-12 grid, exact argmin
    "q295_gini_stump" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(c0) AS BIGINT) AS t0,
        |  CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(c2) AS BIGINT) AS t2,
        |  CAST(sum(t) AS BIGINT) AS n FROM h),
        |c AS (SELECT v,
        |    CAST(sum(c0) OVER wv AS BIGINT) AS cc0,
        |    CAST(sum(c1) OVER wv AS BIGINT) AS cc1,
        |    CAST(sum(c2) OVER wv AS BIGINT) AS cc2,
        |    CAST(sum(t) OVER wv AS BIGINT) AS nl
        |  FROM h WINDOW wv AS (ORDER BY v ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)),
        |g AS (
        |  SELECT v, n, nl, n - nl AS nr, t0, t1, t2, cc0, cc1, cc2
        |  FROM c CROSS JOIN tot WHERE nl < n),
        |gg AS (
        |  SELECT v, n, t0, t1, t2,
        |    CAST(round(((CAST(nl AS DOUBLE)
        |      - (CAST(cc0 AS DOUBLE) * CAST(cc0 AS DOUBLE)
        |        + CAST(cc1 AS DOUBLE) * CAST(cc1 AS DOUBLE)
        |        + CAST(cc2 AS DOUBLE) * CAST(cc2 AS DOUBLE))
        |        / CAST(nl AS DOUBLE))
        |      + (CAST(nr AS DOUBLE)
        |      - (CAST(t0 - cc0 AS DOUBLE) * CAST(t0 - cc0 AS DOUBLE)
        |        + CAST(t1 - cc1 AS DOUBLE) * CAST(t1 - cc1 AS DOUBLE)
        |        + CAST(t2 - cc2 AS DOUBLE) * CAST(t2 - cc2 AS DOUBLE))
        |        / CAST(nr AS DOUBLE)))
        |      / CAST(n AS DOUBLE) * 1.0e12) AS BIGINT) AS gini_g
        |  FROM g)
        |SELECT n AS n_rows, v AS split_value,
        |  round(CAST(gini_g AS DOUBLE) / 1.0e12, 6) AS gini_split,
        |  round((CAST(n AS DOUBLE)
        |    - (CAST(t0 AS DOUBLE) * CAST(t0 AS DOUBLE)
        |      + CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)
        |      + CAST(t2 AS DOUBLE) * CAST(t2 AS DOUBLE))
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6)
        |    AS gini_parent
        |FROM gg ORDER BY gini_g, v LIMIT 1""".stripMargin,
    // q296: the PSI chain replayed — calendar-midpoint cohorts,
    // per-cell (p1−p2)·ln(p1/p2) terms on the 1e-12 grid
    "q296_psi_shift" ->
      """WITH base AS MATERIALIZED (
        |  SELECT o_orderpriority AS k,
        |    datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS d
        |  FROM orders),
        |rng AS (SELECT (min(d) + max(d)) // 2 AS mid FROM base),
        |cells AS (
        |  SELECT k,
        |    CAST(sum(CASE WHEN d <= mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN d > mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c2
        |  FROM base CROSS JOIN rng GROUP BY 1),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |               CAST(sum(c2) AS BIGINT) AS n2 FROM cells),
        |terms AS (
        |  SELECT n1, n2,
        |    CAST(round((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |        - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |      * ln((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |        / (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |      * 1.0e12) AS BIGINT) AS pg
        |  FROM cells CROSS JOIN tot WHERE c1 > 0 AND c2 > 0)
        |SELECT max(n1) AS n_1, max(n2) AS n_2,
        |  CAST(count(*) AS BIGINT) AS k_cells,
        |  round(CAST(sum(pg) AS DOUBLE) / 1.0e12, 6) AS psi
        |FROM terms""".stripMargin,
    // q297: the KMV slot rows replayed — the q243 poly-hash chain,
    // distinct permuted hashes, rank filter rn <= k. k = 16 < the
    // testdata's ~31-word vocabulary so the truncation and the
    // (k−1)·P/h_k estimator genuinely fire (non-vacuous gate)
    "q297_kmv_sketch" ->
      s"""WITH w AS MATERIALIZED (
        |  SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |ph AS MATERIALIZED (
        |  SELECT src, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM w),
        |hh AS MATERIALIZED (
        |  SELECT DISTINCT src, (ph * 2654435761) % 1000000007 AS h
        |  FROM ph),
        |rk AS (SELECT src, h,
        |         row_number() OVER (PARTITION BY src ORDER BY h) AS rn
        |       FROM hh)
        |SELECT src AS source, CAST(rn - 1 AS BIGINT) AS i, h
        |FROM rk WHERE rn <= 16""".stripMargin,
    // q298: the KMV estimate replayed — exact below k, else the
    // (k−1)·P/h_k order-statistic estimator, exact distinct alongside
    "q298_kmv_distinct" ->
      s"""WITH w AS MATERIALIZED (
        |  SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |ph AS MATERIALIZED (
        |  SELECT src, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM w),
        |hh AS MATERIALIZED (
        |  SELECT DISTINCT src, (ph * 2654435761) % 1000000007 AS h
        |  FROM ph),
        |ex AS (SELECT src, CAST(count(*) AS BIGINT) AS exact_distinct
        |       FROM w GROUP BY 1),
        |cnt AS (SELECT src, CAST(count(*) AS BIGINT) AS nh
        |        FROM hh GROUP BY 1),
        |kth AS (SELECT src, h AS hk FROM (
        |          SELECT src, h, row_number() OVER (PARTITION BY src
        |            ORDER BY h) AS rn FROM hh)
        |        WHERE rn = 16)
        |SELECT c.src AS source,
        |  CASE WHEN c.nh < 16 THEN c.nh
        |    ELSE CAST(round(15.0 * 1000000007.0
        |      / CAST(k.hk AS DOUBLE)) AS BIGINT) END AS kmv_est,
        |  e.exact_distinct
        |FROM cnt c LEFT JOIN kth k USING (src)
        |JOIN ex e ON e.src = c.src""".stripMargin,
    // q299: the oracle builds the GLOBAL bottom-k directly from the
    // undivided corpus; the engine merges per-source shards — hash
    // equality proves union mergeability (the q245 device)
    "q299_kmv_union" ->
      s"""WITH w AS MATERIALIZED (
        |  SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |dw AS MATERIALIZED (SELECT DISTINCT w FROM w),
        |ph AS MATERIALIZED (
        |  SELECT w, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM dw),
        |hh AS (SELECT DISTINCT (ph * 2654435761) % 1000000007 AS h
        |       FROM ph),
        |rk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hh)
        |SELECT CAST(rn - 1 AS BIGINT) AS i, h
        |FROM rk WHERE rn <= 16""".stripMargin,
    // q300: the Hodges-Lehmann chain replayed — difference histogram
    // from the two value histograms, weighted lower median
    "q300_hodges_lehmann" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |ha AS (SELECT v AS a, na FROM h WHERE na > 0),
        |hb AS (SELECT v AS b, t - na AS nb FROM h WHERE t - na > 0),
        |df AS (SELECT a - b AS d, CAST(sum(na * nb) AS BIGINT) AS w2
        |       FROM ha CROSS JOIN hb GROUP BY 1),
        |tot AS (SELECT CAST(sum(w2) AS BIGINT) AS tw FROM df),
        |cu AS (SELECT d, CAST(sum(w2) OVER (ORDER BY d ROWS BETWEEN
        |         UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        |       FROM df)
        |SELECT tw AS n_pairs, d AS hl_shift
        |FROM cu CROSS JOIN tot
        |WHERE 2 * cw >= tw + 1 ORDER BY d LIMIT 1""".stripMargin,
    // q301: q259's exact covariance chain for lags 1-3, pivoted, then
    // the Durbin-Levinson recursion unrolled as mirrored expressions
    "q301_pacf" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(r) AS BIGINT) AS s FROM daily),
        |dev AS MATERIALIZED (
        |  SELECT d, t.n, r * t.n - t.s AS dv FROM daily CROSS JOIN tot t),
        |c0 AS (SELECT CAST(sum(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT))
        |         AS DOUBLE) AS c0, max(n) AS n
        |       FROM dev),
        |cks AS (
        |  SELECT l.lag AS lag,
        |    CAST(sum(CAST(a.dv AS HUGEINT) * CAST(b.dv AS HUGEINT))
        |      AS DOUBLE) AS ck
        |  FROM dev a
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 4)) AS BIGINT) AS lag) l
        |  JOIN dev b ON b.d = a.d - l.lag
        |  GROUP BY 1),
        |pv AS (SELECT max(CASE WHEN lag = 1 THEN ck END) AS ck1,
        |         max(CASE WHEN lag = 2 THEN ck END) AS ck2,
        |         max(CASE WHEN lag = 3 THEN ck END) AS ck3
        |       FROM cks),
        |rr AS (SELECT n, ck1 / c0 AS r1, ck2 / c0 AS r2, ck3 / c0 AS r3
        |       FROM pv CROSS JOIN c0 WHERE c0 > 0.0),
        |p2 AS (SELECT n, r1, r2, r3, 1.0 - r1 * r1 AS den2 FROM rr),
        |p3 AS (SELECT n, r1, r2, r3,
        |         CASE WHEN den2 = 0.0 THEN CAST('NaN' AS DOUBLE)
        |           ELSE (r2 - r1 * r1) / den2 END AS p22
        |       FROM p2),
        |p4 AS (SELECT n, r1, r2, r3, p22,
        |         r1 * (1.0 - p22) AS p21 FROM p3),
        |p5 AS (SELECT n, r1, r2, r3, p22, p21,
        |         1.0 - p21 * r1 - p22 * r2 AS den3 FROM p4)
        |SELECT n AS n_days, round(r1, 6) AS pacf1,
        |  round(p22, 6) AS pacf2,
        |  round(CASE WHEN isnan(den3) OR den3 = 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (r3 - p21 * r2 - p22 * r1) / den3 END, 6) AS pacf3
        |FROM p5""".stripMargin,
    // q302: the per-source KS chain replayed — dense source × value
    // grid, partitioned cumulative counts, exact gap argmax per source
    "q302_source_ks_drift" ->
      """WITH base AS MATERIALIZED (
        |  SELECT source AS src,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS v
        |  FROM documents),
        |cells AS MATERIALIZED (
        |  SELECT src, v, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |pooled AS MATERIALIZED (
        |  SELECT v, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(t) AS BIGINT) AS nn FROM pooled),
        |persrc AS (SELECT src, CAST(sum(c) AS BIGINT) AS ns
        |           FROM cells GROUP BY 1),
        |grid AS (SELECT s.src, p.v
        |         FROM (SELECT DISTINCT src FROM cells) s
        |         CROSS JOIN (SELECT v FROM pooled) p),
        |cum AS (
        |  SELECT g.src, g.v,
        |    CAST(sum(coalesce(cl.c, 0)) OVER (PARTITION BY g.src
        |      ORDER BY g.v ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS BIGINT) AS cs
        |  FROM grid g LEFT JOIN cells cl
        |    ON cl.src = g.src AND cl.v = g.v),
        |pc AS (SELECT v, CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN
        |         UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct
        |       FROM pooled),
        |gaps AS (
        |  SELECT c.src, c.v, s.ns, t.nn,
        |    abs(c.cs * (t.nn - s.ns) - (p.ct - c.cs) * s.ns) AS gap
        |  FROM cum c JOIN pc p USING (v)
        |  JOIN persrc s ON s.src = c.src CROSS JOIN tot t),
        |rk AS (SELECT src, v, ns, nn, gap,
        |         row_number() OVER (PARTITION BY src
        |           ORDER BY gap DESC, v) AS rn
        |       FROM gaps)
        |SELECT src AS source, ns AS n_source,
        |  round(CASE WHEN ns = nn THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(gap AS DOUBLE) / (CAST(ns AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) - CAST(ns AS DOUBLE))) END, 6)
        |    AS d_stat,
        |  v AS d_location
        |FROM rk WHERE rn = 1""".stripMargin,
    // q303: the quantile-shift chain replayed — shared cumulative
    // histogram, integer percentile_disc compares per decile
    "q303_quantile_shift" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (
        |  SELECT v,
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(sum(t - na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        |  FROM h),
        |e AS (
        |  SELECT c.v, c.ca, c.cb, t.n1, t.n2, dd.decile
        |  FROM c CROSS JOIN tot t CROSS JOIN
        |    (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS decile) dd),
        |q AS (
        |  SELECT decile,
        |    min(CASE WHEN 10 * ca >= decile * n1 THEN v END) AS q_a,
        |    min(CASE WHEN 10 * cb >= decile * n2 THEN v END) AS q_b
        |  FROM e GROUP BY 1)
        |SELECT decile, q_a, q_b, q_a - q_b AS shift FROM q""".stripMargin,
    // q304: the energy-distance chain replayed — |domain|² pair table
    // of the histogram with itself, exact count·count·distance sums
    "q304_energy_distance" ->
      """WITH h0 AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |hh AS MATERIALIZED (SELECT v, na, t - na AS nb FROM h0),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(nb) AS BIGINT) AS n2 FROM hh),
        |ag AS (
        |  SELECT CAST(sum(a.na * b.nb * abs(a.v - b.v)) AS HUGEINT)
        |      AS exy,
        |    CAST(sum(a.na * b.na * abs(a.v - b.v)) AS HUGEINT) AS exx,
        |    CAST(sum(a.nb * b.nb * abs(a.v - b.v)) AS HUGEINT) AS eyy
        |  FROM hh a CROSS JOIN hh b)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE 2.0 * CAST(exy AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |      - CAST(exx AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
        |      - CAST(eyy AS DOUBLE)
        |        / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)) END, 6)
        |    AS energy_dist
        |FROM ag CROSS JOIN tot""".stripMargin,
    // q305: the Kuiper chain replayed — both one-sided max gaps from
    // the same cumulative histogram, summed
    "q305_kuiper" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(round(100.0 * l_discount) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (
        |  SELECT
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(sum(t - na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        |  FROM h),
        |ag AS (
        |  SELECT max(n1) AS n1, max(n2) AS n2,
        |    CAST(max(ca * n2 - cb * n1) AS BIGINT) AS dplus,
        |    CAST(max(cb * n1 - ca * n2) AS BIGINT) AS dminus
        |  FROM c CROSS JOIN tot)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(dplus AS DOUBLE) + CAST(dminus AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END, 6)
        |    AS v_stat
        |FROM ag""".stripMargin,
    // q306: the seasonal MK chain replayed — within-weekday pairs,
    // per-season tie-corrected variance, q277's z convention
    "q306_seasonal_mk" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |dw AS MATERIALIZED (
        |  SELECT (d + 4) % 7 AS dow, d, r FROM daily),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN b.r > a.r THEN 1
        |    WHEN b.r < a.r THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM dw a JOIN dw b ON b.dow = a.dow AND a.d < b.d),
        |per AS (
        |  SELECT CAST(sum(ng * (ng - 1) * (2 * ng + 5)) AS BIGINT)
        |      AS vpos,
        |    CAST(sum(ng) AS BIGINT) AS n
        |  FROM (SELECT dow, CAST(count(*) AS BIGINT) AS ng
        |        FROM dw GROUP BY 1)),
        |ties AS (
        |  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
        |    AS tiesum
        |  FROM (SELECT dow, r, CAST(count(*) AS BIGINT) AS t
        |        FROM dw GROUP BY 1, 2)),
        |fin AS (
        |  SELECT s_stat, n,
        |    (CAST(vpos AS DOUBLE) - CAST(tiesum AS DOUBLE)) / 18.0
        |      AS var_s
        |  FROM s CROSS JOIN per CROSS JOIN ties)
        |SELECT n AS n_days, s_stat, round(var_s, 4) AS var_s,
        |  round(CASE WHEN s_stat > 0
        |      THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
        |    WHEN s_stat < 0
        |      THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
        |    ELSE 0.0 END, 6) AS z_score
        |FROM fin""".stripMargin,
    // q307: the Ljung-Box chain replayed — q259's covariances for
    // lags 1-7, the portmanteau sum folded in fixed lag order
    "q307_ljung_box" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(r) AS BIGINT) AS s FROM daily),
        |dev AS MATERIALIZED (
        |  SELECT d, t.n, r * t.n - t.s AS dv FROM daily CROSS JOIN tot t),
        |c0 AS (SELECT CAST(sum(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT))
        |         AS DOUBLE) AS c0, max(n) AS n
        |       FROM dev),
        |cks AS (
        |  SELECT l.lag AS lag,
        |    CAST(sum(CAST(a.dv AS HUGEINT) * CAST(b.dv AS HUGEINT))
        |      AS DOUBLE) AS ck
        |  FROM dev a
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag) l
        |  JOIN dev b ON b.d = a.d - l.lag
        |  GROUP BY 1),
        |pv AS (SELECT max(CASE WHEN lag = 1 THEN ck END) AS ck1,
        |         max(CASE WHEN lag = 2 THEN ck END) AS ck2,
        |         max(CASE WHEN lag = 3 THEN ck END) AS ck3,
        |         max(CASE WHEN lag = 4 THEN ck END) AS ck4,
        |         max(CASE WHEN lag = 5 THEN ck END) AS ck5,
        |         max(CASE WHEN lag = 6 THEN ck END) AS ck6,
        |         max(CASE WHEN lag = 7 THEN ck END) AS ck7
        |       FROM cks),
        |rr AS (
        |  SELECT n,
        |    coalesce(ck1, 0.0) / c0 AS r1, coalesce(ck2, 0.0) / c0 AS r2,
        |    coalesce(ck3, 0.0) / c0 AS r3, coalesce(ck4, 0.0) / c0 AS r4,
        |    coalesce(ck5, 0.0) / c0 AS r5, coalesce(ck6, 0.0) / c0 AS r6,
        |    coalesce(ck7, 0.0) / c0 AS r7
        |  FROM pv CROSS JOIN c0 WHERE c0 > 0.0)
        |SELECT n AS n_days,
        |  round(CASE WHEN n <= 7 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
        |      * (r1 * r1 / (CAST(n AS DOUBLE) - 1.0)
        |        + r2 * r2 / (CAST(n AS DOUBLE) - 2.0)
        |        + r3 * r3 / (CAST(n AS DOUBLE) - 3.0)
        |        + r4 * r4 / (CAST(n AS DOUBLE) - 4.0)
        |        + r5 * r5 / (CAST(n AS DOUBLE) - 5.0)
        |        + r6 * r6 / (CAST(n AS DOUBLE) - 6.0)
        |        + r7 * r7 / (CAST(n AS DOUBLE) - 7.0)) END, 4)
        |    AS q_stat
        |FROM rr""".stripMargin,
    // q308: the Mood's-median chain replayed — integer pooled-median
    // compare, 2×2 exact counts, one mirrored χ²
    "q308_moods_median" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (SELECT v, CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN
        |        UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct
        |      FROM h),
        |med AS (SELECT v AS med FROM c CROSS JOIN tot
        |        WHERE 2 * ct >= n1 + n2 + 1 ORDER BY v LIMIT 1),
        |ag AS (
        |  SELECT
        |    CAST(sum(CASE WHEN v > med THEN na ELSE 0 END) AS BIGINT)
        |      AS a1,
        |    CAST(sum(CASE WHEN v > med THEN t - na ELSE 0 END)
        |      AS BIGINT) AS b1,
        |    CAST(sum(na) AS BIGINT) AS n1,
        |    CAST(sum(t - na) AS BIGINT) AS n2
        |  FROM h CROSS JOIN med),
        |fin AS (SELECT n1, n2, a1, b1, n1 - a1 AS a0, n2 - b1 AS b0
        |        FROM ag),
        |fd AS (
        |  SELECT n1, n2, a1, b1,
        |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (CAST(a1 AS DOUBLE) + CAST(b1 AS DOUBLE))
        |      * (CAST(a0 AS DOUBLE) + CAST(b0 AS DOUBLE)) AS den,
        |    CAST(a1 * b0 - a0 * b1 AS DOUBLE) AS dev
        |  FROM fin)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  a1 AS n_above_a, b1 AS n_above_b,
        |  round(CASE WHEN den = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |      * dev * dev / den END, 6) AS chi2
        |FROM fd""".stripMargin,
    // q309: the Ansari-Bradley chain replayed — inward-folded ×2
    // midrank scores, exact Σts/Σts² moments, mirrored z
    "q309_ansari_bradley" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(round(100.0 * l_discount) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |r AS (
        |  SELECT na, t, 2 * coalesce(sum(t) OVER (ORDER BY v ROWS
        |    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
        |    AS r2
        |  FROM h),
        |s AS (SELECT na, t,
        |        least(r2, 2 * (n1 + n2 + 1) - r2) AS s2
        |      FROM r CROSS JOIN tot),
        |ag AS (SELECT
        |    CAST(sum(na * s2) AS BIGINT) AS ab2,
        |    CAST(sum(t * s2) AS BIGINT) AS ts1,
        |    CAST(sum(t * s2 * s2) AS BIGINT) AS ts2
        |  FROM s),
        |fin AS (
        |  SELECT n1, n2, ab2, ts1, ts2,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn
        |  FROM ag CROSS JOIN tot),
        |fd AS (
        |  SELECT n1, n2, ab2, ts1, nn,
        |    CASE WHEN nn = 1.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        * (nn * CAST(ts2 AS DOUBLE)
        |          - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE))
        |        / (nn * nn * (nn - 1.0)) END AS varx4
        |  FROM fin)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CAST(ab2 AS DOUBLE) / 2.0, 2) AS ab_stat,
        |  round(CASE WHEN varx4 = 0.0 OR isnan(varx4)
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(ab2 AS DOUBLE) - CAST(n1 AS DOUBLE)
        |      * CAST(ts1 AS DOUBLE) / nn) / sqrt(varx4) END, 6)
        |    AS z_score
        |FROM fd""".stripMargin,
    // q310: the KMV-Jaccard chain replayed — per-source bottom-k
    // lists, merged bottom-k of each pair's union, shared fraction,
    // exact word-set Jaccard alongside
    "q310_kmv_jaccard" ->
      s"""WITH w AS MATERIALIZED (
        |  SELECT DISTINCT source AS src, w FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |ph AS MATERIALIZED (
        |  SELECT src, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM w),
        |hh AS MATERIALIZED (
        |  SELECT DISTINCT src, (ph * 2654435761) % 1000000007 AS h
        |  FROM ph),
        |rk AS (SELECT src, h,
        |         row_number() OVER (PARTITION BY src ORDER BY h) AS rn
        |       FROM hh),
        |sk AS MATERIALIZED (
        |  SELECT src, list(h ORDER BY h) AS sk
        |  FROM rk WHERE rn <= 16 GROUP BY src),
        |pr AS (
        |  SELECT a.src AS s1, b.src AS s2, a.sk AS ska, b.sk AS skb
        |  FROM sk a JOIN sk b ON a.src < b.src),
        |m AS (
        |  SELECT s1, s2, ska, skb,
        |    list_slice(list_sort(list_distinct(list_concat(ska, skb))),
        |      1, 16) AS merged
        |  FROM pr),
        |e AS (
        |  SELECT s1, s2,
        |    CAST(len(list_filter(merged, x -> list_contains(ska, x)
        |      AND list_contains(skb, x))) AS BIGINT) AS shared,
        |    CAST(len(merged) AS BIGINT) AS msize
        |  FROM m),
        |cnt AS (SELECT src, CAST(count(*) AS BIGINT) AS nw
        |        FROM w GROUP BY 1),
        |inter AS (
        |  SELECT a.src AS s1, b.src AS s2,
        |    CAST(count(*) AS BIGINT) AS ni
        |  FROM w a JOIN w b ON b.w = a.w AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT e.s1 AS source_a, e.s2 AS source_b,
        |  round(CAST(shared AS DOUBLE) / CAST(msize AS DOUBLE), 6)
        |    AS jaccard_est,
        |  round(CAST(coalesce(i.ni, 0) AS DOUBLE)
        |    / (CAST(c1.nw AS DOUBLE) + CAST(c2.nw AS DOUBLE)
        |      - CAST(coalesce(i.ni, 0) AS DOUBLE)), 6)
        |    AS jaccard_exact
        |FROM e JOIN cnt c1 ON c1.src = e.s1
        |JOIN cnt c2 ON c2.src = e.s2
        |LEFT JOIN inter i ON i.s1 = e.s1 AND i.s2 = e.s2""".stripMargin,
    // q311: the Anderson-Darling chain replayed — right-continuous
    // cumulative counts, per-value rational term on the x1e9 grid
    // (the q290 device), HUGEINT sum, one divide
    "q311_anderson_darling" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |c AS (
        |  SELECT t,
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ma,
        |    CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS hh
        |  FROM h),
        |w AS (
        |  SELECT n1, n2,
        |    CASE WHEN n1 = 0 OR n2 = 0 OR hh = n1 + n2 THEN 0
        |      ELSE CAST(round(
        |        (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))
        |        * CAST(t AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
        |        * (CAST(n1 + n2 AS DOUBLE) * CAST(ma AS DOUBLE)
        |          - CAST(n1 AS DOUBLE) * CAST(hh AS DOUBLE))
        |        * (CAST(n1 + n2 AS DOUBLE) * CAST(ma AS DOUBLE)
        |          - CAST(n1 AS DOUBLE) * CAST(hh AS DOUBLE))
        |        / (CAST(hh AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE)
        |          - CAST(hh AS DOUBLE)))
        |        * 1.0e9) AS BIGINT) END AS wg
        |  FROM c CROSS JOIN tot),
        |ag AS (SELECT max(n1) AS n1, max(n2) AS n2,
        |              CAST(sum(wg) AS BIGINT) AS wsum FROM w)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(wsum AS DOUBLE) / 1.0e9 END, 6) AS ad_stat
        |FROM ag""".stripMargin,
    // q312: the Jonckheere-Terpstra chain replayed — dense
    // group x value grid, per-group cumulatives, pair-join exact 2U
    // sums, three-term tie-corrected variance
    "q312_jonckheere" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST(l_linenumber AS BIGINT) AS g,
        |    CAST(l_quantity AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM cells),
        |grps AS (SELECT DISTINCT g FROM cells),
        |grid AS (
        |  SELECT gg.g, vv.v, coalesce(c.c, 0) AS c0
        |  FROM grps gg CROSS JOIN vals vv
        |  LEFT JOIN cells c ON c.g = gg.g AND c.v = vv.v),
        |cum AS (
        |  SELECT g, v, c0,
        |    coalesce(sum(c0) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cb
        |  FROM grid),
        |jt AS (
        |  SELECT CAST(sum(CAST(cj.c AS HUGEINT)
        |    * (2 * ci.cb + ci.c0)) AS HUGEINT) AS jt2
        |  FROM cum ci JOIN cells cj ON cj.v = ci.v AND ci.g < cj.g),
        |sizes AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(CAST(ng AS HUGEINT) * ng) AS HUGEINT) AS s2,
        |    CAST(sum(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5))
        |      AS HUGEINT) AS u1,
        |    CAST(sum(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2))
        |      AS HUGEINT) AS u2,
        |    CAST(sum(CAST(ng AS HUGEINT) * (ng - 1)) AS HUGEINT) AS u3
        |  FROM (SELECT g, CAST(sum(c) AS BIGINT) AS ng
        |        FROM cells GROUP BY 1)),
        |ties AS (
        |  SELECT
        |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
        |      AS HUGEINT) AS w1,
        |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2))
        |      AS HUGEINT) AS w2,
        |    CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS w3
        |  FROM (SELECT v, CAST(sum(c) AS BIGINT) AS t
        |        FROM cells GROUP BY 1)),
        |fin AS (
        |  SELECT k, n, jt2,
        |    CAST(CAST(n AS HUGEINT) * n - s2 AS DOUBLE) / 2.0 AS e2,
        |    CASE WHEN n < 3 THEN CAST('NaN' AS DOUBLE) ELSE
        |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        * (2.0 * CAST(n AS DOUBLE) + 5.0)
        |        - CAST(u1 AS DOUBLE) - CAST(w1 AS DOUBLE)) / 72.0
        |      + CAST(u2 AS DOUBLE) * CAST(w2 AS DOUBLE)
        |        / (36.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |          * (CAST(n AS DOUBLE) - 2.0))
        |      + CAST(u3 AS DOUBLE) * CAST(w3 AS DOUBLE)
        |        / (8.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |      END AS var0
        |  FROM jt CROSS JOIN sizes CROSS JOIN ties)
        |SELECT k AS k_groups, n AS n_rows,
        |  round(CAST(jt2 AS DOUBLE) / 2.0, 2) AS jt_stat,
        |  round(CASE WHEN isnan(var0) OR var0 <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(jt2 AS DOUBLE) - e2) / (2.0 * sqrt(var0)) END, 6)
        |    AS z_score
        |FROM fin""".stripMargin,
    // q313: the Lepage chain replayed — one histogram carries both
    // the q271 Wilcoxon and q309 Ansari-Bradley component sums
    "q313_lepage" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(round(100.0 * l_discount) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |               CAST(sum(t - na) AS BIGINT) AS n2 FROM h),
        |r AS (
        |  SELECT na, t, 2 * coalesce(sum(t) OVER (ORDER BY v ROWS
        |    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
        |    AS r2
        |  FROM h),
        |s AS (SELECT na, t, r2,
        |        least(r2, 2 * (n1 + n2 + 1) - r2) AS s2
        |      FROM r CROSS JOIN tot),
        |ag AS (SELECT
        |    CAST(sum(CAST(na AS HUGEINT) * r2) AS HUGEINT) AS r1x2,
        |    CAST(sum(CAST(t AS HUGEINT) * t * t - CAST(t AS HUGEINT))
        |      AS HUGEINT) AS ties,
        |    CAST(sum(CAST(na AS HUGEINT) * s2) AS HUGEINT) AS ab2,
        |    CAST(sum(CAST(t AS HUGEINT) * s2) AS HUGEINT) AS ts1,
        |    CAST(sum(CAST(t AS HUGEINT) * s2 * s2) AS HUGEINT) AS ts2
        |  FROM s),
        |fin AS (
        |  SELECT n1, n2, ab2, ts1, ts2, ties,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn,
        |    r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2
        |  FROM ag CROSS JOIN tot),
        |z AS (
        |  SELECT n1, n2, ab2, ts1, nn, u1x2,
        |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
        |      * ((nn + 1.0) - CAST(ties AS DOUBLE)
        |        / (nn * (nn - 1.0))) AS sig2,
        |    CASE WHEN nn = 1.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        * (nn * CAST(ts2 AS DOUBLE)
        |          - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE))
        |        / (nn * nn * (nn - 1.0)) END AS varx4
        |  FROM fin),
        |zz AS (
        |  SELECT n1, n2,
        |    CASE WHEN sig2 <= 0.0 OR isnan(sig2)
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(u1x2 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE)
        |        * CAST(n2 AS DOUBLE) / 2.0) / sqrt(sig2) END AS zw,
        |    CASE WHEN varx4 = 0.0 OR isnan(varx4)
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(ab2 AS DOUBLE) - CAST(n1 AS DOUBLE)
        |        * CAST(ts1 AS DOUBLE) / nn) / sqrt(varx4) END AS zab
        |  FROM z)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(zw, 6) AS z_wilcoxon,
        |  round(zab, 6) AS z_ansari,
        |  round(zw * zw + zab * zab, 6) AS lepage_stat
        |FROM zz""".stripMargin,
    // q314: the Cucconi chain replayed — squared x2-grid ranks, exact
    // reflected-sum expansion for V, classical null moments and rho
    "q314_cucconi" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |r AS (
        |  SELECT na, t, 2 * coalesce(sum(t) OVER (ORDER BY v ROWS
        |    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
        |    AS r2
        |  FROM h),
        |ag AS (SELECT
        |    CAST(sum(na) AS BIGINT) AS n1,
        |    CAST(sum(t - na) AS BIGINT) AS n2,
        |    CAST(sum(CAST(t - na AS HUGEINT) * r2 * r2) AS HUGEINT)
        |      AS u4,
        |    CAST(sum(CAST(t - na AS HUGEINT) * r2) AS HUGEINT) AS rb2
        |  FROM r),
        |f1 AS (
        |  SELECT n1, n2, u4,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn,
        |    CAST(4 AS HUGEINT) * (CAST(n1 AS HUGEINT) + n2 + 1)
        |        * (CAST(n1 AS HUGEINT) + n2 + 1) * n2
        |      - CAST(4 AS HUGEINT) * (CAST(n1 AS HUGEINT) + n2 + 1)
        |        * rb2 + u4 AS v4
        |  FROM ag),
        |f2 AS (
        |  SELECT n1, n2, u4, v4, nn,
        |    CAST(n2 AS DOUBLE) * (nn + 1.0) * (2.0 * nn + 1.0) / 6.0
        |      AS eu,
        |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (nn + 1.0)
        |      * (2.0 * nn + 1.0) * (8.0 * nn + 11.0) / 180.0 AS varu,
        |    2.0 * (nn * nn - 4.0) / ((2.0 * nn + 1.0)
        |      * (8.0 * nn + 11.0)) - 1.0 AS rho
        |  FROM f1),
        |f3 AS (
        |  SELECT n1, n2, rho,
        |    CASE WHEN varu <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(u4 AS DOUBLE) / 4.0 - eu) / sqrt(varu) END
        |      AS us,
        |    CASE WHEN varu <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(v4 AS DOUBLE) / 4.0 - eu) / sqrt(varu) END
        |      AS vs
        |  FROM f2)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(us, 6) AS u_star,
        |  round(vs, 6) AS v_star,
        |  round(CASE WHEN 1.0 - rho * rho <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (us * us + vs * vs - 2.0 * rho * us * vs)
        |      / (2.0 * (1.0 - rho * rho)) END, 6) AS cucconi_c
        |FROM f3""".stripMargin,
    // q315: the Cochran-Armitage chain replayed — k score rows, exact
    // weighted sums, one mirrored z
    "q315_cochran_armitage" ->
      """WITH per AS MATERIALIZED (
        |  SELECT CAST(CAST(substr(o_orderpriority, 1, 1) AS INT)
        |      AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS rg
        |  FROM orders GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(rg) AS BIGINT) AS r,
        |    CAST(sum(CAST(s AS HUGEINT) * rg) AS HUGEINT) AS sr,
        |    CAST(sum(CAST(s AS HUGEINT) * ng) AS HUGEINT) AS sn,
        |    CAST(sum(CAST(s AS HUGEINT) * s * ng) AS HUGEINT) AS s2n
        |  FROM per),
        |f AS (
        |  SELECT k, n, r,
        |    CAST(sr AS DOUBLE) - CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
        |      * CAST(sn AS DOUBLE) AS tt,
        |    CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s2n AS DOUBLE) - CAST(sn AS DOUBLE)
        |        * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)) AS vart
        |  FROM ag)
        |SELECT k AS k_cats, n AS n_rows, r AS n_success,
        |  round(tt, 4) AS trend_stat,
        |  round(CASE WHEN vart <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE tt / sqrt(vart) END, 6) AS z_score
        |FROM f""".stripMargin,
    // q316: the McNemar chain replayed — per-customer paired flags,
    // discordant counts, chi2 with and without continuity correction
    "q316_mcnemar" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey,
        |    CAST(max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM per)
        |SELECT n AS n_pairs, b AS n_only_x, c AS n_only_y,
        |  round(CASE WHEN b + c = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |      * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |      / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END, 6)
        |    AS chi2,
        |  round(CASE WHEN b + c = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE greatest(abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |        - 1.0, 0.0)
        |      * greatest(abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
        |        - 1.0, 0.0)
        |      / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END, 6)
        |    AS chi2_cc
        |FROM ag""".stripMargin,
    // q317: the Brunner-Munzel chain replayed — pooled and
    // within-group x2 midranks, all-integer S_i numerators, one
    // mirrored statistic
    "q317_brunner_munzel" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |r AS (
        |  SELECT na, t - na AS nb, t,
        |    coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS cumb,
        |    coalesce(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS cumba
        |  FROM h),
        |rr AS (
        |  SELECT na, nb,
        |    2 * cumb + t + 1 AS r2,
        |    2 * cumba + na + 1 AS ra2,
        |    2 * (cumb - cumba) + nb + 1 AS rb2
        |  FROM r),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |    CAST(sum(nb) AS BIGINT) AS n2,
        |    CAST(sum(CAST(na AS HUGEINT) * r2) AS HUGEINT) AS r1x2,
        |    CAST(sum(CAST(nb AS HUGEINT) * r2) AS HUGEINT) AS r2x2
        |  FROM rr),
        |ag AS (
        |  SELECT max(n1) AS n1, max(n2) AS n2,
        |    max(r1x2) AS r1x2, max(r2x2) AS r2x2,
        |    CAST(sum(CAST(na AS HUGEINT)
        |      * (CAST(n1 AS HUGEINT) * (r2 - ra2)
        |        - (r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1)))
        |      * (CAST(n1 AS HUGEINT) * (r2 - ra2)
        |        - (r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1))))
        |      AS HUGEINT) AS sxn,
        |    CAST(sum(CAST(nb AS HUGEINT)
        |      * (CAST(n2 AS HUGEINT) * (r2 - rb2)
        |        - (r2x2 - CAST(n2 AS HUGEINT) * (n2 + 1)))
        |      * (CAST(n2 AS HUGEINT) * (r2 - rb2)
        |        - (r2x2 - CAST(n2 AS HUGEINT) * (n2 + 1))))
        |      AS HUGEINT) AS syn
        |  FROM rr CROSS JOIN tot),
        |f AS (
        |  SELECT n1, n2, r1x2, r2x2,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn,
        |    CASE WHEN n1 <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(sxn AS DOUBLE) / (4.0 * CAST(n1 AS DOUBLE)
        |        * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) END
        |      AS sx,
        |    CASE WHEN n2 <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(syn AS DOUBLE) / (4.0 * CAST(n2 AS DOUBLE)
        |        * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) END
        |      AS sy
        |  FROM ag),
        |g AS (SELECT n1, n2, r1x2, r2x2, nn,
        |        CAST(n1 AS DOUBLE) * sx + CAST(n2 AS DOUBLE) * sy
        |          AS sig
        |      FROM f)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(r2x2 AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE))
        |      - (CAST(n2 AS DOUBLE) + 1.0) / 2.0)
        |      / CAST(n1 AS DOUBLE) END, 6) AS p_hat,
        |  round(CASE WHEN isnan(sig) OR sig <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (CAST(r2x2 AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE))
        |        - CAST(r1x2 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)))
        |      / (nn * sqrt(sig)) END, 6) AS bm_stat
        |FROM g""".stripMargin,
    // q318: the CCF chain replayed — one daily aggregate for both
    // series, n-scaled integer deviations, per-lag HUGEINT
    // cross-products, one mirrored divide per lag
    "q318_ccf_daily" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(r) AS BIGINT) AS sr,
        |               CAST(sum(c) AS BIGINT) AS sc FROM daily),
        |dev AS MATERIALIZED (
        |  SELECT d, r * t.n - t.sr AS dvx, c * t.n - t.sc AS dvy
        |  FROM daily CROSS JOIN tot t),
        |c0 AS (SELECT
        |    CAST(sum(CAST(dvx AS HUGEINT) * CAST(dvx AS HUGEINT))
        |      AS HUGEINT) AS c0x,
        |    CAST(sum(CAST(dvy AS HUGEINT) * CAST(dvy AS HUGEINT))
        |      AS HUGEINT) AS c0y
        |  FROM dev),
        |lags AS (SELECT unnest(range(-7, 8)) AS lag),
        |pairs AS (
        |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CAST(a.dvx AS HUGEINT) * b.dvy) AS HUGEINT) AS ck
        |  FROM dev a CROSS JOIN lags l
        |  JOIN dev b ON b.d = a.d - l.lag
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |  round(CAST(ck AS DOUBLE)
        |    / sqrt(CAST(c0x AS DOUBLE) * CAST(c0y AS DOUBLE)), 6)
        |    AS ccf
        |FROM pairs CROSS JOIN c0
        |WHERE CAST(c0x AS DOUBLE) > 0.0
        |  AND CAST(c0y AS DOUBLE) > 0.0""".stripMargin,
    // q319: the ADF chain replayed — consecutive-day lag frame on the
    // dollar grid, nine moment sums, fixed q258 det shape, Var(b1) =
    // s²·(n·s22 − s2²)/det, one mirrored t
    "q319_adf_test" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS r
        |  FROM orders GROUP BY 1),
        |fr AS (
        |  SELECT a.r - b.r AS y, b.r AS x1, b.r - c.r AS x2
        |  FROM daily a JOIN daily b ON b.d = a.d - 1
        |  JOIN daily c ON c.d = a.d - 2),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nl,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1,
        |    CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x1 * x1) AS DOUBLE) AS s11,
        |    CAST(sum(x1 * x2) AS DOUBLE) AS s12,
        |    CAST(sum(x2 * x2) AS DOUBLE) AS s22,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x1 * y) AS DOUBLE) AS s1y,
        |    CAST(sum(x2 * y) AS DOUBLE) AS s2y,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM fr),
        |f AS (
        |  SELECT nl, n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2) AS det1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM s),
        |g AS (
        |  SELECT nl, n, s2, s22, sy, s1y, s2y, syy, det,
        |    CASE WHEN det = 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE det0 / det END AS b0,
        |    CASE WHEN det = 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE det1 / det END AS b1,
        |    CASE WHEN det = 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE det2 / det END AS b2
        |  FROM f),
        |h AS (
        |  SELECT nl, b1,
        |    CASE WHEN nl <= 3 OR det = 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (syy - (b0 * sy + b1 * s1y + b2 * s2y)) / (n - 3.0)
        |        * (n * s22 - s2 * s2) / det END AS varb1
        |  FROM g)
        |SELECT nl AS n_rows, round(b1, 6) AS beta,
        |  round(CASE WHEN isnan(varb1) OR varb1 <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE b1 / sqrt(varb1) END, 6) AS adf_t
        |FROM h""".stripMargin,
    // q320: the KPSS chain replayed — n-scaled integer deviations,
    // HUGEINT partial-sum squares over the day order, one divide
    "q320_kpss_test" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(r) AS BIGINT) AS s FROM daily),
        |dev AS (SELECT d, t.n, r * t.n - t.s AS e
        |        FROM daily CROSS JOIN tot t),
        |st AS (SELECT n, e,
        |    CAST(sum(e) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS HUGEINT) AS st
        |  FROM dev),
        |ag AS (SELECT max(n) AS n_days,
        |    CAST(sum(st * st) AS HUGEINT) AS ssq,
        |    CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS esq
        |  FROM st)
        |SELECT n_days,
        |  round(CASE WHEN CAST(esq AS DOUBLE) <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(ssq AS DOUBLE) / (CAST(n_days AS DOUBLE)
        |      * CAST(esq AS DOUBLE)) END, 6) AS kpss_eta
        |FROM ag""".stripMargin,
    // q321: the Chow chain replayed — conditional half moments, the
    // 2x2-Cramer SSE shape for each half and the pooled sums
    "q321_chow_test" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS r
        |  FROM orders GROUP BY 1),
        |mid AS (SELECT CAST(floor((min(d) + max(d)) / 2) AS BIGINT)
        |          AS mid FROM daily),
        |s AS (
        |  SELECT max(mid) AS mid,
        |    CAST(sum(CASE WHEN d <= mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN d > mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(sum(CASE WHEN d <= mid THEN d ELSE 0 END) AS HUGEINT)
        |      AS st1,
        |    CAST(sum(CASE WHEN d > mid THEN d ELSE 0 END) AS HUGEINT)
        |      AS st2,
        |    CAST(sum(CASE WHEN d <= mid THEN d * d ELSE 0 END)
        |      AS HUGEINT) AS stt1,
        |    CAST(sum(CASE WHEN d > mid THEN d * d ELSE 0 END)
        |      AS HUGEINT) AS stt2,
        |    CAST(sum(CASE WHEN d <= mid THEN r ELSE 0 END) AS HUGEINT)
        |      AS sy1,
        |    CAST(sum(CASE WHEN d > mid THEN r ELSE 0 END) AS HUGEINT)
        |      AS sy2,
        |    CAST(sum(CASE WHEN d <= mid THEN d * r ELSE 0 END)
        |      AS HUGEINT) AS sty1,
        |    CAST(sum(CASE WHEN d > mid THEN d * r ELSE 0 END)
        |      AS HUGEINT) AS sty2,
        |    CAST(sum(CASE WHEN d <= mid THEN r * r ELSE 0 END)
        |      AS HUGEINT) AS syy1,
        |    CAST(sum(CASE WHEN d > mid THEN r * r ELSE 0 END)
        |      AS HUGEINT) AS syy2
        |  FROM daily CROSS JOIN mid),
        |f AS (
        |  SELECT mid, n1, n2,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS np,
        |    CAST(st1 AS DOUBLE) AS st1d, CAST(st2 AS DOUBLE) AS st2d,
        |    CAST(st1 AS DOUBLE) + CAST(st2 AS DOUBLE) AS stp,
        |    CAST(stt1 AS DOUBLE) AS stt1d, CAST(stt2 AS DOUBLE) AS stt2d,
        |    CAST(stt1 AS DOUBLE) + CAST(stt2 AS DOUBLE) AS sttp,
        |    CAST(sy1 AS DOUBLE) AS sy1d, CAST(sy2 AS DOUBLE) AS sy2d,
        |    CAST(sy1 AS DOUBLE) + CAST(sy2 AS DOUBLE) AS syp,
        |    CAST(sty1 AS DOUBLE) AS sty1d, CAST(sty2 AS DOUBLE) AS sty2d,
        |    CAST(sty1 AS DOUBLE) + CAST(sty2 AS DOUBLE) AS styp,
        |    CAST(syy1 AS DOUBLE) AS syy1d, CAST(syy2 AS DOUBLE) AS syy2d,
        |    CAST(syy1 AS DOUBLE) + CAST(syy2 AS DOUBLE) AS syyp
        |  FROM s),
        |g AS (
        |  SELECT mid, n1, n2, np,
        |    CASE WHEN n1d * stt1d - st1d * st1d = 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE syy1d - ((sy1d * stt1d - sty1d * st1d)
        |          / (n1d * stt1d - st1d * st1d) * sy1d
        |        + (n1d * sty1d - st1d * sy1d)
        |          / (n1d * stt1d - st1d * st1d) * sty1d) END AS sse1,
        |    CASE WHEN n2d * stt2d - st2d * st2d = 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE syy2d - ((sy2d * stt2d - sty2d * st2d)
        |          / (n2d * stt2d - st2d * st2d) * sy2d
        |        + (n2d * sty2d - st2d * sy2d)
        |          / (n2d * stt2d - st2d * st2d) * sty2d) END AS sse2,
        |    CASE WHEN np * sttp - stp * stp = 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE syyp - ((syp * sttp - styp * stp)
        |          / (np * sttp - stp * stp) * syp
        |        + (np * styp - stp * syp)
        |          / (np * sttp - stp * stp) * styp) END AS ssep
        |  FROM f),
        |h AS (
        |  SELECT mid, n1, n2, sse1, sse2, ssep,
        |    CASE WHEN np <= 4.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (sse1 + sse2) / (np - 4.0) END AS den
        |  FROM g)
        |SELECT n1 + n2 AS n_days, mid AS mid_day,
        |  round(CASE WHEN isnan(den) OR den <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (ssep - sse1 - sse2) / 2.0 / den END, 6) AS f_stat
        |FROM h""".stripMargin,
    // q322: the Bartlett chain replayed — per-group exact moments,
    // guarded per-group terms, sorted-list folds, the standard C
    "q322_bartlett" ->
      """WITH per0 AS MATERIALIZED (
        |  SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS sg,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT)
        |      * CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS qg
        |  FROM orders GROUP BY 1),
        |per AS (
        |  SELECT g, ng,
        |    CASE WHEN ng <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE)
        |        * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
        |        / (CAST(ng AS DOUBLE) - 1.0) END AS v
        |  FROM per0),
        |per2 AS (
        |  SELECT g, ng, v,
        |    CASE WHEN ng <= 1 OR v <= 0.0 THEN 1 ELSE 0 END AS bad,
        |    CASE WHEN ng <= 1 OR v <= 0.0 THEN 0.0
        |      ELSE (CAST(ng AS DOUBLE) - 1.0) * ln(v) END AS tln,
        |    CASE WHEN ng <= 1 OR v <= 0.0 THEN 0.0
        |      ELSE (CAST(ng AS DOUBLE) - 1.0) * v END AS tv,
        |    CASE WHEN ng <= 1 OR v <= 0.0 THEN 0.0
        |      ELSE 1.0 / (CAST(ng AS DOUBLE) - 1.0) END AS tinv
        |  FROM per),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(max(bad) AS BIGINT) AS bad,
        |    list_reduce(list(tln ORDER BY g), (a, b) -> a + b) AS sln,
        |    list_reduce(list(tv ORDER BY g), (a, b) -> a + b) AS sv,
        |    list_reduce(list(tinv ORDER BY g), (a, b) -> a + b) AS sinv
        |  FROM per2),
        |fin AS (
        |  SELECT k, n, bad, sln, sinv,
        |    CAST(n AS DOUBLE) - CAST(k AS DOUBLE) AS nk,
        |    CASE WHEN CAST(n AS DOUBLE) - CAST(k AS DOUBLE) <= 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE sv / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) END
        |      AS sp2
        |  FROM ag),
        |fd AS (
        |  SELECT k, n, bad, sln, nk, sp2,
        |    CASE WHEN k <= 1 OR nk <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE 1.0 + (sinv - 1.0 / nk)
        |        / (3.0 * (CAST(k AS DOUBLE) - 1.0)) END AS cc
        |  FROM fin)
        |SELECT k AS k_groups, n AS n_rows,
        |  round(CASE WHEN bad = 1 OR isnan(sp2) OR sp2 <= 0.0
        |      OR isnan(cc) OR cc = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (nk * ln(sp2) - sln) / cc END, 6) AS bartlett_t
        |FROM fd""".stripMargin,
    // q323: the G-test chain replayed — observed cells joined to
    // margins, one ln term per cell on the 1e9 grid, HUGEINT sum
    "q323_g_test" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT event_type AS a,
        |    CAST((datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      + 4) % 7 AS BIGINT) AS b,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS ka,
        |    CAST(count(DISTINCT b) AS BIGINT) AS kb
        |  FROM cells),
        |terms AS (
        |  SELECT n, ka, kb,
        |    CAST(round(CAST(o AS DOUBLE)
        |      * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
        |        / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)))
        |      * 1.0e9) AS BIGINT) AS g_g
        |  FROM cells JOIN rt USING (a) JOIN ct USING (b)
        |  CROSS JOIN tot),
        |ag AS (SELECT max(n) AS n, max(ka) AS ka, max(kb) AS kb,
        |              CAST(sum(g_g) AS BIGINT) AS gsum FROM terms)
        |SELECT n AS n_rows, (ka - 1) * (kb - 1) AS df,
        |  round(2.0 * CAST(gsum AS DOUBLE) / 1.0e9, 6) AS g_stat
        |FROM ag""".stripMargin,
    // q324: the Welch-ANOVA chain replayed — guarded per-group w/m,
    // two sorted folds (the second needs the first's Σw), mirrored F
    "q324_welch_anova" ->
      """WITH per0 AS MATERIALIZED (
        |  SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS sg,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT)
        |      * CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS qg
        |  FROM orders GROUP BY 1),
        |per AS (
        |  SELECT g, ng, CAST(sg AS DOUBLE) AS sgd,
        |    CASE WHEN ng <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE)
        |        * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
        |        / (CAST(ng AS DOUBLE) - 1.0) END AS v
        |  FROM per0),
        |per2 AS (
        |  SELECT g, ng, v,
        |    CASE WHEN ng <= 1 OR v <= 0.0 THEN 1 ELSE 0 END AS bad,
        |    CASE WHEN ng <= 1 OR v <= 0.0 THEN 0.0
        |      ELSE CAST(ng AS DOUBLE) / v END AS w,
        |    CASE WHEN ng <= 1 OR v <= 0.0 THEN 0.0
        |      ELSE sgd / CAST(ng AS DOUBLE) END AS m
        |  FROM per),
        |st1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(max(bad) AS BIGINT) AS bad,
        |    list_reduce(list(w ORDER BY g), (a, b) -> a + b) AS sw,
        |    list_reduce(list(w * m ORDER BY g), (a, b) -> a + b)
        |      AS swm,
        |    list_reduce(list(w * m * m ORDER BY g), (a, b) -> a + b)
        |      AS swm2
        |  FROM per2),
        |st2 AS (
        |  SELECT s.k AS k, s.n AS n, s.bad AS bad, s.sw AS sw,
        |    s.swm AS swm, s.swm2 AS swm2,
        |    list_reduce(list(CASE WHEN p.bad = 1 THEN 0.0
        |      ELSE (1.0 - p.w / s.sw) * (1.0 - p.w / s.sw)
        |        / (CAST(p.ng AS DOUBLE) - 1.0) END ORDER BY p.g),
        |      (a, b) -> a + b) AS s3
        |  FROM per2 p CROSS JOIN st1 s
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |fin AS (
        |  SELECT k, n, bad, s3, CAST(k AS DOUBLE) AS kd,
        |    CASE WHEN k <= 1 OR sw <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (swm2 - swm * swm / sw)
        |        / (CAST(k AS DOUBLE) - 1.0) END AS aa,
        |    CASE WHEN k <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE 1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
        |        / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
        |        * s3 END AS bb
        |  FROM st2)
        |SELECT k AS k_groups, n AS n_rows,
        |  round(CASE WHEN bad = 1 OR isnan(aa) OR isnan(bb)
        |      OR bb = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE aa / bb END, 6) AS f_welch,
        |  round(CASE WHEN bad = 1 OR k <= 1 OR s3 <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (kd * kd - 1.0) / (3.0 * s3) END, 4) AS df2
        |FROM fin""".stripMargin,
    // q325: the Tukey-Kramer chain replayed — q270 MSE, k² pair rows
    "q325_tukey_hsd" ->
      """WITH per0 AS MATERIALIZED (
        |  SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS sg,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT)
        |      * CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS qg
        |  FROM orders GROUP BY 1),
        |per AS (
        |  SELECT g, ng, sg, qg,
        |    CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE) AS term
        |  FROM per0),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(qg) AS HUGEINT) AS q,
        |    list_reduce(list(term ORDER BY g), (a, b) -> a + b) AS a
        |  FROM per),
        |ms AS (SELECT CASE WHEN n <= k THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(q AS DOUBLE) - a)
        |      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) END AS mse
        |  FROM tot),
        |pr AS (
        |  SELECT a.g AS g_a, b.g AS g_b, a.ng AS n_a, b.ng AS n_b,
        |    CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |      - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE) AS diff
        |  FROM per0 a CROSS JOIN per0 b WHERE a.g < b.g)
        |SELECT g_a, g_b, n_a, n_b,
        |  round(diff, 4) AS mean_diff_cents,
        |  round(CASE WHEN isnan(mse) OR mse <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE abs(diff) / sqrt(mse / 2.0
        |      * (1.0 / CAST(n_a AS DOUBLE)
        |        + 1.0 / CAST(n_b AS DOUBLE))) END, 6) AS q_stat
        |FROM pr CROSS JOIN ms""".stripMargin,
    // q326: the odds-ratio chain replayed — 2x2 from paired flags,
    // mirrored ln/exp/sqrt Wald interval
    "q326_odds_ratio" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey,
        |    CAST(max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |ag AS (SELECT
        |    CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM per),
        |f AS (SELECT a, b, c, d,
        |    (a > 0 AND b > 0 AND c > 0 AND d > 0) AS ok FROM ag),
        |g AS (SELECT a, b, c, d, ok,
        |    CASE WHEN NOT ok THEN CAST('NaN' AS DOUBLE)
        |      ELSE ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |        / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))) END
        |      AS lnor,
        |    CASE WHEN NOT ok THEN CAST('NaN' AS DOUBLE)
        |      ELSE sqrt(1.0 / CAST(a AS DOUBLE)
        |        + 1.0 / CAST(b AS DOUBLE) + 1.0 / CAST(c AS DOUBLE)
        |        + 1.0 / CAST(d AS DOUBLE)) END AS se
        |  FROM f)
        |SELECT a AS n_11, b AS n_10, c AS n_01, d AS n_00,
        |  round(CASE WHEN NOT ok THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) END, 6)
        |    AS odds_ratio,
        |  round(CASE WHEN NOT ok THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(a AS DOUBLE)
        |        / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)))
        |      / (CAST(c AS DOUBLE)
        |        / (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))) END, 6)
        |    AS relative_risk,
        |  round(exp(lnor - 1.96 * se), 6) AS or_ci_lo,
        |  round(exp(lnor + 1.96 * se), 6) AS or_ci_hi
        |FROM g""".stripMargin,
    // q327: the Friedman chain replayed — exact cross-multiplied
    // within-block midranks, treatment rank sums, one mirrored chi2
    "q327_friedman" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST((datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) + 4) % 7 AS BIGINT) AS blk,
        |    o_orderpriority AS trt,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS s
        |  FROM orders GROUP BY 1, 2),
        |ranked AS (
        |  SELECT c1.blk, c1.trt,
        |    CAST(2 * sum(CASE WHEN c2.s * c1.n < c1.s * c2.n
        |        THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN c2.s * c1.n = c1.s * c2.n
        |        THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r2
        |  FROM cells c1 JOIN cells c2 ON c2.blk = c1.blk
        |  GROUP BY 1, 2),
        |shape AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS b,
        |    CAST(count(DISTINCT trt) AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS ncells FROM cells),
        |rj AS (SELECT trt, CAST(sum(r2) AS BIGINT) AS rj2
        |       FROM ranked GROUP BY 1),
        |sr AS (SELECT CAST(sum(CAST(rj2 AS HUGEINT) * rj2) AS HUGEINT)
        |         AS sr2x4 FROM rj)
        |SELECT b AS n_blocks, k AS k_treatments,
        |  round(CASE WHEN k <= 1 OR ncells <> b * k
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE 12.0 / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
        |      * (CAST(k AS DOUBLE) + 1.0))
        |      * (CAST(sr2x4 AS DOUBLE) / 4.0)
        |      - 3.0 * CAST(b AS DOUBLE)
        |        * (CAST(k AS DOUBLE) + 1.0) END, 6) AS chi2_f
        |FROM sr CROSS JOIN shape""".stripMargin,
    // q328: the log-rank chain replayed — q209 duration derivation,
    // id-parity split, per-day O−E and V terms on the 1e9 grid
    "q328_log_rank" ->
      """WITH ed AS (
        |  SELECT user_id, event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d
        |  FROM events),
        |pu AS (SELECT user_id, min(d) AS day0,
        |         min(CASE WHEN event_type = 'purchase' THEN d END)
        |           AS pday
        |       FROM ed GROUP BY 1),
        |oe AS (SELECT max(d) AS obs_end FROM ed),
        |dur AS (SELECT CAST(user_id AS BIGINT) % 2 AS g,
        |          CASE WHEN pday IS NOT NULL THEN pday - day0
        |               ELSE obs_end - day0 END AS t,
        |          CASE WHEN pday IS NOT NULL THEN 1 ELSE 0 END AS ev
        |        FROM pu, oe),
        |bt AS (SELECT t,
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na_at,
        |    CAST(sum(CASE WHEN g = 0 THEN ev ELSE 0 END) AS BIGINT)
        |      AS da,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb_at,
        |    CAST(sum(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT)
        |      AS db
        |  FROM dur GROUP BY t),
        |r AS (SELECT t, da, db,
        |    CAST(sum(na_at) OVER (ORDER BY t DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nra,
        |    CAST(sum(nb_at) OVER (ORDER BY t DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nrb
        |  FROM bt),
        |ev AS (
        |  SELECT da, db, nra, nrb, nra + nrb AS nt, da + db AS dt
        |  FROM r WHERE da + db > 0),
        |g AS (
        |  SELECT da, db,
        |    CAST(round((CAST(da AS DOUBLE) - CAST(dt AS DOUBLE)
        |      * CAST(nra AS DOUBLE) / CAST(nt AS DOUBLE)) * 1.0e9)
        |      AS BIGINT) AS oe_g,
        |    CASE WHEN nt <= 1 THEN 0
        |      ELSE CAST(round(CAST(dt AS DOUBLE)
        |        * (CAST(nra AS DOUBLE) / CAST(nt AS DOUBLE))
        |        * (1.0 - CAST(nra AS DOUBLE) / CAST(nt AS DOUBLE))
        |        * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
        |        / (CAST(nt AS DOUBLE) - 1.0) * 1.0e9) AS BIGINT) END
        |      AS v_g
        |  FROM ev),
        |ag AS (SELECT CAST(sum(da) AS BIGINT) AS events_a,
        |    CAST(sum(db) AS BIGINT) AS events_b,
        |    CAST(sum(oe_g) AS BIGINT) AS oe2,
        |    CAST(sum(v_g) AS BIGINT) AS v2
        |  FROM g)
        |SELECT events_a, events_b,
        |  round(CASE WHEN CAST(v2 AS DOUBLE) <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(oe2 AS DOUBLE)
        |      / sqrt(CAST(v2 AS DOUBLE) * 1.0e9) END, 6) AS z_score
        |FROM ag""".stripMargin,
    // q329: the Mantel-Haenszel chain replayed — per-nation 2x2s,
    // sorted-fold rational reductions, crude OR alongside
    "q329_mantel_haenszel" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o.o_custkey,
        |    CAST(max(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x,
        |    CAST(max(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y,
        |    CAST(max(c.c_nationkey) AS BIGINT) AS g
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1),
        |st AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM per GROUP BY 1),
        |st2 AS (SELECT g, a, b, c, d, a + b + c + d AS n FROM st),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(d) AS BIGINT) AS sd,
        |    list_reduce(list(CASE WHEN n = 0 THEN 0.0
        |      ELSE CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |        / CAST(n AS DOUBLE) END ORDER BY g),
        |      (x, y) -> x + y) AS num,
        |    list_reduce(list(CASE WHEN n = 0 THEN 0.0
        |      ELSE CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |        / CAST(n AS DOUBLE) END ORDER BY g),
        |      (x, y) -> x + y) AS den
        |  FROM st2)
        |SELECT k AS k_strata,
        |  round(CASE WHEN den <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE num / den END, 6) AS or_mh,
        |  round(CASE WHEN sb = 0 OR sc = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(sa AS DOUBLE) * CAST(sd AS DOUBLE)
        |      / (CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE)) END, 6)
        |    AS or_crude
        |FROM ag""".stripMargin,
    // q330: the effect-size chain replayed — six conditional moments,
    // pooled SD, small-sample correction
    "q330_hedges_g" ->
      """WITH ag AS (
        |  SELECT
        |    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    sum(CASE WHEN g = 'R' THEN c ELSE 0 END) AS s1,
        |    sum(CASE WHEN g = 'N' THEN c ELSE 0 END) AS s2,
        |    sum(CASE WHEN g = 'R' THEN c * c ELSE 0 END) AS q1,
        |    sum(CASE WHEN g = 'N' THEN c * c ELSE 0 END) AS q2
        |  FROM (SELECT l_returnflag AS g,
        |          CAST(round(100.0 * l_extendedprice) AS BIGINT) AS c
        |        FROM lineitem
        |        WHERE l_returnflag IN ('R', 'N'))),
        |f AS (
        |  SELECT n1, n2,
        |    CASE WHEN n1 + n2 <= 2 OR n1 <= 0 OR n2 <= 0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |          * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |        + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
        |          * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) END
        |      AS sp2,
        |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d
        |  FROM ag),
        |h AS (
        |  SELECT n1, n2,
        |    CASE WHEN isnan(sp2) OR sp2 <= 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE (s1d / CAST(n1 AS DOUBLE) - s2d / CAST(n2 AS DOUBLE))
        |        / sqrt(sp2) END AS cd
        |  FROM f)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(cd, 6) AS cohens_d,
        |  round(cd * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE)
        |    + CAST(n2 AS DOUBLE)) - 9.0)), 6) AS hedges_g
        |FROM h""".stripMargin,
    // q331: the Poisson-rate chain replayed — cohort user/event
    // counts, conditional-binomial z
    "q331_poisson_rate" ->
      """WITH per AS (
        |  SELECT CAST(user_id AS BIGINT) % 2 AS g,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS u,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |ag AS (SELECT
        |    CAST(coalesce(max(CASE WHEN g = 0 THEN u END), 0)
        |      AS BIGINT) AS u1,
        |    CAST(coalesce(max(CASE WHEN g = 1 THEN u END), 0)
        |      AS BIGINT) AS u2,
        |    CAST(coalesce(max(CASE WHEN g = 0 THEN c END), 0)
        |      AS BIGINT) AS c1,
        |    CAST(coalesce(max(CASE WHEN g = 1 THEN c END), 0)
        |      AS BIGINT) AS c2
        |  FROM per),
        |f AS (SELECT u1, u2, c1, c2,
        |    CASE WHEN u1 + u2 <= 0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(u1 AS DOUBLE)
        |        / (CAST(u1 AS DOUBLE) + CAST(u2 AS DOUBLE)) END AS p
        |  FROM ag)
        |SELECT u1 AS users_a, u2 AS users_b,
        |  c1 AS events_a, c2 AS events_b,
        |  round(CASE WHEN u1 <= 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(c1 AS DOUBLE) / CAST(u1 AS DOUBLE) END, 6)
        |    AS rate_a,
        |  round(CASE WHEN u2 <= 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(c2 AS DOUBLE) / CAST(u2 AS DOUBLE) END, 6)
        |    AS rate_b,
        |  round(CASE WHEN c1 + c2 <= 0 OR u1 <= 0 OR u2 <= 0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(c1 AS DOUBLE) - (CAST(c1 AS DOUBLE)
        |        + CAST(c2 AS DOUBLE)) * p)
        |      / sqrt((CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE)) * p
        |        * (1.0 - p)) END, 6) AS z_score
        |FROM f""".stripMargin,
    // q332: the ICC chain replayed — q270 sums, unequal-n k0, one
    // mirrored ratio
    "q332_icc" ->
      """WITH per AS MATERIALIZED (
        |  SELECT CAST((datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) + 4) % 7 AS BIGINT) AS g,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS sg,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT)
        |      * CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS qg
        |  FROM orders GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS HUGEINT) AS s,
        |    CAST(sum(qg) AS HUGEINT) AS q,
        |    CAST(sum(CAST(ng AS HUGEINT) * ng) AS HUGEINT) AS sn2,
        |    list_reduce(list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE) ORDER BY g), (a, b) -> a + b) AS a
        |  FROM per),
        |f AS (SELECT k, n,
        |    CASE WHEN k <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |        / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) END
        |      AS msb,
        |    CASE WHEN n <= k THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(q AS DOUBLE) - a)
        |        / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) END AS msw,
        |    CASE WHEN k <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE)
        |        / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) END
        |      AS k0
        |  FROM ag),
        |g AS (SELECT k, n, msb, msw,
        |        msb + (k0 - 1.0) * msw AS den FROM f)
        |SELECT k AS k_groups, n AS n_rows,
        |  round(CASE WHEN isnan(msb) OR isnan(msw) OR isnan(den)
        |      OR den = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (msb - msw) / den END, 6) AS icc
        |FROM g""".stripMargin,
    // q333: the Cronbach chain replayed — per-item and row-sum exact
    // moments, sample variances, one mirrored alpha
    "q333_cronbach" ->
      """WITH b AS (
        |  SELECT CAST(round(100.0 * l_quantity) AS BIGINT) AS i0,
        |    CAST(round(100.0 * l_discount) AS BIGINT) AS i1,
        |    CAST(round(100.0 * l_tax) AS BIGINT) AS i2
        |  FROM lineitem),
        |b2 AS (SELECT i0, i1, i2, i0 + i1 + i2 AS x FROM b),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(i0) AS HUGEINT) AS s0,
        |    CAST(sum(CAST(i0 AS HUGEINT) * i0) AS HUGEINT) AS q0,
        |    CAST(sum(i1) AS HUGEINT) AS s1,
        |    CAST(sum(CAST(i1 AS HUGEINT) * i1) AS HUGEINT) AS q1,
        |    CAST(sum(i2) AS HUGEINT) AS s2,
        |    CAST(sum(CAST(i2 AS HUGEINT) * i2) AS HUGEINT) AS q2,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qx
        |  FROM b2),
        |f AS (SELECT n,
        |    CASE WHEN n <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE)
        |        * CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0) END
        |    + CASE WHEN n <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |        * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0) END
        |    + CASE WHEN n <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
        |        * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0) END AS vs,
        |    CASE WHEN n <= 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0) END AS vx
        |  FROM ag)
        |SELECT n AS n_rows, CAST(3 AS BIGINT) AS k_items,
        |  round(CASE WHEN n <= 1 OR vx <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE 3.0 / 2.0 * (1.0 - vs / vx) END, 6) AS alpha
        |FROM f""".stripMargin,
    // q334: the Bartels chain replayed — value-histogram midranks,
    // lag pairs over present days, x4-grid sums, documented z
    "q334_bartels_rvn" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |h AS (SELECT r AS v, CAST(count(*) AS BIGINT) AS t
        |      FROM daily GROUP BY 1),
        |rk AS (SELECT v,
        |    2 * coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2,
        |    t
        |  FROM h),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |den AS (SELECT max(n) AS n,
        |    CAST(sum(CAST(t AS HUGEINT) * (r2 - n - 1) * (r2 - n - 1))
        |      AS HUGEINT) AS den4
        |  FROM rk CROSS JOIN tot),
        |nm AS (SELECT CAST(sum(CAST(r2 - p2 AS HUGEINT) * (r2 - p2))
        |    AS HUGEINT) AS nm4
        |  FROM (SELECT rk.r2,
        |          lag(rk.r2) OVER (ORDER BY daily.d) AS p2
        |        FROM daily JOIN rk ON rk.v = daily.r)
        |  WHERE p2 IS NOT NULL),
        |f AS (SELECT n, den4, nm4,
        |    CASE WHEN n < 2 OR CAST(den4 AS DOUBLE) <= 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(nm4 AS DOUBLE) / CAST(den4 AS DOUBLE) END
        |      AS rvn
        |  FROM nm CROSS JOIN den)
        |SELECT n AS n_days, round(rvn, 6) AS rvn,
        |  round(CASE WHEN isnan(rvn) THEN CAST('NaN' AS DOUBLE)
        |    ELSE (rvn - 2.0) / sqrt(20.0
        |      / (5.0 * CAST(n AS DOUBLE) + 7.0)) END, 6) AS z_score
        |FROM f""".stripMargin,
    // q335: the Kendall-W chain replayed — the q327 rank machinery
    // with the concordance normalization
    "q335_kendall_w" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST((datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) + 4) % 7 AS BIGINT) AS blk,
        |    o_orderpriority AS trt,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS s
        |  FROM orders GROUP BY 1, 2),
        |ranked AS (
        |  SELECT c1.blk, c1.trt,
        |    CAST(2 * sum(CASE WHEN c2.s * c1.n < c1.s * c2.n
        |        THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN c2.s * c1.n = c1.s * c2.n
        |        THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r2
        |  FROM cells c1 JOIN cells c2 ON c2.blk = c1.blk
        |  GROUP BY 1, 2),
        |shape AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS b,
        |    CAST(count(DISTINCT trt) AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS ncells FROM cells),
        |rj AS (SELECT trt, CAST(sum(r2) AS BIGINT) AS rj2
        |       FROM ranked GROUP BY 1),
        |sr AS (SELECT CAST(sum(CAST(rj2 AS HUGEINT) * rj2) AS HUGEINT)
        |         AS sr2x4 FROM rj)
        |SELECT b AS n_blocks, k AS k_treatments,
        |  round(CASE WHEN k <= 1 OR ncells <> b * k
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (12.0 * (CAST(sr2x4 AS DOUBLE) / 4.0)
        |      - 3.0 * CAST(b AS DOUBLE) * CAST(b AS DOUBLE)
        |        * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
        |        * (CAST(k AS DOUBLE) + 1.0))
        |      / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)
        |        * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE)
        |          * CAST(k AS DOUBLE) - 1.0)) END, 6) AS kendall_w
        |FROM sr CROSS JOIN shape""".stripMargin,
    // q336: the split-half chain replayed — n-scaled exact Pearson
    // moments, Spearman-Brown step-up
    "q336_split_half" ->
      """WITH b AS (
        |  SELECT CAST(round(100.0 * l_quantity) AS BIGINT) AS xa,
        |    CAST(round(100.0 * (l_discount + l_tax)) AS BIGINT) AS xb
        |  FROM lineitem),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xa) AS HUGEINT) AS sx,
        |    CAST(sum(xb) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(xa AS HUGEINT) * xa) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(xb AS HUGEINT) * xb) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(xa AS HUGEINT) * xb) AS HUGEINT) AS sxy
        |  FROM b),
        |f AS (SELECT n,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy
        |  FROM ag),
        |g AS (SELECT n,
        |    CASE WHEN vx <= 0.0 OR vy <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE cxy / sqrt(vx * vy) END AS r
        |  FROM f)
        |SELECT n AS n_rows, round(r, 6) AS split_r,
        |  round(CASE WHEN isnan(r) OR r = -1.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE 2.0 * r / (1.0 + r) END, 6) AS spearman_brown
        |FROM g""".stripMargin,
    // q337: the Goldfeld-Quandt chain replayed — percentile cuts,
    // conditional regime moments, the q321 SSE shape, one F
    "q337_goldfeld_quandt" ->
      """WITH b AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(100.0 * l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |cuts AS (SELECT
        |    percentile_disc(0.3333) WITHIN GROUP (ORDER BY x) AS p33,
        |    percentile_disc(0.6667) WITHIN GROUP (ORDER BY x) AS p67
        |  FROM b),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN x <= p33 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN x >= p67 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(sum(CASE WHEN x <= p33 THEN x ELSE 0 END) AS HUGEINT)
        |      AS sx1,
        |    CAST(sum(CASE WHEN x >= p67 THEN x ELSE 0 END) AS HUGEINT)
        |      AS sx2,
        |    CAST(sum(CASE WHEN x <= p33 THEN x * x ELSE 0 END)
        |      AS HUGEINT) AS sxx1,
        |    CAST(sum(CASE WHEN x >= p67 THEN x * x ELSE 0 END)
        |      AS HUGEINT) AS sxx2,
        |    CAST(sum(CASE WHEN x <= p33 THEN y ELSE 0 END) AS HUGEINT)
        |      AS sy1,
        |    CAST(sum(CASE WHEN x >= p67 THEN y ELSE 0 END) AS HUGEINT)
        |      AS sy2,
        |    CAST(sum(CASE WHEN x <= p33 THEN x * y ELSE 0 END)
        |      AS HUGEINT) AS sxy1,
        |    CAST(sum(CASE WHEN x >= p67 THEN x * y ELSE 0 END)
        |      AS HUGEINT) AS sxy2,
        |    CAST(sum(CASE WHEN x <= p33 THEN y * y ELSE 0 END)
        |      AS HUGEINT) AS syy1,
        |    CAST(sum(CASE WHEN x >= p67 THEN y * y ELSE 0 END)
        |      AS HUGEINT) AS syy2
        |  FROM b CROSS JOIN cuts),
        |f AS (
        |  SELECT n1, n2,
        |    CASE WHEN CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
        |        - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) = 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(syy1 AS DOUBLE)
        |        - ((CAST(sy1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
        |            - CAST(sxy1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
        |          / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
        |            - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
        |          * CAST(sy1 AS DOUBLE)
        |        + (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
        |            - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
        |          / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
        |            - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
        |          * CAST(sxy1 AS DOUBLE)) END AS sse1,
        |    CASE WHEN CAST(n2 AS DOUBLE) * CAST(sxx2 AS DOUBLE)
        |        - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) = 0.0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(syy2 AS DOUBLE)
        |        - ((CAST(sy2 AS DOUBLE) * CAST(sxx2 AS DOUBLE)
        |            - CAST(sxy2 AS DOUBLE) * CAST(sx2 AS DOUBLE))
        |          / (CAST(n2 AS DOUBLE) * CAST(sxx2 AS DOUBLE)
        |            - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))
        |          * CAST(sy2 AS DOUBLE)
        |        + (CAST(n2 AS DOUBLE) * CAST(sxy2 AS DOUBLE)
        |            - CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE))
        |          / (CAST(n2 AS DOUBLE) * CAST(sxx2 AS DOUBLE)
        |            - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))
        |          * CAST(sxy2 AS DOUBLE)) END AS sse2
        |  FROM s)
        |SELECT n1 AS n_lo, n2 AS n_hi,
        |  round(CASE WHEN n1 <= 2 OR n2 <= 2 OR isnan(sse1)
        |      OR isnan(sse2) OR sse1 <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (sse2 / (CAST(n2 AS DOUBLE) - 2.0))
        |      / (sse1 / (CAST(n1 AS DOUBLE) - 2.0)) END, 6) AS gq_f
        |FROM f""".stripMargin,
    // q338: the Breusch-Pagan chain replayed — first-pass beta from
    // the q258 det shapes, cents-grid residual squares, aux R2, LM
    "q338_breusch_pagan" ->
      """WITH b AS MATERIALIZED (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
        |    CAST(round(100.0 * l_discount) AS BIGINT) AS x2,
        |    CAST(round(100.0 * l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1,
        |    CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
        |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
        |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
        |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y
        |  FROM b),
        |beta AS (SELECT
        |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12
        |      * s2y) + s2 * (s1y * s12 - s11 * s2y))
        |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12
        |        * s2) + s2 * (s1 * s12 - s11 * s2)) AS b0,
        |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2))
        |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12
        |        * s2) + s2 * (s1 * s12 - s11 * s2)) AS b1,
        |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2))
        |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12
        |        * s2) + s2 * (s1 * s12 - s11 * s2)) AS b2
        |  FROM m),
        |r AS (
        |  SELECT x1, x2,
        |    CAST(round(CAST(y AS DOUBLE) - (b0 + b1
        |      * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE)))
        |      AS BIGINT) AS u
        |  FROM b CROSS JOIN beta),
        |r2 AS (SELECT x1, x2, u * u AS u2 FROM r),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS nl,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1,
        |    CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
        |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
        |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
        |    CAST(sum(CAST(u2 AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x1 AS HUGEINT) * u2) AS DOUBLE) AS s1y,
        |    CAST(sum(CAST(x2 AS HUGEINT) * u2) AS DOUBLE) AS s2y,
        |    CAST(sum(CAST(u2 AS HUGEINT) * u2) AS DOUBLE) AS syy
        |  FROM r2),
        |f AS (
        |  SELECT nl, n, sy, s1y, s2y, syy,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12
        |      * s2y) + s2 * (s1y * s12 - s11 * s2y) AS bb0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2) AS bb1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS bb2,
        |    syy - sy * sy / n AS sst
        |  FROM a),
        |g AS (
        |  SELECT nl, n, sst,
        |    CASE WHEN det = 0.0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE syy - (bb0 / det * sy + bb1 / det * s1y
        |        + bb2 / det * s2y) END AS sse
        |  FROM f)
        |SELECT nl AS n_rows,
        |  round(CASE WHEN isnan(sse) OR sst <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE n * (1.0 - sse / sst) END, 6) AS bp_lm
        |FROM g""".stripMargin,
    // q339: the Page chain replayed — q327 rank machinery with the
    // score-weighted L and classical moments
    "q339_page_trend" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST((datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) + 4) % 7 AS BIGINT) AS blk,
        |    CAST(CAST(substr(o_orderpriority, 1, 1) AS INT)
        |      AS BIGINT) AS trt,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS HUGEINT) AS s
        |  FROM orders GROUP BY 1, 2),
        |ranked AS (
        |  SELECT c1.blk, c1.trt,
        |    CAST(2 * sum(CASE WHEN c2.s * c1.n < c1.s * c2.n
        |        THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN c2.s * c1.n = c1.s * c2.n
        |        THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r2
        |  FROM cells c1 JOIN cells c2 ON c2.blk = c1.blk
        |  GROUP BY 1, 2),
        |shape AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS b,
        |    CAST(count(DISTINCT trt) AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS ncells FROM cells),
        |rj AS (SELECT trt, CAST(sum(r2) AS BIGINT) AS rj2
        |       FROM ranked GROUP BY 1),
        |l AS (SELECT CAST(sum(CAST(trt AS HUGEINT) * rj2) AS HUGEINT)
        |        AS l2 FROM rj),
        |f AS (SELECT b, k, ncells, l2,
        |    CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
        |      * (CAST(k AS DOUBLE) + 1.0) * (CAST(k AS DOUBLE) + 1.0)
        |      / 4.0 AS ee,
        |    CAST(b AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
        |      * (CAST(k AS DOUBLE) + 1.0) * (CAST(k AS DOUBLE) + 1.0)
        |      * (CAST(k AS DOUBLE) - 1.0) / 144.0 AS vv
        |  FROM l CROSS JOIN shape)
        |SELECT b AS n_blocks, k AS k_treatments,
        |  round(CAST(l2 AS DOUBLE) / 2.0, 2) AS page_l,
        |  round(CASE WHEN k <= 1 OR ncells <> b * k OR vv <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(l2 AS DOUBLE) / 2.0 - ee) / sqrt(vv) END, 6)
        |    AS z_score
        |FROM f""".stripMargin,
    // q340: the Cochran-Q chain replayed — presence cells, row/column
    // exact totals, one mirrored ratio
    "q340_cochran_q" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey AS s,
        |    CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS j,
        |    CAST(max(1) AS BIGINT) AS x
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT CAST(count(*) AS BIGINT) AS nsubj,
        |    CAST(sum(ri) AS BIGINT) AS t,
        |    CAST(sum(CAST(ri AS HUGEINT) * ri) AS HUGEINT) AS r2
        |  FROM (SELECT s, CAST(sum(x) AS BIGINT) AS ri
        |        FROM per GROUP BY 1)),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT) AS c2
        |  FROM (SELECT j, CAST(sum(x) AS BIGINT) AS cj
        |        FROM per GROUP BY 1)),
        |f AS (SELECT nsubj, k,
        |    CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)
        |      * (CAST(c2 AS DOUBLE) - CAST(t AS DOUBLE)
        |        * CAST(t AS DOUBLE) / CAST(k AS DOUBLE)) AS num,
        |    CAST(k AS DOUBLE) * CAST(t AS DOUBLE)
        |      - CAST(r2 AS DOUBLE) AS den
        |  FROM r CROSS JOIN c)
        |SELECT nsubj AS n_subjects, k AS k_treatments,
        |  round(CASE WHEN den <= 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE num / den END, 6) AS cochran_q
        |FROM f""".stripMargin,
    // q341: the sign-test chain replayed — midpoint halves, paired
    // per-customer counts, continuity-corrected signed z
    "q341_sign_test" ->
      """WITH daily AS (SELECT o_custkey,
        |    datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS d
        |  FROM orders),
        |mid AS (SELECT CAST(floor((min(d) + max(d)) / 2) AS BIGINT)
        |          AS mid FROM daily),
        |per AS (SELECT o_custkey,
        |    CAST(sum(CASE WHEN d <= mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x,
        |    CAST(sum(CASE WHEN d > mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS y
        |  FROM daily CROSS JOIN mid GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y > x THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos,
        |    CAST(sum(CASE WHEN y < x THEN 1 ELSE 0 END) AS BIGINT)
        |      AS neg
        |  FROM per),
        |f AS (SELECT n, pos, neg, pos + neg AS m FROM ag)
        |SELECT n AS n_pairs, pos AS n_up, neg AS n_down,
        |  round(CASE WHEN m <= 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (abs(CAST(pos AS DOUBLE) - CAST(m AS DOUBLE) / 2.0)
        |        - 0.5)
        |      / sqrt(CAST(m AS DOUBLE) / 4.0)
        |      * CASE WHEN CAST(pos AS DOUBLE) >= CAST(m AS DOUBLE)
        |          / 2.0 THEN 1.0 ELSE -1.0 END END, 6) AS z_score
        |FROM f""".stripMargin,
    // q342: the two-proportion chain replayed — conditional counts,
    // pooled-variance z, mirrored Wilson intervals (z² literals)
    "q342_two_proportion" ->
      """WITH ag AS (
        |  SELECT
        |    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(sum(CASE WHEN g = 'R' THEN x ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN g = 'N' THEN x ELSE 0 END) AS BIGINT)
        |      AS c2
        |  FROM (SELECT l_returnflag AS g,
        |          CASE WHEN l_discount > 0.0 THEN 1 ELSE 0 END AS x
        |        FROM lineitem
        |        WHERE l_returnflag IN ('R', 'N'))),
        |f AS (
        |  SELECT n1, n2,
        |    CASE WHEN n1 <= 0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS p1,
        |    CASE WHEN n2 <= 0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) END AS p2,
        |    CASE WHEN n1 + n2 <= 0 THEN CAST('NaN' AS DOUBLE)
        |      ELSE (CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE))
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) END AS pp,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
        |  FROM ag),
        |g AS (
        |  SELECT n1, n2, p1, p2, n1d, n2d,
        |    pp * (1.0 - pp) * (1.0 / n1d + 1.0 / n2d) AS se2
        |  FROM f)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(p1, 6) AS p_a, round(p2, 6) AS p_b,
        |  round(CASE WHEN isnan(se2) OR se2 <= 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE (p1 - p2) / sqrt(se2) END, 6) AS z_score,
        |  round(((p1 + 1.9208 / n1d) - 1.96
        |    * sqrt(p1 * (1.0 - p1) / n1d + 0.9604 / (n1d * n1d)))
        |    / (1.0 + 3.8416 / n1d), 6) AS wilson_lo_a,
        |  round(((p1 + 1.9208 / n1d) + 1.96
        |    * sqrt(p1 * (1.0 - p1) / n1d + 0.9604 / (n1d * n1d)))
        |    / (1.0 + 3.8416 / n1d), 6) AS wilson_hi_a,
        |  round(((p2 + 1.9208 / n2d) - 1.96
        |    * sqrt(p2 * (1.0 - p2) / n2d + 0.9604 / (n2d * n2d)))
        |    / (1.0 + 3.8416 / n2d), 6) AS wilson_lo_b,
        |  round(((p2 + 1.9208 / n2d) + 1.96
        |    * sqrt(p2 * (1.0 - p2) / n2d + 0.9604 / (n2d * n2d)))
        |    / (1.0 + 3.8416 / n2d), 6) AS wilson_hi_b
        |FROM g""".stripMargin,
    // q343: the q263 chain on the dyadic lag ladder — same daily
    // aggregate, same slope divide, lag list mirrored as literals
    "q343_theil_sen_ladder" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |sl AS MATERIALIZED (
        |  SELECT CAST(b.r - a.r AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
        |    AS slope
        |  FROM daily a
        |  CROSS JOIN (SELECT CAST(unnest([1, 2, 4, 8, 16, 32, 64, 128,
        |    256, 512, 1024, 2048, 4096]) AS BIGINT) AS lag) l
        |  JOIN daily b ON b.d = a.d + l.lag)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope), 6)
        |    AS sen_slope_cents_per_day
        |FROM sl""".stripMargin,
    // q344: the bootstrap chain replayed — q205 hash uniform, the
    // Poisson(1) inverse-CDF ladder (10 dp literals), exact weighted
    // cent sums, percentile_disc over unrounded replicate means
    "q344_bootstrap_ci" ->
      """WITH base AS MATERIALIZED (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(100.0 * o_totalprice) AS BIGINT) AS x
        |  FROM orders),
        |reps AS MATERIALIZED (
        |  SELECT b,
        |    CASE WHEN u < 0.3678794412 THEN 0
        |         WHEN u < 0.7357588823 THEN 1
        |         WHEN u < 0.9196986029 THEN 2
        |         WHEN u < 0.9810118431 THEN 3
        |         ELSE 4 END AS w, x
        |  FROM (
        |    SELECT bb.b, base.x,
        |      CAST(((((base.k * 67 + bb.b) % 1000003) * 2654435761)
        |          >> 16) % 1048576 + 1 AS DOUBLE) / 1048577.0 AS u
        |    FROM base
        |    CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS BIGINT)
        |                  AS b) bb)),
        |m AS (
        |  SELECT b,
        |    CASE WHEN CAST(sum(w) AS BIGINT) <= 0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(CAST(sum(w * x) AS BIGINT) AS DOUBLE)
        |        / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) END AS m
        |  FROM reps GROUP BY b),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS b_reps,
        |    round(percentile_disc(0.025) WITHIN GROUP (ORDER BY m), 6)
        |      AS ci_lo_cents,
        |    round(percentile_disc(0.975) WITHIN GROUP (ORDER BY m), 6)
        |      AS ci_hi_cents
        |  FROM m),
        |ov AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(sum(x) AS BIGINT) AS sx
        |       FROM base)
        |SELECT b_reps, n_rows,
        |  round(CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS mean_cents,
        |  ci_lo_cents, ci_hi_cents
        |FROM ag, ov""".stripMargin,
    // q345: the randomization chain replayed — hash-parity sides,
    // exact conditional cent sums, one double divide per permutation,
    // add-one p on an engine-identical >= boundary
    "q345_permutation_test" ->
      """WITH base AS MATERIALIZED (
        |  SELECT CAST(l_orderkey AS BIGINT) * 10
        |      + CAST(l_linenumber AS BIGINT) AS k,
        |    l_returnflag AS g,
        |    CAST(round(100.0 * l_extendedprice) AS BIGINT) AS x
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |obs AS (
        |  SELECT
        |    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CASE WHEN sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) <= 0
        |           OR sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) <= 0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(CAST(sum(CASE WHEN g = 'R' THEN x ELSE 0 END)
        |          AS BIGINT) AS DOUBLE)
        |        / CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END)
        |          AS DOUBLE)
        |      - CAST(CAST(sum(CASE WHEN g = 'N' THEN x ELSE 0 END)
        |          AS BIGINT) AS DOUBLE)
        |        / CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END)
        |          AS DOUBLE) END AS obs_diff
        |  FROM base),
        |pm AS MATERIALIZED (
        |  SELECT ss.s,
        |    ((((base.k * 131 + ss.s) % 1000003) * 2654435761)
        |      >> 16) % 2 AS p,
        |    base.x
        |  FROM base
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 101)) AS BIGINT)
        |                AS s) ss),
        |d AS (
        |  SELECT s,
        |    CASE WHEN sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) <= 0
        |           OR sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) <= 0
        |      THEN CAST('NaN' AS DOUBLE)
        |      ELSE CAST(CAST(sum(CASE WHEN p = 1 THEN x ELSE 0 END)
        |          AS BIGINT) AS DOUBLE)
        |        / CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END)
        |          AS DOUBLE)
        |      - CAST(CAST(sum(CASE WHEN p = 0 THEN x ELSE 0 END)
        |          AS BIGINT) AS DOUBLE)
        |        / CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END)
        |          AS DOUBLE) END AS diff
        |  FROM pm GROUP BY s)
        |SELECT obs.n_a, obs.n_b,
        |  round(obs.obs_diff, 6) AS obs_diff_cents,
        |  CAST(count(*) AS BIGINT) AS n_perms,
        |  round(CAST(1 + sum(CASE WHEN abs(diff) >= abs(obs.obs_diff)
        |      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) + 1 AS DOUBLE), 6) AS p_value
        |FROM d, obs
        |GROUP BY obs.n_a, obs.n_b, obs.obs_diff""".stripMargin,
    // q254: three unrolled IRLS rounds on the customer table
    "q254_logit" -> logitOracleSql(rounds = 3),
    // q256: the same unroll + grid-score histogram + tie-aware exact
    // AUC numerator
    "q256_logit_auc" -> logitOracleSql(rounds = 3, auc = true),
    // q257: the same unroll + suffix-cumulative PR table
    "q257_pr_curve" -> logitOracleSql(rounds = 3, pr = true),
    // q259: the ACF chain replayed — day aggregate, r·n − S integer
    // deviations, HUGEINT products, one mirrored divide per lag
    "q259_revenue_acf" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(r) AS BIGINT) AS s FROM daily),
        |dev AS MATERIALIZED (
        |  SELECT d, r * t.n - t.s AS dv FROM daily CROSS JOIN tot t),
        |c0 AS (SELECT CAST(sum(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT))
        |         AS DOUBLE) AS c0
        |       FROM dev),
        |pairs AS (
        |  SELECT l.lag AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CAST(a.dv AS HUGEINT) * CAST(b.dv AS HUGEINT))
        |      AS DOUBLE) AS ck
        |  FROM dev a
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag) l
        |  JOIN dev b ON b.d = a.d - l.lag
        |  GROUP BY 1)
        |SELECT p.lag, p.n_pairs, round(p.ck / c0.c0, 6) AS acf
        |FROM pairs p CROSS JOIN c0 WHERE c0.c0 > 0.0""".stripMargin,
    // q260: the seasonality chain replayed — integer dow arithmetic,
    // cross-multiplied exact ratio, one mirrored divide
    "q260_dow_seasonality" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |dw AS (SELECT (d + 4) % 7 AS dow, r FROM daily),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |               CAST(sum(r) AS BIGINT) AS s_all FROM dw)
        |SELECT CAST(dow AS BIGINT) AS dow,
        |  CAST(count(*) AS BIGINT) AS n_dow,
        |  round((CAST(sum(r) AS DOUBLE) * CAST(t.n_days AS DOUBLE))
        |    / (CAST(t.s_all AS DOUBLE) * CAST(count(*) AS DOUBLE)), 6)
        |    AS seasonal_index
        |FROM dw CROSS JOIN tot t
        |GROUP BY dow, t.n_days, t.s_all""".stripMargin,
    // q261: the burstiness chain replayed — exact per-word Σc/Σc²,
    // mirrored VMR doubles, windowless top-k on (vmr DESC, word)
    "q261_burstiness" ->
      """WITH counts AS MATERIALIZED (
        |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> '' GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |st AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(sum(c * c) AS BIGINT) AS sc2
        |  FROM counts GROUP BY 1 HAVING count(*) >= 5),
        |vm AS (
        |  SELECT w, df, sc,
        |    ((CAST(sc2 AS DOUBLE)
        |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |        / CAST(t.n AS DOUBLE))
        |     / (CAST(t.n AS DOUBLE) - 1.0))
        |    / (CAST(sc AS DOUBLE) / CAST(t.n AS DOUBLE)) AS vmr
        |  FROM st CROSS JOIN nd t),
        |tk AS (SELECT w, df, sc, vmr,
        |         CAST(row_number() OVER (ORDER BY vmr DESC, w)
        |           AS BIGINT) AS rank
        |       FROM vm QUALIFY rank <= 20)
        |SELECT w AS word, df AS n_docs_with, sc AS n_occurrences,
        |  round(vmr, 6) AS vmr, CAST(rank AS INTEGER) AS rank
        |FROM tk""".stripMargin,
    // q262: exact vocab/hapax counts, one mirrored divide
    "q262_hapax_ratio" ->
      """WITH wc AS MATERIALIZED (
        |  SELECT source, w, count(*) AS f FROM (
        |    SELECT source, unnest(string_split(
        |      regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |      AS w
        |    FROM documents)
        |  WHERE w <> '' GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hapax,
        |  round(CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
        |FROM wc GROUP BY 1""".stripMargin,
    // q268: the q55 recursive-CTE labels rolled up to a size
    // histogram, singletons as the size-1 row
    "q268_dup_cluster_sizes" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) - 2, 1) + 1),
        |      i -> array_to_string(string_split(regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')[i:i+2], ' '))) AS g
        |  FROM documents),
        |p AS (
        |  SELECT t.a, t.b FROM (
        |    SELECT a.doc_id AS a, b.doc_id AS b,
        |           len(list_intersect(a.g, b.g)) / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) AS j
        |    FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id) t
        |  WHERE t.j >= 0.5),
        |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach(id, lab) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.id),
        |cl AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
        |szs AS (SELECT cluster_id, count(*) AS sz FROM cl GROUP BY 1),
        |h AS (SELECT CAST(sz AS BIGINT) AS cluster_size,
        |        CAST(count(*) AS BIGINT) AS n_clusters
        |      FROM szs GROUP BY 1)
        |SELECT cluster_size, n_clusters FROM h
        |UNION ALL
        |SELECT CAST(1 AS BIGINT),
        |  CAST((SELECT count(*) FROM documents)
        |    - (SELECT count(*) FROM cl) AS BIGINT)""".stripMargin,
    // q266: each edge mirrored — distinct-key counts, full outer
    // join, the same four guarded sums
    "q266_ref_integrity" -> Seq(
      ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      ("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("orders.custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("customer.nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      ("supplier.nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      ("nation.regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey")).map { case (nm, ct, ck, pt, pk) =>
      s"""SELECT '$nm' AS fk_edge,
         |  CAST(sum(COALESCE(c.cn, 0)) AS BIGINT) AS n_child_rows,
         |  CAST(sum(CASE WHEN p.pn IS NULL THEN COALESCE(c.cn, 0)
         |    ELSE 0 END) AS BIGINT) AS n_orphan_rows,
         |  CAST(sum(CASE WHEN p.pn IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_parent_keys,
         |  CAST(sum(CASE WHEN c.cn IS NULL AND p.pn IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unreferenced_parents
         |FROM (SELECT CAST($ck AS BIGINT) AS k, count(*) AS cn
         |      FROM $ct GROUP BY 1) c
         |FULL OUTER JOIN (SELECT CAST($pk AS BIGINT) AS k,
         |      count(*) AS pn FROM $pt GROUP BY 1) p
         |  ON p.k = c.k""".stripMargin
    }.mkString("", "\nUNION ALL\n", ""),
    // q267: the basket-lift chain replayed — distinct (order, brand)
    // items, self-join pairs, integer cross-product lift, top-k on
    // (lift DESC, a, b)
    "q267_basket_lift" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |no AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n
        |       FROM items),
        |ic AS MATERIALIZED (
        |  SELECT item, CAST(count(*) AS BIGINT) AS c FROM items
        |  GROUP BY 1),
        |pr AS MATERIALIZED (
        |  SELECT a.item AS a, b.item AS b,
        |    CAST(count(*) AS BIGINT) AS cab
        |  FROM items a JOIN items b
        |    ON a.okey = b.okey AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |sc AS (
        |  SELECT pr.a, pr.b, pr.cab, ia.c AS ca, ib.c AS cb,
        |    (CAST(no.n AS DOUBLE) * CAST(pr.cab AS DOUBLE))
        |      / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE)) AS lift
        |  FROM pr JOIN ic ia ON ia.item = pr.a
        |  JOIN ic ib ON ib.item = pr.b CROSS JOIN no),
        |tk AS (SELECT a, b, cab, ca, cb, lift,
        |         CAST(row_number() OVER (ORDER BY lift DESC, a, b)
        |           AS BIGINT) AS rank
        |       FROM sc QUALIFY rank <= 20)
        |SELECT a AS item_a, b AS item_b, cab AS n_both, ca AS n_a,
        |  cb AS n_b, round(lift, 6) AS lift, CAST(rank AS INTEGER)
        |  AS rank
        |FROM tk""".stripMargin,
    // q263: the Theil-Sen chain replayed — day aggregate, lag-join
    // pair set, mirrored slope divide, percentile_disc median
    "q263_theil_sen" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |sl AS MATERIALIZED (
        |  SELECT CAST(b.r - a.r AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
        |    AS slope
        |  FROM daily a
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 4001)) AS BIGINT)
        |              AS lag) l
        |  JOIN daily b ON b.d = a.d + l.lag)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope), 6)
        |    AS sen_slope_cents_per_day
        |FROM sl""".stripMargin,
    // q264: the Gini chain replayed — rank over (x, custkey), exact
    // i·x sums, the 2·Σix − (n+1)·Σx over n·Σx mirrored divide
    "q264_gini" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |rk AS (SELECT x,
        |         CAST(row_number() OVER (ORDER BY x, o_custkey)
        |           AS BIGINT) AS i
        |       FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  round((2.0 * CAST(sum(i * x) AS DOUBLE)
        |    - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(x) AS DOUBLE))
        |    / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE)), 6)
        |    AS gini
        |FROM rk""".stripMargin,
    // q265: the Benford chain replayed — first digit of the integer
    // cents string, mirrored share divides, log10 expectations
    "q265_benford" ->
      """WITH dg AS MATERIALIZED (
        |  SELECT TRY_CAST(substr(CAST(CAST(round(100.0 * o_totalprice)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |h AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
        |      FROM dg WHERE digit >= 1 GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM h)
        |SELECT digit, n_obs,
        |  round(CAST(n_obs AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
        |    AS p_obs,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
        |    AS p_benford
        |FROM h CROSS JOIN t""".stripMargin,
    // q258: per-group exact sums, the same fixed Cramer shape as
    // q250 in SQL expressions, R2 from the identity SSE = syy - b'X'y
    "q258_grouped_ols" ->
      """WITH d AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
        |    CAST(year(CAST(o.o_orderdate AS DATE)) - 1990 AS BIGINT)
        |      AS x1,
        |    CAST(round(c.c_acctbal / 1000.0) AS BIGINT) AS x2,
        |    CAST(round(100.0 * o.o_totalprice) AS BIGINT) AS y
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |s AS MATERIALIZED (
        |  SELECT nation, CAST(count(*) AS BIGINT) AS nl,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1,
        |    CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x1 * x1) AS DOUBLE) AS s11,
        |    CAST(sum(x1 * x2) AS DOUBLE) AS s12,
        |    CAST(sum(x2 * x2) AS DOUBLE) AS s22,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x1 * y) AS DOUBLE) AS s1y,
        |    CAST(sum(x2 * y) AS DOUBLE) AS s2y,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM d GROUP BY 1),
        |f AS (
        |  SELECT nation, nl,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2) AS det1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS det2,
        |    syy - sy * sy / n AS sst, sy, s1y, s2y, syy
        |  FROM s)
        |SELECT nation, nl AS n_rows,
        |  round(det0 / det, 6) AS b0,
        |  round(det1 / det, 6) AS b1,
        |  round(det2 / det, 6) AS b2,
        |  round(1.0 - (syy - ((det0 / det) * sy + (det1 / det) * s1y
        |    + (det2 / det) * s2y)) / sst, 6) AS r2
        |FROM f WHERE det <> 0.0 AND sst > 0.0""".stripMargin,
    // q255: the silhouette chain replayed — 1e-4 grid vectors, exact
    // BIGINT ||n·x − S||² numerators, mirrored divides, micro-grid s
    "q255_silhouette" ->
      """WITH qv AS MATERIALIZED (
        |  SELECT vec_id, CAST(label AS BIGINT) AS own, i AS dim,
        |    CAST(floor(CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE)
        |      * 10000.0 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        |ce AS MATERIALIZED (
        |  SELECT own AS lc, dim, CAST(count(*) AS BIGINT) AS nc,
        |    CAST(sum(qx) AS BIGINT) AS sc
        |  FROM qv GROUP BY 1, 2),
        |d2 AS MATERIALIZED (
        |  SELECT qv.vec_id, qv.own, ce.lc,
        |    CAST(sum((qv.qx * ce.nc - ce.sc) * (qv.qx * ce.nc - ce.sc))
        |      AS BIGINT) AS num,
        |    max(ce.nc) AS nc
        |  FROM qv JOIN ce ON ce.dim = qv.dim
        |  GROUP BY 1, 2, 3),
        |dd AS (SELECT vec_id, own, lc,
        |    CAST(num AS DOUBLE) / CAST(nc * nc AS DOUBLE) AS d
        |  FROM d2),
        |pv AS (
        |  SELECT vec_id, own,
        |    max(CASE WHEN lc = own THEN d END) AS da,
        |    min(CASE WHEN lc <> own THEN d END) AS db
        |  FROM dd GROUP BY 1, 2),
        |sm AS (SELECT own,
        |    CAST(round(1000000.0 * (db - da) / greatest(da, db))
        |      AS BIGINT) AS sm
        |  FROM pv)
        |SELECT own AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(CAST(sum(sm) AS DOUBLE)
        |    / (1000000.0 * CAST(count(*) AS DOUBLE)), 6)
        |    AS mean_silhouette
        |FROM sm GROUP BY 1""".stripMargin,
    // q252: the q250 chain with + 1e6 on the s11/s22 diagonal (added
    // AFTER the double cast, mirroring the engine)
    "q252_ridge_price" ->
      """WITH d AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
        |    CAST(round(100.0 * l_discount) AS BIGINT) AS x2,
        |    CAST(round(100.0 * l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nl,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1,
        |    CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x1 * x1) AS DOUBLE) + 1000000.0 AS s11,
        |    CAST(sum(x1 * x2) AS DOUBLE) AS s12,
        |    CAST(sum(x2 * x2) AS DOUBLE) + 1000000.0 AS s22,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x1 * y) AS DOUBLE) AS s1y,
        |    CAST(sum(x2 * y) AS DOUBLE) AS s2y
        |  FROM d),
        |dets AS (
        |  SELECT nl,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2) AS det1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM s)
        |SELECT nl AS n_rows, round(det0 / det, 6) AS b0,
        |  round(det1 / det, 6) AS b1, round(det2 / det, 6) AS b2
        |FROM dets""".stripMargin,
    // q253: the RFM chain replayed — per-customer rollup, twelve
    // discrete-percentile boundaries, strict-greater scoring
    "q253_rfm_segments" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_custkey AS c_custkey,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS recency_day,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT
        |    percentile_disc(0.2) WITHIN GROUP (ORDER BY CAST(recency_day AS DOUBLE)) AS r_q20,
        |    percentile_disc(0.4) WITHIN GROUP (ORDER BY CAST(recency_day AS DOUBLE)) AS r_q40,
        |    percentile_disc(0.6) WITHIN GROUP (ORDER BY CAST(recency_day AS DOUBLE)) AS r_q60,
        |    percentile_disc(0.8) WITHIN GROUP (ORDER BY CAST(recency_day AS DOUBLE)) AS r_q80,
        |    percentile_disc(0.2) WITHIN GROUP (ORDER BY CAST(frequency AS DOUBLE)) AS f_q20,
        |    percentile_disc(0.4) WITHIN GROUP (ORDER BY CAST(frequency AS DOUBLE)) AS f_q40,
        |    percentile_disc(0.6) WITHIN GROUP (ORDER BY CAST(frequency AS DOUBLE)) AS f_q60,
        |    percentile_disc(0.8) WITHIN GROUP (ORDER BY CAST(frequency AS DOUBLE)) AS f_q80,
        |    percentile_disc(0.2) WITHIN GROUP (ORDER BY CAST(monetary_cents AS DOUBLE)) AS m_q20,
        |    percentile_disc(0.4) WITHIN GROUP (ORDER BY CAST(monetary_cents AS DOUBLE)) AS m_q40,
        |    percentile_disc(0.6) WITHIN GROUP (ORDER BY CAST(monetary_cents AS DOUBLE)) AS m_q60,
        |    percentile_disc(0.8) WITHIN GROUP (ORDER BY CAST(monetary_cents AS DOUBLE)) AS m_q80
        |  FROM per),
        |sc AS (
        |  SELECT p.c_custkey, p.recency_day, p.frequency, p.monetary_cents,
        |    1 + (CASE WHEN CAST(p.recency_day AS DOUBLE) > b.r_q20 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.recency_day AS DOUBLE) > b.r_q40 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.recency_day AS DOUBLE) > b.r_q60 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.recency_day AS DOUBLE) > b.r_q80 THEN 1 ELSE 0 END) AS r_score,
        |    1 + (CASE WHEN CAST(p.frequency AS DOUBLE) > b.f_q20 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.frequency AS DOUBLE) > b.f_q40 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.frequency AS DOUBLE) > b.f_q60 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.frequency AS DOUBLE) > b.f_q80 THEN 1 ELSE 0 END) AS f_score,
        |    1 + (CASE WHEN CAST(p.monetary_cents AS DOUBLE) > b.m_q20 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.monetary_cents AS DOUBLE) > b.m_q40 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.monetary_cents AS DOUBLE) > b.m_q60 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(p.monetary_cents AS DOUBLE) > b.m_q80 THEN 1 ELSE 0 END) AS m_score
        |  FROM per p CROSS JOIN b)
        |SELECT c_custkey, recency_day, frequency, monetary_cents,
        |  CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
        |FROM sc""".stripMargin,
    // q251: the deletion-neighborhood chain replayed — the oracle
    // builds the same {self} ∪ {single deletions} key set, joins, and
    // verifies with DuckDB's levenshtein
    "q251_fuzzy_join" ->
      """WITH ks AS MATERIALIZED (
        |  SELECT c_custkey AS id, c_name AS name,
        |    unnest(list_prepend(c_name,
        |      list_transform(range(1, len(c_name) + 1),
        |        i -> substr(c_name, 1, CAST(i AS INTEGER) - 1)
        |             || substr(c_name, CAST(i AS INTEGER) + 1)))) AS k
        |  FROM customer),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.name AS name_a, b.name AS name_b
        |  FROM ks a JOIN ks b ON a.k = b.k AND a.id < b.id)
        |SELECT id_a, id_b,
        |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM cand
        |WHERE levenshtein(name_a, name_b) <= 1""".stripMargin,
    // q244: q217's sig CTE as the output — the aggregate's exploded
    // signature must equal the row-explosion build slot for slot
    "q244_minhash_agg" ->
      """WITH toks AS (
        |  SELECT source AS src, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS word
        |  FROM documents),
        |w AS MATERIALIZED (SELECT DISTINCT src, word FROM toks
        |                   WHERE word <> ''),
        |ph AS MATERIALIZED (
        |  SELECT src, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(word, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS p
        |  FROM w),
        |idx AS (SELECT CAST(unnest(generate_series(0, 63)) AS BIGINT) AS i)
        |SELECT src, i,
        |  CAST(min(((p + i) * 2654435761) % 1000000007) AS BIGINT) AS mh
        |FROM ph CROSS JOIN idx GROUP BY src, i""".stripMargin,

    // q210: class x value grid completed by cross join, per-term
    // micro-grid probabilities (the engine's overflow-safe estimator)
    "q210_tcloseness" ->
      """WITH c AS MATERIALIZED (
        |  SELECT c_nationkey AS nat,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b1k,
        |    c_mktsegment AS sens
        |  FROM customer),
        |cv AS MATERIALIZED (SELECT nat, b1k, sens, count(*) AS n_cs
        |                    FROM c GROUP BY 1, 2, 3),
        |cls AS (SELECT nat, b1k, CAST(sum(n_cs) AS BIGINT) AS n_c
        |        FROM cv GROUP BY 1, 2),
        |g AS (SELECT sens, CAST(sum(n_cs) AS BIGINT) AS n_s
        |      FROM cv GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total FROM g),
        |grid AS (SELECT cls.nat, cls.b1k, cls.n_c, g.sens, g.n_s,
        |           COALESCE(cv.n_cs, 0) AS n_cs
        |         FROM cls CROSS JOIN g
        |         LEFT JOIN cv ON cv.nat = cls.nat AND cv.b1k = cls.b1k
        |           AND cv.sens = g.sens),
        |term AS (SELECT nat, b1k, n_c,
        |           abs((n_cs * 1000000) // n_c -
        |               (n_s * 1000000) // (SELECT n_total FROM tot))
        |             AS tm
        |         FROM grid)
        |SELECT nat, b1k, CAST(min(n_c) AS BIGINT) AS k_class,
        |  CAST(sum(tm) // 2 AS BIGINT) AS tvd_micros,
        |  CASE WHEN CAST(sum(tm) // 2 AS BIGINT) <= 300000 THEN 1 ELSE 0
        |    END AS close
        |FROM term GROUP BY 1, 2""".stripMargin,
    // q211: the q14 stopword counters, confidence = winner share on
    // the micro grid, decile buckets, per-bucket reliability terms
    "q211_calibration" ->
      """WITH h AS (SELECT lang,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS h_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|eine|zu|den)\b')) AS h_de,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|des|du|que|pas)\b')) AS h_fr,
        |  len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|del|que|por|con|para)\b')) AS h_es
        |  FROM documents),
        |p AS (SELECT lang,
        |  CASE WHEN greatest(h_en, h_de, h_fr, h_es) <= 0 THEN 'und'
        |       WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
        |       WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
        |       WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
        |       ELSE 'es' END AS pred,
        |  greatest(h_en, h_de, h_fr, h_es) AS mx,
        |  ((h_en + h_de) + h_fr) + h_es AS tot FROM h),
        |f AS (SELECT lang, pred, (mx * 1000000) // (tot + 4) AS conf
        |      FROM p WHERE tot > 0),
        |b AS (SELECT least(conf // 100000, 9) AS bucket, conf,
        |        CASE WHEN pred = lang THEN 1 ELSE 0 END AS ok
        |      FROM f)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(conf) // count(*) AS BIGINT) AS mean_conf_micros,
        |  CAST((sum(ok) * 1000000) // count(*) AS BIGINT) AS acc_micros,
        |  CAST(abs(sum(conf) // count(*) -
        |           (sum(ok) * 1000000) // count(*)) AS BIGINT)
        |    AS gap_micros
        |FROM b GROUP BY bucket""".stripMargin,
    // q212: cross-multiplied cumulative-share classes over the part
    // dimension
    "q212_pareto_parts" ->
      """WITH pp AS MATERIALIZED (
        |  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS qty
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(qty) AS BIGINT) AS tot FROM pp),
        |r AS (SELECT l_partkey, qty,
        |        sum(qty) OVER (ORDER BY qty DESC, l_partkey
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM pp),
        |c AS (SELECT qty,
        |        CASE WHEN cum * 10 <= tot * 7 THEN 'A'
        |             WHEN cum * 10 <= tot * 9 THEN 'B'
        |             ELSE 'C' END AS abc_class, tot
        |      FROM r, tot)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(qty) AS BIGINT) AS class_qty,
        |  CAST((sum(qty) * 1000000) // min(tot) AS BIGINT) AS share_micros
        |FROM c GROUP BY abc_class""".stripMargin,
    // q213: q34's sessions -> per-day segments -> +1/-1 sweep,
    // +1-before--1 at equal instants (touching intervals ARE concurrent)
    "q213_peak_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |sx AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b),
        |ses AS MATERIALIZED (
        |  SELECT epoch_us(min(ts)) AS ss, epoch_us(max(ts)) AS se
        |  FROM sx GROUP BY user_id, sid),
        |seg AS (SELECT d, greatest(ss, d * 86400000000) AS s2,
        |          least(se, d * 86400000000 + 86399999999) AS e2
        |        FROM (SELECT ss, se,
        |                unnest(generate_series(ss // 86400000000,
        |                                       se // 86400000000)) AS d
        |              FROM ses)),
        |pts AS (SELECT d, s2 AS t, 1 AS delta FROM seg
        |        UNION ALL
        |        SELECT d, e2, -1 FROM seg),
        |run AS (SELECT d, sum(delta) OVER (PARTITION BY d
        |          ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS r
        |        FROM pts)
        |SELECT d AS epoch_day, CAST(max(r) AS BIGINT) AS peak_concurrent,
        |  CAST(count(*) // 2 AS BIGINT) AS n_active
        |FROM run GROUP BY d""".stripMargin,
    // q214: the oracle replays the fixed-grid dHash with integer ops on
    // the hex-decoded payload (the q16 byte-decode device) and runs the
    // PLAIN all-pairs Hamming scan the banded engine join must equal
    // exactly (pigeonhole: distance <= 2 pairs share one of 3 chunks).
    "q214_dhash_neardups" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, 23) || '~' || substr(text, 25)
        |  FROM documents WHERE doc_id % 10 = 0),
        |enc AS (SELECT doc_id, encode(text) AS p FROM corpus),
        |m AS (SELECT doc_id, octet_length(p) AS n, hex(p) AS hx FROM enc),
        |cells AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), j ->
        |      CASE WHEN ((j+1)*n)//64 > (j*n)//64 THEN
        |        list_sum(list_transform(range((j*n)//64 + 1, ((j+1)*n)//64 + 1),
        |          i -> (strpos('0123456789ABCDEF', hx[2*i-1]) - 1) * 16
        |             + (strpos('0123456789ABCDEF', hx[2*i]) - 1)))
        |        // (((j+1)*n)//64 - (j*n)//64)
        |      ELSE 0 END) AS c
        |  FROM m),
        |h AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 63),
        |      k -> CASE WHEN c[k+2] > c[k+1]
        |                THEN (1::BIGINT << CAST(k AS INTEGER)) ELSE 0 END))
        |      AS BIGINT) AS dh
        |  FROM cells)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dh, b.dh)) <= 2""".stripMargin,
    // q215: four unrolled EM rounds (seed + three prunes at 12/8/5),
    // every round's usage table unioned with its round number
    "q215_unigram_em" ->
      unigramRoundsSql(maxWordLen = 16, maxPieceLen = 4,
        keeps = Seq(12, 8, 5), perRound = true),
    // q216: the same frequency-group arithmetic — the crossing group is
    // the unique one with needed in (cm - mass, cm]; the partial word
    // count is one ceil division on the cross-multiplied needed mass
    "q216_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS word
        |  FROM documents),
        |hist AS (SELECT word, count(*) AS cnt FROM toks
        |         WHERE word <> '' GROUP BY word),
        |freqs AS (SELECT cnt AS f, count(*) AS nw, cnt * count(*) AS mass
        |          FROM hist GROUP BY cnt),
        |cum AS (SELECT f, nw, mass,
        |          sum(nw) OVER (ORDER BY f DESC) AS cw,
        |          sum(mass) OVER (ORDER BY f DESC) AS cm
        |        FROM freqs),
        |tot AS (SELECT sum(mass) AS total FROM freqs),
        |need AS (SELECT CAST(pct AS BIGINT) AS pct,
        |           (pct * total + 99) // 100 AS needed, total
        |         FROM (SELECT unnest([50, 90, 99]) AS pct), tot)
        |SELECT pct,
        |  CAST(cw - nw + (needed - cm + mass + f - 1) // f AS BIGINT)
        |    AS vocab_size,
        |  CAST(needed AS BIGINT) AS needed_mass,
        |  CAST(total AS BIGINT) AS total_tokens
        |FROM need JOIN cum ON cm >= needed AND cm - mass < needed""".stripMargin,
    // q217: the sketch replayed on the q208 polynomial + the plain
    // exact set join (both integer; min over the multiset == min over
    // the distinct set, so the oracle sketches distinct words)
    "q217_source_sketch_sim" ->
      """WITH toks AS (
        |  SELECT source AS src, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS word
        |  FROM documents),
        |w AS MATERIALIZED (SELECT DISTINCT src, word FROM toks
        |                   WHERE word <> ''),
        |ph AS MATERIALIZED (
        |  SELECT src, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(word, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS p
        |  FROM w),
        |idx AS (SELECT CAST(unnest(generate_series(0, 63)) AS BIGINT) AS i),
        |sig AS MATERIALIZED (
        |  SELECT src, i, min(((p + i) * 2654435761) % 1000000007) AS mh
        |  FROM ph CROSS JOIN idx GROUP BY src, i),
        |est AS (
        |  SELECT a.src AS src_a, b.src AS src_b,
        |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
        |      AS matches
        |  FROM sig a JOIN sig b ON a.i = b.i AND a.src < b.src
        |  GROUP BY 1, 2),
        |sizes AS (SELECT src, count(*) AS n FROM w GROUP BY src),
        |inter AS (
        |  SELECT a.src AS src_a, b.src AS src_b, count(*) AS ix
        |  FROM w a JOIN w b ON a.word = b.word AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT e.src_a, e.src_b, e.matches,
        |  CAST(COALESCE(i.ix, 0) AS BIGINT) AS inter,
        |  CAST(sa.n + sb.n - COALESCE(i.ix, 0) AS BIGINT) AS uni
        |FROM est e
        |LEFT JOIN inter i ON i.src_a = e.src_a AND i.src_b = e.src_b
        |JOIN sizes sa ON sa.src = e.src_a
        |JOIN sizes sb ON sb.src = e.src_b""".stripMargin,
    // q218: the q194 gram-group-count span derivation rolled up to the
    // source dimension
    "q218_source_dup_rate" ->
      """WITH g AS (
        |  SELECT doc_id, pos, substr(text, CAST(pos AS INTEGER), 40) AS gram
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, len(text) - 39)) AS pos
        |        FROM documents WHERE len(text) >= 40)),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN pos - lag(pos) OVER
        |               (PARTITION BY doc_id ORDER BY pos) > 40
        |             THEN 1 ELSE 0 END AS brk
        |      FROM m),
        |s AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM i),
        |spans AS (SELECT doc_id, max(pos) + 40 - min(pos) AS span_len
        |          FROM s GROUP BY doc_id, grp),
        |per_doc AS (SELECT doc_id, sum(span_len) AS dup_chars
        |            FROM spans GROUP BY doc_id)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(COALESCE(pd.dup_chars, 0)) AS BIGINT) AS dup_chars,
        |  CAST(sum(len(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(COALESCE(pd.dup_chars, 0)) * 1000000
        |       // sum(len(text)) AS BIGINT) AS dup_ppm
        |FROM documents LEFT JOIN per_doc pd USING (doc_id)
        |GROUP BY source""".stripMargin,
    // q219: first-occurrence decile per word TRIGRAM (q144's gram
    // construction), cumulative over <= 10 rows
    "q219_vocab_growth" ->
      """WITH ts AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(lower(trim(coalesce(text, ''))), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |    ' ') AS ts
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
        |        i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS gram
        |      FROM ts),
        |fd AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram),
        |n AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |pb AS (SELECT (first_id * 10) // n AS bucket,
        |         count(*) AS new_words
        |       FROM fd, n GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(new_words AS BIGINT) AS new_words,
        |  CAST(sum(new_words) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_words
        |FROM pb""".stripMargin,
    // q220: the q214 dHash integer replay per SAMPLED FRAME (fixed
    // 64-byte slices, every 2nd — Multimodal.frameSample's geometry),
    // then the plain fp equi-join with the same df-cap
    "q220_frame_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, '~~~~~~~~~~' || substr(text, 11)
        |  FROM documents WHERE doc_id % 7 = 0),
        |enc AS (SELECT doc_id, encode(text) AS p FROM corpus),
        |m AS (SELECT doc_id, octet_length(p) AS n, hex(p) AS hx FROM enc),
        |fr AS (
        |  SELECT doc_id, hx, CAST(k * 64 AS BIGINT) AS off,
        |         least(64, n - k * 64) AS fn
        |  FROM m, unnest(generate_series(0, greatest(1, n // 64) - 1, 2))
        |    AS t(k)),
        |cells AS MATERIALIZED (
        |  SELECT doc_id, off,
        |    list_transform(range(0, 64), j ->
        |      CASE WHEN ((j+1)*fn)//64 > (j*fn)//64 THEN
        |        list_sum(list_transform(
        |          range(off + (j*fn)//64 + 1, off + ((j+1)*fn)//64 + 1),
        |          i -> (strpos('0123456789ABCDEF', hx[2*i-1]) - 1) * 16
        |             + (strpos('0123456789ABCDEF', hx[2*i]) - 1)))
        |        // (((j+1)*fn)//64 - (j*fn)//64)
        |      ELSE 0 END) AS c
        |  FROM fr),
        |h AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    CAST(list_sum(list_transform(range(0, 63),
        |      k -> CASE WHEN c[k+2] > c[k+1]
        |                THEN (1::BIGINT << CAST(k AS INTEGER)) ELSE 0 END))
        |      AS BIGINT) AS fp
        |  FROM cells),
        |ok AS (SELECT fp FROM h GROUP BY fp HAVING count(*) BETWEEN 2 AND 50)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM (SELECT * FROM h WHERE fp IN (SELECT fp FROM ok)) a
        |JOIN (SELECT * FROM h WHERE fp IN (SELECT fp FROM ok)) b
        |  ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 1""".stripMargin,
    // q221: per-stratum rank + stratum index, both plain row_numbers
    "q221_curriculum_order" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |      - 1 AS rk
        |  FROM documents),
        |s AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS sidx
        |      FROM (SELECT DISTINCT lang FROM documents)),
        |ns AS (SELECT count(*) AS n FROM s)
        |SELECT doc_id, lang,
        |  CAST(rk AS BIGINT) AS rank_in_stratum,
        |  CAST(rk * n + sidx AS BIGINT) AS position
        |FROM r JOIN s USING (lang), ns""".stripMargin,
    // q222: the Mondrian recursion unrolled — per round: per-partition
    // stats, cut-dimension choice, value-histogram cumulative window,
    // lower median, both-sides->=k viability, heap re-assignment
    "q222_mondrian_kanon" -> mondrianOracleSql(k = 25, rounds = 6),
    // q223: same unrolled recursion, row-level final select
    "q223_mondrian_release" ->
      mondrianOracleSql(k = 25, rounds = 6, release = true),
    // q224: the unrolled recursion's final assignment joined to the
    // sensitive attribute; dominant via row_number (c desc, seg)
    "q224_mondrian_diversity" ->
      (mondrianOracleSql(k = 25, rounds = 6, release = true)
        .split("\nboxes AS ").head + // ends at the p6 CTE's trailing comma
        """
          |seg AS (SELECT p.pid AS pid, c.c_mktsegment AS seg,
          |    count(*) AS c
          |  FROM p6 p JOIN customer c ON c.c_custkey = p.rid
          |  GROUP BY 1, 2),
          |dom AS (SELECT pid, seg, c,
          |    row_number() OVER (PARTITION BY pid
          |      ORDER BY c DESC, seg) AS rk
          |  FROM seg)
          |SELECT s.pid AS pid, CAST(sum(s.c) AS BIGINT) AS n,
          |  CAST(count(*) AS BIGINT) AS l_distinct,
          |  any_value(d.seg) AS dominant,
          |  CAST(any_value(d.c) * 1000000 // sum(s.c) AS BIGINT)
          |    AS dom_ppm
          |FROM seg s JOIN (SELECT * FROM dom WHERE rk = 1) d
          |  ON d.pid = s.pid
          |GROUP BY s.pid""".stripMargin),
    // q225/q226: the EM rounds unrolled — every probability an exact
    // grid BIGINT, the one float op per value literal-mirrored
    "q225_plsa_topics" ->
      plsaRoundsSql(k = 3, rounds = 3, gridScale = 1000000000L,
        output = "topics"),
    "q226_plsa_doc_topics" ->
      plsaRoundsSql(k = 3, rounds = 3, gridScale = 1000000000L,
        output = "docs"),
    // q227: the grammian + unrolled power iteration — every float sum
    // a list_reduce left fold matching the engine's driver loops
    "q227_pca_projection" ->
      pcaOracleSql(dim = 64, quantScale = 10000L, iters = 12),
    // q233: the same grammian + R deflation blocks (fold-ordered
    // Rayleigh + rank-1 subtraction between components)
    "q233_pca_components" ->
      pcaOracleSql(dim = 64, quantScale = 10000L, iters = 12,
        components = 3, single = false),
    // q234: the WordPiece walk core + the q119 BPE replace chain,
    // rolled up per language
    "q234_tokenizer_fertility" ->
      fertilityOracleSql(graft.operators.Wordpiece.DefaultVocab,
        graft.operators.Wordpiece.DefaultMaxSub, steps = 16),
    // q235: the q159 shell with the interpolated-KN algebra — one
    // literal-mirrored chain per token, micro-grid rounded
    "q235_kneser_ney" ->
      """WITH trd AS (
        |  SELECT regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents WHERE doc_id % 10 <> 7),
        |trt AS (
        |  SELECT toks[i] AS cur,
        |         CASE WHEN i > 1 THEN toks[i - 1] END AS p1
        |  FROM (SELECT toks, unnest(range(1, len(toks) + 1)) AS i
        |        FROM trd)),
        |bg AS MATERIALIZED (
        |  SELECT p1, cur, count(*) AS c2 FROM trt
        |  WHERE p1 IS NOT NULL GROUP BY 1, 2),
        |ctx AS (SELECT p1, CAST(sum(c2) AS BIGINT) AS cu,
        |        count(*) AS n1f FROM bg GROUP BY 1),
        |contw AS (SELECT cur, count(*) AS nb FROM bg GROUP BY 1),
        |bt AS (SELECT count(*) AS B FROM bg),
        |vt AS (SELECT count(DISTINCT cur) AS V FROM trt),
        |hd AS (
        |  SELECT doc_id, toks FROM (
        |    SELECT doc_id,
        |      regexp_extract_all(coalesce(text, ''), '[^ \t\n\x0B\f\r]+') AS toks
        |    FROM documents WHERE doc_id % 10 = 7)
        |  WHERE len(toks) > 0),
        |tt AS (
        |  SELECT doc_id, i, toks[i] AS cur,
        |         CASE WHEN i > 1 THEN toks[i - 1] END AS p1
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1))
        |          AS i
        |        FROM hd)),
        |terms AS (
        |  SELECT tt.doc_id,
        |    CAST(round(-ln(CASE WHEN tt.i = 1 THEN
        |        CAST(coalesce(cw.nb, 0) + 1 AS DOUBLE)
        |          / CAST(bt.B + vt.V AS DOUBLE)
        |      WHEN ctx.cu IS NOT NULL THEN
        |        greatest(CAST(coalesce(bg.c2, 0) AS DOUBLE) - 0.75, 0.0)
        |          / CAST(ctx.cu AS DOUBLE)
        |        + 0.75 * CAST(ctx.n1f AS DOUBLE) / CAST(ctx.cu AS DOUBLE)
        |          * (CAST(coalesce(cw.nb, 0) + 1 AS DOUBLE)
        |             / CAST(bt.B + vt.V AS DOUBLE))
        |      ELSE CAST(coalesce(cw.nb, 0) + 1 AS DOUBLE)
        |        / CAST(bt.B + vt.V AS DOUBLE)
        |      END) * 1000000) AS DECIMAL(18,0)) AS mic
        |  FROM tt
        |  LEFT JOIN bg ON bg.p1 = tt.p1 AND bg.cur = tt.cur
        |  LEFT JOIN ctx ON ctx.p1 = tt.p1
        |  LEFT JOIN contw cw ON cw.cur = tt.cur
        |  CROSS JOIN bt CROSS JOIN vt)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE),
        |    6) AS sum_nll,
        |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE)
        |    / count(*), 6) AS avg_nll
        |FROM terms GROUP BY 1""".stripMargin,
    // q228: q111's pair table + character counts; the score quotient is
    // the same double chain in both engines, ordering (score DESC, l, r)
    "q228_wordpiece_candidates" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS word
        |  FROM documents),
        |cc AS MATERIALIZED (
        |  SELECT c, count(*) AS cn FROM (
        |    SELECT unnest(string_split(word, '')) AS c FROM w)
        |  GROUP BY c),
        |p AS (
        |  SELECT substr(word, CAST(i AS INTEGER) + 1, 1) AS l,
        |         substr(word, CAST(i AS INTEGER) + 2, 1) AS r
        |  FROM (SELECT word, unnest(range(length(word) - 1)) AS i
        |        FROM w WHERE length(word) >= 2)),
        |pc AS MATERIALIZED (SELECT l, r, count(*) AS n FROM p
        |                    GROUP BY 1, 2),
        |sc AS (
        |  SELECT pc.l AS l, pc.r AS r, pc.n AS n, a.cn AS ln,
        |    b.cn AS rn,
        |    CAST(pc.n AS DOUBLE) / (CAST(a.cn AS DOUBLE)
        |      * CAST(b.cn AS DOUBLE)) AS score
        |  FROM pc JOIN cc a ON a.c = pc.l JOIN cc b ON b.c = pc.r)
        |SELECT l, r, CAST(n AS BIGINT) AS n, CAST(ln AS BIGINT) AS ln,
        |  CAST(rn AS BIGINT) AS rn,
        |  CAST(row_number() OVER (ORDER BY score DESC, l, r)
        |    AS INTEGER) AS rank
        |FROM sc QUALIFY rank <= 20""".stripMargin,
    // q229: the greedy longest-match walk unrolled per DISTINCT word
    // (16 steps cover every corpus word), joined back to occurrences
    "q229_wordpiece_tokens" ->
      wordpieceEncodeOracleSql(graft.operators.Wordpiece.DefaultVocab,
        graft.operators.Wordpiece.DefaultMaxSub, steps = 16),
    // q230: the same unrolled EM plus the fold-in CTEs and the
    // (p DESC, z ASC) argmax
    "q230_plsa_assign" ->
      plsaRoundsSql(k = 3, rounds = 3, gridScale = 1000000000L,
        output = "assign"),
    // q231: the same histogram/utility/weight/inversion chain — exp on
    // the mirrored 0.25·(u−umax) argument (ε=0.5), q205's hash uniform
    "q231_dp_median" ->
      """WITH hist AS MATERIALIZED (
        |  SELECT CAST(c_nationkey AS BIGINT) AS g,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v,
        |    count(*) AS nv
        |  FROM customer GROUP BY 1, 2),
        |sc AS MATERIALIZED (
        |  SELECT g, v, nv,
        |    sum(nv) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(nv) OVER (PARTITION BY g) AS n
        |  FROM hist),
        |ut AS MATERIALIZED (
        |  SELECT g, v, nv, cum, n,
        |    0 - greatest(cum - nv, n - cum) AS u,
        |    max(0 - greatest(cum - nv, n - cum))
        |      OVER (PARTITION BY g) AS umax
        |  FROM sc),
        |wt AS MATERIALIZED (
        |  SELECT g, v, n,
        |    CAST(round(1000000.0 * exp(0.25 * CAST(u - umax AS DOUBLE)))
        |      AS BIGINT) AS mw
        |  FROM ut),
        |pk AS MATERIALIZED (
        |  SELECT g, v, n, mw,
        |    sum(mw) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cumw,
        |    sum(mw) OVER (PARTITION BY g) AS w
        |  FROM wt),
        |th AS (
        |  SELECT g, v, n, cumw,
        |    CAST(floor(
        |      (CAST((((g % 1000003) * 2654435761) >> 16) % 1048576 + 1
        |        AS DOUBLE) / 1048577.0) * CAST(w AS DOUBLE))
        |      AS BIGINT) AS t
        |  FROM pk)
        |SELECT g AS nationkey, CAST(max(n) AS BIGINT) AS n,
        |  min(v) AS dp_median
        |FROM th WHERE cumw > t GROUP BY g""".stripMargin,
    // q232: the sketch replayed — q217's polynomial hash, row-seeded
    // permutation chain, cell sums, min-over-rows estimate
    "q232_countmin_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(
        |    regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))
        |    AS w
        |  FROM documents),
        |cnt AS MATERIALIZED (
        |  SELECT w, count(*) AS n FROM toks WHERE w <> '' GROUP BY w),
        |ph AS MATERIALIZED (
        |  SELECT w, n, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(w, ''),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
        |  FROM cnt),
        |bk AS MATERIALIZED (
        |  SELECT w, n, i, ((ph + i) * 2654435761) % 1000000007 % 512
        |    AS b
        |  FROM ph CROSS JOIN
        |    (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS i)),
        |cells AS MATERIALIZED (
        |  SELECT i, b, CAST(sum(n) AS BIGINT) AS cn FROM bk
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT w, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, w) AS INTEGER)
        |      AS rank
        |  FROM cnt QUALIFY rank <= 20)
        |SELECT t.w AS word, CAST(t.n AS BIGINT) AS n,
        |  CAST(min(c.cn) AS BIGINT) AS est,
        |  CAST(min(c.cn) - t.n AS BIGINT) AS overcount, t.rank AS rank
        |FROM top t JOIN bk ON bk.w = t.w
        |JOIN cells c ON c.i = bk.i AND c.b = bk.b
        |GROUP BY t.w, t.n, t.rank""".stripMargin,
    // q269: the Welch chain replayed — exact six-scalar conditional
    // moments, the same mirrored m/v/se double chain
    "q269_welch_ttest" ->
      """WITH ag AS (
        |  SELECT
        |    CAST(sum(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    sum(CASE WHEN g = '1-URGENT' THEN c ELSE 0 END) AS s1,
        |    sum(CASE WHEN g = '5-LOW' THEN c ELSE 0 END) AS s2,
        |    sum(CASE WHEN g = '1-URGENT' THEN c * c ELSE 0 END) AS q1,
        |    sum(CASE WHEN g = '5-LOW' THEN c * c ELSE 0 END) AS q2
        |  FROM (SELECT o_orderpriority AS g,
        |          CAST(round(100.0 * o_totalprice) AS BIGINT) AS c
        |        FROM orders
        |        WHERE o_orderpriority IN ('1-URGENT', '5-LOW'))),
        |mv AS (
        |  SELECT n1, n2,
        |    CASE WHEN n1 <= 0 THEN CAST('NaN' AS DOUBLE) ELSE
        |      CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS m1,
        |    CASE WHEN n2 <= 0 THEN CAST('NaN' AS DOUBLE) ELSE
        |      CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) END AS m2,
        |    CASE WHEN n1 <= 1 THEN CAST('NaN' AS DOUBLE) ELSE
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
        |    END AS v1,
        |    CASE WHEN n2 <= 1 THEN CAST('NaN' AS DOUBLE) ELSE
        |    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)
        |    END AS v2
        |  FROM ag),
        |se AS (
        |  SELECT n1, n2, m1, m2,
        |    CASE WHEN n1 <= 0 THEN CAST('NaN' AS DOUBLE) ELSE
        |      v1 / CAST(n1 AS DOUBLE) END AS se1,
        |    CASE WHEN n2 <= 0 THEN CAST('NaN' AS DOUBLE) ELSE
        |      v2 / CAST(n2 AS DOUBLE) END AS se2,
        |    CASE WHEN n1 <= 0 OR n2 <= 0 THEN CAST('NaN' AS DOUBLE) ELSE
        |      v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) END AS sse
        |  FROM mv)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(m1, 4) AS mean_a_cents, round(m2, 4) AS mean_b_cents,
        |  round(CASE WHEN sse = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (m1 - m2) / sqrt(sse) END, 6) AS t_stat,
        |  round(CASE WHEN sse = 0.0 OR n1 <= 1 OR n2 <= 1
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE sse * sse / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
        |      + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) END, 4)
        |    AS df_welch
        |FROM se""".stripMargin,
    // q270: the ANOVA chain replayed — per-group exact moments, the
    // s_g²/n_g terms folded in sorted group order (the q227 device)
    "q270_anova_f" ->
      """WITH per AS MATERIALIZED (
        |  SELECT o_orderpriority AS g,
        |    CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS sg,
        |    sum(CAST(round(100.0 * o_totalprice) AS BIGINT)
        |      * CAST(round(100.0 * o_totalprice) AS BIGINT)) AS qg
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS s, sum(qg) AS q,
        |    list_reduce(list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE) ORDER BY g), (a, b) -> a + b) AS a
        |  FROM per),
        |fin AS (
        |  SELECT k, n,
        |    a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssb,
        |    CAST(q AS DOUBLE) - a AS ssw
        |  FROM tot),
        |fd AS (
        |  SELECT k, n, ssb, ssw,
        |    CASE WHEN k = 1 OR n = k THEN CAST('NaN' AS DOUBLE)
        |      ELSE ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
        |    END AS fden
        |  FROM fin)
        |SELECT k AS k_groups, n AS n_rows,
        |  round(CASE WHEN isnan(fden) OR fden = 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE ssb / (CAST(k AS DOUBLE) - 1.0) / fden END, 6)
        |    AS f_stat,
        |  round(CASE WHEN ssb + ssw = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE ssb / (ssb + ssw) END, 6) AS eta_sq
        |FROM fd""".stripMargin,
    // q271: the Mann-Whitney chain replayed — midranks over the
    // 50-value histogram on the ×2 integer grid, mirrored z
    "q271_mann_whitney" ->
      """WITH h AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(count(*) AS BIGINT) AS t
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
        |r AS (
        |  SELECT v, na, t,
        |    coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS cumb
        |  FROM h),
        |ag AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS n1,
        |    CAST(sum(t - na) AS BIGINT) AS n2,
        |    CAST(sum(na * (2 * cumb + t + 1)) AS BIGINT) AS r1x2,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS ties
        |  FROM r),
        |fin AS (
        |  SELECT n1, n2, r1x2 - n1 * (n1 + 1) AS u1x2, ties,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn
        |  FROM ag)
        |SELECT n1 AS n_a, n2 AS n_b,
        |  round(CAST(u1x2 AS DOUBLE) / 2.0, 2) AS u_a,
        |  round((CAST(u1x2 AS DOUBLE) / 2.0
        |    - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
        |      * ((nn + 1.0) - CAST(ties AS DOUBLE)
        |        / (nn * (nn - 1.0)))), 6) AS z_score
        |FROM fin""".stripMargin,
    // q272: the contingency chain replayed — exact cell/marginal
    // counts, χ²/MI cell terms on the 1e-9/1e-12 grids, mirrored
    // verdict doubles
    "q272_contingency" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT event_type AS a,
        |    CAST((datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      + 4) % 7 AS BIGINT) AS b,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |terms AS (
        |  SELECT c.a, c.b, c.o, t.n,
        |    CAST(round(CAST(c.o * t.n - r.rt * x.ct AS DOUBLE)
        |      * CAST(c.o * t.n - r.rt * x.ct AS DOUBLE)
        |      / (CAST(t.n AS DOUBLE) * CAST(r.rt AS DOUBLE)
        |        * CAST(x.ct AS DOUBLE)) * 1.0e9) AS BIGINT) AS chi_g,
        |    CAST(round(CAST(r.rt AS DOUBLE) * CAST(x.ct AS DOUBLE)
        |      / CAST(t.n AS DOUBLE) * 1.0e9) AS BIGINT) AS e_g,
        |    CAST(round(CAST(c.o AS DOUBLE) / CAST(t.n AS DOUBLE)
        |      * ln(CAST(c.o AS DOUBLE) * CAST(t.n AS DOUBLE)
        |        / (CAST(r.rt AS DOUBLE) * CAST(x.ct AS DOUBLE)))
        |      * 1.0e12) AS BIGINT) AS mi_g
        |  FROM cells c JOIN rt r USING (a) JOIN ct x USING (b)
        |  CROSS JOIN tot t),
        |ag AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS r_levels,
        |    CAST(count(DISTINCT b) AS BIGINT) AS c_levels,
        |    CAST(sum(chi_g) AS BIGINT) AS chi_sum,
        |    CAST(sum(e_g) AS BIGINT) AS e_sum,
        |    CAST(sum(mi_g) AS BIGINT) AS mi_sum
        |  FROM terms),
        |fin AS (
        |  SELECT n, r_levels, c_levels, mi_sum,
        |    CAST(chi_sum AS DOUBLE) / 1.0e9
        |      + (CAST(n AS DOUBLE) - CAST(e_sum AS DOUBLE) / 1.0e9)
        |      AS chi2full
        |  FROM ag)
        |SELECT n, r_levels, c_levels,
        |  round(chi2full, 6) AS chi2,
        |  round(sqrt(chi2full / (CAST(n AS DOUBLE)
        |    * CAST(least(r_levels, c_levels) - 1 AS DOUBLE))), 6)
        |    AS cramers_v,
        |  round(CAST(mi_sum AS DOUBLE) / 1.0e12, 6) AS mi_nats
        |FROM fin""".stripMargin,
    // q273: the Spearman chain replayed — ×2 midranks from the
    // marginal histograms, exact joint-cell sums, mirrored ρ/r
    "q273_spearman" ->
      """WITH joint AS MATERIALIZED (
        |  SELECT CAST(round(100.0 * l_discount) AS BIGINT) AS dc,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM joint),
        |md AS (
        |  SELECT dc, 2 * coalesce(sum(td) OVER (ORDER BY dc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + td + 1 AS r2d
        |  FROM (SELECT dc, CAST(sum(c) AS BIGINT) AS td
        |        FROM joint GROUP BY 1)),
        |mq AS (
        |  SELECT q, 2 * coalesce(sum(tq) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + tq + 1 AS r2q
        |  FROM (SELECT q, CAST(sum(c) AS BIGINT) AS tq
        |        FROM joint GROUP BY 1)),
        |cells AS (
        |  SELECT j.c, j.dc, j.q, t.n,
        |    md.r2d - (t.n + 1) AS devd, mq.r2q - (t.n + 1) AS devq
        |  FROM joint j JOIN md USING (dc) JOIN mq USING (q)
        |  CROSS JOIN tot t),
        |ag AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(c * devd * devq) AS BIGINT) AS sxy,
        |    CAST(sum(c * devd * devd) AS BIGINT) AS sxx,
        |    CAST(sum(c * devq * devq) AS BIGINT) AS syy,
        |    CAST(sum(c * dc) AS BIGINT) AS px,
        |    CAST(sum(c * q) AS BIGINT) AS py,
        |    CAST(sum(c * dc * q) AS BIGINT) AS pxy,
        |    CAST(sum(c * dc * dc) AS BIGINT) AS pxx,
        |    CAST(sum(c * q * q) AS BIGINT) AS pyy
        |  FROM cells)
        |SELECT n,
        |  round(CAST(sxy AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE))
        |    * sqrt(CAST(syy AS DOUBLE))), 6) AS spearman_rho,
        |  round((CAST(n AS DOUBLE) * CAST(pxy AS DOUBLE)
        |    - CAST(px AS DOUBLE) * CAST(py AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(pxx AS DOUBLE)
        |      - CAST(px AS DOUBLE) * CAST(px AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(pyy AS DOUBLE)
        |        - CAST(py AS DOUBLE) * CAST(py AS DOUBLE))), 6)
        |    AS pearson_r
        |FROM ag""".stripMargin,
    // q274: the Kendall chain replayed — dense grid, 2-D prefix sums
    // F/G, exact concordance counts, mirrored τ-b
    "q274_kendall_tau" ->
      """WITH joint AS MATERIALIZED (
        |  SELECT CAST(round(100.0 * l_discount) AS BIGINT) AS dc,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |grid AS MATERIALIZED (
        |  SELECT d.dc, CAST(y.q AS BIGINT) AS q
        |  FROM (SELECT DISTINCT dc FROM joint) d
        |  CROSS JOIN (SELECT unnest(range(1, 51)) AS q) y),
        |c0 AS (
        |  SELECT g.dc, g.q, coalesce(j.c, 0) AS c
        |  FROM grid g LEFT JOIN joint j USING (dc, q)),
        |pre AS (
        |  SELECT dc, q, c,
        |    coalesce(sum(c) OVER (PARTITION BY dc ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumqlt,
        |    sum(c) OVER (PARTITION BY dc) AS rowtot
        |  FROM c0),
        |fg AS (
        |  SELECT dc, q, c,
        |    coalesce(sum(cumqlt) OVER (PARTITION BY q ORDER BY dc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS f,
        |    coalesce(sum(rowtot - cumqlt - c) OVER (PARTITION BY q
        |      ORDER BY dc ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      1 PRECEDING), 0) AS g
        |  FROM pre),
        |pairag AS (
        |  SELECT CAST(sum(c * f) AS BIGINT) AS ncd,
        |    CAST(sum(c * g) AS BIGINT) AS ndd
        |  FROM fg),
        |t1 AS (
        |  SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS n1x2,
        |    CAST(sum(t) AS BIGINT) AS n
        |  FROM (SELECT dc, CAST(sum(c) AS BIGINT) AS t
        |        FROM joint GROUP BY 1)),
        |t2 AS (
        |  SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS n2x2
        |  FROM (SELECT q, CAST(sum(c) AS BIGINT) AS t
        |        FROM joint GROUP BY 1)),
        |fin AS (
        |  SELECT ncd, ndd, n, n1x2, n2x2,
        |    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) AS n0x2
        |  FROM pairag CROSS JOIN t1 CROSS JOIN t2),
        |fd AS (
        |  SELECT ncd, ndd, n,
        |    sqrt((n0x2 - CAST(n1x2 AS DOUBLE)) / 2.0)
        |      * sqrt((n0x2 - CAST(n2x2 AS DOUBLE)) / 2.0) AS tden
        |  FROM fin)
        |SELECT n, ncd AS n_concordant, ndd AS n_discordant,
        |  round(CASE WHEN tden = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE (CAST(ncd AS DOUBLE) - CAST(ndd AS DOUBLE)) / tden
        |    END, 6) AS tau_b
        |FROM fd""".stripMargin,
    // q275: the CUSUM chain replayed — exact r·n−S deviations,
    // running window over the day dimension, deterministic argmax
    "q275_cusum" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS epoch_day,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(r) AS BIGINT) AS s FROM daily),
        |cu AS (
        |  SELECT d.epoch_day, t.n,
        |    sum(d.r * t.n - t.s) OVER (ORDER BY d.epoch_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cusum
        |  FROM daily d CROSS JOIN tot t)
        |SELECT n AS n_days, CAST(epoch_day AS BIGINT)
        |    AS change_epoch_day,
        |  round(CAST(cusum AS DOUBLE) / CAST(n AS DOUBLE), 4)
        |    AS cusum_cents
        |FROM cu
        |ORDER BY abs(cusum) DESC, epoch_day LIMIT 1""".stripMargin,
    // q276: the EWMA chain replayed — the 16 power-of-two taps as a
    // VALUES kernel, exact BIGINT numerators, one mirrored divide
    "q276_ewma" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |k(lg, w) AS (VALUES (0, 32768), (1, 16384), (2, 8192),
        |  (3, 4096), (4, 2048), (5, 1024), (6, 512), (7, 256),
        |  (8, 128), (9, 64), (10, 32), (11, 16), (12, 8), (13, 4),
        |  (14, 2), (15, 1)),
        |contrib AS (
        |  SELECT d.d + k.lg AS d2, CAST(sum(d.r * k.w) AS BIGINT)
        |    AS num
        |  FROM daily d CROSS JOIN k GROUP BY 1)
        |SELECT CAST(a.d AS BIGINT) AS epoch_day, a.r AS revenue_cents,
        |  round(CAST(c.num AS DOUBLE) / 65536.0, 4) AS ewma_cents
        |FROM daily a JOIN contrib c ON c.d2 = a.d""".stripMargin,
    // q277: the Mann-Kendall chain replayed — lag-join pair signs,
    // tie-corrected variance, continuity-corrected z
    "q277_mann_kendall" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS d,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |pr AS (
        |  SELECT CAST(sum(CASE WHEN b.r > a.r THEN 1
        |    WHEN b.r < a.r THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily a
        |  CROSS JOIN (SELECT CAST(unnest(range(1, 4001)) AS BIGINT)
        |              AS lag) l
        |  JOIN daily b ON b.d = a.d + l.lag),
        |ti AS (
        |  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
        |      AS tiesum,
        |    CAST(sum(t) AS BIGINT) AS n
        |  FROM (SELECT r, CAST(count(*) AS BIGINT) AS t
        |        FROM daily GROUP BY 1)),
        |fin AS (
        |  SELECT s_stat, n,
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |      * (2.0 * CAST(n AS DOUBLE) + 5.0)
        |      - CAST(tiesum AS DOUBLE)) / 18.0 AS var_s
        |  FROM pr CROSS JOIN ti)
        |SELECT n AS n_days, s_stat, round(var_s, 4) AS var_s,
        |  round(CASE WHEN s_stat > 0
        |      THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
        |    WHEN s_stat < 0
        |      THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
        |    ELSE 0.0 END, 6) AS z_score
        |FROM fin""".stripMargin,
    // q278: the same 3 grid-normalized HITS rounds unrolled (the q158
    // discipline — scores live on an exact integer micro-grid)
    "q278_hits" ->
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
         |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS MATERIALIZED (
         |      SELECT 2 * c AS src, 2 * sk + 1 AS dst FROM e0),
         |${hitsRoundsSql(3)},
         |nodes AS (SELECT src AS node FROM e
         |          UNION SELECT dst FROM e)
         |SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer'
         |         END AS kind,
         |       node // 2 AS key,
         |       CAST(coalesce(h.h, 0) AS BIGINT) AS hub_score,
         |       CAST(coalesce(a.a, 0) AS BIGINT) AS auth_score
         |FROM nodes LEFT JOIN h3 h USING (node)
         |LEFT JOIN a3 a USING (node)""".stripMargin,
    // q279: the assortativity chain replayed — doubled edge list,
    // exact five-moment sums, one mirrored Pearson expression
    "q279_assortativity" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
        |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 2 * c AS src, 2 * sk + 1 AS dst FROM e0
        |    UNION ALL
        |    SELECT 2 * sk + 1 AS src, 2 * c AS dst FROM e0)),
        |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
        |        FROM e GROUP BY 1),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(a.deg) AS BIGINT) AS su,
        |    CAST(sum(b.deg) AS BIGINT) AS sv,
        |    CAST(sum(a.deg * b.deg) AS BIGINT) AS suv,
        |    CAST(sum(a.deg * a.deg) AS BIGINT) AS suu,
        |    CAST(sum(b.deg * b.deg) AS BIGINT) AS svv
        |  FROM e JOIN deg a ON a.id = e.src JOIN deg b ON b.id = e.dst),
        |fin AS (
        |  SELECT m,
        |    CAST(m AS DOUBLE) * CAST(suv AS DOUBLE)
        |      - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE) AS num,
        |    sqrt(CAST(m AS DOUBLE) * CAST(suu AS DOUBLE)
        |      - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
        |      * sqrt(CAST(m AS DOUBLE) * CAST(svv AS DOUBLE)
        |        - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) AS den
        |  FROM ag)
        |SELECT m AS m_edges,
        |  round(CASE WHEN den = 0.0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE num / den END, 6) AS assortativity
        |FROM fin""".stripMargin,
    // q280: the triple-mining chain replayed — apriori item prune,
    // two ordered self-joins, support floor, (n DESC, a, b, c) top-k
    "q280_basket_triples" ->
      """WITH it0 AS MATERIALIZED (
        |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |ic AS MATERIALIZED (
        |  SELECT item, CAST(count(*) AS BIGINT) AS c
        |  FROM it0 GROUP BY 1),
        |fr AS (SELECT item FROM ic WHERE c >= 3),
        |it AS MATERIALIZED (
        |  SELECT okey, item FROM it0 JOIN fr USING (item)),
        |tr AS (
        |  SELECT a.item AS a, b.item AS b, c3.item AS c3,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM it a
        |  JOIN it b ON b.okey = a.okey AND b.item > a.item
        |  JOIN it c3 ON c3.okey = a.okey AND c3.item > b.item
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 3),
        |tk AS (
        |  SELECT a, b, c3, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, a, b, c3)
        |      AS BIGINT) AS rank
        |  FROM tr QUALIFY rank <= 20)
        |SELECT t.a AS item_a, t.b AS item_b, t.c3 AS item_c,
        |  t.n AS n_all, ia.c AS n_a, ib.c AS n_b, ic2.c AS n_c,
        |  CAST(t.rank AS INTEGER) AS rank
        |FROM tk t JOIN ic ia ON ia.item = t.a
        |JOIN ic ib ON ib.item = t.b
        |JOIN ic ic2 ON ic2.item = t.c3""".stripMargin,
    // q281: the kappa chain replayed — the q180 classifier CASE, exact
    // diagonal/margin-product integers, one mirrored divide
    "q281_cohen_kappa" ->
      """WITH pred AS MATERIALIZED (
        |  SELECT lang AS decl,
        |    CASE WHEN greatest(h_en, h_de, h_fr, h_es) <= 0 THEN 'und'
        |         WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
        |         WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
        |         WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
        |         ELSE 'es' END AS pred
        |  FROM (SELECT lang,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS h_en,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|eine|zu|den)\b')) AS h_de,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|des|du|que|pas)\b')) AS h_fr,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|del|que|por|con|para)\b')) AS h_es
        |    FROM documents)),
        |cells AS MATERIALIZED (
        |  SELECT decl, pred, CAST(count(*) AS BIGINT) AS n
        |  FROM pred GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(CASE WHEN decl = pred THEN n ELSE 0 END)
        |      AS BIGINT) AS po_num
        |  FROM cells),
        |pe AS (
        |  SELECT CAST(sum(r.rt * c.ct) AS BIGINT) AS pe_num
        |  FROM (SELECT decl AS k, CAST(sum(n) AS BIGINT) AS rt
        |        FROM cells GROUP BY 1) r
        |  JOIN (SELECT pred AS k, CAST(sum(n) AS BIGINT) AS ct
        |        FROM cells GROUP BY 1) c USING (k)),
        |fin AS (
        |  SELECT nn, po_num, pe_num, nn * nn - pe_num AS den
        |  FROM tot CROSS JOIN pe)
        |SELECT nn AS n_docs,
        |  round(CAST(po_num AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS po,
        |  round(CAST(pe_num AS DOUBLE)
        |    / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS pe,
        |  round(CASE WHEN den = 0 THEN CAST('NaN' AS DOUBLE)
        |    ELSE CAST(po_num * nn - pe_num AS DOUBLE)
        |      / CAST(den AS DOUBLE) END, 6) AS kappa
        |FROM fin""".stripMargin,
    // q282: the Kruskal-Wallis chain replayed — histogram midranks,
    // exact rank sums, the sorted-group fold, mirrored H
    "q282_kruskal_wallis" ->
      """WITH joint AS MATERIALIZED (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |h AS MATERIALIZED (
        |  SELECT v, CAST(sum(c) AS BIGINT) AS t FROM joint GROUP BY 1),
        |rk AS (
        |  SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM h),
        |per AS (
        |  SELECT g, CAST(sum(c) AS BIGINT) AS ng,
        |    CAST(sum(c * r2) AS BIGINT) AS r2g
        |  FROM joint JOIN rk USING (v) GROUP BY 1),
        |ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tiesum
        |         FROM h),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    list_reduce(list(CAST(r2g AS DOUBLE) / 2.0
        |      * (CAST(r2g AS DOUBLE) / 2.0) / CAST(ng AS DOUBLE)
        |      ORDER BY g), (a, b) -> a + b) AS a
        |  FROM per),
        |fin AS (
        |  SELECT k, n, tiesum,
        |    12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * a
        |      - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS hraw
        |  FROM ag CROSS JOIN ties),
        |fd AS (
        |  SELECT k, n, hraw,
        |    CASE WHEN n = 1 THEN CAST('NaN' AS DOUBLE)
        |      ELSE 1.0 - CAST(tiesum AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |          * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))
        |    END AS tden
        |  FROM fin)
        |SELECT k AS k_groups, n AS n_rows, round(hraw, 6) AS h_stat,
        |  round(CASE WHEN isnan(tden) OR tden = 0.0
        |    THEN CAST('NaN' AS DOUBLE)
        |    ELSE hraw / tden END, 6) AS h_tie_corrected
        |FROM fd""".stripMargin,
    // q283: the Durbin-Watson chain replayed — exact moment OLS,
    // integer-cent residual grid, the day-lag window
    "q283_durbin_watson" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS epoch_day,
        |    CAST(sum(CAST(round(100.0 * o_totalprice) AS BIGINT))
        |      AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(epoch_day) AS BIGINT) AS sd,
        |    CAST(sum(r) AS BIGINT) AS sr,
        |    CAST(sum(epoch_day * epoch_day) AS BIGINT) AS sdd,
        |    CAST(sum(epoch_day * r) AS BIGINT) AS sdr
        |  FROM daily),
        |fit AS (
        |  SELECT n, sd, sr,
        |    (CAST(n AS DOUBLE) * CAST(sdr AS DOUBLE)
        |      - CAST(sd AS DOUBLE) * CAST(sr AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
        |        - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) AS b
        |  FROM mom),
        |fit2 AS (
        |  SELECT n, b,
        |    (CAST(sr AS DOUBLE) - b * CAST(sd AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS a
        |  FROM fit),
        |resid AS (
        |  SELECT d.epoch_day, f.n, f.b,
        |    CAST(round(CAST(d.r AS DOUBLE)
        |      - (f.a + f.b * CAST(d.epoch_day AS DOUBLE))) AS BIGINT)
        |      AS e
        |  FROM daily d CROSS JOIN fit2 f),
        |lagd AS (
        |  SELECT n, b, e, lag(e, 1) OVER (ORDER BY epoch_day) AS ep
        |  FROM resid)
        |SELECT CAST(max(n) AS BIGINT) AS n_days,
        |  round(max(b), 6) AS slope_cents_per_day,
        |  round(CAST(sum(CASE WHEN ep IS NOT NULL
        |      THEN (e - ep) * (e - ep) ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(e * e) AS DOUBLE), 6) AS dw_stat
        |FROM lagd""".stripMargin,
  )

  /** q229 oracle generator: WordPiece greedy encode unrolled — per
    * step one CTE over the distinct-word table carrying
    * (pos, cnt, unk); the match length is a longest-first CASE over
    * `list_contains` probes of the literal vocabulary (continuation
    * pieces probe with the `##` prefix); a dead end sets the [UNK]
    * state (whole word = one token). `steps` must cover the longest
    * corpus word — a longer word surfaces as a hash mismatch, never a
    * silent wrong count.
    */
  private def wordpieceEncodeOracleSql(vocab: Seq[String], maxSub: Int,
      steps: Int): String = {
    s"""WITH ${wordpieceCoreCtes(vocab, maxSub, steps)}
       |SELECT d.doc_id, CAST(coalesce(p.ws, 0) AS BIGINT) AS ws_tokens,
       |  CAST(coalesce(p.wp, 0) AS BIGINT) AS wp_tokens,
       |  CAST(coalesce(p.un, 0) AS BIGINT) AS unk_words
       |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id"""
      .stripMargin
  }

  /** The wocc→per CTE chain of [[wordpieceEncodeOracleSql]] (per-doc
    * WordPiece stats), reusable inside larger oracles (q234).
    */
  private def wordpieceCoreCtes(vocab: Seq[String], maxSub: Int,
      steps: Int): String = {
    val vlit = vocab.map(v => s"'$v'").mkString("[", ", ", "]")
    val mlExpr = (maxSub to 1 by -1).map { k =>
      val guard = if (k > 1) s"pos + ${k - 1} <= L AND " else ""
      s"""WHEN ${guard}list_contains($vlit,
         |        CASE WHEN pos = 1 THEN substr(word, pos, $k)
         |             ELSE '##' || substr(word, pos, $k) END) THEN $k"""
        .stripMargin
    }.mkString("CASE WHEN pos > L THEN 0\n      ", "\n      ",
      "\n      ELSE 0 END")
    def stepCte(t: Int): String =
      s"""s$t AS MATERIALIZED (
         |  SELECT word, L,
         |    CASE WHEN unk OR pos > L THEN pos
         |         WHEN ml = 0 THEN L + 1 ELSE pos + ml END AS pos,
         |    CASE WHEN unk OR pos > L THEN cnt
         |         WHEN ml = 0 THEN 1 ELSE cnt + 1 END AS cnt,
         |    CASE WHEN unk OR pos > L THEN unk
         |         WHEN ml = 0 THEN TRUE ELSE unk END AS unk
         |  FROM (SELECT word, L, pos, cnt, unk,
         |      $mlExpr AS ml
         |    FROM s${t - 1}))""".stripMargin
    s"""wocc AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+'))
       |    AS word
       |  FROM documents),
       |w AS MATERIALIZED (SELECT DISTINCT word FROM wocc),
       |s0 AS (SELECT word, length(word) AS L, 1 AS pos, 0 AS cnt,
       |       FALSE AS unk FROM w),
       |${(1 to steps).map(stepCte).mkString(",\n")},
       |res AS MATERIALIZED (SELECT word, cnt, unk FROM s$steps),
       |per AS (
       |  SELECT o.doc_id AS doc_id, count(*) AS ws, sum(r.cnt) AS wp,
       |    sum(CASE WHEN r.unk THEN 1 ELSE 0 END) AS un
       |  FROM wocc o JOIN res r ON r.word = o.word GROUP BY 1)"""
      .stripMargin
  }

  /** q234 oracle: the WordPiece per-doc core + the q119 BPE
    * replace-chain (CTEs renamed bw/bs/bm/bt), rolled up per language.
    */
  private def fertilityOracleSql(vocab: Seq[String], maxSub: Int,
      steps: Int): String = {
    def wrap(s: String) = s"chr(31)||'$s'||chr(30)"
    val merged = graft.operators.BpeTrain.DefaultMerges
      .foldLeft("bs0") { case (e, (l, r)) =>
        s"replace($e, ${wrap(l)}||${wrap(r)}, ${wrap(l + r)})"
      }
    s"""WITH ${wordpieceCoreCtes(vocab, maxSub, steps)},
       |bw AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(
       |      replace(replace(text, chr(31), ''), chr(30), ''), '[^ \\t\\n\\x0B\\f\\r]+'))
       |    AS word
       |  FROM documents),
       |bs AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(
       |      regexp_split_to_array(word, ''), c -> chr(31)||c||chr(30)),
       |      '') AS bs0
       |  FROM bw),
       |bm AS (SELECT doc_id, $merged AS sm FROM bs),
       |bt AS (
       |  SELECT doc_id,
       |    CAST(sum(len(sm) - len(replace(sm, chr(31), ''))) AS BIGINT)
       |      AS bpe
       |  FROM bm GROUP BY doc_id)
       |SELECT d.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(coalesce(length(d.text), 0)) AS BIGINT) AS n_chars,
       |  CAST(sum(coalesce(p.ws, 0)) AS BIGINT) AS ws_tokens,
       |  CAST(sum(coalesce(b.bpe, 0)) AS BIGINT) AS bpe_tokens,
       |  CAST(sum(coalesce(p.wp, 0)) AS BIGINT) AS wp_tokens,
       |  CAST(sum(coalesce(p.un, 0)) AS BIGINT) AS unk_words
       |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
       |LEFT JOIN bt b ON b.doc_id = d.doc_id
       |GROUP BY d.lang""".stripMargin
  }

  /** q227/q233 oracle generator: quantized grammian (exact integer
    * sums via the N·d² self-join the ENGINE exists to avoid), centered
    * matrix C = n·G − s·sᵀ cast losslessly to double, then per
    * COMPONENT `iters` unrolled power-iteration CTEs — each a
    * fold-ordered matrix-vector product (`list_reduce`, mirroring the
    * engine's fixed left folds), max-abs rescale, and 1e-9 grid
    * round — the fold-ordered unit/Rayleigh/deflation CTEs between
    * components, and the fold-ordered projections. `single` selects
    * q227's (vec_id, pc1_q) shape.
    */
  private def pcaOracleSql(dim: Int, quantScale: Long, iters: Int,
      components: Int = 1, single: Boolean = true): String = {
    def iterCtes(c: Int, r: Int): String = {
      val prev = if (r == 1) s"uv${c}_0" else s"uv${c}_${r - 1}"
      s"""v${c}_$r AS MATERIALIZED (
         |  SELECT i, list_reduce(list_prepend(0.0,
         |    list_transform(range(0, $dim),
         |      j -> cr[j + 1] * u[j + 1])), (a, x) -> a + x) AS v
         |  FROM cmat$c CROSS JOIN $prev),
         |uv${c}_$r AS MATERIALIZED (
         |  SELECT list_transform(
         |    list(CAST(round(1000000000.0 * v / m) AS BIGINT)
         |      ORDER BY i), x -> CAST(x AS DOUBLE)) AS u
         |  FROM v${c}_$r CROSS JOIN
         |    (SELECT max(abs(v)) AS m FROM v${c}_$r))"""
        .stripMargin
    }
    def componentCtes(c: Int): String = {
      val base =
        s"""uv${c}_0 AS (SELECT list_transform(range(0, $dim),
           |  j -> 1000000000.0) AS u),
           |${(1 to iters).map(r => iterCtes(c, r)).mkString(",\n")},
           |unitv$c AS MATERIALIZED (
           |  SELECT list_transform(u, x -> x / sqrt(list_reduce(
           |    list_prepend(0.0, list_transform(u, y -> y * y)),
           |    (a, b) -> a + b))) AS un
           |  FROM uv${c}_$iters)""".stripMargin
      val deflate = if (c >= components - 1) "" else
        s""",
           |vv$c AS MATERIALIZED (
           |  SELECT i, list_reduce(list_prepend(0.0,
           |    list_transform(range(0, $dim),
           |      j -> cr[j + 1] * un[j + 1])), (a, x) -> a + x) AS v
           |  FROM cmat$c CROSS JOIN unitv$c),
           |lam$c AS (
           |  SELECT list_reduce(list_prepend(0.0,
           |    list(un[i + 1] * v ORDER BY i)), (a, x) -> a + x) AS lam
           |  FROM vv$c CROSS JOIN unitv$c),
           |cmat${c + 1} AS MATERIALIZED (
           |  SELECT i, list_transform(range(0, $dim),
           |    j -> cr[j + 1] - lam * un[i + 1] * un[j + 1]) AS cr
           |  FROM cmat$c CROSS JOIN unitv$c CROSS JOIN lam$c)"""
          .stripMargin
      base + deflate
    }
    def projection(c: Int): String =
      s"""list_reduce(list_prepend(0.0,
         |    list_transform(range(0, $dim),
         |      j -> CAST(q[j + 1] AS DOUBLE) * un[j + 1])),
         |    (a, x) -> a + x)""".stripMargin
    val finalSelect =
      if (single)
        s"""SELECT vec_id, CAST(round(${projection(0)}) AS BIGINT)
           |  AS pc1_q
           |FROM qv CROSS JOIN unitv0""".stripMargin
      else
        (0 until components).map(c =>
          s"""SELECT vec_id, $c AS comp,
             |  CAST(round(${projection(c)}) AS BIGINT) AS score_q
             |FROM qv CROSS JOIN unitv$c""".stripMargin)
          .mkString("\nUNION ALL ")
    s"""WITH qv AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round($quantScale.0 * CAST(x AS DOUBLE)) AS BIGINT))
       |    AS q
       |  FROM embeddings),
       |el AS MATERIALIZED (
       |  SELECT vec_id, i, q[i + 1] AS qi
       |  FROM qv CROSS JOIN (SELECT unnest(range(0, $dim)) AS i)),
       |sums AS MATERIALIZED (SELECT i, sum(qi) AS s FROM el GROUP BY i),
       |nrow AS (SELECT count(*) AS n FROM qv),
       |gm AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, sum(a.qi * b.qi) AS g
       |  FROM el a JOIN el b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2),
       |cm AS MATERIALIZED (
       |  SELECT g.i AS i, g.j AS j,
       |    CAST(n * g.g - sa.s * sb.s AS DOUBLE) AS c
       |  FROM gm g JOIN sums sa ON sa.i = g.i
       |             JOIN sums sb ON sb.i = g.j
       |  CROSS JOIN nrow),
       |cmat0 AS MATERIALIZED (
       |  SELECT i, list(c ORDER BY j) AS cr FROM cm GROUP BY i),
       |${(0 until components).map(componentCtes).mkString(",\n")}
       |$finalSelect""".stripMargin
  }

  /** q225/q226 oracle generator: pLSA EM unrolled. Mirrors
    * [[graft.operators.TopicModel]] exactly: q216's tokenizer, q217's
    * polynomial word hash seeding P(w|z)⁰, uniform P(z|d)⁰, then per
    * round one joint/denominator CTE (exact BIGINT products), the
    * grid-rounded posterior (`round(G·joint/den)` — the single
    * literal-mirrored float op), and BIGINT-sum M-step
    * renormalizations. `docTopics` selects the final doc-topic table
    * instead of the per-round topic-word union.
    */
  private def plsaRoundsSql(k: Int, rounds: Int, gridScale: Long,
      output: String): String = {
    require(Set("topics", "docs", "assign")(output),
      s"unknown plsa oracle output: $output")
    val g = s"$gridScale.0"
    val u0 = Math.round(gridScale.toDouble / k)
    def roundCtes(r: Int): String =
      s"""j$r AS MATERIALIZED (
         |  SELECT nd.d, nd.w, nd.n, pw.z, pw.p * pd.p AS joint,
         |    sum(pw.p * pd.p) OVER (PARTITION BY nd.d, nd.w) AS den
         |  FROM nd JOIN pwz${r - 1} pw ON nd.w = pw.w
         |          JOIN pzd${r - 1} pd ON nd.d = pd.d AND pd.z = pw.z),
         |post$r AS MATERIALIZED (
         |  SELECT d, w, n, z, CASE WHEN den > 0
         |    THEN CAST(round($g * CAST(joint AS DOUBLE)
         |      / CAST(den AS DOUBLE)) AS BIGINT)
         |    ELSE $u0 END AS post
         |  FROM j$r),
         |swz$r AS MATERIALIZED (
         |  SELECT w, z, sum(n * post) AS s FROM post$r GROUP BY 1, 2),
         |pwz$r AS MATERIALIZED (
         |  SELECT w, z, CASE WHEN sum(s) OVER (PARTITION BY z) > 0
         |    THEN CAST(round($g * CAST(s AS DOUBLE)
         |      / CAST(sum(s) OVER (PARTITION BY z) AS DOUBLE)) AS BIGINT)
         |    ELSE 0 END AS p
         |  FROM swz$r),
         |sdz$r AS (SELECT d, z, sum(n * post) AS s FROM post$r
         |          GROUP BY 1, 2),
         |pzd$r AS MATERIALIZED (
         |  SELECT d, z, CASE WHEN sum(s) OVER (PARTITION BY d) > 0
         |    THEN CAST(round($g * CAST(s AS DOUBLE)
         |      / CAST(sum(s) OVER (PARTITION BY d) AS DOUBLE)) AS BIGINT)
         |    ELSE $u0 END AS p
         |  FROM sdz$r)""".stripMargin
    val finalSelect = output match {
      case "docs" =>
        s"""SELECT d AS doc_id, z, p AS p_nano FROM pzd$rounds"""
      case "assign" =>
        // one fold-in step against pwz$rounds: uniform prior joint,
        // grid posterior, doc renormalization, (p DESC, z ASC) argmax
        s"""ja AS MATERIALIZED (
           |  SELECT nd.d, nd.n, pw.z, pw.p * $u0 AS joint,
           |    sum(pw.p * $u0) OVER (PARTITION BY nd.d, nd.w) AS den
           |  FROM nd JOIN pwz$rounds pw ON nd.w = pw.w),
           |posta AS MATERIALIZED (
           |  SELECT d, n, z, CASE WHEN den > 0
           |    THEN CAST(round($g * CAST(joint AS DOUBLE)
           |      / CAST(den AS DOUBLE)) AS BIGINT)
           |    ELSE $u0 END AS post
           |  FROM ja),
           |sda AS (SELECT d, z, sum(n * post) AS s FROM posta
           |        GROUP BY 1, 2),
           |pda AS MATERIALIZED (
           |  SELECT d, z, CASE WHEN sum(s) OVER (PARTITION BY d) > 0
           |    THEN CAST(round($g * CAST(s AS DOUBLE)
           |      / CAST(sum(s) OVER (PARTITION BY d) AS DOUBLE))
           |      AS BIGINT)
           |    ELSE $u0 END AS p
           |  FROM sda)
           |SELECT d AS doc_id, z AS topic, p AS p_nano
           |FROM (SELECT d, z, p, row_number() OVER (PARTITION BY d
           |        ORDER BY p DESC, z) AS rk FROM pda)
           |WHERE rk = 1""".stripMargin
      case _ =>
        (0 to rounds).map(r =>
          s"SELECT $r AS round, z, w AS word, p AS p_nano FROM pwz$r")
          .mkString("\nUNION ALL ")
    }
    val tail = if (output == "assign") ",\n" else "\n"
    s"""WITH toks AS (
       |  SELECT doc_id AS d, unnest(string_split(
       |    regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))
       |    AS w
       |  FROM documents),
       |nd AS MATERIALIZED (
       |  SELECT d, w, count(*) AS n FROM toks WHERE w <> ''
       |  GROUP BY 1, 2),
       |zs AS (SELECT CAST(unnest(range(0, $k)) AS INTEGER) AS z),
       |ph AS MATERIALIZED (
       |  SELECT w, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(w, ''),
       |                   c -> CAST(ascii(c) AS BIGINT))),
       |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ph
       |  FROM (SELECT DISTINCT w FROM nd)),
       |wt AS MATERIALIZED (
       |  SELECT w, z, 1 + (ph + z * 2654435761) % 997 AS wt
       |  FROM ph CROSS JOIN zs),
       |pwz0 AS MATERIALIZED (
       |  SELECT w, z, CAST(round($g * CAST(wt AS DOUBLE)
       |    / CAST(sum(wt) OVER (PARTITION BY z) AS DOUBLE)) AS BIGINT)
       |    AS p
       |  FROM wt),
       |pzd0 AS MATERIALIZED (
       |  SELECT d, z, CAST($u0 AS BIGINT) AS p
       |  FROM (SELECT DISTINCT d FROM nd) CROSS JOIN zs),
       |${(1 to rounds).map(roundCtes).mkString(",\n")}$tail$finalSelect"""
      .stripMargin
  }


  /** q240/q241 oracle generator: a subword TRAINER unrolled. Words
    * ride as chr(31)/chr(30)-delimited symbol strings (the q119 pair
    * encoding); per round: symbols via `regexp_extract_all` group
    * capture, freq-weighted adjacent-pair and symbol counts, the
    * argmax — WordPiece's `n/(ln·rn)` double chain when `scored`,
    * plain `n DESC` (BPE) otherwise; ties (l, r), which equals the
    * engine's "pair string ASC" because the separator chr(31) sorts
    * below every symbol character — then ONE `replace` applying the
    * merge: on delimited tokens a left-to-right non-overlapping
    * replace equals the engine's greedy lookbehind fold (a token
    * created by the merge cannot spuriously re-match: the pattern
    * requires the full ␟l␞␟r␞ delimiters).
    */
  private def wordpieceTrainOracleSql(rounds: Int,
      scored: Boolean = true): String = {
    val orderKey =
      if (scored)
        """CAST(pc.n AS DOUBLE)
         |    / (CAST(a.cn AS DOUBLE) * CAST(b.cn AS DOUBLE))"""
          .stripMargin
      else "pc.n"
    def roundCtes(r: Int): String =
      s"""sy$r AS MATERIALIZED (
         |  SELECT s, freq, regexp_extract_all(s,
         |    chr(31) || '([^' || chr(30) || ']*)' || chr(30), 1) AS sym
         |  FROM w$r),
         |pc$r AS MATERIALIZED (
         |  SELECT sym[CAST(i AS INTEGER)] AS l,
         |    sym[CAST(i AS INTEGER) + 1] AS r,
         |    CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT freq, sym, unnest(range(1, len(sym))) AS i
         |        FROM sy$r)
         |  GROUP BY 1, 2),
         |sc$r AS MATERIALIZED (
         |  SELECT se AS sb, CAST(sum(freq) AS BIGINT) AS cn
         |  FROM (SELECT freq, unnest(sym) AS se FROM sy$r)
         |  GROUP BY 1),
         |m$r AS MATERIALIZED (
         |  SELECT pc.l AS l, pc.r AS r, pc.n AS n, a.cn AS ln,
         |    b.cn AS rn
         |  FROM pc$r pc JOIN sc$r a ON a.sb = pc.l
         |               JOIN sc$r b ON b.sb = pc.r
         |  ORDER BY $orderKey DESC, pc.l, pc.r
         |  LIMIT 1),
         |w${r + 1} AS MATERIALIZED (
         |  SELECT replace(w.s,
         |      chr(31) || m.l || chr(30) || chr(31) || m.r || chr(30),
         |      chr(31) || m.l || m.r || chr(30)) AS s, w.freq AS freq
         |  FROM w$r w CROSS JOIN m$r m)""".stripMargin
    val finalSelect = (1 to rounds).map { r =>
      val cols =
        if (scored)
          """n AS pair_freq, ln AS left_freq, rn AS right_freq"""
        else """n AS pair_freq"""
      s"""SELECT $r AS merge_rank, l AS "left", r AS "right",
         |  $cols
         |FROM m$r""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH w1 AS MATERIALIZED (
       |  SELECT array_to_string(list_transform(
       |      regexp_split_to_array(word, ''),
       |      c -> chr(31) || c || chr(30)), '') AS s,
       |    count(*) AS freq
       |  FROM (SELECT unnest(regexp_extract_all(
       |      replace(replace(text, chr(31), ''), chr(30), ''), '[^ \\t\\n\\x0B\\f\\r]+'))
       |      AS word
       |    FROM documents)
       |  WHERE word <> ''
       |  GROUP BY 1),
       |${(1 to rounds).map(roundCtes).mkString(",\n")}
       |$finalSelect""".stripMargin
  }

  /** q254 oracle generator: `rounds` unrolled IRLS Newton rounds —
    * each round one CROSS JOIN against the 1-row beta CTE, the 1e-6
    * grid posterior (exp rides the q231 parity precedent), exact
    * HUGEINT weighted moment sums cast to DOUBLE, and the SAME fixed
    * 3x3 Cramer shape as the q250 oracle updating the betas.
    */
  private def logitOracleSql(rounds: Int, auc: Boolean = false,
      pr: Boolean = false): String = {
    def roundCtes(r: Int): String =
      s"""p$r AS MATERIALIZED (
         |  SELECT d.x1, d.x2, d.y,
         |    CAST(round(1000000.0 * (1.0 / (1.0 + exp(-(b.b0
         |      + b.b1 * CAST(d.x1 AS DOUBLE)
         |      + b.b2 * CAST(d.x2 AS DOUBLE)))))) AS BIGINT) AS pm
         |  FROM d CROSS JOIN br${r - 1} b),
         |s$r AS MATERIALIZED (
         |  SELECT CAST(count(*) AS BIGINT) AS nl,
         |    CAST(sum(pm * (1000000 - pm)) AS DOUBLE) AS sw,
         |    CAST(sum(pm * (1000000 - pm) * x1) AS DOUBLE) AS sw1,
         |    CAST(sum(pm * (1000000 - pm) * x2) AS DOUBLE) AS sw2,
         |    CAST(sum(pm * (1000000 - pm) * x1 * x1) AS DOUBLE) AS sw11,
         |    CAST(sum(pm * (1000000 - pm) * x1 * x2) AS DOUBLE) AS sw12,
         |    CAST(sum(pm * (1000000 - pm) * x2 * x2) AS DOUBLE) AS sw22,
         |    CAST(sum(y * 1000000 - pm) AS DOUBLE) AS g0,
         |    CAST(sum((y * 1000000 - pm) * x1) AS DOUBLE) AS g1,
         |    CAST(sum((y * 1000000 - pm) * x2) AS DOUBLE) AS g2
         |  FROM p$r),
         |br$r AS MATERIALIZED (
         |  SELECT s.nl AS nl,
         |    b.b0 + 1000000.0 * (
         |      (g0 * (sw11 * sw22 - sw12 * sw12)
         |        - sw1 * (g1 * sw22 - sw12 * g2)
         |        + sw2 * (g1 * sw12 - sw11 * g2))
         |      / (sw * (sw11 * sw22 - sw12 * sw12)
         |        - sw1 * (sw1 * sw22 - sw12 * sw2)
         |        + sw2 * (sw1 * sw12 - sw11 * sw2))) AS b0,
         |    b.b1 + 1000000.0 * (
         |      (sw * (g1 * sw22 - sw12 * g2)
         |        - g0 * (sw1 * sw22 - sw12 * sw2)
         |        + sw2 * (sw1 * g2 - g1 * sw2))
         |      / (sw * (sw11 * sw22 - sw12 * sw12)
         |        - sw1 * (sw1 * sw22 - sw12 * sw2)
         |        + sw2 * (sw1 * sw12 - sw11 * sw2))) AS b1,
         |    b.b2 + 1000000.0 * (
         |      (sw * (sw11 * g2 - g1 * sw12)
         |        - sw1 * (sw1 * g2 - g1 * sw2)
         |        + g0 * (sw1 * sw12 - sw11 * sw2))
         |      / (sw * (sw11 * sw22 - sw12 * sw12)
         |        - sw1 * (sw1 * sw22 - sw12 * sw2)
         |        + sw2 * (sw1 * sw12 - sw11 * sw2))) AS b2
         |  FROM s$r s CROSS JOIN br${r - 1} b)""".stripMargin
    s"""WITH d AS MATERIALIZED (
       |  SELECT CAST(round(c_acctbal / 1000.0) AS BIGINT) AS x1,
       |    CAST(c_nationkey AS BIGINT) AS x2,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(1 AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS y
       |  FROM customer),
       |br0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
       |${(1 to rounds).map(roundCtes).mkString(",\n")}${
      if (pr)
        s""",
           |sc AS MATERIALIZED (
           |  SELECT CAST(round(1000000.0 * (1.0 / (1.0 + exp(-(b.b0
           |    + b.b1 * CAST(d.x1 AS DOUBLE)
           |    + b.b2 * CAST(d.x2 AS DOUBLE)))))) AS BIGINT) AS s, d.y
           |  FROM d CROSS JOIN br$rounds b),
           |h AS MATERIALIZED (
           |  SELECT s, CAST(sum(y) AS BIGINT) AS pos,
           |    CAST(sum(1 - y) AS BIGINT) AS neg
           |  FROM sc GROUP BY 1),
           |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p_all FROM h),
           |t AS (SELECT s,
           |    CAST(sum(pos) OVER (ORDER BY s DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS tp,
           |    CAST(sum(neg) OVER (ORDER BY s DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS fp
           |  FROM h)
           |SELECT t.s AS threshold, t.tp, t.fp,
           |  CAST(tot.p_all - t.tp AS BIGINT) AS fn,
           |  round(CAST(t.tp AS DOUBLE) / CAST(t.tp + t.fp AS DOUBLE), 6)
           |    AS prec,
           |  round(CAST(t.tp AS DOUBLE) / CAST(tot.p_all AS DOUBLE), 6)
           |    AS rec
           |FROM t CROSS JOIN tot""".stripMargin
      else if (!auc)
        s"""
           |SELECT nl AS n_rows, round(b0, 6) AS b0, round(b1, 6) AS b1,
           |  round(b2, 6) AS b2
           |FROM br$rounds""".stripMargin
      else
        s""",
           |sc AS MATERIALIZED (
           |  SELECT CAST(round(1000000.0 * (1.0 / (1.0 + exp(-(b.b0
           |    + b.b1 * CAST(d.x1 AS DOUBLE)
           |    + b.b2 * CAST(d.x2 AS DOUBLE)))))) AS BIGINT) AS s, d.y
           |  FROM d CROSS JOIN br$rounds b),
           |h AS MATERIALIZED (
           |  SELECT s, CAST(sum(y) AS BIGINT) AS pos,
           |    CAST(sum(1 - y) AS BIGINT) AS neg
           |  FROM sc GROUP BY 1),
           |t AS (SELECT pos, neg,
           |    COALESCE(CAST(sum(neg) OVER (ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS BIGINT), 0) AS cumneg
           |  FROM h)
           |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           |  CAST(sum(neg) AS BIGINT) AS n_neg,
           |  round(CAST(sum(pos * (2 * cumneg + neg)) AS DOUBLE)
           |    / (2.0 * CAST(sum(pos) AS DOUBLE)
           |       * CAST(sum(neg) AS DOUBLE)), 6) AS auc
           |FROM t""".stripMargin
    }""".stripMargin
  }

  /** q222 oracle generator: `rounds` unrolled Mondrian rounds over the
    * (d1 = balance cents, d2 = nation) space — every CTE is either
    * per-partition-bounded or the row-level assignment table, all
    * integer arithmetic (lower median = smallest v with cum >=
    * (n+1) div 2; split only when both sides keep >= k).
    */
  private def mondrianOracleSql(k: Int, rounds: Int,
      release: Boolean = false): String = {
    def roundCtes(r: Int): String = {
      val p = s"p${r - 1}"
      s"""s$r AS MATERIALIZED (
         |  SELECT pid, count(*) AS n,
         |    min(d1) AS lo1, max(d1) AS hi1,
         |    min(d2) AS lo2, max(d2) AS hi2
         |  FROM $p GROUP BY pid),
         |c$r AS (SELECT pid, n,
         |    CASE WHEN hi1 - lo1 >= hi2 - lo2 THEN 1 ELSE 2 END AS dim
         |  FROM s$r WHERE n >= 2 * $k),
         |v$r AS MATERIALIZED (
         |  SELECT p.pid AS pid, c.n AS n, c.dim AS dim,
         |    CASE WHEN c.dim = 1 THEN p.d1 ELSE p.d2 END AS v,
         |    count(*) AS cnt
         |  FROM $p p JOIN c$r c USING (pid) GROUP BY 1, 2, 3, 4),
         |w$r AS MATERIALIZED (
         |  SELECT pid, n, dim, v,
         |    sum(cnt) OVER (PARTITION BY pid ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM v$r),
         |m$r AS (SELECT pid, min(v) AS m FROM w$r
         |        WHERE cum >= (n + 1) // 2 GROUP BY pid),
         |x$r AS (SELECT w.pid AS pid, w.dim AS dim, m.m AS m
         |  FROM w$r w JOIN m$r m ON m.pid = w.pid AND w.v = m.m
         |  WHERE w.cum >= $k AND w.n - w.cum >= $k),
         |p$r AS MATERIALIZED (
         |  SELECT p.rid AS rid, p.d1 AS d1, p.d2 AS d2,
         |    CASE WHEN x.pid IS NULL THEN p.pid
         |         ELSE p.pid * 2 + 1 +
         |           CASE WHEN (CASE WHEN x.dim = 1 THEN p.d1 ELSE p.d2 END)
         |                     <= x.m THEN 0 ELSE 1 END
         |    END AS pid
         |  FROM $p p LEFT JOIN x$r x USING (pid))""".stripMargin
    }
    val finalSelect =
      if (release)
        s"""boxes AS (SELECT pid, min(d1) AS abal_lo, max(d1) AS abal_hi,
           |    min(d2) AS nat_lo, max(d2) AS nat_hi
           |  FROM p$rounds GROUP BY pid)
           |SELECT p.rid AS c_custkey, p.pid AS pid, b.abal_lo, b.abal_hi,
           |  b.nat_lo, b.nat_hi
           |FROM p$rounds p JOIN boxes b USING (pid)""".stripMargin
      else
        s"""SELECT pid, CAST(count(*) AS BIGINT) AS n,
           |  min(d1) AS abal_lo, max(d1) AS abal_hi,
           |  min(d2) AS nat_lo, max(d2) AS nat_hi
           |FROM p$rounds GROUP BY pid""".stripMargin
    val finalCte = if (release) s",\n" else "\n"
    s"""WITH p0 AS MATERIALIZED (
       |  SELECT CAST(c_custkey AS BIGINT) AS rid,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS d1,
       |    CAST(c_nationkey AS BIGINT) AS d2, CAST(0 AS BIGINT) AS pid
       |  FROM customer),
       |${(1 to rounds).map(roundCtes).mkString(",\n")}$finalCte$finalSelect""".stripMargin
  }

  /** q206/q207 oracle (single round / one prune): the rounds generator
    * with a 0- or 1-element keep schedule.
    */
  private def unigramOracleSql(maxWordLen: Int, maxPieceLen: Int,
      pruneKeep: Option[Int]): String =
    unigramRoundsSql(maxWordLen, maxPieceLen, pruneKeep.toSeq,
      perRound = false)

  /** q206/q207/q215 oracle generator: word histogram + piece costs in
    * SQL, then per EM round `maxWordLen` unrolled DP steps (each a
    * rank-1 argmin over the previous positions' rows), `maxWordLen`
    * backtrace steps re-reading the final DP table, the round's usage
    * counts, and — after every non-final round — the prune CTE (top-k
    * multis by (usage desc, piece), character floor). Round r+1's
    * costs come from round r's pruned usage — SentencePiece's hard-EM
    * shape, fully unrolled. All CTEs are word-count-sized. With
    * `perRound` the final select unions every round's usage table
    * (q215's per-round parity); otherwise only the last round's.
    */
  private def unigramRoundsSql(maxWordLen: Int, maxPieceLen: Int,
      keeps: Seq[Int], perRound: Boolean): String = {
    // one Viterbi pass under cost table `cost`: DP + backtrace +
    // per-word piece rows in CTE `${s}p`
    def chain(s: String, cost: String): String = {
      val dpSteps = (1 to maxWordLen).map { i =>
        s"""${s}d$i AS MATERIALIZED (
           |  SELECT word, pos, cost, bp FROM ${s}d${i - 1}
           |  UNION ALL
           |  SELECT word, $i AS pos, cost, bp FROM (
           |    SELECT d.word AS word, d.cost + c.cost AS cost, d.pos AS bp,
           |      row_number() OVER (PARTITION BY d.word
           |        ORDER BY d.cost + c.cost ASC, d.pos ASC) AS rn
           |    FROM ${s}d${i - 1} d JOIN $cost c
           |      ON c.piece = substr(d.word, CAST(d.pos + 1 AS INTEGER),
           |                          $i - d.pos)
           |    WHERE d.pos >= $i - $maxPieceLen AND d.pos < $i
           |      AND len(d.word) >= $i)
           |  WHERE rn = 1)""".stripMargin
      }
      val btSteps = (1 to maxWordLen).map { k =>
        s"""${s}b$k AS MATERIALIZED (
           |  SELECT b.word AS word, d.bp AS pos,
           |    substr(b.word, CAST(d.bp + 1 AS INTEGER),
           |           CAST(b.pos - d.bp AS INTEGER)) AS piece
           |  FROM ${s}b${k - 1} b JOIN ${s}d$maxWordLen d
           |    ON d.word = b.word AND d.pos = b.pos
           |  WHERE b.pos > 0)""".stripMargin
      }
      val pieceUnion = (1 to maxWordLen)
        .map(k => s"SELECT word, piece FROM ${s}b$k").mkString("\nUNION ALL\n")
      s"""${s}d0 AS MATERIALIZED (
         |  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, -1 AS bp
         |  FROM w),
         |${dpSteps.mkString(",\n")},
         |${s}b0 AS (SELECT word, len(word) AS pos FROM w),
         |${btSteps.mkString(",\n")},
         |${s}p AS (${pieceUnion})""".stripMargin
    }
    def costCte(name: String, src: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT piece,
         |    CAST(floor((CAST(0.0 AS DOUBLE) -
         |      ln(CAST(cnt AS DOUBLE) /
         |         (SELECT CAST(sum(cnt) AS DOUBLE) FROM $src)))
         |      * 1000000.0) AS BIGINT) AS cost
         |  FROM $src)""".stripMargin
    def usageCte(name: String, pieceSrc: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT piece, CAST(sum(wcnt) AS BIGINT) AS cnt
         |  FROM $pieceSrc JOIN w USING (word) GROUP BY piece)""".stripMargin
    val nRounds = keeps.length + 1
    val roundCtes = (1 to nRounds).flatMap { r =>
      val base = Seq(
        costCte(s"c$r", if (r == 1) "sp" else s"v$r"),
        chain(s"r$r", s"c$r"),
        usageCte(s"n$r", s"r${r}p"))
      // prune: top-k multis by (usage desc, piece asc) + the
      // character floor (every seed single char, usage else 1)
      val prune = if (r > keeps.length) Nil else Seq(
        s"""v${r + 1} AS MATERIALIZED (
           |  SELECT piece, cnt FROM (
           |    SELECT piece, cnt,
           |      row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
           |    FROM n$r WHERE len(piece) > 1)
           |  WHERE rk <= ${keeps(r - 1)}
           |  UNION ALL
           |  SELECT s.piece, COALESCE(n$r.cnt, 1) AS cnt
           |  FROM (SELECT DISTINCT piece FROM sp WHERE len(piece) = 1) s
           |  LEFT JOIN n$r USING (piece))""".stripMargin)
      base ++ prune
    }.mkString(",\n")
    val finalSelect =
      if (perRound)
        (1 to nRounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS em_round, piece, " +
            s"CAST(cnt AS BIGINT) AS n_uses FROM n$r")
          .mkString("\nUNION ALL\n")
      else s"SELECT piece, CAST(cnt AS BIGINT) AS n_uses FROM n$nRounds"
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, count(*) AS wcnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' AND len(word) <= $maxWordLen GROUP BY word),
       |sp AS MATERIALIZED (
       |  SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER))
       |      AS piece,
       |    CAST(sum(wcnt) AS BIGINT) AS cnt
       |  FROM w,
       |    unnest(generate_series(1, len(word))) AS ti(i),
       |    unnest(generate_series(1, $maxPieceLen)) AS tl(l)
       |  WHERE i + l - 1 <= len(word)
       |  GROUP BY 1),
       |$roundCtes
       |$finalSelect""".stripMargin
  }

  /** q200 oracle: the engine's journey segmentation (per-user
    * conversion-split windows) and transition counts in SQL, then
    * `rounds` micro-grid value-iteration steps unrolled as CTEs for the
    * base chain and for each removed channel. Masses are HUGEINT until
    * the final BIGINT casts; every division is a single `//` per state
    * per round, exactly mirroring the engine's `div` fold. The channel
    * list is the driver data's fixed non-conversion event types.
    */
  private def markovRemovalOracleSql(rounds: Int): String = {
    val channels = Seq("click", "error", "signup", "view")
    val scenarios = ("base", None) +: channels.map(c => (c, Some(c)))
    def vCtes(tag: String, removed: Option[String]): String = {
      val zero = s"v_${tag}_0 AS MATERIALIZED (" +
        "SELECT DISTINCT f AS state, CAST(0 AS HUGEINT) AS mass FROM m)"
      val steps = (1 to rounds).map { r =>
        val mass = removed match {
          case Some(c) =>
            s"CASE WHEN m.f = '$c' THEN 0 ELSE " +
              "sum(m.c * CASE WHEN m.t = 'CONV' THEN 1000000 " +
              "WHEN m.t = 'NULL' THEN 0 " +
              "ELSE COALESCE(p.mass, 0) END) // m.ns END"
          case None =>
            "sum(m.c * CASE WHEN m.t = 'CONV' THEN 1000000 " +
              "WHEN m.t = 'NULL' THEN 0 " +
              "ELSE COALESCE(p.mass, 0) END) // m.ns"
        }
        s"""v_${tag}_$r AS MATERIALIZED (
           |  SELECT m.f AS state, $mass AS mass
           |  FROM m LEFT JOIN v_${tag}_${r - 1} p ON m.t = p.state
           |  GROUP BY m.f, m.ns)""".stripMargin
      }
      (zero +: steps).mkString(",\n")
    }
    val fin = channels.map { c =>
      s"""SELECT '$c' AS channel,
         |  (SELECT mass FROM v_base_$rounds WHERE state = 'START') AS basep,
         |  (SELECT mass FROM v_${c}_$rounds WHERE state = 'START')
         |    AS removedp""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT user_id, event_type, ts, event_id,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isc,
       |    COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS j
       |  FROM events),
       |t0 AS (SELECT event_type, isc,
       |    lag(event_type) OVER w AS prv, lead(event_type) OVER w AS nxt
       |  FROM e WINDOW w AS (PARTITION BY user_id, j ORDER BY ts, event_id)),
       |tr AS (SELECT COALESCE(prv, 'START') AS f,
       |         CASE WHEN isc = 1 THEN 'CONV' ELSE event_type END AS t
       |       FROM t0
       |       UNION ALL
       |       SELECT event_type, 'NULL' FROM t0 WHERE nxt IS NULL AND isc = 0),
       |m AS MATERIALIZED (
       |  SELECT f, t, count(*) AS c,
       |         sum(count(*)) OVER (PARTITION BY f) AS ns
       |  FROM tr GROUP BY f, t),
       |${scenarios.map { case (tag, rm) => vCtes(tag, rm) }.mkString(",\n")},
       |fin AS ($fin),
       |re AS (SELECT channel, basep, removedp, basep - removedp AS eff
       |       FROM fin),
       |tt AS (SELECT sum(eff) AS tot FROM re)
       |SELECT channel, CAST(basep AS BIGINT) AS base_p_micros,
       |  CAST(removedp AS BIGINT) AS removed_p_micros,
       |  CAST(eff AS BIGINT) AS removal_effect_micros,
       |  CAST(CASE WHEN tot = 0 THEN 0 ELSE (eff * 1000000) // tot END
       |    AS BIGINT) AS share_micros
       |FROM re, tt""".stripMargin
  }

  /** q193 oracle: q191's pair/agreement derivation, then `rounds` EM
    * rounds unrolled as CTE triples (ew = grid posteriors, es = BIGINT
    * micro sums, ep = the round's parameters as mirrored IEEE
    * divisions). Every product chain is LEFT-ASSOCIATED exactly like
    * the engine's fold, and every 1−x is written out (never a folded
    * constant) — the q139 lesson at EM scale.
    */
  private def emLinkageOracleSql(rounds: Int): String = {
    val fs = 1 to 4
    def gList = fs.map(i => s"g$i").mkString(", ")
    def chain(base: String, term: Int => String): String =
      fs.foldLeft(base)((acc, i) => s"($acc * ${term(i)})")
    def cse(i: Int, hit: String, miss: String) =
      s"CASE WHEN g$i = 1 THEN $hit ELSE $miss END"
    def ewCte(r: Int): String = {
      val (from, num, alt) =
        if (r == 1) ("pr, u1, u2, u3, u4",
          chain("CAST(0.1 AS DOUBLE)", i => cse(i, "CAST(0.9 AS DOUBLE)",
            "(CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))")),
          chain("(CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE))",
            i => cse(i, s"u$i.u", s"(CAST(1.0 AS DOUBLE) - u$i.u)")))
        else (s"pr, ep${r - 1}",
          chain(s"ep${r - 1}.p", i => cse(i, s"ep${r - 1}.m$i",
            s"(CAST(1.0 AS DOUBLE) - ep${r - 1}.m$i)")),
          chain(s"(CAST(1.0 AS DOUBLE) - ep${r - 1}.p)",
            i => cse(i, s"ep${r - 1}.uu$i",
              s"(CAST(1.0 AS DOUBLE) - ep${r - 1}.uu$i)")))
      s"""ew$r AS MATERIALIZED (
         |  SELECT $gList,
         |    CAST(round(1000000.0 * (num / (num + alt))) AS BIGINT) AS w
         |  FROM (SELECT $gList, $num AS num, $alt AS alt FROM $from))"""
        .stripMargin
    }
    def esCte(r: Int): String =
      s"""es$r AS (SELECT count(*) AS n, CAST(sum(w) AS BIGINT) AS sw,
         |  ${fs.map(i => s"CAST(sum(w * g$i) AS BIGINT) AS swg$i, " +
              s"CAST(sum(g$i) AS BIGINT) AS sg$i").mkString(",\n  ")}
         |  FROM ew$r)""".stripMargin
    def epCte(r: Int): String =
      s"""ep$r AS (SELECT
         |  CAST(sw AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS p,
         |  ${fs.map(i =>
              s"CAST(swg$i AS DOUBLE) / CAST(sw AS DOUBLE) AS m$i, " +
              s"CAST(sg$i * 1000000 - swg$i AS DOUBLE) / " +
              s"CAST(n * 1000000 - sw AS DOUBLE) AS uu$i")
              .mkString(",\n  ")}
         |  FROM es$r)""".stripMargin
    val roundCtes = (1 to rounds)
      .map(r => Seq(ewCte(r), esCte(r), epCte(r)).mkString(",\n"))
      .mkString(",\n")
    s"""WITH c AS (SELECT c_custkey AS id, c_mktsegment AS b1,
       |    c_nationkey AS f1,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS f2,
       |    substr(c_name, length(c_name) - 1, 1) AS f3,
       |    substr(c_name, length(c_name), 1) AS f4
       |  FROM customer),
       |${fs.map(i =>
            s"""u$i AS (SELECT CAST(sum(n * n) AS DOUBLE) /
               |  (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) AS u
               |  FROM (SELECT count(*) AS n FROM c GROUP BY f$i))"""
              .stripMargin).mkString(",\n")},
       |pr AS (SELECT
       |  ${fs.map(i =>
            s"CASE WHEN a.f$i IS NOT DISTINCT FROM b.f$i THEN 1 ELSE 0 END AS g$i")
            .mkString(",\n  ")}
       |  FROM c a JOIN c b ON a.b1 = b.b1 AND a.id < b.id),
       |$roundCtes
       |SELECT field, p_est, m_est, u_est FROM (
       |  ${fs.map(i =>
            s"SELECT 'f$i' AS field, round(p, 6) AS p_est, " +
              s"round(m$i, 6) AS m_est, round(uu$i, 6) AS u_est " +
              s"FROM ep$rounds").mkString("\n  UNION ALL ")})"""
      .stripMargin
  }

  /** Synchronous BFS levels over `e(src, dst)` (q188 oracle, both
    * orientations already in `e`): bv0 seeds every node at itself,
    * bh`t` is level t's FRESH frontier (expanded from bh`t-1` only,
    * anti-joined against the full visited set bv`t-1`) — the engine's
    * frontier loop exactly. MATERIALIZED per the chained-CTE rule.
    */
  private def bfsRoundsSql(maxDepth: Int): String = {
    val steps = (1 to maxDepth).map { t =>
      val prev = if (t == 1) "bv0" else s"bh${t - 1}"
      s"""bh$t AS MATERIALIZED (
         |  SELECT DISTINCT fr.root, e.dst AS node
         |  FROM $prev fr JOIN e ON e.src = fr.node
         |  WHERE NOT EXISTS (SELECT 1 FROM bv${t - 1} x
         |    WHERE x.root = fr.root AND x.node = e.dst)),
         |bv$t AS MATERIALIZED (
         |  SELECT root, node FROM bv${t - 1}
         |  UNION ALL SELECT root, node FROM bh$t)""".stripMargin
    }.mkString(",\n")
    s"""bv0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS root, src AS node FROM e),
       |$steps""".stripMargin
  }

  /** Synchronous k-core peel rounds over `e(src, dst)` (q184 oracle,
    * both orientations already in `e`): per round the live-subgraph
    * degree (count edges whose dst is still alive, left-joined back onto
    * the alive set so zero-degree nodes peel too), then peel everything
    * below `k` at once. Emits ka0..ka`rounds` (alive sets), kd1..kd`rounds`
    * (per-round live degrees) and `kdfin` (survivor degrees) —
    * MATERIALIZED per the standing chained-CTE rule.
    */
  private def kCoreRoundsSql(k: Int, rounds: Int): String = {
    def degOver(alive: String, name: String) =
      s"""$name AS MATERIALIZED (
         |  SELECT a.node, CAST(coalesce(c.cnt, 0) AS BIGINT) AS deg
         |  FROM $alive a LEFT JOIN (
         |    SELECT e.src AS node, count(*) AS cnt FROM e
         |    JOIN $alive y ON y.node = e.dst GROUP BY 1) c
         |    USING (node))""".stripMargin
    val steps = (1 to rounds).map { t =>
      s"""${degOver(s"ka${t - 1}", s"kd$t")},
         |ka$t AS MATERIALIZED (SELECT node FROM kd$t WHERE deg >= $k)"""
        .stripMargin
    }.mkString(",\n")
    s"""ka0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |$steps,
       |${degOver(s"ka$rounds", "kdfin")}""".stripMargin
  }

  /** Synchronous-LPA rounds over `e(src, dst)` (q173 oracle): per round,
    * the incoming-label histogram per node and the (count DESC, label
    * ASC) argmax — integer-deterministic, MATERIALIZED per the standing
    * chained-CTE rule.
    */
  private def lpaRoundsSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""c$t AS (SELECT e.dst AS node, l.lbl, count(*) AS c
         |       FROM e JOIN l${t - 1} l ON l.node = e.src GROUP BY 1, 2),
         |l$t AS MATERIALIZED (
         |       SELECT p.node, coalesce(w.lbl, p.lbl) AS lbl
         |       FROM l${t - 1} p LEFT JOIN (
         |         SELECT node, lbl FROM (
         |           SELECT node, lbl, row_number() OVER (PARTITION BY node
         |             ORDER BY c DESC, lbl) AS rn FROM c$t)
         |         WHERE rn = 1) w USING (node))""".stripMargin
    }.mkString(",\n")
    s"""l0 AS MATERIALIZED (SELECT node, node AS lbl FROM
       |       (SELECT src AS node FROM e UNION SELECT dst FROM e)),
       |$rounds""".stripMargin
  }

  /** Weighted sibling of [[pageRankRoundsSql]] over `e(src, dst, w)`:
    * per-edge flow (rnk·w) // wsum, the q170 engine loop exactly.
    */
  private def pageRankWeightedRoundsSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""r$t AS MATERIALIZED (
         |       SELECT n.node, CAST(150000 +
         |         (85 * CAST(coalesce(f.infl, 0) AS BIGINT)) // 100 AS BIGINT) AS rnk
         |       FROM pnodes n LEFT JOIN (
         |         SELECT e.dst AS node,
         |                CAST(sum((r.rnk * e.w) // d.wsum) AS BIGINT) AS infl
         |         FROM e JOIN wdeg d USING (src) JOIN r${t - 1} r ON r.node = e.src
         |         GROUP BY 1) f USING (node))""".stripMargin
    }.mkString(",\n")
    s"""wdeg AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wsum
       |        FROM e GROUP BY 1),
       |pnodes AS MATERIALIZED (SELECT src AS node FROM e
       |        UNION SELECT dst FROM e),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rnk FROM pnodes),
       |$rounds""".stripMargin
  }

  /** Shared PageRank power-iteration rounds (q158/q169 oracles): emits
    * the deg/r0..r`iters` CTE chain over an already-defined `e(src, dst)`
    * CTE — the exact integer-grid round
    * r' = 150000 + (85·Σ(r div deg)) div 100 the engine loop computes.
    * MATERIALIZED: DuckDB inlines CTEs by default, and each round
    * references e/deg — inlining would re-expand the edge derivation
    * once per round (the q164 lesson). Sums cast back to BIGINT (DuckDB
    * widens to HUGEINT, which pandas float-ifies).
    */
  private def pageRankRoundsSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""r$t AS MATERIALIZED (
         |       SELECT n.node, CAST(150000 +
         |         (85 * CAST(coalesce(f.infl, 0) AS BIGINT)) // 100 AS BIGINT) AS rnk
         |       FROM pnodes n LEFT JOIN (
         |         SELECT e.dst AS node,
         |                CAST(sum(r.rnk // d.deg) AS BIGINT) AS infl
         |         FROM e JOIN deg d USING (src) JOIN r${t - 1} r ON r.node = e.src
         |         GROUP BY 1) f USING (node))""".stripMargin
    }.mkString(",\n")
    s"""deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |pnodes AS MATERIALIZED (SELECT src AS node FROM e
       |        UNION SELECT dst FROM e),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rnk FROM pnodes),
       |$rounds""".stripMargin
  }

  /** q284 oracle generator: the Huber IRLS unrolled — OLS init (the
    * q250 moment/Cramer CTEs), then per round the 1e6-grid weights
    * from IEEE-identical residual doubles and the weighted Cramer
    * solve (the same fixed det3 shape, written out verbatim).
    */
  private def huberOracleSql(rounds: Int, k: String = "500000.0")
      : String = {
    def wCte(r: Int): String =
      s"""w$r AS MATERIALIZED (
         |  SELECT d.x1, d.x2, d.y,
         |    CAST(round(1000000.0 * CASE
         |      WHEN abs(CAST(d.y AS DOUBLE) - (b.b0
         |        + b.b1 * CAST(d.x1 AS DOUBLE)
         |        + b.b2 * CAST(d.x2 AS DOUBLE))) <= $k THEN 1.0
         |      ELSE $k / abs(CAST(d.y AS DOUBLE) - (b.b0
         |        + b.b1 * CAST(d.x1 AS DOUBLE)
         |        + b.b2 * CAST(d.x2 AS DOUBLE))) END) AS BIGINT) AS wg
         |  FROM d CROSS JOIN hb${r - 1} b)""".stripMargin
    val wDet = "sw * (sw11 * sw22 - sw12 * sw12) " +
      "- sw1 * (sw1 * sw22 - sw12 * sw2) + sw2 * (sw1 * sw12 - sw11 * sw2)"
    def roundCtes(r: Int): String =
      s"""${wCte(r)},
         |t$r AS MATERIALIZED (
         |  SELECT CAST(sum(wg) AS DOUBLE) AS sw,
         |    CAST(sum(wg * x1) AS DOUBLE) AS sw1,
         |    CAST(sum(wg * x2) AS DOUBLE) AS sw2,
         |    CAST(sum(wg * x1 * x1) AS DOUBLE) AS sw11,
         |    CAST(sum(wg * x1 * x2) AS DOUBLE) AS sw12,
         |    CAST(sum(wg * x2 * x2) AS DOUBLE) AS sw22,
         |    CAST(sum(wg * y) AS DOUBLE) AS swy,
         |    CAST(sum(wg * x1 * y) AS DOUBLE) AS sw1y,
         |    CAST(sum(wg * x2 * y) AS DOUBLE) AS sw2y
         |  FROM w$r),
         |hb$r AS MATERIALIZED (
         |  SELECT
         |    (swy * (sw11 * sw22 - sw12 * sw12)
         |      - sw1 * (sw1y * sw22 - sw12 * sw2y)
         |      + sw2 * (sw1y * sw12 - sw11 * sw2y)) / ($wDet) AS b0,
         |    (sw * (sw1y * sw22 - sw12 * sw2y)
         |      - swy * (sw1 * sw22 - sw12 * sw2)
         |      + sw2 * (sw1 * sw2y - sw1y * sw2)) / ($wDet) AS b1,
         |    (sw * (sw11 * sw2y - sw1y * sw12)
         |      - sw1 * (sw1 * sw2y - sw1y * sw2)
         |      + swy * (sw1 * sw12 - sw11 * sw2)) / ($wDet) AS b2
         |  FROM t$r)""".stripMargin
    s"""WITH d AS MATERIALIZED (
       |  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
       |    CAST(round(100.0 * l_discount) AS BIGINT) AS x2,
       |    CAST(round(100.0 * l_extendedprice) AS BIGINT) AS y
       |  FROM lineitem),
       |s AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(x1) AS DOUBLE) AS s1,
       |    CAST(sum(x2) AS DOUBLE) AS s2,
       |    CAST(sum(x1 * x1) AS DOUBLE) AS s11,
       |    CAST(sum(x1 * x2) AS DOUBLE) AS s12,
       |    CAST(sum(x2 * x2) AS DOUBLE) AS s22,
       |    CAST(sum(y) AS DOUBLE) AS sy,
       |    CAST(sum(x1 * y) AS DOUBLE) AS s1y,
       |    CAST(sum(x2 * y) AS DOUBLE) AS s2y
       |  FROM d),
       |hb0 AS (
       |  SELECT
       |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
       |      + s2 * (s1y * s12 - s11 * s2y))
       |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       |        + s2 * (s1 * s12 - s11 * s2)) AS b0,
       |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
       |      + s2 * (s1 * s2y - s1y * s2))
       |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       |        + s2 * (s1 * s12 - s11 * s2)) AS b1,
       |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
       |      + sy * (s1 * s12 - s11 * s2))
       |      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       |        + s2 * (s1 * s12 - s11 * s2)) AS b2
       |  FROM s),
       |${(1 to rounds).map(roundCtes).mkString(",\n")},
       |${wCte(rounds + 1)},
       |fin AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN wg < 1000000 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nd
       |  FROM w${rounds + 1})
       |SELECT fin.n AS n_rows, fin.nd AS n_downweighted,
       |  round(b.b0, 6) AS b0, round(b.b1, 6) AS b1,
       |  round(b.b2, 6) AS b2
       |FROM fin CROSS JOIN hb$rounds b""".stripMargin
  }

  /** q278 oracle generator: HITS mutual-reinforcement rounds over an
    * already-defined `e(src, dst)` CTE — the exact integer-grid round
    * a(v) = (Σh·10⁶) div max, h(u) = (Σa·10⁶) div max the engine loop
    * computes. MATERIALIZED for the q164 reason (each round references
    * e and the prior scores).
    */
  private def hitsRoundsSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""ar$t AS MATERIALIZED (
         |  SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS ar
         |  FROM e JOIN h${t - 1} h ON h.node = e.src GROUP BY 1),
         |am$t AS (SELECT max(ar) AS am FROM ar$t),
         |a$t AS MATERIALIZED (
         |  SELECT node, (ar * 1000000) // am AS a
         |  FROM ar$t CROSS JOIN am$t),
         |hr$t AS MATERIALIZED (
         |  SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS hr
         |  FROM e JOIN a$t a ON a.node = e.dst GROUP BY 1),
         |hm$t AS (SELECT max(hr) AS hm FROM hr$t),
         |h$t AS MATERIALIZED (
         |  SELECT node, (hr * 1000000) // hm AS h
         |  FROM hr$t CROSS JOIN hm$t)""".stripMargin
    }.mkString(",\n")
    s"""h0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS h
       |  FROM e),
       |$rounds""".stripMargin
  }

  /** q164 oracle: the greedy MMR selection unrolled as `k` chained CTE
    * steps — legal because every comparison the greedy makes is on exact
    * integers (micro-grid rel/sims, tenths-scale score, floor division),
    * so "argmax per step" is a deterministic window rank both engines
    * agree on. Generated from the same (k, c, λ) the engine query uses.
    */
  private def mmrOracleSql: String = {
    val k = 8; val c = 24; val lam = 7; val probeMax = 3
    val steps = (2 to k).map { t =>
      s"""sel$t AS MATERIALIZED (
         |  SELECT probe_id, vec_id, s, rel, mmr, $t AS rank FROM (
         |    SELECT cnd.probe_id, cnd.vec_id, cnd.s, cnd.rel,
         |           ($lam * cnd.rel - ${10 - lam} * m.ms) // 10 AS mmr,
         |           row_number() OVER (PARTITION BY cnd.probe_id
         |             ORDER BY $lam * cnd.rel - ${10 - lam} * m.ms DESC,
         |                      cnd.vec_id) AS rn
         |    FROM cand cnd
         |    JOIN (SELECT p.probe_id, p.a_id, max(p.sim) AS ms
         |          FROM pairsim p JOIN selall${t - 1} sl
         |            ON sl.probe_id = p.probe_id AND sl.vec_id = p.b_id
         |          GROUP BY 1, 2) m
         |      ON m.probe_id = cnd.probe_id AND m.a_id = cnd.vec_id
         |    LEFT JOIN selall${t - 1} x
         |      ON x.probe_id = cnd.probe_id AND x.vec_id = cnd.vec_id
         |    WHERE x.vec_id IS NULL
         |  ) WHERE rn = 1),
         |selall$t AS MATERIALIZED (SELECT probe_id, vec_id FROM selall${t - 1}
         |  UNION ALL SELECT probe_id, vec_id FROM sel$t)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k).map(t => s"SELECT * FROM sel$t")
      .mkString(" UNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |probes AS MATERIALIZED (SELECT vec_id AS probe_id, v AS p FROM e
       |           WHERE vec_id < $probeMax),
       |cand0 AS MATERIALIZED (
       |  SELECT probe_id, e.vec_id,
       |         list_dot_product(p, v) /
       |         (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(v, v)))
       |           AS s, v
       |  FROM probes, e WHERE e.vec_id != probe_id),
       |cand AS MATERIALIZED (
       |  SELECT probe_id, vec_id, s, v,
       |         CAST(round(s * 1000000) AS BIGINT) AS rel
       |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
       |          ORDER BY s DESC, vec_id) AS rn FROM cand0)
       |  WHERE rn <= $c),
       |pairsim AS MATERIALIZED (
       |  SELECT a.probe_id, a.vec_id AS a_id, b.vec_id AS b_id,
       |         CAST(round(list_dot_product(a.v, b.v) /
       |           (sqrt(list_dot_product(a.v, a.v)) *
       |            sqrt(list_dot_product(b.v, b.v))) * 1000000) AS BIGINT)
       |           AS sim
       |  FROM cand a JOIN cand b
       |    ON a.probe_id = b.probe_id AND a.vec_id != b.vec_id),
       |sel1 AS MATERIALIZED (
       |  SELECT probe_id, vec_id, s, rel, ($lam * rel) // 10 AS mmr,
       |         1 AS rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
       |          ORDER BY $lam * rel DESC, vec_id) AS rn FROM cand)
       |  WHERE rn = 1),
       |selall1 AS MATERIALIZED (SELECT probe_id, vec_id FROM sel1),
       |$steps
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id,
       |       round(s, 6) AS sim,
       |       round(CAST(mmr AS DOUBLE) / 1000000, 6) AS mmr
       |FROM ($unionAll)""".stripMargin
  }

  /** q155 oracle, generated from [[Bm25QueryTerms]] and the same
    * (k1, b) = (1.2, 0.75) the engine query uses.
    */
  private def bm25OracleSql: String = {
    val terms = Bm25QueryTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH toks AS (SELECT doc_id,
       |    unnest(list_filter(string_split(regexp_replace(lower(trim(coalesce(text, ''))), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '), t -> t <> '')) AS term
       |  FROM documents),
       |db AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(c) AS len FROM db GROUP BY 1),
       |corpus AS (SELECT count(*) AS N, sum(len) AS toks FROM dl),
       |q(term) AS (VALUES $terms),
       |tf AS (SELECT db.doc_id, db.term, db.c FROM db JOIN q USING (term)),
       |dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
       |s AS (SELECT tf.doc_id,
       |        CAST(round(ln((CAST(N AS DOUBLE) - CAST(dfreq AS DOUBLE) + 0.5) /
       |               (CAST(dfreq AS DOUBLE) + 0.5) + 1.0) *
       |          (CAST(c AS DOUBLE) * 2.2) /
       |          (CAST(c AS DOUBLE) + 1.2 *
       |            (0.25 + 0.75 * CAST(len AS DOUBLE) /
       |              (CAST(toks AS DOUBLE) / CAST(N AS DOUBLE)))) * 1000000)
       |          AS DECIMAL(18,0)) AS mic
       |      FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term), corpus)
       |SELECT doc_id, count(*) AS n_terms_matched,
       |  round(CAST(sum(mic) / CAST(1000000 AS DECIMAL(7,0)) AS DOUBLE), 6)
       |    AS score
       |FROM s GROUP BY 1""".stripMargin
  }

  /** q153 oracle: one CTE per curve level — rx/ry extraction, the
    * s²·((3·rx) XOR ry) accumulation, consumed-bit masking, and the
    * quadrant rotation as CASE arms, generated from the same parameters
    * as [[graft.operators.Pipelines.hilbertLayout]] (bits = 21,
    * buckets = 64). Same engines-cannot-drift device as
    * [[zorderOracleSql]].
    */
  private def hilbertOracleSql: String = {
    val bits = 21
    val buckets = 64
    val mask = (1L << bits) - 1
    val base = s"SELECT CAST(l_partkey AS BIGINT) & $mask AS x, " +
      s"CAST(l_suppkey AS BIGINT) & $mask AS y, CAST(0 AS BIGINT) AS d, " +
      "l_partkey, l_suppkey FROM lineitem"
    val levels = (0 until bits).reverse.zipWithIndex.map { case (k, i) =>
      val s = 1L << k
      s"""h${i + 1} AS (SELECT
         |  CASE WHEN ((y >> $k) & 1) = 1 THEN x & ${s - 1}
         |       WHEN ((x >> $k) & 1) = 1 THEN ${s - 1} - (y & ${s - 1})
         |       ELSE y & ${s - 1} END AS x,
         |  CASE WHEN ((y >> $k) & 1) = 1 THEN y & ${s - 1}
         |       WHEN ((x >> $k) & 1) = 1 THEN ${s - 1} - (x & ${s - 1})
         |       ELSE x & ${s - 1} END AS y,
         |  d + ${s * s} * xor(3 * ((x >> $k) & 1), (y >> $k) & 1) AS d,
         |  l_partkey, l_suppkey FROM h$i)""".stripMargin
    }
    s"""WITH h0 AS ($base),
       |${levels.mkString(",\n")},
       |m AS (SELECT max(d) AS mh FROM h$bits)
       |SELECT (d * $buckets) // (mh + 1) AS hbucket, count(*) AS n_rows,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM h$bits, m
       |GROUP BY 1""".stripMargin
  }

  /** q134 oracle: the 21-bit-per-dimension interleave written out as
    * integer arithmetic, generated from the same parameters as
    * [[graft.operators.Pipelines.zorderKey]] (bitsPerDim = 21,
    * buckets = 64 ⇒ top-bit shift 36).
    */
  private def zorderOracleSql: String = {
    val bits = 21
    def terms(c: String, odd: Int): String = (0 until bits).map { i =>
      s"(((CAST($c AS BIGINT) >> $i) & 1) * ${1L << (2 * i + odd)})"
    }.mkString(" + ")
    val z = terms("l_partkey", 0) + " + " + terms("l_suppkey", 1)
    s"""WITH zt AS (SELECT $z AS z, l_partkey, l_suppkey FROM lineitem),
       |m AS (SELECT max(z) AS mz FROM zt)
       |SELECT (z * 64) // (mz + 1) AS zbucket, count(*) AS n_rows,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM zt, m
       |GROUP BY 1""".stripMargin
  }

  /** q136 oracle: rate CASE + hash-bucket membership, generated from the
    * same [[TemperatureWeights]]/T the engine query embeds.
    */
  private def temperatureOracleSql: String = {
    val rates = graft.operators.Pipelines
      .temperatureRatePct(TemperatureWeights, temperature = 2.0)
    val caseSql = rates.toSeq.sorted
      .map { case (l, p) => s"WHEN '$l' THEN $p" }.mkString(" ")
    val bucket = "((((doc_id % 1000003) * 2654435761) >> 16) % 100)"
    s"""SELECT doc_id, lang, $bucket AS bucket,
       |  CAST(CASE lang $caseSql ELSE 0 END AS BIGINT) AS rate_pct
       |FROM documents
       |WHERE $bucket < (CASE lang $caseSql ELSE 0 END)""".stripMargin
  }

  private def bpeEncodeOracleSql: String = {
    def wrap(s: String) = s"chr(31)||'$s'||chr(30)"
    val merged = BpeTrain.DefaultMerges.foldLeft("s0") { case (e, (l, r)) =>
      s"replace($e, ${wrap(l)}||${wrap(r)}, ${wrap(l + r)})"
    }
    s"""WITH w AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(
       |      replace(replace(text, chr(31), ''), chr(30), ''), '[^ \\t\\n\\x0B\\f\\r]+')) AS word
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(
       |      regexp_split_to_array(word, ''), c -> chr(31)||c||chr(30)), '')
       |      AS s0
       |  FROM w),
       |m AS (SELECT doc_id, $merged AS sm FROM s),
       |t AS (
       |  SELECT doc_id, count(*) AS ws,
       |         CAST(sum(len(sm) - len(replace(sm, chr(31), ''))) AS BIGINT)
       |           AS bpe
       |  FROM m GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(t.ws, 0) AS BIGINT) AS ws_tokens,
       |       CAST(coalesce(t.bpe, 0) AS BIGINT) AS bpe_tokens
       |FROM documents d LEFT JOIN t ON d.doc_id = t.doc_id""".stripMargin
  }
}
