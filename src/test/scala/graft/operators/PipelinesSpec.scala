package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  /** Scala mirror of [[Pipelines.hashBucket]]. */
  private def referenceBucket(id: Long): Long =
    math.floorMod((math.floorMod(id, 1000003L) * 2654435761L) >> 16, 100L)

  test("clean-corpus: dedup applied, filters monotone, token totals conserved") {
    val docs = Tables.documents(spark, sf)
    val out = Pipelines.cleanCorpusStats(docs, minTokens = 10L, maxPunctRatio = 0.2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.nonEmpty)
    // kept docs never exceed distinct texts per language
    val distinctTexts = docs.groupBy($"lang")
      .agg(countDistinct($"text").as("n")).as[(String, Long)].collect().toMap
    out.foreach { case (lang, (kept, toks)) =>
      assert(kept <= distinctTexts(lang), s"$lang kept $kept > distinct ${distinctTexts(lang)}")
      assert(toks >= kept * 10, s"$lang: $toks tokens for $kept docs violates minTokens")
    }
    // loosening both thresholds can only keep MORE documents
    val loose = Pipelines.cleanCorpusStats(docs, minTokens = 1L, maxPunctRatio = 1.0)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    out.foreach { case (lang, (kept, _)) =>
      assert(loose(lang) >= kept)
    }
  }

  test("trainSplit: deterministic, order-independent, respects percentages") {
    val docs = graft.Tables.documents(spark, sf)
    val a = Pipelines.trainSplit(docs, "doc_id")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // rerun over a different physical layout -> identical assignment
    val b = Pipelines.trainSplit(docs.repartition(7), "doc_id")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // bucket boundaries define the split label exactly
    a.foreach { case (id, bucket, split) =>
      assert(bucket == referenceBucket(id))
      val expect = if (bucket < 80) "train" else if (bucket < 90) "valid" else "test"
      assert(split == expect, s"doc $id")
    }
    // every split is populated and train dominates (multiplicative hashing
    // spreads sequential ids near-uniformly over buckets)
    val byS = a.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byS.keySet == Set("train", "valid", "test"))
    assert(byS("train") > byS("valid") && byS("train") > byS("test"))
  }

  test("trainSplit: strided id schemes spread over buckets; huge ids don't overflow") {
    // ids all ≡ 0 (mod 100) — block/sharded allocation. A bare
    // (id * mult) % 100 bucket is a bijection of id % 100, so ALL of these
    // would land in ONE bucket and the split would be 100/0/0.
    val strided = (0L until 500L).map(_ * 100L).toDF("doc_id")
    val byBucket = Pipelines.trainSplit(strided, "doc_id")
      .groupBy($"bucket").count().as[(Long, Long)].collect().toMap
    assert(byBucket.size > 50, s"strided ids hit only ${byBucket.size} buckets")
    val bySplit = Pipelines.trainSplit(strided, "doc_id")
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "valid", "test"))
    // ids beyond 3.47e9 overflowed Long multiply under ANSI mode with the
    // naive formula; the mod-prime pre-reduction must keep this safe up to
    // Long.MaxValue.
    val huge = Seq(3470000000L, Long.MaxValue, Long.MaxValue - 1).toDF("doc_id")
    val hugeOut = Pipelines.trainSplit(huge, "doc_id")
      .as[(Long, Long, String)].collect()
    hugeOut.foreach { case (id, bucket, _) =>
      assert(bucket == referenceBucket(id) && bucket >= 0 && bucket < 100, s"id $id")
    }
    // negative ids: Spark pmod and other engines' signed % disagree, so
    // the bucket must refuse rather than silently differ per engine
    val negErr = intercept[Exception] {
      Seq(-1L).toDF("doc_id").select(Pipelines.hashBucket($"doc_id")).collect()
    }
    assert(negErr.getMessage.contains("negative id"), negErr.getMessage)
  }

  test("groupSample: prefiltered ranking equals the unfiltered top-k per group") {
    val docs = graft.Tables.documents(spark, sf)
    val got = Pipelines.groupSample(docs, "doc_id", "lang", k = 10, prefilterPct = 20)
      .as[(Long, String, Long)].collect().toSet
    // ground truth: full ranking with NO prefilter, in Scala
    val all = docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    val expect = all.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.map(_._1).sortBy(id => (referenceBucket(id), id)).take(10)
        .zipWithIndex.map { case (id, i) => (id, lang, i + 1L) }
    }.toSet
    assert(got == expect && got.nonEmpty)
    // determinism across runs
    val again = Pipelines.groupSample(docs, "doc_id", "lang", k = 10, prefilterPct = 20)
      .as[(Long, String, Long)].collect().toSet
    assert(again == got)
  }

  test("groupSample: rare groups deliver k rows via the deficiency fallback") {
    // group "rare" has 12 rows — with prefilterPct=20 only ~2-3 survive the
    // bucket filter, far short of k=10: the operator must detect the
    // deficiency and rank ALL rare rows instead of silently under-sampling
    val docs = ((0L until 500L).map(i => (i, "big")) ++
      (1000L until 1012L).map(i => (i, "rare"))).toDF("doc_id", "lang")
    val got = Pipelines.groupSample(docs, "doc_id", "lang", k = 10, prefilterPct = 20)
      .as[(Long, String, Long)].collect()
    val byGroup = got.groupBy(_._2)
    assert(byGroup("big").length == 10)
    assert(byGroup("rare").length == 10, s"rare group under-sampled: ${byGroup("rare").toSeq}")
    // and the result is still exactly the unfiltered ranking
    val expect = Seq("big" -> (0L until 500L), "rare" -> (1000L until 1012L))
      .flatMap { case (lang, ids) =>
        ids.sortBy(id => (referenceBucket(id), id)).take(10)
          .zipWithIndex.map { case (id, i) => (id, lang, i + 1L) }
      }.toSet
    assert(got.toSet == expect)
  }

  test("groupSample: groups with ZERO prefilter survivors are not dropped") {
    // ids 6 and 7 hash to buckets 20 and 24 — both above the cutoff, so a
    // survivors-only deficiency check would never see group "tiny" at all
    assert(referenceBucket(6L) >= 20 && referenceBucket(7L) >= 20)
    val docs = (Seq((6L, "tiny"), (7L, "tiny")) ++
      (0L until 500L).map(i => (i * 2 + 100, "big"))).toDF("doc_id", "lang")
    val got = Pipelines.groupSample(docs, "doc_id", "lang", k = 10, prefilterPct = 20)
      .as[(Long, String, Long)].collect()
    val tiny = got.filter(_._2 == "tiny").sortBy(_._3)
    assert(tiny.map(t => (t._1, t._3)).toSeq ==
      Seq(6L, 7L).sortBy(id => (referenceBucket(id), id)).zipWithIndex
        .map { case (id, i) => (id, i + 1L) })
    assert(got.count(_._2 == "big") == 10)
  }

  test("stratifiedSample: per-stratum rates honored exactly and deterministically") {
    val docs = graft.Tables.documents(spark, sf)
    val rates = Map("en" -> 50, "de" -> 30, "fr" -> 20, "es" -> 10)
    val out = Pipelines.stratifiedSample(docs, "doc_id", "lang", rates, defaultPct = 100)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    // membership is exactly the bucket predicate — no rng, no order effects
    val all = docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    val expect = all.filter { case (id, lang) =>
      referenceBucket(id) < rates.getOrElse(lang, 100)
    }.toSet
    assert(out == expect && out.nonEmpty && out.size < all.length)
    // unlisted strata use the default rate (here: keep everything)
    val perLang = all.groupBy(_._2).view.mapValues(_.length).toMap
    val keptPerLang = out.groupBy(_._2).view.mapValues(_.size).toMap
    perLang.keys.filterNot(rates.contains).foreach { lang =>
      assert(keptPerLang.getOrElse(lang, 0) == perLang(lang), s"default rate broke $lang")
    }
    // rate 0 excludes a stratum entirely
    val none = Pipelines.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0), defaultPct = 100)
    assert(none.filter($"lang" === "en").isEmpty)
  }

  test("corpusPrep: one-plan composition equals the stage-by-stage operators") {
    val docs = graft.Tables.documents(spark, sf)
    val got = Pipelines.corpusPrep(docs)
      .as[(String, String, Long, Long)].collect().toSet
    // stage-by-stage with the already-proven public operators
    val train = docs.filter(pmod($"doc_id", lit(10)) =!= 7)
    val bench = docs.filter(pmod($"doc_id", lit(10)) === 7)
    val deduped = train.groupBy($"text")
      .agg(min(struct($"doc_id", $"lang")).as("k"))
      .select($"k.doc_id".as("doc_id"), $"k.lang".as("lang"), $"text")
    val quality = deduped
      .withColumn("n_tokens", TextAnalysis.tokenCount($"text"))
      .withColumn("pr",
        size(regexp_extract_all($"text", lit("[^\\w\\s]"), lit(0))).cast("double") /
          greatest(length($"text").cast("double"), lit(1.0)))
      .filter($"n_tokens" >= 10 && $"pr" <= 0.2)
    val clean = Contamination.decontaminate(quality, bench, "text", "doc_id",
      n = 4, minShared = 2)
    val expect = clean
      .join(Pipelines.trainSplit(clean.select($"doc_id"), "doc_id"), "doc_id")
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("t"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
    // sanity: every (lang, split) cell is a subset of the dedup survivors
    assert(got.map(_._3).sum <= deduped.count())
  }

  test("packSequences: boundary docs split, exact-fit docs don't, cum conserves tokens") {
    // single shard, capacity 10, token counts 4,5,3,10,8 → cums 4,9,12,22,30
    val docs = Seq(
      (1L, "w w w w"),            // pack 0
      (2L, "w w w w w"),          // cum 9  → pack 0
      (3L, "w w w"),              // cum 12 → spans 9..11: packs 0→1, SPLIT
      (4L, "w w w w w w w w w w"),// cum 22 → spans 12..21: packs 1→2, SPLIT
      (5L, "w w w w w w w w"))    // cum 30 → spans 22..29: pack 2 exactly, NO split
      .toDF("doc_id", "text")
    val got = Pipelines.packSequences(docs, "doc_id", capacity = 10L, shards = 1)
      .orderBy($"doc_id")
      .select($"doc_id", $"cum_tokens", $"pack_id", $"is_split")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0L, 0), (2L, 9L, 0L, 0), (3L, 12L, 1L, 1),
      (4L, 22L, 2L, 1), (5L, 30L, 2L, 0)))
    // real corpus: per-shard running sum conserves the shard's tokens and
    // pack ids recompute locally from the cums
    val real = Pipelines.packSequences(
      graft.Tables.documents(spark, sf), "doc_id", capacity = 256L, shards = 16)
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    val byShard = real.groupBy(_._1)
    byShard.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      assert(sorted.map(_._4).toSeq == cums.toSeq, "running sum mismatch")
    }
    real.foreach { case (_, _, n, cum, pack, split) =>
      assert(pack == (cum - 1) / 256L)
      assert(split == (if ((cum - 1) / 256L != (cum - n) / 256L) 1 else 0))
    }
  }

  test("zscoreNormalize: matches local computation; zero-variance group yields NULL") {
    val ev = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "const", 5.0), (5L, "const", 5.0), // sd = 0 → z NULL
      (6L, "single", 7.0))                    // n = 1 → sd NULL → z NULL
      .map { case (id, t, v) => (id, t, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), v) }
      .toDF("event_id", "event_type", "ts", "value")
    val got = Pipelines.zscoreNormalize(ev)
      .select($"event_id", $"z").as[(Long, Option[Double])].collect().toMap
    // group a: mean 20, sd 10 → z = -1, 0, 1
    assert(got(1L).contains(-1.0) && got(2L).contains(0.0) && got(3L).contains(1.0))
    assert(got(4L).isEmpty && got(5L).isEmpty && got(6L).isEmpty)
    // and on real data: per-group mean of z ≈ 0, sd ≈ 1 where defined
    val real = Pipelines.zscoreNormalize(graft.Tables.events(spark, sf))
      .filter($"z".isNotNull)
      .groupBy($"event_type")
      .agg(avg($"z").as("m"), stddev_samp($"z").as("s"))
      .as[(String, Double, Double)].collect()
    real.foreach { case (t, m, s) =>
      assert(math.abs(m) < 1e-4 && math.abs(s - 1.0) < 1e-4, s"group $t: m=$m s=$s")
    }
  }

  test("winsorize: hand-computed bounds clip and flag; row count preserved") {
    // group g: values 0..100 → p_lo(0.01) = 1.0, p_hi(0.99) = 99.0 under
    // linear interpolation; 0 clips up, 100 clips down, the rest pass
    val ev = (0 to 100).map(i =>
      (i.toLong, "g", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        i.toDouble))
      .toDF("event_id", "event_type", "ts", "value")
    val got = Pipelines.winsorize(ev)
      .select($"event_id", $"value_w", $"clipped")
      .as[(Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 101)
    assert(got(0L) == ((1.0, 1)) && got(100L) == ((99.0, 1)))
    assert(got(1L) == ((1.0, 0)) && got(50L) == ((50.0, 0)) &&
      got(99L) == ((99.0, 0)))
    // real data: counts preserved, winsorized values inside the bounds,
    // flag agrees with value motion
    val real = graft.Tables.events(spark, sf)
    val w = Pipelines.winsorize(real)
    assert(w.count() == real.count())
    val bad = w.filter(
      ($"clipped" === 1 && $"value_w" === round($"value", 6)) ||
        ($"clipped" === 0 && $"value_w" =!= round($"value", 6))).count()
    assert(bad == 0, s"$bad rows with inconsistent clip flag")
  }

  test("tokenBudgetSelect ≡ tokenBudgetGreedy on crafted edges and real documents") {
    // crafted: "aa" langs exercise exact-fit, overflow-inside-bucket,
    // zero-token docs on both sides of the overflow point, and a budget
    // larger than the whole language
    val docs = Seq(
      // lang p: three docs of 2 stop-tokens each (score ties!), budget 4
      // → greedy keeps doc 1, 2 (cum 2, 4), drops 3 (cum 6)
      (1L, "the of", "p"), (2L, "the of", "p"), (3L, "the of", "p"),
      // lang q: distinct scores; best doc alone overflows budget 4 →
      // greedy keeps NOTHING from bucket 1... (4 tokens of which 4 stop =
      // score 1.0, n=4 ≤ 4 budget: kept; next doc n=2 overflows)
      (4L, "the of to in", "q"), (5L, "the xx", "q"),
      // lang r: empty doc (0 tokens) sorts by (score 0.0, id) — budget 1
      // covers the 1-token doc (score 0 ties, lower id first)
      (6L, "", "r"), (7L, "zz", "r"),
      // lang s: total well under budget → everything selected
      (8L, "aa bb", "s"), (9L, "cc", "s"),
    ).toDF("doc_id", "text", "lang")
    for (budget <- Seq(1L, 2L, 4L, 100L)) {
      val fast = Pipelines.tokenBudgetSelect(docs, budget)
        .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
      val ref = Pipelines.tokenBudgetGreedy(docs, budget)
        .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
      assert(fast == ref, s"budget=$budget: $fast vs $ref")
    }
    // and on the real table at several budgets spanning partial/full langs
    val real = graft.Tables.documents(spark, sf)
    for (budget <- Seq(500L, 5000L, 1000000L)) {
      val fast = Pipelines.tokenBudgetSelect(real, budget)
        .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
      val ref = Pipelines.tokenBudgetGreedy(real, budget)
        .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
      assert(fast == ref, s"budget=$budget: sizes ${fast.size} vs ${ref.size}")
    }
  }

  test("tokenBudgetSelect plan: bucket verdicts broadcast; no corpus-wide sort by lang") {
    val plan = Pipelines.tokenBudgetSelect(graft.Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString.replace("\n", " ")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket join must broadcast:\n$plan")
    // the greedy reference's signature is a window ORDERED by
    // (score DESC, doc_id) — the corpus-wide per-lang sort. The production
    // plan's windows order by score alone (bucket-table cumsum) or doc_id
    // alone (boundary slice, where score is a PARTITION key — rendered
    // without DESC). Only the greedy form puts "score DESC" directly
    // before doc_id.
    val greedySignature = "score#\\d+ DESC NULLS LAST, doc_id".r
    assert(greedySignature.findFirstIn(plan).isEmpty,
      s"corpus-wide greedy window found in production plan:\n$plan")
    // the reference, by contrast, must trip the same detector
    val refPlan = Pipelines.tokenBudgetGreedy(
        graft.Tables.documents(spark, sf), 5000L)
      .queryExecution.executedPlan.toString.replace("\n", " ")
    assert(greedySignature.findFirstIn(refPlan).isDefined,
      "detector failed to flag the reference greedy plan")
  }

  test("corpusPrepV2: observed metrics equal independently recomputed aggregates") {
    val docs = Tables.documents(spark, sf)
    val out = Pipelines.corpusPrepV2(docs)
    val rows = out.collect() // one action computes output AND metrics
    val m = out.queryExecution.observedMetrics
    assert(m.keySet == Set("graft_prep_ingest", "graft_prep_dedup",
      "graft_prep_clean"))
    // ingest bundle vs direct recomputation on the same input slice
    val train = docs.filter(pmod($"doc_id", lit(10)) =!= 7)
    val ingest = m("graft_prep_ingest")
    assert(ingest.getAs[Long]("n_rows") == train.count())
    assert(ingest.getAs[Long]("n_empty_text") ==
      train.filter($"text".isNull || length($"text") === 0).count())
    assert(ingest.getAs[Long]("n_chars") ==
      train.agg(sum(length($"text")).cast("long")).as[Long].head())
    // dedup survivors = distinct texts in the train slice
    assert(m("graft_prep_dedup").getAs[Long]("n_rows") ==
      train.select($"text").distinct().count())
    // post-decontamination survivors = the docs the (oracled) output
    // itself aggregates — the two must describe the same population
    val nDocsOut = rows.map(_.getAs[Long]("n_docs")).sum
    assert(m("graft_prep_clean").getAs[Long]("n_rows") == nDocsOut)
  }

  test("corpusDiff: classification matrix on crafted versions; carry resolves new-first") {
    val oldV = Seq(
      (1L, "same text here", "en"),
      (2L, "old words gone soon", "de"),   // removed
      (3L, "before edit", "fr"),           // changed
    ).toDF("doc_id", "text", "lang")
    val newV = Seq(
      (1L, "same text here", "en"),
      (3L, "after the edit landed", "xx"), // changed; carry must say xx
      (4L, "brand new doc", "es"),         // added
    ).toDF("doc_id", "text", "lang")
    val got = Pipelines.corpusDiff(oldV, newV, "doc_id", "text", Seq("lang"))
      .as[(Long, String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> (("unchanged", 3L, 3L, "en")),
      2L -> (("removed", 4L, 0L, "de")),
      3L -> (("changed", 2L, 4L, "xx")),
      4L -> (("added", 0L, 3L, "es"))))
  }

  test("mixturePlan: budget split by weight, capped by availability, zero for unknown langs") {
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en"),   // 10 tokens
      (2L, "a b c", "de"),                 // 3 tokens
      (3L, "a b", "zz"),                   // lang not in weights
    ).toDF("doc_id", "text", "lang")
    val got = Pipelines.mixturePlan(docs, "lang", "text",
        Map("en" -> 0.5, "de" -> 0.5), budgetTokens = 8L)
      .select($"lang", $"tokens_available", $"target_tokens",
        $"planned_tokens", $"keep_rate")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // en: 10 available, target 4, planned 4, rate 0.4
    // de: 3 available, target 4 -> capped at 3, rate 1.0
    // zz: weight 0 -> target 0, planned 0, rate 0
    assert(got == Map(
      "en" -> ((10L, 4L, 4L, 0.4)),
      "de" -> ((3L, 4L, 3L, 1.0)),
      "zz" -> ((2L, 0L, 0L, 0.0))))
  }

  test("corpusPrepV2: one-plan composition equals the stage-by-stage operators") {
    val docs = graft.Tables.documents(spark, sf)
    val got = Pipelines.corpusPrepV2(docs)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // stage-by-stage with the already-proven public operators, including
    // the q108 passage stage between dedup and quality
    val train = docs.filter(pmod($"doc_id", lit(10)) =!= 7)
    val bench = docs.filter(pmod($"doc_id", lit(10)) === 7)
    val deduped = train.groupBy($"text")
      .agg(min(struct($"doc_id", $"lang")).as("k"))
      .select($"k.doc_id".as("doc_id"), $"k.lang".as("lang"), $"text")
    val stripped = Dedup
      .passageDedup(deduped, "text", "doc_id", chunkTokens = 20)
      .join(deduped.select($"doc_id", $"lang"), "doc_id")
      .select($"doc_id", $"lang", $"text_stripped".as("text"), $"n_dup_chunks")
    val quality = stripped
      .withColumn("n_tokens", TextAnalysis.tokenCount($"text"))
      .withColumn("pr",
        size(regexp_extract_all($"text", lit("[^\\w\\s]"), lit(0))).cast("double") /
          greatest(length($"text").cast("double"), lit(1.0)))
      .filter($"n_tokens" >= 10 && $"pr" <= 0.2)
    val clean = Contamination.decontaminate(quality, bench, "text", "doc_id",
      n = 4, minShared = 2)
    val expect = clean
      .join(Pipelines.trainSplit(clean.select($"doc_id"), "doc_id"), "doc_id")
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("t"),
        sum($"n_dup_chunks").as("d"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("chunkDocuments: overlap windows, tail chunk, short/empty docs") {
    val docs = Seq(
      (1L, (1 to 25).map(i => s"t$i").mkString(" ")), // 25 toks: 2 chunks
      (2L, "a b c"),                                  // short: 1 chunk
      (3L, ""), (4L, null.asInstanceOf[String]),      // none
      (5L, (1 to 20).map(i => s"u$i").mkString(" "))) // exact window: 1
      .toDF("doc_id", "text")
    val got = Pipelines.chunkDocuments(docs, "text", "doc_id",
      chunkTokens = 20, stride = 10)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(r => (r._1, r._2, r._4)) ==
      Seq((1L, 0L, 20L), (1L, 1L, 15L), (2L, 0L, 3L), (5L, 0L, 20L)))
    // chunk 1 of doc 1 starts at token 11 (overlap 10) and runs to 25
    assert(got(1)._3 == (11 to 25).map(i => s"t$i").mkString(" "))
    // full coverage: every token of doc 1 appears in some chunk
    assert((1 to 25).forall(i => got.take(2).exists(_._3.contains(s"t$i "))
      || got.take(2).exists(_._3.endsWith(s"t$i"))))
  }

  test("chunkDocuments: stride grid covers exactly ceil((n-c)/s)+1 chunks") {
    for (n <- Seq(1, 5, 10, 11, 19, 20, 21, 29, 30, 31, 55)) {
      val docs = Seq((1L, (1 to n).map("w" + _).mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = Pipelines.chunkDocuments(docs, "text", "doc_id",
        chunkTokens = 20, stride = 10).count()
      val expect = math.ceil(math.max(n - 20, 0) / 10.0).toLong + 1
      assert(chunks == expect, s"n=$n: got $chunks want $expect")
    }
  }

  test("unigramSurprisal: hand-computed two-doc corpus") {
    // corpus tokens: a a a b  ->  N=4, p(a)=3/4, p(b)=1/4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = Pipelines.unigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    def mic(x: Double) = math.round(x * 1e6) / 1e6
    val sa = mic(-math.log(3.0 / 4.0)) // per-token surprisal of a
    val sb = mic(-math.log(1.0 / 4.0))
    assert(got.head._1 == 1L && got.head._2 == 3L)
    assert(math.abs(got.head._3 - mic(3 * sa)) < 1e-9)
    assert(math.abs(got.head._4 - mic(3 * sa / 3)) < 1e-9)
    assert(got(1) == ((2L, 1L, sb, sb)))
    // rare-token doc scores strictly higher
    assert(got(1)._4 > got.head._4)
  }

  test("zorderKey: bit interleave matches a local reference; locality holds") {
    val ref = (a: Long, b: Long) => (0 until 21).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (7L, 3L), (12345L, 678L),
      (1048575L, 2097151L))
    val got = pts.toDF("a", "b")
      .select(Pipelines.zorderKey(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == pts.map { case (a, b) => ref(a, b) })
  }

  test("applyScd2: incremental merge == full rebuild; untouched keys skip the window") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
    val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val dim = ev.filter($"ts" < cutoff).select(
      $"user_id", $"event_type", $"value", $"ts".as("valid_from"),
      lead($"ts", 1).over(w).as("valid_to"),
      lead($"ts", 1).over(w).isNull.cast("int").as("is_current"),
      $"event_id")
    val changes = ev.filter($"ts" >= cutoff)
      .select($"user_id", $"event_type", $"value", $"ts", $"event_id")
    val got = Pipelines.applyScd2(dim, changes)
    val full = Relational.changeHistory(ev)
    assert(got.count() == ev.count())
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
    // exactly one current row per key
    val multi = got.filter($"is_current" === 1)
      .groupBy($"user_id").count().filter($"count" =!= 1).count()
    assert(multi == 0)
  }

  test("applyScd2: new keys insert; single-change key closes its current row") {
    val dim = Seq(
      (1L, "a", 1.0, "2024-01-01 00:00:00", null.asInstanceOf[String], 1, 100L))
      .toDF("user_id", "event_type", "value", "valid_from", "valid_to",
        "is_current", "event_id")
      .withColumn("valid_from", col("valid_from").cast("timestamp"))
      .withColumn("valid_to", col("valid_to").cast("timestamp"))
    val changes = Seq(
      (1L, "b", 2.0, "2024-01-02 00:00:00", 200L), // closes key 1's current
      (2L, "c", 3.0, "2024-01-03 00:00:00", 300L)) // brand-new key
      .toDF("user_id", "event_type", "value", "ts", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Pipelines.applyScd2(dim, changes)
      .select($"user_id", $"event_type", $"is_current")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 0), (1L, "b", 1), (2L, "c", 1)))
  }

  test("temperatureSample: rates follow w^(1/T); T=1 reproduces weights; kept set deterministic") {
    val weights = Map("en" -> 0.4, "de" -> 0.1)
    // T=1: rates 100 and floor(100*0.25)=25; T->inf flattens
    assert(Pipelines.temperatureRatePct(weights, 1.0) ==
      Map("en" -> 100, "de" -> 25))
    val hot = Pipelines.temperatureRatePct(weights, 100.0)
    assert(hot("de") > 25 && hot("en") == 100)
    val docs = Tables.documents(spark, sf)
    val got = Pipelines.temperatureSample(docs, "lang", "doc_id",
      weights, 1.0)
    // membership is exactly the hash rule — recompute independently
    val expect = docs
      .withColumn("bucket", Pipelines.hashBucket($"doc_id"))
      .filter(($"lang" === "en" && $"bucket" < 100) ||
        ($"lang" === "de" && $"bucket" < 25))
      .select($"doc_id").as[Long].collect().toSet
    assert(got.select($"doc_id").as[Long].collect().toSet == expect)
    // unknown langs are dropped entirely (rate 0)
    assert(got.filter(!$"lang".isin("en", "de")).count() == 0)
  }

  test("zorderLayout: buckets partition the table; envelopes bounded") {
    val li = Tables.lineitem(spark, sf)
    val got = Pipelines.zorderLayout(li).cache()
    assert(got.agg(sum($"n_rows")).as[Long].head() == li.count())
    // locality: every bucket's part envelope must be narrower than the
    // global range (the point of z-ordering) — allow the one straggler
    // bucket a degenerate envelope
    val globalSpan = li.agg(max($"l_partkey") - min($"l_partkey")).as[Long].head()
    val spans = got.select(($"max_part" - $"min_part").as[Long]).collect()
    assert(spans.count(_ < globalSpan) >= spans.length - 1)
    got.unpersist()
  }

  test("rendezvousShards: minimal movement — moved ⟺ assigned to the removed shard") {
    val got = Pipelines.rendezvousShards(
      Tables.documents(spark, sf), "doc_id", numShards = 16)
      .as[(Long, Int, Int, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, s16, s15, moved) =>
      assert(s16 >= 0 && s16 < 16 && s15 >= 0 && s15 < 15)
      assert((moved == 1) == (s16 == 15), s"doc $id: HRW must move ONLY " +
        s"docs from the removed shard (shard=$s16, after=$s15, moved=$moved)")
      if (moved == 0) assert(s16 == s15)
    }
    // the removed shard held ~1/16 of the corpus — movement is bounded
    val movedN = got.count(_._4 == 1)
    assert(movedN > 0 && movedN < got.length / 8,
      s"moved $movedN of ${got.length} — expected ~1/16")
  }

  test("rendezvousShards: assignment balanced and deterministic") {
    val a = Pipelines.rendezvousShards(
      Tables.documents(spark, sf), "doc_id", numShards = 16)
      .as[(Long, Int, Int, Int)].collect().toSet
    val b = Pipelines.rendezvousShards(
      Tables.documents(spark, sf), "doc_id", numShards = 16)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(a == b, "assignment must be a pure function of the id")
    val byShard = a.groupBy(_._2).view.mapValues(_.size)
    assert(byShard.keys.toSet == (0 until 16).toSet, "every shard populated")
    // xor-fold mixing: no shard takes a degenerate share
    assert(byShard.values.max < 3 * byShard.values.min + 16,
      s"skewed assignment: ${byShard.toMap}")
  }

  test("rendezvousShards: numShards=2 edge — removal collapses to shard 0") {
    val got = Pipelines.rendezvousShards(
      Tables.documents(spark, sf), "doc_id", numShards = 2)
      .as[(Long, Int, Int, Int)].collect()
    got.foreach { case (_, s2, s1, moved) =>
      assert(s1 == 0)
      assert((moved == 1) == (s2 == 1))
    }
  }
}
