package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Guards the plan properties the 100 TB design depends on: predicate
  * pushdown into the parquet scan, column pruning, broadcast of small
  * dimensions, map-side partial aggregation, and single-shuffle
  * aggregations. A regression here is a performance bug even if results
  * stay correct.
  */
class PlanSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): String = {
    df.collect() // finalize adaptive plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def scanMeta(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 interval join: event_type filter pushed to parquet; props column pruned") {
    val df = EventJoins.clickedDisplays(Tables.events(spark, sf), "1 HOUR")
    val plan = scanMeta(df)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(event_type,click)"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("props"), "props should be pruned from the scan")
  }

  test("q21 star join: all dimension joins broadcast, no sort-merge join") {
    val df = Relational.revenueByNation(Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf))
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dimension join fell back to sort-merge:\n$plan")
  }

  test("q6 exact dedup: map-side partial aggregation (no ranking-window sort)") {
    val df = Dedup.exact(Tables.documents(spark, sf), "text", "doc_id", Seq("lang"))
    val plan = executedPlan(df)
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"expected partial aggregation before the shuffle:\n$plan")
    assert(!plan.contains("Window"), "exact dedup must not use a window sort")
  }

  test("q20 pricing summary: exactly one shuffle (partial+final agg)") {
    val df = Relational.pricingSummary(Tables.lineitem(spark, sf))
    val plan = executedPlan(df)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, saw $shuffles:\n$plan")
  }

  test("q7 top-k: probes broadcast; partial top-k aggregate before shuffle") {
    val emb = Tables.embeddings(spark, sf)
    val df = Similarity.bruteForceTopK(emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3), 5)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n$plan")
    assert(plan.contains("partial_topkagg") || plan.toLowerCase.contains("objecthashaggregate"),
      s"expected partial top-k aggregation:\n$plan")
  }

  test("q33 as-of join: single shuffle on the key, no join operator (window formulation)") {
    val df = EventJoins.clickAttribution(Tables.events(spark, sf), "1 HOUR")
    val plan = executedPlan(df)
    // the as-of design: union -> ONE hash exchange on the key -> sort ->
    // running window. Any Join node would mean a pair-exploding fallback.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, saw $shuffles:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected running-window plan:\n$plan")
  }

  test("q34 sessionize: single shuffle with partial session aggregation") {
    val df = Relational.sessionize(Tables.events(spark, sf), "30 minutes")
    val plan = executedPlan(df)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, saw $shuffles:\n$plan")
    assert(plan.toLowerCase.contains("sessionwindow") || plan.contains("session_window"),
      s"expected session window aggregation:\n$plan")
  }

  test("q35 banded range join: no nested-loop join (bucket equi-join)") {
    val df = Relational.ordersByPriceBand(spark, Tables.orders(spark, sf))
    val plan = executedPlan(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
  }

  test("whole-stage codegen spans the native vector/hash kernels (no CodegenFallback rows)") {
    import org.apache.spark.sql.functions.col
    // similarity scoring: scan -> native cosine must sit inside one
    // WholeStageCodegen projection
    val emb = Tables.embeddings(spark, sf)
    val df = emb.select(
      graft.functions.VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"),
      graft.functions.VectorExprs.hyperplaneSignature(col("embedding"), 64, 8).as("sig"))
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"projection not inside a codegen stage:\n$plan")
    // the kernels are expressions inside the span, not fallback projections
    assert(plan.contains("vec_cosine") && plan.contains("hyperplane_signature"),
      s"native expressions missing from plan:\n$plan")
  }

  test("native minhash expression participates in codegen (not CodegenFallback)") {
    import graft.functions.MinHashSignatureExpr
    val df = Tables.documents(spark, sf)
      .select(operators.TextShingles.normalize(org.apache.spark.sql.functions.col("text")).as("n"))
      .select(operators.TextShingles.charShinglesOf(org.apache.spark.sql.functions.col("n"), 5).as("sh"))
      .select(MinHashSignatureExpr.minhashSignature(org.apache.spark.sql.functions.col("sh"), 16))
    assert(df.collect().length > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("minhash_signature"), s"expression missing from plan:\n$plan")
  }

  test("q46/q47/q49 corpus QA queries: map-only, zero shuffles") {
    val docs = Tables.documents(spark, sf)
    Seq(
      "q46" -> TextAnalysis.qualityRules(docs, "text", "doc_id"),
      "q47" -> TextAnalysis.piiRedact(docs, "text", "doc_id"),
      "q49" -> Pipelines.trainSplit(docs, "doc_id"),
    ).foreach { case (name, df) =>
      val plan = executedPlan(df)
      assert(!plan.contains("Exchange"),
        s"$name must not shuffle — it is a pure scan+project:\n$plan")
    }
  }

  test("q52/q57 single-shuffle aggregations; q68 broadcasts the change batch") {
    // pivot plans as TWO aggregations — (day, type) counts, then
    // pivotfirst on day — each with map-side partials; lock that shape
    // (a regression to a third exchange or a Window would be a bug)
    val pivotPlan = executedPlan(Relational.eventTypePivot(Tables.events(spark, sf)))
    assert("Exchange hashpartitioning".r.findAllIn(pivotPlan).length == 2,
      s"pivot must be exactly two agg exchanges:\n$pivotPlan")
    assert(pivotPlan.contains("pivotfirst") && !pivotPlan.contains("Window"),
      s"pivot shape changed:\n$pivotPlan")
    val centroidPlan = executedPlan(
      Similarity.labelCentroids(Tables.embeddings(spark, sf)))
    assert("Exchange hashpartitioning".r.findAllIn(centroidPlan).length == 1,
      s"centroids must shuffle only (label, dim) partials:\n$centroidPlan")
    assert(centroidPlan.contains("HashAggregate"), s"no partial agg:\n$centroidPlan")
    // anti-join formulation: the change keys broadcast and the base never
    // shuffles (a full-outer MERGE would shuffle BOTH sides — Spark cannot
    // broadcast any side of a full outer join)
    val o = Tables.orders(spark, sf)
    val changes = o.limit(10)
    val upsertPlan = executedPlan(Relational.upsert(o, changes, "o_orderkey"))
    assert(upsertPlan.contains("BroadcastHashJoin") && upsertPlan.contains("LeftAnti"),
      s"upsert must broadcast-anti-join the change keys:\n$upsertPlan")
    assert(!upsertPlan.contains("SortMergeJoin") &&
      !"Exchange hashpartitioning".r.findAllIn(upsertPlan).hasNext,
      s"upsert must not shuffle the base:\n$upsertPlan")
  }

  test("q48 incremental dedup: corpus side projects only (hash, text)") {
    val docs = Tables.documents(spark, sf)
    val even = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val odd = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val df = Dedup.incrementalExact(even, odd, "text", "doc_id", Seq("lang", "n_chars"))
    val plan = executedPlan(df)
    assert(plan.contains("LeftAnti"), s"expected an anti join:\n$plan")
    // the corpus-side scan must not read doc_id/lang/n_chars: its scan
    // schema carries text only (hash is derived)
    val corpusScans = plan.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("text")).toList
    assert(corpusScans.nonEmpty, s"no document scans found:\n$plan")
  }

  test("q79 compaction: map-side partial max_by, one exchange, no window") {
    val df = Relational.latestSnapshot(Tables.events(spark, sf))
    val plan = executedPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"compaction must shuffle once:\n$plan")
    // the partial aggregate sits BELOW the exchange: each partition ships
    // one candidate per key, not its raw change rows
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(plan.indexOf("partial_max_by", exchangeIdx) >= 0,
      s"expected partial max_by under the exchange:\n$plan")
    assert(!plan.contains("Window"),
      s"rank-window formulation would sort+shuffle every row:\n$plan")
  }

  test("q81 six-table join: date filter pushed to orders scan, dims broadcast") {
    val df = Relational.localSupplierVolume(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
    val meta = scanMeta(df)
    assert(meta.contains("PushedFilters") && meta.contains("o_orderdate"),
      s"date range must reach the orders scan:\n$meta")
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"supplier/nation/region chain must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the local-nation constraint must not plan a cartesian:\n$plan")
  }

  test("q87 market share: p_type filter pushed to part scan, dim chain broadcast") {
    val df = Relational.marketShare(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf), Tables.part(spark, sf))
    val meta = scanMeta(df)
    assert(meta.contains("EqualTo(p_type,ECONOMY)"),
      s"p_type filter must reach the part scan:\n$meta")
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"part/supplier/nation/region chain must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"market-share ratio must not plan a cartesian:\n$plan")
  }

  test("q93 small-qty revenue: ONE lineitem scan (window decorrelation); part broadcasts") {
    val df = Relational.smallQuantityRevenue(
      Tables.lineitem(spark, sf), Tables.part(spark, sf))
    val plan = executedPlan(df)
    assert("Scan parquet".r.findAllIn(plan).length == 2,
      s"window decorrelation must scan lineitem once + part once:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"part dimension must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"decorrelated form must stay an equi-join:\n$plan")
  }

  test("q94 large orders: the fact aggregation's survivors demote both joins to broadcast") {
    val df = Relational.largeQuantityOrders(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf))
    val plan = executedPlan(df)
    // AQE sees the tiny post-HAVING side at runtime: no sort-merge join
    // should survive — the 100 TB fact table is shuffled once (its own
    // aggregation), never for a join
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"post-aggregation joins must broadcast under AQE:\n$plan")
  }

  test("q95 z-score: stats broadcast back onto events — no window, no full-data re-key") {
    val df = Pipelines.zscoreNormalize(Tables.events(spark, sf))
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"per-group stats must broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"z-score must not funnel the fact table through a per-group window:\n$plan")
  }

  test("q97 chi-square: events scanned once, cell-count exchange reused for marginals") {
    val df = Relational.contingencyChiSquare(Tables.events(spark, sf))
    val plan = executedPlan(df)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"marginals must derive from the cell counts, found $scans scans:\n$plan")
  }

  test("q98 lone-late supplier: status filter pushed to orders scan; one lineitem pass") {
    val df = Relational.loneLateSupplier(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.supplier(spark, sf))
    val meta = scanMeta(df)
    assert(meta.contains("EqualTo(o_orderstatus,F)"),
      s"status filter must reach the orders scan:\n$meta")
    val plan = executedPlan(df)
    val liScans = "Scan parquet".r.findAllIn(plan).count(_ => true)
    // lineitem + orders + supplier = 3 scans max — the exists/not-exists
    // pair must NOT add self-join passes over lineitem
    assert(liScans <= 3, s"expected ≤3 scans (no self-joins), got $liScans:\n$plan")
  }

  test("q104 idle-rich: price filter pushed to orders scan; native left-anti join") {
    val df = Relational.idleRichCustomers(Tables.customer(spark, sf),
      Tables.orders(spark, sf), Tables.nation(spark, sf))
    val meta = scanMeta(df)
    assert(meta.contains("GreaterThan(o_totalprice,300000.0)"),
      s"price filter must reach the orders scan:\n$meta")
    val plan = executedPlan(df)
    assert(plan.contains("LeftAnti"), s"expected a native anti-join:\n$plan")
  }

  test("q100 inverted index: one scan, one exchange, no window — bounded-state postings") {
    val df = TextAnalysis.invertedIndex(Tables.documents(spark, sf), "text", "doc_id")
    val plan = executedPlan(df)
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"index build must read the corpus once:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"exactly the per-token aggregation exchange:\n$plan")
    assert(!plan.contains("Window"),
      s"capped postings must come from the bounded aggregator, not a per-token sort:\n$plan")
  }

  test("q90 gap-fill: events scanned ONCE (map-fold spine, no re-join double scan)") {
    val df = Relational.dailyGapFill(Tables.events(spark, sf))
    val plan = executedPlan(df)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"gap-fill must read events once, found $scans scans:\n$plan")
    assert(!plan.contains("Join"), s"map-fold formulation must not re-join:\n$plan")
  }

  test("q19 disjunctive brackets: brand filter reaches the part scan; one broadcast join") {
    val df = Relational.disjunctiveBracketRevenue(
      Tables.lineitem(spark, sf), Tables.part(spark, sf))
    val plan = executedPlan(df)
    // the factored-out brand membership must prune the broadcast side AT
    // ITS SCAN, not after the join
    assert(plan.contains("In(p_brand"),
      s"brand disjunction not pushed to the part scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"part side must broadcast:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"OR-of-ANDs must not multiply scans, found $scans:\n$plan")
  }

  test("q111 bpe candidates: bounded TakeOrdered top-k, no single-partition Window") {
    val df = BpeTrain.bpePairCandidates(Tables.documents(spark, sf), "text")
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be per-partition k-heaps (TakeOrderedAndProject):\n$plan")
    // a CJK-scale pair table (charset² rows) must never funnel into one
    // partition: no Window anywhere — rank derives from the k survivors
    assert(!plan.contains("Window"),
      s"rank window would single-partition the pair table:\n$plan")
  }

  test("global: every declared query analyzes and plans without a cartesian product") {
    graft.SparkEntry.queries.foreach { case (name, f) =>
      val plan = f(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("q126 forecast revenue: all three predicate bands pushed; 3-column scan") {
    // inspect the scan node's expression lists directly — the plan
    // STRING truncates PushedFilters at maxMetadataStringLength, and
    // that conf is racy to flip on the suite-shared session
    // RelationalSpec caches lineitem; a cached subtree substitutes an
    // InMemoryRelation for the file scan and hides the pushdown under
    // test — drop caches so this plan reads the real scan node
    spark.catalog.clearCache()
    val df = Relational.forecastRevenue(Tables.lineitem(spark, sf))
    // unwrap the AQE shell (AdaptiveSparkPlanExec is itself a leaf, so
    // collectLeaves on the wrapper never reaches the scan)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = root.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    val pushed = scan.dataFilters.map(_.toString).mkString("; ")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c band not pushed to the scan: $pushed")
    // the scan reads only the four referenced columns
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read == Set("l_shipdate", "l_discount", "l_quantity",
      "l_extendedprice"), s"scan reads $read")
  }

  test("q125 shipping priority: top-10 plans TakeOrderedAndProject, no global sort") {
    val df = Relational.shippingPriority(Tables.customer(spark, sf),
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k + driver merge:\n$plan")
  }

  test("q132 chunking / q136 temperature sample: zero shuffles (map-only expansion)") {
    for (df <- Seq(
      Pipelines.chunkDocuments(Tables.documents(spark, sf), "text", "doc_id"),
      Pipelines.temperatureSample(Tables.documents(spark, sf), "lang",
        "doc_id", Map("en" -> 0.5, "de" -> 0.5), 1.0))) {
      val plan = executedPlan(df)
      assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext,
        s"map-only operator plans a shuffle:\n$plan")
    }
  }

  test("q129 top supplier: scalar max and supplier dim both broadcast") {
    val df = Relational.topSupplier(Tables.lineitem(spark, sf),
      Tables.supplier(spark, sf))
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"expected broadcast-only joins after the one fact aggregation:\n$plan")
  }

  test("q138 boilerplate: no forced broadcast; one expansion exchange reused") {
    val df = Dedup.boilerplateWindows(Tables.documents(spark, sf), "text",
      "doc_id", minDocs = 3)
    // the survivor set is DATA-DEPENDENT (on a web crawl it is the
    // boilerplate of the web) — a build-side-forced broadcast would
    // bypass AQE's size check and OOM the driver at exactly the scale
    // the operator targets. No hint anywhere in the plan: AQE alone
    // decides the join strategy from runtime sizes.
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"q138 must not force a join strategy:\n$analyzed")
    // the (h, pos) expansion is built once: the df aggregate and the
    // survivor probe join consume the SAME hash-on-h exchange
    val plan = executedPlan(df)
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"expansion exchange must be shared by aggregate and probe:\n$plan")
  }

  test("global: no query plans an unpartitioned Window over unaggregated input") {
    import org.apache.spark.sql.catalyst.plans.logical
    // a Window with empty partitioning funnels its whole input through
    // ONE task — fatal on a fact table, fine on an already-reduced frame
    // (one row per day/group). Every global Window in the suite must
    // therefore sit above an Aggregate (or an aggregate-derived spine).
    graft.SparkEntry.queries.foreach { case (name, f) =>
      val plan = f(spark, sf).queryExecution.optimizedPlan
      plan.foreach {
        case w: logical.Window if w.partitionSpec.isEmpty =>
          val reduced = w.child.collectFirst {
            case _: logical.Aggregate => ()
            case l: logical.GlobalLimit => ()
          }.isDefined
          assert(reduced,
            s"$name: global Window over unaggregated input:\n${w.child}")
        case _ =>
      }
    }
  }

  test("unpartitioned windows: the source allowlist is exact (new sites must enroll)") {
    // Every `WindowExec: No Partition Defined` warning in the bench tail
    // traces to one of THESE sites, each of which windows a frame already
    // reduced to a bounded row count — never a fact table:
    //   Pipelines  seatW     q172: one row per stratum (largest-remainder seats)
    //   Relational epoch_day q90-family: one row per day in the data's range
    //   Relational allW      q177: the reduced per-key skew domain table
    //   TextAnalysis rank    q144: vocab rows already TakeOrdered-limited
    // A NEW unpartitioned window must be added here WITH its boundedness
    // argument — otherwise it hides in the existing warning spray.
    val allow = Set(
      // q172: the largest-remainder seat ranking runs over the STRATUM
      // QUOTA table (one row per stratum — language/source codes, a
      // bounded dimension at any corpus size), never member rows
      ("Pipelines.scala",
        """val seatW = Window.orderBy(col("rem").desc, col(stratumCol))"""),
      // q90-family: the running-total window runs over the DAILY
      // aggregate (one row per epoch day — calendar-bounded: ~36500
      // rows for a century of data), never order rows
      ("Relational.scala", """val w = Window.orderBy(col("epoch_day"))"""),
      // q177: the grand-total window runs over the (event_type × hour)
      // CONTINGENCY table — ≤ |event types|·24 cells after the map-side
      // fact reduction, a fixed-domain frame at any scale
      ("Relational.scala", """val allW = Window.partitionBy()"""),
      // q144: the vocab position window runs AFTER the topK limit —
      // ≤ topK rows by construction (TakeOrderedAndProject in the plan)
      ("TextAnalysis.scala",
        """.over(Window.orderBy(col("rank").desc, col("word"))).cast("long"))"""),
      // q209: both windows run over the duration-day HISTOGRAM (one row
      // per distinct whole-day duration — bounded by the observation
      // window, ~1100 rows for a 3-year corpus), never per-user rows
      ("Survival.scala", """val riskW = Window.orderBy(col("t").desc)"""),
      ("Survival.scala", """val hazW = Window.orderBy(col("t"))"""),
      // q212: the cumulative rank runs over the PART DIMENSION (one row
      // per catalog part after the map-side fact reduction) — the q144
      // vocab-rank boundedness argument
      ("Relational.scala",
        """val cumW = Window.orderBy(col("qty").desc, col("l_partkey"))"""),
      // q216: the coverage running sums window over DISTINCT WORD
      // FREQUENCIES (Σ f·n_f = N bounds them by O(√total_tokens)),
      // never over words
      ("TextAnalysis.scala", """val w = Window.orderBy(col("f").desc)"""),
      // q219: the cumulative vocabulary window runs over ≤ `buckets`
      // rows (caller-bounded, default 10)
      ("TextAnalysis.scala", """val w = Window.orderBy(col("bucket"))"""),
      // q221: the stratum-index window runs over one row per stratum
      // (an aggregate of the stratum column — lang-cardinality rows)
      ("Pipelines.scala", """val sidxW = Window.orderBy(col(stratumCol))"""),
      // q256: the AUC cumulative window runs over the GRID-SCORE
      // HISTOGRAM (≤ 1e6+1 distinct posterior values by construction),
      // never corpus rows
      ("Regression.scala", """val aucW = Window.orderBy(col("s"))"""),
      // q257: the PR suffix window — same bounded score histogram
      ("Regression.scala", """val prW = Window.orderBy(col("s").desc)"""),
      // q264: the Gini rank runs over the CUSTOMER DIMENSION after the
      // map-side fact reduction — the q212 cumW boundedness argument
      ("Relational.scala",
        """val giniW = Window.orderBy(col("x"), col("o_custkey"))"""),
      // q271: the midrank window runs over the VALUE HISTOGRAM (one
      // row per distinct measure value — ≤50 for quantities), never
      // corpus rows
      ("Stats.scala", """val rankW = Window.orderBy(col("v"))"""),
      // q273: the marginal midrank windows run over each variable's
      // VALUE HISTOGRAM (≤11 discount levels / ≤50 quantities)
      ("Stats.scala", """val dRankW = Window.orderBy(col("dc"))"""),
      ("Stats.scala", """val qRankW = Window.orderBy(col("q"))"""),
      // q293: the Pettitt midrank window runs over the DAILY-REVENUE
      // VALUE HISTOGRAM (≤ |days| rows — calendar-bounded), never
      // fact rows; the running-sum window is the enrolled epoch_day
      // site above
      ("Relational.scala", """val vW = Window.orderBy(col("v"))"""),
      // q300: the Hodges-Lehmann cumulative-weight window runs over
      // the DIFFERENCE HISTOGRAM (≤ |A|·|B| cells of two bounded
      // value domains), never row pairs
      ("Stats.scala", """val dW = Window.orderBy(col("d"))"""),
      // q320: the KPSS partial-sum window runs over the DAILY-REVENUE
      // table (one row per day — calendar-bounded, the epoch_day
      // argument), never order rows
      ("Relational.scala", """val dayW = Window.orderBy(col("d"))"""),
    )
    val re = """Window\s*\.\s*(orderBy|partitionBy\(\))""".r
    def scalaFiles(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) scalaFiles(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Nil
      }
    val found = for {
      f <- scalaFiles(new java.io.File("src/main/scala/graft"))
      line <- scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
      t = line.trim
      if !t.startsWith("*") && !t.startsWith("//") && !t.startsWith("/**")
      if re.findFirstIn(t).isDefined
    } yield (f.getName, t)
    assert(found.toSet == allow,
      s"unpartitioned-window sites drifted.\n  new: ${found.toSet -- allow}\n  gone: ${allow -- found.toSet}")
  }

  test("q77 pmi: unigram-count exchange is built once and reused for both joins") {
    val df = TextAnalysis.bigramPmi(Tables.documents(spark, sf), "text", minCount = 2)
    val plan = executedPlan(df)
    // w1 and w2 probability joins both broadcast; the second reuses the
    // first's exchange rather than recomputing token counts
    assert(plan.contains("ReusedExchange"),
      s"unigram counts must be computed once:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"probability joins must broadcast (frequent-set side is small):\n$plan")
  }

  test("q142/q145: per-document scoring is map-only — zero shuffle") {
    // the quality classifier and the HRW shard assignment both score every
    // document independently; ANY exchange in these plans is a bug
    Seq(
      TextAnalysis.qualityClassifier(Tables.documents(spark, sf), "text", "doc_id"),
      Pipelines.rendezvousShards(Tables.documents(spark, sf), "doc_id")
    ).foreach { df =>
      val plan = executedPlan(df)
      assert(!plan.contains("Exchange"),
        s"map-only query planned a shuffle:\n$plan")
    }
  }

  test("q144 vocab coverage: corpus text never shuffles; vocab broadcasts") {
    val df = TextAnalysis.vocabCoverage(Tables.documents(spark, sf), "text", "doc_id")
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab probe must broadcast:\n$plan")
    // exchanges: gram-count agg (pass 1) + per-doc OOV agg (pass 2); the
    // vocab sort-limit is a TakeOrdered, not a global sort exchange
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 2, s"expected 2 shuffles (two aggs), saw $shuffles:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab cutoff must be a bounded top-k, not a full sort:\n$plan")
  }

  test("q148 winnowing: map-only — one compute repartition, no join/agg/window") {
    val df = Winnowing.fingerprints(Tables.documents(spark, sf), "text", "doc_id")
    val plan = executedPlan(df)
    assert(!plan.contains("Join"), s"fingerprinting must not join:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("Window"),
      s"fingerprinting must not aggregate:\n$plan")
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles <= 1,
      s"only the single-row-group compute repartition allowed, saw $shuffles:\n$plan")
  }

  test("q151 dsir: per-(doc,bucket) reduction shared; bucket table broadcasts") {
    val df = Pipelines.dsirWeights(Tables.documents(spark, sf), "text",
      "doc_id", "lang")
    val plan = executedPlan(df)
    // the raw/target distributions and the per-doc scorer all consume the
    // SAME (doc, lang, bkt) aggregation — one corpus pass, not three
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"per-(doc,bucket) reduction must be computed once:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"log-ratio table must broadcast onto the reduced rows:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in dsir justifies a sort-merge join:\n$plan")
  }

  test("q152 pq: probe LUTs broadcast to the code scan; rerank joins broadcast") {
    val emb = Tables.embeddings(spark, sf)
    val df = Similarity.pqTopK(emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3), 5,
      dim = 64, m = 16, ksub = 16, rerank = 4)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"ADC scan must broadcast the probe LUTs:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"candidate/rerank joins must broadcast, not sort-merge:\n$plan")
  }

  test("q146 containment: no cartesian product anywhere in the pair pipeline") {
    val df = Dedup.containmentDups(Tables.documents(spark, sf), "text",
      "doc_id", n = 3, minGrams = 10, threshold = 0.6)
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct"),
      s"containment must candidate-generate via the prefix join:\n$plan")
  }

  test("q160 ks drift: the ordered walk runs over the REDUCED count table") {
    val df = Relational.ksDrift(Tables.events(spark, sf))
    val plan = executedPlan(df)
    // the window must sit above a partial+final aggregate of the corpus,
    // not above raw events: exactly one corpus-sized exchange feeds it
    assert(plan.contains("partial_sum") || plan.contains("partial sum"),
      s"expected map-side reduction before the ECDF walk:\n$plan")
    assert(plan.contains("Window"), s"expected the cumulative walk:\n$plan")
  }

  test("q165 weighted sample: map-only key, one per-stratum rank shuffle") {
    val df = Pipelines.weightedSample(Tables.documents(spark, sf),
      "doc_id", "lang", "n_chars")
    val plan = executedPlan(df)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle (stratum rank), saw $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q162 dup-span ladder: df rides ONE window-hash exchange (no pair join)") {
    val df = Dedup.dupSpanLadder(Tables.documents(spark, sf), "text",
      "doc_id")
    val plan = executedPlan(df)
    assert(!plan.contains("SortMergeJoin") || !plan.contains("CartesianProduct"))
    // the q162 reuse fix: no second expansion subtree — the fused
    // window-hash kernel appears exactly once in the executed plan
    val kernels = "window_xxhashes".r.findAllIn(plan.toLowerCase).length
    assert(kernels <= 3, s"expansion must not be recomputed per width-side:\n$plan")
  }

  test("q174 multi-touch: journey windows partition by purchase, filters pushed") {
    val df = EventJoins.multiTouchAttribution(Tables.events(spark, sf))
    val plan = scanMeta(df)
    assert(plan.contains("EqualTo(event_type,purchase)") &&
      plan.contains("EqualTo(event_type,view)"),
      s"stage filters must reach the scan:\n$plan")
    val exec = executedPlan(df)
    assert(exec.contains("Window"), "position windows expected")
    assert(!exec.contains("CartesianProduct"))
  }

  test("q169 textrank: no global window over the corpus vocabulary") {
    // node ids are map-side xxhash64, NOT a row_number over a global
    // Window.orderBy (a single-task sort of the whole vocabulary at
    // 100x); the final top-k must be TakeOrderedAndProject-bounded, so
    // the ONLY window left numbers the already-limited topK rows
    val df = TextAnalysis.textRankKeywords(
      Tables.documents(spark, sf), "text", topK = 20)
    val plan = executedPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be take-ordered, not a ranked global window:\n$plan")
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows <= 1,
      s"expected at most the post-limit pos window, got $windows:\n$plan")
  }

  test("q191 linkage: salted blocked join, constant-folded weights, no NL join") {
    val c = Tables.customer(spark, sf).select(
      org.apache.spark.sql.functions.col("c_custkey").as("id"),
      org.apache.spark.sql.functions.col("c_mktsegment").as("b1"),
      org.apache.spark.sql.functions.col("c_nationkey").as("f1"),
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.col("c_name"), -1, 1).as("f2"))
    val df = Linkage.fellegiSunter(c, "id", Seq("b1"), Seq("f1", "f2"),
      0.9, minScore = -100.0)
    val plan = executedPlan(df)
    // the u row must ship as literals, not as a nested-loop cross join
    // evaluating interpreted ln() per candidate pair (the 13.5 s saga)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"u row must be plan literals:\n$plan")
    assert(plan.contains("__salt"),
      s"blocked join must be salted (low-cardinality key):\n$plan")
    assert(!plan.toLowerCase.contains("ln("),
      s"weights must constant-fold:\n$plan")
  }

  test("q158/q173 iterative graph: no cartesian, no sort-merge in a round") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    for (df <- Seq(Graph.pageRankMicros(e, "src", "dst", 2),
      Graph.labelPropagation(e, "src", "dst", 2))) {
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"), s"round plan:\n$plan")
    }
  }
}
