package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph centrality — the crawl-frontier/domain-authority
  * primitive of a web-scale training-data pipeline (crawlers rank hosts
  * by link centrality before spending fetch budget; mixture builders
  * weight sources by the same signal). The reference engine has no graph
  * operator, so this extends the training-pipeline surface next to the
  * component labeling in [[Dedup.clusterPairs]]: that one answers "which
  * docs form one near-dup cluster", this one answers "which nodes matter".
  *
  * Everything runs on an EXACT INTEGER grid (micro-units, floor division)
  * so a power iteration produces the SAME longs on every engine and every
  * partitioning — the q133/q151 determinism discipline applied to an
  * iterative fixpoint, where float drift would otherwise compound per
  * round.
  */
object Graph {

  /** Q158: damped PageRank over a directed edge list, `iters` fixed
    * power-iteration rounds.
    *
    * Grid semantics (both engines, bit-for-bit): every node starts at
    * rank 1,000,000 micro-units (so the uniform prior 1/N scales out of
    * every formula); one round is
    * {{{ r'(v) = 150000 + (85 * Σ_{(u,v)∈E} (r(u) div deg(u))) div 100 }}}
    * — i.e. damping 0.85 with the classic (1−d) teleport term, all in
    * BIGINT floor division (`div` here ≡ DuckDB `//`: both truncate
    * toward zero, identical on the non-negative ranks this loop
    * produces). The node universe is src ∪ dst; a source-only node
    * (out-edges, no in-edges — possible on general directed graphs even
    * though the undirected callers emit both orientations) holds its
    * teleport rank 150,000 every round instead of silently vanishing
    * after round 1. Because every rank is positive, "receives inflow"
    * is STATIC (exactly the nodes with ≥1 in-edge), so the fix costs no
    * per-round join: each round is the inflow aggregation UNION a
    * once-computed persisted src-only table at the teleport constant.
    * Sink nodes receive inflow but redistribute nothing (dangling mass
    * is deliberately dropped, the common web-graph choice).
    *
    * Scale design: the edge list is the only corpus-sized table. It is
    * persisted ONCE and every round reuses it — per round exactly one
    * shuffle join (ranks onto edges by src; the vocabulary-sized rank
    * table broadcasts when it fits) and one aggregation exchange on dst.
    * Rank rows never exceed |V|; row data never visits the driver. The
    * loop's lineage grows linearly (each round references the previous
    * once — NOT the exponential doubling of the min-label loop), so a
    * lineage-truncating eager `localCheckpoint` fires only every 8th
    * round; the returned frame is checkpointed so the caller's actions
    * replay nothing and the edge cache can be dropped eagerly.
    */
  def pageRankMicros(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    // outdegree rides the edge list itself (one window over the src
    // exchange — per-src groups are out-degree lists, never unbounded),
    // so each round joins ONE table, not two
    val ed = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .withColumn("deg", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"))))
      .persist()
    // source-only nodes (no in-edges) never receive inflow — a STATIC
    // set, since ranks are always positive; they ride every round as a
    // constant-teleport union branch. Empty for both-orientation
    // callers, so those plans match the plain inner-join iteration.
    val srcOnly = ed.select(col("src").as("node")).distinct()
      .join(ed.select(col("dst").as("node")).distinct(), Seq("node"),
        "left_anti")
      .persist()
    var ranks = ed.select(col("src").as("node"))
      .unionByName(ed.select(col("dst").as("node")))
      .distinct()
      .withColumn("rank", lit(1000000L))
    var round = 0
    while (round < iters) {
      // name-based join condition: `src` exists only on the left, `node`
      // only on the right — round k+1's rank lineage contains round k's
      // copy of the edge attributes, so dataframe-captured column refs
      // would hit the classic self-join ambiguity
      val next = ed.join(ranks, col("src") === col("node"))
        .groupBy(col("dst").as("__dst"))
        .agg(sum(expr("rank div deg")).as("__in"))
        .select(col("__dst").as("node"),
          (lit(150000L) + expr("(85 * __in) div 100")).as("rank"))
        .unionByName(srcOnly.withColumn("rank", lit(150000L)))
      round += 1
      ranks = if (round % 8 == 0) next.localCheckpoint() else next
    }
    val out = ranks.localCheckpoint()
    ed.unpersist()
    srcOnly.unpersist()
    out
  }

  /** Q170: WEIGHTED PageRank — the realistic form of [[pageRankMicros]]:
    * edges carry a multiplicity/strength `w` (order counts, link counts,
    * co-occurrence counts), and a node distributes rank to neighbors in
    * proportion to edge weight:
    * {{{ r'(v) = 150000 + (85 · Σ_{(u,v,w)∈E} ((r(u)·w) div W(u))) div 100 }}}
    * with W(u) = Σ outgoing weight — still floor division only, so the
    * grid determinism of the unweighted loop carries over exactly (with
    * all weights 1 this IS the unweighted iteration, spec-asserted).
    * Magnitudes: r ≤ |V|·10⁶ by mass conservation and r·w stays far
    * inside long for any realistic multiplicity.
    *
    * Same per-round plan as the unweighted form: the weight sum rides
    * the edge list via one window (per-src groups are adjacency lists),
    * one shuffle join + one aggregation per round.
    */
  def pageRankMicrosWeighted(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    val ed = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .withColumn("wsum", sum(col("w"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"))))
      .persist()
    val srcOnly = ed.select(col("src").as("node")).distinct()
      .join(ed.select(col("dst").as("node")).distinct(), Seq("node"),
        "left_anti")
      .persist()
    var ranks = ed.select(col("src").as("node"))
      .unionByName(ed.select(col("dst").as("node")))
      .distinct()
      .withColumn("rank", lit(1000000L))
    var round = 0
    while (round < iters) {
      val next = ed.join(ranks, col("src") === col("node"))
        .groupBy(col("dst").as("__dst"))
        .agg(sum(expr("(rank * w) div wsum")).as("__in"))
        .select(col("__dst").as("node"),
          (lit(150000L) + expr("(85 * __in) div 100")).as("rank"))
        .unionByName(srcOnly.withColumn("rank", lit(150000L)))
      round += 1
      ranks = if (round % 8 == 0) next.localCheckpoint() else next
    }
    val out = ranks.localCheckpoint()
    ed.unpersist()
    srcOnly.unpersist()
    out
  }

  /** Q173: synchronous LABEL PROPAGATION (Raghavan et al. 2007) —
    * community detection as the iterative sibling of the component
    * labeling in [[Dedup.clusterPairs]]: where min-label flooding merges
    * everything CONNECTED, LPA converges to locally-dense groups (each
    * node adopts its neighbors' MOST FREQUENT label), the structure a
    * mixture builder wants when near-dup components chain too broadly
    * or a marketplace graph needs segmenting.
    *
    * Classic LPA is notoriously non-deterministic (random order, random
    * tie-breaks); this is the DETERMINISTIC synchronous form: a fixed
    * number of rounds, all updates computed from the PREVIOUS round's
    * labels, ties broken (count DESC, label ASC) — integer counts and
    * integer labels, so every engine and partitioning lands on the same
    * assignment, and the oracle can unroll the same rounds as CTEs.
    * The node universe is src ∪ dst; a node with no in-neighbors
    * (possible on general directed graphs) KEEPS its own label rather
    * than dropping out. Like [[pageRankMicros]]'s teleport branch, the
    * no-in-neighbor set is STATIC (every in-edge source always carries
    * a label), so the fix is a once-computed src-only union branch
    * whose label never moves — no per-round join, and empty for the
    * both-orientation undirected callers.
    *
    * Per round: the vocabulary-sized label table broadcasts onto the
    * persisted edge list (AQE), then ONE repartition on dst feeds BOTH
    * aggregations — the (node, label) histogram and the per-node argmax
    * (dst-partitioning clusters (dst, lbl) groups) — with the argmax as
    * a struct-max `(count, −label)` instead of a rank window, which
    * would add a per-round sort exchange (measured 12 s → ~4 s cold at
    * sf0.1). Linear lineage; checkpoint every 8th round.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val srcOnly = e.select(col("src").as("node")).distinct()
      .join(e.select(col("dst").as("node")).distinct(), Seq("node"),
        "left_anti")
      .persist()
    var labels = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .withColumn("lbl", col("node"))
    var round = 0
    while (round < iters) {
      val next = e.join(labels, col("src") === col("node"))
        .select(col("dst"), col("lbl"))
        .repartition(col("dst"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("dst"))
        // lexicographic struct max = (count DESC, label ASC): labels are
        // non-negative, so max(-lbl) picks the minimum label on count ties
        .agg(max(struct(col("__c"), (-col("lbl")).as("__nl"))).as("__m"))
        .select(col("dst").as("node"), (-col("__m.__nl")).as("lbl"))
        // no in-neighbors ever → keep the own label (static set)
        .unionByName(srcOnly.withColumn("lbl", col("node")))
      round += 1
      labels = if (round % 8 == 0) next.localCheckpoint() else next
    }
    val out = labels.localCheckpoint()
    e.unpersist()
    srcOnly.unpersist()
    out
  }

  /** Q175: ITEM-ITEM cosine similarity over a bipartite interaction
    * graph — the collaborative-filtering primitive ("suppliers serving
    * the same customers are substitutes"): for items a, b with customer
    * sets A, B, sim = |A∩B| / √(|A|·|B|), computed EXACTLY via the
    * co-occurrence self-join on the shared customer.
    *
    * Scale: the quadratic hazard is the per-customer fan-out (a customer
    * touching d items contributes d² co-pairs — one hot key can dwarf
    * the corpus), so customers above `maxCustDeg` are EXCLUDED before
    * pair generation — the standard CF practice (power users carry no
    * discriminative signal, and dropping them bounds per-key work at
    * cap²). Degrees are computed on the SAME capped interaction set, so
    * the cosine stays internally consistent; `minCo` prunes the
    * singleton-co-occurrence noise floor before the output
    * materializes. Everything is integer until the one final √ division.
    */
  def itemCosineSimilarity(interactions: DataFrame, userCol: String,
      itemCol: String, maxCustDeg: Int = 50, minCo: Int = 2): DataFrame = {
    require(maxCustDeg >= 2 && minCo >= 1,
      s"bad params: maxCustDeg=$maxCustDeg minCo=$minCo")
    val i0 = interactions.select(col(userCol).cast("long").as("u"),
      col(itemCol).cast("long").as("it")).distinct()
    // r18: compute-repartitioned by the self-join key before the pin —
    // the pinned frame otherwise carries AQE's coalesced partitioning
    // and the quadratic co-occurrence fan-out below runs on a handful
    // of tasks; keyed on `u` so both self-join sides read the pin
    // co-partitioned (no re-exchange)
    // r19 (measured, PlanProbe): the pin records UnknownPartitioning —
    // the self-join below therefore re-exchanged both sides via
    // ENSURE_REQUIREMENTS and AQE coalesced the quadratic fan-out stage
    // to TWO tasks by its pre-fanout bytes (2.2 s of the 3.7 s query).
    // The post-pin compute repartition is a REPARTITION_BY_NUM exchange
    // AQE may not coalesce, built once (exchange reuse) for both sides.
    val capped = Hashing.repartitionForCompute(
      Hashing.repartitionForCompute(i0
        .withColumn("__ud", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("u"))))
        .filter(col("__ud") <= maxCustDeg)
        .select(col("u"), col("it")), "u")
        .localCheckpoint(false), "u")
    val deg = capped.groupBy(col("it")).agg(count(lit(1)).as("deg"))
    val pairs = capped.select(col("u"), col("it").as("it_a"))
      .join(capped.select(col("u"), col("it").as("it_b")), Seq("u"))
      .filter(col("it_a") < col("it_b"))
      .groupBy(col("it_a"), col("it_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    pairs
      .join(deg.select(col("it").as("it_a"), col("deg").as("d_a")),
        Seq("it_a"))
      .join(deg.select(col("it").as("it_b"), col("deg").as("d_b")),
        Seq("it_b"))
      .select(col("it_a"), col("it_b"), col("co"),
        round(col("co").cast("double") /
          sqrt((col("d_a") * col("d_b")).cast("double")), 6).as("cosine"))
  }

  /** Q182: MARKET-BASKET pair mining — frequent same-basket item pairs
    * with support and LIFT, the classic association-rule unit (distinct
    * from [[itemCosineSimilarity]]: that one finds items bought by the
    * same CUSTOMERS across baskets; this one finds items bought
    * TOGETHER). lift = P(a,b)/(P(a)·P(b)) computed entirely on integers
    * as (co·N·10⁶) div (c_a·c_b) — > 10⁶ means genuinely associated,
    * < 10⁶ anti-associated.
    *
    * Scale: per-basket pair fan-out is basket-size² — real basket data
    * has a heavy tail (a wholesale order with 10⁴ items contributes 10⁸
    * pairs), so baskets above `maxBasketSize` are excluded up front
    * (standard practice; such baskets carry no pairwise signal). The
    * min-support floor prunes before lift joins. Magnitudes: co ≤ N, so
    * co·N·10⁶ stays far inside long for any realistic basket count per
    * partition of a date-bucketed run.
    */
  def basketPairLift(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Int = 5,
      maxBasketSize: Int = 20): DataFrame = {
    require(minSupport >= 1 && maxBasketSize >= 2,
      s"bad params: minSupport=$minSupport maxBasketSize=$maxBasketSize")
    val b0 = baskets.select(col(basketCol).cast("long").as("b"),
      col(itemCol).cast("long").as("it")).distinct()
    // r18: same compute-repartition-before-pin as itemCosineSimilarity,
    // keyed on the self-join key `b`; r19: plus the post-pin repartition
    // (the pin's UnknownPartitioning let AQE coalesce the pair fan-out —
    // see itemCosineSimilarity)
    val capped = Hashing.repartitionForCompute(
      Hashing.repartitionForCompute(b0
        .withColumn("__bs", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
        .filter(col("__bs") <= maxBasketSize)
        .select(col("b"), col("it")), "b")
        .localCheckpoint(false), "b")
    val tot = capped.agg(countDistinct(col("b")).as("nb"))
    val supp = capped.groupBy(col("it")).agg(count(lit(1)).as("cnt"))
    capped.select(col("b"), col("it").as("it_a"))
      .join(capped.select(col("b"), col("it").as("it_b")), Seq("b"))
      .filter(col("it_a") < col("it_b"))
      .groupBy(col("it_a"), col("it_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minSupport)
      .join(supp.select(col("it").as("it_a"), col("cnt").as("c_a")),
        Seq("it_a"))
      .join(supp.select(col("it").as("it_b"), col("cnt").as("c_b")),
        Seq("it_b"))
      .crossJoin(broadcast(tot))
      .select(col("it_a"), col("it_b"), col("co"),
        expr("(co * nb * 1000000) div (c_a * c_b)").as("lift_ppm"))
  }

  /** Q184: K-CORE PEEL over an undirected pair graph — the density
    * decomposition the near-dup keep-one policy and the LPA communities
    * both lean on implicitly: the k-core is the maximal subgraph where
    * every member keeps ≥ k neighbors AFTER all weaker nodes are
    * removed, i.e. degree that survives peeling, where raw degree (q163)
    * counts hub-chained noise too. On a dup graph the 2-core separates
    * genuine duplicate clusters from bridge-chained stragglers.
    *
    * Semantics (documented FIXED-ROUND form, the q158/q173 discipline so
    * the oracle unrolls the same rounds as CTEs): `rounds` SYNCHRONOUS
    * peel rounds — each round computes every live node's degree within
    * the live subgraph and removes ALL nodes with degree < k at once.
    * Output per node: `peel_round` (1-based round it was peeled; 0 =
    * survived all rounds = in the k-core under this round budget),
    * `deg` (degree at peel time; for survivors, degree within the
    * surviving subgraph), `in_kcore`. Extra rounds after convergence are
    * no-ops, so any `rounds` ≥ the true peel depth gives the exact
    * k-core; the fixed budget is what keeps both engines bit-identical.
    *
    * Scale: per round one semi-join pair (live filter on the persisted
    * edge list) + one degree aggregation + one |V|-bounded left join —
    * no driver state, no all-pairs. The per-round live-degree table is
    * lazily checkpointed (consumed by peel AND survivor branches, and it
    * truncates the loop's lineage). Edge list localCheckpoint'd once:
    * upstream is typically an expensive near-dup pair pipeline.
    */
  def kCorePeel(pairs: DataFrame, aCol: String, bCol: String,
      k: Int, rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 100,
      s"bad params: k=$k rounds=$rounds")
    val e = pairs.select(least(col(aCol), col(bCol)).cast("long").as("lo"),
        greatest(col(aCol), col(bCol)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .select(explode(array(
        struct(col("lo").as("src"), col("hi").as("dst")),
        struct(col("hi").as("src"), col("lo").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(false)
    // both orientations present → the src set IS the node universe
    def liveDeg(alive: DataFrame): DataFrame = alive
      .join(e.join(alive.select(col("node").as("dst")), Seq("dst"),
          "left_semi")
          .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
    var alive = e.select(col("src").as("node")).distinct()
    var peeled: DataFrame = null
    var round = 1
    while (round <= rounds) {
      // degree within the live subgraph: count only edges whose OTHER
      // endpoint is still alive (this endpoint is alive by construction
      // of the `alive` probe)
      val d = liveDeg(alive).localCheckpoint(false)
      val out = d.filter(col("deg") < k)
        .select(col("node"), lit(round.toLong).as("peel_round"), col("deg"))
      peeled = if (peeled == null) out else peeled.unionByName(out)
      alive = d.filter(col("deg") >= k).select(col("node"))
      round += 1
    }
    val survivors = liveDeg(alive)
      .select(col("node"), lit(0L).as("peel_round"), col("deg"))
    peeled.unionByName(survivors)
      .select(col("node").as("doc_id"), col("peel_round"), col("deg"),
        when(col("peel_round") === 0, lit(1)).otherwise(lit(0))
          .as("in_kcore"))
  }

  /** Q189: WINDOWED basket-pair mining — [[basketPairLift]]'s per-window
    * form: frequent same-basket item pairs per day (or any window
    * column), the time-resolved association unit a monitoring pipeline
    * tracks ("which items started co-occurring THIS day"), and the
    * batch dual of [[graft.streaming.StreamingBasketPairs]].
    *
    * Scale: distinct (window, basket, item) first (one shuffle), then
    * the basket-size cap as a COUNT WINDOW riding the same (window,
    * basket) partitioning (the q182 device — a semi-join against a
    * separate size aggregate re-evaluated the whole distinct subtree:
    * ScanAudit measured 2 corpus scans) — `collect_set` only ever
    * aggregates baskets already proven ≤ `maxBasketSize`, so the agg
    * buffer is bounded (a mega-basket cannot OOM a reducer). Pair
    * fan-out is a pure array HOF over the ≤cap sorted set — no
    * self-join; the pair count is one final aggregate. Support counts
    * baskets (each basket contributes a pair once — set semantics).
    */
  def windowedBasketPairs(df: DataFrame, dayCol: String, basketCol: String,
      itemCol: String, minSupport: Int = 2,
      maxBasketSize: Int = 20): DataFrame = {
    require(minSupport >= 1 && maxBasketSize >= 2,
      s"bad params: minSupport=$minSupport maxBasketSize=$maxBasketSize")
    val dedup = df.select(col(dayCol).cast("long").as("d"),
        col(basketCol).cast("long").as("b"),
        col(itemCol).cast("long").as("it"))
      .filter(col("it").isNotNull)
      .distinct()
    val baskets = dedup
      .withColumn("__n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("d"), col("b"))))
      .filter(col("__n").between(2, maxBasketSize))
      .groupBy(col("d"), col("b"))
      .agg(sort_array(collect_set(col("it"))).as("items"))
    baskets
      .select(col("d"),
        explode(flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + lit(2), size(col("items"))),
            y => struct(x.as("it_a"), y.as("it_b")))))).as("p"))
      .groupBy(col("d"), col("p.it_a").as("it_a"),
        col("p.it_b").as("it_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("d").as("epoch_day"), col("it_a"), col("it_b"),
        col("support"))
  }

  /** Q188: bounded-depth HARMONIC CENTRALITY over an undirected pair
    * graph — the BFS-frontier member of the graph family (PageRank
    * measures inherited endorsement, k-core survival density; harmonic
    * centrality measures PROXIMITY: H(v) = Σ_{u≠v} 1/d(u,v), the
    * standard closeness variant that stays defined on disconnected
    * graphs). Depth is BOUNDED at `maxDepth` (contributions beyond K
    * hops are ≤ 1/(K+1) each and k-hop reach sets explode on dense
    * graphs — the documented fixed-horizon form, scoped to sparse
    * graphs like the containment dup graph, where reach sets stay
    * cluster-sized).
    *
    * Exactness: distances are exact BFS levels (synchronous frontier
    * expansion, all on integers); the score is the integer micro-sum
    * Σ 1000000 div d — floor division per term, so both engines land on
    * identical longs.
    *
    * Scale: per level one frontier-edge equi-join (partitioned on the
    * frontier node) + one anti-join against the visited set on
    * (root, node) + one distinct — the visited table is the Σ-reach
    * bound, which is the inherent cost of multi-source BFS; per-level
    * lazy checkpoints truncate the loop lineage. No driver state.
    */
  def harmonicCentrality(pairs: DataFrame, aCol: String, bCol: String,
      maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 16, s"bad maxDepth: $maxDepth")
    val e = pairs.select(least(col(aCol), col(bCol)).cast("long").as("lo"),
        greatest(col(aCol), col(bCol)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .select(explode(array(
        struct(col("lo").as("src"), col("hi").as("dst")),
        struct(col("hi").as("src"), col("lo").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(false)
    var visited = e.select(col("src").as("root"))
      .distinct()
      .select(col("root"), col("root").as("node"), lit(0).as("dist"))
      .localCheckpoint(false)
    var frontier = visited.select(col("root"), col("node"))
    var depth = 1
    while (depth <= maxDepth) {
      val expanded = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("root"), col("dst").as("node"))
        .distinct()
      val fresh = expanded
        .join(visited.select(col("root"), col("node")),
          Seq("root", "node"), "left_anti")
        .localCheckpoint(false)
      visited = visited
        .unionByName(fresh.withColumn("dist", lit(depth)))
      frontier = fresh
      depth += 1
    }
    visited.filter(col("dist") >= 1)
      .groupBy(col("root").as("doc_id"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("harmonic_micro"))
  }

  /** Q163: per-node TRIANGLE COUNT + local clustering coefficient over an
    * undirected pair graph — the near-dup-graph DIAGNOSTIC the keep-one
    * policy (q55/q156) silently assumes: near-duplication is
    * quasi-transitive, so a healthy dup graph is clique-ish (clustering
    * near 1); low coefficients at high degree mean the similarity
    * threshold is CHAINING unrelated docs through hubs, and collapsing
    * those components would over-delete. Triangles per node and
    * C(v) = 2·T(v) / (deg(v)·(deg(v)−1)) make that inspectable per doc.
    *
    * Scale design — degree-ordered orientation (the MapReduce-classic
    * device): every undirected edge is directed from its (degree, id)-
    * smaller endpoint, so wedge enumeration fans out from each node's
    * HIGHER-ORDERED neighbors only — O(Σ d⁺(v)²) = O(m^{3/2}) wedge rows
    * on any graph instead of Σ deg² (a web-scale hub with 10⁸ neighbors
    * contributes nothing as a wedge center unless its neighbors outrank
    * it). Each triangle is counted exactly once (its smallest-ordered
    * vertex is the wedge center). The edge list is lazily
    * localCheckpoint'd: the upstream pair pipeline (often an expensive
    * near-dup join) runs once, not once per downstream reference.
    */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(least(col(aCol), col(bCol)).cast("long").as("lo"),
        greatest(col(aCol), col(bCol)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint(false)
    val deg = e.select(explode(array(col("lo"), col("hi"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val ek = e
      .join(deg.select(col("id").as("lo"), col("deg").as("dlo")), Seq("lo"))
      .join(deg.select(col("id").as("hi"), col("deg").as("dhi")), Seq("hi"))
    // orient from the (deg, id)-smaller endpoint; lo < hi already, so the
    // degree tie resolves to lo → the condition collapses to dlo <= dhi
    val cond = col("dlo") <= col("dhi")
    val o = ek.select(
      when(cond, col("lo")).otherwise(col("hi")).as("src"),
      when(cond, col("hi")).otherwise(col("lo")).as("dst"),
      when(cond, col("dhi")).otherwise(col("dlo")).as("ddst"))
    val wedges = o.select(col("src"), col("dst").as("u"), col("ddst").as("du"))
      .join(o.select(col("src"), col("dst").as("v"), col("ddst").as("dv")),
        Seq("src"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
    // the closing edge is oriented u → v because (deg, id)-order placed
    // u before v — one equi-join closes every wedge
    val tris = wedges
      .join(o.select(col("src").as("u"), col("dst").as("v")), Seq("u", "v"))
      .select(col("src").as("a"), col("u").as("b"), col("v").as("c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        round(when(col("deg") >= 2,
          (lit(2L) * coalesce(col("n_triangles"), lit(0L))).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)), 6).as("clustering"))
  }

  /** Q278: HITS hubs & authorities over a directed edge list, `iters`
    * fixed mutual-reinforcement rounds — the link-analysis DUAL of
    * q158's PageRank (a good hub points at good authorities; a good
    * authority is pointed at by good hubs). On the customer→supplier
    * graph the hub score ranks broad buyers, the authority score
    * widely-bought-from suppliers.
    *
    * Grid semantics (bit-for-bit in both engines): hubs start at 10⁶;
    * one round is a'(v) = Σ_{u→v} h(u), renormalized to the micro grid
    * by a(v) = (a'(v)·10⁶) div max(a'), then the mirror step for h via
    * the transposed sum and its own max — all BIGINT floor division on
    * non-negative values (max-normalization replaces the L2 norm: same
    * fixed point ordering, no square roots on the grid). Nodes with no
    * in-edges score authority 0, no out-edges hub 0.
    *
    * Scale design: per round exactly two shuffle joins (scores onto
    * the persisted edge list) + two aggregations + two 1-row max
    * broadcasts; score rows never exceed |V|; nothing visits the
    * driver. The raw score tables are PINNED each round
    * ([[Pinning.pin]] — localCheckpoint locally, reliable checkpoint
    * under `spark.graft.reliableCheckpointDir`): each is consumed by
    * both its max and the renormalization, and an unpinned
    * double-reference doubles the plan tree per round (the q173
    * lesson). Magnitude bound: a' ≤
    * 10⁶·max-indegree — for graphs with 10⁹-degree hubs shrink the
    * grid a decade; at that point the div renormalization still holds.
    */
  def hitsScores(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    val ed = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    var hubs = ed.select(col("src").as("node")).distinct()
      .withColumn("h", lit(1000000L))
    // only h₀ participates in round 1 — auths is unconditionally
    // assigned from aRaw before its first read (iters >= 1)
    var auths: DataFrame = null
    var round = 0
    while (round < iters) {
      // each raw score table is referenced TWICE (its max + the
      // renormalization), so it must be pinned — an unpinned frame
      // doubles the plan tree per reference per round (the q173
      // lesson; measured 86 s vs 2 s at sf0.1 for 3 rounds)
      val aRaw = Pinning.pin(
        ed.join(hubs, col("src") === col("node"))
          .groupBy(col("dst").as("__d")).agg(sum(col("h")).as("ar")))
      val amax = aRaw.agg(max(col("ar")).as("am"))
      auths = aRaw.crossJoin(broadcast(amax))
        .select(col("__d").as("node"),
          expr("(ar * 1000000) div am").as("a"))
      val hRaw = Pinning.pin(
        ed.join(auths.select(col("node").as("__an"), col("a")),
            col("dst") === col("__an"))
          .groupBy(col("src").as("__s")).agg(sum(col("a")).as("hr")))
      val hmax = hRaw.agg(max(col("hr")).as("hm"))
      hubs = hRaw.crossJoin(broadcast(hmax))
        .select(col("__s").as("node"),
          expr("(hr * 1000000) div hm").as("h"))
      round += 1
    }
    val nodes = ed.select(col("src").as("node"))
      .unionByName(ed.select(col("dst").as("node"))).distinct()
    val out = nodes
      .join(hubs, Seq("node"), "left")
      .join(auths, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("h"), lit(0L)).as("hub_score"),
        coalesce(col("a"), lit(0L)).as("auth_score"))
      .localCheckpoint()
    ed.unpersist()
    out
  }

  /** Q279: DEGREE ASSORTATIVITY of an undirected pair graph — the
    * Pearson correlation of endpoint degrees over all directed edge
    * orientations (Newman 2002). Negative on hub-and-spoke graphs
    * (hubs link to leaves), positive on core-periphery ones — the
    * one-scalar summary of whether heavy nodes cluster. Degrees ride
    * the doubled edge list via one aggregation; the five moment sums
    * are exact LONG products in DECIMAL(38,0); r is one mirrored
    * double expression. Regular graphs (zero degree variance) return
    * NaN, the statistic's honest answer.
    */
  def degreeAssortativity(pairs: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val ag = e
      .join(deg.select(col("id").as("src"), col("deg").as("du")),
        Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")),
        Seq("dst"))
      .agg(count(lit(1)).as("m"),
        sum(dec(col("du"))).as("su"),
        sum(dec(col("dv"))).as("sv"),
        sum(dec(col("du") * col("dv"))).as("suv"),
        sum(dec(col("du") * col("du"))).as("suu"),
        sum(dec(col("dv") * col("dv"))).as("svv"))
    def d(name: String): Column = col(name).cast("double")
    ag
      .withColumn("num", d("m") * d("suv") - d("su") * d("sv"))
      .withColumn("den",
        sqrt(d("m") * d("suu") - d("su") * d("su")) *
          sqrt(d("m") * d("svv") - d("sv") * d("sv")))
      .select(col("m").as("m_edges"),
        // zero degree variance (regular graph): the statistic is
        // undefined — emit NaN explicitly (ANSI double division by
        // zero raises; DuckDB's 0/0 would be NaN anyway)
        round(when(col("den") === lit(0.0), lit(Double.NaN))
          .otherwise(col("num") / col("den")), 6).as("assortativity"))
  }
}
