package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage the reference lacks but Spark provides natively
  * (SURVEY §2.2 "—" rows): aggregation (partial+final), rollup, ranking /
  * analytic windows, set ops, semi/anti joins, sort+limit top-n — exercised
  * over the TPC-H-ish tables so they are DuckDB-oracle-checkable and feed
  * the bench.
  *
  * Determinism note: distributed double summation is order-dependent, and at
  * 1e9-magnitude sums the wobble exceeds any rounding that preserves useful
  * precision. Money aggregates therefore compute per-row arithmetic in
  * double (deterministic) and then sum EXACT decimals — same result on any
  * partitioning and on a sequential engine. Averages divide the exact sum.
  */
object Relational {

  // Exact decimal sum of a 6-dp-grid double column: the money values' true
  // decimal values (2-dp inputs, products of up to three 2-dp factors) lie
  // exactly ON the 6-dp grid — never on midpoints — so rounding to the grid
  // is mode-independent and every engine picks the same point; decimal sums
  // are then exact (order-independent), and final outputs cast back to
  // double (nearest-double of the same exact decimal on every engine —
  // pandas/arrow-safe, unlike wide decimals).
  //
  // FAST path: a per-row double→decimal CAST allocates a BigDecimal per row
  // (via Double toString), which dominates wide-table money aggregations.
  // Instead the per-row value becomes integer MICROS (round() exact, per
  // above) and long→decimal stays compact (no BigDecimal until a sum would
  // overflow 2^63 micros, at which point Spark's Decimal widens — still
  // exact). The micros→units division happens once per GROUP, exactly.
  private[operators] def decSum(c: org.apache.spark.sql.Column) =
    sum(round(c * 1000000.0).cast("long").cast("decimal(18,0)")) /
      lit(1000000L).cast("decimal(7,0)")

  /** TPC-H Q1-style pricing summary over lineitem. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).cast("double").as("sum_qty"),
        decSum(col("l_extendedprice")).cast("double").as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .cast("double").as("sum_charge"),
        round(decSum(col("l_quantity")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(decSum(col("l_discount")).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Q19 (filling the one historically-unassigned slot): TPC-H-Q19-style
    * DISJUNCTIVE bracket revenue — three OR'd brackets, each an AND of a
    * part predicate (brand, size band) and a lineitem predicate (quantity
    * band), summed as discounted revenue. The shape exists to prove the
    * engine handles OR-of-ANDs sanely: the brand membership common to all
    * brackets FACTORS OUT into the part-side filter, so the broadcast side
    * prunes at its scan (PushedFilters In(p_brand,...)) and only the mixed
    * part x lineitem residual evaluates post-join — the fact table is
    * never multiplied, never scanned twice, and the join stays a single
    * broadcast hash join. (Classic Q19 also ORs the join key context;
    * the driver's part table lacks p_container/l_shipmode, so the brackets
    * use the columns that exist — the optimizer-relevant structure is the
    * same.) Revenue uses the q20 integer-micros exact-sum kernel.
    */
  def disjunctiveBracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val brackets =
      (col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" &&
        col("p_size").between(5, 20) && col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#3" &&
        col("p_size").between(10, 40) && col("l_quantity").between(20, 50))
    lineitem
      .join(
        broadcast(part.filter(
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))),
        col("l_partkey") === col("p_partkey"))
      .filter(brackets)
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q113: TPC-H-Q4-style priority check — count orders BY PRIORITY that
    * have at least one returned line. The EXISTS subquery is a LEFT SEMI
    * join: the fact side passes through at most once per order no matter
    * how many lines match (a plain inner join would double-count), and the
    * lineitem side projects (l_orderkey) only after its returnflag filter
    * — at 100 TB the semi-join probe input is the filtered key column,
    * nothing wider.
    */
  def priorityReturnCheck(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(
        lineitem.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** Q114: TPC-H-Q10-style returned-item reporting — the top customers by
    * revenue lost to returns in one quarter. Returned lines filter at the
    * lineitem scan, the quarter filter prunes orders at ITS scan, nation
    * broadcasts, and the top-20 is a deterministic (revenue DESC, custkey)
    * order over the customer-sized aggregate — sort input is already
    * reduced, never the fact table.
    */
  def returnedItemReport(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      quarterStart: String = "1995-01-01", k: Int = 20): DataFrame = {
    val qEnd = date_add(lit(quarterStart).cast("date"), 90)
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(
        orders.filter(col("o_orderdate") >= lit(quarterStart).cast("date") &&
          col("o_orderdate") < qEnd),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Q115: TPC-H-Q14-style promo revenue share per ship-month — the
    * conditional-aggregate ratio (one pass computes both numerator and
    * denominator; no self-join, no second scan). Part broadcasts; the
    * ratio rounds to the 6-dp grid after an exact-decimal division.
    */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(
        decSum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
          .cast("double").as("promo_revenue"),
        decSum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6))
  }

  /** Q123: TPC-H Q2 shape — the CORRELATED-MIN join: for each part of a
    * type, every regional supplier achieving that part's minimum unit
    * price (ties kept, as Q2 keeps them). Catalyst decorrelates this
    * shape into exactly what is written here explicitly: per-(part,
    * supplier) costs, a per-part min over the SAME aggregate (one reused
    * exchange — both aggregations shuffle on `l_partkey`), and an equality
    * join back. Selective dimensions apply BEFORE the aggregation: region
    * prunes the supplier side through broadcast nation⋈region (25+5 rows
    * always), the part-type filter prunes lineitem through the part join —
    * at 100 TB the aggregation only ever sees qualifying rows. No
    * driver-side anything; part is joined, not broadcast (SF-proportional).
    *
    * Unit cost is EXACT INTEGER MICRO-UNITS: (price-cents · 10⁴) div
    * quantity — prices are exact cents and TPC-H quantities integers,
    * so the min/tie comparisons run on identical longs in both engines.
    * The earlier `round(price/qty, 6)` double hit the half-even vs
    * half-up tie class at sf0.1 (a quotient landing exactly on ...5 at
    * the 6th decimal: Spark HALF_UP gave ...813, DuckDB's nearbyint
    * gave ...812 — 1 row in 3373).
    */
  def cheapestRegionalSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String = "EUROPE", partType: String = "LARGE"): DataFrame = {
    val sup = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val costs = lineitem
      .join(part.filter(col("p_type") === partType)
        .select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"))
      .agg(min(expr("(CAST(round(l_extendedprice * 100) AS BIGINT)" +
        " * 10000) div CAST(l_quantity AS BIGINT)"))
        .as("unit_cost_micro"))
    val minCost = costs.groupBy(col("p_partkey").as("__pk"))
      .agg(min(col("unit_cost_micro")).as("min_cost"))
    costs
      .join(minCost, col("p_partkey") === col("__pk"))
      .filter(col("unit_cost_micro") === col("min_cost"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("unit_cost_micro"))
  }

  /** Q124: TPC-H Q11 shape — groups filtered by a GLOBAL-SCALAR
    * subquery: parts whose revenue exceeds `factor`× the mean per-part
    * revenue. The scalar lands as a broadcast of one row onto the
    * per-part aggregate (Catalyst plans the SQL subquery form the same
    * way); the threshold is RELATIVE (×mean, not an absolute share), so
    * the predicate's selectivity is scale-free — the query returns the
    * heavy tail at any SF instead of going empty or corpus-sized.
    * Exchange reuse: the per-part aggregate materializes once and feeds
    * both the scalar and the filter.
    */
  def partValueConcentration(lineitem: DataFrame,
      factor: Double = 1.2): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    // stay in DECIMAL through the comparison: distributed double sums are
    // summation-order-dependent, decimal sums are exact — the threshold
    // compare (pv·n > factor·total) is engine-identical rational
    // arithmetic, and only the display columns drop to double
    val totals = lineitem.groupBy(col("l_partkey"))
      .agg(decSum(rev).as("pv"))
    val global = totals.agg(
      sum(col("pv")).as("__tot"), count(lit(1)).as("__n"))
    totals.crossJoin(broadcast(global))
      .filter(col("pv") * col("__n") >
        lit(factor).cast("decimal(6,4)") * col("__tot"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("pv").cast("double"), 4).as("part_value"),
        round(col("pv").cast("double") / col("__tot").cast("double"), 6)
          .as("value_share"))
  }

  /** Star-schema revenue rollup: orders ⋈ customer ⋈ nation ⋈ region — the
    * dimension tables are tiny and broadcast (verified in PlanSpec), so the
    * only shuffle is the final aggregation.
    */
  def revenueByNation(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        decSum(col("o_totalprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Analytic windows over per-supplier monthly revenue: rank within
    * supplier, lag delta, running total. Pre-aggregates BEFORE the window
    * (small keyed input to the sort), and the month key makes in-partition
    * order unique ⇒ deterministic frames.
    */
  def supplierMonthly(lineitem: DataFrame): DataFrame = {
    val monthly = lineitem
      .groupBy(col("l_suppkey"), date_trunc("month", col("l_shipdate")).as("month"))
      .agg(decSum(col("l_extendedprice")).cast("decimal(20,6)").as("revenue"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("month"))
    monthly
      .withColumn("rank_in_supp",
        row_number().over(Window.partitionBy(col("l_suppkey")).orderBy(col("revenue").desc, col("month"))).cast("long"))
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w).cast("double"))
      .withColumn("running_revenue",
        sum(col("revenue")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("revenue", col("revenue").cast("double"))
  }

  /** ROLLUP aggregation (grouping-sets family). */
  def returnsRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** Set operations over the events table: users who viewed but never
    * clicked (EXCEPT), plus users who did both (INTERSECT), tagged.
    */
  def viewClickSets(events: DataFrame): DataFrame = {
    val viewers = events.filter(col("event_type") === "view").select(col("user_id")).distinct()
    val clickers = events.filter(col("event_type") === "click").select(col("user_id")).distinct()
    viewers.except(clickers).withColumn("tag", lit("view_only"))
      .unionByName(viewers.intersect(clickers).withColumn("tag", lit("both")))
      .select(col("tag"), col("user_id"))
  }

  /** Anti-join: customers with no order above `minPrice` (the filter is
    * pushed below the anti-join into the orders scan).
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
      minPrice: Double = 0.0): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minPrice),
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Distinct aggregation: exact distinct users + event count per type. */
  def distinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** Sketch aggregation: HyperLogLog++ approximate distinct users per
    * event type — at 100 TB the sketch is the right default (constant
    * memory, one pass, mergeable partials); the exact variant
    * ([[distinctUsers]]) needs a distinct shuffle. Accuracy bound is
    * asserted in RelationalSpec (rows-only query: the sketch is
    * engine-specific, so no cross-engine oracle).
    */
  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** Tumbling event-time windows (the `window()` operator): daily event
    * counts — the same expression works on a streaming DataFrame with a
    * watermark.
    */
  def dailyEventCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day"), col("event_type"), col("n"))

  /** Q92: SLIDING (hopping) event-time windows — the third window family
    * next to tumbling (q28) and session (q34): overlapping windows of
    * `duration` advancing every `slide`, so each event lands in
    * duration/slide windows (2 here). The `window()` expression expands
    * each row to its covering windows in place (a generate, not a join)
    * and the aggregation shuffles once on (window, key) — and the same
    * expression runs streaming under a watermark, where a closed window
    * emits once. Spark aligns window starts to the Unix epoch; the oracle
    * reproduces that alignment with integer epoch arithmetic.
    */
  def slidingEventCounts(events: DataFrame,
      duration: String = "10 minutes", slide: String = "5 minutes"): DataFrame =
    events.groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sort + limit top-n with a total tiebreak order (deterministic). */
  def topOrders(orders: DataFrame, n: Int): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Q34: sessionization — gap-based session windows per user via Spark's
    * native `session_window` (consecutive events share a session iff their
    * gap is AT MOST `gap` — the merge bound is inclusive, asserted in
    * RelationalSpec). The SAME expression runs on a streaming
    * DataFrame with a watermark (asserted in StreamingWindowAggSpec);
    * batch-side it is one shuffle on the grouping key with sessions merged
    * by the aggregation — no self-join, no per-user collect.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  /** Q44: count-min sketch of per-type user activity — the third sketch
    * in the family next to HLL distinct (q29) and KLL-style percentiles
    * (q37's approx variant): constant-memory mergeable partials whose
    * point-frequency estimates overcount by at most ε·N with probability
    * ≥ confidence. Rows-only (the sketch binary is engine-specific); the
    * error bound is asserted against exact counts in RelationalSpec.
    */
  def userActivitySketch(events: DataFrame,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count_min_sketch(col("user_id"), lit(eps), lit(confidence), lit(42)).as("cms"),
        count(lit(1)).as("n_events"))

  /** Q43: data-profile audit of the orders table — the pre-ingest quality
    * gate a pipeline runs before training: per-column null counts,
    * distinct cardinalities, and value ranges, in ONE pass (a single
    * aggregation; no per-column jobs). All outputs are exact
    * integers/strings, so the profile is partitioning-independent.
    */
  def ordersProfile(orders: DataFrame): DataFrame =
    orders.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("null_totalprice"),
      countDistinct(col("o_orderstatus")).as("distinct_status"),
      countDistinct(col("o_orderpriority")).as("distinct_priority"),
      countDistinct(col("o_custkey")).as("distinct_custkeys"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"),
      min(col("o_orderdate")).as("first_order"),
      max(col("o_orderdate")).as("last_order"))

  /** Q41: analytic-window breadth — ntile buckets, percent_rank, and
    * cume_dist over order prices within each priority class (completing
    * the ranking/analytic/frames family next to q22's
    * rank/lag/running-sum). The (o_totalprice, o_orderkey) order is total,
    * so every rank-derived value is deterministic.
    */
  def orderPriceRanks(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select(
      col("o_orderpriority"),
      col("o_orderkey"),
      col("o_totalprice"),
      ntile(4).over(w).cast("long").as("price_quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** Q37: exact interpolated percentiles of `value` per event type, plus
    * the approximate-sketch variant for the 100 TB path. The exact form
    * (`percentile`) needs the group's values collected per aggregation
    * buffer — fine for bounded groups, and the cross-engine-checkable
    * ground truth; `approx_percentile` (KLL-style sketch, mergeable
    * constant-memory partials) is what a 100 TB pipeline should run, with
    * its error bound asserted against the exact form in RelationalSpec.
    */
  def valuePercentiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.95)).as("p95"),
        percentile(col("value"), lit(0.99)).as("p99"),
        count(lit(1)).as("n_events"))

  /** Q86: exact per-group median and quartiles via the ANSI
    * `percentile_cont(p) WITHIN GROUP (ORDER BY …)` form — linear
    * interpolation between the two straddling order statistics, the
    * classic analytic aggregate every warehouse exposes. Input is cast to
    * double BEFORE the aggregate so both engines interpolate in identical
    * float arithmetic (decimal-in would make each engine pick its own
    * intermediate type). Same scale story as q37: exact form needs the
    * group's values in one aggregation buffer — the cross-engine ground
    * truth; unbounded groups at 100 TB go through `approx_percentile`
    * (q44) instead.
    */
  def groupPriceQuartiles(orders: DataFrame): DataFrame = {
    def pc(p: Double) = expr(
      s"percentile_cont($p) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE))")
    orders.groupBy(col("o_orderpriority"))
      .agg(
        pc(0.25).as("p25"),
        pc(0.5).as("median_price"),
        pc(0.75).as("p75"),
        count(lit(1)).as("n_orders"))
      .withColumn("iqr", col("p75") - col("p25"))
  }

  /** Q91: `percentile_disc` — q86's DISCRETE companion: the smallest
    * actual data value whose cumulative distribution reaches p (an order
    * statistic, never an interpolated synthetic value — what you want
    * when the value must be a real observation, e.g. a representative
    * document length). No interpolation means no float-arithmetic parity
    * concern at all; the DOUBLE cast just unifies the output type.
    */
  def groupPriceDiscretePercentiles(orders: DataFrame): DataFrame = {
    def pd(p: Double) = expr(
      s"percentile_disc($p) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE))")
    orders.groupBy(col("o_orderstatus"))
      .agg(
        pd(0.25).as("p25_disc"),
        pd(0.5).as("median_disc"),
        pd(0.75).as("p75_disc"),
        count(lit(1)).as("n_orders"))
  }

  /** Q253: RFM SEGMENTATION — every customer scored 1-5 on Recency
    * (last order day), Frequency (order count) and Monetary (lifetime
    * cents) against the EXACT 20/40/60/80 discrete-percentile
    * boundaries of the customer population: the classic CRM cohort
    * operator. Value-based scoring (1 + number of boundaries strictly
    * below the value) instead of a global ntile window — ties get the
    * same score deterministically on any engine AND the plan carries
    * no single-partition window over the customer dimension: the
    * boundaries are twelve scalar aggregates broadcast back over the
    * per-customer rollup, so the scoring pass is map-only. Customers
    * with no orders have no RFM (join-based, omitted).
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        datediff(to_date(max(col("o_orderdate"))), lit("1970-01-01"))
          .cast("long").as("recency_day"),
        count(lit(1)).as("frequency"),
        sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
          .as("monetary_cents"))
    def pd(c: String, p: Double) = expr(
      s"percentile_disc($p) WITHIN GROUP (ORDER BY CAST($c AS DOUBLE))")
      .as(s"${c.take(1)}_q${(p * 100).toInt}")
    val bounds = per.agg(
      pd("recency_day", 0.2), pd("recency_day", 0.4),
      pd("recency_day", 0.6), pd("recency_day", 0.8),
      pd("frequency", 0.2), pd("frequency", 0.4),
      pd("frequency", 0.6), pd("frequency", 0.8),
      pd("monetary_cents", 0.2), pd("monetary_cents", 0.4),
      pd("monetary_cents", 0.6), pd("monetary_cents", 0.8))
    def score(v: Column, qs: Seq[Column]): Column =
      qs.foldLeft(lit(1L)) { (acc, q) =>
        acc + when(v.cast("double") > q, 1L).otherwise(0L)
      }
    val b = (c: String, p: Double) => col(s"${c.take(1)}_q${(p * 100).toInt}")
    per.crossJoin(broadcast(bounds))
      .select(col("c_custkey"), col("recency_day"), col("frequency"),
        col("monetary_cents"),
        score(col("recency_day"),
          Seq(0.2, 0.4, 0.6, 0.8).map(b("recency_day", _)))
          .as("r_score"),
        score(col("frequency"),
          Seq(0.2, 0.4, 0.6, 0.8).map(b("frequency", _))).as("f_score"),
        score(col("monetary_cents"),
          Seq(0.2, 0.4, 0.6, 0.8).map(b("monetary_cents", _)))
          .as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
  }

  /** Q259: AUTOCORRELATION of the daily-revenue series at lags 1..k —
    * the stationarity/seasonality diagnostic read before any forecast
    * (q126) is trusted: sample ACF(k) = Σ(r_t−μ)(r_{t−k}−μ) / Σ(r_t−μ)²
    * over the day pairs present at each lag. A weekly cycle surfaces
    * as a lag-7 peak.
    *
    * Exactness: deviations ride as the exact integers `r·n − S` (cents
    * × day-count), products and sums in DECIMAL(38,0) (mirrored by
    * DuckDB HUGEINT — ~26 digits at a 1e9-cents/day, 10k-day series,
    * well inside both), one mirrored divide per lag, 6 dp. The day
    * series is an aggregate (≤ days rows), so the lag self-join is
    * dimension-sized — the corpus is touched once.
    */
  def revenueAcf(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 365, s"maxLag out of range: $maxLag")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        (col("r") * col("n") - col("s")).as("dv"))
    val c0 = dev.agg(sum(dec(col("dv")) * dec(col("dv"))).as("c0"),
      max(col("n")).as("n"))
    val lags = dev.select(col("d"), col("dv"),
      explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
    val pairs = lags
      .select(col("d"), col("dv"), col("lag"),
        (col("d") - col("lag")).as("dk"))
      .join(dev.select(col("d").as("dk"), col("dv").as("dvk")),
        Seq("dk"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("dv")) * dec(col("dvk"))).as("ck"))
    pairs.crossJoin(broadcast(c0))
      // a constant series has no variance and no defined ACF — drop
      // rather than emit NaN (mirrored WHERE in the oracle)
      .filter(col("c0").cast("double") > 0.0)
      .select(col("lag"), col("n_pairs"),
        round(col("ck").cast("double") / col("c0").cast("double"), 6)
          .as("acf"))
  }

  /** Q318: CROSS-CORRELATION FUNCTION between daily revenue and daily
    * order count at lags −maxLag..maxLag — does volume LEAD revenue or
    * lag it (the two-series generalization of q259's ACF; an
    * asymmetric CCF is the classic lead–lag diagnostic)? Both series
    * come from ONE daily aggregation; deviations are the q259
    * n-scaled exact integers (dv = v·n − Σv, LONG per day), the
    * lag-k cross-products are DECIMAL(38,0) sums over the day-bounded
    * equi-join on shifted day keys, and
    * ccf_k = Σ dvx_t·dvy_{t−k} / sqrt(c0x·c0y) is one mirrored double
    * expression per lag. Constant series are dropped (no defined CCF),
    * the q259 convention.
    */
  def ccfDaily(orders: DataFrame, maxLag: Int = 7): DataFrame =
    ccfFromDaily(orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"),
        count(lit(1)).as("c")), maxLag)

  /** [[ccfDaily]] from an already-built `(d, r, c)` daily table — the
    * cells-level entry for the STREAMING dual: the daily aggregate is
    * a sum-monoid, so
    * [[graft.streaming.StreamingStats.dailySeriesStream]] maintains
    * exactly this frame over an unbounded order stream and a snapshot
    * of it feeds the same verdict (equivalence pinned in
    * StreamingSeriesSpec — the lepageVerdict story on the time axis).
    */
  def ccfFromDaily(daily: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 365, s"maxLag out of range: $maxLag")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
      sum(col("c")).as("sc"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("d"),
        (col("r") * col("n") - col("sr")).as("dvx"),
        (col("c") * col("n") - col("sc")).as("dvy"))
    val c0 = dev.agg(sum(dec(col("dvx")) * dec(col("dvx"))).as("c0x"),
      sum(dec(col("dvy")) * dec(col("dvy"))).as("c0y"))
    val pairs = dev
      .select(col("d"), col("dvx"),
        explode(sequence(lit(-maxLag.toLong), lit(maxLag.toLong)))
          .as("lag"))
      .select(col("dvx"), col("lag"), (col("d") - col("lag")).as("dk"))
      .join(dev.select(col("d").as("dk"), col("dvy").as("dvyk")),
        Seq("dk"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("dvx")) * dec(col("dvyk"))).as("ck"))
    pairs.crossJoin(broadcast(c0))
      .filter(col("c0x").cast("double") > 0.0 &&
        col("c0y").cast("double") > 0.0)
      .select(col("lag"), col("n_pairs"),
        round(col("ck").cast("double") /
          sqrt(col("c0x").cast("double") * col("c0y").cast("double")),
          6).as("ccf"))
  }

  /** Q319: AUGMENTED DICKEY–FULLER unit-root test (one augmentation
    * lag) on daily revenue — is the series mean-reverting or a random
    * walk (the question q275's CUSUM and q293's Pettitt presuppose an
    * answer to)? The regression Δr_t = β0 + β1·r_{t−1} + β2·Δr_{t−1}
    * rides the q258 exact-moment device: the lag frame comes from two
    * equi-joins on shifted day keys (consecutive-day triples only, the
    * standard convention), ONE aggregation produces the nine DECIMAL
    * moment sums on the integer DOLLAR grid (coarser than cents so
    * per-row squares stay in LONG with 100× headroom — the q287
    * precedent), and β, SSE and SE(β1) are column expressions over the
    * one-row frame: Var(β1) = s²·(n·s22 − s2²)/det with the fixed q250
    * det shape, t_ADF = β1/SE(β1). NaN on a singular design, n ≤ 3, or
    * degenerate variance — never an ANSI divide.
    */
  def adfTest(orders: DataFrame): DataFrame =
    adfFromDaily(orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("r")))

  /** [[adfTest]] from an already-built `(d, r)` daily table — the
    * cells-level entry for the streaming dual (the [[ccfFromDaily]]
    * story; DOLLAR grid like [[kpssFromDaily]]).
    */
  def adfFromDaily(daily: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val frame = daily
      .join(daily.select((col("d") + lit(1L)).as("d"),
        col("r").as("r1")), Seq("d"))
      .join(daily.select((col("d") + lit(2L)).as("d"),
        col("r").as("r2")), Seq("d"))
      .select((col("r") - col("r1")).as("y"), col("r1").as("x1"),
        (col("r1") - col("r2")).as("x2"))
    def dbl(name: String) = col(name).cast("double")
    val sums = frame.agg(
        count(lit(1)).as("nl"),
        sum(dec(col("x1"))).as("s1d"),
        sum(dec(col("x2"))).as("s2d"),
        sum(dec(col("x1")) * col("x1")).as("s11d"),
        sum(dec(col("x1")) * col("x2")).as("s12d"),
        sum(dec(col("x2")) * col("x2")).as("s22d"),
        sum(dec(col("y"))).as("syd"),
        sum(dec(col("x1")) * col("y")).as("s1yd"),
        sum(dec(col("x2")) * col("y")).as("s2yd"),
        sum(dec(col("y")) * col("y")).as("syyd"))
      .select(col("nl"), col("nl").cast("double").as("n"),
        dbl("s1d").as("s1"), dbl("s2d").as("s2"), dbl("s11d").as("s11"),
        dbl("s12d").as("s12"), dbl("s22d").as("s22"), dbl("syd").as("sy"),
        dbl("s1yd").as("s1y"), dbl("s2yd").as("s2y"),
        dbl("syyd").as("syy"))
    def det3c(a: Column, b: Column, c: Column, d0: Column, e: Column,
        f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d0 * i - f * g) + c * (d0 * h - e * g)
    val det = det3c(col("n"), col("s1"), col("s2"), col("s1"),
      col("s11"), col("s12"), col("s2"), col("s12"), col("s22"))
    val det0 = det3c(col("sy"), col("s1"), col("s2"), col("s1y"),
      col("s11"), col("s12"), col("s2y"), col("s12"), col("s22"))
    val det1 = det3c(col("n"), col("sy"), col("s2"), col("s1"),
      col("s1y"), col("s12"), col("s2"), col("s2y"), col("s22"))
    val det2 = det3c(col("n"), col("s1"), col("sy"), col("s1"),
      col("s11"), col("s1y"), col("s2"), col("s12"), col("s2y"))
    sums
      .withColumn("det", det)
      .withColumn("b0", when(col("det") === 0.0, lit(Double.NaN))
        .otherwise(det0 / col("det")))
      .withColumn("b1", when(col("det") === 0.0, lit(Double.NaN))
        .otherwise(det1 / col("det")))
      .withColumn("b2", when(col("det") === 0.0, lit(Double.NaN))
        .otherwise(det2 / col("det")))
      .withColumn("sse", col("syy") -
        (col("b0") * col("sy") + col("b1") * col("s1y") +
          col("b2") * col("s2y")))
      .withColumn("varb1",
        when(col("nl") <= 3L || col("det") === 0.0, lit(Double.NaN))
          .otherwise(col("sse") / (col("n") - lit(3.0)) *
            (col("n") * col("s22") - col("s2") * col("s2")) /
            col("det")))
      .select(col("nl").as("n_rows"),
        round(col("b1"), 6).as("beta"),
        round(when(isnan(col("varb1")) || col("varb1") <= 0.0,
            lit(Double.NaN))
          .otherwise(col("b1") / sqrt(col("varb1"))), 6).as("adf_t"))
  }

  /** Q334: BARTELS RANK VON NEUMANN RATIO — the RANK-based serial
    * randomness test on daily revenue (q292's runs test upgraded: runs
    * only see the sign pattern, the von Neumann ratio sees how far
    * successive RANKS jump). Midranks over the daily-revenue value
    * histogram (exact ×2 grid; the enrolled vW site), joined back to
    * the day table; RVN = Σ(R_t − R_{t+1})²/Σ(R_t − R̄)² where the
    * numerator pairs SUCCESSIVE PRESENT days (lag over the enrolled
    * day window) and both sums stay exact on the ×4 integer grid
    * (midranks keep ΣR = N(N+1)/2, so 2R̄ = N+1 is integral).
    * z = (RVN − 2)/sqrt(20/(5N+7)) — the asymptotic null variance of
    * Bartels (1982), the randtests convention, documented. NaN on a
    * constant series or N < 2.
    */
  def bartelsRvn(orders: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val h = daily.groupBy(col("r").as("v")).agg(count(lit(1)).as("t"))
    val vW = Window.orderBy(col("v"))
    val ranks = h
      .withColumn("cumb", coalesce(sum(col("t")).over(
        vW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("v"),
        (lit(2L) * col("cumb") + col("t") + lit(1L)).as("r2"),
        col("t"))
    val tot = daily.agg(count(lit(1)).as("n"))
    val den = ranks.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(dec(col("t")) *
          (col("r2") - col("n") - lit(1L)) *
          (col("r2") - col("n") - lit(1L))).as("den4"))
    val dayW = Window.orderBy(col("d"))
    val nm = daily.join(ranks.select(col("v").as("r"), col("r2")),
        Seq("r"))
      .withColumn("p2", lag(col("r2"), 1).over(dayW))
      .filter(col("p2").isNotNull)
      .agg(sum(dec(col("r2") - col("p2")) * (col("r2") - col("p2")))
        .as("nm4"))
    def d(name: String): Column = col(name).cast("double")
    nm.crossJoin(broadcast(den))
      .withColumn("rvn",
        when(col("n") < 2L || col("den4").cast("double") <= 0.0,
          lit(Double.NaN))
          .otherwise(col("nm4").cast("double") /
            col("den4").cast("double")))
      .select(col("n").as("n_days"),
        round(col("rvn"), 6).as("rvn"),
        round(when(isnan(col("rvn")), lit(Double.NaN))
          .otherwise((col("rvn") - lit(2.0)) /
            sqrt(lit(20.0) / (lit(5.0) * d("n") + lit(7.0)))), 6)
          .as("z_score"))
  }

  /** Q321: CHOW STRUCTURAL-BREAK TEST at the calendar midpoint — did
    * the daily-revenue TREND LINE change regime (the parametric
    * companion of q293's Pettitt, which finds a level shift but says
    * nothing about slope)? Two simple OLS fits r ~ β0 + β1·d on the
    * day halves plus the pooled fit, all from ONE conditional
    * aggregation of the day table (six exact DECIMAL moments per
    * side on the dollar grid; pooled = the sums of the sides);
    * F = ((SSE_p − SSE_1 − SSE_2)/k)/((SSE_1 + SSE_2)/(n − 2k)) with
    * k = 2, each SSE the 2×2-Cramer closed form syy − b0·sy − b1·sty.
    * NaN on a degenerate half (det = 0), n ≤ 4, or a zero residual
    * denominator. The break DAY is the deterministic midpoint
    * (min+max)/2 — a known-break-point Chow, not a sup-F scan.
    */
  def chowTest(orders: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("r"))
    val mid = daily.agg(
      floor((min(col("d")) + max(col("d"))) / lit(2L)).cast("long")
        .as("mid"))
    def side(cond: Column, c: Column): Column =
      sum(dec(when(cond, c).otherwise(lit(0L))))
    val sums = daily.crossJoin(broadcast(mid))
      .withColumn("lo", col("d") <= col("mid"))
      .agg(
        max(col("mid")).as("mid"),
        sum(when(col("lo"), lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(!col("lo"), lit(1L)).otherwise(lit(0L))).as("n2"),
        side(col("lo"), col("d")).as("st1"),
        side(!col("lo"), col("d")).as("st2"),
        side(col("lo"), col("d") * col("d")).as("stt1"),
        side(!col("lo"), col("d") * col("d")).as("stt2"),
        side(col("lo"), col("r")).as("sy1"),
        side(!col("lo"), col("r")).as("sy2"),
        side(col("lo"), col("d") * col("r")).as("sty1"),
        side(!col("lo"), col("d") * col("r")).as("sty2"),
        side(col("lo"), col("r") * col("r")).as("syy1"),
        side(!col("lo"), col("r") * col("r")).as("syy2"))
    def d(name: String): Column = col(name).cast("double")
    // SSE of r ~ 1 + d from the six moments (2x2 Cramer closed form);
    // the same fixed shape for each half and the pooled sums
    def sse(n: Column, st: Column, stt: Column, sy: Column, sty: Column,
        syy: Column): Column = {
      val det = n * stt - st * st
      when(det === 0.0, lit(Double.NaN)).otherwise(
        syy - ((sy * stt - sty * st) / det * sy +
          (n * sty - st * sy) / det * sty))
    }
    sums
      .withColumn("n", (col("n1") + col("n2")).cast("double"))
      .withColumn("sse1", sse(d("n1"), d("st1"), d("stt1"), d("sy1"),
        d("sty1"), d("syy1")))
      .withColumn("sse2", sse(d("n2"), d("st2"), d("stt2"), d("sy2"),
        d("sty2"), d("syy2")))
      .withColumn("ssep", sse(col("n"),
        d("st1") + d("st2"), d("stt1") + d("stt2"),
        d("sy1") + d("sy2"), d("sty1") + d("sty2"),
        d("syy1") + d("syy2")))
      .withColumn("den",
        when(col("n") <= 4.0, lit(Double.NaN)).otherwise(
          (col("sse1") + col("sse2")) / (col("n") - lit(4.0))))
      .select((col("n1") + col("n2")).as("n_days"), col("mid").as("mid_day"),
        round(when(isnan(col("den")) || col("den") <= 0.0,
            lit(Double.NaN))
          .otherwise((col("ssep") - col("sse1") - col("sse2")) /
            lit(2.0) / col("den")), 6).as("f_stat"))
  }

  /** Q320: KPSS LEVEL-STATIONARITY TEST (lag-0 long-run variance) on
    * daily revenue — the COMPLEMENT of q319's ADF: KPSS takes
    * stationarity as H₀ where ADF takes the unit root, and reading
    * them together is the standard practice. η = Σ_t S_t²/(n·Σ_t e_t²)
    * over day-ordered partial sums S_t of the demeaned series — the
    * common scale cancels, so the q259 n-scaled integer deviations
    * (e = r·n − Σr, exact LONG) feed a DECIMAL cumulative window over
    * the calendar-bounded day table (the q275 CUSUM class), squares in
    * DECIMAL, one mirrored divide. The lag-0 variant is documented:
    * Bartlett-weighted long-run variance adds data-dependent weight
    * sums this bounded chain doesn't need for the day-table scale.
    */
  def kpssTest(orders: DataFrame): DataFrame =
    kpssFromDaily(orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("r")))

  /** [[kpssTest]] from an already-built `(d, r)` daily table — the
    * cells-level entry for the streaming dual (the [[ccfFromDaily]]
    * story; note the DOLLAR grid).
    */
  def kpssFromDaily(daily: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        (col("r") * col("n") - col("s")).as("e"))
    val dayW = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev
      .withColumn("st", sum(dec(col("e"))).over(dayW))
      .agg(max(col("n")).as("n_days"),
        sum(col("st") * col("st")).as("ssq"),
        sum(dec(col("e")) * col("e")).as("esq"))
      .select(col("n_days"),
        round(when(col("esq").cast("double") <= 0.0, lit(Double.NaN))
          .otherwise(col("ssq").cast("double") /
            (col("n_days").cast("double") *
              col("esq").cast("double"))), 6).as("kpss_eta"))
  }

  /** Q301: PARTIAL AUTOCORRELATION (lags 1–3) of daily revenue — the
    * AR-order diagnostic q259's raw ACF can't give (a pure AR(1)
    * series shows geometric ACF at EVERY lag but PACF ≈ 0 past lag
    * 1). Durbin–Levinson unrolled over the three ACF scalars:
    * φ11 = ρ1, φ22 = (ρ2 − ρ1²)/(1 − ρ1²),
    * φ33 = (ρ3 − φ21ρ2 − φ22ρ1)/(1 − φ21ρ1 − φ22ρ2) with
    * φ21 = ρ1(1 − φ22). The ρ's come from q259's exact
    * DECIMAL-covariance chain (one aggregation, day-bounded pairs);
    * every φ is a mirrored expression over those three doubles, NaN
    * on the degenerate zero denominators (the q279 discipline).
    */
  def pacfDaily(orders: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        (col("r") * col("n") - col("s")).as("dv"))
    val c0 = dev.agg(sum(dec(col("dv")) * dec(col("dv"))).as("c0"),
      max(col("n")).as("n"))
    val lags = dev.select(col("d"), col("dv"),
      explode(sequence(lit(1L), lit(3L))).as("lag"))
    val cks = lags
      .select(col("dv"), col("lag"), (col("d") - col("lag")).as("dk"))
      .join(dev.select(col("d").as("dk"), col("dv").as("dvk")),
        Seq("dk"))
      .groupBy(col("lag"))
      .agg(sum(dec(col("dv")) * dec(col("dvk"))).as("ck"))
      .agg(
        max(when(col("lag") === 1L, col("ck"))).as("ck1"),
        max(when(col("lag") === 2L, col("ck"))).as("ck2"),
        max(when(col("lag") === 3L, col("ck"))).as("ck3"))
    def d(name: String): Column = col(name).cast("double")
    cks.crossJoin(broadcast(c0))
      .filter(col("c0").cast("double") > 0.0) // constant series: drop
      .withColumn("r1", d("ck1") / d("c0"))
      .withColumn("r2", d("ck2") / d("c0"))
      .withColumn("r3", d("ck3") / d("c0"))
      .withColumn("den2", lit(1.0) - col("r1") * col("r1"))
      .withColumn("p22",
        when(col("den2") === 0.0, lit(Double.NaN))
          .otherwise((col("r2") - col("r1") * col("r1")) / col("den2")))
      .withColumn("p21", col("r1") * (lit(1.0) - col("p22")))
      .withColumn("den3",
        lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2"))
      .select(col("n").as("n_days"),
        round(col("r1"), 6).as("pacf1"),
        round(col("p22"), 6).as("pacf2"),
        round(when(isnan(col("den3")) || col("den3") === 0.0,
            lit(Double.NaN))
          .otherwise((col("r3") - col("p21") * col("r2") -
            col("p22") * col("r1")) / col("den3")), 6).as("pacf3"))
  }

  /** Q260: DAY-OF-WEEK SEASONALITY INDEX — each weekday's mean daily
    * revenue relative to the overall daily mean (index 1.0 = flat),
    * the companion read to q259's ACF lag-7 peak. Exact: day totals
    * in cents, the index one mirrored divide of exact-integer ratios
    * `(Σ_dow r · n_days) / (Σ r · n_dow)`, 6 dp. Day-of-week from
    * epoch day arithmetic ((d + 4) mod 7: 1970-01-01 was a Thursday;
    * 0 = Monday) — pure integers, no timezone/locale surface.
    */
  def dowSeasonality(orders: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
      .select(pmod(col("d") + lit(4L), lit(7L)).as("dow"), col("r"))
    val tot = daily.agg(count(lit(1)).as("n_days"),
      sum(dec(col("r"))).as("s_all"))
    daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_dow"), sum(dec(col("r"))).as("s_dow"))
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("n_dow"),
        round((col("s_dow").cast("double") *
          col("n_days").cast("double")) /
          (col("s_all").cast("double") * col("n_dow").cast("double")),
          6).as("seasonal_index"))
  }

  /** Q263: THEIL–SEN robust trend of the daily-revenue series — the
    * median of all pairwise slopes (r_j − r_i)/(j − i), the estimator
    * that shrugs off the outlier days OLS chases. The pair set is
    * generated WITHOUT a nested-loop join: each day explodes over lag
    * literals 1..maxLagDays and equi-joins day+lag (the q259 device),
    * so the plan stays BNLJ-free and the pair table is bounded by the
    * day DIMENSION (≤ days·maxLag rows — ~1e8 at a 30-year corpus,
    * never fact rows). Slopes are one mirrored double divide of exact
    * cent/day integers; the median is percentile_disc (an actual pair
    * slope — engine-identical selection on identical doubles).
    */
  def theilSenTrend(orders: DataFrame, maxLagDays: Int = 4000)
      : DataFrame = {
    require(maxLagDays >= 1 && maxLagDays <= 100000,
      s"maxLagDays out of range: $maxLagDays")
    val spark = orders.sparkSession
    // pinned: the day aggregate feeds THREE subtrees (the exploded
    // side, the span scalar, the broadcast join side) — without the pin
    // each recomputed the orders scan + aggregation (~0.4 s apiece at
    // sf0.1); the pinned frame is day-dimension-bounded
    val daily = Pinning.pin(orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r")))
    // r18 optimization, both measured on the stage profile (guide §2):
    //  - the day aggregate's AQE-coalesced output is ONE tiny partition,
    //    so the lag explode, the pair join AND the partial median buffer
    //    all ran on a single core (2.5 s single-task map stage at
    //    sf0.1); repartitionForCompute spreads the day dimension first;
    //  - each day exploded the FULL 1..maxLag lag list and let the join
    //    discard lags past the end of the series — at a ~2400-day span
    //    that generated 3.3x the true pair count (9.6M rows for 2.9M
    //    pairs). Capping the lag list at __dmax − d generates exactly
    //    the pair set the join keeps: any surviving pair has
    //    d2 = d1 + lag <= dmax, so no output row is gained or lost.
    val span = daily.agg(max(col("d")).as("__dmax"))
    val slopes = Hashing.repartitionForCompute(daily, "d")
      .crossJoin(broadcast(span))
      .filter(col("d") < col("__dmax"))
      .select(col("d"), col("r"),
        explode(sequence(lit(1L),
          least(lit(maxLagDays.toLong), col("__dmax") - col("d"))))
          .as("lag"))
      .select((col("d") + col("lag")).as("d2"), col("d").as("d1"),
        col("r").as("r1"))
      // the day table is dimension-bounded by construction: broadcast
      // it — at larger SFs Catalyst's pre-aggregation size estimate
      // stops choosing broadcast and sort-merges the exploded side
      // (measured 16.5 s vs ~3 s at sf0.1)
      .join(broadcast(daily.select(col("d").as("d2"),
        col("r").as("r2"))), Seq("d2"))
      .select(((col("r2") - col("r1")).cast("double") /
        (col("d2") - col("d1")).cast("double")).as("slope"))
    // r18 optimization (guide §2.4/§5): `percentile_disc` over the pair
    // table put every slope into ONE reducer's percentile buffer (6.7 s
    // single-task final stage at sf0.1, 30 MB of serialized partials).
    // The median is now an exact distributed selection — same value by
    // the same smallest-cume_dist>=p contract, spec-pinned against the
    // aggregate — and the driver sees only <= `parts` count rows plus
    // one element (the ExactSubstr stats discipline).
    val (n, sen) = discPercentileBySelection(slopes, "slope", 0.5)
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(daily)
    val r6 = sen.map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(
        n, r6.map(java.lang.Double.valueOf).orNull)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_pairs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sen_slope_cents_per_day",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  /** EXACT discrete percentile — the `percentile_disc(p)` contract: the
    * smallest value whose cumulative distribution reaches `p` — computed
    * by distributed range-partition SELECTION instead of the aggregate's
    * single-reducer percentile buffer. One range shuffle of the value
    * column (pinned: the sampled range boundaries must not re-draw
    * between the two passes), a <= `parts`-row per-partition count
    * collect (the ExactSubstr driver-stats discipline), then a read of
    * the one target element. The rank threshold replays the aggregate's
    * own `cume >= p` double comparison, so the selected element is
    * identical on any input. Returns (n, Some(value)); (0, None) on
    * empty input.
    */
  private[graft] def discPercentileBySelection(values: DataFrame,
      valueCol: String, p: Double): (Long, Option[Double]) = {
    val spark = values.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // NULLs are dropped up front so the helper matches percentile_disc
    // (the aggregate ignores them); a no-op for the current non-null
    // slope caller, mandatory for any future reuse (ADVICE r18 item 4)
    val sorted = Pinning.pin(values
      .filter(col(valueCol).isNotNull)
      .repartitionByRange(parts, col(valueCol))
      .sortWithinPartitions(col(valueCol)))
    val vi = sorted.schema.fieldIndex(valueCol)
    val counts = sorted.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        Iterator.single((pid, c))
      }.collect().sortBy(_._1)
    val n = counts.map(_._2).sum
    if (n == 0L) {
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(sorted)
      return (0L, None)
    }
    // smallest k with k/n >= p, in the aggregate's own double arithmetic
    var k = math.min(n, math.max(1L, math.ceil(p * n).toLong))
    while (k.toDouble / n.toDouble < p && k < n) k += 1
    while (k > 1L && (k - 1L).toDouble / n.toDouble >= p) k -= 1
    var cum = 0L
    var target = -1
    var local = 0L
    counts.foreach { case (pid, c) =>
      if (target < 0) {
        if (cum + c >= k) { target = pid; local = k - cum } else cum += c
      }
    }
    val (tp, li) = (target, local)
    val v = sorted.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (pid != tp) Iterator.empty
      else {
        // Long-safe element skip (VERDICT r18 item 2 / ADVICE item 1):
        // `it.drop(li.toInt - 1)` silently truncated the Long local
        // rank — a range partition holding > 2^31 values (heavy ties
        // force every equal value into one partition at the 100 TB pair
        // scale) would select the wrong element
        var skip = li - 1L
        while (skip > 0L && it.hasNext) { it.next(); skip -= 1L }
        if (it.hasNext) Iterator.single(it.next().getDouble(vi))
        else Iterator.empty
      }
    }.collect()
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(sorted)
    (n, v.headOption)
  }

  /** Q343: SCALABLE THEIL–SEN — the PRODUCTION variant of q263
    * (VERDICT r17 item 7): pair slopes restricted to a DETERMINISTIC
    * DYADIC LAG LADDER 1, 2, 4, …, 2^maxLagExp instead of every lag
    * 1..maxLag. The pair table shrinks from days·maxLag rows to
    * days·(maxLagExp+1) — log-factor work in the series span, so the
    * estimator stays O(days·log days) at a 30-year corpus where the
    * exact form's ~1e8-row pair table is the cost. The ladder keeps
    * the estimator's character: every time scale contributes equally
    * (short-lag noise pairs no longer outnumber long-lag trend pairs
    * 1000:1 — if anything the ladder median is MORE trend-stable),
    * each slope is still an exact pairwise (r_j − r_i)/(j − i), and
    * the median is still percentile_disc over real pair slopes.
    * Deterministic and engine-mirrorable (no sampling hash), so it is
    * DIRECTLY oracled, unlike the LSH prod paths. Same plan shape as
    * q263: explode over the lag literals, equi-join day+lag against
    * the broadcast day dimension, one aggregation.
    */
  def theilSenTrendLadder(orders: DataFrame, maxLagExp: Int = 12)
      : DataFrame = {
    require(maxLagExp >= 0 && maxLagExp <= 40,
      s"maxLagExp out of range: $maxLagExp")
    // pinned for the same double-reference reason as q263's day table
    // (exploded side + broadcast side each recomputed the orders
    // scan + aggregation)
    val daily = Pinning.pin(orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r")))
    val lags = (0 to maxLagExp).map(e => lit(1L << e))
    val slopes = daily
      .select(col("d"), col("r"), explode(array(lags: _*)).as("lag"))
      .select((col("d") + col("lag")).as("d2"), col("d").as("d1"),
        col("r").as("r1"))
      // the q263 lesson: the day table is dimension-bounded by
      // construction — force broadcast so larger SFs never sort-merge
      // the exploded side
      .join(broadcast(daily.select(col("d").as("d2"),
        col("r").as("r2"))), Seq("d2"))
      .select(((col("r2") - col("r1")).cast("double") /
        (col("d2") - col("d1")).cast("double")).as("slope"))
    slopes.agg(count(lit(1)).as("n_pairs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)")
          .as("sen"))
      .select(col("n_pairs"),
        round(col("sen"), 6).as("sen_slope_cents_per_day"))
  }

  /** Q275: CUSUM CHANGE-POINT over the daily-revenue series — the
    * classic "did the level shift, and when?" detector: cumulative
    * sums of deviations from the global mean peak (in magnitude) at
    * the most likely change day. Deviations stay exact integers
    * (r·n − S, the q259 device), the running sum rides one window over
    * the DAY dimension (one row per day — the q90 epoch_day
    * boundedness argument), and the argmax is a deterministic
    * TakeOrdered on (|cusum| DESC, day). The reported statistic is
    * CUSUM/n in cents — one mirrored double divide.
    */
  def cusumChangePoint(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("epoch_day"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val tot = daily.agg(count(lit(1)).as("n"),
      sum(col("r")).as("s"))
    val w = Window.orderBy(col("epoch_day"))
    daily.crossJoin(broadcast(tot))
      .withColumn("dev", col("r") * col("n") - col("s"))
      .withColumn("cusum", sum(col("dev")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(abs(col("cusum")).desc, col("epoch_day"))
      .limit(1)
      .select(col("n").as("n_days"),
        col("epoch_day").as("change_epoch_day"),
        round(col("cusum").cast("double") / col("n").cast("double"), 4)
          .as("cusum_cents"))
  }

  /** Q292: WALD–WOLFOWITZ RUNS TEST on daily revenue — is the
    * above/below-median sign sequence RANDOM in time, or does it
    * clump (regimes) or alternate (overcorrection)? The companion of
    * q275/q277: CUSUM finds WHERE a level shifted, Mann–Kendall a
    * monotone drift; the runs test asks whether the sequence mixes at
    * all. The median is an exact `percentile_disc` element (q288
    * precedent), median-equal days are dropped (the classical
    * convention), runs are counted with one lag over the day-bounded
    * sequence, and z is one mirrored expression over exact counts
    * (NaN when a side is empty or n = 1 — the q279 discipline).
    */
  def runsTest(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("epoch_day"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val med = daily.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY r)").as("med"))
    val w = Window.orderBy(col("epoch_day"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("r") =!= col("med"))
      .withColumn("s", (col("r") > col("med")).cast("long"))
      .withColumn("flip",
        when(lag(col("s"), 1).over(w).isNull ||
          lag(col("s"), 1).over(w) =!= col("s"), lit(1L))
          .otherwise(lit(0L)))
    // coalesce: an all-median series leaves `signed` empty and empty
    // sums are NULL — the guards below need honest zeros
    val ag = signed.agg(
      coalesce(sum(col("s")), lit(0L)).as("n1"),
      coalesce(sum(lit(1L) - col("s")), lit(0L)).as("n2"),
      coalesce(sum(col("flip")), lit(0L)).as("runs"))
    def d(name: String): Column = col(name).cast("double")
    ag
      .withColumn("nn", d("n1") + d("n2"))
      .withColumn("p2", lit(2.0) * d("n1") * d("n2"))
      .withColumn("sig2",
        when(col("n1") === 0L || col("n2") === 0L ||
          col("n1") + col("n2") === 1L, lit(Double.NaN))
          .otherwise(col("p2") * (col("p2") - col("nn")) /
            (col("nn") * col("nn") * (col("nn") - lit(1.0)))))
      .select(col("n1").as("n_above"), col("n2").as("n_below"),
        col("runs").as("n_runs"),
        round(when(isnan(col("sig2")) || col("sig2") === 0.0,
            lit(Double.NaN))
          .otherwise((d("runs") - (col("p2") / col("nn") + lit(1.0))) /
            sqrt(col("sig2"))), 6).as("z_score"))
  }

  /** Q293: PETTITT CHANGE-POINT TEST on daily revenue — the
    * rank-based (distribution-free) sibling of q275's CUSUM: K =
    * max_t |U_t| with U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j), robust to
    * the heavy tails that make mean-based CUSUM jumpy. Computed in
    * O(days), never day pairs, via the rank identity
    * U_t = Σ_{i≤t} r2_i − t·(n+1) on the ×2 midrank grid (the q271
    * device — the identity holds exactly with midranks, and every
    * quantity is an exact BIGINT). Midranks come from the day-bounded
    * VALUE HISTOGRAM; the running sum runs over the day sequence.
    * Ties in |U| break to the earliest day.
    */
  def pettittChangePoint(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("epoch_day"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val hist = daily.groupBy(col("r").as("v"))
      .agg(count(lit(1)).as("t"))
    val vW = Window.orderBy(col("v"))
    val ranked = hist.withColumn("cumb",
      coalesce(sum(col("t")).over(
        vW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("v"),
        (lit(2L) * col("cumb") + col("t") + lit(1L)).as("r2"))
    val tot = daily.agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("epoch_day"))
    daily.join(broadcast(ranked), col("r") === col("v"))
      .crossJoin(broadcast(tot))
      .withColumn("st2", sum(col("r2")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tidx", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("u", col("st2") - col("tidx") * (col("n") + lit(1L)))
      .filter(col("tidx") < col("n")) // U_n ≡ 0: not a candidate
      .orderBy(abs(col("u")).desc, col("epoch_day"))
      .limit(1)
      .select(col("n").as("n_days"),
        col("epoch_day").as("change_epoch_day"),
        abs(col("u")).as("k_stat"))
  }

  /** Q296: POPULATION STABILITY INDEX of the order-priority mix
    * between the first and second half of the date range — the
    * industry drift gate ("did the segment mix move between
    * periods?"), the categorical sibling of q238's centroid drift:
    * PSI = Σ_k (p1k − p2k)·ln(p1k/p2k). The calendar midpoint is an
    * exact integer, cohort cells are exact counts, each cell's term
    * is one mirrored double expression gridded to 10⁻¹² (the q272
    * discipline), and cells absent from either cohort are excluded
    * (PSI is undefined there; k_cells reports the priced count).
    */
  def psiPriorityShift(orders: DataFrame): DataFrame = {
    val base = orders.select(col("o_orderpriority").as("k"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
    val rng = base.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(expr("(lo + hi) div 2").as("mid"))
    val cells = base.crossJoin(broadcast(rng))
      .groupBy(col("k"))
      .agg(sum(when(col("d") <= col("mid"), lit(1L)).otherwise(lit(0L)))
          .as("c1"),
        sum(when(col("d") > col("mid"), lit(1L)).otherwise(lit(0L)))
          .as("c2"))
    val tot = cells.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    def d(c: Column): Column = c.cast("double")
    cells.crossJoin(broadcast(tot))
      .filter(col("c1") > 0L && col("c2") > 0L)
      .withColumn("pg", round(
        (d(col("c1")) / d(col("n1")) - d(col("c2")) / d(col("n2"))) *
          log((d(col("c1")) / d(col("n1"))) /
            (d(col("c2")) / d(col("n2")))) * lit(1.0e12)).cast("long"))
      .agg(max(col("n1")).as("n_1"), max(col("n2")).as("n_2"),
        count(lit(1)).as("k_cells"), sum(col("pg")).as("psum"))
      .select(col("n_1"), col("n_2"), col("k_cells"),
        round(col("psum").cast("double") / lit(1.0e12), 6).as("psi"))
  }

  /** Q276: EWMA smoothing of daily revenue with a TRUNCATED binary
    * kernel — exponential decay α = 1/2 cut at 16 taps, so every
    * weight is the exact integer 2^(15−i) and the smoothed numerator
    * is an exact BIGINT (missing days contribute zero, the mirrored
    * convention). Expressed as the lag explode-and-equi-join device
    * (q259/q263): each day ships 16 weighted contributions to its
    * forward targets and one aggregation collects them — bounded by
    * 16·|days|, never fact rows, no self-theta-join anywhere. The
    * smoothed value is one mirrored divide by 2¹⁶.
    */
  def ewmaDaily(orders: DataFrame): DataFrame = {
    val taps = 16
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val kernel = array((0 until taps).map(i =>
      struct(lit(i.toLong).as("lag"),
        lit(1L << (taps - 1 - i)).as("w"))): _*)
    val contrib = daily
      .select(col("d"), col("r"), explode(kernel).as("k"))
      .groupBy((col("d") + col("k.lag")).as("d2"))
      .agg(sum(col("r") * col("k.w")).as("num"))
    daily.select(col("d").as("d2"), col("r"))
      .join(broadcast(contrib), Seq("d2"))
      .select(col("d2").as("epoch_day"), col("r").as("revenue_cents"),
        round(col("num").cast("double") / lit(65536.0), 4)
          .as("ewma_cents"))
  }

  /** Q277: MANN–KENDALL TREND TEST on daily revenue — the
    * nonparametric companion of q263's Theil–Sen slope: S = Σ sign of
    * all pairwise differences (the same bounded lag-join pair set, no
    * BNLJ), tie-corrected variance
    * Var = (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18, and the
    * continuity-corrected z. Everything before the final expression is
    * an exact BIGINT; z is one mirrored CASE + divide.
    */
  def mannKendallTrend(orders: DataFrame, maxLagDays: Int = 4000)
      : DataFrame = {
    require(maxLagDays >= 1 && maxLagDays <= 100000,
      s"maxLagDays out of range: $maxLagDays")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val pairs = daily
      .select(col("d"), col("r"),
        explode(sequence(lit(1L), lit(maxLagDays.toLong))).as("lag"))
      .select((col("d") + col("lag")).as("d2"), col("r").as("r1"))
      // day-dimension broadcast, the q263 argument
      .join(broadcast(daily.select(col("d").as("d2"),
        col("r").as("r2"))), Seq("d2"))
      .agg(sum(when(col("r2") > col("r1"), lit(1L))
        .when(col("r2") < col("r1"), lit(-1L))
        .otherwise(lit(0L))).as("s_stat"))
    val ties = daily.groupBy(col("r")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * (col("t") - lit(1L)) *
        (lit(2L) * col("t") + lit(5L))).as("tiesum"),
        sum(col("t")).as("n"))
    def d(name: String): Column = col(name).cast("double")
    pairs.crossJoin(broadcast(ties))
      .withColumn("var_s",
        (d("n") * (d("n") - lit(1.0)) * (lit(2.0) * d("n") + lit(5.0)) -
          d("tiesum")) / lit(18.0))
      .select(col("n").as("n_days"), col("s_stat"),
        round(col("var_s"), 4).as("var_s"),
        round(when(col("s_stat") > 0L,
            (d("s_stat") - lit(1.0)) / sqrt(col("var_s")))
          .when(col("s_stat") < 0L,
            (d("s_stat") + lit(1.0)) / sqrt(col("var_s")))
          .otherwise(lit(0.0)), 6).as("z_score"))
  }

  /** Q306: SEASONAL MANN–KENDALL on daily revenue — q277's trend test
    * computed WITHIN each day-of-week and summed (Hirsch & Slack
    * 1984): a weekly cycle contributes opposite-sign pairs to the
    * plain test and can mask (or fake) a trend; comparing only
    * same-weekday days removes the cycle. Pairs ride a dow EQUI-join
    * of the day dimension against its broadcast self (calendar-
    * bounded — ~(days/7)²·7 pairs, collapsing toward constant at
    * 100×); S and the tie-corrected variance are exact BIGINTs per
    * season, summed across the seven seasons; z is q277's mirrored
    * continuity-corrected expression (all-tied seasons zero both S
    * and their variance term, so z = 0 needs no divide).
    */
  def seasonalMannKendall(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
      .select(pmod(col("d") + lit(4L), lit(7L)).as("dow"), col("d"),
        col("r"))
    val s = daily
      .join(broadcast(daily.select(col("dow"), col("d").as("d2"),
        col("r").as("r2"))), Seq("dow"))
      .filter(col("d") < col("d2"))
      .agg(sum(when(col("r2") > col("r"), lit(1L))
        .when(col("r2") < col("r"), lit(-1L))
        .otherwise(lit(0L))).as("s_stat"))
    val per = daily.groupBy(col("dow")).agg(count(lit(1)).as("ng"))
      .agg(sum(col("ng") * (col("ng") - lit(1L)) *
        (lit(2L) * col("ng") + lit(5L))).as("vpos"),
        sum(col("ng")).as("n"))
    val ties = daily.groupBy(col("dow"), col("r"))
      .agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * (col("t") - lit(1L)) *
        (lit(2L) * col("t") + lit(5L))).as("tiesum"))
    def d(name: String): Column = col(name).cast("double")
    s.crossJoin(broadcast(per)).crossJoin(broadcast(ties))
      .withColumn("var_s",
        (d("vpos") - d("tiesum")) / lit(18.0))
      .select(col("n").as("n_days"), col("s_stat"),
        round(col("var_s"), 4).as("var_s"),
        round(when(col("s_stat") > 0L,
            (d("s_stat") - lit(1.0)) / sqrt(col("var_s")))
          .when(col("s_stat") < 0L,
            (d("s_stat") + lit(1.0)) / sqrt(col("var_s")))
          .otherwise(lit(0.0)), 6).as("z_score"))
  }

  /** Q307: LJUNG–BOX PORTMANTEAU TEST on daily revenue — the
    * "is there ANY serial correlation in the first 7 lags?" summary
    * q259's per-lag ACF table leaves to the reader and q283's DW
    * only asks at lag 1: Q = n(n+2)·Σ_{k=1..7} ρ_k²/(n−k). The ρ's
    * come from q259's exact DECIMAL-covariance chain; the seven
    * terms fold in fixed lag order as one mirrored expression
    * (absent lags — no same-lag day pairs — contribute 0).
    */
  def ljungBox(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 14, s"maxLag out of range: $maxLag")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        (col("r") * col("n") - col("s")).as("dv"))
    val c0 = dev.agg(sum(dec(col("dv")) * dec(col("dv"))).as("c0"),
      max(col("n")).as("n"))
    val cks = dev
      .select(col("d"), col("dv"),
        explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
      .select(col("dv"), col("lag"), (col("d") - col("lag")).as("dk"))
      .join(dev.select(col("d").as("dk"), col("dv").as("dvk")),
        Seq("dk"))
      .groupBy(col("lag"))
      .agg(sum(dec(col("dv")) * dec(col("dvk"))).as("ck"))
      .agg(
        max(when(col("lag") === 1L, col("ck"))).as("ck1"),
        (2 to maxLag).map(k =>
          max(when(col("lag") === k.toLong, col("ck"))).as(s"ck$k")): _*)
    def d(name: String): Column = col(name).cast("double")
    val qSum = (1 to maxLag).map { k =>
      val rho = coalesce(d(s"ck$k"), lit(0.0)) / d("c0")
      rho * rho / (d("n") - lit(k.toDouble))
    }.reduce(_ + _)
    cks.crossJoin(broadcast(c0))
      .filter(col("c0").cast("double") > 0.0) // constant series: drop
      .select(col("n").as("n_days"),
        round(when(col("n") <= lit(maxLag.toLong), lit(Double.NaN))
          .otherwise(d("n") * (d("n") + lit(2.0)) * qSum), 4)
          .as("q_stat"))
  }

  /** Q283: DURBIN–WATSON AUTOCORRELATION TEST on the residuals of the
    * daily-revenue trend fit — the "is the trend model missing serial
    * structure?" companion to q99/q263 (DW ≈ 2 means independent
    * residuals; → 0 positive autocorrelation, → 4 negative). The OLS
    * fit comes from exact day/cents moment sums (one mirrored a/b
    * expression pair); residuals are gridded to integer cents
    * (round of IEEE-identical doubles — the q255 device) so both
    * quadratic sums are exact BIGINT products in DECIMAL(38,0), summed
    * in any order; the lag difference rides the day-dimension window.
    */
  def durbinWatson(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("epoch_day"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val mom = daily.agg(
      count(lit(1)).as("n"),
      sum(col("epoch_day")).as("sd"),
      sum(dec(col("r"))).as("sr"),
      sum(dec(col("epoch_day") * col("epoch_day"))).as("sdd"),
      sum(dec(col("epoch_day") * col("r"))).as("sdr"))
    def d(name: String): Column = col(name).cast("double")
    val fit = mom
      .withColumn("b",
        (d("n") * d("sdr") - d("sd") * d("sr")) /
          (d("n") * d("sdd") - d("sd") * d("sd")))
      .withColumn("a", (d("sr") - col("b") * d("sd")) / d("n"))
    val w = Window.orderBy(col("epoch_day"))
    val resid = daily.crossJoin(broadcast(fit))
      // integer-cent residual grid: identical doubles → identical round
      .withColumn("e", round(col("r").cast("double") -
        (col("a") + col("b") * col("epoch_day").cast("double")))
        .cast("long"))
      .withColumn("ep", lag(col("e"), 1).over(w))
    resid.agg(
        max(col("n")).as("n_days"),
        max(round(col("b"), 6)).as("slope_cents_per_day"),
        sum(dec(col("e") * col("e"))).as("see"),
        sum(when(col("ep").isNotNull,
          dec((col("e") - col("ep")) * (col("e") - col("ep"))))
          .otherwise(dec(lit(0L)))).as("sdd2"))
      .select(col("n_days"), col("slope_cents_per_day"),
        round(col("sdd2").cast("double") / col("see").cast("double"), 6)
          .as("dw_stat"))
  }

  /** Q285: GRUBBS OUTLIER TEST on the daily-revenue series — "is the
    * most extreme day statistically an outlier?", the one-number
    * companion to q157's window flags: G = max|r−mean| / s over the
    * day dimension. The max deviation is an exact integer argmax
    * (|r·n − S|, deterministic (dev DESC, day) tie-break); the
    * variance comes from exact Σr² / Σr moments; G is one mirrored
    * double expression.
    */
  def grubbsOutlier(orders: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("epoch_day"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("r")).as("s"),
      sum(dec(col("r") * col("r"))).as("q"))
    def d(name: String): Column = col(name).cast("double")
    daily.crossJoin(broadcast(tot))
      .withColumn("dev", abs(col("r") * col("n") - col("s")))
      .orderBy(col("dev").desc, col("epoch_day"))
      .limit(1)
      .select(col("n").as("n_days"),
        col("epoch_day").as("outlier_epoch_day"),
        round(d("dev") / d("n"), 4).as("dev_cents"),
        round(d("dev") / d("n") /
          sqrt((d("q") - d("s") * d("s") / d("n")) / (d("n") - lit(1.0))),
          6).as("g_stat"))
  }

  /** Q286: SEASONAL-NAIVE FORECAST SKILL (MASE) of daily revenue —
    * does last week predict today better than yesterday does? MAE of
    * the lag-7 forecast scaled by the in-sample lag-1 naive MAE
    * (Hyndman's MASE): < 1 means real weekly structure, the go/no-go
    * a forecasting pipeline checks before fitting anything fancier.
    * Both error sums are exact integers over lag equi-joins on the
    * day dimension (only existing day pairs contribute — gap
    * behavior identical in both engines); the ratio is one mirrored
    * expression.
    */
  def seasonalNaiveMase(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
    def lagErr(lagDays: Int): DataFrame = daily
      .select((col("d") + lit(lagDays.toLong)).as("d2"),
        col("r").as("rp"))
      // day-dimension broadcast, the q263 argument
      .join(broadcast(daily.select(col("d").as("d2"),
        col("r").as("rc"))), Seq("d2"))
      .agg(count(lit(1)).as(s"n$lagDays"),
        sum(abs(col("rc") - col("rp"))).as(s"e$lagDays"))
    def d(name: String): Column = col(name).cast("double")
    lagErr(1).crossJoin(broadcast(lagErr(7)))
      .select(col("n1").as("n_pairs_1"), col("n7").as("n_pairs_7"),
        round(d("e1") / d("n1"), 4).as("mae_naive1_cents"),
        round(d("e7") / d("n7"), 4).as("mae_naive7_cents"),
        round((d("e7") / d("n7")) / (d("e1") / d("n1")), 6)
          .as("mase_seasonal"))
  }

  /** Q287: JARQUE–BERA NORMALITY TEST on daily revenue — the
    * skewness/kurtosis gate a forecaster checks before trusting any
    * z-threshold (q157's anomaly windows assume roughly normal days;
    * this is the test of that assumption). Days are coarsened to
    * 10⁵-cent ($1000) units by FLOOR DIVISION (mirrored `div`/`//`)
    * and then ANCHORED at the integer floor-mean before the power
    * sums — fourth powers of raw values outgrow LONG as soon as a
    * day's revenue passes ~$550k (the sf0.1 bench caught exactly
    * that), while fourth powers of DEVIATIONS are bounded by the
    * series' spread⁴, which buys decades of headroom. All four
    * anchored moments are exact DECIMAL(38,0) sums; the mean-shift /
    * central-moment / skew / kurtosis / JB chain is mirrored double
    * arithmetic over those five scalars (central moments around the
    * mean equal central moments of the anchored deviations around
    * their own mean d = Σdv/n).
    */
  def jarqueBera(orders: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("r"))
      .select(expr("r div 100000").as("rs"))
    val anchor = daily.agg(count(lit(1)).as("an"),
        sum(col("rs")).as("s0"))
      .select(expr("s0 div an").as("a0"))
    val dev = daily.crossJoin(broadcast(anchor))
      .select((col("rs") - col("a0")).as("dv"))
    val mom = dev.agg(
      count(lit(1)).as("n"),
      sum(dec(col("dv"))).as("m1"),
      sum(dec(col("dv") * col("dv"))).as("q2"),
      sum(dec(col("dv") * col("dv") * col("dv"))).as("q3"),
      sum(dec(col("dv") * col("dv") * col("dv") * col("dv"))).as("q4"))
    def d(name: String): Column = col(name).cast("double")
    mom
      .withColumn("mu", d("m1") / d("n"))
      .withColumn("m2", d("q2") / d("n") - col("mu") * col("mu"))
      .withColumn("m3", d("q3") / d("n") -
        lit(3.0) * col("mu") * (d("q2") / d("n")) +
        lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", d("q4") / d("n") -
        lit(4.0) * col("mu") * (d("q3") / d("n")) +
        lit(6.0) * col("mu") * col("mu") * (d("q2") / d("n")) -
        lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
      // a zero-variance (constant) series has no defined shape — NaN,
      // not ANSI DIVIDE_BY_ZERO (q279 discipline, oracle-mirrored)
      .withColumn("sk", when(col("m2") === 0.0, lit(Double.NaN))
        .otherwise(col("m3") / (sqrt(col("m2")) * col("m2"))))
      .withColumn("ku", when(col("m2") === 0.0, lit(Double.NaN))
        .otherwise(col("m4") / (col("m2") * col("m2")) - lit(3.0)))
      .select(col("n").as("n_days"),
        round(col("sk"), 6).as("skewness"),
        round(col("ku"), 6).as("excess_kurtosis"),
        round(d("n") / lit(6.0) *
          (col("sk") * col("sk") + col("ku") * col("ku") / lit(4.0)), 4)
          .as("jb_stat"))
  }

  /** Q264: GINI COEFFICIENT of revenue concentration across
    * customers — the Lorenz-curve scalar a marketplace-health audit
    * reads next to q124/q143's share tables:
    * G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over per-customer revenue
    * sorted ascending (ties broken by custkey — engine-identical).
    * All sums exact in DECIMAL(38,0) (rank·cents ≤ ~1e9·1e9 per term),
    * one mirrored divide, 6 dp. The rank window runs over the
    * CUSTOMER DIMENSION after the map-side fact reduction (the q212
    * cumW boundedness argument; PlanSpec-enrolled).
    */
  def revenueGini(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column) = c.cast("decimal(38,0)")
    val per = orders.groupBy(col("o_custkey"))
      .agg(sum(round(lit(100.0) * col("o_totalprice")).cast("long"))
        .as("x"))
    val giniW = Window.orderBy(col("x"), col("o_custkey"))
    per.withColumn("i", row_number().over(giniW).cast("long"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"),
        sum(dec(col("i")) * dec(col("x"))).as("six"))
      .select(col("n").as("n_customers"),
        round((lit(2.0) * col("six").cast("double") -
          (col("n") + lit(1L)).cast("double") *
            col("sx").cast("double")) /
          (col("n").cast("double") * col("sx").cast("double")), 6)
          .as("gini"))
  }

  /** Q265: BENFORD FIRST-DIGIT AUDIT of order totals — the observed
    * first-significant-digit histogram against Benford's law
    * P(d) = log10(1 + 1/d) — per digit the observed share next to the
    * expected one (the log10 expectations ride the ln-parity
    * precedent; shares are one mirrored divide each). The classic
    * fabricated-data / unit-mixing detector for financial columns.
    * First digit via string head of the integer cents — pure integer
    * plumbing, no float logs on the data side.
    */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val digits = orders
      .select(substring(round(lit(100.0) * col("o_totalprice"))
        .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
      .filter(col("digit") >= 1L)
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("n").cast("double"), 6)
          .as("p_obs"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")),
          6).as("p_benford"))
  }

  /** Q266: REFERENTIAL-INTEGRITY AUDIT across every FK edge of the
    * star schema — per edge: child rows, orphans (child keys with no
    * parent — broken ingestion), parent rows, and unreferenced
    * parents (dead dimension rows — the usual sign a feed stopped).
    * Each edge is two map-side-combinable key aggregations + one
    * join on the DISTINCT key sets (dimension-sized, never fact-row
    * joins); the fact table is touched once per edge.
    */
  def refIntegrityAudit(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val ck = child.groupBy(col(childKey).cast("long").as("k"))
        .agg(count(lit(1)).as("cn"))
      val pk = parent.groupBy(col(parentKey).cast("long").as("k"))
        .agg(count(lit(1)).as("pn"))
      ck.join(pk, Seq("k"), "full_outer")
        .agg(
          sum(coalesce(col("cn"), lit(0L))).as("n_child_rows"),
          sum(when(col("pn").isNull, coalesce(col("cn"), lit(0L)))
            .otherwise(0L)).as("n_orphan_rows"),
          sum(when(col("pn").isNotNull, 1L).otherwise(0L))
            .as("n_parent_keys"),
          sum(when(col("cn").isNull && col("pn").isNotNull, 1L)
            .otherwise(0L)).as("n_unreferenced_parents"))
        .select(lit(name).as("fk_edge"), col("n_child_rows"),
          col("n_orphan_rows"), col("n_parent_keys"),
          col("n_unreferenced_parents"))
    }
    Seq(
      edge("lineitem.orderkey->orders", lineitem, "l_orderkey",
        orders, "o_orderkey"),
      edge("lineitem.partkey->part", lineitem, "l_partkey",
        part, "p_partkey"),
      edge("lineitem.suppkey->supplier", lineitem, "l_suppkey",
        supplier, "s_suppkey"),
      edge("orders.custkey->customer", orders, "o_custkey",
        customer, "c_custkey"),
      edge("customer.nationkey->nation", customer, "c_nationkey",
        nation, "n_nationkey"),
      edge("supplier.nationkey->nation", supplier, "s_nationkey",
        nation, "n_nationkey"),
      edge("nation.regionkey->region", nation, "n_regionkey",
        region, "r_regionkey")).reduce(_.union(_))
  }

  /** Q267: MARKET-BASKET LIFT over order baskets — the top-k
    * co-purchased part-brand pairs by lift
    * `n_orders·c_ab / (c_a·c_b)` with a support floor: the
    * recommendation/assortment primitive (q161's user-level
    * co-activity, moved to the transactional basket grain). Pairs
    * come from the basket SELF-JOIN on the order key — baskets are
    * small by contract, so the pair table is Σ|basket|², never
    * catalog²; lift is exact integer cross-products in one mirrored
    * divide; top-k is the q111 windowless device on
    * (lift DESC, a, b). Items are brand-granular (part groups) so
    * supports are meaningful at any SF.
    */
  def basketLift(lineitem: DataFrame, part: DataFrame, k: Int = 20,
      minSupport: Long = 3L): DataFrame = {
    require(k >= 1 && k <= 10000, s"k out of range: $k")
    // basket item = distinct brand per order
    val items = lineitem.select(col("l_orderkey").as("okey"),
        col("l_partkey").as("pkey"))
      .join(part.select(col("p_partkey").as("pkey"),
        col("p_brand").as("item")), Seq("pkey"))
      .select(col("okey"), col("item")).distinct()
    val nOrders = items.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n"))
    val ic = items.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val pairs = items.select(col("okey"), col("item").as("a"))
      .join(items.select(col("okey"), col("item").as("b")), Seq("okey"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minSupport)
    val scored = pairs
      .join(broadcast(ic.select(col("item").as("a"), col("c").as("ca"))),
        Seq("a"))
      .join(broadcast(ic.select(col("item").as("b"), col("c").as("cb"))),
        Seq("b"))
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        (col("n").cast("double") * col("cab").cast("double")) /
          (col("ca").cast("double") * col("cb").cast("double")))
    scored
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
      .agg(array_sort(collect_list(struct((-col("lift")).as("negl"),
        col("a").as("a"), col("b").as("b"), col("cab").as("cab"),
        col("ca").as("ca"), col("cb").as("cb"),
        col("lift").as("lift")))).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.a").as("item_a"), col("s.b").as("item_b"),
        col("s.cab").as("n_both"), col("s.ca").as("n_a"),
        col("s.cb").as("n_b"), round(col("s.lift"), 6).as("lift"),
        (col("pos") + 1).as("rank"))
  }

  /** Q280: FREQUENT TRIPLES over order baskets at brand grain — the
    * 3-itemset level of q267's pair mining, APRIORI-PRUNED: only items
    * above the item-support floor enter the triple join (the classic
    * level-wise candidate cut — on a skewed catalog the prune removes
    * the long tail BEFORE the quadratic/cubic expansion, which is what
    * keeps level-3 mining feasible at 100 TB). Triples are two
    * self-equi-joins on the order key with a<b<c dedup; per-basket
    * fan-out is C(basket,3), bounded by basket size, never catalog
    * size. The top-k is the q267 windowless sorted-collect device.
    */
  def basketTriples(lineitem: DataFrame, part: DataFrame, k: Int = 20,
      minItemSupport: Long = 3L, minSupport: Long = 3L): DataFrame = {
    require(k >= 1 && k <= 10000, s"k out of range: $k")
    val items0 = lineitem.select(col("l_orderkey").as("okey"),
        col("l_partkey").as("pkey"))
      .join(part.select(col("p_partkey").as("pkey"),
        col("p_brand").as("item")), Seq("pkey"))
      .select(col("okey"), col("item")).distinct()
    val ic = items0.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val freq = ic.filter(col("c") >= minItemSupport)
    val items = items0
      .join(broadcast(freq.select(col("item"))), Seq("item"))
      .select(col("okey"), col("item"))
    val triples = items.select(col("okey"), col("item").as("a"))
      .join(items.select(col("okey"), col("item").as("b")), Seq("okey"))
      .filter(col("a") < col("b"))
      .join(items.select(col("okey"), col("item").as("c3")), Seq("okey"))
      .filter(col("b") < col("c3"))
      .groupBy(col("a"), col("b"), col("c3"))
      .agg(count(lit(1)).as("nabc"))
      .filter(col("nabc") >= minSupport)
    triples
      .join(broadcast(ic.select(col("item").as("a"), col("c").as("ca"))),
        Seq("a"))
      .join(broadcast(ic.select(col("item").as("b"), col("c").as("cb"))),
        Seq("b"))
      .join(broadcast(ic.select(col("item").as("c3"), col("c").as("cc"))),
        Seq("c3"))
      .orderBy(col("nabc").desc, col("a"), col("b"), col("c3"))
      .limit(k)
      .agg(array_sort(collect_list(struct((-col("nabc")).as("negn"),
        col("a").as("a"), col("b").as("b"), col("c3").as("c3"),
        col("nabc").as("nabc"), col("ca").as("ca"), col("cb").as("cb"),
        col("cc").as("cc")))).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.a").as("item_a"), col("s.b").as("item_b"),
        col("s.c3").as("item_c"), col("s.nabc").as("n_all"),
        col("s.ca").as("n_a"), col("s.cb").as("n_b"),
        col("s.cc").as("n_c"), (col("pos") + 1).as("rank"))
  }

  /** Sketch percentiles (rows-only; error bound spec-asserted vs exact). */
  def approxValuePercentiles(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        approx_percentile(col("value"), lit(0.5), lit(accuracy)).as("p50"),
        approx_percentile(col("value"), lit(0.95), lit(accuracy)).as("p95"),
        count(lit(1)).as("n_events"))

  /** Banded range join: equi-join a fact value column against ARBITRARY
    * (lo, hi] / [lo, hi) ranges without a nested-loop join. Each range row
    * explodes into the fixed-width buckets it overlaps, the fact row maps
    * to its single bucket, and a bucket equi-join + exact range filter
    * yields the result. At scale this turns "compare every row against
    * every range" into a shuffle on bucket ids with per-bucket locality —
    * the standard interval-bucketing trick. `bucketWidth` trades
    * duplication of range rows (hi−lo)/width against bucket selectivity.
    * Ranges are expected disjoint-or-overlapping arbitrary; output has one
    * row per (fact, covering-range) pair.
    */
  def bandedRangeJoin(fact: DataFrame, valueCol: String, ranges: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    val rb = ranges.withColumn("__b",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val fb = fact.withColumn("__b", floor(col(valueCol) / bucketWidth).cast("long"))
    fb.join(rb, Seq("__b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__b")
  }

  /** Q35: orders classified into irregular price bands (range join) and
    * aggregated per band. The band table is tiny (broadcast by AQE); the
    * banded join still demonstrates the bucketing shape that holds when
    * the range side is too large to broadcast.
    */
  val priceBands: Seq[(String, Double, Double)] = Seq(
    ("micro", 0.0, 25000.0),
    ("small", 25000.0, 80000.0),
    ("mid", 80000.0, 200000.0),
    ("large", 200000.0, 350000.0),
    ("jumbo", 350000.0, 1000000.0))

  def ordersByPriceBand(spark: SparkSession, orders: DataFrame): DataFrame = {
    import spark.implicits._
    val bands = priceBands.toDF("band", "lo", "hi")
    bandedRangeJoin(orders, "o_totalprice", bands, "lo", "hi", bucketWidth = 50000.0)
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).cast("double").as("revenue"))
  }

  /** Q63: CUBE over (returnflag, linestatus) — all four grouping-set
    * combinations (vs q23's ROLLUP hierarchy), tagged with `grouping_id`
    * so total rows are distinguishable from NULL-valued keys without
    * sentinel values.
    */
  def returnsCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        decSum(col("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** Q65: per-user distinct active days — written as the EXPLICIT
    * two-stage distinct aggregation (spread over (user, day) first, then
    * count per user). `count(DISTINCT x)` per hot key concentrates every
    * occurrence of a key on one reducer; the two-stage shape spreads
    * stage 1 across the value dimension too, which is the skew-safe form
    * at 100 TB. Result is identical — which is exactly what the oracle's
    * `count(DISTINCT ...)` checks.
    */
  def userActiveDays(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("_n"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_active_days"))

  /** Q66: funnel analysis — how far each user progresses through the
    * ordered, CONVERSION-WINDOWED sequence view → click (within
    * `clickWindow` of the first view) → purchase (within `purchaseWindow`
    * of that click). Each stage is strictly after the previous stage's
    * first occurrence; the windows are what make a funnel a funnel — with
    * unbounded horizons every active user eventually "converts". Three
    * keyed aggregations + two left joins; each stage's input shrinks to
    * the survivors of the previous one, so the heavy table is scanned
    * once per stage with the stage predicate pushed down.
    */
  def funnelStages(events: DataFrame,
      clickWindow: String = "1 HOUR", purchaseWindow: String = "1 DAY"): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr(s"INTERVAL $clickWindow"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr(s"INTERVAL $purchaseWindow"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) +
          when(col("t2").isNotNull, 1).otherwise(0) +
          when(col("t3").isNotNull, 1).otherwise(0)).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
  }

  /** Q68: MERGE/upsert semantics without a table format — the snapshot
    * refresh every pipeline runs: apply a changes batch (updates to
    * existing keys + inserts of new keys) onto a base snapshot,
    * update-wins. Formulated as ANTI-JOIN + UNION, not a full outer join:
    * Spark cannot broadcast EITHER side of a full outer join (it silently
    * falls back to shuffling both sides), while a left-anti join happily
    * broadcasts the small changes side — so the 100 TB base is rewritten
    * in ONE shuffle-free pass: keep every base row whose key is absent
    * from the changes, then append the changes verbatim. This is the
    * copy-on-write MERGE shape (Delta/Iceberg minus the transaction log).
    * Requires `changes` key-unique (as any MERGE source must be).
    *
    * `broadcastChanges = true` (the default) force-broadcasts the change
    * KEYS, overriding `autoBroadcastJoinThreshold` — correct only while
    * the key set fits in driver + executor memory (rule of thumb: ≲ a few
    * hundred million keys; a bare long key costs ~8–16 bytes each in the
    * hash relation). A change batch approaching the base's own size is no
    * longer a "batch" and MUST pass `broadcastChanges = false`, which
    * drops the hint and lets AQE pick the join (shuffled anti-join with
    * the base co-partitioned by key — still one shuffle of the changes
    * plus one of the base, never an OOM).
    */
  def upsert(base: DataFrame, changes: DataFrame, key: String,
      broadcastChanges: Boolean = true): DataFrame = {
    val cols = base.columns
    require(changes.columns.sameElements(cols),
      s"upsert: schemas must match (${cols.mkString(",")} vs ${changes.columns.mkString(",")})")
    require(!cols.contains("__ck"),
      "upsert: input columns must not use the reserved __ck name")
    val changeKeys = changes.select(col(key).as("__ck"))
    val hinted = if (broadcastChanges) broadcast(changeKeys) else changeKeys
    base
      .join(hinted, col(key) === col("__ck"), "left_anti")
      .unionByName(changes)
  }

  /** Q67: FULL OUTER join — the one join type the rest of the inventory
    * doesn't exercise: per-user view counts ⟗ click counts, keeping users
    * who only ever did one of the two (NULL-padded on the other side).
    * Both inputs are pre-aggregated, so the outer join matches single
    * rows per key — the scale-correct order (outer-join raw events first
    * and the join state explodes).
    */
  def viewClickOuter(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user")).agg(count(lit(1)).as("n_views"))
    val c = events.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user")).agg(count(lit(1)).as("n_clicks"))
    v.join(c, col("v_user") === col("c_user"), "full_outer")
      .select(
        coalesce(col("v_user"), col("c_user")).as("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        when(col("v_user").isNull, "click_only")
          .when(col("c_user").isNull, "view_only")
          .otherwise("both").as("presence"))
  }

  /** Q52: pivot — long-to-wide reshape, one count column per event type
    * per day. The value list is EXPLICIT: without it Spark runs an extra
    * distinct-values job over the whole input before it can even plan the
    * pivot (a full second pass at 100 TB) and the output schema becomes
    * data-dependent. With the list it is a single partial+final
    * aggregation, one shuffle, fixed schema.
    */
  val eventTypes: Seq[String] = Seq("view", "click", "purchase", "error", "signup")

  def eventTypePivot(events: DataFrame): DataFrame = {
    val p = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    // pivot yields null for day×type combos with no rows; a count is 0
    p.select(col("day") +: eventTypes.map(t =>
      coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** Q58: time-based moving average — 7-day trailing revenue per day, a
    * RANGE frame (value-based: all rows whose day falls in [d-6, d]),
    * which is NOT the q22 ROWS frame: with gaps in the calendar a 7-row
    * window and a 7-day window differ. Days are integers (epoch days), so
    * the range frame is engine-portable; revenue sums are decimal-exact
    * before the windowing, making the whole result
    * partitioning-independent.
    */
  def dailyRevenueMovingAvg(orders: DataFrame, days: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("epoch_day"))
      .agg(decSum(col("o_totalprice")).as("rev"))
    // global (un-partitioned) window: fine — the input is already one row
    // per DAY, thousands of rows at any corpus size, not the raw orders
    val w = Window.orderBy(col("epoch_day"))
      .rangeBetween(-(days - 1).toLong, 0L)
    val sumW = sum(col("rev")).over(w) // exact decimal inside the frame
    val cntW = count(lit(1)).over(w)
    daily.select(
      col("epoch_day").cast("long").as("epoch_day"),
      col("rev").cast("double").as("day_revenue"),
      sumW.cast("double").as("sum_win"),
      round(sumW.cast("double") / cntW, 6).as("avg_win"))
  }

  /** Q157: trailing-window anomaly detection over daily event volumes —
    * the ops-monitoring primitive for an ingest pipeline: each
    * (event_type, day)'s count against the mean/σ of its own previous
    * `trailing` days, flagged beyond `sigma` deviations. Detects both
    * spikes (crawler loops, spam floods) and droughts (a dead source).
    *
    * Determinism: mean and σ derive from INTEGER window sums (Σn, Σn²,
    * the textbook (Σn² − (Σn)²/T)/(T−1)) — both engines compute the same
    * doubles from the same integers, where a native stddev aggregate
    * would expose each engine's accumulation order. Windows only over
    * the already-reduced (type × day) table; only complete trailing
    * frames emit (the first `trailing` days per type are warm-up). σ = 0
    * with a deviating count still flags — a constant history makes ANY
    * change anomalous.
    */
  def dailyAnomalyWindows(events: DataFrame, trailing: Int = 7,
      sigma: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("epoch_day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("epoch_day"))
      .rowsBetween(-trailing, -1)
    val s1 = sum(col("n")).over(w)
    val s2 = sum(col("n") * col("n")).over(w)
    val cnt = count(lit(1)).over(w)
    val t = trailing.toDouble
    daily
      .select(col("event_type"), col("epoch_day").cast("long").as("epoch_day"),
        col("n"), s1.as("__s1"), s2.as("__s2"), cnt.as("__cnt"))
      .filter(col("__cnt") === trailing)
      .select(col("event_type"), col("epoch_day"), col("n"),
        round(mean_from(col("__s1"), t), 6).as("trail_mean"),
        round(std_from(col("__s1"), col("__s2"), t), 6).as("trail_std"),
        (abs(col("n").cast("double") - mean_from(col("__s1"), t)) >
          lit(sigma) * std_from(col("__s1"), col("__s2"), t)).cast("int")
          .as("is_anomaly"))
  }

  private def mean_from(s1: Column, t: Double): Column =
    s1.cast("double") / lit(t)

  private def std_from(s1: Column, s2: Column, t: Double): Column =
    sqrt(greatest((s2.cast("double") -
      s1.cast("double") * s1.cast("double") / lit(t)) / lit(t - 1.0),
      lit(0.0)))

  /** Q60: fixed-width histogram of order prices — the data-profiling
    * primitive next to q43. Bucket index is plain integer arithmetic
    * (floor((x-lo)/width), clamped), so any engine reproduces the
    * assignment exactly; counts partial-aggregate map-side.
    */
  def priceHistogram(orders: DataFrame,
      lo: Double = 0.0, width: Double = 25000.0, nBuckets: Int = 20): DataFrame =
    orders
      .select(least(greatest(floor((col("o_totalprice") - lo) / width), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * width).as("bucket_lo"),
        col("n_orders"))

  /** Q53: distribution analytics — ntile quartile, percent_rank and
    * cume_dist of each order's price within its priority class. The window
    * orders by (price, key): ntile assigns by ROW POSITION, so without the
    * unique-key tiebreak equal prices would land in engine-dependent
    * quartiles.
    */
  def orderPriceDistribution(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders.select(
      col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** Q71: cohort retention — users grouped by their FIRST active day
    * (the cohort), counted on each later active day as a day offset: the
    * engagement matrix every product-analytics stack computes nightly.
    *
    * Scale shape: three aggregations, no join — (user, day) distinct
    * first (partial-aggregates map-side, collapsing the event stream to
    * at most users × days rows), then the cohort day as a per-user MIN
    * window over those collapsed rows (one shuffle on user_id — a window,
    * not a groupBy+self-join, so the days relation is never materialized
    * twice), then the final (cohort, offset) count. Days are epoch-day
    * integers end to end — no timestamp arithmetic crosses an engine
    * boundary.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id"))
    days
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Q79: changelog compaction — the latest row per key from a CDC-style
    * change stream, the "snapshot read" half of q68's MERGE. One
    * aggregation with `max_by` over a (ts, id) ORDER STRUCT — partial
    * compaction happens map-side (each partition keeps one candidate per
    * key before the shuffle), where the window-rank formulation would
    * shuffle and SORT every change row. The id tiebreak makes equal-ts
    * rows deterministic.
    */
  def latestSnapshot(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.event_type").as("last_type"), col("last.value").as("last_value"))

  /** Q78: re-aggregatable distinct-user rollup — Datasketches HLL partials
    * at day granularity, UNIONED up to per-type totals: the 100 TB rollup
    * pattern where daily sketches are stored once and any coarser rollup
    * (week / month / all-time) is a cheap sketch union instead of a rescan
    * of the raw events. Rows-only (the registers are engine-specific);
    * RelationalSpec asserts the union estimate EQUALS the direct estimate
    * over all events (sketch-of-union ≡ union-of-sketches) and tracks
    * exact distinct counts within the configured error.
    */
  def activityRollup(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
  }

  // -------- validated sketch forms (the oracled q29/q44/q78 surface) ------
  //
  // A sketch's registers are engine-specific, so a query emitting the raw
  // estimate can never hash-match a DuckDB oracle — which left the whole
  // family rows-only. These forms make the sketch queries MACHINE-CHECKABLE
  // instead: run the sketch exactly as the production operator does, but
  // emit its deterministic columns (keys, counts, exact ground truth) plus
  // an `est_ok` flag proving the estimate landed inside its published error
  // band — the oracle computes the same deterministic columns and a
  // constant 1, so any drift in keys, counts, ground truth, OR an
  // out-of-band estimate fails the hash compare. The unvalidated operators
  // above remain the production surface (no exact pass at 100 TB); these
  // wrappers are their correctness gate, priced accordingly.

  /** Q29 (validated): HLL++ estimate next to the exact distinct count in
    * ONE aggregation (one scan, one exchange); `est_ok` = within 2.5×rsd
    * (= 5% at the default rsd 0.02 — the spec's band).
    */
  def approxDistinctValidated(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), rsd).as("__approx"))
      .select(col("event_type"), col("n_events"), col("n_users_exact"),
        (abs(col("__approx") - col("n_users_exact")) <=
          lit(2.5 * rsd) * col("n_users_exact")).cast("int").as("est_ok"))

  /** Q44 (validated): probe each event type's count-min sketch for every
    * user in a deterministic probe set (user_id ≡ 0 mod `probeMod`) and
    * check the CMS contract per probe: never undercounts, overcounts by at
    * most ⌈eps·N⌉ (+1 slack for the float rounding in eps→width). The
    * sketch side is one row per event type and BROADCASTS to the probe
    * counts. The probe itself has no built-in SQL form, so it is the
    * library's second (documented) `udf()` — deserialization cost is per
    * probe row at validation scale, never per event.
    */
  def cmsProbesValidated(events: DataFrame, eps: Double = 0.001,
      confidence: Double = 0.99, probeMod: Int = 50): DataFrame = {
    val sketches = events.groupBy(col("event_type"))
      .agg(
        count_min_sketch(col("user_id"), lit(eps), lit(confidence), lit(42))
          .as("cms"),
        count(lit(1)).as("n_events"))
    val probes = events
      .filter(pmod(col("user_id"), lit(probeMod.toLong)) === 0L)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
    val probe = udf((bytes: Array[Byte], uid: Long) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(uid))
    probes.join(broadcast(sketches), Seq("event_type"))
      .withColumn("__est", probe(col("cms"), col("user_id")))
      .select(col("event_type"), col("user_id"), col("exact_n"),
        (col("__est") >= col("exact_n") &&
          col("__est") <= col("exact_n") +
            ceil(lit(eps) * col("n_events")).cast("long") + 1)
          .cast("int").as("est_ok"))
  }

  /** Q78 (validated): the daily-sketch → union rollup exactly as
    * [[activityRollup]] plans it, joined against the exact distinct count
    * per type; `est_ok` = union estimate within 5% (lgK 12 ⇒ rsd ≈ 1.6%,
    * so 5% is a ≥3σ band). Two scans of events by necessity — the daily
    * sketches consumed the user ids, so the ground truth needs its own
    * aggregation; that is the price of VALIDATING a rollup, not of running
    * one.
    */
  def hllRollupValidated(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val rolled = daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("__approx"))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"))
    rolled.join(broadcast(exact), Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_users_exact"),
        (abs(col("__approx") - col("n_users_exact")) <=
          lit(0.05) * col("n_users_exact")).cast("int").as("est_ok"))
  }

  /** Q81: TPC-H Q5 "local supplier volume" — the canonical six-table join:
    * revenue from lineitems whose supplier sits in the SAME nation as the
    * ordering customer, for one region and one order-date year.
    *
    * Scale shape: the date filter pushes into the orders scan; region →
    * nation resolve as BROADCASTS down the dimension chain (so the
    * region/nation prune applies before anything big moves); supplier
    * broadcasts into lineitem. The only big exchanges are
    * lineitem ⋈ orders on orderkey and the final per-nation aggregate.
    * The "local" constraint (customer nation = supplier nation) is an
    * equality over two broadcast-resolved columns, applied as a filter —
    * no extra join. Revenue is decimal-exact: the (1 − discount) factor
    * is one double op (identical IEEE result in any engine), then all
    * multiplication/accumulation happens in DECIMAL, so the sum is
    * partitioning-independent.
    */
  def localSupplierVolume(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String = "ASIA",
      yearStart: String = "1996-01-01", yearEnd: String = "1997-01-01"): DataFrame = {
    val revenue = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1.0) - col("l_discount")).cast("decimal(18,6)")
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
    val localSuppliers = supplier
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
    orders
      .filter(col("o_orderdate") >= lit(yearStart) &&
        col("o_orderdate") < lit(yearEnd))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(localSuppliers), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q88: unpivot/melt — the inverse of q52's pivot: a wide per-type
    * profile folded into (event_type, metric, metric_value) long rows via
    * the native `Dataset.unpivot` (SQL UNPIVOT). Long form is what metric
    * stores and plotting layers ingest; doing it in the engine keeps the
    * fold a zero-shuffle projection (each input row expands to k output
    * rows in place — no exchange beyond the one inside the upstream
    * aggregate). Metrics are cast to a common DOUBLE first: UNPIVOT
    * requires one value type, the same constraint the SQL form imposes.
    */
  def eventStatsUnpivot(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n_events"),
        round(avg(col("value")), 6).as("avg_value"),
        round(max(col("value")), 6).as("max_value"))
      .unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("avg_value"), col("max_value")),
        "metric", "metric_value")

  /** Q90: calendar gap-fill + forward fill (resample): the missing-row
    * problem every time-series pipeline hits — aggregate to a daily grain,
    * then materialize the FULL calendar between each group's first and
    * last day (`sequence` + `explode` builds the spine engine-side, no
    * driver loop), left-join the observed days onto it, and forward-fill
    * gaps with the last observed value (`last(…, ignoreNulls)` over the
    * default running frame). One shuffle for the daily aggregate; the
    * spine is ~rows/density tiny and joins on (group, day); the fill
    * window orders each group's bounded day series. `gapEvery` carves
    * deterministic holes (drop days where day-of-month ≡ 0 mod k) so the
    * fill path is exercised on dense test data — pass 0 to resample
    * as-is.
    */
  def dailyGapFill(events: DataFrame, gapEvery: Int = 3): DataFrame = {
    val kept = if (gapEvery > 0)
      events.filter(dayofmonth(col("ts")) % gapEvery =!= 0) else events
    val daily = kept
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("day_value"),
        count(lit(1)).as("n_events"))
    // fold each group's observed days into a map and explode the full
    // calendar against it — daily is consumed ONCE. The naive
    // spine-join formulation (separate min/max aggregate + left join
    // back onto daily) reads the events scan TWICE at execution time:
    // column pruning makes the two daily subtrees differ, so
    // ReuseExchange never kicks in. The per-group map holds one entry
    // per observed DAY — bounded by the calendar span, not the data.
    val folded = daily.groupBy(col("event_type"))
      .agg(
        map_from_entries(collect_list(struct(col("day"),
          struct(col("day_value"), col("n_events"))))).as("m"),
        min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), col("m"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val hit = col("m").getItem(col("day"))
    val dayValue = hit.getField("day_value")
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    folded.select(
      col("event_type"),
      // epoch-day BIGINT, not DATE: the q58 convention — DATE columns
      // dtype-drift between the engines' dataframe bridges
      datediff(col("day"), lit("1970-01-01")).cast("long").as("epoch_day"),
      coalesce(hit.getField("n_events"), lit(0L)).as("n_events"),
      dayValue.as("day_value"),
      last(dayValue, ignoreNulls = true).over(w).as("filled_value"),
      dayValue.isNull.cast("int").as("is_gap"))
  }

  /** Q87: market share — the TPC-H Q8 shape: of all revenue from
    * `partType` parts sold to customers in `regionName`, the fraction
    * supplied from `targetNation`, per order year. Two-level aggregation
    * over the q81 dimensional chain with a CASE-ratio on top, expressed
    * as ONE grouped aggregation (conditional numerator and total
    * denominator as sibling aggregates — no second pass, no self-join).
    * Join order puts the most selective broadcast first: the p_type
    * filter prunes lineitem before any shuffle, then orders/customer
    * shuffle-join on their keys while every dimension (part, supplier +
    * nation, customer-region nations) broadcasts. The ratio divides in
    * DOUBLE (both sums cast first) so both engines run identical IEEE
    * arithmetic before the round.
    */
  def marketShare(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      part: DataFrame,
      regionName: String = "ASIA", partType: String = "ECONOMY",
      targetNation: String = "NATION_3"): DataFrame = {
    // multiply in DOUBLE, quantize the product to DECIMAL(18,6) pre-sum
    // (the q20 kernel): summing wide scale-12 decimal products and casting
    // at the end can differ from DuckDB by an ulp in decimal→double
    val revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,6)")
    val custNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppliers = supplier
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    lineitem
      .join(broadcast(part.filter(col("p_type") === partType)),
        col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("cn_key"))
      .join(broadcast(suppliers), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        round(
          sum(when(col("supp_nation") === targetNation, revenue)
            .otherwise(lit(0).cast("decimal(18,6)"))).cast("double") /
            sum(revenue).cast("double"), 6).as("mkt_share"),
        sum(revenue).cast("double").as("total_revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q84: SCD-2 change history — turn a changelog into versioned rows
    * with validity intervals: each change is valid from its own
    * timestamp until the key's NEXT change (NULL = current version).
    * The temporal-versioning complement of q79's latest-only compaction:
    * q79 answers "what is the state now", this answers "what was the
    * state at time T" (join on `valid_from <= T < valid_to`).
    * One shuffle on the key for the lead() window; the (ts, id) order
    * makes equal-ts versions deterministic.
    */
  def changeHistory(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
      col("user_id"), col("event_type"), col("value"),
      col("ts").as("valid_from"),
      lead(col("ts"), 1).over(w).as("valid_to"),
      (lead(col("ts"), 1).over(w).isNull).cast("int").as("is_current"))
  }

  /** Q82: calendar-dimension profile — order volume and revenue by
    * (quarter, ISO weekday), with distinct active ISO weeks and month-end
    * order counts: the seasonality breakdown every BI layer derives, and
    * the date-function parity minefield made explicit. Engine mapping
    * (asserted by the oracle): Spark `weekday()` is 0=Monday, DuckDB
    * `isodow` is 1=Monday — `weekday()+1 == isodow`; `weekofyear`/`week`
    * are both ISO; `last_day` agrees. Plain Spark `dayofweek` (1=Sunday)
    * vs DuckDB `dayofweek` (0=Sunday) is deliberately avoided.
    */
  def orderCalendarProfile(orders: DataFrame): DataFrame = {
    val d = col("o_orderdate")
    orders
      .select(
        // long casts: DuckDB quarter()/isodow() are BIGINT — keep the
        // compared schemas dtype-identical (q76/q83 rank/gid precedent)
        quarter(d).cast("long").as("qtr"),
        (weekday(d) + 1).cast("long").as("dow_iso"),
        // ISO week-year, not calendar year: Dec 29-31 can fall in ISO
        // week 1 of the NEXT year (and Jan 1-3 in week 52/53 of the
        // previous) — keying by year() would split/merge those weeks
        (expr("extract(YEAROFWEEK FROM o_orderdate)") * 100 + weekofyear(d)).as("__yw"),
        (d === last_day(d)).cast("long").as("__month_end"),
        col("o_totalprice"))
      .groupBy(col("qtr"), col("dow_iso"))
      .agg(
        count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).cast("double").as("revenue"),
        countDistinct(col("__yw")).as("n_weeks"),
        sum(col("__month_end")).as("n_month_end"))
  }

  /** Q83: explicit GROUPING SETS — the general form of q23's ROLLUP and
    * q63's CUBE: exactly the requested aggregation grains ((returnflag),
    * (linestatus), ()) in ONE pass with map-side partials per set, where
    * separate GROUP BYs would scan the table three times. `grouping_id`
    * distinguishes the grains (same bitmask in DuckDB's GROUPING()).
    */
  def returnsGroupingSets(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_rows"),
        decSum(col("l_quantity")).cast("double").as("sum_qty"))

  /** Q80: statistical profile of the value stream — mean, sample stddev,
    * and the covariance/correlation of value against hour-of-day, per
    * event type: the drift-detection aggregates a monitoring pipeline
    * recomputes per window. All are one-pass co-moment aggregations
    * (partial+final, constant state per group); rounding to 6 dp puts the
    * ~1e-15 partial-sum reorder noise far inside the grid on both engines
    * (precedent: q61 entropy).
    */
  def valueStatsProfile(events: DataFrame): DataFrame = {
    val hourD = hour(col("ts")).cast("double")
    val sdV = stddev_samp(col("value"))
    val sdH = stddev_samp(hourD)
    val cov = covar_samp(col("value"), hourD)
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      round(avg(col("value")), 6).as("mean_value"),
      round(sdV, 6).as("sd_value"),
      round(cov, 6).as("cov_hour"),
      // corr spelled out as cov/(sd·sd) behind a zero-variance guard:
      // built-in corr() DIVIDES BY ZERO on a constant column, which under
      // ANSI mode (Spark 4 default) throws instead of returning NULL —
      // the guard restores the NULL-on-degenerate contract DuckDB's
      // corr() has natively
      round(when(sdV > 0 && sdH > 0, cov / (sdV * sdH)), 6).as("corr_hour"))
  }

  /** Q72: event-type transition counts — how often each event type
    * follows each other type within a user's ordered stream (the Markov
    * transition matrix behind funnel mining and anomaly detection).
    * One shuffle on user_id for the lag window (deterministic order:
    * ts with event_id tiebreak), then a tiny (types × types) count
    * aggregation.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("curr_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("curr_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Q93: TPC-H Q17-style small-quantity revenue, generalized per brand —
    * revenue lost to lines whose quantity is below 20% of that part's
    * average order quantity. The classic correlated-scalar-subquery shape,
    * decorrelated BY CONSTRUCTION — here as a per-part WINDOW average:
    * one scan of lineitem, one exchange on l_partkey, and the filter runs
    * in the same stage. The usual aggregate+join decorrelation would scan
    * lineitem twice (the agg subtree and the probe subtree prune to
    * different columns, so ReuseExchange never fires) for the same single
    * logical shuffle. The window is skew-safe HERE because lines-per-part
    * is bounded (~30 at any TPC-H scale) — for unbounded groups flip back
    * to the aggregate+join form (the q95 discussion, inverted).
    * `part` is a pure dimension and broadcasts.
    *
    * Determinism: quantities are integral doubles, so per-part sums are
    * exact in any order and `0.2 * (sum/n)` is the identical IEEE double on
    * every engine; the strict `<` therefore never straddles an
    * engine-dependent boundary. Revenue sums use the [[decSum]] kernel.
    */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val perPart = Window.partitionBy(col("l_partkey"))
    lineitem
      .withColumn("qty_cap",
        lit(0.2) * (sum(col("l_quantity")).over(perPart) /
          count(lit(1)).over(perPart)))
      .filter(col("l_quantity") < col("qty_cap"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(decSum(col("l_extendedprice")).cast("double") / 7.0, 2)
          .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** Q94: TPC-H Q18-style large-volume orders — orders whose total line
    * quantity exceeds a threshold, with their customer. The IN-over-
    * GROUP-BY-HAVING subquery becomes a single aggregation on l_orderkey
    * whose surviving rows (a tiny fraction) then drive the joins — AQE
    * sees the post-filter size at runtime and demotes both joins to
    * broadcasts, so the 100 TB fact table shuffles exactly once (for its
    * own aggregation) and `orders`/`customer` are probed, never re-keyed
    * by the fact side. Quantities are integral → sums exact → the `>`
    * threshold is engine-independent.
    */
  def largeQuantityOrders(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, minQty: Double = 250.0): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))

  /** Q96: deterministic per-group mode — each user's most frequent event
    * type, ties broken by event-type ascending. Built-in `mode()` is
    * NONDETERMINISTIC on ties (hash-map iteration order), which is
    * unacceptable in an auditable pipeline, so the mode is composed as
    * count-then-argmax: one aggregation on (user_id, event_type), then a
    * `min_by` over a (−count, type) ordering key — highest count first,
    * smallest type on ties — where the second aggregation re-keys by user
    * only, on already-reduced data. Both
    * shuffles carry counted rows (≤ users × types), never raw events —
    * no window, so no whole-group sort and no per-user row funneling.
    */
  def modePerUser(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(
        // min over (-n, type) = highest count, then smallest type:
        // structs compare lexicographically and counts can't overflow
        // a long's negation
        min_by(col("event_type"), struct(-col("n"), col("event_type")))
          .as("mode_type"),
        max(col("n")).as("n_events"))

  /** Q97: chi-square contingency analysis of event type × hour-of-day —
    * the independence test behind drift detection and feature selection.
    * The ONLY pass over the events table is the cell-count aggregation
    * (types × 24 cells); row totals, column totals, and the grand total
    * are window sums OVER the cell table itself — deriving them as
    * separate re-aggregations would re-plan (and re-scan) the fact
    * subtree three more times, since their exchanges hash on different
    * keys and never unify with the cell exchange. Windows over a
    * dimensions-squared row count cost nothing at any scale, so the fact
    * table is scanned once, structurally (PlanSpec-locked).
    */
  def contingencyChiSquare(events: DataFrame): DataFrame = {
    val cells = events
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val rowW = Window.partitionBy(col("event_type"))
    val colW = Window.partitionBy(col("hr"))
    val allW = Window.partitionBy()
    // each marginal casts to double BEFORE the multiply: a long*long
    // product of two large marginals silently wraps under non-ANSI Spark
    // (DuckDB would error instead); double*double can't, and counts below
    // 2^53 stay exact either way
    val expected = (sum(col("n")).over(rowW).cast("double") *
      sum(col("n")).over(colW).cast("double")) / sum(col("n")).over(allW)
    cells.select(
      col("event_type"), col("hr"), col("n"),
      round(expected, 6).as("expected"),
      round(pow(col("n") - expected, 2) / expected, 6).as("chi2_term"))
  }

  /** Q101: robust per-group statistics — median and MAD (median absolute
    * deviation), the outlier-resistant location/scale pair quality
    * monitoring prefers over mean/stddev. MAD is INHERENTLY two-pass
    * (the deviations need the median first), so the shape is: grouped
    * median (one exchange), broadcast the groups-sized result back, and
    * aggregate |x − med| through the same exact-percentile machinery —
    * the fact table is never re-keyed, only re-scanned. Rounding to 6 dp
    * follows the q86 convention; `1.4826 * mad` (the normal-consistent
    * scale estimate) is left to callers to keep the output exact.
    */
  def robustPriceStats(orders: DataFrame): DataFrame = {
    val med = orders
      .groupBy(col("o_orderpriority").as("m_prio"))
      .agg(expr(
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE))")
        .as("med"))
    orders
      .join(broadcast(med), col("o_orderpriority") === col("m_prio"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(max(col("med")), 6).as("median_price"),
        round(expr(
          "percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(CAST(o_totalprice AS DOUBLE) - med))"),
          6).as("mad"))
  }

  /** Q107: ordered string aggregation (the LISTAGG / string_agg surface) —
    * each event type's distinct active hours as a sorted CSV. Bare
    * `collect_list` order is partition-dependent (nondeterministic), so
    * the deterministic form is collect_SET (bounded here by the 24-hour
    * domain — constant state per group) then sort_array, THEN join: the
    * ordering is imposed after aggregation, not assumed from it. One
    * shuffle of (type, hour) partial sets.
    */
  def hourProfileCsv(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(sort_array(collect_set(hour(col("ts")))).as("hrs"))
      .select(
        col("event_type"),
        size(col("hrs")).cast("long").as("n_hours"),
        array_join(transform(col("hrs"), h => h.cast("string")), ",")
          .as("hours_csv"))

  /** Q106: point-in-time state read over the SCD-2 history — "what was
    * each user's state at time T", the query [[changeHistory]]'s validity
    * intervals exist to serve: a plain range predicate
    * (valid_from ≤ T < valid_to, open-ended for current rows), NO as-of
    * join and no re-sort — the interval table already paid the one
    * window shuffle, and every later point-in-time read is a filter.
    * Summarized per state (event_type) for a stable oracle surface.
    */
  def stateAtTime(events: DataFrame, at: String = "2024-01-15 00:00:00"): DataFrame =
    changeHistory(events)
      .filter(col("valid_from") <= lit(at) &&
        (col("valid_to").isNull || col("valid_to") > lit(at)))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_users"),
        round(decSum(col("value")).cast("double"), 6).as("sum_value"))

  /** Q103: TPC-H Q13-style customer order-count distribution — how many
    * customers placed exactly N (finalized) orders, INCLUDING the
    * zero-order customers the inner join would silently drop (the reason
    * Q13 is the canonical left-join-then-histogram shape). Two-level
    * aggregation: the per-customer count re-uses the join's own
    * c_custkey partitioning (no extra exchange — EnsureRequirements sees
    * the distribution is already satisfied), and the histogram level
    * aggregates the already-reduced per-customer rows.
    */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") =!= "P"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Q104: TPC-H Q22-style idle high-balance customers — customers whose
    * account balance beats the average POSITIVE balance but who have no
    * high-value order (every customer here has SOME order, so the idle
    * test is "none above `minPrice`" — same anti-join shape, non-empty
    * at every SF), counted per nation. The scalar-subquery average is a
    * one-row aggregate broadcast into the filter (never a per-row
    * subquery); the "never ordered" test is a native left-anti join; the
    * nation name is a broadcast dimension. Balance sums go through the
    * exact micros kernel.
    *
    * The threshold compares WITHOUT dividing: `bal > sum/n` is
    * `bal_micros · n > sum_micros` in wide-decimal integer arithmetic —
    * a float average is an order-dependent double whose boundary could
    * flip a customer between engines; the cross-multiplied form has no
    * rounding anywhere.
    */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      nation: DataFrame, minPrice: Double = 300000.0): DataFrame = {
    val balMicros = round(col("c_acctbal") * 1000000.0).cast("long")
    val avgBal = customer.filter(col("c_acctbal") > 0.0)
      .agg(
        sum(balMicros.cast("decimal(18,0)")).as("sum_mic"),
        count(lit(1)).as("n_pos"))
    customer
      .crossJoin(broadcast(avgBal))
      .filter(balMicros.cast("decimal(38,0)") * col("n_pos") > col("sum_mic"))
      .join(orders.filter(col("o_totalprice") > minPrice).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("numcust"),
        decSum(col("c_acctbal")).cast("double").as("totacctbal"))
  }

  /** Q99: per-group linear trend — OLS slope/intercept/R² of daily revenue
    * against the day index, per event type: the drift/trend detector a
    * monitoring pipeline runs per window. Two-level aggregation, both
    * levels one-pass co-moments: the fact pass reduces to (type, day)
    * daily sums (exact via the micros kernel — regression INPUTS must be
    * engine-identical before any float co-moment runs), then the tiny
    * daily table feeds `regr_slope`/`regr_intercept`/`regr_r2` (constant
    * state, partial+final). Guarded to groups with ≥ 2 distinct days so
    * the zero-variance divisor never throws under ANSI.
    */
  def dailyTrend(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(decSum(col("value")).cast("double").as("rev"))
    val x = datediff(col("day"), lit("2024-01-01")).cast("double")
    daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        round(regr_slope(col("rev"), x), 6).as("slope"),
        round(regr_intercept(col("rev"), x), 6).as("intercept"),
        round(regr_r2(col("rev"), x), 6).as("r2"))
      .filter(col("n_days") >= 2)
  }

  /** Q98: TPC-H Q21-style lone-late-supplier analysis — for finalized
    * multi-supplier orders where EXACTLY ONE supplier shipped late
    * (> 60 days after the order date), count such orders per supplier.
    * The reference Q21 shape is a self-join + EXISTS + NOT-EXISTS (three
    * passes over lineitem); here the exists/not-exists pair collapses
    * into ONE aggregation per order — distinct-supplier count and the
    * distinct-late-supplier set (bounded: ≤ 7 lines/order) — so lineitem
    * is scanned once and shuffled once on l_orderkey. The order-status
    * filter pushes into the orders scan, and the post-aggregation
    * survivors joining `supplier` are dimension-sized.
    */
  def loneLateSupplier(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, lateDays: Int = 60): DataFrame = {
    val late = col("l_shipdate") >
      (col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
    val perOrder = lineitem
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        count_distinct(col("l_suppkey")).as("n_supp"),
        collect_set(when(late, col("l_suppkey"))).as("late_supps"))
      .filter(col("n_supp") >= 2 && size(col("late_supps")) === 1)
      .select(col("late_supps").getItem(0).as("the_suppkey"))
    perOrder
      .groupBy(col("the_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier), col("the_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q125 (TPC-H Q3 shape): shipping priority — the top unshipped-revenue
    * orders for one market segment at a date cutoff. The segment filter
    * collapses `customer` to ~1/5 (broadcast), `orders` and `lineitem`
    * prune on their date predicates AT THE SCAN (PushedFilters — at 100 TB
    * the cutoff eliminates most of the fact table before any join), and
    * the final top-10 is sort+limit → TakeOrderedAndProject: each partition
    * keeps 10 candidate rows, the driver merges K×10, nothing global sorts.
    * The ordering is made TOTAL (revenue desc, date, orderkey) so the limit
    * is engine-independent even under revenue ties.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String = "BUILDING",
      cutoff: String = "1998-06-01", n: Int = 10): DataFrame =
    lineitem
      .filter(col("l_shipdate") > lit(cutoff))
      .join(orders.filter(col("o_orderdate") < lit(cutoff)),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(n)

  /** Q126 (TPC-H Q6 shape): forecast-revenue-change — one tight scan-side
    * filter (ship-year, discount band, quantity cap) and a global sum. The
    * POINT of this query is the plan: every predicate reaches the parquet
    * reader (PushedFilters: date range, discount range, quantity), only
    * three columns are read (ReadSchema), and the aggregate is a map-side
    * partial + one-row final — at 100 TB this is the min-max-pruned scan
    * benchmark, zero joins, zero wide shuffles.
    */
  def forecastRevenue(lineitem: DataFrame,
      yearStart: String = "1996-01-01", yearEnd: String = "1997-01-01",
      discLo: Double = 0.05, discHi: Double = 0.07,
      qtyCap: Double = 24.0): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(yearStart) &&
        col("l_shipdate") < lit(yearEnd) &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < qtyCap)
      .agg(decSum(col("l_extendedprice") * col("l_discount"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Q127 (TPC-H Q7 shape): volume shipping between two nations — revenue
    * by (supplier nation, customer nation, ship year) for the two
    * directed pairs of one nation couple. Suppliers and customers reduce
    * to their nation name via broadcast dims; the OR-of-two-pairs
    * predicate is applied AFTER both attachments (it needs both sides).
    * `lineitem` shuffles once (the orderkey join); everything else
    * broadcasts — the 100 TB shape, since orders:lineitem is the only
    * fact-fact edge.
    */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      nationA: String = "NATION_19", nationB: String = "NATION_21"): DataFrame = {
    val suppNat = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNat = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNat), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("double").as("revenue"))
  }

  /** Q128 (TPC-H Q9 shape, adapted): product-type profit by nation and
    * year. The schema has no partsupp, so supply cost is proxied as
    * `0.8 × p_retailprice × quantity` (deterministic, documented): profit
    * = discounted revenue − proxied cost. The part-name LIKE filter prunes
    * the broadcast side BEFORE the join (the fact table only pays for
    * matching parts), supplier→nation broadcasts, and the one shuffle is
    * the final (nation, year) aggregation of already-reduced rows.
    * Arithmetic stays on the 6-dp grid (2dp×2dp×integer qty), so decSum
    * is exact and engine-order-independent.
    */
  def productProfit(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      namePattern: String = "%bolt%", costFactor: Double = 0.8): DataFrame = {
    val profit =
      col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(costFactor) * col("p_retailprice") * col("l_quantity")
    lineitem
      .join(broadcast(part.filter(col("p_name").like(namePattern))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(decSum(profit).cast("double").as("sum_profit"))
  }

  /** Q129 (TPC-H Q15 shape): top supplier — the supplier(s) whose quarter
    * revenue equals the global max. The revenue "view" aggregates lineitem
    * once (the only fact shuffle); the scalar max is a one-row broadcast
    * joined back with an EXACT decimal equality — comparing doubles here
    * could drop a legitimate co-maximum on summation-order noise, so the
    * decimal only degrades to double for display. Ties are kept, as in the
    * spec. At scale: fact scans once, aggregates to |suppliers| rows;
    * everything after is broadcast-sized.
    */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
      quarterStart: String = "1996-01-01",
      quarterEnd: String = "1996-04-01"): DataFrame = {
    val revenue = lineitem
      .filter(col("l_shipdate") >= lit(quarterStart) &&
        col("l_shipdate") < lit(quarterEnd))
      .groupBy(col("l_suppkey"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_rev"))
    val maxRev = revenue.agg(max(col("total_rev")).as("max_rev"))
    revenue
      .join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }

  /** Q130 (TPC-H Q16 shape, adapted): supplier variety per part profile —
    * how many DISTINCT suppliers ship each (brand, type, size) bucket,
    * excluding one brand, one type, a size whitelist, and a
    * "complaint" supplier set (adapted to `s_acctbal < 0`, the schema's
    * stand-in; expressed as a broadcast LEFT ANTI join, the
    * null-safe NOT IN). The part filter prunes the broadcast dim before
    * the fact join; the count-distinct aggregates (brand,type,size,
    * suppkey) first (partial-aggregable), then counts — both shuffles
    * carry reduced rows, never raw lineitem.
    */
  def supplierPartVariety(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, excludeBrand: String = "Brand#1",
      excludeType: String = "PROMO", sizes: Seq[Int] = 1 to 8): DataFrame = {
    val parts = part
      .filter(col("p_brand") =!= excludeBrand &&
        col("p_type") =!= excludeType &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaints = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q131 (TPC-H Q20 shape, adapted): dominant-supplier detection — for
    * each small-named part, the suppliers whose shipped quantity in one
    * year exceeds a share threshold of that part's total (the Q20
    * "availqty > ½ shipped" correlation, re-anchored to shipped totals
    * since the schema has no partsupp). Decorrelated as aggregate →
    * same-key re-aggregate: the per-(part,supp) and per-part sums share
    * the partitioning on l_partkey, so the second aggregation and the
    * back-join RE-USE the first shuffle's exchange (AQE keeps them
    * co-partitioned — no second fact-sized shuffle). Quantities are
    * integral, so the sums are exact in any numeric type — and the share
    * compare is kept exact ENGINE-INDEPENDENTLY by clearing the
    * fraction: `100·supp_qty > round(100·minShare)·part_qty` multiplies
    * integral values by integers (exact in double, decimal, or int),
    * where `minShare·part_qty` would round differently in double (Spark)
    * vs exact decimal (DuckDB, were a generator round to flip l_quantity
    * to DECIMAL) on exact-boundary rows.
    */
  def dominantSuppliers(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, namePattern: String = "small%",
      yearStart: String = "1996-01-01", yearEnd: String = "1997-01-01",
      minShare: Double = 0.3): DataFrame = {
    val sharePct = math.round(minShare * 100)
    require(sharePct == minShare * 100,
      s"minShare must be a whole percentage for the exact compare, got $minShare")
    val shipped = lineitem
      .filter(col("l_shipdate") >= lit(yearStart) &&
        col("l_shipdate") < lit(yearEnd))
      .join(broadcast(part.filter(col("p_name").like(namePattern))
        .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
    val totals = shipped
      .groupBy(col("l_partkey"))
      .agg(sum(col("supp_qty")).as("part_qty"))
    shipped
      .join(totals, "l_partkey")
      .filter(lit(100L) * col("supp_qty") > lit(sharePct) * col("part_qty"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"),
        col("supp_qty"), round(col("supp_qty") / col("part_qty"), 6)
          .as("qty_share"))
  }

  /** Q160: two-sample KOLMOGOROV–SMIRNOV drift statistic per event type —
    * the distribution-shift monitor a continuously-ingesting training
    * pipeline runs between "the corpus so far" and "this week's crawl":
    * D = sup|ECDF_A − ECDF_B| over the metric column, here between the
    * first `splitDay` days of the month and the rest. Unlike the
    * mean/σ z-score family (q95/q157), KS sees SHAPE drift — a variance
    * blow-up or bimodal split with an unchanged mean still fires.
    *
    * Exactness: values quantize to the 1e-6 grid (longs), and D's
    * numerator is computed as max|cumA·nB − cumB·nA| — INTEGERS, so the
    * supremum is exact and engine-independent; only the final report
    * ratio divides. ECDF convention: both cumulative counts step at
    * every observed point (right-continuous, evaluated at grid points —
    * the sup over a step-function pair is attained at a step, so
    * scanning observed points IS the sup).
    *
    * Scale design: the corpus-sized scan reduces FIRST to per-(type,
    * grid-value) counts (map-side combinable; support bounded by the
    * grid, not the row count), so the ordered cumulative walk runs over
    * the aggregated table. The walk partitions by event type — few
    * groups, the documented Window skew caveat — but its input is the
    * grid-bounded distinct-value table, not the fact table, so the
    * per-partition walk is O(support), fine at any corpus size.
    */
  def ksDrift(events: DataFrame, splitDay: Int = 15): DataFrame =
    ksFromCounts(events
      .select(col("event_type"),
        round(col("value") * 1e6).cast("long").as("vq"),
        (dayofmonth(col("ts")) <= splitDay).as("a"))
      .groupBy(col("event_type"), col("vq"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("a"), 0L).otherwise(1L)).as("cb")))

  /** The KS core over pre-reduced counts (event_type, vq, ca, cb) — also
    * the per-batch body of [[graft.streaming.StreamingDriftMonitor]],
    * which joins a micro-batch's counts against a pinned baseline and
    * hands the merged table here.
    */
  def ksFromCounts(pts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("vq"))
    val tot = pts.groupBy(col("event_type"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    pts
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .join(tot, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")))
          .as("d_num"))
      .withColumn("ks_d", round(col("d_num").cast("double") /
        (col("n_a") * col("n_b")).cast("double"), 6))
  }

  /** Q168 (validated, q29/q44 pattern): the QUANTILE-SKETCH member of the
    * sketch family (HLL q29, CMS q44, bloom q51/q122, minhash q10, PQ
    * q152): `percentile_approx` (Greenwald–Khanna summaries — the
    * mergeable sketch a 1000-executor cluster aggregates where exact
    * percentiles would shuffle every value) validated IN-BAND against its
    * rank contract. The deterministic oracle-checked columns are the
    * EXACT percentiles (one `percentile` pass; DuckDB quantile_cont
    * parity per q37); the sketch side emits only `approx_rank_ok`: for
    * each target q, the approx value's true rank interval
    * [#(v < approx), #(v ≤ approx)] must intersect
    * q·n ± (n/accuracy + 1) — the GK guarantee (+1 float slack). A
    * rank-based check, not |approx − exact|: GK bounds RANK error, and
    * the flag stays deterministic even though the sketch's merge order
    * varies with partitioning.
    *
    * Scale: two passes over events (the percentile aggregate and the
    * rank count), the 3-row-per-type probe table broadcasts.
    */
  def quantileSketchValidated(events: DataFrame,
      accuracy: Int = 1000): DataFrame = {
    val qlit = array(lit(0.5), lit(0.95), lit(0.99))
    // lazily checkpointed: the probe table is consumed by both the rank
    // check and the final join — without it the percentile pass over
    // events runs twice (ScanAudit: 3 scans)
    val probes = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("__ex"),
        percentile_approx(col("value"), qlit, lit(accuracy)).as("__ap"))
      .localCheckpoint(false)
    val flat = probes.select(col("event_type"), col("n_events"),
      posexplode(col("__ap")).as(Seq("qi", "av")))
    val slack = col("n_events").cast("double") / lit(accuracy.toDouble) +
      lit(1.0)
    val target = element_at(qlit, col("qi") + 1) *
      col("n_events").cast("double")
    val checks = events.select(col("event_type"), col("value"))
      .join(broadcast(flat), Seq("event_type"))
      .groupBy(col("event_type"), col("qi"), col("av"), col("n_events"))
      .agg(sum((col("value") < col("av")).cast("long")).as("rlo"),
        sum((col("value") <= col("av")).cast("long")).as("rhi"))
      .select(col("event_type"),
        (col("rlo").cast("double") <= target + slack &&
          col("rhi").cast("double") >= target - slack).cast("int").as("ok"))
      .groupBy(col("event_type")).agg(min(col("ok")).as("approx_rank_ok"))
    probes.join(checks, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        col("__ex").getItem(0).as("p50"),
        col("__ex").getItem(1).as("p95"),
        col("__ex").getItem(2).as("p99"),
        col("approx_rank_ok"))
  }

  /** Q178: conversion rate with WILSON 95% confidence bounds — the
    * statistically honest form of the daily view→purchase rate: the
    * plain ratio on a 50-view day swings wildly, and the normal
    * approximation misbehaves near 0/1; Wilson's score interval is the
    * standard fix (what A/B dashboards should use). Emitted per day:
    * trials (views), conversions (purchases), the point rate, and the
    * Wilson bounds at z = 1.96.
    *
    * The binomial framing needs conversions ⊆ trials, so rates are
    * per-USER: trials = distinct users who viewed that day, conversions
    * = viewing users who also purchased that day (raw event counts can
    * exceed 1 purchase per view and push p past 1 — sqrt of a negative).
    * Counts are exact integers; the interval is ONE literal-mirrored
    * IEEE double chain (every literal cast to DOUBLE in the oracle — the
    * q139 lesson), no accumulation, rounded at 6dp. Days with zero
    * viewers emit nothing.
    */
  def conversionWilson(events: DataFrame, z: Double = 1.96): DataFrame = {
    val daily = events
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(
        max((col("event_type") === "view").cast("int")).as("__v"),
        max((col("event_type") === "purchase").cast("int")).as("__p"))
      .groupBy(col("day"))
      .agg(
        sum(col("__v").cast("long")).as("trials"),
        sum((col("__v") * col("__p")).cast("long")).as("conversions"))
      .filter(col("trials") > 0)
    val n = col("trials").cast("double")
    val p = col("conversions").cast("double") / n
    val z2 = lit(z) * lit(z)
    val center = p + z2 / (lit(2.0) * n)
    val margin = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n))
    val denom = lit(1.0) + z2 / n
    daily.select(
      datediff(col("day"), lit("1970-01-01")).cast("long").as("epoch_day"),
      col("trials"), col("conversions"),
      round(p, 6).as("rate"),
      round((center - margin) / denom, 6).as("wilson_lo"),
      round((center + margin) / denom, 6).as("wilson_hi"))
  }

  /** Q179: two-proportion A/B z-test — the experiment-readout primitive:
    * users split into arms by id parity (deterministic, and exactly how
    * a real assignment hash works), conversion at USER-DAY granularity
    * as in q178 (viewing user-days vs user-days that also purchased, so
    * x ⊆ n per arm; corpus-LIFETIME conversion saturates to 1 on this
    * data — every user eventually purchases — and a saturated pool
    * zeroes the z denominator), then the pooled two-proportion
    * z statistic
    * {{{ z = (p_A − p_B) / √(p̂(1−p̂)(1/n_A + 1/n_B)) }}}
    * and the |z| > 1.96 significance verdict. Counts exact; the z chain
    * is one literal-mirrored IEEE expression; the verdict is a double
    * compare both engines resolve identically.
    */
  def abConversionZ(events: DataFrame, z: Double = 1.96): DataFrame = {
    val perUser = events
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"), to_date(col("ts")).as("__day"))
      .agg(max((col("event_type") === "view").cast("int")).as("__v"),
        max((col("event_type") === "purchase").cast("int")).as("__p"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"), col("__v"),
        (col("__v") * col("__p")).as("__c"))
    val one = perUser.agg(
      sum(when(col("arm") === 0, col("__v")).otherwise(0)).cast("long")
        .as("n_a"),
      sum(when(col("arm") === 0, col("__c")).otherwise(0)).cast("long")
        .as("x_a"),
      sum(when(col("arm") === 1, col("__v")).otherwise(0)).cast("long")
        .as("n_b"),
      sum(when(col("arm") === 1, col("__c")).otherwise(0)).cast("long")
        .as("x_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("x_a").cast("double") / na
    val pb = col("x_b").cast("double") / nb
    val pool = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val zStat = (pa - pb) /
      sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    one.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      round(zStat, 6).as("z_stat"),
      (abs(zStat) > lit(z)).cast("int").as("significant"))
  }

  /** Q212: PARETO / ABC analysis — the 80/20 inventory question ("how
    * few parts carry 70% of the volume?") as exact integer arithmetic:
    * parts rank by total shipped quantity (ties by key), the running
    * share classifies A (≤70% cumulative), B (≤90%), C (rest) by
    * CROSS-MULTIPLICATION (cum·10 ≤ total·7 — no float share ever
    * materializes), and the output is one row per class. The fact
    * table reduces map-side to one row per part before anything
    * global happens; the ranking window runs over the PART DIMENSION
    * (catalog-bounded, the q144 vocab-rank argument — enrolled in the
    * PlanSpec allowlist).
    */
  def paretoAbc(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val cumW = Window.orderBy(col("qty").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perPart
      .withColumn("cum", sum(col("qty")).over(cumW))
      .crossJoin(broadcast(perPart.agg(sum(col("qty")).as("tot"))))
      .withColumn("abc_class",
        when(col("cum") * 10 <= col("tot") * 7, "A")
          .when(col("cum") * 10 <= col("tot") * 9, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("qty")).as("class_qty"),
        first(col("tot")).as("__tot"))
      .select(col("abc_class"), col("n_parts"), col("class_qty"),
        expr("(class_qty * 1000000L) div __tot").as("share_micros"))
  }

  /** Q181: k-STEP MARKOV distribution over the event-transition matrix —
    * q72's matrix put to work: starting uniform, where does probability
    * mass sit after `steps` transitions? The forward-looking journey
    * summary ("after 4 clicks of behavior, users are mostly in X") that
    * the static matrix doesn't answer. Exact integer flows (the q158
    * discipline): mass in micro-units, per-edge flow = (v(s)·c(s,t)) div
    * rowsum(s), floor division only — engine- and partition-identical,
    * oracle-unrollable. Floor losses stay in the system as dropped
    * micro-units (documented; sums stay within |states| micros of 10⁶).
    *
    * The transition counts come from per-user (prev → cur) steps over
    * the (ts, event_id) total order. All post-count tables are
    * |event-types|²-sized — the corpus is touched once. ABSORBING
    * states (targets with no outgoing transitions) carry their mass
    * forward unchanged — without the carry-over a sink state would
    * silently DRAIN mass from the system each round.
    */
  def markovKStep(events: DataFrame, steps: Int = 4): DataFrame = {
    require(steps >= 1 && steps <= 64, s"steps out of range: $steps")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rs", sum(col("c"))
        .over(Window.partitionBy(col("prev"))))
      .localCheckpoint(false)
    val sources = trans.select(col("prev")).distinct()
    val states = sources.select(col("prev").as("state"))
    val nStates = states.count()
    var v = states.withColumn("mass",
      expr(s"1000000 div ${nStates}L"))
    var i = 0
    while (i < steps) {
      val flows = trans.join(v, col("prev") === col("state"))
        .groupBy(col("cur").as("state"))
        .agg(sum(expr("(mass * c) div rs")).as("mass"))
      val absorbed = v.join(sources, col("state") === col("prev"),
        "left_anti")
      v = flows.unionByName(absorbed)
        .groupBy(col("state")).agg(sum(col("mass")).as("mass"))
      i += 1
    }
    v.select(col("state"), col("mass").as("mass_micros"))
  }

  /** Q200: MARKOV REMOVAL-EFFECT attribution (Anderl et al. 2014) — the
    * data-driven answer to "which channel actually CAUSED conversions?"
    * that the positional heuristics (q174's first/last/linear/U-shaped)
    * assume away: model user journeys as a first-order Markov chain
    * (START → channels → CONV/NULL), compute the chain's conversion
    * probability, then re-compute it with each channel REMOVED (entering
    * the removed channel is a dead end). A channel's attribution is the
    * conversion probability it carries: its removal effect, normalized
    * across channels.
    *
    * Journey semantics: per user, events order by (ts, event_id) — the
    * repo's total order; each conversion event closes a journey (CONV)
    * and the next event opens a new one; a trailing journey without a
    * conversion ends in NULL (end of observation = non-converting, the
    * standard convention). A journey whose first event converts
    * contributes START → CONV.
    *
    * Exactness: conversion probabilities are absorption probabilities,
    * computed by `rounds` fixed value-iteration steps on the micro grid
    * (the q158/q181 discipline): p_i ← (Σ_j c_ij·p_j) div n_i with
    * p(CONV)=10⁶, p(NULL)=0 — ONE floor division per state per round, so
    * the iterate is bit-identical across engines and partitionings and
    * the oracle unrolls it as CTE rounds. Fixed rounds, not
    * convergence-tested: the k-round estimate IS the contract.
    *
    * Scale: the corpus is touched ONCE — one window shuffle on user_id
    * builds per-journey transitions, one map-side-combinable groupBy
    * reduces them to the (|channels|+1)² transition matrix. The matrix
    * is driver-bounded BY CONTRACT (like the BPE merge table and the
    * linkage u-row: states are event types, not rows) and the 5
    * scenario iterations run in exact Long arithmetic on it; per-state
    * flows stay inside Long as long as no state's outgoing count
    * exceeds 2⁴³ (~8.8e12 — guarded loudly; raise to BigInt math, not
    * silently, beyond it).
    */
  def markovRemovalEffect(events: DataFrame, convType: String = "purchase",
      rounds: Int = 12): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds out of range: $rounds")
    val spark = events.sparkSession
    val isc = (col("event_type") === convType).cast("int")
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wJourney = Window.partitionBy(col("user_id"), col("j"))
      .orderBy(col("ts"), col("event_id"))
    val step = struct(
      coalesce(col("prv"), lit("START")).as("f"),
      when(col("isc") === 1, lit("CONV")).otherwise(col("event_type"))
        .as("t"))
    val terminal = struct(col("event_type").as("f"), lit("NULL").as("t"))
    val counts = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        isc.as("isc"))
      .withColumn("j", coalesce(
        sum(col("isc")).over(wUser.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("event_type"), col("isc"),
        lag(col("event_type"), 1).over(wJourney).as("prv"),
        lead(col("event_type"), 1).over(wJourney).as("nxt"))
      .select(explode(concat(
        array(step),
        // slice-to-zero keeps the else branch exactly typed (an empty
        // array literal would be array<null> and fail coercion)
        when(col("nxt").isNull && col("isc") === 0, array(terminal))
          .otherwise(slice(array(terminal), 1, 0)))).as("tr"))
      .groupBy(col("tr.f").as("f"), col("tr.t").as("t"))
      .agg(count(lit(1)).as("c"))
      .collect()  // bounded by contract: (|event types|+2)² rows
    val edges: Map[String, Seq[(String, Long)]] = counts
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (f, es) =>
        f -> es.toSeq.map(e => (e._2, e._3)).sortBy(_._1)
      }
    val ns: Map[String, Long] = edges.map { case (f, es) =>
      f -> es.map(_._2).sum
    }
    ns.foreach { case (f, n) => require(n <= (1L << 43),
      s"markovRemovalEffect: state '$f' has $n outgoing transitions — " +
        "beyond the Long flow envelope (2^43); widen the math to BigInt") }
    val states = edges.keySet
    val channels = (states - "START").toSeq.sorted
    def absorb(removed: Option[String]): Long = {
      var p: Map[String, Long] = states.map(_ -> 0L).toMap
      var r = 0
      while (r < rounds) {
        p = states.map { i =>
          if (removed.contains(i)) i -> 0L
          else {
            val flow = edges(i).map { case (t, c) =>
              c * (t match {
                case "CONV" => 1000000L
                case "NULL" => 0L
                case x => p(x)
              })
            }.sum
            i -> flow / ns(i)
          }
        }.toMap
        r += 1
      }
      p.getOrElse("START", 0L)
    }
    val base = absorb(None)
    val rows = channels.map { ch =>
      (ch, base, absorb(Some(ch)))
    }
    val effs = rows.map { case (_, b, rm) => b - rm }
    val tot = effs.sum
    import spark.implicits._
    rows.zip(effs).map { case ((ch, b, rm), eff) =>
      (ch, b, rm, eff, if (tot == 0L) 0L else eff * 1000000L / tot)
    }.toDF("channel", "base_p_micros", "removed_p_micros",
      "removal_effect_micros", "share_micros")
  }

  /** Q176: SEQUENTIAL pattern mining, the trigram unit step — which
    * ordered event-type triples do users actually walk, and how many
    * distinct users support each? The transition matrix (q72) sees only
    * pairwise steps and the funnel (q166) only one fixed path; trigram
    * support surfaces the paths worth promoting INTO funnels. Support
    * counts DISTINCT users (the sequential-mining convention — one
    * looping user must not dominate), occurrences counted alongside.
    *
    * Per-user ordering is (ts, event_id) — total and engine-identical.
    * The lag window partitions by user (bounded by per-user event
    * count); the support aggregate is map-side combinable on the
    * (t1, t2, t3) key. One corpus scan, two exchanges.
    */
  def eventTrigramPatterns(events: DataFrame,
      minSupportUsers: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(countDistinct(col("user_id")).as("support_users"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("support_users") >= minSupportUsers)
  }

  /** Q166: ORDERED funnel analysis — how many users progress through the
    * event sequence stage₁ → stage₂ → … with each step STRICTLY after
    * the previous (the product-analytics primitive the transition matrix
    * q72 and cohort retention q71 don't answer: order matters, and a
    * purchase before the first view must not count). Emits one row per
    * stage: users reaching it and the mean hours from the previous stage
    * (conversion latency).
    *
    * Semantics: stage 1 anchors at each user's EARLIEST stage-1 event;
    * stage i+1 at the earliest stage-(i+1) event strictly after the
    * user's stage-i time — the standard "first touch" funnel, computed
    * exactly. Latency sums integer SECONDS (floor micros/1e6 — exact in
    * both engines, and the sum stays far inside double's 2⁵³ integer
    * range where raw micro sums would not) before one double division
    * chain mirrored literal-for-literal in the oracle.
    *
    * Scale: one filtered pass per stage over the events table (filters
    * pushed to the scan), each reduced map-side to one row per user
    * before its equi-join on user_id — |users| rows shuffle per stage,
    * never raw events. Stage count is a constant; the loop composes a
    * single Catalyst plan, no driver data.
    */
  def funnel(events: DataFrame,
      stages: Seq[String] = Seq("signup", "view", "click", "purchase"))
      : DataFrame = {
    require(stages.size >= 2, s"need >= 2 stages, got $stages")
    val us = unix_micros(col("ts"))
    var reached = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(us).as("t"))
    val rows = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    rows += reached.agg(
      lit(1).as("stage"), lit(stages.head).as("event_type"),
      count(lit(1)).as("n_users"),
      lit(null).cast("double").as("avg_hours_from_prev"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val nxt = events.filter(col("event_type") === st)
        .select(col("user_id"), us.as("t2"))
        .join(reached, Seq("user_id"))
        .filter(col("t2") > col("t"))
        .groupBy(col("user_id"))
        .agg(min(col("t2")).as("t2"), min(col("t")).as("t"))
      rows += nxt
        .select(expr("(t2 - t) div 1000000").as("dsec"))
        .agg(lit(i + 1).as("stage"), lit(st).as("event_type"),
          count(lit(1)).as("n_users"),
          round(sum(col("dsec")).cast("double") / count(lit(1)) /
            lit(3600.0), 6).as("avg_hours_from_prev"))
      reached = nxt.select(col("user_id"), col("t2").as("t"))
    }
    rows.reduce(_ unionByName _).filter(col("n_users") > 0)
  }
}
