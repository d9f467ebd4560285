package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // Per-row cast to the 6-dp grid: the money values' true decimal values
  // (2-dp inputs, products of up to three 2-dp factors) lie exactly ON this
  // grid, so double→decimal rounding has no ties and every engine rounds to
  // the same point. Sums over decimals are exact (order-independent); final
  // outputs cast back to double (nearest-double of the same exact decimal on
  // every engine — pandas/arrow-safe, unlike wide decimals).
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  /** TPC-H Q1-style pricing summary over lineitem. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))))
          .cast("double").as("sum_charge"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

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
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Analytic windows over per-supplier monthly revenue: rank within
    * supplier, lag delta, running total. Pre-aggregates BEFORE the window
    * (small keyed input to the sort), and the month key makes in-partition
    * order unique ⇒ deterministic frames.
    */
  def supplierMonthly(lineitem: DataFrame): DataFrame = {
    val monthly = lineitem
      .groupBy(col("l_suppkey"), date_trunc("month", col("l_shipdate")).as("month"))
      .agg(sum(dec(col("l_extendedprice"))).cast("decimal(20,6)").as("revenue"))
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
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
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

  /** Sort + limit top-n with a total tiebreak order (deterministic). */
  def topOrders(orders: DataFrame, n: Int): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
}
