package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for every left row, the single most recent right row with
  * the same key whose timestamp is at-or-before (inclusive; `strict` makes
  * it strictly-before) the left row's timestamp. The training-data
  * workhorse: feature backfill ("the feature value that was live when this
  * example happened"), price-at-trade, config-at-event — q106's state-at-T
  * read generalized from ONE probe instant to a per-row instant.
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
  * range-join (`l.key = r.key AND r.ts <= l.ts` + row_number) explodes:
  * every left row pairs with ALL earlier right rows before the filter — at
  * 100 TB that is a quadratic shuffle. This implementation is the
  * linear-time union form instead:
  *
  *   1. tag right rows 0, left rows 1; unionByName (missing columns null);
  *   2. ONE exchange hash-partitions the union by key, ONE sort orders it
  *      by (ts, tag) — right sorts before left on timestamp ties, which is
  *      exactly inclusive `<=` semantics (tag order flips for `strict`);
  *   3. a running `last(payload, ignoreNulls)` over rows-unbounded-
  *      preceding carries the latest right payload forward; left rows then
  *      read it and drop the union scaffolding.
  *
  * Cost: one shuffle of |L|+|R| rows, one sort, constant window state (a
  * `last` over a growing frame keeps one value, not the frame). No
  * broadcast needed on either side, no pair blow-up. The one caveat shared
  * with every per-key ordered computation: a pathologically hot key
  * serializes into one partition's sort — mitigation is range-splitting
  * that key by time and carrying the last payload across boundaries, which
  * this keeps out of the default path (salting is inapplicable — order
  * matters).
  *
  * Determinism: callers must make right unique per (key, ts) (pre-reduce
  * with max_by/aggregation) — otherwise which same-timestamp row wins
  * depends on sort tie order. The q109 wrapper does exactly that.
  *
  * NULL keys: `Window.partitionBy` groups null keys into ONE partition
  * (SQL GROUP BY semantics), so null-keyed left rows would match
  * null-keyed right rows — where a SQL ASOF JOIN's equality predicate
  * never matches on NULL. Callers joining nullable keys must filter or
  * coalesce them first; the driver tables' keys are non-null by contract.
  */
object AsofJoin {

  /** Left rows + `asofTsCol` (the matched right timestamp, null if none) +
    * `payloadCols` (right columns carried over, null if none). Both inputs
    * must expose `keyCol` and `tsCol` under those names; `payloadCols` must
    * not clash with left's columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], asofTsCol: String = "asof_ts",
      strict: Boolean = false): DataFrame = {
    val carried = asofTsCol +: payloadCols
    val r = right.select(
      (col(keyCol) +: col(tsCol).as(tsCol) +: col(tsCol).as(asofTsCol) +:
        payloadCols.map(col)): _*)
      .withColumn("__asof_side", lit(0))
    val l = left.withColumn("__asof_side", lit(1))
    // inclusive: right(0) sorts before left(1) at equal ts, so an
    // equal-timestamp right row IS visible; strict flips the tag order so
    // it is not
    val sideOrder: Column =
      if (strict) -col("__asof_side") else col("__asof_side")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .select(
        (col("*") +:
          carried.map(c => last(col(c), ignoreNulls = true).over(w)
            .as(s"__asof_$c"))): _*)
    joined
      .filter(col("__asof_side") === 1)
      .select(
        (left.columns.map(col).toSeq ++
          carried.map(c => col(s"__asof_$c").as(c))): _*)
  }

  /** Q109: attribute every purchase to the user's most recent click at or
    * before the purchase instant — unbounded-lookback attribution as a
    * JOIN (q33's windowed variant bounds the lookback; this one answers
    * "what was the last thing they clicked, ever"). Clicks pre-reduce to
    * one row per (user, instant) — max event_id wins — so the as-of match
    * is deterministic. Emits the purchase, the matched click, and the gap
    * in whole seconds (null when the user never clicked before buying).
    */
  def purchaseClickAsof(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = events
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    asofJoin(purchases, clicks, "user_id", "ts",
        payloadCols = Seq("click_id"), asofTsCol = "click_ts")
      .select(
        col("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_ts"), col("click_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("click_ts")))
          .as("gap_s"))
  }
}
