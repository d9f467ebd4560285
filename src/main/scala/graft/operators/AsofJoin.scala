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
    val (l, r, sideOrder) =
      tagSides(left, right, keyCol, tsCol, payloadCols, asofTsCol, strict)
    // The matched right row travels as ONE struct through ONE
    // last(ignoreNulls): the struct is non-null for every right row even
    // when its payload FIELDS are null, so the carried values are always a
    // single right row's — independent per-column `last`s would tear
    // across rows when the newest right row holds a null payload value
    // (asof_ts from the new row, payload from an older one).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_hit",
        last(col("__asof_carry"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(
        (left.columns.map(col).toSeq ++
          (asofTsCol +: payloadCols).map(c =>
            col("__asof_hit").getField(c).as(c))): _*)
  }

  /** Shared scaffolding: tag right rows 0 / left rows 1, pack the right
    * row's carried columns into one `__asof_carry` struct (null on the
    * left side via unionByName), and derive the tie order (right-before-
    * left at equal ts = inclusive; flipped = strict).
    */
  private def tagSides(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], asofTsCol: String,
      strict: Boolean): (DataFrame, DataFrame, Column) = {
    val r = right.select(col(keyCol), col(tsCol),
      struct((col(tsCol).as(asofTsCol) +: payloadCols.map(col)): _*)
        .as("__asof_carry"))
      .withColumn("__asof_side", lit(0))
    val l = left.withColumn("__asof_side", lit(1))
    val sideOrder: Column =
      if (strict) -col("__asof_side") else col("__asof_side")
    (l, r, sideOrder)
  }

  /** Hot-key fallback for [[asofJoin]] — the mitigation the default path
    * documents, shipped: range-split every key by TIME into `slice`-wide
    * buckets, compute the as-of carry within each (key, slice) partition,
    * and stitch slices with a per-(key, slice) boundary summary. A key
    * with 10⁸ rows no longer serializes into one partition's sort; each
    * sort handles only that key's rows within one time slice.
    *
    * Time-based (not row-budget) slicing is deliberate: an exact
    * rows-per-slice split needs a count pre-pass whose per-key output is
    * itself the hot partition, while a time split is one stateless
    * expression, and skew in TIME direction is bounded by the key's
    * arrival rate × slice width.
    *
    * Stitching: within a slice, the running `last` sees only that slice's
    * right rows, so each (key, slice) also aggregates its last right row
    * (map-side combinable max over (ts, carry)); a window over THIS
    * summary table — one row per key × active slice, orders of magnitude
    * smaller than the data — provides each slice's carry-in from all
    * earlier slices, and the final match is coalesce(within-slice,
    * carry-in). Strictness needs no special boundary handling: equal
    * timestamps always land in the same slice, so cross-slice carry-in is
    * strictly earlier by construction.
    *
    * Same contract as [[asofJoin]] (right unique per (key, ts); non-null
    * keys; additionally `payloadCols` must be of orderable types — the
    * boundary max compares (ts, carry) structs, and ts ties cannot occur,
    * but Catalyst still requires the struct to be orderable).
    */
  def asofJoinSplit(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], asofTsCol: String = "asof_ts",
      strict: Boolean = false, slice: String = "1 hour"): DataFrame = {
    val (l, r, sideOrder) =
      tagSides(left, right, keyCol, tsCol, payloadCols, asofTsCol, strict)
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_slice", window(col(tsCol), slice).getField("start"))
    val within = Window.partitionBy(col(keyCol), col("__asof_slice"))
      .orderBy(col(tsCol), sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // last right row of each (key, slice): max over (ts, carry) — carry
    // consulted only on ts ties, which the uniqueness contract excludes.
    // Grouped over the WHOLE union (`when` nulls out left rows, max skips
    // them): a slice holding only left rows still needs its spine row,
    // or the carry-in join below would miss it and drop earlier matches.
    val bounds = u
      .groupBy(col(keyCol), col("__asof_slice"))
      .agg(max(when(col("__asof_side") === 0,
          struct(col(tsCol).as("t"), col("__asof_carry").as("c"))))
        .getField("c").as("__asof_last"))
    val prior = Window.partitionBy(col(keyCol))
      .orderBy(col("__asof_slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = bounds
      .withColumn("__asof_in", last(col("__asof_last"), ignoreNulls = true)
        .over(prior))
      .select(col(keyCol), col("__asof_slice"),
        col("__asof_in"), col("__asof_last"))
    u.withColumn("__asof_within",
        last(col("__asof_carry"), ignoreNulls = true).over(within))
      .join(carryIn.drop("__asof_last"), Seq(keyCol, "__asof_slice"), "left_outer")
      .withColumn("__asof_hit",
        coalesce(col("__asof_within"), col("__asof_in")))
      .filter(col("__asof_side") === 1)
      .select(
        (left.columns.map(col).toSeq ++
          (asofTsCol +: payloadCols).map(c =>
            col("__asof_hit").getField(c).as(c))): _*)
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
