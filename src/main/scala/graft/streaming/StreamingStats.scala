package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming dual of the q272 contingency audit: maintain the
  * (a, b, o) cell table over an unbounded event stream — cell counts
  * are a sum-monoid, so this is another watermark-free bounded-state
  * aggregation (the StreamingSketch family): state never exceeds
  * |A|·|B| cells regardless of stream length. Run in update mode (a
  * micro-batch re-emits only the cells it touched) or complete mode;
  * the χ²/Cramér's V/MI verdict
  * ([[graft.operators.Stats.contingencyVerdict]]) is a bounded
  * downstream fold — run it per micro-batch in `foreachBatch` or over
  * the complete-mode table.
  *
  * Equivalence contract (StreamingContingencySpec): the latest emitted
  * cell values equal the batch cell table over everything fed so far,
  * and the verdict over them equals
  * [[graft.operators.Stats.contingencyStats]] on the same rows.
  */
object StreamingStats {

  /** (a, b, o) over everything seen so far; |A|·|B| bounded state. */
  def contingencyCellsStream(df: DataFrame, aCol: Column, bCol: Column)
      : DataFrame =
    df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("o"))

  /** Streaming dual of the q289 KS histogram: maintain the two-group
    * `(v, na, t)` value histogram over an unbounded stream — counts
    * are a sum-monoid, state is ≤ |value domain| rows regardless of
    * stream length (the contingencyCellsStream argument). The KS/CvM
    * verdicts ([[graft.operators.Stats.ksVerdict]]) are bounded
    * downstream folds over a snapshot of the emitted cells.
    *
    * Equivalence contract (StreamingKsSpec): the latest emitted cells
    * equal `Stats.twoGroupHist` over everything fed so far, and
    * `ksVerdict` over them equals `Stats.ks2Sample` on the same rows.
    *
    * Both group names are required, matching the batch contract
    * (`Stats.twoGroupHist` filters `isin(groupA, groupB)`): without the
    * filter, rows from any THIRD group value would silently land in the
    * implicit B side (t − na) and corrupt the verdict (ADVICE r16).
    * The filter is a stateless row predicate, so it is streaming-safe
    * ahead of the sum-monoid aggregation.
    */
  def twoGroupCellsStream(df: DataFrame, groupCol: Column,
      valueCol: Column, groupA: String, groupB: String): DataFrame =
    df.select(groupCol.as("g"), valueCol.cast("long").as("v"))
      .filter(col("g").isin(groupA, groupB))
      .groupBy(col("v"))
      .agg(sum(when(col("g") === groupA, lit(1L)).otherwise(lit(0L)))
          .as("na"),
        count(lit(1)).as("t"))

  /** Streaming dual of the DAILY-SERIES family (q259 ACF, q318 CCF,
    * q319 ADF, q320 KPSS): maintain the `(d, r, c)` daily aggregate —
    * revenue sum on the given integer grid plus order count — over an
    * unbounded order stream. Sum-monoid, state ≤ |calendar days|
    * regardless of stream length (the twoGroupCellsStream argument on
    * the time axis). Snapshot the cells and feed
    * [[graft.operators.Relational.ccfFromDaily]] /
    * [[graft.operators.Relational.adfFromDaily]] /
    * [[graft.operators.Relational.kpssFromDaily]] — the batch verdicts
    * verbatim (StreamingSeriesSpec).
    */
  def dailySeriesStream(df: DataFrame, dayCol: Column,
      priceCol: Column, centsPerUnit: Double = 100.0): DataFrame =
    df.select(dayCol.cast("long").as("d"),
        round(lit(centsPerUnit) * priceCol).cast("long").as("p"))
      .groupBy(col("d"))
      .agg(sum(col("p")).as("r"), count(lit(1)).as("c"))

  /** Streaming dual of the BLOCKED-DESIGN family (q327 Friedman, q335
    * Kendall W, q339 Page trend): maintain the `(blk, trt, n, s)` cell
    * table — count plus exact DECIMAL cent-sum per (block, treatment)
    * — over an unbounded stream. Sum-monoid, state ≤ blocks·treatments
    * cells regardless of stream length. Snapshot and feed
    * [[graft.operators.Stats.friedmanVerdict]] /
    * [[graft.operators.Stats.kendallWVerdict]] /
    * [[graft.operators.Stats.pageTrendVerdict]] — the batch verdicts
    * verbatim (StreamingBlockedSpec). For Page, `treatCol` must BE the
    * 1..k order score (the batch contract).
    */
  def blockCellsStream(df: DataFrame, blockCol: Column,
      treatCol: Column, valueCol: Column): DataFrame =
    df.select(blockCol.as("blk"), treatCol.as("trt"),
        round(lit(100.0) * valueCol).cast("long").as("c"))
      .groupBy(col("blk"), col("trt"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast("decimal(38,0)")).as("s"))

  /** Streaming dual of the q342 two-proportion monitor: the `(g, n, c)`
    * per-group trial/success cells — 2 rows of state. Snapshot and feed
    * [[graft.operators.Stats.twoProportionZVerdict]]. The isin filter
    * is the twoGroupCellsStream third-group discipline (ADVICE r16).
    */
  def groupFlagCellsStream(df: DataFrame, groupCol: Column,
      flagCol: Column, groupA: String, groupB: String): DataFrame =
    df.select(groupCol.as("g"), flagCol.cast("long").as("x"))
      .filter(col("g").isin(groupA, groupB))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("c"))

  /** Streaming dual of the q329 Mantel–Haenszel monitor: per-stratum
    * 2×2 cells `(g, a, b, c, dd)` — |strata|-bounded sum-monoid state.
    * Snapshot and feed
    * [[graft.operators.Stats.mantelHaenszelVerdict]].
    */
  def strataCellsStream(pairs: DataFrame, stratumCol: Column,
      xCol: Column, yCol: Column): DataFrame =
    pairs.select(stratumCol.as("g"),
        xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .groupBy(col("g"))
      .agg(
        sum(when(col("x") === 1L && col("y") === 1L, lit(1L))
          .otherwise(lit(0L))).as("a"),
        sum(when(col("x") === 1L && col("y") === 0L, lit(1L))
          .otherwise(lit(0L))).as("b"),
        sum(when(col("x") === 0L && col("y") === 1L, lit(1L))
          .otherwise(lit(0L))).as("c"),
        sum(when(col("x") === 0L && col("y") === 0L, lit(1L))
          .otherwise(lit(0L))).as("dd"))
}
