package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** UNKEYED interval-overlap join — the range-join family Spark has no
  * native strategy for: with no equi-key, `a.start <= b.end AND
  * b.start <= a.end` plans as a BroadcastNestedLoopJoin (all-pairs
  * per partition), which is exactly the operator you must never run at
  * 100 TB. The standard fix is BIN BLOCKING (the same device as DuckDB/
  * Postgres range-join rewrites and the Databricks range-join hint):
  * explode each interval into the fixed-width grid bins it covers,
  * equi-join on the bin, verify the exact overlap predicate, and emit
  * each pair EXACTLY ONCE — no distinct — by keeping only the bin that
  * contains max(start_a, start_b). (Two intervals overlap iff the later
  * start lies in both; floor is monotone, so that bin is
  * max(startbin_a, startbin_b) — a codegen'd compare, not a shuffle.)
  *
  * Cost model: shuffle volume is rows × bins-per-interval, so binWidth
  * should sit near the MEDIAN interval length (wider → fewer copies but
  * fatter bins to verify; narrower → the reverse). Degenerate inputs —
  * one interval spanning the whole timeline — silently explode the
  * copy count, so the operator guards rows against `maxBinsPerRow`
  * eagerly and fails loudly with the worst offender (the linkage-guard
  * discipline: refuse to launch a quadratic stage).
  *
  * Semantics: bounds are INCLUSIVE on both sides, on a NON-NEGATIVE
  * integral grid (epoch micros here; `div` binning truncates toward
  * zero, which equals floor only for non-negatives — guarded). Column
  * names of the two inputs must be disjoint.
  */
object IntervalJoin {

  /** Bin index of grid value `c` — BIGINT `div`, never `/` (Spark's
    * `/` on longs is DOUBLE division; at epoch-micro magnitudes the
    * quotient is inexact and the truncating cast can land one bin off).
    */
  private def bin(c: String, binWidth: Long): Column =
    expr(s"CAST($c AS BIGINT) div ${binWidth}L")

  /** Overlapping (left, right) row pairs, exactly once per pair. */
  def overlapJoin(left: DataFrame, ls: String, le: String,
      right: DataFrame, rs: String, re: String,
      binWidth: Long, maxBinsPerRow: Long = 10000L): DataFrame = {
    require(binWidth > 0, s"binWidth out of range: $binWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"column collision across sides: $shared")
    def guard(df: DataFrame, s: String, e: String, side: String): Unit = {
      val w = df.agg(
        max(bin(e, binWidth) - bin(s, binWidth) + lit(1L)).as("m"),
        min(col(s).cast("long")).as("lo")).collect().head
      if (!w.isNullAt(1)) require(w.getLong(1) >= 0L,
        s"overlapJoin: negative $side start ${w.getLong(1)} — div-binning " +
          "needs a non-negative grid; shift the values")
      val m = if (w.isNullAt(0)) 0L else w.getLong(0)
      require(m <= maxBinsPerRow,
        s"overlapJoin: a $side interval covers $m bins of $binWidth " +
          s"(cap $maxBinsPerRow) — a timeline-spanning interval would " +
          "explode the bin copies; widen binWidth or cap interval length")
    }
    guard(left, ls, le, "left")
    guard(right, rs, re, "right")
    def binned(df: DataFrame, s: String, e: String) = df.withColumn("__bin",
      explode(sequence(bin(s, binWidth), bin(e, binWidth))))
    binned(left, ls, le)
      .join(binned(right, rs, re).withColumnRenamed("__bin", "__rbin"),
        col("__bin") === col("__rbin"))
      .filter(col(ls) <= col(re) && col(rs) <= col(le))
      .filter(col("__bin") === greatest(bin(ls, binWidth), bin(rs, binWidth)))
      .drop("__bin", "__rbin")
  }

  /** Q213: DAILY PEAK OVERLAP — the sweep-line companion of
    * [[overlapJoin]]: how many intervals are active AT ONCE, per day
    * (peak concurrent sessions, the capacity-planning number a plain
    * per-day count overstates and an average understates). Each
    * interval splits into per-day segments (the bin device at day
    * width), each segment emits +1/−1 boundary points, and a running
    * sum ordered by (time, +1-before-−1) — inclusive bounds: touching
    * intervals ARE concurrent — maxes per day. The sweep windows
    * partition BY DAY, so no global funnel exists; points per day are
    * 2× that day's active intervals.
    */
  def dailyPeakOverlap(df: DataFrame, s: String, e: String): DataFrame = {
    val dayMicros = 86400000000L
    val segs = df
      .withColumn("__day", explode(sequence(bin(s, dayMicros),
        bin(e, dayMicros))))
      .select(col("__day"),
        greatest(col(s).cast("long"), col("__day") * lit(dayMicros))
          .as("__s"),
        least(col(e).cast("long"),
          col("__day") * lit(dayMicros) + lit(dayMicros - 1)).as("__e"))
    val points = segs.select(col("__day"), explode(array(
        struct(col("__s").as("t"), lit(1L).as("d")),
        struct(col("__e").as("t"), lit(-1L).as("d")))).as("p"))
      .select(col("__day"), col("p.t"), col("p.d"))
    val sweep = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__day"))
      .orderBy(col("t"), col("d").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    points
      .withColumn("running", sum(col("d")).over(sweep))
      .groupBy(col("__day").as("epoch_day"))
      .agg(max(col("running")).as("peak_concurrent"),
        expr("count(1) div 2").as("n_active"))
  }

  /** The STREAMING dual of [[overlapJoin]]: two unbounded interval
    * streams joined on overlap. Spark's stream-stream join cannot
    * express an unkeyed range predicate at all — but the bin IS an
    * equi-key, which is exactly what the streaming join needs to
    * shuffle-align state; the same exactly-once max-start-bin device
    * then applies unchanged. State is evicted by watermark: both
    * sides carry an event-time column derived from the interval END
    * (an interval is inert once its end passes), and the join adds
    * the time-range constraint |end_l − end_r| ≤ maxIntervalLen —
    * sound because overlapping intervals' ends can differ by at most
    * the longer interval's length, and maxIntervalLen bounds both
    * sides — ENFORCED PER ROW with assert_true (the batch guard's
    * `maxBinsPerRow · binWidth` envelope; a stream cannot be
    * pre-scanned, so the check rides in codegen), as is the batch
    * operator's non-negative-grid requirement.
    *
    * Emits in append mode once both watermarks pass; same inclusive
    * bounds and exactly-once semantics as the batch operator
    * (parity-spec'd in IntervalJoinSpec's streaming case).
    */
  def overlapJoinStream(left: DataFrame, ls: String, le: String,
      right: DataFrame, rs: String, re: String,
      binWidth: Long, maxIntervalLen: Long,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    require(binWidth > 0, s"binWidth out of range: $binWidth")
    require(maxIntervalLen > 0,
      s"maxIntervalLen out of range: $maxIntervalLen")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"column collision across sides: $shared")
    def prep(df: DataFrame, s: String, e: String, tsName: String) = df
      // the batch operator's eager guards, per-row since a stream
      // cannot be pre-scanned: div-binning truncates toward zero, so a
      // negative start would land one bin off and MISS pairs silently;
      // an interval longer than maxIntervalLen breaks the watermark
      // eviction bound the same silent way. Fail loudly instead.
      .filter(assert_true(col(s) >= 0,
        lit(s"overlapJoinStream: negative $s — div-binning needs a " +
          "non-negative grid; shift the values")).isNull)
      .filter(assert_true(
        col(e).cast("long") - col(s).cast("long") <= maxIntervalLen,
        lit(s"overlapJoinStream: interval [$s,$e] longer than " +
          s"maxIntervalLen=$maxIntervalLen — the |end_l-end_r| state " +
          "eviction bound would silently drop pairs")).isNull)
      .withColumn(tsName, timestamp_micros(col(e).cast("long")))
      .withWatermark(tsName, watermarkDelay)
      .withColumn("__sbin", explode(sequence(bin(s, binWidth),
        bin(e, binWidth))))
    val l = prep(left, ls, le, "__lts")
    val r = prep(right, rs, re, "__rts")
      .withColumnRenamed("__sbin", "__srbin")
    l.join(r,
        col("__sbin") === col("__srbin") &&
          col(ls) <= col(re) && col(rs) <= col(le) &&
          col("__sbin") === greatest(bin(ls, binWidth), bin(rs, binWidth)) &&
          col("__rts") >= col("__lts") - expr(s"INTERVAL $maxIntervalLen MICROSECOND") &&
          col("__rts") <= col("__lts") + expr(s"INTERVAL $maxIntervalLen MICROSECOND"))
      .drop("__sbin", "__srbin", "__lts", "__rts")
  }
}
