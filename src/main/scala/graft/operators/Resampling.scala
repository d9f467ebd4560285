package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Resampling inference — the distribution-free confidence story the
  * closed-form battery (Stats.scala) cannot give: bootstrap intervals
  * and permutation p-values make NO normality assumption, which is
  * exactly what heavy-tailed revenue columns violate. Both operators
  * are DETERMINISTIC: replicate randomness comes from the q205
  * seeded-hash chain (`pmod(gid, 1000003) · 2654435761 ≫ 16`), so the
  * same data always yields the same interval and the DuckDB oracle
  * mirrors every replicate exactly — no RNG state, no seed plumbing,
  * no flaky gate.
  *
  * Scale design: each operator is ONE explode of the fact table over
  * the B replicate indices followed by ONE map-side-combinable
  * aggregation into B rows — B·|rows| mapped work, B rows shuffled
  * (partial aggregation reduces each partition to B cells first).
  * Everything downstream operates on the B-row replicate frame.
  * Cost is B× CPU on the corpus scan, the honest price of resampling;
  * B is a parameter, and at 100 TB you run it on the daily/group
  * aggregate (as q344 does) rather than raw facts.
  */
object Resampling {

  /** The q205 seeded uniform in (0, 1): Knuth-multiply hash of an
    * integer group id, 2^20 buckets, never exactly 0 or 1. */
  private[graft] def hashUniform(gid: Column): Column = {
    val m = 1048576L // 2^20
    val h = shiftright(pmod(gid, lit(1000003L)) * lit(2654435761L), 16)
    (pmod(h, lit(m)) + lit(1L)).cast("double") / lit((m + 1).toDouble)
  }

  /** Poisson(1) inverse-CDF weight on the seeded uniform, capped at 4
    * (P(w>4) ≈ 0.0037 folded into the top cell); 10 dp CDF literals
    * mirrored in the oracle. Replicate 0 is the IDENTITY (w ≡ 1) —
    * the un-resampled totals ride the same cell frame, which is what
    * lets the streaming dual keep ONE bounded aggregation. */
  private[graft] def bootstrapWeight(key: Column, b: Column): Column = {
    val u = hashUniform(key * lit(67L) + b)
    when(b === 0L, lit(1L))
      .when(u < lit(0.3678794412), lit(0L))
      .when(u < lit(0.7357588823), lit(1L))
      .when(u < lit(0.9196986029), lit(2L))
      .when(u < lit(0.9810118431), lit(3L))
      .otherwise(lit(4L))
  }

  /** The `(b, nw, sw)` replicate-cell reduction — Σw and Σw·x per
    * replicate, b = 0 the identity — a sum-monoid with B+1 rows of
    * state, so also the state of the streaming dual
    * [[graft.streaming.StreamingResampling.bootstrapCellsStream]]
    * (the online-bagging reading of the Poisson bootstrap: each
    * arriving row updates every replicate's cell independently).
    */
  private[graft] def bootstrapCells(rows: DataFrame, keyCol: Column,
      valueCol: Column, bReps: Int): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    // r18 (guide §2, measured): the B× replicate fan-out ran on the few
    // scan partitions (q344: one 2.4 s task did the whole explode+hash+
    // partial aggregation) — the compute repartition sizes parallelism
    // to the exploded work, not to the input bytes; integer cell sums
    // are partition-order-independent, so the cells are bit-identical
    Hashing.repartitionForCompute(
      rows.select(keyCol.cast("long").as("k"), valueCol.as("x")), "k")
      .select(col("k"), col("x"),
        explode(sequence(lit(0L), lit(bReps.toLong))).as("b"))
      .select(col("b"), bootstrapWeight(col("k"), col("b")).as("w"),
        col("x"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("nw"), sum(dec(col("w") * col("x"))).as("sw"))
  }

  /** [[bootstrapMeanCi]] from a `(b, nw, sw)` replicate-cell table —
    * the cells-level entry the streaming dual reads (equivalence
    * pinned in StreamingResamplingSpec). Replicate 0 carries the
    * un-resampled n/Σx; CI comes from replicates 1..B. */
  def bootstrapCiFromCells(cells0: DataFrame): DataFrame = {
    // the cell frame feeds BOTH the replicate branch and the identity
    // branch, and Catalyst cannot share a non-exchange subtree — pin
    // the B+1-row frame once so the explode+aggregate runs ONCE (the
    // prefixFilteredJaccardPairs double-reference discipline;
    // ScanAudit showed scans=2 unpinned)
    val cells = graft.operators.Pinning.pin(cells0)
    val reps = cells.filter(col("b") =!= 0L)
      .select(col("b"),
        when(col("nw") <= 0L, lit(Double.NaN))
          .otherwise(col("sw").cast("double") / col("nw").cast("double"))
          .as("m"))
    val overall = cells.filter(col("b") === 0L)
      .select(col("nw").as("n_rows"), col("sw").as("sx"))
    reps.agg(count(lit(1)).as("b_reps"),
        expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY m)").as("lo"),
        expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY m)").as("hi"))
      .crossJoin(broadcast(overall))
      .select(col("b_reps"), col("n_rows"),
        round(col("sx").cast("double") / col("n_rows").cast("double"), 6)
          .as("mean_cents"),
        round(col("lo"), 6).as("ci_lo_cents"),
        round(col("hi"), 6).as("ci_hi_cents"))
  }

  /** Q344: POISSON-BOOTSTRAP CONFIDENCE INTERVAL for the mean of the
    * per-order revenue (Kleiner et al.'s scalable bootstrap reading:
    * Poisson(1) weights approximate multinomial resampling without
    * any cross-row coordination, so replicates ride a map-only
    * explode). Each (row, replicate) draws a weight from the exact
    * Poisson(1) inverse CDF on the seeded uniform — the CDF ladder
    * literals are mirrored in the oracle, weighted sums stay exact
    * integers (cents·w with w ≤ 4), each replicate mean is ONE double
    * divide, and the percentile bounds are `percentile_disc` — actual
    * replicate means, engine-identical selection on identical
    * doubles.
    */
  def bootstrapMeanCi(orders: DataFrame, bReps: Int = 64): DataFrame = {
    require(bReps >= 2 && bReps <= 4096, s"bReps out of range: $bReps")
    bootstrapCiFromCells(bootstrapCells(
      orders.select(col("o_orderkey"),
        round(lit(100.0) * col("o_totalprice")).cast("long").as("x")),
      col("o_orderkey"), col("x"), bReps))
  }

  /** Q345: RANDOMIZATION (permutation) TEST for the two-group mean
    * difference — the exact-inference dual of q269's Welch t: under
    * H0 the group labels are exchangeable, so the null distribution is
    * the observed data under S deterministic label reassignments
    * (Fisher's randomization reading; hash-parity reassignment rather
    * than a fixed-margin shuffle — both are exact randomization tests,
    * and parity needs no cross-row coordination). Each permutation's
    * diff-of-means comes from exact integer cent sums and ONE double
    * divide; the p-value is the add-one count
    * `(1 + #{|diff_s| ≥ |obs|}) / (S + 1)`. |obs| and every |diff_s|
    * are identical doubles in both engines, so the ≥ boundary cannot
    * flip.
    */
  def permutationMeanTest(lineitem: DataFrame, groupA: String = "R",
      groupB: String = "N", nPerms: Int = 100): DataFrame = {
    require(nPerms >= 1 && nPerms <= 10000, s"nPerms out of range: $nPerms")
    val base = lineitem
      .filter(col("l_returnflag").isin(groupA, groupB))
      .select(
        (col("l_orderkey").cast("long") * lit(10L) +
          col("l_linenumber").cast("long")).as("k"),
        (col("l_returnflag") === groupA).as("isA"),
        round(lit(100.0) * col("l_extendedprice")).cast("long").as("x"))
    permutationTestFromCells(
      permCells(base, col("k"), col("isA"), col("x"), nPerms))
  }

  /** Hash-parity side for (row key, permutation s ≥ 1); permutation 0
    * is the IDENTITY — the row's TRUE group membership — so the
    * observed statistic rides the same cell frame as the null
    * replicates (the [[bootstrapCells]] device). */
  private[graft] def permSide(key: Column, s: Column,
      isA: Column): Column =
    when(s === 0L, isA.cast("long"))
      .otherwise(pmod(shiftright(
        pmod(key * lit(131L) + s, lit(1000003L)) * lit(2654435761L),
        16), lit(2L)))

  /** The `(s, n1, n0, s1, s0)` permutation-cell reduction — side
    * counts and exact cent sums per permutation, s = 0 the identity —
    * a sum-monoid with S+1 rows of state, so also the state of the
    * streaming dual
    * [[graft.streaming.StreamingResampling.permCellsStream]].
    */
  private[graft] def permCells(rows: DataFrame, keyCol: Column,
      isACol: Column, valueCol: Column, nPerms: Int): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    // same compute repartition as bootstrapCells (q345's S× fan-out ran
    // as one 14.6 s task on the widest scan partition)
    Hashing.repartitionForCompute(
      rows.select(keyCol.cast("long").as("k"), isACol.as("isA"),
        valueCol.as("x")), "k")
      .select(col("k"), col("isA"), col("x"),
        explode(sequence(lit(0L), lit(nPerms.toLong))).as("s"))
      .select(col("s"),
        permSide(col("k"), col("s"), col("isA")).as("p"), col("x"))
      .groupBy(col("s"))
      .agg(
        sum(when(col("p") === 1L, lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(col("p") === 0L, lit(1L)).otherwise(lit(0L))).as("n0"),
        sum(dec(when(col("p") === 1L, col("x")).otherwise(lit(0L))))
          .as("s1"),
        sum(dec(when(col("p") === 0L, col("x")).otherwise(lit(0L))))
          .as("s0"))
  }

  /** [[permutationMeanTest]] from a `(s, n1, n0, s1, s0)` cell table —
    * the cells-level entry the streaming dual reads (equivalence
    * pinned in StreamingResamplingSpec). Permutation 0 carries the
    * observed split; the add-one p counts replicates 1..S. */
  def permutationTestFromCells(cells0: DataFrame): DataFrame = {
    // same double-reference pin as bootstrapCiFromCells: obs (s=0) and
    // the S replicates read one materialized S+1-row frame
    val cells = graft.operators.Pinning.pin(cells0)
    // empty group: NaN, not an ANSI zero-divide (the repo-wide
    // double/0 discipline); the exceedance compare then counts 0
    def diffOf(c: DataFrame): DataFrame = c.select(col("s"),
      col("n1"), col("n0"),
      when(col("n1") <= 0L || col("n0") <= 0L, lit(Double.NaN))
        .otherwise(col("s1").cast("double") / col("n1").cast("double") -
          col("s0").cast("double") / col("n0").cast("double"))
        .as("diff"))
    val obs = diffOf(cells.filter(col("s") === 0L))
      .select(col("n1").as("n_a"), col("n0").as("n_b"),
        col("diff").as("obs_diff"))
    val perms = diffOf(cells.filter(col("s") =!= 0L))
    perms.crossJoin(broadcast(obs))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("obs_diff")).as("od"),
        count(lit(1)).as("n_perms"),
        sum(when(abs(col("diff")) >= abs(col("obs_diff")), lit(1L))
          .otherwise(lit(0L))).as("ge"))
      .select(col("n_a"), col("n_b"),
        round(col("od"), 6).as("obs_diff_cents"),
        col("n_perms"),
        round((lit(1L) + col("ge")).cast("double") /
          (col("n_perms") + lit(1L)).cast("double"), 6).as("p_value"))
  }
}
