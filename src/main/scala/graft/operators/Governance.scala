package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance audits for training corpora — the release gate that
  * runs AFTER the cleaning pipeline (PII redaction q47, decontamination
  * q85/q197) and BEFORE data ships: does the kept table still
  * re-identify people?
  *
  * K-ANONYMITY (Sweeney 2002): a table is k-anonymous w.r.t. a set of
  * quasi-identifier (QI) columns iff every value combination that
  * occurs, occurs at least k times — each record hides in a crowd of
  * ≥ k. The practical question is not one number but a LADDER
  * (Samarati's generalization lattice, walked along one path): how much
  * must the QIs be coarsened (exact balance band → wide band → dropped)
  * before the table clears the target k? Each ladder level reports its
  * weakest class and how many rows sit in under-k classes — the
  * re-identifiable population that level would leak.
  *
  * Scale: the WHOLE ladder is evaluated in ONE corpus shuffle.
  * All levels are grouping sets of one projection, so Catalyst plans a
  * single Expand (×|levels| in-flight rows) feeding ONE partial
  * aggregation — map-side combine reduces each partition to its
  * distinct classes per level before anything moves, so the shuffle
  * carries class rows, not record rows. The second aggregation (ladder
  * rollup) runs over class counts only — bounded by the number of
  * distinct QI combinations, never by table size. No self-joins, no
  * windows, no per-level re-scans (the naive UNION-of-GROUP-BYs plan
  * reads the corpus once per level; at 100 TB that multiplier is the
  * whole cost).
  *
  * Reference scope note: the reference engine
  * (`/root/reference/src/test/scala/me/dummy/TimeoutJoinTest.scala`)
  * has no governance surface; this extends the training-pipeline
  * operator family mandated alongside it.
  */
object Governance {

  /** Q199: k-anonymity audit of the customer QIs over a fixed
    * generalization ladder. Levels (coarse→coarser):
    *   0: (nation, segment, balance div 100)
    *   1: (nation, segment, balance div 1000)
    *   2: (nation, segment)
    *   3: (segment)
    * Emits one row per level: class count, weakest-class size `k_min`,
    * classes and rows below `k`, and the pass flag.
    *
    * Balance bands use floor(x / literal-double) — one mirrored IEEE
    * division + floor, identical across engines (the q139 literal
    * discipline); negative balances band consistently because floor
    * (not truncation) is used on both sides.
    */
  def kAnonymityLadder(customer: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 2, s"k out of range: $k")
    val qi = customer.select(
      col("c_nationkey").as("nat"),
      col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / lit(100.0)).as("b100"),
      floor(col("c_acctbal") / lit(1000.0)).as("b1k"))
    // grouping_id bit order follows the trailing column list
    // (nat,seg,b100,b1k): a set's id has 1-bits at its MISSING columns.
    val classes = qi
      .groupingSets(
        Seq(
          Seq(col("nat"), col("seg"), col("b100")),
          Seq(col("nat"), col("seg"), col("b1k")),
          Seq(col("nat"), col("seg")),
          Seq(col("seg"))),
        col("nat"), col("seg"), col("b100"), col("b1k"))
      .agg(count(lit(1)).as("k_class"), grouping_id().as("gid"))
      .select(
        when(col("gid") === 1, 0L)
          .when(col("gid") === 2, 1L)
          .when(col("gid") === 3, 2L)
          .when(col("gid") === 11, 3L)
          .as("level"),
        col("k_class"))
    classes
      .groupBy(col("level"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("k_class")).as("k_min"),
        sum(when(col("k_class") < k, 1L).otherwise(0L)).as("risky_classes"),
        sum(when(col("k_class") < k, col("k_class")).otherwise(0L))
          .as("risky_rows"))
      .select(col("level"), col("n_classes"), col("k_min"),
        col("risky_classes"), col("risky_rows"),
        (col("k_min") >= k).cast("int").as("anonymous"))
  }

  /** Q204: l-DIVERSITY audit (Machanavajjhala et al. 2007) — the attack
    * k-anonymity misses: a class of k records is still leaky if they
    * all share the SENSITIVE value (homogeneity: "everyone in this
    * crowd has the same diagnosis"). Per equivalence class of the QIs
    * (nation, balance band), report the diversity of the sensitive
    * column (market segment): distinct sensitive values (`l_distinct`),
    * the dominant value's share on the micro grid (homogeneity attack
    * strength), and the pass flag against `l`.
    *
    * Determinism: the dominant value resolves ties by smallest value
    * (the q202 survivorship discipline — an unspecified-tie argmax
    * flips rows between partitionings); its share is one integer
    * micro-division. Scale: one corpus shuffle to (class, sensitive)
    * counts, then class-bounded aggregation — same posture as
    * [[kAnonymityLadder]].
    */
  def lDiversityAudit(customer: DataFrame, l: Int = 3): DataFrame = {
    require(l >= 2, s"l out of range: $l")
    val counts = customer
      .select(col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / lit(1000.0)).as("b1k"),
        col("c_mktsegment").as("sens"))
      .groupBy(col("nat"), col("b1k"), col("sens"))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy(col("nat"), col("b1k"))
      .agg(
        sum(col("n")).as("k_class"),
        count(lit(1)).as("l_distinct"),
        min(struct((lit(0L) - col("n")).as("negn"), col("sens").as("v")))
          .as("__top"))
      .select(col("nat"), col("b1k"), col("k_class"), col("l_distinct"),
        col("__top.v").as("top_sensitive"),
        // integer micro share — `div`, never `/` (double quotient)
        expr("((0 - `__top`.negn) * 1000000L) div k_class")
          .as("top_share_micros"),
        (col("l_distinct") >= l).cast("int").as("diverse"))
  }

  /** Q210: t-CLOSENESS audit (Li et al. 2007) — the attack l-diversity
    * misses: a class can hold l distinct sensitive values and STILL
    * leak if its distribution diverges from the table's (skewness
    * attack: "this crowd is 90% segment X where the population is
    * 20%"). Per QI class, the distance between the class's sensitive
    * distribution and the global one; for categorical attributes the
    * canonical distance is TOTAL VARIATION, ½·Σ|p_s − q_s|, computed
    * with each probability floored to the micro grid FIRST —
    * (n·10⁶) div total per term — so every quantity stays inside Long
    * to 10⁹ rows (the cross-multiplied exact form |n_cs·N − n_s·N_c|
    * overflows Long at ~2·10⁶ rows once the micro scale multiplies
    * in) and the estimator is deterministic by construction; the
    * per-term floor error is < 2·|values| micros, far inside any
    * useful threshold.
    *
    * Absent sensitive values contribute their full global mass, so the
    * class×value grid is completed by a cross join of the CLASS table
    * with the (tiny) sensitive-value table before the sparse counts
    * left-join in — never by re-scanning the corpus.
    *
    * Scale: ONE corpus shuffle to (class, sensitive) counts; the class
    * totals, global totals and the completed grid are all re-aggregations
    * of that checkpointed frame, bounded by |classes|·|values|.
    */
  def tClosenessAudit(customer: DataFrame, t: Double = 0.3): DataFrame = {
    require(t > 0.0 && t < 1.0, s"t out of range: $t")
    val tMicros = math.round(t * 1000000L)
    val cv = customer
      .select(col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / lit(1000.0)).as("b1k"),
        col("c_mktsegment").as("sens"))
      .groupBy(col("nat"), col("b1k"), col("sens"))
      .agg(count(lit(1)).as("n_cs"))
      .localCheckpoint(false) // feeds class totals, global totals, grid
    val cls = cv.groupBy(col("nat"), col("b1k"))
      .agg(sum(col("n_cs")).as("n_c"))
    val g = cv.groupBy(col("sens")).agg(sum(col("n_cs")).as("n_s"))
    val grid = cls.crossJoin(broadcast(g))
      .join(cv, Seq("nat", "b1k", "sens"), "left")
      .na.fill(0L, Seq("n_cs"))
    grid
      .crossJoin(broadcast(g.agg(sum(col("n_s")).as("n_total"))))
      .select(col("nat"), col("b1k"), col("n_c"),
        abs(expr("(n_cs * 1000000L) div n_c") -
          expr("(n_s * 1000000L) div n_total")).as("__term"))
      .groupBy(col("nat"), col("b1k"))
      .agg(first(col("n_c")).as("k_class"),
        expr("sum(__term) div 2L").as("tvd_micros"))
      .withColumn("close", (col("tvd_micros") <= tMicros).cast("int"))
  }

  /** Q205: NOISED AGGREGATE RELEASE — the Laplace mechanism of
    * differential privacy (Dwork et al. 2006) applied to per-group
    * counts (sensitivity 1), with SEEDED noise: the Laplace sample is
    * drawn by inverse CDF, X = −b·sgn(u−½)·ln(1−2|u−½|), from the
    * repo's deterministic uniform device (the q165 multiplicative
    * hash on a 2²⁰ grid) keyed by the GROUP, not the rows. Determinism
    * is the REPRODUCIBILITY contract of this engine (oracle-checkable,
    * re-run-stable); a production ε-DP release swaps the device for a
    * true RNG — everything else (sensitivity accounting, clamping,
    * release shape) is this operator. The grid device also bounds the
    * tail: u ∈ [1,2²⁰]/(2²⁰+1), so |noise| ≤ b·ln(2²⁰+1)/… ≈ 13.9·b —
    * no unbounded sample ever lands in a release.
    *
    * `types` is a plan literal (the q198 blocklist discipline): the
    * group id feeding the seed is epoch_day·|types| + index-in-list,
    * portable to any engine without string hashing. Released counts
    * clamp at 0 (negative counts leak the true value's smallness).
    *
    * Scale: one corpus shuffle to daily counts (map-side combinable);
    * the noise is a codegen'd per-group expression — no second pass,
    * no driver data.
    */
  def noisedDailyRelease(events: DataFrame, types: Seq[String],
      scale: Double = 2.0): DataFrame = {
    require(types.nonEmpty && types == types.distinct.sorted,
      s"types must be distinct and sorted (the index IS the seed): $types")
    require(scale > 0.0, s"scale out of range: $scale")
    val idx = types.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (t, i)) =>
      when(col("event_type") === t, lit(i.toLong)).otherwise(acc)
    }
    val daily = events
      .filter(col("event_type").isin(types: _*))
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("epoch_day"))
      .agg(count(lit(1)).as("n"))
    val m = 1048576L // 2^20
    val gid = col("epoch_day") * lit(types.size.toLong) + idx
    val h = shiftright(pmod(gid, lit(1000003L)) * lit(2654435761L), 16)
    val u = (pmod(h, lit(m)) + lit(1L)).cast("double") /
      lit((m + 1).toDouble)
    val v = u - lit(0.5)
    val noise = lit(0.0) -
      lit(scale) * signum(v) * log(lit(1.0) - lit(2.0) * abs(v))
    daily.select(col("event_type"), col("epoch_day"),
      greatest(lit(0L), col("n") + floor(noise)).as("released"))
  }

  /** Q231: DIFFERENTIALLY-PRIVATE per-group median via the EXPONENTIAL
    * MECHANISM (McSherry & Talwar 2007) — the release path for a
    * statistic Laplace noise fits badly (a noised median can land
    * outside the data's support; the exponential mechanism releases an
    * actual data value with probability ∝ exp(ε·u/2)). Utility is the
    * standard median score u(v) = −max(#below v, #above v): maximal at
    * the true median, sensitivity 1.
    *
    * Determinism (the q205 seeded-release discipline + the q193 grid):
    *  - utilities are exact integers from one per-group value
    *    histogram;
    *  - weights round to the 1e-6 grid after one mirrored
    *    exp(ε/2·(u−u_max)) chain (per-group max-shift keeps the best
    *    candidate at weight exactly 10⁶, so the total is never 0; the
    *    `exp`/`log` cross-engine agreement is the established q205/q133
    *    precedent);
    *  - ONE seeded uniform per group (the q205 integer hash chain on
    *    the group key — the index IS the seed) picks the released
    *    value by exact integer cumulative-weight inversion:
    *    min v with cumw > floor(r·W).
    *
    * Scale: one map-side-combinable histogram shuffle, then
    * value-domain-bounded per-group windows (partitioned — the
    * Mondrian cumulative-window shape) and one aggregation. Nothing is
    * collected; group count and value domain bound everything.
    */
  def dpMedianRelease(customer: DataFrame, eps: Double = 0.5)
      : DataFrame = {
    require(eps > 0.0 && eps <= 10.0, s"eps out of range: $eps")
    val half = eps / 2.0
    import org.apache.spark.sql.expressions.Window
    val hist = customer
      .select(col("c_nationkey").cast("long").as("g"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("nv"))
    val byV = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("g"))
    val scored = hist
      .withColumn("cum", sum(col("nv")).over(byV))
      .withColumn("n", sum(col("nv")).over(all))
      .withColumn("u",
        lit(0L) - greatest(col("cum") - col("nv"), col("n") - col("cum")))
      .withColumn("umax", max(col("u")).over(all))
      .withColumn("mw", round(lit(1000000.0) *
        exp(lit(half) * (col("u") - col("umax")).cast("double")))
        .cast("long"))
    val m = 1048576L // 2^20, the q205 uniform grid
    val picked = scored
      .withColumn("cumw", sum(col("mw")).over(byV))
      .withColumn("w", sum(col("mw")).over(all))
      .withColumn("h",
        shiftright(pmod(col("g"), lit(1000003L)) * lit(2654435761L), 16))
      .withColumn("r", (pmod(col("h"), lit(m)) + lit(1L)).cast("double")
        / lit((m + 1).toDouble))
      .withColumn("t", floor(col("r") * col("w").cast("double")))
    picked
      .filter(col("cumw") > col("t"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("dp_median"), max(col("n")).as("n"))
      .select(col("g").as("nationkey"), col("n"), col("dp_median"))
  }

  /** Q222: MONDRIAN multidimensional k-anonymization (LeFevre et al.
    * 2006) — the generalization TRANSFORM next to the q199 audit
    * ladder: recursively median-cut the 2-D quasi-identifier space
    * (here balance cents × nation key) until no partition can split
    * without a side dropping below `k`, then release each leaf as a
    * generalized box (lo/hi per dimension) with its occupant count —
    * every released box covers ≥ k individuals by construction.
    *
    * Determinism contract (both engines replay it exactly):
    *  - cut dimension = the larger RAW integer range, ties to dim 1;
    *  - cut point = the LOWER MEDIAN over the partition's value
    *    histogram (smallest v with cum ≥ (n+1) div 2), left = (≤ m);
    *  - a split only happens if both sides keep ≥ k rows;
    *  - children take heap slots 2·pid+1 / 2·pid+2 (unsplit partitions
    *    keep their slot — slots are assigned once, so ids never
    *    collide), which makes the leaf ids themselves reproducible.
    *
    * Scale: each round is two map-side-combinable shuffles (per-pid
    * stats; per-(pid, value) histogram — bounded by the VALUE DOMAIN
    * per partition, never collected), one pid-PARTITIONED cumulative
    * window, and a broadcast join-back of the ≤ 2^round split table.
    * Rounds are fixed; each round lazily checkpoints the assignment
    * frame so the loop-carried plan doesn't double per round (the
    * BpeTrain round discipline). No driver-side data tables.
    */
  def mondrianAnonymize(customer: DataFrame, k: Int = 25,
      rounds: Int = 6): DataFrame =
    mondrianAssign(customer, k, rounds).groupBy(col("pid")).agg(
      count(lit(1)).as("n"),
      min(col("d1")).as("abal_lo"), max(col("d1")).as("abal_hi"),
      min(col("d2")).as("nat_lo"), max(col("d2")).as("nat_hi"))

  /** Q223: the row-level RELEASE of the same recursion — every
    * customer mapped to their leaf's generalized box, i.e. the
    * anonymized table a downstream consumer actually joins against
    * (the q222 summary is the release's per-box audit). One broadcast
    * join of the assignment frame against the ≤ 2^rounds leaf boxes.
    */
  def mondrianRelease(customer: DataFrame, k: Int = 25,
      rounds: Int = 6): DataFrame = {
    val assign = mondrianAssign(customer, k, rounds)
    val boxes = assign.groupBy(col("pid")).agg(
      min(col("d1")).as("abal_lo"), max(col("d1")).as("abal_hi"),
      min(col("d2")).as("nat_lo"), max(col("d2")).as("nat_hi"))
    assign.select(col("rid").as("c_custkey"), col("pid"))
      .join(broadcast(boxes), Seq("pid"))
  }

  /** Q224: l-DIVERSITY AUDIT of the Mondrian release — k-anonymity
    * bounds re-identification but not ATTRIBUTE disclosure: a leaf box
    * whose k occupants all share one sensitive value (here market
    * segment) still leaks it. Per leaf: occupant count, distinct
    * sensitive values, and the dominant value's share in ppm (ties to
    * the smallest value, the q202 mode discipline) — the table a
    * release gate thresholds before shipping q223's rows.
    */
  def mondrianDiversity(customer: DataFrame, k: Int = 25,
      rounds: Int = 6): DataFrame = {
    val seg = mondrianAssign(customer, k, rounds)
      .withColumnRenamed("rid", "c_custkey")
      .join(customer.select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_mktsegment").as("seg")), Seq("c_custkey"))
      .groupBy(col("pid"), col("seg")).agg(count(lit(1)).as("c"))
    seg.groupBy(col("pid")).agg(
        sum(col("c")).as("n"),
        count(lit(1)).as("l_distinct"),
        min(struct((-col("c")).as("nc"), col("seg").as("s"))).as("m"))
      .select(col("pid"), col("n"), col("l_distinct"),
        col("m.s").as("dominant"),
        TextAnalysis.idiv(-col("m.nc") * lit(1000000L), col("n"))
          .as("dom_ppm"))
  }

  /** The shared Mondrian loop: per-row (rid, d1, d2, pid) after
    * `rounds` median cuts.
    */
  private def mondrianAssign(customer: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 2, s"k out of range: $k")
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    import org.apache.spark.sql.expressions.Window
    val half = (n: Column) => TextAnalysis.idiv(n + lit(1L), lit(2L))
    var cur = customer.select(
        col("c_custkey").cast("long").as("rid"),
        round(col("c_acctbal") * 100).cast("long").as("d1"),
        col("c_nationkey").cast("long").as("d2"),
        lit(0L).as("pid"))
      // pinned per round through [[Pinning]]: locally a plan-truncation
      // device (cuts are deterministic integer functions, so this is
      // not a determinism pin), but on a cluster the reliable option
      // keeps a 6-round job alive through executor loss
      .transform(Pinning.pin(_))
    for (_ <- 1 to rounds) {
      val stats = cur.groupBy(col("pid")).agg(
          count(lit(1)).as("n"),
          min(col("d1")).as("lo1"), max(col("d1")).as("hi1"),
          min(col("d2")).as("lo2"), max(col("d2")).as("hi2"))
        .filter(col("n") >= 2L * k)
        .select(col("pid"), col("n"),
          when(col("hi1") - col("lo1") >= col("hi2") - col("lo2"), 1L)
            .otherwise(2L).as("dim"))
      val hist = cur.join(broadcast(stats), Seq("pid"))
        .select(col("pid"), col("n"), col("dim"),
          when(col("dim") === 1L, col("d1")).otherwise(col("d2")).as("v"))
        .groupBy(col("pid"), col("n"), col("dim"), col("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("pid")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(w))
      val med = cum.filter(col("cum") >= half(col("n")))
        .groupBy(col("pid")).agg(min(col("v")).as("m"))
        .withColumnRenamed("pid", "mpid") // disambiguate the self-join
      val splits = cum.join(med,
          col("pid") === col("mpid") && col("v") === col("m"))
        .filter(col("cum") >= k && col("n") - col("cum") >= k)
        .select(col("pid"), col("dim"), col("m"))
      cur = cur.join(broadcast(splits), Seq("pid"), "left_outer")
        .select(col("rid"), col("d1"), col("d2"),
          when(col("m").isNull, col("pid"))
            .otherwise(col("pid") * 2L + lit(1L) +
              when(when(col("dim") === 1L, col("d1"))
                .otherwise(col("d2")) <= col("m"), 0L).otherwise(1L))
            .as("pid"))
        .transform(Pinning.pin(_))
    }
    cur
  }
}
