package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical hypothesis tests over the star schema — the statistical
  * gatekeepers an analytics engine runs before anyone trusts a
  * difference ("is the URGENT cohort actually paying more, or is that
  * noise?"). Reference scope: the engine's query surface (ncolomer/
  * kafka-streams-join exercises joins/filters/projections in its test
  * topology, e.g. TimeoutJoinTest.scala:106-164); these extend the
  * same DataFrame surface with the test-statistic aggregations a
  * production pipeline needs.
  *
  * Cross-engine discipline (shared with Regression/Relational):
  * everything that SUMS is exact — BIGINT/DECIMAL(38,0) accumulators
  * of integer cent/count products, or per-cell micro-grid integers
  * (rounded from IEEE-identical doubles, so both engines grid the same
  * value) — and every float emerges from ONE mirrored expression shape
  * over those exact scalars. No double is ever aggregated across rows
  * in engine-dependent order.
  *
  * Scale design: each test is one map-side-combinable aggregation over
  * the fact table into a group/value-bounded frame (≤ |groups| or
  * ≤ |distinct values| rows), then scalar arithmetic. No shuffles
  * beyond the single aggregation exchange; nothing corpus-sized ever
  * sits under a window or a join.
  */
object Stats {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Q269: WELCH'S T-TEST (unequal variances) between two groups of a
    * measure — the two-sample difference-of-means test that does not
    * assume the cohorts share a variance (the realistic case for
    * revenue-like columns). Exact per-group moments (n, Σc, Σc² with
    * per-row cent squares < 2⁶³ and DECIMAL(38,0) sums), then the
    * t statistic and Welch–Satterthwaite df from six scalars in one
    * mirrored double expression chain. One conditional aggregation
    * pass — the two groups are not scanned twice.
    */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val c = round(lit(100.0) * col(valueCol)).cast("long")
    val base = df.select(col(groupCol).as("g"), c.as("c"))
      .filter(col("g").isin(groupA, groupB))
    def side(grp: String, one: Column): Column = when(col("g") === grp, one)
    val ag = base.agg(
      sum(side(groupA, lit(1L)).otherwise(lit(0L))).as("n1"),
      sum(side(groupB, lit(1L)).otherwise(lit(0L))).as("n2"),
      sum(dec(side(groupA, col("c")).otherwise(lit(0L)))).as("s1"),
      sum(dec(side(groupB, col("c")).otherwise(lit(0L)))).as("s2"),
      sum(dec(side(groupA, col("c") * col("c")).otherwise(lit(0L))))
        .as("q1"),
      sum(dec(side(groupB, col("c") * col("c")).otherwise(lit(0L))))
        .as("q2"))
    def d(name: String): Column = col(name).cast("double")
    ag
      .withColumn("m1", d("s1") / d("n1"))
      .withColumn("m2", d("s2") / d("n2"))
      .withColumn("v1",
        (d("q1") - d("s1") * d("s1") / d("n1")) / (d("n1") - lit(1.0)))
      .withColumn("v2",
        (d("q2") - d("s2") * d("s2") / d("n2")) / (d("n2") - lit(1.0)))
      .withColumn("se1", col("v1") / d("n1"))
      .withColumn("se2", col("v2") / d("n2"))
      .withColumn("se", col("se1") + col("se2"))
      .select(
        col("n1").as("n_a"), col("n2").as("n_b"),
        round(col("m1"), 4).as("mean_a_cents"),
        round(col("m2"), 4).as("mean_b_cents"),
        round((col("m1") - col("m2")) / sqrt(col("se")), 6).as("t_stat"),
        round(col("se") * col("se") /
          (col("se1") * col("se1") / (d("n1") - lit(1.0)) +
            col("se2") * col("se2") / (d("n2") - lit(1.0))), 4)
          .as("df_welch"))
  }

  /** Q270: ONE-WAY ANOVA F across all groups of a measure — the k-group
    * generalization of q269 (did ANY priority class shift the mean?).
    * Between/within sums of squares from exact per-group moments; the
    * only non-integer per-group term, s_g²/n_g, is summed in
    * DETERMINISTIC group order by folding the sorted k-element list
    * (the q227 PCA list-fold device), so both engines add the same
    * IEEE doubles in the same order. One fact-table aggregation into
    * |groups| rows; the fold runs over k elements, never corpus rows.
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val c = round(lit(100.0) * col(valueCol)).cast("long")
    val per = df.select(col(groupCol).as("g"), c.as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"),
        sum(col("c")).as("sg"),
        sum(dec(col("c") * col("c"))).as("qg"))
      .select(col("g"), col("ng"), col("sg"), col("qg"),
        (col("sg").cast("double") * col("sg").cast("double") /
          col("ng").cast("double")).as("term"))
    val tot = per.agg(
      count(lit(1)).as("k"),
      sum(col("ng")).as("n"),
      sum(dec(col("sg"))).as("s"),
      sum(col("qg")).as("q"),
      aggregate(array_sort(collect_list(struct(col("g"), col("term")))),
        lit(0.0), (acc, x) => acc + x.getField("term")).as("a"))
    def d(name: String): Column = col(name).cast("double")
    tot
      .withColumn("ssb", col("a") - d("s") * d("s") / d("n"))
      .withColumn("ssw", d("q") - col("a"))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round(col("ssb") / (d("k") - lit(1.0)) /
          (col("ssw") / (d("n") - d("k"))), 6).as("f_stat"),
        round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta_sq"))
  }

  /** Q271: MANN–WHITNEY U (Wilcoxon rank-sum, tie-corrected normal
    * approximation) between two groups of a BOUNDED-DOMAIN measure —
    * the nonparametric sibling of q269 for columns where means lie
    * (skew, outliers). Ranks are tie-aware midranks computed over the
    * VALUE HISTOGRAM (one row per distinct value — never corpus rows),
    * kept exact on the ×2 integer grid (2·midrank = 2·cumBefore + t + 1
    * is always integral); U, the tie term Σ(t³−t) and all counts are
    * exact BIGINTs, then z is one mirrored double expression.
    */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val h = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .filter(col("g").isin(groupA, groupB))
      .groupBy(col("v"))
      .agg(sum(when(col("g") === groupA, lit(1L)).otherwise(lit(0L)))
          .as("na"),
        count(lit(1)).as("t"))
    // midranks over the value histogram: bounded by |distinct values|
    // (PlanSpec-enrolled with that argument)
    val rankW = Window.orderBy(col("v"))
    val ranked = h.withColumn("cumb",
      coalesce(sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val ag = ranked.agg(
      sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"),
      // Σ na·(2·midrank) — exact; midrank×2 = 2·cumBefore + t + 1
      sum(col("na") * (lit(2L) * col("cumb") + col("t") + lit(1L)))
        .as("r1x2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    def d(name: String): Column = col(name).cast("double")
    ag
      .withColumn("u1x2",
        col("r1x2") - col("n1") * (col("n1") + lit(1L)))
      .withColumn("nn", d("n1") + d("n2"))
      .withColumn("sig2",
        d("n1") * d("n2") / lit(12.0) *
          ((col("nn") + lit(1.0)) -
            d("ties") / (col("nn") * (col("nn") - lit(1.0)))))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(d("u1x2") / lit(2.0), 2).as("u_a"),
        round((d("u1x2") / lit(2.0) - d("n1") * d("n2") / lit(2.0)) /
          sqrt(col("sig2")), 6).as("z_score"))
  }

  /** Q272: CONTINGENCY-TABLE ASSOCIATION between two bounded
    * categoricals — χ², Cramér's V and mutual information in one pass
    * over the cell table (the "is event mix actually shifting by
    * weekday?" audit; q97 emits the per-cell table, this emits the
    * scalar verdicts). Cell/marginal counts are exact; each cell's χ²
    * and MI contribution is gridded to integer 10⁻⁹/10⁻¹² units from
    * IEEE-identical doubles so the cell-table aggregation is exact in
    * any order; V and the final scalars are mirrored expressions. The
    * fact table is scanned once into the |A|·|B|-bounded cell table.
    */
  def contingencyStats(df: DataFrame, aCol: Column, bCol: Column)
      : DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"))
    def d(c: Column): Column = c.cast("double")
    val terms = cells.join(rt, Seq("a")).join(ct, Seq("b"))
      .crossJoin(broadcast(tot))
      // dev = o·N − rt·ct: exact LONG (≤ ~1e12 at bench scale)
      .withColumn("dev", col("o") * col("n") - col("rt") * col("ct"))
      .select(col("a"), col("b"), col("o"), col("n"),
        // χ² cell term (o−e)²/e = dev²/(N·rt·ct), on the 1e-9 grid
        round(d(col("dev")) * d(col("dev")) /
          (d(col("n")) * d(col("rt")) * d(col("ct"))) * lit(1.0e9))
          .cast("long").as("chi_g"),
        // expected count e = rt·ct/N of the OBSERVED cells, 1e-9 grid:
        // every EMPTY cell contributes (0−e)²/e = e to χ², and
        // Σ_empty e = N − Σ_observed e — so empty cells are priced
        // without densifying the grid
        round(d(col("rt")) * d(col("ct")) / d(col("n")) * lit(1.0e9))
          .cast("long").as("e_g"),
        // MI cell term (o/N)·ln(o·N/(rt·ct)), on the 1e-12 grid
        // (empty cells contribute 0·ln0 = 0 — no correction needed)
        round(d(col("o")) / d(col("n")) *
          log(d(col("o")) * d(col("n")) /
            (d(col("rt")) * d(col("ct")))) * lit(1.0e12))
          .cast("long").as("mi_g"))
    terms.agg(
        max(col("n")).as("n"),
        countDistinct(col("a")).as("r_levels"),
        countDistinct(col("b")).as("c_levels"),
        sum(col("chi_g")).as("chi_sum"),
        sum(col("e_g")).as("e_sum"),
        sum(col("mi_g")).as("mi_sum"))
      .withColumn("chi2full",
        d(col("chi_sum")) / lit(1.0e9) +
          (d(col("n")) - d(col("e_sum")) / lit(1.0e9)))
      .select(col("n"), col("r_levels"), col("c_levels"),
        round(col("chi2full"), 6).as("chi2"),
        round(sqrt(col("chi2full") /
          (d(col("n")) *
            (least(col("r_levels"), col("c_levels")) - lit(1L))
              .cast("double"))), 6).as("cramers_v"),
        round(d(col("mi_sum")) / lit(1.0e12), 6).as("mi_nats"))
  }
}
