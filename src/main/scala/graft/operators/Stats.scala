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
    // Degenerate-but-valid inputs (two constant groups → se = 0;
    // single-element groups → n−1 = 0) answer NaN instead of tripping
    // Spark 4's ANSI DIVIDE_BY_ZERO (which raises even for double
    // divides) — the q279 assortativity discipline, mirrored in the
    // oracle's CASE expressions.
    // n = 0 (a group entirely absent from the data) must answer NaN
    // like every other degenerate case, not trip the ANSI divide in
    // m = s/n and se = v/n (ADVICE r16); `when` evaluates branches
    // lazily, so the guarded divides never execute at n = 0.
    ag
      .withColumn("m1", when(col("n1") <= 0L, lit(Double.NaN))
        .otherwise(d("s1") / d("n1")))
      .withColumn("m2", when(col("n2") <= 0L, lit(Double.NaN))
        .otherwise(d("s2") / d("n2")))
      .withColumn("v1", when(col("n1") <= 1L, lit(Double.NaN)).otherwise(
        (d("q1") - d("s1") * d("s1") / d("n1")) / (d("n1") - lit(1.0))))
      .withColumn("v2", when(col("n2") <= 1L, lit(Double.NaN)).otherwise(
        (d("q2") - d("s2") * d("s2") / d("n2")) / (d("n2") - lit(1.0))))
      .withColumn("se1", when(col("n1") <= 0L, lit(Double.NaN))
        .otherwise(col("v1") / d("n1")))
      .withColumn("se2", when(col("n2") <= 0L, lit(Double.NaN))
        .otherwise(col("v2") / d("n2")))
      .withColumn("se", col("se1") + col("se2"))
      .select(
        col("n1").as("n_a"), col("n2").as("n_b"),
        round(col("m1"), 4).as("mean_a_cents"),
        round(col("m2"), 4).as("mean_b_cents"),
        round(when(col("se") === 0.0, lit(Double.NaN)).otherwise(
          (col("m1") - col("m2")) / sqrt(col("se"))), 6).as("t_stat"),
        round(when(col("se") === 0.0 || col("n1") <= 1L ||
            col("n2") <= 1L, lit(Double.NaN)).otherwise(
          col("se") * col("se") /
            (col("se1") * col("se1") / (d("n1") - lit(1.0)) +
              col("se2") * col("se2") / (d("n2") - lit(1.0)))), 4)
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
    anovaFCore(df.select(col(groupCol).as("g"), c.as("c")))
  }

  /** The F machinery over a pre-gridded `(g, c)` frame — shared by
    * [[anovaF]] (cents of a measure) and [[brownForsythe]] (absolute
    * median deviations).
    */
  private def anovaFCore(gc: DataFrame): DataFrame = {
    val per = gc
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
    // All-constant groups (ssw = 0), one group (k = 1) or one row per
    // group (n = k) answer NaN instead of tripping ANSI DIVIDE_BY_ZERO
    // — the q279 discipline, mirrored in the oracle CASEs.
    tot
      .withColumn("ssb", col("a") - d("s") * d("s") / d("n"))
      .withColumn("ssw", d("q") - col("a"))
      .withColumn("fden",
        when(col("k") === 1L || col("n") === col("k"), lit(Double.NaN))
          .otherwise(col("ssw") / (d("n") - d("k"))))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round(when(isnan(col("fden")) || col("fden") === 0.0,
            lit(Double.NaN))
          .otherwise(col("ssb") / (d("k") - lit(1.0)) / col("fden")), 6)
          .as("f_stat"),
        round(when(col("ssb") + col("ssw") === 0.0, lit(Double.NaN))
          .otherwise(col("ssb") / (col("ssb") + col("ssw"))), 6)
          .as("eta_sq"))
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
  /** Shared two-group value-histogram builder (q271/q289/q290/q294):
    * one conditional aggregation of the fact table into ≤ |domain|
    * rows of `(v, na, t)` — group A's count and the pooled count per
    * distinct value. Everything downstream of it is histogram-bounded.
    */
  private[graft] def twoGroupHist(df: DataFrame, groupCol: String,
      valueCol: Column, groupA: String, groupB: String): DataFrame =
    df.select(col(groupCol).as("g"), valueCol.cast("long").as("v"))
      .filter(col("g").isin(groupA, groupB))
      .groupBy(col("v"))
      .agg(sum(when(col("g") === groupA, lit(1L)).otherwise(lit(0L)))
          .as("na"),
        count(lit(1)).as("t"))

  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, col(valueCol), groupA, groupB)
    // midranks over the value histogram: bounded by |distinct values|
    // (PlanSpec-enrolled with that argument)
    val rankW = Window.orderBy(col("v"))
    val ranked = h.withColumn("cumb",
      coalesce(sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val ag = ranked.agg(
      sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"),
      // Σ na·(2·midrank) — exact; midrank×2 = 2·cumBefore + t + 1.
      // The per-row product na·(2·midrank) is ~2N·n1 and the t³ tie
      // term cubes a tie count — both clear 2⁶³ near 100 TB row
      // counts, so the file's DECIMAL(38,0) accumulator discipline
      // applies from the first multiply (DuckDB's side widens to
      // HUGEINT automatically; values are identical integers).
      sum(dec(col("na")) * (lit(2L) * col("cumb") + col("t") + lit(1L)))
        .as("r1x2"),
      sum(dec(col("t")) * col("t") * col("t") - dec(col("t")))
        .as("ties"))
    def d(name: String): Column = col(name).cast("double")
    ag
      .withColumn("u1x2",
        col("r1x2") - dec(col("n1")) * (col("n1") + lit(1L)))
      .withColumn("nn", d("n1") + d("n2"))
      .withColumn("sig2",
        // nn <= 1: the tie-correction divisor nn(nn-1) is 0 — ANSI
        // divide-by-zero; a 1-row pooled input answers NaN, not an error
        when(col("nn") <= 1.0, lit(Double.NaN)).otherwise(
          d("n1") * d("n2") / lit(12.0) *
            ((col("nn") + lit(1.0)) -
              d("ties") / (col("nn") * (col("nn") - lit(1.0))))))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(d("u1x2") / lit(2.0), 2).as("u_a"),
        // sig2 = 0 (all pooled values tied) or NaN (nn <= 1): answer NaN
        // instead of an ANSI zero-divide — the lepageVerdict zw guard
        round(when(col("sig2") <= 0.0 || isnan(col("sig2")),
            lit(Double.NaN))
          .otherwise((d("u1x2") / lit(2.0) -
            d("n1") * d("n2") / lit(2.0)) / sqrt(col("sig2"))),
          6).as("z_score"))
  }

  /** Q288: BROWN–FORSYTHE VARIANCE-EQUALITY TEST — Levene's test with
    * the median center: do the groups merely differ in LEVEL (what
    * q270 tests) or also in SPREAD? The one-way F applied to absolute
    * deviations from each group's median — the robust variant that
    * survives the heavy tails q287 diagnoses. Group medians are exact
    * `percentile_disc` elements (actual cents values, identical
    * selection in both engines — the q263 precedent), broadcast back
    * onto the facts; the deviations are exact LONGs, and the F
    * machinery is [[anovaF]]'s core verbatim.
    */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      round(lit(100.0) * col(valueCol)).cast("long").as("c"))
    val med = base.groupBy(col("g"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .as("med"))
    anovaFCore(base.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("c") - col("med")).as("c")))
  }

  /** Q282: KRUSKAL–WALLIS H across all groups of a bounded-domain
    * measure — the k-group generalization of q271 (the nonparametric
    * ANOVA): did ANY group shift the distribution, judged on ranks.
    * Midranks on the ×2 grid from the value histogram (one
    * PlanSpec-enrolled window over ≤|domain| rows); per-group rank
    * sums are exact BIGINTs; the only non-integer reduction,
    * Σ R_g²/n_g, folds over the sorted k-element group list (the q270
    * device). Both the raw H and the tie-corrected H ride one mirrored
    * expression each.
    */
  def kruskalWallisH(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val joint = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val h = joint.groupBy(col("v")).agg(sum(col("c")).as("t"))
    val rankW = Window.orderBy(col("v"))
    val ranked = h.withColumn("cumb",
      coalesce(sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("v"),
        (lit(2L) * col("cumb") + col("t") + lit(1L)).as("r2"))
    // per-row products c·(2·midrank) ≈ 2N·n_g and the t³ tie cubes
    // clear 2⁶³ near 100 TB row counts — DECIMAL(38,0) from the first
    // multiply (the q271 discipline; DuckDB widens to HUGEINT)
    val per = joint.join(ranked, Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("ng"),
        sum(dec(col("c")) * col("r2")).as("r2g"))
    val ties = h.agg(
      sum(dec(col("t")) * col("t") * col("t") - dec(col("t")))
        .as("tiesum"))
    def d(name: String): Column = col(name).cast("double")
    val ag = per.agg(
      count(lit(1)).as("k"),
      sum(col("ng")).as("n"),
      // Σ (R_g)²/n_g with R_g = r2g/2, folded in sorted group order
      aggregate(array_sort(collect_list(struct(col("g"),
          (col("r2g").cast("double") / lit(2.0) *
            (col("r2g").cast("double") / lit(2.0)) /
            col("ng").cast("double")).as("term")))),
        lit(0.0), (acc, x) => acc + x.getField("term")).as("a"))
    ag.crossJoin(broadcast(ties))
      .withColumn("hraw",
        lit(12.0) / (d("n") * (d("n") + lit(1.0))) * col("a") -
          lit(3.0) * (d("n") + lit(1.0)))
      // all-tied data (tiesum = n³−n) zeroes the correction factor, a
      // single row zeroes its denominator — NaN, not ANSI
      // DIVIDE_BY_ZERO (q279 discipline, oracle-mirrored)
      .withColumn("tden", when(col("n") === 1L, lit(Double.NaN))
        .otherwise(lit(1.0) - d("tiesum") /
          (d("n") * d("n") * d("n") - d("n"))))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round(col("hraw"), 6).as("h_stat"),
        round(when(isnan(col("tden")) || col("tden") === 0.0,
            lit(Double.NaN))
          .otherwise(col("hraw") / col("tden")), 6)
          .as("h_tie_corrected"))
  }

  /** Q273: SPEARMAN RANK CORRELATION between two bounded-domain
    * measures — monotone association robust to the value scales (the
    * "does discount actually track quantity?" audit). Tie-aware
    * midranks for each variable come from its MARGINAL histogram
    * (≤ |domain| rows each) on the ×2 integer grid; the correlation's
    * moment sums run over the JOINT histogram (≤ |A|·|B| cells) with
    * exact per-cell LONG products in DECIMAL(38,0) accumulators — the
    * ×2 grid factors cancel in ρ. Pearson r over the raw grid values
    * rides along from the same exact joint-cell moments. One fact
    * scan into the joint histogram; everything downstream is
    * domain-bounded.
    */
  def spearmanRho(df: DataFrame, xCol: Column, yCol: Column)
      : DataFrame = {
    val joint = df.select(xCol.as("dc"), yCol.as("q"))
      .groupBy(col("dc"), col("q")).agg(count(lit(1)).as("c"))
    val tot = joint.agg(sum(col("c")).as("n"))
    // marginal midranks, ×2 grid: 2·midrank = 2·cumBefore + t + 1
    val dRankW = Window.orderBy(col("dc"))
    val md = joint.groupBy(col("dc")).agg(sum(col("c")).as("td"))
      .withColumn("cumb", coalesce(sum(col("td")).over(
        dRankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("dc"),
        (lit(2L) * col("cumb") + col("td") + lit(1L)).as("r2d"))
    val qRankW = Window.orderBy(col("q"))
    val mq = joint.groupBy(col("q")).agg(sum(col("c")).as("tq"))
      .withColumn("cumb", coalesce(sum(col("tq")).over(
        qRankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("q"),
        (lit(2L) * col("cumb") + col("tq") + lit(1L)).as("r2q"))
    val cells = joint.join(md, Seq("dc")).join(mq, Seq("q"))
      .crossJoin(broadcast(tot))
      .withColumn("devd", col("r2d") - (col("n") + lit(1L)))
      .withColumn("devq", col("r2q") - (col("n") + lit(1L)))
    val ag = cells.agg(
      max(col("n")).as("n"),
      sum(dec(col("c") * col("devd") * col("devq"))).as("sxy"),
      sum(dec(col("c") * col("devd") * col("devd"))).as("sxx"),
      sum(dec(col("c") * col("devq") * col("devq"))).as("syy"),
      // raw-value Pearson moments from the same joint cells
      sum(dec(col("c") * col("dc"))).as("px"),
      sum(dec(col("c") * col("q"))).as("py"),
      sum(dec(col("c") * col("dc") * col("q"))).as("pxy"),
      sum(dec(col("c") * col("dc") * col("dc"))).as("pxx"),
      sum(dec(col("c") * col("q") * col("q"))).as("pyy"))
    def d(name: String): Column = col(name).cast("double")
    ag.select(col("n"),
      round(d("sxy") / (sqrt(d("sxx")) * sqrt(d("syy"))), 6)
        .as("spearman_rho"),
      round((d("n") * d("pxy") - d("px") * d("py")) /
        (sqrt(d("n") * d("pxx") - d("px") * d("px")) *
          sqrt(d("n") * d("pyy") - d("py") * d("py"))), 6)
        .as("pearson_r"))
  }

  /** Q274: KENDALL'S τ-b between two bounded-domain measures — the
    * pair-concordance view of q273's question, tie-corrected. The
    * classic definition is over all N² row pairs; here concordant/
    * discordant counts come from the DENSE VALUE GRID (each observed x
    * level × the declared y domain, built with the explode-sequence
    * device — no row pairs, no cartesian): with the 2-D prefix sum
    * F(x,y) = #points strictly below in both and
    * G(x,y) = #points with x'<x, y'>y, nc = Σ c·F and nd = Σ c·G count
    * each unordered pair exactly once at its greater-x cell. All
    * counts exact LONGs (DECIMAL(38,0) sums); τ-b is one mirrored
    * double expression over five exact scalars. The grid windows are
    * PARTITIONED (by x level / y level) — nothing unbounded anywhere.
    */
  def kendallTauB(df: DataFrame, xCol: Column, yCol: Column,
      yMin: Long, yMax: Long): DataFrame = {
    require(yMin <= yMax && yMax - yMin <= 100000,
      s"y domain out of range: [$yMin, $yMax]")
    // The dense grid spans only the DECLARED y domain: an out-of-domain
    // y would silently vanish from nc/nd while still counting in n and
    // the tie terms, skewing τ-b. Fail loudly IN-PLAN instead — the
    // check rides the bounded joint histogram (≤ |A|·|B| rows), no
    // extra scan or driver action.
    val joint = df.select(xCol.as("dc"), yCol.as("q"))
      .groupBy(col("dc"), col("q")).agg(count(lit(1)).as("c"))
      .withColumn("q",
        when(col("q").between(yMin, yMax), col("q"))
          .otherwise(raise_error(concat(
            lit(s"kendallTauB: observed y outside declared domain " +
              s"[$yMin, $yMax]: "),
            col("q").cast("string")))))
    // dense grid: observed x levels × the declared y domain
    val grid = joint.select(col("dc")).distinct()
      .select(col("dc"),
        explode(sequence(lit(yMin), lit(yMax))).as("q"))
    val c0 = grid.join(joint, Seq("dc", "q"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wqLt = Window.partitionBy(col("dc")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRow = Window.partitionBy(col("dc"))
    val pre = c0
      .withColumn("cumQlt", coalesce(sum(col("c")).over(wqLt), lit(0L)))
      .withColumn("rowTot", sum(col("c")).over(wRow))
    val wdLt = Window.partitionBy(col("q")).orderBy(col("dc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fg = pre
      .withColumn("f", coalesce(sum(col("cumQlt")).over(wdLt), lit(0L)))
      .withColumn("g", coalesce(sum(col("rowTot") - col("cumQlt") -
        col("c")).over(wdLt), lit(0L)))
    val pairAg = fg.agg(
      sum(dec(col("c") * col("f"))).as("ncd"),
      sum(dec(col("c") * col("g"))).as("ndd"))
    // tie terms from the marginals, ×2 grid: Σ t·(t−1)
    val t1 = joint.groupBy(col("dc")).agg(sum(col("c")).as("t"))
      .agg(sum(dec(col("t") * (col("t") - lit(1L)))).as("n1x2"),
        sum(dec(col("t"))).as("n"))
    val t2 = joint.groupBy(col("q")).agg(sum(col("c")).as("t"))
      .agg(sum(dec(col("t") * (col("t") - lit(1L)))).as("n2x2"))
    def d(name: String): Column = col(name).cast("double")
    pairAg.crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .withColumn("n0x2",
        d("n") * (d("n") - lit(1.0)))
      // all-x-tied or all-y-tied data zeroes a marginal factor —
      // NaN, not ANSI DIVIDE_BY_ZERO (q279 discipline)
      .withColumn("tden",
        sqrt((col("n0x2") - d("n1x2")) / lit(2.0)) *
          sqrt((col("n0x2") - d("n2x2")) / lit(2.0)))
      .select(col("n").cast("long").as("n"),
        col("ncd").cast("long").as("n_concordant"),
        col("ndd").cast("long").as("n_discordant"),
        round(when(col("tden") === 0.0, lit(Double.NaN))
          .otherwise((d("ncd") - d("ndd")) / col("tden")), 6)
          .as("tau_b"))
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
      : DataFrame =
    contingencyVerdict(df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o")))

  /** The verdict stage of [[contingencyStats]] over an already-built
    * `(a, b, o)` cell table — separated so the streaming dual
    * ([[graft.streaming.StreamingStats.contingencyCellsStream]]) can
    * maintain the cells incrementally and run the same verdict per
    * micro-batch.
    */
  def contingencyVerdict(cells: DataFrame): DataFrame = {
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"))
    def d(c: Column): Column = c.cast("double")
    val terms = cells.join(rt, Seq("a")).join(ct, Seq("b"))
      .crossJoin(broadcast(tot))
      // dev = o·N − rt·ct: rt·ct ≤ N² clears 2⁶³ once N passes ~3e9,
      // so the products go straight to DECIMAL(38,0) (exact; the
      // double casts below are identical either way at bench scale)
      .withColumn("dev",
        dec(col("o")) * col("n") - dec(col("rt")) * col("ct"))
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

  /** Q289: TWO-SAMPLE KOLMOGOROV–SMIRNOV over a bounded-domain
    * measure — the maximum ECDF gap, the distribution-level "did the
    * two cohorts shift at all?" test that sees what mean tests (q269)
    * and rank-location tests (q271) both miss. D·n1·n2 is the exact
    * integer |cumA·n2 − cumB·n1| at each histogram point (DECIMAL
    * products — cum·n clears 2⁶³ at 100 TB row counts), so the argmax
    * and its location are exact; the only float is one mirrored
    * divide. The cumulative windows run over the VALUE HISTOGRAM.
    * Verdict stage split from the histogram build (the q272
    * contingencyVerdict pattern) so the streaming dual
    * ([[graft.streaming.StreamingStats.twoGroupCellsStream]]) can
    * maintain `(v, na, t)` incrementally and fold the same verdict
    * per micro-batch.
    */
  def ksVerdict(cells: DataFrame): DataFrame = {
    val rankW = Window.orderBy(col("v"))
    val tot = cells.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    cells
      .withColumn("ca", sum(col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cb", sum(col("t") - col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(dec(col("ca")) * col("n2") - dec(col("cb")) * col("n1")))
      .orderBy(col("gap").desc, col("v"))
      .limit(1)
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise(col("gap").cast("double") / (d("n1") * d("n2"))),
          6).as("d_stat"),
        col("v").as("d_location"))
  }

  def ks2Sample(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame =
    ksVerdict(twoGroupHist(df, groupCol, valueCol, groupA, groupB))

  /** Q290: TWO-SAMPLE CRAMÉR–VON MISES over a bounded-domain measure —
    * the INTEGRATED ECDF gap, the companion of q289's max gap: KS
    * sees one large local shift, CvM accumulates many small ones.
    * T = n1·n2/N² · Σ_v t_v·(F1(v)−F2(v))², with each cell's
    * t·Δ² term computed from exact cumulative counts as one mirrored
    * double expression, gridded to integer 10⁻⁹ units (the q272
    * per-cell discipline) so the histogram aggregation is exact in
    * any order; the final scalar is one mirrored expression.
    */
  def cramerVonMises(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
    val rankW = Window.orderBy(col("v"))
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("ca", sum(col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cb", sum(col("t") - col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("wg",
        when(col("n1") === 0L || col("n2") === 0L, lit(0L))
          .otherwise(round(
            (d("ca") / d("n1") - d("cb") / d("n2")) *
              (d("ca") / d("n1") - d("cb") / d("n2")) *
              col("t").cast("double") * lit(1.0e9)).cast("long")))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(dec(col("wg"))).as("wsum"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise(col("wsum").cast("double") / lit(1.0e9) *
            d("n1") * d("n2") /
            ((d("n1") + d("n2")) * (d("n1") + d("n2")))), 6)
          .as("cvm_t"))
  }

  /** Q294: CLIFF'S DELTA + COMMON-LANGUAGE EFFECT SIZE between two
    * groups of a bounded-domain measure — the EFFECT-SIZE companion
    * of q271's significance: δ = (#(a>b) − #(a<b))/(n1·n2) and
    * CLES = (#(a>b) + ½#(a=b))/(n1·n2), both from the value histogram
    * with exact DECIMAL pair counts (na·cumBelow products — no row
    * pairs ever form; the ×2 device keeps the half exact). One
    * aggregation over ≤ |domain| rows; two mirrored divides.
    */
  def cliffsDelta(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
    val rankW = Window.orderBy(col("v"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("cbLt", coalesce(sum(col("t") - col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .agg(
        sum(col("na")).as("n1"),
        sum(col("t") - col("na")).as("n2"),
        sum(dec(col("na")) * col("cbLt")).as("gt"),
        sum(dec(col("na")) * (col("t") - col("na"))).as("eq"))
      // lt = n1·n2 − gt − eq (every A×B pair is >, < or =)
      .withColumn("lt",
        dec(col("n1")) * col("n2") - col("gt") - col("eq"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise((col("gt").cast("double") -
            col("lt").cast("double")) / (d("n1") * d("n2"))), 6)
          .as("cliffs_delta"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise((lit(2.0) * col("gt").cast("double") +
            col("eq").cast("double")) /
            (lit(2.0) * d("n1") * d("n2"))), 6)
          .as("cles"))
  }

  /** Q291: 1-D WASSERSTEIN (earth-mover) DISTANCE between two cohorts'
    * value distributions — the drift metric that, unlike KL/JS
    * (q247/q249), respects the METRIC on the value line: mass moved ×
    * distance moved. For discrete values,
    * W1 = Σ_v (next(v)−v)·|F1(v)−F2(v)|, and each term's numerator
    * gap·|cumA·n2 − cumB·n1| is an exact integer (DECIMAL products),
    * so the sum is exact and the only float is one mirrored divide by
    * n1·n2. `cohortA` is any boolean split of the rows; the histogram
    * and its windows are value-bounded.
    */
  def wasserstein1(df: DataFrame, cohortA: Column, valueCol: Column)
      : DataFrame = {
    val h = df.select(cohortA.as("ia"), valueCol.cast("long").as("v"))
      .groupBy(col("v"))
      .agg(sum(when(col("ia"), lit(1L)).otherwise(lit(0L))).as("na"),
        count(lit(1)).as("t"))
    val rankW = Window.orderBy(col("v"))
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("ca", sum(col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cb", sum(col("t") - col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("gap",
        coalesce(lead(col("v"), 1).over(rankW) - col("v"), lit(0L)))
      .crossJoin(broadcast(tot))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("gap") *
          abs(dec(col("ca")) * col("n2") - dec(col("cb")) * col("n1")))
          .as("wx"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise(col("wx").cast("double") / (d("n1") * d("n2"))),
          6).as("w1"))
  }

  /** Q300: HODGES–LEHMANN SHIFT ESTIMATOR between two groups of a
    * bounded-domain measure — the location-shift companion of q294's
    * δ: the median of all n1·n2 pairwise differences a − b, the
    * robust "how MUCH did the distribution move" scalar (q269's mean
    * difference without its outlier exposure). No row pairs ever
    * form: the difference distribution lives on the |A|·|B|-cell
    * product of the two value HISTOGRAMS with exact DECIMAL weights
    * na·nb; the weighted lower median (smallest d with
    * 2·cumW ≥ T+1 — the ×2 device keeps the half exact) comes from
    * one cumulative window over the difference histogram.
    */
  def hodgesLehmannShift(df: DataFrame, groupCol: String,
      valueCol: Column, groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
    val histA = h.filter(col("na") > 0L)
      .select(col("v").as("a"), col("na"))
    val histB = h.filter(col("t") - col("na") > 0L)
      .select(col("v").as("b"), (col("t") - col("na")).as("nb"))
    val diffs = histA.crossJoin(broadcast(histB))
      .groupBy((col("a") - col("b")).as("d"))
      .agg(sum(dec(col("na")) * col("nb")).as("w"))
    val tot = diffs.agg(sum(col("w")).as("tw"))
    val dW = Window.orderBy(col("d"))
    diffs
      .withColumn("cw", sum(col("w")).over(
        dW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .filter(lit(2L) * col("cw") >= col("tw") + lit(1L))
      .orderBy(col("d"))
      .limit(1)
      .select(col("tw").cast("long").as("n_pairs"),
        col("d").as("hl_shift"))
  }

  /** Q302: PER-SOURCE KS DRIFT AUDIT — q289's test run for EVERY
    * source against the rest of the corpus in one pass: which shards
    * drifted, by how much, and where on the value line. The
    * per-source ECDFs live on the DENSE source × pooled-value grid
    * (the q274 grid device — a source's ECDF must be evaluated at
    * values it never emitted), cumulative windows are PARTITIONED by
    * source, and each source's max gap is the exact integer
    * |cum_s·(N−n_s) − cum_rest·n_s| (DECIMAL products). One row per
    * source; ties in the gap break to the smallest value.
    */
  def sourceKsDrift(df: DataFrame, sourceCol: Column, valueCol: Column)
      : DataFrame = {
    val base = df.select(sourceCol.as("src"),
      valueCol.cast("long").as("v"))
    val cells = base.groupBy(col("src"), col("v"))
      .agg(count(lit(1)).as("c"))
    val pooled = cells.groupBy(col("v")).agg(sum(col("c")).as("t"))
    val tot = pooled.agg(sum(col("t")).as("nn"))
    val perSrc = cells.groupBy(col("src")).agg(sum(col("c")).as("ns"))
    val grid = cells.select(col("src")).distinct()
      .crossJoin(broadcast(pooled.select(col("v"))))
    val sW = Window.partitionBy(col("src")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankW = Window.orderBy(col("v"))
    val pooledCum = pooled.withColumn("ct", sum(col("t")).over(
      rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("v"), col("ct"))
    val gaps = grid
      .join(cells, Seq("src", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cs", sum(col("c")).over(sW))
      .join(broadcast(pooledCum), Seq("v"))
      .join(broadcast(perSrc), Seq("src"))
      .crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(dec(col("cs")) * (col("nn") - col("ns")) -
          dec(col("ct") - col("cs")) * col("ns")))
    val pick = Window.partitionBy(col("src"))
      .orderBy(col("gap").desc, col("v"))
    def d(name: String): Column = col(name).cast("double")
    gaps
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("src").as("source"), col("ns").as("n_source"),
        round(when(col("ns") === col("nn"), lit(Double.NaN))
          .otherwise(col("gap").cast("double") /
            (d("ns") * (d("nn") - d("ns")))), 6).as("d_stat"),
        col("v").as("d_location"))
  }

  /** Q303: QUANTILE SHIFT FUNCTION between two groups — the per-decile
    * view of q300's single shift scalar: WHERE on the distribution did
    * the cohorts move (tails vs body — a mean/median shift can hide a
    * pure tail change). Each group's decile is the exact
    * percentile_disc element (smallest v with 10·cum ≥ d·n — pure
    * integer compares, no float quantile arithmetic anywhere); one
    * cumulative window over the shared value histogram serves all
    * nine deciles of both groups.
    */
  def quantileShift(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
    val rankW = Window.orderBy(col("v"))
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    h
      .withColumn("ca", sum(col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cb", sum(col("t") - col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("ca"), col("cb"), col("n1"), col("n2"),
        explode(sequence(lit(1L), lit(9L))).as("decile"))
      .groupBy(col("decile"))
      .agg(
        min(when(lit(10L) * col("ca") >= col("decile") * col("n1"),
          col("v"))).as("q_a"),
        min(when(lit(10L) * col("cb") >= col("decile") * col("n2"),
          col("v"))).as("q_b"))
      .select(col("decile"), col("q_a"), col("q_b"),
        (col("q_a") - col("q_b")).as("shift"))
  }

  /** Q304: ENERGY DISTANCE between two groups of a bounded-domain
    * measure — the metric-aware two-sample statistic (Székely &
    * Rizzo 2004): E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, zero iff the
    * distributions coincide, and sensitive to shifts q289's max-gap
    * can dilute. All three expectations come from ONE |domain|² pair
    * table of the value histogram crossed with itself — exact
    * DECIMAL count·count·distance products, three mirrored divides.
    */
  def energyDistance(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
      .select(col("v"), col("na"), (col("t") - col("na")).as("nb"))
    val h2 = h.select(col("v").as("v2"), col("na").as("na2"),
      col("nb").as("nb2"))
    val tot = h.agg(sum(col("na")).as("n1"), sum(col("nb")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    h.crossJoin(broadcast(h2))
      .withColumn("ad", abs(col("v") - col("v2")))
      .agg(
        sum(dec(col("na")) * col("nb2") * col("ad")).as("exy"),
        sum(dec(col("na")) * col("na2") * col("ad")).as("exx"),
        sum(dec(col("nb")) * col("nb2") * col("ad")).as("eyy"))
      .crossJoin(broadcast(tot))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise(lit(2.0) * col("exy").cast("double") /
              (d("n1") * d("n2")) -
            col("exx").cast("double") / (d("n1") * d("n1")) -
            col("eyy").cast("double") / (d("n2") * d("n2"))), 6)
          .as("energy_dist"))
  }

  /** Q305: KUIPER TWO-SAMPLE TEST — q289's KS with the max gap taken
    * in BOTH directions and summed (V = D⁺ + D⁻), equally sensitive
    * across the whole value line where KS favors the median region
    * (the circular-data / tail-shift companion). Same exact integer
    * gap arithmetic as q289; one aggregation over the cumulative
    * histogram.
    */
  def kuiper2Sample(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
    val rankW = Window.orderBy(col("v"))
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("ca", sum(col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cb", sum(col("t") - col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(dec(col("ca")) * col("n2") - dec(col("cb")) * col("n1"))
          .as("dplus"),
        max(dec(col("cb")) * col("n1") - dec(col("ca")) * col("n2"))
          .as("dminus"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise((col("dplus").cast("double") +
            col("dminus").cast("double")) / (d("n1") * d("n2"))), 6)
          .as("v_stat"))
  }

  /** Q308: MOOD'S MEDIAN TEST between two groups — the blunt-but-
    * robust location test (how many of each group sit above the
    * POOLED median?): a 2×2 χ² over exact counts, valid under heavy
    * tails and gross outliers where rank machinery (q271) still
    * assumes comparable shapes. The pooled median is an exact
    * `percentile_disc` element found by integer compares on the
    * cumulative histogram (2·cum ≥ N+1); the χ² is one mirrored
    * expression, NaN on degenerate marginals.
    */
  def moodsMedianTest(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
    val rankW = Window.orderBy(col("v"))
    val cum = h.withColumn("ct", sum(col("t")).over(
      rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    // pooled lower median: smallest v with 2·cum ≥ N+1
    val med = cum.crossJoin(broadcast(tot))
      .filter(lit(2L) * col("ct") >= col("n1") + col("n2") + lit(1L))
      .orderBy(col("v")).limit(1).select(col("v").as("med"))
    def d(name: String): Column = col(name).cast("double")
    h.crossJoin(broadcast(med))
      .agg(
        sum(when(col("v") > col("med"), col("na")).otherwise(lit(0L)))
          .as("a1"),
        sum(when(col("v") > col("med"), col("t") - col("na"))
          .otherwise(lit(0L))).as("b1"),
        sum(col("na")).as("n1"),
        sum(col("t") - col("na")).as("n2"))
      .withColumn("a0", col("n1") - col("a1"))
      .withColumn("b0", col("n2") - col("b1"))
      // den in DOUBLE: the four-marginal product clears DECIMAL(38)
      // near (N/2)⁴ at 100-TB row counts; the χ² is a float anyway
      .withColumn("den",
        d("n1") * d("n2") * (d("a1") + d("b1")) * (d("a0") + d("b0")))
      .withColumn("dev",
        (dec(col("a1")) * col("b0") - dec(col("a0")) * col("b1"))
          .cast("double"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        col("a1").as("n_above_a"), col("b1").as("n_above_b"),
        round(when(col("den") === 0.0, lit(Double.NaN))
          .otherwise((d("n1") + d("n2")) * col("dev") * col("dev") /
            col("den")), 6).as("chi2"))
  }

  /** Q309: ANSARI–BRADLEY SCALE TEST between two groups — does one
    * cohort SPREAD wider around the common center (the rank-based
    * companion of q288's Brown–Forsythe, assumption-free about
    * moments)? Scores fold the midranks inward
    * (s = min(r, N+1−r), ×2 grid — extremes score low, the center
    * high), AB = Σ_A s; the tie-conditional moments
    * E = n1·Σts/N and Var = n1n2(N·Σts² − (Σts)²)/(N²(N−1)) come
    * from two more exact histogram sums, and z is one mirrored
    * expression (NaN when Var = 0 — a single distinct value).
    *
    * TIE VARIANT (documented deviation, ADVICE r16): ties score as the
    * FOLDED MIDRANK, s = min(r̄, N+1−r̄). For a tie block entirely on
    * one side of the center this equals the classical
    * average-of-folded-ranks; for a block STRADDLING the center the two
    * differ (N=4 with ranks 2,3 tied: folded midrank 2.5 vs classical
    * 2). The folded-midrank scores stay on the exact ×2 integer grid —
    * one DECIMAL(38,0) grid for AB and both moments, so every engine
    * sums identical integers in any order — whereas classical
    * tie-averaged scores carry per-block denominators 2t with no common
    * grid across blocks, forcing order-sensitive double sums. Statistic
    * and moments use the SAME folded-midrank scores (internally
    * consistent), and the oracle mirrors them; only center-straddling
    * tie blocks deviate from the scipy/classical statistic.
    */
  def ansariBradley(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val h = twoGroupHist(df, groupCol, valueCol, groupA, groupB)
    val rankW = Window.orderBy(col("v"))
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("cumb", coalesce(sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("r2",
        lit(2L) * col("cumb") + col("t") + lit(1L))
      .crossJoin(broadcast(tot))
      .withColumn("s2", least(col("r2"),
        lit(2L) * (col("n1") + col("n2") + lit(1L)) - col("r2")))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(dec(col("na")) * col("s2")).as("ab2"),
        sum(dec(col("t")) * col("s2")).as("ts1"),
        sum(dec(col("t")) * col("s2") * col("s2")).as("ts2"))
      .withColumn("nn", d("n1") + d("n2"))
      // AB = ab2/2, E = n1·ts1/(2N), Var = n1n2(N·ts2 − ts1²)/(4N²(N−1))
      .withColumn("varx4",
        when(col("nn") === 1.0, lit(Double.NaN)).otherwise(
          d("n1") * d("n2") *
            (col("nn") * d("ts2") - d("ts1") * d("ts1")) /
            (col("nn") * col("nn") * (col("nn") - lit(1.0)))))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(d("ab2") / lit(2.0), 2).as("ab_stat"),
        round(when(col("varx4") === 0.0 || isnan(col("varx4")),
            lit(Double.NaN))
          .otherwise((d("ab2") - d("n1") * d("ts1") / col("nn")) /
            sqrt(col("varx4"))), 6).as("z_score"))
  }

  /** Q295: DECISION-STUMP SPLIT FINDER — the best single threshold on
    * a bounded-domain feature for predicting a bounded categorical
    * label, by weighted Gini impurity (the one-node CART step a
    * feature-importance audit runs per column). Per-class cumulative
    * counts from ONE histogram pass; each candidate threshold's
    * impurity is a mirrored double expression over exact integers,
    * gridded to 10⁻¹² for the exact argmin (ties → smallest
    * threshold). Rows with labels outside `labels` are excluded (the
    * caller declares the domain, as q274 declares its y domain).
    */
  def giniStump(df: DataFrame, labelCol: String, valueCol: Column,
      labels: Seq[String]): DataFrame = {
    require(labels.nonEmpty && labels.size <= 16,
      s"label domain out of range: ${labels.size}")
    val cnts = labels.zipWithIndex.map { case (l, i) =>
      sum(when(col("y") === l, lit(1L)).otherwise(lit(0L))).as(s"c$i") }
    val h = df.select(col(labelCol).as("y"), valueCol.cast("long").as("v"))
      .filter(col("y").isin(labels: _*))
      .groupBy(col("v"))
      .agg(cnts.head, cnts.tail :+ count(lit(1)).as("t"): _*)
    val rankW = Window.orderBy(col("v"))
    val totAggs = labels.indices.map(i => sum(col(s"c$i")).as(s"t$i"))
    val tot = h.agg(totAggs.head, totAggs.tail :+
      sum(col("t")).as("n"): _*)
    def d(c: Column): Column = c.cast("double")
    def sq(c: Column): Column = d(c) * d(c)
    val cum = h.select(col("v") +: col("t") +:
      labels.indices.map(i => sum(col(s"c$i")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as(s"cc$i")): _*)
      .withColumn("nl", sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sL = labels.indices.map(i => sq(col(s"cc$i"))).reduce(_ + _)
    val sR = labels.indices.map(i =>
      sq(col(s"t$i") - col(s"cc$i"))).reduce(_ + _)
    val sP = labels.indices.map(i => sq(col(s"t$i"))).reduce(_ + _)
    cum.crossJoin(broadcast(tot))
      .filter(col("nl") < col("n")) // a full split is no split
      .withColumn("nr", col("n") - col("nl"))
      .withColumn("gini_g", round(
        ((d(col("nl")) - sL / d(col("nl"))) +
          (d(col("nr")) - sR / d(col("nr")))) / d(col("n")) *
          lit(1.0e12)).cast("long"))
      .orderBy(col("gini_g"), col("v"))
      .limit(1)
      .select(col("n").as("n_rows"), col("v").as("split_value"),
        round(col("gini_g").cast("double") / lit(1.0e12), 6)
          .as("gini_split"),
        round((d(col("n")) - sP / d(col("n"))) / d(col("n")), 6)
          .as("gini_parent"))
  }

  /** Q322: BARTLETT'S VARIANCE-EQUALITY TEST across k groups — the
    * parametric (normality-assuming) sibling of q288's Brown–Forsythe,
    * sharper when the data really are near-normal. Exact per-group
    * moments (n_i, Σc, Σc² in DECIMAL), then the three k-element
    * reductions the statistic needs — Σ(n_i−1)·ln(s_i²), Σ(n_i−1)·s_i²
    * and Σ 1/(n_i−1) — fold the SORTED group list (the q270 device:
    * both engines add identical IEEE doubles in identical order);
    * T = ((N−k)·ln(s_p²) − Σ(n_i−1)ln(s_i²))/C with the standard
    * Bartlett correction C. Any single-row or constant group makes the
    * statistic undefined — flagged in-plan and answered NaN, never an
    * ANSI error or a ±Inf fold.
    */
  def bartlett(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val c = round(lit(100.0) * col(valueCol)).cast("long")
    def d(name: String): Column = col(name).cast("double")
    val per = df.select(col(groupCol).as("g"), c.as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(dec(col("c"))).as("sg"),
        sum(dec(col("c")) * col("c")).as("qg"))
      .withColumn("v",
        when(col("ng") <= 1L, lit(Double.NaN)).otherwise(
          (d("qg") - d("sg") * d("sg") / d("ng")) /
            (d("ng") - lit(1.0))))
      .withColumn("bad",
        when(col("ng") <= 1L || col("v") <= 0.0, lit(1L))
          .otherwise(lit(0L)))
      // guarded per-group terms: a bad group contributes 0 to the
      // folds and flips the flag — the folds stay finite either way
      .withColumn("tln",
        when(col("bad") === 1L, lit(0.0)).otherwise(
          (d("ng") - lit(1.0)) * log(col("v"))))
      .withColumn("tv",
        when(col("bad") === 1L, lit(0.0)).otherwise(
          (d("ng") - lit(1.0)) * col("v")))
      .withColumn("tinv",
        when(col("bad") === 1L, lit(0.0)).otherwise(
          lit(1.0) / (d("ng") - lit(1.0))))
    def fold(field: String): Column =
      aggregate(array_sort(collect_list(struct(col("g"),
          col(field).as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t"))
    per.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        max(col("bad")).as("bad"),
        fold("tln").as("sln"), fold("tv").as("sv"),
        fold("tinv").as("sinv"))
      .withColumn("nk", d("n") - d("k"))
      .withColumn("sp2",
        when(col("nk") <= 0.0, lit(Double.NaN))
          .otherwise(col("sv") / col("nk")))
      .withColumn("cc",
        when(col("k") <= 1L || col("nk") <= 0.0, lit(Double.NaN))
          .otherwise(lit(1.0) +
            (col("sinv") - lit(1.0) / col("nk")) /
              (lit(3.0) * (d("k") - lit(1.0)))))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round(when(col("bad") === 1L || isnan(col("sp2")) ||
            col("sp2") <= 0.0 || isnan(col("cc")) || col("cc") === 0.0,
            lit(Double.NaN))
          .otherwise((col("nk") * log(col("sp2")) - col("sln")) /
            col("cc")), 6).as("bartlett_t"))
  }

  /** Q323: G-TEST OF INDEPENDENCE (log-likelihood ratio) over the same
    * contingency cells as q272's χ² — the statistic that dominates χ²
    * when expected counts are small. G = 2·Σ_{O>0} O·ln(O·N/(r_a·c_b))
    * needs only the OBSERVED cells (an empty cell's O·ln term is
    * exactly 0, unlike χ²'s empty-cell pricing), so one join of the
    * cell table to its margins covers everything; each cell's term is
    * one mirrored ln expression on the ×1e9 grid (the q272 per-cell
    * discipline — identical doubles → identical grid longs → order-free
    * DECIMAL sum). df = (|a|−1)(|b|−1) from exact distinct counts.
    */
  def gTest(df: DataFrame, aCol: Column, bCol: Column): DataFrame =
    gTestVerdict(df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o")))

  /** [[gTest]] from an `(a, b, o)` cell table — the cells-level entry
    * for the streaming dual
    * ([[graft.streaming.StreamingStats.contingencyCellsStream]]
    * maintains exactly these cells).
    */
  def gTestVerdict(cells: DataFrame): DataFrame = {
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("ka"),
      countDistinct(col("b")).as("kb"))
    def d(c: Column): Column = c.cast("double")
    cells.join(rt, Seq("a")).join(ct, Seq("b"))
      .crossJoin(broadcast(tot))
      .withColumn("g_g",
        round(d(col("o")) *
          log(d(col("o")) * d(col("n")) /
            (d(col("rt")) * d(col("ct")))) * lit(1.0e9)).cast("long"))
      .agg(max(col("n")).as("n"), max(col("ka")).as("ka"),
        max(col("kb")).as("kb"), sum(dec(col("g_g"))).as("gsum"))
      .select(col("n").as("n_rows"),
        ((col("ka") - lit(1L)) * (col("kb") - lit(1L))).as("df"),
        round(lit(2.0) * col("gsum").cast("double") / lit(1.0e9), 6)
          .as("g_stat"))
  }

  /** Q324: WELCH'S ANOVA (unequal-variance one-way F) across k groups
    * — q270's question under q269's assumption: did ANY group shift
    * the mean, WITHOUT pooling variances the groups don't share?
    * Per-group exact moments; the weighted reductions — Σw, Σw·m,
    * Σw·m² with w = n/s² and, once W̄ is known, Σ(1−w/W̄)²/(n−1) —
    * fold the SORTED group list (the q270 device, two k-element
    * passes because the second sum needs the first's total).
    * F_W = (Σwm² − (Σwm)²/Σw)/(k−1) / (1 + 2(k−2)/(k²−1)·S),
    * df2 = (k²−1)/(3S). Any single-row or constant group → in-plan
    * flag → NaN (the q322 discipline).
    */
  def welchAnova(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val c = round(lit(100.0) * col(valueCol)).cast("long")
    def d(name: String): Column = col(name).cast("double")
    val per = df.select(col(groupCol).as("g"), c.as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(dec(col("c"))).as("sg"),
        sum(dec(col("c")) * col("c")).as("qg"))
      .withColumn("v",
        when(col("ng") <= 1L, lit(Double.NaN)).otherwise(
          (d("qg") - d("sg") * d("sg") / d("ng")) /
            (d("ng") - lit(1.0))))
      .withColumn("bad",
        when(col("ng") <= 1L || col("v") <= 0.0, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("w",
        when(col("bad") === 1L, lit(0.0))
          .otherwise(d("ng") / col("v")))
      .withColumn("m",
        when(col("bad") === 1L, lit(0.0))
          .otherwise(d("sg") / d("ng")))
    def fold(expr: Column): Column =
      aggregate(array_sort(collect_list(struct(col("g"),
          expr.as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t"))
    val stage1 = per.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      max(col("bad")).as("badg"),
      fold(col("w")).as("sw"),
      fold(col("w") * col("m")).as("swm"),
      fold(col("w") * col("m") * col("m")).as("swm2"))
    per.crossJoin(broadcast(stage1))
      .agg(max(col("k")).as("k"), max(col("n")).as("n"),
        max(col("badg")).as("bad"), max(col("sw")).as("sw"),
        max(col("swm")).as("swm"), max(col("swm2")).as("swm2"),
        fold(when(col("bad") === 1L, lit(0.0)).otherwise(
          (lit(1.0) - col("w") / col("sw")) *
            (lit(1.0) - col("w") / col("sw")) /
            (d("ng") - lit(1.0)))).as("s3"))
      .withColumn("kd", d("k"))
      .withColumn("aa",
        when(col("k") <= 1L || col("sw") <= 0.0, lit(Double.NaN))
          .otherwise((col("swm2") - col("swm") * col("swm") /
            col("sw")) / (col("kd") - lit(1.0))))
      .withColumn("bb",
        when(col("k") <= 1L, lit(Double.NaN)).otherwise(
          lit(1.0) + lit(2.0) * (col("kd") - lit(2.0)) /
            (col("kd") * col("kd") - lit(1.0)) * col("s3")))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round(when(col("bad") === 1L || isnan(col("aa")) ||
            isnan(col("bb")) || col("bb") === 0.0, lit(Double.NaN))
          .otherwise(col("aa") / col("bb")), 6).as("f_welch"),
        round(when(col("bad") === 1L || col("k") <= 1L ||
            col("s3") <= 0.0, lit(Double.NaN))
          .otherwise((col("kd") * col("kd") - lit(1.0)) /
            (lit(3.0) * col("s3"))), 4).as("df2"))
  }

  /** Q325: TUKEY HSD PAIRWISE COMPARISONS — q270's post-hoc: WHICH
    * group pairs differ, via the studentized-range statistic
    * q = |m_i − m_j| / sqrt(MSE/2·(1/n_i + 1/n_j)) on the pooled
    * within-group MSE (the unequal-n Tukey–Kramer form). Per-group
    * exact moments, MSE from the q270 sums (SSW = Σq_g − Σs_g²/n_g
    * folded sorted), then the k(k−1)/2 pair rows from a self-join of
    * the k-row group frame — |groups|² pairs, never row pairs. NaN
    * when MSE degenerates.
    */
  def tukeyHsd(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val c = round(lit(100.0) * col(valueCol)).cast("long")
    def d(name: String): Column = col(name).cast("double")
    val per = df.select(col(groupCol).as("g"), c.as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(dec(col("c"))).as("sg"),
        sum(dec(col("c")) * col("c")).as("qg"))
      .withColumn("term", d("sg") * d("sg") / d("ng"))
    val tot = per.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("qg")).as("q"),
      aggregate(array_sort(collect_list(struct(col("g"),
          col("term").as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t")).as("a"))
      .withColumn("mse",
        when(col("n") <= col("k"), lit(Double.NaN)).otherwise(
          (col("q").cast("double") - col("a")) /
            (d("n") - d("k"))))
    val a = per.select(col("g").as("g_a"), col("ng").as("n_a"),
      col("sg").as("s_a"))
    val b = per.select(col("g").as("g_b"), col("ng").as("n_b"),
      col("sg").as("s_b"))
    a.crossJoin(b).filter(col("g_a") < col("g_b"))
      .crossJoin(broadcast(tot.select(col("mse"))))
      .withColumn("diff",
        col("s_a").cast("double") / col("n_a").cast("double") -
          col("s_b").cast("double") / col("n_b").cast("double"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        round(col("diff"), 4).as("mean_diff_cents"),
        round(when(isnan(col("mse")) || col("mse") <= 0.0,
            lit(Double.NaN))
          .otherwise(abs(col("diff")) /
            sqrt(col("mse") / lit(2.0) *
              (lit(1.0) / col("n_a").cast("double") +
                lit(1.0) / col("n_b").cast("double")))), 6)
          .as("q_stat"))
  }

  /** Q326: ODDS RATIO / RELATIVE RISK with Wald 95% CI over a paired
    * binary table — the EFFECT-SIZE companion of q316's McNemar and
    * q272's χ²: not "is there association" but HOW STRONG. The 2×2
    * cells from one aggregation; OR = ad/bc, RR = (a/(a+b))/(c/(c+d)),
    * CI bounds exp(ln OR ± 1.96·sqrt(1/a+1/b+1/c+1/d)) — all mirrored
    * ln/exp/sqrt expressions (the q231 parity budget). Any zero
    * marginal cell → NaN (the classical undefined case, not a
    * continuity fudge).
    */
  def oddsRatio(pairs: DataFrame, xCol: Column, yCol: Column)
      : DataFrame = {
    def d(name: String): Column = col(name).cast("double")
    pairs.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .agg(
        sum(when(col("x") === 1L && col("y") === 1L, lit(1L))
          .otherwise(lit(0L))).as("a"),
        sum(when(col("x") === 1L && col("y") === 0L, lit(1L))
          .otherwise(lit(0L))).as("b"),
        sum(when(col("x") === 0L && col("y") === 1L, lit(1L))
          .otherwise(lit(0L))).as("c"),
        sum(when(col("x") === 0L && col("y") === 0L, lit(1L))
          .otherwise(lit(0L))).as("dd"))
      .withColumn("ok",
        (col("a") > 0L) && (col("b") > 0L) && (col("c") > 0L) &&
          (col("dd") > 0L))
      .withColumn("lnor",
        when(!col("ok"), lit(Double.NaN)).otherwise(
          log(d("a") * d("dd") / (d("b") * d("c")))))
      .withColumn("se",
        when(!col("ok"), lit(Double.NaN)).otherwise(
          sqrt(lit(1.0) / d("a") + lit(1.0) / d("b") +
            lit(1.0) / d("c") + lit(1.0) / d("dd"))))
      .select(col("a").as("n_11"), col("b").as("n_10"),
        col("c").as("n_01"), col("dd").as("n_00"),
        round(when(!col("ok"), lit(Double.NaN))
          .otherwise(d("a") * d("dd") / (d("b") * d("c"))), 6)
          .as("odds_ratio"),
        round(when(!col("ok"), lit(Double.NaN))
          .otherwise((d("a") / (d("a") + d("b"))) /
            (d("c") / (d("c") + d("dd")))), 6).as("relative_risk"),
        round(exp(col("lnor") - lit(1.96) * col("se")), 6)
          .as("or_ci_lo"),
        round(exp(col("lnor") + lit(1.96) * col("se")), 6)
          .as("or_ci_hi"))
  }

  /** Q327: FRIEDMAN TEST over a blocks × treatments design — did any
    * treatment shift the outcome judged WITHIN each block (two-way
    * rank ANOVA; here: does order priority matter once day-of-week is
    * blocked out)? Cell values are per-(block, treatment) mean cents —
    * rationals s/n ranked within block by EXACT cross-multiplied
    * integer comparison (s_l·n_j vs s_j·n_l — never an IEEE-equal
    * tie), midranks on the ×2 grid from a |k|² within-block pair
    * join. χ²_F = 12/(bk(k+1))·ΣR_j² − 3b(k+1) over the k treatment
    * rank sums; everything after the one fact aggregation is
    * b·k²-bounded. NaN when k ≤ 1 or an incomplete design (a block
    * missing a treatment) — flagged, not silently mis-ranked.
    */
  /** The `(blk, trt, n, s)` per-cell reduction the whole Friedman
    * family reads — count and exact DECIMAL cent-sum per
    * (block, treatment) cell. A sum-monoid, so it is ALSO the state of
    * the streaming dual
    * [[graft.streaming.StreamingStats.blockCellsStream]]: snapshot the
    * streamed cells and feed [[friedmanVerdict]] / [[kendallWVerdict]]
    * / [[pageTrendVerdict]] (the lepageVerdict device; equivalence
    * pinned in StreamingBlockedSpec).
    */
  private[graft] def blockCells(df: DataFrame, blockCol: Column,
      treatCol: Column, valueCol: Column): DataFrame =
    df.select(blockCol.as("blk"), treatCol.as("trt"),
        round(lit(100.0) * valueCol).cast("long").as("c"))
      .groupBy(col("blk"), col("trt"))
      .agg(count(lit(1)).as("n"), sum(dec(col("c"))).as("s"))

  /** Shared Friedman/Kendall-W rank machinery: one row
    * `(b, k, ncells, sr2x4)` — block count, treatment count, cell
    * count (completeness check) and 4·ΣR_j² from the exact
    * cross-multiplied within-block midranks.
    */
  private def friedmanCore(df: DataFrame, blockCol: Column,
      treatCol: Column, valueCol: Column): DataFrame =
    friedmanCoreCells(blockCells(df, blockCol, treatCol, valueCol))

  /** [[friedmanCore]] from a `(blk, trt, n, s)` cell table — the
    * cells-level entry the streaming dual reads. */
  private[graft] def friedmanCoreCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.select(col("blk"), col("trt"), col("n"),
      dec(col("s")).as("s"))
    // exact within-block midranks: avg_l < avg_j <=> s_l·n_j < s_j·n_l
    // (n > 0); DECIMAL products — never compares IEEE doubles
    val ranked = cells.select(col("blk"), col("trt"), col("n"),
        col("s"))
      .join(cells.select(col("blk"), col("trt").as("trt2"),
        col("n").as("n2"), col("s").as("s2")), Seq("blk"))
      .groupBy(col("blk"), col("trt"))
      .agg(
        (lit(2L) * sum(when(col("s2") * col("n") <
            col("s") * col("n2"), lit(1L)).otherwise(lit(0L))) +
          sum(when(col("s2") * col("n") === col("s") * col("n2"),
            lit(1L)).otherwise(lit(0L))) + lit(1L)).as("r2"))
    val shape = cells.agg(
      countDistinct(col("blk")).as("b"),
      countDistinct(col("trt")).as("k"),
      count(lit(1)).as("ncells"))
    ranked.groupBy(col("trt"))
      .agg(sum(col("r2")).as("rj2"))
      .crossJoin(broadcast(shape))
  }

  /** The ΣR_j² reduction shared by [[friedman]] and [[kendallW]]. */
  private def friedmanSr2Cells(cells: DataFrame): DataFrame =
    friedmanCoreCells(cells)
      .groupBy(col("b"), col("k"), col("ncells"))
      .agg(sum(dec(col("rj2")) * col("rj2")).as("sr2x4"))

  def friedman(df: DataFrame, blockCol: Column, treatCol: Column,
      valueCol: Column): DataFrame =
    friedmanVerdict(blockCells(df, blockCol, treatCol, valueCol))

  /** [[friedman]] from a `(blk, trt, n, s)` cell table — the
    * cells-level entry the streaming dual reads
    * ([[graft.streaming.StreamingStats.blockCellsStream]];
    * equivalence pinned in StreamingBlockedSpec). */
  def friedmanVerdict(cells: DataFrame): DataFrame = {
    def d(c: Column): Column = c.cast("double")
    friedmanSr2Cells(cells)
      .select(col("b").as("n_blocks"), col("k").as("k_treatments"),
        round(when(col("k") <= 1L ||
            col("ncells") =!= col("b") * col("k"), lit(Double.NaN))
          .otherwise(lit(12.0) /
            (d(col("b")) * d(col("k")) * (d(col("k")) + lit(1.0))) *
            (col("sr2x4").cast("double") / lit(4.0)) -
            lit(3.0) * d(col("b")) * (d(col("k")) + lit(1.0))), 6)
          .as("chi2_f"))
  }

  /** Q335: KENDALL'S COEFFICIENT OF CONCORDANCE W — q327's effect
    * size: HOW STRONGLY do the blocks agree on the treatment ranking
    * (W = 1 perfect agreement, 0 none), where Friedman's χ² only says
    * "more than chance". Same exact within-block midrank machinery
    * ([[friedmanCore]]);
    * W = (12·ΣR_j² − 3b²k(k+1)²)/(b²k(k²−1)) in one mirrored
    * expression. NaN on k ≤ 1 or an incomplete design.
    */
  def kendallW(df: DataFrame, blockCol: Column, treatCol: Column,
      valueCol: Column): DataFrame =
    kendallWVerdict(blockCells(df, blockCol, treatCol, valueCol))

  /** [[kendallW]] from a `(blk, trt, n, s)` cell table (the
    * [[friedmanVerdict]] streaming-dual device). */
  def kendallWVerdict(cells: DataFrame): DataFrame = {
    def d(c: Column): Column = c.cast("double")
    friedmanSr2Cells(cells)
      .select(col("b").as("n_blocks"), col("k").as("k_treatments"),
        round(when(col("k") <= 1L ||
            col("ncells") =!= col("b") * col("k"), lit(Double.NaN))
          .otherwise(
            (lit(12.0) * (col("sr2x4").cast("double") / lit(4.0)) -
              lit(3.0) * d(col("b")) * d(col("b")) * d(col("k")) *
                (d(col("k")) + lit(1.0)) * (d(col("k")) + lit(1.0))) /
            (d(col("b")) * d(col("b")) * d(col("k")) *
              (d(col("k")) * d(col("k")) - lit(1.0)))), 6)
          .as("kendall_w"))
  }

  /** Q339: PAGE'S TREND TEST — the ORDERED alternative in the q327
    * blocked design (q312's Jonckheere question asked within blocks):
    * does the outcome rise monotonically with the treatment ORDER,
    * judged on within-block ranks? The treatment column must BE the
    * 1..k order scores (here the priority digit);
    * L = Σ_j s_j·R_j over the [[friedmanCore]] exact midrank sums,
    * E = b·k(k+1)²/4, V = b·k²(k+1)²(k−1)/144, one mirrored z. NaN on
    * k ≤ 1, an incomplete design, or V ≤ 0.
    */
  def pageTrend(df: DataFrame, blockCol: Column, treatScoreCol: Column,
      valueCol: Column): DataFrame =
    pageTrendVerdict(
      blockCells(df, blockCol, treatScoreCol.cast("long"), valueCol))

  /** [[pageTrend]] from a `(blk, trt, n, s)` cell table where `trt`
    * IS the 1..k order score (the [[friedmanVerdict]] streaming-dual
    * device). */
  def pageTrendVerdict(cells: DataFrame): DataFrame = {
    def d(c: Column): Column = c.cast("double")
    friedmanCoreCells(cells)
      .groupBy(col("b"), col("k"), col("ncells"))
      .agg(sum(dec(col("trt")) * col("rj2")).as("l2"))
      .withColumn("kd", d(col("k")))
      .withColumn("bd", d(col("b")))
      .withColumn("ee",
        col("bd") * col("kd") * (col("kd") + lit(1.0)) *
          (col("kd") + lit(1.0)) / lit(4.0))
      .withColumn("vv",
        col("bd") * col("kd") * col("kd") * (col("kd") + lit(1.0)) *
          (col("kd") + lit(1.0)) * (col("kd") - lit(1.0)) /
          lit(144.0))
      .select(col("b").as("n_blocks"), col("k").as("k_treatments"),
        round(col("l2").cast("double") / lit(2.0), 2).as("page_l"),
        round(when(col("k") <= 1L ||
            col("ncells") =!= col("b") * col("k") ||
            col("vv") <= 0.0, lit(Double.NaN))
          .otherwise((col("l2").cast("double") / lit(2.0) -
            col("ee")) / sqrt(col("vv"))), 6).as("z_score"))
  }

  /** Q340: COCHRAN'S Q TEST — k RELATED binary outcomes per subject
    * (did purchase propensity differ across the year's quarters,
    * judged within customer — the binary sibling of q327):
    * Q = k(k−1)·Σ_j(C_j − T/k)²/(k·T − Σ_i R_i²) with column totals
    * C_j, row totals R_i, grand total T — all exact integers from
    * one subject-level aggregation (R_i² sums in DECIMAL; the C_j
    * reduction folds the sorted k-element list). NaN when the
    * denominator is 0 (every subject all-0 or all-1).
    */
  def cochranQ(df: DataFrame, subjectCol: Column, treatCol: Column,
      flagCol: Column): DataFrame = {
    def d(name: String): Column = col(name).cast("double")
    val per = df.select(subjectCol.as("s"), treatCol.as("j"),
        flagCol.cast("long").as("x"))
      .groupBy(col("s"), col("j"))
      .agg((max(col("x"))).as("x"))
    val rows = per.groupBy(col("s"))
      .agg(sum(col("x")).as("ri"))
      .agg(count(lit(1)).as("nsubj"), sum(col("ri")).as("t"),
        sum(dec(col("ri")) * col("ri")).as("r2"))
    val cols = per.groupBy(col("j"))
      .agg(sum(col("x")).as("cj"))
      .agg(count(lit(1)).as("k"),
        sum(dec(col("cj")) * col("cj")).as("c2"))
    rows.crossJoin(broadcast(cols))
      .withColumn("kd", d("k"))
      .withColumn("num",
        col("kd") * (col("kd") - lit(1.0)) *
          (col("c2").cast("double") -
            d("t") * d("t") / col("kd")))
      .withColumn("den",
        col("kd") * d("t") - col("r2").cast("double"))
      .select(col("nsubj").as("n_subjects"), col("k").as("k_treatments"),
        round(when(col("den") <= 0.0, lit(Double.NaN))
          .otherwise(col("num") / col("den")), 6).as("cochran_q"))
  }

  /** Q341: SIGN TEST on paired halves — did each customer's order
    * count RISE from the first to the second calendar half (the
    * assumption-free paired location test; q300's Hodges–Lehmann
    * quantifies the shift, the sign test just votes)? S = #(second >
    * first), ties dropped (the standard convention), z with
    * continuity correction (|S − m/2| − ½)/sqrt(m/4) over the m
    * non-tied pairs. One subject-level aggregation; exact counts.
    */
  def signTest(pairs: DataFrame, xCol: Column, yCol: Column)
      : DataFrame = {
    def d(name: String): Column = col(name).cast("double")
    pairs.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") > col("x"), lit(1L)).otherwise(lit(0L)))
          .as("pos"),
        sum(when(col("y") < col("x"), lit(1L)).otherwise(lit(0L)))
          .as("neg"))
      .withColumn("m", col("pos") + col("neg"))
      .select(col("n").as("n_pairs"), col("pos").as("n_up"),
        col("neg").as("n_down"),
        round(when(col("m") <= 0L, lit(Double.NaN))
          .otherwise(
            (abs(d("pos") - d("m") / lit(2.0)) - lit(0.5)) /
              sqrt(d("m") / lit(4.0)) *
              when(d("pos") >= d("m") / lit(2.0), lit(1.0))
                .otherwise(lit(-1.0))), 6).as("z_score"))
  }

  /** Q342: TWO-PROPORTION Z-TEST with per-group WILSON 95% INTERVALS —
    * the binary-outcome sibling of q269 (is the discounted-line RATE
    * the same in the R and N cohorts?): pooled-variance
    * z = (p₁−p₂)/sqrt(p̂(1−p̂)(1/n₁+1/n₂)) plus each group's Wilson
    * score interval (the interval that behaves at extreme p where the
    * Wald CI collapses): center (p + z²/2n)/(1 + z²/n), half-width
    * z·sqrt(p(1−p)/n + z²/4n²)/(1 + z²/n) at z = 1.96. Exact counts
    * from one conditional aggregation; every expression mirrored. NaN
    * when a group is empty or the pooled variance degenerates.
    */
  def twoProportionZ(df: DataFrame, groupCol: String, flagCol: Column,
      groupA: String, groupB: String): DataFrame =
    twoProportionZVerdict(
      groupFlagCells(df, groupCol, flagCol, groupA, groupB),
      groupA, groupB)

  /** The `(g, n, c)` per-group trial/success reduction [[twoProportionZ]]
    * reads — a sum-monoid (2 rows of state), so also the state of the
    * streaming dual
    * [[graft.streaming.StreamingStats.groupFlagCellsStream]]. */
  private[graft] def groupFlagCells(df: DataFrame, groupCol: String,
      flagCol: Column, groupA: String, groupB: String): DataFrame =
    df.select(col(groupCol).as("g"), flagCol.cast("long").as("x"))
      .filter(col("g").isin(groupA, groupB))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("c"))

  /** [[twoProportionZ]] from a `(g, n, c)` cell table — the cells-level
    * entry the streaming dual reads (equivalence pinned in
    * StreamingBlockedSpec). */
  def twoProportionZVerdict(cells: DataFrame, groupA: String,
      groupB: String): DataFrame = {
    def d(name: String): Column = col(name).cast("double")
    def wilsonLo(p: Column, n: Column): Column =
      ((p + lit(1.9208) / n) - lit(1.96) *
        sqrt(p * (lit(1.0) - p) / n +
          lit(0.9604) / (n * n))) / (lit(1.0) + lit(3.8416) / n)
    def wilsonHi(p: Column, n: Column): Column =
      ((p + lit(1.9208) / n) + lit(1.96) *
        sqrt(p * (lit(1.0) - p) / n +
          lit(0.9604) / (n * n))) / (lit(1.0) + lit(3.8416) / n)
    cells.agg(
        coalesce(sum(when(col("g") === groupA, col("n"))
          .otherwise(lit(0L))), lit(0L)).as("n1"),
        coalesce(sum(when(col("g") === groupB, col("n"))
          .otherwise(lit(0L))), lit(0L)).as("n2"),
        coalesce(sum(when(col("g") === groupA, col("c"))
          .otherwise(lit(0L))), lit(0L)).as("c1"),
        coalesce(sum(when(col("g") === groupB, col("c"))
          .otherwise(lit(0L))), lit(0L)).as("c2"))
      .withColumn("p1", when(col("n1") <= 0L, lit(Double.NaN))
        .otherwise(d("c1") / d("n1")))
      .withColumn("p2", when(col("n2") <= 0L, lit(Double.NaN))
        .otherwise(d("c2") / d("n2")))
      .withColumn("pp",
        when(col("n1") + col("n2") <= 0L, lit(Double.NaN))
          .otherwise((d("c1") + d("c2")) / (d("n1") + d("n2"))))
      .withColumn("se2",
        col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / d("n1") + lit(1.0) / d("n2")))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(col("p1"), 6).as("p_a"), round(col("p2"), 6).as("p_b"),
        round(when(isnan(col("se2")) || col("se2") <= 0.0,
            lit(Double.NaN))
          .otherwise((col("p1") - col("p2")) / sqrt(col("se2"))), 6)
          .as("z_score"),
        round(wilsonLo(col("p1"), d("n1")), 6).as("wilson_lo_a"),
        round(wilsonHi(col("p1"), d("n1")), 6).as("wilson_hi_a"),
        round(wilsonLo(col("p2"), d("n2")), 6).as("wilson_lo_b"),
        round(wilsonHi(col("p2"), d("n2")), 6).as("wilson_hi_b"))
  }

  /** Q329: MANTEL–HAENSZEL POOLED ODDS RATIO across strata — q326's
    * association CONTROLLED for a confounder (Simpson's-paradox
    * insurance): one 2×2 per stratum, pooled as
    * OR_MH = Σᵢ aᵢdᵢ/nᵢ / Σᵢ bᵢcᵢ/nᵢ, with the crude (collapsed) OR
    * alongside so the confounding is visible in one row. Stratum
    * tables from one aggregation; the two rational reductions fold
    * the SORTED stratum list (the q270 device). NaN when the
    * denominator sum is 0.
    */
  def mantelHaenszel(pairs: DataFrame, stratumCol: Column, xCol: Column,
      yCol: Column): DataFrame =
    mantelHaenszelVerdict(strataCells(pairs, stratumCol, xCol, yCol))

  /** The per-stratum 2×2 reduction `(g, a, b, c, dd)` that
    * [[mantelHaenszel]] reads — a sum-monoid (|strata| rows of state),
    * so also the state of the streaming dual
    * [[graft.streaming.StreamingStats.strataCellsStream]]. */
  private[graft] def strataCells(pairs: DataFrame, stratumCol: Column,
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

  /** [[mantelHaenszel]] from a `(g, a, b, c, dd)` stratum-cell table —
    * the cells-level entry the streaming dual reads (equivalence
    * pinned in StreamingBlockedSpec). */
  def mantelHaenszelVerdict(cells: DataFrame): DataFrame = {
    def d(name: String): Column = col(name).cast("double")
    val per = cells.select(col("g"), col("a"), col("b"), col("c"),
        col("dd"))
      .withColumn("n", col("a") + col("b") + col("c") + col("dd"))
    def fold(expr: Column): Column =
      aggregate(array_sort(collect_list(struct(col("g"),
          expr.as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t"))
    per.agg(count(lit(1)).as("k"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("c")).as("sc"), sum(col("dd")).as("sd"),
        fold(when(col("n") === 0L, lit(0.0))
          .otherwise(d("a") * d("dd") / d("n"))).as("num"),
        fold(when(col("n") === 0L, lit(0.0))
          .otherwise(d("b") * d("c") / d("n"))).as("den"))
      .select(col("k").as("k_strata"),
        round(when(col("den") <= 0.0, lit(Double.NaN))
          .otherwise(col("num") / col("den")), 6).as("or_mh"),
        round(when(col("sb") === 0L || col("sc") === 0L,
            lit(Double.NaN))
          .otherwise(d("sa") * d("sd") / (d("sb") * d("sc"))), 6)
          .as("or_crude"))
  }

  /** Q330: COHEN'S d / HEDGES' g — the standardized-mean-difference
    * effect sizes of the q269 comparison (the number a meta-analysis
    * actually pools, where t only answers "significant?"):
    * d = (m₁−m₂)/s_p on the pooled SD, g = J·d with the small-sample
    * correction J = 1 − 3/(4N−9). Six exact DECIMAL moments in one
    * conditional aggregation, then two mirrored expressions. NaN when
    * a group is empty/singleton or the pooled variance degenerates.
    */
  def hedgesG(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val c = round(lit(100.0) * col(valueCol)).cast("long")
    val base = df.select(col(groupCol).as("g"), c.as("c"))
      .filter(col("g").isin(groupA, groupB))
    def side(grp: String, one: Column): Column = when(col("g") === grp, one)
    def d(name: String): Column = col(name).cast("double")
    base.agg(
        sum(side(groupA, lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(side(groupB, lit(1L)).otherwise(lit(0L))).as("n2"),
        sum(dec(side(groupA, col("c")).otherwise(lit(0L)))).as("s1"),
        sum(dec(side(groupB, col("c")).otherwise(lit(0L)))).as("s2"),
        sum(dec(side(groupA, col("c") * col("c")).otherwise(lit(0L))))
          .as("q1"),
        sum(dec(side(groupB, col("c") * col("c")).otherwise(lit(0L))))
          .as("q2"))
      .withColumn("sp2",
        when(col("n1") + col("n2") <= 2L || col("n1") <= 0L ||
            col("n2") <= 0L, lit(Double.NaN))
          .otherwise(
            ((d("q1") - d("s1") * d("s1") / d("n1")) +
              (d("q2") - d("s2") * d("s2") / d("n2"))) /
              (d("n1") + d("n2") - lit(2.0))))
      .withColumn("cd",
        when(isnan(col("sp2")) || col("sp2") <= 0.0, lit(Double.NaN))
          .otherwise((d("s1") / d("n1") - d("s2") / d("n2")) /
            sqrt(col("sp2"))))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(col("cd"), 6).as("cohens_d"),
        round(col("cd") * (lit(1.0) - lit(3.0) /
          (lit(4.0) * (d("n1") + d("n2")) - lit(9.0))), 6)
          .as("hedges_g"))
  }

  /** Q331: TWO-GROUP POISSON RATE TEST — do the id-parity cohorts
    * generate `convType` events at the same per-user rate (the
    * count-data companion of q328's log-rank: not WHEN but HOW OFTEN)?
    * Conditional binomial device: given C = c₁+c₂ total events, under
    * H₀ c₁ ~ Bin(C, u₁/(u₁+u₂)), so z = (c₁ − C·p)/sqrt(C·p·(1−p)) —
    * exact integer counts from one aggregation, one mirrored
    * expression. NaN when C = 0 or a cohort is empty.
    */
  def poissonTwoRate(events: DataFrame, convType: String = "purchase")
      : DataFrame = {
    def d(name: String): Column = col(name).cast("double")
    events
      .select(pmod(col("user_id").cast("long"), lit(2L)).as("g"),
        (col("event_type") === convType).cast("long").as("ev"),
        col("user_id"))
      .groupBy(col("g"))
      .agg(countDistinct(col("user_id")).as("u"), sum(col("ev")).as("c"))
      .agg(
        max(when(col("g") === 0L, col("u"))).as("u1"),
        max(when(col("g") === 1L, col("u"))).as("u2"),
        max(when(col("g") === 0L, col("c"))).as("c1"),
        max(when(col("g") === 1L, col("c"))).as("c2"))
      .select(coalesce(col("u1"), lit(0L)).as("u1"),
        coalesce(col("u2"), lit(0L)).as("u2"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
      .withColumn("p",
        when(col("u1") + col("u2") <= 0L, lit(Double.NaN))
          .otherwise(d("u1") / (d("u1") + d("u2"))))
      .select(col("u1").as("users_a"), col("u2").as("users_b"),
        col("c1").as("events_a"), col("c2").as("events_b"),
        round(when(col("u1") <= 0L, lit(Double.NaN))
          .otherwise(d("c1") / d("u1")), 6).as("rate_a"),
        round(when(col("u2") <= 0L, lit(Double.NaN))
          .otherwise(d("c2") / d("u2")), 6).as("rate_b"),
        round(when(col("c1") + col("c2") <= 0L || col("u1") <= 0L ||
            col("u2") <= 0L, lit(Double.NaN))
          .otherwise((d("c1") - (d("c1") + d("c2")) * col("p")) /
            sqrt((d("c1") + d("c2")) * col("p") *
              (lit(1.0) - col("p")))), 6).as("z_score"))
  }

  /** Q332: INTRACLASS CORRELATION ICC(1,1) — what fraction of the
    * measure's variance lives BETWEEN groups (the agreement/clustering
    * number behind "does the grouping matter at all", sharper than
    * eta² because it corrects for group count)? One-way
    * random-effects decomposition from the q270 exact sums —
    * MSB = SSB/(k−1), MSW = SSW/(N−k), the unequal-n group-size
    * constant k₀ = (N − Σn_g²/N)/(k−1) — then
    * ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW). The only rational fold,
    * Σs_g²/n_g, rides the sorted-list device; Σn_g² is an exact
    * DECIMAL sum. NaN on k ≤ 1, N ≤ k, or a zero denominator.
    */
  def icc1(df: DataFrame, groupCol: Column, valueCol: Column)
      : DataFrame = {
    val c = round(lit(100.0) * valueCol).cast("long")
    def d(name: String): Column = col(name).cast("double")
    val per = df.select(groupCol.as("g"), c.as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(dec(col("c"))).as("sg"),
        sum(dec(col("c")) * col("c")).as("qg"))
      .withColumn("term", d("sg") * d("sg") / d("ng"))
    per.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(dec(col("ng")) * col("ng")).as("sn2"),
        aggregate(array_sort(collect_list(struct(col("g"),
            col("term").as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("a"))
      .withColumn("kd", d("k"))
      .withColumn("nd", d("n"))
      .withColumn("msb",
        when(col("k") <= 1L, lit(Double.NaN)).otherwise(
          (col("a") - d("s") * d("s") / col("nd")) /
            (col("kd") - lit(1.0))))
      .withColumn("msw",
        when(col("n") <= col("k"), lit(Double.NaN)).otherwise(
          (d("q") - col("a")) / (col("nd") - col("kd"))))
      .withColumn("k0",
        when(col("k") <= 1L, lit(Double.NaN)).otherwise(
          (col("nd") - col("sn2").cast("double") / col("nd")) /
            (col("kd") - lit(1.0))))
      .withColumn("den",
        col("msb") + (col("k0") - lit(1.0)) * col("msw"))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round(when(isnan(col("msb")) || isnan(col("msw")) ||
            isnan(col("den")) || col("den") === 0.0, lit(Double.NaN))
          .otherwise((col("msb") - col("msw")) / col("den")), 6)
          .as("icc"))
  }

  /** Q333: CRONBACH'S ALPHA over the three lineitem rate "items"
    * (quantity, discount, tax on the cents grid) — the internal-
    * consistency coefficient α = k/(k−1)·(1 − Σσᵢ²/σ_X²) where X is
    * the per-row item sum. All (co)variance content comes from exact
    * per-item moment sums plus ΣX² computed on the row (the cross
    * terms arrive for free), sample-variance denominators, one
    * mirrored expression. NaN when n ≤ 1 or the total variance
    * degenerates.
    */
  def cronbachAlpha(df: DataFrame, items: Seq[Column]): DataFrame = {
    require(items.size >= 2, "cronbachAlpha needs >= 2 items")
    val k = items.size
    def d(name: String): Column = col(name).cast("double")
    val named = items.zipWithIndex.map { case (c, i) =>
      round(lit(100.0) * c).cast("long").as(s"i$i") }
    val base = df.select(named: _*)
      .withColumn("x",
        (0 until k).map(i => col(s"i$i")).reduce(_ + _))
    val aggs = Seq(count(lit(1)).as("n")) ++
      (0 until k).flatMap { i => Seq(
        sum(dec(col(s"i$i"))).as(s"s$i"),
        sum(dec(col(s"i$i")) * col(s"i$i")).as(s"q$i")) } ++
      Seq(sum(dec(col("x"))).as("sx"),
        sum(dec(col("x")) * col("x")).as("qx"))
    def sampVar(s: String, q: String): Column =
      when(col("n") <= 1L, lit(Double.NaN)).otherwise(
        (d(q) - d(s) * d(s) / d("n")) / (d("n") - lit(1.0)))
    base.agg(aggs.head, aggs.tail: _*)
      .withColumn("vs",
        (0 until k).map(i => sampVar(s"s$i", s"q$i")).reduce(_ + _))
      .withColumn("vx", sampVar("sx", "qx"))
      .select(col("n").as("n_rows"), lit(k.toLong).as("k_items"),
        round(when(col("n") <= 1L || col("vx") <= 0.0,
            lit(Double.NaN))
          .otherwise(lit(k.toDouble) / lit((k - 1).toDouble) *
            (lit(1.0) - col("vs") / col("vx"))), 6).as("alpha"))
  }

  /** Q336: SPLIT-HALF RELIABILITY with the SPEARMAN–BROWN step-up —
    * q333's cross-check: correlate one half of the item set with the
    * other and project the full-length reliability
    * SB = 2r/(1+r). Exact Pearson moments (the n-scaled integer
    * covariance shape of q259/q273) in one aggregation, two mirrored
    * expressions. NaN when either half's variance degenerates or
    * r = −1.
    */
  def splitHalf(df: DataFrame, halfA: Column, halfB: Column)
      : DataFrame = {
    val base = df.select(
      round(lit(100.0) * halfA).cast("long").as("xa"),
      round(lit(100.0) * halfB).cast("long").as("xb"))
    def d(name: String): Column = col(name).cast("double")
    base.agg(count(lit(1)).as("n"),
        sum(dec(col("xa"))).as("sx"), sum(dec(col("xb"))).as("sy"),
        sum(dec(col("xa")) * col("xa")).as("sxx"),
        sum(dec(col("xb")) * col("xb")).as("syy"),
        sum(dec(col("xa")) * col("xb")).as("sxy"))
      .withColumn("vx", d("n") * d("sxx") - d("sx") * d("sx"))
      .withColumn("vy", d("n") * d("syy") - d("sy") * d("sy"))
      .withColumn("r",
        when(col("vx") <= 0.0 || col("vy") <= 0.0, lit(Double.NaN))
          .otherwise((d("n") * d("sxy") - d("sx") * d("sy")) /
            sqrt(col("vx") * col("vy"))))
      .select(col("n").as("n_rows"),
        round(col("r"), 6).as("split_r"),
        round(when(isnan(col("r")) || col("r") === -1.0,
            lit(Double.NaN))
          .otherwise(lit(2.0) * col("r") / (lit(1.0) + col("r"))), 6)
          .as("spearman_brown"))
  }

  /** Q311: ANDERSON–DARLING TWO-SAMPLE TEST on a bounded-domain
    * measure — the tail-weighted omnibus companion of q289's KS and
    * q290's CvM: the 1/(H(N−H)) weight makes A² far more sensitive to
    * divergence in the distribution tails than either. Discrete
    * (right-continuous ECDF) Scholz–Stephens A²_kN at k = 2, where the
    * two inner sums collapse onto one squared deviation,
    * A² = (1/n1 + 1/n2) · Σ_j (t_j/N) · D_j² / (H_j(N−H_j)),
    * D_j = N·MA_j − n1·H_j, summed over distinct values except the
    * last block (where H = N and the weight degenerates). D, H, M are
    * exact BIGINT cumulative counts off the value histogram; the
    * per-row rational term rides the q290 device — rounded once onto
    * the ×1e9 integer grid (identical IEEE doubles → identical grid
    * longs in both engines) and summed in DECIMAL, so the reduction
    * is order-free. Raw A² only: the Scholz–Stephens normalization
    * needs the O(N)-term harmonic sums g/h over generated sequences,
    * corpus-length work this histogram-bounded family refuses.
    */
  def andersonDarling2(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame =
    andersonDarlingVerdict(
      twoGroupHist(df, groupCol, valueCol, groupA, groupB))

  /** [[andersonDarling2]] from a `(v, na, t)` cell table — the
    * cells-level entry for the streaming dual (the [[ksVerdict]]
    * device).
    */
  def andersonDarlingVerdict(h: DataFrame): DataFrame = {
    val rankW = Window.orderBy(col("v"))
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("ma", sum(col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("hh", sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("nn", col("n1") + col("n2"))
      // last block (hh = N) excluded: its weight is 0/0 by convention
      .withColumn("wg",
        when(col("n1") === 0L || col("n2") === 0L ||
            col("hh") === col("nn"), lit(0L))
          .otherwise {
            val dd = d("nn") * d("ma") - d("n1") * d("hh")
            round((lit(1.0) / d("n1") + lit(1.0) / d("n2")) *
              col("t").cast("double") / d("nn") * dd * dd /
              (d("hh") * (d("nn") - d("hh"))) * lit(1.0e9)).cast("long")
          })
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(dec(col("wg"))).as("wsum"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise(col("wsum").cast("double") / lit(1.0e9)), 6)
          .as("ad_stat"))
  }

  /** Q312: JONCKHEERE–TERPSTRA TREND TEST across k ORDERED groups of a
    * bounded-domain measure — does the distribution shift monotonically
    * WITH the group order (the ordered-alternative power that q282's
    * Kruskal–Wallis, blind to order, gives up)? JT = Σ_{i<j} U_ij over
    * group pairs in the given order; with the per-(group, value) cell
    * table and per-group cumulative counts on the common value grid,
    * 2·U_ij = Σ_v c_j(v)·(2·C_i(<v) + c_i(v)) — every term an exact
    * integer, every frame bounded by |groups|·|domain| cells (the pair
    * join by |pairs|·|domain|). The tie-corrected null moments are the
    * standard three-term variance, all from exact DECIMAL sums of
    * group sizes and pooled tie counts; z is one mirrored expression
    * (NaN when Var ≤ 0 or N < 3).
    */
  def jonckheereTerpstra(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val cells = df.select(groupCol.cast("long").as("g"),
        valueCol.cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val vals = cells.select(col("v")).distinct()
    val grps = cells.select(col("g")).distinct()
    // dense |groups|x|domain| grid so cumulative counts exist at every
    // pooled value for every group (both factors bounded)
    val gw = Window.partitionBy(col("g")).orderBy(col("v"))
    val grid = grps.crossJoin(vals)
      .join(cells, Seq("g", "v"), "left_outer")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c0"))
      .withColumn("cb", coalesce(sum(col("c0")).over(
        gw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val jt2 = grid.select(col("g").as("gi"), col("v"),
        (lit(2L) * col("cb") + col("c0")).as("wlt"))
      .join(cells.select(col("g").as("gj"), col("v"), col("c")), Seq("v"))
      .filter(col("gi") < col("gj"))
      .agg(sum(dec(col("c")) * col("wlt")).as("jt2"))
    val sizes = cells.groupBy(col("g")).agg(sum(col("c")).as("ng"))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(dec(col("ng")) * col("ng")).as("s2"),
        sum(dec(col("ng")) * (col("ng") - lit(1L)) *
          (lit(2L) * col("ng") + lit(5L))).as("u1"),
        sum(dec(col("ng")) * (col("ng") - lit(1L)) *
          (col("ng") - lit(2L))).as("u2"),
        sum(dec(col("ng")) * (col("ng") - lit(1L))).as("u3"))
    val ties = cells.groupBy(col("v")).agg(sum(col("c")).as("t"))
      .agg(
        sum(dec(col("t")) * (col("t") - lit(1L)) *
          (lit(2L) * col("t") + lit(5L))).as("w1"),
        sum(dec(col("t")) * (col("t") - lit(1L)) *
          (col("t") - lit(2L))).as("w2"),
        sum(dec(col("t")) * (col("t") - lit(1L))).as("w3"))
    def d(name: String): Column = col(name).cast("double")
    jt2.crossJoin(broadcast(sizes)).crossJoin(broadcast(ties))
      .withColumn("nd", d("n"))
      .withColumn("e2",
        (dec(col("n")) * col("n") - col("s2")).cast("double") / lit(2.0))
      .withColumn("var0",
        when(col("n") < 3L, lit(Double.NaN)).otherwise(
          (col("nd") * (col("nd") - lit(1.0)) *
            (lit(2.0) * col("nd") + lit(5.0)) -
            d("u1") - d("w1")) / lit(72.0) +
          d("u2") * d("w2") /
            (lit(36.0) * col("nd") * (col("nd") - lit(1.0)) *
              (col("nd") - lit(2.0))) +
          d("u3") * d("w3") /
            (lit(8.0) * col("nd") * (col("nd") - lit(1.0)))))
      .select(col("k").as("k_groups"), col("n").as("n_rows"),
        round(d("jt2") / lit(2.0), 2).as("jt_stat"),
        round(when(isnan(col("var0")) || col("var0") <= 0.0,
            lit(Double.NaN))
          .otherwise((d("jt2") - col("e2")) /
            (lit(2.0) * sqrt(col("var0")))), 6).as("z_score"))
  }

  /** Q313: LEPAGE LOCATION–SCALE TEST between two groups — the classic
    * omnibus combination L = z_W² + z_AB²: the (tie-corrected)
    * Wilcoxon rank-sum z for a LOCATION shift plus the Ansari–Bradley
    * z for a SCALE shift, both off ONE value histogram in ONE
    * aggregation (the two score columns — pooled midrank and its
    * inward fold — share the same cumulative window). Component
    * conventions are exactly q271's and q309's, including the
    * folded-midrank tie variant documented at [[ansariBradley]]; L is
    * NaN if either component's variance degenerates.
    */
  def lepage(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame =
    lepageVerdict(twoGroupHist(df, groupCol, valueCol, groupA, groupB))

  /** [[lepage]] from a `(v, na, t)` cell table — the cells-level entry
    * the STREAMING dual reads: snapshot
    * [[graft.streaming.StreamingStats.twoGroupCellsStream]]'s state and
    * get the same verdict the batch test computes (the [[ksVerdict]]
    * device; equivalence pinned in StreamingTwoSampleSpec).
    */
  def lepageVerdict(h: DataFrame): DataFrame = {
    val rankW = Window.orderBy(col("v"))
    // the AB fold point 2(N+1) is a scalar: broadcast the group totals
    // onto the ranked histogram (the q309 shape — the identical
    // histogram-aggregate exchange is reused across the two branches),
    // then ONE aggregation carries both components' sums
    val tot = h.agg(sum(col("na")).as("n1"),
      sum(col("t") - col("na")).as("n2"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("cumb", coalesce(sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("r2", lit(2L) * col("cumb") + col("t") + lit(1L))
      .crossJoin(broadcast(tot))
      .withColumn("s2", least(col("r2"),
        lit(2L) * (col("n1") + col("n2") + lit(1L)) - col("r2")))
      .agg(
        max(col("n1")).as("n1"),
        max(col("n2")).as("n2"),
        sum(dec(col("na")) * col("r2")).as("r1x2"),
        sum(dec(col("t")) * col("t") * col("t") - dec(col("t")))
          .as("ties"),
        sum(dec(col("na")) * col("s2")).as("ab2"),
        sum(dec(col("t")) * col("s2")).as("ts1"),
        sum(dec(col("t")) * col("s2") * col("s2")).as("ts2"))
      .withColumn("nn", d("n1") + d("n2"))
      // Wilcoxon component (q271 chain)
      .withColumn("u1x2",
        col("r1x2") - dec(col("n1")) * (col("n1") + lit(1L)))
      .withColumn("sig2",
        // nn <= 1: the tie-correction divisor nn(nn-1) is 0 — same ANSI
        // divide-by-zero class varx4 guards below (ADVICE r17); the zw
        // isnan() guard then carries the NaN through
        when(col("nn") <= 1.0, lit(Double.NaN)).otherwise(
          d("n1") * d("n2") / lit(12.0) *
            ((col("nn") + lit(1.0)) -
              d("ties") / (col("nn") * (col("nn") - lit(1.0))))))
      .withColumn("zw",
        when(col("sig2") <= 0.0 || isnan(col("sig2")), lit(Double.NaN))
          .otherwise((d("u1x2") / lit(2.0) -
            d("n1") * d("n2") / lit(2.0)) / sqrt(col("sig2"))))
      // Ansari–Bradley component (q309 chain)
      .withColumn("varx4",
        when(col("nn") === 1.0, lit(Double.NaN)).otherwise(
          d("n1") * d("n2") *
            (col("nn") * d("ts2") - d("ts1") * d("ts1")) /
            (col("nn") * col("nn") * (col("nn") - lit(1.0)))))
      .withColumn("zab",
        when(col("varx4") === 0.0 || isnan(col("varx4")),
            lit(Double.NaN))
          .otherwise((d("ab2") - d("n1") * d("ts1") / col("nn")) /
            sqrt(col("varx4"))))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(col("zw"), 6).as("z_wilcoxon"),
        round(col("zab"), 6).as("z_ansari"),
        round(col("zw") * col("zw") + col("zab") * col("zab"), 6)
          .as("lepage_stat"))
  }

  /** Q314: CUCCONI LOCATION–SCALE TEST between two groups — the older,
    * one-shot alternative to q313's Lepage combination: U and V are
    * group B's sums of SQUARED pooled ranks and squared reflected
    * ranks, standardized by their exact null moments and combined with
    * their null correlation ρ. Squared ×2-grid midranks stay exact
    * integers (×4 grid) in DECIMAL; the no-tie null moments are the
    * classical ones — under heavy ties they are approximate (the
    * midrank convention, documented like [[ansariBradley]]'s fold),
    * but both engines compute identical mirrored expressions.
    * C = (U*² + V*² − 2ρU*V*)/(2(1−ρ²)); NaN when a variance or
    * 1−ρ² degenerates.
    */
  def cucconi(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame =
    cucconiVerdict(twoGroupHist(df, groupCol, valueCol, groupA, groupB))

  /** [[cucconi]] from a `(v, na, t)` cell table — the cells-level entry
    * for the streaming dual (the [[ksVerdict]] device).
    */
  def cucconiVerdict(h: DataFrame): DataFrame = {
    val rankW = Window.orderBy(col("v"))
    def d(name: String): Column = col(name).cast("double")
    h
      .withColumn("cumb", coalesce(sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("r2", lit(2L) * col("cumb") + col("t") + lit(1L))
      .agg(
        sum(col("na")).as("n1"),
        sum(col("t") - col("na")).as("n2"),
        sum(dec(col("t") - col("na")) * col("r2") * col("r2"))
          .as("u4"),
        sum(dec(col("t") - col("na")) * col("r2")).as("rb2"))
      .withColumn("nn", d("n1") + d("n2"))
      // 4V = Σ nb·(2(N+1) − r2)² = 4(N+1)²·n2 − 4(N+1)·Σnb·r2 + 4U
      .withColumn("v4",
        dec(lit(4L)) * (dec(col("n1")) + col("n2") + lit(1L)) *
          (dec(col("n1")) + col("n2") + lit(1L)) * col("n2") -
          dec(lit(4L)) * (dec(col("n1")) + col("n2") + lit(1L)) *
            col("rb2") + col("u4"))
      .withColumn("eu",
        d("n2") * (col("nn") + lit(1.0)) *
          (lit(2.0) * col("nn") + lit(1.0)) / lit(6.0))
      .withColumn("varu",
        d("n1") * d("n2") * (col("nn") + lit(1.0)) *
          (lit(2.0) * col("nn") + lit(1.0)) *
          (lit(8.0) * col("nn") + lit(11.0)) / lit(180.0))
      .withColumn("rho",
        lit(2.0) * (col("nn") * col("nn") - lit(4.0)) /
          ((lit(2.0) * col("nn") + lit(1.0)) *
            (lit(8.0) * col("nn") + lit(11.0))) - lit(1.0))
      .withColumn("us",
        when(col("varu") <= 0.0, lit(Double.NaN)).otherwise(
          (d("u4") / lit(4.0) - col("eu")) / sqrt(col("varu"))))
      .withColumn("vs",
        when(col("varu") <= 0.0, lit(Double.NaN)).otherwise(
          (d("v4") / lit(4.0) - col("eu")) / sqrt(col("varu"))))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        round(col("us"), 6).as("u_star"),
        round(col("vs"), 6).as("v_star"),
        round(when(lit(1.0) - col("rho") * col("rho") <= 0.0,
            lit(Double.NaN))
          .otherwise((col("us") * col("us") + col("vs") * col("vs") -
            lit(2.0) * col("rho") * col("us") * col("vs")) /
            (lit(2.0) * (lit(1.0) - col("rho") * col("rho")))), 6)
          .as("cucconi_c"))
  }

  /** Q315: COCHRAN–ARMITAGE TREND TEST — is a BINARY outcome's rate
    * monotone in an ORDERED category (the 2×k contingency sibling of
    * q312)? T = Σ s_i·(r_i − n_i·p̄) with integer scores s_i,
    * Var(T) = p̄(1−p̄)(Σ n_i s_i² − (Σ n_i s_i)²/N): one aggregation of
    * the fact table into k category rows (exact BIGINT n_i, r_i,
    * weighted sums in DECIMAL), then one mirrored z expression. NaN
    * when p̄ ∈ {0, 1} or the score spread is zero.
    */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
      successCol: Column): DataFrame = {
    val per = df.select(scoreCol.cast("long").as("s"),
        successCol.cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("ng"), sum(col("y")).as("rg"))
    def d(name: String): Column = col(name).cast("double")
    per.agg(
        count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("rg")).as("r"),
        sum(dec(col("s")) * col("rg")).as("sr"),
        sum(dec(col("s")) * col("ng")).as("sn"),
        sum(dec(col("s")) * col("s") * col("ng")).as("s2n"))
      .withColumn("pbar", d("r") / d("n"))
      .withColumn("tt", d("sr") - col("pbar") * d("sn"))
      .withColumn("vart",
        col("pbar") * (lit(1.0) - col("pbar")) *
          (d("s2n") - d("sn") * d("sn") / d("n")))
      .select(col("k").as("k_cats"), col("n").as("n_rows"),
        col("r").as("n_success"),
        round(col("tt"), 4).as("trend_stat"),
        round(when(col("vart") <= 0.0, lit(Double.NaN))
          .otherwise(col("tt") / sqrt(col("vart"))), 6).as("z_score"))
  }

  /** Q316: McNEMAR'S TEST on paired binary outcomes — did the SAME
    * subjects flip between two conditions (the paired sibling of
    * q272's independence χ²)? The subject table collapses to the two
    * DISCORDANT counts b (x=1, y=0) and c (x=0, y=1);
    * χ² = (b−c)²/(b+c) plus the continuity-corrected
    * (|b−c|−1)²/(b+c). One aggregation to one row; NaN when b+c = 0
    * (no discordant pairs — the test is undefined, not zero).
    */
  def mcnemar(pairs: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    def d(name: String): Column = col(name).cast("double")
    pairs.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("x") === 1L && col("y") === 0L, lit(1L))
          .otherwise(lit(0L))).as("b"),
        sum(when(col("x") === 0L && col("y") === 1L, lit(1L))
          .otherwise(lit(0L))).as("c"))
      .select(col("n").as("n_pairs"), col("b").as("n_only_x"),
        col("c").as("n_only_y"),
        round(when(col("b") + col("c") === 0L, lit(Double.NaN))
          .otherwise((d("b") - d("c")) * (d("b") - d("c")) /
            (d("b") + d("c"))), 6).as("chi2"),
        round(when(col("b") + col("c") === 0L, lit(Double.NaN))
          .otherwise(
            greatest(abs(d("b") - d("c")) - lit(1.0), lit(0.0)) *
            greatest(abs(d("b") - d("c")) - lit(1.0), lit(0.0)) /
            (d("b") + d("c"))), 6).as("chi2_cc"))
  }

  /** Q317: BRUNNER–MUNZEL TEST between two groups of a bounded-domain
    * measure — the rank test that, unlike q271's Mann–Whitney, does
    * NOT assume equal variances under H₀ (the nonparametric
    * Behrens–Fisher problem). Needs pooled AND within-group midranks —
    * both are cumulative counts off the same value histogram (two more
    * windowed sums over ≤|domain| rows). The rank-variance sums S_i
    * clear their only rational term algebraically: multiplying through
    * by n_i² turns Σ na·(d − R̄ᶜ + (n+1)/2)² into
    * Σ na·(n_i·d2 − e_i)²/(4n_i²) with e_i = Σ n_i-side ×2 rank sum −
    * n_i(n_i+1) an exact integer — DECIMAL(38,0) end to end, no
    * rounding grid. The statistic and p̂ = P(B > A) + ½P(B = A) are
    * mirrored double expressions; NaN when either S degenerates or a
    * group has < 2 rows.
    */
  def brunnerMunzel(df: DataFrame, groupCol: String, valueCol: Column,
      groupA: String, groupB: String): DataFrame =
    brunnerMunzelVerdict(
      twoGroupHist(df, groupCol, valueCol, groupA, groupB))

  /** [[brunnerMunzel]] from a `(v, na, t)` cell table — the cells-level
    * entry for the streaming dual (the [[lepageVerdict]] story).
    */
  def brunnerMunzelVerdict(h: DataFrame): DataFrame = {
    val rankW = Window.orderBy(col("v"))
    def d(name: String): Column = col(name).cast("double")
    val ranked = h
      .withColumn("cumb", coalesce(sum(col("t")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cumba", coalesce(sum(col("na")).over(
        rankW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("nb", col("t") - col("na"))
      .withColumn("cumbb", col("cumb") - col("cumba"))
      .withColumn("r2", lit(2L) * col("cumb") + col("t") + lit(1L))
      .withColumn("ra2", lit(2L) * col("cumba") + col("na") + lit(1L))
      .withColumn("rb2", lit(2L) * col("cumbb") + col("nb") + lit(1L))
    val tot = ranked.agg(sum(col("na")).as("n1"), sum(col("nb")).as("n2"),
      sum(dec(col("na")) * col("r2")).as("r1x2"),
      sum(dec(col("nb")) * col("r2")).as("r2x2"))
    ranked.crossJoin(broadcast(tot))
      // e_i = Σ_i-side (2·pooled rank) − n_i(n_i+1); all-integer squares
      .withColumn("e1", col("r1x2") - dec(col("n1")) * (col("n1") + lit(1L)))
      .withColumn("e2", col("r2x2") - dec(col("n2")) * (col("n2") + lit(1L)))
      .agg(
        max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("r1x2")).as("r1x2"), max(col("r2x2")).as("r2x2"),
        sum(dec(col("na")) *
          (dec(col("n1")) * (col("r2") - col("ra2")) - col("e1")) *
          (dec(col("n1")) * (col("r2") - col("ra2")) - col("e1")))
          .as("sxn"),
        sum(dec(col("nb")) *
          (dec(col("n2")) * (col("r2") - col("rb2")) - col("e2")) *
          (dec(col("n2")) * (col("r2") - col("rb2")) - col("e2")))
          .as("syn"))
      .withColumn("nn", d("n1") + d("n2"))
      // S_i = sxn/(4n_i²(n_i−1)) — the rank variances
      .withColumn("sx",
        when(col("n1") <= 1L, lit(Double.NaN)).otherwise(
          d("sxn") / (lit(4.0) * d("n1") * d("n1") *
            (d("n1") - lit(1.0)))))
      .withColumn("sy",
        when(col("n2") <= 1L, lit(Double.NaN)).otherwise(
          d("syn") / (lit(4.0) * d("n2") * d("n2") *
            (d("n2") - lit(1.0)))))
      .withColumn("sig",
        d("n1") * col("sx") + d("n2") * col("sy"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        // p̂ = (R̄ᶜ_B − (n2+1)/2)/n1 — P(B > A) + ½P(B = A)
        round(when(col("n1") === 0L || col("n2") === 0L,
            lit(Double.NaN))
          .otherwise((d("r2x2") / (lit(2.0) * d("n2")) -
            (d("n2") + lit(1.0)) / lit(2.0)) / d("n1")), 6)
          .as("p_hat"),
        round(when(isnan(col("sig")) || col("sig") <= 0.0,
            lit(Double.NaN))
          .otherwise(d("n1") * d("n2") *
            (d("r2x2") / (lit(2.0) * d("n2")) -
              d("r1x2") / (lit(2.0) * d("n1"))) /
            (col("nn") * sqrt(col("sig")))), 6).as("bm_stat"))
  }
}
