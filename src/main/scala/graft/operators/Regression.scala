package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form ORDINARY LEAST SQUARES at corpus scale — the normal
  * equations X'X·β = X'y solved exactly: the distributed side computes
  * only the moment sums (one map-side-combinable aggregation over
  * integer-grid features; DECIMAL(38,0) accumulators so 1e12-row
  * fact tables cannot overflow), and the 3×3 Cramer solve runs on the
  * driver over those nine scalars. No gradient steps, no sampling, no
  * iteration — for a linear model the sums ARE the sufficient
  * statistic, so a 100 TB fit costs exactly one scan.
  *
  * Exactness (the q227/q246 discipline): features land on integer
  * grids, the moment sums are exact integers; determinants are formed
  * in DOUBLE with one fixed multiplication shape mirrored verbatim in
  * the oracle SQL (exact-integer → double conversion is
  * round-to-nearest in both engines), and each coefficient is one
  * mirrored divide rounded to 6 dp.
  */
object Regression {

  /** Moment sums for y ~ 1 + x1 + x2 over pre-gridded integer columns:
    * (n, s1, s2, s11, s12, s22, sy, s1y, s2y) as exact DECIMAL(38,0).
    */
  private def moments(d: DataFrame): Array[java.math.BigDecimal] = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val row = d.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(dec(col("x1"))).as("s1"),
      sum(dec(col("x2"))).as("s2"),
      sum(dec(col("x1") * col("x1"))).as("s11"),
      sum(dec(col("x1") * col("x2"))).as("s12"),
      sum(dec(col("x2") * col("x2"))).as("s22"),
      sum(dec(col("y"))).as("sy"),
      sum(dec(col("x1") * col("y"))).as("s1y"),
      sum(dec(col("x2") * col("y"))).as("s2y"))
      .collect().head
    Array.tabulate(9)(i => row.getDecimal(i))
  }

  /** det of [[a,b,c],[d,e,f],[g,h,i]] with the FIXED multiplication
    * shape `a(ei−fh) − b(di−fg) + c(dh−eg)` — mirrored in the oracle.
    */
  private def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
      f: Double, g: Double, h: Double, i: Double): Double =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** Fit y ~ β0 + β1·x1 + β2·x2 over a frame with integer-grid columns
    * (x1, x2, y). Output: ONE row
    * (n_rows, b0, b1, b2) with coefficients rounded to 6 dp. Throws on
    * a singular design (collinear features) — a silent NaN fit is a
    * pipeline bug, not a result.
    */
  def olsFit2(d: DataFrame): DataFrame = ridgeFit2(d, 0.0)

  /** Q252: RIDGE variant — the same one-scan moment sums with the L2
    * penalty λ added to the non-intercept diagonal of X'X (the
    * intercept is conventionally unpenalized). λ = 0 IS [[olsFit2]];
    * a growing λ shrinks slopes toward 0 monotonically on a
    * well-conditioned design (spec'd), and makes the collinear case
    * solvable — the practical reason a pipeline fits ridge.
    */
  def ridgeFit2(d: DataFrame, lambda: Double): DataFrame = {
    require(lambda >= 0.0 && lambda.isFinite, s"bad lambda: $lambda")
    val spark = d.sparkSession
    import spark.implicits._
    val m = moments(d).map(_.doubleValue())
    val Array(n, s1, s2, s11raw, s12, s22raw, sy, s1y, s2y) = m
    val s11 = s11raw + lambda
    val s22 = s22raw + lambda
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    require(det != 0.0, "olsFit2: singular design matrix (collinear features)")
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((n.toLong, r6(det0 / det), r6(det1 / det), r6(det2 / det)))
      .toDF("n_rows", "b0", "b1", "b2")
  }

  /** Q250: the lineitem PRICE MODEL — extendedprice (cents) regressed
    * on quantity and discount (cents): the sanity regression every
    * pricing/billing audit runs (RegressionSpec pins the solver
    * itself against planted exact and straight-line-reference fits;
    * what the coefficients SAY about the synthetic data is the
    * oracle's business).
    */
  def olsPriceModel(lineitem: DataFrame): DataFrame =
    olsFit2(lineitem.select(
      // round, not bare cast: Spark double->long truncates while DuckDB
      // CAST rounds — on the integral quantity grid round() is exact
      // and identical in both engines
      round(col("l_quantity")).cast("long").as("x1"),
      round(lit(100.0) * col("l_discount")).cast("long").as("x2"),
      round(lit(100.0) * col("l_extendedprice")).cast("long").as("y")))

  /** Q258: GROUPED OLS — one regression PER GROUP, fit entirely
    * inside the plan: a single map-side-combinable aggregation
    * produces each group's exact moment sums, and the 3×3 Cramer
    * solve runs as COLUMN EXPRESSIONS over the group row (the same
    * fixed det shape as [[olsFit2]]), so a million per-segment models
    * cost exactly one scan + one |groups|-row projection — no driver
    * loop, no per-group job. Also reports R² from the same sums
    * (SSE = syy − β'X'y, valid because β solves the normal
    * equations). Groups with a singular design or zero variance are
    * dropped (HAVING det ≠ 0 and SST > 0, mirrored in the oracle).
    */
  def groupedOls2(d: DataFrame, groupCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def dbl(name: String) = col(name).cast("double")
    val sums = d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("nl"),
        sum(dec(col("x1"))).as("s1d"),
        sum(dec(col("x2"))).as("s2d"),
        sum(dec(col("x1") * col("x1"))).as("s11d"),
        sum(dec(col("x1") * col("x2"))).as("s12d"),
        sum(dec(col("x2") * col("x2"))).as("s22d"),
        sum(dec(col("y"))).as("syd"),
        sum(dec(col("x1") * col("y"))).as("s1yd"),
        sum(dec(col("x2") * col("y"))).as("s2yd"),
        sum(dec(col("y") * col("y"))).as("syyd"))
      .select(col(groupCol), col("nl"),
        col("nl").cast("double").as("n"),
        dbl("s1d").as("s1"), dbl("s2d").as("s2"), dbl("s11d").as("s11"),
        dbl("s12d").as("s12"), dbl("s22d").as("s22"), dbl("syd").as("sy"),
        dbl("s1yd").as("s1y"), dbl("s2yd").as("s2y"),
        dbl("syyd").as("syy"))
    // the fixed a(ei−fh) − b(di−fg) + c(dh−eg) shape, column form
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
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    val sse = col("syy") -
      (b0 * col("sy") + b1 * col("s1y") + b2 * col("s2y"))
    sums
      .withColumn("det", det).withColumn("sst", sst)
      .filter(col("det") =!= 0.0 && col("sst") > 0.0)
      .select(col(groupCol), col("nl").as("n_rows"),
        round(b0, 6).as("b0"), round(b1, 6).as("b1"),
        round(b2, 6).as("b2"),
        round(lit(1.0) - sse / col("sst"), 6).as("r2"))
  }

  /** The q258 wrapper: per-NATION price model over orders⋈customer —
    * totalprice (cents) on order year (offset 1990) and the
    * customer's account balance (integer thousands).
    */
  def groupedOlsNation(orders: DataFrame, customer: DataFrame): DataFrame =
    groupedOls2(orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nation"),
        (year(col("o_orderdate")) - lit(1990)).cast("long").as("x1"),
        round(col("c_acctbal") / lit(1000.0)).cast("long").as("x2"),
        round(lit(100.0) * col("o_totalprice")).cast("long").as("y")),
      "nation")

  /** Q254: LOGISTIC REGRESSION via IRLS (Newton-Raphson on the
    * log-likelihood) — `rounds` fixed iterations, each ONE distributed
    * aggregation: with the current β as plan literals, every row
    * contributes its 1e-6-grid posterior `pm = round(1e6·σ(z))`, the
    * integer IRLS weight `pm·(1e6−pm)` and residual `y·1e6 − pm`, and
    * the ten weighted moment sums accumulate exactly in DECIMAL(38,0);
    * the driver solves the 3×3 Newton system with the same fixed
    * Cramer shape as [[olsFit2]] and feeds β back as literals. The
    * oracle unrolls the rounds as CTEs replicating the driver
    * arithmetic verbatim (the Mondrian/EM unroll discipline); σ's
    * `exp` rides the q231 exp-parity precedent, grid-rounded per row.
    *
    * 100-TB shape: `rounds` scans, zero shuffles beyond the scalar
    * aggregation's partial-merge, driver state = 3 doubles.
    */
  def logisticFit2(d: DataFrame, rounds: Int = 3): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val (n, b0, b1, b2) = irlsBetas(d, rounds)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((n, r6(b0), r6(b1), r6(b2)))
      .toDF("n_rows", "b0", "b1", "b2")
  }

  /** The grid posterior `round(1e6·σ(b0 + b1·x1 + b2·x2))` as a
    * column — the scoring rule both the IRLS rounds and the q256 AUC
    * evaluation share.
    */
  private def gridPosterior(b0: Double, b1: Double, b2: Double): Column = {
    val z = lit(b0) + lit(b1) * col("x1").cast("double") +
      lit(b2) * col("x2").cast("double")
    round(lit(1000000.0) * (lit(1.0) / (lit(1.0) + exp(-z)))).cast("long")
  }

  /** The IRLS loop itself: (n_rows, b0, b1, b2), betas UNROUNDED. */
  private def irlsBetas(d: DataFrame, rounds: Int)
      : (Long, Double, Double, Double) = {
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    def dec(c: Column) = c.cast("decimal(38,0)")
    var (b0, b1, b2) = (0.0, 0.0, 0.0)
    var n = 0L
    for (_ <- 1 to rounds) {
      val z = lit(b0) + lit(b1) * col("x1").cast("double") +
        lit(b2) * col("x2").cast("double")
      val pm = round(lit(1000000.0) *
        (lit(1.0) / (lit(1.0) + exp(-z)))).cast("long")
      val w = pm * (lit(1000000L) - pm)
      val g = col("y") * lit(1000000L) - pm
      val row = d.select(col("x1"), col("x2"), pm.as("pm"), w.as("w"),
          g.as("g"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(dec(col("w"))).as("sw"),
          sum(dec(col("w") * col("x1"))).as("sw1"),
          sum(dec(col("w") * col("x2"))).as("sw2"),
          sum(dec(col("w") * col("x1") * col("x1"))).as("sw11"),
          sum(dec(col("w") * col("x1") * col("x2"))).as("sw12"),
          sum(dec(col("w") * col("x2") * col("x2"))).as("sw22"),
          sum(dec(col("g"))).as("g0"),
          sum(dec(col("g") * col("x1"))).as("g1"),
          sum(dec(col("g") * col("x2"))).as("g2"))
        .collect().head
      val m = Array.tabulate(10)(i => row.getDecimal(i).doubleValue())
      val Array(nn, sw, sw1, sw2, sw11, sw12, sw22, g0, g1, g2) = m
      n = nn.toLong
      val det = det3(sw, sw1, sw2, sw1, sw11, sw12, sw2, sw12, sw22)
      require(det != 0.0, "logisticFit2: singular IRLS system")
      val det0 = det3(g0, sw1, sw2, g1, sw11, sw12, g2, sw12, sw22)
      val det1 = det3(sw, g0, sw2, sw1, g1, sw12, sw2, g2, sw22)
      val det2 = det3(sw, sw1, g0, sw1, sw11, g1, sw2, sw12, g2)
      b0 = b0 + 1000000.0 * (det0 / det)
      b1 = b1 + 1000000.0 * (det1 / det)
      b2 = b2 + 1000000.0 * (det2 / det)
    }
    (n, b0, b1, b2)
  }

  /** Q256: EXACT ROC AUC of the IRLS model evaluated in-sample — the
    * eval metric a classifier audit actually reads, computed exactly
    * from the GRID-SCORE HISTOGRAM: the 1e-6-grid posterior takes at
    * most 1e6+1 distinct values, so a (score, label) count table
    * bounds the ranking problem regardless of corpus size, and the
    * tie-aware numerator `Σ_s pos_s·(2·cumneg_<s + neg_s)` (twice the
    * concordant + tied/2 mass) is an exact BIGINT; AUC is one mirrored
    * divide by 2·P·N, 6 dp. The cumulative window runs over the
    * bounded score histogram — never corpus rows (enrolled in the
    * PlanSpec allowlist with exactly that argument).
    */
  def logisticAuc(d: DataFrame, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, b0, b1, b2) = irlsBetas(d, rounds)
    val hist = d.select(gridPosterior(b0, b1, b2).as("s"), col("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos"),
        sum(lit(1L) - col("y")).as("neg"))
    val aucW = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = hist
      .withColumn("cumneg",
        coalesce(sum(col("neg")).over(aucW), lit(0L)))
      .select((col("pos") * (lit(2L) * col("cumneg") + col("neg")))
        .as("num2"), col("pos"), col("neg"))
    terms.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("num2")).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double")), 6).as("auc"))
  }

  /** Q257: the PRECISION/RECALL CURVE of the IRLS model — one row per
    * DISTINCT grid score s, reading "classify positive at threshold
    * ≥ s": tp/fp from suffix-cumulative sums over the bounded
    * (score, label) histogram (the q256 device — ≤ 1e6+1 rows by
    * construction, never corpus rows), precision/recall as mirrored
    * 6-dp divides. The threshold-picking table a deployment reads
    * after the q256 scalar.
    */
  def logisticPrCurve(d: DataFrame, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, b0, b1, b2) = irlsBetas(d, rounds)
    val hist = d.select(gridPosterior(b0, b1, b2).as("s"), col("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    // suffix sums: tp(s) = positives with score >= s
    val prW = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("pos")).as("p_all"),
      sum(col("neg")).as("n_all"))
    hist
      .withColumn("tp", sum(col("pos")).over(prW))
      .withColumn("fp", sum(col("neg")).over(prW))
      .crossJoin(broadcast(tot))
      .select(col("s").as("threshold"), col("tp"), col("fp"),
        (col("p_all") - col("tp")).as("fn"),
        round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6).as("prec"),
        round(col("tp").cast("double") / col("p_all").cast("double"), 6)
          .as("rec"))
  }

  /** The q257 wrapper on the q254 segment model. */
  def logitSegmentPrCurve(customer: DataFrame, rounds: Int = 3): DataFrame =
    logisticPrCurve(segmentFeatures(customer), rounds)

  /** The q254 wrapper: P(mktsegment = BUILDING | acctbal, nation) on
    * the customer table — acctbal in integer thousands, nationkey as
    * the second feature.
    */
  def logitSegmentModel(customer: DataFrame, rounds: Int = 3): DataFrame =
    logisticFit2(segmentFeatures(customer), rounds)

  /** The q256 wrapper: in-sample AUC of the q254 segment model. */
  def logitSegmentAuc(customer: DataFrame, rounds: Int = 3): DataFrame =
    logisticAuc(segmentFeatures(customer), rounds)

  private def segmentFeatures(customer: DataFrame): DataFrame =
    customer.select(
      round(col("c_acctbal") / lit(1000.0)).cast("long").as("x1"),
      col("c_nationkey").cast("long").as("x2"),
      when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
        .as("y"))

  /** The q252 wrapper: the q250 price model under ridge λ = 1e6 —
    * large enough to move the 6-dp coefficients on this design
    * (non-vacuous oracle), small against s11/s22 so the fit stays
    * recognizable.
    */
  def ridgePriceModel(lineitem: DataFrame,
      lambda: Double = 1000000.0): DataFrame =
    ridgeFit2(lineitem.select(
      round(col("l_quantity")).cast("long").as("x1"),
      round(lit(100.0) * col("l_discount")).cast("long").as("x2"),
      round(lit(100.0) * col("l_extendedprice")).cast("long").as("y")),
      lambda)

  /** Q284: HUBER ROBUST REGRESSION via IRLS — the M-estimator fit a
    * pipeline reaches for when q250's OLS chases outliers but q263's
    * rank methods are too blunt for a multi-feature model: rows with
    * |residual| ≤ k keep weight 1, heavier ones decay as k/|e|
    * (bounded influence). Initialized at the unweighted OLS solution
    * (one scan), then `rounds` reweighted normal-equation solves.
    *
    * Cross-engine grid: weights are `round(1e6·min(1, k/|e|))`
    * integers from IEEE-identical residual doubles (the q254
    * posterior-grid precedent), so every weighted moment sum is exact
    * DECIMAL(38,0) over per-row LONG products and the Cramer solve
    * (the fixed det3 shape, mirrored verbatim) sees identical doubles.
    *
    * 100-TB shape: rounds+2 scans, zero shuffles beyond the scalar
    * aggregation's partial-merge, driver state = 3 doubles.
    */
  def huberFit2(d: DataFrame, k: Double = 500000.0, rounds: Int = 3)
      : DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    require(k > 0.0 && k.isFinite, s"bad k: $k")
    val spark = d.sparkSession
    import spark.implicits._
    def dec(c: Column) = c.cast("decimal(38,0)")
    // r19 (guide §6, VERDICT r18 item 5): the fit runs rounds+2
    // SEQUENTIAL scans (the data dependency is inherent — each round's
    // weights need the previous betas), and each scan re-read the
    // source parquet + re-ran the projection. Pin the three projected
    // long columns once; every moment aggregate below reads the pinned
    // blocks. Values unchanged — the pin only deduplicates evaluation.
    // keyed compute repartition BEFORE the pin: the projection inherits
    // the scan's handful of split partitions (3 at sf0.1 under the 4 MB
    // bench splits), so every aggregate pass would run 3-wide on a
    // CPU-heavy decimal-moment kernel; the pinned blocks carry the
    // session parallelism instead. Decimal/count moments are
    // order-independent, so values are unchanged.
    val dp = Pinning.pin(Hashing.repartitionForCompute(
      d.select(col("x1"), col("x2"), col("y")), "y"))
    // init: the unweighted OLS solution
    val m0 = moments(dp).map(_.doubleValue())
    val Array(n0, s1, s2, s11, s12, s22, sy, s1y, s2y) = m0
    val det = det3(n0, s1, s2, s1, s11, s12, s2, s12, s22)
    require(det != 0.0, "huberFit2: singular design matrix")
    var b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    var b1 = det3(n0, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    var b2 = det3(n0, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    def wgCol(cb0: Double, cb1: Double, cb2: Double): Column = {
      val e = col("y").cast("double") - (lit(cb0) +
        lit(cb1) * col("x1").cast("double") +
        lit(cb2) * col("x2").cast("double"))
      round(lit(1000000.0) * when(abs(e) <= lit(k), lit(1.0))
        .otherwise(lit(k) / abs(e))).cast("long")
    }
    for (_ <- 1 to rounds) {
      val row = dp.select(col("x1"), col("x2"), col("y"),
          wgCol(b0, b1, b2).as("wg"))
        .agg(
          sum(dec(col("wg"))).as("sw"),
          sum(dec(col("wg") * col("x1"))).as("sw1"),
          sum(dec(col("wg") * col("x2"))).as("sw2"),
          sum(dec(col("wg") * col("x1") * col("x1"))).as("sw11"),
          sum(dec(col("wg") * col("x1") * col("x2"))).as("sw12"),
          sum(dec(col("wg") * col("x2") * col("x2"))).as("sw22"),
          sum(dec(col("wg") * col("y"))).as("swy"),
          sum(dec(col("wg") * col("x1") * col("y"))).as("sw1y"),
          sum(dec(col("wg") * col("x2") * col("y"))).as("sw2y"))
        .collect().head
      val m = Array.tabulate(9)(i => row.getDecimal(i).doubleValue())
      val Array(sw, sw1, sw2, sw11, sw12, sw22, swy, sw1y, sw2y) = m
      val dw = det3(sw, sw1, sw2, sw1, sw11, sw12, sw2, sw12, sw22)
      require(dw != 0.0, "huberFit2: singular IRLS system")
      b0 = det3(swy, sw1, sw2, sw1y, sw11, sw12, sw2y, sw12, sw22) / dw
      b1 = det3(sw, swy, sw2, sw1, sw1y, sw12, sw2, sw2y, sw22) / dw
      b2 = det3(sw, sw1, swy, sw1, sw11, sw1y, sw2, sw12, sw2y) / dw
    }
    // final observability pass: how many rows the loss downweighted
    val fin = dp.select(wgCol(b0, b1, b2).as("wg"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("wg") < lit(1000000L), lit(1L)).otherwise(lit(0L)))
          .as("nd"))
      .collect().head
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(dp)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((fin.getLong(0), fin.getLong(1), r6(b0), r6(b1), r6(b2)))
      .toDF("n_rows", "n_downweighted", "b0", "b1", "b2")
  }

  /** The q284 wrapper: the q250 price model under the Huber loss. */
  def huberPriceModel(lineitem: DataFrame): DataFrame =
    huberFit2(lineitem.select(
      round(col("l_quantity")).cast("long").as("x1"),
      round(lit(100.0) * col("l_discount")).cast("long").as("x2"),
      round(lit(100.0) * col("l_extendedprice")).cast("long").as("y")))

  /** Q337: GOLDFELD–QUANDT HETEROSKEDASTICITY TEST — does the price
    * model's residual VARIANCE grow with quantity (the assumption
    * q250's OLS standard errors silently make)? Deterministic
    * value-split variant: the low/high regimes are x ≤ P33 / x ≥ P67
    * of the quantity grid (exact `percentile_disc` elements, the q288
    * precedent — row-rank splits tie-break ambiguously), a simple OLS
    * y ~ 1 + x per regime from conditional exact moments (the q321
    * 2×2-Cramer SSE shape), and F = (SSE_hi/(n_hi−2))/(SSE_lo/(n_lo−2))
    * — variance rising with x gives F > 1. NaN on a degenerate regime
    * (det = 0, n ≤ 2) or a zero low-side SSE.
    */
  def goldfeldQuandt(lineitem: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val base = lineitem.select(
      round(col("l_quantity")).cast("long").as("x"),
      round(lit(100.0) * col("l_extendedprice")).cast("long").as("y"))
    val cuts = base.agg(
      expr("percentile_disc(0.3333) WITHIN GROUP (ORDER BY x)")
        .as("p33"),
      expr("percentile_disc(0.6667) WITHIN GROUP (ORDER BY x)")
        .as("p67"))
    def side(cond: Column, c: Column): Column =
      sum(dec(when(cond, c).otherwise(lit(0L))))
    val sums = base.crossJoin(broadcast(cuts))
      .withColumn("lo", col("x") <= col("p33"))
      .withColumn("hi", col("x") >= col("p67"))
      .agg(
        sum(when(col("lo"), lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(col("hi"), lit(1L)).otherwise(lit(0L))).as("n2"),
        side(col("lo"), col("x")).as("sx1"),
        side(col("hi"), col("x")).as("sx2"),
        side(col("lo"), col("x") * col("x")).as("sxx1"),
        side(col("hi"), col("x") * col("x")).as("sxx2"),
        side(col("lo"), col("y")).as("sy1"),
        side(col("hi"), col("y")).as("sy2"),
        side(col("lo"), col("x") * col("y")).as("sxy1"),
        side(col("hi"), col("x") * col("y")).as("sxy2"),
        side(col("lo"), col("y") * col("y")).as("syy1"),
        side(col("hi"), col("y") * col("y")).as("syy2"))
    def d(name: String): Column = col(name).cast("double")
    def sse(n: Column, sx: Column, sxx: Column, sy: Column,
        sxy: Column, syy: Column): Column = {
      val det = n * sxx - sx * sx
      when(det === 0.0, lit(Double.NaN)).otherwise(
        syy - ((sy * sxx - sxy * sx) / det * sy +
          (n * sxy - sx * sy) / det * sxy))
    }
    sums
      .withColumn("sse1", sse(d("n1"), d("sx1"), d("sxx1"), d("sy1"),
        d("sxy1"), d("syy1")))
      .withColumn("sse2", sse(d("n2"), d("sx2"), d("sxx2"), d("sy2"),
        d("sxy2"), d("syy2")))
      .select(col("n1").as("n_lo"), col("n2").as("n_hi"),
        round(when(col("n1") <= 2L || col("n2") <= 2L ||
            isnan(col("sse1")) || isnan(col("sse2")) ||
            col("sse1") <= 0.0, lit(Double.NaN))
          .otherwise((col("sse2") / (d("n2") - lit(2.0))) /
            (col("sse1") / (d("n1") - lit(2.0)))), 6).as("gq_f"))
  }

  /** Q338: BREUSCH–PAGAN LM TEST on the q250 price model — the
    * REGRESSION-shaped heteroskedasticity test (which REGRESSOR drives
    * the variance, not just "does it rise with x"): fit
    * y ~ 1 + x1 + x2 IN-PLAN (the groupedOls2 column-expression
    * Cramer over one moments row), broadcast β back onto the rows,
    * grid the residual to integer cents (identical doubles → identical
    * grid longs in both engines), and regress e² on (x1, x2) with a
    * second exact-moment pass; LM = n·R² ~ χ²(2). Both aggregations
    * are one scan each; no driver loop (the β's are column literals in
    * the plan, not collected). NaN on a singular design or degenerate
    * aux variance.
    */
  def breuschPagan(lineitem: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def d(name: String): Column = col(name).cast("double")
    // r19 (guide §6/§2, measured): the beta-moment and residual-moment
    // aggregates each re-scanned parquet on the scan's 3 split
    // partitions (two ~1 s 3-task stages at sf0.1). One pinned,
    // compute-repartitioned projection feeds both; decimal/count sums
    // are order-independent so values are unchanged.
    val base = Pinning.pin(Hashing.repartitionForCompute(
      lineitem.select(
        round(col("l_quantity")).cast("long").as("x1"),
        round(lit(100.0) * col("l_discount")).cast("long").as("x2"),
        round(lit(100.0) * col("l_extendedprice")).cast("long").as("y")),
      "y"))
    val m = base.agg(
        count(lit(1)).as("nl"),
        sum(dec(col("x1"))).as("s1d"), sum(dec(col("x2"))).as("s2d"),
        sum(dec(col("x1")) * col("x1")).as("s11d"),
        sum(dec(col("x1")) * col("x2")).as("s12d"),
        sum(dec(col("x2")) * col("x2")).as("s22d"),
        sum(dec(col("y"))).as("syd"),
        sum(dec(col("x1")) * col("y")).as("s1yd"),
        sum(dec(col("x2")) * col("y")).as("s2yd"))
      .select(col("nl"), col("nl").cast("double").as("n"),
        d("s1d").as("s1"), d("s2d").as("s2"), d("s11d").as("s11"),
        d("s12d").as("s12"), d("s22d").as("s22"), d("syd").as("sy"),
        d("s1yd").as("s1y"), d("s2yd").as("s2y"))
    def det3c(a: Column, b: Column, c: Column, d0: Column, e: Column,
        f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d0 * i - f * g) + c * (d0 * h - e * g)
    val beta = m
      .withColumn("det", det3c(col("n"), col("s1"), col("s2"),
        col("s1"), col("s11"), col("s12"), col("s2"), col("s12"),
        col("s22")))
      .withColumn("b0", when(col("det") === 0.0, lit(Double.NaN))
        .otherwise(det3c(col("sy"), col("s1"), col("s2"), col("s1y"),
          col("s11"), col("s12"), col("s2y"), col("s12"),
          col("s22")) / col("det")))
      .withColumn("b1", when(col("det") === 0.0, lit(Double.NaN))
        .otherwise(det3c(col("n"), col("sy"), col("s2"), col("s1"),
          col("s1y"), col("s12"), col("s2"), col("s2y"),
          col("s22")) / col("det")))
      .withColumn("b2", when(col("det") === 0.0, lit(Double.NaN))
        .otherwise(det3c(col("n"), col("s1"), col("sy"), col("s1"),
          col("s11"), col("s1y"), col("s2"), col("s12"),
          col("s2y")) / col("det")))
      .select(col("b0"), col("b1"), col("b2"))
    // residual on the integer cents grid: identical β doubles give
    // identical grid longs in both engines (the q250 round discipline)
    val resid = base.crossJoin(broadcast(beta))
      .withColumn("u", {
        val e = col("y").cast("double") -
          (col("b0") + col("b1") * col("x1").cast("double") +
            col("b2") * col("x2").cast("double"))
        // singular design: betas are NaN and NaN cannot ANSI-cast to
        // BIGINT — force u = 0 so every u2 is 0, which drives sst to 0
        // downstream and the final bp_lm guard to the documented NaN
        // (ADVICE r17)
        when(isnan(col("b0")), lit(0L)).otherwise(round(e).cast("long"))
      })
      .select(col("x1"), col("x2"),
        (col("u") * col("u")).as("u2"))
    val a = resid.agg(
        count(lit(1)).as("nl"),
        sum(dec(col("x1"))).as("s1d"), sum(dec(col("x2"))).as("s2d"),
        sum(dec(col("x1")) * col("x1")).as("s11d"),
        sum(dec(col("x1")) * col("x2")).as("s12d"),
        sum(dec(col("x2")) * col("x2")).as("s22d"),
        sum(dec(col("u2"))).as("syd"),
        sum(dec(col("x1")) * col("u2")).as("s1yd"),
        sum(dec(col("x2")) * col("u2")).as("s2yd"),
        sum(dec(col("u2")) * col("u2")).as("syyd"))
      .select(col("nl"), col("nl").cast("double").as("n"),
        d("s1d").as("s1"), d("s2d").as("s2"), d("s11d").as("s11"),
        d("s12d").as("s12"), d("s22d").as("s22"), d("syd").as("sy"),
        d("s1yd").as("s1y"), d("s2yd").as("s2y"), d("syyd").as("syy"))
    a
      .withColumn("det", det3c(col("n"), col("s1"), col("s2"),
        col("s1"), col("s11"), col("s12"), col("s2"), col("s12"),
        col("s22")))
      .withColumn("bb0", det3c(col("sy"), col("s1"), col("s2"),
        col("s1y"), col("s11"), col("s12"), col("s2y"), col("s12"),
        col("s22")))
      .withColumn("bb1", det3c(col("n"), col("sy"), col("s2"),
        col("s1"), col("s1y"), col("s12"), col("s2"), col("s2y"),
        col("s22")))
      .withColumn("bb2", det3c(col("n"), col("s1"), col("sy"),
        col("s1"), col("s11"), col("s1y"), col("s2"), col("s12"),
        col("s2y")))
      .withColumn("sst", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("sse",
        when(col("det") === 0.0, lit(Double.NaN)).otherwise(
          col("syy") - (col("bb0") / col("det") * col("sy") +
            col("bb1") / col("det") * col("s1y") +
            col("bb2") / col("det") * col("s2y"))))
      .select(col("nl").as("n_rows"),
        round(when(isnan(col("sse")) || col("sst") <= 0.0,
            lit(Double.NaN))
          .otherwise(col("n") * (lit(1.0) - col("sse") / col("sst"))),
          6).as("bp_lm"))
  }
}
