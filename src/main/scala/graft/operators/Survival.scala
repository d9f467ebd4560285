package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q209: SURVIVAL ANALYSIS over event streams — time-to-conversion
  * with RIGHT-CENSORING, the question the funnel (q166) and retention
  * (q71) views both dodge: users who haven't converted YET are not
  * failures, they are censored observations, and dropping them biases
  * every latency estimate downward. Estimator: NELSON–AALEN cumulative
  * hazard H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ (the counting-process sibling of
  * Kaplan–Meier), chosen deliberately because it is INTEGER-EXACT on
  * the micro grid: each step is one `(d·10⁶) div n` and the curve is a
  * plain integer cumulative sum — no exp/log parity risk at all.
  * (Kaplan–Meier's running product is kept off libm too — see
  * [[kaplanMeier]]'s micro-grid recurrence, q236.)
  *
  * Semantics: a user enters at their FIRST event (day 0), converts at
  * their first `convType` event, else censors at the corpus's last
  * observed day. Durations are whole days; censored users leave the
  * risk set after their censor day; deaths and censorings AT t are
  * both in the risk set at t (the standard convention).
  *
  * Scale: one corpus shuffle to per-user (day0, conversion day); the
  * observation end is a one-row broadcast; everything after — the
  * duration histogram, the suffix-sum risk sets, the cumulative
  * hazard — runs over AT MOST one row per distinct duration day,
  * which the observation window bounds (a 100-TB corpus spanning 3
  * years has ~1100 rows here). The two global windows sit above that
  * aggregate by construction (enrolled in PlanSpec's allowlist).
  */
object Survival {

  def nelsonAalenHazard(events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val ed = datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
    val perUser = events
      .groupBy(col("user_id"))
      .agg(min(ed).as("day0"),
        min(when(col("event_type") === convType, ed)).as("pday"))
    val obsEnd = events.agg(max(ed).as("obs_end"))
    val durations = perUser.crossJoin(broadcast(obsEnd))
      .select(
        when(col("pday").isNotNull, col("pday") - col("day0"))
          .otherwise(col("obs_end") - col("day0")).as("t"),
        col("pday").isNotNull.cast("long").as("ev"))
    val byT = durations.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at_t"), sum(col("ev")).as("d"))
    // risk set = suffix sum over the (bounded) duration-day histogram
    val riskW = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hazW = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("n_at_t")).over(riskW))
      .filter(col("d") > 0)
      .withColumn("hazard_step_micros", expr("(d * 1000000L) div n_risk"))
      .withColumn("cum_hazard_micros",
        sum(col("hazard_step_micros")).over(hazW))
      .select(col("t"), col("n_risk"), col("d").as("d_events"),
        col("hazard_step_micros"), col("cum_hazard_micros"))
  }

  /** Q328: TWO-GROUP LOG-RANK TEST — does one cohort convert FASTER,
    * judged on the whole survival curve (the hypothesis-test companion
    * of q209/q236, which only estimate)? Cohorts are the id-parity
    * split (`user_id % 2` — the deterministic hash-assignment an A/B
    * harness actually uses); entry/censoring semantics are exactly
    * [[nelsonAalenHazard]]'s. One conditional aggregation builds the
    * per-duration-day two-group table (t, na_at, da, nb_at, db); the
    * per-group risk sets are suffix sums over that bounded histogram
    * (the enrolled riskW site); each event day's O−E and variance
    * terms — d_a − d·n_a/n and d·(n_a/n)(1−n_a/n)(n−d)/(n−1) — are
    * mirrored doubles on the ×1e9 grid (the q290 device), summed in
    * DECIMAL, z in one mirrored expression (NaN when V ≤ 0; an n=1
    * day contributes 0 variance by the standard convention).
    */
  def logRank(events: DataFrame, convType: String = "purchase")
      : DataFrame = {
    val ed = datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
    val perUser = events
      .groupBy(col("user_id"))
      .agg(min(ed).as("day0"),
        min(when(col("event_type") === convType, ed)).as("pday"))
    val obsEnd = events.agg(max(ed).as("obs_end"))
    val durations = perUser.crossJoin(broadcast(obsEnd))
      .select(pmod(col("user_id").cast("long"), lit(2L)).as("g"),
        when(col("pday").isNotNull, col("pday") - col("day0"))
          .otherwise(col("obs_end") - col("day0")).as("t"),
        col("pday").isNotNull.cast("long").as("ev"))
    val byT = durations.groupBy(col("t"))
      .agg(
        sum(when(col("g") === 0L, lit(1L)).otherwise(lit(0L)))
          .as("na_at"),
        sum(when(col("g") === 0L, col("ev")).otherwise(lit(0L)))
          .as("da"),
        sum(when(col("g") === 1L, lit(1L)).otherwise(lit(0L)))
          .as("nb_at"),
        sum(when(col("g") === 1L, col("ev")).otherwise(lit(0L)))
          .as("db"))
    val riskW = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dd(name: String): Column = col(name).cast("double")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    byT
      .withColumn("nra", sum(col("na_at")).over(riskW))
      .withColumn("nrb", sum(col("nb_at")).over(riskW))
      .withColumn("nt", col("nra") + col("nrb"))
      .withColumn("dt", col("da") + col("db"))
      .filter(col("dt") > 0L)
      .withColumn("oe_g",
        round((dd("da") - dd("dt") * dd("nra") / dd("nt")) *
          lit(1.0e9)).cast("long"))
      .withColumn("v_g",
        when(col("nt") <= 1L, lit(0L)).otherwise(
          round(dd("dt") * (dd("nra") / dd("nt")) *
            (lit(1.0) - dd("nra") / dd("nt")) *
            (dd("nt") - dd("dt")) / (dd("nt") - lit(1.0)) *
            lit(1.0e9)).cast("long")))
      .agg(sum(col("da")).as("events_a"), sum(col("db")).as("events_b"),
        sum(dec(col("oe_g"))).as("oe"),
        sum(dec(col("v_g"))).as("v"))
      .select(col("events_a"), col("events_b"),
        round(when(col("v").cast("double") <= 0.0, lit(Double.NaN))
          .otherwise(col("oe").cast("double") /
            sqrt(col("v").cast("double") * lit(1.0e9))), 6)
          .as("z_score"))
  }

  /** Q236: KAPLAN–MEIER product-limit survival curve — the direct
    * survival-probability companion of [[nelsonAalenHazard]] (same
    * entry/censoring semantics, same risk sets): S(t) = Π_{tᵢ≤t}
    * (1 − dᵢ/nᵢ). The running product is kept INTEGER-EXACT — no
    * exp/ln parity risk — by the micro-grid recurrence
    * {{{ S₀ = 10⁶;  Sᵢ = (Sᵢ₋₁ · (nᵢ − dᵢ)) div nᵢ }}}
    * which the driver folds over the duration-day table (bounded by
    * the observation window — the q209 argument; capped collect via
    * [[DriverTables.collectCapped]]) and the oracle replays with a
    * recursive CTE. Floor division per step, documented contract:
    * S is a ≤1-ULP-per-step UNDER-estimate on the 1e-6 grid.
    *
    * Output: (t, n_risk, d_events, km_ppm) — one row per event day.
    */
  def kaplanMeier(events: DataFrame, convType: String = "purchase",
      maxSteps: Int = 100000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val steps = nelsonAalenHazard(events, convType)
      .select(col("t"), col("n_risk"), col("d_events"))
      .orderBy(col("t"))
    val rows = DriverTables.collectCapped(steps, maxSteps,
      "kaplanMeier duration-day table",
      "an observation window this long is not day-grained — coarsen t")
    var s = 1000000L
    val out = rows.map { r =>
      val (t, n, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      s = s * (n - d) / n
      (t, n, d, s)
    }
    out.toSeq.toDF("t", "n_risk", "d_events", "km_ppm")
  }
}
