package graft.operators

import org.apache.spark.sql.DataFrame
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
