package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generalized complex-event-processing (CEP) pattern matching with
  * NEGATION — "A then B without C in W" and arbitrary longer chains —
  * the declarative form of what [[Relational.funnel]] computes for one
  * fixed positive sequence. The reference engine's join topology
  * (clicked/missed displays) is the 2-step special case; this is the
  * n-step generalization a training-data pipeline uses for interaction
  * mining ("view then purchase with no support ticket between").
  *
  * Pattern language: a list of [[Cep.CepStep]]s. Step 0 anchors a match
  * at EVERY event of its type (per-anchor semantics — overlapping
  * matches from different anchors all emit, which keeps the operator a
  * pure relational expression). Each later step matches the EARLIEST
  * event of its type strictly after the previous step's time and within
  * `windowHours` of the anchor; the step's `without` types VETO the
  * match if any such event falls STRICTLY between the previous step's
  * time and this step's matched time (earliest-completion-then-veto —
  * the veto applies to the gap the match actually used, not to every
  * hypothetical completion).
  *
  * Exactness: times are integer epoch micros; "earliest" is an integer
  * min; vetoes are integer strict inequalities — the oracle mirrors
  * each step as one min-aggregate join plus one NOT EXISTS per veto
  * type, bit-identical.
  *
  * Scale: per positive step ONE equi-join on user_id (type filters
  * pushed to the scan) + one min-aggregate; per veto type one anti-join
  * on user_id. All joins share the user_id partitioning, so the
  * exchange is reused down the chain. Per-user work is deg(stepᵢ) ×
  * matches — bounded by per-user event rates, the same envelope as the
  * funnel/attribution family; no corpus-sized fan-out.
  */
object Cep {

  /** One pattern step: match `tpe`; veto the match if any event of a
    * `without` type falls strictly inside the gap this step closes.
    * `without` on step 0 is meaningless and must be empty.
    */
  case class CepStep(tpe: String, without: Seq[String] = Nil)

  /** Match `steps` per user over an events table with columns
    * (user_id, event_id, event_type, ts). Emits one row per completed
    * match: user_id, anchor_id (event_id of the step-0 event), and
    * t0_us..t{n-1}_us epoch-micro times of each step.
    */
  def matchPattern(events: DataFrame, steps: Seq[CepStep],
      windowHours: Int = 24): DataFrame = {
    require(steps.size >= 2, s"need >= 2 steps, got ${steps.size}")
    require(steps.head.without.isEmpty,
      "step 0 anchors the match; it has no gap to veto")
    require(windowHours >= 1, s"bad window: $windowHours")
    val wUs = windowHours * 3600L * 1000000L
    def ofType(t: String) = events.filter(col("event_type") === t)
    var m = ofType(steps.head.tpe)
      .select(col("user_id"), col("event_id").as("anchor_id"),
        unix_micros(col("ts")).as("t0_us"))
    var keep = Seq("user_id", "anchor_id", "t0_us")
    for (i <- 1 until steps.size) {
      val prev = s"t${i - 1}_us"
      val cur = s"t${i}_us"
      val nxt = ofType(steps(i).tpe)
        .select(col("user_id"), unix_micros(col("ts")).as("__t"))
      m = m.join(nxt, Seq("user_id"))
        .filter(col("__t") > col(prev) &&
          col("__t") <= col("t0_us") + lit(wUs))
        .groupBy(keep.map(col): _*)
        .agg(min(col("__t")).as(cur))
      keep = keep :+ cur
      for (neg <- steps(i).without) {
        val veto = ofType(neg)
          .select(col("user_id").as("__vu"),
            unix_micros(col("ts")).as("__tc"))
        m = m.join(veto,
          m("user_id") === veto("__vu") &&
            veto("__tc") > m(prev) && veto("__tc") < m(cur),
          "left_anti")
      }
    }
    m
  }
}
