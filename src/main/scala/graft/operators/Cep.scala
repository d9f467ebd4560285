package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generalized complex-event-processing (CEP) pattern matching with
  * NEGATION and REPETITION — "A then B+ then C without D in W" and
  * arbitrary longer chains — the declarative form of what
  * [[Relational.funnel]] computes for one fixed positive sequence. The
  * reference engine's join topology (clicked/missed displays) is the
  * 2-step special case; this is the n-step generalization a
  * training-data pipeline uses for interaction mining ("view then
  * purchase with no support ticket between").
  *
  * Pattern language: a list of [[Cep.CepStep]]s. Step 0 anchors a match
  * at EVERY event of its type (per-anchor semantics — overlapping
  * matches from different anchors all emit, which keeps the operator a
  * pure relational expression). Each later step matches the EARLIEST
  * completion of its type strictly after the previous step's time and
  * within `windowHours` of the anchor; the step's `without` types VETO
  * the match if any such event falls STRICTLY between the previous
  * step's time and this step's matched time (earliest-completion-then-
  * veto — the veto applies to the gap the match actually used, not to
  * every hypothetical completion).
  *
  * REPETITION (Kleene) steps: `minReps`/`maxReps` quantify a step —
  * "B{2,3}" is `CepStep("B", minReps = 2, maxReps = Some(3))`, Kleene
  * plus is `minReps = 1, maxReps = None` with minReps > 1 ≡ "B{m,}".
  * Semantics, kept deterministic and aggregate-shaped:
  *  - the step COMPLETES at the minReps-th occurrence of its type
  *    strictly after the previous step (earliest completion of the
  *    required repetitions); the gap veto applies to
  *    (t_prev, t_complete) exactly as for plain steps;
  *  - `n{i}_reps` reports the FULL run length: occurrences in
  *    (t_prev, anchor + W];
  *  - a bounded `maxReps` is a CEILING ON THE NEXT STEP: the next
  *    step's completion must land strictly before the (maxReps+1)-th
  *    occurrence — i.e. at the moment the chain moves on, the run must
  *    not have exceeded maxReps ("two-to-three clicks then purchase"
  *    fails on a fourth click before the purchase).
  *
  * Exactness: times are integer epoch micros; "earliest" / "m-th
  * earliest" are integer order statistics of a sorted per-key
  * aggregate; vetoes and ceilings are integer strict inequalities — the
  * oracle mirrors each step as one aggregate join plus one NOT EXISTS
  * per veto type, bit-identical. Step types are assumed pairwise
  * distinct (shared types make "which step does this event serve"
  * ambiguous in any CEP formalism).
  *
  * Scale: per plain step ONE equi-join on user_id (type filters pushed
  * to the scan) + one min-aggregate; per repetition step the same join
  * with a sorted-list aggregate whose length is the user's event count
  * of ONE type inside ONE window — the per-user-rate envelope of the
  * funnel/attribution family, not corpus-scale; per veto type one
  * anti-join on user_id. All joins share the user_id partitioning, so
  * the exchange is reused down the chain.
  */
object Cep {

  /** One pattern step: match the `minReps`-th event of `tpe` (1 = the
    * earliest, the plain-step case); veto the match if any event of a
    * `without` type falls strictly inside the gap this step closes;
    * `maxReps` bounds the run as a ceiling on the NEXT step (see object
    * doc). `without` on step 0 is meaningless and must be empty.
    */
  case class CepStep(tpe: String, without: Seq[String] = Nil,
      minReps: Int = 1, maxReps: Option[Int] = None) {
    require(minReps >= 1, s"minReps must be >= 1, got $minReps")
    require(maxReps.forall(_ >= minReps),
      s"maxReps below minReps: $this")
  }

  /** Match `steps` per user over an events table with columns
    * (user_id, event_id, event_type, ts). Emits one row per completed
    * match: user_id, anchor_id (event_id of the step-0 event),
    * t0_us..t{n-1}_us epoch-micro times of each step's completion, and
    * n{i}_reps run lengths for each quantified step i.
    */
  def matchPattern(events: DataFrame, steps: Seq[CepStep],
      windowHours: Int = 24): DataFrame = {
    require(steps.size >= 2, s"need >= 2 steps, got ${steps.size}")
    require(steps.head.without.isEmpty,
      "step 0 anchors the match; it has no gap to veto")
    require(steps.head.minReps == 1 && steps.head.maxReps.isEmpty,
      "step 0 anchors at every event; quantify a later step instead")
    require(windowHours >= 1, s"bad window: $windowHours")
    val wUs = windowHours * 3600L * 1000000L
    def ofType(t: String) = events.filter(col("event_type") === t)
    var m = ofType(steps.head.tpe)
      .select(col("user_id"), col("event_id").as("anchor_id"),
        unix_micros(col("ts")).as("t0_us"))
    var keep = Seq("user_id", "anchor_id", "t0_us")
    var prevCeil: Option[String] = None
    for (i <- 1 until steps.size) {
      val st = steps(i)
      val prev = s"t${i - 1}_us"
      val cur = s"t${i}_us"
      val nxt = ofType(st.tpe)
        .select(col("user_id"), unix_micros(col("ts")).as("__t"))
      val joined = m.join(nxt, Seq("user_id"))
        .filter(col("__t") > col(prev) &&
          col("__t") <= col("t0_us") + lit(wUs))
      m = if (st.minReps == 1 && st.maxReps.isEmpty) {
        // plain step: map-side-combinable min, no per-key buffering
        joined.groupBy(keep.map(col): _*).agg(min(col("__t")).as(cur))
      } else {
        // quantified step: the m-th order statistic of the run —
        // sorted-list aggregate bounded by one user's one-type events
        // inside one window
        val g = joined.groupBy(keep.map(col): _*)
          .agg(sort_array(collect_list(col("__t"))).as("__ts"))
          .filter(size(col("__ts")) >= st.minReps)
          .withColumn(cur, element_at(col("__ts"), st.minReps))
          .withColumn(s"n${i}_reps", size(col("__ts")).cast("long"))
        st.maxReps.fold(g) { mx =>
          g.withColumn(s"__ceil$i",
            when(size(col("__ts")) > mx, element_at(col("__ts"), mx + 1)))
        }.drop("__ts")
      }
      keep = keep :+ cur
      if (st.minReps > 1 || st.maxReps.isDefined)
        keep = keep :+ s"n${i}_reps"
      // the previous step's run ceiling binds THIS completion: the
      // chain must move on before the (maxReps+1)-th repetition
      prevCeil.foreach { c =>
        m = m.filter(col(c).isNull || col(cur) < col(c)).drop(c)
        keep = keep.filterNot(_ == c)
      }
      prevCeil = st.maxReps.map(_ => s"__ceil$i")
      prevCeil.foreach { c => keep = keep :+ c }
      for (neg <- st.without) {
        val veto = ofType(neg)
          .select(col("user_id").as("__vu"),
            unix_micros(col("ts")).as("__tc"))
        m = m.join(veto,
          m("user_id") === veto("__vu") &&
            veto("__tc") > m(prev) && veto("__tc") < m(cur),
          "left_anti")
      }
    }
    // a ceiling on the final step has nothing left to bind
    prevCeil.foreach { c => m = m.drop(c) }
    m
  }
}
