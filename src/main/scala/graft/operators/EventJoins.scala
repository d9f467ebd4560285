package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core capability, re-expressed Spark-first: keyed
  * event-time interval joins and their timeout (anti-join) dual.
  *
  * Reference semantics (cited from `/root/reference`):
  *  - clicked-display: for every click, the displays with the same key whose
  *    timestamp falls in `[click.ts - W, click.ts]`
  *    (`TimeoutJoinTest.scala:75-79`, `JoinWindows.of(..).before(W)`).
  *  - missed-display: every display with NO click of the same key in
  *    `[display.ts, display.ts + W]` (`TimeoutJoinTest.scala:82-92` — there a
  *    shifted left-outer join + isEmpty filter; here the batch-native
  *    formulation is a left-anti interval join, which Catalyst plans as one
  *    shuffle on the key with the range predicate evaluated join-side).
  *  - time-shift: re-emit records with timestamps shifted by W
  *    (`TopicShifter.scala:28-35`; we shift event time — SURVEY §7.4.2).
  *
  * Scale notes: both sides shuffle once on the join key (`user_id`); the
  * `event_type` filters are pushed into the parquet scan so each side reads
  * only its slice. No window-function or per-key sort is required, so the
  * plan is a single sort-merge (or shuffled-hash under AQE) join that
  * scales linearly with input and never materializes the full self-join.
  */
object EventJoins {

  /** Generic event-time interval join: rows of `left` matched with rows of
    * `right` sharing `key` and with `right.ts` in
    * `[left.ts + lower, left.ts + upper]` (bounds inclusive, matching Kafka
    * Streams `JoinWindows` inclusive semantics — `TimeoutJoinTest.scala:78,85`).
    *
    * `lower`/`upper` are SQL interval literals, e.g. "INTERVAL '1' HOUR".
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lower: Column,
      upper: Column,
      joinType: String = "inner"): DataFrame = {
    val cond = col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) + lower &&
      col(rightTs) <= col(leftTs) + upper
    left.join(right, cond, joinType)
  }

  private def interval(w: String): Column = expr(s"INTERVAL $w")
  private val zero: Column = expr("INTERVAL 0 SECOND")

  /** Views projection (`c_`-free names match the oracle outputs). */
  private def viewEvents(events: DataFrame) =
    events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))

  /** Clicks projection, renamed so self-join attributes stay unambiguous. */
  private def clickEvents(events: DataFrame) =
    events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("c_event_id"),
        col("ts").as("click_ts"))

  /** The shared after-window join: clicks with same user in
    * `[view.ts, view.ts + W]`, inclusive both ends (KS `JoinWindows.after`,
    * `TimeoutJoinTest.scala:85`) — Q2/Q5 vary only the join type.
    */
  private def afterWindowJoin(events: DataFrame, window: String, joinType: String): DataFrame =
    intervalJoin(viewEvents(events), clickEvents(events),
      "user_id", "c_user_id", "ts", "click_ts",
      lower = zero, upper = interval(window), joinType = joinType)

  /** Q1: clicks inner-interval-joined to preceding views (same user, view in
    * `[click.ts - W, click.ts]` — KS `JoinWindows.before`,
    * `TimeoutJoinTest.scala:78`). One row per matched (view, click) pair.
    */
  def clickedDisplays(events: DataFrame, window: String = "1 HOUR"): DataFrame =
    intervalJoin(
      clickEvents(events),
      viewEvents(events).select(col("user_id").as("v_user_id"),
        col("event_id").as("view_id"), col("ts").as("view_ts")),
      "c_user_id", "v_user_id", "click_ts", "view_ts",
      lower = -interval(window), upper = zero)
      .select(col("c_user_id").as("user_id"), col("view_id"),
        col("c_event_id").as("click_id"), col("view_ts"), col("click_ts"))

  /** Q2: views with no click by the same user in `[view.ts, view.ts + W]` —
    * the reference's "emit an event when no-join occurred" (`README.md:19`),
    * expressed directly as a left-anti interval join (SURVEY O8+O9 ≡ anti).
    */
  def missedDisplays(events: DataFrame, window: String = "1 HOUR"): DataFrame =
    afterWindowJoin(events, window, "left_anti")

  /** Q2 alternative formulation mirroring the reference's own topology
    * (left-outer join + right-is-null filter + projection,
    * `TimeoutJoinTest.scala:82-92`) — semantically identical to
    * [[missedDisplays]]; kept because the STREAMING lift must use this
    * shape (stream-stream LeftAnti is unsupported through Spark 4.1).
    */
  def missedDisplaysOuter(events: DataFrame, window: String = "1 HOUR"): DataFrame =
    afterWindowJoin(events, window, "left_outer")
      .filter(col("c_user_id").isNull)
      .select(col("user_id"), col("event_id"), col("ts"))
      .distinct() // a view out-joins at most once; documents set semantics

  /** Q3: event-time shift — identity on every column except `ts' = ts + W`,
    * with the derived-stream name `<name>.<W>` carried as a column (the
    * reference encodes lineage in topic names, `TopicShifter.scala:20`).
    */
  def timeShift(df: DataFrame, tsCol: String, window: String, streamName: String, suffix: String): DataFrame =
    df.withColumn(tsCol, col(tsCol) + interval(window))
      .withColumn("stream", lit(s"$streamName.$suffix"))

  /** Q4: Q1's output rendered as the reference's merged JSON payload
    * `{"display":<display>,"click":<click>}` (`TimeoutJoinTest.scala:77`).
    * The reference builds JSON by string concatenation; we do the same shape
    * deterministically (keys in fixed order) so the result is byte-stable
    * across engines.
    */
  def joinMergeJson(events: DataFrame, window: String = "1 HOUR"): DataFrame =
    clickedDisplays(events, window)
      .select(
        col("user_id"),
        concat(
          lit("""{"display":{"event_id":"""), col("view_id"),
          lit("""},"click":{"event_id":"""), col("click_id"),
          lit("}}")).as("payload"))

  /** Q5: unrelated-key isolation — classify every view as joined/missed under
    * the same-key window rule, demonstrating that clicks with a different key
    * neither join nor suppress the timeout (`TimeoutJoinTest.scala:146-164`).
    */
  def viewOutcomes(events: DataFrame, window: String = "1 HOUR"): DataFrame = {
    afterWindowJoin(events, window, "left_semi")
      .select(col("event_id"))
      .withColumn("status", lit("joined"))
      .join(viewEvents(events), Seq("event_id"), "right_outer")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        coalesce(col("status"), lit("missed")).as("status"))
  }
}
