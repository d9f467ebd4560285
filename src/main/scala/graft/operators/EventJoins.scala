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
      key: String,
      leftTs: String,
      rightTs: String,
      lower: Column,
      upper: Column,
      joinType: String = "inner"): DataFrame = {
    val cond = left(key) === right(key) &&
      right(rightTs) >= left(leftTs) + lower &&
      right(rightTs) <= left(leftTs) + upper
    left.join(right, cond, joinType)
  }

  private def interval(w: String): Column = expr(s"INTERVAL $w")

  /** Q1: clicks inner-interval-joined to preceding views (same user, view in
    * `[click.ts - W, click.ts]`). Output one row per matched (view, click)
    * pair.
    */
  def clickedDisplays(events: DataFrame, window: String = "1 HOUR"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    clicks.join(
        views,
        clicks("user_id") === views("v_user_id") &&
          views("view_ts") >= clicks("click_ts") - interval(window) &&
          views("view_ts") <= clicks("click_ts"),
        "inner")
      .select(col("user_id"), col("view_id"), col("click_id"), col("view_ts"), col("click_ts"))
  }

  /** Q2: views with no click by the same user in `[view.ts, view.ts + W]` —
    * the reference's "emit an event when no-join occurred" (`README.md:19`),
    * expressed directly as a left-anti interval join (SURVEY O8+O9 ≡ anti).
    */
  def missedDisplays(events: DataFrame, window: String = "1 HOUR"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    views.join(
        clicks,
        views("user_id") === clicks("c_user_id") &&
          clicks("click_ts") >= views("ts") &&
          clicks("click_ts") <= views("ts") + interval(window),
        "left_anti")
  }

  /** Q2 alternative formulation mirroring the reference's own topology
    * (left-outer join + right-is-null filter + projection,
    * `TimeoutJoinTest.scala:82-92`) — semantically identical to
    * [[missedDisplays]]; kept for the streaming lift where left-outer +
    * isNull matches the reference's output shape.
    */
  def missedDisplaysOuter(events: DataFrame, window: String = "1 HOUR"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    views.join(
        clicks,
        views("user_id") === clicks("c_user_id") &&
          clicks("click_ts") >= views("ts") &&
          clicks("click_ts") <= views("ts") + interval(window),
        "left_outer")
      .filter(col("c_user_id").isNull)
      .select(col("user_id"), col("event_id"), col("ts"))
      .distinct() // a view may out-join to nothing more than once only via nulls; distinct is a no-op here but documents set semantics
  }

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
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    views.join(
        clicks,
        views("user_id") === clicks("c_user_id") &&
          clicks("click_ts") >= views("ts") &&
          clicks("click_ts") <= views("ts") + interval(window),
        "left_semi")
      .select(col("event_id"))
      .withColumn("status", lit("joined"))
      .join(views, Seq("event_id"), "right_outer")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        coalesce(col("status"), lit("missed")).as("status"))
  }
}
