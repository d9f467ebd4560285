package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a declared operator from SURVEY §2; entries
  * with a matching key in [[oracleSql]] are hash-checked against DuckDB
  * running that SQL over the same parquet tables (column names must match —
  * both sides alias identically).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventJoins.clickedDisplays(Tables.events(spark, "/root/testdata/sf0.001"), "1 HOUR")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_clicked_display" -> ((s, dir) =>
      EventJoins.clickedDisplays(Tables.events(s, dir), "1 HOUR")),
    "q2_missed_display" -> ((s, dir) =>
      EventJoins.missedDisplays(Tables.events(s, dir), "1 HOUR")),
    "q3_time_shift" -> ((s, dir) =>
      EventJoins.timeShift(Tables.events(s, dir), "ts", "1 HOUR", "events", "1h")),
    "q4_join_merge_json" -> ((s, dir) =>
      EventJoins.joinMergeJson(Tables.events(s, dir), "1 HOUR")),
    "q5_view_outcomes" -> ((s, dir) =>
      EventJoins.viewOutcomes(Tables.events(s, dir), "1 HOUR")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_clicked_display" ->
      """SELECT c.user_id AS user_id, v.event_id AS view_id, c.event_id AS click_id,
        |       v.ts AS view_ts, c.ts AS click_ts
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts""".stripMargin,
    "q2_missed_display" ->
      """SELECT v.user_id AS user_id, v.event_id AS event_id, v.ts AS ts
        |FROM events v
        |WHERE v.event_type = 'view'
        |  AND NOT EXISTS (
        |    SELECT 1 FROM events c
        |    WHERE c.event_type = 'click' AND c.user_id = v.user_id
        |      AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR)""".stripMargin,
    "q3_time_shift" ->
      """SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type,
        |       value, props, 'events.1h' AS stream
        |FROM events""".stripMargin,
    "q4_join_merge_json" ->
      """SELECT c.user_id AS user_id,
        |       '{"display":{"event_id":' || v.event_id || '},"click":{"event_id":' || c.event_id || '}}' AS payload
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts""".stripMargin,
    "q5_view_outcomes" ->
      """SELECT v.event_id AS event_id, v.user_id AS user_id, v.ts AS ts,
        |       CASE WHEN EXISTS (
        |         SELECT 1 FROM events c
        |         WHERE c.event_type = 'click' AND c.user_id = v.user_id
        |           AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR)
        |       THEN 'joined' ELSE 'missed' END AS status
        |FROM events v WHERE v.event_type = 'view'""".stripMargin,
  )
}
