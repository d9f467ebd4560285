package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Schema-checked JSON (the upgrade SURVEY §1.2 promises over the
  * reference's string-concat convention, `TimeoutJoinTest.scala:77`):
  * `from_json` with an explicit schema for parsing and `to_json(struct)`
  * for rendering — both codegen-friendly column expressions, both
  * oracle-checked against DuckDB's JSON functions (whose compact output
  * format matches Spark's byte-for-byte).
  */
object JsonOps {

  /** Q64: the MAP-type surface — parse `props` as a real `map<string,
    * bigint>` (schema-on-read, not a fixed struct: keys may vary row to
    * row), explode to (key, value) rows, and aggregate per key. At scale
    * the parse+explode is map-only; the single shuffle carries one partial
    * row per distinct key per partition.
    */
  def propsMapStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    events
      .select(explode(from_json(col("props"), MapType(StringType, LongType)))
        .as(Seq("k", "v")))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** Parse `props` with a declared schema and aggregate the extracted
    * field per event type.
    */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        count(col("k")).as("n_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Q1's merged payload rendered with real `to_json(struct(...))` instead
    * of string concatenation.
    */
  def joinMergeStructJson(events: DataFrame, window: String = "1 HOUR"): DataFrame =
    EventJoins.clickedDisplays(events, window)
      .select(
        col("user_id"),
        to_json(struct(col("view_id"), col("click_id"))).as("payload"))
}
