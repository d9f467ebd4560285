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
