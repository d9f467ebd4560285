package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-plan data-quality observability (extends SURVEY O14's error channel
  * from failures to RUNNING health): `Dataset.observe` metric bundles
  * computed as accumulators while rows flow through the plan — row
  * counts, empty/null-text rates, dedup survivor counts — at ZERO extra
  * passes. A 100 TB pipeline is operated by these numbers: a scan that
  * reports 10⁹ ingested / 10⁹ empty is a dead upstream feed, caught in
  * the same job that would otherwise silently train on nothing.
  *
  * Batch: read `df.queryExecution.observedMetrics` after an action.
  * Streaming: the same observe node surfaces per-batch values in
  * `StreamingQueryProgress.observedMetrics`, captured by
  * [[graft.streaming.MetricsChannel]].
  */
object Observe {

  /** Text-corpus ingest health: row count, null/empty-text count, total
    * characters. Attach at the scan; read under the bundle `name`.
    */
  def textIngest(df: DataFrame, name: String, textCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col(textCol).isNull || length(col(textCol)) === 0, 1L)
        .otherwise(0L)).as("n_empty_text"),
      coalesce(sum(length(col(textCol)).cast("long")), lit(0L)).as("n_chars"))

  /** Stage survivor count — after a dedup/filter/decontamination stage,
    * `n_rows` tells how many rows the stage let through.
    */
  def survivors(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("n_rows"))
}
