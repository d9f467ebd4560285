package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Resampling

/** Streaming duals of the q344/q345 resampling family — the
  * online-bagging reading of the Poisson bootstrap (Oza & Russell
  * 2001): each arriving row updates every replicate's cell
  * independently, so the replicate frame is one watermark-free
  * bounded-state sum aggregation (B+1 rows; the StreamingSketch /
  * twoGroupCellsStream discipline). Snapshot the cells and feed
  * [[graft.operators.Resampling.bootstrapCiFromCells]] /
  * [[graft.operators.Resampling.permutationTestFromCells]] — the batch
  * verdicts verbatim (StreamingResamplingSpec). A confidence interval
  * or permutation p-value that updates per micro-batch over an
  * unbounded stream, with state independent of stream length.
  */
object StreamingResampling {

  /** `(b, nw, sw)` bootstrap replicate cells over everything seen so
    * far; replicate 0 is the identity (the un-resampled totals).
    * State: bReps + 1 rows. */
  def bootstrapCellsStream(df: DataFrame, keyCol: Column,
      valueCol: Column, bReps: Int = 64): DataFrame =
    Resampling.bootstrapCells(
      df.select(keyCol.as("k"), valueCol.as("x")),
      col("k"), col("x"), bReps)

  /** `(s, n1, n0, s1, s0)` permutation cells over everything seen so
    * far; permutation 0 carries the TRUE group split. State:
    * nPerms + 1 rows. */
  def permCellsStream(df: DataFrame, keyCol: Column, isACol: Column,
      valueCol: Column, nPerms: Int = 100): DataFrame =
    Resampling.permCells(
      df.select(keyCol.as("k"), isACol.as("isA"), valueCol.as("x")),
      col("k"), col("isA"), col("x"), nPerms)
}
