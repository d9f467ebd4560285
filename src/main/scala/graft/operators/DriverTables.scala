package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Capped driver-table materialization — the repo-wide device for the
  * handful of operators that legitimately coordinate through a small
  * driver table (BPE merges, tokenizer vocabs, k-means codebooks).
  *
  * The contract, in order:
  *   1. bound FIRST — a `limit(cap+1).count()` probe job ships at most
  *      cap+1 rows to the driver and proves the table fits;
  *   2. only THEN `.collect()` the table.
  *
  * This is the eager-guard ordering the linkage block-occupancy check
  * pioneered (Linkage.scala — count before the pair join): on a
  * pathological corpus the probe fails loudly with the observed bound
  * instead of the driver OOMing while materializing the uncapped
  * result. The probe re-runs the producing plan once; callers that
  * care (all current ones) feed it a localCheckpoint'd or cheap input,
  * so the extra job costs one aggregation over already-reduced data.
  */
object DriverTables {

  /** Collect `df` after proving it holds between 1 and `cap` rows.
    * `what` names the table in failure messages; `hint` says what knob
    * to turn when the cap trips.
    */
  def collectCapped(df: DataFrame, cap: Int, what: String,
      hint: String): Array[Row] = {
    require(cap >= 1, s"$what: cap must be positive, got $cap")
    // Bound probe BEFORE materializing: limit keeps the driver-side
    // result at cap+1 rows no matter how oversized the table is.
    val probed = df.limit(cap + 1).count()
    require(probed > 0L, s"$what: empty — nothing to collect")
    require(probed <= cap,
      s"$what: more than $cap rows (probe saw $probed) — $hint")
    df.collect()
  }
}
