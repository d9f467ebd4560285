package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins with hot keys. Spark already covers the
  * common cases — map-side partial aggregation absorbs group-by skew, and
  * AQE's skew-join rule splits oversized sort-merge partitions at runtime —
  * but a broadcast-ineligible join against a *hot-keyed* build side still
  * piles every probe row of one key onto one task. Salting fixes that
  * statically: scatter the probe side over `salt` sub-keys and replicate the
  * build side once per sub-key, trading `salt`× duplication of the build
  * side for `salt`-way parallelism on the hot keys.
  */
object Skew {

  /** Salted inner equi-join on `key`: `left` is the large/skewed probe side
    * (scattered), `right` the smaller build side (replicated `salt`×).
    * Result equals `left.join(right, key)` exactly; only the physical
    * distribution changes.
    *
    * The salt is a DETERMINISTIC function of the probe row's content —
    * never `monotonically_increasing_id()`/`rand()`, whose values change
    * across task retries: a nondeterministic shuffle key re-routes
    * recomputed rows to different reducers than the lost attempt's
    * fetched output, silently dropping/duplicating rows. Identical
    * duplicate rows share a salt (slightly less spread), which is the
    * safe trade.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0)
    // withColumn would silently REPLACE a pre-existing column of the same
    // name (then drop it from the output), breaking the result-equality
    // contract — refuse instead of corrupting
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin: inputs must not already carry a __salt column")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__salt", explode(typedLit((0 until salt).toArray)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
