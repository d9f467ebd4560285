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

  /** Q177: JOIN-KEY SKEW REPORT — the diagnostic that tells a pipeline
    * WHEN [[saltedJoin]] (or AQE skew handling) is needed, before the
    * 100 TB run discovers it as one straggler task: for each candidate
    * join key, the distinct-value count, the heaviest key's share, the
    * top-10 share, and the key-distribution entropy. A top1 share near
    * 1e6 ppm means one reducer takes the table; entropy near ln(n_rows)
    * means uniform keys salt-free.
    *
    * Exactness: shares are integer ppm (count·10⁶ div n). Entropy terms
    * −(c/n)·ln(c/n) round to a 1e-9 grid and sum EXACTLY (decimal
    * nanos — the q133 device at finer grain, because per-term magnitude
    * is ~1/n_distinct): partition- and engine-order-independent, only
    * ln must agree (IEEE, q36 precedent).
    *
    * Scale: per key column one map-side-combinable value-count aggregate
    * (the only corpus-sized exchange), then per-column reductions over
    * the distinct-value table; the top-10 rides a per-column rank window
    * over that already-reduced table.
    */
  def joinKeySkewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.expressions.Window
    // cast to STRING, not long: a string join key (a common skew
    // candidate) cast to long is NULL for every row, which would collapse
    // the report to n_distinct=1 / top1_ppm=1e6 with no error. String
    // cast is injective on numerics, so counts/shares are unchanged; only
    // the tie-break order among equal-count values differs, which no
    // output column observes.
    val perCol = keyCols.map { k =>
      df.select(lit(k).as("key_col"), col(k).cast("string").as("v"))
    }.reduce(_ unionByName _)
    val counts = perCol.groupBy(col("key_col"), col("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("key_col")).orderBy(col("c").desc,
      col("v"))
    val p = col("c").cast("double") / col("nt").cast("double")
    counts
      .withColumn("rk", row_number().over(w))
      .withColumn("nt",
        sum(col("c")).over(Window.partitionBy(col("key_col"))))
      .withColumn("term",
        round(-p * log(p) * 1e9).cast("decimal(20,0)"))
      .groupBy(col("key_col"))
      .agg(
        max(col("nt")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("__top1"),
        sum(when(col("rk") <= 10, col("c")).otherwise(0L)).as("__top10"),
        (sum(col("term")) / lit(1000000000L).cast("decimal(10,0)"))
          .cast("double").as("entropy"))
      .select(col("key_col"), col("n_rows"), col("n_distinct"),
        expr("(__top1 * 1000000) div n_rows").as("top1_ppm"),
        expr("(__top10 * 1000000) div n_rows").as("top10_ppm"),
        round(col("entropy"), 6).as("entropy"))
  }
}
