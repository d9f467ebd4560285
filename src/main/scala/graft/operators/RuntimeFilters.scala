package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit bloom-filter semi-join reduction — the "runtime filter"
  * pattern for fact⋈dim joins where the dim-side predicate is selective:
  * build a bloom filter of the qualifying dim keys (a DISTRIBUTED
  * aggregation; only the fixed-size bit-array sketch reaches the driver),
  * broadcast it, and pre-filter the fact side BEFORE its shuffle, so the
  * join exchanges only rows that can possibly match.
  *
  * Spark's own InjectRuntimeFilter does this automatically for some
  * shapes; the explicit operator covers the rest (e.g. a reused filter
  * across several fact scans) and makes the pattern testable. The bloom
  * pass is a pure optimization: false positives are removed by the exact
  * join that follows, so results are byte-identical to the plain
  * semi-join — which is exactly what the q51 oracle checks.
  */
object RuntimeFilters {

  /** Bloom-filtered LEFT SEMI join: `fact` rows whose `factKey` appears in
    * `dim`'s `dimKey`. `expectedDimKeys`/`fpp` size the sketch — at 1%
    * false positives the fact shuffle carries ~sel+1% of its rows instead
    * of all of them.
    */
  def bloomSemiJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedDimKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    val bloom = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bloomBc.value.mightContainLong(k))
    fact
      .filter(mightContain(col(factKey)))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }

  /** Q51: lineitems of URGENT orders, bloom-pre-filtered, summarized per
    * return flag. Decimal-exact money sums (same contract as q20).
    */
  def urgentLineitemSummary(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val urgent = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    bloomSemiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
      expectedDimKeys = 100000L)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
  }
}
