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
        // shared micros fast path — the per-row double→BigDecimal cast it
        // replaces dominates money aggregations (see decSum's contract)
        Relational.decSum(col("l_quantity")).cast("double").as("sum_qty"))
  }

  /** Approximate distinct-key overlap between two relations, by HLL
    * inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the
    * union estimated from the MERGED sketches (no rescan). This is the
    * join-planning diagnostic for 100 TB: one cheap pass per side answers
    * "how many keys will this join actually match — broadcast the
    * difference? pre-filter with a bloom? expect skew?" before committing
    * to a shuffle of either relation. Both inputs collapse to one
    * fixed-size sketch row each; the combine is a one-row cross join.
    */
  def approxKeyOverlap(a: DataFrame, b: DataFrame,
      aKey: String, bKey: String): DataFrame = {
    val sa = a.agg(hll_sketch_agg(col(aKey)).as("ska"))
    val sb = b.agg(hll_sketch_agg(col(bKey)).as("skb"))
    sa.crossJoin(sb).select(
      hll_sketch_estimate(col("ska")).as("n_a"),
      hll_sketch_estimate(col("skb")).as("n_b"),
      hll_sketch_estimate(hll_union(col("ska"), col("skb"))).as("n_union"),
      greatest(
        hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb")) -
          hll_sketch_estimate(hll_union(col("ska"), col("skb"))),
        lit(0L)).as("n_overlap"))
  }
}
