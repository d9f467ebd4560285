package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the storage-side half of the 100 TB join
  * strategy. Writing both sides of a recurring equi-join bucketed (and
  * sorted) on the join key pins a `HashPartitioning` into the FILE LAYOUT:
  * every subsequent join or aggregation on that key reads co-located
  * buckets and plans with NO Exchange at all (asserted in
  * BucketedTablesSpec). At petabyte scale this converts the dominant
  * shuffle of every pipeline run into a one-time write-side cost.
  *
  * The reference's analogue is Kafka topic co-partitioning — the O15 user
  * obligation that both join input topics share a partitioner
  * (`KafkaUtils.scala:36`); bucketing is the lake-storage equivalent,
  * enforced by the catalog instead of by convention.
  */
object BucketedTables {

  /** Persist `df` as a bucketed+sorted parquet table in the session
    * catalog. `buckets` should match the recurring join's parallelism
    * (and both sides of a co-located join must use the SAME count).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // drop first: overwrite alone refuses when an orphaned location
    // survives a crashed previous write
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * exchanges when both sides were written via [[writeBucketed]] with
    * equal bucket counts.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Persist `df` hive-style partitioned on a low-cardinality column:
    * an equality/IN filter on that column then prunes whole directories at
    * PLANNING time (`PartitionFilters` in the scan, zero I/O for pruned
    * values) — the other half of the storage-layout story next to
    * bucketing, and the first lever against a 100 TB scan.
    */
  def writePartitioned(df: DataFrame, table: String, partitionCol: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .format("parquet")
      .mode("overwrite")
      .partitionBy(partitionCol)
      .saveAsTable(table)
  }
}
