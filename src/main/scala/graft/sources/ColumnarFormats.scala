package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar-format interchange beyond parquet. ORC is the other columnar
  * format a lake-scale pipeline meets (Hive-era warehouses, Trino/Presto
  * deployments); Spark's reader/writer supports the same predicate
  * pushdown + column pruning as parquet, so an ORC-backed table slots into
  * every operator here unchanged.
  */
object ColumnarFormats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Q50: ORC round-trip proof over the documents table — write the corpus
    * as ORC, read it back, and reduce to a per-language summary whose
    * `fp_sum` term (sum of each document's order-sensitive rolling-hash
    * fingerprint) is an order-independent CONTENT checksum: any
    * serialization corruption of any text moves it. The oracle computes
    * the identical summary straight from the parquet source, so
    * oracle-match ⟺ the ORC hop was lossless.
    */
  def orcRoundTripStats(spark: SparkSession, docs: DataFrame, path: String): DataFrame = {
    writeOrc(docs, path)
    readOrc(spark, path)
      .select(col("lang"), col("n_chars"),
        graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("fp")).as("fp_sum"))
  }
}
