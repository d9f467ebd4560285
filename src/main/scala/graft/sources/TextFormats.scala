package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format ingestion for the raw ends of a training-data pipeline —
  * crawl dumps and vendor drops arrive as JSON-lines or CSV long before
  * they become parquet. Both readers take an EXPLICIT schema: schema
  * inference re-reads the whole input (a full extra pass at 100 TB) and
  * can silently widen types between runs; a declared schema is one pass
  * and stable. Malformed rows are handled by Spark's PERMISSIVE mode
  * (nulls) unless the caller tightens `mode`.
  */
object TextFormats {

  /** One JSON document per line (jsonl / ndjson). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** Header-less CSV with a declared schema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false, mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", mode)
      .csv(path)
}
