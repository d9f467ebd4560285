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

  /** jsonl ingest with a QUARANTINE channel — the batch analogue of the
    * streaming error channel (reference O14): malformed lines surface in
    * a `_corrupt_record` column instead of becoming silent nulls
    * (PERMISSIVE's default) or killing the job (FAILFAST). Callers split
    * with [[quarantineSplit]]; a real pipeline writes both outputs in one
    * pass (persist the frame first — Spark re-parses per action, and a
    * query must not reference ONLY the corrupt column, a documented
    * JSON-reader restriction the split respects by always selecting the
    * data columns alongside it).
    */
  def readJsonlQuarantined(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** (good rows without the corrupt column, quarantined raw lines). */
  def quarantineSplit(df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val dataCols = df.columns.filter(_ != "_corrupt_record").map(col)
    (df.filter(col("_corrupt_record").isNull).select(dataCols.toIndexedSeq: _*),
      df.filter(col("_corrupt_record").isNotNull)
        .select((dataCols :+ col("_corrupt_record")).toIndexedSeq: _*))
  }
}
