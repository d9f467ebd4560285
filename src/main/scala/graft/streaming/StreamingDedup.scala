package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup (SURVEY §2.3 Q6's streaming variant): keep the
  * first record per key.
  *
  * Two state regimes:
  *  - [[exactForever]]: `dropDuplicates` — state grows with distinct keys
  *    forever; only correct when the key space is bounded.
  *  - [[exactWithinWatermark]]: `dropDuplicatesWithinWatermark` — state is
  *    evicted once the watermark passes a key's last-seen event time; the
  *    scale-safe default for unbounded streams where duplicates arrive
  *    close together (e.g. at-least-once ingestion retries).
  */
object StreamingDedup {

  def exactForever(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  def exactWithinWatermark(stream: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", delay: String = "10 seconds"): DataFrame =
    stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)
}
