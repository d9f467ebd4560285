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

  /** Stream-static incremental dedup — q48's streaming face: drop arriving
    * documents whose exact text already exists in a STATIC indexed corpus.
    * A stream-static left-anti join is STATELESS (each micro-batch probes
    * the corpus; no streaming state store), so it scales with the corpus
    * layout, not the stream history: broadcast when the corpus is small,
    * a bucketed corpus table for a zero-exchange probe at 100 TB. Same
    * (hash, text) key shape as [[graft.operators.Dedup.incrementalExact]].
    */
  def againstStaticCorpus(stream: DataFrame, corpus: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ch = corpus.select(
      xxhash64(col(textCol)).as("__corpus_h"), col(textCol).as("__corpus_t"))
    val s = stream.withColumn("__h", xxhash64(col(textCol)))
    s.join(ch, s("__h") === ch("__corpus_h") && s(textCol) === ch("__corpus_t"), "left_anti")
      .drop("__h")
  }
}
