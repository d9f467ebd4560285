package graft.streaming

import graft.{SparkSpec, Tables}
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.functions._

/** Restart-from-checkpoint recovery: the engine-side equivalent of the
  * reference's per-record `context.commit()` (O13, `TopicShifter.scala:34`)
  * — offsets land in the checkpoint WAL, so a stopped query resumes where
  * it left off: files ingested before the stop are NOT re-delivered, files
  * added while down are picked up, and the delivered total equals the
  * source exactly (no loss, no duplicates).
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("stop/restart on one checkpoint: no reprocessing, no loss") {
    val root = java.nio.file.Files.createTempDirectory("graft_recovery")
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang")
    val half = docs.count() / 2
    val partA = docs.filter($"doc_id" < half)
    val partB = docs.filter($"doc_id" >= half)
    partA.coalesce(1).write.mode("append").parquet(srcDir)

    // delivered (doc_id -> times seen) across BOTH query incarnations
    val seen = new ConcurrentHashMap[Long, Integer]()
    def start() = graft.sources.KafkaIO
      .foreachSink(
        graft.sources.KafkaIO.parquetStream(spark, srcDir, partA.schema), ckpt) {
        (batch, _) =>
          batch.select("doc_id").collect()
            .foreach(r => seen.merge(r.getLong(0), 1, (a, b) => a + b))
      }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = seen.size()
    assert(afterFirst == partA.count(), s"first run delivered $afterFirst")

    // new data arrives while the query is DOWN
    partB.coalesce(1).write.mode("append").parquet(srcDir)

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    assert(seen.size().toLong == docs.count(), s"delivered ${seen.size()} ids")
    val dupes = seen.entrySet().toArray.map(_.asInstanceOf[java.util.Map.Entry[Long, Integer]])
      .filter(_.getValue != 1)
    assert(dupes.isEmpty,
      s"exactly-once violated for ${dupes.take(5).map(e => e.getKey -> e.getValue).toSeq}")
  }
}
