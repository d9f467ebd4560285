package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")

  test("dropDuplicates keeps first occurrence across micro-batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Evt]
    val out = StreamingDedup.exactForever(in.toDF(), Seq("key"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(Evt("a", "v1", ts(0)), Evt("b", "v2", ts(1)))
      q.processAllAvailable()
      in.addData(Evt("a", "v1-dup-later-batch", ts(5)), Evt("c", "v3", ts(6)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("dedup_out").select("key", "value")
      .as[(String, String)].collect().toMap
    assert(rows == Map("a" -> "v1", "b" -> "v2", "c" -> "v3"))
  }

  test("watermark-bounded dedup: dups within the horizon dropped, state evicted") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Evt]
    val out = StreamingDedup.exactWithinWatermark(in.toDF(), Seq("key"), "ts", "5 seconds")
    val q = out.writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      in.addData(Evt("a", "v1", ts(0)), Evt("a", "dup-same-batch", ts(1)))
      q.processAllAvailable()
      in.addData(Evt("a", "dup-within-horizon", ts(3)))
      q.processAllAvailable()
      // advance the watermark far past a's horizon, then re-send the key:
      // state for "a" has been evicted, so it's treated as new
      in.addData(Evt("z", "advance", ts(59)))
      q.processAllAvailable()
      in.addData(Evt("a", "post-eviction", ts(58)))
      q.processAllAvailable()
      val values = spark.table("dedup_wm_out").select("value").as[String].collect().toSet
      assert(values.contains("v1") && !values.contains("dup-same-batch")
        && !values.contains("dup-within-horizon"))
      assert(values.contains("post-eviction"),
        s"state not evicted after watermark passed: $values")
    } finally q.stop()
  }

  test("near-dup ingest gate: stream admits == batch gate; exact dups and near-dups blocked") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // corpus drawn from real documents; the stream replays some corpus
    // texts verbatim (exact dup), some with small edits (near-dup at
    // char-shingle Jaccard >= 0.7), and some novel strings
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val corpus = docs.take(50).toSeq.toDF("doc_id", "text")
    val index = StreamingNearDup.corpusIndex(corpus, "text", "doc_id")
      .cache()
    val exactDup = (1000L, docs.head._2)
    val nearDup = (1001L, docs(1)._2 + " x")
    val novel = (1002L, "zq zx qv jk wq phx gbl mtr ckz " * 4)
    val batch2 = Seq((1003L, docs(2)._2), (1004L, "completely different " +
      "drivel unseen anywhere in the corpus before now qqq"))
    val in = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.Map[Long, Set[Long]]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("neardup_gate").toString
    val q = StreamingNearDup.ingestGate(
      in.toDF().toDF("doc_id", "text"), index, "text", "doc_id", ckpt,
      (df, id) => admitted.synchronized {
        admitted(id) = df.select($"doc_id").as[Long].collect().toSet
      })
    try {
      in.addData(exactDup, nearDup, novel)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = admitted.values.flatten.toSet
    // reference: the same gate run as one batch over all streamed docs
    val all = (Seq(exactDup, nearDup, novel) ++ batch2)
      .toDF("doc_id", "text")
    val expect = StreamingNearDup.admitNew(all, index, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expect, s"stream=$got batch=$expect")
    // semantics: novel admitted, exact + near dups blocked
    assert(got.contains(1002L) && got.contains(1004L))
    assert(!got.contains(1000L) && !got.contains(1001L) &&
      !got.contains(1003L))
    index.unpersist()
  }

  test("near-dup ingest gate: index swap mid-stream takes effect at the next batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpusV1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpusV2 = Seq((2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    // pre-materialized snapshots: the swap is a pointer flip, the way a
    // production pipeline repoints a manifest at a new index directory
    val v1 = StreamingNearDup.corpusIndex(corpusV1, "text", "doc_id").cache()
    val v2 = StreamingNearDup.corpusIndex(corpusV2, "text", "doc_id").cache()
    @volatile var current = v1
    val in = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.Map[Long, Set[Long]]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("neardup_refresh").toString
    val q = StreamingNearDup.ingestGateRefreshing(
      in.toDF().toDF("doc_id", "text"), () => current, "text", "doc_id",
      ckpt,
      (df, id) => admitted.synchronized {
        admitted(id) = df.select($"doc_id").as[Long].collect().toSet
      })
    try {
      // batch 1 against v1: the v1 dup blocked, the v2-like doc admitted
      // (v2 is not live yet)
      in.addData((10L, "alpha beta gamma delta epsilon zeta eta theta"),
        (11L, "one two three four five six seven eight nine"))
      q.processAllAvailable()
      current = v2 // snapshot swap BETWEEN batches
      // batch 2 against v2: now the v2 dup is blocked and the v1 text —
      // no longer in the live index — is admitted; earlier decisions are
      // not revisited
      in.addData((12L, "alpha beta gamma delta epsilon zeta eta theta"),
        (13L, "one two three four five six seven eight nine"))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = admitted.toMap
    assert(byBatch.values.flatten.toSet == Set(11L, 12L),
      s"got $byBatch")
    v1.unpersist(); v2.unpersist()
  }

  test("near-dup ingest gate: stop/restart resumes from the checkpoint without re-admitting") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val index = StreamingNearDup.corpusIndex(corpus, "text", "doc_id").cache()
    val ckpt = java.nio.file.Files
      .createTempDirectory("neardup_restart").toString
    // idempotent-by-batchId sink: foreachBatch may REPLAY the last batch
    // after a restart (same id), which must overwrite, not append
    val admitted = scala.collection.mutable.Map[Long, Set[Long]]()
    def start(in: MemoryStream[(Long, String)]) =
      StreamingNearDup.ingestGate(
        in.toDF().toDF("doc_id", "text"), index, "text", "doc_id", ckpt,
        (df, id) => admitted.synchronized {
          admitted(id) = df.select($"doc_id").as[Long].collect().toSet
        })
    val in1 = MemoryStream[(Long, String)]
    val q1 = start(in1)
    try {
      in1.addData((10L, "first unique document qq"),
        (11L, "alpha beta gamma delta epsilon zeta eta theta"))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = admitted.values.flatten.toSet
    assert(afterFirst == Set(10L), s"got $afterFirst")
    // restart against the SAME checkpoint: a replayable source must
    // re-offer the already-processed prefix (the checkpointed offset
    // skips past it — the replay must NOT re-admit doc 10 under a new
    // batch id) plus the genuinely new data
    val in2 = MemoryStream[(Long, String)]
    in2.addData((10L, "first unique document qq"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta"))
    in2.addData((12L, "second unique document zz"))
    val q2 = start(in2)
    try q2.processAllAvailable() finally q2.stop()
    val afterRestart = admitted.values.flatten.toSet
    assert(afterRestart == Set(10L, 12L), s"got $afterRestart")
    index.unpersist()
  }
}
