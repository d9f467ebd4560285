package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The ingestion-QA face of the corpus operators: the SAME batch column
  * pipelines (quality rules, PII redaction) applied unchanged to a
  * streaming DataFrame, plus the stream-static anti-join dedup — i.e. what
  * a live crawl-ingest topology runs per micro-batch.
  */
case class Doc(doc_id: Long, text: String)

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val corpusRows = Seq(
    Doc(100L, "alpha beta gamma"),
    Doc(101L, "delta epsilon zeta"))

  test("stream-static anti-join dedup drops already-indexed texts, stateless") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = corpusRows.toDF()
    val in = MemoryStream[Doc]
    val out = StreamingDedup.againstStaticCorpus(in.toDF(), corpus, "text")
    val q = out.writeStream.format("memory").queryName("ingest_dedup_out")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, "alpha beta gamma"), Doc(2L, "fresh text one"))
      q.processAllAvailable()
      // a text deduped in batch 1 is STILL deduped in batch 2 (the corpus
      // is re-probed every batch), and fresh text keeps flowing
      in.addData(Doc(3L, "alpha beta gamma"), Doc(4L, "delta epsilon zeta"),
        Doc(5L, "fresh text two"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("ingest_dedup_out").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(2L, 5L))
  }

  test("quality rules and PII redaction run UNCHANGED on a stream") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      Doc(1L, "the cat sat on the mat next to the dog and the bird today"),
      Doc(2L, "spam spam spam spam"),
      Doc(3L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen"))
    val in = MemoryStream[Doc]
    val streamed = TextAnalysis.qualityRules(in.toDF(), "text", "doc_id")
    val redacted = TextAnalysis.piiRedact(in.toDF(), "text", "doc_id")
    assert(streamed.isStreaming && redacted.isStreaming)
    val q1 = streamed.writeStream.format("memory").queryName("ingest_qr_out")
      .outputMode("append").start()
    val q2 = redacted.writeStream.format("memory").queryName("ingest_pii_out")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q1.processAllAvailable()
      q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }
    // bit-identical to the batch run of the same operator on the same rows
    val batchQr = TextAnalysis.qualityRules(docs.toDF(), "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val streamQr = spark.table("ingest_qr_out").collect().map(_.toSeq).toSet
    assert(streamQr == batchQr && batchQr.size == 3)
    val batchPii = TextAnalysis.piiRedact(docs.toDF(), "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val streamPii = spark.table("ingest_pii_out").collect().map(_.toSeq).toSet
    assert(streamPii == batchPii)
  }

  test("Observe.textIngest metrics surface per micro-batch via MetricsChannel") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val observed = graft.operators.Observe.textIngest(
      in.toDF(), "stream_ingest_health", "text")
    val ch = MetricsChannel.attach(spark)((_, _) => ())
    val q = observed.writeStream.format("memory").queryName("ingest_obs_out")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, "alpha beta"), Doc(2L, ""))
      q.processAllAvailable()
      in.addData(Doc(3L, "gamma"))
      q.processAllAvailable()
      // listener delivery is asynchronous — poll with a deadline until the
      // captured bundles account for all 3 rows
      val deadline = System.currentTimeMillis() + 30000
      def mine = {
        import scala.jdk.CollectionConverters._
        ch.captured.asScala.toList
          .filter(_._1 == q.id.toString)
          .flatMap(_._3.get("stream_ingest_health"))
      }
      while (mine.map(_.getAs[Long]("n_rows")).sum < 3 &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      val rows = mine
      // across batches the bundle totals must equal the ground truth of
      // everything fed in: 3 rows, 1 empty text, 10+0+5 chars
      assert(rows.map(_.getAs[Long]("n_rows")).sum == 3L,
        s"captured: $rows")
      assert(rows.map(_.getAs[Long]("n_empty_text")).sum == 1L)
      assert(rows.map(_.getAs[Long]("n_chars")).sum == 15L)
      // and no single batch saw them all (the bundle is genuinely
      // per-batch, not cumulative)
      assert(rows.size >= 2)
    } finally { q.stop(); spark.streams.removeListener(ch) }
  }

  test("media dHash gate admits only perceptually-novel payloads (q214 dual)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(214)
    def bytes(n: Int) = Array.fill(n)(rnd.nextInt(256).toByte)
    val corpus = (1L to 20L).map(i => (i, bytes(100 + rnd.nextInt(200))))
    val index = StreamingNearDup.mediaCorpusIndex(
      corpus.toDF("media_id", "payload"), "payload", "media_id").cache()
    // twin: one-byte same-length edit -> Hamming <= 2 -> blocked;
    // copy: Hamming 0 -> blocked; novel: random -> admitted
    val twin = corpus(3)._2.clone(); twin(50) = (twin(50) + 1).toByte
    val copy = corpus(7)._2.clone()
    val novel = bytes(150)
    val arriving = Seq((101L, twin), (102L, copy), (103L, novel))
    val admitted = scala.collection.mutable.Set[Long]()
    val in = MemoryStream[(Long, Array[Byte])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("media_gate").toString
    val q = StreamingNearDup.mediaIngestGate(
      in.toDF().toDF("media_id", "payload"), () => index,
      "payload", "media_id", ckpt,
      (df, _) => admitted.synchronized {
        admitted ++= df.select("media_id").collect().map(_.getLong(0))
      })
    try {
      in.addData(arriving: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(admitted.toSet === Set(103L), s"admitted $admitted")
    // stream gate == the batch reference on the same rows
    val batchAdmit = StreamingNearDup.admitNewMedia(
        arriving.toDF("media_id", "payload"),
        StreamingNearDup.mediaCorpusIndex(
          corpus.toDF("media_id", "payload"), "payload", "media_id"),
        "payload", "media_id")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(batchAdmit === Set(103L))
  }
}
