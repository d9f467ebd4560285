package graft.streaming

import graft.SparkSpec
import graft.operators.TopicModel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming topic assignment (q230's dual): the gate's per-batch
  * classification unions to exactly the batch assignment of the same
  * documents, uncovered docs yield no row, and a refreshed model takes
  * effect at the next micro-batch.
  */
case class TopicDoc(doc_id: Long, text: String)

class StreamingTopicAssignSpec extends SparkSpec {
  import spark.implicits._

  test("stream union over batches equals the batch fold-in assignment") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = spark.read.parquet(s"$sf/documents.parquet")
    val pwz = TopicModel.plsaModel(train, "text").persist()
    pwz.count()
    val arriving = Seq(
      TopicDoc(1L, "join scan hash table join"),
      TopicDoc(2L, "sort merge window sort"),
      TopicDoc(3L, "the fast query value spark"),
      TopicDoc(4L, "xyzzy unseenword"), // no vocab overlap -> no row
      TopicDoc(5L, "data line group batch"),
      TopicDoc(6L, "filter row column stream"))
    val in = MemoryStream[TopicDoc]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("topic_assign_ck").toString
    val q = StreamingTopicAssign.assignGate(in.toDF(), () => pwz,
      "text", "doc_id", ckpt, (df, _) => got.synchronized {
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2)))
      })
    try {
      in.addData(arriving.take(2): _*)
      q.processAllAvailable()
      in.addData(arriving.slice(2, 4): _*)
      q.processAllAvailable()
      in.addData(arriving.drop(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = TopicModel.assignTopics(arriving.toDF(), pwz, "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(got.toSet === batch)
    assert(!batch.exists(_._1 == 4L)) // uncovered doc unassignable
    assert(batch.size == 5)
    pwz.unpersist()
  }

  test("a refreshed model takes effect at the next micro-batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two hand-built one-topic-dominant models over a 2-word vocab
    def model(hot: Int): org.apache.spark.sql.DataFrame = {
      val cold = (1000000000L - 900000000L) / 2
      Seq(("alpha", Seq.tabulate(3)(z =>
          if (z == hot) 900000000L else cold)),
        ("beta", Seq.tabulate(3)(z =>
          if (z == hot) 900000000L else cold)))
        .toDF("w", "pw")
    }
    @volatile var current = model(0)
    val in = MemoryStream[TopicDoc]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("topic_assign_ck2").toString
    val q = StreamingTopicAssign.assignGate(in.toDF(), () => current,
      "text", "doc_id", ckpt, (df, _) => got.synchronized {
        got ++= df.collect().map(r => (r.getLong(0), r.getInt(1)))
      })
    try {
      in.addData(TopicDoc(1L, "alpha beta"))
      q.processAllAvailable()
      current = model(2)
      in.addData(TopicDoc(2L, "alpha beta"))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet === Set((1L, 0), (2L, 2)))
  }
}
