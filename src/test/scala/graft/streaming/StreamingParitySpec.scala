package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Streaming/batch parity on REAL testdata: the same interval-join
  * semantics computed (a) by the batch operator over `events` parquet and
  * (b) by the streaming operator over the identical rows delivered as a
  * bounded file stream. The unified API means the join expression is
  * literally shared; this spec proves the lift preserves results.
  */
class StreamingParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming clicked-displays over file stream equals batch results") {
    val stream = Tables.eventsStream(spark, sf)
    def shape(df: org.apache.spark.sql.DataFrame, et: String) =
      df.filter($"event_type" === et).select(
        $"user_id".cast("string").as("key"),
        $"event_id".cast("string").as("value"),
        $"ts")
    val joined = StreamingEventJoins.clickedDisplays(
      shape(stream, "view"), shape(stream, "click"), "1 HOUR", "1 second")
    val q = joined.writeStream.format("memory").queryName("parity_joined")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("parity_joined")
      .select("key", "value").as[(String, String)].collect().toSet

    val batch = graft.operators.EventJoins
      .clickedDisplays(Tables.events(spark, sf), "1 HOUR")
      .select($"user_id".cast("string").as("key"),
        concat(lit("""{"display":"""), $"view_id",
          lit(""","click":"""), $"click_id", lit("}")).as("value"))
      .as[(String, String)].collect().toSet

    assert(streamed == batch, s"streaming=${streamed.size} batch=${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("foreach sink delivers every record to the side-effect callback (O5)") {
    // the reference's stream.foreach debug sink (TimeoutJoinTest.scala:65-72)
    // in its per-micro-batch form: capture into a concurrent queue, assert
    // exact contents
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_foreach_ckpt").toString
    val q = graft.sources.KafkaIO
      .foreachSink(in.toDF().toDF("key", "value"), ckpt) { (batch, _) =>
        batch.collect().foreach(r => seen.add((r.getString(0), r.getString(1))))
      }
      .start()
    try {
      in.addData(("k1", """{"type":"display"}"""), ("k2", """{"type":"click"}"""))
      q.processAllAvailable()
      in.addData(("k3", "v3"))
      q.processAllAvailable()
    } finally q.stop()
    val got = seen.toArray(Array.empty[(String, String)]).toSet
    assert(got == Set(("k1", """{"type":"display"}"""), ("k2", """{"type":"click"}"""),
      ("k3", "v3")), s"got $got")
  }

  test("raw binary key/value passes through operators byte-exact (O2/O4 shape)") {
    // the reference's ByteArraySerde contract (TopicShifter.scala:44-45):
    // the engine moves opaque payloads without touching a byte — here
    // through the time-shift operator, which like the reference shifter is
    // payload-agnostic
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Array[Byte], Array[Byte], java.sql.Timestamp)]
    val shifted = graft.operators.EventJoins.timeShift(
      in.toDF().toDF("key", "value", "ts"), "ts", "1 HOUR", "raw", "1h")
    val q = shifted.writeStream.format("memory").queryName("raw_out")
      .outputMode("append").start()
    val payload = Array[Byte](0, -1, 127, -128, 42) // incl. non-UTF8 bytes
    val key = Array[Byte](1, 2, 3)
    try {
      in.addData((key, payload, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val row = spark.table("raw_out")
        .select("key", "value", "stream").collect().head
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]](0), key))
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]](1), payload))
      assert(row.getString(2) == "raw.1h")
    } finally q.stop()
  }

  test("error channel captures a failing streaming query (O14)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ch = ErrorChannel.attach(spark)((_, _) => ())
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val failing = in.toDS().map(i => 1 / (i - 1)) // throws on i == 1
    val q = failing.writeStream.format("memory").queryName("err_out")
      .outputMode("append").start()
    in.addData(1)
    intercept[Exception] { q.processAllAvailable() }
    q.stop()
    // listener events are async; poll briefly
    val t0 = System.currentTimeMillis()
    while (ch.captured.isEmpty && System.currentTimeMillis() - t0 < 10000) Thread.sleep(100)
    assert(!ch.captured.isEmpty, "error channel saw no failure")
    spark.streams.removeListener(ch)
  }
}
