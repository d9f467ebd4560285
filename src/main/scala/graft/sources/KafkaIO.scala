package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Kafka + file stream I/O shell (SURVEY O1-O4): the engine's sources and
  * sinks as thin declarative wrappers. The Kafka paths mirror the
  * reference's topic source/sink (`TimeoutJoinTest.scala:59-63,79,92`) with
  * string serdes upgraded to explicit casts.
  *
  * DEPLOYMENT NOTE: the Kafka wrappers require the
  * `spark-sql-kafka-0-10` connector on the classpath; this build
  * environment ships neither the connector jar nor a broker (zero egress),
  * so the Kafka paths are declared-but-unexercised here. Everything
  * downstream of the source is source-agnostic: the streaming specs drive
  * the identical operators through MemoryStream and bounded file streams
  * ([[graft.Tables.eventsStream]]), which share the (key, value, ts) shape.
  */
object KafkaIO {

  /** O1: subscribe to a topic; deserialize key/value as UTF-8 strings —
    * `builder.stream[String, String](topic)` with StringSerde
    * (`TimeoutJoinTest.scala:59-63,98-99`). Event time = Kafka record
    * timestamp, as `context.timestamp()` (`TopicShifter.scala:29`).
    */
  def topicStream(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("ts"))

  /** O2: raw byte source — ByteArraySerde passthrough
    * (`TopicShifter.scala:44-45`); binary columns, no cast.
    */
  def rawTopicStream(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .load()
      .select(col("key"), col("value"), col("timestamp").as("ts"))

  /** O3/O4: publish a (key, value) stream to a topic. Checkpointing gives
    * the engine-side exactly-once the reference's per-record commit
    * (`TopicShifter.scala:34`) only approximated.
    */
  def topicSink(df: DataFrame, brokers: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.select(col("key").cast("string"), col("value").cast("string"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))

  /** Batch parquet table as a bounded stream (file source) — used to drive
    * streaming operators from the testdata tables.
    */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** O5: foreach side-effect sink (`stream.foreach`,
    * `TimeoutJoinTest.scala:65-72`) — per-micro-batch callback form.
    */
  def foreachSink(df: DataFrame, checkpoint: String)(f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[Row], id: Long) => f(batch.toDF(), id))
}
