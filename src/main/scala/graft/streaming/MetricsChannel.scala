package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming side of [[graft.operators.Observe]] (extends SURVEY O14): a
  * StreamingQueryListener that captures every micro-batch's
  * `observedMetrics` — the per-batch values of the `Dataset.observe`
  * bundles in the query plan — and hands them to a user callback. The
  * operational loop a 100 TB streaming ingest runs on: per-batch row
  * counts, empty-payload counts, and stage survivor counts, emitted by
  * the SAME plan that processes the data, no second query.
  */
class MetricsChannel(handler: (String, Map[String, Row]) => Unit)
    extends StreamingQueryListener {
  /** (queryId, batchId, bundle-name -> metrics row), in arrival order. */
  val captured = new ConcurrentLinkedQueue[(String, Long, Map[String, Row])]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val m = e.progress.observedMetrics.asScala.toMap
    if (m.nonEmpty) {
      captured.add((e.progress.id.toString, e.progress.batchId, m))
      handler(e.progress.id.toString, m)
    }
  }
}

object MetricsChannel {
  /** Attach a metrics handler to every streaming query of the session. */
  def attach(spark: SparkSession)(
      handler: (String, Map[String, Row]) => Unit): MetricsChannel = {
    val ch = new MetricsChannel(handler)
    spark.streams.addListener(ch)
    ch
  }
}
