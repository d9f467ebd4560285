package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** The reference's error channel (SURVEY O14): a handler for topology
  * failures (`stream.setUncaughtExceptionHandler`,
  * `/root/reference/.../TopicShifter.scala:54-57`) — here a
  * StreamingQueryListener that surfaces terminated-with-exception events to
  * a user callback, plus a capture queue for inspection.
  */
class ErrorChannel(handler: (String, String) => Unit) extends StreamingQueryListener {
  val captured = new ConcurrentLinkedQueue[(String, String)]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    e.exception.foreach { msg =>
      captured.add(e.id.toString -> msg)
      handler(e.id.toString, msg)
    }
}

object ErrorChannel {
  /** Attach an error handler to every streaming query of the session. */
  def attach(spark: SparkSession)(handler: (String, String) => Unit): ErrorChannel = {
    val ch = new ErrorChannel(handler)
    spark.streams.addListener(ch)
    ch
  }
}
