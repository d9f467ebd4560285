package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level query profiler for optimization work (guide §7.1 with the
  * UI disabled): runs each named query through the noop sink `OPT_REPS`
  * times and prints, for the LAST rep, the top stages by duration with
  * task counts and shuffle/input byte totals — so optimization targets
  * the measured stage, not the guessed one. Not part of the driver
  * contract.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 OPT_REPS=2 \
  *   sbt "runMain graft.tools.OptProbe q263_theil_sen"
  * }}}
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("OPT_REPS", "2").toInt
    val spark = Tables.session("optprobe", 32)

    case class St(name: String, durMs: Long, tasks: Int, shufR: Long,
      shufW: Long, input: Long, spill: Long, maxTaskMs: Long, runMs: Long,
      gcMs: Long, deserMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = e.taskInfo.duration
        taskMax.merge(e.stageId, d, (a, b) => math.max(a, b))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val dur = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        stages.add(St(si.name.takeWhile(_ != '\n'), dur, si.numTasks,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead, m.memoryBytesSpilled,
          taskMax.getOrDefault(si.stageId, -1L),
          m.executorRunTime, m.jvmGCTime, m.executorDeserializeTime))
      }
    })

    for (q <- args) {
      var lastT = 0.0
      for (r <- 1 to reps) {
        stages.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        lastT = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $q rep$r total ${lastT}%.2f s")
      }
      import scala.jdk.CollectionConverters._
      val all = stages.asScala.toVector
      println(f"[probe] $q stages=${all.size} taskTimeSum=${all.map(_.durMs).sum / 1e3}%.2f s (last rep)")
      all.sortBy(-_.durMs).take(14).foreach { s =>
        println(f"[probe]   ${s.durMs}%6d ms  tasks=${s.tasks}%4d maxTask=${s.maxTaskMs}%5d run=${s.runMs}%6d gc=${s.gcMs}%5d deser=${s.deserMs}%5d  shufR=${s.shufR / 1e6}%7.1fMB shufW=${s.shufW / 1e6}%7.1fMB in=${s.input / 1e6}%6.1fMB  ${s.name.take(60)}")
      }
      // free leaked localCheckpoint blocks before the next query so
      // cross-query storage pressure doesn't pollute the profile
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
