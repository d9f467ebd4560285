package graft.tools

import graft.{SparkEntry, Tables}

/** Print a query's formatted physical plan AFTER one execution at the
  * probe SF — with AQE on, the pre-execution plan hides the runtime
  * join-strategy/coalescing decisions this tool exists to audit. Plan
  * tool only, not part of the driver contract.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.PlanProbe q175_item_cf"
  * }}}
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("planprobe", 32)
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $q =====")
      df.explain("formatted")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
