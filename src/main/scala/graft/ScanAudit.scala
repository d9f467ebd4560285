package graft

/** Diagnostic: parquet-scan count per declared query (executed plan,
  * AQE-finalized where cheap). A query scanning a table more often than
  * its logical formulation needs (the q90 spine-join case: column
  * pruning differentiating two copies of one aggregate, defeating
  * ReuseExchange) silently doubles the corpus read at scale.
  * Self-joins with different filters legitimately scan twice — this
  * prints counts for eyeballing, it does not judge.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("scanaudit", 8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // optional name-substring filters after the dir (local iteration)
    val only = args.drop(1).toSeq
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, f) =>
      try {
        val df = f(spark, dir)
        df.collect() // finalize THIS QueryExecution's adaptive plan (a
        // noop write would spawn a separate execution and leave it raw)
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case p => p.toString
        }
        val scans = "Scan parquet".r.findAllIn(plan).length
        val reused = "ReusedExchange".r.findAllIn(plan).length
        println(f"[scan] $name%-28s scans=$scans reused=$reused")
      } catch { case e: Throwable =>
        println(s"[scan] $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
