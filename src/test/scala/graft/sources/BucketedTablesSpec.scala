package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketed layout eliminates the join shuffle — the plan-level proof of
  * the write-once/join-many strategy for 100 TB recurring joins.
  */
class BucketedTablesSpec extends SparkSpec {
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("co-located join of same-bucketed tables plans ZERO exchanges") {
    // clear orphaned locations from any crashed earlier run
    for (t <- Seq("bt_views", "bt_clicks")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    val ev = Tables.events(spark, sf)
    BucketedTables.writeBucketed(
      ev.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id")),
      "bt_views", "user_id", buckets = 4)
    BucketedTables.writeBucketed(
      ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id")),
      "bt_clicks", "user_id", buckets = 4)
    // force the non-broadcast path: at scale neither side broadcasts, and
    // that is exactly the case bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.coLocatedJoin(spark, "bt_views", "bt_clicks", "user_id")
      val plan = executedPlan(joined)
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and the result is the plain join's result
      val expect = ev.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"))
        .join(ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id")), Seq("user_id"))
      assert(joined.count() == expect.count() && joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("partitioned layout prunes non-matching partitions at planning time") {
    spark.sql("DROP TABLE IF EXISTS pt_events")
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse/pt_events")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    val ev = Tables.events(spark, sf)
    BucketedTables.writePartitioned(ev, "pt_events", "event_type")
    val q = spark.table("pt_events").filter($"event_type" === "click")
      .select($"event_id", $"user_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition pruning in scan:\n$plan")
    // the pruned scan reads only the click partition's files
    assert(q.count() == ev.filter($"event_type" === "click").count())
  }

  test("aggregation on the bucket key also runs shuffle-free") {
    val agg = spark.table("bt_views").groupBy($"user_id").agg(count(lit(1)).as("n"))
    val plan = executedPlan(agg)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg must not shuffle:\n$plan")
    assert(agg.count() > 0)
  }

  test("window over the bucket key runs shuffle-free (q93's shape at zero exchanges)") {
    // the q93 decorrelation is a window partitioned by the join key; on a
    // table bucketed by that key the window's ClusteredDistribution is
    // already satisfied — only the in-partition sort remains, so the
    // write-once layout turns the one remaining exchange into none
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
    val df = spark.table("bt_views")
      .withColumn("n_views", count(lit(1)).over(w))
      .filter($"n_views" >= 2)
    val plan = executedPlan(df)
    assert(plan.contains("Window"), s"expected a window operator:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed window must not shuffle:\n$plan")
    // parity with the unbucketed formulation
    val ev = Tables.events(spark, sf).filter($"event_type" === "view")
    val expect = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2).agg(sum($"n")).as[Long].head()
    assert(df.count() == expect)
  }
}
