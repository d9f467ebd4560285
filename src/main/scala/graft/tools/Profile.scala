package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the heavy dedup family: times each building
  * block of the validated near-dup gates separately so optimization work
  * targets the measured stage, not the guessed one. Not part of the driver
  * contract; run with
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up
    noop(docs.limit(10))

    // cumulative stage times for the exact PPJoin (each line recomputes
    // its upstream): differences between successive lines isolate a stage
    {
      import org.apache.spark.sql.functions._
      val d = graft.operators.Hashing.repartitionForCompute(
        docs.select(lit(0).as("blk"), col("doc_id").as("id"),
          graft.functions.HashedSetExprs.hashedSortedSet(
            graft.functions.CharShinglesExpr.charShingles(
              graft.operators.TextShingles.normalize(col("text")), 5)).as("g")),
        "id")
      time("  stage shingle-sets (d)") { noop(d) }
      val posting = d.select(col("blk"), col("id"), size(col("g")).as("n"),
        explode(col("g")).as("gram"))
      time("  stage posting") { noop(posting) }
      val freq = posting.groupBy(col("blk"), col("gram"))
        .agg(count(lit(1)).as("df"))
      time("  stage freq") { noop(freq) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("df"), col("gram"))
      val prefix = posting.join(freq, Seq("blk", "gram"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= col("n") - ceil(lit(0.7) * col("n")) + 1)
        .select(col("blk"), col("gram"), col("id"), col("n"), col("r"))
      time("  stage prefix (join+window)") { noop(prefix) }
    }
    time("exact charShinglePairsExact (q10/q11 ground truth)") {
      noop(Dedup.charShinglePairsExact(docs, "text", "doc_id"))
    }
    time("minhashNearDups (q10 approx side)") {
      noop(Dedup.minhashNearDups(docs, "text", "doc_id"))
    }
    time("simhashNearDups (q11 approx side)") {
      noop(Dedup.simhashNearDups(docs, "text", "doc_id"))
    }
    time("q10 minhashValidated (both + flag)") {
      noop(Dedup.minhashValidated(docs, "text", "doc_id"))
    }
    spark.stop()
  }
}
