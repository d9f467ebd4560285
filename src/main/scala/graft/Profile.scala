package graft

import org.apache.spark.sql.DataFrame

/** Dev utility: time sub-pipelines of a query to locate the hot stage
  * (noop-sink materialization, best-of-1 — directional, not a bench).
  */
object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("profile", 32)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators._

    val docs = Tables.documents(spark, sfDir)
    val base = Hashing.repartitionForCompute(
      docs.select(col("doc_id").as("id"),
        graft.functions.CharShinglesExpr.charShingles(
          TextShingles.normalize(col("text")), 5).as("sh")),
      "id")
    val buckets = base
      .select(col("id"),
        graft.functions.MinHashSignatureExpr.minhashSignature(col("sh"), 64).as("sig"))
      .withColumn("bh", explode(Dedup.bandHashes(col("sig"), 16, 4)))
      .select(col("bh.band"), col("bh.h"), col("id"))
    val pairs = buckets.select(col("band"), col("h"), col("id").as("doc_a"))
      .join(buckets.select(col("band"), col("h"), col("id").as("doc_b")), Seq("band", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    time("base (shingles+exchange)")(base)
    time("sig only")(base.select(col("id"),
      graft.functions.MinHashSignatureExpr.minhashSignature(col("sh"), 64).as("sig")))
    time("buckets (sig+bands+explode)")(buckets)
    time("pairs (self-join+distinct)")(pairs)
    println(s"[profile] n_pairs = ${pairs.count()}")
    time("full q10")(SparkEntry.queries("q10_dedup_minhash")(spark, sfDir))
    time("full q10 again")(SparkEntry.queries("q10_dedup_minhash")(spark, sfDir))
    spark.stop()
  }
}
