package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: the testdata tables as temp views (the reference's
  * topic-name catalog upgraded to a real session catalog) and the engine's
  * native functions registered for `spark.sql` use — a user can run every
  * oracle query from SparkEntry verbatim through SQL.
  */
object Catalog {

  /** Register every testdata table under its plain name. */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.filterNot(_ == "events").foreach { name =>
      Tables.load(spark, sfDir, name).createOrReplaceTempView(name)
    }
    // events needs the nanos-safe loader (TIMESTAMP(NANOS) parquet)
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }

  /** Register graft-native functions in the session's function registry. */
  def registerFunctions(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "minhash_signature", exprs =>
        graft.functions.MinHashSignatureExpr(
          exprs.head,
          numHashes = exprs(1).eval().asInstanceOf[Number].intValue(),
          seed = if (exprs.length > 2) exprs(2).eval().asInstanceOf[Number].longValue() else 7L))
  }
}
