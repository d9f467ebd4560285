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
      spark, "minhash_signature", { exprs =>
        def lit(i: Int, what: String): Long = {
          val e = exprs(i)
          require(e.foldable,
            s"minhash_signature: $what (argument ${i + 1}) must be a literal")
          e.eval().asInstanceOf[Number].longValue()
        }
        require(exprs.size >= 2 && exprs.size <= 3,
          s"minhash_signature(shingles, numHashes[, seed]) takes 2-3 arguments, got ${exprs.size}")
        graft.functions.MinHashSignatureExpr(
          exprs.head,
          numHashes = lit(1, "numHashes").toInt,
          seed = if (exprs.size > 2) lit(2, "seed") else 7L)
      })
    def litLong(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Long = {
      require(e.foldable, s"$what must be a literal")
      e.eval().asInstanceOf[Number].longValue()
    }
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "vec_dot", { exprs =>
        require(exprs.size == 2, s"vec_dot(a, b) takes 2 arguments, got ${exprs.size}")
        graft.functions.DotProductExpr(exprs(0), exprs(1))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "vec_cosine", { exprs =>
        require(exprs.size == 2, s"vec_cosine(a, b) takes 2 arguments, got ${exprs.size}")
        graft.functions.CosineSimExpr(exprs(0), exprs(1))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "vec_l2_normalize", { exprs =>
        require(exprs.size == 1, s"vec_l2_normalize(v) takes 1 argument, got ${exprs.size}")
        graft.functions.L2NormalizeExpr(exprs(0))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "simhash", { exprs =>
        require(exprs.size == 1, s"simhash(tokens) takes 1 argument, got ${exprs.size}")
        graft.functions.SimHashExpr(exprs(0))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "word_ngrams", { exprs =>
        require(exprs.size == 2, s"word_ngrams(normalized, n) takes 2 arguments, got ${exprs.size}")
        graft.functions.WordNgramsExpr(exprs(0), litLong(exprs(1), "n (argument 2)").toInt)
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "char_shingles", { exprs =>
        require(exprs.size == 2, s"char_shingles(normalized, k) takes 2 arguments, got ${exprs.size}")
        graft.functions.CharShinglesExpr(exprs(0), litLong(exprs(1), "k (argument 2)").toInt)
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "rolling_hash", { exprs =>
        require(exprs.size == 1, s"rolling_hash(s) takes 1 argument, got ${exprs.size}")
        graft.functions.RollingHashExpr(exprs(0))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "hashed_sorted_set", { exprs =>
        require(exprs.size == 1, s"hashed_sorted_set(arr) takes 1 argument, got ${exprs.size}")
        graft.functions.HashedSortedExpr(exprs(0))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "sorted_long_jaccard", { exprs =>
        require(exprs.size == 2, s"sorted_long_jaccard(a, b) takes 2 arguments, got ${exprs.size}")
        graft.functions.SortedLongJaccardExpr(exprs(0), exprs(1))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "int8_quantize", { exprs =>
        require(exprs.size == 1, s"int8_quantize(v) takes 1 argument, got ${exprs.size}")
        graft.functions.Int8QuantizeExpr(exprs(0))
      })
    org.apache.spark.sql.GraftBridge.registerFunction(
      spark, "int8_quantize_stats", { exprs =>
        require(exprs.size == 1, s"int8_quantize_stats(v) takes 1 argument, got ${exprs.size}")
        graft.functions.QuantizeStatsExpr(exprs(0))
      })
  }
}
