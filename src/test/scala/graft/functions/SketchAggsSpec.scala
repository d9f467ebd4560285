package graft.functions

import graft.SparkSpec
import graft.operators.{Dedup, Sketches}
import org.apache.spark.sql.functions._

/** The TypedImperativeAggregate sketches (q242/q243/q244): aggregate
  * path == cell/register-TABLE path bit-for-bit, merge commutativity
  * under any partitioning, and the SQL-registry surface (GROUP BY /
  * HAVING composability — the reason they exist).
  */
class SketchAggsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("cm_sketch aggregate reproduces countMinCells cell-for-cell") {
    val agg = Sketches.countMinCellsAgg(docs, "text")
    val cells = Sketches.countMinCells(docs, "text")
    assert(sortedRows(agg) === sortedRows(cells))
  }

  test("hll aggregate registers equal the register-table build") {
    val regTable = Sketches.hllRegisters(docs, "text", "source")
    val viaAgg = docs
      .select(col("source").as("src"),
        explode(split(graft.operators.TextShingles.normalize(col("text")),
          " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("src"))
      .agg(SketchAggs.hllRegistersAgg(col("w")).as("regs"))
      .select(col("src"), posexplode(col("regs")).as(Seq("j", "mj")))
      .filter(col("mj") > 0L) // table form omits untouched registers
      .select(col("src"), col("j").cast("long").as("j"), col("mj"))
    assert(sortedRows(viaAgg) === sortedRows(regTable))
  }

  test("hll_distinct estimate equals hllSourceDistinct's hll_est") {
    val full = Sketches.hllSourceDistinct(docs, "text", "source")
      .select(col("source"), col("hll_est"), col("reg_zeros"))
    val agg = Sketches.hllSourceDistinctAgg(docs, "text")
    assert(sortedRows(agg) === sortedRows(full))
  }

  test("minhash_sketch equals the q217 sig stage slot-for-slot") {
    // the sig stage of sourceMinhashSimilarity, rebuilt literally
    val words = docs.select(col("source").as("src"),
        explode(split(graft.operators.TextShingles.normalize(col("text")),
          " ")).as("word"))
      .filter(col("word") =!= "")
    val sig = words
      .select(col("src"),
        PolyHashExprs.polyHash(col("word")).as("ph"))
      .withColumn("i", explode(sequence(lit(0L), lit(63L))))
      .select(col("src"), col("i"),
        pmod((col("ph") + col("i")) * lit(2654435761L),
          lit(1000000007L)).as("h"))
      .groupBy(col("src"), col("i")).agg(min(col("h")).as("mh"))
    val agg = Sketches.sourceMinhashSketchAgg(docs, "text")
    assert(sortedRows(agg) === sortedRows(
      sig.select(col("src"), col("i"), col("mh"))))
  }

  test("partitioning independence: 1 vs 7 partitions, same sketches") {
    val one = Sketches.countMinCellsAgg(docs.repartition(1), "text")
    val many = Sketches.countMinCellsAgg(docs.repartition(7), "text")
    assert(sortedRows(one) === sortedRows(many))
    val h1 = Sketches.hllSourceDistinctAgg(docs.repartition(1), "text")
    val h7 = Sketches.hllSourceDistinctAgg(docs.repartition(7), "text")
    assert(sortedRows(h1) === sortedRows(h7))
    val m1 = Sketches.sourceMinhashSketchAgg(docs.repartition(1), "text")
    val m7 = Sketches.sourceMinhashSketchAgg(docs.repartition(7), "text")
    assert(sortedRows(m1) === sortedRows(m7))
  }

  test("driver-side merge is associative and commutative") {
    val a = CountMinSketchAgg(org.apache.spark.sql.GraftBridge.expression(lit("x")), 2, 16)
    def buf(tokens: String*): Array[Long] = {
      val b = a.createAggregationBuffer()
      tokens.foreach(t => {
        val ph = PolyHashExpr.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        var i = 0
        while (i < 2) {
          val h = java.lang.Math.floorMod((ph + i) * 2654435761L,
            1000000007L)
          b(i * 16 + (h % 16).toInt) += 1L
          i += 1
        }
      })
      b
    }
    val x = buf("join", "scan", "join")
    val y = buf("hash", "scan")
    val z = buf("sort")
    val xy_z = a.merge(a.merge(x.clone(), y.clone()), z.clone())
    val x_yz = a.merge(x.clone(), a.merge(y.clone(), z.clone()))
    val yx = a.merge(y.clone(), x.clone())
    val xy = a.merge(x.clone(), y.clone())
    assert(xy_z.toSeq === x_yz.toSeq)
    assert(xy.toSeq === yx.toSeq)
  }

  test("serialize/deserialize round-trips the buffer") {
    val vals = Array(5L, 0L, Long.MaxValue, -1L, 42L)
    assert(SketchAggs.deserializeLongs(
      SketchAggs.serializeLongs(vals)).toSeq === vals.toSeq)
  }

  test("SQL surface: GROUP BY + HAVING composability") {
    graft.Catalog.registerFunctions(spark)
    docs.select(col("source").as("src"),
        explode(split(graft.operators.TextShingles.normalize(col("text")),
          " ")).as("w"))
      .filter(col("w") =!= "")
      .createOrReplaceTempView("toks_agg_spec")
    val viaSql = spark.sql(
      """SELECT src, hll_distinct(w) AS hll_est
        |FROM toks_agg_spec GROUP BY src HAVING hll_distinct(w) > 0
        |""".stripMargin)
    val viaCol = Sketches.hllSourceDistinctAgg(docs, "text")
      .select(col("source").as("src"), col("hll_est"))
    assert(sortedRows(viaSql) === sortedRows(viaCol))
    val cmSql = spark.sql(
      "SELECT cm_sketch(w, 4, 512) AS cells FROM toks_agg_spec")
    val cmCol = docs.select(
        explode(split(graft.operators.TextShingles.normalize(col("text")),
          " ")).as("w"))
      .filter(col("w") =!= "")
      .agg(SketchAggs.cmSketch(col("w")).as("cells"))
    assert(sortedRows(cmSql) === sortedRows(cmCol))
    val mhSql = spark.sql(
      """SELECT src, minhash_sketch(w, 64) AS sig
        |FROM toks_agg_spec GROUP BY src""".stripMargin)
    assert(mhSql.count() ===
      Sketches.sourceMinhashSketchAgg(docs, "text")
        .select("src").distinct().count())
  }

  test("parameter guards") {
    intercept[IllegalArgumentException] {
      CountMinSketchAgg(org.apache.spark.sql.GraftBridge.expression(lit("x")), 0, 512)
    }
    intercept[IllegalArgumentException] {
      CountMinSketchAgg(org.apache.spark.sql.GraftBridge.expression(lit("x")), 4, 100) // not a power of two
    }
    intercept[IllegalArgumentException] {
      MinHashSketchAgg(org.apache.spark.sql.GraftBridge.expression(lit("x")), 0)
    }
    intercept[IllegalArgumentException] {
      KmvSketchAgg(org.apache.spark.sql.GraftBridge.expression(lit("x")), 1)
    }
  }

  test("kmv_sketch equals the declarative bottom-k of distinct hashes") {
    val byAgg = Sketches.kmvSourceSketch(docs, "text", k = 16)
    val declarative = docs
      .select(col("source").as("src"),
        explode(split(graft.operators.TextShingles.normalize(col("text")),
          " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("src"),
        pmod(PolyHashExprs.polyHash(col("w")) * lit(2654435761L),
          lit(1000000007L)).as("h"))
      .distinct()
      .groupBy(col("src"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, 16).as("sk"))
      .select(col("src").as("source"),
        posexplode(col("sk")).as(Seq("i", "h")))
      .select(col("source"), col("i").cast("long").as("i"), col("h"))
    assert(sortedRows(byAgg) === sortedRows(declarative))
  }

  test("kmv: exact below k, estimator formula at k, partition-invariant") {
    import spark.implicits._
    // 5 distinct tokens, k = 8 > 5: the estimate IS the exact count
    val small = Seq("a", "b", "c", "d", "e", "a", "b")
      .toDF("w").agg(SketchAggs.kmvDistinct(col("w"), 8))
      .as[Long].collect().head
    assert(small === 5L)
    // k = 3 <= 5: est = round(2·P / h_3) over the hand-computed hashes
    val hs = Seq("a", "b", "c", "d", "e").map { w =>
      Math.floorMod(Math.floorMod(w.charAt(0).toLong, 1000000007L) *
        2654435761L, 1000000007L)
    }.sorted
    val expect = math.round(2.0 * 1000000007L.toDouble / hs(2).toDouble)
    val got = Seq("a", "b", "c", "d", "e").toDF("w")
      .agg(SketchAggs.kmvDistinct(col("w"), 3)).as[Long].collect().head
    assert(got === expect, s"$got vs $expect over $hs")
    // partitioning independence (merge path)
    val base = docs.select(
      explode(split(graft.operators.TextShingles.normalize(col("text")),
        " ")).as("w")).filter(col("w") =!= "")
    val one = base.repartition(1)
      .agg(SketchAggs.kmvSketch(col("w"), 16)).collect().head.toString
    val many = base.repartition(7)
      .agg(SketchAggs.kmvSketch(col("w"), 16)).collect().head.toString
    assert(one === many)
  }

  test("kmv pair Jaccard: identical sources 1.0, disjoint 0.0") {
    import spark.implicits._
    val d = Seq(
      ("a", "red green blue"), ("b", "red green blue"),
      ("c", "cyan magenta yellow")).toDF("source", "text")
    val got = Sketches.kmvPairJaccard(d, "text", k = 16)
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("a", "b")) === ((1.0, 1.0)), s"$got")
    assert(got(("a", "c")) === ((0.0, 0.0)), s"$got")
    assert(got(("b", "c")) === ((0.0, 0.0)), s"$got")
  }

  test("kmv pair Jaccard prod form: estimate column equals the validated form's") {
    import spark.implicits._
    val est = Sketches.kmvPairJaccardEst(docs, "text", k = 16)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val full = Sketches.kmvPairJaccard(docs, "text", k = 16)
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est === full)
  }

  test("kmv SQL surface: GROUP BY kmv_distinct / kmv_sketch") {
    graft.Catalog.registerFunctions(spark)
    docs.select(col("source").as("src"),
        explode(split(graft.operators.TextShingles.normalize(col("text")),
          " ")).as("w"))
      .filter(col("w") =!= "")
      .createOrReplaceTempView("toks_kmv_spec")
    val viaSql = spark.sql(
      """SELECT src, kmv_distinct(w, 16) AS kmv_est
        |FROM toks_kmv_spec GROUP BY src""".stripMargin)
    val viaCol = Sketches.kmvSourceDistinct(docs, "text", k = 16)
      .select(col("source").as("src"), col("kmv_est"))
    assert(sortedRows(viaSql) === sortedRows(viaCol))
    val skSql = spark.sql(
      "SELECT src, kmv_sketch(w, 16) AS sk FROM toks_kmv_spec GROUP BY src")
    assert(skSql.count() === viaCol.count())
  }
}
