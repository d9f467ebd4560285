package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q190 two-pass bin packing: hand-traced start-offset bins, equality
  * with the plain global-window form, and invariance to both the input
  * partitioning and the range-partition count.
  */
class FileBinsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-traced fill: start offset decides the bin, docs never split") {
    val docs = Seq(
      ("en", 1L, 60000L), ("en", 2L, 50000L), ("en", 3L, 30000L),
      ("en", 4L, 70000L), ("de", 9L, 250000L), ("de", 10L, 1L))
      .toDF("lang", "doc_id", "n_chars")
    val got = Pipelines.packedFileBins(docs, "lang", "doc_id", "n_chars",
      targetUnits = 100000L, numPartitions = 4)
      .select(col("lang"), col("doc_id"), col("bin"))
      .as[(String, Long, Long)].collect().toSet
    // en offsets 0 / 60k / 110k / 140k -> bins 0,0,1,1;
    // de: the oversized doc fills bins 0-2 alone, next starts at 250k -> 2
    assert(got === Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 1L),
      ("en", 4L, 1L), ("de", 9L, 0L), ("de", 10L, 2L)), s"got $got")
  }

  test("two-pass == plain per-lang window cumsum on sf0.001 documents") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sf)
    val twoPass = Pipelines.packedFileBins(docs, "lang", "doc_id",
      "n_chars", 100000L)
      .as[(String, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val plain = docs.select(col("lang"), col("doc_id"),
        col("n_chars").cast("long").as("sz"))
      .withColumn("cum", sum(col("sz")).over(w))
      .select(col("lang"), col("doc_id"), col("sz"),
        expr("(cum - sz) div 100000L").as("bin"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(twoPass === plain,
      s"only-twopass=${(twoPass -- plain).take(3)} only-plain=${(plain -- twoPass).take(3)}")
  }

  test("result is invariant to input partitioning and partition count") {
    val docs = graft.Tables.documents(spark, sf)
    val a = Pipelines.packedFileBins(docs, "lang", "doc_id", "n_chars",
      100000L, numPartitions = 32)
    val b = Pipelines.packedFileBins(docs.repartition(7), "lang",
      "doc_id", "n_chars", 100000L, numPartitions = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
