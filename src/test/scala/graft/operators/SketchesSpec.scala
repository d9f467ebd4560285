package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch (q232): straight-line reference parity, the
  * never-underestimates contract, mergeability (shard cells sum to the
  * whole-corpus cells), and collision behavior at tiny width.
  */
class SketchesSpec extends SparkSpec {

  private def ph(w: String): Long =
    w.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)

  /** Single-threaded replica of the heavy-hitter pipeline. */
  private def reference(docs: Seq[String], depth: Int, width: Int,
      k: Int): Seq[(String, Long, Long, Long, Int)] = {
    val cnt = docs.flatMap(
      _.trim.toLowerCase.replaceAll("\\s+", " ").split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    cnt.foreach { case (w, n) =>
      (0L until depth.toLong).foreach { i =>
        val b = ((ph(w) + i) * 2654435761L) % 1000000007L % width
        cells((i, b)) += n
      }
    }
    cnt.toSeq.sortBy { case (w, n) => (-n, w) }.take(k).zipWithIndex
      .map { case ((w, n), pos) =>
        val est = (0L until depth.toLong).map { i =>
          cells((i, ((ph(w) + i) * 2654435761L) % 1000000007L % width))
        }.min
        (w, n, est, est - n, pos + 1)
      }
  }

  private val corpus = Seq(
    "join scan join hash join table scan", "sort merge sort sort window",
    "join join scan table hash hash", "the the the fast slow fast")

  test("heavy hitters match the straight-line reference (tiny width)") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val got = Sketches.countMinHeavyHitters(docs, "text", depth = 2,
        width = 16, k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).sortBy(_._5)
    assert(got.toSeq === reference(corpus, 2, 16, 8))
  }

  test("never underestimates on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = Sketches.countMinHeavyHitters(docs, "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (n, est, over) =>
      assert(est >= n && over == est - n)
    }
  }

  test("shard cells sum to the whole-corpus cells (mergeable state)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val whole = Sketches.countMinCells(docs, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val a = Sketches.countMinCells(
      docs.filter(col("doc_id") % 2 === 0), "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val b = Sketches.countMinCells(
      docs.filter(col("doc_id") % 2 === 1), "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val merged = (a.keySet ++ b.keySet).map(key =>
      key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    assert(merged === whole)
    // state is d x w bounded regardless of corpus size
    assert(whole.size <= 4 * 512)
  }

  test("tiny width forces collisions; estimates stay upper bounds") {
    import spark.implicits._
    val docs = (0 until 200).map(i => s"w$i token$i item$i")
      .toDF("text")
    val rows = Sketches.countMinHeavyHitters(docs, "text", depth = 2,
        width = 16, k = 50)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(rows.exists(_._2 > 0), "expected at least one collision")
    rows.foreach { case (_, over) => assert(over >= 0) }
  }

  test("hll: estimate matches the straight-line reference; registers " +
      "max-merge across shards") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Sketches.hllSourceDistinct(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // straight-line replica
    val words = docs.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)
        .map(w => (r.getString(0), w))).distinct
    def ph(w: String): Long =
      w.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    def rho(h: Long): Long =
      (1 to 30).find(r => h >= (1L << (30 - r))).getOrElse(31).toLong
    val regs = scala.collection.mutable.Map.empty[(String, Long), Long]
    words.foreach { case (s, w) =>
      val p = ph(w)
      val key = (s, p % 64)
      val r = rho(p * 2654435761L % 1000000007L)
      if (r > regs.getOrElse(key, 0L)) regs(key) = r
    }
    words.map(_._1).distinct.foreach { s =>
      val present = regs.keys.count(_._1 == s)
      val zeros = 64L - present
      val psum = regs.collect { case ((`s`, _), m) => 1.0 / (1L << m) }
        .sum
      val isum = psum + zeros.toDouble
      val raw = 0.709 * 64.0 * 64.0 / isum
      val est =
        if (raw <= 160.0 && zeros > 0)
          Math.round(64.0 * math.log(64.0 / zeros.toDouble))
        else Math.round(raw)
      val exact = words.count(_._1 == s).toLong
      assert(got(s) === ((exact, est, zeros)), s"source $s")
      // accuracy: within 20% of exact on this corpus
      assert(math.abs(est - exact).toDouble / exact < 0.2, s"source $s")
    }
    // mergeability: registers of the whole corpus == per-cell MAX of
    // the two doc-id-split shards
    def regMap(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "text", "source")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val whole = regMap(docs)
    val a = regMap(docs.filter(col("doc_id") % 2 === 0))
    val b = regMap(docs.filter(col("doc_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
    assert(merged === whole)
  }

  test("parameter guards") {
    import spark.implicits._
    val docs = Seq("a").toDF("text")
    intercept[IllegalArgumentException] {
      Sketches.countMinHeavyHitters(docs, "text", width = 100)
    }
    intercept[IllegalArgumentException] {
      Sketches.countMinHeavyHitters(docs, "text", depth = 0)
    }
  }
}
