package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q162 dup-span ladder + q163 triangle diagnostics: hand-computed pins,
  * brute-force references, and the properties the designs rely on
  * (ladder monotonicity; orientation-invariant triangle sets).
  */
class DupSpanGraphSpec extends SparkSpec {
  import spark.implicits._

  // ---- q162 dupSpanLadder --------------------------------------------

  test("dup-span ladder: interpreted substr reference agrees (sf0.001)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.select(col("doc_id"),
      TextShingles.normalize(col("text")).as("t"))
    val u = Seq(20, 40, 80).map { w =>
      n.filter(length(col("t")) >= w)
        .select(col("doc_id"), lit(w).as("w"),
          explode(array_distinct(transform(
            sequence(lit(1), length(col("t")) - w + 1),
            i => col("t").substr(i, lit(w))))).as("win"))
    }.reduce(_ unionByName _)
    val d = u.groupBy(col("w"), col("win")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("w"), col("win"))
    val m = u.join(d, Seq("w", "win"))
      .groupBy(col("doc_id")).agg(max(col("w")).as("mw"))
    val ref = n.select(col("doc_id")).join(m, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("mw"), lit(0)).cast("int").as("max_dup_win"))
    val got = Dedup.dupSpanLadder(docs, "text", "doc_id")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("dup-span ladder: planted spans land on the right rung") {
    val span80 = (1 to 16).map(i => f"ww$i%02d").mkString(" ") // 79 chars
    val span25 = "exactly twentyfive chars!"                  // 25 chars
    require(span80.length == 79 && span25.length == 25)
    val filler1 = (1 to 30).map(i => s"a$i").mkString(" ")
    val filler2 = (1 to 30).map(i => s"b$i").mkString(" ")
    val filler3 = (1 to 30).map(i => s"c$i").mkString(" ")
    val filler4 = (1 to 30).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, s"$filler1 $span80"),   // shares the long span with 2
      (2L, s"$span80 $filler2"),
      (3L, s"$filler3 $span25"),   // shares only the short span with 4
      (4L, s"$span25 $filler4"),
      (5L, "unique text that repeats nothing from anywhere else at all"),
      (6L, "tiny")                  // under every rung
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanLadder(docs, "text", "doc_id")
      .as[(Long, Int)].collect().toMap
    // 79 shared chars hold a 40-window (and 20s) but no 80-window
    assert(got(1L) === 40, s"got $got")
    assert(got(2L) === 40)
    // 25 shared chars hold a 20-window but no 40
    assert(got(3L) === 20)
    assert(got(4L) === 20)
    assert(got(5L) === 0)
    assert(got(6L) === 0)
    assert(got.size === 6, "every input doc must get a row")
  }

  // ---- q163 triangleStats --------------------------------------------

  private def tri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Graph.triangleStats(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("triangles: one triangle + pendant + far edge, hand-computed") {
    val got = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L)))
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.333333)))
    assert(got(4L) == ((1L, 0L, 0.0)))
    assert(got(5L) == ((1L, 0L, 0.0)))
    assert(got(6L) == ((1L, 0L, 0.0)))
  }

  test("triangles: K4 — every node in 3 triangles, clustering 1") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = tri(k4)
    (1L to 4L).foreach(n => assert(got(n) == ((3L, 3L, 1.0)), s"node $n: $got"))
  }

  test("triangles: path graph has none; duplicate/reversed edges collapse") {
    val path = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(path.values.forall(_._2 == 0L))
    val messy = tri(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L)))
    val clean = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(messy == clean)
  }

  test("triangles == brute-force triple join on the containment graph") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.containmentDups(docs, "text", "doc_id",
      n = 3, minGrams = 10, threshold = 0.6)
      .select(col("doc_a").as("lo"), col("doc_b").as("hi"))
      .localCheckpoint()
    val e1 = pairs.select(col("lo").as("x"), col("hi").as("y"))
    val e2 = pairs.select(col("lo").as("y"), col("hi").as("z"))
    val e3 = pairs.select(col("lo").as("x"), col("hi").as("z"))
    val trs = e1.join(e2, Seq("y")).join(e3, Seq("x", "z"))
    val refT = trs.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("nt"))
    val refD = pairs.select(explode(array(col("lo"), col("hi"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val ref = refD.join(refT, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("degree"),
        coalesce(col("nt"), lit(0L)).as("n_triangles"))
    val got = Graph.triangleStats(
      pairs.select(col("lo").as("doc_a"), col("hi").as("doc_b")),
      "doc_a", "doc_b")
      .select(col("doc_id"), col("degree"), col("n_triangles"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }
}
