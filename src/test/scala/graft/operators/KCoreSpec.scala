package graft.operators

import graft.SparkSpec

/** q184 k-core peel: hand-traced synchronous rounds on a path + triangle,
  * convergence idempotence, and partition invariance.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4-5 (peels inward over 3 rounds) + triangle {6,7,8}
  // (the 2-core). Hand trace, k=2:
  //   round 1: deg 1/5 = 1        -> peel {1,5}
  //   round 2: deg 2/4 = 1        -> peel {2,4}
  //   round 3: deg 3   = 0        -> peel {3}
  //   round 4: {6,7,8} all deg 2  -> stable
  private val pathPlusTriangle = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (6L, 7L), (7L, 8L), (6L, 8L))

  private def peel(pairs: Seq[(Long, Long)], k: Int, rounds: Int) =
    Graph.kCorePeel(pairs.toDF("a", "b"), "a", "b", k, rounds)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("hand-traced peel: path collapses inward, triangle survives") {
    val got = peel(pathPlusTriangle, k = 2, rounds = 4)
    val expect = Map(
      1L -> ((1L, 1L, 0)), 5L -> ((1L, 1L, 0)),
      2L -> ((2L, 1L, 0)), 4L -> ((2L, 1L, 0)),
      3L -> ((3L, 0L, 0)),
      6L -> ((0L, 2L, 1)), 7L -> ((0L, 2L, 1)), 8L -> ((0L, 2L, 1)))
    assert(got == expect, s"got $got")
  }

  test("rounds beyond convergence are no-ops") {
    assert(peel(pathPlusTriangle, 2, 6) == peel(pathPlusTriangle, 2, 4))
  }

  test("k=1 peels only isolated-by-dedup nodes; duplicate pairs collapse") {
    // duplicated + reversed edges must count once; a self-loop is dropped
    val got = peel(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)), 1, 2)
    assert(got == Map(1L -> ((0L, 1L, 1)), 2L -> ((0L, 1L, 1))), s"got $got")
  }

  test("peel is partition-invariant") {
    val df = pathPlusTriangle.toDF("a", "b")
    val a = Graph.kCorePeel(df, "a", "b", 2, 4)
    val b = Graph.kCorePeel(df.repartition(7), "a", "b", 2, 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  // ---- q188 harmonicCentrality ---------------------------------------

  private def harmonic(pairs: Seq[(Long, Long)], depth: Int) =
    Graph.harmonicCentrality(pairs.toDF("a", "b"), "a", "b", depth)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("hand-traced harmonic sums on the path + triangle, depth 3") {
    val got = harmonic(pathPlusTriangle, depth = 3)
    // path 1-2-3-4-5: node 1 reaches 2@1, 3@2, 4@3 ->
    //   1e6 + 1e6//2 + 1e6//3 = 1833333; node 2 adds both neighbors at
    //   1; center 3 reaches everything within 2. Triangle nodes see
    //   their 2 neighbors at distance 1 and nothing else (components
    //   must not leak).
    val expect = Map(
      1L -> ((3L, 1833333L)), 5L -> ((3L, 1833333L)),
      2L -> ((4L, 2833333L)), 4L -> ((4L, 2833333L)),
      3L -> ((4L, 3000000L)),
      6L -> ((2L, 2000000L)), 7L -> ((2L, 2000000L)),
      8L -> ((2L, 2000000L)))
    assert(got == expect, s"got $got")
  }

  test("depth bound truncates: the path ends see less at depth 1") {
    val got = harmonic(pathPlusTriangle, depth = 1)
    assert(got(1L) === ((1L, 1000000L)) && got(3L) === ((2L, 2000000L)),
      s"got $got")
  }

  test("harmonic is partition-invariant") {
    val df = pathPlusTriangle.toDF("a", "b")
    val a = Graph.harmonicCentrality(df, "a", "b", 3)
    val b = Graph.harmonicCentrality(df.repartition(5), "a", "b", 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
