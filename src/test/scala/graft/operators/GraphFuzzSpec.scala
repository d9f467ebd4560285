package graft.operators

import graft.SparkSpec

/** q184/q188 fuzz: the distributed peel and BFS against straight-line
  * references on seeded random graphs (dense-ish, with multi-edges and
  * reversed duplicates to exercise the normalization).
  */
class GraphFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def adj(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val norm = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    norm.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  private def refKCore(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, (Long, Long, Int)] = {
    val g = adj(edges)
    var alive = g.keySet
    var out = Map.empty[Long, (Long, Long, Int)]
    (1 to rounds).foreach { r =>
      val deg = alive.map(v => v -> (g(v) & alive).size).toMap
      val peel = alive.filter(v => deg(v) < k)
      peel.foreach(v => out += v -> ((r.toLong, deg(v).toLong, 0)))
      alive = alive -- peel
    }
    alive.foreach { v =>
      out += v -> ((0L, (g(v) & alive).size.toLong, 1))
    }
    out
  }

  private def refHarmonic(edges: Seq[(Long, Long)], maxDepth: Int)
      : Map[Long, (Long, Long)] = {
    val g = adj(edges)
    g.keySet.map { root =>
      var dist = Map(root -> 0)
      var frontier = Set(root)
      (1 to maxDepth).foreach { d =>
        val next = frontier.flatMap(g(_)) -- dist.keySet
        dist ++= next.map(_ -> d)
        frontier = next
      }
      val reached = dist.filter(_._2 >= 1)
      root -> ((reached.size.toLong,
        reached.values.map(d => 1000000L / d).sum))
    }.toMap
  }

  test("k-core peel matches the reference on 25 seeded random graphs") {
    val rnd = new scala.util.Random(77)
    (1 to 25).foreach { trial =>
      val n = 6 + rnd.nextInt(8)
      val edges = (1 to n * 2).map(_ =>
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
      val k = 1 + rnd.nextInt(3)
      if (edges.exists(e => e._1 != e._2)) {
        val got = Graph.kCorePeel(edges.toDF("a", "b"), "a", "b", k,
          rounds = 6)
          .as[(Long, Long, Long, Int)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        val ref = refKCore(edges, k, 6)
        assert(got === ref, s"trial $trial k=$k edges=$edges")
      }
    }
  }

  test("harmonic centrality matches the reference on 25 seeded graphs") {
    val rnd = new scala.util.Random(99)
    (1 to 25).foreach { trial =>
      val n = 6 + rnd.nextInt(8)
      val edges = (1 to n * 2).map(_ =>
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
      if (edges.exists(e => e._1 != e._2)) {
        val got = Graph.harmonicCentrality(edges.toDF("a", "b"), "a", "b",
          maxDepth = 3)
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val ref = refHarmonic(edges, 3)
        assert(got === ref, s"trial $trial edges=$edges")
      }
    }
  }
}
