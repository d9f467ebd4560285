package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: [[Dedup.clusterPairs]] agrees with a brute-force
  * union-find on random graphs (chains, cycles, stars, forests all arise
  * from the generator). Fixed seeds — deterministic.
  */
class ClusterPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(1234L + i)))

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 14)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 11L)
      b <- Gen.choose(0L, 11L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min member of the component
    val members = parent.keys.toList
    members.map(x => x -> find(x)).toMap
  }

  test("clusterPairs == union-find on random graphs") {
    samples(genEdges, 8).filter(_.nonEmpty).foreach { edges =>
      val expect = unionFind(edges)
      val got = Dedup.clusterPairs(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"edges $edges")
    }
  }
}
