package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: [[Dedup.editDistancePairs]] agrees with a fully LOCAL
  * reference (JVM levenshtein DP + JVM word-3-gram Jaccard — no Spark on
  * the reference side, so engine and reference share nothing). The
  * generator perturbs a base document with k single-character word
  * substitutions, so pairs land on both sides of the Jaccard floor and
  * the length-relative distance cap, including exact boundaries.
  * Fixed seeds — deterministic.
  */
class FuzzyPairsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(4242L + i)))

  // base doc: 8-20 distinct-ish words of 3-6 chars; variants: substitute
  // the first character of k distinct word positions
  private val genCorpus: Gen[List[String]] = for {
    nWords <- Gen.choose(8, 20)
    words <- Gen.listOfN(nWords, for {
      len <- Gen.choose(3, 6)
      cs <- Gen.listOfN(len, Gen.choose('a', 'z'))
    } yield cs.mkString)
    nVariants <- Gen.choose(1, 3)
    ks <- Gen.listOfN(nVariants, Gen.choose(0, nWords))
  } yield {
    val baseDoc = words.mkString(" ")
    val variants = ks.map { k =>
      words.zipWithIndex.map { case (w, i) =>
        if (i < k) ("z" + w.tail) else w
      }.mkString(" ")
    }
    baseDoc :: variants
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def grams(s: String): Set[String] =
    s.split(" ").sliding(3).map(_.mkString(" ")).toSet

  test("editDistancePairs == local DP + local Jaccard reference on perturbed docs") {
    samples(genCorpus, 6).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
      val got = Dedup.editDistancePairs(
          docs.toDF("doc_id", "text", "lang"), "text", "doc_id", "lang")
        .select("doc_a", "doc_b", "edit_distance")
        .as[(Long, Long, Long)].collect().toSet
      val expect = (for {
        (a, ia) <- corpus.zipWithIndex
        (b, ib) <- corpus.zipWithIndex if ia < ib
        ga = grams(a); gb = grams(b)
        j = ga.intersect(gb).size.toDouble / ga.union(gb).size
        if j >= 0.3
        d = lev(a, b)
        if d <= 0.25 * math.max(a.length, b.length)
      } yield (ia.toLong, ib.toLong, d.toLong)).toSet
      assert(got == expect, s"corpus=$corpus\ngot=$got\nexpect=$expect")
    }
  }
}
