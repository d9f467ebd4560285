package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized equivalence: the linear union+window as-of against a fully
  * LOCAL brute-force scan (per probe: filter, sort, last — no Spark on
  * the reference side). Key/timestamp domains are deliberately tiny so
  * every sample forces duplicate timestamps, equal-ts left/right ties,
  * keys on only one side, and empty sides. Fixed seeds — deterministic.
  */
class AsofJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(9797L + i)))

  private val genRows: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] =
    for {
      nl <- Gen.choose(0, 25)
      nr <- Gen.choose(0, 25)
      lefts <- Gen.listOfN(nl,
        Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 9L)))
      rights <- Gen.listOfN(nr, for {
        k <- Gen.choose(1L, 4L)
        t <- Gen.choose(0L, 9L)
        v <- Gen.choose(0L, 999L)
      } yield (k, t, v))
    } yield (lefts, rights)

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin equals a local brute-force argmax on randomized inputs") {
    samples(genRows, 10).foreach { case (lefts, rights0) =>
      // dedupe right per (k, ts) — the operator's documented contract —
      // keeping max payload, as the q109 wrapper does with max(event_id)
      val rights = rights0.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toList
      val lidx = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val l = lidx.map { case (id, k, t) => (id, k, ts(t)) }
        .toDF("left_id", "k", "ts")
      val r = rights.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("k", "ts", "v")
      val got = AsofJoin.asofJoin(l, r, "k", "ts", Seq("v"))
        .select($"left_id", $"v", $"asof_ts")
        .as[(Long, Option[Long], Option[Timestamp])].collect()
        .map(x => x._1 -> ((x._2, x._3.map(_.getTime / 1000)))).toMap
      val expect = lidx.map { case (id, k, t) =>
        val m = rights.filter(x => x._1 == k && x._2 <= t)
          .sortBy(x => (x._2, x._3)).lastOption
        id -> ((m.map(_._3), m.map(_._2)))
      }.toMap
      assert(got == expect,
        s"lefts=$lefts rights=$rights:\n got=$got\n expect=$expect")
    }
  }

  test("asofJoinSplit equals asofJoin on randomized inputs, tiny slices, both modes") {
    // 2-second slices over a 0-9s domain force most keys across several
    // slices, empty slices between occupied ones, and right rows on
    // slice boundaries
    samples(genRows, 6).foreach { case (lefts, rights0) =>
      val rights = rights0.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toList
      val l = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("left_id", "k", "ts")
      val r = rights.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("k", "ts", "v")
      for (strict <- Seq(false, true)) {
        val base = AsofJoin.asofJoin(l, r, "k", "ts", Seq("v"),
            strict = strict)
          .select($"left_id", $"v", $"asof_ts")
          .as[(Long, Option[Long], Option[Timestamp])].collect().sortBy(_._1).toSeq
        val split = AsofJoin.asofJoinSplit(l, r, "k", "ts", Seq("v"),
            strict = strict, slice = "2 seconds")
          .select($"left_id", $"v", $"asof_ts")
          .as[(Long, Option[Long], Option[Timestamp])].collect().sortBy(_._1).toSeq
        assert(split == base,
          s"strict=$strict lefts=$lefts rights=$rights:\n split=$split\n base=$base")
      }
    }
  }
}
