package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: [[Relational.dailyGapFill]] agrees with an in-memory
  * reference on random sparse day series — single-day groups, dense
  * groups, multi-day holes and adjacent holes all arise from the
  * generator. Values are integer-valued doubles so per-day sums are
  * exact under any aggregation order. Fixed seeds — deterministic.
  */
class GapFillPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(77L + i)))

  // per group: a non-empty set of day offsets in 0..15, 1-3 events per day
  private val genSeries: Gen[Map[String, Map[Int, List[Double]]]] = for {
    nGroups <- Gen.choose(1, 3)
    groups <- Gen.sequence[List[(String, Map[Int, List[Double]])], (String, Map[Int, List[Double]])](
      (0 until nGroups).toList.map { g =>
        for {
          days <- Gen.nonEmptyListOf(Gen.choose(0, 15)).map(_.distinct)
          perDay <- Gen.sequence[List[(Int, List[Double])], (Int, List[Double])](
            days.map(d => Gen.nonEmptyListOf(Gen.choose(1, 9))
              .map(vs => d -> vs.take(3).map(_.toDouble))))
        } yield s"g$g" -> perDay.toMap
      })
  } yield groups.toMap

  private val base = java.time.LocalDate.parse("2024-06-01")

  private def reference(series: Map[Int, List[Double]]): Seq[(Int, Long, Option[Double], Double, Int)] = {
    val (d0, d1) = (series.keys.min, series.keys.max)
    var lastSeen = 0.0
    (d0 to d1).map { d =>
      series.get(d) match {
        case Some(vs) =>
          lastSeen = vs.sum
          (d, vs.length.toLong, Some(lastSeen), lastSeen, 0)
        case None =>
          (d, 0L, None, lastSeen, 1)
      }
    }
  }

  test("dailyGapFill == in-memory resample + forward fill on random series") {
    samples(genSeries, 6).foreach { data =>
      val rows = for {
        (g, series) <- data.toSeq
        (d, vs) <- series.toSeq
        v <- vs
      } yield (g, java.sql.Timestamp.valueOf(
        base.plusDays(d).atTime(12, 0, 0)), v)
      val got = Relational.dailyGapFill(
          rows.toDF("event_type", "ts", "value"), gapEvery = 0)
        .as[(String, Long, Long, Option[Double], Double, Int)].collect()
        .groupBy(_._1)
        .view.mapValues(_.sortBy(_._2).map(r =>
          ((r._2 - base.toEpochDay).toInt, r._3, r._4, r._5, r._6)).toSeq)
        .toMap
      val expect = data.view.mapValues(reference).toMap
      assert(got == expect, s"data=$data\ngot=$got\nexpect=$expect")
    }
  }
}
