package graft.operators

import graft.SparkSpec

/** q209 Nelson-Aalen: hand-computed risk sets with censoring, the
  * conversion-on-entry edge, and the censoring-keeps-users-at-risk
  * convention.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Int, String)]) =
    rows.zipWithIndex.map { case ((u, day, t), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 00:00:00"),
        u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("hand case: censored users stay in the risk set, steps are exact") {
    // u1: enters day0, converts day2 (t=2, event)
    // u2: enters day0, converts day0 (t=0, event — conversion on entry)
    // u3: enters day1, never converts; obs end = day4 -> censored t=3
    // u4: enters day0, never converts -> censored t=4
    val rows = Seq(
      (1L, 0, "view"), (1L, 2, "purchase"),
      (2L, 0, "purchase"),
      (3L, 1, "view"), (3L, 2, "click"),
      (4L, 0, "view"), (4L, 4, "view"))
    val got = Survival.nelsonAalenHazard(ev(rows))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // durations: t=0 ev (u2), t=2 ev (u1), t=3 cens (u3), t=4 cens (u4)
    // event days: 0 (n=4, d=1) and 2 (n=3, d=1)
    assert(got.length == 2)
    assert(got(0) == ((0L, 4L, 1L, 250000L, 250000L)))
    assert(got(1) == ((2L, 3L, 1L, 333333L, 583333L)))
  }

  test("no conversions at all: empty curve, no division by anything") {
    val rows = Seq((1L, 0, "view"), (2L, 1, "click"))
    assert(Survival.nelsonAalenHazard(ev(rows)).count() == 0L)
  }

  test("kaplan-meier: integer recurrence matches a straight-line fold, " +
      "same step table as the hazard, monotone") {
    val events = graft.Tables.events(spark, sf)
    val na = Survival.nelsonAalenHazard(events)
      .orderBy(org.apache.spark.sql.functions.col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val km = Survival.kaplanMeier(events)
      .orderBy(org.apache.spark.sql.functions.col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(km.map(x => (x._1, x._2, x._3)).toSeq === na.toSeq)
    var s = 1000000L
    km.foreach { case (_, n, d, got) =>
      s = s * (n - d) / n
      assert(got == s)
    }
    assert(km.nonEmpty)
    km.foldLeft(1000000L) { case (prev, (_, _, _, sNow)) =>
      assert(sNow <= prev && sNow >= 0L)
      sNow
    }
  }

  test("kaplan-meier cap fires before collecting an oversized table") {
    val events = graft.Tables.events(spark, sf)
    val ex = intercept[IllegalArgumentException] {
      Survival.kaplanMeier(events, maxSteps = 1)
    }
    assert(ex.getMessage.contains("duration-day"))
  }

  test("q328 log-rank: symmetric cohorts z=0; planted split z=sqrt(3)") {
    // parity split: even users = cohort A, odd = cohort B
    // symmetric: one converter at t=2 and one censored per cohort
    val sym = Seq(
      (0L, 0, "view"), (0L, 2, "purchase"),
      (1L, 0, "view"), (1L, 2, "purchase"),
      (2L, 0, "view"), (2L, 4, "view"),
      (3L, 0, "view"), (3L, 4, "view"))
    val z0 = Survival.logRank(ev(sym))
      .as[(Long, Long, Double)].collect().head
    assert(z0 === ((1L, 1L, 0.0)), s"$z0")
    // cohort A converts at t=1, cohort B at t=3:
    // t=1: O-E = 2 - 2*(2/4) = 1, V = 2*(1/2)(1/2)(2/3) = 1/3
    // t=3: cohort A gone, nra=0 -> both terms 0; z = sqrt(3)
    val split = Seq(
      (0L, 0, "view"), (0L, 1, "purchase"),
      (2L, 0, "view"), (2L, 1, "purchase"),
      (1L, 0, "view"), (1L, 3, "purchase"),
      (3L, 0, "view"), (3L, 3, "purchase"))
    val zs = Survival.logRank(ev(split))
      .as[(Long, Long, Double)].collect().head
    assert(zs._1 === 2L && zs._2 === 2L, s"$zs")
    assert(zs._3 === 1.732051, s"$zs")
  }
}
