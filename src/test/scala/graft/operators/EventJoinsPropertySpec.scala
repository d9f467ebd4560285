package graft.operators

import java.sql.Timestamp
import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5.2): the interval-join operators agree
  * with a brute-force in-memory model on random keyed event histories,
  * including boundary-equal timestamps. Raw ScalaCheck generators with
  * fixed seeds — deterministic, no scalatestplus bridge needed.
  */
class EventJoinsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(42L + i)))

  private val windowMs = 3600L * 1000L // 1 HOUR

  private case class Ev(id: Long, tsMs: Long, user: Long, typ: String)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 25)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 4L) // few keys -> collisions guaranteed
      // coarse grid so boundary-equal cases (ts diff == exactly W) occur
      slot <- Gen.choose(0L, 6L)
      typ <- Gen.oneOf("view", "click", "purchase")
    } yield (user, slot * windowMs, typ))
  } yield evs.zipWithIndex.map { case ((u, t, ty), i) => Ev(i.toLong, t, u, ty) }

  private def toDf(evs: List[Ev]) =
    evs.map(e => (e.id, new Timestamp(1704067200000L + e.tsMs), e.user, e.typ, 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("q1/q2 agree with the brute-force model on random histories") {
    samples(genEvents, 30).foreach { evs =>
      val df = toDf(evs)
      val views = evs.filter(_.typ == "view")
      val clicks = evs.filter(_.typ == "click")

      // model: click joins view iff same user and view.ts in [click.ts - W, click.ts]
      val modelJoined = (for {
        c <- clicks; v <- views
        if v.user == c.user && v.tsMs >= c.tsMs - windowMs && v.tsMs <= c.tsMs
      } yield (v.id, c.id)).toSet
      val gotJoined = EventJoins.clickedDisplays(df, "1 HOUR")
        .select("view_id", "click_id").as[(Long, Long)].collect().toSet
      assert(gotJoined == modelJoined)

      // model: view missed iff no same-user click in [view.ts, view.ts + W]
      val modelMissed = views.filter(v => !clicks.exists(c =>
        c.user == v.user && c.tsMs >= v.tsMs && c.tsMs <= v.tsMs + windowMs))
        .map(_.id).toSet
      val gotMissed = EventJoins.missedDisplays(df, "1 HOUR")
        .select("event_id").as[Long].collect().toSet
      assert(gotMissed == modelMissed)

      // partition property: every view is joined xor missed under q5
      val outcomes = EventJoins.viewOutcomes(df, "1 HOUR")
        .select("event_id", "status").as[(Long, String)].collect().toMap
      assert(outcomes.keySet == views.map(_.id).toSet)
      val joinedViews = views.filter(v => clicks.exists(c =>
        c.user == v.user && c.tsMs >= v.tsMs && c.tsMs <= v.tsMs + windowMs)).map(_.id).toSet
      assert(outcomes.filter(_._2 == "joined").keySet == joinedViews)
    }
  }

  test("as-of join agrees with the brute-force argmax model on random histories") {
    samples(genEvents, 30).foreach { evs =>
      val df = toDf(evs)
      val views = evs.filter(_.typ == "view")
      val clicks = evs.filter(_.typ == "click")
      // model: per click, the (max ts, then max id) view with same user and
      // ts in [click.ts - W, click.ts]; None when no such view
      val model = clicks.map { c =>
        val cands = views.filter(v =>
          v.user == c.user && v.tsMs <= c.tsMs && v.tsMs >= c.tsMs - windowMs)
        c.id -> (if (cands.isEmpty) None
                 else Some(cands.maxBy(v => (v.tsMs, v.id)).id))
      }.toMap
      val got = EventJoins.clickAttribution(df, "1 HOUR")
        .select("click_id", "view_id").as[(Long, Option[Long])].collect().toMap
      assert(got == model, s"asOf mismatch on ${evs.size} events")
    }
  }

  // finer grid than genEvents: 10-min slots so the EXACT-30-min boundary
  // (inclusive merge) and sub-gap spacings both occur
  private val genSessionEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 25)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 3L)
      slot <- Gen.choose(0L, 18L)
    } yield (user, slot * 10L * 60 * 1000))
  } yield evs.zipWithIndex.map { case ((u, t), i) => Ev(i.toLong, t, u, "view") }

  test("sessionize agrees with a brute-force gap-scan model on random histories") {
    samples(genSessionEvents, 20).foreach { evs =>
      val df = toDf(evs)
      // model: sort each user's ts, split where gap STRICTLY exceeds 30min
      // (session_window's merge bound is inclusive)
      val gapMs = 30L * 60 * 1000
      val model = evs.groupBy(_.user).flatMap { case (u, es) =>
        val ts = es.map(e => 1704067200000L + e.tsMs).sorted
        if (ts.isEmpty) Nil
        else {
          val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
            if (t - acc.head.head <= gapMs) (t :: acc.head) :: acc.tail
            else List(t) :: acc
          }
          sessions.map(s => (u, s.min, s.max, s.size.toLong))
        }
      }.toSet
      val got = Relational.sessionize(df, "30 minutes")
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map(r => (r._1, r._2.getTime, r._3.getTime, r._4)).toSet
      assert(got == model, s"sessions mismatch on ${evs.size} events")
    }
  }

  test("time-shift is a bijection preserving key and payload") {
    samples(genEvents, 10).foreach { evs =>
      val df = toDf(evs)
      val shifted = EventJoins.timeShift(df, "ts", "1 HOUR", "events", "1h")
      val pairs = shifted.select("event_id", "ts").as[(Long, Timestamp)].collect().toMap
      val orig = df.select("event_id", "ts").as[(Long, Timestamp)].collect().toMap
      assert(pairs.keySet == orig.keySet)
      pairs.foreach { case (id, t) =>
        assert(t.getTime == orig(id).getTime + windowMs)
      }
    }
  }
}
