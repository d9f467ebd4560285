package graft.operators

import java.sql.Timestamp
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Tiny hand-built stream mirroring the reference's 3 scenarios
    * (`TimeoutJoinTest.scala:106-164`): W = 1 hour here.
    *  u1: click 30min after view  -> joined
    *  u2: click 2h after view     -> missed
    *  u3: view; u4: click (unrelated keys) -> u3 missed
    *  u5: click exactly at view.ts + W (boundary, inclusive) -> joined
    *  u6: view exactly at click.ts - W (boundary, inclusive) -> joined
    */
  private lazy val fixture = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
    (2L, ts("2024-01-01 10:30:00"), 1L, "click", 0.0, "{}"),
    (3L, ts("2024-01-01 10:00:00"), 2L, "view", 0.0, "{}"),
    (4L, ts("2024-01-01 12:00:00"), 2L, "click", 0.0, "{}"),
    (5L, ts("2024-01-01 10:00:00"), 3L, "view", 0.0, "{}"),
    (6L, ts("2024-01-01 10:30:00"), 4L, "click", 0.0, "{}"),
    (7L, ts("2024-01-01 10:00:00"), 5L, "view", 0.0, "{}"),
    (8L, ts("2024-01-01 11:00:00"), 5L, "click", 0.0, "{}"),
    (9L, ts("2024-01-01 09:00:00"), 6L, "view", 0.0, "{}"),
    (10L, ts("2024-01-01 10:00:00"), 6L, "click", 0.0, "{}"),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("clickedDisplays: scenario semantics incl. inclusive bounds") {
    val joined = EventJoins.clickedDisplays(fixture, "1 HOUR")
      .select("user_id").as[Long].collect().sorted
    assert(joined.toSeq == Seq(1L, 5L, 6L))
  }

  test("missedDisplays: timeout + unrelated-key isolation") {
    val missed = EventJoins.missedDisplays(fixture, "1 HOUR")
      .select("user_id").as[Long].collect().sorted
    assert(missed.toSeq == Seq(2L, 3L))
  }

  test("missedDisplays equals left-outer+isNull formulation") {
    val a = EventJoins.missedDisplays(fixture, "1 HOUR")
      .select("event_id").as[Long].collect().sorted.toSeq
    val b = EventJoins.missedDisplaysOuter(fixture, "1 HOUR")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("every view is exactly joined or missed (q5 partitions q1/q2)") {
    val ev = Tables.events(spark, sf)
    val outcomes = EventJoins.viewOutcomes(ev, "1 HOUR").cache()
    val views = ev.filter($"event_type" === "view").count()
    assert(outcomes.count() == views)
    val missed = outcomes.filter($"status" === "missed").count()
    val anti = EventJoins.missedDisplays(ev, "1 HOUR").count()
    assert(missed == anti)
    outcomes.unpersist()
  }

  test("timeShift: identity except ts'=ts+W and lineage column") {
    val shifted = EventJoins.timeShift(fixture, "ts", "1 HOUR", "events", "1h")
    assert(shifted.count() == fixture.count())
    val row = shifted.filter($"event_id" === 1L).head()
    assert(row.getAs[Timestamp]("ts") == ts("2024-01-01 11:00:00"))
    assert(row.getAs[String]("stream") == "events.1h")
  }

  test("joinMergeJson: reference payload shape {\"display\":…,\"click\":…}") {
    val p = EventJoins.joinMergeJson(fixture, "1 HOUR")
      .filter($"user_id" === 1L).select("payload").as[String].head()
    assert(p == """{"display":{"event_id":1},"click":{"event_id":2}}""")
  }
}
