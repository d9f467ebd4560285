package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q185 generalized CEP with negation: hand-traced matches — earliest
  * completion, strict-gap vetoes, window cut, per-anchor semantics.
  */
class CepSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val pattern = Seq(
    Cep.CepStep("view"),
    Cep.CepStep("click", without = Seq("error")),
    Cep.CepStep("purchase", without = Seq("view")))

  private def run(rows: Seq[(Long, Long, String, String)]) =
    Cep.matchPattern(
      rows.map { case (u, id, t, s) => (u, id, t, ts(s)) }
        .toDF("user_id", "event_id", "event_type", "ts"),
      pattern, windowHours = 24)
      .select(col("user_id"), col("anchor_id")).as[(Long, Long)]
      .collect().toSet

  test("clean chain matches; earliest completion is picked") {
    val got = Cep.matchPattern(Seq(
      (1L, 10L, "view", ts("2024-01-05 01:00:00")),
      (1L, 11L, "click", ts("2024-01-05 02:00:00")),
      (1L, 12L, "click", ts("2024-01-05 03:00:00")),
      (1L, 13L, "purchase", ts("2024-01-05 04:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts"), pattern, 24)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // t1 must be the EARLIEST click (02:00), not the later one
    val base = ts("2024-01-05 01:00:00").getTime * 1000L
    assert(got === Seq((1L, 10L, base, base + 3600L * 1000000L,
      base + 3L * 3600L * 1000000L)), s"got $got")
  }

  test("an error strictly between view and click vetoes the match") {
    assert(run(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 15L, "error", "2024-01-05 01:30:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))) === Set.empty)
    // the same error AFTER the click gap is harmless
    assert(run(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 15L, "error", "2024-01-05 03:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))) === Set((1L, 10L)))
  }

  test("a second view between click and purchase vetoes; equal-ts does not") {
    assert(run(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 16L, "view", "2024-01-05 03:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))) === Set.empty)
    // veto is STRICTLY between: a view at exactly the purchase ts passes
    // (but itself anchors a second match attempt that finds no later
    // purchase — per-anchor semantics)
    assert(run(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 16L, "view", "2024-01-05 04:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))) === Set((1L, 10L)))
  }

  test("window cut: completion past 24h of the anchor does not match") {
    assert(run(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 13L, "purchase", "2024-01-06 02:00:00"))) === Set.empty)
  }

  test("per-anchor semantics: two views each anchor their own match") {
    val got = run(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 20L, "view", "2024-01-05 02:30:00"),
      (1L, 21L, "click", "2024-01-05 03:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00")))
    // anchor 10: click@02:00, but view 20 sits strictly between click
    // and purchase -> vetoed. anchor 20: click@03:00, purchase@04:00,
    // no veto -> matches.
    assert(got === Set((1L, 20L)), s"got $got")
  }

  test("users do not cross-match") {
    assert(run(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (2L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))) === Set.empty)
  }

  private val kleene = Seq(
    Cep.CepStep("view"),
    Cep.CepStep("click", without = Seq("error"),
      minReps = 2, maxReps = Some(3)),
    Cep.CepStep("purchase"))

  private def runK(rows: Seq[(Long, Long, String, String)]) =
    Cep.matchPattern(
      rows.map { case (u, id, t, s) => (u, id, t, ts(s)) }
        .toDF("user_id", "event_id", "event_type", "ts"),
      kleene, windowHours = 24)
      .select(col("user_id"), col("anchor_id"), col("t1_us"),
        col("n1_reps"), col("t2_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("kleene: step completes at the minReps-th occurrence; run length reported") {
    val got = runK(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 12L, "click", "2024-01-05 03:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00")))
    val base = ts("2024-01-05 01:00:00").getTime * 1000L
    // t1 = SECOND click (03:00); n1_reps counts both clicks
    assert(got === Set((1L, 10L, base + 2L * 3600L * 1000000L, 2L,
      base + 3L * 3600L * 1000000L)), s"got $got")
  }

  test("kleene: fewer than minReps occurrences -> no match") {
    assert(runK(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))) === Set.empty)
  }

  test("kleene: maxReps ceiling — a 4th click before the purchase kills the match") {
    val four = Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 12L, "click", "2024-01-05 02:30:00"),
      (1L, 13L, "click", "2024-01-05 03:00:00"),
      (1L, 14L, "click", "2024-01-05 03:30:00"),
      (1L, 15L, "purchase", "2024-01-05 04:00:00"))
    assert(runK(four) === Set.empty, "purchase after the 4th click")
    // purchase between the 3rd and 4th click is fine (run <= 3 when the
    // chain moves on); n1_reps still reports the full run of 4
    val ok = runK(four.map {
      case (u, id, "purchase", _) => (u, id, "purchase", "2024-01-05 03:15:00")
      case r => r
    })
    val base = ts("2024-01-05 01:00:00").getTime * 1000L
    assert(ok === Set((1L, 10L, base + 5400L * 1000000L, 4L,
      base + 8100L * 1000000L)), s"got $ok")
  }

  test("kleene: a veto inside the repetition run (before its completion) kills") {
    // error between click 1 and click 2 = strictly inside (t0, t1) ->
    // vetoed even though it is after the first repetition
    assert(runK(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 19L, "error", "2024-01-05 02:30:00"),
      (1L, 12L, "click", "2024-01-05 03:00:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))) === Set.empty)
    // the same error AFTER the completing (2nd) click is harmless
    assert(runK(Seq(
      (1L, 10L, "view", "2024-01-05 01:00:00"),
      (1L, 11L, "click", "2024-01-05 02:00:00"),
      (1L, 12L, "click", "2024-01-05 02:15:00"),
      (1L, 19L, "error", "2024-01-05 02:30:00"),
      (1L, 13L, "purchase", "2024-01-05 04:00:00"))).nonEmpty)
  }
}
