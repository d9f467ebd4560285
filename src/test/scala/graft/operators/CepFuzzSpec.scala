package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** q185/q195 CEP fuzz: the relational matcher vs an independently-
  * written per-user brute-force reference on seeded random event
  * streams with deliberate timestamp collisions (strict-inequality
  * boundaries are where CEP implementations diverge). The reference
  * implements the DECLARED semantics straight-line: per anchor, the
  * minReps-th occurrence per step, gap vetoes on the gap actually used,
  * and the maxReps ceiling on the next completion.
  */
class CepFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val pattern = Seq(
    Cep.CepStep("view"),
    Cep.CepStep("click", without = Seq("error")),
    Cep.CepStep("purchase", without = Seq("view")))
  private val windowUs = 24L * 3600L * 1000000L

  /** Straight-line reference for the full step language. Returns
    * (user, anchor, step times..., rep-counts of quantified steps).
    */
  private def reference(pat: Seq[Cep.CepStep],
      ev: Seq[(Long, Long, String, Long)])
      : Set[(Long, Long, List[Long], List[Long])] = {
    ev.groupBy(_._1).flatMap { case (user, rows) =>
      rows.filter(_._3 == pat.head.tpe).flatMap { anchor =>
        val t0 = anchor._4
        var prev = t0
        var times = List(t0)
        var reps = List.empty[Long]
        var ceil: Option[Long] = None
        var dead = false
        pat.drop(1).foreach { step =>
          if (!dead) {
            val cands = rows.filter(r => r._3 == step.tpe &&
              r._4 > prev && r._4 <= t0 + windowUs).map(_._4).sorted
            if (cands.size < step.minReps) dead = true
            else {
              val t = cands(step.minReps - 1)
              // previous step's ceiling binds this completion
              if (ceil.exists(t >= _)) dead = true
              else {
                val vetoed = step.without.exists(vt => rows.exists(r =>
                  r._3 == vt && r._4 > prev && r._4 < t))
                if (vetoed) dead = true
                else {
                  times = t :: times
                  if (step.minReps > 1 || step.maxReps.isDefined)
                    reps = cands.size.toLong :: reps
                  ceil = step.maxReps.flatMap(mx =>
                    if (cands.size > mx) Some(cands(mx)) else None)
                  prev = t
                }
              }
            }
          }
        }
        if (dead) None
        else Some((user, anchor._2, times.reverse, reps.reverse))
      }
    }.toSet
  }

  private def randomEvents(rnd: scala.util.Random, n: Int)
      : Seq[(Long, Long, String, Long)] = {
    val types = Array("view", "click", "purchase", "error", "other")
    (1 to n).map { i =>
      val user = 1L + rnd.nextInt(3)
      // coarse second grid in a 40 s range: collisions are the point
      val sec = rnd.nextInt(40)
      (user, i.toLong, types(rnd.nextInt(types.length)), sec * 1000000L)
    }
  }

  private def toDf(ev: Seq[(Long, Long, String, Long)]) =
    ev.map { case (u, id, t, us) => (u, id, t, new Timestamp(us / 1000L)) }
      .toDF("user_id", "event_id", "event_type", "ts")

  test("matcher == brute-force reference on 60 seeded random streams") {
    val rnd = new scala.util.Random(1234)
    (1 to 60).foreach { trial =>
      val ev = randomEvents(rnd, 24)
      val got = Cep.matchPattern(toDf(ev), pattern, windowHours = 24)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, List(r._3, r._4, r._5), List.empty[Long]))
        .toSet
      val want = reference(pattern, ev)
      assert(got === want,
        s"trial $trial diverged: only-engine=${(got -- want).take(3)} " +
          s"only-ref=${(want -- got).take(3)} events=$ev")
    }
  }

  test("kleene matcher == brute-force reference on 60 seeded random streams") {
    // click{2,3} with a veto inside the run; dense collisions exercise
    // the m-th-occurrence and ceiling boundaries
    val pat = Seq(
      Cep.CepStep("view"),
      Cep.CepStep("click", without = Seq("error"),
        minReps = 2, maxReps = Some(3)),
      Cep.CepStep("purchase", without = Seq("signup")))
    val rnd = new scala.util.Random(5678)
    val types =
      Array("view", "click", "click", "purchase", "error", "signup")
    (1 to 60).foreach { trial =>
      val ev = (1 to 28).map { i =>
        val user = 1L + rnd.nextInt(3)
        val sec = rnd.nextInt(40)
        (user, i.toLong, types(rnd.nextInt(types.length)),
          sec * 1000000L)
      }
      val got = Cep.matchPattern(toDf(ev), pat, windowHours = 24)
        .selectExpr("user_id", "anchor_id", "t0_us", "t1_us", "t2_us",
          "n1_reps")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, List(r._3, r._4, r._5), List(r._6)))
        .toSet
      val want = reference(pat, ev)
      assert(got === want,
        s"trial $trial diverged: only-engine=${(got -- want).take(3)} " +
          s"only-ref=${(want -- got).take(3)} events=$ev")
    }
  }
}
