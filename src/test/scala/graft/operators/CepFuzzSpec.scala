package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** q185 CEP fuzz: the relational matcher vs an independently-written
  * per-user brute-force reference on seeded random event streams with
  * deliberate timestamp collisions (strict-inequality boundaries are
  * where CEP implementations diverge).
  */
class CepFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val pattern = Seq(
    Cep.CepStep("view"),
    Cep.CepStep("click", without = Seq("error")),
    Cep.CepStep("purchase", without = Seq("view")))
  private val windowUs = 24L * 3600L * 1000000L

  /** Straight-line reference: per anchor, earliest completion per step,
    * then the veto check on the gap actually used.
    */
  private def reference(ev: Seq[(Long, Long, String, Long)])
      : Set[(Long, Long, Long, Long, Long)] = {
    ev.groupBy(_._1).flatMap { case (user, rows) =>
      rows.filter(_._3 == pattern.head.tpe).flatMap { anchor =>
        val t0 = anchor._4
        var prev = t0
        var times = List(t0)
        var dead = false
        pattern.drop(1).foreach { step =>
          if (!dead) {
            val cands = rows.filter(r => r._3 == step.tpe &&
              r._4 > prev && r._4 <= t0 + windowUs).map(_._4)
            if (cands.isEmpty) dead = true
            else {
              val t = cands.min
              val vetoed = step.without.exists(vt => rows.exists(r =>
                r._3 == vt && r._4 > prev && r._4 < t))
              if (vetoed) dead = true
              else { times = t :: times; prev = t }
            }
          }
        }
        if (dead) None
        else {
          val ts = times.reverse
          Some((user, anchor._2, ts(0), ts(1), ts(2)))
        }
      }
    }.toSet
  }

  test("matcher == brute-force reference on 60 seeded random streams") {
    val rnd = new scala.util.Random(1234)
    val types = Array("view", "click", "purchase", "error", "other")
    (1 to 60).foreach { trial =>
      val ev = (1 to 24).map { i =>
        val user = 1L + rnd.nextInt(3)
        // coarse second grid in a 40 s range: collisions are the point
        val sec = rnd.nextInt(40)
        (user, i.toLong, types(rnd.nextInt(types.length)),
          sec * 1000000L)
      }
      val df = ev.map { case (u, id, t, us) =>
        (u, id, t, new Timestamp(us / 1000L))
      }.toDF("user_id", "event_id", "event_type", "ts")
      val got = Cep.matchPattern(df, pattern, windowHours = 24)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === reference(ev),
        s"trial $trial diverged: only-engine=${(got -- reference(ev)).take(3)} " +
          s"only-ref=${(reference(ev) -- got).take(3)} events=$ev")
    }
  }
}
