package graft.operators

import graft.SparkSpec

/** q200 Markov removal-effect attribution: hand-traced chains, journey
  * segmentation semantics, and a fuzz pass against an independent
  * straight-line value-iteration reference.
  */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-05 $h%02d:$m%02d:00")

  private def ev(rows: Seq[(Long, Long, String, Int)]) =
    rows.map { case (u, id, t, h) => (u, id, t, ts(h)) }
      .toDF("user_id", "event_id", "event_type", "ts")

  test("a channel on every converting path takes all the credit") {
    // u1,u2: click -> purchase; u3: view -> (end, NULL)
    val rows = Seq(
      (1L, 10L, "click", 1), (1L, 11L, "purchase", 2),
      (2L, 20L, "click", 1), (2L, 21L, "purchase", 2),
      (3L, 30L, "view", 1))
    val got = Relational.markovRemovalEffect(ev(rows))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // base: p(click)=1e6, p(view)=0, p(START)=(2*1e6+0) div 3 = 666666
    assert(got("click") == (("click", 666666L, 0L, 666666L, 1000000L)))
    // removing view changes nothing: (2*1e6 + 1*0) div 3 unchanged
    assert(got("view") == (("view", 666666L, 666666L, 0L, 0L)))
  }

  test("conversion closes a journey; the next event opens a new one") {
    // one user: click, purchase, view  ->  journeys [click,CONV], [view,NULL]
    val rows = Seq(
      (1L, 10L, "click", 1), (1L, 11L, "purchase", 2), (1L, 12L, "view", 3))
    val got = Relational.markovRemovalEffect(ev(rows))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // START->click, START->view (n=2); click->CONV; view->NULL
    // base p(START) = (1e6 + 0) div 2 = 500000; click carries it all
    assert(got("click")._2 == 500000L)
    assert(got("click")._4 == 500000L && got("click")._5 == 1000000L)
    assert(got("view")._4 == 0L)
  }

  test("a journey opening with a conversion is START -> CONV directly") {
    // u1: purchase first (START->CONV), then click (new journey -> NULL)
    val rows = Seq((1L, 10L, "purchase", 1), (1L, 11L, "click", 2))
    val got = Relational.markovRemovalEffect(ev(rows))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // START: ->CONV 1, ->click 1; click->NULL.
    // base = (1e6 + 0) div 2 = 500000; removing click changes nothing
    assert(got("click") == (("click", 500000L, 500000L, 0L, 0L)))
  }

  test("fuzz: matches an independent dense value-iteration reference") {
    val types = Array("a", "b", "c", "purchase")
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val rows = for {
        u <- 1L to 6L
        i <- 0 until (3 + rnd.nextInt(8))
      } yield (u, u * 100 + i, types(rnd.nextInt(types.length)),
        i / 60, i % 60)
      val df = rows.map { case (u, id, t, h, m) => (u, id, t, ts(h, m)) }
        .toDF("user_id", "event_id", "event_type", "ts")
      val got = Relational.markovRemovalEffect(df)
        .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
      val want = referenceRemoval(rows.map(r => (r._1, r._2, r._3)))
      assert(got.toSeq == want, s"seed $seed: $got vs $want")
    }
  }

  /** Straight-line reference: journeys -> matrix -> 12 iteration rounds,
    * written against maps and explicit loops (no shared code with the
    * operator).
    */
  private def referenceRemoval(rows: Seq[(Long, Long, String)])
      : Seq[(String, Long, Long, Long, Long)] = {
    val trans = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    rows.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(_._2).map(_._3)
      var prev = "START"
      ordered.foreach { t =>
        if (t == "purchase") { trans((prev, "CONV")) += 1; prev = "START" }
        else { trans((prev, t)) += 1; prev = t }
      }
      if (prev != "START") trans((prev, "NULL")) += 1
    }
    val states = trans.keys.map(_._1).toSet
    val ns = states.map(s =>
      s -> trans.filter(_._1._1 == s).values.sum).toMap
    def absorb(removed: String): Long = {
      var p = states.map(_ -> 0L).toMap
      for (_ <- 1 to 12) {
        p = states.map { s =>
          s -> (if (s == removed) 0L
          else trans.collect { case ((f, t), c) if f == s =>
            c * (if (t == "CONV") 1000000L
            else if (t == "NULL") 0L else p(t))
          }.sum / ns(s))
        }.toMap
      }
      p.getOrElse("START", 0L)
    }
    val base = absorb("__none__")
    val channels = (states - "START").toSeq.sorted
    val effs = channels.map(c => base - absorb(c))
    val tot = effs.sum
    channels.zip(effs).map { case (c, e) =>
      (c, base, base - e, e, if (tot == 0) 0L else e * 1000000L / tot)
    }
  }
}
