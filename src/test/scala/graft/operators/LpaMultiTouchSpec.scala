package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q173 deterministic synchronous LPA + q174 U-shaped multi-touch
  * attribution: hand-traced convergence, the exact-ppm invariant, and
  * partition invariance.
  */
class LpaMultiTouchSpec extends SparkSpec {
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(
      edges.flatMap(e => Seq(e, e.swap)).toDF("src", "dst"),
      "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("lpa: two triangles joined by a bridge split into two communities") {
    // {1,2,3} and {4,5,6} cliques, bridge 3-4; hand-traced synchronous
    // rounds with (count DESC, label ASC) stabilize at labels 1 and 3
    val got = lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)), iters = 4)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
  }

  test("lpa: a node with no in-neighbors keeps its own label (directed)") {
    // 1 -> 2 directed only: node 1 never receives a label and must keep
    // lbl=1 every round instead of vanishing; node 2 adopts 1's label
    val got = Graph.labelPropagation(
      Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L), s"got $got")
  }

  test("lpa is partition-invariant on the bipartite demo graph") {
    val edges = (for (c <- 1L to 6L; s <- 1L to 3L if (c + s) % 2 == 0)
      yield (c, 100L + s)).flatMap(e => Seq(e, e.swap))
    val a = Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", 4)
    val b = Graph.labelPropagation(edges.toDF("src", "dst").repartition(7),
      "src", "dst", 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  // ---- q176 eventTrigramPatterns -------------------------------------

  test("event trigrams: per-user ordered sequences, distinct-user support") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 walks a-b-c twice (support must count the USER once);
    // user 2 walks it once; user 3 walks a-c-b (different order!)
    def walk(u: Long, base: Int, types: Seq[String]) =
      types.zipWithIndex.map { case (t, i) =>
        (u, (base + i).toLong, t, ts(f"2024-01-05 ${8 + i}%02d:00:00"))
      }
    val ev = (walk(1L, 10, Seq("a", "b", "c", "a", "b", "c")) ++
      walk(2L, 20, Seq("a", "b", "c")) ++
      walk(3L, 30, Seq("a", "c", "b")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Relational.eventTrigramPatterns(ev, minSupportUsers = 2)
      .as[(String, String, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    // a-b-c: users {1,2}, occurrences 3 (user 1 twice)
    assert(got == Map(("a", "b", "c") -> ((2L, 3L))), s"got $got")
    // order sensitivity: a-c-b exists only for user 3 -> under support
    val all = Relational.eventTrigramPatterns(ev, minSupportUsers = 1)
      .as[(String, String, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3)).toSet
    assert(all.contains(("a", "c", "b")))
  }

  // ---- q181 markovKStep ----------------------------------------------

  test("markov k-step: hand flows, floor losses, absorbing carry-over") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-05 $h%02d:00:00")
    // transitions: a->b twice (users 1,2), b->a once, b->c once; c absorbs
    val ev = Seq(
      (1L, 10L, "a", ts(1)), (1L, 11L, "b", ts(2)), (1L, 12L, "a", ts(3)),
      (2L, 20L, "a", ts(1)), (2L, 21L, "b", ts(2)), (2L, 22L, "c", ts(3)))
      .toDF("user_id", "event_id", "event_type", "ts")
    // counts: a->b: 2 (rs_a=2); b->a: 1, b->c: 1 (rs_b=2); states {a,b}
    // v0 = 500000 each
    // step1: b += 500000 (from a); a += 250000, c += 250000 (from b)
    val v1 = Relational.markovKStep(ev, steps = 1)
      .as[(String, Long)].collect().toMap
    assert(v1 == Map("a" -> 250000L, "b" -> 500000L, "c" -> 250000L), s"$v1")
    // step2: from a(250k)->b 250k; from b(500k)->a 250k, c 250k;
    // c's 250k CARRIES (absorbing): c = 250k + 250k
    val v2 = Relational.markovKStep(ev, steps = 2)
      .as[(String, Long)].collect().toMap
    assert(v2 == Map("a" -> 250000L, "b" -> 250000L, "c" -> 500000L), s"$v2")
    assert(v2.values.sum === 1000000L, "mass conserved incl. absorber")
  }

  // ---- q182 basketPairLift -------------------------------------------

  test("basket pairs: hand lift, support floor, oversized-basket cap") {
    // baskets: {A,B} x3, {A,C}, {B,C}; N=5 capped baskets
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (4L, 10L), (4L, 30L), (5L, 20L), (5L, 30L))
    val got = Graph.basketPairLift(rows.toDF("b", "it"), "b", "it",
      minSupport = 2, maxBasketSize = 20)
      .as[(Long, Long, Long, Long)].collect()
    // co(10,20)=3, c10=4, c20=4, N=5 -> lift = 3*5*1e6 // 16 = 937500
    assert(got.toSeq === Seq((10L, 20L, 3L, 937500L)), s"got ${got.toSeq}")
    // a giant basket holding the only 40-50 pair is capped away
    val withGiant = rows ++ (1L to 25L).map(i => (9L, 100L + i)) ++
      Seq((9L, 40L), (9L, 50L))
    val capped = Graph.basketPairLift(withGiant.toDF("b", "it"), "b", "it",
      minSupport = 1, maxBasketSize = 20)
      .select(col("it_a"), col("it_b")).as[(Long, Long)].collect().toSet
    assert(!capped.contains((40L, 50L)), s"got $capped")
  }

  // ---- q175 itemCosineSimilarity -------------------------------------

  test("item-cf: hand cosine, minCo floor, and the hot-user cap") {
    val inter = Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 300L)).toDF("u", "it")
    val got = Graph.itemCosineSimilarity(inter, "u", "it",
      maxCustDeg = 50, minCo = 2)
      .as[(Long, Long, Long, Double)].collect()
    // co(100,200)=2, deg(100)=3, deg(200)=2 -> 2/sqrt(6); (100,300)
    // falls under the minCo floor
    assert(got.toSeq === Seq((100L, 200L, 2L, 0.816497)), s"got ${got.toSeq}")
    // a power user is the ONLY link between 400 and 500: capped out,
    // the pair disappears (and 400/500 also leave the degree base)
    val hot = (1L to 10L).map(i => (99L, i * 1000L)) ++
      Seq((99L, 400L), (99L, 500L), (50L, 400L), (51L, 500L))
    val capped = Graph.itemCosineSimilarity(
      (inter.as[(Long, Long)].collect().toSeq ++ hot).toDF("u", "it"),
      "u", "it", maxCustDeg = 5, minCo = 1)
      .select(col("it_a"), col("it_b")).as[(Long, Long)].collect().toSet
    assert(!capped.contains((400L, 500L)), s"got $capped")
    assert(capped.contains((100L, 200L)))
  }

  test("multi-touch: hand journeys — U-shape, remainder pinning, window cut") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: five views then purchase -> 400000 / 66668 / 66666 /
      // 66666 / 400000 (remainder 2 pinned to the first interior)
      (1L, 10L, "view", ts("2024-01-05 01:00:00")),
      (1L, 11L, "view", ts("2024-01-05 02:00:00")),
      (1L, 12L, "view", ts("2024-01-05 03:00:00")),
      (1L, 13L, "view", ts("2024-01-05 04:00:00")),
      (1L, 14L, "view", ts("2024-01-05 05:00:00")),
      (1L, 15L, "purchase", ts("2024-01-05 06:00:00")),
      // user 2: single view -> all 1e6; a second view OUTSIDE the 24h
      // window must not dilute it
      (2L, 20L, "view", ts("2024-01-02 00:00:00")),
      (2L, 21L, "view", ts("2024-01-05 01:00:00")),
      (2L, 22L, "purchase", ts("2024-01-05 02:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = EventJoins.multiTouchAttribution(ev, windowHours = 24)
      .select(col("view_id"), col("credit_ppm")).as[(Long, Long)]
      .collect().toMap
    assert(got == Map(10L -> 400000L, 11L -> 66668L, 12L -> 66666L,
      13L -> 66666L, 14L -> 400000L, 21L -> 1000000L), s"got $got")
  }

  test("multi-touch conserves exactly 1e6 ppm per credited purchase (sf0.001)") {
    val events = graft.Tables.events(spark, sf)
    val total = EventJoins.multiTouchAttribution(events)
      .agg(sum(col("credit_ppm"))).as[Long].head()
    // purchases with >= 1 view in the 24h lookback
    val pur = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("pt"))
    val vw = events.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vt"))
    val credited = pur.join(vw, Seq("user_id"))
      .filter(col("vt") <= col("pt") &&
        col("vt") >= col("pt") - lit(24L * 3600L * 1000000L))
      .select(col("p_id")).distinct().count()
    assert(total === credited * 1000000L,
      s"total=$total credited=$credited")
  }
}
