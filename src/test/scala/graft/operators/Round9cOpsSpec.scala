package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 tail operators: integer-grid PageRank (q158), stupid-backoff
  * trigram scoring (q159), two-sample KS drift (q160), binned interval-
  * overlap co-activity (q161) — hand-computed pins plus the properties
  * that motivate each design (exact-grid determinism, live backoff,
  * shape-vs-mean drift, bin-candidate completeness).
  */
class Round9cOpsSpec extends SparkSpec {
  import spark.implicits._

  // via Tables: the raw testdata parquet is TIMESTAMP_NTZ; the loader
  // normalizes to session-zoned TIMESTAMP (the operators' contract)
  private def events: DataFrame = graft.Tables.events(spark, sf)

  // ---- q158 pageRankMicros -------------------------------------------

  private def pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankMicros(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("pagerank: a symmetric cycle is the fixed point 1e6") {
    // deg=1 everywhere: r' = 150000 + (85 * 1e6) div 100 = 1e6 exactly
    val got = pr(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 4)
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pagerank: one round of the star matches the hand-computed grid") {
    // hub 0 <-> leaves 1..4 (both orientations). deg(hub)=4, deg(leaf)=1.
    // leaf' = 150000 + (85 * (1e6 div 4)) div 100 = 362500
    // hub'  = 150000 + (85 * 4e6) div 100       = 3550000
    val edges = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val got = pr(edges, iters = 1)
    assert(got(0L) === 3550000L)
    (1L to 4L).foreach(l => assert(got(l) === 362500L))
  }

  test("pagerank: hub outranks leaves at convergence and is partition-invariant") {
    val edges = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val a = pr(edges, iters = 4)
    assert(a(0L) > a(1L))
    // exact integer grid: any partitioning computes the SAME longs
    val shuffled = Graph.pageRankMicros(
      edges.toDF("src", "dst").repartition(7), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(shuffled == a)
  }

  test("pagerank: a source-only node keeps its teleport rank on a directed graph") {
    // 1 -> 2 only. Node 1 has no in-edges: every round it must emit the
    // pure teleport 150000 (the old inner-join form dropped it after
    // round 1). Node 2: round 1 = 150000 + 85*(1e6 div 1) div 100 = 1e6;
    // round 2 = 150000 + 85*150000 div 100 = 277500.
    assert(pr(Seq((1L, 2L)), iters = 1) ==
      Map(1L -> 150000L, 2L -> 1000000L))
    assert(pr(Seq((1L, 2L)), iters = 2) ==
      Map(1L -> 150000L, 2L -> 277500L))
  }

  test("weighted pagerank: proportional flow on a weighted star; w=1 == unweighted") {
    // hub 0 <-> leaves 1,2 with weights 3,1 (both orientations).
    // W(hub)=4: leaf1' = 150000 + (85*(1e6*3 div 4)) div 100 = 787500,
    // leaf2' = 150000 + (85*(1e6*1 div 4)) div 100 = 362500,
    // hub'   = 150000 + (85*(1e6+1e6)) div 100     = 1850000
    val we = Seq((0L, 1L, 3L), (1L, 0L, 3L), (0L, 2L, 1L), (2L, 0L, 1L))
    val got = Graph.pageRankMicrosWeighted(
      we.toDF("src", "dst", "w"), "src", "dst", "w", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1850000L, 1L -> 787500L, 2L -> 362500L),
      s"got $got")
    // all-ones weights reduce to the unweighted iteration exactly
    val edges = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val unw = pr(edges, iters = 4)
    val w1 = Graph.pageRankMicrosWeighted(
      edges.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w"),
      "src", "dst", "w", iters = 4).as[(Long, Long)].collect().toMap
    assert(w1 == unw)
  }

  // ---- q159 trigramBackoffSurprisal ----------------------------------

  test("trigram stupid backoff: hand-computed held-out chain") {
    // train: "a b c", "a b d" -> c1: a2 b2 c1 d1 (N=6, V=4);
    // c2: (a,b)2 (b,c)1 (b,d)1, cf1: a2 b2; c3: (a,b,c)1 (a,b,d)1, cf2 (a,b)2
    // held doc 7 = "a b c z":
    //   'a'      s1 = 3/10
    //   'b'|a    s2 = 2/2 = 1.0
    //   'c'|a,b  s3 = 1/2
    //   'z'|b,c  -> 0.4 * (0.4 * s1(z)) = 0.4 * 0.4 * 0.1
    // held doc 17 = "z z": s1(z)=0.1 then unseen context: 0.4 * 0.1
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (7L, "a b c z"),
      (17L, "z z")).toDF("doc_id", "text")
    val got = Pipelines.trigramBackoffSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def mic(x: Double): Double = math.rint(-math.log(x) * 1e6) / 1e6
    // HALF_UP like Spark's round(): avg_nll = sum/2 lands on an exact
    // .5-of-a-micro here, where rint's half-even would disagree
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = 0.4
    val s1z = (0.0 + 1) / (6 + 4)
    val d7 = mic(3.0 / 10) + mic(1.0) + mic(0.5) + mic(a * (a * s1z))
    val d17 = mic(s1z) + mic(a * s1z)
    assert(got.keySet == Set(7L, 17L), s"train docs must not score: $got")
    assert(got(7L) == ((4L, r6(d7), r6(d7 / 4))), s"got ${got(7L)}")
    assert(got(17L) == ((2L, r6(d17), r6(d17 / 2))), s"got ${got(17L)}")
  }

  test("trigram backoff charges unseen continuations more than seen ones") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (7L, "a b c"), (17L, "a b z")).toDF("doc_id", "text")
    val got = Pipelines.trigramBackoffSurprisal(docs, "text", "doc_id")
      .select(col("doc_id"), col("avg_nll")).as[(Long, Double)]
      .collect().toMap
    assert(got(17L) > got(7L), s"got $got")
  }

  // ---- q160 ksDrift ---------------------------------------------------

  test("ks drift: identical halves give D = 0") {
    val rows = for (d <- Seq(5, 20); i <- 1 to 10)
      yield (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
        "x", i * 0.5)
    val ev = rows.toDF("ts", "event_type", "value")
    val got = Relational.ksDrift(ev, splitDay = 15)
      .select(col("d_num"), col("ks_d")).as[(Long, Double)].head()
    assert(got == ((0L, 0.0)))
  }

  test("ks drift: hand-computed supremum on a 3-point support") {
    // A (day<=15) = {1.0, 2.0}, B = {1.5}; nA=2 nB=1
    // at 1.0: |1*1 - 0*2| = 1 ; at 1.5: |1*1 - 1*2| = 1 ; at 2.0: 0
    // D = 1/2
    val ev = Seq(
      (java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), "x", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-06 00:00:00"), "x", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-25 00:00:00"), "x", 1.5))
      .toDF("ts", "event_type", "value")
    val got = Relational.ksDrift(ev, splitDay = 15)
      .as[(String, Long, Long, Long, Double)].head()
    assert(got == (("x", 2L, 1L, 1L, 0.5)), s"got $got")
  }

  test("ks drift sees a variance blow-up the mean-based monitors miss") {
    // equal means, B twice the spread: KS must fire, mean-diff is 0
    val a = (1 to 50).map(i => 10.0 + (i % 5) - 2)       // tight around 10
    val b = (1 to 50).map(i => 10.0 + 3 * ((i % 5) - 2)) // wide around 10
    val rows =
      a.map(v => (java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), "x", v)) ++
      b.map(v => (java.sql.Timestamp.valueOf("2024-01-25 00:00:00"), "x", v))
    val got = Relational.ksDrift(rows.toDF("ts", "event_type", "value"))
      .select(col("ks_d")).as[Double].head()
    assert(got > 0.3, s"got $got")
  }

  // ---- q161 coActivityPairs ------------------------------------------

  test("coactivity sweep count == plain theta-join reference (sf0.001)") {
    val spans = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(unix_micros(min(col("ts"))).as("s"),
        unix_micros(max(col("ts"))).as("e"))
    val a = spans.select(col("day"), col("user_id").as("u_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = spans.select(col("day"), col("user_id").as("u_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    val ref = a.join(b, Seq("day"))
      .filter(col("u_a") < col("u_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("overlap_pairs"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("epoch_day"), col("overlap_pairs"))
    val got = EventJoins.coActivityPairs(events)
      .select(col("epoch_day"), col("overlap_pairs"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("binned enumeration: complete (bin-width invariant) and == sweep count") {
    val w120 = EventJoins.intervalOverlapPairsBinned(events, binMinutes = 120)
    val w30 = EventJoins.intervalOverlapPairsBinned(events, binMinutes = 30)
    assert(w120.exceptAll(w30).isEmpty && w30.exceptAll(w120).isEmpty)
    val enumCounts = w120.groupBy(col("day"))
      .agg(count(lit(1)).as("overlap_pairs"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("epoch_day"), col("overlap_pairs"))
    val sweep = EventJoins.coActivityPairs(events)
      .filter(col("overlap_pairs") > 0)
      .select(col("epoch_day"), col("overlap_pairs"))
    assert(enumCounts.exceptAll(sweep).isEmpty &&
      sweep.exceptAll(enumCounts).isEmpty)
  }

  test("coactivity: disjoint same-day spans do not pair; touching spans do") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-05 08:00:00")), (1L, ts("2024-01-05 09:00:00")),
      (2L, ts("2024-01-05 20:00:00")), (2L, ts("2024-01-05 21:00:00")),
      (3L, ts("2024-01-05 08:30:00")), (3L, ts("2024-01-05 20:30:00")))
      .toDF("user_id", "ts")
    // 3 spans the whole day and overlaps both; 1 vs 2 are disjoint
    val got = EventJoins.coActivityPairs(ev)
      .select(col("n_users"), col("overlap_pairs")).as[(Long, Long)].head()
    assert(got == ((3L, 2L)), s"got $got")
    // touching at one micro: end(1) == start(2) -> closed intervals pair
    val touch = Seq(
      (1L, ts("2024-01-05 08:00:00")), (1L, ts("2024-01-05 09:00:00")),
      (2L, ts("2024-01-05 09:00:00")), (2L, ts("2024-01-05 10:00:00")))
      .toDF("user_id", "ts")
    val t = EventJoins.coActivityPairs(touch)
      .select(col("overlap_pairs")).as[Long].head()
    assert(t === 1L)
  }
}
