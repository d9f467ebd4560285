package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sf).cache()

  test("pricing summary: group counts sum to table size; exact decimal sums") {
    val ps = Relational.pricingSummary(li).cache()
    assert(ps.agg(sum($"count_order")).as[Long].head() == li.count())
    // sum_qty must equal an independent exact integer sum (quantities are integral)
    val exact = li.agg(sum($"l_quantity".cast("long"))).as[Long].head()
    val viaDec = ps.agg(sum($"sum_qty")).as[Double].head()
    assert(viaDec == exact.toDouble)
    ps.unpersist()
  }

  test("rollup: grand-total row equals table count; hierarchy consistent") {
    val r = Relational.returnsRollup(li).cache()
    val total = r.filter($"l_returnflag".isNull && $"l_linestatus".isNull)
      .select($"n_rows").as[Long].head()
    assert(total == li.count())
    val perFlag = r.filter($"l_returnflag".isNotNull && $"l_linestatus".isNull)
      .agg(sum($"n_rows")).as[Long].head()
    assert(perFlag == total)
    r.unpersist()
  }

  test("supplier monthly windows: running total ends at supplier total; lag consistent") {
    val m = Relational.supplierMonthly(li).cache()
    val last = m.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"l_suppkey").orderBy($"month".desc)))
      .filter($"rn" === 1)
      .select($"l_suppkey", $"running_revenue")
    val totals = m.groupBy($"l_suppkey")
      .agg(round(sum($"revenue"), 4).as("t"))
    val joined = last.join(totals, "l_suppkey")
      .filter(abs($"running_revenue" - $"t") > 1e-3)
    assert(joined.count() == 0)
    m.unpersist()
  }

  test("set ops: view_only and both partition distinct viewers") {
    val ev = Tables.events(spark, sf)
    val sets = Relational.viewClickSets(ev).cache()
    val viewers = ev.filter($"event_type" === "view").select($"user_id").distinct().count()
    assert(sets.count() == viewers)
    assert(sets.select($"user_id").distinct().count() == viewers)
    sets.unpersist()
  }

  test("approx distinct users within 5% of exact per event type") {
    val ev = Tables.events(spark, sf)
    val approx = Relational.approxDistinctUsers(ev)
      .select($"event_type", $"approx_users").as[(String, Long)].collect().toMap
    val exact = Relational.distinctUsers(ev)
      .select($"event_type", $"n_users").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, e) =>
      val a = approx(t)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$t: approx=$a exact=$e")
    }
  }

  test("anti-join + top-n: no customer in anti-result has a large order; top-n ordered") {
    val c = Tables.customer(spark, sf); val o = Tables.orders(spark, sf)
    val anti = Relational.customersWithoutOrders(c, o, minPrice = 300000.0)
    val offenders = anti.join(o.filter($"o_totalprice" > 300000.0),
      anti("c_custkey") === o("o_custkey"), "inner")
    assert(offenders.count() == 0)
    val top = Relational.topOrders(o, 20).collect()
    assert(top.length == 20)
    val prices = top.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("count-min sketch: estimates never undercount, overcount within eps*N") {
    val ev = Tables.events(spark, sf)
    val eps = 0.001
    val sketches = Relational.userActivitySketch(ev, eps, 0.99)
      .select($"event_type", $"cms", $"n_events")
      .collect()
      .map(r => (r.getString(0),
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))),
        r.getLong(2)))
    assert(sketches.nonEmpty)
    val truth = ev.groupBy($"event_type", $"user_id").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    sketches.foreach { case (typ, cms, n) =>
      truth(typ).take(200).foreach { case (user, exact) =>
        val est = cms.estimateCount(user)
        assert(est >= exact, s"$typ/$user: CMS undercounted $est < $exact")
        assert(est <= exact + math.ceil(eps * n).toLong + 1,
          s"$typ/$user: overcount $est vs $exact (n=$n)")
      }
    }
  }

  test("approx percentiles track exact percentiles per event type") {
    val ev = Tables.events(spark, sf)
    val exact = Relational.valuePercentiles(ev)
      .select($"event_type", $"p50", $"p95").as[(String, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Relational.approxValuePercentiles(ev)
      .select($"event_type", $"p50", $"p95").as[(String, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, (e50, e95)) =>
      val (a50, a95) = approx(t)
      // sketch picks an actual sample near the target rank; compare loosely
      assert(math.abs(a50 - e50) / math.max(e50, 1.0) < 0.05, s"$t p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / math.max(e95, 1.0) < 0.05, s"$t p95: $a95 vs $e95")
    }
  }

  test("sessionize: gap semantics (merge under gap, split at gap, inclusive counts)") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // u1: three events inside one session (gaps 10min, 29min)
      (1L, t("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, t("2024-01-01 10:10:00"), 1L, "view", 0.0, "{}"),
      (3L, t("2024-01-01 10:39:00"), 1L, "click", 0.0, "{}"),
      // u1: exactly AT the 30min gap -> still MERGES (inclusive bound)
      (4L, t("2024-01-01 11:09:00"), 1L, "view", 0.0, "{}"),
      // u1: 30min + 1s after -> NEW session
      (5L, t("2024-01-01 11:39:01"), 1L, "view", 0.0, "{}"),
      // u2: single event
      (6L, t("2024-01-01 09:00:00"), 2L, "view", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Relational.sessionize(ev, "30 minutes")
      .select($"user_id", $"session_start".cast("string"), $"n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01 10:00:00", 4L),
      (1L, "2024-01-01 11:39:01", 1L),
      (2L, "2024-01-01 09:00:00", 1L)))
  }

  test("sessionize on real data: per-user event counts are conserved") {
    val ev = Tables.events(spark, sf)
    val perUserSessions = Relational.sessionize(ev, "30 minutes")
      .groupBy($"user_id").agg(sum($"n_events").as("n"))
      .as[(Long, Long)].collect().toMap
    val perUserEvents = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(perUserSessions == perUserEvents)
  }

  test("banded range join equals naive on random (overlapping, bucket-edge) ranges") {
    val rnd = new scala.util.Random(7)
    val facts = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200))
      .toDF("id", "v")
    // overlapping ranges, some aligned exactly on bucket boundaries (w=50),
    // some negative, some empty (lo == hi)
    val ranges = (0 until 25).map { i =>
      val lo = math.floor(rnd.nextDouble() * 900 - 250)
      val width = if (i % 5 == 0) 0.0 else rnd.nextDouble() * 300
      (s"r$i", lo, lo + width)
    }.toDF("rid", "lo", "hi")
    val banded = Relational.bandedRangeJoin(facts, "v", ranges, "lo", "hi", 50.0)
      .select($"id", $"rid").as[(Long, String)].collect().toSet
    val naive = facts.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
      .select($"id", $"rid").as[(Long, String)].collect().toSet
    assert(banded == naive)
    assert(naive.nonEmpty, "degenerate fixture: no range matched anything")
  }

  test("banded range join equals the naive range join exactly") {
    val o = Tables.orders(spark, sf)
    val bands = Relational.priceBands.toDF("band", "lo", "hi")
    val banded = Relational.bandedRangeJoin(o, "o_totalprice", bands, "lo", "hi", 50000.0)
      .select($"o_orderkey", $"band").as[(Long, String)].collect().toSet
    val naive = o.join(bands,
        o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
      .select($"o_orderkey", $"band").as[(Long, String)].collect().toSet
    assert(banded == naive && banded.nonEmpty)
    // every order lands in at most one band here (bands are disjoint)
    assert(banded.size == banded.map(_._1).size)
  }

  test("bloom semi-join equals the exact semi-join; bloom prunes non-matches") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val exact = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().toSet
    val bloomed = RuntimeFilters.bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().toSet
    assert(bloomed == exact && exact.nonEmpty)
    // the bloom pre-filter alone must pass every true match and prune a
    // meaningful share of the non-matches (fpp=1% on ~20% selectivity)
    val bloom = urgent.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val mc = org.apache.spark.sql.functions.udf((k: Long) => bc.value.mightContainLong(k))
    val passed = li.filter(mc(col("l_orderkey"))).count()
    val total = li.count()
    assert(passed >= exact.size)
    assert(passed < total / 2, s"bloom pruned too little: $passed of $total")
  }

  test("upsert: update-wins, untouched rows intact, inserts appended, keys unique") {
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    ).toDF("k", "s", "x")
    val changes = Seq(
      (2L, "B", 22.0), // update
      (9L, "z", 99.0), // insert
    ).toDF("k", "s", "x")
    val got = Relational.upsert(base, changes, "k")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 22.0), (3L, "c", 30.0), (9L, "z", 99.0)))
    // key uniqueness holds whenever both inputs are key-unique
    assert(got.map(_._1).distinct.size == got.size)
    // mismatched schemas are refused, not silently misaligned
    intercept[IllegalArgumentException](
      Relational.upsert(base, changes.select($"k", $"x", $"s"), "k"))
  }

  test("cube: all four grouping sets, totals consistent, rollup is a subset") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf)
    val cube = Relational.returnsCube(li).collect()
    assert(cube.map(_.getAs[Long]("gid")).toSet == Set(0L, 1L, 2L, 3L))
    // the grand-total row (gid=3) counts the whole table
    val total = cube.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length == 1 && total.head.getAs[Long]("n_rows") == li.count())
    // per-gid n_rows partitions the table
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(cube.filter(_.getAs[Long]("gid") == gid)
        .map(_.getAs[Long]("n_rows")).sum == li.count(), s"gid $gid")
    }
    // rollup's grouping sets are a subset of cube's
    val cubeKeys = cube.map(r =>
      (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))).toSet
    val rollupKeys = Relational.returnsRollup(li).collect().map(r =>
      (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))).toSet
    assert(rollupKeys.subsetOf(cubeKeys))
  }

  test("two-stage distinct days equals count_distinct; funnel stages monotone") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val twoStage = Relational.userActiveDays(ev)
      .as[(Long, Long)].collect().toMap
    val direct = ev.groupBy($"user_id")
      .agg(countDistinct(date_trunc("day", $"ts")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(twoStage == direct && twoStage.nonEmpty)

    val funnel = Relational.funnelStages(ev).as[(Int, Long)].collect().toMap
    val viewUsers = ev.filter($"event_type" === "view")
      .select($"user_id").distinct().count()
    assert(funnel.values.sum == viewUsers) // every view-user lands in exactly one stage
    // widening the windows can only move users DEEPER (weak monotonicity
    // of cumulative conversions)
    val wide = Relational.funnelStages(ev, "365 DAY", "365 DAY")
      .as[(Int, Long)].collect().toMap
    def atLeast(m: Map[Int, Long], s: Int) = m.filterKeys(_ >= s).values.sum
    Seq(2, 3).foreach { s =>
      assert(atLeast(wide, s) >= atLeast(funnel, s), s"stage $s")
    }
  }

  test("moving average: RANGE frame spans days (not rows) across calendar gaps") {
    val out = Relational.dailyRevenueMovingAvg(Tables.orders(spark, sf), days = 7)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    val daily = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (day, _, sumW, avgW) =>
      val inFrame = daily.filter { case (d, _) => d >= day - 6 && d <= day }
      assert(math.abs(sumW - inFrame.values.sum) < 1e-6, s"day $day")
      assert(math.abs(avgW - sumW / inFrame.size) < 1e-6, s"day $day")
    }
    // the first day's frame is itself alone
    val first = out.head
    assert(math.abs(first._3 - first._2) < 1e-9)
  }

  test("price histogram: clamped buckets, counts conserved, edges exact") {
    val o = Tables.orders(spark, sf)
    val hist = Relational.priceHistogram(o)
      .as[(Int, Double, Long)].collect().sortBy(_._1)
    assert(hist.map(_._3).sum == o.count())
    assert(hist.forall { case (b, lo, _) => b >= 0 && b <= 19 && lo == b * 25000.0 })
    // spot-check one bucket against a direct filter
    val b2 = o.filter($"o_totalprice" >= 50000.0 && $"o_totalprice" < 75000.0).count()
    val inHist = hist.find(_._1 == 2).map(_._3).getOrElse(0L)
    assert(inHist == b2)
  }

  test("pivot: row sums conserve event totals; absent types stay as zero columns") {
    import org.apache.spark.sql.functions.{col, lit}
    val ev = Tables.events(spark, sf)
    val wide = Relational.eventTypePivot(ev).collect()
    val totalPivot = wide.map(r =>
      Relational.eventTypes.map(t => r.getAs[Long](t)).sum).sum
    assert(totalPivot == ev.count())
    // explicit value list fixes the schema even for a filtered input with
    // only one type present — the rest are zero, not missing columns
    val onlyViews = Relational.eventTypePivot(ev.filter(col("event_type") === "view"))
    assert(onlyViews.columns.toSeq == "day" +: Relational.eventTypes)
    assert(onlyViews.collect().forall(r => r.getAs[Long]("click") == 0L))
  }

  test("price distribution: quartiles balanced, pct_rank/cume_dist at the bounds") {
    val out = Relational.orderPriceDistribution(Tables.orders(spark, sf))
      .as[(Long, String, Double, Int, Double, Double)].collect()
    val byPriority = out.groupBy(_._2)
    byPriority.foreach { case (prio, rows) =>
      val quartiles = rows.groupBy(_._4).view.mapValues(_.length).toMap
      assert(quartiles.keySet == Set(1, 2, 3, 4), s"$prio: $quartiles")
      // ntile balance: sizes differ by at most 1
      assert(quartiles.values.max - quartiles.values.min <= 1, s"$prio: $quartiles")
      val sorted = rows.sortBy(r => (r._3, r._1))
      assert(sorted.head._5 == 0.0) // percent_rank of the first row
      assert(math.abs(sorted.last._6 - 1.0) < 1e-12) // cume_dist of the last
      // cume_dist is monotone in the window order
      assert(sorted.map(_._6).sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("cohortRetention: cohorts anchor at each user's first day") {
    val ts = (d: Int, h: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    // u1 first active day 1, returns day 2 and day 4 (twice in one day —
    // must count once); u2 first active day 2 only
    val events = Seq(
      (1L, ts(1, 9), 10L), (1L, ts(2, 9), 11L),
      (1L, ts(4, 9), 12L), (1L, ts(4, 17), 13L),
      (2L, ts(2, 12), 14L)
    ).toDF("user_id", "ts", "event_id")
    val day1 = 19723L // 2024-01-01 as epoch day
    val got = Relational.cohortRetention(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (day1, 0L, 1L), (day1, 1L, 1L), (day1, 3L, 1L),
      (day1 + 1L, 0L, 1L)))
  }

  test("eventTransitions: lag pairs per user, equal-ts resolved by event_id") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, t0, 1L, "view"), (1L, t0, 2L, "click"), // same ts: order by event_id
      (1L, new java.sql.Timestamp(t0.getTime + 1000), 3L, "buy"),
      (2L, t0, 4L, "view") // single event: no transition
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Relational.eventTransitions(events)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("view", "click", 1L), ("click", "buy", 1L)))
  }

  test("latestSnapshot: max_by compaction, equal-ts ties resolved by event_id") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = new java.sql.Timestamp(t0.getTime + 60000)
    val events = Seq(
      (1L, t0, 10L, "view", 1.0), (1L, t1, 11L, "click", 2.0), // later ts wins
      (2L, t0, 20L, "view", 3.0), (2L, t0, 21L, "buy", 4.0), // tie: higher id
      (3L, t1, 30L, "error", 5.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Relational.latestSnapshot(events)
      .select($"user_id", $"last_type", $"last_value")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "click", 2.0), (2L, "buy", 4.0), (3L, "error", 5.0)))
    // one row per key, keys conserved — on real data too
    val ev = Tables.events(spark, sf)
    val snap = Relational.latestSnapshot(ev)
    assert(snap.count() == ev.select($"user_id").distinct().count())
  }

  test("activityRollup: union of daily sketches equals the direct estimate") {
    val ev = Tables.events(spark, sf)
    val rolled = Relational.activityRollup(ev)
      .select($"event_type", $"approx_users")
      .as[(String, Long)].collect().toMap
    // sketch mergeability is EXACT: union-of-daily-partials must produce
    // the identical estimate as one sketch over all events
    val direct = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("approx_users"))
      .as[(String, Long)].collect().toMap
    assert(rolled == direct)
    // and the estimate tracks the exact distinct count
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    rolled.foreach { case (t, est) =>
      assert(math.abs(est - exact(t)).toDouble / exact(t) <= 0.05,
        s"$t: approx $est vs exact ${exact(t)}")
    }
  }

  test("localSupplierVolume: equals the filter-late formulation; local-only") {
    val (l, o, c) = (li, Tables.orders(spark, sf), Tables.customer(spark, sf))
    val (s, n, r) = (Tables.supplier(spark, sf), Tables.nation(spark, sf),
      Tables.region(spark, sf))
    val got = Relational.localSupplierVolume(l, o, c, s, n, r)
      .as[(String, Double, Long)].collect()
      .map { case (k, v, cnt) => k -> ((v, cnt)) }.toMap
    // independent formulation: join everything unfiltered, filter at the end
    val lateFiltered = l
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(s, $"l_suppkey" === $"s_suppkey")
      .join(n, $"s_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA" && $"c_nationkey" === $"s_nationkey" &&
        $"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
      .groupBy($"n_name")
      .agg(sum($"l_extendedprice".cast("decimal(18,6)") *
        (lit(1.0) - $"l_discount").cast("decimal(18,6)")).cast("double"),
        count(lit(1)))
      .as[(String, Double, Long)].collect()
      .map { case (k, v, cnt) => k -> ((v, cnt)) }.toMap
    assert(got == lateFiltered && got.nonEmpty)
  }

  test("calendar profile: ISO weekday domain, conservation, month-end subset") {
    val o = Tables.orders(spark, sf)
    val prof = Relational.orderCalendarProfile(o).cache()
    val rows = prof.collect()
    assert(rows.forall { r =>
      val d = r.getAs[Long]("dow_iso"); d >= 1 && d <= 7
    })
    assert(rows.forall { r => val q = r.getAs[Long]("qtr"); q >= 1 && q <= 4 })
    assert(prof.agg(sum($"n_orders")).as[Long].head() == o.count())
    // month-end orders can never exceed the cell's order count
    assert(rows.forall(r => r.getAs[Long]("n_month_end") <= r.getAs[Long]("n_orders")))
    // spot-check the weekday convention on a known date: 2024-01-01 was a
    // Monday -> dow_iso 1
    val monday = Seq(("2024-01-01", 1.0)).toDF("o_orderdate", "o_totalprice")
      .select(to_timestamp($"o_orderdate").as("o_orderdate"), $"o_totalprice")
    assert(Relational.orderCalendarProfile(monday)
      .select($"dow_iso").as[Long].head() == 1L)
    prof.unpersist()
  }

  test("grouping sets: exactly the three requested grains, each conserving totals") {
    val gs = Relational.returnsGroupingSets(li).cache()
    val total = li.count()
    // grand total row: gid 3 (both columns aggregated away)
    val grand = gs.filter($"gid" === 3)
    assert(grand.count() == 1 && grand.select($"n_rows").as[Long].head() == total)
    // per-returnflag grain (linestatus aggregated -> bit set): sums to total
    assert(gs.filter($"gid" === 1).agg(sum($"n_rows")).as[Long].head() == total)
    assert(gs.filter($"gid" === 2).agg(sum($"n_rows")).as[Long].head() == total)
    // no (flag, status) fine-grain rows: that grain was not requested
    assert(gs.filter($"gid" === 0).count() == 0)
    gs.unpersist()
  }

  test("changeHistory: intervals tile each key's timeline; one current per key") {
    val ev = Tables.events(spark, sf)
    val hist = Relational.changeHistory(ev).cache()
    // exactly one open (current) interval per user
    val currents = hist.filter($"is_current" === 1)
      .groupBy($"user_id").count().as[(Long, Long)].collect()
    assert(currents.nonEmpty && currents.forall(_._2 == 1L))
    // intervals never overlap and tile: valid_to of version i equals
    // valid_from of version i+1 (lead is the next row's ts by definition,
    // so assert non-degenerate ordering instead: valid_from <= valid_to)
    assert(hist.filter($"valid_to" < $"valid_from").count() == 0)
    // row count conserved: every change is exactly one version row
    assert(hist.count() == ev.count())
    // point-in-time join sanity: state at each user's own last event ts
    // equals q79's latest snapshot
    val atEnd = hist.filter($"is_current" === 1)
      .select($"user_id", $"event_type".as("last_type"), $"value".as("last_value"))
    val snap = Relational.latestSnapshot(ev)
      .select($"user_id", $"last_type", $"last_value")
    assert(atEnd.exceptAll(snap).count() == 0 && snap.exceptAll(atEnd).count() == 0)
    hist.unpersist()
  }

  test("valueStatsProfile: closed-form check on a constructed group") {
    val t = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // value = 2*hour + 1 over hours 1..4: corr exactly 1, cov = 2*var(hour)
    val events = Seq(
      (t(1), "a", 3.0), (t(2), "a", 5.0), (t(3), "a", 7.0), (t(4), "a", 9.0),
      (t(5), "b", 4.0), (t(6), "b", 4.0) // constant: sd 0, corr NaN -> null
    ).toDF("ts", "event_type", "value")
    val got = Relational.valueStatsProfile(events)
      .as[(String, Long, Double, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val (_, na, meanA, sdA, covA, corrA) = got("a")
    assert(na == 4L && meanA == 6.0)
    // var_samp(hour 1..4) = 5/3; cov = 2*5/3 = 3.333333; sd = sqrt(4*5/3)
    assert(covA == 3.333333 && corrA.contains(1.0))
    assert(math.abs(sdA - math.sqrt(20.0 / 3.0)) < 1e-6)
    val (_, nb, _, sdB, covB, corrB) = got("b")
    assert(nb == 2L && sdB == 0.0 && covB == 0.0 && corrB.isEmpty)
  }

  test("approxKeyOverlap: inclusion-exclusion tracks the exact intersection") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val got = RuntimeFilters
      .approxKeyOverlap(orders, customer, "o_custkey", "c_custkey")
      .as[(Long, Long, Long, Long)].head()
    val (nA, nB, nU, nOv) = got
    val exactA = orders.select($"o_custkey").distinct().count()
    val exactB = customer.select($"c_custkey").distinct().count()
    val exactOv = orders.select($"o_custkey")
      .join(customer, $"o_custkey" === $"c_custkey", "left_semi")
      .distinct().count()
    def within(est: Long, exact: Long, tol: Double) =
      math.abs(est - exact) <= math.max(tol * exact, 2.0)
    assert(within(nA, exactA, 0.05) && within(nB, exactB, 0.05))
    assert(within(nOv, exactOv, 0.10), s"overlap $nOv vs exact $exactOv")
    assert(nU <= nA + nB && nOv >= 0)
  }

  test("cohortRetention on testdata: offset-0 counts are the cohort sizes") {
    val ev = Tables.events(spark, sf)
    val got = Relational.cohortRetention(ev).cache()
    // every user appears exactly once at offset 0 (their first day)
    val zeroSum = got.filter($"day_offset" === 0).agg(sum($"n_users")).as[Long].head()
    val nUsers = ev.select($"user_id").distinct().count()
    assert(zeroSum == nUsers)
    // no offset row can exceed its cohort's size
    val sizes = got.filter($"day_offset" === 0)
      .select($"cohort_day", $"n_users".as("size0"))
    assert(got.join(sizes, "cohort_day").filter($"n_users" > $"size0").count() == 0)
  }

  test("eventStatsUnpivot: 3 long rows per type, values equal the wide aggregates") {
    val ev = Tables.events(spark, sf)
    val long = Relational.eventStatsUnpivot(ev)
      .as[(String, String, Double)].collect()
    val types = ev.select($"event_type").distinct().as[String].collect().toSet
    assert(long.length == types.size * 3)
    assert(long.map(_._2).toSet == Set("n_events", "avg_value", "max_value"))
    // fold back: every (type, metric) value equals the wide aggregate
    val wide = ev.groupBy($"event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        round(avg($"value"), 6).as("a"), round(max($"value"), 6).as("m"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    long.foreach { case (t, metric, v) =>
      val (_, n, a, m) = wide(t)
      val expected = metric match {
        case "n_events" => n; case "avg_value" => a; case "max_value" => m
      }
      assert(v == expected, s"($t, $metric): $v != $expected")
    }
  }

  test("dailyGapFill: spine tiles the calendar, gaps forward-fill from the last observed day") {
    def t(day: Int, hms: String) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hms")
    // observed days 1,2,5 with a 2-day hole; day 5 present so the spine
    // must cover 1..5 and days 3-4 must carry day 2's value forward
    val ev = Seq(
      ("click", t(1, "09:00:00"), 10.0), ("click", t(1, "10:00:00"), 5.0),
      ("click", t(2, "09:00:00"), 7.0),
      ("click", t(5, "23:00:00"), 1.0))
      .toDF("event_type", "ts", "value")
    val got = Relational.dailyGapFill(ev, gapEvery = 0)
      .as[(String, Long, Long, Option[Double], Double, Int)].collect()
      .sortBy(_._2)
    val d0 = java.time.LocalDate.parse("2024-03-01").toEpochDay
    assert(got.map(_._2).toSeq == (d0 to d0 + 4).toSeq, "spine must tile 1..5")
    assert(got.map(r => (r._3, r._4, r._5, r._6)).toSeq == Seq(
      (2L, Some(15.0), 15.0, 0),
      (1L, Some(7.0), 7.0, 0),
      (0L, None, 7.0, 1), // gap: forward-filled from day 2
      (0L, None, 7.0, 1),
      (1L, Some(1.0), 1.0, 0)))
  }

  test("groupPriceQuartiles: percentile_cont interpolation at even/odd group sizes") {
    val df = Seq(
      ("A", 10.0), ("A", 20.0), ("A", 30.0), ("A", 40.0),
      ("B", 1.0), ("B", 2.0), ("B", 3.0), ("B", 4.0), ("B", 100.0))
      .toDF("o_orderpriority", "o_totalprice")
    val got = Relational.groupPriceQuartiles(df)
      .as[(String, Double, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // even group (n=4): rank p*(n-1) falls BETWEEN order statistics —
    // p25 at 0.75 → 10 + 0.75*(20-10), median at 1.5 → midpoint
    assert(got("A") == (("A", 17.5, 25.0, 32.5, 4L, 15.0)))
    // odd group (n=5): ranks land exactly ON data points — no
    // interpolation, and the 100 outlier must not leak into p75
    assert(got("B") == (("B", 2.0, 3.0, 4.0, 5L, 2.0)))
  }

  test("slidingEventCounts: each event in exactly duration/slide windows, epoch-aligned") {
    val ev = Tables.events(spark, sf)
    val got = Relational.slidingEventCounts(ev).cache()
    // conservation: every event counted once per covering window (2)
    assert(got.agg(sum($"n")).as[Long].head() == ev.count() * 2)
    // alignment: starts are multiples of the 5-minute slide
    assert(got.filter($"w_start".cast("long") % 300 =!= 0).count() == 0)
    // overlap: an event at t appears in the windows starting at
    // floor(t/300)*300 and 300 earlier — check one concrete event
    val (t0, et0) = ev.select($"ts", $"event_type").as[(java.sql.Timestamp, String)].head()
    val slot = t0.getTime / 1000 / 300 * 300
    val starts = got.filter($"event_type" === et0)
      .select($"w_start".cast("long")).as[Long].collect().toSet
    assert(starts.contains(slot) && starts.contains(slot - 300))
    got.unpersist()
  }

  test("groupPriceDiscretePercentiles: order statistics, never interpolated values") {
    val df = Seq(
      ("O", 10.0), ("O", 20.0), ("O", 30.0), ("O", 40.0),
      ("F", 1.0), ("F", 2.0), ("F", 3.0))
      .toDF("o_orderstatus", "o_totalprice")
    val got = Relational.groupPriceDiscretePercentiles(df)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // even group: disc(0.5) is the LOWER middle observation (20), where
    // cont interpolates to the synthetic 25
    assert(got("O") == (("O", 10.0, 20.0, 30.0, 4L)))
    assert(got("F") == (("F", 1.0, 2.0, 3.0, 3L)))
  }

  test("smallQuantityRevenue: decorrelated join equals per-part correlated filter") {
    // part 1: avg qty 10 → cap 2.0; only the qty-1 line (price 100) survives.
    // part 2: avg 30 → cap 6.0, no line below. part 3: single line, cap is
    // its own qty*0.2 → never < itself.
    val li2 = Seq(
      (1L, 1.0, 100.0), (1L, 19.0, 5.0),
      (2L, 30.0, 7.0),
      (3L, 8.0, 9.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part2 = Seq((1L, "B1"), (2L, "B1"), (3L, "B2"))
      .toDF("p_partkey", "p_brand")
    val got = Relational.smallQuantityRevenue(li2, part2)
      .as[(String, Double, Long)].collect().toSet
    assert(got == Set(("B1", 14.29, 1L))) // round(100/7, 2)
  }

  test("largeQuantityOrders: only orders above threshold, qty equals direct sum") {
    val got = Relational.largeQuantityOrders(
      li, Tables.orders(spark, sf), Tables.customer(spark, sf)).cache()
    assert(got.filter($"total_qty" <= 250.0).count() == 0)
    // every returned order's qty matches an independent recount
    val recount = li.groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
    val mismatch = got.join(recount, $"o_orderkey" === $"l_orderkey")
      .filter($"total_qty" =!= $"q")
    assert(mismatch.count() == 0)
    // and no qualifying order is missing
    assert(got.count() == recount.filter($"q" > 250.0).count())
    got.unpersist()
  }

  test("modePerUser: ties break to lexicographically smallest type") {
    val ev = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"),      // clear winner
      (2L, "view"), (2L, "click"),                    // tie → "click"
      (3L, "purchase"))
      .map { case (u, t) => (u, t, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Relational.modePerUser(ev)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "view", 2L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("modePerUser: equals a local mode computation on randomized input") {
    val rnd = new scala.util.Random(4242)
    val types = Array("a", "b", "c", "d")
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(50).toLong, types(rnd.nextInt(types.length)),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.0)
    }
    val got = Relational.modePerUser(
      rows.toDF("user_id", "event_type", "ts", "value"))
      .as[(Long, String, Long)].collect().toSet
    val expect = rows.groupBy(_._1).map { case (u, rs) =>
      val counts = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.minBy { case (t, n) => (-n, t) }
      (u, best._1, best._2)
    }.toSet
    assert(got == expect)
  }

  test("chi-square contingency: marginals consistent, terms match hand computation") {
    val got = Relational.contingencyChiSquare(Tables.events(spark, sf)).cache()
    val n = Tables.events(spark, sf).count()
    // cell counts and expected counts both sum to the grand total
    assert(got.agg(sum($"n")).as[Long].head() == n)
    val expSum = got.agg(sum($"expected")).as[Double].head()
    assert(math.abs(expSum - n) < 1e-3)
    // independent recomputation of one cell's term
    val r = got.orderBy($"event_type", $"hr").head()
    val (et, hr, cn) = (r.getString(0), r.getInt(1), r.getLong(2))
    val ev = Tables.events(spark, sf)
    val rowN = ev.filter($"event_type" === et).count().toDouble
    val colN = ev.filter(hour($"ts") === hr).count().toDouble
    val e = rowN * colN / n
    assert(math.abs(r.getDouble(3) - e) < 1e-4)
    assert(math.abs(r.getDouble(4) - math.pow(cn - e, 2) / e) < 1e-4)
    got.unpersist()
  }

  test("hourProfileCsv: sorted, deduped, stable under repartitioning") {
    val ev = Seq(
      (1L, "a", "2024-01-01 05:30:00"), (2L, "a", "2024-01-01 23:10:00"),
      (3L, "a", "2024-01-02 05:45:00"), // hour 5 again → deduped
      (4L, "b", "2024-01-01 00:00:00"))
      .map { case (id, t, ts) => (id, t, java.sql.Timestamp.valueOf(ts), 0.0) }
      .toDF("event_id", "event_type", "ts", "value")
    val got = Relational.hourProfileCsv(ev)
      .as[(String, Long, String)].collect().toSet
    assert(got == Set(("a", 2L, "5,23"), ("b", 1L, "0")))
    // partition-independence: 1-partition and 13-partition runs agree
    val a = Relational.hourProfileCsv(Tables.events(spark, sf).repartition(1))
      .as[(String, Long, String)].collect().toSet
    val b = Relational.hourProfileCsv(Tables.events(spark, sf).repartition(13))
      .as[(String, Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("stateAtTime: interval read equals direct latest-event-before-T per user") {
    val ev = Tables.events(spark, sf)
    val T = "2024-01-15 00:00:00"
    val got = Relational.stateAtTime(ev, T)
      .as[(String, Long, Double)].collect()
      .map { case (t, n, sv) => t -> ((n, sv)) }.toMap
    // direct formulation: latest event at or before T per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val direct = ev.filter($"ts" <= lit(T))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(round($"value" * 1e6).cast("long")).cast("double") / 1e6, 6).as("s"))
      .as[(String, Long, Double)].collect()
      .map { case (t, n, sv) => t -> ((n, sv)) }.toMap
    assert(got == direct && got.nonEmpty)
    // conservation: one state row per user active before T
    val users = ev.filter($"ts" <= lit(T)).select($"user_id").distinct().count()
    assert(got.values.map(_._1).sum == users)
  }

  test("customerOrderDistribution: zero-order customers kept; totals conserve") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("c_custkey", "c_name")
    val ords = Seq(
      (10L, 1L, "O"), (11L, 1L, "F"),   // cust 1: 2 counted
      (12L, 2L, "P"))                   // cust 2: only a P order → counts 0
    .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val got = Relational.customerOrderDistribution(cust, ords)
      .as[(Long, Long)].collect().toMap
    // cust 1 → bucket 2; cust 2 and 3 → bucket 0 (left join keeps both)
    assert(got == Map(2L -> 1L, 0L -> 2L))
    // real data: customer count conserves across buckets, order count too
    val c = Tables.customer(spark, sf); val o = Tables.orders(spark, sf)
    val real = Relational.customerOrderDistribution(c, o)
      .as[(Long, Long)].collect()
    assert(real.map(_._2).sum == c.count())
    val nonP = o.filter($"o_orderstatus" =!= "P")
      .join(c, $"o_custkey" === $"c_custkey", "left_semi").count()
    assert(real.map { case (k, n) => k * n }.sum == nonP)
  }

  test("idleRichCustomers: integer-exact threshold boundary; anti-join on high-value orders") {
    val cust = Seq(
      (1L, 10.0, 100L), (2L, 20.0, 100L), (3L, 30.0, 100L),
      (4L, 25.0, 200L), (5L, -5.0, 200L),
      (6L, 21.25, 200L)) // EXACTLY the positive average — must be excluded
      .toDF("c_custkey", "c_acctbal", "c_nationkey")
    val ords = Seq(
      (10L, 3L, 400000.0),  // cust 3 has a high-value order → anti-joined out
      (11L, 4L, 100.0))     // below threshold → cust 4 stays idle
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val nat = Seq((100L, "N_A"), (200L, "N_B")).toDF("n_nationkey", "n_name")
    // positive balances {10, 20, 30, 25, 21.25}: avg = 21.25; above it: 3, 4
    val got = Relational.idleRichCustomers(cust, ords, nat)
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("N_B", 1L, 25.0)))
  }

  test("dailyTrend: exact OLS recovery on a constructed linear series") {
    // one event per day, value = 2*d + 5 over days d = 0..4 → the daily
    // sums ARE the series, so slope 2, intercept 5, r2 exactly 1
    val ev = (0 to 4).map { d =>
      (d.toLong, "lin", java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        2.0 * d + 5.0)
    }.toDF("event_id", "event_type", "ts", "value")
    val got = Relational.dailyTrend(ev)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.toSeq == Seq(("lin", 5L, 2.0, 5.0, 1.0)))
    // single-day groups are filtered, not divide-by-zero errors
    val oneDay = Seq((1L, "x", java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1.0))
      .toDF("event_id", "event_type", "ts", "value")
    assert(Relational.dailyTrend(oneDay).count() == 0)
  }

  test("robustPriceStats: median/MAD by hand on crafted groups; outlier-resistant") {
    val df = Seq(
      // odd group: median 3, deviations {2,1,0,1,9997} → mad 1 (outlier ignored)
      ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0), ("A", 10000.0),
      // even group: median interpolates to 15, deviations {5,5} → mad 5
      ("B", 10.0), ("B", 20.0))
      .toDF("o_orderpriority", "o_totalprice")
    val got = Relational.robustPriceStats(df)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 5L, 3.0, 1.0)))
    assert(got("B") == (("B", 2L, 15.0, 5.0)))
    // mean/stddev would have exploded under the 10000 outlier; MAD must not
    assert(got("A")._4 < 2.0)
  }

  test("loneLateSupplier: equals the exists/not-exists self-join formulation") {
    val orders = Tables.orders(spark, sf)
    val supplier = Tables.supplier(spark, sf)
    val got = Relational.loneLateSupplier(li, orders, supplier)
      .as[(String, Long)].collect().toSeq
    // reference formulation: late lines self-joined against their order's
    // other lines (the shape the operator's single aggregation replaces)
    val l = li.join(orders.filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"),
        ($"l_shipdate" > ($"o_orderdate" + expr("INTERVAL 60 DAYS"))).as("late"))
      .cache()
    val lateLines = l.filter($"late").select($"ok", $"sk").distinct()
    val others = l.select($"ok".as("ok2"), $"sk".as("sk2"), $"late".as("late2"))
    val ref = lateLines
      .join(others, $"ok" === $"ok2" && $"sk" =!= $"sk2")
      .groupBy($"ok", $"sk")
      .agg(max(when($"late2", 1).otherwise(0)).as("other_late"))
      .filter($"other_late" === 0)
      .groupBy($"sk").agg(count(lit(1)).as("numwait"))
      .join(supplier, $"sk" === $"s_suppkey")
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name").limit(20)
      .as[(String, Long)].collect().toSeq
    l.unpersist()
    assert(got == ref)
  }

  test("cheapestRegionalSupplier: per-part min, ties kept, filters applied") {
    val region = Seq((0L, "EUROPE"), (1L, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((10L, "FRANCE", 0L), (11L, "CHINA", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, "s_eu_a", 10L), (2L, "s_eu_b", 10L), (3L, "s_as", 11L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val part = Seq((100L, "p_large", "LARGE"), (101L, "p_small", "SMALL"))
      .toDF("p_partkey", "p_name", "p_type")
    // unit costs: part 100 — s1 sells at 2.0 and 3.0 (min 2.0), s2 at 2.0
    // (tie), s3 at 1.0 but is out-of-region; part 101 is the wrong type
    val li = Seq(
      (100L, 1L, 20.0, 10.0), (100L, 1L, 30.0, 10.0), (100L, 2L, 10.0, 5.0),
      (100L, 3L, 10.0, 10.0), (101L, 1L, 1.0, 1.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val got = Relational.cheapestRegionalSupplier(li, part, supplier,
      nation, region)
      .as[(Long, String, String, String, Long)].collect().toSet
    // unit cost in exact micro-units: 2.0 -> 2_000_000
    assert(got == Set(
      (100L, "p_large", "s_eu_a", "FRANCE", 2000000L),
      (100L, "p_large", "s_eu_b", "FRANCE", 2000000L)))
  }

  test("partValueConcentration: relative threshold keeps the heavy tail exactly") {
    // part values 10, 10, 40: mean 20; factor 1.2 -> threshold 24 -> only 40
    val li = Seq(
      (1L, 10.0, 0.0), (2L, 10.0, 0.0), (3L, 20.0, 0.0), (3L, 20.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val got = Relational.partValueConcentration(li)
      .as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((3L, 40.0, 40.0 / 60.0 match {
      case s => math.round(s * 1e6) / 1e6
    })))
    // boundary: pv*n == factor*tot must NOT pass (strict >)
    val boundary = Seq((1L, 10.0, 0.0), (2L, 15.0, 0.0), (3L, 11.0, 0.0))
    // mean = 12, 1.2*mean = 14.4; 15 > 14.4 keeps only part 2
    val got2 = Relational.partValueConcentration(boundary
        .toDF("l_partkey", "l_extendedprice", "l_discount"))
      .as[(Long, Double, Double)].collect().map(_._1).toSeq
    assert(got2 == Seq(2L))
  }
}
