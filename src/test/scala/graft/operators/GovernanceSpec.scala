package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q199 k-anonymity ladder: hand-planted equivalence classes, the
  * negative-balance floor band, and the one-Expand/one-pass plan shape.
  */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  private def customers(rows: Seq[(Long, String, Int, Double, String)]) =
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")

  test("planted classes: ladder levels, k_min and risky counts are exact") {
    // nation 1 / SEG_A: 6 rows all in band b100=1 (bal 100..199)
    //   -> level-0 class of 6 (safe at k=5)
    // nation 2 / SEG_A: 3 rows band 1 + 2 rows band 2
    //   -> two risky level-0 classes (3 and 2 rows); level-2 class of 5 safe
    val rows =
      (1L to 6L).map(i => (i, s"c$i", 1, 150.0, "SEG_A")) ++
        (7L to 9L).map(i => (i, s"c$i", 2, 150.0, "SEG_A")) ++
        (10L to 11L).map(i => (i, s"c$i", 2, 250.0, "SEG_A"))
    val got = Governance.kAnonymityLadder(customers(rows), k = 5)
      .orderBy("level")
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    // level 0: classes (1,A,1)=6, (2,A,1)=3, (2,A,2)=2 -> k_min 2,
    // risky 2 classes / 5 rows
    assert(got(0) == ((0L, 3L, 2L, 2L, 5L, 0)))
    // level 1: bands collapse (all bal < 1000 -> b1k=0):
    // (1,A,0)=6, (2,A,0)=5 -> anonymous at k=5
    assert(got(1) == ((1L, 2L, 5L, 0L, 0L, 1)))
    // level 2: same as level 1 without the band
    assert(got(2) == ((2L, 2L, 5L, 0L, 0L, 1)))
    // level 3: one class of 11
    assert(got(3) == ((3L, 1L, 11L, 0L, 0L, 1)))
  }

  test("negative balances band by floor, not truncation") {
    // bal -50: floor(-50/100) = -1, NOT 0 — truncation would merge the
    // negative band into band 0 and overstate the crowd
    val rows = Seq(
      (1L, "a", 1, -50.0, "S"), (2L, "b", 1, -50.0, "S"),
      (3L, "c", 1, 50.0, "S"), (4L, "d", 1, 50.0, "S"))
    val lvl0 = Governance.kAnonymityLadder(customers(rows), k = 2)
      .filter(col("level") === 0)
      .as[(Long, Long, Long, Long, Long, Int)].head()
    // two classes (bands -1 and 0) of 2 each
    assert(lvl0 == ((0L, 2L, 2L, 0L, 0L, 1)))
  }

  test("l-diversity: homogeneous class flagged, dominant tie-break is min") {
    // class (1, band 0): 3x SEG_A only -> l=1, share 1e6, not diverse
    // class (2, band 0): SEG_A x2, SEG_B x2, SEG_C x1 -> l=3, top tie
    //   between A and B resolves to SEG_A (min); share = 2e6 div 5
    val rows =
      (1L to 3L).map(i => (i, s"c$i", 1, 100.0, "SEG_A")) ++
        Seq((4L, "c4", 2, 100.0, "SEG_A"), (5L, "c5", 2, 100.0, "SEG_A"),
          (6L, "c6", 2, 100.0, "SEG_B"), (7L, "c7", 2, 100.0, "SEG_B"),
          (8L, "c8", 2, 100.0, "SEG_C"))
    val got = Governance.lDiversityAudit(customers(rows), l = 3)
      .orderBy("nat")
      .as[(Int, Long, Long, Long, String, Long, Int)].collect()
    assert(got(0) == ((1, 0L, 3L, 1L, "SEG_A", 1000000L, 0)))
    assert(got(1) == ((2, 0L, 5L, 3L, "SEG_A", 400000L, 1)))
  }

  test("t-closeness: skewed class flagged, population-matching class passes") {
    // global: 9 SEG_A + 9 SEG_B -> q = (500000, 500000) exactly.
    // nation 1: 6A only  -> p=(1e6, 0), tvd = 500000 -> FLAGGED at 0.3
    // nation 2: 6B only  -> same by symmetry
    // nation 3: 3A + 3B  -> p = q, tvd = 0 -> close
    val rows =
      (1L to 6L).map(i => (i, s"c$i", 1, 100.0, "SEG_A")) ++
        (7L to 12L).map(i => (i, s"c$i", 2, 100.0, "SEG_B")) ++
        Seq((13L, "x", 3, 100.0, "SEG_A"), (14L, "y", 3, 100.0, "SEG_A"),
          (15L, "z", 3, 100.0, "SEG_A"), (16L, "p", 3, 100.0, "SEG_B"),
          (17L, "q", 3, 100.0, "SEG_B"), (18L, "r", 3, 100.0, "SEG_B"))
    val got = Governance.tClosenessAudit(customers(rows), t = 0.3)
      .orderBy("nat")
      .as[(Int, Long, Long, Long, Int)].collect()
    assert(got(0) == ((1, 0L, 6L, 500000L, 0)))
    assert(got(1) == ((2, 0L, 6L, 500000L, 0)))
    assert(got(2) == ((3, 0L, 6L, 0L, 1)))
  }

  test("noised release: seeded Laplace matches a straight-line replica, clamps at 0") {
    def ts(d: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:${i % 60}%02d:00")
    // day 19723+d, type t: counts planted small so the clamp is reachable
    val rows = for {
      d <- 1 to 4; (t, n) <- Seq(("a", 1), ("b", 40)); i <- 1 to n
    } yield (i.toLong * 100 + d, ts(d, i), 1L, t, 0.0, "{}")
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val got = Governance.noisedDailyRelease(ev, Seq("a", "b"), scale = 2.0)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // straight-line replica of the device + inverse CDF
    def released(epochDay: Long, idx: Long, n: Long): Long = {
      val gid = epochDay * 2 + idx
      val h = ((gid % 1000003L) * 2654435761L) >> 16
      val u = ((h % 1048576L) + 1L).toDouble / 1048577.0
      val v = u - 0.5
      val noise = 0.0 - 2.0 * math.signum(v) * math.log(1.0 - 2.0 * math.abs(v))
      math.max(0L, n + math.floor(noise).toLong)
    }
    assert(got.nonEmpty && got.size == 8)
    got.foreach { case ((t, day), rel) =>
      val idx = if (t == "a") 0L else 1L
      val n = if (t == "a") 1L else 40L
      assert(rel == released(day, idx, n), s"($t,$day)")
      assert(rel >= 0L)
    }
    // the noise actually perturbs: not every group equals its true count
    val perturbed = got.count { case ((t, _), rel) =>
      rel != (if (t == "a") 1L else 40L)
    }
    assert(perturbed > 0, s"all groups unperturbed: $got")
  }

  test("the ladder is one Expand over one scan, not per-level re-reads") {
    val df = Governance.kAnonymityLadder(
      graft.Tables.customer(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    assert("(?i)expand".r.findAllIn(plan).size == 1, plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }

  // --- q222 Mondrian k-anonymization --------------------------------

  /** Straight-line reference of the declared Mondrian recursion. */
  private def mondrianRef(rows: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    var parts: Map[Long, Seq[(Long, Long)]] = Map(0L -> rows)
    for (_ <- 1 to rounds) {
      parts = parts.toSeq.flatMap { case (pid, rs) =>
        if (rs.size < 2 * k) Seq(pid -> rs)
        else {
          val r1 = rs.map(_._1).max - rs.map(_._1).min
          val r2 = rs.map(_._2).max - rs.map(_._2).min
          val dim = if (r1 >= r2) 1 else 2
          def v(r: (Long, Long)) = if (dim == 1) r._1 else r._2
          // lower median: smallest value whose cumulative count
          // reaches (n+1)/2
          val m = rs.map(v).sorted.apply((rs.size + 1) / 2 - 1)
          val (left, right) = rs.partition(v(_) <= m)
          if (left.size >= k && right.size >= k)
            Seq((pid * 2 + 1) -> left, (pid * 2 + 2) -> right)
          else Seq(pid -> rs)
        }
      }.toMap
    }
    parts.map { case (pid, rs) =>
      pid -> ((rs.size.toLong, rs.map(_._1).min, rs.map(_._1).max,
        rs.map(_._2).min, rs.map(_._2).max))
    }
  }

  test("mondrian == straight-line recursion; every leaf keeps k rows") {
    val rnd = new scala.util.Random(2222)
    val rows = (1 to 200).map(_ =>
      (rnd.nextInt(1000).toLong, rnd.nextInt(20).toLong))
    // d1 enters as balance dollars = cents/100 (the operator re-derives
    // cents with round(x*100))
    val df = rows.zipWithIndex.map { case ((d1, d2), i) =>
      (i.toLong, d1 / 100.0, d2.toInt)
    }.toDF("c_custkey", "c_acctbal", "c_nationkey")
    val got = Governance.mondrianAnonymize(df, k = 10, rounds = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val want = mondrianRef(rows, k = 10, rounds = 5)
    assert(got === want,
      s"engine-only=${(got.toSet -- want.toSet).take(2)} " +
        s"ref-only=${(want.toSet -- got.toSet).take(2)}")
    // the k-anonymity property and full coverage
    assert(got.values.forall(_._1 >= 10L))
    assert(got.values.map(_._1).sum === 200L)
    assert(got.size > 1, "nothing split — vacuous recursion")
    // deterministic under a different input partitioning
    val got2 = Governance.mondrianAnonymize(df.repartition(7), k = 10,
        rounds = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got2 === got)
  }

  test("mondrian release: one row per customer, each inside its box") {
    val rnd = new scala.util.Random(2323)
    val rows = (1 to 120).map(i =>
      (i.toLong, rnd.nextInt(1000) / 100.0, rnd.nextInt(20)))
    val df = rows.toDF("c_custkey", "c_acctbal", "c_nationkey")
    val rel = Governance.mondrianRelease(df, k = 10, rounds = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rel.length === 120)
    assert(rel.map(_._2).distinct.length === 120, "custkeys must be unique")
    val byKey = rows.map(r =>
      (r._1, (math.round(r._2 * 100), r._3.toLong))).toMap
    rel.foreach { case (_, ck, lo1, hi1, lo2, hi2) =>
      val (d1, d2) = byKey(ck)
      assert(lo1 <= d1 && d1 <= hi1 && lo2 <= d2 && d2 <= hi2,
        s"customer $ck outside its box")
    }
    // boxes agree with the summary form on the same data
    val sum = Governance.mondrianAnonymize(df, k = 10, rounds = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    rel.groupBy(_._1).foreach { case (pid, rs) =>
      assert(rs.map(r => (r._3, r._4, r._5, r._6)).distinct.toSeq ===
        Seq(sum(pid)))
    }
  }

  test("mondrian diversity audit: dominant share and l are exact per leaf") {
    val rnd = new scala.util.Random(2424)
    val segs = Array("AUTO", "BUILDING", "FURNITURE")
    val rows = (1 to 150).map(i => (i.toLong, rnd.nextInt(1000) / 100.0,
      rnd.nextInt(20), segs(rnd.nextInt(3))))
    val df = rows.toDF("c_custkey", "c_acctbal", "c_nationkey",
      "c_mktsegment")
    val got = Governance.mondrianDiversity(df, k = 10, rounds = 4)
      .as[(Long, Long, Long, String, Long)].collect()
    // reference: replay leaf assignment via the release, then count
    val leaf = Governance.mondrianRelease(df, k = 10, rounds = 4)
      .select(col("c_custkey"), col("pid"))
      .as[(Long, Long)].collect().toMap
    val segOf = rows.map(r => r._1 -> r._4).toMap
    val byLeaf = leaf.groupBy(_._2).view
      .mapValues(_.keys.toSeq.map(segOf)) // toSeq BEFORE map: a key-Set map would dedup segments
    got.foreach { case (pid, n, l, dominant, ppm) =>
      val ss = byLeaf(pid)
      assert(n === ss.size.toLong)
      assert(l === ss.distinct.size.toLong)
      val counts = ss.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (s, c) => (-c, s) }
      assert(dominant === counts.head._1)
      assert(ppm === counts.head._2.toLong * 1000000L / n)
    }
    assert(got.map(_._2).sum === 150L)
  }

  test("mondrian: an unsplittable corpus stays one box; guards fire") {
    val tiny = (1L to 9L).map(i => (i, i.toDouble, 1))
      .toDF("c_custkey", "c_acctbal", "c_nationkey")
    val one = Governance.mondrianAnonymize(tiny, k = 5, rounds = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(one.length === 1 && one.head._2 === 9L)
    intercept[IllegalArgumentException] {
      Governance.mondrianAnonymize(tiny, k = 1)
    }
  }
}
