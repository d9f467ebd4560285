package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // right: key 1 has snapshots at t=10 (a), t=20 (b); key 2 only at t=50
  private lazy val right = Seq(
    (1L, ts(10), "a"),
    (1L, ts(20), "b"),
    (2L, ts(50), "z"),
  ).toDF("k", "ts", "v")

  private lazy val left = Seq(
    (1L, ts(5), "before-any"),
    (1L, ts(10), "tie"),
    (1L, ts(15), "between"),
    (1L, ts(20), "tie2"),
    (1L, ts(99), "after-all"),
    (2L, ts(49), "just-early"),
    (3L, ts(10), "no-right-key"),
  ).toDF("k", "ts", "tag")

  test("asofJoin: inclusive semantics — each left row sees latest right at-or-before") {
    val got = AsofJoin.asofJoin(left, right, "k", "ts", Seq("v"))
      .select($"tag", $"v", $"asof_ts")
      .as[(String, Option[String], Option[Timestamp])].collect()
      .map(r => r._1 -> ((r._2, r._3.map(_.getTime / 1000)))).toMap
    assert(got == Map(
      "before-any" -> ((None, None)),            // nothing at-or-before t=5
      "tie" -> ((Some("a"), Some(10L))),         // equal ts IS visible
      "between" -> ((Some("a"), Some(10L))),
      "tie2" -> ((Some("b"), Some(20L))),
      "after-all" -> ((Some("b"), Some(20L))),   // carries forward forever
      "just-early" -> ((None, None)),            // right exists only later
      "no-right-key" -> ((None, None))))         // key absent on right
  }

  test("asofJoin: strict variant hides the equal-timestamp right row") {
    val got = AsofJoin.asofJoin(left, right, "k", "ts", Seq("v"),
        strict = true)
      .select($"tag", $"v").as[(String, Option[String])].collect().toMap
    assert(got("tie").isEmpty)          // t=10 right row no longer visible at t=10
    assert(got("tie2").contains("a"))   // at t=20 only the t=10 row qualifies
    assert(got("between").contains("a"))
    assert(got("after-all").contains("b"))
  }

  test("asofJoin: left row count is preserved exactly (it is a LEFT join)") {
    val out = AsofJoin.asofJoin(left, right, "k", "ts", Seq("v"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq ==
      left.columns.toSeq ++ Seq("asof_ts", "v"))
  }

  test("asofJoin plans one exchange + one sort — no range-join pair blow-up") {
    val plan = AsofJoin.asofJoin(left, right, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    // the union form must never plan a join at all, let alone a cartesian
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join in as-of plan:\n$plan")
  }

  test("purchaseClickAsof matches an independent per-row computation on real events") {
    val events = graft.Tables.events(spark, sf)
    val got = AsofJoin.purchaseClickAsof(events)
    // independent oracle: for every purchase, scan the user's clicks and
    // keep the max (ts, event_id) at-or-before — quadratic but tiny at spec
    // scale, and formulated via a plain range join + argmax instead of the
    // union+window machinery under test
    val p = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val c = events.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("cid"))
    val expect = p.join(c, $"user_id" === $"cu" && $"cts" <= $"ts", "left")
      .groupBy($"purchase_id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"cts", $"cid")).as("m"))
      .select($"purchase_id", $"m.cts".as("click_ts"), $"m.cid".as("click_id"))
      .as[(Long, Option[Timestamp], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val gotMap = got.select($"purchase_id", $"click_ts", $"click_id")
      .as[(Long, Option[Timestamp], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotMap == expect)
  }

  test("asofJoin: a null payload value in the newest right row does not tear") {
    // newest snapshot (t=20) carries a NULL v: the match must be THAT
    // row's values as a unit — asof_ts 20 with v null — never asof_ts 20
    // paired with the older row's "a"
    val r = Seq(
      (1L, ts(10), Some("a")),
      (1L, ts(20), None: Option[String]),
    ).toDF("k", "ts", "v")
    val l = Seq((1L, ts(30), "probe")).toDF("k", "ts", "tag")
    val got = AsofJoin.asofJoin(l, r, "k", "ts", Seq("v"))
      .select($"v", $"asof_ts").as[(Option[String], Option[Timestamp])]
      .collect().toSeq
    assert(got == Seq((None, Some(ts(20)))))
  }

  test("asofJoinSplit: parity with the default path on a synthetic hot key") {
    // one hot key (0) with many rows spread over time + a normal key, null
    // payloads sprinkled in, slices cutting between and ON right rows
    val rnd = new scala.util.Random(7)
    val hotRight = (0 until 200).map(i =>
      (0L, ts(i * 37L), if (i % 11 == 0) None else Some(i.toLong)))
    val right = (hotRight ++ Seq((5L, ts(1000), Some(-1L))))
      .toDF("k", "ts", "v")
    val left = ((0 until 500).map(i => (0L, ts(rnd.nextInt(8000).toLong), s"h$i")) ++
      Seq((5L, ts(999), "early5"), (5L, ts(1000), "tie5"), (5L, ts(4000), "late5"),
        (7L, ts(50), "no-right")))
      .toDF("k", "ts", "tag")
    for (strict <- Seq(false, true)) {
      val base = AsofJoin.asofJoin(left, right, "k", "ts", Seq("v"),
          strict = strict)
        .select($"k", $"ts", $"tag", $"asof_ts", $"v")
        .as[(Long, Timestamp, String, Option[Timestamp], Option[Long])]
        .collect().sortBy(_._3).toSeq
      // 10-minute slices cut the 2h span into ~13; right rows land on
      // slice boundaries at t=600*k, exercising the equal-ts-same-slice
      // invariant
      val split = AsofJoin.asofJoinSplit(left, right, "k", "ts", Seq("v"),
          strict = strict, slice = "10 minutes")
        .select($"k", $"ts", $"tag", $"asof_ts", $"v")
        .as[(Long, Timestamp, String, Option[Timestamp], Option[Long])]
        .collect().sortBy(_._3).toSeq
      assert(split == base, s"strict=$strict diverged")
    }
  }

  test("asofJoinSplit: left-only slices still receive carry-in from earlier slices") {
    // right stops at t=100; left probes live thousands of seconds later,
    // in slices with no right rows at all — each must still match t=100
    val r = Seq((1L, ts(100), "last")).toDF("k", "ts", "v")
    val l = Seq((1L, ts(5000), "far"), (1L, ts(9000), "farther"))
      .toDF("k", "ts", "tag")
    val got = AsofJoin.asofJoinSplit(l, r, "k", "ts", Seq("v"),
        slice = "1 minute")
      .select($"tag", $"v").as[(String, Option[String])].collect().toMap
    assert(got == Map("far" -> Some("last"), "farther" -> Some("last")))
  }
}
