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
}
