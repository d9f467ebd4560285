package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q165 A-ES weighted sampling, q166 ordered funnel, q167 readability:
  * local-reference pins and the semantic properties each exists for.
  */
class SampleFunnelReadabilitySpec extends SparkSpec {
  import spark.implicits._

  // ---- q165 weightedSample -------------------------------------------

  private def esKey(id: Long, w: Long): Double = {
    val h = ((id % 1000003L) * 2654435761L) >> 16
    val u = ((h % 1048576L) + 1).toDouble / 1048577.0
    math.log(u) / (w + 1).toDouble
  }

  test("weighted sample == local A-ES reference on sf0.001 documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expect = docs.select(col("lang"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq
      .flatMap { case (lang, rows) =>
        rows.toSeq.map { case (_, id, nc) => (id, nc, esKey(id, nc)) }
          .sortBy { case (id, _, k) => (-k, id) }
          .take(5).zipWithIndex
          .map { case ((id, nc, k), i) =>
            (lang, id, nc,
              BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble, (i + 1).toLong)
          }
      }.toSet
    val got = Pipelines.weightedSample(docs, "doc_id", "lang", "n_chars")
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got === expect)
  }

  test("raising a weight can only promote (monotone in w at fixed u)") {
    val base = (1L to 100L).map(id => (id, "s", 10L)).toDF("id", "g", "w")
    val sel1 = Pipelines.weightedSample(base, "id", "g", "w")
      .select(col("id")).as[Long].collect().toSet
    val loser = (1L to 100L).find(!sel1.contains(_)).get
    val boosted = (1L to 100L)
      .map(id => (id, "s", if (id == loser) 1000000000L else 10L))
      .toDF("id", "g", "w")
    val sel2 = Pipelines.weightedSample(boosted, "id", "g", "w")
      .select(col("id")).as[Long].collect().toSet
    assert(sel2.contains(loser), s"boosted $loser must enter the sample")
  }

  test("weighted sample is partition-invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Pipelines.weightedSample(docs, "doc_id", "lang", "n_chars")
    val b = Pipelines.weightedSample(docs.repartition(11), "doc_id", "lang",
      "n_chars")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  // ---- q166 funnel ----------------------------------------------------

  test("funnel: order matters, stages chain strictly, latency exact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered path, 1h between stages
      (1L, "signup", ts("2024-01-05 08:00:00")),
      (1L, "view", ts("2024-01-05 09:00:00")),
      (1L, "click", ts("2024-01-05 10:00:00")),
      (1L, "purchase", ts("2024-01-05 11:00:00")),
      // user 2: purchase BEFORE click — stops at view
      (2L, "signup", ts("2024-01-05 08:00:00")),
      (2L, "view", ts("2024-01-05 10:00:00")),
      (2L, "purchase", ts("2024-01-05 09:00:00")),
      // user 3: view BEFORE signup — view must not count
      (3L, "view", ts("2024-01-05 07:00:00")),
      (3L, "signup", ts("2024-01-05 08:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Relational.funnel(ev)
      .select(col("stage"), col("event_type"), col("n_users"),
        col("avg_hours_from_prev"))
      .as[(Int, String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1) == (("signup", 3L, None)))
    // user 1 converts in 1h, user 2 in 2h -> avg 1.5
    assert(got(2) == (("view", 2L, Some(1.5))))
    assert(got(3) == (("click", 1L, Some(1.0))))
    assert(got(4) == (("purchase", 1L, Some(1.0))))
  }

  test("funnel: users with zero stage-1 events never appear") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq((9L, "view", ts("2024-01-05 09:00:00")),
      (9L, "purchase", ts("2024-01-05 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    // no signups at all -> stage 1 count 0 -> nothing emitted
    assert(Relational.funnel(ev).count() === 0L)
  }

  // ---- q171 incrementalDailyAgg --------------------------------------

  test("incremental agg merge == direct full aggregate (all key cases)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key A: only before cutover; key B: only after; key C: both sides
    val ev = Seq(
      (1L, "a", 1.5, ts("2024-01-10 08:00:00")),
      (1L, "a", 2.5, ts("2024-01-11 08:00:00")),
      (2L, "b", 10.0, ts("2024-01-27 08:00:00")),
      (3L, "c", 1.0, ts("2024-01-05 08:00:00")),
      (3L, "c", 2.0, ts("2024-01-28 08:00:00")))
      .toDF("user_id", "event_type", "value", "ts")
    val got = Pipelines.incrementalDailyAgg(ev, cutoverDay = 25)
      .as[(Long, String, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((1L, "a")) == ((2L, 4.0)))
    assert(got((2L, "b")) == ((1L, 10.0)))
    assert(got((3L, "c")) == ((2L, 3.0)))
    // and on real data the merge equals the direct one-pass aggregate
    val events = graft.Tables.events(spark, sf)
    val direct = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round((sum(round(col("value") * 1e6).cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double"), 6)
          .as("sum_value"),
        max(unix_micros(col("ts"))).as("last_us"))
    val inc = Pipelines.incrementalDailyAgg(events, cutoverDay = 15)
    assert(inc.exceptAll(direct).isEmpty && direct.exceptAll(inc).isEmpty)
  }

  // ---- q172 proportionalHoldout --------------------------------------

  test("largest-remainder allocation: exact total on an awkward split") {
    // strata sizes 1,2,4 with K=5: quotas 5/7,10/7,20/7 -> floors 0,1,2
    // (sum 3), remainders 5,3,6 -> the 2 spare seats go to c (rem 6)
    // then a (rem 5): allocation 1,1,3 — flat rounding could never sum
    // to exactly 5
    val docs = (Seq((1L, "a")) ++ (2L to 3L).map((_, "b")) ++
      (4L to 7L).map((_, "c"))).toDF("doc_id", "lang")
    val got = Pipelines.proportionalHoldout(docs, "doc_id", "lang",
      totalK = 5)
    val alloc = got.select(col("lang"), col("k_alloc"))
      .distinct().as[(String, Long)].collect().toMap
    assert(alloc == Map("a" -> 1L, "b" -> 1L, "c" -> 3L), s"got $alloc")
    assert(got.count() === 5L)
  }

  test("holdout is exactly K rows, within-stratum-bounded, partition-invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Pipelines.proportionalHoldout(docs, "doc_id", "lang", 100)
    assert(a.count() === 100L)
    assert(a.filter(col("k_alloc") > col("n_stratum")).isEmpty)
    val b = Pipelines.proportionalHoldout(docs.repartition(13), "doc_id",
      "lang", 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("negative ids fail loudly in the new hash-ordered samplers") {
    // same contract as hashBucket (PipelinesSpec): signed % semantics
    // differ per engine, so refuse rather than silently diverge
    val neg = Seq((-1L, "s", 10L)).toDF("id", "g", "w")
    val e1 = intercept[Exception] {
      Pipelines.weightedSample(neg, "id", "g", "w").collect()
    }
    assert(e1.getMessage.contains("negative id"), e1.getMessage)
    val e2 = intercept[Exception] {
      Pipelines.proportionalHoldout(
        Seq((-1L, "s")).toDF("id", "g"), "id", "g", 1).collect()
    }
    assert(e2.getMessage.contains("negative id"), e2.getMessage)
  }

  // ---- q167 readability ----------------------------------------------

  test("readability: hand-computed Flesch on a two-sentence doc") {
    val docs = Seq((1L, "The cat sat. The dog ran!"),
      (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length === 1, "empty/null docs emit nothing")
    val (_, w, s2, sy, fre) = got(0)
    assert((w, s2, sy) == ((6L, 2L, 6L)))
    // 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert(fre === 119.19)
  }

  test("readability: polysyllabic prose scores harder than simple prose") {
    val docs = Seq(
      (1L, "I like tea. You like me. We sit here."),
      (2L, "Extraordinary bureaucratic onomatopoeia necessitates " +
        "unquestionably interdisciplinary reorganization."))
      .toDF("doc_id", "text")
    val f = TextAnalysis.readability(docs, "text", "doc_id")
      .select(col("doc_id"), col("fre")).as[(Long, Double)].collect().toMap
    assert(f(1L) > f(2L), s"got $f")
  }
}
