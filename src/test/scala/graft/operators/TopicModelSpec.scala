package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pLSA EM (q225/q226): straight-line reference parity on an inline
  * corpus (non-default grid), grid invariants + repartition invariance
  * on real data, and the parameter guards.
  */
class TopicModelSpec extends SparkSpec {

  /** Straight-line single-threaded replica of TopicModel.emRounds —
    * same tokenizer, same hash seeding, same grid chain.
    */
  private def reference(docs: Seq[(Long, String)], k: Int, rounds: Int,
      g: Long): (Seq[Map[(String, Int), Long]], Map[(Long, Int), Long]) = {
    def ph(w: String): Long =
      w.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    def nano(num: Long, den: Long): Long =
      Math.round(g.toDouble * num.toDouble / den.toDouble)
    val u0 = Math.round(g.toDouble / k)
    val nd = docs.flatMap { case (d, t) =>
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
        .filter(_.nonEmpty).map(w => (d, w))
    }.groupBy(identity).map { case ((d, w), xs) => (d, w, xs.size.toLong) }
      .toSeq
    val vocab = nd.map(_._2).distinct
    val dids = nd.map(_._1).distinct
    var pwz: Map[(String, Int), Long] = {
      val wt = for (w <- vocab; z <- 0 until k)
        yield ((w, z), 1L + (ph(w) + z * 2654435761L) % 997L)
      val tot = (0 until k).map(z =>
        z -> wt.collect { case ((_, `z`), v) => v }.sum).toMap
      wt.map { case ((w, z), v) => ((w, z), nano(v, tot(z))) }.toMap
    }
    var pzd: Map[(Long, Int), Long] =
      (for (d <- dids; z <- 0 until k) yield ((d, z), u0)).toMap
    val perRound = Seq.newBuilder[Map[(String, Int), Long]]
    perRound += pwz
    for (_ <- 1 to rounds) {
      val post = nd.map { case (d, w, n) =>
        val joints = (0 until k).map(z => pwz((w, z)) * pzd((d, z)))
        val den = joints.sum
        val p =
          if (den > 0) joints.map(j => nano(j, den)) else Seq.fill(k)(u0)
        (d, w, n, p)
      }
      val swz = post.flatMap { case (_, w, n, p) =>
        (0 until k).map(z => ((w, z), n * p(z)))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val sz = (0 until k).map(z =>
        z -> swz.collect { case ((_, `z`), s) => s }.sum).toMap
      pwz = swz.map { case ((w, z), s) =>
        ((w, z), if (sz(z) > 0) nano(s, sz(z)) else 0L)
      }
      val sdz = post.flatMap { case (d, _, n, p) =>
        (0 until k).map(z => ((d, z), n * p(z)))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val sd = dids.map(d =>
        d -> sdz.collect { case ((`d`, _), s) => s }.sum).toMap
      pzd = sdz.map { case ((d, z), s) =>
        ((d, z), if (sd(d) > 0) nano(s, sd(d)) else u0)
      }
      perRound += pwz
    }
    (perRound.result(), pzd)
  }

  private val corpus = Seq(
    1L -> "join scan join hash table scan scan",
    2L -> "sort merge sort window sort merge",
    3L -> "join hash hash table join scan hash",
    4L -> "window sort window merge window",
    5L -> "table scan join table hash",
    6L -> "merge window sort merge sort window merge",
    7L -> "scan join table",
    8L -> "sort window merge")

  test("topic-word rounds match the straight-line reference (micro grid)") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val k = 3; val rounds = 3; val g = 1000000L
    val got = TopicModel.plsaTopicRounds(docs, "text", "doc_id", k,
        rounds, g)
      .collect().map(r => ((r.getInt(0), r.getInt(1), r.getString(2)),
        r.getLong(3))).toMap
    val (refRounds, _) = reference(corpus, k, rounds, g)
    val want = refRounds.zipWithIndex.flatMap { case (m, r) =>
      m.map { case ((w, z), p) => ((r, z, w), p) }
    }.toMap
    assert(got.size === want.size)
    assert(got === want)
  }

  test("doc-topic mixtures match the straight-line reference") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = TopicModel.plsaDocTopics(docs, "text", "doc_id", 3, 3,
        1000000L)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2)))
      .toMap
    val (_, refPzd) = reference(corpus, 3, 3, 1000000L)
    assert(got === refPzd)
  }

  test("grid invariants and EM movement on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val res = TopicModel.plsaTopicRounds(docs, "text").persist()
    // per (round, topic) the word distribution sums to the grid, up to
    // half-a-unit rounding per vocab word
    val vocabSize = res.filter(col("round") === 0 && col("z") === 0).count()
    val sums = res.groupBy("round", "z")
      .agg(sum("p_nano").as("s")).collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      val s = r.getLong(2)
      assert(math.abs(s - 1000000000L) <= vocabSize,
        s"round ${r.getInt(0)} topic ${r.getInt(1)} mass $s")
    }
    // EM moves: the final round's table differs from the init
    val r0 = res.filter(col("round") === 0)
      .select(col("z"), col("word"), col("p_nano"))
    val rN = res.filter(col("round") === 3)
      .select(col("z"), col("word"), col("p_nano"))
    assert(rN.exceptAll(r0).count() > 0)
    res.unpersist()
  }

  test("doc mixtures sum to the grid and are repartition-invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = TopicModel.plsaDocTopics(docs, "text")
    val b = TopicModel.plsaDocTopics(docs.repartition(7), "text")
    val rows = a.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    byDoc.foreach { case (d, s) =>
      assert(math.abs(s - 1000000000L) <= 3L, s"doc $d mass $s")
    }
    assert(rows.toSet === b.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("plsaAssign (shared pinned counts) equals assignTopics over plsaModel") {
    // r19: q230 trains + folds in through ONE pinned doc-term counts
    // frame; the result must be bit-identical to the old two-call form
    // (same counts rows, same final pwz — sharing only deduplicates
    // evaluation)
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val old = TopicModel
      .assignTopics(docs, TopicModel.plsaModel(docs, "text"), "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val shared = TopicModel.plsaAssign(docs, "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(shared === old)
  }

  test("parameter guards") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TopicModel.plsaTopicRounds(docs, "text", "doc_id", k = 1)
    }
    intercept[IllegalArgumentException] {
      TopicModel.plsaTopicRounds(docs, "text", "doc_id", rounds = 0)
    }
    intercept[IllegalArgumentException] {
      TopicModel.plsaTopicRounds(docs, "text", "doc_id",
        gridScale = 10L)
    }
  }
}
