package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM EM loop (q215): round structure, the shrink schedule's
  * vocabulary bound per round, the character floor, and that every
  * round genuinely moves (the fixed-point trap q207 documented).
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "abab abab cdcd"),
    (2L, "abab cdcd cdcd ef"),
    (3L, "ababef abab ef ef")).toDF("doc_id", "text")

  test("emits keeps.length+1 rounds; multis bounded by the schedule") {
    val out = UnigramLm.unigramEmCounts(docs, "text",
        keeps = Seq(4, 2, 1), maxPieceLen = 3)
      .as[(Long, String, Long)].collect()
    val byRound = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byRound.keySet === Set(1L, 2L, 3L, 4L))
    // round r+1 segments under a vocab pruned to keeps(r-1) multis
    val caps = Map(2L -> 4, 3L -> 2, 4L -> 1)
    caps.foreach { case (r, cap) =>
      val multis = byRound(r).count(_.length > 1)
      assert(multis <= cap, s"round $r uses $multis multis > cap $cap")
    }
  }

  test("every round's usage covers the corpus characters exactly") {
    // segmentation is a partition of each word: sum over pieces of
    // len(piece)*uses == total word chars, every round
    val totalChars = docs.select(
      sum(length(regexp_replace(col("text"), " ", ""))))
      .as[Long].head()
    val out = UnigramLm.unigramEmCounts(docs, "text",
        keeps = Seq(4, 2), maxPieceLen = 3)
      .as[(Long, String, Long)].collect()
    out.groupBy(_._1).foreach { case (r, rows) =>
      val covered = rows.map { case (_, p, n) => p.length.toLong * n }.sum
      assert(covered === totalChars, s"round $r covers $covered chars")
    }
  }

  test("the shrink makes rounds move; bad schedules are refused") {
    val out = UnigramLm.unigramEmCounts(docs, "text",
        keeps = Seq(4, 1), maxPieceLen = 3)
      .as[(Long, String, Long)].collect()
    val sets = out.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(sets(1L) != sets(2L) || sets(2L) != sets(3L),
      "no round moved — the iteration is vacuous")
    intercept[IllegalArgumentException] {
      UnigramLm.unigramEmCounts(docs, "text", keeps = Nil)
    }
  }
}
