package graft.operators

import graft.SparkSpec

/** q192 Min-K%-prob: hand-replicated add-1 surprisal cut on a planted
  * split, ceil arithmetic at the k boundary, and the seen-vs-unseen
  * separation the score exists for.
  */
class MinKProbSpec extends SparkSpec {
  import spark.implicits._

  // train: "a a b" (1), "a c" (2); held doc 17: "a b z d"
  // counts a=3 b=1 c=1, N=5 V=3; p(tok) = (c+1)/8
  private val docs = Seq((1L, "a a b"), (2L, "a c"), (17L, "a b z d"))
    .toDF("doc_id", "text")

  private def micro(p: Double): Long =
    BigDecimal(-math.log(p) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def run(kPct: Int) =
    Contamination.minKProbScore(docs, "text", "doc_id", kPct)
      .as[(Long, Long, Long, Double)].collect().toSeq

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("top-k% surprisal mean matches the hand-replicated grid chain") {
    val unseen = micro(1.0 / 8.0) // z, d
    val b = micro(2.0 / 8.0)
    // k=20%: ceil(0.8)=1 -> one unseen token
    assert(run(20) === Seq((17L, 4L, 1L, r6(unseen / 1e6))))
    // k=50%: ceil(2)=2 -> both unseen (tie-invariant sum)
    assert(run(50) === Seq((17L, 4L, 2L, r6(2 * unseen / 1e6 / 2))))
    // k=75%: ceil(3)=3 -> two unseen + 'b'
    assert(run(75) ===
      Seq((17L, 4L, 3L, r6((2.0 * unseen + b) / 1e6 / 3))))
  }

  test("a held doc of seen-common tokens scores far below an unseen one") {
    val d2 = Seq((1L, "a a a a b b"), (7L, "a a b"), (17L, "q r s"))
      .toDF("doc_id", "text")
    val got = Contamination.minKProbScore(d2, "text", "doc_id", 50)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got(7L) < got(17L), s"got $got")
  }

  test("partition-invariant on sf0.001 documents") {
    val d = graft.Tables.documents(spark, sf)
    val a = Contamination.minKProbScore(d, "text", "doc_id")
    val b = Contamination.minKProbScore(d.repartition(9), "text", "doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
