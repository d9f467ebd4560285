package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q212 Pareto/ABC and q213 daily peak overlap: hand-planted class
  * boundaries and sweep-line cases (midnight-spanning intervals,
  * touching endpoints, same-instant ties).
  */
class ParetoSweepSpec extends SparkSpec {
  import spark.implicits._

  test("q212: class boundaries are exact under cross-multiplication") {
    // qtys 70, 20, 10 (total 100): part 1 cum 70 -> A (70*10 <= 700),
    // part 2 cum 90 -> B (900 <= 900), part 3 -> C
    val li = Seq((1L, 70.0), (2L, 20.0), (3L, 10.0))
      .toDF("l_partkey", "l_quantity")
    val got = Relational.paretoAbc(li)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("A", 1L, 70L, 700000L), ("B", 1L, 20L, 200000L),
      ("C", 1L, 10L, 100000L)), got.toSeq)
    // tie on qty: smaller partkey ranks first (deterministic classes)
    val tie = Seq((5L, 50.0), (4L, 50.0)).toDF("l_partkey", "l_quantity")
    val t = Relational.paretoAbc(tie)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // part 4 cum 50 -> A (500 <= 700); part 5 cum 100 -> C
    assert(t.map(r => (r._1, r._2)) == Seq(("A", 1L), ("C", 1L)), t)
  }

  test("q213: sweep counts touching and midnight-spanning intervals") {
    val day = 86400000000L
    // day 0: [10, 20] and [20, 30] touch at 20 -> peak 2
    // [40, 50] disjoint
    // one interval spans midnight: [day-5, day+5] -> active both days
    val ivs = Seq(
      (10L, 20L), (20L, 30L), (40L, 50L), (day - 5L, day + 5L))
      .toDF("s", "e")
    val got = IntervalJoin.dailyPeakOverlap(ivs, "s", "e")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // day 0: peak 2 (touch), 4 active segments; day 1: the spill only
    assert(got == Seq((0L, 2L, 4L), (1L, 1L, 1L)), got)
  }

  test("q213: same-instant starts count concurrently (+1 before -1)") {
    val ivs = Seq((100L, 100L), (100L, 100L), (100L, 100L)).toDF("s", "e")
    val got = IntervalJoin.dailyPeakOverlap(ivs, "s", "e")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((0L, 3L, 3L)), got)
  }

  test("q211: calibration buckets on a planted bilingual corpus") {
    // en doc with 2 en stopword hits: mx=2 tot=2 -> conf (2e6) div 6
    // mislabeled doc: predicted en, labeled de -> accuracy drops
    val docs = Seq(
      (1L, "the cat and dog", "en"),
      (2L, "the bird and fish", "en"),
      (3L, "the tree and rock", "de")) // predicted en, truth de
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langCalibration(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
    // all three: mx=2, tot=2 -> conf = 2000000 div 6 = 333333, bucket 3
    assert(got.toSeq == Seq((3L, 3L, 333333L, 666666L, 333333L)), got.toSeq)
  }
}
