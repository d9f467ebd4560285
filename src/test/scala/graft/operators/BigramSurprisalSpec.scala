package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checkable pins for [[Pipelines.bigramSurprisal]] (q139's engine
  * side; the DuckDB oracle replays the same mixture on the grid).
  */
class BigramSurprisalSpec extends SparkSpec {
  import spark.implicits._

  test("bigram mixture: hand-computed two-doc corpus") {
    // corpus: "a b" x2, "a c" — unigrams: a:3 b:2? no — tokens: a,b,a,b,a,c
    // c1: a=3, b=2, c=1; N=6. bigrams: (a,b)x2, (a,c)x1; cf(a)=3.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = Pipelines.bigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def mic(x: Double): Double = math.rint(-math.log(x) * 1e6) / 1e6
    val l = 0.7
    // doc 1/2: first 'a' = uni(3/6); then 'b' | 'a' = 0.7*(2/3)+0.3*(2/6)
    val d1 = mic(3.0 / 6) + mic(l * (2.0 / 3) + (1 - l) * (2.0 / 6))
    // doc 3: first 'a'; then 'c' | 'a' = 0.7*(1/3)+0.3*(1/6)
    val d3 = mic(3.0 / 6) + mic(l * (1.0 / 3) + (1 - l) * (1.0 / 6))
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((2L, r6(d1), r6(d1 / 2))), s"got ${got(1L)}")
    assert(got(2L) == got(1L))
    assert(got(3L) == ((2L, r6(d3), r6(d3 / 2))), s"got ${got(3L)}")
  }

  test("in-context tokens are less surprising than out-of-context ones") {
    // 'b' after 'a' is the dominant continuation; 'z b' puts b in a
    // context where it never appeared — the mixture must charge more
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "z b"))
      .toDF("doc_id", "text")
    val rows = Pipelines.bigramSurprisal(docs, "text", "doc_id")
      .select(col("doc_id"), col("avg_nll")).as[(Long, Double)].collect().toMap
    assert(rows(4L) > rows(1L), s"got $rows")
  }

  test("empty and null docs vanish; single-token doc scores unigram only") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "solo solo")).toDF("doc_id", "text")
    val got = Pipelines.bigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> 1L, 4L -> 2L), s"got $got")
  }
}
