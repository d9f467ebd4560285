package graft.operators

import graft.SparkSpec

/** Interpolated Kneser-Ney surprisal (q235): straight-line reference
  * parity, frequent-vs-unseen ordering, and determinism.
  */
class KneserNeySpec extends SparkSpec {

  /** Single-threaded replica — same counts, same mirrored chain, same
    * micro grid and decimal sums.
    */
  private def reference(docs: Seq[(Long, String)], holdMod: Int,
      holdRem: Int, d: Double): Map[Long, (Long, Double, Double)] = {
    def tok(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val train = docs.filter(_._1 % holdMod != holdRem).map(x => tok(x._2))
      .filter(_.nonEmpty)
    val bigrams = train.flatMap(ts => ts.zip(ts.tail).map(p => (p._1, p._2)))
    val c2 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cu = c2.toSeq.groupBy(_._1._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.size.toLong)).toMap
    val nb = c2.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bTot = c2.size.toLong
    val v = train.flatten.distinct.size.toLong
    def pc(w: String): Double =
      (nb.getOrElse(w, 0L) + 1L).toDouble / (bTot + v).toDouble
    docs.filter(_._1 % holdMod == holdRem)
      .map { case (id, t) => (id, tok(t)) }
      .filter(_._2.nonEmpty)
      .map { case (id, ts) =>
        val mics = ts.zipWithIndex.map { case (w, i) =>
          val s =
            if (i == 0) pc(w)
            else cu.get(ts(i - 1)) match {
              case Some((cuv, n1f)) =>
                math.max(c2.getOrElse((ts(i - 1), w), 0L).toDouble - d,
                  0.0) / cuv.toDouble +
                  d * n1f.toDouble / cuv.toDouble * pc(w)
              case None => pc(w)
            }
          Math.round(-math.log(s) * 1e6)
        }
        val sumNll = BigDecimal(mics.sum) / BigDecimal(1000000L)
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, (ts.size.toLong, r6(sumNll.toDouble),
          r6(sumNll.toDouble / ts.size)))
      }.toMap
  }

  private val corpus = Seq(
    0L -> "the fast scan meets the slow scan",
    1L -> "fast scan fast scan the merge",
    2L -> "the merge beats the fast scan",
    3L -> "slow merge the scan",
    4L -> "novel words appear here only", // held out (4 % 5 == 4)
    9L -> "the fast scan the merge")      // held out (9 % 5 == 4)

  test("per-doc NLL matches the straight-line reference") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = Pipelines.kneserNeySurprisal(docs, "text", "doc_id",
        holdMod = 5, holdRem = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === reference(corpus, 5, 4, 0.75))
    // the all-novel doc is strictly more surprising than the in-domain one
    assert(got(4L)._3 > got(9L)._3)
  }

  test("deterministic under repartitioning on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Pipelines.kneserNeySurprisal(docs, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val b = Pipelines.kneserNeySurprisal(docs.repartition(9), "text",
        "doc_id")
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }

  test("discount guard") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Pipelines.kneserNeySurprisal(docs, "text", "doc_id", discount = 1.0)
    }
  }
}
