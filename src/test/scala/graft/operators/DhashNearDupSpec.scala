package graft.operators

import graft.SparkSpec
import graft.functions.DHashExpr
import org.apache.spark.sql.functions._

/** Perceptual (dHash) near-dup blocking: the 3×21-bit banded join must
  * return EXACTLY the all-pairs Hamming result for maxDist <= 2
  * (pigeonhole) — the Hamming-recall contract, fuzzed over corpora
  * with planted perturbed twins; plus the guard and the real-corpus
  * planted-pair floor.
  */
class DhashNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, Array[Byte])], maxDist: Int)
      : Set[(Long, Long, Long)] = {
    val hs = rows.map { case (id, b) => (id, DHashExpr.compute(b)) }
    (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet
  }

  test("banded pairs == brute-force Hamming pairs on planted-twin corpora") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val base = (1L to 60L).map { i =>
        (i, Array.fill(48 + rnd.nextInt(400))(rnd.nextInt(256).toByte))
      }
      // plant near-dups: 1-2 byte edits (Hamming <= 4 across two cells,
      // only <= 2 must surface) plus exact copies
      val twins = base.take(20).map { case (id, b) =>
        val t = b.clone()
        t(rnd.nextInt(t.length)) = rnd.nextInt(256).toByte
        if (rnd.nextBoolean()) t(rnd.nextInt(t.length)) = rnd.nextInt(256).toByte
        (id + 1000L, t)
      } ++ base.slice(20, 25).map { case (id, b) => (id + 2000L, b.clone()) }
      val corpus = base ++ twins
      val got = Dedup.dhashNearDups(
          corpus.toDF("doc_id", "payload"), "payload", "doc_id")
        .as[(Long, Long, Long)].collect().toSet
      val want = bruteForce(corpus, 2)
      assert(got === want,
        s"trial $trial: banded-only=${(got -- want).take(3)} " +
          s"brute-only=${(want -- got).take(3)}")
      // exact copies are Hamming 0 — the floor that proves non-vacuity
      assert(want.exists(_._3 == 0L), s"trial $trial planted no 0-pairs")
    }
  }

  test("maxDist beyond the pigeonhole guarantee is refused") {
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val e = intercept[IllegalArgumentException] {
      Dedup.dhashNearDups(df, "payload", "doc_id", maxDist = 3)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("q214 corpus: every planted one-byte twin is found at its doc pair") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val twins = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat(substring(col("text"), 1, 23), lit("~"),
          expr("substring(text, 25)")).as("text"))
    val media = docs.union(twins).select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    val got = Dedup.dhashNearDups(media, "payload", "doc_id")
      .as[(Long, Long, Long)].collect()
    val planted = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id")).as[Long].collect().toSet
    val foundAnchors = got.collect {
      case (a, b, _) if b == a + 1000000L => a
    }.toSet
    assert(planted.subsetOf(foundAnchors),
      s"missing twins for anchors ${(planted -- foundAnchors).take(5)}")
  }
}
