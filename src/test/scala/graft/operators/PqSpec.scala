package graft.operators

import graft.SparkSpec
import graft.functions.{AdcLookupExpr, PqEncodeExpr, PqExprs}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (q152): kernel-level references for the
  * encode/ADC expressions plus end-to-end recall against the exact
  * brute-force top-k.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("pq_encode == argmin-L2 reference; codes stay within ksub") {
    val m = 8; val ksub = 16; val dsub = 4; val dim = m * dsub
    val rnd = new scala.util.Random(7)
    val cbFlat = Array.fill(m * ksub * dsub)(rnd.nextDouble() * 2 - 1)
    val vecs = Seq.fill(50)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val got = vecs.toDF("v")
      .select(PqExprs.pqEncode(col("v"), cbFlat, m, ksub, dsub).as("c"))
      .as[Long].collect()
    val expect = vecs.map { v =>
      var code = 0L
      for (mi <- 0 until m) {
        val best = (0 until ksub).minBy { j =>
          (0 until dsub).map { t =>
            val d = v(mi * dsub + t) - cbFlat((mi * ksub + j) * dsub + t)
            d * d
          }.sum
        }
        code |= best.toLong << (4 * mi)
      }
      code
    }
    assert(got.toSeq === expect)
  }

  test("adc_score == lut-sum reference") {
    val m = 8; val ksub = 16
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(40)((rnd.nextLong() & 0x7fffffffffffffffL,
      Seq.fill(m * ksub)(rnd.nextDouble())))
    val got = rows.toDF("code", "lut")
      .select(PqExprs.adcScore(col("code"), col("lut"), m, ksub).as("s"))
      .as[Double].collect()
    val expect = rows.map { case (code, lut) =>
      (0 until m).map(mi => lut(mi * ksub + ((code >>> (4 * mi)) & 0xfL).toInt)).sum
    }
    assert(got.toSeq === expect)
  }

  test("pqTopK recall@10 >= 0.9 vs brute force at sf0.001") {
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
      .select("probe_id", "vec_id")
    val approx = Similarity.pqTopK(emb, probes, 10, dim = 64,
      m = 16, ksub = 16, rerank = 16).select("probe_id", "vec_id")
    val hit = exact.join(approx, Seq("probe_id", "vec_id")).count()
    assert(hit >= (exact.count() * 9) / 10, s"recall too low: $hit")
  }

  test("validated gate emits the exact rows with recall_ok = 1") {
    val probes = emb.filter(col("vec_id") < 10)
    val got = Similarity.pqTopKValidated(emb, probes, 10, dim = 64,
      m = 16, ksub = 16, rerank = 16, recallFloor = 0.85)
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
    assert(got.filter(col("recall_ok") =!= 1).isEmpty)
    assert(got.drop("recall_ok").exceptAll(exact).isEmpty &&
      exact.exceptAll(got.drop("recall_ok")).isEmpty)
  }
}
