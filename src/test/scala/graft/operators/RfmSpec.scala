package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFM segmentation (q253): strict-boundary quintile semantics on a
  * known population, near-uniform quintiles on real orders, and the
  * no-global-window plan contract.
  */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  test("known population: scores follow the strict-greater boundary rule") {
    // 10 customers, one order each on day 1970-01-(k+1), price k+1
    // dollars — every metric is a strictly increasing sequence, so the
    // 20/40/60/80 discrete percentiles are the values at positions
    // 2,4,6,8 and the scores are 1,1,2,2,3,3,4,4,5,5 for R and M;
    // frequency is constant 1 -> everyone scores 1.
    val orders = (1 to 10).map { k =>
      (k.toLong, k.toLong, f"1970-01-${k + 1}%02d 00:00:00",
        k.toDouble)
    }.toDF("o_orderkey", "o_custkey", "ds", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("ds")))
      .drop("ds")
    val got = Relational.rfmSegments(orders)
      .select(col("c_custkey"), col("r_score"), col("f_score"),
        col("m_score"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val expected = (1 to 10).map { k =>
      val s = ((k + 1) / 2).toLong // 1,1,2,2,3,3,4,4,5,5
      (k.toLong, s, 1L, s)
    }
    assert(got.toSeq === expected)
  }

  test("real orders: full 1..5 range, quintiles within one of uniform") {
    val rfm = Relational.rfmSegments(graft.Tables.orders(spark, sf))
    val n = rfm.count()
    assert(n > 0)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val hist = rfm.groupBy(col(c)).count()
        .as[(Long, Long)].collect().toMap
      assert(hist.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)), s"$c: $hist")
      // monetary/recency are near-continuous -> all five buckets hit
      if (c != "f_score") assert(hist.keySet === Set(1L, 2L, 3L, 4L, 5L))
    }
    // rfm code decomposes back into the three scores
    rfm.select(col("rfm"), col("r_score"), col("f_score"), col("m_score"))
      .as[(Long, Long, Long, Long)].collect().foreach {
        case (code, r, f, m) => assert(code === r * 100 + f * 10 + m)
      }
  }

  test("plan: no unpartitioned window anywhere (boundary-broadcast design)") {
    val plan = Relational.rfmSegments(graft.Tables.orders(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }
}
