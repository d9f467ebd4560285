package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit fixtures for the round-8 TPC-H shapes (q125–q131): tiny
  * hand-computed inputs pin the semantics the DuckDB oracle then re-checks
  * at sf0.01 — ordering totality under ties (Q3), predicate bounds (Q6),
  * pair direction (Q7), cost proxy arithmetic (Q9), exact-decimal max ties
  * (Q15), anti-join exclusion (Q16), share threshold strictness (Q20).
  */
class TpchShapesSpec extends SparkSpec {
  import spark.implicits._

  test("shippingPriority: total order under revenue ties; both date cuts apply") {
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "1998-01-01"), // in
      (11L, 1L, "1998-02-01"), // in, ties with 10 on revenue
      (12L, 1L, "1998-07-01"), // orderdate after cutoff -> out
      (13L, 2L, "1998-01-01")) // wrong segment -> out
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    val li = Seq(
      (10L, "1998-07-01", 100.0, 0.0),
      (11L, "1998-07-01", 100.0, 0.0),
      (12L, "1998-07-01", 100.0, 0.0),
      (13L, "1998-07-01", 100.0, 0.0),
      (10L, "1998-01-02", 999.0, 0.0)) // shipped before cutoff -> excluded
      .toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val got = Relational.shippingPriority(cust, orders, li, n = 10)
      .select($"l_orderkey", $"revenue").as[(Long, Double)].collect().toSeq
    // equal revenue 100.0: order resolved by (o_orderdate, l_orderkey)
    assert(got == Seq((10L, 100.0), (11L, 100.0)))
  }

  test("forecastRevenue: band bounds inclusive, quantity cap strict") {
    val li = Seq(
      ("1996-06-01", 100.0, 0.05, 10.0), // in (lo edge)
      ("1996-06-01", 100.0, 0.07, 10.0), // in (hi edge)
      ("1996-06-01", 100.0, 0.08, 10.0), // discount out
      ("1996-06-01", 100.0, 0.06, 24.0), // qty == cap -> out (strict <)
      ("1997-01-01", 100.0, 0.06, 10.0)) // date out (exclusive end)
      .toDF("l_shipdate", "l_extendedprice", "l_discount", "l_quantity")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val got = Relational.forecastRevenue(li)
      .as[(Double, Long)].head()
    assert(got == ((100.0 * 0.05 + 100.0 * 0.07, 2L)))
  }

  test("volumeShipping: only the two directed pairs survive; year split") {
    val nation = Seq((1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("n_nationkey", "n_name")
    val supp = Seq((10L, 1L), (11L, 2L), (12L, 3L))
      .toDF("s_suppkey", "s_nationkey")
    val cust = Seq((20L, 1L), (21L, 2L), (22L, 3L))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((30L, 21L), (31L, 20L), (32L, 22L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (30L, 10L, "1996-03-01", 100.0, 0.0), // A->B 1996: in
      (30L, 10L, "1997-03-01", 50.0, 0.0),  // A->B 1997: in, separate year
      (31L, 11L, "1996-05-01", 70.0, 0.0),  // B->A: in
      (31L, 10L, "1996-05-01", 10.0, 0.0),  // A->A: out
      (32L, 10L, "1996-05-01", 10.0, 0.0))  // A->C: out
      .toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val got = Relational.volumeShipping(li, orders, cust, supp, nation, "A", "B")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("A", "B", 1996L, 100.0), ("A", "B", 1997L, 50.0),
      ("B", "A", 1996L, 70.0)))
  }

  test("productProfit: cost proxy subtracts exactly; name filter prunes") {
    val part = Seq((1L, "steel bolt", 10.0), (2L, "ring", 10.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val supp = Seq((10L, 1L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((1L, "X")).toDF("n_nationkey", "n_name")
    val li = Seq(
      (1L, 10L, "1996-03-01", 100.0, 0.1, 2.0), // profit 90 - 16 = 74
      (2L, 10L, "1996-03-01", 100.0, 0.0, 1.0)) // name filtered
      .toDF("l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount", "l_quantity")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val got = Relational.productProfit(li, part, supp, nation)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("X", 1996L, 74.0)))
  }

  test("topSupplier: exact-decimal max keeps co-maxima") {
    val supp = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    // s1 and s2 tie at 300.0 via different summation orders; s3 lower
    val li = Seq(
      (1L, "1996-02-01", 100.0, 0.0), (1L, "1996-02-02", 200.0, 0.0),
      (2L, "1996-02-01", 300.0, 0.0),
      (3L, "1996-02-01", 299.99, 0.0),
      (1L, "1995-12-31", 999.0, 0.0)) // outside quarter
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val got = Relational.topSupplier(li, supp)
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "s1", 300.0), (2L, "s2", 300.0)))
  }

  test("supplierPartVariety: complaint suppliers excluded, distinct counted once") {
    val part = Seq(
      (1L, "Brand#2", "LARGE", 4), (2L, "Brand#1", "LARGE", 4), // brand out
      (3L, "Brand#2", "PROMO", 4), (4L, "Brand#2", "LARGE", 9)) // type/size out
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supp = Seq((10L, 5.0), (11L, -1.0), (12L, 3.0))
      .toDF("s_suppkey", "s_acctbal")
    val li = Seq(
      (1L, 10L), (1L, 10L), // same supplier twice -> counts once
      (1L, 11L),            // complaint supplier -> excluded
      (1L, 12L),
      (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("l_partkey", "l_suppkey")
    val got = Relational.supplierPartVariety(li, part, supp)
      .as[(String, String, Int, Long)].collect().toSeq
    assert(got == Seq(("Brand#2", "LARGE", 4, 2L)))
  }

  test("dominantSuppliers: strict share threshold; name/date prune") {
    val part = Seq((1L, "small gear"), (2L, "big gear"))
      .toDF("p_partkey", "p_name")
    val supp = Seq((10L, "s10"), (11L, "s11"), (12L, "s12"))
      .toDF("s_suppkey", "s_name")
    // part 1 totals 100: s10 ships 40 (0.4 > 0.3: in),
    // s11 ships 30 (0.3 == threshold: strict > -> out), s12 ships 30 (out)
    val li = Seq(
      (1L, 10L, "1996-02-01", 40.0),
      (1L, 11L, "1996-02-01", 30.0),
      (1L, 12L, "1996-02-01", 30.0),
      (2L, 10L, "1996-02-01", 99.0),   // part name out
      (1L, 10L, "1997-02-01", 99.0))   // date out
      .toDF("l_partkey", "l_suppkey", "l_shipdate", "l_quantity")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val got = Relational.dominantSuppliers(li, part, supp)
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(got == Seq((1L, "s10", 40.0, 0.4)))
  }
}
