package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FK-edge audit (q266) and basket lift (q267): planted orphans and
  * dead parents counted exactly; planted co-purchase structure ranked
  * by lift against a straight-line reference.
  */
class IntegrityBasketSpec extends SparkSpec {
  import spark.implicits._

  test("q266: planted orphans and unreferenced parents counted exactly") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 99L), (5L, 98L))
      .toDF("id", "fk")
    val parent = Seq((10L, "a"), (20L, "b"), (30L, "dead"))
      .toDF("pk", "v")
    // reuse the edge logic through the public audit on a single edge
    // by shaping the inputs as lineitem->orders
    val li = child.select(col("fk").as("l_orderkey"),
      lit(1L).as("l_partkey"), lit(1L).as("l_suppkey"))
    val ord = parent.select(col("pk").as("o_orderkey"),
      lit(1L).as("o_custkey"))
    val one = Seq((1L, 1L)).toDF("x", "y")
    val out = Relational.refIntegrityAudit(li,
        ord.withColumn("o_custkey", lit(1L)),
        one.select(col("x").as("c_custkey"), col("y").as("c_nationkey")),
        one.select(col("x").as("p_partkey")),
        one.select(col("x").as("s_suppkey"), col("y").as("s_nationkey")),
        one.select(col("x").as("n_nationkey"), col("y").as("n_regionkey")),
        one.select(col("x").as("r_regionkey")))
      .filter(col("fk_edge") === "lineitem.orderkey->orders")
      .as[(String, Long, Long, Long, Long)].collect().head
    // 5 child rows, 2 orphans (99, 98), 3 parent keys, 1 dead (30)
    assert(out === (("lineitem.orderkey->orders", 5L, 2L, 3L, 1L)))
  }

  test("q266 real tables: zero orphans, known dead-dimension counts") {
    val out = Relational.refIntegrityAudit(
      graft.Tables.lineitem(spark, sf), graft.Tables.orders(spark, sf),
      graft.Tables.customer(spark, sf), graft.Tables.part(spark, sf),
      graft.Tables.supplier(spark, sf), graft.Tables.nation(spark, sf),
      graft.Tables.region(spark, sf))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length === 7)
    out.foreach { case (edge, nc, orph, np, _) =>
      assert(orph === 0L, s"$edge has orphans")
      assert(nc > 0L && np > 0L)
    }
  }

  test("q267: planted co-purchase pair tops the lift ranking") {
    // brands X and Y always co-occur; Z floats independently
    val baskets = (0 until 12).flatMap { o =>
      val base = Seq((o.toLong, "X"), (o.toLong, "Y"))
      if (o % 2 == 0) base :+ ((o.toLong, "Z")) else base
    } ++ (12 until 24).map(o => (o.toLong, "Z"))
    val li = baskets.zipWithIndex.map { case ((o, b), i) =>
      (o, i.toLong, b)
    }.toDF("l_orderkey", "l_partkey", "brand")
    val part = li.select(col("l_partkey").as("p_partkey"),
      col("brand").as("p_brand"))
    val got = Relational.basketLift(li, part, k = 5, minSupport = 2L)
      .as[(String, String, Long, Long, Long, Double, Int)].collect()
      .sortBy(_._7)
    val top = got.head
    assert((top._1, top._2) === (("X", "Y")))
    // lift(X,Y) = n_orders * c_xy / (c_x * c_y) = 24*12/(12*12) = 2
    assert(top._6 === 2.0 && top._3 === 12L)
    // X-Z / Y-Z pairs exist (support 6) but lift below 2
    got.tail.foreach(r => assert(r._6 < 2.0))
  }

  test("q280: planted triple mined; apriori prune drops rare-item triples") {
    // X,Y,Z co-occur in 6 baskets; W appears in only 2 (below the
    // item floor 3) even though {X,Y,W} would have support 2
    val baskets = (0 until 6).flatMap(o => Seq((o.toLong, "X"),
      (o.toLong, "Y"), (o.toLong, "Z"))) ++
      Seq((0L, "W"), (1L, "W")) ++
      (6 until 10).map(o => (o.toLong, "X"))
    val li = baskets.zipWithIndex.map { case ((o, b), i) =>
      (o, i.toLong, b)
    }.toDF("l_orderkey", "l_partkey", "brand")
    val part = li.select(col("l_partkey").as("p_partkey"),
      col("brand").as("p_brand"))
    val got = Relational.basketTriples(li, part, k = 5,
      minItemSupport = 3L, minSupport = 2L)
      .as[(String, String, String, Long, Long, Long, Long, Int)]
      .collect()
    assert(got.length === 1, s"exactly the planted triple: ${got.toSeq}")
    val t = got.head
    assert((t._1, t._2, t._3, t._4) === (("X", "Y", "Z", 6L)))
    assert((t._5, t._6, t._7, t._8) === ((10L, 6L, 6L, 1)))
  }

  test("q281 kappa: perfect agreement = 1, hand reference on a mixed corpus") {
    def docs(rows: Seq[(String, String)]) =
      rows.toDF("text", "lang")
    val en = "the and of to in"; val de = "der und ist nicht ein"
    val perfect = TextAnalysis.cohenKappa(
      docs(Seq((en, "en"), (de, "de"), (en, "en"), (de, "de"))),
      "text", "lang")
      .as[(Long, Double, Double, Double)].collect().head
    assert(perfect === ((4L, 1.0, 0.5, 1.0)))
    // mixed: 3 en right, 1 en mislabeled de, 2 de right ->
    // po = 5/6; rt = {en:4, de:2} pred ct = {en:3, de:3}
    // pe = (4*3 + 2*3)/36 = 0.5 ; kappa = (5/6 - 1/2)/(1/2) = 2/3
    val mixed = TextAnalysis.cohenKappa(
      docs(Seq((en, "en"), (en, "en"), (en, "en"), (en, "de"),
        (de, "de"), (de, "de"))), "text", "lang")
      .as[(Long, Double, Double, Double)].collect().head
    assert(mixed._1 === 6L && mixed._2 === BigDecimal(5.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(mixed._3 === 0.5)
    assert(math.abs(mixed._4 - 2.0 / 3) < 1e-6, s"kappa: $mixed")
    // degenerate: single label and single prediction -> NaN
    val dg = TextAnalysis.cohenKappa(docs(Seq((en, "en"), (en, "en"))),
      "text", "lang")
      .as[(Long, Double, Double, Double)].collect().head
    assert(dg._4.isNaN, s"degenerate: $dg")
  }
}
