package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val probes = emb.filter($"vec_id" < 5)

  test("aggregate top-k equals window-rank top-k exactly") {
    val a = Similarity.bruteForceTopK(emb, probes, 10)
      .orderBy("probe_id", "rank").collect().toSeq
    val b = Similarity.windowTopK(emb, probes, 10)
      .orderBy("probe_id", "rank").collect().toSeq
    assert(a == b)
  }

  test("top-1 of a probe against itself-included corpus is near-identical vector") {
    // probe 0 vs corpus including an exact duplicate of itself under a new id
    val dup = emb.filter($"vec_id" === 0)
      .withColumn("vec_id", lit(9999L))
    val corpus = emb.unionByName(dup)
    val top = Similarity.bruteForceTopK(corpus, probes.filter($"vec_id" === 0), 1)
      .select("vec_id", "sim").as[(Long, Double)].head()
    assert(top._1 == 9999L && math.abs(top._2 - 1.0) < 1e-9)
  }

  test("IVF top-k: cell-pruned search recovers most true top-1 neighbors") {
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(emb, probes, 10, nCentroids = 8, nProbe = 4)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    assert(ivf.size == exact.size)
    val hits = ivf.count { case (p, v) => exact.get(p).contains(v) }
    assert(hits >= 3, s"IVF recall@1 was $hits/${ivf.size}")
    // every reported sim must equal the exact cosine (no approximation in scoring)
    val anyRow = Similarity.ivfTopK(emb, probes, 10, nCentroids = 8, nProbe = 4)
      .filter($"sim" > 1.0 + 1e-9)
    assert(anyRow.count() == 0)
  }

  test("native vector kernels are bit-identical to the interpreted HOF formulations") {
    import graft.functions.VectorFunctions._
    val a = emb.limit(30).select($"vec_id".as("ia"), $"embedding".as("ea"))
    val b = emb.limit(30).select($"vec_id".as("ib"), $"embedding".as("eb"))
    val rows = a.crossJoin(b).filter($"ia" < $"ib")
      .select(
        cosine($"ea", $"eb").as("cn"),
        cosineHof(toDoubleArray($"ea"), toDoubleArray($"eb")).as("ch"),
        dot($"ea", $"eb").as("dn"),
        dotHof(toDoubleArray($"ea"), toDoubleArray($"eb")).as("dh"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"cosine ${r.getDouble(0)} != ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(3), s"dot ${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("native hyperplane signature matches the literal-plane HOF formulation") {
    import graft.functions.VectorFunctions._
    val dim = 64; val bits = 16; val seed = 7L
    val hofSig = (0 until bits).map { i =>
      val plane = typedLit(Array.tabulate(dim)(j => Hashing.planeVal(seed, i, j)))
      when(dotHof(toDoubleArray($"embedding"), plane) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val diff = emb.limit(100)
      .select(Similarity.hyperplaneSignature($"embedding", dim, bits, seed).as("n"),
        hofSig.as("h"))
      .filter($"n" =!= $"h")
    assert(diff.count() == 0)
  }

  test("l2Normalize yields unit vectors preserving direction") {
    import graft.functions.VectorFunctions._
    val rows = emb.limit(20)
      .select(l2Norm(l2Normalize($"embedding")).as("unit"),
        cosine(l2Normalize($"embedding"), $"embedding").as("dir"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    }
  }

  test("LSH top-k: bucketed results are a subset of brute-force scoring with decent top-1 recall") {
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    val approx = Similarity.lshTopK(emb, probes, 10, dim = 64, bits = 4, tables = 16)
      .filter($"rank" === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    // every probe must return candidates from its cells
    assert(approx.size == exact.size)
    // OR-amplified LSH (12 tables × 6 bits) should recover most true top-1s
    val hits = approx.count { case (p, v) => exact.get(p).contains(v) }
    assert(hits >= 3, s"LSH recall@1 was $hits/${approx.size}")
  }

  test("labelCentroids: matches a driver-side mean; partitioning-independent") {
    val out = Similarity.labelCentroids(emb)
      .as[(Int, Int, Long, Double)].collect()
      .map { case (l, d, n, m) => (l, d) -> ((n, m)) }.toMap
    val rows = emb.select($"label", $"embedding").as[(Int, Seq[Float])].collect()
    val dim = rows.head._2.length
    assert(out.size == rows.map(_._1).distinct.length * dim)
    rows.groupBy(_._1).foreach { case (label, members) =>
      (0 until dim).foreach { d =>
        val micros = members.map(r => math.floor(r._2(d).toDouble * 1e6 + 0.5).toLong)
        val raw = micros.sum.toDouble / (members.length * 1e6)
        val (n, m) = out((label, d))
        assert(n == members.length)
        // m is raw rounded to 6 places — within half an ulp of scale 1e-6
        assert(math.abs(m - raw) <= 5.0001e-7, s"label $label dim $d: $m vs $raw")
      }
    }
    // exact long-sum => identical results under any physical layout
    val re = Similarity.labelCentroids(emb.repartition(13))
      .as[(Int, Int, Long, Double)].collect()
      .map { case (l, d, n, m) => (l, d) -> ((n, m)) }.toMap
    assert(re == out)
  }

  test("validated ANN gates: rows ARE bruteForceTopK, recall_ok pinned green") {
    val p10 = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, p10, 10)
      .collect().map(_.toSeq).toSet
    val lshV = Similarity.lshTopKValidated(emb, p10, 10,
      dim = 64, bits = 4, tables = 16, recallFloor = 0.8)
    assert(lshV.drop("recall_ok").collect().map(_.toSeq).toSet == exact)
    assert(lshV.select("recall_ok").distinct().as[Int].collect().toSeq == Seq(1))
    val ivfV = Similarity.ivfTopKValidated(emb, p10, 10,
      nCentroids = 16, nProbe = 4, recallFloor = 0.4)
    assert(ivfV.drop("recall_ok").collect().map(_.toSeq).toSet == exact)
    assert(ivfV.select("recall_ok").distinct().as[Int].collect().toSeq == Seq(1))
  }

  test("embeddingNearDupsValidated: rows ARE the exact all-pairs cosine set, flag green") {
    val v = Dedup.embeddingNearDupsValidated(emb, "vec_id", dim = 64,
      threshold = 0.35, recallFloor = 0.1)
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", 0.35)
      .collect().map(_.toSeq).toSet
    assert(exact.nonEmpty)
    assert(v.drop("recall_ok").collect().map(_.toSeq).toSet == exact)
    assert(v.select("recall_ok").distinct().as[Int].collect().toSeq == Seq(1))
  }

  test("q238 source-centroid drift: reference parity and planted shift") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // sources A/B share a direction; source C is shifted orthogonally
    def vec(base: Array[Float]): Array[Float] =
      base.map(x => x + 0.05f * (rnd.nextFloat() - 0.5f))
    val a = Array.fill(8)(vec(Array(0.5f, 0.4f, 0.0f, 0.1f)))
    val b = Array.fill(8)(vec(Array(0.45f, 0.45f, 0.05f, 0.1f)))
    val c = Array.fill(8)(vec(Array(-0.1f, 0.0f, 0.6f, -0.4f)))
    val rows = (a.map(("srcA", _)) ++ b.map(("srcB", _)) ++
      c.map(("srcC", _))).zipWithIndex
      .map { case ((s, v), i) => (i.toLong, s, v) }
    val docs = rows.toSeq.map(r => (r._1, r._2)).toDF("doc_id", "source")
    val emb = rows.toSeq.map(r => (r._1, r._3))
      .toDF("vec_id", "embedding")
    val got = Similarity.sourceCentroidDrift(docs, emb, dim = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // straight-line reference: quantize, sum, cosine, round 6
    def q(v: Array[Float]) = v.map(x => Math.round(10000.0 * x.toDouble))
    val sums = rows.groupBy(_._2).view.mapValues { xs =>
      val m = new Array[Long](4)
      xs.foreach(r => q(r._3).zipWithIndex.foreach { case (x, i) =>
        m(i) += x })
      (xs.size.toLong, m)
    }.toMap
    def cos(x: Array[Long], y: Array[Long]): Double = {
      val dp = (0 until 4).map(i => x(i) * y(i)).sum.toDouble
      val r = dp / (math.sqrt((0 until 4).map(i => x(i) * x(i)).sum
        .toDouble) * math.sqrt((0 until 4).map(i => y(i) * y(i)).sum
        .toDouble))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (sa <- Seq("srcA", "srcB", "srcC"); sb <- Seq("srcA", "srcB",
        "srcC") if sa < sb) {
      val (na, ca) = sums(sa); val (nb, cb) = sums(sb)
      assert(got((sa, sb)) === ((na, nb, cos(ca, cb))), s"$sa-$sb")
    }
    // the shifted source reads as drift: A-B cosine far above A-C, B-C
    assert(got(("srcA", "srcB"))._3 > 0.95)
    assert(got(("srcA", "srcC"))._3 < 0.5)
    assert(got(("srcB", "srcC"))._3 < 0.5)
  }

  test("q255 silhouette: planted tight clusters score near 1, mixed labels at/below 0") {
    import org.apache.spark.sql.functions.{col, lit}
    // two tight, well-separated clusters around (±10, 0, ..., 0)
    def vec(center: Float, jitter: Float): Seq[Float] =
      (center + jitter) +: Seq.fill(63)(0.0f)
    val good = (0 until 20).map { i =>
      val label = i % 2
      (i.toLong, vec(if (label == 0) 10f else -10f, (i / 2) * 0.01f),
        label)
    }.toDF("vec_id", "embedding", "label")
    val sGood = Similarity.labelSilhouette(good)
      .select(col("label"), col("mean_silhouette"))
      .as[(Long, Double)].collect().toMap
    assert(sGood.keySet === Set(0L, 1L))
    sGood.values.foreach(s => assert(s > 0.95, s"tight clusters: $s"))
    // same points, labels assigned ORTHOGONALLY to geometry -> the own
    // centroid sits between the blobs, silhouette collapses
    val bad = (0 until 20).map { i =>
      (i.toLong, vec(if (i < 10) 10f else -10f, (i % 10) * 0.01f),
        i % 2)
    }.toDF("vec_id", "embedding", "label")
    Similarity.labelSilhouette(bad)
      .select(col("mean_silhouette")).as[Double].collect()
      .foreach(s => assert(s < 0.1, s"mixed labels: $s"))
    // partitioning independence
    val r1 = Similarity.labelSilhouette(good.repartition(1)).collect()
    val r7 = Similarity.labelSilhouette(good.repartition(7)).collect()
    assert(r1.map(_.toString).sorted.toSeq ===
      r7.map(_.toString).sorted.toSeq)
  }
}
