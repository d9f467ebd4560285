package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", 43L),
    (2L, "the quick brown fox jumps over the lazy dog", "en", 43L), // exact dup of 1
    (3L, "The quick  brown fox jumps over the lazy dog", "en", 44L), // near-dup (case/ws)
    (4L, "completely different content about spark engines", "en", 48L),
    (5L, "the quick brown fox jumps over the lazy cat", "en", 43L), // near-dup of 1
    (6L, "der schnelle braune fuchs springt", "de", 33L),
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("exact dedup keeps lowest id per text") {
    val kept = Dedup.exact(docs, "text", "doc_id", Seq("lang", "n_chars"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("minhash LSH finds the near-dup pairs a brute-force jaccard finds") {
    val lsh = Dedup.minhashNearDups(docs, "text", "doc_id",
        shingleK = 5, numHashes = 64, bands = 32, threshold = 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute-force ground truth on the same shingle definition
    val sh = docs.select($"doc_id", TextShingles.charShingles($"text", 5).as("sh"))
    val a = sh.select($"doc_id".as("doc_a"), $"sh".as("sa"))
    val b = sh.select($"doc_id".as("doc_b"), $"sh".as("sb"))
    val truth = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .withColumn("j", size(array_intersect($"sa", $"sb")).cast("double") /
        size(array_union($"sa", $"sb")).cast("double"))
      .filter($"j" >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(lsh), s"LSH missed pairs: ${truth -- lsh}")
    assert(lsh.subsetOf(truth), s"LSH emitted sub-threshold pairs: ${lsh -- truth}")
    assert(truth.contains((1L, 2L)) && truth.contains((1L, 5L)))
  }

  test("editDistancePairs equals the all-pairs levenshtein formulation") {
    // real corpus + the synthetic near-dups so the result is non-empty at
    // every SF (real near-dup families may not exist at sf0.001)
    val all = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang")
      .union(docs.withColumn("doc_id", $"doc_id" + 900000L)
        .select($"doc_id", $"text", $"lang"))
    val got = Dedup.editDistancePairs(all, "text", "doc_id", "lang")
      .select("doc_a", "doc_b", "edit_distance")
      .as[(Long, Long, Long)].collect().toSet
    // brute force: EVERY same-lang pair through the identical floor + cap
    val d = all.select($"doc_id", $"lang",
      graft.functions.WordNgramsExpr.wordNgrams(
        TextShingles.normalize($"text"), 3).as("g"),
      TextShingles.normalize($"text").as("nt"))
    val truth = d.select($"doc_id".as("doc_a"), $"lang", $"g".as("ga"), $"nt".as("ta"))
      .join(d.select($"doc_id".as("doc_b"), $"lang", $"g".as("gb"), $"nt".as("tb")), Seq("lang"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("j", size(array_intersect($"ga", $"gb")).cast("double") /
        size(array_union($"ga", $"gb")).cast("double"))
      .filter($"j" >= 0.3)
      .withColumn("dist", levenshtein($"ta", $"tb").cast("long"))
      .filter($"dist" <= lit(0.25) * greatest(length($"ta"), length($"tb")))
      .select("doc_a", "doc_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == truth,
      s"missing=${truth -- got} extra=${got -- truth}")
    // the crafted near-dups must be in: 1≈2 (exact), 1≈3 (ws/case), 1≈5 (one word)
    assert(Set((900001L, 900002L), (900001L, 900003L), (900001L, 900005L))
      .subsetOf(got.map(t => (t._1, t._2))))
    // and the unrelated same-lang doc must not pair with anything
    assert(!got.exists(t => t._1 == 900004L || t._2 == 900004L))
  }

  test("native CharShinglesExpr equals the HOF formulation exactly") {
    val texts = graft.Tables.documents(spark, sf).limit(100)
      .select(TextShingles.normalize($"text").as("norm"))
    for (k <- Seq(1, 3, 5, 200)) { // 200 > any text: short-text path
      val native = texts.select(
        graft.functions.CharShinglesExpr.charShingles($"norm", k).as("sh"))
        .as[Seq[String]].collect().toSeq
      val hof = texts.select(TextShingles.charShinglesOf($"norm", k).as("sh"))
        .as[Seq[String]].collect().toSeq
      assert(native == hof, s"divergence at k=$k")
    }
  }

  test("simhash: identical texts have distance 0; near-dups small distance") {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxDist = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((1L, 2L)).contains(0L), s"exact dup pair missing/nonzero: $m")
  }

  test("ngram jaccard pairs stay within blocking groups and match threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang", n = 2, threshold = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (x, y) => x == 6L || y == 6L }) // de block alone
  }

  test("embedding near-dups finds duplicated vectors") {
    val base = graft.Tables.embeddings(spark, sf).limit(50)
    val dup = base.filter($"vec_id" === 3).withColumn("vec_id", lit(10003L))
    val pairs = Dedup.embeddingNearDups(base.unionByName(dup), "vec_id", dim = 64,
        threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 10003L)), s"got $pairs")
  }

  test("embedding near-dup recall >= 0.95 on PERTURBED near-dups vs brute force") {
    // pairs at cos ≈ 0.95–0.99 (not identical vectors — identical vectors
    // always collide and would hide an under-amplified hash family)
    val dim = 64
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val a = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
    val rows = (0 until 60).flatMap { i =>
      val v = unit()
      val g0 = unit()
      val proj = g0.zip(v).map { case (x, y) => x * y }.sum
      val orth = g0.zip(v).map { case (x, y) => x - proj * y }
      val on = math.sqrt(orth.map(x => x * x).sum)
      val eps = 0.15 + 0.17 * rnd.nextDouble() // cos(v, w) = 1/sqrt(1+eps²) ∈ ~[0.95, 0.99]
      val w = v.zip(orth).map { case (x, y) => x + eps * y / on }
      Seq((i.toLong * 2, v.map(_.toFloat)), (i.toLong * 2 + 1, w.map(_.toFloat)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val e = df.select($"vec_id".as("id"), $"embedding".as("v"))
    val truth = e.select($"id".as("id_a"), $"v".as("v_a"))
      .crossJoin(e.select($"id".as("id_b"), $"v".as("v_b")))
      .filter($"id_a" < $"id_b")
      .withColumn("sim", graft.functions.VectorFunctions.cosine($"v_a", $"v_b"))
      .filter($"sim" >= 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 40, s"construction sanity: only ${truth.size} true pairs")
    val lsh = Dedup.embeddingNearDups(df, "vec_id", dim, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(truth), s"sub-threshold pairs emitted: ${lsh -- truth}")
    val recall = (truth & lsh).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall; missed ${truth -- lsh}")
  }

  test("semanticNearDups: k-means-cell blocking finds perturbed near-dups") {
    // same construction as the LSH recall test: pairs at cos ≈ 0.95–0.99.
    // Near-dup pairs are ~colinear, so they share a nearest cell under ANY
    // centroid set — recall should be ~1 with overlapping assignment.
    val dim = 64
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val a = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
    val rows = (0 until 60).flatMap { i =>
      val v = unit()
      val g0 = unit()
      val proj = g0.zip(v).map { case (x, y) => x * y }.sum
      val orth = g0.zip(v).map { case (x, y) => x - proj * y }
      val on = math.sqrt(orth.map(x => x * x).sum)
      val eps = 0.15 + 0.17 * rnd.nextDouble()
      val w = v.zip(orth).map { case (x, y) => x + eps * y / on }
      Seq((i.toLong * 2, v.map(_.toFloat)), (i.toLong * 2 + 1, w.map(_.toFloat)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val truth = Dedup.embeddingPairsExact(df, "vec_id", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 40, s"construction sanity: only ${truth.size} true pairs")
    val got = Dedup.semanticNearDups(df, "vec_id", threshold = 0.95,
      nCells = 8, nAssign = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth), s"sub-threshold pairs emitted: ${got -- truth}")
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall; missed ${truth -- got}")
  }

  test("semanticDedupValidated pins recall_ok=1 at the q120 operating point") {
    val emb = graft.Tables.embeddings(spark, sf)
    val out = Dedup.semanticDedupValidated(emb, "vec_id", threshold = 0.35,
      nCells = 16, nAssign = 4, recallFloor = 0.9)
    val flags = out.select("recall_ok").distinct().as[Int].collect().toSet
    assert(flags == Set(1), s"recall below floor: flags=$flags")
    // output IS the exact pair set (precision 1.0 by construction)
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", threshold = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == exact)
  }

  test("bloomNewDocs: no false negatives; kept set is a subset of exact-new") {
    val docs = graft.Tables.documents(spark, sf)
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    val exact = Dedup.incrementalExact(even, odd, "text", "doc_id",
      Seq("lang", "n_chars")).select("doc_id").as[Long].collect().toSet
    val kept = Dedup.bloomNewDocs(even, odd, "text", "doc_id",
      Seq("lang", "n_chars"), expectedCorpusDocs = 100000L)
      .select("doc_id").as[Long].collect().toSet
    // no false negatives: every kept doc is genuinely new
    assert(kept.subsetOf(exact), s"seen docs emitted: ${kept -- exact}")
    // false-positive loss bounded well under the q122 floor at fpp=0.01
    val recall = (exact & kept).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.95, s"recall $recall; fp-dropped ${exact -- kept}")
    // a doc whose text IS in the corpus must always be dropped
    val replay = Dedup.bloomNewDocs(even, even.limit(20), "text", "doc_id",
      Seq("lang", "n_chars"), expectedCorpusDocs = 100000L)
    assert(replay.count() == 0L)
  }

  test("bloomDedupValidated pins recall_ok=1 and emits the exact q48 rows") {
    val docs = graft.Tables.documents(spark, sf)
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    val out = Dedup.bloomDedupValidated(even, odd, "text", "doc_id",
      Seq("lang", "n_chars"), expectedCorpusDocs = 100000L)
    assert(out.select("recall_ok").distinct().as[Int].collect().toSet == Set(1))
    val got = out.select("doc_id").as[Long].collect().toSet
    val exact = Dedup.incrementalExact(even, odd, "text", "doc_id",
      Seq("lang", "n_chars")).select("doc_id").as[Long].collect().toSet
    assert(got == exact)
  }

  test("native SimHashExpr is bit-identical to the HOF formulation") {
    val docs01 = graft.Tables.documents(spark, sf).limit(200)
    val native = docs01.select($"doc_id", Dedup.simhash($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    val hof = docs01.select($"doc_id", Dedup.simhashHof($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(native == hof)
  }

  test("native WordNgramsExpr equals the HOF formulation exactly") {
    val texts = graft.Tables.documents(spark, sf).limit(100)
      .select(TextShingles.normalize($"text").as("norm"))
    for (n <- Seq(1, 2, 3, 500)) { // 500 > any token count: short-text path
      val native = texts.select(
        graft.functions.WordNgramsExpr.wordNgrams($"norm", n).as("g"))
        .as[Seq[String]].collect().toSeq
      val hof = texts.select(
        TextShingles.wordNgramsOf(split($"norm", " "), n).as("g"))
        .as[Seq[String]].collect().toSeq
      assert(native == hof, s"divergence at n=$n")
    }
  }

  test("incrementalExact drops exact matches against the corpus, keeps the rest") {
    val corpus = Seq(
      (2L, "alpha beta gamma", "en", 16L),
      (4L, "delta epsilon", "en", 13L),
    ).toDF("doc_id", "text", "lang", "n_chars")
    val batch = Seq(
      (1L, "alpha beta gamma", "en", 16L), // exact dup of corpus doc 2
      (3L, "alpha beta gamma zeta", "en", 21L), // superset text: NOT a dup
      (5L, "delta epsilon", "de", 13L), // dup text, different metadata: still dup
      (7L, "eta theta", "en", 9L), // fresh
    ).toDF("doc_id", "text", "lang", "n_chars")
    val kept = Dedup.incrementalExact(corpus, batch, "text", "doc_id",
        Seq("lang", "n_chars"))
      .as[(Long, String, Long)].collect().map(_._1).toSet
    assert(kept == Set(3L, 7L))
    // empty corpus: everything survives
    val all = Dedup.incrementalExact(corpus.limit(0), batch, "text", "doc_id",
        Seq("lang", "n_chars"))
      .as[(Long, String, Long)].collect().map(_._1).toSet
    assert(all == Set(1L, 3L, 5L, 7L))
  }

  test("clusterPairs: min-label components over chains, triangles, long paths") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // chain -> component {1,2,3}
      (10L, 11L), // isolated pair
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle (cycle)
      // a 5-node path given in worst-case order: label 30 must propagate
      // across 4 hops -> exercises multiple iterations
      (33L, 34L), (32L, 33L), (31L, 32L), (30L, 31L),
    ).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val expect = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L)
    assert(got == expect)
    // determinism under a different edge order / physical layout
    val shuffled = Dedup.clusterPairs(pairs.orderBy($"doc_b").repartition(5),
      "doc_a", "doc_b").as[(Long, Long)].collect().toMap
    assert(shuffled == expect)
  }

  test("passageDedup: cross-doc, within-doc, and full-doc repeated passages") {
    val d = Seq(
      (1L, "a b c x y z"),          // chunk "x y z" repeats corpus-wide
      (2L, "p q r x y z"),          // shares "x y z" (non-canonical)
      (3L, "x y z x y z tail"),     // repeats "x y z" internally, twice
      (4L, "s t u v w"),            // ragged tail chunk "v w"
      (5L, "   "),                  // whitespace-only: zero chunks
      (6L, "s t u v w"),            // exact dup of doc 4: all passages dup
    ).toDF("doc_id", "text")
    val got = Dedup.passageDedup(d, "text", "doc_id", chunkTokens = 3)
      .select($"doc_id", $"n_chunks", $"n_dup_chunks", $"dup_ratio",
        $"text_stripped")
      .as[(Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      // canonical instances keep their text; "a b c" is unique
      1L -> ((2L, 1L, 0.5, "a b c x y z")),
      2L -> ((2L, 1L, 0.5, "p q r")),
      // both internal repeats strip (canonical lives in doc 1)
      3L -> ((3L, 2L, 0.666667, "tail")),
      // doc 4 is the canonical copy of every one of its passages
      4L -> ((2L, 2L, 1.0, "s t u v w")),
      // doc 5 (no tokens -> no passages) is absent;
      // doc 6 is a full duplicate: everything strips
      6L -> ((2L, 2L, 1.0, ""))))
  }

  test("passageDedup: whitespace runs normalize, so tab/space variants match") {
    val d = Seq(
      (1L, "a b c"),
      (2L, "a\tb   c"), // same 3 tokens, different whitespace
    ).toDF("doc_id", "text")
    val got = Dedup.passageDedup(d, "text", "doc_id", chunkTokens = 3)
      .select($"doc_id", $"n_dup_chunks", $"text_stripped")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((1L, "a b c")), 2L -> ((1L, ""))))
  }

  test("minhashValidated: rows are the brute-force exact pair set, recall_ok pinned to 1") {
    val v = Dedup.minhashValidated(docs, "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.7, recallFloor = 0.9)
    val got = v.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sh = docs.select($"doc_id", TextShingles.charShingles($"text", 5).as("sh"))
    val truth = sh.select($"doc_id".as("doc_a"), $"sh".as("sa"))
      .crossJoin(sh.select($"doc_id".as("doc_b"), $"sh".as("sb")))
      .filter($"doc_a" < $"doc_b")
      .withColumn("j", size(array_intersect($"sa", $"sb")).cast("double") /
        size(array_union($"sa", $"sb")).cast("double"))
      .filter($"j" >= 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty && got == truth)
    assert(v.select("recall_ok").distinct().as[Int].collect().toSeq == Seq(1))
  }

  test("validated near-dup gates flag green on the real corpus at their documented floors") {
    val corpus = graft.Tables.documents(spark, sf)
    val mh = Dedup.minhashValidated(corpus, "text", "doc_id")
    val sh = Dedup.simhashValidated(corpus, "text", "doc_id")
    assert(mh.count() > 0)
    assert(mh.select("recall_ok").distinct().as[Int].collect().toSeq == Seq(1))
    assert(sh.count() > 0)
    assert(sh.select("recall_ok").distinct().as[Int].collect().toSeq == Seq(1))
  }

  test("withRecallFlag: empty exact set yields empty output (vacuous pass, no rows)") {
    val corpus = graft.Tables.documents(spark, sf)
    // impossible threshold -> exact side empty -> crossJoin of empty x 1
    assert(Dedup.minhashValidated(corpus, "text", "doc_id",
      threshold = 1.1).count() == 0)
  }

  test("clusterPairs: throws instead of returning truncated labels at maxIters") {
    // a 9-node path: min label needs ~8 propagation hops, so maxIters = 2
    // cannot converge — the loop must fail loudly, not hand back labels
    // that split the component.
    val path = (0L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalStateException] {
      Dedup.clusterPairs(path, "doc_a", "doc_b", maxIters = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // the same input with enough iterations is one component labeled 0
    val ok = Dedup.clusterPairs(path, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(ok == (0L to 8L).map(_ -> 0L).toMap)
  }

  test("substringDupPairs: shifted alignment caught; boilerplate cap; short docs skipped") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val filler = (1 to 12).map(i => s"filler$i").mkString(" ")
    val boiler = "this common license header appears in every single document here"
    val docs = Seq(
      // 1 and 2 share `shared` at DIFFERENT offsets (the alignment case
      // fixed-chunk passage dedup misses)
      (1L, s"$shared $filler"),
      (2L, s"prefix words here $shared totally other tail content"),
      (3L, (1 to 12).map(i => s"other$i").mkString(" ") +
        " unique continuation nothing shared with others"),
      (4L, "tiny"), // under 40 chars: no windows
      // 5..9 all share `boiler`: window df = 5 > maxDocsPerWindow=3 cap
      (5L, s"$boiler alpha"), (6L, s"$boiler beta"), (7L, s"$boiler gamma"),
      (8L, s"$boiler delta"), (9L, s"$boiler epsilon"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDupPairs(docs, "text", "doc_id",
      windowChars = 40, maxDocsPerWindow = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    // only (1,2) pairs on the shared sentence; boilerplate docs pair on
    // NOTHING (every shared window exceeds the df cap)
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    // n_shared_windows: the common substring is `shared` PLUS the
    // trailing space (present in both docs — doc 1 before its filler,
    // doc 2 before its tail), so (len+1) − 40 + 1 windows
    assert(got.head._3 == (shared.length - 38).toLong)
    // raising the cap surfaces the boilerplate family as pairs
    val uncapped = Dedup.substringDupPairs(docs, "text", "doc_id",
      windowChars = 40, maxDocsPerWindow = 10)
      .as[(Long, Long, Long)].collect()
    assert(uncapped.count(p => p._1 >= 5L && p._2 <= 9L) == 10) // C(5,2)

    // q138 complement: the boilerplate REPORT surfaces exactly the
    // capped family — every reported window is shared by all 5 boiler
    // docs, and the pairwise-shared sentence (2 docs) stays below the
    // threshold
    val report = Dedup.boilerplateWindows(docs, "text", "doc_id",
      windowChars = 40, minDocs = 5)
      .as[(String, Long)].collect()
    assert(report.nonEmpty && report.forall(_._2 == 5L))
    assert(report.forall(r => boiler.contains(r._1.take(20))))
  }

  test("q201 JW title pairs: prefix blocking, threshold, occupancy guard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "the quick brown fox jumps over at"),   // near-identical title
      (3L, "the slow green turtle sits still"),    // same block, low JW
      (4L, "zz completely different text here"))   // different block
      .toDF("doc_id", "text")
    val got = Dedup.jaroWinklerTitlePairs(docs, "text", "doc_id",
      titleLen = 33, prefixLen = 2, minJw = 0.90)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), got)
    // micro value matches the kernel's own score floored
    val jw = graft.functions.JaroWinklerSpec.reference(
      "the quick brown fox jumps over it",
      "the quick brown fox jumps over at")
    assert(got.head._3 == math.floor(jw * 1000000.0).toLong)
    // a hot prefix block over the cap fails loudly, naming the block
    val hot = (1L to 9L).map(i => (i, s"aa title variant $i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.jaroWinklerTitlePairs(hot, "text", "doc_id",
        titleLen = 20, prefixLen = 2, maxBlockOccupancy = 5L)
    }
    assert(e.getMessage.contains("'aa'=9"))
  }

  test("q268 dup-cluster sizes: planted 3-cluster + pair + singletons") {
    import spark.implicits._
    val near = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, near, "en"), (2L, near, "en"), (3L, near, "en"), // 3-cluster
      (4L, "pack my box with five dozen brown jugs now ok", "en"),
      (5L, "pack my box with five dozen brown jugs now no", "en"), // pair
      (6L, "completely unrelated text lives here alone", "en"),
      (7L, "another loner with its very own words", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Dedup.dupClusterSizes(docs, "text", "doc_id", "lang")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 1L, 2L -> 1L, 1L -> 2L))
  }
}
