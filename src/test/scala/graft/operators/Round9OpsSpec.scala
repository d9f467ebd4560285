package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 operators: containment dedup, sorted-neighborhood dedup,
  * winnowing dup pairs, n-gram novelty, DSIR weights — each against an
  * independent brute-force reference, plus the semantic properties that
  * motivate the operator.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")

  /** Distinct word-3-gram STRING sets per doc (reference side). */
  private def gramSets(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      TextShingles.wordNgramsOf(
        split(TextShingles.normalize(col("text")), " "), 3).as("g"))

  test("containmentDups == all-pairs overlap-coefficient reference") {
    val g = gramSets(docs).filter(size(col("g")) >= 10)
    val ref = g.select(col("doc_id").as("doc_a"), col("g").as("ga"))
      .crossJoin(g.select(col("doc_id").as("doc_b"), col("g").as("gb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("containment",
        size(array_intersect(col("ga"), col("gb"))).cast("double") /
          least(size(col("ga")), size(col("gb"))).cast("double"))
      .filter(col("containment") >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("containment"), 6).as("containment"))
    val got = Dedup.containmentDups(docs, "text", "doc_id",
      n = 3, minGrams = 10, threshold = 0.6)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("containment catches a near-superset pair that Jaccard misses") {
    // B embeds A verbatim inside 3x unrelated padding: containment(A,B)=1,
    // jaccard(A,B) well under any usual threshold
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val pad = (1 to 60).map(i => s"pad$i").mkString(" ")
    val d = Seq((1L, a), (2L, s"$pad $a $pad")).toDF("doc_id", "text")
    val got = Dedup.containmentDups(d, "text", "doc_id",
      n = 3, minGrams = 5, threshold = 0.9)
    val row = got.collect()
    assert(row.length === 1 && row(0).getLong(0) === 1L &&
      row(0).getLong(1) === 2L && row(0).getDouble(2) === 1.0)
    // and the same pair is invisible to Jaccard at 0.5
    val jac = gramSets(d)
    val j = jac.filter(col("doc_id") === 1).select(col("g").as("ga"))
      .crossJoin(jac.filter(col("doc_id") === 2).select(col("g").as("gb")))
      .select((size(array_intersect(col("ga"), col("gb"))).cast("double") /
        size(array_union(col("ga"), col("gb"))).cast("double")).as("j"))
      .as[Double].head()
    assert(j < 0.5)
  }

  test("sortedNeighborhoodPairs == direct rank-window reference") {
    val nt = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val base = docs.select(col("doc_id"), nt.as("nt"))
      .join(gramSets(docs), Seq("doc_id"))
      .select(col("doc_id"), substring(col("nt"), 1, 2).as("blk"),
        substring(col("nt"), 1, 30).as("key"), col("g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("key"), col("doc_id"))
    val r = base.withColumn("rn", row_number().over(w))
    val ref = r.select(col("blk"), col("rn").as("ra"), col("doc_id").as("ida"), col("g").as("ga"))
      .join(r.select(col("blk"), col("rn").as("rb"), col("doc_id").as("idb"), col("g").as("gb")), Seq("blk"))
      .filter((col("rb") - col("ra")).between(1, 5))
      .withColumn("jaccard",
        size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
    val got = Dedup.sortedNeighborhoodPairs(docs, "text", "doc_id",
      blockChars = 2, keyChars = 30, window = 5, n = 3, threshold = 0.5)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("winnow dupPairs: a planted verbatim copy shares every fingerprint hash") {
    val minId = docs.select(min("doc_id")).as[Long].head()
    val copy = docs.filter(col("doc_id") === minId)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val d = docs.select(col("doc_id"), col("text")).unionAll(copy)
    val pairs = Winnowing.dupPairs(d, "text", "doc_id",
      k = 8, w = 4, dfMax = 25, minShared = 5)
    val planted = pairs
      .filter(col("doc_a") === minId && col("doc_b") === minId + 100000L)
      .select(col("shared")).as[Long].collect()
    // identical text -> identical fingerprint set -> shared = exactly the
    // doc's distinct fps that survive the corpus df window [2, dfMax]
    // (this dense synthetic corpus pushes many fps over the cap)
    val fp = Winnowing.fingerprints(d, "text", "doc_id", k = 8, w = 4)
      .select(col("doc_id"), col("fp")).distinct()
    val surviving = fp.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 25))
      .join(fp.filter(col("doc_id") === minId), Seq("fp"))
      .count()
    assert(planted.length === 1 && planted(0) === surviving)
  }

  test("ngramNovelty: a corpus of one doc + its copy scores 1 then 0") {
    val d = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "totally fresh words appearing here first now")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(d, "text", "doc_id", n = 3)
      .orderBy("doc_id")
      .select(col("doc_id"), col("novelty")).as[(Long, Double)].collect()
    assert(got === Array((1L, 1.0), (2L, 0.0), (3L, 1.0)))
  }

  test("ngramNovelty == string-gram reference on the corpus") {
    val grams = gramSets(docs)
      .select(col("doc_id"), explode(col("g")).as("gram"))
    val first = grams.groupBy("gram").agg(min("doc_id").as("fd"))
    val ref = grams.join(first, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 6))
    val got = TextAnalysis.ngramNovelty(docs, "text", "doc_id", n = 3)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("containmentPrune: superset survives, contained copy dropped, unpaired intact") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    val pad = (1 to 60).map(i => s"pad$i").mkString(" ")
    val d = Seq(
      (1L, a),                      // contained in 2 -> dropped
      (2L, s"$pad $a $pad"),        // superset -> survives
      (3L, "totally unrelated words that pair with nothing at all here " +
        "zz yy xx ww vv uu tt ss")  // unpaired -> survives
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPrune(d, "text", "doc_id",
      n = 3, minGrams = 5, threshold = 0.9)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === Set(2L, 3L))
  }

  test("dailyAnomalyWindows: planted spike day flags, steady days don't") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    // 10 steady days of 5 events, then a 50-event spike on day 11
    val rows = (0 until 10).flatMap(day =>
      (0 until 5).map(i => (day * 5 + i).toLong -> day)) ++
      (0 until 50).map(i => (1000 + i).toLong -> 10)
    val ev = rows.map { case (id, day) =>
      (id, new java.sql.Timestamp(base + day * 86400000L), 1L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Relational.dailyAnomalyWindows(ev, trailing = 7, sigma = 2.0)
      .select(col("epoch_day"), col("is_anomaly")).as[(Long, Int)]
      .collect().toMap
    val spikeDay = got.keys.max
    assert(got(spikeDay) === 1, s"spike day must flag: $got")
    assert(got.filter(_._1 != spikeDay).values.forall(_ == 0),
      s"steady days must not flag: $got")
  }

  test("bm25Scores == local reference; more query-term mass ranks higher") {
    val qs = Seq("table", "join", "scan", "hash")
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val lens = rows.map { case (id, t) => id -> toks(t).size }.toMap
    val n = rows.length.toDouble
    val avg = lens.values.sum.toDouble / n
    val dfreq = qs.map(q =>
      q -> rows.count { case (_, t) => toks(t).contains(q) }).toMap
    val expect = rows.flatMap { case (id, t) =>
      val tc = toks(t).groupBy(identity).view.mapValues(_.size)
      val matched = qs.filter(q => tc.contains(q))
      if (matched.isEmpty) None
      else {
        val mics = matched.map { q =>
          val c = tc(q).toDouble
          val idf = math.log((n - dfreq(q) + 0.5) / (dfreq(q) + 0.5) + 1.0)
          math.round(idf * (c * 2.2) /
            (c + 1.2 * (0.25 + 0.75 * lens(id) / avg)) * 1e6)
        }
        Some((id, matched.size.toLong,
          BigDecimal(mics.sum) / BigDecimal(1000000) match {
            case x => x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          }))
      }
    }.toSet
    val got = TextAnalysis.bm25Scores(docs, "text", "doc_id", qs)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expect)
    // directional: a doc stuffed with query terms outranks one without
    val d2 = Seq((1L, "table join scan hash table join scan hash"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val s2 = TextAnalysis.bm25Scores(d2, "text", "doc_id", qs)
      .as[(Long, Long, Double)].collect()
      .map { case (id, _, s) => id -> s }.toMap
    assert(s2.contains(1L) && !s2.contains(2L))
  }

  test("dsirWeights: target-language docs score higher on average") {
    val got = Pipelines.dsirWeights(docs, "text", "doc_id", "lang",
      targetLang = "en")
    val m = got.groupBy(col("lang") === "en")
      .agg(avg(col("weight"))).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"en mean ${m(true)} should exceed non-en mean ${m(false)}")
  }

  test("dsirWeights == local reference on a small corpus") {
    val d = docs.limit(30)
    val rows = d.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def bkt(tok: String): Long = {
      var acc = 0L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc % 1024
    }
    val all = rows.flatMap { case (id, lang, t) => toks(t).map(w => (id, lang, bkt(w))) }
    val rc = all.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val tc = all.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, xs) => b -> xs.size.toLong }
    val rTot = rc.values.sum.toDouble
    // keysIterator, not keys: mapping over the key SET would collapse
    // equal counts before summing
    val tTot = rc.keysIterator.map(b => tc.getOrElse(b, 0L)).sum.toDouble
    val lr6 = rc.map { case (b, r) =>
      val t = tc.getOrElse(b, 0L).toDouble
      b -> math.round(math.log(((t + 0.5) / (tTot + 512.0)) /
        ((r + 0.5) / (rTot + 512.0))) * 1e6)
    }
    val expect = rows.map { case (id, lang, t) =>
      val bs = toks(t).map(bkt)
      val w = bs.map(lr6).sum / 1e6
      (id, lang, bs.size.toLong,
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = Pipelines.dsirWeights(d, "text", "doc_id", "lang",
      targetLang = "en")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got === expect)
  }
}
