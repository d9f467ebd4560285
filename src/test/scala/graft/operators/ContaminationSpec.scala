package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def split(d: DataFrame): (DataFrame, DataFrame) =
    (d.filter(pmod($"doc_id", lit(10)) =!= 7),
      d.filter(pmod($"doc_id", lit(10)) === 7))

  test("ngramOverlapPairs matches brute-force set intersection on testdata") {
    val (train, bench) = split(Tables.documents(spark, sf))
    val got = Contamination
      .ngramOverlapPairs(train, bench, "text", "doc_id", n = 4, minShared = 2)
      .as[(Long, Long, Long, Double)].collect().toSet

    def gramSets(df: DataFrame): Seq[(Long, Set[String])] = df
      .select($"doc_id", TextShingles.normalize($"text").as("n"))
      .select($"doc_id", graft.functions.WordNgramsExpr.wordNgrams($"n", 4).as("g"))
      .as[(Long, Seq[String])].collect().toSeq
      .map { case (id, g) => (id, g.toSet) }

    val expect = (for {
      (ti, tg) <- gramSets(train)
      (bi, bg) <- gramSets(bench)
      shared = tg.intersect(bg).size if shared >= 2
    } yield (ti, bi, shared.toLong,
      BigDecimal(shared.toDouble / tg.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    assert(got == expect)
    assert(got.nonEmpty, "testdata must contain cross-slice near-dups")
  }

  test("overlap fraction is relative to the TRAIN doc; minShared filters") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 3 shared 4-grams
      (2L, "alpha beta gamma delta unrelated tail"), // 1 shared 4-gram
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val bench = Seq((7L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val got = Contamination
      .ngramOverlapPairs(train, bench, "text", "doc_id", n = 4, minShared = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    // doc 1: identical text -> all 3 of its distinct 4-grams shared, 3/3
    assert(got == Set((1L, 7L, 3L, 1.0)))
  }

  test("decontaminate drops exactly the flagged train docs") {
    val (train, bench) = split(Tables.documents(spark, sf))
    val flagged = Contamination
      .ngramOverlapPairs(train, bench, "text", "doc_id", n = 4, minShared = 2)
      .select($"train_id").as[Long].collect().toSet
    val kept = Contamination
      .decontaminate(train, bench, "text", "doc_id", n = 4, minShared = 2)
      .select($"doc_id").as[Long].collect().toSet
    val all = train.select($"doc_id").as[Long].collect().toSet
    assert(kept == all -- flagged)
    assert(flagged.nonEmpty && kept.nonEmpty)
  }

  test("stateless (array_intersect) formulation equals the aggregated one") {
    val (train, bench) = split(Tables.documents(spark, sf))
    val agg = Contamination
      .ngramOverlapPairs(train, bench, "text", "doc_id", n = 4, minShared = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val stateless = Contamination
      .overlapPairsStateless(train, bench, "text", "doc_id", n = 4, minShared = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(stateless == agg && agg.nonEmpty)
  }

  test("benchmark side broadcasts; the only hash exchange is the pair count") {
    val (train, bench) = split(Tables.documents(spark, sf))
    val df = Contamination.ngramOverlapPairs(train, bench, "text", "doc_id")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark grams must broadcast:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"train text must never shuffle — one exchange (the id-pair agg):\n$plan")
  }

  test("substringOverlapPairs matches brute-force window intersection on testdata") {
    val (train, bench) = split(Tables.documents(spark, sf))
    val got = Contamination
      .substringOverlapPairs(train, bench, "text", "doc_id", windowChars = 40)
      .as[(Long, Long, Long)].collect().toSet

    def winSets(df: DataFrame): Seq[(Long, Set[String])] = df
      .select($"doc_id", TextShingles.normalize($"text").as("n"))
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        (id, if (t == null || t.length < 40) Set.empty[String]
        else (0 to t.length - 40).map(i => t.substring(i, i + 40)).toSet)
      }

    val expect = (for {
      (ti, tw) <- winSets(train)
      (bi, bw) <- winSets(bench)
      shared = tw.intersect(bw).size if shared >= 1
    } yield (ti, bi, shared.toLong)).toSet

    assert(got == expect)
    assert(got.nonEmpty, "testdata must contain verbatim cross-slice substrings")
  }

  test("substring contamination: crafted verbatim run found, near-miss not") {
    val benchRun = "this exact forty char benchmark sentence!" // 41 chars
    val train = Seq(
      (1L, s"prefix words then $benchRun and a suffix"),
      (2L, "this exact Forty char benchmark sentence! differs by case only after norm"),
      (3L, "completely unrelated training document text with no benchmark overlap at all")
    ).toDF("doc_id", "text")
    val bench = Seq((7L, benchRun)).toDF("doc_id", "text")
    val got = Contamination
      .substringOverlapPairs(train, bench, "text", "doc_id", windowChars = 40)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1 embeds the 41-char run verbatim -> shares both 40-char
    // windows; doc 2 differs only by case, which normalize() folds ->
    // also contaminated (by design: the windows match post-normalization)
    assert(got == Set((1L, 7L, 2L), (2L, 7L, 2L)))
  }

  test("decontaminateExact drops exactly the substring-flagged train docs") {
    val (train, bench) = split(Tables.documents(spark, sf))
    val flagged = Contamination
      .substringOverlapPairs(train, bench, "text", "doc_id")
      .select($"train_id").as[Long].collect().toSet
    val kept = Contamination
      .decontaminateExact(train, bench, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    val all = train.select($"doc_id").as[Long].collect().toSet
    assert(kept == all -- flagged)
    assert(flagged.nonEmpty && kept.nonEmpty)
  }

  test("substring probe: bench windows broadcast; one exchange (pair agg)") {
    val (train, bench) = split(Tables.documents(spark, sf))
    val df = Contamination.substringOverlapPairs(train, bench, "text", "doc_id")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark windows must broadcast:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"train text must never shuffle — one exchange (the id-pair agg):\n$plan")
  }
}
