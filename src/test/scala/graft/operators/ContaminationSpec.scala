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
}
