package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-trip fidelity of the text-format readers against the parquet
  * ground truth: the same rows come back with the declared schema.
  */
class TextFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("jsonl round-trip preserves rows and declared schema") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"n_chars", $"text")
    val out = tmpDir("graft_jsonl") + "/docs"
    docs.write.mode("overwrite").json(out)
    val back = TextFormats.readJsonl(spark, out, docs.schema)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("csv round-trip preserves rows; malformed rows null out in PERMISSIVE mode") {
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
    val out = tmpDir("graft_csv") + "/orders"
    orders.write.mode("overwrite").option("header", "false").csv(out)
    val back = TextFormats.readCsv(spark, out, orders.schema)
    assert(back.count() == orders.count())
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      orders.orderBy("o_orderkey").collect().toSeq)
    // malformed line: non-numeric key -> PERMISSIVE yields nulls, not a crash
    val badDir = tmpDir("graft_csv_bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$badDir/bad.csv"), "notanumber,1,2.0,O\n42,7,9.5,F\n")
    val parsed = TextFormats.readCsv(spark, badDir, orders.schema)
    assert(parsed.count() == 2)
    assert(parsed.filter($"o_orderkey".isNull).count() == 1)
    assert(parsed.filter($"o_orderkey" === 42L).count() == 1)
  }

  test("jsonl quarantine: malformed lines routed with their raw text, good rows clean") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("graft_jsonl_quarantine")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"doc_id": 1, "text": "ok one"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "ok two"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = TextFormats.readJsonlQuarantined(spark, dir, schema).cache()
    val (good, bad) = TextFormats.quarantineSplit(df)
    assert(good.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(!good.columns.contains("_corrupt_record"))
    // quarantined rows carry the ORIGINAL raw line for replay/debugging
    val raw = bad.select($"_corrupt_record").as[String].collect().toSet
    assert(raw == Set("""{"doc_id": 2 "text": "missing comma"}""", "not json at all"))
    df.unpersist()
  }

  test("orc round trip: schema and every row byte-identical to the source") {
    val docs = graft.Tables.documents(spark, sf)
    val path = tmpDir("graft_orc_spec")
    ColumnarFormats.writeOrc(docs, path)
    val back = ColumnarFormats.readOrc(spark, path)
    assert(back.schema == docs.schema)
    // full-row set equality both directions (exceptAll is multiset-aware)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // pushdown survives the format switch: ORC scans support filters too
    val plan = back.filter($"lang" === "en").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lang"),
      s"ORC scan lost predicate pushdown:\n$plan")
  }
}
