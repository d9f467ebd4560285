package graft.operators

import graft.SparkSpec

/** The capped driver-table device (DriverTables.collectCapped) and the
  * two newest call sites: the cap must be enforced by a LIMITED probe
  * job BEFORE the collect, so an oversized table fails loudly without
  * the driver ever materializing it. The consumption accumulator is
  * the proof: on a single-partition input the probe's limit early-stops
  * after cap+1 rows, so a guard trip that had secretly collected first
  * would show the full row count.
  */
class DriverTablesSpec extends SparkSpec {
  import spark.implicits._

  test("collectCapped returns the table when within cap") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val rows = DriverTables.collectCapped(df, 2, "t", "hint")
    assert(rows.length == 2)
  }

  test("guard fires from the limited probe, not a full materialization") {
    val consumed = spark.sparkContext.longAccumulator("dt_consumed")
    val big = spark.range(0L, 50000L, 1L, 1) // ONE partition: early-stop observable
      .as[Long]
      .mapPartitions(it => it.map { x => consumed.add(1L); x })
      .toDF("v")
    val e = intercept[IllegalArgumentException] {
      DriverTables.collectCapped(big, 16, "big table", "lower something")
    }
    assert(e.getMessage.contains("big table"))
    assert(e.getMessage.contains("probe saw 17"))
    assert(e.getMessage.contains("lower something"))
    // limit(17) stopped pulling long before the 50k rows: no full collect
    assert(consumed.value < 1000L,
      s"probe consumed ${consumed.value} rows — looks like a full scan")
  }

  test("empty input fails loudly; bad cap fails loudly") {
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      DriverTables.collectCapped(empty, 4, "t", "hint")
    }
    assert(e1.getMessage.contains("empty"))
    val one = Seq(("a", 1L)).toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      DriverTables.collectCapped(one, 0, "t", "hint")
    }
    assert(e2.getMessage.contains("cap must be positive"))
  }

  test("unigram seed-vocab cap probes before collecting (q206/q207 site)") {
    val docs = Seq((1L, "abcdefgh ijklmnop qrstuvwx"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      UnigramLm.unigramPieceCounts(docs, "text", maxPieceLen = 4,
        maxWordLen = 16, maxVocab = 3)
    }
    assert(e.getMessage.contains("unigram seed vocab"))
    assert(e.getMessage.contains("probe saw 4"))
    // same guard reached through the prune pipeline (q207)
    val e2 = intercept[IllegalArgumentException] {
      UnigramLm.unigramPrunedCounts(docs, "text", keepMulti = 2,
        maxPieceLen = 4, maxWordLen = 16, maxVocab = 3)
    }
    assert(e2.getMessage.contains("probe saw 4"))
  }

  test("negative-sampling vocab cap probes before collecting (q208 site)") {
    val docs = Seq((1L, "aa bb cc dd ee ff gg hh"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      NegativeSampling.skipgramWithNegatives(docs, "text", "doc_id",
        maxVocab = 3)
    }
    assert(e.getMessage.contains("negative-sampling vocab"))
    assert(e.getMessage.contains("probe saw 4"))
  }

  test("in-cap pipelines still produce the same results (q206/q208 happy path)") {
    val docs = Seq((1L, "ab ab ba"), (2L, "ab ba ba")).toDF("doc_id", "text")
    val pieces = UnigramLm.unigramPieceCounts(docs, "text",
        maxPieceLen = 2, maxWordLen = 16, maxVocab = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pieces.nonEmpty)
    assert(pieces.values.sum > 0L)
    val neg = NegativeSampling.skipgramWithNegatives(docs, "text",
      "doc_id", window = 1, negatives = 2, maxVocab = 1024)
    assert(neg.count() > 0L)
  }
}
