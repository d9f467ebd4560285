package graft.operators

import graft.SparkSpec

class JsonOpsSpec extends SparkSpec {
  import spark.implicits._

  test("props map stats: multi-key objects, missing keys, malformed rows") {
    // the testdata props are single-key; the operator must handle the
    // general map shape — varying keys, and PERMISSIVE nulls for garbage
    val rows = Seq(
      (1L, """{"a": 1, "b": 2}"""),
      (2L, """{"a": 3}"""),
      (3L, """{"b": -5, "c": 0}"""),
      (4L, """not json at all"""),
    ).toDF("event_id", "props")
    val out = JsonOps.propsMapStats(rows)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out == Map(
      "a" -> ((2L, 4L, 1L, 3L)),
      "b" -> ((2L, -3L, -5L, 2L)),
      "c" -> ((1L, 0L, 0L, 0L))))
  }
}
