package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time determinism of streaming quota admission: the admitted set
  * is the event-time-ordered first-fit fold, regardless of arrival order
  * or batch boundaries.
  */
class StreamingTokenQuotaSpec extends SparkSpec {
  import spark.implicits._
  import StreamingTokenQuota._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Local reference: first-fit fold in (ts, doc_id) order per key. */
  private def refAdmit(docs: Seq[Doc],
      budget: Long): Map[String, Seq[(Long, Long)]] =
    docs.groupBy(_.key).map { case (k, ds) =>
      var cum = 0L
      val admitted = Seq.newBuilder[(Long, Long)]
      ds.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
        if (cum + d.n_tokens <= budget) {
          cum += d.n_tokens
          admitted += ((d.doc_id, cum))
        }
      }
      k -> admitted.result()
    }

  test("admission replays event-time order: out-of-order + batch splits don't matter") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      Doc("a", 1L, ts("2024-01-01 10:00:00"), 4L),
      Doc("a", 2L, ts("2024-01-01 10:01:00"), 5L), // rejected: 4+5 > 8
      Doc("a", 3L, ts("2024-01-01 10:02:00"), 3L), // fits first-fit: 4+3=7
      Doc("a", 4L, ts("2024-01-01 10:03:00"), 1L), // fits exactly: 8
      Doc("a", 5L, ts("2024-01-01 10:04:00"), 1L), // quota closed
      Doc("b", 6L, ts("2024-01-01 10:00:30"), 8L), // exact fit
      Doc("b", 7L, ts("2024-01-01 10:01:30"), 1L))
    val in = MemoryStream[Doc]
    val out = StreamingTokenQuota.admit(spark, in.toDS(), budgetTokens = 8L,
      watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      // deliver REVERSED and split across batches: doc 3 and 4 arrive
      // before docs 1 and 2; admission must still fold in event-time order
      in.addData(docs(3), docs(2), docs(6))
      q.processAllAvailable()
      in.addData(docs(0), docs(1), docs(4), docs(5))
      q.processAllAvailable()
      assert(spark.table("quota_out").count() == 0,
        "admitted before the watermark passed")
      in.addData(Doc("hb", 99L, ts("2024-01-01 12:00:00"), 0L))
      q.processAllAvailable()
      in.addData(Doc("hb", 98L, ts("2024-01-01 13:00:00"), 0L))
      q.processAllAvailable()
      val got = spark.table("quota_out").as[Admitted].collect()
        .filter(_.key != "hb")
        .groupBy(_.key).map { case (k, as) =>
          k -> as.sortBy(_.doc_id).map(a => (a.doc_id, a.cum_tokens)).toSeq
        }
      val expect = refAdmit(docs, 8L).filter(_._2.nonEmpty)
      assert(got == expect, s"\n got=$got\n expect=$expect")
    } finally q.stop()
  }

  test("quota state persists: a second wave against an already-part-used budget") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val out = StreamingTokenQuota.admit(spark, in.toDS(), budgetTokens = 10L,
      watermarkDelay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("quota_waves")
      .outputMode("append").start()
    try {
      in.addData(Doc("k", 1L, ts("2024-01-01 10:00:00"), 6L))
      q.processAllAvailable()
      in.addData(Doc("k", 99L, ts("2024-01-01 11:00:00"), 0L)) // push wm
      q.processAllAvailable()
      // wave 2, an hour later: only 4 tokens left (6 + the wm-pusher's 0)
      in.addData(Doc("k", 2L, ts("2024-01-01 12:00:00"), 5L), // rejected
        Doc("k", 3L, ts("2024-01-01 12:00:01"), 4L))          // fits: 10
      q.processAllAvailable()
      in.addData(Doc("k", 98L, ts("2024-01-01 14:00:00"), 0L))
      q.processAllAvailable()
      val got = spark.table("quota_waves").as[Admitted].collect()
        .map(a => a.doc_id -> a.cum_tokens).toMap
      assert(got.contains(1L) && got.contains(3L) && !got.contains(2L),
        s"wrong admission across waves: $got")
      assert(got(3L) == 10L)
    } finally q.stop()
  }
}
