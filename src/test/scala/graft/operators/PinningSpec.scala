package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pluggable determinism pins: local checkpoint by default, reliable
  * checkpoint files when `spark.graft.reliableCheckpointDir` is set —
  * and the pinned operators produce identical answers either way.
  */
class PinningSpec extends SparkSpec {
  import spark.implicits._

  private def withReliableDir[A](body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Pinning.ReliableDirKey, dir)
    try body(dir)
    finally spark.conf.unset(Pinning.ReliableDirKey)
  }

  test("default pin stays local: no reliable checkpoint files") {
    val pinned = Pinning.pin(spark.range(100).toDF("v"), eager = true)
    assert(pinned.count() === 100L)
  }

  test("with the dir configured, pin writes reliable checkpoint files") {
    withReliableDir { dir =>
      val pinned = Pinning.pin(spark.range(100).toDF("v"), eager = true)
      assert(pinned.count() === 100L)
      def files(p: java.io.File): Seq[java.io.File] = {
        val kids = Option(p.listFiles()).map(_.toSeq).getOrElse(Nil)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).nonEmpty,
        s"no checkpoint files under $dir")
    }
  }

  test("ExactSubstr answers are identical under either strategy") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen jumps over the lazy dog quickly"),
      (3L, "sphinx of black quartz judge my vow and the quick brown fox"))
      .toDF("doc_id", "text")
    def spans() = ExactSubstr.maximalSpans(docs, "text", "doc_id",
        minLen = 8)
      .select(col("doc_id"), col("span_start"), col("span_len"))
      .as[(Long, Long, Long)].collect().toSet
    val local = spans()
    val reliable = withReliableDir { _ => spans() }
    assert(local === reliable && local.nonEmpty)
  }
}
