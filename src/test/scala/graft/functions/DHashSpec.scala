package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dHash kernel: independent-reference parity, the one-edit stability
  * contract (a localized byte change flips at most 2 bits), and
  * codegen-path parity through a DataFrame.
  */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: BigInt cell sums, explicit floor division,
    * bit list built most-significant-first then reversed.
    */
  private def reference(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val means = (0 until 64).map { j =>
      val lo = (BigInt(j) * n / 64).toInt
      val hi = (BigInt(j + 1) * n / 64).toInt
      if (hi > lo)
        (bytes.slice(lo, hi).map(b => BigInt(b & 0xff)).sum / (hi - lo)).toLong
      else 0L
    }
    (62 to 0 by -1).foldLeft(0L) { (acc, b) =>
      (acc << 1) | (if (means(b + 1) > means(b)) 1L else 0L)
    }
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("kernel == independent reference across lengths incl. sub-grid") {
    val rnd = new scala.util.Random(77)
    val lengths = Seq(0, 1, 5, 48, 63, 64, 65, 97, 200, 553, 1000)
    for (len <- lengths; _ <- 1 to 5) {
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      val got = DHashExpr.compute(bytes)
      assert(got === reference(bytes), s"len=$len")
      assert(got >= 0L, "63-bit hash must stay non-negative")
    }
  }

  test("stability: one same-length byte edit flips at most 2 bits") {
    val rnd = new scala.util.Random(88)
    for (trial <- 1 to 50) {
      val len = 48 + rnd.nextInt(500)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      val pos = rnd.nextInt(len)
      val twin = bytes.clone()
      twin(pos) = rnd.nextInt(256).toByte
      val d = hamming(DHashExpr.compute(bytes), DHashExpr.compute(twin))
      assert(d <= 2,
        s"trial $trial: edit at $pos/$len moved $d bits — one cell " +
          "touches only its two adjacent comparisons")
    }
  }

  test("column API (codegen path) == kernel over a DataFrame") {
    val rnd = new scala.util.Random(99)
    val rows = (1L to 40L).map { i =>
      (i, Array.fill(40 + rnd.nextInt(300))(rnd.nextInt(256).toByte))
    }
    val got = rows.toDF("id", "payload")
      .select(col("id"), DHashExpr.dhash(col("payload")).as("h"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (i, bytes) =>
      assert(got(i) === DHashExpr.compute(bytes), s"id $i")
    }
  }
}
