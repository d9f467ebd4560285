package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Hilbert curve key (q153): structural proof on a full grid —
  * bijectivity and the unit-step property — evaluated through the Spark
  * expression itself, plus the locality claim against the z-order key.
  */
class HilbertKeySpec extends SparkSpec {
  import spark.implicits._

  test("bijective + unit-step adjacent over the full 16x16 grid") {
    val b = 4
    val n = 1 << b
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertKeyExpr.hilbertKey(col("x"), col("y"), b).as("d"))
      .collect()
      .map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    assert(grid.size === n * n, "curve must be bijective")
    assert(grid.keys.min === 0L && grid.keys.max === (n * n - 1).toLong)
    (0 until n * n - 1).foreach { d =>
      val (x1, y1) = grid(d.toLong)
      val (x2, y2) = grid(d.toLong + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumps at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert buckets have no looser envelopes than z-order on lineitem") {
    // the layout claim: bucket by each key on the same data and compare
    // total envelope area (the quantity scan-skipping cares about)
    val li = graft.Tables.lineitem(spark, sf)
    def area(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum((col("max_part") - col("min_part") + 1) *
        (col("max_supp") - col("min_supp") + 1)).as("a"))
        .collect()(0).getLong(0)
    val h = area(graft.operators.Pipelines.hilbertLayout(li))
    val z = area(graft.operators.Pipelines.zorderLayout(li))
    assert(h <= z, s"hilbert envelope area $h should be <= z-order $z")
  }
}
