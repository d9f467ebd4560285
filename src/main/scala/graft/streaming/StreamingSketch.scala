package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextShingles

/** Streaming dual of q232's Count-Min sketch: maintain the d×w cell
  * table over an UNBOUNDED token stream with exactly d·w rows of
  * state — the sketch is the rare streaming aggregation that needs NO
  * watermark, because bounded state is its entire point. Runs in
  * update mode (a micro-batch re-emits only the cells it changed) or
  * complete mode (the full d·w table — small by construction).
  *
  * Equivalence contract (StreamingSketchSpec): the latest emitted value
  * per cell equals [[graft.operators.Sketches.countMinCells]] over the
  * same documents — per-occurrence hashing commutes with the batch
  * side's count-then-weight formulation because cell values are plain
  * sums.
  */
object StreamingSketch {

  private val Mult = 2654435761L
  private val Prime = 1000000007L

  /** (i, b, cn) over everything seen so far; update-mode streaming
    * aggregation with d·w bounded state.
    */
  def countMinCellsStream(docs: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 16 && width <= (1 << 20) &&
      Integer.bitCount(width) == 1, s"width must be a power of two: $width")
    docs
      .select(explode(split(TextShingles.normalize(col(textCol)), " "))
        .as("w"))
      .filter(col("w") =!= "")
      .select(graft.functions.PolyHashExprs.polyHash(col("w")).as("ph"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("i"))
      .select(col("i"),
        pmod(pmod((col("ph") + col("i")) * lit(Mult), lit(Prime)),
          lit(width.toLong)).as("b"))
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("cn"))
  }
}
