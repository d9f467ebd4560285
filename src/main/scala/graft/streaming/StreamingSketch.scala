package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextShingles

/** Streaming duals of the mergeable sketches: maintain q232's
  * Count-Min d×w cell table and q239's per-source HLL registers over
  * UNBOUNDED token streams with sketch-sized state — these are the
  * rare streaming aggregations that need NO watermark, because bounded
  * state is their entire point. Run in update mode (a micro-batch
  * re-emits only the cells/registers it changed) or complete mode (the
  * full table — small by construction).
  *
  * Equivalence contracts (StreamingSketchSpec / StreamingHllSpec): the
  * latest emitted value per cell/register equals
  * [[graft.operators.Sketches.countMinCells]] /
  * [[graft.operators.Sketches.hllRegisters]] over the same documents —
  * per-occurrence hashing commutes with the batch side's
  * count-then-weight (sums) and distinct-then-hash (maxes)
  * formulations because both are commutative monoids.
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

  /** (src, j, mj) HLL registers over everything seen so far —
    * update-mode streaming aggregation with |sources|·64 bounded
    * state rows. Registers are MAXES, so duplicate words across (or
    * within) micro-batches cannot perturb them: no distinct pass, no
    * watermark. The estimate chain (q239) is a downstream fold over
    * 64 rows per source — run it per micro-batch in `foreachBatch`,
    * or over the complete-mode table.
    */
  def hllRegistersStream(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val m = 64
    val words = docs.select(col(srcCol).as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " "))
          .as("w"))
      .filter(col("w") =!= "")
      .withColumn("ph", graft.functions.PolyHashExprs.polyHash(col("w")))
      .withColumn("j", pmod(col("ph"), lit(m.toLong)))
      .withColumn("h", pmod(col("ph") * lit(Mult), lit(Prime)))
    // rank = 1 + leading zeros of the 30-bit window (h < Prime < 2^30):
    // the same integer compare ladder as the batch build
    val rho = (1 to 30).foldRight(lit(31L): org.apache.spark.sql.Column) {
      case (r, els) =>
        when(col("h") >= lit(1L << (30 - r)), lit(r.toLong)).otherwise(els)
    }
    words.withColumn("rho", rho)
      .groupBy(col("src"), col("j")).agg(max(col("rho")).as("mj"))
  }

  /** (src, i, mh) per-source minhash signature slots over everything
    * seen so far — the third monoid's streaming gate (sum = CMS,
    * max = HLL, MIN = minhash): update-mode aggregation with
    * |sources|·numHashes bounded state, no watermark; slot values are
    * q217's chain exactly, so the maintained table can drop into the
    * batch pair-similarity stage at any instant.
    */
  def minhashSketchStream(docs: DataFrame, textCol: String,
      srcCol: String, numHashes: Int = 64): DataFrame = {
    require(numHashes >= 1 && numHashes <= 1024,
      s"numHashes out of range: $numHashes")
    docs.select(col(srcCol).as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " "))
          .as("w"))
      .filter(col("w") =!= "")
      .select(col("src"),
        graft.functions.PolyHashExprs.polyHash(col("w")).as("ph"),
        explode(sequence(lit(0L), lit(numHashes - 1L))).as("i"))
      .select(col("src"), col("i"),
        pmod((col("ph") + col("i")) * lit(Mult), lit(Prime)).as("h"))
      .groupBy(col("src"), col("i")).agg(min(col("h")).as("mh"))
  }

  /** (src, sk) per-source KMV bottom-k sketch over everything seen so
    * far — the FOURTH monoid's streaming gate (sum = CMS, max = HLL,
    * min = minhash, bottom-k = KMV), and the one that runs the
    * [[graft.functions.KmvSketchAgg]] TypedImperativeAggregate
    * directly as the streaming aggregation: the state store holds ONE
    * serialized k-slot buffer per source (the sketch IS the state),
    * merged across micro-batches by the aggregate's own
    * insert-and-retruncate. Duplicate tokens across batches cannot
    * perturb it (set semantics), so no watermark, no distinct pass.
    * Equivalence contract (StreamingKmvSpec): the complete-mode table
    * equals `Sketches.kmvSourceSketch`'s arrays over everything fed
    * so far.
    */
  def kmvSketchStream(docs: DataFrame, textCol: String,
      srcCol: String, k: Int = 16): DataFrame =
    docs.select(col(srcCol).as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " "))
          .as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("src"))
      .agg(graft.functions.SketchAggs.kmvSketch(col("w"), k).as("sk"))
}
