package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>` / `array<double>`).
  *
  * The default entry points ([[dot]], [[cosine]], [[l2Norm]]) are NATIVE
  * codegen'd Catalyst expressions ([[VectorExprs]]) — they accept float or
  * double arrays directly (per-element promotion happens inside the fused
  * loop, so no interpreted cast pass is needed).
  *
  * The `*Hof` variants are the higher-order-function formulations, kept ONLY
  * for spec cross-checks: Spark evaluates HOF lambdas interpreted
  * (CodegenFallback, one Catalyst expression-tree evaluation per array
  * element) — never use them in a hot path.
  *
  * All arithmetic is promoted to double BEFORE multiplication (matching the
  * oracle, which computes on DOUBLE[]) and folded sequentially
  * left-to-right, so results are bit-identical with a sequential-loop engine
  * like DuckDB — and the native and Hof variants are bit-identical to each
  * other (asserted in specs).
  */
object VectorFunctions {

  /** Cast array<float> → array<double> element-wise (interpreted HOF; only
    * needed where a true array<double> VALUE is required, e.g. collecting a
    * k-means training sample — the native kernels take floats directly).
    */
  def toDoubleArray(c: Column): Column = transform(c, _.cast("double"))

  /** Dot product (native, codegen'd). */
  def dot(a: Column, b: Column): Column = VectorExprs.vecDot(a, b)

  /** L2 norm (native, codegen'd). */
  def l2Norm(c: Column): Column = sqrt(VectorExprs.vecDot(c, c))

  /** Cosine similarity in one fused pass (native, codegen'd). */
  def cosine(a: Column, b: Column): Column = VectorExprs.vecCosine(a, b)

  /** Unit-L2 projection (native, codegen'd; array<double> out). */
  def l2Normalize(c: Column): Column = VectorExprs.l2Normalize(c)

  // --- interpreted HOF formulations, for spec cross-checks only ---

  /** Sequential left fold sum of an array<double> (interpreted). */
  def arraySumHof(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns (interpreted). */
  def dotHof(a: Column, b: Column): Column =
    arraySumHof(zip_with(a, b, (x, y) => x * y))

  /** L2 norm of an array<double> column (interpreted). */
  def l2NormHof(c: Column): Column = sqrt(dotHof(c, c))

  /** Cosine as three separate folds (interpreted). */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (l2NormHof(a) * l2NormHof(b))
}
