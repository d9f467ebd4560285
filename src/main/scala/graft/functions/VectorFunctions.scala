package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions only — no UDFs, so the whole expression
  * stays inside WholeStageCodegen and Catalyst can prune/push around it.
  *
  * All arithmetic is promoted to double BEFORE multiplication (matching the
  * oracle, which computes on DOUBLE[]) and folded sequentially left-to-right,
  * so results are bit-identical with a sequential-loop engine like DuckDB.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> element-wise. */
  def toDoubleArray(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential left fold sum of an array<double>. */
  def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns (same length). */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  /** L2 norm of an array<double> column. */
  def l2Norm(c: Column): Column = sqrt(dot(c, c))

  /** Cosine similarity: dot(a,b) / (|a| * |b|). Inputs array<double>. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine over raw array<float> columns (promotes to double first). */
  def cosineF(a: Column, b: Column): Column =
    cosine(toDoubleArray(a), toDoubleArray(b))
}
