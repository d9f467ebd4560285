package graft.functions

import graft.operators.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot loops of the similarity /
  * near-dup family (q7/q17/q18/q32). These replace interpreted HOF
  * formulations (`aggregate`/`zip_with` are CodegenFallback — one Catalyst
  * expression-tree evaluation per array ELEMENT) with a single fused
  * primitive loop per row/pair, inside whole-stage codegen.
  *
  * Arithmetic contract: every kernel folds sequentially left-to-right with
  * per-element promotion to double — bit-identical to both the HOF
  * formulations they replace and to the DuckDB oracle
  * (`list_dot_product` over `DOUBLE[]`), so oracled queries stay
  * hash-green. Float inputs are promoted per element ((double)f then
  * multiply), exactly like `transform(c, _.cast("double"))` followed by a
  * double fold — which is why kernels accept `array<float>` directly and
  * the hot paths skip the interpreted cast pass entirely.
  */
object VectorKernels {

  /** Sequential dot product; min-length zip like `zip_with` on equal dims. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Single-pass cosine: dot, |a|², |b|² in one traversal. Each accumulator
    * is its own sequential fold, so the result is bit-identical to
    * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` computed as three
    * separate passes (interleaving independent accumulators does not change
    * any fold's order).
    */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Unit-L2 copy of the vector (array<double>). Zero vectors map to NaNs —
    * callers own that precondition (embeddings are non-zero).
    */
  def l2normalize(a: ArrayData, aFloat: Boolean): GenericArrayData = {
    val n = a.numElements()
    var nrm = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      nrm += x * x
      i += 1
    }
    nrm = math.sqrt(nrm)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x / nrm
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All-bits hyperplane signature in one pass over the planes: bit i =
    * sign(dot(v, plane_i)). Sign decisions are bit-identical to the HOF
    * formulation (same sequential dot per plane, same `>= 0` threshold).
    */
  def hyperplaneSig(v: ArrayData, vFloat: Boolean, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var t = 0
    while (t < planes.length) {
      val p = planes(t)
      val n = math.min(p.length, v.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * p(i)
        i += 1
      }
      if (acc >= 0) sig |= 1L << t
      t += 1
    }
    sig
  }

  private[functions] def checkVec(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float> or array<double>, got $other")
  }

  private[functions] def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] val clsRef: String =
    VectorKernels.getClass.getName.stripSuffix("$") + "$"
}

/** dot(a, b) as a codegen'd scalar — see [[VectorKernels.dot]]. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  import VectorKernels._

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(prettyName, left.dataType)
    if (l.isFailure) l else checkVec(prettyName, right.dataType)
  }

  private lazy val aF = isFloat(left.dataType)
  private lazy val bF = isFloat(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], aF, b.asInstanceOf[ArrayData], bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $clsRef.MODULE$$.dot($a, $aF, $b, $bF);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** cosine(a, b) as a codegen'd scalar — see [[VectorKernels.cosine]]. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  import VectorKernels._

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(prettyName, left.dataType)
    if (l.isFailure) l else checkVec(prettyName, right.dataType)
  }

  private lazy val aF = isFloat(left.dataType)
  private lazy val bF = isFloat(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], aF, b.asInstanceOf[ArrayData], bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $clsRef.MODULE$$.cosine($a, $aF, $b, $bF);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_cosine"
}

/** Unit-L2 projection of a vector (array<double> out). */
case class L2NormalizeExpr(child: Expression) extends UnaryExpression {
  import VectorKernels._

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(prettyName, child.dataType)

  private lazy val cF = isFloat(child.dataType)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.l2normalize(input.asInstanceOf[ArrayData], cF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $clsRef.MODULE$$.l2normalize($c, $cF);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_l2_normalize"
}

/** Packed `bits`-bit random-hyperplane signature of a vector; planes are
  * derived deterministically from (seed, bit, dim) via [[Hashing.planeVal]]
  * — the same family the HOF formulation used, so bucket assignments are
  * unchanged. One native pass over `bits × dim` replaces `bits` interpreted
  * HOF dot products per row.
  */
case class HyperplaneSignatureExpr(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression {
  import VectorKernels._
  require(bits > 0 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(prettyName, child.dataType)

  private lazy val cF = isFloat(child.dataType)

  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(bits)(i => Array.tabulate(dim)(j => Hashing.planeVal(seed, i, j)))

  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneSig(input.asInstanceOf[ArrayData], cF, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $clsRef.MODULE$$.hyperplaneSig($c, $cF, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_signature"
}

/** Column wrappers (Spark 4 classic Column <-> Expression bridge). */
object VectorExprs {
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  def l2Normalize(c: Column): Column =
    GraftBridge.column(L2NormalizeExpr(GraftBridge.expression(c)))

  def hyperplaneSignature(c: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    GraftBridge.column(HyperplaneSignatureExpr(GraftBridge.expression(c), dim, bits, seed))
}
