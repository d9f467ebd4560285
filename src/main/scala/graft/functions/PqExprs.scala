package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) for
  * [[graft.operators.Similarity.pqTopK]].
  *
  * A d-dim vector splits into `m` subvectors of `d/m` dims; each
  * subvector is quantized to its nearest (L2) codeword of a per-subspace
  * codebook with `ksub` entries. With ksub <= 16 and m <= 16 the whole
  * code packs into ONE long (4 bits per subspace) — an 8-byte column
  * replaces a 256-byte embedding in the scan that matters. Scoring
  * against a probe is asymmetric-distance computation (ADC): the probe
  * precomputes dot(probe_sub, codeword) for all m×ksub codewords once,
  * and each corpus row costs m table lookups instead of d multiplies.
  */
object PqExprs {

  /** Pack the child vector (array<double>, length m*dsub) into a PQ code
    * long. `codebook` is flattened [mi][j][t] -> mi*ksub*dsub + j*dsub + t.
    * Nearest codeword by L2; ties take the lowest index (deterministic).
    */
  def pqEncode(c: Column, codebook: Array[Double], m: Int, ksub: Int,
      dsub: Int): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(c), codebook, m, ksub, dsub))

  /** ADC score: sum over subspaces of lut[mi*ksub + code_nibble(mi)]. */
  def adcScore(code: Column, lut: Column, m: Int, ksub: Int): Column =
    GraftBridge.column(AdcLookupExpr(GraftBridge.expression(code),
      GraftBridge.expression(lut), m, ksub))
}

/** See [[PqExprs.pqEncode]]. */
case class PqEncodeExpr(child: Expression, codebook: Array[Double],
    m: Int, ksub: Int, dsub: Int) extends UnaryExpression {
  require(m >= 1 && m <= 16, s"m must be in [1,16], got $m")
  require(ksub >= 1 && ksub <= 16, s"ksub must be in [1,16], got $ksub")
  require(codebook.length == m * ksub * dsub,
    s"codebook length ${codebook.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PqEncodeExpr.compute(input.asInstanceOf[ArrayData], codebook, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqEncodeExpr.getClass.getName.stripSuffix("$") + "$"
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.compute($c, $cbRef, $m, $ksub, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncodeExpr {
  def compute(v: ArrayData, cb: Array[Double], m: Int, ksub: Int,
      dsub: Int): Long = {
    var code = 0L
    var mi = 0
    while (mi < m) {
      val vOff = mi * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ksub) {
        val cOff = (mi * ksub + j) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v.getDouble(vOff + t) - cb(cOff + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      code |= best.toLong << (4 * mi)
      mi += 1
    }
    code
  }
}

/** See [[PqExprs.adcScore]]. */
case class AdcLookupExpr(left: Expression, right: Expression, m: Int,
    ksub: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_score expects (long, array<double>), got $other")
    }

  override def nullSafeEval(code: Any, lut: Any): Any =
    AdcLookupExpr.compute(code.asInstanceOf[Long],
      lut.asInstanceOf[ArrayData], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AdcLookupExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.MODULE$$.compute($a, $b, $m, $ksub);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_score"
}

object AdcLookupExpr {
  def compute(code: Long, lut: ArrayData, m: Int, ksub: Int): Double = {
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val j = ((code >>> (4 * mi)) & 0xfL).toInt
      s += lut.getDouble(mi * ksub + j)
      mi += 1
    }
    s
  }
}
