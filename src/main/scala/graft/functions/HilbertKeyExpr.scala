package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D integer point — the data-layout key with
  * strictly better locality than the z-order interleave (q134): every
  * step along the curve moves exactly one grid cell, so a contiguous
  * d-range maps to a compact 2-D region with no z-curve "seam jumps",
  * which is why modern table formats offer hilbert-clustering next to
  * z-ordering for multi-dimensional file skipping.
  *
  * The classic per-level rotate-and-accumulate conversion (Hilbert 1891;
  * the standard xy→d iterative formulation): for each level s = 2^(b-1)
  * … 1, accumulate s²·((3·rx) XOR ry) and rotate the quadrant so the
  * sub-curve is always traversed in canonical orientation. Pure integer
  * arithmetic — the SQL oracle generates the same 21 levels as chained
  * CASE expressions from the same parameters, so the engines cannot
  * drift.
  */
case class HilbertKeyExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects two longs, got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertKeyExpr.compute(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HilbertKeyExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.MODULE$$.compute($a, $b, $bits);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_key"
}

object HilbertKeyExpr {

  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(HilbertKeyExpr(
      GraftBridge.expression(x.cast("long")),
      GraftBridge.expression(y.cast("long")), bits))

  /** xy → d on the 2^bits × 2^bits grid. Coordinates above the grid are
    * masked to `bits` (the caller picks bits to cover the key domain).
    */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // drop the consumed bit FIRST so the reflection s-1-x operates on
      // clean sub-grid coordinates in [0, s) — reflecting with the level
      // bit still set would go negative (the classic footgun in the
      // textbook C version, where it silently works via two's-complement
      // masking); then rotate the quadrant to canonical orientation
      x &= s - 1
      y &= s - 1
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
