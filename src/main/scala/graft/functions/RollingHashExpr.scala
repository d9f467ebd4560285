package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash of a string:
  * fp = fold(units, 0, (acc, u) -> (acc * 31 + u) mod 1e9+7).
  *
  * Bit-identical to the interpreted formulation
  * `aggregate(split(s, ""), 0L, (acc, ch) -> pmod(acc*31 + ascii(ch), p))`:
  * Spark's `split(s, "")` yields one UTF-16 unit per element and `ascii`
  * returns that unit's code point, so the kernel folds over `charAt` units
  * (asserted in TextAnalysisSpec). Replaces one interpreted Catalyst tree
  * evaluation per CHARACTER with a single fused loop.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingHashExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHashExpr {
  private val P = 1000000007L

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31L + str.charAt(i)) % P
      i += 1
    }
    acc
  }

  def rollingHash(c: Column): Column =
    GraftBridge.column(RollingHashExpr(GraftBridge.expression(c)))
}
