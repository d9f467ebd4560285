package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character-k-shingles of an (already normalized) string:
  * semantically identical to
  * `array_distinct(transform(sequence(1, greatest(len-k+1, 1)), i -> substr(s, i, k)))`
  * — same first-occurrence order, same short-text behavior — but a single
  * tight loop instead of one interpreted Catalyst expression tree
  * evaluation per shingle position (HOFs are CodegenFallback).
  */
case class CharShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"shingle width must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CharShinglesExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharShinglesExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.compute($c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_shingles"
}

object CharShinglesExpr {

  /** Kernel shared by eval and generated code. Uses code-point semantics
    * (`substringSQL`) to match Spark's `substr` exactly.
    */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val len = s.numChars()
    val n = math.max(len - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 1
    while (i <= n) {
      seen.add(s.substringSQL(i, k))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper — input must already be normalized. */
  def charShingles(normalized: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      CharShinglesExpr(org.apache.spark.sql.GraftBridge.expression(normalized), k))
}
