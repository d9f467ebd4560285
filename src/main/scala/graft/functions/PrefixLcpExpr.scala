package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Common-prefix length of two strings, in Unicode code points — the LCP
  * primitive of the suffix-ranking dedup ([[graft.operators.ExactSubstr]]):
  * adjacent suffixes in suffix-sorted order maximize the longest common
  * prefix, so one codegen'd byte walk per neighbor pair replaces any
  * per-length probing. Byte-wise compare on the UTF-8 encoding (two
  * strings share a code-point prefix iff they share its byte encoding);
  * if the walk stops mid-code-point the partial character is dropped
  * before counting.
  */
object PrefixLcpExprs {

  /** Length (code points) of the longest common prefix of `a` and `b`. */
  def commonPrefixLen(a: Column, b: Column): Column =
    GraftBridge.column(CommonPrefixLenExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** See [[PrefixLcpExprs.commonPrefixLen]]. */
case class CommonPrefixLenExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"common_prefix_len expects (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLenExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CommonPrefixLenExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $cls.MODULE$$.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "common_prefix_len"
}

object CommonPrefixLenExpr {
  def compute(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n && ab(i) == bb(i)) i += 1
    // The walk stopped at a differing byte inside a multi-byte code
    // point: both strings share all bytes before i, so their boundary
    // structure agrees there — back up to the start of the partial
    // character and drop it. (i == n means one string is a byte-prefix
    // of the other; a whole string always ends on a boundary.)
    if (i < n) while (i > 0 && (ab(i) & 0xC0) == 0x80) i -= 1
    var chars = 0
    var j = 0
    while (j < i) {
      if ((ab(j) & 0xC0) != 0x80) chars += 1
      j += 1
    }
    chars
  }
}
