package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash of a token array: bit i of the fingerprint is the
  * sign of Σ over tokens of ±1 depending on bit i of the token's xxhash64.
  *
  * Replaces the interpreted formulation (an `aggregate` carrying a 64-slot
  * counter array with a `zip_with` per token — 64 boxed expression
  * evaluations per token, all CodegenFallback) with one tight loop. Token
  * hashing uses Spark's own XXH64 with the `xxhash64` default seed (42), so
  * fingerprints are BIT-IDENTICAL to the HOF formulation
  * ([[graft.operators.Dedup.simhashOf]] over `xxhash64(token)`) — asserted
  * in DedupSpec.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHashExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

object SimHashExpr {

  /** Kernel shared by eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // null elements (SQL callers only) hash as the empty string — the
      // TokenStatsExpr convention
      val s0 = tokens.getUTF8String(i)
      val s = if (s0 == null) UTF8String.EMPTY_UTF8 else s0
      val h = XXH64.hashUTF8String(s, 42L) // xxhash64's default seed
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column wrapper; input is an array<string> of tokens. */
  def simhash(tokens: Column): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(tokens)))
}
