package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token repetition stats for corpus quality filtering:
  * `[n_toks, n_distinct, top_token_c, top_bigram_c]` of a token array in one
  * fused pass.
  *
  * These four counters power the Gopher/C4-style repetition rules
  * (type-token ratio, most-frequent-token fraction, most-frequent-bigram
  * fraction) as a MAP-ONLY column expression — at 100 TB the alternative
  * explode + groupBy(doc, token) formulation shuffles every token of the
  * corpus, where this shuffles nothing. The explode formulation survives in
  * the oracle SQL and in TextAnalysisSpec as the cross-check.
  *
  * Counting is sort-based (run lengths over a sorted copy), not hash-based:
  * exactness is required for the DuckDB hash compare and doc-sized arrays
  * make the O(n log n) irrelevant.
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenStatsExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_stats"
}

object TokenStatsExpr {

  /** Longest run length in a sorted array (0 for empty input). */
  private def maxRun(sorted: Array[UTF8String]): Long = {
    if (sorted.isEmpty) return 0L
    var best = 1L
    var run = 1L
    var i = 1
    while (i < sorted.length) {
      if (sorted(i).equals(sorted(i - 1))) {
        run += 1
        if (run > best) best = run
      } else run = 1L
      i += 1
    }
    best
  }

  private def distinctCount(sorted: Array[UTF8String]): Long = {
    if (sorted.isEmpty) return 0L
    var nd = 1L
    var i = 1
    while (i < sorted.length) {
      if (!sorted(i).equals(sorted(i - 1))) nd += 1
      i += 1
    }
    nd
  }

  private val space = UTF8String.fromString(" ")

  /** Kernel shared by eval and generated code. */
  def compute(tokens: ArrayData): GenericArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // SQL callers may pass arrays with null elements; count them as
      // empty tokens rather than NPE-ing inside sort/concat
      val t = tokens.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    // bigrams in original order, BEFORE sorting the token copy
    val bigrams = new Array[UTF8String](math.max(n - 1, 0))
    i = 0
    while (i < n - 1) {
      bigrams(i) = UTF8String.concat(toks(i), space, toks(i + 1))
      i += 1
    }
    val sortedToks = toks.clone()
    java.util.Arrays.sort(sortedToks.asInstanceOf[Array[AnyRef]])
    java.util.Arrays.sort(bigrams.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(Array[Any](
      n.toLong, distinctCount(sortedToks), maxRun(sortedToks), maxRun(bigrams)))
  }

  /** Column wrapper; input is an array<string> of tokens. */
  def tokenStats(tokens: Column): Column =
    GraftBridge.column(TokenStatsExpr(GraftBridge.expression(tokens)))
}
