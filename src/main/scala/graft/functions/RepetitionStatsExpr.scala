package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document REPETITION stats for Gopher-style structural
  * filtering (Rae et al. 2021 §A1.1, the "fraction of characters in
  * duplicate n-grams" family): one fused pass over a token array emitting
  * `[n_toks, total_2grams, distinct_2grams, total_3grams, distinct_3grams,
  * chars_total, chars_in_dup_tokens]`.
  *
  * Complements [[TokenStatsExpr]] (which feeds the top-token/top-bigram
  * CONCENTRATION rules): these counters measure COVERAGE — how much of the
  * document is made of material that repeats anywhere within it, the
  * signature of boilerplate loops and template spam that a single
  * most-frequent-token count misses.
  *
  * Map-only by design: the explode + groupBy(doc, ngram) formulation
  * shuffles every n-gram of the corpus; this shuffles nothing and rides
  * the corpus scan. Sort-based run counting (not hashing) keeps the
  * output exact for the DuckDB hash compare; doc-sized arrays make the
  * O(n log n) irrelevant.
  *
  * Reference scope: repetition filtering is a training-data-pipeline
  * extension (mandated alongside the reference's operator surface), not a
  * reference operator.
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RepetitionStatsExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpr {

  private val space = UTF8String.fromString(" ")

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

  /** Kernel shared by eval and generated code. */
  def compute(tokens: ArrayData): GenericArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // SQL callers may pass arrays with null elements; treat as empty
      val t = tokens.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val g2 = new Array[UTF8String](math.max(n - 1, 0))
    i = 0
    while (i < n - 1) {
      g2(i) = UTF8String.concat(toks(i), space, toks(i + 1))
      i += 1
    }
    val g3 = new Array[UTF8String](math.max(n - 2, 0))
    i = 0
    while (i < n - 2) {
      g3(i) = UTF8String.concat(toks(i), space, toks(i + 1), space, toks(i + 2))
      i += 1
    }
    val sortedToks = toks.clone()
    java.util.Arrays.sort(sortedToks.asInstanceOf[Array[AnyRef]])
    java.util.Arrays.sort(g2.asInstanceOf[Array[AnyRef]])
    java.util.Arrays.sort(g3.asInstanceOf[Array[AnyRef]])
    // run-walk the sorted tokens: total chars + chars in tokens whose
    // within-doc occurrence count is >= 2 (every occurrence counts)
    var charsTotal = 0L
    var charsDup = 0L
    i = 0
    while (i < n) {
      var j = i
      while (j < n && sortedToks(j).equals(sortedToks(i))) j += 1
      val run = j - i
      val c = sortedToks(i).numChars().toLong
      charsTotal += c * run
      if (run >= 2) charsDup += c * run
      i = j
    }
    new GenericArrayData(Array[Any](
      n.toLong,
      g2.length.toLong, distinctCount(g2),
      g3.length.toLong, distinctCount(g3),
      charsTotal, charsDup))
  }

  /** Column wrapper; input is an array<string> of tokens. */
  def repetitionStats(tokens: Column): Column =
    GraftBridge.column(RepetitionStatsExpr(GraftBridge.expression(tokens)))
}
