package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-grams of an (already normalized, single-space
  * separated) string: semantically identical to
  * `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)), i ->
  * array_join(slice(toks, i+1, n), " ")))` over `toks = split(s, " ")` —
  * same first-occurrence order, same short-text behavior (texts with fewer
  * than n tokens yield one gram of all tokens) — but one tight loop instead
  * of an interpreted Catalyst tree evaluation per gram position.
  */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n-gram width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgramsExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordNgramsExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.compute($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgramsExpr {

  /** Kernel shared by eval and generated code. Splitting on the literal
    * single space matches `split(s, " ")` on normalized text (the space is
    * a single byte in UTF-8, so a Java split is exact).
    */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val toks = s.toString.split(" ", -1)
    val last = math.max(toks.length - n, 0)
    val seen = new java.util.LinkedHashSet[UTF8String]((last + 1) * 2)
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper — input must already be normalized. */
  def wordNgrams(normalized: Column, n: Int): Column =
    GraftBridge.column(WordNgramsExpr(GraftBridge.expression(normalized), n))
}
