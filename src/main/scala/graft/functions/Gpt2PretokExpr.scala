package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style regex pretokenization (Radford et al. 2019; the split
  * every BPE-family tokenizer applies before merges):
  * {{{ 's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+ }}}
  * The `\s+(?!\S)` alternative needs LOOKAHEAD — not expressible in RE2
  * (DuckDB) and costly to backtrack per row in java.util.regex — so this
  * is a native codegen Expression implementing the identical
  * leftmost-first match as a single hand-rolled scan: no backtracking,
  * no Pattern allocation, one pass per row. Parity with the literal
  * `java.util.regex` pattern (the local reference implementation) is
  * asserted per-document by the q187 gate's in-band flag and the spec.
  *
  * Semantics follow the JAVA pattern exactly (the reference we can run
  * locally): `\s` is the ASCII class [ \t\n\f\r] (so U+00A0 falls
  * into the "other" run), `\p{L}`/`\p{N}` are the Unicode letter/number
  * categories, contractions are case-sensitive with the ASCII
  * apostrophe. Effect of the lookahead: an interior whitespace run of
  * length n splits as (n−1 chars) + the last char glued onto the next
  * token when it is a plain space; a run at end-of-input stays whole.
  */
case class Gpt2PretokExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gpt2_pretokenize expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Gpt2PretokExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Gpt2PretokExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gpt2_pretokenize"
}

object Gpt2PretokExpr {

  // java.util.regex default \s — ASCII only
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def isL(cp: Int): Boolean = Character.isLetter(cp)

  private def isN(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** The scanner on a plain String — shared by the expression and the
    * spec's direct calls.
    */
  def split(s: String): Array[String] = {
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var tokEnd = -1
      // 1) contractions, in pattern order (leftmost-first; mutually
      //    exclusive by their first letter anyway)
      if (c == '\'' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') tokEnd = i + 2
        else if (i + 2 < n) {
          val c2 = s.charAt(i + 2)
          if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
            (c1 == 'l' && c2 == 'l')) tokEnd = i + 3
        }
      }
      if (tokEnd < 0) {
        // 2) ` ?\p{L}+` / ` ?\p{N}+` / ` ?[^\s\p{L}\p{N}]+`: one optional
        //    literal space, then a greedy class run
        val k = if (c == ' ' && i + 1 < n) i + 1 else i
        if (k < n) {
          val cp = s.codePointAt(k)
          val cls = if (isL(cp)) 0 else if (isN(cp)) 1
          else if (!isWs(s.charAt(k))) 2 else -1
          if (cls >= 0) {
            var j = k
            var done = false
            while (!done && j < n) {
              val p = s.codePointAt(j)
              val in = cls match {
                case 0 => isL(p)
                case 1 => isN(p)
                case _ => !isL(p) && !isN(p) &&
                  (Character.charCount(p) > 1 || !isWs(s.charAt(j)))
              }
              if (in) j += Character.charCount(p) else done = true
            }
            tokEnd = j
          }
        }
      }
      if (tokEnd < 0) {
        // 3) whitespace runs: `\s+(?!\S)` (backtracks to leave the last
        //    ws char for the next token when followed by non-space),
        //    else `\s+`
        var j = i
        while (j < n && isWs(s.charAt(j))) j += 1
        tokEnd =
          if (j == n) j // run at end-of-input stays whole
          else if (j - i >= 2) j - 1 // leave the last ws char
          else j // single non-space-adjacent ws char
      }
      out += s.substring(i, tokEnd)
      i = tokEnd
    }
    out.toArray
  }

  def compute(s: UTF8String): GenericArrayData =
    new GenericArrayData(
      split(s.toString).map(t => UTF8String.fromString(t): Any))

  /** The LOCAL REFERENCE implementation: the literal GPT-2 pattern,
    * lookahead and all, via java.util.regex backtracking. Exists only to
    * validate [[split]] — the q187 gate's parity flag and the spec both
    * compare against it per document.
    */
  private lazy val RefPattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  def refSplit(s: String): Array[String] = {
    val m = RefPattern.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  def gpt2Pretokenize(c: Column): Column =
    GraftBridge.column(Gpt2PretokExpr(GraftBridge.expression(c)))
}
