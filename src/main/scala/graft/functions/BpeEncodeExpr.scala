package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document BPE encode counter: returns `[ws_tokens,
  * bpe_tokens]` — whitespace token count and the token count after
  * applying an ordered merge list greedily per word (the standard
  * rank-ordered BPE encode).
  *
  * This replaces a higher-order-function formulation that folded
  * `aggregate(...)` once PER MERGE over every word's symbol array with an
  * array-concat accumulator: O(|word|²) Catalyst-interpreted lambda
  * dispatches per word per merge round (HOFs are CodegenFallback), which
  * made the q119 encode the single most expensive query in the suite
  * (21 s of 162 s at sf0.1). Here the same fold is a tight two-pointer
  * pass over a reused symbol buffer — O(|word| × |merges|), zero
  * allocation beyond the per-word buffers — inside whole-stage codegen.
  *
  * Exact-semantics notes (the DuckDB oracle replays the merge chain, so
  * drift here fails the hash compare):
  *   - words are maximal runs of non-`\s` (Java regex `\s` = ASCII
  *     ` \t\n\x0B\f\r` — NOT Unicode whitespace), matching
  *     `split(text, "\\s+")` + empty filter;
  *   - U+001F/U+001E are stripped BEFORE tokenization (they delimit the
  *     engine-portable pair encoding in the q111 trainer), matching the
  *     HOF form's `translate`; a word that strips to empty vanishes;
  *   - symbols start as CODE POINTS (Java zero-width regex split never
  *     separates surrogate pairs);
  *   - each merge round folds left-to-right with a one-symbol lookbehind:
  *     a token created by a merge is NOT immediately re-eligible as the
  *     left side within the same round (pend resets to null).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_stats expects string, got $other")
  }

  // flattened [l, r, l+r] triples — one flat String[] survives the
  // codegen reference-object round-trip without Scala collection wrappers
  private lazy val flat: Array[String] =
    merges.flatMap { case (l, r) => Seq(l, r, l + r) }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.compute(input.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeEncodeExpr.getClass.getName.stripSuffix("$") + "$"
    val mRef = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.compute($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode_stats"
}

object BpeEncodeExpr {

  // Java regex \s (no UNICODE_CHARACTER_CLASS): exactly these six
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Encode one word in place: `syms(0 until len)` holds the symbols;
    * returns the post-merge symbol count. `out` is a scratch buffer of at
    * least `len` slots.
    */
  private def encodeWord(syms: Array[String], lenIn: Int,
      out: Array[String], flat: Array[String]): Int = {
    var len = lenIn
    var src = syms
    var dst = out
    var m = 0
    while (m < flat.length) {
      val l = flat(m); val r = flat(m + 1); val lr = flat(m + 2)
      var o = 0
      var pend: String = null
      var j = 0
      while (j < len) {
        val x = src(j)
        if (pend == null) pend = x
        else if (pend == l && x == r) { dst(o) = lr; o += 1; pend = null }
        else { dst(o) = pend; o += 1; pend = x }
        j += 1
      }
      if (pend != null) { dst(o) = pend; o += 1 }
      // swap buffers for the next round
      val t = src; src = dst; dst = t
      len = o
      m += 3
    }
    len
  }

  def compute(text: UTF8String, flat: Array[String]): ArrayData = {
    val s = text.toString
    val n = s.length
    var ws = 0L
    var bpe = 0L
    // per-call scratch, grown to the longest word seen
    var syms = new Array[String](16)
    var scratch = new Array[String](16)
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        // collect the word's code points, stripping U+001F/U+001E
        var len = 0
        while (i < n && !isWs(s.charAt(i))) {
          val cp = s.codePointAt(i)
          val w = Character.charCount(cp)
          if (cp != 0x1F && cp != 0x1E) {
            if (len == syms.length) {
              syms = java.util.Arrays.copyOf(syms, len * 2)
              scratch = java.util.Arrays.copyOf(scratch, len * 2)
            }
            syms(len) = s.substring(i, i + w)
            len += 1
          }
          i += w
        }
        if (len > 0) {
          ws += 1
          bpe += encodeWord(syms, len, scratch, flat)
        }
      }
    }
    new GenericArrayData(Array(ws, bpe))
  }
}
