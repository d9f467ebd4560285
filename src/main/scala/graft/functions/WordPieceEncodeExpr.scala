package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document WordPiece encode counter: returns `[ws_tokens,
  * wp_tokens, unk_words]` — whitespace token count, the token count
  * after greedy longest-match-first segmentation against a fixed
  * vocabulary (Schuster & Nakajima 2012; the BERT tokenizer's encode
  * rule), and how many words failed to segment.
  *
  * Encode semantics (the DuckDB oracle replays the greedy walk, so any
  * drift fails the hash compare):
  *   - words are maximal runs of non-`\s` (Java regex `\s` — ASCII
  *     ` \t\n\x0B\f\r`), matching `split(text, "\\s+")` + empty filter
  *     (the q119 BPE encoder's word rule);
  *   - at each position the LONGEST vocabulary piece wins, trying
  *     `maxSub` code points down to 1; pieces at position > 0 match
  *     with the `##` continuation prefix;
  *   - no backtracking: if no piece matches at some position the WHOLE
  *     word becomes one `[UNK]` token (`wp_tokens += 1`,
  *     `unk_words += 1`) — the reference WordPiece behavior;
  *   - positions advance by CODE POINTS (a supplementary character is
  *     one symbol, never half a surrogate pair).
  *
  * One tight pass per row inside whole-stage codegen; the vocabulary
  * rides as a broadcast-referenced hash set, so lookups are O(1) and
  * the expression is O(Σ|word| × maxSub) per document with zero
  * shuffle — the map-only token-counter shape of q119.
  */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[String],
    maxSub: Int) extends UnaryExpression {

  require(maxSub >= 1 && maxSub <= 16, s"maxSub out of range: $maxSub")
  require(vocab.nonEmpty, "empty wordpiece vocabulary")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode_stats expects string, got $other")
  }

  // one shared lookup structure per plan — survives the codegen
  // reference-object round-trip as a plain java.util.HashSet
  private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    WordPieceEncodeExpr.compute(input.asInstanceOf[UTF8String], set, maxSub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = WordPieceEncodeExpr.getClass.getName.stripSuffix("$") + "$"
    val vRef = ctx.addReferenceObj("wpVocab", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.compute($c, $vRef, $maxSub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_encode_stats"
}

object WordPieceEncodeExpr {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Greedy longest-match token count of `s(start until end)`; returns
    * -1 when the word cannot be segmented (→ one [UNK]).
    */
  private def encodeWord(s: String, start: Int, end: Int,
      set: java.util.HashSet[String], maxSub: Int): Int = {
    var pos = start
    var cnt = 0
    val sb = new java.lang.StringBuilder(maxSub + 2)
    while (pos < end) {
      // candidate end offsets by code point, longest first
      var k = 0
      var off = pos
      val ends = new Array[Int](maxSub)
      while (k < maxSub && off < end) {
        off += Character.charCount(s.codePointAt(off))
        ends(k) = off
        k += 1
      }
      var matched = -1
      var c = k - 1
      while (c >= 0 && matched < 0) {
        sb.setLength(0)
        if (pos > start) sb.append("##")
        sb.append(s, pos, ends(c))
        if (set.contains(sb.toString)) matched = ends(c)
        c -= 1
      }
      if (matched < 0) return -1
      pos = matched
      cnt += 1
    }
    cnt
  }

  def compute(text: UTF8String, set: java.util.HashSet[String],
      maxSub: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    var ws = 0L
    var wp = 0L
    var unk = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        ws += 1
        val c = encodeWord(s, start, i, set, maxSub)
        if (c < 0) { wp += 1; unk += 1 } else wp += c
      }
    }
    new GenericArrayData(Array(ws, wp, unk))
  }
}
