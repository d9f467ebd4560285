package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UNIGRAM-LM Viterbi segmentation (Kudo 2018, the SentencePiece
  * unigram model) as a native codegen kernel — the second tokenizer
  * family next to BPE ([[BpeEncodeExpr]]): BPE segments by a learned
  * MERGE ORDER; the unigram model segments by PROBABILITY — each piece
  * carries a cost (−ln p on the micro grid) and a word's tokenization
  * is the minimum-cost path through the piece lattice, found by
  * Viterbi DP in O(|word|·maxPieceLen) per word.
  *
  * Determinism contract (oracle-mirrorable): costs are integer micros;
  * DP scans split points j ascending and replaces only on STRICTLY
  * smaller total cost, so ties resolve to the smallest j — i.e. the
  * longest final piece — identically in any engine. Unsegmentable
  * words throw loudly (cannot happen when the vocab contains every
  * single character, which corpus-estimated vocabs do by
  * construction). Positions are UTF-16 units ≡ code points on BMP
  * text (the [[AhoCorasick]] contract).
  *
  * The vocab is a bounded plan literal (the BPE-merge-table /
  * IVF-centroid discipline) shipped ONCE per executor through the
  * codegen reference mechanism — a single virtual call per row, no
  * fallback, no per-row map building.
  */
object UnigramViterbiExprs {

  /** The min-cost segmentation of `word` as an array of pieces. */
  def segment(c: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Column =
    GraftBridge.column(UnigramViterbiExpr(
      GraftBridge.expression(c), vocab, maxPieceLen))
}

/** Piece-cost lattice with the Viterbi walk. */
final class UnigramLattice(vocab: Seq[(String, Long)], maxPieceLen: Int)
    extends Serializable {
  require(vocab.nonEmpty, "empty vocab")
  require(maxPieceLen >= 1 && maxPieceLen <= 64,
    s"maxPieceLen out of range: $maxPieceLen")
  private val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) =>
      require(p.nonEmpty && p.length <= maxPieceLen,
        s"piece '$p' violates maxPieceLen $maxPieceLen")
      require(c >= 0L, s"negative cost for piece '$p'")
      m.put(p, java.lang.Long.valueOf(c))
    }
    m
  }

  def segment(s: UTF8String): ArrayData = {
    val w = s.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      dp(i) = Long.MaxValue
      bp(i) = -1
      var j = if (i - maxPieceLen > 0) i - maxPieceLen else 0
      while (j < i) {
        if (dp(j) != Long.MaxValue) {
          val c = costs.get(w.substring(j, i))
          if (c != null) {
            val tc = dp(j) + c.longValue()
            // strict <, j ascending: ties keep the SMALLEST j (longest
            // final piece) — the oracle's (cost ASC, j ASC) rank
            if (tc < dp(i)) { dp(i) = tc; bp(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (dp(n) == Long.MaxValue)
      throw new IllegalStateException(
        s"unigram_viterbi: word '$w' is unsegmentable under the vocab — " +
          "a corpus-estimated vocab always contains its single characters")
    var pos = n
    var out = List.empty[Any]
    while (pos > 0) {
      val j = bp(pos)
      out = UTF8String.fromString(w.substring(j, pos)) :: out
      pos = j
    }
    new GenericArrayData(out.toArray)
  }
}

/** See [[UnigramViterbiExprs.segment]]. */
case class UnigramViterbiExpr(child: Expression,
    vocab: Seq[(String, Long)], maxPieceLen: Int)
    extends UnaryExpression {

  @transient private lazy val lattice =
    new UnigramLattice(vocab, maxPieceLen)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    lattice.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lat = ctx.addReferenceObj("unigramLattice", lattice,
      classOf[UnigramLattice].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $lat.segment($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unigram_viterbi"
}
