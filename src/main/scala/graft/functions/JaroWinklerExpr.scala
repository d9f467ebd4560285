package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Winkler 1990) as a native codegen kernel —
  * the record-linkage comparator Spark lacks (it ships `levenshtein`
  * only): edit distance punishes transposed and shifted characters that
  * human-keyed name/title variants produce constantly, while JW scores
  * proximity-weighted character matches with a common-prefix boost. The
  * missing comparator next to the exact-agreement fields of the
  * Fellegi-Sunter scorer ([[graft.operators.Linkage]]) and the
  * edit-distance verify of q89.
  *
  * Semantics, pinned so the score is CROSS-ENGINE EXACT (the DuckDB
  * oracle's `jaro_winkler_similarity` was fuzz-matched bit-for-bit over
  * 33k random pairs: ASCII, multi-byte UTF-8, and 30-120-byte strings):
  *   - operates on UTF-8 BYTES (a multi-byte code point matches iff all
  *     its bytes match; both engines agree byte-wise)
  *   - match window = max(0, max(|a|,|b|)/2 − 1), greedy left-to-right
  *     first-unused match
  *   - transpositions t = (mismatched matched-byte positions)/2
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, left-associated, computed
  *     only when m > 0; either side empty → 0.0
  *   - Winkler boost only when jaro > 0.7: jw = j + l·0.1·(1−j) with
  *     l = common byte prefix capped at 4
  *
  * Scale: one O(|a|·window) byte walk per pair inside whole-stage
  * codegen — no UDF boundary, no string decode; the two mark buffers
  * are the only allocation. Candidate generation stays the caller's
  * job (prefix blocking — Winkler's own assumption — keeps it
  * equi-join-shaped; see q201).
  */
object JaroWinklerExprs {

  /** Jaro-Winkler similarity of `a` and `b` in [0,1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** See [[JaroWinklerExprs.jaroWinkler]]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JaroWinklerExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $cls.MODULE$$.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerExpr {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = (if (l1 > l2) l1 else l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    var j = (md / l1 + md / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      val cap = if (l1 < l2) (if (l1 < 4) l1 else 4) else (if (l2 < 4) l2 else 4)
      var l = 0
      while (l < cap && s1(l) == s2(l)) l += 1
      j = j + l * 0.1 * (1.0 - j)
    }
    j
  }
}
