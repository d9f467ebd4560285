package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CONTENT-DEFINED CHUNKING (the rsync/LBFS device): split a string at
  * positions where the polynomial hash of the trailing `k` code points
  * satisfies `h % modulus == 0`. Because boundaries depend only on LOCAL
  * content, an insertion early in a document shifts at most the one
  * chunk it lands in — every later chunk re-aligns — which is what makes
  * CDC the storage-dedup unit for near-identical documents at 100 TB
  * where fixed-stride chunks (q132) would all shift and nothing would
  * dedup.
  *
  * Determinism contract (the DuckDB oracle replays it):
  *   - code-point semantics throughout: the hash folds code points
  *     (Java regex `split("")` and DuckDB `string_split(s,'')`+`ascii`
  *     both yield code points, the q15 fingerprint convention), and
  *     boundary positions / chunk slices are code-point indices;
  *   - window hash = fold(cp, acc -> (acc*31 + cp) mod 1e9+7) over the
  *     last k code points (the [[RollingHashExpr]] polynomial, windowed);
  *   - a boundary at position i ends the current chunk AFTER cp i; the
  *     remainder (possibly shorter than k) is the tail chunk; strings
  *     shorter than k are one chunk; empty input → empty array;
  *   - concat(chunks) == input, always.
  *
  * The kernel maintains the window hash with an O(1) rolling update
  * (subtract the outgoing cp·31^(k-1), shift, add the incoming cp — all
  * mod p), so the pass is O(n) per document regardless of k, inside
  * whole-stage codegen. Production CDC (FastCDC etc.) adds min/max
  * chunk bounds, which make the boundary decision stateful; this is the
  * stateless core — the bound logic composes on top without changing
  * the hash contract.
  */
case class CdcChunksExpr(child: Expression, k: Int, modulus: Int)
    extends UnaryExpression {
  require(k >= 1, s"window k must be >= 1, got $k")
  require(modulus >= 2, s"modulus must be >= 2, got $modulus")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunksExpr.compute(input.asInstanceOf[UTF8String], k, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CdcChunksExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.compute($c, $k, $modulus);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunksExpr {
  private val P = 1000000007L

  def compute(s: UTF8String, k: Int, modulus: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length // UTF-16 length; walk below is by code point
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // code-point array (one pass; most texts are BMP so cps.length ~ n)
    val cps = new Array[Int](str.codePointCount(0, n))
    // utf16 offset of each code point, +1 sentinel for slicing
    val offs = new Array[Int](cps.length + 1)
    var i = 0
    var cp = 0
    while (i < n) {
      cps(cp) = str.codePointAt(i)
      offs(cp) = i
      i += Character.charCount(cps(cp))
      cp += 1
    }
    offs(cp) = n
    val m = cps.length
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (m >= k) {
      // pow = 31^(k-1) mod p for the O(1) outgoing-cp removal
      var pow = 1L
      var j = 1
      while (j < k) { pow = pow * 31L % P; j += 1 }
      var h = 0L
      j = 0
      while (j < k) { h = (h * 31L + cps(j)) % P; j += 1 }
      var start = 0 // chunk start, code-point index
      var end = k - 1 // window end, code-point index
      while (end < m) {
        if (h % modulus == 0) {
          chunks += UTF8String.fromString(
            str.substring(offs(start), offs(end + 1)))
          start = end + 1
        }
        if (end + 1 < m) {
          // roll: drop cps(end-k+1), admit cps(end+1)
          val x = (h - cps(end - k + 1) * pow % P + P) % P
          h = (x * 31L + cps(end + 1)) % P
        }
        end += 1
      }
      if (start < m) {
        chunks += UTF8String.fromString(str.substring(offs(start), n))
      }
    } else {
      chunks += s.clone()
    }
    new GenericArrayData(chunks.toArray)
  }

  def cdcChunks(c: Column, k: Int, modulus: Int): Column =
    GraftBridge.column(CdcChunksExpr(GraftBridge.expression(c), k, modulus))
}
