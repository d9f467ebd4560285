package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Fixed-grid difference hash (dHash) over an opaque media `binary`
  * column — the perceptual fingerprint of the multimodal dedup family.
  * The classic image dHash resizes to a (G+1)×G grey grid and hashes
  * adjacent-cell brightness comparisons; with media bytes opaque in
  * this container (Multimodal.scala's stub-decode contract), the same
  * construction runs on the byte signal directly: the payload is
  * partitioned into 64 fixed cells, each cell's integer mean brightness
  * is `sum(bytes) div count`, and bit b (b = 0..62) is set iff
  * `mean(b+1) > mean(b)` — a 63-bit non-negative fingerprint (bit 63
  * deliberately unused so the value stays positive in every engine's
  * signed BIGINT). A real deployment swaps the byte signal for decoded
  * grey pixels; the grid, integer means, and comparison bits — the
  * parts that make dHash near-dup-stable — are unchanged.
  *
  * Stability contract: a localized byte change perturbs exactly one
  * cell (cells partition the payload), so it flips at most the two
  * bits comparing that cell to its neighbors — Hamming distance <= 2
  * per localized edit, which is what Hamming-band blocking exploits.
  *
  * Exactness: cell bounds are `(j*n) div 64`; all arithmetic is
  * integer, so the oracle replays the hash bit-for-bit with DuckDB
  * integer ops on the hex-decoded payload.
  */
case class DHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash expects binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    DHashExpr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DHashExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "dhash"
}

object DHashExpr {

  val Cells = 64

  /** Kernel shared by eval and generated code: 64 integer cell means
    * over the fixed grid, 63 adjacent-comparison bits.
    */
  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val means = new Array[Long](Cells)
    var j = 0
    while (j < Cells) {
      // non-negative, so / == floor == SQL div; Long math: no overflow
      // at any realistic payload size
      val lo = (j.toLong * n / Cells).toInt
      val hi = ((j + 1).toLong * n / Cells).toInt
      if (hi > lo) {
        var s = 0L
        var i = lo
        while (i < hi) { s += (bytes(i) & 0xff); i += 1 }
        means(j) = s / (hi - lo)
      } // empty cell (n < 64): mean 0 by rule, mirrored in the oracle
      j += 1
    }
    var h = 0L
    var b = 0
    while (b < Cells - 1) {
      if (means(b + 1) > means(b)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Column wrapper: 63-bit dHash of a binary payload. */
  def dhash(payload: Column): Column =
    GraftBridge.column(DHashExpr(GraftBridge.expression(payload)))
}
