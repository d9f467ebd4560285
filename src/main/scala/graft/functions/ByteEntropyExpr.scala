package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy over the UTF-8 BYTES of a string —
  * `[n_bytes, n_distinct_bytes, entropy_nats]` in one fused pass. The
  * gibberish/compression detector of corpus QA: natural language sits in a
  * narrow entropy band (~2.5–4.3 nats/byte for English), while
  * base64/binary spill (≈ log 64 / log 256 ≈ 4.16 / 5.5) and repeated
  * padding (≈ 0) fall outside it.
  *
  * Bytes, not code points: defined for any input without decoding, and the
  * 256-slot counter keeps the kernel allocation-free. The entropy sum runs
  * in fixed slot order (0..255), so results are bit-deterministic.
  */
case class ByteEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_entropy expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ByteEntropyExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ByteEntropyExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "byte_entropy"
}

object ByteEntropyExpr {

  /** Kernel shared by eval and generated code. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var distinct = 0L
    var entropy = 0.0
    if (n > 0) {
      var b = 0
      while (b < 256) {
        val c = counts(b)
        if (c > 0) {
          distinct += 1
          val p = c.toDouble / n
          entropy -= p * math.log(p)
        }
        b += 1
      }
    }
    new GenericArrayData(Array[Any](n.toDouble, distinct.toDouble, entropy))
  }

  /** Column wrapper. */
  def byteEntropy(text: Column): Column =
    GraftBridge.column(ByteEntropyExpr(GraftBridge.expression(text)))
}
