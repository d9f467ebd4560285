package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization of a string — the
  * first step of any text-ingest pipeline: the same visible text can
  * arrive composed ("é" U+00E9) or decomposed ("e"+U+0301) and every
  * downstream exact operation (dedup hashing, n-gram collision, token
  * counting) silently misses matches unless both forms are canonicalized
  * first.
  *
  * Spark has no built-in normalization function, so this is a native
  * codegen Expression over `java.text.Normalizer` (the JDK's ICU-derived
  * implementation). The common case — already-NFC ASCII/Latin text — hits
  * the `Normalizer.isNormalized` fast path and returns the input UTF8String
  * UNCOPIED, so the per-row cost on clean corpora is one quick-check scan,
  * not a recomposition.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalizeExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeExpr {

  def compute(s: UTF8String): UTF8String = {
    // ASCII is closed under NFC: a byte-level scan (no String decode, no
    // allocation) clears the common case — the per-row cost on a clean
    // corpus is this loop alone
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(c)))
}
