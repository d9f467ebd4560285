package graft.functions

import graft.operators.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a full MinHash signature in one
  * pass: returns array<long> of length `numHashes` where slot j = min over
  * set elements of (a_j * baseHash(e) + b_j) mod (2^31-1).
  *
  * Input is either an array<string> of shingles (base hash = murmur3 of the
  * bytes) or an array<long> of ALREADY-HASHED shingles from
  * [[HashedSortedExpr]] (base hash = the long folded into [0, 2^31-1)) —
  * the long mode lets the dedup pipeline carry one compact hashed-set
  * column for signature AND verification.
  *
  * This replaces a doubly-nested higher-order-function formulation: Spark
  * evaluates HOF lambdas interpreted (CodegenFallback) with per-element
  * Catalyst dispatch and boxing — ~64×|shingles| interpreted expression
  * evaluations per row. Here the same arithmetic is a tight primitive
  * loop (eval) or generated Java (doGenCode), keeping the projection
  * inside whole-stage codegen.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string> or array<long>, got $other")
    }

  private lazy val longInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  // universal-hash coefficients, deterministic in (seed, j)
  private lazy val as: Array[Long] = Array.tabulate(numHashes)(j => Hashing.coef(seed, 2 * j))
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(j => Hashing.coef(seed, 2 * j + 1))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out =
      if (longInput) MinHashSignatureExpr.computeFromLongs(arr, as, bs, numHashes)
      else MinHashSignatureExpr.compute(arr, as, bs, numHashes)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    val cls = MinHashSignatureExpr.getClass.getName.stripSuffix("$") + "$"
    val kernel = if (longInput) "computeFromLongs" else "compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"""long[] mins = $cls.MODULE$$.$kernel($c, $aRef, $bRef, $numHashes);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(mins);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignatureExpr {
  private val P: Long = Hashing.P31

  /** Tight-loop kernel shared by eval and generated code. */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long], k: Int): Array[Long] = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null elements (SQL callers only) hash as the empty string — the
      // TokenStatsExpr convention
      val s0 = arr.getUTF8String(i)
      val s = if (s0 == null) UTF8String.EMPTY_UTF8 else s0
      // base hash into [0, 2^31-1): murmur3 of the string bytes
      val h = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      val x = (h.toLong & 0x7fffffffL) % P
      var j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  /** Kernel for pre-hashed (array<long>) shingle sets. */
  def computeFromLongs(arr: ArrayData, as: Array[Long], bs: Array[Long], k: Int): Array[Long] = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = (arr.getLong(i) & 0x7fffffffffffffffL) % P
      var j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  /** Column wrapper (Spark 4 classic Column <-> Expression bridge). */
  def minhashSignature(c: Column, numHashes: Int, seed: Long = 7L): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSignatureExpr(org.apache.spark.sql.GraftBridge.expression(c), numHashes, seed))
}
