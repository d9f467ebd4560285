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
  * pass: for an array<string> of shingles, returns array<long> of length
  * `numHashes` where slot j = min over shingles of
  * (a_j * baseHash(s) + b_j) mod (2^31-1).
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
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got $other")
    }

  // universal-hash coefficients, deterministic in (seed, j)
  private lazy val as: Array[Long] = Array.tabulate(numHashes)(j => Hashing.coef(seed, 2 * j))
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(j => Hashing.coef(seed, 2 * j + 1))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = MinHashSignatureExpr.compute(arr, as, bs, numHashes)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    val cls = MinHashSignatureExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""long[] mins = $cls.MODULE$$.compute($c, $aRef, $bRef, $numHashes);
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
      val s = arr.getUTF8String(i)
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

  /** Column wrapper (Spark 4 classic Column <-> Expression bridge). */
  def minhashSignature(c: Column, numHashes: Int, seed: Long = 7L): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinHashSignatureExpr(org.apache.spark.sql.GraftBridge.expression(c), numHashes, seed))
}
