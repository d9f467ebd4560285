package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Set-similarity kernels over HASHED element sets.
  *
  * The dedup verifiers (MinHash q10, n-gram Jaccard q12) compare candidate
  * pairs by exact Jaccard over shingle/gram sets. Carrying the raw STRING
  * sets through the verification joins shuffles kilobytes per candidate and
  * pays hash-set set-ops per pair; representing each set as a SORTED
  * array<long> of xxhash64 values instead shuffles 8 bytes per element and
  * verifies with an allocation-free linear merge. A 64-bit collision would
  * merge two set elements (Jaccard off by ~1/|set| on that one pair);
  * with |set| ≈ 10³ per document that is a ~10⁻¹³ per-pair event — the same
  * trade the posting-list join already makes, and it cannot produce a
  * sub-threshold FALSE pair beyond that perturbation because verification
  * is still computed on the (hashed) full sets.
  */
object HashedSetExprs {

  /** xxhash64 each string element (seed 42, matching `xxhash64`), sort,
    * dedup. Output is the canonical sorted-set representation consumed by
    * [[SortedLongJaccardExpr]] and [[MinHashSignatureExpr]]'s long mode.
    */
  def hashedSortedSet(c: Column): Column =
    GraftBridge.column(HashedSortedExpr(GraftBridge.expression(c)))

  /** Exact Jaccard of two sorted long arrays (linear merge). */
  def sortedLongJaccard(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongJaccardExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Exact |a ∩ b| of two sorted long arrays (linear merge) — the
    * containment/overlap-coefficient verifier's kernel, where Jaccard's
    * union denominator is the wrong normalizer.
    */
  def sortedLongOverlap(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongOverlapExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** See [[HashedSetExprs.hashedSortedSet]]. */
case class HashedSortedExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_sorted_set expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HashedSortedExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedSortedExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hashed_sorted_set"
}

object HashedSortedExpr {
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      // SQL callers may pass arrays with null elements (the Column-API
      // paths never do) — hash them as the empty string, the same
      // convention TokenStatsExpr uses
      val s = arr.getUTF8String(i)
      hs(i) = XXH64.hashUTF8String(
        if (s == null) UTF8String.EMPTY_UTF8 else s, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedup in place (collisions or duplicate inputs)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    val out = new Array[Any](w)
    i = 0
    while (i < w) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** See [[HashedSetExprs.sortedLongJaccard]]. */
case class SortedLongJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_long_jaccard expects two array<long>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongJaccardExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SortedLongJaccardExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.MODULE$$.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_long_jaccard"
}

object SortedLongJaccardExpr {
  /** |a ∩ b| / |a ∪ b| by linear merge of two sorted unique arrays. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val inter = SortedLongOverlapExpr.compute(a, b)
    val union = a.numElements() + b.numElements() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** See [[HashedSetExprs.sortedLongOverlap]]. */
case class SortedLongOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_long_overlap expects two array<long>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongOverlapExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SortedLongOverlapExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.MODULE$$.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_long_overlap"
}

object SortedLongOverlapExpr {
  /** |a ∩ b| by linear merge of two sorted unique arrays. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}
