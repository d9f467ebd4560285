package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cumulative-range lookup: map an integer draw r ∈ [0, total) to the
  * value whose cumulative-weight interval contains it — the sampling
  * primitive behind weighted negative sampling (q208): the weight
  * table collapses to a sorted cumulative array shipped once per
  * executor (the BPE-merge-table contract), and each draw resolves by
  * BINARY SEARCH inside whole-stage codegen. The join alternative —
  * a non-equi range join against the weight table — plans as a
  * nested-loop probe per row; at corpus scale the O(log |V|) search
  * IS the operator.
  */
object RangeLookupExprs {

  /** The value of the interval containing `r`: `bounds` are EXCLUSIVE
    * cumulative upper bounds, strictly increasing; out-of-range r
    * throws (a modulo-bounded draw can never reach it).
    */
  def lookup(r: Column, bounds: Seq[Long], values: Seq[String]): Column =
    GraftBridge.column(RangeLookupExpr(
      GraftBridge.expression(r), bounds, values))
}

/** Sorted cumulative table with the binary search. */
final class RangeTable(bounds: Seq[Long], values: Seq[String])
    extends Serializable {
  require(bounds.nonEmpty && bounds.size == values.size,
    s"bounds/values size mismatch: ${bounds.size}/${values.size}")
  require(bounds.zip(bounds.tail).forall(p => p._1 < p._2) && bounds.head > 0,
    "bounds must be strictly increasing positive cumulative sums")
  private val b: Array[Long] = bounds.toArray
  private val v: Array[UTF8String] =
    values.map(UTF8String.fromString).toArray

  def lookup(r: Long): UTF8String = {
    if (r < 0 || r >= b(b.length - 1))
      throw new IllegalArgumentException(
        s"range lookup draw $r outside [0, ${b(b.length - 1)})")
    var lo = 0
    var hi = b.length - 1
    while (lo < hi) { // smallest i with r < b(i)
      val mid = (lo + hi) >>> 1
      if (r < b(mid)) hi = mid else lo = mid + 1
    }
    v(lo)
  }
}

/** See [[RangeLookupExprs.lookup]]. */
case class RangeLookupExpr(child: Expression,
    bounds: Seq[Long], values: Seq[String])
    extends UnaryExpression {

  @transient private lazy val table = new RangeTable(bounds, values)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"range_lookup expects bigint, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    table.lookup(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("rangeTable", table,
      classOf[RangeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $t.lookup($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "range_lookup"
}
