package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via AHO-CORASICK (Aho & Corasick
  * 1975) — the blocklist / phrase-filter primitive of a corpus
  * pipeline: ONE left-to-right pass over each document counts ALL
  * (including overlapping) occurrences of every pattern, however many
  * patterns there are. The naive alternative — one `locate`/`regexp`
  * pass per pattern — scans the corpus |patterns| times; at 100 TB the
  * corpus pass is the cost, so the automaton's single pass is the
  * operator. The pattern list is a PLAN LITERAL (bounded, from the
  * filter config); the automaton builds once per executor and ships via
  * the codegen reference mechanism, never per row.
  *
  * Matching runs over UTF-16 units, which equals code-point semantics
  * on BMP text (a supplementary character can never equal a BMP unit,
  * so false matches cannot arise; counts index by pattern as given).
  */
object AhoCorasickExprs {

  /** counts[i] = occurrences (overlapping included) of `patterns(i)`. */
  def matchCounts(c: Column, patterns: Seq[String]): Column =
    GraftBridge.column(AhoCorasickCountsExpr(
      GraftBridge.expression(c), patterns))
}

/** Classic goto/fail/output automaton over a bounded pattern list. */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")
  // nodes as growable parallel structures; maps per node (pattern
  // alphabets are tiny relative to text, lookup stays O(1)-ish)
  private val next =
    scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    p.foreach { ch =>
      s = next(s).getOrElseUpdate(ch, {
        next += scala.collection.mutable.Map.empty[Char, Int]
        fail += 0
        ends += Nil
        next.size - 1
      })
    }
    ends(s) = pi :: ends(s)
  }
  // BFS failure links; ends accumulate the suffix-link outputs so the
  // scan never walks output chains per position
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      ends(u) = ends(u) ::: ends(fail(u))
      next(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(v) = if (next(f).contains(ch) && next(f)(ch) != v)
          next(f)(ch) else 0
        queue += v
      }
    }
  }
  private val nextArr: Array[Map[Char, Int]] = next.map(_.toMap).toArray
  private val failArr: Array[Int] = fail.toArray
  private val endsArr: Array[Array[Int]] = ends.map(_.toArray).toArray
  private val nPatterns = patterns.size

  def counts(s: UTF8String): ArrayData = {
    val text = s.toString
    val out = new Array[Long](nPatterns)
    var state = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (state != 0 && !nextArr(state).contains(ch))
        state = failArr(state)
      state = nextArr(state).getOrElse(ch, 0)
      val e = endsArr(state)
      var j = 0
      while (j < e.length) { out(e(j)) += 1L; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** See [[AhoCorasickExprs.matchCounts]]. */
case class AhoCorasickCountsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val automaton = new AhoCorasick(patterns)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"aho_corasick_counts expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    automaton.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the automaton ships ONCE as a codegen reference object — the
    // generated row loop is a single virtual call, no fallback
    val ac = ctx.addReferenceObj("ahoCorasick", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ac.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "aho_corasick_counts"
}
