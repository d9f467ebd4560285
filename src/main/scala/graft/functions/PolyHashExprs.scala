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

/** ENGINE-INDEPENDENT polynomial string hashing, and the winnowing
  * fingerprint selector built on it.
  *
  * The xxhash64 kernels (WindowHashExprs, HashedSetExprs) are the fast
  * path for operators whose OUTPUT doesn't expose hash values — the
  * oracle recomputes their results from the strings. Operators that emit
  * hash values as part of their contract (document fingerprints, DSIR
  * feature buckets) need a hash both engines can compute: the classic
  * base-31 polynomial over Unicode code points, mod the prime 1e9+7 —
  * in DuckDB it is `list_reduce(list_prepend(0, list_transform(
  * string_split(s, ''), c -> ascii(c))), (acc, x) -> (acc*31+x) %
  * 1000000007)` (the q15 fingerprint convention), here it is a fused
  * codegen'd kernel. acc stays < 2^30, so acc*31+cp < 2^36 — no overflow
  * in either engine's BIGINT arithmetic.
  *
  * NOT the same fold as [[RollingHashExpr]], deliberately: rolling_hash
  * iterates UTF-16 units (`charAt` — mirroring Spark's own
  * `split(s,"")`/`ascii` SQL semantics, its parity contract), while this
  * family iterates Unicode CODE POINTS — mirroring DuckDB's
  * `string_split(s,'')`/`ascii`, which splits by code point. The two
  * agree on all BMP text and diverge exactly on surrogate pairs; an
  * oracle built on DuckDB string functions needs the code-point fold.
  *
  * Winnowing (Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms
  * for Document Fingerprinting", SIGMOD 2003) selects from the
  * per-position k-gram hash sequence the minimum of every w-window,
  * rightmost occurrence on ties — the classic guarantee that any shared
  * substring of length >= k + w - 1 yields a shared fingerprint, while
  * keeping ~2/(w+1) of all k-gram hashes. The MOSS primitive for
  * plagiarism / near-dup detection.
  */
object PolyHashExprs {

  val Mod: Long = 1000000007L
  val Base: Long = 31L

  /** Base-31 polynomial hash (mod 1e9+7) of the whole string. */
  def polyHash(c: Column): Column =
    GraftBridge.column(PolyHashExpr(GraftBridge.expression(c)))

  /** Per-position k-gram polynomial hashes: element i (0-based) is the
    * hash of the k code points starting at code-point index i; empty
    * array when the string has fewer than k code points.
    */
  def polyWindowHashes(c: Column, k: Int): Column =
    GraftBridge.column(PolyWindowHashExpr(GraftBridge.expression(c), k))

  /** Winnowing selection over a k-gram hash array: the distinct
    * (hash, position) fingerprints, each encoded as `hash * 1048576 +
    * pos` (pos = 1-based k-gram index, bounded by the 2^20 code-point
    * document limit), sorted ascending. Empty when fewer than w hashes.
    */
  def winnowSelect(hashes: Column, w: Int): Column =
    GraftBridge.column(WinnowSelectExpr(GraftBridge.expression(hashes), w))

  /** Position multiplier in the encoded fingerprint: documents are
    * bounded at 2^20 code points (a 1 MB+ text should be chunked long
    * before fingerprinting — q132 docChunks is the upstream operator).
    */
  val PosEncode: Long = 1048576L
}

/** See [[PolyHashExprs.polyHash]]. */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PolyHashExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "poly_hash"
}

object PolyHashExpr {
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * PolyHashExprs.Base + cp) % PolyHashExprs.Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** See [[PolyHashExprs.polyWindowHashes]]. */
case class PolyWindowHashExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_window_hashes expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PolyWindowHashExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PolyWindowHashExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "poly_window_hashes"
}

object PolyWindowHashExpr {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    // code points, decoded once
    val n = str.codePointCount(0, str.length)
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var i = 0
    var ci = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(ci) = cp
      ci += 1
      i += Character.charCount(cp)
    }
    // O(n*k): k is small (8 in the fingerprint contract); a rolling
    // recurrence would save the inner loop but adds modular-inverse
    // subtlety for zero gain at this k
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p <= n - k) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * PolyHashExprs.Base + cps(p + j)) % PolyHashExprs.Mod
        j += 1
      }
      out(p) = acc
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** See [[PolyHashExprs.winnowSelect]]. */
case class WinnowSelectExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_select expects array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowSelectExpr.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowSelectExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.compute($c, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}

object WinnowSelectExpr {
  /** Sliding-window minimum with rightmost-tie selection via the
    * standard monotone deque (O(m)); the popped-on-equal rule is what
    * makes the surviving front the RIGHTMOST minimum of its window, the
    * winnowing paper's tie-break. Output encodes (hash, 1-based
    * position), distinct, ascending.
    */
  def compute(kh: ArrayData, w: Int): ArrayData = {
    val m = kh.numElements()
    if (m < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val deque = new Array[Int](m) // indices, values increasing front->back
    var head = 0
    var tail = 0 // exclusive
    val sel = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < m) {
      val v = kh.getLong(i)
      while (tail > head && kh.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      val j = i - w + 1 // window start
      if (j >= 0) {
        while (deque(head) < j) head += 1
        val idx = deque(head)
        sel.add(kh.getLong(idx) * PolyHashExprs.PosEncode + (idx + 1))
      }
      i += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
