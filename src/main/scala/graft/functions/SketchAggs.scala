package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketches as REAL SQL aggregate functions
  * (`TypedImperativeAggregate`) — the composable form of the
  * cell/register TABLES `graft.operators.Sketches` and the q217 source
  * sketch build with groupBy chains: `SELECT src, hll_distinct(w) …
  * GROUP BY src` works anywhere an aggregate works (HAVING, windows,
  * rollups), and the shuffle carries ONE fixed-size binary buffer per
  * (partition, group) instead of up to d·w / m / k cell rows per
  * group — the map-side partial is the sketch itself, which is the
  * whole point of a mergeable summary at 100 TB.
  *
  * Every kernel reuses the engine's established oracle-replayable
  * integer hash chain (base-31 code-point polynomial mod 1e9+7 from
  * [[PolyHashExpr]], then the `(ph + i) · 2654435761 mod 1e9+7`
  * permutation family), so the aggregate path is bit-identical to the
  * cell-table path — q242/q243/q244 hash-check that equivalence
  * against the same DuckDB chains that oracle q232/q239/q217.
  *
  * Buffers are primitive long arrays; serialization is the raw
  * little-endian longs. Update order never matters: CMS cells are
  * sums, HLL registers are maxes, minhash slots are mins — all
  * commutative monoids, which is what makes the partial aggregation
  * (and any shard/day/source union) exact.
  */
object SketchAggs {

  private[functions] val Mult = 2654435761L
  private[functions] val Prime = 1000000007L

  private[functions] def serializeLongs(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  private[functions] def deserializeLongs(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    bb.asLongBuffer().get(out)
    out
  }

  /** HLL register update shared by both HLL aggregates: register
    * j = ph mod 64 takes max with the rank (1 + leading zeros of the
    * 30-bit mixed hash; 31 when the window is all zeros) — the exact
    * integer ladder `Sketches.hllRegisters` generates as a Column
    * compare chain.
    */
  private[functions] def hllUpdate(regs: Array[Long], w: UTF8String): Unit = {
    val ph = PolyHashExpr.compute(w)
    val j = java.lang.Math.floorMod(ph, 64L).toInt
    val h = java.lang.Math.floorMod(ph * Mult, Prime)
    // h < Prime < 2^30; rank = 31 for h = 0, else 30 - floor(log2 h)
    val rho = if (h == 0L) 31L
      else (java.lang.Long.numberOfLeadingZeros(h) - 33).toLong
    if (rho > regs(j)) regs(j) = rho
  }

  /** The q239 estimate chain over a 64-register buffer: dyadic-exact
    * indicator sum (each term `1.0 / (1L << M)`, order-independent),
    * alpha_64 raw estimate, m·ln(m/zeros) small-range correction.
    */
  private[functions] def hllEstimate(regs: Array[Long]): Long = {
    val m = 64
    var psum = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      if (regs(j) == 0L) zeros += 1
      else psum += 1.0 / (1L << regs(j)).toDouble
      j += 1
    }
    val isum = psum + zeros.toDouble
    val raw = 0.709 * m.toDouble * m.toDouble / isum
    val est =
      if (raw <= 2.5 * m && zeros > 0)
        math.round(m.toDouble * math.log(m.toDouble / zeros.toDouble))
      else math.round(raw)
    est
  }

  /** Column wrappers (already AggregateExpression-wrapped — usable
    * directly inside `agg(...)`).
    */
  def cmSketch(c: Column, depth: Int = 4, width: Int = 512): Column =
    GraftBridge.column(CountMinSketchAgg(GraftBridge.expression(c),
      depth, width).toAggregateExpression())

  def hllRegistersAgg(c: Column): Column =
    GraftBridge.column(HllRegistersAgg(GraftBridge.expression(c))
      .toAggregateExpression())

  def hllDistinct(c: Column): Column =
    GraftBridge.column(HllDistinctAgg(GraftBridge.expression(c))
      .toAggregateExpression())

  def minhashSketch(c: Column, numHashes: Int = 64): Column =
    GraftBridge.column(MinHashSketchAgg(GraftBridge.expression(c),
      numHashes).toAggregateExpression())

  def kmvSketch(c: Column, k: Int = 32): Column =
    GraftBridge.column(KmvSketchAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())

  def kmvDistinct(c: Column, k: Int = 32): Column =
    GraftBridge.column(KmvDistinctAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())

  /** Shared KMV buffer ops. The buffer is the k smallest DISTINCT
    * permuted hashes in ascending order, `Long.MaxValue` sentinels in
    * unfilled slots (every real hash is < 1e9+7, so sentinels sort
    * last and `binarySearch` stays correct).
    */
  private[functions] def kmvInsert(buffer: Array[Long], v: Long): Unit = {
    val k = buffer.length
    if (v >= buffer(k - 1)) return // not among the k smallest (or dup)
    val idx = java.util.Arrays.binarySearch(buffer, v)
    if (idx >= 0) return // already present
    val ins = -idx - 1
    System.arraycopy(buffer, ins, buffer, ins + 1, k - ins - 1)
    buffer(ins) = v
  }

  private[functions] def kmvMerge(a: Array[Long],
      b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length && b(i) != Long.MaxValue) {
      kmvInsert(a, b(i)); i += 1
    }
    a
  }
}

/** Shared shell: a string-input, long-array-buffer sketch aggregate. */
abstract class LongArraySketchAgg extends TypedImperativeAggregate[Array[Long]] {

  def child: Expression

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got $other")
  }

  /** One token into the buffer (nulls skipped at the call site). */
  protected def updateToken(buffer: Array[Long], w: UTF8String): Unit

  final override def update(buffer: Array[Long],
      input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) updateToken(buffer, v.asInstanceOf[UTF8String])
    buffer
  }

  final override def serialize(buffer: Array[Long]): Array[Byte] =
    SketchAggs.serializeLongs(buffer)

  final override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeLongs(bytes)
}

/** `cm_sketch(w, depth, width)` — Count-Min sketch of the token
  * stream as a flat `array<bigint>` of d·w counters (cell (i, b) at
  * index i·width + b). Cell-wise identical to
  * `Sketches.countMinCells` (q232's chain): counter (i, b) sums every
  * token whose permuted hash lands there, one count per token
  * INSTANCE. Merge = element-wise add.
  */
case class CountMinSketchAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends LongArraySketchAgg {
  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(width >= 16 && width <= (1 << 20) &&
    Integer.bitCount(width) == 1, s"width must be a power of two: $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override protected def updateToken(buffer: Array[Long],
      w: UTF8String): Unit = {
    val ph = PolyHashExpr.compute(w)
    var i = 0
    while (i < depth) {
      val h = java.lang.Math.floorMod(
        (ph + i) * SketchAggs.Mult, SketchAggs.Prime)
      buffer(i * width + (h % width).toInt) += 1L
      i += 1
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cm_sketch"
}

/** Shared HLL buffer behavior: 64 registers, max-merge. */
abstract class HllAggBase extends LongArraySketchAgg {
  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override protected def updateToken(buffer: Array[Long],
      w: UTF8String): Unit = SketchAggs.hllUpdate(buffer, w)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
}

/** `hll_registers(w)` — the 64 HLL registers as `array<bigint>`
  * (index j = register j; 0 = empty). Register-wise identical to
  * `Sketches.hllRegisters` (q239's chain): duplicates cannot move a
  * max, so no distinct pass is needed. Merge = element-wise max.
  */
case class HllRegistersAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HllAggBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)
  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_registers"
}

/** `hll_distinct(w)` — the HLL cardinality estimate as BIGINT,
  * evaluating q239's exact estimate chain over the same registers
  * (`Sketches.hllSourceDistinct`'s hll_est column).
  */
case class HllDistinctAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends HllAggBase {
  override def dataType: DataType = LongType
  override def eval(buffer: Array[Long]): Any =
    SketchAggs.hllEstimate(buffer)
  override def withNewMutableAggBufferOffset(o: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_distinct"
}

/** `minhash_sketch(w, numHashes)` — the unionable source-level
  * minhash signature as `array<bigint>`: slot i = min over tokens of
  * `(poly(w) + i) · 2654435761 mod 1e9+7`, exactly the q217
  * (`Dedup.sourceMinhashSimilarity`) sig table. Empty-input slots
  * hold Long.MaxValue (no token ever hashed there). Merge =
  * element-wise min.
  */
case class MinHashSketchAgg(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends LongArraySketchAgg {
  require(numHashes >= 1 && numHashes <= 1024,
    s"numHashes out of range: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override protected def updateToken(buffer: Array[Long],
      w: UTF8String): Unit = {
    val ph = PolyHashExpr.compute(w)
    var i = 0
    while (i < numHashes) {
      val v = java.lang.Math.floorMod(
        (ph + i) * SketchAggs.Mult, SketchAggs.Prime)
      if (v < buffer(i)) buffer(i) = v
      i += 1
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "minhash_sketch"
}

/** Shared KMV (k-minimum-values / bottom-k) shell: the classic
  * mergeable distinct sketch (Bar-Yossef et al. 2002) — keep the k
  * smallest DISTINCT permuted hashes; union = merge + retruncate, so
  * shard/source/day sketches combine exactly (the q245 HLL-union
  * argument, here with an ORDER statistic instead of register maxes).
  * Hash chain: `poly(w)·2654435761 mod 1e9+7` — the i = 0 member of
  * the engine's permutation family, so the DuckDB oracle replays it
  * with the q243 list_reduce device.
  */
abstract class KmvAggBase extends LongArraySketchAgg {
  def k: Int

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override protected def updateToken(buffer: Array[Long],
      w: UTF8String): Unit = {
    val v = java.lang.Math.floorMod(
      PolyHashExpr.compute(w) * SketchAggs.Mult, SketchAggs.Prime)
    SketchAggs.kmvInsert(buffer, v)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    SketchAggs.kmvMerge(a, b)
}

/** `kmv_sketch(w, k)` — the filled prefix of the bottom-k buffer as
  * `array<bigint>` (ascending; shorter than k when fewer distinct
  * hashes were seen). This IS the mergeable state: union any two
  * outputs by merging and keeping the k smallest.
  */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvAggBase {
  // validated in the CONCRETE class: an abstract-body require reads
  // the not-yet-assigned field during reflective instantiation
  // (task deserialization) and kills the executor-side copy
  require(k >= 2 && k <= 4096, s"k out of range: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.takeWhile(_ != Long.MaxValue))
  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

/** `kmv_distinct(w, k)` — the KMV cardinality estimate as BIGINT:
  * exact count of distinct hashes while fewer than k were seen,
  * otherwise `round((k−1)·P/h_k)` with h_k the k-th smallest hash —
  * one mirrored expression the oracle replays (round parity: both
  * engines round positive halves up).
  */
case class KmvDistinctAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvAggBase {
  require(k >= 2 && k <= 4096, s"k out of range: $k")
  override def dataType: DataType = LongType
  override def eval(buffer: Array[Long]): Any = {
    val filled = buffer.indexWhere(_ == Long.MaxValue) match {
      case -1 => k
      case n => n
    }
    if (filled < k) filled.toLong
    else math.round((k - 1).toDouble * SketchAggs.Prime.toDouble /
      buffer(k - 1).toDouble)
  }
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}
