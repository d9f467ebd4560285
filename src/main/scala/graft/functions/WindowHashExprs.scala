package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native stride-1 substring-window hashing for the q137/q138 substring
  * dedup family: every `windowChars`-character window of the input gets
  * xxhash64'd WITHOUT materializing a per-position substring.
  *
  * Bit-compatible with the interpreted formulation
  * `array_distinct(transform(sequence(1, length(s) - w + 1),
  * i -> xxhash64(substr(s, i, w))))`: Spark's `substr` slices by code
  * point and `xxhash64` hashes the resulting UTF8String's UTF-8 bytes
  * with seed 42 — so hashing the parent string's byte slice
  * `[byteOffset(i), byteOffset(i + w))` directly produces the identical
  * long (asserted in WindowHashSpec, including non-ASCII inputs). What
  * the fused kernel removes is the per-position allocation: the HOF form
  * copies a w-char UTF8String and re-walks the Catalyst tree per
  * position (|text| copies per document); here one byte-offset index is
  * built per document and each window is one `XXH64.hashUnsafeBytes`
  * over the shared byte array, inside whole-stage codegen.
  */
object WindowHashExprs {

  private val Seed = 42L // xxhash64()'s default seed

  /** char-index → byte-offset table for `bytes` (UTF-8), length
    * numChars + 1 with the trailing total-byte sentinel.
    */
  private def charOffsets(bytes: Array[Byte], numChars: Int): Array[Int] = {
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (b < bytes.length && i < numChars) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(numChars) = bytes.length
    offs
  }

  /** Distinct window hashes, first-occurrence order (= the order
    * `array_distinct` preserves). Empty array when the input is shorter
    * than the window.
    */
  def computeDistinct(s: UTF8String, w: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val bytes = s.getBytes
    val offs = charOffsets(bytes, numChars)
    val nWin = numChars - w + 1
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    val out = new Array[Long](nWin)
    var k = 0
    var p = 0
    while (p < nWin) {
      val start = offs(p)
      val h = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, offs(p + w) - start, Seed)
      if (seen.add(h)) { out(k) = h; k += 1 }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** Distinct window hashes WITH the 1-based char position of each
    * hash's first occurrence — the q138 text-recovery handle: a survivor
    * hash plus (id, pos) is enough to re-slice the window text from the
    * source document, so the corpus-wide expansion never carries
    * strings.
    */
  def computeDistinctPos(s: UTF8String, w: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < w) return new GenericArrayData(Array.empty[AnyRef])
    val bytes = s.getBytes
    val offs = charOffsets(bytes, numChars)
    val nWin = numChars - w + 1
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    val out = new Array[AnyRef](nWin)
    var k = 0
    var p = 0
    while (p < nWin) {
      val start = offs(p)
      val h = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, offs(p + w) - start, Seed)
      if (seen.add(h)) {
        out(k) = new GenericInternalRow(
          Array[Any](h, p + 1)): InternalRow
        k += 1
      }
      p += 1
    }
    new GenericArrayData(
      java.util.Arrays.copyOf(out, k).asInstanceOf[Array[Any]])
  }

  /** SORTED distinct window hashes — the fused form of
    * `hashed_sorted_set(char_shingles(s, w))`, bit-identical including
    * the short-string edge (numChars < w hashes the WHOLE string once,
    * `substringSQL(1, w)` semantics) and the collision-dedup that a
    * sort-then-dedup of xxhash64 values performs. One byte-offset walk +
    * one long-array sort per document, zero intermediate shingle
    * strings — this is the set representation the whole minhash/PPJoin
    * dedup family shuffles and verifies on.
    */
  def computeSortedSet(s: UTF8String, w: Int): ArrayData = {
    val numChars = s.numChars()
    val bytes = s.getBytes
    if (numChars < w) {
      return UnsafeArrayData.fromPrimitiveArray(Array(XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)))
    }
    val offs = charOffsets(bytes, numChars)
    val nWin = numChars - w + 1
    val hs = new Array[Long](nWin)
    var p = 0
    while (p < nWin) {
      val start = offs(p)
      hs(p) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, offs(p + w) - start, Seed)
      p += 1
    }
    java.util.Arrays.sort(hs)
    var wr = 0
    var i = 0
    while (i < nWin) {
      if (wr == 0 || hs(i) != hs(wr - 1)) { hs(wr) = hs(i); wr += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, wr))
  }

  /** Sorted distinct xxhash64 values of the WORD n-grams of a normalized
    * (single-space-separated) string — the fused form of
    * `hashed_sorted_set(word_ngrams(s, n))`. Key fact making it
    * bit-identical with zero gram-string allocation: on normalized text
    * the space-joined gram "wᵢ … wᵢ₊ₙ₋₁" IS a contiguous byte slice of
    * the source (exactly one 0x20 byte separates consecutive tokens, and
    * 0x20 never occurs inside a multi-byte UTF-8 sequence), so hashing
    * `bytes[start(wᵢ), end(wᵢ₊ₙ₋₁))` equals hashing the constructed
    * string — including `split(" ", -1)` empty-token edges, where the
    * join degenerates to the same slice. Fewer than n tokens → one gram
    * of all tokens (the whole string), matching [[WordNgramsExpr]].
    */
  def computeNgramSortedSet(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // token boundaries: starts(i) .. ends(i) in bytes; numToks = spaces+1
    var spaces = 0
    var b = 0
    while (b < bytes.length) { if (bytes(b) == 0x20) spaces += 1; b += 1 }
    val numToks = spaces + 1
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    starts(0) = 0
    var t = 0
    b = 0
    while (b < bytes.length) {
      if (bytes(b) == 0x20) { ends(t) = b; t += 1; starts(t) = b + 1 }
      b += 1
    }
    ends(t) = bytes.length
    val last = math.max(numToks - n, 0)
    val hs = new Array[Long](last + 1)
    var i = 0
    while (i <= last) {
      val j = math.min(i + n, numToks) - 1
      val off = starts(i)
      hs(i) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + off, ends(j) - off, Seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var wr = 0
    i = 0
    while (i <= last) {
      if (wr == 0 || hs(i) != hs(wr - 1)) { hs(wr) = hs(i); wr += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, wr))
  }

  def windowHashes(c: Column, windowChars: Int): Column =
    GraftBridge.column(
      WindowXxHashesExpr(GraftBridge.expression(c), windowChars))

  def ngramHashSortedSet(c: Column, n: Int): Column =
    GraftBridge.column(
      NgramXxHashSortedSetExpr(GraftBridge.expression(c), n))

  def windowHashSortedSet(c: Column, windowChars: Int): Column =
    GraftBridge.column(
      WindowXxHashSortedSetExpr(GraftBridge.expression(c), windowChars))

  def windowHashPos(c: Column, windowChars: Int): Column =
    GraftBridge.column(
      WindowXxHashPosExpr(GraftBridge.expression(c), windowChars))
}

/** `array_distinct(transform(sequence(...), i -> xxhash64(substr(s, i,
  * w))))` as one fused codegen'd kernel — see [[WindowHashExprs]].
  */
case class WindowXxHashesExpr(child: Expression, windowChars: Int)
    extends UnaryExpression {
  require(windowChars >= 1, s"windowChars must be >= 1, got $windowChars")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_xxhashes expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WindowHashExprs.computeDistinct(input.asInstanceOf[UTF8String], windowChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WindowHashExprs.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.computeDistinct($c, $windowChars);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "window_xxhashes"
}

/** `hashed_sorted_set(char_shingles(s, w))` as one fused kernel — see
  * [[WindowHashExprs.computeSortedSet]].
  */
case class WindowXxHashSortedSetExpr(child: Expression, windowChars: Int)
    extends UnaryExpression {
  require(windowChars >= 1, s"windowChars must be >= 1, got $windowChars")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_xxhash_sorted_set expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WindowHashExprs.computeSortedSet(
      input.asInstanceOf[UTF8String], windowChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WindowHashExprs.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.computeSortedSet($c, $windowChars);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "window_xxhash_sorted_set"
}

/** `hashed_sorted_set(word_ngrams(s, n))` as one fused kernel — see
  * [[WindowHashExprs.computeNgramSortedSet]].
  */
case class NgramXxHashSortedSetExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_xxhash_sorted_set expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WindowHashExprs.computeNgramSortedSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WindowHashExprs.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.computeNgramSortedSet($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_xxhash_sorted_set"
}

/** The positional variant: array of (h, pos) structs, distinct by hash,
  * pos = 1-based first occurrence — see [[WindowHashExprs]].
  */
case class WindowXxHashPosExpr(child: Expression, windowChars: Int)
    extends UnaryExpression {
  require(windowChars >= 1, s"windowChars must be >= 1, got $windowChars")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_xxhash_pos expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WindowHashExprs.computeDistinctPos(
      input.asInstanceOf[UTF8String], windowChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WindowHashExprs.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.computeDistinctPos($c, $windowChars);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "window_xxhash_pos"
}
