package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the q217 (unionable minhash) family
  * member for COUNTS: a Count-Min sketch (Cormode & Muthukrishnan
  * 2005) summarizes token frequencies in d×w integer counters that
  * union across shards/sources/days by plain cell-wise addition, so a
  * 100-TB corpus's word-frequency surface costs O(d·w) state per
  * shard, never a vocab-sized table per shard.
  *
  * All arithmetic is integer (the q217 polynomial hash chain row-seeded
  * like the minhash permutations; estimates are exact BIGINT mins of
  * exact BIGINT sums), so the DuckDB oracle replays it bit-for-bit.
  */
object Sketches {

  private val Mult = 2654435761L
  private val Prime = 1000000007L

  /** The raw mergeable sketch: (i, b, cn) cells over the corpus's
    * tokens — union shards by summing cells on (i, b). Production
    * surface for cross-shard frequency estimation; spec-pinned
    * (SketchesSpec) for the mergeability contract.
    */
  def countMinCells(docs: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 16 && width <= (1 << 20) &&
      Integer.bitCount(width) == 1, s"width must be a power of two: $width")
    docs
      .select(explode(split(TextShingles.normalize(col(textCol)), " "))
        .as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("ph", graft.functions.PolyHashExprs.polyHash(col("w")))
      .select(col("n"), col("ph"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("i"))
      .withColumn("b",
        pmod(pmod((col("ph") + col("i")) * lit(Mult), lit(Prime)),
          lit(width.toLong)))
      .groupBy(col("i"), col("b"))
      .agg(sum(col("n")).as("cn"))
  }

  /** The raw m = 64 HLL register table (src, j, mj) — union shards by
    * per-cell MAX (spec-pinned in SketchesSpec).
    */
  def hllRegisters(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val m = 64
    val words = docs.select(col(srcCol).as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " "))
          .as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .withColumn("ph", graft.functions.PolyHashExprs.polyHash(col("w")))
      .withColumn("j", pmod(col("ph"), lit(m.toLong)))
      .withColumn("h",
        pmod(col("ph") * lit(Mult), lit(Prime)))
    // rank = 1 + leading zeros of the 30-bit window: a pure integer
    // compare ladder (h < 2^30 always, since Prime < 2^30)
    val rho = (1 to 30).foldRight(lit(31L): org.apache.spark.sql.Column) {
      case (r, els) =>
        when(col("h") >= lit(1L << (30 - r)), lit(r.toLong)).otherwise(els)
    }
    words.withColumn("rho", rho)
      .groupBy(col("src"), col("j")).agg(max(col("rho")).as("mj"))
  }

  /** Q239: per-source DISTINCT-WORD estimation via a from-scratch
    * HyperLogLog (Flajolet et al. 2007), m = 64 registers — the
    * cardinality member of the mergeable-sketch family (q217 minhash
    * for similarity, q232 Count-Min for frequency): registers union
    * across shards by cell-wise MAX, so per-source vocabulary tracking
    * costs 64 bytes of state per shard at any corpus size. The exact
    * distinct count rides along as the validation price (the
    * q10/q11/q217/q232 gate form).
    *
    * Exactness: register index and rank derive from the shared integer
    * hash chain (rank = leading-zero ladder over the 30-bit mixed
    * hash — pure integer compares, generated identically in both
    * engines); the indicator sum Σ 2^(−Mⱼ) is a sum of 64 DYADIC
    * fractions ≥ 2⁻³¹, exact in a double in ANY order (each term is
    * `1.0 / (1 << M)`, never libm pow); the raw estimate is one
    * mirrored double chain (α₆₄·m²/Σ) and the small-range correction
    * m·ln(m/zeros) rides the established ln parity precedent.
    * Output: (source, n_exact, hll_est, reg_zeros).
    */
  def hllSourceDistinct(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val m = 64
    val alpha = 0.709 // the standard alpha_64 constant
    val words = docs.select(col(srcCol).as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " "))
          .as("w"))
      .filter(col("w") =!= "")
      .distinct()
    val regs = hllRegisters(docs, textCol, srcCol)
    val perSrc = regs.groupBy(col("src"))
      .agg(count(lit(1)).as("present"),
        sum(lit(1.0) /
          expr("shiftleft(cast(1 as bigint), cast(mj as int))"))
          .as("psum"))
      .withColumn("zeros", lit(m.toLong) - col("present"))
      .withColumn("isum", col("psum") + col("zeros").cast("double"))
      .withColumn("raw",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / col("isum"))
      .withColumn("est",
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0,
          round(lit(m.toDouble) *
            log(lit(m.toDouble) / col("zeros").cast("double"))))
          .otherwise(round(col("raw"))).cast("long"))
    val exact = words.groupBy(col("src"))
      .agg(count(lit(1)).as("n_exact"))
    exact.join(perSrc, Seq("src"))
      .select(col("src").as("source"), col("n_exact"),
        col("est").as("hll_est"), col("zeros").as("reg_zeros"))
  }

  /** Q245: GLOBAL distinct-word estimate by max-merging the per-source
    * HLL register SHARDS — the union contract the sketch family
    * promises, proven in the output: the engine never sees the global
    * token stream (it merges the (src, j, mj) shard table), while the
    * oracle derives registers from the undivided corpus, and the two
    * must agree register-for-register. This is the 100-TB shape —
    * per-shard sketches roll up to corpus totals without re-reading
    * anything. The exact global distinct rides as the validation price
    * (the q239 gate form). Output: one row
    * (n_sources, n_exact, hll_est, reg_zeros).
    */
  def hllGlobalDistinct(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val m = 64
    val alpha = 0.709
    val shards = hllRegisters(docs, textCol, srcCol)
    val global = shards.groupBy(col("j")).agg(max(col("mj")).as("mj"))
    val est = global
      .agg(count(lit(1)).as("present"),
        sum(lit(1.0) /
          expr("shiftleft(cast(1 as bigint), cast(mj as int))"))
          .as("psum"))
      .withColumn("zeros", lit(m.toLong) - col("present"))
      .withColumn("isum", col("psum") + col("zeros").cast("double"))
      .withColumn("raw",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / col("isum"))
      .withColumn("hll_est",
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0,
          round(lit(m.toDouble) *
            log(lit(m.toDouble) / col("zeros").cast("double"))))
          .otherwise(round(col("raw"))).cast("long"))
    val words = docs.select(col(srcCol).as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " "))
          .as("w"))
      .filter(col("w") =!= "")
    val exact = words.agg(
      countDistinct(col("src")).as("n_sources"),
      countDistinct(col("w")).as("n_exact"))
    exact.crossJoin(broadcast(
      est.select(col("hll_est"), col("zeros").as("reg_zeros"))))
  }

  /** Q232: Count-Min heavy-hitter audit — build the sketch in one
    * map-side-combinable pass, then report the top-k exact words with
    * their sketch estimates (validation-priced ground truth, the
    * q10/q11/q217 gate form; production reads the cells alone).
    * Output: (word, n, est, overcount, rank); CMS never
    * underestimates, so `overcount = est − n ≥ 0` measures collision
    * error at this (d, w).
    *
    * Scale: cells = d·w counters via ONE groupBy over the token scan
    * (map-side combine reduces each partition to ≤ d·w rows before the
    * shuffle); the top-k uses the q111 windowless device
    * (TakeOrderedAndProject); the estimate join touches k·d rows
    * against the broadcast cell table.
    */
  def countMinHeavyHitters(docs: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 512, k: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 16 && width <= (1 << 20) &&
      Integer.bitCount(width) == 1, s"width must be a power of two: $width")
    require(k >= 1 && k <= 10000, s"k out of range: $k")
    val cnt = docs
      .select(explode(split(TextShingles.normalize(col(textCol)), " "))
        .as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("ph", graft.functions.PolyHashExprs.polyHash(col("w")))
    val bk = cnt.select(col("w"), col("n"), col("ph"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("i"))
      .withColumn("b",
        pmod(pmod((col("ph") + col("i")) * lit(Mult), lit(Prime)),
          lit(width.toLong)))
    val cells = bk.groupBy(col("i"), col("b"))
      .agg(sum(col("n")).as("cn"))
    val top = cnt
      .orderBy(col("n").desc, col("w"))
      .limit(k)
      .agg(array_sort(collect_list(struct((-col("n")).as("negn"),
        col("w").as("w"), col("n").as("n")))).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.w").as("w"), col("s.n").as("n"),
        (col("pos") + 1).as("rank"))
    val out = top
      .join(bk.select(col("w"), col("i"), col("b")), Seq("w"))
      .join(broadcast(cells), Seq("i", "b"))
      .groupBy(col("w"), col("n"), col("rank"))
      .agg(min(col("cn")).as("est"))
      .select(col("w").as("word"), col("n"), col("est"),
        (col("est") - col("n")).as("overcount"), col("rank"))
    // `cnt` (vocabulary-bounded) is consumed three times in ONE plan:
    // exchange reuse shares its shuffle, so no persist is needed — a
    // persist released before the (lazy) result executes caches nothing
    out
  }

  /** The documents-table token stream shared by the sketch builders:
    * normalize → split → non-empty.
    */
  private def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(col("source").as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")

  /** Q242: [[countMinCells]] through the `cm_sketch` AGGREGATE
    * ([[graft.functions.CountMinSketchAgg]]) — same (i, b, cn) cell
    * table, but the shuffle carries ONE d·w buffer per partition
    * (ObjectHashAggregate partial = the sketch itself) instead of the
    * cell-path's per-word rows; the cell rows only materialize at the
    * very end, by exploding the single merged buffer. The composable
    * form: `cm_sketch` works under any GROUP BY.
    */
  def countMinCellsAgg(docs: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 512): DataFrame =
    tokens(docs, textCol)
      .agg(graft.functions.SketchAggs.cmSketch(col("w"), depth, width)
        .as("cells"))
      .select(posexplode(col("cells")).as(Seq("pos", "cn")))
      .filter(col("cn") > 0L)
      .select((col("pos") / width).cast("long").as("i"),
        pmod(col("pos").cast("long"), lit(width.toLong)).as("b"),
        col("cn"))

  /** Q243: [[hllSourceDistinct]]'s estimate through the
    * `hll_distinct` / `hll_registers` AGGREGATES — one 64-register
    * buffer per (partition, source) on the wire, registers never
    * explode into rows at all. Output (source, hll_est, reg_zeros)
    * matches q239's estimate columns exactly (the exact count is
    * q239's validation price; this is the production path).
    */
  def hllSourceDistinctAgg(docs: DataFrame, textCol: String): DataFrame =
    tokens(docs, textCol)
      .groupBy(col("src"))
      .agg(graft.functions.SketchAggs.hllDistinct(col("w")).as("hll_est"),
        graft.functions.SketchAggs.hllRegistersAgg(col("w")).as("regs"))
      .select(col("src").as("source"), col("hll_est"),
        size(filter(col("regs"), r => r === 0L)).cast("long")
          .as("reg_zeros"))

  /** Q244: the q217 source minhash sig table through the
    * `minhash_sketch` AGGREGATE — (src, i, mh) identical to
    * [[Dedup.sourceMinhashSimilarity]]'s sketch stage, built as one
    * numHashes-slot buffer per (partition, source) instead of a
    * numHashes-way row explosion before the combine.
    */
  def sourceMinhashSketchAgg(docs: DataFrame, textCol: String,
      numHashes: Int = 64): DataFrame =
    tokens(docs, textCol)
      .groupBy(col("src"))
      .agg(graft.functions.SketchAggs.minhashSketch(col("w"), numHashes)
        .as("sig"))
      .select(col("src"), posexplode(col("sig")).as(Seq("i", "mh")))
      .select(col("src"), col("i").cast("long").as("i"), col("mh"))

  /** Q297: per-source KMV (bottom-k) distinct sketch through the
    * `kmv_sketch` AGGREGATE ([[graft.functions.KmvAggBase]]) — the
    * ORDER-STATISTIC member of the mergeable family (CMS sums, HLL
    * maxes, minhash mins, KMV bottom-k): one k-slot buffer per
    * (partition, source) on the wire; union across shards is merge +
    * retruncate. Output (source, i, h) slot rows, oracle-replayed via
    * the q243 hash-chain device + a rank filter.
    */
  def kmvSourceSketch(docs: DataFrame, textCol: String, k: Int = 16)
      : DataFrame =
    tokens(docs, textCol)
      .groupBy(col("src"))
      .agg(graft.functions.SketchAggs.kmvSketch(col("w"), k).as("sk"))
      .select(col("src").as("source"), posexplode(col("sk"))
        .as(Seq("i", "h")))
      .select(col("source"), col("i").cast("long").as("i"), col("h"))

  /** Q298: the per-source KMV cardinality estimate next to the exact
    * distinct count — both deterministic (the estimate is a pure
    * function of the bottom-k hashes), so BOTH columns oracle exactly;
    * the |est − exact| gap is the sketch's honest price, priced per
    * source in the output rather than hidden in a recall flag.
    */
  def kmvSourceDistinct(docs: DataFrame, textCol: String, k: Int = 16)
      : DataFrame =
    tokens(docs, textCol)
      .groupBy(col("src"))
      .agg(graft.functions.SketchAggs.kmvDistinct(col("w"), k)
          .as("kmv_est"),
        countDistinct(col("w")).as("exact_distinct"))
      .select(col("src").as("source"), col("kmv_est"),
        col("exact_distinct"))

  /** Q299: GLOBAL bottom-k by merging the per-source KMV shards — the
    * engine never touches the undivided corpus (per-source sketches →
    * explode → k smallest of the union), while the oracle builds the
    * global bottom-k directly; hash equality IS the union-mergeability
    * proof (the q245 HLL-union argument for order statistics: every
    * global bottom-k hash survives in its own shard's bottom-k).
    * The merge runs over ≤ |sources|·k values — collect_set-bounded.
    */
  /** Q310: PER-SOURCE-PAIR KMV JACCARD — the bottom-k of the UNION of
    * two sketches is a uniform hash-order sample of A∪B, so the
    * fraction of it present in BOTH sketches estimates |A∩B|/|A∪B|
    * (Broder's sketch-Jaccard on KMV state): pair similarity from
    * k-slot sketches alone, never the token sets — the q217 minhash
    * story with the SAME state q297/q298 already maintain for
    * cardinality (one sketch, two readouts). The exact word-set
    * Jaccard rides as the validation price; both columns are
    * deterministic, so both oracle exactly.
    */
  def kmvPairJaccard(docs: DataFrame, textCol: String, k: Int = 16)
      : DataFrame = {
    val sk = tokens(docs, textCol).groupBy(col("src"))
      .agg(graft.functions.SketchAggs.kmvSketch(col("w"), k).as("sk"))
    val words = tokens(docs, textCol)
      .select(col("src"), col("w")).distinct()
    val cnt = words.groupBy(col("src")).agg(count(lit(1)).as("nw"))
    val inter = words.select(col("src").as("s1"), col("w"))
      .join(words.select(col("src").as("s2"), col("w")), Seq("w"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("ni"))
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    sk.select(col("src").as("s1"), col("sk").as("ska"))
      .crossJoin(broadcast(
        sk.select(col("src").as("s2"), col("sk").as("skb"))))
      .filter(col("s1") < col("s2"))
      .withColumn("merged",
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .withColumn("shared", size(filter(col("merged"), h =>
        array_contains(col("ska"), h) &&
          array_contains(col("skb"), h))).cast("long"))
      .withColumn("msize", size(col("merged")).cast("long"))
      .join(broadcast(cnt.select(col("src").as("s1"),
        col("nw").as("n1w"))), Seq("s1"))
      .join(broadcast(cnt.select(col("src").as("s2"),
        col("nw").as("n2w"))), Seq("s2"))
      .join(broadcast(inter), Seq("s1", "s2"), "left")
      .withColumn("ni", coalesce(col("ni"), lit(0L)))
      .select(col("s1").as("source_a"), col("s2").as("source_b"),
        round(d(col("shared")) / d(col("msize")), 6).as("jaccard_est"),
        round(d(col("ni")) /
          (d(col("n1w")) + d(col("n2w")) - d(col("ni"))), 6)
          .as("jaccard_exact"))
  }

  /** PRODUCTION form of [[kmvPairJaccard]] (ADVICE r16): the sketch-only
    * readout a user runs — per-source KMV state → pairwise Broder
    * estimate — WITHOUT the exact word-set Jaccard pass, which
    * self-joins the full per-source distinct vocabularies (quadratic in
    * vocabulary and sources, unbounded by k) and exists only to price
    * the oracled row's validation. Benched as `prod_kmv_jaccard`; the
    * oracled q310 keeps both columns. At scale this is the whole point
    * of the sketch: |sources|² pairs of k-slot arrays, never the corpus.
    */
  def kmvPairJaccardEst(docs: DataFrame, textCol: String = "text",
      k: Int = 16): DataFrame = {
    val sk = tokens(docs, textCol).groupBy(col("src"))
      .agg(graft.functions.SketchAggs.kmvSketch(col("w"), k).as("sk"))
    sk.select(col("src").as("s1"), col("sk").as("ska"))
      .crossJoin(broadcast(
        sk.select(col("src").as("s2"), col("sk").as("skb"))))
      .filter(col("s1") < col("s2"))
      .withColumn("merged",
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .withColumn("shared", size(filter(col("merged"), h =>
        array_contains(col("ska"), h) &&
          array_contains(col("skb"), h))).cast("long"))
      .select(col("s1").as("source_a"), col("s2").as("source_b"),
        round(col("shared").cast("double") /
          size(col("merged")).cast("double"), 6).as("jaccard_est"))
  }

  def kmvGlobalSketch(docs: DataFrame, textCol: String, k: Int = 16)
      : DataFrame =
    tokens(docs, textCol)
      .groupBy(col("src"))
      .agg(graft.functions.SketchAggs.kmvSketch(col("w"), k).as("sk"))
      .select(explode(col("sk")).as("h"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("merged"))
      .select(posexplode(col("merged")).as(Seq("i", "h")))
      .select(col("i").cast("long").as("i"), col("h"))
}
