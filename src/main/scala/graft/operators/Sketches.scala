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
      .persist()
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
    cnt.unpersist(blocking = false)
    out
  }
}
