package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (SURVEY §2.3 Q6 and
  * the mandated extensions): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Scale notes: every variant is a single aggregation or bucket-equi-join on
  * a derived key — there is no all-pairs comparison anywhere except *within*
  * an LSH bucket (candidate verification), which is the standard
  * shingle→minhash→band→bucket-join design. Exact dedup uses a map-side
  * combinable `groupBy(text)` + `min(struct(..))` rather than a ranking
  * window, so no per-partition sort of long strings is needed.
  */
object Dedup {

  /** Q6: exact dedup on a column, keeping the row with the lowest id.
    * `min(struct(id, cols…))` gives map-side partial aggregation — at 100 TB
    * this is one shuffle of (text-hash-partitioned) partial winners.
    */
  def exact(df: DataFrame, on: String, idCol: String, carry: Seq[String]): DataFrame =
    df.groupBy(col(on))
      .agg(min(struct((idCol +: carry).map(col): _*)).as("keep"))
      .select((s"keep.$idCol" +: carry.map(c => s"keep.$c")).map(col): _*)

  /** MinHash signature of a shingle array: for each of `numHashes` universal
    * hash functions h_j(x) = (a_j * x + b_j) mod p over the shingle's
    * base hash, take the min. Returns array<long> of length numHashes.
    * p = 2^31-1 keeps a*x+b < 2^62, safe under ANSI overflow checking.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int, seed: Long = 7L): Column = {
    val p = lit(Hashing.P31)
    val hashed = transform(shingleArr, s => pmod(xxhash64(s), p))
    val params = array((0 until numHashes).map { j =>
      struct(
        lit(Hashing.coef(seed, 2 * j)).as("a"),
        lit(Hashing.coef(seed, 2 * j + 1)).as("b"))
    }: _*)
    transform(params, ab =>
      array_min(transform(hashed, x =>
        pmod(ab.getField("a") * x + ab.getField("b"), p))))
  }

  /** band hashes: split signature into `bands` bands of `rows` values; hash
    * each band. Returns array<struct<band:int, h:long>> for explode+groupBy.
    */
  def bandHashes(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(signature, b * rows + 1, rows)).as("h"))
    }: _*)

  /** MinHash+LSH near-duplicate pairs: candidates from shared LSH buckets,
    * verified by exact Jaccard on shingle sets. Output: (doc_a, doc_b,
    * jaccard) with doc_a < doc_b and jaccard >= threshold.
    */
  def minhashNearDups(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val withSig = docs
      .select(col(idCol).as("id"), TextShingles.charShingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("bh", explode(bandHashes(col("sig"), bands, rows)))
      .select(col("bh.band"), col("bh.h"), col("id"), col("sh"))
    val a = withSig.select(col("band"), col("h"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val b = withSig.select(col("band"), col("h"), col("id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .distinct() // a pair may collide in several bands; verify once
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over word tokens: bit i of the fingerprint is the sign
    * of the sum over tokens of ±1 depending on bit i of xxhash64(token).
    */
  def simhash(text: Column): Column = {
    val tokens = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    val hashes = transform(tokens, t => xxhash64(t))
    (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L))
      when(bitSum >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found by
    * banding the 64-bit fingerprint into 4 16-bit chunks (any pair within
    * Hamming distance 3 shares at least one chunk — pigeonhole).
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String, maxDist: Int = 3): DataFrame = {
    val chunks = 4
    val withFp = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
      .withColumn("chunk", explode(array((0 until chunks).map { c =>
        struct(lit(c).as("c"), shiftright(col("fp"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
      }: _*)))
      .select(col("chunk.c"), col("chunk.v"), col("id"), col("fp"))
    val a = withFp.select(col("c"), col("v"), col("id").as("doc_a"), col("fp").as("fp_a"))
    val b = withFp.select(col("c"), col("v"), col("id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("c", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("fp_a"), col("fp_b"))
      .distinct()
      .withColumn("dist", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("hamming"))
  }

  /** Word n-gram Jaccard near-dup pairs — exact, all-pairs *within blocking
    * groups* (same lang) to bound the quadratic term; for the synthetic
    * corpus this is the oracle-checkable variant.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val grams = TextShingles.wordNgrams(col(textCol), n)
    val d = docs.select(col(blockCol).as("blk"), col(idCol).as("id"), grams.as("g"))
    val a = d.select(col("blk"), col("id").as("doc_a"), col("g").as("g_a"))
    val b = d.select(col("blk"), col("id").as("doc_b"), col("g").as("g_b"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding-cosine near-dup pairs via hyperplane-LSH bucketing (no
    * all-pairs): pairs in the same bucket with cosine >= threshold.
    */
  def embeddingNearDups(emb: DataFrame, idCol: String, dim: Int, threshold: Double = 0.95, bits: Int = 6): DataFrame = {
    val sig = Similarity.hyperplaneSignature(col("embedding"), dim, bits)
    val e = emb.select(sig.as("bucket"), col(idCol).as("id"), toDoubleArray(col("embedding")).as("v"))
    val a = e.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .distinct()
  }
}

/** Deterministic hash-coefficient generation shared by MinHash. */
object Hashing {
  /** Mersenne prime 2^31-1: universal-hash modulus small enough that
    * a*x+b stays below 2^62 (ANSI-safe multiplication).
    */
  val P31: Long = 2147483647L

  /** Pseudo-random coefficient in [1, P31) from (seed, idx) — splitmix64. */
  def coef(seed: Long, idx: Int): Long = {
    var z = seed + 0x9e3779b97f4a7c15L * (idx + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    ((z & Long.MaxValue) % (P31 - 1)) + 1
  }
}
