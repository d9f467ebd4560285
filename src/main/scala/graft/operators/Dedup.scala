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

  /** Q48: incremental-ingestion exact dedup — drop arriving docs whose
    * exact text already exists in the indexed corpus (the every-crawl-batch
    * operation, vs [[exact]]'s whole-corpus pass). LEFT ANTI join keyed on
    * `(xxhash64(text), text)`: the join still shuffles the text column for
    * exactness, but hashing first means the join's equality check almost
    * always rejects on the 8-byte hash without comparing full texts — and
    * the corpus side projects ONLY (hash, text), never its metadata. At
    * 100 TB the corpus side would be a bucketed table on the hash, making
    * this a zero-exchange probe of the new batch.
    */
  def incrementalExact(
      corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, carry: Seq[String]): DataFrame = {
    val ch = corpus.select(
      xxhash64(col(textCol)).as("__h"), col(textCol).as("__t"))
    val b = batch
      .select((idCol +: carry :+ textCol).map(col): _*)
      .withColumn("__h", xxhash64(col(textCol)))
    b.join(ch, b("__h") === ch("__h") && b(textCol) === ch("__t"), "left_anti")
      .select((idCol +: carry).map(col): _*)
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

  /** The hashed char-shingle set table `(id, hs)` behind both the minhash
    * LSH pipeline and the exact PPJoin ground truth — built ONE way so the
    * two subtrees CANONICALIZE EQUAL and Spark's ReuseExchange materializes
    * the repartition once per validated query (the q10/q11 gates run both
    * pipelines over the same sets; without subtree equality each side paid
    * its own scan + shingle + hash + shuffle).
    */
  private[graft] def charShingleSets(docs: DataFrame, textCol: String,
      idCol: String, shingleK: Int): DataFrame =
    // the repartition sits BELOW the shingle computation: the testdata
    // scan is one ~2 MB parquet row group = ONE partition, so computing
    // sets under the exchange would run the whole normalize+shingle+hash
    // +sort pass on a single core before any parallelism (measured: the
    // serial set build dominated the q10/q11 gates). Shuffling the raw
    // (id, text) rows first costs the same bytes and lets every core
    // build sets; consumers above still share the one exchange.
    // the set build is the FUSED window-hash kernel: one byte-offset walk
    // + one long sort per doc, no intermediate shingle strings —
    // bit-identical to hashed_sorted_set(char_shingles(...)) (parity
    // spec'd in WindowHashSpec; the r9 profile put the string-built sets
    // at ~7.6 s of the 10.2 s exact gate at sf0.1)
    Hashing.repartitionForCompute(
      docs.select(col(idCol).as("id"), col(textCol).as("__txt")), "id")
      .select(col("id"),
        graft.functions.WindowHashExprs.windowHashSortedSet(
          TextShingles.normalize(col("__txt")), shingleK).as("hs"))

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
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes): zero-width bands hash " +
        "empty slices identically for every doc, degenerating to an all-pairs join")
    val rows = numHashes / bands
    // ONE exchange: raw (id, text) rows repartition first and the native
    // codegen'd normalize/shingle/hash kernels run ABOVE it on every
    // core (see charShingleSets for why: single-row-group scans would
    // serialize anything below); all three consumers (bucketing + both
    // verification branches) reuse the same exchange.
    // Carrying sorted xxhash64 longs instead of shingle strings
    // shrinks the verification shuffle ~2× and turns per-pair Jaccard into
    // an allocation-free linear merge (collision odds and exactness:
    // see graft.functions.HashedSetExprs).
    val base = charShingleSets(docs, textCol, idCol, shingleK)
    val buckets = base
      .select(col("id"),
        graft.functions.MinHashSignatureExpr.minhashSignature(col("hs"), numHashes).as("sig"))
      .withColumn("bh", explode(bandHashes(col("sig"), bands, rows)))
      .select(col("bh.band"), col("bh.h"), col("id"))
    // Candidate pairs shuffle IDs ONLY (a pair colliding in several bands
    // dedupes here, while rows are 3 longs wide); the hashed sets are
    // re-fetched afterwards for exactly one verification per pair — at
    // scale this is the difference between shuffling gigabytes of arrays
    // and shuffling the candidate-pair edge list.
    val pairs = buckets.select(col("band"), col("h"), col("id").as("doc_a"))
      .join(buckets.select(col("band"), col("h"), col("id").as("doc_b")), Seq("band", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    pairs
      .join(base.select(col("id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(base.select(col("id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .withColumn("jaccard",
        graft.functions.HashedSetExprs.sortedLongJaccard(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  private val bitPowers: Array[Long] = Array.tabulate(64)(i => 1L << i)

  /** 64-bit SimHash from a PRE-HASHED token attribute (array<long>): bit i
    * of the fingerprint is the sign of the sum over tokens of ±1 depending
    * on bit i of the token hash. Single pass over the tokens (one aggregate
    * carrying 64 counters), then one pack step — not 64 separate traversals.
    */
  def simhashOf(hashesAttr: Column): Column = {
    val powers = typedLit(bitPowers)
    val counts = aggregate(hashesAttr, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, powers,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0L, 1).otherwise(-1)))
    aggregate(
      zip_with(counts, powers, (c, p) => when(c >= 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** 64-bit SimHash of a text column — NATIVE fused loop
    * ([[graft.functions.SimHashExpr]]): tokenizes (normalize + split), then
    * hashes each token with xxhash64 and folds the 64 counters in one tight
    * loop. Bit-identical to [[simhashOf]] over `xxhash64(token)` (same hash
    * family, same sign rule) — asserted in DedupSpec.
    */
  def simhash(text: Column): Column =
    graft.functions.SimHashExpr.simhash(split(TextShingles.normalize(text), " "))

  /** Interpreted HOF formulation of [[simhash]] (spec cross-check only). */
  def simhashHof(text: Column): Column =
    simhashOf(transform(split(TextShingles.normalize(text), " "), t => xxhash64(t)))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found by
    * banding the 64-bit fingerprint into 4 16-bit chunks (any pair within
    * Hamming distance 3 shares at least one chunk — pigeonhole).
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String, maxDist: Int = 3): DataFrame = {
    val chunks = 4
    require(maxDist >= 0 && maxDist < chunks,
      s"maxDist ($maxDist) must be < $chunks: the pigeonhole guarantee (a pair " +
        "within Hamming distance d shares at least one of d+1 chunks) breaks otherwise")
    // native fingerprint computes inline on the scan partitions — no
    // compute-repartition needed; the chunk equi-join below shuffles anyway
    val base = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
    val chunked = base
      .withColumn("chunk", explode(array((0 until chunks).map { c =>
        struct(lit(c).as("c"), shiftright(col("fp"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
      }: _*)))
      .select(col("chunk.c"), col("chunk.v"), col("id"), col("fp"))
    val a = chunked.select(col("c"), col("v"), col("id").as("doc_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("c"), col("v"), col("id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("c", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("hamming"))
      .distinct()
  }

  /** PERCEPTUAL near-dup pairs over an opaque media `binary` column —
    * the multimodal member of the near-dup family: fingerprint each
    * payload with the fixed-grid dHash kernel
    * ([[graft.functions.DHashExpr]]), then find pairs within Hamming
    * distance `maxDist` by banding the 63-bit fingerprint into 3
    * 21-bit chunks (pigeonhole: any pair within distance 2 agrees on
    * at least one chunk), the q11 SimHash blocking machinery on the
    * media axis. EXACT for maxDist <= 2 — the banded join returns
    * precisely the all-pairs Hamming result the oracle computes, never
    * running the quadratic stage: candidates come from 21-bit-chunk
    * equi-joins, so corpus-scale cost is the posting-list join, not
    * n². The kernel runs inline on the scan partitions (codegen), so
    * the only shuffle is the chunk join itself.
    */
  /** The dHash banding constant: 3 disjoint 21-bit chunks of the 63-bit
    * fingerprint — pigeonhole-exact blocking for Hamming distance <= 2.
    */
  val DHashChunks = 3

  /** Chunk array [(c, v)] of a 63-bit dHash fingerprint column. */
  def dhashChunksOf(fp: Column): Column =
    array((0 until DHashChunks).map { c =>
      struct(lit(c).as("c"),
        shiftright(fp, c * 21).bitwiseAND(lit(0x1FFFFFL)).as("v"))
    }: _*)

  /** Guard shared by the batch pair join and the streaming gate. */
  private[graft] def requireDhashDist(maxDist: Int): Unit =
    require(maxDist >= 0 && maxDist < DHashChunks,
      s"maxDist ($maxDist) must be < $DHashChunks: the pigeonhole " +
        "guarantee (a pair within Hamming distance d shares at least one " +
        "of d+1 chunks) breaks otherwise")

  def dhashNearDups(media: DataFrame, payloadCol: String, idCol: String,
      maxDist: Int = 2): DataFrame = {
    requireDhashDist(maxDist)
    // the explicit repartition is the REUSE POINT: both sides of the
    // chunk self-join read this one exchange of 16-byte (id, fp) rows,
    // so the payload scan + kernel run ONCE (without it, each side
    // recomputes the fingerprint pass — measured scans=4 vs scans=2)
    val base = media.select(col(idCol).as("id"),
        graft.functions.DHashExpr.dhash(col(payloadCol)).as("fp"))
      .repartition(col("id"))
    val chunked = base
      .withColumn("chunk", explode(dhashChunksOf(col("fp"))))
      .select(col("chunk.c"), col("chunk.v"), col("id"), col("fp"))
    val a = chunked.select(col("c"), col("v"), col("id").as("doc_a"),
      col("fp").as("fp_a"))
    val b = chunked.select(col("c"), col("v"), col("id").as("doc_b"),
      col("fp").as("fp_b"))
    a.join(b, Seq("c", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("hamming"))
      .distinct()
  }

  /** Q217: SOURCE-LEVEL similarity matrix via UNIONABLE minhash
    * sketches — which corpus sources overlap (near-mirror feeds,
    * shared boilerplate) without ever joining their contents: each
    * source's word set reduces to a `numHashes`-slot min-signature
    * (h_i(w) = ((poly(w) + i) · 2654435761) mod p over the code-point
    * polynomial — seeded, oracle-replayable), and the estimated
    * Jaccard of two sources is their slot-match fraction. The
    * signature min is ASSOCIATIVE AND COMMUTATIVE, so at 100 TB it
    * combines map-side per partition and unions incrementally as new
    * data lands — per-source state is `numHashes` longs regardless of
    * corpus size, and the pair stage is |sources|², never content ×
    * content. The exact per-pair set intersection/union attached here
    * is the VALIDATION price (the q10/q11 gate discipline): production
    * runs the sketch alone.
    *
    * Duplicated words don't perturb the sketch (min over a multiset
    * equals min over its set), so the token stream feeds the signature
    * directly — no distinct before the combine.
    */
  def sourceMinhashSimilarity(docs: DataFrame, textCol: String,
      srcCol: String, numHashes: Int = 64): DataFrame = {
    require(numHashes >= 1 && numHashes <= 1024,
      s"numHashes out of range: $numHashes")
    val words = docs.select(col(srcCol).as("src"),
        explode(split(TextShingles.normalize(col(textCol)), " "))
          .as("word"))
      .filter(col("word") =!= "")
    val sig = words
      .select(col("src"),
        graft.functions.PolyHashExprs.polyHash(col("word")).as("ph"))
      .withColumn("i", explode(sequence(lit(0L), lit(numHashes - 1L))))
      .select(col("src"), col("i"),
        pmod((col("ph") + col("i")) * lit(2654435761L),
          lit(1000000007L)).as("h"))
      .groupBy(col("src"), col("i")).agg(min(col("h")).as("mh"))
    val est = sig.select(col("src").as("src_a"), col("i"),
        col("mh").as("ha"))
      .join(sig.select(col("src").as("src_b"), col("i"),
        col("mh").as("hb")), Seq("i"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(when(col("ha") === col("hb"), 1L).otherwise(0L))
        .as("matches"))
    // exact set sizes + intersections: validation-priced ground truth
    val sets = words.distinct()
    val sizes = sets.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val inter = sets.select(col("src").as("src_a"), col("word"))
      .join(sets.select(col("src").as("src_b"), col("word")), Seq("word"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    est
      .join(inter, Seq("src_a", "src_b"), "left_outer")
      .join(broadcast(sizes.select(col("src").as("src_a"),
        col("n").as("na"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("src").as("src_b"),
        col("n").as("nb"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("matches"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("na") + col("nb") - coalesce(col("inter"), lit(0L)))
          .as("uni"))
  }

  /** Word n-gram Jaccard near-dup pairs — EXACT (same output as all-pairs
    * within `blockCol` blocks, which is what the SQL oracle computes), but
    * planned with prefix filtering (PPJoin-style): two docs with
    * Jaccard >= t must share at least one gram among each doc's
    * `|g| - ceil(t*|g|) + 1` globally-rarest grams. Candidates come from an
    * inverted-index equi-join on those prefix grams only — posting lists of
    * rare grams are short, so candidate generation is near-linear instead
    * of quadratic in the block size; each candidate pair is then verified
    * once against the full gram sets.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    // ONE exchange (cf. minhashNearDups): native n-gram construction +
    // hashing run inline on the scan partitions; the repartition
    // materializes each doc's gram set ONCE — as a sorted array of
    // xxhash64 LONGS — for the posting list and both verification
    // branches. Gram strings never leave the first projection: the
    // posting/freq joins move 8-byte keys, and per-pair Jaccard is an
    // allocation-free linear merge. A hash collision only merges two
    // grams' document frequencies / set elements (odds and exactness: see
    // graft.functions.HashedSetExprs). The prefix guarantee holds because
    // the rarest-first order is computed over the same hashed posting for
    // every document (any consistent total order works).
    // repartition the raw rows BEFORE the n-gram build (cf.
    // charShingleSets: the single-row-group scan would otherwise compute
    // every gram set on one core under the exchange)
    // gram-set build is the FUSED kernel: on normalized text every
    // space-joined n-gram is a contiguous byte slice of the source, so
    // the set is built with zero gram-string allocation — bit-identical
    // to hashed_sorted_set(word_ngrams(...)) (WindowHashSpec parity)
    val d = Hashing.repartitionForCompute(
      docs.select(col(blockCol).as("blk"), col(idCol).as("id"),
        col(textCol).as("__txt")), "id")
      .select(col("blk"), col("id"),
        graft.functions.WindowHashExprs.ngramHashSortedSet(
          TextShingles.normalize(col("__txt")), n).as("g"))
    prefixFilteredJaccardPairs(d, threshold)
  }

  /** PPJoin-style prefix-filtered exact Jaccard pairs over a pre-built
    * `(blk, id, g)` frame where `g` is a hashed sorted element set — the
    * candidate-generation + verification machinery shared by
    * [[ngramJaccardPairs]] and the validated dedup gates
    * ([[minhashValidated]], [[simhashValidated]]). Exact for its own
    * predicate: identical output to all-pairs-within-block at
    * `jaccard >= threshold`.
    */
  private[graft] def prefixFilteredJaccardPairs(
      d: DataFrame, threshold: Double): DataFrame = {
    val posting = d.select(col("blk"), col("id"), size(col("g")).as("n"),
      explode(col("g")).as("gram"))
    val freq = posting.groupBy(col("blk"), col("gram"))
      .agg(count(lit(1)).as("df"))
    // rank each doc's grams rarest-first; keep the prefix. The window
    // partitions by id ALONE (id is unique per doc, so blk is constant
    // within a partition): the posting data is already distributed by id
    // from repartitionForCompute, and Catalyst can reuse that exchange —
    // partitioning by (blk, id) would force a second shuffle for nothing.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("gram"))
    // localCheckpoint: the prefix table feeds BOTH sides of the candidate
    // join (probe + index), and Catalyst trees cannot share a non-exchange
    // subtree — without materialization the posting⋈freq join and the
    // per-doc ranking window execute TWICE (the r8 plan audit showed two
    // full Window subtrees). The table is tiny relative to the corpus
    // (≈(1−t)·Σ|set| rows, ids + two ints), so materializing it once is
    // the iterative-reuse device (cf. clusterPairs), not a cache crutch;
    // at 100 TB this would be a persisted intermediate dataset.
    // eager=false: merely CONSTRUCTING this DataFrame (explain, plan
    // specs, audits) must not launch a Spark job — the checkpoint
    // materializes on the first real action and is shared from there.
    // Tradeoff, either way: localCheckpoint blocks are UNREPLICATED
    // executor-local state — a lost executor kills the query (no lineage
    // recompute) and the whole gate reruns; acceptable for a validation
    // gate, and the reason the production operators don't checkpoint.
    // r18 (guide §2, measured): the prefix table is small BY BYTES
    // (~1 MB at sf0.1), so the pinned frame inherited AQE's coalesced
    // single partition and the candidate join below ran on ONE task
    // (555 ms single-task stage writing the whole 9 MB candidate
    // shuffle). The explicit compute repartition spreads the pin across
    // the session parallelism, keyed by the join key so BOTH sides of
    // the probe×index self-join read it co-partitioned (checkpoint
    // preserves partitioning) and the join adds no exchange.
    // r19: the pin records UnknownPartitioning (the r18 note's
    // "checkpoint preserves partitioning" does NOT hold under AQE — the
    // adaptive plan's partitioning is unknown at checkpoint time), so
    // the probe×index join re-exchanged via ENSURE_REQUIREMENTS and AQE
    // coalesced the candidate fan-out stage by its pre-fanout bytes.
    // The post-pin compute repartition is non-coalescible and reused by
    // both join sides; hash on `gram` alone still satisfies the
    // (blk, gram) join's clustering (subset key).
    val prefix = Hashing.repartitionForCompute(
      Hashing.repartitionForCompute(
        posting.join(freq, Seq("blk", "gram"))
          .withColumn("r", row_number().over(w))
          .filter(col("r") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
          .select(col("blk"), col("gram"), col("id"), col("n"), col("r")),
        "gram")
        .localCheckpoint(eager = false), "gram")
    // size filter (PPJoin's second pruning axis): jaccard(A,B) >= t forces
    // |A∩B| >= t·max(|A|,|B|) and |A∩B| <= min(|A|,|B|), so
    // min >= t·max is NECESSARY — candidates that fail it are killed at
    // the join row, before the distinct's shuffle and the set-merge
    // verification. On a low-selectivity gram family (corpus-wide char
    // shingles, where even "rare" grams post hundreds of docs) this is
    // the difference between the posting join's pair blow-up and a
    // candidate set near the true pair count. Float slack only ever KEEPS
    // a borderline pair (t·max rounds down), never drops one — exactness
    // is untouched, the verify step still decides.
    // positional filter (PPJoin's third pruning axis): grams are ranked
    // in ONE global order per block, so for a common gram at rank ra in A
    // and rb in B, the overlap is at most 1 + min(|A|−ra, |B|−rb) — and
    // jaccard ≥ t needs overlap ≥ t(|A|+|B|)/(1+t). The bound is valid at
    // the pair's FIRST common prefix gram (no common grams can precede
    // it), and filter-then-distinct keeps a pair if ANY of its matching
    // rows passes — the first-match row of every true pair does, so no
    // true pair is lost; later-match rows over-prune only themselves.
    // The 1e-9 slack keeps double rounding of t(na+nb)/(1+t) from ever
    // shaving an exact-boundary integer overlap.
    // index-prefix asymmetry (PPJoin's indexing prefix, Xiao et al. 2008):
    // a matching pair must share a gram between the LARGER record's
    // probing prefix (length n − ceil(t·n) + 1, the `prefix` frame) and
    // the SMALLER record's INDEXING prefix — the shorter
    // n − ceil(2t/(1+t)·n) + 1 head of the same globally-ordered gram
    // list. Joining probe×index instead of probe×probe cuts candidate
    // rows ~3× on a dense-vocabulary corpus (the synthetic testdata has
    // ~2k distinct shingles over 5k docs, so even "rare" prefix grams
    // post hundreds of docs and the gram join is the whole cost of the
    // validated q10/q11 gates). "Smaller" is made TOTAL via the (n, id)
    // lexicographic tiebreak, so equal-size pairs are generated exactly
    // once; output pair order is then restored to id-ascending for the
    // contract. ceil's double rounding can only lengthen a prefix (keep
    // more rows), never shorten it — exactness is untouched, and the
    // verify step still decides membership.
    val req = lit(threshold / (1.0 + threshold))
    val idxLen = col("n") -
      ceil(lit(2.0 * threshold / (1.0 + threshold)) * col("n") - lit(1e-9)) +
      lit(1)
    val index = prefix.filter(col("r") <= idxLen)
    val pairs = prefix
      .select(col("blk"), col("gram"), col("id").as("__ida"),
        col("n").as("__na"), col("r").as("__ra"))
      .join(index.select(col("blk"), col("gram"), col("id").as("__idb"),
        col("n").as("__nb"), col("r").as("__rb")), Seq("blk", "gram"))
      // b is strictly "smaller" in (n, id) order: each unordered pair
      // meets exactly once, probe side = the larger record
      .filter(col("__nb") < col("__na") ||
        (col("__nb") === col("__na") && col("__idb") < col("__ida")))
      .filter(col("__nb").cast("double") >=
        lit(threshold) * col("__na").cast("double"))
      .filter(lit(1.0) +
        least(col("__na") - col("__ra"), col("__nb") - col("__rb")).cast("double") >=
        req * (col("__na") + col("__nb")).cast("double") - lit(1e-9))
      .select(least(col("__ida"), col("__idb")).as("doc_a"),
        greatest(col("__ida"), col("__idb")).as("doc_b"))
      .distinct()
    pairs
      .join(d.select(col("id").as("doc_a"), col("g").as("g_a")), Seq("doc_a"))
      .join(d.select(col("id").as("doc_b"), col("g").as("g_b")), Seq("doc_b"))
      .withColumn("jaccard",
        graft.functions.HashedSetExprs.sortedLongJaccard(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------- validated near-dup gates (the oracled q10/q11/q18 surface) ----
  //
  // Same device as Relational.approxDistinctValidated (q29): an LSH
  // family's buckets are hash-engine-specific, so a query emitting the raw
  // candidate pairs can never hash-match a DuckDB oracle — which left the
  // whole near-dup family rows-only. These forms emit the EXACT near-dup
  // pair set (computed in-query by the prefix-filtered exact join — itself
  // the scalable PPJoin shape, not all-pairs) with its exact similarity,
  // plus one in-band `recall_ok` flag: the fraction of exact pairs the
  // approximate operator retrieved, checked against its published floor.
  // The oracle recomputes every exact column and pins `recall_ok` to the
  // constant 1 — so a wrong pair set, a wrong similarity, OR an
  // out-of-band recall all fail the hash compare. The unvalidated
  // operators above remain the production surface; these wrappers are
  // their correctness gate, priced accordingly (they run BOTH the exact
  // and the approximate pipeline).

  /** Exact-pair rows of `exact`, plus `recall_ok` = 1 iff `approx`
    * retrieved at least `floor` of them (on the `keys` identity). An empty
    * exact set passes vacuously (0 >= ceil(floor*0)). The flag is computed
    * once (single-row aggregate) and broadcast onto every output row.
    */
  private[graft] def withRecallFlag(exact: DataFrame, approx: DataFrame,
      keys: Seq[String], floor: Double): DataFrame = {
    // pinned: `marked` feeds BOTH the one-row flag aggregate and the
    // output rows — unpinned, everything above the last exchange (the
    // exact pipeline's set-merge verification) executed twice (the r18
    // stage profile showed the verification's 50 MB exchange read by
    // two ~1 s consumers re-running the jaccard merge each)
    val marked = Pinning.pin(exact.join(
      approx.select(keys.map(col): _*).distinct().withColumn("__hit", lit(1L)),
      keys, "left_outer"))
    val flag = marked.agg(
      (coalesce(sum(col("__hit")), lit(0L)) >=
        ceil(lit(floor) * count(lit(1)))).cast("int").as("recall_ok"))
    marked.drop("__hit").crossJoin(broadcast(flag))
  }

  /** EXACT char-shingle Jaccard pairs, corpus-wide (no block column) —
    * the ground-truth side of [[minhashValidated]]. Same shingle/hash
    * base as [[minhashNearDups]], same prefix-filtered plan shape as
    * [[ngramJaccardPairs]].
    */
  def charShinglePairsExact(docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, threshold: Double = 0.7): DataFrame = {
    // derive (blk, id, g) ABOVE the shared repartitioned subtree so the
    // exchange canonicalizes equal to the minhash side's and is reused
    val d = charShingleSets(docs, textCol, idCol, shingleK)
      .select(lit(0).as("blk"), col("id"), col("hs").as("g"))
    prefixFilteredJaccardPairs(d, threshold)
  }

  /** Q10 (validated): exact char-shingle near-dup pairs + `recall_ok`
    * pinning [[minhashNearDups]]'s retrieval. The LSH pairs are a SUBSET
    * of the exact set by construction (candidates are verified by the same
    * exact Jaccard), so the flag measures pure banding recall.
    */
  def minhashValidated(docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, recallFloor: Double = 0.9): DataFrame =
    withRecallFlag(
      charShinglePairsExact(docs, textCol, idCol, shingleK, threshold),
      minhashNearDups(docs, textCol, idCol, shingleK, numHashes, bands, threshold)
        .select(col("doc_a"), col("doc_b")),
      Seq("doc_a", "doc_b"), recallFloor)

  /** Q11 (validated): exact char-shingle near-dup pairs + `recall_ok`
    * pinning [[simhashNearDups]]'s retrieval of them. The ground truth is
    * the SAME exact pair family as q10's gate — the near-dup-shaped pairs
    * both sketches exist to find. A token-unigram Jaccard truth was
    * rejected: on a shared-vocabulary corpus nearly every doc pair has
    * near-identical token SETS (30k pairs at 0.8 on sf0.01), so any
    * sketch's "recall" against it is meaningless. SimHash is a
    * frequency-weighted cosine-family sketch probed against a set-Jaccard
    * truth, so the floor is its measured operating point (0.72 at sf0.01,
    * 0.73 at sf0.1), not a theoretical bound; the distributional asserts
    * stay in DedupSpec.
    */
  def simhashValidated(docs: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3, shingleK: Int = 5, exactThreshold: Double = 0.7,
      recallFloor: Double = 0.6): DataFrame =
    withRecallFlag(
      charShinglePairsExact(docs, textCol, idCol, shingleK, exactThreshold),
      simhashNearDups(docs, textCol, idCol, maxDist)
        .select(col("doc_a"), col("doc_b")),
      Seq("doc_a", "doc_b"), recallFloor)

  /** Q137: cross-document EXACT substring duplication — pairs of docs
    * sharing at least one identical `windowChars`-char substring at ANY
    * alignment, with the count of shared windows. This is the char-level,
    * stride-1 member of the dedup granularity ladder (doc → near-dup →
    * cluster → passage → SUBSTRING): token-chunk passage dedup (q108)
    * misses duplication that crosses chunk boundaries or shifts by a few
    * characters; sliding windows catch every alignment — the distributed
    * posting-list equivalent of the suffix-array substring dedup of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al. 2022, arXiv:2107.06499).
    *
    * Scale design: |text| posting rows per doc is the honest price of
    * alignment-free exactness; the two guards that keep the pair join
    * from exploding are (1) per-doc `array_distinct` before posting and
    * (2) the window document-frequency band [2, maxDocsPerWindow] — df=1
    * windows can't pair, and df > cap windows are BOILERPLATE (licenses,
    * headers) whose |df|² pair lists are noise; production pipelines
    * report them separately (Lee et al.'s frequency cutoff). Windows
    * shuffle as xxhash64 LONGS, not 40-char strings; the pair aggregate
    * counts hashes, and a final exact-substring verify is unnecessary
    * for the pair PREDICATE (a cross-doc hash collision needs ~2^32
    * distinct windows for even-odds — documented, same budget as the
    * hashed-shingle sets).
    */
  def substringDupPairs(docs: DataFrame, textCol: String, idCol: String,
      windowChars: Int = 40, maxDocsPerWindow: Int = 20): DataFrame = {
    // ONE exchange on the window key ABOVE the id-repartitioned expansion
    // (the inner repartition parallelizes the single-row-group testdata
    // scan; at real multi-file scale it is a no-op-sized safety net): the
    // df aggregate, the df-band join, and both sides of the pair
    // self-join all consume the `w` partitioning, so the posting table
    // (|text| rows per doc) shuffles once above the expansion, not three
    // times (ReuseExchange on the identical subtree; the aggregate and
    // joins below it add no new exchange). Window hashing is the fused
    // native kernel (WindowHashExprs): per-position xxhash64 over byte
    // slices of ONE shared buffer — bit-identical to
    // xxhash64(substr(...)), minus the per-position string copy and the
    // per-position Catalyst tree walk.
    val wins = Hashing.repartitionForCompute(
      Hashing.repartitionForCompute(
        docs.select(col(idCol).as("id"), col(textCol).as("__txt")), "id")
        .select(col("id"), TextShingles.normalize(col("__txt")).as("__t"))
        .filter(length(col("__t")) >= windowChars)
        .select(col("id"), explode(graft.functions.WindowHashExprs
          .windowHashes(col("__t"), windowChars)).as("w")),
      "w")
    val banded = wins
      .join(wins.groupBy(col("w")).agg(count(lit(1)).as("__df")), Seq("w"))
      .filter(col("__df").between(2, maxDocsPerWindow))
      .select(col("w"), col("id"))
    banded.select(col("w"), col("id").as("doc_a"))
      .join(banded.select(col("w"), col("id").as("doc_b")), Seq("w"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_windows"))
  }

  /** Q138: boilerplate window report — the OTHER side of [[
    * substringDupPairs]]'s frequency cap: the windows shared by MORE than
    * `minDocs` documents are licenses, navigation chrome, headers — the
    * text a pipeline strips globally rather than pairwise-dedupes (Lee et
    * al.'s frequency cutoff, reported instead of dropped). Emits each
    * boilerplate window's text and document count.
    *
    * Scale design: ONE window expansion, and window TEXT never shuffles
    * corpus-wide. The expansion emits (h = xxhash64(window), pos) structs
    * (8+4 bytes, fused native kernel — no per-position string), hash-
    * partitioned on h; the df aggregate and the survivor probe join BOTH
    * consume that one exchange. Window text is recovered AFTER the
    * frequency cut, by re-slicing each surviving (id, pos) from the
    * normalized source doc — so string work is proportional to the
    * boilerplate hits, not the corpus. No pair join anywhere (boilerplate
    * df² pair lists are exactly what this form avoids), and no forced
    * broadcast: on a 100 TB web crawl the ≥minDocs survivor set IS the
    * boilerplate of the web — potentially 10⁸⁺ rows — so the joins are
    * plain equi-joins and AQE picks broadcast only when the runtime size
    * genuinely fits. Counting on hashes carries the same cross-window
    * collision budget as q137's pairs — and the oracle groups on raw
    * text, so a collision-merged count would fail the hash compare.
    */
  def boilerplateWindows(docs: DataFrame, textCol: String, idCol: String,
      windowChars: Int = 40, minDocs: Int = 10): DataFrame = {
    // base is partitioned on id BELOW the normalize projection: the
    // expansion consumes it (single-row-group parallelism fix), and the
    // final text-recovery join on id reuses the same exchange subtree.
    val base = Hashing.repartitionForCompute(
      docs.select(col(idCol).as("id"), col(textCol).as("__txt")), "id")
      .select(col("id"), TextShingles.normalize(col("__txt")).as("__t"))
      .filter(length(col("__t")) >= windowChars)
    val hits = Hashing.repartitionForCompute(
      base.select(col("id"), explode(graft.functions.WindowHashExprs
        .windowHashPos(col("__t"), windowChars)).as("hp"))
        .select(col("id"), col("hp.h").as("h"), col("hp.pos").as("pos")),
      "h")
    val survivors = hits
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    hits
      .join(survivors, Seq("h"))
      .join(base, Seq("id"))
      .select(col("__t").substr(col("pos"), lit(windowChars)).as("win"),
        col("n_docs"))
      .distinct()
  }

  /** Q162: duplicated-span LADDER — per document, the LONGEST window
    * width from a geometric ladder at which some window of the doc also
    * occurs in another document. q137 answers "which PAIRS share 40-char
    * spans"; this answers the per-document severity question a filter
    * thresholds on: `max_dup_win = 0` is clean, `20` is phrase reuse,
    * `80` is wholesale copying — the bucketed estimate of Lee et al.
    * 2022's longest-duplicated-substring, without a distributed suffix
    * array. Monotone by construction (an 80-char cross-doc window
    * contains duplicated 40s and 20s), so "max width with a hit" is
    * well-defined.
    *
    * Scale design: ONE corpus scan expands all ladder widths in one
    * fused pass (concat of the [[graft.functions.WindowHashExprs]]
    * per-width distinct-hash kernels — (width, hash) pairs, no window
    * strings), ONE exchange hash-partitioned on the window hash that
    * both the (width, hash) document-frequency aggregate and the probe
    * join consume (partitioning on `h` clusters every (w, h) group —
    * same device as q137/q138). Posting volume is Σ_w |text| rows of 12
    * bytes; the per-doc answer re-aggregates on id. Dup decisions ride
    * xxhash64 longs; the oracle groups raw window STRINGS — the standing
    * collision audit. Docs shorter than the smallest width emit 0, not
    * nothing: a row per input doc is the filter-stage contract.
    */
  def dupSpanLadder(docs: DataFrame, textCol: String, idCol: String,
      widths: Seq[Int] = Seq(20, 40, 80)): DataFrame = {
    require(widths.nonEmpty && widths == widths.sorted && widths.head >= 2,
      s"widths must be ascending and >= 2: $widths")
    val base = Hashing.repartitionForCompute(
      docs.select(col(idCol).as("id"), col(textCol).as("__txt")), "id")
      .select(col("id"), TextShingles.normalize(col("__txt")).as("__t"))
    // the fused kernel returns an EMPTY array for docs shorter than w,
    // so no length guard is needed per rung
    val perWidth = widths.map { w =>
      transform(graft.functions.WindowHashExprs.windowHashes(col("__t"), w),
        h => struct(lit(w).as("w"), h.as("h")))
    }
    val occ = Hashing.repartitionForCompute(
      base.select(col("id"),
        explode(concat(perWidth: _*)).as("e"))
        .select(col("id"), col("e.w").as("w"), col("e.h").as("h")),
      "h")
    // df as a WINDOW COUNT riding the same h-exchange (h-partitioning
    // clusters every (w, h) group) — the df-aggregate + self-join form
    // recomputed the whole fused expansion on both sides because column
    // pruning differentiated the exchange subtrees (ScanAudit: 3 scans,
    // 0 reused; the q90 lesson)
    val hit = occ
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("w"), col("h"))))
      .filter(col("__df") >= 2)
      .groupBy(col("id"))
      .agg(max(col("w")).as("max_dup_win"))
    base.select(col("id"))
      .join(hit, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("max_dup_win"), lit(0)).cast("int").as("max_dup_win"))
  }

  /** EXACT all-pairs cosine near-dup pairs — the ground-truth side of
    * [[embeddingNearDupsValidated]]. All-pairs by design: this is the
    * validation-priced exact pass (the production surface is
    * [[embeddingNearDups]], which never goes quadratic).
    */
  def embeddingPairsExact(emb: DataFrame, idCol: String,
      threshold: Double = 0.95): DataFrame = {
    // the L2 norm is computed ONCE per vector, not once per pair: the
    // fused cosine kernel accumulates dot+both norms per pair (3N flops x
    // |pairs|), but sqrt(dot(v,v)) runs the numerically IDENTICAL
    // accumulation (x*y with x==y, same order), so dividing the pair dot
    // by the two precomputed norms is bit-for-bit the kernel's result at
    // a third of the per-pair flops — on 12.5M all-pairs rows that is the
    // dominant cost of the q18 validation gate.
    val e = emb.select(col(idCol).as("id"), col("embedding").as("v"),
      sqrt(graft.functions.VectorExprs.vecDot(col("embedding"),
        col("embedding"))).as("nrm"))
    e.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
      .join(e.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("n_b")), col("id_a") < col("id_b"))
      .withColumn("sim",
        graft.functions.VectorExprs.vecDot(col("v_a"), col("v_b")) /
          (col("n_a") * col("n_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Q18 (validated): exact cosine near-dup pairs + `recall_ok` pinning
    * [[embeddingNearDups]] (whose output is a subset of the exact set —
    * every LSH candidate is verified by the same exact cosine).
    */
  def embeddingNearDupsValidated(emb: DataFrame, idCol: String, dim: Int,
      threshold: Double = 0.95, bits: Int = 8, tables: Int = 8,
      recallFloor: Double = 0.95): DataFrame =
    withRecallFlag(
      embeddingPairsExact(emb, idCol, threshold),
      embeddingNearDups(emb, idCol, dim, threshold, bits, tables)
        .select(col("id_a"), col("id_b")),
      Seq("id_a", "id_b"), recallFloor)

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): K-MEANS CELLS as the blocking key — cluster the
    * embedding space with a sample-trained coarse quantizer (the q32 IVF
    * machinery), assign every vector to its `nAssign` nearest cells
    * (overlapping assignment buys recall the same way the LSH families
    * buy it with OR-amplification), and exact-cosine-verify only within a
    * shared cell. Complements [[embeddingNearDups]]: hyperplane LSH
    * blocks on random directions; SemDeDup blocks on the DATA's own
    * cluster structure, which is what you want when duplicates
    * concentrate in dense regions (web-crawl template families).
    *
    * Scale shape is the IVF one: the corpus shuffles once by cell id
    * (centroids are plan literals, assignment is codegen'd), pairs are
    * verified only inside a cell — never all-pairs. Cell population at
    * 100 TB is controlled by `nCells` (≈ corpus/√corpus-sized cells for
    * balanced work); precision is 1.0 because every emitted pair carries
    * the exact cosine.
    */
  def semanticNearDups(emb: DataFrame, idCol: String,
      threshold: Double = 0.95, nCells: Int = 16, nAssign: Int = 2,
      sampleSize: Int = 2048): DataFrame = {
    // bounded, deterministic, hash-ordered sample (the q32 pattern: no
    // full sort, unbiased on clustered inputs) → driver-side Lloyd
    val sample = emb
      .select(toDoubleArray(col("embedding")).as("v"),
        xxhash64(col(idCol)).as("r"))
      .orderBy(col("r")).limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    val centroids = KMeansLite.fit(sample, nCells, iters = 10, seed = 42L)
    def cellScores(v: Column): Column =
      array(centroids.indices.map { i =>
        struct(dot(v, typedLit(centroids(i))).as("s"), lit(i).as("cell"))
      }: _*)
    def topCells(v: Column, n: Int): Column =
      transform(slice(reverse(array_sort(cellScores(v))), 1, n),
        s => s.getField("cell"))
    val assigned = emb
      .select(col(idCol).as("id"), col("embedding").as("v"))
      .select(col("id"), col("v"),
        explode(topCells(col("v"), nAssign)).as("cell"))
    assigned.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
      .join(assigned.select(col("cell"), col("id").as("id_b"),
        col("v").as("v_b")), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .distinct()
  }

  /** Q120 (validated, q18 pattern): the exact cosine pair set with
    * `recall_ok` pinning [[semanticNearDups]] at its measured operating
    * point — the DuckDB oracle recomputes every exact column and pins the
    * flag to 1.
    */
  def semanticDedupValidated(emb: DataFrame, idCol: String,
      threshold: Double = 0.95, nCells: Int = 16, nAssign: Int = 2,
      recallFloor: Double = 0.5): DataFrame =
    withRecallFlag(
      embeddingPairsExact(emb, idCol, threshold),
      semanticNearDups(emb, idCol, threshold, nCells, nAssign)
        .select(col("id_a"), col("id_b")),
      Seq("id_a", "id_b"), recallFloor)

  /** Bloom-ANTI ingest gate: the "definitely new" docs of an arriving
    * batch — the ZERO-SHUFFLE approximate counterpart to
    * [[incrementalExact]]'s anti-join. The indexed corpus collapses to one
    * fixed-size bloom filter over `xxhash64(text)` (a distributed
    * aggregate; only the bit array reaches the driver), the filter
    * broadcasts, and the batch is gated by a map-only
    * `!mightContain(hash)` — the batch never shuffles AT ALL, and the
    * corpus never re-scans per batch once the filter is built.
    *
    * Error model: no false negatives (an already-seen text always hits
    * the filter and is dropped), so every emitted doc is genuinely new;
    * false positives (rate `fpp`, plus the negligible xxhash64 collision
    * mass) drop a bounded fraction of genuinely-new docs. That trade —
    * lose ~fpp of new docs, never re-admit a duplicate, touch nothing but
    * the batch scan — is the standard every-crawl-batch gate at 100 TB,
    * where q48's anti-join would shuffle each batch against the corpus
    * index. Use [[incrementalExact]] when exact recall is required.
    */
  def bloomNewDocs(
      corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, carry: Seq[String],
      expectedCorpusDocs: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    val bloom = corpus
      .select(xxhash64(col(textCol)).as("__h"))
      .stat.bloomFilter("__h", expectedCorpusDocs, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomBc.value.mightContainLong(h))
    batch
      .select((idCol +: carry :+ textCol).map(col): _*)
      .filter(!mightContain(xxhash64(col(textCol))))
      .select((idCol +: carry).map(col): _*)
  }

  /** Q122 (validated, q10/q120 pattern): the EXACT new-doc set (q48
    * semantics) with `recall_ok` pinning [[bloomNewDocs]]'s retrieval —
    * the bloom-kept set is a subset of the exact set by the no-false-
    * negative property, so the flag measures pure false-positive loss
    * against the `1 - fpp`-derived floor.
    */
  def bloomDedupValidated(
      corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, carry: Seq[String],
      expectedCorpusDocs: Long = 1000000L, fpp: Double = 0.01,
      recallFloor: Double = 0.95): DataFrame =
    withRecallFlag(
      incrementalExact(corpus, batch, textCol, idCol, carry),
      bloomNewDocs(corpus, batch, textCol, idCol, carry,
        expectedCorpusDocs, fpp).select(col(idCol)),
      Seq(idCol), recallFloor)

  /** Q89: character-level fuzzy pairs — the textbook two-stage fuzzy
    * join: cheap token-set CANDIDATE generation ([[ngramJaccardPairs]] at
    * a permissive floor — exact for its own predicate, prefix-filtered,
    * no all-pairs), then exact `levenshtein` VERIFICATION of each
    * candidate against a length-relative cap. Edit distance is O(len²)
    * per pair — the one thing you must never run all-pairs at 100 TB;
    * here it runs once per surviving candidate, on pairs that shuffle ids
    * only until the two text fetch-joins. The relative cap
    * (`dist ≤ maxRelDist · max(len)`) makes the predicate
    * length-invariant: 4 edits in a tweet is a different document, in a
    * 5 KB page it's a near-dup.
    */
  def editDistancePairs(docs: DataFrame, textCol: String, idCol: String,
      blockCol: String, n: Int = 3, jaccardFloor: Double = 0.3,
      maxRelDist: Double = 0.25): DataFrame = {
    val cand = ngramJaccardPairs(docs, textCol, idCol, blockCol, n, jaccardFloor)
      .select(col("doc_a"), col("doc_b"))
    val t = docs.select(col(idCol).as("id"),
      TextShingles.normalize(col(textCol)).as("nt"))
    val mx = greatest(length(col("t_a")), length(col("t_b"))).cast("double")
    cand
      .join(t.select(col("id").as("doc_a"), col("nt").as("t_a")), Seq("doc_a"))
      .join(t.select(col("id").as("doc_b"), col("nt").as("t_b")), Seq("doc_b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")).cast("long"))
      .filter(col("dist") <= lit(maxRelDist) * mx)
      .select(col("doc_a"), col("doc_b"), col("dist").as("edit_distance"),
        round(lit(1.0) - col("dist") / greatest(mx, lit(1.0)), 6).as("similarity"))
  }

  /** Q201: JARO-WINKLER title linkage — fuzzy pairs over a fixed-width
    * document key (the leading `titleLen` characters), scored by the
    * native [[graft.functions.JaroWinklerExprs.jaroWinkler]] kernel. The
    * proximity-and-prefix comparator complements q89's edit distance:
    * JW rewards shared prefixes and tolerates transpositions, which is
    * exactly the error model of human-keyed titles/names — and its
    * prefix bias makes PREFIX BLOCKING the canonical candidate
    * generator (pairs disagreeing on the first characters score low
    * anyway, so the equi-join on the `prefixLen`-char key is the
    * operator's own selectivity, formalized as contract).
    *
    * Scale: one scan projects (id, title); candidates are an equi-join
    * on the prefix key — no all-pairs, and the JW walk runs inside
    * whole-stage codegen once per candidate. Block occupancy is guarded
    * eagerly like [[graft.operators.Linkage]]: a hot prefix (think
    * "The " in real titles) is quadratic per block, so over-cap blocks
    * fail loudly with the offending key instead of silently launching
    * an O(occ²) stage — lengthen the prefix or pre-normalize titles.
    */
  def jaroWinklerTitlePairs(docs: DataFrame, textCol: String, idCol: String,
      titleLen: Int = 40, prefixLen: Int = 2, minJw: Double = 0.90,
      maxBlockOccupancy: Long = 100000L): DataFrame = {
    require(titleLen > prefixLen && prefixLen >= 1,
      s"bad titleLen/prefixLen: $titleLen/$prefixLen")
    val t = docs
      .select(col(idCol).as("id"),
        substring(col(textCol), 1, titleLen).as("title"))
      .withColumn("blk", substring(col("title"), 1, prefixLen))
      .localCheckpoint(false)
    val over = t.groupBy(col("blk")).agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") > maxBlockOccupancy).limit(3).collect()
    require(over.isEmpty,
      s"jaroWinklerTitlePairs: prefix block occupancy over cap " +
        s"$maxBlockOccupancy — candidate fan-out is occupancy^2 per " +
        "block; lengthen prefixLen or normalize titles. Offending: " +
        over.map(r => s"'${r.getString(0)}'=${r.getLong(1)}").mkString(", "))
    val jw = graft.functions.JaroWinklerExprs.jaroWinkler(
      col("title_a"), col("title_b"))
    t.select(col("blk"), col("id").as("doc_a"), col("title").as("title_a"))
      .join(t.select(col("blk"), col("id").as("doc_b"),
        col("title").as("title_b")), Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jw", jw)
      .filter(col("jw") >= lit(minJw))
      .select(col("doc_a"), col("doc_b"),
        floor(col("jw") * lit(1000000.0)).as("jw_micros"))
  }

  /** Embedding-cosine near-dup pairs via OR-AMPLIFIED hyperplane LSH (no
    * all-pairs): a pair is a candidate if it collides in ANY of `tables`
    * independent `bits`-bit signatures, then every candidate is verified by
    * exact cosine. OR-amplification is what gives recall — a single table is
    * AND-only: at threshold 0.95 one 6-bit signature collides true near-dups
    * with probability only ≈ (1−θ/π)⁶ ≈ 0.53, silently halving recall; with
    * 8 tables × 8 bits the collide probability at cos 0.95 is ≈ 0.99
    * (recall asserted ≥ 0.95 vs brute force in DedupSpec).
    *
    * Scale shape mirrors [[minhashNearDups]]: candidate pairs shuffle IDS
    * ONLY (deduped across tables), vectors are re-fetched for exactly one
    * native-cosine verification per pair.
    */
  def embeddingNearDups(emb: DataFrame, idCol: String, dim: Int,
      threshold: Double = 0.95, bits: Int = 8, tables: Int = 8): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col("embedding").as("v"))
    val cells = e
      .select(col("id"), explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          Similarity.hyperplaneSignature(col("v"), dim, bits, seed = 42L + 1000L * t)
            .as("bucket"))
      }: _*)).as("cell"))
      .select(col("cell.tbl"), col("cell.bucket"), col("id"))
    val pairs = cells.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(cells.select(col("tbl"), col("bucket"), col("id").as("id_b")), Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair colliding in several tables verifies once
    pairs
      .join(e.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(e.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Q55: connected-component clustering of near-dup pairs — the step
    * AFTER pair detection: near-duplication is transitive in practice
    * (A≈B≈C), so keep-one-per-cluster needs components, not pairs. Labels
    * each member doc with the MINIMUM doc id in its component (the
    * canonical representative every engine agrees on).
    *
    * Pregel-style min-label propagation: each round, every node takes the
    * min of its own label and its neighbors' labels — one shuffle join +
    * aggregation per round, converging in O(component diameter) rounds.
    * The driver loop reads ONE scalar (any-changed) per round — the
    * standard iterative-algorithm control pattern; row data never leaves
    * the executors. Each round runs exactly ONE materializing action: an
    * eager `localCheckpoint` of the round's labels carrying a `__changed`
    * flag. The checkpoint both truncates lineage (the logical plan
    * references the previous labels twice per round, so without
    * truncation the plan tree doubles every iteration — a lazy persist
    * caps only recomputation, not the exponential plan growth that stalls
    * planning on deep components) AND serves as the data the convergence
    * check scans — `isEmpty` on the flag is a limit-1 read of the
    * already-materialized blocks, not a recomputation of the join.
    * Near-dup components have tiny diameters (dups of a common
    * template), so rounds ≈ 2–3.
    *
    * THROWS `IllegalStateException` if the loop hits `maxIters` without
    * converging: a truncated run returns labels that look valid but split
    * real components — silent corruption for the downstream keep-one-per-
    * cluster step. A component with diameter > `maxIters` means the input
    * is not near-dup-shaped (e.g. a similarity threshold low enough to
    * chain the whole corpus); raise `maxIters` deliberately if that is
    * intended.
    */
  /** Q268: DUP-CLUSTER SIZE DISTRIBUTION — the histogram a dedup run
    * reports: how many near-dup clusters of each size exist, plus the
    * singleton count (docs in no cluster) as the size-1 row. The
    * cluster labels come from [[clusterPairs]] over the q55 ngram-
    * Jaccard pairs; the histogram itself is two dimension-sized
    * aggregations over the (pinned) label table, so the expensive
    * pair detection runs once.
    */
  def dupClusterSizes(docs: DataFrame, textCol: String, idCol: String,
      blockCol: String, n: Int = 3, threshold: Double = 0.5)
      : DataFrame = {
    val clusters = clusterPairs(
      ngramJaccardPairs(docs, textCol, idCol, blockCol, n, threshold),
      "doc_a", "doc_b")
    val hist = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    val singles = docs.agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(clusters.agg(count(lit(1)).as("nc"))))
      .select(lit(1L).as("cluster_size"),
        (col("nd") - col("nc")).as("n_clusters"))
    hist.unionByName(singles)
  }

  def clusterPairs(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    // both edge orientations from ONE pass over the pair pipeline — a
    // self-union would evaluate the (expensive) upstream pair detection
    // twice before the persist kicks in
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    // seed with least(id, min neighbor) — one aggregation that already
    // FINISHES every 2-node component (the overwhelmingly common near-dup
    // cluster shape), so the loop usually just confirms convergence
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("src").as("id"), least(col("src"), col("__mn")).as("label"))
      .localCheckpoint()
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid"))
        .agg(min(col("label")).as("nmin"))
      // ONE materializing action per round: the eager checkpoint carries
      // the convergence flag, so the isEmpty below scans the materialized
      // blocks (limit-1 short-circuit) instead of re-running the join
      val round = labels.join(neighborMin, labels("id") === col("nid"), "left")
        .select(labels("id"),
          least(labels("label"), coalesce(col("nmin"), labels("label"))).as("label"),
          (coalesce(col("nmin"), labels("label")) < labels("label")).as("__changed"))
        .localCheckpoint()
      converged = round.filter(col("__changed")).isEmpty
      // free the previous round's checkpoint blocks NOW (Dataset.unpersist
      // cannot reach them) — bounds live materialized copies at 2 instead
      // of one per round
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(labels)
      labels = round.select(col("id"), col("label"))
      iters += 1
    }
    edges.unpersist()
    if (!converged) {
      // reaches the checkpoint RDD through the projection — plain
      // unpersist() only talks to the cache manager
      org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(labels)
      throw new IllegalStateException(
        s"clusterPairs did not converge in $maxIters iterations — a component " +
          "has diameter > maxIters and the labels would be silently wrong. " +
          "Raise maxIters if such components are expected.")
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Q108: passage-level dedup — the dedup granularity BELOW the document:
    * boilerplate passages (license headers, navigation chrome, templated
    * intros) repeat across a corpus whose documents are otherwise unique,
    * so document-level dedup (q6/q48), near-dup (q10–q12/q18/q89) and
    * clustering (q55) all miss them. Completes the granularity ladder:
    * doc → near-dup → cluster → passage.
    *
    * Shape: each doc splits into consecutive `chunkTokens`-token chunks
    * (whitespace tokens; the last chunk may be short — dropping the ragged
    * tail would make the stripped text lossy), every chunk instance is
    * marked with its global occurrence count and whether it is the
    * CANONICAL instance (first by (doc id, position)), and docs re-assemble
    * into (duplicate-passage ratio, text with non-canonical duplicate
    * passages stripped). Stripping keeps first occurrences, so repeated
    * passages WITHIN one doc also collapse to one.
    *
    * Scale: one scan; one exchange hash-partitioned on (xxhash64(chunk),
    * chunk) — the 8-byte hash leads the key so comparisons reject cheaply,
    * exactly like [[incrementalExact]] — computing both window marks in one
    * sort, then one exchange back to doc id for re-assembly. Per-chunk
    * groups are occurrence-sized and per-doc groups are doc-sized, so
    * nothing is unbounded. The one skew caveat at extreme scale: a passage
    * repeated across billions of docs funnels its instances into one window
    * group; production would pre-aggregate counts for the heavy-hitter
    * chunks (q73's sketch finds them) — at that point only the count is
    * needed per instance, not the sort. Whitespace runs normalize to one
    * space in the stripped text (tokenization is whitespace-based, by
    * design).
    */
  def passageDedup(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int = 20, carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = chunkTokens
    // `carry` columns (functionally dependent on the id) ride the chunk
    // rows and the final group — cheaper than a corpus-wide join-back for
    // compositions that need the doc's metadata downstream (corpusPrepV2)
    // empty/whitespace-only docs tokenize to [] (split yields [""] — the
    // filter drops it), chunk to [], and vanish at the explode: a doc with
    // no passages has no passage-dedup row, in both engines
    val chunked = docs
      .select((col(idCol) +: carry.map(col) :+
        filter(split(col(textCol), "\\s+"), t => t =!= lit("")).as("__toks")): _*)
      .withColumn("__nc",
        floor((size(col("__toks")) + lit(W - 1)) / lit(W)).cast("int"))
      .withColumn("__chunks", when(col("__nc") > 0,
          transform(sequence(lit(0), col("__nc") - 1),
            i => array_join(slice(col("__toks"), i * W + 1, lit(W)), " ")))
        .otherwise(array().cast("array<string>")))
      .select((col(idCol) +: carry.map(col) :+ posexplode(col("__chunks"))): _*)
      .toDF((idCol +: carry) ++ Seq("idx", "chunk"): _*)
      .withColumn("__h", xxhash64(col("chunk")))
    val byChunk = Window.partitionBy(col("__h"), col("chunk"))
    val marked = chunked
      .withColumn("__occ", count(lit(1)).over(byChunk))
      .withColumn("__rn",
        row_number().over(byChunk.orderBy(col(idCol), col("idx"))))
    marked
      .groupBy((col(idCol) +: carry.map(col)): _*)
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        // re-assembly is doc-sized by definition (it rebuilds the doc's own
        // text), so the collect_list is bounded; nulls from the `when` are
        // skipped, array_sort orders by idx, concat_ws of nothing is ""
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__rn") === 1, struct(col("idx"), col("chunk"))))),
          s => s.getField("chunk"))).as("text_stripped"))
      .withColumn("dup_ratio",
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6))
  }

  /** Q146: containment (overlap-coefficient) near-dup pairs — pairs where
    * |A∩B| / min(|A|,|B|) >= threshold over word n-gram sets. The metric
    * Jaccard misses: a short document quoted or extended inside a longer
    * one has high containment but low Jaccard (the union is dominated by
    * the longer doc), and near-superset pairs are exactly what a
    * training-data pipeline must catch when crawls re-publish articles
    * with added boilerplate.
    *
    * Scale design — the PPJoin prefix principle adapted to containment:
    * overlap >= ceil(t·n_small) forces a common gram inside the SMALLER
    * record's first n − ceil(t·n) + 1 grams under any fixed per-record
    * order (no shared order needed for this bound: if none of the first
    * n−o+1 grams is shared, at most o−1 remain). So the probe side is
    * every record's prefix (rarest-first, so prefix grams have short
    * posting lists) joined against the FULL inverted index restricted to
    * partners LARGER in (n, id) order — each unordered pair meets exactly
    * once with the smaller record supplying the prefix. The positional
    * filter reuses the shared global (df, gram) rank: at the pair's first
    * common gram, overlap <= 1 + min(n_s − r_s, n_l − r_l), pruning
    * candidates before the distinct. There is no size filter — containment
    * imposes no size relation (that is the point of the metric) — so the
    * df-bounded prefix join IS the scale control. Verification is the
    * allocation-free sorted-long merge, overlap / min exact.
    */
  def containmentDups(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      minGrams: Int = 10,
      threshold: Double = 0.6): DataFrame = {
    val d = Hashing.repartitionForCompute(
      docs.select(col(idCol).as("id"), col(textCol).as("__txt")), "id")
      .select(col("id"),
        graft.functions.WindowHashExprs.ngramHashSortedSet(
          TextShingles.normalize(col("__txt")), n).as("g"))
      .filter(size(col("g")) >= minGrams)
    val posting = d.select(col("id"), size(col("g")).as("nn"),
      explode(col("g")).as("gram"))
    val freq = posting.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("gram"))
    // ranked full posting: probe prefix AND larger-side index both come
    // from this one frame — localCheckpoint for the same tree-sharing
    // reason as prefixFilteredJaccardPairs (lazy: no job on construction)
    // r18: compute-repartitioned by the join key before the pin for the
    // same reason as prefixFilteredJaccardPairs — the pinned frame
    // otherwise inherits AQE's one coalesced partition and the prefix×
    // index join below runs single-task; keyed on `gram` so both join
    // sides read it co-partitioned
    // r19: plus the post-pin repartition — the pin's UnknownPartitioning
    // let AQE coalesce the prefix×index fan-out (see
    // prefixFilteredJaccardPairs)
    val ranked = Hashing.repartitionForCompute(
      Hashing.repartitionForCompute(
        posting.join(freq, Seq("gram"))
          .withColumn("r", row_number().over(w))
          .select(col("gram"), col("id"), col("nn"), col("r")),
        "gram")
        .localCheckpoint(eager = false), "gram")
    val probe = ranked.filter(
      col("r") <= col("nn") - ceil(lit(threshold) * col("nn")) + 1)
    val pairs = probe
      .select(col("gram"), col("id").as("__ids"), col("nn").as("__ns"),
        col("r").as("__rs"))
      .join(ranked.select(col("gram"), col("id").as("__idl"),
        col("nn").as("__nl"), col("r").as("__rl")), Seq("gram"))
      // l strictly larger in (n, id): each unordered pair generated once,
      // with the smaller record on the prefix side
      .filter(col("__ns") < col("__nl") ||
        (col("__ns") === col("__nl") && col("__ids") < col("__idl")))
      // positional: overlap <= 1 + min(remaining) must reach t·n_small;
      // 1e-9 slack only ever keeps a boundary pair
      .filter(lit(1.0) +
        least(col("__ns") - col("__rs"), col("__nl") - col("__rl")).cast("double") >=
        lit(threshold) * col("__ns").cast("double") - lit(1e-9))
      .select(least(col("__ids"), col("__idl")).as("doc_a"),
        greatest(col("__ids"), col("__idl")).as("doc_b"))
      .distinct()
    pairs
      .join(d.select(col("id").as("doc_a"), col("g").as("g_a")), Seq("doc_a"))
      .join(d.select(col("id").as("doc_b"), col("g").as("g_b")), Seq("doc_b"))
      .withColumn("containment",
        graft.functions.HashedSetExprs.sortedLongOverlap(col("g_a"), col("g_b"))
          .cast("double") /
          least(size(col("g_a")), size(col("g_b"))).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("containment"), 6).as("containment"))
  }

  /** Q156: the containment KEEP POLICY — the pipeline step q146's pair
    * report exists for: drop each containment pair's CONTAINED side (the
    * smaller gram set — the quoted/derived document), keep supersets and
    * everything unpaired. Loser rule is total: smaller gram count, ties
    * to the HIGHER doc id (the later crawl is the derivative copy).
    * A doc contained in several supersets is dropped once (distinct
    * losers); survivors emit with their gram count. Scale: the pair set
    * is tiny relative to the corpus, so the prune is one broadcast-able
    * left-anti join over the sized corpus.
    */
  def containmentPrune(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      minGrams: Int = 10,
      threshold: Double = 0.6): DataFrame = {
    val sized = docs.select(col(idCol).as("doc_id"),
      size(graft.functions.WindowHashExprs.ngramHashSortedSet(
        TextShingles.normalize(col(textCol)), n)).as("n_grams"))
    val pairs = containmentDups(docs, textCol, idCol, n, minGrams, threshold)
    val losers = pairs
      .join(sized.select(col("doc_id").as("doc_a"), col("n_grams").as("__na")),
        Seq("doc_a"))
      .join(sized.select(col("doc_id").as("doc_b"), col("n_grams").as("__nb")),
        Seq("doc_b"))
      .select(when(col("__na") < col("__nb"), col("doc_a"))
        .when(col("__nb") < col("__na"), col("doc_b"))
        .otherwise(greatest(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    sized.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Q147: sorted-neighborhood near-dup pairs (Hernández & Stolfo's
    * merge/purge SNM, the third blocking family next to LSH banding and
    * prefix filtering): sort records by a cheap surrogate key (here the
    * first `keyChars` of the normalized text), then compare each record
    * only to its `window` successors in sort order, verifying candidates
    * with exact word-n-gram Jaccard. Catches near-dups whose edits are
    * late in the document (shared prefix ⇒ adjacent in sort order) at
    * O(n·window) comparisons.
    *
    * Scale design: blocking on the first `blockChars` characters makes
    * the sort a per-block WINDOW (partitionBy block — no global
    * row_number, no single-partition sort); blocks distribute across the
    * cluster and the per-block neighbor self-join is rank-banded, so the
    * shuffle moves (block, rank, gram-set) rows once. A skewed block
    * (every web page starting "<!doctype html>") is the method's known
    * failure mode — at 100 TB pick key offsets past common boilerplate or
    * run multi-pass SNM with rotated keys; the parameters expose that
    * choice.
    */
  def sortedNeighborhoodPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      blockChars: Int = 2,
      keyChars: Int = 30,
      window: Int = 5,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val d = Hashing.repartitionForCompute(
      docs.select(col(idCol).as("id"), col(textCol).as("__txt")), "id")
      .select(col("id"), TextShingles.normalize(col("__txt")).as("__nt"))
      .select(col("id"),
        substring(col("__nt"), 1, blockChars).as("blk"),
        substring(col("__nt"), 1, keyChars).as("key"),
        graft.functions.WindowHashExprs.ngramHashSortedSet(col("__nt"), n)
          .as("g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("key"), col("id"))
    val r = d.withColumn("rn", row_number().over(w))
    r.select(col("blk"), col("rn").as("__ra"), col("id").as("__ida"),
        col("g").as("g_a"))
      .join(r.select(col("blk"), col("rn").as("__rb"), col("id").as("__idb"),
        col("g").as("g_b")), Seq("blk"))
      .filter((col("__rb") - col("__ra")).between(1, window))
      .withColumn("jaccard",
        graft.functions.HashedSetExprs.sortedLongJaccard(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select(least(col("__ida"), col("__idb")).as("doc_a"),
        greatest(col("__ida"), col("__idb")).as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}

/** Shared helpers for the dedup family. */
object Hashing {

  /** Hash-repartition with an EXPLICIT partition count before a CPU-bound
    * stage. The explicit count matters: AQE coalesces ordinary small-by-bytes
    * shuffles down to one partition, which serializes interpreted-HOF
    * compute; a user repartition with a stated count is exempt from
    * coalescing.
    */
  def repartitionForCompute(df: DataFrame, key: String): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt,
      col(key))

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

  /** Deterministic hyperplane component in [-1, 1) from (seed, plane, dim
    * index) — splitmix64. Shared by the native
    * [[graft.functions.HyperplaneSignatureExpr]] so every signature consumer
    * draws from the same plane family.
    */
  def planeVal(seed: Long, i: Int, j: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * (i.toLong * 131071L + j + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }
}
