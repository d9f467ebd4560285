package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`), the similarity-search extension mandated alongside the
  * reference inventory (SURVEY §2.3 Q7).
  *
  * Scale design: the probe set is small and broadcast; the corpus is the
  * 100 TB side and is read exactly once. Top-k is computed with a map-side
  * partial aggregate (min-heap per probe per partition) so the shuffle
  * carries only `#probes × k` rows per partition — NOT with a global
  * `Window.partitionBy(probe)` sort, which would shuffle every scored row.
  * The window formulation is kept for small inputs / spec cross-checking.
  */
object Similarity {

  case class Scored(score: Double, id: Long)

  /** Order: score desc, id asc — a total order, so results are deterministic
    * under any partitioning / merge order.
    */
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  /** Typed partial top-k aggregate. Buffers stay ≤ k elements, so map-side
    * combine bounds both memory and shuffle volume.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.lengthCompare(k) >= 0 && ord.gteq(a, b.last)) b
      else (b :+ a).sorted(ord).take(k)
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** Score every (probe, corpus) pair by cosine. `probes` must be small —
    * it is broadcast, producing a single pass over the corpus with no
    * shuffle of corpus rows. Scoring is the native fused-loop cosine over
    * the RAW float arrays (promotion happens inside the kernel), so the
    * whole scan+score stage is a single WholeStageCodegen span.
    */
  private def scored(corpus: DataFrame, probes: DataFrame): DataFrame = {
    val p = broadcast(
      probes.select(
        col("vec_id").as("probe_id"),
        col("embedding").as("p_emb")))
    corpus
      .select(col("vec_id"), col("embedding").as("c_emb"))
      .join(p, col("vec_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("p_emb"), col("c_emb")))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer — k-means centroids
    * trained on a driver-side SAMPLE of the corpus (Lloyd iterations in
    * plain Scala; at 100 TB the sample, not the corpus, bounds training) —
    * partitions vectors into `nCentroids` cells; each probe searches only
    * its `nProbe` nearest cells. The centroids ship as plan literals, so
    * assignment is a codegen-friendly column expression, the cell join is
    * an equi-join on the cell id, and the corpus shuffles once by cell.
    * Recall vs [[bruteForceTopK]] is measured in specs.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, sampleSize: Int = 2048): DataFrame = {
    // UNBIASED bounded sample: per-partition top-`sampleSize` by a content
    // hash (TakeOrdered — no shuffle, no full sort), which is a deterministic
    // pseudo-random selection even on sorted/clustered corpora. A plain
    // `limit(n)` would take the FIRST partitions, biasing the centroids at
    // scale.
    val sample = corpus
      .select(toDoubleArray(col("embedding")).as("v"), xxhash64(col("vec_id")).as("r"))
      .orderBy(col("r")).limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    val centroids = KMeansLite.fit(sample, nCentroids, iters = 10, seed = 42L)

    // scores[i] = dot(v, centroid_i); cells = indexes of best cells
    def cellScores(v: Column): Column =
      array(centroids.indices.map { i =>
        struct(dot(v, typedLit(centroids(i))).as("s"), lit(i).as("cell"))
      }: _*)
    def bestCell(v: Column): Column = array_max(cellScores(v)).getField("cell")
    def topCells(v: Column, n: Int): Column =
      transform(slice(reverse(array_sort(cellScores(v))), 1, n), s => s.getField("cell"))

    val c = corpus.select(col("vec_id"), col("embedding").as("c_emb"))
      .select(col("vec_id"), col("c_emb"), bestCell(col("c_emb")).as("cell"))
    val p = broadcast(
      probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
        .select(col("probe_id"), col("p_emb"),
          explode(topCells(col("p_emb"), nProbe)).as("cell")))
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    c.join(p, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), cosine(col("p_emb"), col("c_emb")).as("sim"))
      .groupBy("probe_id")
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(
        col("probe_id"),
        col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Exact top-k via map-side partial aggregation (the scale path). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    scored(corpus, probes)
      .select(col("probe_id"), struct(col("sim").as("score"), col("vec_id").as("id")).as("s"))
      .as("t")
      .groupBy("probe_id")
      .agg(topk(col("s.score"), col("s.id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(
        col("probe_id"),
        col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Reference formulation via ranking window — shuffles all scored rows;
    * used for cross-checking the aggregate path in specs.
    */
  def windowTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored(corpus, probes)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Random-hyperplane LSH signature of a vector attribute (float or double
    * array): bit i = sign(dot(v, h_i)), packed into a long. Native codegen'd
    * expression — the plane family is derived from (seed, bit, dim) inside
    * the expression ([[graft.operators.Hashing.planeVal]]), shipped as a
    * plan reference object.
    */
  def hyperplaneSignature(embAttr: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    graft.functions.VectorExprs.hyperplaneSignature(embAttr, dim, bits, seed)

  /** All (table, bucket) cells a vector lands in: `tables` independent
    * hyperplane signatures of `bits` bits each (OR-amplification — a
    * candidate pair needs to collide in ANY table, which is what gives
    * recall; each table's bits give precision).
    */
  private def lshCells(embAttr: Column, dim: Int, bits: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      struct(
        lit(t).as("tbl"),
        hyperplaneSignature(embAttr, dim, bits, seed = 42L + 1000L * t).as("bucket"))
    }: _*)

  /** ANN top-k: corpus and probes are bucketed by `tables` independent
    * hyperplane signatures; only same-(table,bucket) pairs are scored, then
    * deduped and top-k'd. Approximate — recall vs [[bruteForceTopK]] is
    * measured in specs. Scale path: one explode (×tables) of the corpus and
    * an equi-join on (table, bucket) — corpus shuffles once by cell, no
    * all-pairs scoring. The `.distinct()` on scored candidates is REQUIRED:
    * a pair colliding in m tables would otherwise occupy up to m heap slots
    * (TopKAgg does not dedup mid-buffer), evicting real neighbors. It costs
    * one shuffle of the candidate rows, bounded by corpus×tables.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, dim: Int,
      bits: Int = 8, tables: Int = 8): DataFrame = {
    val c = corpus
      .select(col("vec_id"), col("embedding").as("c_emb"))
      .select(col("vec_id"), col("c_emb"),
        explode(lshCells(col("c_emb"), dim, bits, tables)).as("cell"))
      .select(col("cell.tbl"), col("cell.bucket"), col("vec_id"), col("c_emb"))
    val p = broadcast(probes
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      .select(col("probe_id"), col("p_emb"),
        explode(lshCells(col("p_emb"), dim, bits, tables)).as("cell"))
      .select(col("cell.tbl"), col("cell.bucket"), col("probe_id"), col("p_emb")))
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    c.join(p, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), cosine(col("p_emb"), col("c_emb")).as("sim"))
      .distinct() // a pair colliding in several tables scores once
      .groupBy("probe_id")
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(
        col("probe_id"),
        col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  // ------- validated ANN forms (the oracled q17/q32 surface) -------------
  //
  // Same device as Dedup's validated near-dup gates (and q29): LSH/IVF
  // bucketing is engine-specific, so the raw ANN result can never
  // hash-match a DuckDB oracle. The validated forms emit the EXACT
  // brute-force top-k rows (DuckDB-recomputable — the proven q7 oracle
  // shape) plus one in-band `recall_ok` flag: recall@k of the approximate
  // index against that exact top-k, checked against its floor. The oracle
  // pins the flag to 1, so wrong neighbors, wrong scores, wrong ranks, OR
  // an out-of-band recall all fail the hash compare. The raw ANN
  // operators stay the production surface; these run both sides, priced
  // as a correctness gate.

  /** Q17 (validated): exact top-k + `recall_ok` pinning [[lshTopK]]. */
  def lshTopKValidated(corpus: DataFrame, probes: DataFrame, k: Int,
      dim: Int, bits: Int = 8, tables: Int = 16,
      recallFloor: Double = 0.9): DataFrame =
    Dedup.withRecallFlag(
      bruteForceTopK(corpus, probes, k),
      lshTopK(corpus, probes, k, dim, bits, tables)
        .select(col("probe_id"), col("vec_id")),
      Seq("probe_id", "vec_id"), recallFloor)

  /** Q32 (validated): exact top-k + `recall_ok` pinning [[ivfTopK]]. */
  def ivfTopKValidated(corpus: DataFrame, probes: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      recallFloor: Double = 0.7): DataFrame =
    Dedup.withRecallFlag(
      bruteForceTopK(corpus, probes, k),
      ivfTopK(corpus, probes, k, nCentroids, nProbe)
        .select(col("probe_id"), col("vec_id")),
      Seq("probe_id", "vec_id"), recallFloor)

  /** Q152: product-quantization ANN with exact re-ranking (Jégou et al.,
    * TPAMI 2011 — the FAISS `PQ` index family). Vectors are L2-normalized
    * (so inner product = cosine), split into `m` subvectors, and each
    * subvector quantized to its nearest codeword from a per-subspace
    * `ksub`-entry codebook trained driver-side on a bounded hash-ordered
    * sample (the IVF q32 sampling discipline). With ksub=16, m=8 the
    * corpus representation in the scoring scan is ONE packed long per
    * vector — 8 bytes instead of a 256-byte embedding — and scoring is
    * ADC: each probe precomputes its m×ksub dot-product lookup table
    * once (broadcast), each corpus row costs m table lookups. The top
    * `rerank·k` ADC candidates per probe are then re-scored EXACTLY by a
    * second corpus pass filtered through a broadcast hash semi-join (the
    * Spark analogue of FAISS's refine-with-stored-vectors step), so
    * final scores are true cosines and recall is the only approximation.
    *
    * Scale: codebook training is sample-bounded; encode is one map pass;
    * the ADC scan shuffles only #probes×rerank·k partial-top-k rows; the
    * rerank scan reads the corpus a second time but computes exact dots
    * for only #probes×rerank·k rows. No all-pairs anywhere.
    */
  def pqTopK(corpus: DataFrame, probes: DataFrame, k: Int, dim: Int,
      m: Int = 8, ksub: Int = 16, rerank: Int = 4,
      sampleSize: Int = 2048): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val dsub = dim / m
    val sample = corpus
      .select(l2Normalize(toDoubleArray(col("embedding"))).as("v"),
        xxhash64(col("vec_id")).as("r"))
      .orderBy(col("r")).limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    // per-subspace codebooks; short samples pad with codeword 0 (argmin
    // ties take the lowest index, so duplicated pads are never selected)
    val cb: Array[Array[Array[Double]]] = Array.tabulate(m) { mi =>
      val sub = sample.map(v =>
        java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      val cents = KMeansLite.fitL2(sub, ksub, iters = 10, seed = 42L + mi)
      Array.tabulate(ksub)(j => cents(math.min(j, cents.length - 1)))
    }
    val cbFlat: Array[Double] =
      cb.flatMap(_.flatMap(_.toSeq))
    val coded = corpus.select(col("vec_id"),
      graft.functions.PqExprs.pqEncode(
        l2Normalize(toDoubleArray(col("embedding"))), cbFlat, m, ksub, dsub)
        .as("code"))
    val lut = array((for (mi <- 0 until m; j <- 0 until ksub) yield
      dot(slice(col("p_norm"), mi * dsub + 1, dsub), typedLit(cb(mi)(j).toSeq))): _*)
    val p = broadcast(probes
      .select(col("vec_id").as("probe_id"),
        l2Normalize(toDoubleArray(col("embedding"))).as("p_norm"))
      .select(col("probe_id"), lut.as("lut")))
    val topCand = udaf(new TopKAgg(rerank * k), ExpressionEncoder[Scored]())
    val cand = coded
      .join(p, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.PqExprs.adcScore(col("code"), col("lut"), m, ksub)
          .as("adc"))
      .groupBy("probe_id")
      .agg(topCand(col("adc"), col("vec_id")).as("top"))
      .select(col("probe_id"), explode(col("top")).as("s"))
      .select(col("probe_id"), col("s.id").as("vec_id"))
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    corpus.select(col("vec_id"), col("embedding").as("c_emb"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("p_emb"))), Seq("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("p_emb"), col("c_emb")).as("sim"))
      .groupBy("probe_id")
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(
        col("probe_id"),
        col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Q152 (validated): exact top-k + `recall_ok` pinning [[pqTopK]]. */
  def pqTopKValidated(corpus: DataFrame, probes: DataFrame, k: Int,
      dim: Int, m: Int = 8, ksub: Int = 16, rerank: Int = 4,
      recallFloor: Double = 0.7): DataFrame =
    Dedup.withRecallFlag(
      bruteForceTopK(corpus, probes, k),
      pqTopK(corpus, probes, k, dim, m, ksub, rerank)
        .select(col("probe_id"), col("vec_id")),
      Seq("probe_id", "vec_id"), recallFloor)

  /** Q57: per-label embedding centroids in long `(label, dim, mean_val)`
    * layout — class prototypes for probing/NN-classifier init and dataset
    * cartography. Shape at scale: posexplode fans each vector into
    * (label, dim, x) rows that partially aggregate map-side, so the single
    * shuffle carries `#labels × dim` partial sums per partition, never raw
    * vectors.
    *
    * Determinism contract: each component is quantized to micros
    * (`floor(x·1e6 + 0.5)` — explicit half-up, engines disagree on
    * `round()` ties) and summed as BIGINT — an EXACT, order-independent
    * sum, immune to float-addition reorder under repartitioning (same
    * device as Relational.decSum for money).
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")).as("sum_micro"))
      .select(col("label"), col("dim"),
        col("n"),
        round(col("sum_micro").cast("double") / (col("n") * 1e6), 6).as("mean_val"))

  /** Q255: SIMPLIFIED SILHOUETTE per label — cluster-quality audit of
    * a labeled embedding table: for each vector, a = squared distance
    * to its OWN label centroid, b = min squared distance to any OTHER
    * centroid, s = (b − a) / max(a, b) ∈ [−1, 1]; report each label's
    * exact-count mean. The quality gate run after q55-style clustering
    * or against upstream labels before class-balanced sampling.
    * (Simplified = distance-to-centroid, the standard linear-cost
    * variant of the O(n²) classic silhouette.)
    *
    * Exactness: vectors quantize to the 1e-4 grid; centroid sums are
    * exact BIGINT, and distances compare as the rational
    * ||n_c·x − S_c||² / n_c² — the numerator an exact BIGINT sum, one
    * mirrored double divide per (vector, centroid); per-vector s
    * micro-grids to BIGINT so the label mean is an exact sum + one
    * divide (the q246 discipline).
    *
    * Scale: centroids are K·d rows (broadcast); the scoring pass is
    * one equi-join on dim — corpus × K·d, map-side aggregated back to
    * corpus × K then corpus rows; no all-pairs anywhere.
    */
  def labelSilhouette(emb: DataFrame, quantScale: Long = 10000L)
      : DataFrame = {
    require(quantScale >= 100L && quantScale <= 100000000L,
      s"quantScale out of range: $quantScale")
    val qv = emb.select(col("vec_id"), col("label").cast("long").as("own"),
      posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("own"), col("dim"),
        floor(col("x").cast("double") * quantScale + lit(0.5))
          .cast("long").as("qx"))
    val cents = qv.groupBy(col("own").as("lc"), col("dim"))
      .agg(count(lit(1)).as("nc"), sum(col("qx")).as("sc"))
    val d2 = qv
      .join(broadcast(cents), Seq("dim"))
      .groupBy(col("vec_id"), col("own"), col("lc"), col("nc"))
      .agg(sum((col("qx") * col("nc") - col("sc")) *
        (col("qx") * col("nc") - col("sc"))).as("num"))
      .select(col("vec_id"), col("own"), col("lc"),
        (col("num").cast("double") /
          (col("nc") * col("nc")).cast("double")).as("d"))
    val perVec = d2.groupBy(col("vec_id"), col("own"))
      .agg(max(when(col("lc") === col("own"), col("d"))).as("da"),
        min(when(col("lc") =!= col("own"), col("d"))).as("db"))
      .select(col("vec_id"), col("own"),
        round(lit(1000000.0) * (col("db") - col("da")) /
          greatest(col("da"), col("db"))).cast("long").as("sm"))
    perVec.groupBy(col("own").as("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("sm")).as("smsum"))
      .select(col("label"), col("n_vecs"),
        round(col("smsum").cast("double") /
          (lit(1000000.0) * col("n_vecs").cast("double")), 6)
          .as("mean_silhouette"))
  }

  /** Q164: MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
    * DIVERSIFIED top-k — the retrieval re-ranker a data-selection
    * pipeline uses where plain top-k returns k near-copies of the same
    * hit: greedily select k items maximizing
    * {{{ λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) }}}
    * over a candidate pool of the `c` most probe-similar vectors.
    *
    * Determinism: the greedy argmax runs ENTIRELY on an integer grid —
    * rel and pairwise sims quantize to micros (the same
    * BigDecimal-HALF_UP rounding Catalyst's `round` applies), the MMR
    * score is the integer `floorDiv(7·rel − 3·maxsim, 10)` (λ = 0.7 as
    * the exact rational 7/10 — DuckDB's `//` is floor division, ties
    * break to the smaller vec_id), so both engines select the identical
    * sequence; float drift cannot flip an argmax. Candidate-pool
    * membership uses the raw double ordering (sim DESC, vec_id) — the
    * same ordering, hence the same pool, on both engines (q7 precedent).
    *
    * Scale design: the corpus is touched ONCE by the broadcast-probe
    * scoring scan; the top-`c` pool cutoff is the [[windowTopK]] ranking
    * over scored rows. The greedy itself is inherently sequential in k
    * but operates on c ≤ a few dozen rows PER PROBE — it runs
    * executor-side via `flatMapGroups` (each probe's pool is one group;
    * O(k·c) 64-dim cosines per probe), so a million probes parallelize
    * across the cluster with no driver involvement and no quadratic
    * blow-up anywhere. The per-pair cosine replicates the fused kernel's
    * fold order exactly (sequential accumulators, `d/(√na·√nb)`), which
    * is what lets the oracle's `list_dot_product` chain match bit-for-bit.
    */
  def mmrTopK(corpus: DataFrame, probes: DataFrame, k: Int = 8,
      c: Int = 24, lambdaNum: Int = 7): DataFrame = {
    require(k >= 1 && c >= k, s"need 1 <= k <= c, got k=$k c=$c")
    require(lambdaNum >= 0 && lambdaNum <= 10,
      s"lambdaNum is tenths, got $lambdaNum")
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val pool = scored(corpus, probes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= c)
      .select(col("probe_id"), col("vec_id"), col("sim"),
        col("c_emb").cast("array<float>").as("v"))
      .as[(Long, Long, Double, Seq[Float])]
    val lam = lambdaNum
    val sel = pool.groupByKey(_._1).flatMapGroups { (pid, it) =>
      def micro(x: Double): Long =
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length && i < b.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          d += x * y; na += x * x; nb += y * y; i += 1
        }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val cs = it.toArray.map(t => (t._2, t._3, micro(t._3 * 1e6),
        t._4.toArray))
      val nC = cs.length
      val taken = new Array[Boolean](nC)
      // maxsim-to-selected per candidate, updated after each pick —
      // O(k·c) pair cosines total
      val maxSim = Array.fill(nC)(Long.MinValue)
      val out = Seq.newBuilder[(Long, Long, Long, Double, Long)]
      var rank = 1
      while (rank <= math.min(k, nC)) {
        var best = -1
        var bestScore = Long.MinValue
        var i = 0
        while (i < nC) {
          if (!taken(i)) {
            val ms = if (maxSim(i) == Long.MinValue) 0L else maxSim(i)
            // compare on the UNDIVIDED tenths-scale integer — floorDiv
            // collapses scores 10 apart and would coarsen tie-breaks
            val score = lam * cs(i)._3 - (10 - lam) * ms
            if (best == -1 || score > bestScore ||
              (score == bestScore && cs(i)._1 < cs(best)._1)) {
              best = i; bestScore = score
            }
          }
          i += 1
        }
        taken(best) = true
        out += ((pid, rank.toLong, cs(best)._1, cs(best)._2,
          Math.floorDiv(bestScore, 10)))
        var j = 0
        while (j < nC) {
          if (!taken(j)) {
            val s = micro(cos(cs(j)._4, cs(best)._4) * 1e6)
            if (s > maxSim(j)) maxSim(j) = s
          }
          j += 1
        }
        rank += 1
      }
      out.result().iterator
    }
    sel.toDF("probe_id", "rank", "vec_id", "s", "mmr_micro")
      .select(col("probe_id"), col("rank"), col("vec_id"),
        round(col("s"), 6).as("sim"),
        round(col("mmr_micro").cast("double") / lit(1000000.0), 6).as("mmr"))
  }

  /** Q238: SOURCE-CENTROID EMBEDDING DRIFT — pairwise cosine between
    * per-source embedding centroids, the audit that catches one crawl
    * source shifting its embedding distribution away from the rest
    * (domain drift, scraper breakage, injected content).
    *
    * Exactness: vectors quantize to the 1e-4 grid, per-source CENTROID
    * SUMS are exact BIGINT aggregations (cosine is scale-invariant, so
    * the cosine of sums IS the cosine of means — no division ever
    * happens on the distributed side), and each pair's cosine is one
    * mirrored fold/sqrt/divide chain rounded to 6 dp.
    *
    * Scale: one equi-join (docs⋈embeddings on id), one
    * map-side-combinable aggregation to |sources| rows of d sums, then
    * an all-pairs join over the SOURCE table — |sources|² pairs, a
    * dimension table by contract (the q217 source-similarity shape).
    */
  def sourceCentroidDrift(docs: DataFrame, emb: DataFrame,
      dim: Int = 64, quantScale: Long = 10000L): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim out of range: $dim")
    val j = docs.select(col("doc_id"), col("source"))
      .join(emb.select(col("vec_id").as("doc_id"),
        transform(col("embedding"), x =>
          round(lit(quantScale.toDouble) * x.cast("double")).cast("long"))
          .as("q")), Seq("doc_id"))
    val aggs = count(lit(1)).as("n") +:
      (0 until dim).map(i => sum(col("q")(i)).as(s"c$i"))
    val cents = j.groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("source"), col("n"),
        array((0 until dim).map(i => col(s"c$i")): _*).as("c"))
    // |sources| rows; consumed three times in one plan — exchange
    // reuse shares the centroid shuffle, no persist (a persist here
    // with no unpersist would leak the cache for the session)
    // pair dot products via the q217 shape — an EQUI-join on the
    // coordinate index (a `src_a < src_b` theta join alone would plan
    // a nested-loop cartesian, which PlanSpec forbids globally);
    // integer sums commute, so this equals the per-pair fold exactly
    val ce = cents.select(col("source"),
      posexplode(col("c")).as(Seq("i", "ci")))
    val dp = ce.select(col("source").as("src_a"), col("i"),
        col("ci").as("ca"))
      .join(ce.select(col("source").as("src_b"), col("i"),
        col("ci").as("cb")), Seq("i"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("ca") * col("cb")).as("dp"))
    val norms = ce.groupBy(col("source"))
      .agg(sum(col("ci") * col("ci")).as("n2"))
    val meta = cents.select(col("source"), col("n"))
    val out = dp
      .join(broadcast(norms.select(col("source").as("src_a"),
        col("n2").as("na2"))), Seq("src_a"))
      .join(broadcast(norms.select(col("source").as("src_b"),
        col("n2").as("nb2"))), Seq("src_b"))
      .join(broadcast(meta.select(col("source").as("src_a"),
        col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(meta.select(col("source").as("src_b"),
        col("n").as("n_b"))), Seq("src_b"))
      .filter(col("na2") > 0 && col("nb2") > 0)
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        round(col("dp").cast("double") /
          (sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double"))), 6).as("cos"))
    out
  }
}
