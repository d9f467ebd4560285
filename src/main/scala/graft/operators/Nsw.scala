package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Q186: GRAPH-BASED ANN — a Navigable-Small-World index (Malkov et al.
  * 2014, the single-layer ancestor of HNSW) built PER IVF CELL: the
  * missing ANN family next to LSH (q17), IVF (q32) and PQ (q152).
  * Graph indexes beat cell/bucket probing when intra-cell candidate
  * lists get long: beam search touches O(ef·m) neighbors per probe
  * instead of scanning the cell.
  *
  * Spark-native shape: a single global proximity graph is the wrong
  * unit for a cluster (construction is inherently sequential in the
  * insertion order and search is pointer-chasing), so the corpus is
  * first coarse-quantized into `nCentroids` cells — the SAME trained
  * quantizer, sampling discipline and cell equi-join as [[Similarity.ivfTopK]]
  * — and each cell builds its own in-memory NSW inside ONE
  * `flatMapGroups` group. Cells are the unit of parallelism (a
  * 1000-executor cluster builds 1000 cells concurrently) and the unit
  * of memory: a cell must fit an executor, the standard contract of
  * every sharded graph index (FAISS's IVF+HNSW quantizer has the same
  * shape). Probes are few: collected once, their `nProbe` target cells
  * computed driver-side, and shipped into the group closure — each
  * probe beam-searches only its probed cells, and a final map-side
  * partial top-k merges the per-cell results (cells are disjoint, so
  * no dedup is needed).
  *
  * Construction (classic NSW): points insert in a DETERMINISTIC
  * pseudo-random order (the repo's multiplicative-hash device — hash
  * order approximates the random insertion the NSW paper relies on for
  * navigability; ties by id) and each new point bidirectionally links
  * to its `m` nearest among the already-inserted, found by the same
  * beam search used at query time (efConstruction = ef). Search is the
  * standard greedy beam: expand the best unexpanded candidate, keep the
  * `ef` best visited, stop when the best candidate is worse than the
  * worst kept. Every comparison tie-breaks on node id, so build and
  * search are partition-invariant.
  *
  * Approximate — recall@k vs [[Similarity.bruteForceTopK]] is measured
  * in specs and pinned in-band by [[nswTopKValidated]] (the q32/q152
  * validated-gate pattern). Cell selection caps recall at the IVF
  * operating point (same cells); ef ≥ cell occupancy makes the
  * within-cell search near-exhaustive, so the measured recall tracks
  * q32's.
  */
object Nsw {

  /** Deterministic pseudo-random insertion key (the standing
    * multiplicative-hash device; non-negative ids only, like the
    * sampling family). Exposed within the library so the streaming
    * index maintainer can reproduce the batch build order exactly.
    */
  private[graft] def insertKey(id: Long): Long =
    ((id % 1000003L) * 2654435761L) >> 16

  private[graft] def cosLocal(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length && i < b.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private[graft] def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length && i < b.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** In-memory NSW over one cell's points; pts must already be in the
    * deterministic insertion order. Exposed package-private for the
    * hand-traced spec.
    */
  private[graft] final class CellGraph(pts: Array[(Long, Array[Double])],
      m: Int, ef: Int) {
    // (sim desc, node asc) is "better" — a total order, so heap pops,
    // worst-kept comparisons and link choices are all deterministic
    private val better: Ordering[(Double, Int)] =
      Ordering.by(t => (-t._1, t._2))
    private val adj = Array.fill(pts.length)(
      scala.collection.mutable.ArrayBuffer.empty[Int])

    /** Beam search over the first `upTo` inserted nodes; returns the
      * `ef` best as (sim, node), best first.
      */
    def search(q: Array[Double], upTo: Int): Array[(Double, Int)] = {
      val visited = new java.util.BitSet(upTo)
      // candidates: best-first frontier; kept: the ef best seen
      val cand = scala.collection.mutable.PriorityQueue.empty(better.reverse)
      val kept = scala.collection.mutable.PriorityQueue.empty(better)
      val e0 = (cosLocal(q, pts(0)._2), 0)
      visited.set(0); cand.enqueue(e0); kept.enqueue(e0)
      while (cand.nonEmpty) {
        val c = cand.dequeue()
        if (kept.size >= ef && better.lt(kept.head, c)) {
          cand.clear() // best frontier is worse than the worst kept
        } else {
          adj(c._2).foreach { nb =>
            if (nb < upTo && !visited.get(nb)) {
              visited.set(nb)
              val s = (cosLocal(q, pts(nb)._2), nb)
              if (kept.size < ef || better.lt(s, kept.head)) {
                cand.enqueue(s); kept.enqueue(s)
                if (kept.size > ef) kept.dequeue()
              }
            }
          }
        }
      }
      kept.dequeueAll.reverse.toArray
    }

    // classic NSW construction: link each point to its m nearest among
    // the already-inserted, bidirectionally
    (1 until pts.length).foreach { i =>
      search(pts(i)._2, i).take(m).foreach { case (_, j) =>
        adj(i) += j; adj(j) += i
      }
    }
  }

  /** [[insertKey]] as a column expression (vec ids are non-negative, so
    * the product stays below 2^51 and arithmetic shift == logical).
    */
  private[graft] def insertKeyCol(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    shiftright((id % lit(1000003L)) * lit(2654435761L), 16)

  /** Train the q32-discipline coarse quantizer on a bounded
    * hash-ordered sample of the corpus.
    */
  private[graft] def trainCentroids(corpus: DataFrame, nCentroids: Int,
      sampleSize: Int): Array[Array[Double]] = {
    val sample = corpus
      .select(toDoubleArray(col("embedding")).as("v"),
        xxhash64(col("vec_id")).as("r"))
      .orderBy(col("r")).limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    KMeansLite.fit(sample, nCentroids, iters = 10, seed = 42L)
  }

  /** Nearest-cell assignment column under a PINNED set of centroids. */
  private[graft] def bestCellCol(centroids: Array[Array[Double]],
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_max(array(centroids.indices.map { i =>
      struct(dot(v, typedLit(centroids(i))).as("s"), lit(i).as("cell"))
    }: _*)).getField("cell")

  /** nProbe target cells per probe under a pinned quantizer, computed
    * driver-side (probes are few — the broadcast-side contract of the
    * whole ANN family).
    */
  private[graft] def probeCells(probes: DataFrame,
      centroids: Array[Array[Double]], nProbe: Int)
      : Map[Int, Array[(Long, Array[Double])]] = {
    val spark = probes.sparkSession
    import spark.implicits._
    probes
      .select(col("vec_id"), toDoubleArray(col("embedding")))
      .as[(Long, Seq[Double])].collect()
      .flatMap { case (pid, e) =>
        val v = e.toArray
        centroids.indices
          .map(i => (-dotLocal(v, centroids(i)), i)).sorted.take(nProbe)
          .map { case (_, cell) => (cell, (pid, v)) }
      }
      .groupBy(_._1).map { case (c, a) => c -> a.map(_._2).sortBy(_._1) }
  }

  /** Beam search over an explicitly cell-ASSIGNED and ORDERED corpus:
    * rows (vec_id, v, cell, ord); each cell's NSW builds in (ord,
    * vec_id) order. The batch operator passes ord = [[insertKey]]; the
    * streaming maintained index appends arriving vectors with ord keys
    * that sort AFTER the pinned snapshot — incremental NSW insertion
    * realized as deterministic ordered construction (inserting into a
    * kept graph and rebuilding in the same order are the same
    * algorithm).
    */
  private[graft] def searchAssigned(assigned: DataFrame,
      probesByCell: Map[Int, Array[(Long, Array[Double])]], k: Int,
      m: Int, ef: Int): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val perCell = assigned
      .select(col("vec_id"), col("v"), col("cell"), col("ord"))
      .as[(Long, Seq[Double], Int, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (cell, it) =>
        val targets = probesByCell.getOrElse(cell, Array.empty)
        val pts = it.map(t => (t._1, t._2.toArray, t._4)).toArray
          .sortBy(t => (t._3, t._1)).map(t => (t._1, t._2))
        if (targets.isEmpty || pts.isEmpty) Iterator.empty
        else {
          val g = new CellGraph(pts, m, ef)
          targets.iterator.flatMap { case (pid, pv) =>
            g.search(pv, pts.length)
              .filter { case (_, node) => pts(node)._1 != pid }
              .take(k)
              .map { case (s, node) => (pid, pts(node)._1, s) }
          }
        }
      }
      .toDF("probe_id", "vec_id", "sim")
    // merge the (disjoint) per-cell results: map-side partial top-k
    val topk = udaf(new Similarity.TopKAgg(k),
      ExpressionEncoder[Similarity.Scored]())
    perCell
      .groupBy("probe_id")
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(
        col("probe_id"),
        col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Graph-based ANN top-k: NSW per IVF cell, beam-searched per probe.
    * Same output shape as the other ANN operators: (probe_id, vec_id,
    * sim, rank).
    */
  def nswTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, m: Int = 8, ef: Int = 32,
      sampleSize: Int = 2048): DataFrame = {
    require(k >= 1 && nProbe >= 1 && nProbe <= nCentroids && m >= 1 &&
      ef >= k, s"bad params: k=$k nProbe=$nProbe m=$m ef=$ef")
    val centroids = trainCentroids(corpus, nCentroids, sampleSize)
    val assigned = corpus
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"),
        bestCellCol(centroids, col("embedding")).as("cell"),
        insertKeyCol(col("vec_id")).as("ord"))
    searchAssigned(assigned, probeCells(probes, centroids, nProbe), k, m, ef)
  }

  /** Q186 (validated): exact top-k + `recall_ok` pinning [[nswTopK]] —
    * the q17/q32/q152 validated-gate pattern.
    */
  def nswTopKValidated(corpus: DataFrame, probes: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, m: Int = 8, ef: Int = 32,
      recallFloor: Double = 0.4): DataFrame =
    Dedup.withRecallFlag(
      Similarity.bruteForceTopK(corpus, probes, k),
      nswTopK(corpus, probes, k, nCentroids, nProbe, m, ef)
        .select(col("probe_id"), col("vec_id")),
      Seq("probe_id", "vec_id"), recallFloor)
}
