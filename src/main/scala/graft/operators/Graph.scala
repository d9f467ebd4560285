package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality — the crawl-frontier/domain-authority
  * primitive of a web-scale training-data pipeline (crawlers rank hosts
  * by link centrality before spending fetch budget; mixture builders
  * weight sources by the same signal). The reference engine has no graph
  * operator, so this extends the training-pipeline surface next to the
  * component labeling in [[Dedup.clusterPairs]]: that one answers "which
  * docs form one near-dup cluster", this one answers "which nodes matter".
  *
  * Everything runs on an EXACT INTEGER grid (micro-units, floor division)
  * so a power iteration produces the SAME longs on every engine and every
  * partitioning — the q133/q151 determinism discipline applied to an
  * iterative fixpoint, where float drift would otherwise compound per
  * round.
  */
object Graph {

  /** Q158: damped PageRank over a directed edge list, `iters` fixed
    * power-iteration rounds.
    *
    * Grid semantics (both engines, bit-for-bit): every node starts at
    * rank 1,000,000 micro-units (so the uniform prior 1/N scales out of
    * every formula); one round is
    * {{{ r'(v) = 150000 + (85 * Σ_{(u,v)∈E} (r(u) div deg(u))) div 100 }}}
    * — i.e. damping 0.85 with the classic (1−d) teleport term, all in
    * BIGINT floor division (`div` here ≡ DuckDB `//`: both truncate
    * toward zero, identical on the non-negative ranks this loop
    * produces). Nodes are assumed to have outdegree ≥ 1 (callers feeding
    * an undirected graph emit both orientations, cf. [[Dedup.clusterPairs]];
    * dangling mass is deliberately dropped, the common web-graph choice).
    *
    * Scale design: the edge list is the only corpus-sized table. It is
    * persisted ONCE and every round reuses it — per round exactly one
    * shuffle join (ranks onto edges by src; the vocabulary-sized rank
    * table broadcasts when it fits) and one aggregation exchange on dst.
    * Rank rows never exceed |V|; row data never visits the driver. The
    * loop's lineage grows linearly (each round references the previous
    * once — NOT the exponential doubling of the min-label loop), so a
    * lineage-truncating eager `localCheckpoint` fires only every 8th
    * round; the returned frame is checkpointed so the caller's actions
    * replay nothing and the edge cache can be dropped eagerly.
    */
  def pageRankMicros(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("node"),
      lit(1000000L).as("rank"))
    var round = 0
    while (round < iters) {
      // name-based join condition: `src` exists only on the left, `node`
      // only on the right — round k+1's rank lineage contains round k's
      // copy of the edge attributes, so dataframe-captured column refs
      // would hit the classic self-join ambiguity
      val next = e.join(deg, Seq("src"))
        .join(ranks, col("src") === col("node"))
        .groupBy(col("dst").as("__dst"))
        .agg(sum(expr("rank div deg")).as("__in"))
        .select(col("__dst").as("node"),
          (lit(150000L) + expr("(85 * __in) div 100")).as("rank"))
      round += 1
      ranks = if (round % 8 == 0) next.localCheckpoint() else next
    }
    val out = ranks.localCheckpoint()
    e.unpersist()
    out
  }
}
