package graft.operators

import org.apache.spark.sql.DataFrame

/** Row pinning for determinism-load-bearing intermediates — the frames
  * whose RE-EVALUATION could change the answer, not just the speed:
  * range-partitioner boundaries are SAMPLED, so a plan that reads a
  * range-sorted frame twice (driver-collected partials + the
  * distributed pass, ExactSubstr's rank rounds, Pipelines' packing
  * `__pid`s) must read the one materialized shuffle output, never a
  * recomputation.
  *
  * Strategy is pluggable per session:
  *  - DEFAULT: `localCheckpoint` — executor-local blocks, no extra IO,
  *    the right local/single-JVM choice. NOT fault-tolerant: on a real
  *    cluster an executor loss discards its blocks and the job DIES
  *    instead of recomputing (Spark cannot recompute a truncated
  *    lineage).
  *  - CLUSTER: set `spark.graft.reliableCheckpointDir` to an
  *    HDFS/object-store path and pins become reliable `checkpoint`s —
  *    lineage truncates to files that survive executor loss, at the
  *    cost of one write+read of the pinned frame. At 100 TB this is
  *    the correct trade: the pinned frames are reduced intermediates,
  *    and a dead executor must not kill a multi-hour dedup job.
  */
object Pinning {

  val ReliableDirKey = "spark.graft.reliableCheckpointDir"

  /** Pin `df`'s rows under the session's configured strategy. Lazy by
    * default (materializes on first action), mirroring
    * `localCheckpoint(false)`.
    */
  def pin(df: DataFrame, eager: Boolean = false): DataFrame =
    df.sparkSession.conf.getOption(ReliableDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir is idempotent for the same path; respect a
        // dir the caller already set only if none is configured here
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
}
