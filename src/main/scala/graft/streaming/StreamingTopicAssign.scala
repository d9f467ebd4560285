package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TopicModel

/** Streaming dual of q230: classify arriving documents against a
  * trained pLSA topic-word table, one micro-batch at a time — the
  * ingest-time topic router (mixture balancing, per-topic quotas,
  * drift alerts on topic shares).
  *
  * Per batch this is exactly [[TopicModel.assignTopics]] — a
  * stream-static equi-join on word plus one per-doc aggregation, all
  * on the training grid, so the stream's union over batches equals the
  * batch assignment of the same documents (StreamingTopicAssignSpec
  * pins the parity). Stateless by design: each document is classified
  * once at arrival; `pwzSource` is re-read per batch, so a refreshed
  * model takes effect at the next micro-batch (the
  * [[StreamingNearDup.ingestGateRefreshing]] form).
  */
object StreamingTopicAssign {

  /** foreachBatch gate: classify each arriving batch against
    * `pwzSource()` and hand (assignments, batchId) to `sink`.
    */
  def assignGate(stream: DataFrame, pwzSource: () => DataFrame,
      textCol: String, idCol: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit, k: Int = 3,
      gridScale: Long = 1000000000L): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        sink(TopicModel.assignTopics(b, pwzSource(), textCol, idCol, k,
          gridScale), batchId)
      }
      .start()
}
