package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.similarity.Similarity

/** Streaming ANN serving: approximate top-k neighbors for a STREAM of
  * query vectors against a STATIC indexed corpus — the online half of the
  * train-once / serve-many split ([[graft.similarity.TrainedState]] holds
  * the trained centroids; the corpus is the batch-built index side).
  *
  * Shape: `foreachBatch` re-runs the SAME `ivfTopKWith` plan the batch
  * path uses on each micro-batch of queries (the [[StreamingIngest]]
  * pattern — one code path for batch and stream, so every batch-side
  * property incl. the planted-oracle contract carries over verbatim).
  * This is deliberately NOT a stream-native operator: the query-side
  * cell-ranking window is a non-time window (unsupported on streams),
  * and each micro-batch of queries is small by nature while the corpus
  * side is the 100 TB one — per-batch batch-planning against the static
  * side is the right execution model, not stateful streaming.
  *
  * At scale: the corpus side should be pre-bucketed and persisted (cell
  * assignment is corpus-sized work — do it once, not per trigger); the
  * centroids broadcast per batch is O(k · dim).
  */
object StreamingAnn {

  /** Serve `k` approximate neighbors per streamed query vector.
    *
    * @param queries streaming DataFrame with (`vec_id` LONG,
    *   `embedding` ARRAY&lt;FLOAT&gt;) — the repo-wide vector contract
    * @param corpus static indexed side (same schema)
    * @param centroids trained cells — [[graft.similarity.KMeans.fit]]
    *   output or [[graft.similarity.TrainedState.loadCentroids]]
    * @param sink receives (top-k DataFrame, batchId) per micro-batch
    */
  def serveIvf(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
               k: Int, nprobe: Int, availableNow: Boolean = false)
              (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = queries.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Similarity.ivfTopKWith(batch.toDF(), corpus, k,
          centroids, nprobe), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
