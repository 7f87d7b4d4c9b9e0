package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.text.Retrieval

/** Streaming BM25 serving: top-k docs for a STREAM of term-set queries
  * against a static persisted postings index
  * ([[graft.similarity.TrainedState.saveRetrievalIndex]]) — the online
  * half of the retrieval lifecycle. Same `foreachBatch` rationale as
  * [[StreamingAnn]]: each micro-batch of queries is small by nature
  * while the index side is the 100 TB one, and one code path with the
  * batch [[Retrieval.topK]] carries the oracle-checked scoring
  * arithmetic to the stream verbatim.
  */
object StreamingRetrieval {

  /** Serve top-k BM25 docs per streamed query.
    *
    * @param queries streaming DataFrame with (`query_id` LONG,
    *   `terms` ARRAY&lt;STRING&gt;)
    * @param sink receives (top-k DataFrame, batchId) per micro-batch
    */
  def serveTopK(queries: DataFrame, postings: DataFrame,
                terms: DataFrame, docLens: DataFrame, stats: DataFrame,
                k: Int, availableNow: Boolean = false)
               (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = queries.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Retrieval.topK(batch.toDF(), postings, terms, docLens,
          stats, k), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
