package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.text.NgramLm

/** Streaming LM quality gating: score a stream of documents under a
  * TRAINED bigram model — the online half of the quality filter's
  * train-once / serve-many split (fit on the corpus with
  * [[NgramLm.fit]], persist the three model tables, score every newly
  * ingested document against them). Same `foreachBatch` rationale as
  * [[StreamingAnn]]/[[StreamingTokenize]]: one code path with the batch
  * [[NgramLm.scoreWith]], so the oracle-checked scoring arithmetic
  * carries to the stream verbatim; model tables are static per query,
  * vocabulary-sized, and broadcastable.
  */
object StreamingLm {

  /** Score each micro-batch of docs with the trained model.
    *
    * @param docs streaming DataFrame with (`doc_id` LONG, `text` STRING)
    * @param bigrams/ctx/vocab trained model ([[NgramLm.fit]] output)
    * @param sink receives (scored DataFrame, batchId) per micro-batch
    */
  def serveScore(docs: DataFrame, bigrams: DataFrame, ctx: DataFrame,
                 vocab: DataFrame, availableNow: Boolean = false)
                (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(NgramLm.scoreWith(batch.toDF(), "doc_id", "text",
          bigrams, ctx, vocab), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Score each micro-batch under a trained STUPID-BACKOFF model
    * ([[NgramLm.fitBackoff]] output, persisted via
    * [[graft.similarity.TrainedState.saveBackoffModel]]) — the
    * held-out-scoring serving half: arriving docs naturally exercise
    * all three backoff arms, and OOV-w3 positions drop per the batch
    * contract, which carries here verbatim (one code path,
    * [[NgramLm.scoreBackoffWith]] per batch). */
  def serveBackoffScore(docs: DataFrame, tri: DataFrame, bi: DataFrame,
                        uni: DataFrame, total: DataFrame,
                        availableNow: Boolean = false)
                       (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(NgramLm.scoreBackoffWith(batch.toDF(), "doc_id", "text",
          tri, bi, uni, total), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
