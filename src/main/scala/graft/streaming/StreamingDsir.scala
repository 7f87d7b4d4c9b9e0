package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.text.Dsir

/** Streaming DSIR selection scoring: weigh a stream of candidate
  * documents under a TRAINED importance model — the online half of
  * data selection's train-once / serve-many split (train the two-model
  * log-ratio table on the reference corpus with [[Dsir.model]], persist
  * it ([[graft.similarity.TrainedState.saveDsirModel]]), score every
  * newly crawled document against it at ingest). Same `foreachBatch`
  * rationale as [[StreamingLm]]: one code path with the batch
  * [[Dsir.score]], so the oracle-checked arithmetic carries to the
  * stream verbatim. Serving contract: tokens outside the model
  * vocabulary join away (contribute nothing and don't count toward
  * `n_toks`) — the trained-corpus convention [[graft.text.NgramLm]]
  * established.
  */
object StreamingDsir {

  /** Score each micro-batch of docs with the trained model.
    *
    * @param docs streaming DataFrame with (`doc_id` LONG, `text` STRING)
    * @param model trained importance table ([[Dsir.model]] output)
    * @param sink receives (scored DataFrame, batchId) per micro-batch
    */
  def serveScore(docs: DataFrame, model: DataFrame,
                 availableNow: Boolean = false)
                (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Dsir.score(batch.toDF(), "doc_id", "text", model), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
