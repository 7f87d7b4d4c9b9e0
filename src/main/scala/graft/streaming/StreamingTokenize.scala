package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.text.BpeTrain

/** Streaming BPE tokenization: apply a TRAINED merge table to a stream
  * of documents — the online half of the tokenizer's train-once /
  * serve-many split (train on the corpus with [[BpeTrain.merges]],
  * persist the k-row table, tokenize every newly ingested document with
  * it). Same `foreachBatch` rationale as [[StreamingAnn]]: one code
  * path with the batch [[BpeTrain.applyMerges]], so the batch-side
  * contract (and its oracle-checked merge semantics) carries over
  * verbatim; the per-batch work is MAP-ONLY, so there is no state and
  * no shuffle per trigger.
  */
object StreamingTokenize {

  /** Tokenize each micro-batch of docs with the trained merges.
    *
    * @param docs streaming DataFrame with (`doc_id` LONG, `text` STRING)
    * @param mergeTable trained merge table ([[BpeTrain.merges]] output,
    *   static — read it once, it parameterizes every batch identically)
    * @param sink receives ((doc_id, tokens) DataFrame, batchId)
    */
  def serveBpe(docs: DataFrame, mergeTable: DataFrame,
               availableNow: Boolean = false)
              (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // collect ONCE at query start, not per batch — the merge table is
    // k rows and static by contract
    val ms = BpeTrain.collectMerges(mergeTable)
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(BpeTrain.applyMerges(batch.toDF(), "doc_id", "text",
          localMergeDf(batch.sparkSession, ms)), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Rebuild a local merge DataFrame from the collected list (keeps
    * applyMerges' signature uniform between batch and stream). */
  private def localMergeDf(spark: org.apache.spark.sql.SparkSession,
                           ms: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    ms.zipWithIndex
      .map { case ((p, m), i) => (i.toLong + 1, p, m, 0L) }
      .toDF("rank", "pair", "merged", "freq")
  }
}
