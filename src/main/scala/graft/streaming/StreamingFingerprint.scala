package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.text.Fingerprint

/** Streaming winnow-overlap admission: each micro-batch of newly
  * crawled docs is paired against the persisted fingerprint index
  * ([[Fingerprint.saveIndex]]) — the online half of the MOSS
  * lifecycle, mirroring [[StreamingRetrieval]]/[[StreamingAnn]]: the
  * batch side is small by nature, the index side is the 100 TB one and
  * never re-shuffles per trigger beyond the probe join, and one code
  * path with the batch [[Fingerprint.pairsAgainstIndex]] carries its
  * oracle-checked pair semantics (cap, redelivery collapse) to the
  * stream verbatim. Fold admitted docs in between triggers with
  * [[Fingerprint.foldIntoIndex]] + a path swap — never overwrite the
  * path a running query reads.
  */
object StreamingFingerprint {

  /** Emit `(id_a, id_b, n_shared)` overlap pairs per micro-batch of
    * `(idCol, textCol)` docs against the static index.
    *
    * The index's deduped (id, hash) projection is staged ONCE at start
    * ([[Fingerprint.stageIndexForProbe]]) — per trigger only the batch
    * side shuffles; the naive per-batch call re-deduped and re-cached
    * the whole index every trigger. A non-zero `maxBucket` still pays
    * a per-trigger window over the union (cap semantics count the
    * union's buckets); leave it 0 and cap at fold-in time when the
    * trigger cadence is tight.
    */
  def servePairs(docs: DataFrame, index: DataFrame,
                 idCol: String, textCol: String, k: Int, w: Int,
                 minShared: Int, maxBucket: Int = 0,
                 availableNow: Boolean = false)
                (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val staged = Fingerprint.stageIndexForProbe(index)
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Fingerprint.pairsAgainstIndex(batch.toDF(), staged,
          idCol, textCol, k, w, minShared, maxBucket,
          indexDeduped = true), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
