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

  /** Full streaming ADMISSION loop — the corpus-maintenance shape:
    * each micro-batch probes the CURRENT index, docs with any
    * qualifying pair (against the index or an earlier batch-mate) are
    * rejected, and the survivors' fingerprints fold in before the next
    * trigger. Per batch the sink receives one decision row per doc:
    * `(id, admitted, n_pairs)`.
    *
    * The index evolves driver-side across triggers; each fold-in is
    * localCheckpoint'ed so batch N+1's probe reads a materialized
    * index instead of N batches of stacked lineage (the
    * [[graft.similarity.DedupClusters]] truncation discipline). At
    * scale the same loop runs against a PERSISTED index path with
    * [[Fingerprint.saveIndex]]-to-new-path-and-swap between triggers —
    * this in-memory form is the single-driver variant, and its
    * decisions equal the batch-sequential reference loop exactly
    * (spec-pinned).
    */
  def admit(docs: DataFrame, initialIndex: DataFrame,
            idCol: String, textCol: String, k: Int, w: Int,
            minShared: Int, maxBucket: Int = 0,
            availableNow: Boolean = false)
           (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions._
    // mutable across triggers; foreachBatch runs serially per query
    var index = initialIndex.localCheckpoint(true)
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF().localCheckpoint(true)
        val pairs = Fingerprint.pairsAgainstIndex(b, index, idCol,
          textCol, k, w, minShared, maxBucket)
        // per-edge keep-one, the repo-wide dedup convention (see
        // SemanticDedupSpec's "per-edge, not transitive" law): the
        // HIGHER id of every qualifying pair is rejected. Under the
        // monotonic-ingest invariant (new ids > indexed ids — the
        // semanticDedupAgainstIndex contract) the indexed side is
        // always id_a, so exactly the batch dups reject.
        val pairCounts = pairs
          .groupBy(col("id_b").as("id"))
          .agg(count(lit(1)).as("n_pairs"))
        val decisions = b.select(col(idCol).cast("long").as("id"))
          .join(pairCounts, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
          .withColumn("admitted", col("n_pairs") === 0L)
          .select(col("id"), col("admitted"), col("n_pairs"))
        index = Fingerprint.foldIntoIndex(index, b, idCol, textCol, k, w,
            rejectIds = decisions.filter(!col("admitted")).select(col("id")))
          .localCheckpoint(true)
        sink(decisions, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
