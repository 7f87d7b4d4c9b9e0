package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.multimodal.Multimodal
import graft.similarity.Similarity

/** Streaming image near-duplicate ADMISSION over pHash signatures — the
  * multimodal twin of [[StreamingFingerprint.admit]]: each micro-batch of
  * media rows is decoded to blockhash signatures inside its codec
  * partition pass ([[Multimodal.pHashSigs]] — payloads never leave the
  * executor), probed against the evolving signature index via the same
  * banded multi-probe LSH the batch pair path uses, and survivors' 8-byte
  * signatures fold in before the next trigger. Payload bytes are NEVER
  * indexed or shuffled — the index is `(id, simhash)` rows, a vanishing
  * fraction of the media bytes.
  *
  * Admission semantics are the repo-wide per-edge keep-one convention
  * under the monotonic-ingest invariant (batch ids > indexed ids, so the
  * batch side of every qualifying pair is `id_b`): an image with ANY
  * qualifying pair — against the index or an earlier batch-mate — is
  * rejected; decisions equal the batch-sequential reference loop exactly
  * (spec-pinned). The index evolves driver-side with per-trigger
  * `localCheckpoint` (the [[graft.similarity.DedupClusters]] lineage
  * truncation discipline); at scale, persist signature shards and swap
  * paths between triggers, as [[StreamingFingerprint]] documents.
  */
object StreamingMedia {

  /** Per batch the sink receives one decision row per image:
    * `(id, admitted, n_pairs)`. Non-image media rows pass through the
    * pHash stage's kind filter and never reach decisions — route them
    * to their own admission loops. */
  def admitImages(media: Dataset[Multimodal.MediaRow], initialSigs: DataFrame,
                  blocks: Int = 60, maxHamming: Int = 3, numProbes: Int = 4,
                  availableNow: Boolean = false)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // mutable across triggers; foreachBatch runs serially per query
    var index = initialSigs.select(col("id"), col("simhash"))
      .localCheckpoint(true)
    val writer = media.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Multimodal.MediaRow], batchId: Long) =>
        val sigs = Multimodal.pHashSigs(batch, blocks).localCheckpoint(true)
        val pairs = Similarity.simhashPairsFromSigs(
            index.unionByName(sigs), maxHamming, numProbes)
          // only pairs whose HIGHER side is in this batch decide
          // admission; index-internal pairs (a pre-seeded index is not
          // guaranteed dup-free) must not re-reject per trigger
          .join(sigs.select(col("id").as("id_b")), Seq("id_b"), "leftsemi")
        val counts = pairs.groupBy(col("id_b").as("id"))
          .agg(count(lit(1)).as("n_pairs"))
        val decisions = sigs.select(col("id"))
          .join(counts, Seq("id"), "left")
          .select(col("id"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
          .withColumn("admitted", col("n_pairs") === 0L)
          .select(col("id"), col("admitted"), col("n_pairs"))
          .localCheckpoint(true)
        index = index.unionByName(
            sigs.join(decisions.filter(col("admitted")).select(col("id")),
              Seq("id"), "leftsemi"))
          .localCheckpoint(true)
        sink(decisions, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
