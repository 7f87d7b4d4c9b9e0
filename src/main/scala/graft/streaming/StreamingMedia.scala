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
  * Admission semantics: a batch image with ANY qualifying pair against
  * an INDEXED image (regardless of which side of the pair its id lands
  * on — no monotonic-id invariant is assumed; a batch id LOWER than its
  * indexed match still rejects) or against a lower-id batch-mate
  * (per-edge keep-one, the repo-wide convention) is rejected; decisions
  * equal the batch-sequential reference loop exactly (spec-pinned,
  * including the low-id arrival). The index evolves driver-side with
  * per-trigger
  * `localCheckpoint` (the [[graft.similarity.DedupClusters]] lineage
  * truncation discipline); at scale, persist signature shards and swap
  * paths between triggers, as [[StreamingFingerprint]] documents.
  */
object StreamingMedia {

  /** Streaming audio admission: per micro-batch, keep clips carrying at
    * least `minActiveWindows` voice-active windows
    * ([[Multimodal.vadSegments]] — the [[graft.multimodal.MediaPipeline]]
    * speech gate, stage-for-stage) and emit one decision row per clip:
    * `(id, admitted, n_active)`. STATELESS — each clip's decision
    * depends only on its own windows, so there is no index to evolve
    * and redelivery is idempotent by construction; the batch operator
    * runs verbatim per trigger. */
  def admitAudio(media: Dataset[Multimodal.MediaRow], window: Int,
                 tau: Int, minActiveWindows: Int = 1,
                 availableNow: Boolean = false)
                (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = media.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Multimodal.MediaRow], batchId: Long) =>
        val active = Multimodal.vadSegments(batch, window, tau)
          .groupBy(col("media_id").as("id"))
          .agg(sum(col("n_windows")).as("n_active"))
        val decisions = batch.toDF()
          .filter(col("kind") === "audio")
          .select(col("media_id").as("id"))
          .join(active, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("n_active"), lit(0L)).as("n_active"))
          .withColumn("admitted", col("n_active") >= minActiveWindows)
          .select(col("id"), col("admitted"), col("n_active"))
        sink(decisions, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Streaming VIDEO content-ID admission — completes the media trio
    * (images: whole-image pHash; audio: VAD gate; video: per-frame
    * signatures): each micro-batch's videos decode to per-frame spread
    * blockhash signatures inside the codec pass
    * ([[Multimodal.framePHashSigs]] — frame ids packed
    * `media·2²⁰+frame`, payloads never shuffle), and a video is
    * REJECTED when at least `minSharedFrames` of its DISTINCT frames
    * near-match (hamming ≤ maxHamming, banded multi-probe LSH — the
    * m_frame_dedup cross-video contract) frames of an INDEXED video
    * (either pair orientation) or of a LOWER-media batch-mate
    * (per-edge keep-one). Admitted videos' frame signatures fold into
    * the index by REPLACEMENT (the [[admitImages]] redelivery rule: a
    * redelivered media id with changed content updates its frames);
    * same-media pairs never count (a redelivery is not its own dup),
    * and index-internal pairs never re-reject.
    *
    * Decision rows per batch video: `(id, admitted, n_matched_frames)`
    * — matched frames counted DISTINCT on the batch video's side (one
    * batch frame matching five foreign frames is ONE shared frame:
    * the content-ID overlap metric, not a pair count). */
  def admitVideos(media: Dataset[Multimodal.MediaRow],
                  initialFrameSigs: DataFrame, blocks: Int = 60,
                  maxHamming: Int = 3, numProbes: Int = 4,
                  minSharedFrames: Int = 1, availableNow: Boolean = false)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(minSharedFrames >= 1,
      s"admitVideos: minSharedFrames=$minSharedFrames must be >= 1")
    val pack = Multimodal.FramePack // 2^20 — the shift below IS div(pack)
    def mediaOf(c: org.apache.spark.sql.Column) =
      shiftright(c, 20)
    var index = initialFrameSigs.select(col("id"), col("simhash"))
      .localCheckpoint(true)
    // one owner token per operator instance: this loop's release drains
    // ONLY its own staged entries — a concurrent pipeline's
    // not-yet-materialized persist is never caught in the drain
    val stageTok = s"admitVideos-${java.util.UUID.randomUUID()}"
    val writer = media.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Multimodal.MediaRow], batchId: Long) =>
       graft.similarity.StagedCache.scoped(stageTok) {
        val sigs = Multimodal.framePHashSigs(batch, blocks)
          .select((col("media_id") * pack + col("frame_idx")).as("id"),
            col("simhash"))
          .localCheckpoint(true)
        val pairs = Similarity.simhashPairsFromSigs(
            index.unionByName(sigs), maxHamming, numProbes)
          .select(col("id_a"), mediaOf(col("id_a")).as("media_a"),
            col("id_b"), mediaOf(col("id_b")).as("media_b"))
          .filter(col("media_a") =!= col("media_b"))
          .localCheckpoint(true)
        val batchMedia = batch.toDF().filter(col("kind") === "video")
          .select(col("media_id")).distinct().localCheckpoint(true)
        val idxMedia = index.select(mediaOf(col("id")).as("media_id"))
          .distinct()
        // a batch frame counts toward ITS video's rejection when the
        // other side's video is indexed (either orientation) or a
        // lower batch-mate — the admitImages decision rule, lifted
        // from whole images to frames
        val vsIdxA = pairs
          .join(batchMedia.select(col("media_id").as("media_a")),
            Seq("media_a"), "leftsemi")
          .join(idxMedia.select(col("media_id").as("media_b")),
            Seq("media_b"), "leftsemi")
          .select(col("media_a").as("id"), col("id_a").as("frame"))
        val vsIdxB = pairs
          .join(batchMedia.select(col("media_id").as("media_b")),
            Seq("media_b"), "leftsemi")
          .join(idxMedia.select(col("media_id").as("media_a")),
            Seq("media_a"), "leftsemi")
          .select(col("media_b").as("id"), col("id_b").as("frame"))
        val vsMate = pairs // id_a < id_b implies media_a < media_b here
          .join(batchMedia.select(col("media_id").as("media_a")),
            Seq("media_a"), "leftsemi")
          .join(batchMedia.select(col("media_id").as("media_b")),
            Seq("media_b"), "leftsemi")
          .select(col("media_b").as("id"), col("id_b").as("frame"))
        val counts = vsIdxA.unionByName(vsIdxB).unionByName(vsMate)
          .groupBy(col("id"))
          .agg(countDistinct(col("frame")).as("n_matched_frames"))
        val decisions = batchMedia.select(col("media_id").as("id"))
          .join(counts, Seq("id"), "left")
          .select(col("id"), coalesce(col("n_matched_frames"), lit(0L))
            .as("n_matched_frames"))
          .withColumn("admitted", col("n_matched_frames") < minSharedFrames)
          .select(col("id"), col("admitted"), col("n_matched_frames"))
          .localCheckpoint(true)
        // fold admitted videos' frames in by REPLACEMENT
        val admitted = decisions.filter(col("admitted")).select(col("id"))
        val admittedSigs = sigs
          .join(admitted.select(col("id").as("_m")),
            mediaOf(col("id")) === col("_m"), "leftsemi")
        index = index
          .join(admitted.select(col("id").as("_m")),
            mediaOf(col("id")) === col("_m"), "left_anti")
          .unionByName(admittedSigs)
          .localCheckpoint(true)
        sink(decisions, batchId)
        // outputs are all eagerly checkpointed — drain the banded cache
        // entry this trigger's simhashPairsFromSigs staged (else one
        // entry leaks per trigger; see [[StagedCache]])
        graft.similarity.StagedCache.release()
        ()
       }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** [[admitVideos]] resumed from a SAVED frame-signature index
    * ([[Multimodal.saveSigIndex]] over framePHashSigs' packed ids) with
    * its recorded `blocks` parameter — the misuse-proof restart path,
    * same contract as [[admitImagesFromSaved]]. */
  def admitVideosFromSaved(media: Dataset[Multimodal.MediaRow],
                           spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, maxHamming: Int = 3,
                           numProbes: Int = 4, minSharedFrames: Int = 1,
                           availableNow: Boolean = false)
                          (sink: (DataFrame, Long) => Unit): StreamingQuery =
    admitVideos(media, Multimodal.loadSigIndex(spark, indexPath),
      Multimodal.loadSigIndexParams(spark, indexPath), maxHamming,
      numProbes, minSharedFrames, availableNow)(sink)

  /** Resume the admission loop from a SAVED signature index with its
    * own recorded `blocks` parameter — the misuse-proof restart path
    * (the [[graft.text.Fingerprint.pairsAgainstSavedIndex]]
    * convention): the caller cannot supply a block count that disagrees
    * with what built the index, which would make every batch-vs-index
    * hamming distance meaningless and silently admit near-dups of
    * indexed images. */
  def admitImagesFromSaved(media: Dataset[Multimodal.MediaRow],
                           spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, maxHamming: Int = 3,
                           numProbes: Int = 4, availableNow: Boolean = false)
                          (sink: (DataFrame, Long) => Unit): StreamingQuery =
    admitImages(media, Multimodal.loadSigIndex(spark, indexPath),
      Multimodal.loadSigIndexParams(spark, indexPath), maxHamming,
      numProbes, availableNow)(sink)

  /** Per batch the sink receives one decision row per image:
    * `(id, admitted, n_pairs)`. Non-image media rows pass through the
    * pHash stage's kind filter and never reach decisions — route them
    * to their own admission loops. `blocks` MUST match what built
    * `initialSigs` (use [[admitImagesFromSaved]] for persisted indexes
    * — it reads the recorded parameter instead of trusting the call
    * site). */
  def admitImages(media: Dataset[Multimodal.MediaRow], initialSigs: DataFrame,
                  blocks: Int = 60, maxHamming: Int = 3, numProbes: Int = 4,
                  availableNow: Boolean = false)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // mutable across triggers; foreachBatch runs serially per query
    var index = initialSigs.select(col("id"), col("simhash"))
      .localCheckpoint(true)
    // per-instance owner token — the admitVideos scoping rationale
    val stageTok = s"admitImages-${java.util.UUID.randomUUID()}"
    val writer = media.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Multimodal.MediaRow], batchId: Long) =>
       graft.similarity.StagedCache.scoped(stageTok) {
        val sigs = Multimodal.pHashSigs(batch, blocks).localCheckpoint(true)
        val pairs = Similarity.simhashPairsFromSigs(
            index.unionByName(sigs), maxHamming, numProbes)
          .localCheckpoint(true)
        val batchIds = sigs.select(col("id"))
        val idxIds = index.select(col("id"))
        // a pair decides a batch id's admission when the OTHER side is
        // indexed (either orientation — no id-monotonicity assumed: a
        // batch id lower than its indexed match lands on id_a and would
        // be silently admitted under a higher-side-only rule) or a
        // lower batch-mate (per-edge keep-one). Index-internal pairs (a
        // pre-seeded index is not guaranteed dup-free) never re-reject.
        val batchVsIndexA = pairs
          .join(batchIds.select(col("id").as("id_a")), Seq("id_a"), "leftsemi")
          .join(idxIds.select(col("id").as("id_b")), Seq("id_b"), "leftsemi")
          .select(col("id_a").as("id"))
        val batchOnB = pairs
          .join(batchIds.select(col("id").as("id_b")), Seq("id_b"), "leftsemi")
          .select(col("id_b").as("id"))
        val counts = batchVsIndexA.unionByName(batchOnB)
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_pairs"))
        val decisions = sigs.select(col("id"))
          .join(counts, Seq("id"), "left")
          .select(col("id"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
          .withColumn("admitted", col("n_pairs") === 0L)
          .select(col("id"), col("admitted"), col("n_pairs"))
          .localCheckpoint(true)
        // fold survivors in by REPLACEMENT: an admitted id's old index
        // row (if any) is dropped before its fresh signature is added,
        // so a redelivered id with a CHANGED payload updates the index
        // — under the old add-if-absent fold the stale signature kept
        // serving and future near-dups of the NEW content were silently
        // admitted. Identical redelivery stays idempotent (drop + re-add
        // of the same row); a REJECTED redelivery leaves the old row in
        // place (rejected content never enters the index).
        val admittedSigs = sigs.join(
          decisions.filter(col("admitted")).select(col("id")),
          Seq("id"), "leftsemi")
        index = index
          .join(admittedSigs.select(col("id")), Seq("id"), "left_anti")
          .unionByName(admittedSigs)
          .localCheckpoint(true)
        sink(decisions, batchId)
        // every output above is eagerly checkpointed, so the banded
        // table simhashPairsFromSigs persisted for THIS trigger is
        // done serving — drain it, or the per-trigger rebuild leaks
        // one cache entry per batch for the life of the session
        graft.similarity.StagedCache.release()
        ()
       }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** [[admitImages]] against a PERSISTED banded signature index
    * ([[graft.similarity.TrainedState.saveBandedSigIndex]]) — the
    * durable, O(batch)-per-trigger form: the probe prunes the index
    * scan to the batch's buckets' row groups
    * ([[Similarity.simhashPairsAgainstIndex]] — the in-memory loop
    * re-bands and re-checkpoints the WHOLE index per trigger), and
    * survivors append as one delta generation. Decision semantics are
    * [[admitImages]]' verbatim (spec-pinned parity): rejected iff any
    * qualifying pair against an indexed image or a lower batch-mate.
    * REDELIVERY IS REPLACEMENT for free — the reconcile is
    * newest-wins per id, so an admitted redelivery's fresh band rows
    * supersede its old set (identical payload = idempotent re-append;
    * rejected redelivery leaves the old rows serving) — and the index
    * restarts from the path alone. `blocks` reads from the artifact. */
  def admitImagesPersisted(media: Dataset[Multimodal.MediaRow],
                           spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, maxHamming: Int = 3,
                           numProbes: Int = 4,
                           maxGenerations: Long = graft.similarity
                             .TrainedState.DefaultMaxGenerations,
                           availableNow: Boolean = false)
                          (sink: (DataFrame, Long) => Unit)
      : StreamingQuery = {
    val TS = graft.similarity.TrainedState
    val blocks = TS.bandedSigParams(spark, indexPath)
    val stageTok = s"admitImagesPersisted-${java.util.UUID.randomUUID()}"
    val writer = media.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Multimodal.MediaRow], batchId: Long) =>
       graft.similarity.StagedCache.scoped(stageTok) {
        val sigs = Multimodal.pHashSigs(batch, blocks).localCheckpoint(true)
        if (!sigs.isEmpty) {
          val index = TS.loadBandedSigIndexCached(spark, indexPath)
          val cross = Similarity.simhashPairsAgainstIndex(
            sigs, index, maxHamming, numProbes)
          val within = Similarity.simhashPairsFromSigs(
            sigs, maxHamming, numProbes)
          val counts = cross.select(col("batch_id").as("id"))
            .unionByName(within.select(col("id_b").as("id")))
            .groupBy(col("id")).agg(count(lit(1)).as("n_pairs"))
          val decisions = sigs.select(col("id"))
            .join(counts, Seq("id"), "left")
            .select(col("id"),
              coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
            .withColumn("admitted", col("n_pairs") === 0L)
            .select(col("id"), col("admitted"), col("n_pairs"))
            .localCheckpoint(true)
          TS.appendBandedSigsDelta(
            sigs.join(decisions.filter(col("admitted"))
              .select(col("id")), Seq("id"), "leftsemi"),
            indexPath)
          sink(decisions, batchId)
          TS.compactIfNeeded(spark, indexPath, maxGenerations)(
            TS.compactBandedSigIndex(_, _))
        }
        graft.similarity.StagedCache.release()
        ()
       }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** [[admitVideos]] against a persisted banded index of PACKED frame
    * signatures (`media·2²⁰ + frame` ids —
    * [[Multimodal.frameDupPairs]]' convention): per trigger the
    * batch's frame signatures probe the pruned index, a video rejects
    * when ≥ `minSharedFrames` of ITS frames match an indexed video's
    * frames (same-media matches excluded — self-similar frames are
    * scene-cut business) or a lower batch-mate's, and admitted
    * videos' frame rows append as one delta generation. Redelivery of
    * an admitted video is replacement (the [[admitImagesPersisted]]
    * reconcile contract, per frame id). */
  def admitVideosPersisted(media: Dataset[Multimodal.MediaRow],
                           spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, maxHamming: Int = 3,
                           numProbes: Int = 4, minSharedFrames: Int = 1,
                           maxGenerations: Long = graft.similarity
                             .TrainedState.DefaultMaxGenerations,
                           availableNow: Boolean = false)
                          (sink: (DataFrame, Long) => Unit)
      : StreamingQuery = {
    val TS = graft.similarity.TrainedState
    val blocks = TS.bandedSigParams(spark, indexPath)
    val P = Multimodal.FramePack
    def mediaOf(c: org.apache.spark.sql.Column) = (c / P).cast("long")
    val stageTok = s"admitVideosPersisted-${java.util.UUID.randomUUID()}"
    val writer = media.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Multimodal.MediaRow], batchId: Long) =>
       graft.similarity.StagedCache.scoped(stageTok) {
        val sigs = Multimodal.framePHashSigs(batch, blocks)
          .select((col("media_id") * P + col("frame_idx")).as("id"),
            col("simhash"))
          .localCheckpoint(true)
        if (!sigs.isEmpty) {
          val index = TS.loadBandedSigIndexCached(spark, indexPath)
          val cross = Similarity.simhashPairsAgainstIndex(
              sigs, index, maxHamming, numProbes)
            .filter(mediaOf(col("batch_id")) =!= mediaOf(col("index_id")))
            .select(mediaOf(col("batch_id")).as("id"),
              col("batch_id").as("frame"))
          val within = Similarity.simhashPairsFromSigs(
              sigs, maxHamming, numProbes)
            .filter(mediaOf(col("id_a")) =!= mediaOf(col("id_b")))
            .select(mediaOf(col("id_b")).as("id"), col("id_b").as("frame"))
          val counts = cross.unionByName(within)
            .groupBy(col("id"))
            .agg(countDistinct(col("frame")).as("n_matched_frames"))
          val decisions = sigs.select(mediaOf(col("id")).as("id"))
            .distinct()
            .join(counts, Seq("id"), "left")
            .select(col("id"), coalesce(col("n_matched_frames"), lit(0L))
              .as("n_matched_frames"))
            .withColumn("admitted",
              col("n_matched_frames") < minSharedFrames)
            .select(col("id"), col("admitted"), col("n_matched_frames"))
            .localCheckpoint(true)
          val admitted = decisions.filter(col("admitted")).select(col("id"))
          TS.appendBandedSigsDelta(
            sigs.join(admitted.select(col("id").as("_m")),
              mediaOf(col("id")) === col("_m"), "leftsemi"),
            indexPath)
          sink(decisions, batchId)
          TS.compactIfNeeded(spark, indexPath, maxGenerations)(
            TS.compactBandedSigIndex(_, _))
        }
        graft.similarity.StagedCache.release()
        ()
       }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** The DELETION loop for a persisted admission index: per
    * micro-batch of media ids, tombstone the banded signature rows —
    * O(deletions) for image indexes (one tombstone per id); for a
    * PACKED frame index (`packedFrames = true`) the doomed frame ids
    * first enumerate from the reconciled load, an honest O(index
    * filter) per deletion batch (the bkey-sorted layout cannot prune
    * an id range — frame counts live in the artifact, not the
    * caller). A forgotten media id is re-admittable: the loops'
    * probes read the tombstone-aware load, so its old signatures stop
    * rejecting new content immediately. */
  def forgetMediaPersisted(deleteMediaIds: DataFrame,
                           indexPath: String,
                           packedFrames: Boolean = false,
                           maxGenerations: Long = graft.similarity
                             .TrainedState.DefaultMaxGenerations,
                           availableNow: Boolean = false)
                          (sink: (DataFrame, Long) => Unit = (_, _) => ())
      : StreamingQuery = {
    val TS = graft.similarity.TrainedState
    val P = Multimodal.FramePack
    val writer = deleteMediaIds.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (rawBatch: Dataset[Row], batchId: Long) =>
        val spark = rawBatch.sparkSession
        val batch = rawBatch.toDF()
          .select(col("id").cast("long").as("id")).localCheckpoint(true)
        if (!batch.isEmpty) {
          val doomed =
            if (!packedFrames) batch
            else TS.loadBandedSigIndexCached(spark, indexPath)
              .join(broadcast(batch.select((col("id")).as("_m"))),
                (col("id") / P).cast("long") === col("_m"), "leftsemi")
              .select(col("id")).distinct()
          val receipts = batch.join(
              TS.loadBandedSigIndexCached(spark, indexPath)
                .select((if (packedFrames) (col("id") / P).cast("long")
                         else col("id")).as("id"))
                .groupBy(col("id")).agg(count(lit(1)).as("n_rows")),
              Seq("id"), "left")
            .select(col("id"), coalesce(col("n_rows"), lit(0L))
              .as("n_sig_rows"),
              col("n_rows").isNotNull.as("was_indexed"))
          TS.forgetBandedSigsDelta(doomed, indexPath)
          sink(receipts, batchId)
          TS.compactIfNeeded(spark, indexPath, maxGenerations)(
            TS.compactBandedSigIndex(_, _))
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
