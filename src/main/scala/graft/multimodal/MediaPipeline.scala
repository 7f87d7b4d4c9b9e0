package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.DedupClusters

/** The multimodal curation recipe end-to-end, composed from the media
  * surfaces the way [[graft.text.CorpusPipeline]] composes the text
  * ones — every stage is the same oracled/spec'd operator the per-stage
  * queries exercise:
  *
  *   1. image near-dup dedup: blockhash signatures → banded multi-probe
  *      LSH pairs ([[Multimodal.pHashPairs]]) → connected components →
  *      keep the lowest-id representative per cluster
  *   2. audio speech gate: [[Multimodal.vadSegments]] — clips keep only
  *      if they carry at least `minActiveWindows` voice-active windows
  *      (silence and hum drop before they cost feature compute)
  *   3. video content-ID dedup: [[Multimodal.frameDupPairs]] aggregated
  *      to video pairs sharing ≥ `minSharedFrames` near-identical
  *      frames; the HIGHER id of each pair drops (per-edge keep-one,
  *      the repo-wide convention)
  *   4. featurize every survivor into the shared embedding space and
  *      write per-kind partitioned artifacts + a stats receipt
  *
  * Scale: payloads never shuffle — every pairing/gating decision rides
  * 8-byte signatures or integer window aggregates; featurization is the
  * only stage that touches bytes again, and it runs on survivors only.
  */
object MediaPipeline {

  case class Stats(n_input: Long,
                   n_images: Long, n_images_kept: Long,
                   n_audio: Long, n_audio_kept: Long,
                   n_video: Long, n_video_kept: Long,
                   n_features: Long)

  def run(spark: SparkSession, media: Dataset[Multimodal.MediaRow],
          outDir: String, maxHamming: Int = 3,
          vadWindow: Int = 400, vadTau: Int = 94,
          minActiveWindows: Int = 1, minSharedFrames: Int = 3,
          featureDim: Int = 16, maxBucket: Int = 0): Stats =
   // per-run owner scope: the drain at the end releases only THIS run's
   // staged banded tables, never a concurrent pipeline's
   graft.similarity.StagedCache.scoped(
       s"mediaPipeline-${java.util.UUID.randomUUID()}") {
    import spark.implicits._
    val cached = media.cache()

    // 1. images: pair -> CC -> keep cluster representative
    val imgIds = cached.filter(col("kind") === "image")
      .select(col("media_id").as("id"))
    val iPairs = Multimodal.pHashPairs(cached, maxHamming = maxHamming,
        maxBucket = maxBucket)
      .select(col("id_a"), col("id_b"))
    val iLabels = DedupClusters.connectedComponents(imgIds, iPairs)
    val imagesKept = cached.filter(col("kind") === "image")
      .join(iLabels.filter(col("id") === col("cluster"))
        .select(col("id").as("media_id")), Seq("media_id"))
      .as[Multimodal.MediaRow]

    // 2. audio: VAD activity floor
    val active = Multimodal.vadSegments(cached, vadWindow, vadTau)
      .groupBy(col("media_id"))
      .agg(sum(col("n_windows")).as("n_active"))
      .filter(col("n_active") >= minActiveWindows)
      .select(col("media_id"))
    val audioKept = cached.filter(col("kind") === "audio")
      .join(active, Seq("media_id"), "left_semi")
      .as[Multimodal.MediaRow]

    // 3. video: frame-level content ID; media_a < media_b by the packed
    //    pair order, so the b side is always the higher id. "Shared
    //    frames" counts DISTINCT frames on each side, bounded by the
    //    smaller — a raw pair count would let one self-similar frame
    //    region (a static title card matching several frames of the
    //    other video) satisfy the floor on a single frame's evidence.
    val vRejects = Multimodal.frameDupPairs(cached,
        maxHamming = maxHamming, maxBucket = maxBucket)
      .groupBy(col("media_a"), col("media_b"))
      .agg(least(countDistinct(col("frame_a")),
        countDistinct(col("frame_b"))).as("n_shared"))
      .filter(col("n_shared") >= minSharedFrames)
      .select(col("media_b").as("media_id")).distinct()
    val videoKept = cached.filter(col("kind") === "video")
      .join(vRejects, Seq("media_id"), "left_anti")
      .as[Multimodal.MediaRow]

    // 4. featurize survivors, write per-kind artifacts
    val kept = imagesKept.unionByName(audioKept).unionByName(videoKept)
      .cache()
    val feats = Multimodal.featurize(kept, featureDim)
      .join(kept.toDF().select(col("media_id"), col("kind")), Seq("media_id"))
    feats.repartition(col("kind"))
      .sortWithinPartitions(col("kind"), col("media_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("kind").parquet(s"$outDir/features")

    val featsW = spark.read.parquet(s"$outDir/features")
    val stats = Stats(
      n_input = cached.count(),
      n_images = cached.filter(col("kind") === "image").count(),
      n_images_kept = imagesKept.count(),
      n_audio = cached.filter(col("kind") === "audio").count(),
      n_audio_kept = audioKept.count(),
      n_video = cached.filter(col("kind") === "video").count(),
      n_video_kept = videoKept.count(),
      n_features = featsW.count())
    cached.unpersist(); kept.unpersist()
    // the pHashPairs / frameDupPairs banded tables staged above are
    // fully consumed once the sinks are written — drain them so a
    // session looping this pipeline doesn't accumulate cache entries
    graft.similarity.StagedCache.release()
    stats
  }
}
