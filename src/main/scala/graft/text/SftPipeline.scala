package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.DedupClusters

/** The chat-data preparation recipe end-to-end, composed from the SFT
  * surfaces the same way [[CorpusPipeline]] composes the pretraining
  * ones:
  *
  *   1. MOSS dedup — winnow fingerprints → overlap pairs → connected
  *      components → keep the cluster representative (prompt sets are
  *      notoriously templated; position-aware local similarity is the
  *      right detector for near-identical conversations)
  *   2. turn segmentation → whole-turn tail truncation to the context
  *      budget → loss-mask flattening over the SURVIVING turns
  *   3. pack rendered conversations into fixed-character context bins
  *      per language shard (the [[CorpusPipeline]] bin rule:
  *      `(cum − len) div contextChars`)
  *   4. write the span table and the packed conversation table
  *      partitioned for shard-local readers
  *
  * Scale: stage 1 is the winnow/CC machinery (native kernel, staged
  * fingerprint set, adaptive CC); stages 2-3 are one doc-id window
  * each; the write is compacted by repartitioning ON the partition
  * columns (the CorpusPipeline anti-small-files form).
  */
object SftPipeline {

  case class Stats(n_input: Long, n_after_dedup: Long, n_convs: Long,
                   n_turns_total: Long, n_turns_kept: Long,
                   n_mask_spans: Long, mask_chars: Long, n_bins: Long)

  def run(spark: SparkSession, docs: DataFrame, outDir: String,
          turnTokens: Int = 12, maxTokens: Long = 48L,
          contextChars: Long = 2048L, winnowK: Int = 12, winnowW: Int = 5,
          minShared: Int = 5): Stats = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      (if (docs.columns.contains("lang")) col("lang") else lit("all"))
        .as("lang"),
      col("text"))

    // 1. MOSS dedup, keep-lowest-id per overlap cluster
    val pairs = Fingerprint.overlapPairs(
        Fingerprint.winnow(base, "doc_id", "text", winnowK, winnowW),
        "doc_id", minShared)
      .select(col("id_a"), col("id_b"))
    val labels = DedupClusters.connectedComponents(
      base.select(col("doc_id").as("id")), pairs)
    val kept = base.join(
        labels.filter(col("id") === col("cluster"))
          .select(col("id").as("doc_id")), Seq("doc_id"))
      .cache() // feeds turns AND the stage count

    // 2. turns → budget truncation → spans over survivors
    val turns = SftOps.toTurns(kept, "doc_id", "text", turnTokens)
      .cache() // feeds truncation AND the total-turn count
    val keptTurns = SftOps.truncateTail(turns, "doc_id", maxTokens)
      .drop("tail_sum")
      .cache() // feeds render stats, spans, AND the kept-turn count
    val spans = SftOps.flattenWithMask(keptTurns, "doc_id")

    // 3. per-conversation rendered length (independent of the span
    //    table — conversations whose surviving turns are all user-role
    //    emit no spans but still pack), then per-lang char-bin packing
    val convs = keptTurns
      .withColumn("_piece",
        (length(concat(lit("<|"), col("role"), lit("|>"))) +
          length(col("txt"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_piece")).as("seq_chars"),
        count(lit(1)).as("n_turns"))
      .join(kept.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val packed = convs
      .withColumn("cum", sum(col("seq_chars")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
      .withColumn("bin", expr(s"(cum - seq_chars) div $contextChars"))

    // 4. write both artifacts; bins partitioned per shard reader
    spans.write.mode(SaveMode.Overwrite).parquet(s"$outDir/spans")
    packed
      .withColumn("bin_block", expr("bin div 100"))
      .repartition(col("lang"), col("bin_block"))
      .sortWithinPartitions(col("lang"), col("bin_block"), col("bin"),
        col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("lang", "bin_block").parquet(s"$outDir/bins")

    val spansW = spark.read.parquet(s"$outDir/spans")
    val binsW = spark.read.parquet(s"$outDir/bins")
    val maskChars = spansW.agg(coalesce(sum(col("e") - col("s")), lit(0L)))
      .head().getLong(0)
    val stats = Stats(
      n_input = base.count(),
      n_after_dedup = kept.count(),
      n_convs = binsW.count(),
      n_turns_total = turns.count(),
      n_turns_kept = keptTurns.count(),
      n_mask_spans = spansW.count(),
      mask_chars = maskChars,
      n_bins = binsW.select(col("lang"), col("bin")).distinct().count())
    kept.unpersist(); turns.unpersist(); keptTurns.unpersist()
    stats
  }
}
