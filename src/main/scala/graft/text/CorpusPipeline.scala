package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.{DedupClusters, Similarity}

/** The end-to-end training-data preparation pipeline, composed from the
  * library's operators the way a user would chain them — one lazy DAG from
  * raw documents to packed, partitioned training shards:
  *
  *   1. normalize + fingerprint (map-only)
  *   2. exact dedup on the normalized hash (one shuffle)
  *   3. near-dup clustering → keep one doc per cluster (pair join + CC)
  *   4. decontaminate against a broadcast eval-set fingerprint
  *   5. quality floor
  *   6. pack survivors into fixed-token-budget bins per language shard
  *   7. write parquet partitioned by (lang, bin-block) for downstream
  *      readers' partition pruning
  *
  * Every stage is the same declarative operator the per-stage queries
  * exercise; nothing here is new machinery. At 100 TB: stages 1/4/5 are
  * map-only; 2 shuffles on a 16-byte hash; 3's edge list is near-dup pairs
  * only (the adaptive CC collects it when small); 6 windows per shard key,
  * never globally.
  */
object CorpusPipeline {

  case class Stats(n_input: Long, n_after_exact: Long, n_after_near: Long,
                   n_after_decontam: Long, n_after_quality: Long,
                   n_bins: Long, total_tokens: Long)

  /** @param boilerplateMinDocs when set, stage 0 strips chunks
    *   recurring in ≥ this many DISTINCT docs ([[Boilerplate.strip]])
    *   BEFORE dedup — boilerplate inflates near-dup similarity between
    *   unrelated docs, so removal belongs upstream of the pair build
    * @param curriculumEpoch when set, the pack order within each lang
    *   shard follows the [[Curriculum.interleave]] key with `source` as
    *   the band — every context bin then samples sources at ≈ their
    *   corpus share instead of doc_id (≈ crawl) order
    */
  def run(spark: SparkSession, docs: DataFrame, evalDocs: DataFrame,
          outDir: String, contextTokens: Int = 512,
          minQuality: Double = 0.2, jaccardThreshold: Double = 0.8,
          boilerplateMinDocs: Option[Int] = None,
          curriculumEpoch: Option[Long] = None)
      : Stats = {
    // a missing source column degenerates the curriculum band to one
    // stratum (a plain deterministic shuffle order) instead of failing
    val sourceCol =
      (if (docs.columns.contains("source")) col("source")
       else lit("all")).as("source")
    // 0. optional cross-doc boilerplate strip. The rebuilt text is
    //    token-joined (Boilerplate's alphabet), which on raw text would
    //    lossily rewrite EVERY doc (casing/punctuation feed the quality
    //    gate downstream) — so docs the strip did NOT touch keep their
    //    original text verbatim; only docs that actually lost chunks
    //    carry the token-space rebuild. Metadata re-attaches by doc_id
    //    (Some-branch only — the default path stays a single projection,
    //    no join).
    val input = boilerplateMinDocs match {
      case Some(k) =>
        Boilerplate.strip(docs, "doc_id", "text", minDocs = k)
          .select(col("doc_id"),
            (col("n_kept") =!= col("n_chunks")).as("_stripped"),
            col("text").as("_stripped_text"))
          .join(docs.select(col("doc_id").cast("long").as("doc_id"),
            col("lang"), sourceCol, col("text")), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("source"),
            when(col("_stripped"), col("_stripped_text"))
              .otherwise(col("text")).as("text"))
      case None =>
        docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          sourceCol, col("text"))
    }
    // 1. normalize; hash identifies byte-identical docs post-normalization
    val normed = input.select(col("doc_id"), col("lang"), col("source"),
      col("text"), TextOps.normalize(col("text")).as("norm"))
      .withColumn("norm_hash", md5(col("norm").cast("binary")))

    // 2. exact dedup: keep the min doc_id per normalized hash. Cached: it
    // feeds the pair build, the label join AND a stage count below —
    // uncached, the normalize+window would re-run per consumer.
    val exactKept = normed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("norm_hash")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
      .cache()

    // 3. near-dup: MinHash-LSH candidate pairs → verified Jaccard →
    //    connected components → keep the cluster representative
    val pairs = Similarity.minhashPairs(
        exactKept.select(col("doc_id"), col("text")), "doc_id", "text",
        shingleN = 3, numHashes = 32, numBands = 8,
        minJaccard = jaccardThreshold)
      .select(col("id_a"), col("id_b"))
    val labels = DedupClusters.connectedComponents(
      exactKept.select(col("doc_id").as("id")), pairs)
    val nearKept = exactKept.join(
      labels.filter(col("id") === col("cluster"))
        .select(col("id").as("doc_id")), Seq("doc_id"))

    // 4. decontaminate: drop docs sharing any 8-gram with the eval set
    //    (64-bit gram ids both sides — native kernel, no gram strings)
    def grams(c: org.apache.spark.sql.Column) =
      array_distinct(TextOps.ngramHashes(TextOps.tokens(c), 8))
    val evalGrams = evalDocs.select(explode(grams(col("text"))).as("g"))
      .distinct()
    val contaminated = nearKept
      .select(col("doc_id"), explode(grams(col("text"))).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .select(col("doc_id")).distinct()
    val clean = nearKept.join(contaminated, Seq("doc_id"), "left_anti")
      .cache() // consumed by the quality filter AND its own stage count

    // 5. quality floor (map-only heuristics)
    val quality = clean
      .filter(TextOps.qualityScore(col("text")) >= minQuality)

    // 6. pack into context bins per language shard (no global window).
    //    With a curriculum epoch, the within-shard order follows the
    //    interleave key over (lang, source) bands — each (lang, source)
    //    stratum spreads ±1-exactly inside its lang shard, so every
    //    context bin samples sources at ≈ their corpus share instead of
    //    doc_id (≈ crawl) order.
    val ordered = curriculumEpoch match {
      case Some(ep) =>
        quality.join(
          Curriculum.interleave(
            quality.select(col("doc_id"),
              concat_ws("|", col("lang"), col("source")).as("band")),
            "doc_id", "band", ep)
            .select(col("id").as("doc_id"), col("pos_ppm")),
          Seq("doc_id"))
      case None => quality.withColumn("pos_ppm", lit(0L))
    }
    val packOrder =
      if (curriculumEpoch.isDefined)
        Seq(col("pos_ppm"), col("source"), col("doc_id"))
      else Seq(col("doc_id")) // the historical crawl-order contract
    val packed = ordered
      .withColumn("tok", TextOps.tokenCountWs(col("text")).cast("long"))
      .withColumn("cum", sum(col("tok")).over(
        Window.partitionBy(col("lang")).orderBy(packOrder: _*)))
      .withColumn("bin", expr(s"(cum - tok) div $contextTokens"))

    // 7. write partitioned: lang + coarse bin block → partition pruning
    //    for shard-local readers without exploding directory counts.
    //    The repartition ON THE PARTITION COLUMNS is the write-side
    //    compaction: without it every task holds rows of every partition
    //    and partitionBy writes tasks × partitions small files (the
    //    classic explosion); with it each output directory is written by
    //    one task, capped by maxRecordsPerFile (operators.Compaction is
    //    the standalone after-the-fact fix; this is the at-write form).
    val out = packed
      .withColumn("bin_block", expr("bin div 100"))
      .select(col("doc_id"), col("lang"), col("text"), col("tok"),
        col("bin"), col("bin_block"))
      .repartition(col("lang"), col("bin_block"))
      .sortWithinPartitions(col("lang"), col("bin_block"), col("bin"),
        col("doc_id"))
    out.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", 1000000L)
      .partitionBy("lang", "bin_block").parquet(outDir)

    // stage stats read the cached stages (and the written files), not
    // re-runs of the raw DAG; coalesce covers the everything-filtered case
    // (sum over zero rows is NULL)
    val written = spark.read.parquet(outDir)
    try Stats(
      n_input = docs.count(),
      n_after_exact = exactKept.count(),
      n_after_near = nearKept.count(),
      n_after_decontam = clean.count(),
      n_after_quality = quality.count(),
      n_bins = written.select(col("lang"), col("bin")).distinct().count(),
      total_tokens = written
        .agg(coalesce(sum(col("tok")), lit(0L))).head.getLong(0))
    finally {
      exactKept.unpersist()
      clean.unpersist()
    }
  }
}
