package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** [[SftPipeline.run]] — the composed chat-prep DAG: planted near-dup
  * removal, span validity in the WRITTEN artifact, the bin-capacity
  * law, and stats consistency. */
class SftPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("end-to-end: planted dup dropped, spans valid, bins lawful, " +
      "stats consistent") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
      .select(col("doc_id"), col("lang"), col("text"))
    // plant an exact copy of the first doc under a high id — the MOSS
    // stage must keep exactly one of the pair (the lower id)
    val first = docs.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 100000).as("doc_id"), col("lang"),
        col("text"))
    val input = docs.unionByName(first)
    val out = java.nio.file.Files
      .createTempDirectory("sft_pipe").toString
    val stats = SftPipeline.run(spark, input, out,
      turnTokens = 12, maxTokens = 48L, contextChars = 1024L)

    assert(stats.n_input === 61L)
    assert(stats.n_after_dedup < stats.n_input,
      "planted duplicate survived the MOSS stage")
    val keptIds = spark.read.parquet(s"$out/bins")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!keptIds.contains(100000L + docs.orderBy("doc_id")
      .limit(1).head.getLong(0)), "the COPY must lose keep-one")

    // spans: within bounds, strictly ordered, masked text non-empty
    val spans = spark.read.parquet(s"$out/spans")
    assert(spans.filter(col("s") >= col("e") ||
      col("e") > col("seq_len")).count() === 0L)
    assert(spans.filter(length(col("masked_text")) =!=
      col("e") - col("s")).count() === 0L)
    assert(stats.n_mask_spans === spans.count())
    assert(stats.mask_chars > 0L)

    // truncation really bit: kept ≤ total turns, both non-zero
    assert(stats.n_turns_kept <= stats.n_turns_total)
    assert(stats.n_turns_kept > 0L)

    // bin law (the CorpusPipeline rule): a conversation lands in the
    // bin where its cumulative prefix starts, so any bin's total minus
    // its LAST member stays under the budget
    val bins = spark.read.parquet(s"$out/bins")
    val binSums = bins.groupBy("lang", "bin")
      .agg(sum("seq_chars").as("tot"), max("seq_chars").as("biggest"))
    assert(binSums.filter(col("tot") - col("biggest") >= 1024L)
      .count() === 0L, "bin overfilled beyond the start-offset rule")
    assert(stats.n_bins === binSums.count())
    assert(stats.n_convs === bins.count())
  }
}
