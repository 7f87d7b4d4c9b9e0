package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFilters

/** Benchmark decontamination as a reusable operator, in two plans with
  * IDENTICAL results:
  *
  *   - [[flag]] — the exact broadcast-fingerprint form (the
  *     d_decontaminate shape): corpus shingles semi-join a broadcast
  *     eval-set gram table, re-aggregate per doc.
  *   - [[flagBloom]] — the same semantics with a Bloom PREFILTER in
  *     front of the exact verify: the eval grams aggregate into a Bloom
  *     filter (Spark's `BloomFilterAggregate`, delivered as a scalar
  *     subquery — the `InjectRuntimeFilter` machinery, explicit), the
  *     corpus gram stream drops every gram the filter rejects BEFORE any
  *     join, and only the surviving candidates meet the exact gram set.
  *     False positives are removed by the verify join, so the composed
  *     result is exact — the Bloom stage is pure plan, zero semantics.
  *
  * Why both: at 100 TB the broadcast gram TABLE is the right plan while
  * the eval set is small; when the eval corpus grows (many benchmarks ×
  * many n-gram sizes), the Bloom filter is orders of magnitude smaller
  * than the gram table at a fixed false-positive rate, and the map-only
  * prefilter cuts the verify join's probe side to the ~matching
  * fraction. Grams are 64-bit ids ([[TextOps.ngramHashes]]) on both
  * sides — no gram strings built, broadcast, or shuffled; overlap counts
  * equal string-gram counts up to 2^-64 collisions.
  */
object Decontaminate {

  /** Distinct word-`n`-gram ids of a text column. */
  def gramSet(text: Column, n: Int): Column =
    array_distinct(TextOps.ngramHashes(TextOps.tokens(text), n))

  private def flagOutput(corpus: DataFrame, idCol: String,
                         hits: DataFrame): DataFrame =
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))

  /** The eval side's distinct gram-id table `(g)` — corpus-invariant, so
    * a serving loop stages it ONCE ([[graft.streaming
    * .StreamingDecontaminate]]) instead of re-scanning the eval corpus
    * per trigger. */
  def evalGramTable(eval: DataFrame, textCol: String, n: Int): DataFrame =
    eval.select(explode(gramSet(col(textCol), n)).as("g")).distinct()

  /** Exact: `(doc_id, n_hits, contaminated)`, one row per corpus doc;
    * `n_hits` = distinct corpus-doc grams shared with the eval set. */
  def flag(corpus: DataFrame, eval: DataFrame, idCol: String,
           textCol: String, n: Int = 8): DataFrame =
    flagWith(corpus, evalGramTable(eval, textCol, n), idCol, textCol, n)

  /** [[flag]] against a PRE-STAGED eval gram table (the train-once /
    * serve-many split for the eval side). */
  def flagWith(corpus: DataFrame, evalGrams: DataFrame, idCol: String,
               textCol: String, n: Int = 8): DataFrame = {
    val hits = corpus
      .select(col(idCol).cast("long").as("doc_id"),
        explode(gramSet(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    flagOutput(corpus, idCol, hits)
  }

  /** ATTRIBUTION: which eval item leaked into which corpus doc — the
    * report a decontamination audit actually needs ([[flag]] says "doc
    * 17 is contaminated", this says "by eval docs 3 and 9, 4 and 2
    * shared 8-grams respectively"). One row per contaminated (corpus
    * doc, eval doc) pair: `(doc_id, eval_id, n_shared)` with
    * `n_shared` = distinct gram overlap of the PAIR. Same plan shape
    * as [[flag]] — the broadcast eval table just carries its id, and
    * grams are distinct per doc on both sides so a plain count is the
    * distinct-overlap count. Σ over eval_id ≥ the pair-blind
    * [[flag]].n_hits (a corpus gram shared with TWO eval docs counts
    * once in `flag`, once per pair here — the attribution semantics).
    */
  def attribute(corpus: DataFrame, eval: DataFrame, idCol: String,
                evalIdCol: String, textCol: String, n: Int = 8)
      : DataFrame = {
    val evalGrams = eval
      .select(col(evalIdCol).cast("long").as("eval_id"),
        explode(gramSet(col(textCol), n)).as("g"))
    corpus
      .select(col(idCol).cast("long").as("doc_id"),
        explode(gramSet(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Bloom-prefiltered exact: same output as [[flag]] for ANY `numBits`
    * (false positives die in the verify join; Bloom filters have no
    * false negatives). The eval gram table is staged once — it feeds
    * both the filter aggregation and the verify join. */
  def flagBloom(corpus: DataFrame, eval: DataFrame, idCol: String,
                textCol: String, n: Int = 8,
                estimatedItems: Long = 1000000L,
                numBits: Long = 8000000L): DataFrame = {
    val evalGrams = eval
      .select(explode(gramSet(col(textCol), n)).as("g")).distinct()
      .localCheckpoint(true)
    val bloom = org.apache.spark.sql.graftshim.ColumnBridge.scalarSubquery(
      evalGrams.agg(
        BloomFilters.bloom_agg(col("g"), estimatedItems, numBits).as("bf")))
    val hits = corpus
      .select(col(idCol).cast("long").as("doc_id"),
        explode(gramSet(col(textCol), n)).as("g"))
      .filter(BloomFilters.might_contain(bloom, col("g")))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    flagOutput(corpus, idCol, hits)
  }
}
