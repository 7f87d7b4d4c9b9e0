package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT-substring dedup: find every maximal character span that is part
  * of some length-`L` window whose text occurs in at least `minDocs`
  * distinct documents, and optionally strip those spans from the corpus.
  *
  * This is the ExactSubstr shape from the training-data dedup literature
  * (repeated passages — boilerplate, licenses, templated headers — are
  * memorization hazards even when the *documents* containing them are not
  * near-duplicates, so document-level MinHash/SimHash misses them). The
  * reference engine has no substring-level operator; this is part of the
  * LLM-pipeline extension surface.
  *
  * Scale design (the whole point — a naive gram `groupBy` shuffles L×
  * the corpus bytes):
  *
  *   1. window→hash pass: map-only `xxhash64` over each sliding window;
  *      only `(h, doc_id, pos)` — 24 bytes/row, never the gram text —
  *      rides the corpus-sized shuffles.
  *   2. candidate restriction: the distinct-doc count per hash is a pair
  *      of window functions (`max(dense_rank)` over the h-partition), so
  *      restriction costs ONE exchange and consumes the site table once
  *      — no aggregate + semi-join back, no staging barrier.
  *   3. text verification: candidate sites re-derive their gram by
  *      re-attaching the doc text (ONE corpus-text shuffle, 1× bytes,
  *      hash-partitioned on doc_id — not the L× window blowup) and
  *      re-checking the distinct-doc count on the exact gram string, so
  *      an xxhash64 collision can never mark a span. Gram text shuffles
  *      only for candidates.
  *   4. island merge: per-doc sort-merge of overlapping windows into
  *      maximal spans — one int-only shuffle on doc_id.
  *
  * Windows never cross doc boundaries; docs shorter than `L` produce no
  * windows. Output spans are 1-based inclusive `[span_start, span_end]`
  * and non-overlapping per doc by construction.
  */
object SubstringDedup {

  /** Maximal duplicated spans: `(doc_id, span_start, span_end, n_win)`
    * where `n_win` counts the marked windows merged into the span.
    *
    * @param docs    input with `idCol` (castable to long) and `textCol`
    * @param L       window length in characters (≥ 2)
    * @param minDocs a window is duplicated when its exact text occurs in
    *                at least this many DISTINCT docs (≥ 2): cross-doc
    *                boilerplate, not within-doc repetition
    * @param spreadInput repartition the corpus by doc_id before the
    *                window explode (default true). The explode inflates
    *                work ~L× per input byte, so a coarse scan
    *                partitioning (single-row-group parquet = ONE task)
    *                serializes the whole hash pass; the 1× text shuffle
    *                amortizes against the L× compute, and doc_id hash
    *                distribution is what the candidate re-attach join
    *                needs anyway. Pass false when the input is already
    *                cluster-wide (thousands of splits) — an explicit
    *                knob, NOT a runtime partition probe: under AQE,
    *                `df.rdd.getNumPartitions` materializes the final
    *                plan, which EXECUTES every upstream stage of a
    *                derived input at call time and re-runs them on the
    *                real action.
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            L: Int, minDocs: Int = 2, spreadInput: Boolean = true): DataFrame = {
    require(L >= 2, s"window length L=$L must be >= 2")
    require(minDocs >= 2, s"minDocs=$minDocs must be >= 2")
    val base0 = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val base = if (spreadInput) {
      val targetPar = math.max(
        docs.sparkSession.sparkContext.defaultParallelism,
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
      base0.repartition(targetPar, col("doc_id"))
    } else base0
    // sequence() infers a DESCENDING step when start > stop, so guard the
    // short-doc case explicitly rather than relying on an empty array
    val sites = base.filter(length(col("text")) >= L)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (L - 1))).as("p"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        xxhash64(col("text").substr(col("p"), lit(L))).as("h"))
    // Distinct-doc count per hash as WINDOW functions, not an aggregate
    // plus a semi-join back: dense_rank over (h ↦ doc_id) numbers the
    // distinct docs within each hash group and its partition-wide max is
    // the distinct count — ONE exchange, and `sites` has a single
    // consumer, so no staging barrier is needed (the agg+join-back form
    // consumed sites twice, forcing an eager localCheckpoint, and paid
    // two more full-width exchanges for the aggregate and the join
    // probe; same-run A/B at sf0.1: dedup 4.4→3.2s, strip 4.1→2.8s —
    // 6.1s/5.6s before the pre-explode repartition above).
    // Skew trade (stated honestly): a WindowExec group = ALL sites of one
    // gram hash, buffered (spillable) in a single task — a boilerplate
    // gram present in millions of docs makes that task the straggler. The
    // replaced agg+semi-join form STREAMED the hot group (the probe side
    // of a semi join never buffers; the aggregate held only distinct
    // (h, doc_id) pairs) at the price of two extra full-width exchanges
    // and an eager staging barrier — the measured 2× at gate SF. At a
    // corpus whose gram-frequency tail is adversarial, revert to the
    // agg+semi-join form or pre-cap pathological hashes.
    val byH = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val candSites = sites
      .withColumn("nd", max(dense_rank().over(byH)).over(
        Window.partitionBy(col("h"))))
      .filter(col("nd") >= minDocs).drop("nd")
    // re-derive gram text for candidates only: one 1× corpus-text shuffle
    // (doc_id equi-join), then exact-text verification within (hash, gram)
    // groups — the same single-exchange window shape, so a hash collision
    // can never mark a span and nothing is consumed twice
    val candGrams = candSites.join(base, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("h"),
        col("text").substr(col("pos"), lit(L)).as("gram"))
    val byHG = Window.partitionBy(col("h"), col("gram"))
      .orderBy(col("doc_id"))
    val marked = candGrams
      .withColumn("nd", max(dense_rank().over(byHG)).over(
        Window.partitionBy(col("h"), col("gram"))))
      .filter(col("nd") >= minDocs)
      .select(col("doc_id"), col("pos"))
    // islands: windows [pos, pos+L-1] overlap/touch when the next start
    // is within L of the previous start
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("brk",
        when(lag(col("pos"), 1).over(byDoc).isNull
          .or(col("pos") > lag(col("pos"), 1).over(byDoc) + L), 1L)
          .otherwise(0L))
      .withColumn("g", sum(col("brk")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (L - 1)).as("span_end"),
        count(lit(1)).as("n_win"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_win"))
  }

  /** Remove every duplicated span from every doc (the decontamination
    * direction: no canonical copy is kept — keep-one policies are a
    * caller-side choice of which doc to exempt). Returns
    * `(doc_id, text)` with the same row count as `docs`: a doc fully
    * covered by spans keeps an EMPTY string, not a missing row.
    *
    * The rebuild walks each doc's sorted span list once with an
    * `aggregate` HOF (native, no UDF): accumulator carries the kept
    * prefix and the next unread position; the finish lambda appends the
    * tail. Spans are non-overlapping and sorted (guaranteed by [[spans]]),
    * so every kept segment has non-negative length.
    */
  def strip(docs: DataFrame, spanDf: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val spanArr = spanDf
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(
        col("span_start").cast("int").as("s"),
        col("span_end").cast("int").as("e")))).as("sp"))
    base.join(spanArr, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("sp").isNull, col("text")).otherwise(expr(
          """aggregate(
            |  sp,
            |  named_struct('out', '', 'prev', 1),
            |  (acc, x) -> named_struct(
            |    'out', concat(acc.out,
            |             substr(text, acc.prev, x.s - acc.prev)),
            |    'prev', x.e + 1),
            |  acc -> concat(acc.out, substr(text, acc.prev))
            |)""".stripMargin)).as("text"))
  }
}
