package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-constrained mixture planning (the Muennighoff et al. 2023 shape,
  * "Scaling Data-Constrained Language Models"): given per-source token
  * totals, a global training-token budget, and a repeat cap, allocate
  * tokens per source — temperature share first, then clamp each source
  * at `cap` epochs of its unique data. The per-source EPOCH COUNT
  * (allocated / unique) is the number the data-constrained scaling law
  * consumes.
  *
  * Contract (single-round, deterministic — no iterative water-filling,
  * so the allocation under-fills the budget exactly when a source caps;
  * the leftover is reported, not silently redistributed):
  *
  *   s_s        = round(√T_s · 1e6)            (α = 0.5 temperature; the
  *                                              d_mix_temperature sqrt
  *                                              convention — correctly
  *                                              rounded IEEE, integerized
  *                                              immediately)
  *   share_ppm  = s_s·1e6 div Σs               (parts-per-million share —
  *                                              bounding every later
  *                                              product away from 64-bit
  *                                              overflow for budgets up to
  *                                              ~9e12 tokens)
  *   want_toks  = budget·share_ppm div 1e6
  *   alloc_toks = min(want_toks, T_s·capX100 div 100)
  *   epochs_x1000 = alloc_toks·1000 div T_s    (0 for an empty source)
  *
  * All divisions see non-negative operands, so truncation semantics agree
  * across engines. Scale design: one map-side-combined aggregation over
  * the corpus; everything after runs on the sources-sized table with the
  * share denominator on a 1-row broadcast.
  */
object MixPlanner {

  /** Per-source plan: `(source, toks, share_ppm, want_toks, alloc_toks,
    * epochs_x1000)`, one row per distinct source. `weight` is the
    * per-row token weight (e.g. [[TextOps.tokenCountWs]] of the text). */
  def epochAllocation(docs: DataFrame, sourceCol: String, weight: Column,
                      budget: Long, capX100: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(capX100 > 0, s"capX100 must be > 0, got $capX100")
    // staged (sources-sized): it feeds both the plan rows and the share
    // denominator — without the stage Catalyst re-aggregates the corpus
    // once per consumer (two full scans; the PlanShapeSpec pin watches
    // this)
    val totals = docs.groupBy(col(sourceCol).as("source"))
      .agg(sum(weight).as("toks"))
      .withColumn("s_s",
        round(sqrt(col("toks").cast("double")) * 1e6).cast("long"))
      .localCheckpoint(true)
    val ssum = totals.agg(sum(col("s_s")).as("s_sum"))
    totals.crossJoin(broadcast(ssum))
      // s_sum = 0 iff every source is empty — the plan is all zeros,
      // not an ANSI DIVIDE_BY_ZERO
      .withColumn("share_ppm",
        when(col("s_sum") === 0, lit(0L))
          .otherwise(expr("(s_s * 1000000) div s_sum")))
      .withColumn("want_toks", expr(s"($budget * share_ppm) div 1000000"))
      .withColumn("alloc_toks",
        least(col("want_toks"), expr(s"(toks * $capX100) div 100")))
      .withColumn("epochs_x1000",
        when(col("toks") === 0, lit(0L))
          .otherwise(expr("(alloc_toks * 1000) div toks")))
      .select(col("source"), col("toks"), col("share_ppm"),
        col("want_toks"), col("alloc_toks"), col("epochs_x1000"))
  }

  /** EXECUTE the allocation: turn the per-source token plan into an
    * actual document selection with repeat counts — the delivery half
    * of [[epochAllocation]] (a plan nobody materializes trains
    * nothing). Per source: `e_full = alloc div T_s` complete epochs for
    * every doc, plus a deterministic PREFIX of the md5-draw order
    * filling the remainder (`cum ≤ rem`, inclusive-cumsum — the
    * budget-prefix convention of [[BudgetSelect]]: the first
    * overflowing doc stops the prefix; no knapsack backfill, so
    * selection is order-stable under corpus growth). Output
    * `(source, doc_id, doc_toks, n_repeats)`, rows with
    * `n_repeats ≥ 1` only.
    *
    * Laws (spec-pinned): Σ(doc_toks · n_repeats) per source ≤
    * alloc_toks, and maximal — the first unselected doc in draw order
    * would overflow the remainder. All integers; division operands
    * non-negative.
    *
    * Scale: the plan side is sources-sized (broadcast); the corpus pays
    * one weight projection + ONE per-source cumsum window (sources are
    * few and huge — same trade as [[Curriculum.interleave]]; the
    * map-only alternative derives a remainder draw-threshold from a
    * quantile sketch of the weight distribution, proportional rather
    * than ±1-exact).
    */
  def executeAllocation(docs: DataFrame, sourceCol: String, idCol: String,
                        weight: Column, budget: Long, capX100: Long,
                        epoch: Long = 0L): DataFrame = {
    val plan = epochAllocation(docs, sourceCol, weight, budget, capX100)
    val d = docs.select(col(sourceCol).as("source"),
        col(idCol).cast("long").as("doc_id"),
        weight.cast("long").as("doc_toks"))
      .withColumn("draw",
        expr(s"cast(conv(substring(md5(cast(concat('mix', '$epoch', " +
          "':', cast(doc_id as string)) as binary)), 1, 15), 16, 10) " +
          "as bigint)"))
    val wCum = Window.partitionBy(col("source"))
      .orderBy(col("draw"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(plan.select(col("source"), col("toks"),
        col("alloc_toks"))), Seq("source"))
      .withColumn("cum", sum(col("doc_toks")).over(wCum))
      .withColumn("e_full",
        when(col("toks") === 0, lit(0L))
          .otherwise(expr("alloc_toks div toks")))
      .withColumn("rem", col("alloc_toks") - col("e_full") * col("toks"))
      // alloc_toks > 0 gate: a zero-weight doc has cum ≤ rem even under
      // a ZERO allocation (0 ≤ 0) — free riders are fine inside a real
      // allocation, but a zero-budget source must select nothing
      .withColumn("n_repeats", col("e_full") +
        when(col("alloc_toks") > 0 && col("cum") <= col("rem"), 1L)
          .otherwise(0L))
      .filter(col("n_repeats") >= 1)
      .select(col("source"), col("doc_id"), col("doc_toks"),
        col("n_repeats"))
  }

  /** Loss-aware mixture reweighting (the DoReMi idea, linearized to
    * stay integer-exact): domains whose held-out LM loss exceeds the
    * best domain's are UP-weighted proportionally to their excess —
    * hard domains get more epochs, saturated domains fewer. The full
    * DoReMi runs exponentiated-gradient updates against a proxy model;
    * this one-step linear variant (weight ∝ share × (1 + excess)) is
    * the deterministic, oracle-checkable core of the loop: feed
    * `new_weight_ppm` back into [[epochAllocation]]'s weights and
    * iterate outside.
    *
    * Input: one row per scored doc with `sourceCol`, `n_trans`,
    * `sum_logp_e6` ([[NgramLm.scoreBackoffWith]]'s schema plus the
    * source column). All arithmetic integer: per-source average NLL in
    * e6 (micro-nats, floor), excess over the min-loss domain, an
    * excess factor in e3 (milli-nat resolution — coarse enough that
    * share_ppm × factor_e3 × 1e6 stays far inside 64 bits), and a ppm
    * normalization.
    *
    * Output per source: `(source, n_docs, n_trans, avg_nll_e6,
    * excess_e6, share_ppm, new_weight_ppm)`. Sources with no scored
    * transitions get zero weight and are excluded from the baseline.
    *
    * Scale: one shuffle (per-source aggregation); the totals/baseline
    * are a 1-row broadcast over the sources-sized table — the
    * [[epochAllocation]] pattern.
    */
  def reweightByLoss(scored: DataFrame, sourceCol: String): DataFrame = {
    val per = scored.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_trans")), lit(0L)).as("n_trans"),
        coalesce(sum(col("sum_logp_e6")), lit(0L)).as("sum_logp_e6"))
      .withColumn("avg_nll_e6",
        when(col("n_trans") === 0, lit(0L))
          .otherwise(expr("(-sum_logp_e6) div n_trans")))
      .localCheckpoint(true) // feeds totals AND the plan rows once
    val totals = per.agg(
      min(when(col("n_trans") > 0, col("avg_nll_e6"))).as("base_nll_e6"),
      sum(col("n_trans")).as("trans_sum"))
    val raw = per.crossJoin(broadcast(totals))
      .withColumn("excess_e6",
        when(col("n_trans") === 0, lit(0L))
          .otherwise(col("avg_nll_e6") - col("base_nll_e6")))
      .withColumn("share_ppm",
        when(col("trans_sum") === 0, lit(0L))
          .otherwise(expr("(n_trans * 1000000) div trans_sum")))
      .withColumn("_raw",
        when(col("n_trans") === 0, lit(0L))
          .otherwise(col("share_ppm") *
            (lit(1000L) + expr("excess_e6 div 1000"))))
      .localCheckpoint(true)
    val rawSum = raw.agg(sum(col("_raw")).as("raw_sum"))
    raw.crossJoin(broadcast(rawSum))
      .withColumn("new_weight_ppm",
        when(col("raw_sum") === 0, lit(0L))
          .otherwise(expr("(_raw * 1000000) div raw_sum")))
      .select(col("source"), col("n_docs"), col("n_trans"),
        col("avg_nll_e6"), col("excess_e6"), col("share_ppm"),
        col("new_weight_ppm"))
  }
}
