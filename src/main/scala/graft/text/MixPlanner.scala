package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
}
