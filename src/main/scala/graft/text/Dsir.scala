package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-shaped data selection — importance weights from two bag-of-token
  * models (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every raw-corpus document by how much
  * more likely its tokens are under a TARGET distribution (a small
  * high-quality slice) than under the RAW distribution, then keep the
  * top-weighted documents. The reference engine has no selection
  * operator; this is part of the LLM-pipeline extension surface.
  *
  * Model: Laplace-smoothed unigram over [[TextOps.tokens]] for both
  * distributions, sharing one vocabulary V = distinct raw-corpus tokens
  * (contract: the target set is drawn from the raw corpus token space —
  * a slice, the [[graft.similarity.Similarity.semanticContamination]]
  * convention). Per-token contribution is integerized EXACTLY as
  * [[NgramLm]] does:
  *
  *   dsir_e6(w) = round(ln((c_t(w)+1)/(T_t+V))·1e6)
  *              − round(ln((c_r(w)+1)/(T_r+V))·1e6)
  *
  * Each rounded term is a pure IEEE expression of two integers (the PSI
  * convention), so every cross-document sum and the per-doc average
  * (sign-corrected integer division) are exact across engines.
  *
  * Scale design: the model is ONE corpus aggregation (token count per
  * word, map-side combined) plus one target-slice aggregation, joined
  * into a vocabulary-sized table that is staged eagerly (the model-write
  * of a real pipeline); totals ride a 1-row broadcast. Scoring is a
  * second corpus pass: explode tokens, equi-join the model (plan-adaptive
  * — broadcastable while the vocabulary is small), one map-side-combined
  * sum per doc. Selection is `orderBy(...).limit(m)` — Spark's
  * distributed TakeOrdered, no global sort, no single-partition window.
  */
object Dsir {

  /** Per-doc token stream `(doc_id, w)` — map-only. */
  private def toks(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("w"))

  /** The trained importance model: vocabulary-sized `(w, dsir_e6)`.
    * Tokens absent from the target slice contribute the (negative)
    * smoothed floor — exactly the paper's smoothing role. Staged eagerly:
    * it feeds the scoring join and would otherwise re-aggregate the
    * corpus once per consumer.
    *
    * Feature space: the model is defined over the RAW vocabulary (the
    * analogue of the paper's fixed hashed-feature space). Target tokens
    * outside it are excluded BY CONSTRUCTION — from the table and from
    * `tt`, so the in-vocabulary probabilities stay consistent. For an
    * external target corpus (not a raw slice), measure the excluded
    * mass first with [[oovTargetFraction]]; a large value means the
    * vocabulary should come from raw ∪ target instead. */
  def model(raw: DataFrame, target: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val cr = toks(raw, idCol, textCol)
      .groupBy(col("w")).agg(count(lit(1)).as("cr"))
    val ct = toks(target, idCol, textCol)
      .groupBy(col("w")).agg(count(lit(1)).as("ct"))
    val joined = cr.join(ct, Seq("w"), "left")
      .select(col("w"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
      .localCheckpoint(true)
    val totals = joined.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
      count(lit(1)).as("v"))
    joined.crossJoin(broadcast(totals))
      .select(col("w"),
        (round(log((col("ct") + 1).cast("double") /
            (col("tt") + col("v")).cast("double")) * 1e6).cast("long")
          - round(log((col("cr") + 1).cast("double") /
            (col("tr") + col("v")).cast("double")) * 1e6).cast("long"))
          .as("dsir_e6"))
  }

  /** Diagnostic for external targets: the fraction of target token
    * OCCURRENCES outside the raw vocabulary (0 for a raw slice). One
    * row `(oov_toks, target_toks, oov_ppm)`. Cheap relative to
    * training — the same two token streams, one anti-join. */
  def oovTargetFraction(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String): DataFrame = {
    val vocab = toks(raw, idCol, textCol).select(col("w")).distinct()
    val tt = toks(target, idCol, textCol)
    tt.join(vocab, Seq("w"), "left_anti")
      .agg(count(lit(1)).as("oov_toks"))
      .crossJoin(broadcast(tt.agg(count(lit(1)).as("target_toks"))))
      .select(col("oov_toks"), col("target_toks"),
        when(col("target_toks") === 0, lit(0L))
          .otherwise(expr("(oov_toks * 1000000) div target_toks"))
          .as("oov_ppm"))
  }

  /** Score every raw doc under a trained model: `(doc_id, n_toks,
    * sum_dsir_e6, avg_dsir_e6)` — one row per input doc (0-token docs
    * score zeros; vanishing rows would skew downstream gating). Every
    * raw token is in the model by construction, so the inner join loses
    * nothing. */
  def score(raw: DataFrame, idCol: String, textCol: String,
            model: DataFrame): DataFrame = {
    val sc = toks(raw, idCol, textCol)
      .join(model, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("dsir_e6")).as("sum_dsir_e6"))
    raw.select(col(idCol).cast("long").as("doc_id"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("sum_dsir_e6"), lit(0L)).as("sum_dsir_e6"),
        when(coalesce(col("n_toks"), lit(0L)) === 0, lit(0L))
          // negative-numerator integer division truncates in Spark but
          // floors in DuckDB — divide magnitudes, re-apply the sign
          .otherwise(expr(
            "CASE WHEN sum_dsir_e6 >= 0 THEN sum_dsir_e6 div n_toks "
              + "ELSE -((-sum_dsir_e6) div n_toks) END"))
          .as("avg_dsir_e6"))
  }

  /** Train + score + keep the top-`m` docs by (sum_dsir_e6 DESC, doc_id)
    * — deterministic greedy selection (the paper resamples with Gumbel
    * noise; an engine gate needs the noise-free argmax form). */
  def selectTop(raw: DataFrame, target: DataFrame, idCol: String,
                textCol: String, m: Int): DataFrame =
    score(raw, idCol, textCol, model(raw, target, idCol, textCol))
      .orderBy(col("sum_dsir_e6").desc, col("doc_id").asc)
      .limit(m)
}
