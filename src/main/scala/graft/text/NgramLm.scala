package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model and per-document log-probability
  * scoring — the model-based quality filter of an LLM data pipeline
  * (CCNet-style: score every document under a LM trained on the corpus
  * itself, then gate on the score), with no external model dependency.
  * The reference engine has no LM operator; this is part of the
  * LLM-pipeline extension surface.
  *
  * Model: Laplace-smoothed bigram over the corpus token convention
  * ([[TextOps.tokens]]): P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V),
  * V = distinct token types. Scores are integerized per transition —
  * `round(ln(p) · 1e6)` as BIGINT — so every cross-document sum and the
  * per-doc average (integer division) are exact across engines; only
  * the per-transition rounding touches floats, and each is a pure
  * IEEE-deterministic expression of two integers (the PSI convention).
  *
  * Scale design: bigram extraction is MAP-ONLY (pairs built from the
  * token array in-row — no self-join, no window); the count tables are
  * classic two-phase aggregations; context counts derive from the
  * bigram table (vocabulary-sized), not a second corpus pass. Scoring
  * re-attaches counts by equi-join on (w1, w2) / w1 — broadcastable
  * while the model is vocabulary-sized, plan-adaptive otherwise. The
  * corpus shuffles once for the count and once for the score
  * re-attach; V rides a 1-row broadcast cross join.
  */
object NgramLm {

  /** Per-doc transitions `(doc_id, w1, w2)`, map-only. */
  private def transitions(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        explode(when(size(col("t")) >= 2,
          transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2"))))
          .otherwise(array())).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
  }

  /** Train the bigram table: `(w1, w2, c)`. */
  def train(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    transitions(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))

  /** Score every doc under the corpus-trained model: `(doc_id, n_trans,
    * sum_logp_e6, avg_logp_e6)`. Docs with fewer than 2 tokens score 0
    * transitions and 0 sums (a row per input doc — vanishing rows would
    * skew downstream gating).
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tr = transitions(docs, idCol, textCol)
    // bigrams feeds BOTH the score join and the context aggregation;
    // stage it (eager localCheckpoint — the model-table write of a real
    // pipeline) or Catalyst re-runs the corpus count once per consumer.
    // The checkpoint is vocabulary-sized, the saved re-scan corpus-sized.
    val bigrams = tr.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // context counts from the (vocabulary-sized) bigram table — not a
    // second pass over the corpus
    val ctx = bigrams.groupBy(col("w1")).agg(sum(col("c")).as("cw"))
    val vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    scoreWith(docs, idCol, textCol, bigrams, ctx, vocab)
  }

  /** Score docs under an ALREADY-TRAINED model — the serve-many half
    * (train on the corpus once with [[score]]'s internals or persist
    * the tables; score any doc set, including streams, against them).
    * Unseen transitions join away exactly as in training-corpus scoring:
    * a transition absent from `bigrams` contributes nothing (the
    * training-corpus contract; smoothing covers seen-context novelty).
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
                bigrams: DataFrame, ctx: DataFrame,
                vocab: DataFrame): DataFrame = {
    val tr = transitions(docs, idCol, textCol)
    val scored = tr
      .join(bigrams, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((col("c") + 1).cast("double") /
          (col("cw") + col("v")).cast("double")) * 1e6)
          .cast("long").as("logp_e6"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("logp_e6")).as("sum_logp_e6"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("sum_logp_e6"), lit(0L)).as("sum_logp_e6"),
        when(coalesce(col("n_trans"), lit(0L)) === 0, lit(0L))
          // integer-division semantics for NEGATIVE numerators differ
          // across engines (truncate vs floor) — divide magnitudes and
          // re-apply the sign so both state the same truncation
          .otherwise(expr("-((-sum_logp_e6) div n_trans)"))
          .as("avg_logp_e6"))
  }

  /** The trained model as three tables `(bigrams, ctx, vocab)` — the
    * persist-and-serve artifact set for [[scoreWith]]. */
  def fit(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val bigrams = train(docs, idCol, textCol).localCheckpoint(true)
    val ctx = bigrams.groupBy(col("w1")).agg(sum(col("c")).as("cw"))
    val vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    (bigrams, ctx, vocab)
  }
}
