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

  // --- trigram stupid backoff ------------------------------------------

  /** `round(ln(0.4)·1e6)` — the stupid-backoff penalty per backoff
    * level, FIXED as an integer literal in both engines (ln(0.4) =
    * -0.91629073187…; the constant removes even the one-time float
    * round from the cross-engine surface). */
  val Log04E6: Long = -916291L

  /** Per-doc trigram positions `(doc_id, w1, w2, w3)`, map-only. */
  private def triTransitions(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        explode(when(size(col("t")) >= 3,
          transform(sequence(lit(1), size(col("t")) - 2),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2"),
              element_at(col("t"), i + 2).as("w3"))))
          .otherwise(array())).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
  }

  /** Trigram STUPID-BACKOFF model (Brants et al., "Large Language
    * Models in Machine Translation", 2007): raw count tables at three
    * orders, no smoothing — the score backs off with a constant 0.4
    * penalty instead. Returns `(tri, bi, uni, total)`:
    * `tri(w1,w2,w3,c3)`, `bi(w1,w2,c)`, `uni(w,cu)`, `total(n)` 1-row.
    * Each table is ONE two-phase aggregation over map-only in-row gram
    * extraction; tri/bi/uni are the persistable model artifacts (tri is
    * corpus-vocabulary-sized — persist like the DSIR table, without the
    * k-row single-file coalesce). */
  def fitBackoff(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tri = triTransitions(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    val bi = train(docs, idCol, textCol)
    val uni = docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .localCheckpoint(true) // consumed twice (w2 and w3 denominators)
    val total = uni.agg(sum(col("cu")).as("n"))
    (tri, bi, uni, total)
  }

  /** Score docs under a trained stupid-backoff model. Per trigram
    * position: `ln(c3/c12)` when the trigram is attested, else
    * `ln(0.4) + ln(c23/c2)` when the (w2,w3) bigram is, else
    * `2·ln(0.4) + ln(cu3/N)` — every `ln` a ratio of two model
    * integers, integerized immediately (the d_lm_score ladder), the
    * backoff penalty the fixed [[Log04E6]] literal. Positions whose w3
    * is OOV under the model drop (the [[scoreWith]] serving
    * convention). Output: `(doc_id, n_trans, n_tri, n_bi, n_uni,
    * sum_logp_e6, avg_logp_e6)` — one row per input doc, the backoff-
    * level histogram included because it IS the interesting quality
    * signal (a doc scored mostly at the unigram level is noise).
    */
  def scoreBackoffWith(docs: DataFrame, idCol: String, textCol: String,
                       tri: DataFrame, bi: DataFrame, uni: DataFrame,
                       total: DataFrame): DataFrame = {
    val tr = triTransitions(docs, idCol, textCol)
    val joined = tr
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.withColumnRenamed("c", "c12"), Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c").as("c23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("cu").as("cu3")),
        Seq("w3"))
      .crossJoin(broadcast(total))
    val scored = joined
      .withColumn("logp_e6",
        when(col("c3").isNotNull,
          round(log(col("c3").cast("double") / col("c12")) * 1e6)
            .cast("long"))
        .when(col("c23").isNotNull,
          lit(Log04E6) +
            round(log(col("c23").cast("double") / col("c2")) * 1e6)
              .cast("long"))
        .otherwise(lit(2L * Log04E6) +
          round(log(col("cu3").cast("double") / col("n")) * 1e6)
            .cast("long")))
      .withColumn("is3", when(col("c3").isNotNull, 1L).otherwise(0L))
      .withColumn("is2", when(col("c3").isNull &&
        col("c23").isNotNull, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("is3")).as("n_tri"),
        sum(col("is2")).as("n_bi"),
        (count(lit(1)) - sum(col("is3")) - sum(col("is2"))).as("n_uni"),
        sum(col("logp_e6")).as("sum_logp_e6"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("sum_logp_e6"), lit(0L)).as("sum_logp_e6"),
        when(coalesce(col("n_trans"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("-((-sum_logp_e6) div n_trans)"))
          .as("avg_logp_e6"))
  }

  /** Train-and-score in one call (the corpus-self-scored gate form);
    * model tables stage eagerly — tri feeds one consumer but bi feeds
    * TWO score joins and uni two denominators, and all are
    * vocabulary-sized while the saved re-scan is corpus-sized. */
  def scoreBackoff(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val (tri, bi0, uni, total) = fitBackoff(docs, idCol, textCol)
    val bi = bi0.localCheckpoint(true)
    scoreBackoffWith(docs, idCol, textCol, tri, bi, uni, total)
  }
}
