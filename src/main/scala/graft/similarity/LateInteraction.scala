package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ColBERT-style late-interaction (MaxSim) retrieval: query and document
  * are each a BAG of token vectors, and
  *
  *   score(q, d) = Σ_{query token t} max_{doc token u} cos(t, u)
  *
  * — every query token finds its best-matching document token, and the
  * per-token maxima add. This ranks long documents by their best local
  * regions instead of one pooled vector, the retrieval quality step
  * between single-vector ANN and a full cross-encoder.
  *
  * Exactness: the inner max is over bit-identical doubles (the
  * e_ann_brute cosine argument), and the outer sum is over
  * `round(max·1e6)` BIGINTs — float addition order never matters, so the
  * ranking replays exactly in SQL. Ties break (score DESC, doc_id).
  *
  * Scale shape: the query batch (tokens included) broadcasts — the
  * corpus-sized token table never shuffles for the probe. The token-max
  * aggregation keys on (query, doc, q_tok) with map-side partial max, so
  * the first exchange carries at most |docs|·|query tokens| reduced rows,
  * and the score sum + rank reuse one (query, doc)-grained exchange.
  * Production deployments should rerank an ANN SHORTLIST
  * ([[maxSimRerank]]) rather than score the whole corpus
  * ([[maxSimTopK]], the exact/gate form): candidates × tokens is the
  * bounded unit of work, the same funnel contract as
  * [[Similarity.mrlTopK]].
  */
object LateInteraction {

  private def scoreAndRank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .groupBy(col("query_id"), col("doc_id"), col("q_tok"))
      .agg(max(col("_cos")).as("mx"))
      .withColumn("m", round(col("mx") * lit(1000000.0)).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("m")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Score EVERY document against every query — the exact form (and the
    * oracle's). `queryVecs`: (query_id, token_idx, embedding) — a bounded
    * batch; `docVecs`: (doc_id, token_idx, embedding) — the corpus. */
  def maxSimTopK(queryVecs: DataFrame, docVecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"maxSimTopK: k=$k must be >= 1")
    val q = broadcast(queryVecs.select(col("query_id"),
      col("token_idx").as("q_tok"), col("embedding").as("q_emb")))
    val scored = docVecs.select(col("doc_id"), col("embedding").as("d_emb"))
      .crossJoin(q)
      .withColumn("_cos", Similarity.cosineGuarded(col("q_emb"), col("d_emb")))
    scoreAndRank(scored, k)
  }

  /** Rerank a candidate shortlist `(query_id, doc_id)` (e.g. from
    * [[Similarity.ivfTopK]] over pooled vectors): only shortlisted
    * documents' tokens are scored, so work is candidates × tokens — the
    * production funnel. Agrees with [[maxSimTopK]] whenever the
    * candidate set contains the true top-k (all-pairs candidates ⇒
    * exact, spec-pinned).
    *
    * CONTRACT: every candidate `doc_id` must have token rows in
    * `docVecs` — a candidate with none joins away SILENTLY (it is
    * absent from the ranked output, not scored-and-lost), so a pooled
    * index that drifts from the token table produces invisible recall
    * holes. Keep the two artifacts in the same snapshot; audit with
    * `candidates.join(docVecs, "doc_id", "left_anti")` when in doubt. */
  def maxSimRerank(candidates: DataFrame, queryVecs: DataFrame,
                   docVecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"maxSimRerank: k=$k must be >= 1")
    val cand = broadcast(candidates.select(col("query_id"), col("doc_id"))
      .distinct())
    val q = broadcast(queryVecs.select(col("query_id"),
      col("token_idx").as("q_tok"), col("embedding").as("q_emb")))
    val scored = docVecs.select(col("doc_id"), col("embedding").as("d_emb"))
      .join(cand, Seq("doc_id"))
      .join(q, Seq("query_id"))
      .withColumn("_cos", Similarity.cosineGuarded(col("q_emb"), col("d_emb")))
    scoreAndRank(scored, k)
  }
}
