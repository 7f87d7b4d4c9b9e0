package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.Similarity
import graft.text.Boilerplate

/** Round-15 additions — corpus-hygiene and serving-side operators:
  *
  *   - cross-document boilerplate removal over content-defined chunks
  *     ([[Boilerplate]]) — the CCNet "repeated paragraph" stage;
  *
  * Exactness: boilerplate semantics are pure string/count algebra over
  * the md5 chunk convention — zero float surface, so the oracle replays
  * the whole pipeline (chunking, distinct-doc frequency, rebuild).
  */
object Round15Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Boilerplate strip: chunks recurring in ≥ 2 distinct docs are
    // removed from EVERY doc (no canonical copy kept — the
    // decontamination direction, like d_substr_strip); receipt counts +
    // rebuilt text per doc. At sf0.01 ~217 digests are cross-doc
    // (d_chunk_dedup's readout is this operator's mark set).
    "d_boilerplate_strip" -> ((s, dir) => {
      Boilerplate.strip(load(s, dir, "documents"), "doc_id", "text",
          w = 4, modulus = 8, minDocs = 2)
        .orderBy(col("doc_id"))
    }),

    // Filtered ANN with adaptive probe depth: label = 3 qualifies ~10%
    // of the corpus (~5 per stride-50 cell at every sf), so the
    // 12-candidate floor makes every query walk ~3 cells — the adaptive
    // branch is live under the oracle, not just the happy path. Stride
    // centroids keep the whole pipeline SQL-replayable (the e_ann_ivf
    // technique: argmin assignment, distance-ordered cumulative walk,
    // within-cell ranking — all bit-identical double arithmetic).
    "e_ann_filtered" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      Similarity.ivfTopKFiltered(
          emb.filter(col("vec_id") < 50),
          Similarity.ivfAssignWith(emb, cents, Seq("label")),
          col("label") === 3, k = 3, cents, minCandidates = 12)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // k-NN graph: EVERY vector's top-3 neighbors, cell-bounded
    // (nprobe=2 of the stride-50 cells) — the whole-corpus artifact, not
    // a bounded query batch, so this exercises the non-broadcast probe
    // path. Fully oracled: the walk + within-cell ranking replay in SQL.
    "e_knn_graph" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      Similarity.knnGraph(Similarity.ivfAssign(emb, cents), cents,
          k = 3, nprobe = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // One-round kNN label propagation: nodes with vec_id % 7 == 0 are
    // masked unlabeled and take the majority label of their labeled
    // top-5 neighbors (integer votes, ties to the smallest label) —
    // the semi-supervised backfill over the e_knn_graph artifact.
    "e_label_prop" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val graph = Similarity.knnGraph(Similarity.ivfAssign(emb, cents),
        cents, k = 5, nprobe = 2)
      // naturally-null labels (none in current testdata, but defended:
      // Round10Queries.scala has the same guard) are excluded BEFORE the
      // mask, so targets are exactly the %7 nodes and voters exactly the
      // non-%7 labeled ones — the oracle states the same two predicates
      val labels = emb.filter(col("label").isNotNull)
        .select(col("vec_id"),
          when(pmod(col("vec_id"), lit(7)) === 0, lit(null))
            .otherwise(col("label")).as("label"))
      Similarity.labelPropagate(graph, labels)
        .orderBy(col("vec_id"))
    }),

    // Curriculum interleave by language: the delivery-order key under
    // which any contiguous training window sees every language at ≈ its
    // corpus share (±1-exact per pos_ppm threshold — the prefix law
    // CurriculumSpec pins). Deterministic md5 draw, zero RNG state.
    "d_curriculum" -> ((s, dir) => {
      graft.text.Curriculum.interleave(load(s, dir, "documents"),
          "doc_id", "lang", epoch = 0L)
        .orderBy(col("pos_ppm"), col("band"), col("id"))
    }),

    // Trigram stupid-backoff LM: model trained on the EVEN-doc slice,
    // scored over the whole corpus (held-out perplexity — self-scoring
    // a training corpus attests every trigram, which would leave the
    // backoff branches dead under the oracle; the odd docs keep all
    // three CASE arms live). 0.4 backoff penalty = the FIXED integer
    // literal -916291 (ln 0.4 · 1e6) in both engines; the per-doc
    // backoff-level histogram (n_tri/n_bi/n_uni) is gate data — it IS
    // the quality signal.
    "d_lm_backoff" -> ((s, dir) => {
      val d = load(s, dir, "documents")
      val (tri, bi0, uni, total) = graft.text.NgramLm.fitBackoff(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      graft.text.NgramLm.scoreBackoffWith(d, "doc_id", "text",
          tri, bi0.localCheckpoint(true), uni, total)
        .orderBy(col("doc_id"))
    }),

    // Mix EXECUTION: the d_mix_epochs plan (same budget/cap) turned
    // into an actual doc selection with repeat counts — full epochs +
    // deterministic draw-order prefix of the remainder. At sf0.01 the
    // cap binds for 2 sources (e_full = 2, empty prefix) and not the
    // rest — both repeat regimes live under the oracle.
    "d_mix_execute" -> ((s, dir) => {
      graft.text.MixPlanner.executeAllocation(
          load(s, dir, "documents"), "source", "doc_id",
          graft.text.TextOps.tokenCountWs(col("text")).cast("long"),
          budget = 50000L, capX100 = 200L)
        .orderBy(col("source"), col("doc_id"))
    }),

    // IVF index deletion: forget vec_id % 37 == 0 (the d_forget id
    // slice) from the stride-50 codes index; the gate data is the
    // per-touched-cell RECEIPT — with a partitioned persisted index,
    // exactly the partitions a deletion rewrite touches.
    "e_ann_ivf_forget" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val (_, receipt) = Similarity.ivfForget(
        Similarity.ivfAssign(emb, cents),
        emb.filter(col("vec_id") % 37 === 0).select(col("vec_id")))
      receipt.orderBy(col("centroid_id"))
    }),

    // Inverted-index BM25 retrieval: three literal query-term sets
    // served from the built postings index — top-10 each, the
    // query-driven curation readout. Shares the d_bm25 scoring
    // arithmetic (integerize-then-sum at 1e9).
    "d_retrieval_topk" -> ((s, dir) => {
      import s.implicits._
      val (postings, terms, docLens, stats) =
        graft.text.Retrieval.buildIndex(load(s, dir, "documents"),
          "doc_id", "text")
      val qs = Seq(
        (1L, Seq("stream", "filter", "merge")),
        (2L, Seq("table", "scan")),
        (3L, Seq("vector", "spark", "batch", "batch")))
        .toDF("query_id", "terms")
      graft.text.Retrieval.topK(qs, postings, terms, docLens, stats,
          k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Decontamination ATTRIBUTION: per contaminated (corpus doc, eval
    // doc) pair, the distinct 8-gram overlap — eval = docs 0-4 (the
    // d_decontaminate slice, which this report refines from "doc X is
    // contaminated" to "by eval item Y, Z grams").
    "d_decontaminate_attrib" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      graft.text.Decontaminate.attribute(docs,
          docs.filter(col("doc_id") < 5), "doc_id", "doc_id", "text")
        .orderBy(col("doc_id"), col("eval_id"))
    }),

    // k-anonymity receipt over the (lang, source) quasi-identifiers,
    // k=8: every observed combination with its size and suppression
    // flag — the privacy release gate's audit artifact. At sf0.01
    // (~5 docs/combo) most groups suppress; at sf0.1 (~50/combo) the
    // kept branch dominates — both branches live across the gate SFs.
    "d_k_anon" -> ((s, dir) => {
      graft.operators.Anonymize.kAnonymityReceipt(
          load(s, dir, "documents"), Seq("lang", "source"), k = 8L)
        .orderBy(col("lang"), col("source"))
    })
  )

  /** The backoff-LM oracle chain (train on even docs, score all)
    * up through the per-doc `ag` aggregate — shared by the
    * d_lm_backoff final select and Round16's d_mix_reweight. */
  private[queries] val lmBackoffChainSql: String =
    s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, ${QueryShared.tokensSql} AS t FROM documents),
         |tkm AS MATERIALIZED (
         |  SELECT doc_id, t FROM tk WHERE doc_id % 2 = 0),
         |tri AS MATERIALIZED (
         |  SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3,
         |    CAST(count(*) AS BIGINT) AS c3
         |  FROM tkm, UNNEST(range(1, len(t) - 1)) AS u(i)
         |  WHERE len(t) >= 3 GROUP BY 1, 2, 3),
         |bi AS MATERIALIZED (
         |  SELECT t[i] AS w1, t[i+1] AS w2, CAST(count(*) AS BIGINT) AS c
         |  FROM tkm, UNNEST(range(1, len(t))) AS u(i)
         |  WHERE len(t) >= 2 GROUP BY 1, 2),
         |uni AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cu
         |  FROM (SELECT unnest(t) AS w FROM tkm) GROUP BY 1),
         |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni),
         |tr AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
         |  FROM tk, UNNEST(range(1, len(t) - 1)) AS u(i)
         |  WHERE len(t) >= 3),
         |sc AS (
         |  SELECT tr.doc_id,
         |    CASE
         |      WHEN tri.c3 IS NOT NULL THEN
         |        CAST(round(ln(CAST(tri.c3 AS DOUBLE) / b12.c) * 1e6)
         |          AS BIGINT)
         |      WHEN b23.c IS NOT NULL THEN
         |        -916291 + CAST(round(ln(CAST(b23.c AS DOUBLE) / u2.cu)
         |          * 1e6) AS BIGINT)
         |      ELSE
         |        -1832582 + CAST(round(ln(CAST(u3.cu AS DOUBLE) / tot.n)
         |          * 1e6) AS BIGINT)
         |    END AS logp_e6,
         |    CASE WHEN tri.c3 IS NOT NULL THEN 1 ELSE 0 END AS is3,
         |    CASE WHEN tri.c3 IS NULL AND b23.c IS NOT NULL THEN 1
         |      ELSE 0 END AS is2
         |  FROM tr
         |  LEFT JOIN tri USING (w1, w2, w3)
         |  LEFT JOIN bi b12 ON b12.w1 = tr.w1 AND b12.w2 = tr.w2
         |  LEFT JOIN bi b23 ON b23.w1 = tr.w2 AND b23.w2 = tr.w3
         |  LEFT JOIN uni u2 ON u2.w = tr.w2
         |  JOIN uni u3 ON u3.w = tr.w3, tot),
         |ag AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
         |    CAST(sum(is3) AS BIGINT) AS n_tri,
         |    CAST(sum(is2) AS BIGINT) AS n_bi,
         |    CAST(count(*) - sum(is3) - sum(is2) AS BIGINT) AS n_uni,
         |    CAST(sum(logp_e6) AS BIGINT) AS sum_logp_e6
         |  FROM sc GROUP BY 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "d_boilerplate_strip" ->
      s"""WITH ${Round14Queries.cdcSql("documents", "")},
         |fr AS (
         |  SELECT chunk_md5 FROM chunks
         |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |mk AS (
         |  SELECT c.doc_id, c.chunk_id, c.start_tok, c.n_toks,
         |    (f.chunk_md5 IS NOT NULL) AS boiler
         |  FROM chunks c LEFT JOIN fr f USING (chunk_md5))
         |SELECT m.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(count(*) FILTER (WHERE NOT boiler) AS BIGINT) AS n_kept,
         |  COALESCE(string_agg(
         |    CASE WHEN NOT boiler THEN array_to_string(
         |      array_slice(t, start_tok, start_tok + n_toks - 1), ' ') END,
         |    ' ' ORDER BY chunk_id), '') AS text
         |FROM mk m JOIN tt USING (doc_id)
         |GROUP BY m.doc_id ORDER BY m.doc_id""".stripMargin,

    "e_ann_filtered" -> {
      def cos(a: String, b: String) = Round13Queries.cosSql(a, b)
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, centroid_id, embedding, label
         |  FROM (
         |    SELECT e.vec_id, c.centroid_id, e.embedding, e.label,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY -(${cos("e.embedding", "c.centroid")}) ASC,
         |          c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) t
         |  WHERE rn = 1),
         |qual AS (SELECT * FROM assigned WHERE label = 3),
         |cellcn AS (
         |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS cn
         |  FROM qual GROUP BY 1),
         |walk AS (
         |  SELECT q.vec_id AS query_id, c.centroid_id,
         |    q.embedding AS q_emb, COALESCE(cc.cn, 0) AS cn,
         |    -(${cos("q.embedding", "c.centroid")}) AS cd
         |  FROM embeddings q CROSS JOIN cents c
         |  LEFT JOIN cellcn cc ON cc.centroid_id = c.centroid_id
         |  WHERE q.vec_id < 50),
         |cum AS (
         |  SELECT *, COALESCE(SUM(cn) OVER (PARTITION BY query_id
         |    ORDER BY cd ASC, centroid_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS cumprev
         |  FROM walk),
         |probed AS (
         |  SELECT query_id, centroid_id, q_emb FROM cum
         |  WHERE cumprev < 12 AND cn > 0),
         |scored AS (
         |  SELECT p.query_id, a.neighbor_id,
         |    ${cos("p.q_emb", "a.embedding")} AS cos_sim
         |  FROM qual a JOIN probed p ON a.centroid_id = p.centroid_id
         |  WHERE p.query_id <> a.neighbor_id)
         |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },

    "e_knn_graph" ->
      s"""WITH ${knnGraphCtes(k = 3, nprobe = 2)}
         |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "e_label_prop" ->
      s"""WITH ${knnGraphCtes(k = 5, nprobe = 2)},
         |votes AS (
         |  SELECT r.query_id, e.label,
         |    CAST(count(*) AS BIGINT) AS n_votes
         |  FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
         |  WHERE r.rank <= 5 AND r.query_id % 7 = 0
         |    AND e.vec_id % 7 <> 0 AND e.label IS NOT NULL
         |  GROUP BY 1, 2),
         |tgt AS (
         |  SELECT DISTINCT vec_id FROM embeddings
         |  WHERE vec_id % 7 = 0 AND label IS NOT NULL),
         |win AS (
         |  SELECT query_id, label, n_votes,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY n_votes DESC, label ASC) AS wr,
         |    CAST(SUM(n_votes) OVER (PARTITION BY query_id) AS BIGINT)
         |      AS n_labeled
         |  FROM votes JOIN tgt ON votes.query_id = tgt.vec_id)
         |SELECT query_id AS vec_id, label AS pred_label, n_votes,
         |  n_labeled
         |FROM win WHERE wr = 1 ORDER BY vec_id""".stripMargin,

    "d_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(lang AS VARCHAR) AS band,
        |    CAST(('0x' || substr(md5('cur0:' || CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS draw
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, band, draw,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY band
        |      ORDER BY draw, doc_id) AS BIGINT) AS r_in_band,
        |    CAST(COUNT(*) OVER (PARTITION BY band) AS BIGINT) AS n_band
        |  FROM d)
        |SELECT doc_id AS id, band, r_in_band,
        |  (r_in_band - 1) * 1000000 // n_band AS pos_ppm
        |FROM r ORDER BY pos_ppm, band, id""".stripMargin,

    "d_lm_backoff" -> (Round15Queries.lmBackoffChainSql +
      s"""
         |SELECT d.doc_id,
         |  COALESCE(n_trans, 0) AS n_trans,
         |  COALESCE(n_tri, 0) AS n_tri,
         |  COALESCE(n_bi, 0) AS n_bi,
         |  COALESCE(n_uni, 0) AS n_uni,
         |  COALESCE(sum_logp_e6, 0) AS sum_logp_e6,
         |  CASE WHEN COALESCE(n_trans, 0) = 0 THEN 0
         |    WHEN sum_logp_e6 >= 0 THEN sum_logp_e6 // n_trans
         |    ELSE -((-sum_logp_e6) // n_trans) END AS avg_logp_e6
         |FROM documents d LEFT JOIN ag USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin),


    "d_mix_execute" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |      AS toks
        |  FROM documents GROUP BY source),
        |s AS (SELECT *,
        |  CAST(round(sqrt(CAST(toks AS DOUBLE)) * 1e6) AS BIGINT) AS s_s
        |  FROM t),
        |ss AS (SELECT CAST(sum(s_s) AS BIGINT) AS s_sum FROM s),
        |p AS (SELECT source, toks,
        |  (s_s * 1000000) // s_sum AS share_ppm FROM s, ss),
        |w AS (SELECT *, (50000 * share_ppm) // 1000000 AS want_toks
        |  FROM p),
        |a AS (SELECT source, toks,
        |  LEAST(want_toks, (toks * 200) // 100) AS alloc_toks FROM w),
        |d AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
        |      AS doc_toks,
        |    CAST(('0x' || substr(md5('mix0:' || CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS draw
        |  FROM documents),
        |c AS (
        |  SELECT d.source, doc_id, doc_toks, a.toks, a.alloc_toks,
        |    CASE WHEN a.toks = 0 THEN 0
        |      ELSE a.alloc_toks // a.toks END AS e_full,
        |    SUM(doc_toks) OVER (PARTITION BY d.source
        |      ORDER BY draw, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d JOIN a USING (source)),
        |r AS (
        |  SELECT source, doc_id, doc_toks,
        |    e_full + CASE WHEN alloc_toks > 0
        |      AND cum <= alloc_toks - e_full * toks
        |      THEN 1 ELSE 0 END AS n_repeats
        |  FROM c)
        |SELECT source, doc_id, doc_toks, CAST(n_repeats AS BIGINT)
        |  AS n_repeats
        |FROM r WHERE n_repeats >= 1
        |ORDER BY source, doc_id""".stripMargin,

    "e_ann_ivf_forget" -> {
      def cos(a: String, b: String) = Round13Queries.cosSql(a, b)
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY -(${cos("e.embedding", "c.centroid")}) ASC,
         |          c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) t
         |  WHERE rn = 1),
         |sizes AS (
         |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_before
         |  FROM assigned GROUP BY 1),
         |removed AS (
         |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_removed
         |  FROM assigned WHERE vec_id % 37 = 0 GROUP BY 1)
         |SELECT centroid_id, n_before, n_removed,
         |  n_before - n_removed AS n_after
         |FROM sizes JOIN removed USING (centroid_id)
         |ORDER BY centroid_id""".stripMargin
    },

    "d_retrieval_topk" ->
      s"""WITH base AS (
         |  SELECT doc_id, ${QueryShared.tokensSql} AS toks
         |  FROM documents),
         |docs AS (
         |  SELECT doc_id, len(toks) AS dl FROM base WHERE len(toks) > 0),
         |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
         |tf AS (
         |  SELECT doc_id, t, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM base)
         |  GROUP BY 1, 2),
         |df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
         |qq AS (SELECT * FROM (VALUES
         |  (1, ['stream', 'filter', 'merge']),
         |  (2, ['table', 'scan']),
         |  (3, ['vector', 'spark', 'batch', 'batch']))
         |  AS v(query_id, terms)),
         |qt AS (
         |  SELECT DISTINCT query_id, t
         |  FROM (SELECT query_id, unnest(terms) AS t FROM qq)),
         |scored AS (
         |  SELECT qt.query_id, tf.doc_id,
         |    CAST(SUM(CAST(ROUND(
         |        ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
         |        tf.tf * 2.2 /
         |        (tf.tf + 1.2 * (0.25 + 0.75 * docs.dl / stats.avgdl))
         |        * 1e9) AS BIGINT)) AS BIGINT) AS bm25_e9
         |  FROM qt JOIN tf USING (t) JOIN df USING (t)
         |    JOIN docs ON tf.doc_id = docs.doc_id
         |    CROSS JOIN stats
         |  GROUP BY 1, 2)
         |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
         |  bm25_e9
         |FROM (
         |  SELECT query_id, doc_id, bm25_e9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY bm25_e9 DESC, doc_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "d_decontaminate_attrib" ->
      s"""WITH g AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 8 THEN []
         |    ELSE list_transform(range(1, len(t) - 6),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
         |           t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
         |           t[i+6] || ' ' || t[i+7]) END) AS grams
         |  FROM (SELECT doc_id, ${QueryShared.tokensSql} AS t
         |        FROM documents)),
         |bench AS (
         |  SELECT doc_id AS eval_id, unnest(grams) AS gr FROM g
         |  WHERE doc_id < 5),
         |pairs AS (
         |  SELECT d.doc_id, b.eval_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM (SELECT doc_id, unnest(grams) AS gr FROM g) d
         |  JOIN bench b USING (gr)
         |  GROUP BY 1, 2)
         |SELECT doc_id, eval_id, n_shared FROM pairs
         |ORDER BY doc_id, eval_id""".stripMargin,

    "d_k_anon" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |  count(*) < 8 AS suppressed
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin
  )

  /** The [[Similarity.knnGraph]] pipeline (stride-50 centroids) as
    * DuckDB CTEs ending in `ranked(query_id, rank, neighbor_id,
    * cos_sim)` — ONE SQL definition shared by the graph and
    * label-propagation oracles (the cdcSql convention). The cell walk
    * (`rn <= nprobe` over the (distance, centroid_id) order) replays
    * the engine's in-row `array_sort` probe bit-for-bit. */
  private[queries] def knnGraphCtes(k: Int, nprobe: Int): String = {
    def cos(a: String, b: String) = Round13Queries.cosSql(a, b)
    s"""cents AS (
       |  SELECT vec_id AS centroid_id, embedding AS centroid
       |  FROM embeddings WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id AS neighbor_id, centroid_id, embedding FROM (
       |    SELECT e.vec_id, c.centroid_id, e.embedding,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY -(${cos("e.embedding", "c.centroid")}) ASC,
       |          c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c) t
       |  WHERE rn = 1),
       |walked AS (
       |  SELECT vec_id AS query_id, centroid_id, embedding AS q_emb
       |  FROM (
       |    SELECT e.vec_id, c.centroid_id, e.embedding,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY -(${cos("e.embedding", "c.centroid")}) ASC,
       |          c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c) t
       |  WHERE rn <= $nprobe),
       |scored AS (
       |  SELECT w.query_id, a.neighbor_id,
       |    ${cos("w.q_emb", "a.embedding")} AS cos_sim
       |  FROM assigned a JOIN walked w ON a.centroid_id = w.centroid_id
       |  WHERE w.query_id <> a.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored
       |  QUALIFY rank <= $k)""".stripMargin
  }
}
