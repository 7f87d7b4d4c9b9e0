package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{IvfPq, Similarity, TrainedState}

/** Round-15 additions (third session): DELETION SYMMETRY for the
  * artifacts that still lacked it. The vectors/tokens artifacts and
  * the graph/HNSW deployments already had a full forget story; the
  * IVF family did not — the flat probe
  * ([[Similarity.ivfTopKFromIndex]]) scores the index's OWN embedding
  * column, so a vectors-artifact tombstone alone left a deleted id
  * fully servable from the cell index — and the funnel's POOLED
  * coarse artifact did not either (a stale pooled row keeps proposing
  * a deleted doc into every shortlist). These queries pin the new
  * index-side tombstones ([[TrainedState.forgetIvfDelta]] /
  * `forgetIvfPqDelta` / `forgetPooledDelta`) end to end: save base →
  * append/bake planted twins → FORGET the twins (a newer tombstone
  * generation must outrank them under newest-wins) → serve through
  * the fingerprint-cached reconciled loads. The IVF pair's centroids
  * come from the BASE slice (ids 0 and 50 — C = 2 at every SF), so
  * `nprobe = 2` SATURATES the probe: exact flat-scan semantics, and
  * the oracle is brute force over the base alone; the funnel query
  * saturates `shortlist = k` so a leaked pooled row CHANGES the
  * output instead of merely wasting a slot. Either way a reconcile
  * that leaked a tombstoned row (a twin at cosine 1 / the maximal
  * MaxSim score) or dropped a live one fails loudly.
  */
object Round26Queries {

  /** Per-(dataset, process) scratch path — the e_ann_opq_trained
    * convention: two concurrent processes benching the same dataset
    * must not interleave one artifact's save/load. */
  private def tmpPath(s: SparkSession, dir: String, tag: String): String =
    new java.io.File(
      System.getProperty("java.io.tmpdir"),
      tag + Integer.toHexString(dir.hashCode) + "_" +
        s.sparkContext.applicationId).getAbsolutePath

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Flat IVF index deletion through the persisted lifecycle. The
    // serve touches NO vectors artifact — the whole point: the cell
    // index itself must stop naming the deleted ids.
    "e_ann_ivf_index_forget" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val cents = base.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val idxPath = tmpPath(s, dir, "graft_ivfidxforget_")
      TrainedState.saveIvfIndex(Similarity.ivfAssign(base, cents), idxPath)
      TrainedState.appendIvfDelta(
        Similarity.ivfAssign(twins, cents), idxPath)
      TrainedState.forgetIvfDelta(twins.select(col("vec_id")), idxPath)
      Similarity.ivfTopKFromIndex(base.filter(col("vec_id") < 10),
          TrainedState.loadIvfIndexCached(s, idxPath), k = 1, cents,
          nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // IVF-PQ deletion across BOTH halves of the deployment: the codes
    // index tombstones stop the ADC shortlist proposing the twins, the
    // vectors-artifact tombstones stop the exact rerank scoring them —
    // either leak alone would surface a twin at cosine 1. Saturating
    // probe (C = 2, nprobe = 2) + rerank ≥ |base| makes every
    // surviving candidate exactly re-scored, so the serve equals brute
    // over the base.
    "e_ann_ivfpq_index_forget" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val base = emb.filter(col("vec_id") < 60)
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val cents = base.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val bookStride = math.max(1L,
        QueryShared.cachedCount(s, dir, "embeddings") / 20L).toInt
      val books = graft.similarity.ProductQuantizer.codebooks(
        emb, dim = 64, numSub = 8, stride = bookStride)
      val idxPath = tmpPath(s, dir, "graft_ivfpqidxforget_")
      val vecPath = tmpPath(s, dir, "graft_ivfpqvecforget_")
      TrainedState.saveIvfPqIndex(
        IvfPq.encode(base, cents, books, dim = 64, numSub = 8), idxPath)
      TrainedState.appendIvfPqDelta(
        IvfPq.encode(twins, cents, books, dim = 64, numSub = 8), idxPath)
      TrainedState.saveVectors(base, vecPath)
      TrainedState.appendVectorsDelta(twins, vecPath)
      TrainedState.forgetIvfPqDelta(twins.select(col("vec_id")), idxPath)
      TrainedState.forgetVectorsDelta(twins.select(col("vec_id")), vecPath)
      IvfPq.topKFromIndex(base.filter(col("vec_id") < 10),
          TrainedState.loadIvfPqIndexCached(s, idxPath),
          TrainedState.loadVectorsCached(s, vecPath), k = 1, cents, books,
          dim = 64, numSub = 8, nprobe = 2, rerank = 64)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // POOLED-artifact deletion (the funnel's coarse side): tokens AND
    // pooled both persist with planted twin docs baked into their
    // BASES, both are tombstoned, and the brute funnel serves at
    // shortlist = k = 3 — the saturation that makes the pooled
    // tombstone LOAD-BEARING: a leaked pooled twin row would top its
    // query's coarse ranking (cosine 1), the id-pruned rerank would
    // drop it against the tombstoned tokens, and the query would
    // surface only 2 rows with shifted membership — rows_match fails.
    // A leaked TOKEN twin fails harder (rank 1 at the maximal score).
    // The oracle is the twin-free e_maxsim_funnel replay at r <= 3.
    "e_maxsim_pooled_forget" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") % 5).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
      val twins = qv.select((col("query_id") + 100L).as("doc_id"),
        col("token_idx"), col("embedding"))
      val dv = emb.select((col("vec_id") % 50).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      val root = tmpPath(s, dir, "graft_pooledforget_")
      TrainedState.saveTokens(dv.unionByName(twins), s"$root/tokens")
      TrainedState.savePooled(
        graft.similarity.LateInteraction.poolSum(
          dv.unionByName(twins), "doc_id", 64),
        s"$root/pooled", dims = 64)
      val twinIds = twins.select(col("doc_id")).distinct()
      TrainedState.forgetTokensDelta(s, twinIds, s"$root/tokens")
      TrainedState.forgetPooledDelta(twinIds.select(col("doc_id").as("id")),
        s"$root/pooled")
      graft.similarity.LateInteraction.maxSimFunnelWith(qv,
          TrainedState.loadTokensCached(s, s"$root/tokens"),
          TrainedState.loadPooledCached(s, s"$root/pooled"), k = 3,
          dims = 64, shortlist = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // BM25 index FOLD-IN exactness: the index persists over the even
    // docs, the odd docs fold in as two delta batches
    // (foldInRetrieval: postings + docLens generations, ACCUMULATED
    // term dfs for the touched vocabulary, exact stats merge), and
    // the serve through the reconciled loads must equal the
    // d_retrieval_topk oracle over the FULL corpus bit for bit —
    // addition is exact, so any df double-count, stats drift, or
    // dropped generation shifts a score and fails the hash.
    "d_retrieval_persisted" -> ((s, dir) => {
      import s.implicits._
      val docs = load(s, dir, "documents")
      val root = tmpPath(s, dir, "graft_retrfold_")
      val (p0, t0, l0, s0) = graft.text.Retrieval.buildIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      TrainedState.saveRetrievalIndex(p0, t0, l0, s0, root)
      Seq(1L, 3L).foreach { m =>
        val (bp, _, bl, _) = graft.text.Retrieval.buildIndex(
          docs.filter(pmod(col("doc_id"), lit(4)) === m), "doc_id",
          "text")
        TrainedState.foldInRetrieval(s, bp, bl, root)
      }
      val (postings, terms, docLens, stats) =
        TrainedState.loadRetrievalIndexCached(s, root)
      val qs = Seq(
        (1L, Seq("stream", "filter", "merge")),
        (2L, Seq("table", "scan")),
        (3L, Seq("vector", "spark", "batch", "batch")))
        .toDF("query_id", "terms")
      graft.text.Retrieval.topK(qs, postings, terms, docLens, stats,
          k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // BM25 LAZY deletion semantics, oracle-exact: forget doc_id%3==1
    // (one docLens tombstone generation — O(deletions)) and serve
    // WITHOUT consolidating. Membership is immediately correct (the
    // deleted docs cannot appear — the docLens inner join drops
    // them); scores keep the PRE-delete df/n/avgdl — the documented
    // drift trade. The oracle replays exactly that: full-corpus
    // df/stats, survivor-only membership.
    "d_retrieval_lazy_forget" -> ((s, dir) => {
      import s.implicits._
      val docs = load(s, dir, "documents")
      val root = tmpPath(s, dir, "graft_retrlazy_")
      val (p0, t0, l0, s0) = graft.text.Retrieval.buildIndex(
        docs, "doc_id", "text")
      TrainedState.saveRetrievalIndex(p0, t0, l0, s0, root)
      TrainedState.forgetRetrievalDocs(
        docs.filter(pmod(col("doc_id"), lit(3)) === 1)
          .select(col("doc_id")), root)
      val (postings, terms, docLens, stats) =
        TrainedState.loadRetrievalIndexCached(s, root)
      val qs = Seq(
        (1L, Seq("stream", "filter", "merge")),
        (2L, Seq("table", "scan")),
        (3L, Seq("vector", "spark", "batch", "batch")))
        .toDF("query_id", "terms")
      graft.text.Retrieval.topK(qs, postings, terms, docLens, stats,
          k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // BM25 CONSOLIDATION: same deletion, then
    // consolidateRetrievalIndex drops the deleted docs' postings and
    // recomputes df/stats exactly — the serve must equal the oracle
    // over the survivors alone, as if the deleted docs were never
    // ingested (and the sub-artifacts fold physically: the gate
    // passes only if the rewritten index serves right).
    "d_retrieval_forget" -> ((s, dir) => {
      import s.implicits._
      val docs = load(s, dir, "documents")
      val root = tmpPath(s, dir, "graft_retrforget_")
      val (p0, t0, l0, s0) = graft.text.Retrieval.buildIndex(
        docs, "doc_id", "text")
      TrainedState.saveRetrievalIndex(p0, t0, l0, s0, root)
      TrainedState.forgetRetrievalDocs(
        docs.filter(pmod(col("doc_id"), lit(3)) === 1)
          .select(col("doc_id")), root)
      TrainedState.consolidateRetrievalIndex(s, root)
      val (postings, terms, docLens, stats) =
        TrainedState.loadRetrievalIndexCached(s, root)
      val qs = Seq(
        (1L, Seq("stream", "filter", "merge")),
        (2L, Seq("table", "scan")),
        (3L, Seq("vector", "spark", "batch", "batch")))
        .toDF("query_id", "terms")
      graft.text.Retrieval.topK(qs, postings, terms, docLens, stats,
          k = 10)
        .orderBy(col("query_id"), col("rank"))
    })
  )

  /** The d_retrieval_topk replay with independent membership dials:
    * `statsWhere` restricts the docs feeding df/n/avgdl (the scoring
    * magnitudes), `memberWhere` restricts which docs may appear (the
    * docLens join). Full replay = both "TRUE"; exact post-consolidation
    * deletion = both on the survivor predicate; LAZY deletion = full
    * stats, survivor membership. */
  private def retrievalTopkSql(statsWhere: String,
                               memberWhere: String): String =
    s"""WITH base AS (
       |  SELECT doc_id, ${QueryShared.tokensSql} AS toks
       |  FROM documents),
       |sbase AS (SELECT * FROM base WHERE $statsWhere),
       |docs AS (
       |  SELECT doc_id, len(toks) AS dl FROM sbase WHERE len(toks) > 0),
       |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
       |tf AS (
       |  SELECT doc_id, t, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS t FROM sbase)
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
       |  WHERE tf.doc_id IN (SELECT doc_id FROM base WHERE $memberWhere)
       |  GROUP BY 1, 2)
       |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
       |  bm25_e9
       |FROM (
       |  SELECT query_id, doc_id, bm25_e9,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY bm25_e9 DESC, doc_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // Forgotten twins must leave the cell index as-if-never-ingested:
    // brute top-1 over the base corpus alone, self excluded — the
    // e_ann_vectors_forget contract through the index's own embeddings.
    "e_ann_ivf_index_forget" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${Round13Queries.cosSql("q.embedding", "c.embedding")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10 AND c.vec_id < 60)
         |SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank = 1 ORDER BY query_id""".stripMargin,

    // Tombstoned twin docs leave BOTH funnel artifacts
    // as-if-never-ingested: the e_maxsim_funnel replay at the
    // saturating shortlist = k = 3 (the coarse cut that makes a
    // leaked pooled row change the output, not just waste a slot).
    "e_maxsim_pooled_forget" -> {
      def cos(a: String, b: String) = Round13Queries.cosSql(a, b)
      s"""WITH qv AS (
         |  SELECT vec_id % 5 AS query_id, vec_id AS tok, embedding
         |  FROM embeddings WHERE vec_id < 10),
         |dv AS (SELECT vec_id % 50 AS doc_id, embedding FROM embeddings),
         |qq AS (
         |  SELECT query_id, t.i AS dim,
         |    CAST(round(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
         |      * 1000000) AS BIGINT) AS v
         |  FROM qv, range(0, 64) t(i)),
         |qp AS (SELECT query_id, dim, CAST(SUM(v) AS BIGINT) AS s
         |       FROM qq GROUP BY 1, 2),
         |dd AS (
         |  SELECT doc_id, t.i AS dim,
         |    CAST(round(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
         |      * 1000000) AS BIGINT) AS v
         |  FROM dv, range(0, 64) t(i)),
         |dp AS (SELECT doc_id, dim, CAST(SUM(v) AS BIGINT) AS s
         |       FROM dd GROUP BY 1, 2),
         |dn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM dv GROUP BY 1),
         |dt AS (
         |  SELECT q.query_id, d.doc_id, CAST(SUM(q.s * d.s) AS BIGINT) AS dot
         |  FROM qp q JOIN dp d ON q.dim = d.dim GROUP BY 1, 2),
         |cand AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT dt.query_id, dt.doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY dt.query_id
         |        ORDER BY CAST(dt.dot AS DOUBLE) / CAST(dn.n AS DOUBLE) DESC,
         |          dt.doc_id) AS r
         |    FROM dt JOIN dn ON dn.doc_id = dt.doc_id) t
         |  WHERE r <= 3),
         |tokmax AS (
         |  SELECT q.query_id, d.doc_id, q.tok,
         |    MAX(${cos("q.embedding", "d.embedding")}) AS mx
         |  FROM qv q
         |  JOIN cand c ON c.query_id = q.query_id
         |  JOIN dv d ON d.doc_id = c.doc_id
         |  GROUP BY 1, 2, 3),
         |scores AS (
         |  SELECT query_id, doc_id,
         |    CAST(SUM(CAST(round(mx * 1000000) AS BIGINT)) AS BIGINT) AS score
         |  FROM tokmax GROUP BY 1, 2)
         |SELECT query_id, rank, doc_id, score FROM (
         |  SELECT query_id, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM scores) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },

    // Same contract through the PQ-coded pair: saturating probe +
    // full-rerank makes the serve exactly brute over the base.
    "e_ann_ivfpq_index_forget" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${Round13Queries.cosSql("q.embedding", "c.embedding")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10 AND c.vec_id < 60)
         |SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank = 1 ORDER BY query_id""".stripMargin,

    // Fold-in is EXACT addition: the delta-folded index replays the
    // full-corpus BM25 verbatim.
    "d_retrieval_persisted" -> retrievalTopkSql("TRUE", "TRUE"),

    // Lazy deletion: full-corpus df/n/avgdl (the documented stale
    // magnitudes), survivor-only membership — the deleted docs can
    // never appear, every surviving score is bit-preserved.
    "d_retrieval_lazy_forget" ->
      retrievalTopkSql("TRUE", "doc_id % 3 <> 1"),

    // Consolidation restores as-if-never-ingested: df/stats and
    // membership both replay over the survivors alone.
    "d_retrieval_forget" ->
      retrievalTopkSql("doc_id % 3 <> 1", "doc_id % 3 <> 1")
  )
}
