package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.Outliers
import graft.similarity.{LateInteraction, RandomProjection, Similarity}

/** Round-17 additions — the reduced-representation retrieval family plus
  * robust corpus-quality gating:
  *
  *   - Matryoshka (MRL) retrieval: prefix-truncated embeddings as the
  *     coarse stage of a two-stage funnel ([[Similarity.mrlTopK]]), with
  *     a measured recall query pinning what the truncation costs;
  *   - signed random projection ([[RandomProjection]]) — deterministic
  *     md5-parity ±1 JL reduction with exact BIGINT outputs, and top-k
  *     serving under the projected integer dot;
  *   - kNN-graph hubness ([[Similarity.knnInDegree]]) — the in-degree
  *     diagnostic over the whole-corpus graph artifact;
  *   - median/MAD outlier flags ([[Outliers.madFlag]]) — positional-
  *     median robust gating, all-integer.
  *
  * Exactness: cosine chains reuse the bit-identical-double argument of
  * `e_ann_brute` (same f32→f64 widen, same left-to-right fold, ties on
  * neighbor_id); everything else is integer algebra (md5-parity signs,
  * round(x·1e6) quantization, positional medians).
  */
object Round17Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Two-stage MRL funnel: prefix-16 shortlist of 10, full-64 rerank to
    // top-3. The oracle replays both stages, so a shortlist that loses a
    // true neighbor diverges loudly.
    "e_mrl_topk" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      Similarity.mrlTopK(emb.filter(col("vec_id") < 5), emb,
          k = 3, dims = 16, shortlist = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // What the truncation costs: per-query overlap between prefix-16
    // top-10 and full-64 top-10 — the recall@k curve point an MRL
    // deployment monitors. Left join keeps zero-overlap queries visible.
    "e_mrl_recall" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      val full = Similarity.bruteTopK(qs, emb, 10)
        .select(col("query_id"), col("neighbor_id"))
      val pre = Similarity.bruteTopK(Similarity.truncateDims(qs, 16),
          Similarity.truncateDims(emb, 16), 10)
        .select(col("query_id"), col("neighbor_id"))
      val ov = full.join(pre, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      qs.select(col("vec_id").as("query_id"))
        .join(ov, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .orderBy(col("query_id"))
    }),

    // Hubness of the whole-corpus kNN graph: in-degree per node, zeros
    // included — the diagnostic that catches degenerate embedding
    // spaces before they poison retrieval and semantic dedup.
    "e_knn_degree" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      Similarity.knnInDegree(
          Similarity.knnGraph(Similarity.ivfAssign(emb, cents), cents,
            k = 3, nprobe = 2))
        .orderBy(col("vec_id"))
    }),

    // Signed random projection 64 -> 8: exact BIGINT components from
    // md5-parity signs over round(x*1e6)-quantized inputs.
    "e_rand_proj" -> ((s, dir) => {
      RandomProjection.projectSigned(load(s, dir, "embeddings"),
          dimIn = 64, dimOut = 8)
        .orderBy(col("vec_id"), col("dim"))
    }),

    // Top-k under the projected integer dot — the JL-reduced coarse
    // serving stage, integer scores so ranking is exactly replayable.
    "e_proj_topk" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      RandomProjection.projectedTopK(emb.filter(col("vec_id") < 5), emb,
          k = 3, dimIn = 64, dimOut = 8)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ColBERT-style MaxSim late interaction: multi-vector docs (10 token
    // vectors each, derived as vec_id % 50) scored by sum-of-per-query-
    // token maxima — integer micro-cos sums, exact ranking. 5 queries x
    // 2 tokens each probe all 50 docs.
    "e_maxsim" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") % 5).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
      val dv = emb.select((col("vec_id") % 50).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      LateInteraction.maxSimTopK(qv, dv, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Quantized token-bag pooling as gate data: per (doc, dim) exact
    // BIGINT sums over round(x*1e6) components — the pooled-vector
    // builder the funnel's coarse stage ranks on, oracled directly.
    "e_pool" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val dv = emb.select((col("vec_id") % 50).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      LateInteraction.poolSum(dv, "doc_id", dims = 64)
        .select(col("id"), col("n_tokens"),
          posexplode(col("pool")).as(Seq("dim", "pool_sum")))
        .select(col("id"), col("n_tokens"), col("dim"), col("pool_sum"))
        .orderBy(col("id"), col("dim"))
    }),

    // The FULL late-interaction serving funnel: quantized sum-pooled
    // token bags -> integer-dot coarse shortlist (10 per query) ->
    // MaxSim rerank to top-3. Every stage integer-exact, so the whole
    // funnel — pooling included — replays in SQL.
    "e_maxsim_funnel" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") % 5).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
      val dv = emb.select((col("vec_id") % 50).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      LateInteraction.maxSimFunnel(qv, dv, k = 3, dims = 64, shortlist = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Robust per-language length outliers: |n_chars - med| > 3*MAD,
    // positional lower medians, all-integer.
    "d_outlier_mad" -> ((s, dir) => {
      Outliers.madFlag(load(s, dir, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars")),
          groupCol = "lang", valueCol = "n_chars", idCol = "doc_id", k = 3)
        .orderBy(col("lang"), col("doc_id"))
    })
  )

  private def cos(a: String, b: String) = Round13Queries.cosSql(a, b)

  val oracleSql: Map[String, String] = Map(

    "e_mrl_topk" ->
      s"""WITH coarse AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.embedding[1:16]", "c.embedding[1:16]")} DESC,
         |          c.vec_id) AS rn
         |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 5) t
         |  WHERE rn <= 10),
         |rer AS (
         |  SELECT co.query_id, co.neighbor_id,
         |    ${cos("q.embedding", "c.embedding")} AS cos_sim
         |  FROM coarse co
         |  JOIN embeddings q ON q.vec_id = co.query_id
         |  JOIN embeddings c ON c.vec_id = co.neighbor_id)
         |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM rer) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "e_mrl_recall" ->
      s"""WITH fullk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.embedding", "c.embedding")} DESC,
         |          c.vec_id) AS rn
         |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 20) t
         |  WHERE rn <= 10),
         |prek AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.embedding[1:16]", "c.embedding[1:16]")} DESC,
         |          c.vec_id) AS rn
         |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 20) t
         |  WHERE rn <= 10),
         |ov AS (
         |  SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_overlap
         |  FROM fullk f JOIN prek p
         |    ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
         |  GROUP BY 1)
         |SELECT q.vec_id AS query_id,
         |  CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap
         |FROM embeddings q LEFT JOIN ov o ON o.query_id = q.vec_id
         |WHERE q.vec_id < 20 ORDER BY query_id""".stripMargin,

    "e_knn_degree" ->
      s"""WITH ${Round15Queries.knnGraphCtes(k = 3, nprobe = 2)},
         |nodes AS (SELECT DISTINCT vec_id FROM (
         |  SELECT query_id AS vec_id FROM ranked
         |  UNION ALL SELECT neighbor_id FROM ranked)),
         |deg AS (
         |  SELECT neighbor_id AS vec_id, CAST(count(*) AS BIGINT) AS in_degree
         |  FROM ranked GROUP BY 1)
         |SELECT n.vec_id, CAST(COALESCE(d.in_degree, 0) AS BIGINT) AS in_degree
         |FROM nodes n LEFT JOIN deg d ON d.vec_id = n.vec_id
         |ORDER BY n.vec_id""".stripMargin,

    "e_rand_proj" ->
      """WITH sgn AS (
        |  SELECT i, j, CASE WHEN (strpos('0123456789abcdef',
        |      substr(md5('rp:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
        |        1, 1)) - 1) % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM range(0, 64) t1(i), range(0, 8) t2(j)),
        |qv AS (
        |  SELECT vec_id, t.i,
        |    CAST(round(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
        |      * 1000000) AS BIGINT) AS v
        |  FROM embeddings, range(0, 64) t(i))
        |SELECT q.vec_id, CAST(s.j AS INTEGER) AS dim,
        |  CAST(SUM(q.v * s.s) AS BIGINT) AS proj
        |FROM qv q JOIN sgn s ON s.i = q.i
        |GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin,

    "e_proj_topk" ->
      """WITH sgn AS (
        |  SELECT i, j, CASE WHEN (strpos('0123456789abcdef',
        |      substr(md5('rp:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
        |        1, 1)) - 1) % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM range(0, 64) t1(i), range(0, 8) t2(j)),
        |qv AS (
        |  SELECT vec_id, t.i,
        |    CAST(round(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
        |      * 1000000) AS BIGINT) AS v
        |  FROM embeddings, range(0, 64) t(i)),
        |proj AS (
        |  SELECT q.vec_id, s.j, CAST(SUM(q.v * s.s) AS BIGINT) AS p
        |  FROM qv q JOIN sgn s ON s.i = q.i GROUP BY 1, 2),
        |score AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(SUM(a.p * b.p) AS BIGINT) AS score
        |  FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 5
        |  GROUP BY 1, 2)
        |SELECT query_id, rank, neighbor_id, score FROM (
        |  SELECT query_id, neighbor_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rank
        |  FROM score) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "e_maxsim" ->
      s"""WITH qv AS (
         |  SELECT vec_id % 5 AS query_id, vec_id AS tok, embedding
         |  FROM embeddings WHERE vec_id < 10),
         |dv AS (SELECT vec_id % 50 AS doc_id, embedding FROM embeddings),
         |tokmax AS (
         |  SELECT q.query_id, d.doc_id, q.tok,
         |    MAX(${cos("q.embedding", "d.embedding")}) AS mx
         |  FROM qv q CROSS JOIN dv d
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
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "e_pool" ->
      """WITH dv AS (
        |  SELECT vec_id % 50 AS doc_id, embedding FROM embeddings),
        |dd AS (
        |  SELECT doc_id, t.i AS dim,
        |    CAST(round(CAST(embedding[CAST(t.i + 1 AS INTEGER)] AS DOUBLE)
        |      * 1000000) AS BIGINT) AS v
        |  FROM dv, range(0, 64) t(i)),
        |dn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |       FROM dv GROUP BY 1)
        |SELECT dd.doc_id AS id, dn.n_tokens, CAST(dd.dim AS INTEGER) AS dim,
        |  CAST(SUM(dd.v) AS BIGINT) AS pool_sum
        |FROM dd JOIN dn ON dn.doc_id = dd.doc_id
        |GROUP BY 1, 2, 3 ORDER BY id, dim""".stripMargin,

    "e_maxsim_funnel" ->
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
         |  WHERE r <= 10),
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
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "d_outlier_mad" ->
      """WITH d AS (
        |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |  FROM documents),
        |r1 AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM d),
        |med AS (
        |  SELECT lang, CAST(SUM(CASE WHEN rn = (n + 1) // 2
        |    THEN n_chars ELSE 0 END) AS BIGINT) AS med
        |  FROM r1 GROUP BY 1),
        |wd AS (
        |  SELECT d.lang, d.doc_id, d.n_chars, m.med,
        |    ABS(d.n_chars - m.med) AS dev
        |  FROM d JOIN med m ON m.lang = d.lang),
        |r2 AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY dev, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM wd),
        |mad AS (
        |  SELECT lang, CAST(SUM(CASE WHEN rn = (n + 1) // 2
        |    THEN dev ELSE 0 END) AS BIGINT) AS mad
        |  FROM r2 GROUP BY 1)
        |SELECT w.lang, w.doc_id, w.n_chars, w.med, m.mad,
        |  CAST(w.dev AS BIGINT) AS dev,
        |  CAST(CASE WHEN w.dev > m.mad * 3 THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_outlier
        |FROM wd w JOIN mad m ON m.lang = w.lang
        |ORDER BY w.lang, w.doc_id""".stripMargin
  )
}
