package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{GraphAnn, Similarity}

/** Round-10 continuation: graph-based ANN — the third ANN architecture
  * (navigable-graph search, the NSW/HNSW family's base layer) next to
  * the hashing (LSH) and clustering (IVF / PQ / BQ) families already
  * under the gate. The search is deterministic by construction (pinned
  * entry node, fixed beam/hop budget, the `e_ann_brute` f64 scoring and
  * tie-break conventions), so the WHOLE search — graph build, per-hop
  * beam cut, expansion, final top-k — replays in DuckDB as chained
  * CTEs, one pair per hop.
  */
object Round19Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Beam search over a degree-4 exact kNN graph: 6 probes, entry node
    // 0, beam 3, 2 hops, top-3. Every visited candidate's score and both
    // beam cuts replay in SQL — a recall statement with no slack.
    "e_ann_graph" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding"))
      val probes = corpus.filter(col("vec_id") % 20 === 0)
      val edges = Similarity.bruteTopK(corpus, corpus, 4)
      GraphAnn.searchGraph(probes, edges, corpus,
          entryId = 0L, beam = 3, hops = 2, k = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // TRAINED OPQ, end to end: learn the Procrustes rotation (1
    // alternation at bench strength), persist + reload it through
    // TrainedState (the train-once artifact split), retrain codebooks on
    // the final rotation, then serve. The planted contract is
    // rotation-proof: identical embeddings rotate identically under ANY
    // R, so the duplicate encodes to the query's own codes, survives the
    // ADC cut, and the exact re-score pins cosine 1 — same argument as
    // e_ann_pq_trained, now through a trained orthogonal transform.
    "e_ann_opq_trained" -> ((s, dir) => {
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val queries = load(s, dir, "embeddings").filter(col("vec_id") < 30)
      val trainHalf = load(s, dir, "embeddings")
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding"))
      val rotTrained = graft.similarity.Opq.trainRotation(trainHalf,
        dim = 64, numSub = 4, k = 16, kmeansIters = 1, opqIters = 1)
      val rotPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_opq_rot_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      graft.similarity.TrainedState.saveRotation(s, rotTrained, rotPath)
      val rot = graft.similarity.TrainedState.loadRotation(s, rotPath)
      val books = graft.similarity.ProductQuantizer.codebooksKMeans(
        graft.similarity.Opq.applyRotation(trainHalf, rot),
        dim = 64, numSub = 4, k = 16, iters = 1)
      graft.similarity.Opq.topKOpq(queries, corpus, dim = 64, numSub = 4,
          k = 1, rot = rot, booksDf = books, rerank = 32)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }))

  /** Shared all-pairs cosine CTE over the bounded corpus (self-pairs
    * included — the search scores a query against its own node when the
    * walk reaches it). The f32→f64 widened left-to-right fold of
    * `e_ann_brute`. */
  private val apSql =
    """WITH emb AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 120),
      |ap AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(list_zip(a.embedding, b.embedding),
      |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
      |      (x, y) -> x + y) /
      |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (x, y) -> x + y)) *
      |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (x, y) -> x + y))) AS s
      |  FROM emb a JOIN emb b ON true),
      |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "e_ann_opq_trained" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 30 ORDER BY query_id""".stripMargin,
    "e_ann_graph" -> (apSql +
      """edges AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
        |    FROM ap WHERE src <> dst) t
        |  WHERE r <= 4),
        |p AS (SELECT vec_id AS query_id FROM emb WHERE vec_id % 20 = 0),
        |v0 AS (
        |  SELECT p.query_id, 0 AS node, ap.s AS score
        |  FROM p JOIN ap ON ap.src = p.query_id AND ap.dst = 0),
        |f1 AS (
        |  SELECT query_id, node FROM (
        |    SELECT query_id, node,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, node) AS r
        |    FROM v0) t
        |  WHERE r <= 3),
        |n1 AS (
        |  SELECT DISTINCT f1.query_id, e.dst AS node
        |  FROM f1 JOIN edges e ON e.src = f1.node
        |  WHERE NOT EXISTS (SELECT 1 FROM v0
        |    WHERE v0.query_id = f1.query_id AND v0.node = e.dst)),
        |v1 AS (
        |  SELECT * FROM v0
        |  UNION ALL
        |  SELECT n1.query_id, n1.node, ap.s AS score
        |  FROM n1 JOIN ap ON ap.src = n1.query_id AND ap.dst = n1.node),
        |f2 AS (
        |  SELECT query_id, node FROM (
        |    SELECT query_id, node,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, node) AS r
        |    FROM v1) t
        |  WHERE r <= 3),
        |n2 AS (
        |  SELECT DISTINCT f2.query_id, e.dst AS node
        |  FROM f2 JOIN edges e ON e.src = f2.node
        |  WHERE NOT EXISTS (SELECT 1 FROM v1
        |    WHERE v1.query_id = f2.query_id AND v1.node = e.dst)),
        |v2 AS (
        |  SELECT * FROM v1
        |  UNION ALL
        |  SELECT n2.query_id, n2.node, ap.s AS score
        |  FROM n2 JOIN ap ON ap.src = n2.query_id AND ap.dst = n2.node)
        |SELECT query_id, rank, neighbor_id, ROUND(score, 6) AS cos_sim
        |FROM (
        |  SELECT query_id, node AS neighbor_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, node) AS rank
        |  FROM v2 WHERE node <> query_id) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin))
}
