package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.Hnsw

/** Round-13 additions: SERVING through a diversified-built hierarchy —
  * the end-to-end tie-in for the Algorithm-4 construction
  * ([[Round22Queries]] oracles the edge SELECTION; this oracles a
  * query ANSWERED over those edges). At saturating budgets the beam
  * walk visits the entry's whole connected component, so the served
  * top-k equals exact brute force and the oracle is the plain
  * all-pairs cosine rank — the `e_ann_brute` convention routed
  * through the full build → hierarchy → descent → walk stack.
  */
object Round23Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Serve through Algorithm-4 edges: the planted-duplicate corpus of
    // e_ann_hnsw_diverse (90 base vectors + the first 30 re-id'd +1000
    // as exact twins), indexed as a 3-layer HNSW whose every layer uses
    // the diversified (fill) edge builder at degree 4, then searched
    // via searchAuto (entry re-derived from the index itself) at
    // saturating beam/hops. The diversified prune is visible in the
    // STRUCTURE (a twin's pure out-list collapses to its pair; fill
    // tops it back up), and the oracle pins that serving over that
    // structure still returns the exact top-5 — including each query's
    // own twin at cosine 1, rank 1.
    "e_ann_hnsw_diverse_serve" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 90)
        .select(col("vec_id"), col("embedding"))
      val dups = load(s, dir, "embeddings").filter(col("vec_id") < 30)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
      val corpus = base.unionByName(dups).localCheckpoint(true)
      val layered = Hnsw.buildIndex(corpus, degree = 4, m = 4,
          maxLevel = 2,
          Some(Hnsw.diversifiedBuilder(candFactor = 3, fill = true)))
        .localCheckpoint(true)
      val probes = corpus.filter(col("vec_id") < 4)
      Hnsw.searchAuto(probes, layered, corpus, beamUpper = 4,
          hopsUpper = 4, beam = 200, hops = 40, k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Serve through the DELTA WRITE path: the e_ann_graph_incremental
    // lifecycle (insert 20 planted exact duplicates into a degree-6
    // graph by searching it) routed through the PRODUCTION persistence
    // shape — save the pre-batch index, persist ONLY the insert's
    // changed slice as a delta generation (appendGraphDelta), reload
    // (newest-generation-wins reconcile), and answer from the loaded
    // index. Write cost scaled with the batch, not the index, and the
    // served answer is oracle-identical to the in-memory lifecycle:
    // every original vector's nearest neighbor is its planted twin at
    // cosine 1 — reachable only through edges the DELTA carries (the
    // base files never knew the new nodes).
    "e_ann_graph_delta_serve" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val edges = graft.similarity.Similarity.bruteTopK(base, base, 6)
        .localCheckpoint(true)
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_gdelta_idx_" + Integer.toHexString(dir.hashCode))
        .getAbsolutePath
      graft.similarity.TrainedState.saveGraphIndex(edges, idxPath)
      val planted = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      // both batches are exactly 20 rows by construction — the
      // caller-known bounds skip the walks' guard count jobs (the
      // Round19 e_ann_graph_incremental convention)
      val (_, changed) = graft.similarity.GraphAnn.insertBySearchParts(
        edges, base, planted, entryId = 0L, beam = 64, hops = 64,
        degree = 6, batchBound = 20L)
      graft.similarity.TrainedState.appendGraphDelta(changed, idxPath)
      val served = graft.similarity.TrainedState
        .loadGraphIndex(s, idxPath)
      val full = base.unionByName(planted)
      graft.similarity.GraphAnn.searchGraph(
          base.filter(col("vec_id") < 20), served, full,
          entryId = 0L, beam = 84, hops = 64, k = 1, queryBound = 20L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    })
  )

  import Round13Queries.cosSql

  def oracleSql: Map[String, String] = Map(
    // Saturating serve == brute: all-pairs cosine over the planted
    // corpus, top-5 per probe by (cos desc, id), self excluded (the
    // twin at +1000 is NOT self and ranks first at cosine 1).
    "e_ann_hnsw_diverse_serve" ->
      s"""WITH emb AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 90
         |  UNION ALL
         |  SELECT vec_id + 1000 AS vec_id, embedding FROM embeddings
         |  WHERE vec_id < 30),
         |q AS (SELECT vec_id, embedding FROM emb WHERE vec_id < 4),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${cosSql("q.embedding", "c.embedding")} AS cos_sim
         |  FROM q JOIN emb c ON c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id,
         |  ROUND(cos_sim, 6) AS cos_sim
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // The planted-duplicate contract survives the save → delta-append
    // → reconcile → serve loop exactly: each original's top-1 is its
    // twin at cosine 1 (the e_ann_graph_incremental oracle, through
    // the persistence path).
    "e_ann_graph_delta_serve" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 20 ORDER BY query_id""".stripMargin
  )
}
