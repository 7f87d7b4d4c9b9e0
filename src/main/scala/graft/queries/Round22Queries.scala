package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.Hnsw

/** Round-12 additions: the published HNSW neighbor-selection heuristic
  * (Malkov & Yashunin TPAMI 2018, Algorithm 4) — the last piece of the
  * reference algorithm not yet represented — as a fully-oracled edge
  * builder. The greedy keep-if-closer-to-node-than-to-any-kept rule is
  * pure rank/score arithmetic, so DuckDB replays it as a recursive CTE
  * over rank positions with list lambdas for the kept-set max-sim.
  */
object Round22Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DIVERSIFIED neighbor selection, full-output oracle: per node,
    // walk the 9 nearest candidates (degree 3 × candFactor 3) in rank
    // order and keep a candidate iff it is strictly closer to the node
    // than to every already-kept neighbor (cos(e,q) > cos(e,w) ∀ kept
    // w), capped at degree 3 — the pure (unfilled) Algorithm-4 set.
    // The ENTIRE selected edge table is the output; DuckDB replays the
    // candidate ranking, the pairwise candidate sims, and the greedy
    // fold itself (recursive CTE over rank positions; kept-set max-sim
    // via list_filter + list_max — the exact shape the engine's
    // aggregate() fold uses).
    "e_ann_hnsw_diverse" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      Hnsw.diversifiedEdges(corpus, degree = 3, candFactor = 3,
          fill = false)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    })
  )

  import Round13Queries.cosSql

  def oracleSql: Map[String, String] = Map(

    "e_ann_hnsw_diverse" ->
      s"""WITH RECURSIVE emb AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 120),
         |ap AS MATERIALIZED (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${cosSql("a.embedding", "b.embedding")} AS s
         |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
         |cand AS MATERIALIZED (
         |  SELECT src AS query_id, dst AS neighbor_id, s AS cos_sim, r
         |  FROM (SELECT src, dst, s,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst)
         |        AS r
         |    FROM ap) t
         |  WHERE r <= 9),
         |csim AS MATERIALIZED (
         |  SELECT c1.query_id, c1.r, c1.neighbor_id, c1.cos_sim,
         |    list(struct_pack(other := c2.neighbor_id, sim := p.s))
         |      AS simlist
         |  FROM cand c1
         |  JOIN cand c2 ON c2.query_id = c1.query_id
         |    AND c2.neighbor_id <> c1.neighbor_id
         |  JOIN ap p ON p.src = c1.neighbor_id AND p.dst = c2.neighbor_id
         |  GROUP BY 1, 2, 3, 4),
         |sel AS (
         |  SELECT query_id, 0 AS pos, CAST([] AS BIGINT[]) AS kept
         |  FROM (SELECT DISTINCT query_id FROM cand) q
         |  UNION ALL
         |  SELECT s.query_id, s.pos + 1,
         |    CASE WHEN len(s.kept) < 3 AND c.cos_sim > COALESCE(
         |        list_max(list_transform(
         |          list_filter(c.simlist,
         |            x -> list_contains(s.kept, x.other)),
         |          x -> x.sim)), -2.0)
         |      THEN list_append(s.kept, c.neighbor_id)
         |      ELSE s.kept END AS kept
         |  FROM sel s JOIN csim c ON c.query_id = s.query_id
         |    AND c.r = s.pos + 1
         |  WHERE s.pos < 9),
         |final AS (
         |  SELECT query_id, UNNEST(kept) AS neighbor_id
         |  FROM sel WHERE pos = 9),
         |scored AS (
         |  SELECT f.query_id, f.neighbor_id, p.s AS cos_sim
         |  FROM final f JOIN ap p ON p.src = f.query_id
         |    AND p.dst = f.neighbor_id)
         |SELECT query_id,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank,
         |  neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM scored
         |ORDER BY query_id, rank""".stripMargin
  )
}
