package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.Hnsw

/** Round-12 additions: the published HNSW neighbor-selection heuristic
  * (Malkov & Yashunin TPAMI 2018, Algorithm 4) — the last piece of the
  * reference algorithm not yet represented — as a fully-oracled edge
  * builder, in both its pure form and the `keepPrunedConnections`
  * (fill) form. The greedy keep-if-closer-to-node-than-to-any-kept
  * rule is pure rank/score arithmetic, so DuckDB replays it as a
  * recursive CTE over rank positions with list lambdas for the
  * kept-set max-sim; the fill pass is a second recursion topping the
  * kept list back up from the rejected ranks.
  */
object Round22Queries {

  /** The shared corpus PLANTS exact duplicates (ids < 30 re-id'd
    * +1000): for a node with a twin, every non-twin candidate e ties —
    * cos(e, node) == cos(e, twin) exactly (identical arrays) — and the
    * STRICT keep test rejects it, so the pure set collapses to the
    * twin alone and fill visibly tops back up; for a node WITHOUT a
    * twin whose candidates include a dup-pair, the second member is
    * rejected (closer to its own twin at cos 1 than to the node) —
    * the heuristic refusing to spend degree on near-identical
    * neighbors, which is its published purpose. On near-random
    * vectors alone the keep test almost never fires and fill would be
    * a no-op twin. */
  private def diverseQuery(fill: Boolean)
      : (SparkSession, String) => DataFrame = (s, dir) => {
    val base = load(s, dir, "embeddings").filter(col("vec_id") < 90)
      .select(col("vec_id"), col("embedding"))
    val dups = load(s, dir, "embeddings").filter(col("vec_id") < 30)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dups).localCheckpoint(true)
    Hnsw.diversifiedEdges(corpus, degree = 3, candFactor = 3, fill = fill)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

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
    "e_ann_hnsw_diverse" -> diverseQuery(fill = false),

    // The keepPrunedConnections (fill) form: after the greedy pass the
    // out-list tops back up to exactly degree from the REJECTED
    // candidates in rank order — fixed out-degree with the diversity
    // edges guaranteed in. The oracle extends the replay with a second
    // recursion over the same candidate ranks.
    "e_ann_hnsw_diverse_fill" -> diverseQuery(fill = true)
  )

  import Round13Queries.cosSql

  /** The Algorithm-4 replay, parameterized by the fill pass: all-pairs
    * cosine → per-node top-9 candidates → pairwise candidate sims as
    * LIST<STRUCT(other, sim)> → the greedy selection as a recursive
    * CTE over rank positions (kept-set max-sim via
    * list_filter + list_max — the engine fold's exact shape) → with
    * `fill`, a second recursion appending rejected candidates in rank
    * order until degree. */
  private def diverseSql(fill: Boolean): String = {
    val finalSrc = if (fill) "fil" else "sel"
    val fillCte = if (!fill) "" else
      s""",
         |fil AS (
         |  SELECT query_id, 0 AS pos, kept
         |  FROM sel WHERE pos = 9
         |  UNION ALL
         |  SELECT f.query_id, f.pos + 1,
         |    CASE WHEN len(f.kept) < 3
         |        AND NOT list_contains(f.kept, c.neighbor_id)
         |      THEN list_append(f.kept, c.neighbor_id)
         |      ELSE f.kept END AS kept
         |  FROM fil f JOIN csim c ON c.query_id = f.query_id
         |    AND c.r = f.pos + 1
         |  WHERE f.pos < 9)""".stripMargin
    s"""WITH RECURSIVE emb AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 90
       |  UNION ALL
       |  SELECT vec_id + 1000 AS vec_id, embedding FROM embeddings
       |  WHERE vec_id < 30),
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
       |  WHERE s.pos < 9)$fillCte,
       |final AS (
       |  SELECT query_id, UNNEST(kept) AS neighbor_id
       |  FROM $finalSrc WHERE pos = 9),
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
  }

  def oracleSql: Map[String, String] = Map(
    "e_ann_hnsw_diverse" -> diverseSql(fill = false),
    "e_ann_hnsw_diverse_fill" -> diverseSql(fill = true)
  )
}
