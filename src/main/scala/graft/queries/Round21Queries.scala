package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.Similarity

/** Round-11 additions (continued): the two-level coarse quantizer for
  * IVF assignment — the fix for the flat argmin's n×C wall SCALE.md
  * documents past ~10⁵ cells. The whole hierarchy (centroid→super
  * argmin, per-vector super probing, member-bounded final argmin)
  * replays in DuckDB as CTE chains over the same kernel-exact cosine.
  */
object Round21Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Two-level assignment at REDUCED fan-out (fanout=2 of the S
    // supers) — the approximate production shape, fully replayed: the
    // centroid table (stride 50) is itself quantized into supers
    // (stride 200 → every 4th centroid), each vector probes its 2
    // nearest supers and argmins over just their member centroids.
    // Full-fan-out == flat parity is spec-pinned (TwoLevelAssignSpec);
    // this gate query pins the REDUCED path's every-bit (assignment of
    // every vector, not a slice — row preservation is part of the
    // contract).
    "e_ann_ivf_twolevel" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val supers = Similarity.superCentroids(cents, stride = 200)
      Similarity.ivfAssignTwoLevel(emb, cents, supers, fanout = 2)
        .select(col("vec_id"), col("centroid_id"))
        .orderBy(col("vec_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "e_ann_ivf_twolevel" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |supers AS (
         |  SELECT centroid_id AS super_id, centroid AS super_c
         |  FROM cents WHERE centroid_id % 200 = 0),
         |c2s AS (
         |  SELECT centroid_id, super_id, centroid FROM (
         |    SELECT c.centroid_id, s.super_id, c.centroid,
         |      ROW_NUMBER() OVER (PARTITION BY c.centroid_id
         |        ORDER BY -(${Round13Queries.cosSql("c.centroid", "s.super_c")}) ASC,
         |          s.super_id ASC) AS rn
         |    FROM cents c CROSS JOIN supers s) t
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id, embedding, super_id FROM (
         |    SELECT e.vec_id, e.embedding, s.super_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY -(${Round13Queries.cosSql("e.embedding", "s.super_c")}) ASC,
         |          s.super_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN supers s) t
         |  WHERE rn <= 2),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT p.vec_id, m.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |        ORDER BY -(${Round13Queries.cosSql("p.embedding", "m.centroid")}) ASC,
         |          m.centroid_id ASC) AS rn
         |    FROM probes p JOIN c2s m ON p.super_id = m.super_id) t
         |  WHERE rn = 1)
         |SELECT vec_id, centroid_id FROM assigned ORDER BY vec_id""".stripMargin
  )
}
