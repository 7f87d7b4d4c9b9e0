package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.plans.AsOfNative
import graft.queries.QueryShared.packedK

/** Round-9 additions — this session's new operator surfaces:
  *
  *   - the SLICED native as-of join (key + time-slice pre-partitioning
  *     with boundary handoff — the hot-key skew mitigation for the one
  *     shape AQE cannot rewrite on Window/custom execs), oracled against
  *     the same DuckDB ASOF form as the unsliced queries it must match
  *     bit-for-bit
  */
object Round9Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sliced as-of: IDENTICAL semantics (and oracle) to q_asof_native,
    // produced through the skew-mitigated path — per-day slices on the
    // packed microsecond key, so a hot user's purchases spread over one
    // task per active day instead of one task total.
    "q_asof_sliced" -> ((s, dir) => {
      val e = load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), packedK.as("k"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), packedK.as("vk"),
          round(col("value") * 100).cast("long").as("v_cents"))
      AsOfNative.asOfSliced(purchases, views, Seq("user_id"),
          leftTime = "k", rightTime = "vk",
          rightVals = Seq("vk", "v_cents"),
          sliceWidth = 86400L * 1000000L)
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_vk"), lit(-1L)).as("view_k"),
          coalesce(col("asof_v_cents"), lit(-1L)).as("view_cents"))
        .orderBy(col("event_id"))
    }),

    // Quantile sketch with an INEQUALITY oracle (the same pattern as the
    // CMS/HLL queries): approx_percentile is a GK sketch whose rank error
    // is a WORST-CASE guarantee (≤ N/accuracy, not probabilistic), so the
    // approx value must lie between the exact quantiles at p ± 2/accuracy
    // — booleans DuckDB states as literal TRUE next to the exact counts.
    // The sketch is the 100TB percentile path (one partial-aggregable
    // pass; exact percentile buffers whole groups in ObjectAgg).
    "d_quantile_sketch" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          expr("approx_percentile(cents, array(0.5D, 0.95D), 100)").as("ap"),
          expr("percentile(cents, array(0.48D, 0.52D, 0.93D, 0.97D))").as("ex"))
        .select(col("l_returnflag"), col("n_rows"),
          (element_at(col("ap"), 1).cast("double")
            .between(element_at(col("ex"), 1), element_at(col("ex"), 2)))
            .as("p50_ok"),
          (element_at(col("ap"), 2).cast("double")
            .between(element_at(col("ex"), 3), element_at(col("ex"), 4)))
            .as("p95_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // TRAINED IVF, end to end — the centroid twin of e_ann_pq_trained:
    // k-means cells (deterministic hash-spread init), persisted and
    // re-loaded through TrainedState (train-once / serve-many), then the
    // planted contract: an identical copy of the query vector lands in
    // the query's own argmin cell under ANY centroids, so probing that
    // cell always finds it and exact cosine re-scores it first at 1.
    "e_ann_ivf_trained" -> ((s, dir) => {
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val queries = load(s, dir, "embeddings").filter(col("vec_id") < 30)
      val trained = graft.similarity.KMeans.fit(
        load(s, dir, "embeddings").filter(col("vec_id") % 2 === 0),
        k = 16, iters = 1)
      val statePath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_ivf_cent_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      graft.similarity.TrainedState.saveCentroids(trained, statePath)
      val cents = graft.similarity.TrainedState.loadCentroids(s, statePath)
      graft.similarity.Similarity.ivfTopKWith(queries, corpus, k = 1,
        centroidsDf = cents, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // same oracle as q_asof_native — slicing is an execution strategy,
    // not a semantics change
    "q_asof_sliced" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k
        |  FROM events),
        |p AS (SELECT user_id, event_id, k FROM e
        |      WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, k AS vk,
        |        CAST(ROUND(value * 100) AS BIGINT) AS v_cents
        |      FROM e WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.event_id, arg_max(v.vk, v.vk) AS view_k,
        |    arg_max(v.v_cents, v.vk) AS view_cents
        |  FROM p JOIN v ON p.user_id = v.user_id AND v.vk <= p.k
        |  GROUP BY 1)
        |SELECT p.event_id, p.user_id,
        |  COALESCE(m.view_k, -1) AS view_k,
        |  COALESCE(m.view_cents, -1) AS view_cents
        |FROM p LEFT JOIN m ON p.event_id = m.event_id
        |ORDER BY p.event_id""".stripMargin,
    "d_quantile_sketch" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  TRUE AS p50_ok, TRUE AS p95_ok
        |FROM (SELECT l_returnflag,
        |        CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e_ann_ivf_trained" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 30 ORDER BY query_id""".stripMargin
  )
}
