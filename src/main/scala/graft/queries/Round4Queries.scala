package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Round-4 surface widening: time-spine densification (gap fill + forward
  * fill), multi-column distinct counts (the Expand shape), correlated
  * EXISTS / scalar subqueries (decorrelation — shared SQL text with the
  * oracle), deterministic mode, and embedding compression/geometry ops
  * (int8 scalar quantization error, norm/component stats).
  */
object Round4Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Time-spine densification + forward fill: per-user daily totals where
    // silent days materialize as rows carrying the last observed value —
    // the gap-fill shape every time-series pipeline needs. The spine is
    // sequence(min,max) EXPLODED PER KEY (each key's spine is its own span
    // — no global calendar cross join), so spine size is O(active days),
    // and the fill is one running last(ignoreNulls) window over the same
    // partitioning the join just produced.
    "q_gap_fill" -> ((s, dir) => {
      val daily = load(s, dir, "events")
        .filter(col("user_id") < 50)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("v"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("v")).as("day_cents"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          last(col("day_cents"), ignoreNulls = true).over(w)
            .as("filled_cents"),
          col("day_cents").isNotNull.as("observed"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Multiple COUNT(DISTINCT) in one aggregation: Spark plans this as an
    // Expand (one replica of each row per distinct column) + two-phase agg
    // — 3 distinct columns = 3× shuffle volume. At 100TB prefer
    // approx_count_distinct unless exactness is contractual.
    "q_multi_distinct" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey")).as("nd_order"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Correlated EXISTS / NOT EXISTS: Catalyst decorrelates to left-semi +
    // left-anti joins (visible in the plan — no per-row subquery loops).
    // One SQL text shared verbatim with the oracle.
    "q_exists_subquery" -> ((s, dir) => {
      // own child session: canonical view names without cross-query races
      // (see q_recursive_cte in ExtendedQueries)
      val ss = s.newSession()
      load(ss, dir, "customer").createOrReplaceTempView("customer")
      load(ss, dir, "orders").createOrReplaceTempView("orders")
      ss.sql(existsSql)
    }),

    // Correlated scalar subqueries in SELECT: decorrelated to a left outer
    // join against a pre-aggregated subquery — including the COUNT bug
    // (no-match groups must surface 0, not NULL). Shared SQL text.
    "q_scalar_subquery" -> ((s, dir) => {
      val ss = s.newSession() // isolated view catalog (see q_exists_subquery)
      load(ss, dir, "customer").createOrReplaceTempView("customer")
      load(ss, dir, "orders").createOrReplaceTempView("orders")
      ss.sql(scalarSubquerySql)
    }),

    // Deterministic mode: most frequent user per event type, exact packed
    // (count, -user_id) tie-break so both engines pick the same row —
    // count-then-argmax, two partial-agg-friendly shuffles.
    "q_modal_value" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("event_type"))
        .agg(max_by(col("user_id"), col("cnt") * 10000000L - col("user_id"))
            .as("modal_user"),
          max(col("cnt")).as("modal_cnt"),
          count(lit(1)).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // Int8 scalar quantization report: per-vector (min,max) affine codes
    // 0..255, max reconstruction error — the embedding-compression
    // fidelity check (4× smaller than float32 before PQ). All math in
    // DOUBLE in array order on both engines, integer-ized per row.
    "e_quantize_int8" -> ((s, dir) => {
      // vmin/vmax must be ATTRIBUTES when the reconstruction-error lambda
      // reads them: higher-order lambdas re-evaluate embedded subtrees once
      // per ELEMENT, so an inlined array_min turns the transform into
      // O(d²) per row (projection collapse undoes a plain select — the
      // checkpoint is the barrier). ~2× on this query at sf0.1.
      val pre = load(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          array_min(col("embedding")).cast("double").as("vmin"),
          array_max(col("embedding")).cast("double").as("vmax"))
        .localCheckpoint(true)
      val vmin = col("vmin")
      val vmax = col("vmax")
      val scale = (vmax - vmin) / 255d
      val err = array_max(transform(col("embedding"), x => {
        val xd = x.cast("double")
        abs(xd - (vmin + round((xd - vmin) / scale) * scale))
      }))
      pre.select(col("vec_id"), col("label"),
          size(col("embedding")).cast("long").as("n_dims"),
          round(vmin * 1e6).cast("long").as("vmin_e6"),
          round(vmax * 1e6).cast("long").as("vmax_e6"),
          round(when(vmax > vmin, err).otherwise(lit(0.0)) * 1e9)
            .cast("long").as("max_err_e9"))
        .orderBy(col("vec_id"))
    }),

    // Embedding geometry stats per label: L2 norms (validates the corpus'
    // unit-norm invariant) + signed component sums (non-degenerate spread).
    // Per-row fold in array order in DOUBLE, integer-ized BEFORE the group
    // agg so engine merge order can't show through.
    "e_norm_stats" -> ((s, dir) => {
      // ‖v‖² is exactly dot(v, v): use the native codegen'd kernel (bit-
      // identical to the sequential fold — SimilaritySpec parity) instead
      // of an interpreted per-element aggregate
      val sq = graft.functions.DotProduct.dot_product(
        col("embedding"), col("embedding"))
      val cs = aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double"))
      load(s, dir, "embeddings")
        .select(col("label"),
          round(sqrt(sq) * 1e6).cast("long").as("norm_e6"),
          round(cs * 1e6).cast("long").as("csum_e6"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("norm_e6")).as("sum_norm_e6"),
          min(col("csum_e6")).as("min_csum_e6"),
          max(col("csum_e6")).as("max_csum_e6"))
        .orderBy(col("label"))
    })
  )

  /** One SQL text for both engines: high-value customers with no F-status
    * orders (EXISTS + NOT EXISTS, both correlated). */
  private val existsSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
      |AND NOT EXISTS (SELECT 1 FROM orders o2
      |  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** One SQL text for both engines: per-customer order count and max price
    * as correlated scalar subqueries (COUNT must be 0, not NULL, for
    * order-less customers). */
  private val scalarSubquerySql: String =
    """SELECT c_custkey,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT CAST(ROUND(MAX(o_totalprice) * 100) AS BIGINT) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS max_cents
      |FROM customer c ORDER BY c_custkey""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v
        |  FROM events WHERE user_id < 50),
        |daily AS (
        |  SELECT user_id, day, CAST(SUM(v) AS BIGINT) AS day_cents
        |  FROM e GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, CAST(unnest(generate_series(
        |    CAST(min_d AS TIMESTAMP), CAST(max_d AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT user_id, MIN(day) AS min_d, MAX(day) AS max_d
        |        FROM daily GROUP BY 1))
        |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
        |  CAST(last_value(d.day_cents IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS filled_cents,
        |  (d.day_cents IS NOT NULL) AS observed
        |FROM spine s LEFT JOIN daily d
        |  ON s.user_id = d.user_id AND s.day = d.day
        |ORDER BY s.user_id, s.day""".stripMargin,
    "q_multi_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp,
        |  COUNT(DISTINCT l_orderkey) AS nd_order,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_exists_subquery" -> existsSql,
    "q_scalar_subquery" -> scalarSubquerySql,
    "q_modal_value" ->
      """WITH c AS (SELECT event_type, user_id, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  arg_max(user_id, cnt * 10000000 - user_id) AS modal_user,
        |  MAX(cnt) AS modal_cnt, COUNT(*) AS n_users
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "e_quantize_int8" ->
      """SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS n_dims,
        |  CAST(ROUND(CAST(list_min(embedding) AS DOUBLE) * 1e6) AS BIGINT)
        |    AS vmin_e6,
        |  CAST(ROUND(CAST(list_max(embedding) AS DOUBLE) * 1e6) AS BIGINT)
        |    AS vmax_e6,
        |  CAST(ROUND(CASE WHEN list_max(embedding) > list_min(embedding) THEN
        |    list_max(list_transform(embedding, x ->
        |      abs(CAST(x AS DOUBLE) - (CAST(list_min(embedding) AS DOUBLE) +
        |        round((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
        |          / ((CAST(list_max(embedding) AS DOUBLE)
        |              - CAST(list_min(embedding) AS DOUBLE)) / 255))
        |        * ((CAST(list_max(embedding) AS DOUBLE)
        |            - CAST(list_min(embedding) AS DOUBLE)) / 255)))))
        |    ELSE 0.0 END * 1e9) AS BIGINT) AS max_err_e9
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "e_norm_stats" ->
      """WITH n AS (
        |  SELECT label,
        |    CAST(ROUND(sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1e6) AS BIGINT)
        |      AS norm_e6,
        |    CAST(ROUND(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE))) * 1e6) AS BIGINT) AS csum_e6
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n_vecs,
        |  CAST(SUM(norm_e6) AS BIGINT) AS sum_norm_e6,
        |  MIN(csum_e6) AS min_csum_e6,
        |  MAX(csum_e6) AS max_csum_e6
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
