package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Round-6 surface widening — remaining SQL-surface families:
  *
  *   - distinct-count window annotation (Spark lacks DISTINCT window aggs;
  *     the collect_set-over-window emulation is the standard idiom)
  *   - bitwise + boolean aggregates (bit_and/or/xor, bool_and/or)
  *   - ratio-to-report window (share of the partition total, integer ppm)
  *   - map-typed columns end to end: build (map_from_entries) → transform
  *     (map_filter) → relationalize (explode) — maps stay INSIDE the plan,
  *     the output is plain rows both engines agree on
  *   - error-safe arithmetic (try_divide / try_cast: NULL, not exceptions,
  *     under ANSI semantics — the batch-pipeline-survives-bad-rows story)
  */
object Round6Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Distinct event-type count as a per-row window annotation. Spark has
    // no COUNT(DISTINCT) OVER — size(collect_set() over w) is the
    // emulation (state = the small per-key distinct set, NOT the row
    // buffer; fine whenever the distinct domain is bounded, as here with 5
    // event types). Oracle phrases it as aggregate-then-join.
    "q_window_distinct" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          size(collect_set(col("event_type")).over(w)).cast("long")
            .as("nd_types"))
        .orderBy(col("event_id"))
    }),

    // Bitwise AND/OR/XOR + boolean aggregates per group — flag-mask
    // consolidation (permissions, feature bitmaps) and all/any predicates,
    // all map-side-combinable two-phase aggs.
    "q_bit_agg" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(
          bit_and(col("cents")).as("mask_and"),
          bit_or(col("cents")).as("mask_or"),
          bit_xor(col("cents")).as("mask_xor"),
          bool_and(col("cents") >= 0).as("all_nonneg"),
          bool_or(col("event_type") === "error").as("any_error"),
          count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // Ratio-to-report: each event's share of its user's total, in integer
    // parts-per-million (cents*1e6 div total — exact on both engines, no
    // float division). One shuffle; the window total and the final rows
    // share the user partitioning.
    "q_ratio_report" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("total", sum(col("cents")).over(w))
        .select(col("event_id"), col("user_id"),
          when(col("total") =!= 0,
            expr("(cents * 1000000) div total")).otherwise(0L)
            .as("share_ppm"))
        .orderBy(col("event_id"))
    }),

    // Map-typed column lifecycle: per-user map(event_type → cents sum)
    // built with map_from_entries, thresholded with map_filter (map HOF),
    // relationalized back with explode. The map never reaches the output
    // schema — both engines compare plain rows.
    "q_map_ops" -> ((s, dir) => {
      // integerize to cents PER ROW before summing (the repo-wide
      // determinism convention): summing doubles first would let float
      // add-order flip a near-.5 rounding between engines
      val perType = load(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val m = perType
        .groupBy(col("user_id"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("event_type"), col("cents")))))
          .as("by_type"))
        .select(col("user_id"),
          map_filter(col("by_type"), (_, v) => v >= 100000L).as("big"))
      m.select(col("user_id"), explode(col("big")).as(Seq("event_type", "cents")))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Token-budget data mixing — the "data recipe" op of an LLM corpus:
    // equalize every source's token contribution down to the smallest
    // source's total. Per-source keep fraction f_s = T_min / T_s applied
    // by deterministic hash sampling, with the threshold comparison as an
    // exact integer cross-multiply (v·T_s < T_min·65536, v = 16-bit slice
    // of md5) — no float fraction ever computed, so both engines keep the
    // identical doc set. Per-source totals are a tiny aggregate broadcast
    // back; the sampling pass is map-only.
    // Overflow bound: v ≤ 65535, so v·T_s stays inside BIGINT while
    // T_s < 2^63/65536 ≈ 1.4e14 tokens PER SOURCE (~140T tokens — two
    // orders past today's largest corpora). Beyond that, pre-divide:
    // v < (T_min·65536) div T_s (loses ≤1 ulp of keep-rate resolution).
    "d_mix_sources" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.text.TextOps.tokenCountWs(col("text")).cast("long").as("tok"))
      val totals = docs.groupBy(col("source")).agg(sum(col("tok")).as("t_s"))
      val tmin = totals.agg(min(col("t_s")).as("t_min"))
      val v = conv(substring(md5(
        concat(lit("salt2"), col("doc_id").cast("string")).cast("binary")),
        1, 4), 16, 10).cast("long")
      docs.join(broadcast(totals), "source")
        .crossJoin(broadcast(tmin))
        .filter(v * col("t_s") < col("t_min") * 65536L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("tok_kept"),
          max(expr("(t_min * 1000000) div t_s")).as("f_ppm"))
        .orderBy(col("source"))
    }),

    // Nearest-direction as-of: each purchase picks the CLOSEST view by the
    // same user in either time direction (pandas merge_asof
    // direction='nearest'), equidistant ties toward the past. Packed keys
    // make distance and ties exact integers on both engines.
    "q_asof_nearest" -> ((s, dir) => {
      val e = load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), QueryShared.packedK.as("k"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), QueryShared.packedK.as("vk"))
      graft.operators.AsOfJoin.asOfNearest(purchases, views, Seq("user_id"),
          leftTime = "k", rightTime = "vk", rightVals = Seq("vk"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_vk"), lit(-1L)).as("nearest_view_k"))
        .orderBy(col("event_id"))
    }),

    // Event-type transition matrix (first-order Markov counts): per user,
    // consecutive-event pairs via lag over the packed order key, then the
    // (from, to) aggregation — the behavioral-model feature extractor.
    // One corpus-sized shuffle (user_id for the lag window); the final
    // groupBy exchanges only 25 partially-aggregated (from, to) cells.
    "q_transition_matrix" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("k"))
      load(s, dir, "events")
        .select(col("user_id"), QueryShared.packedK.as("k"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev_type"), col("event_type"))
    }),

    // Calendar rollup: quarter/month grid with per-cell totals — the
    // fiscal-reporting shape. date_trunc stays in the codegen'd
    // datetime-expression family; both engines agree on quarter/month
    // boundaries (pure Gregorian arithmetic, no locale).
    "q_calendar" -> ((s, dir) => {
      load(s, dir, "orders")
        .select(
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("y"), col("q"), col("m"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("y"), col("q"), col("m"))
    }),

    // Typed Dataset cogroup (KeyValueGroupedDataset.cogroup): per-user
    // merge of two typed streams with arbitrary Scala logic — the typed
    // escape hatch when per-key merge logic outgrows SQL (here it stays
    // SQL-expressible on purpose, so the oracle is a FULL OUTER join of
    // pre-aggregates). One shuffle per side on the group key; the lambda
    // sees both iterators without materializing either side globally.
    "q_cogroup" -> ((s, dir) => {
      import s.implicits._
      val e = load(s, dir, "events")
        .select(col("user_id"), QueryShared.packedK.as("k"), col("event_type"))
        .as[(Long, Long, String)]
      val purchases = e.filter(_._3 == "purchase")
      val views = e.filter(_._3 == "view")
      purchases.groupByKey(_._1).cogroup(views.groupByKey(_._1)) {
        (uid, ps, vs) =>
          var nP = 0L; var fP = Long.MaxValue
          ps.foreach { p => nP += 1; if (p._2 < fP) fP = p._2 }
          var nV = 0L; var fV = Long.MaxValue
          vs.foreach { v => nV += 1; if (v._2 < fV) fV = v._2 }
          Iterator.single((uid, nP, if (nP > 0) fP else -1L,
            nV, if (nV > 0) fV else -1L))
      }.toDF("user_id", "n_purchases", "first_purchase_k",
          "n_views", "first_view_k")
        .orderBy(col("user_id"))
    }),

    // VARIANT semi-structured path (Spark 4): parse_json once into a
    // variant column, extract typed fields with variant_get — the
    // schema-on-read shape for heterogeneous JSON at scale (binary-encoded
    // variant beats per-query string re-parsing, and field extraction
    // prunes like any column). Output is plain typed rows.
    "q_variant" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("event_id"),
          parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("k_bucket"))
    }),

    // Ordered string aggregation (Spark 4 listagg WITHIN GROUP): the
    // deterministic concat-per-group shape (report rows, label lists).
    "q_listagg" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .groupBy(col("o_custkey"))
        .agg(expr(
          "listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderkey)")
          .as("statuses"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey"))
    }),

    // Keyset-free pagination: global ORDER BY + OFFSET/LIMIT. Spark plans
    // the offset into the take — fine for report pages; the scaladoc
    // caveat is that deep offsets still sort/skip the prefix, so keyset
    // (WHERE key > last) pagination wins at depth.
    "q_offset_limit" -> ((s, dir) => {
      load(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .orderBy(col("cents").desc, col("o_orderkey"))
        .offset(100)
        .limit(25)
    }),

    // Error-safe arithmetic: try_divide and try_cast return NULL where
    // ANSI mode would throw (division by zero, malformed casts) — the
    // survive-bad-rows contract a 100TB batch pipeline needs (one poison
    // row must not kill a 6-hour job). NULLs coalesced to sentinels so
    // both engines hash identical typed values.
    "q_try_arith" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("s",
          when(col("event_id") % 10 === 0, concat(lit("x"), col("event_id")))
            .otherwise(col("event_id").cast("string")))
        .select(col("event_id"),
          coalesce(expr("try_divide(cents, user_id % 7)"), lit(-1.0))
            .as("div7"),
          coalesce(expr("try_cast(s AS BIGINT)"), lit(-1L)).as("parsed"))
        .select(col("event_id"),
          round(col("div7") * 1e6).cast("long").as("div7_e6"),
          col("parsed"))
        .orderBy(col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_window_distinct" ->
      """SELECT e.event_id, e.user_id, u.nd_types
        |FROM events e JOIN (
        |  SELECT user_id, COUNT(DISTINCT event_type) AS nd_types
        |  FROM events GROUP BY 1) u USING(user_id)
        |ORDER BY e.event_id""".stripMargin,
    "q_bit_agg" ->
      """SELECT user_id % 10 AS bucket,
        |  CAST(bit_and(cents) AS BIGINT) AS mask_and,
        |  CAST(bit_or(cents) AS BIGINT) AS mask_or,
        |  CAST(bit_xor(cents) AS BIGINT) AS mask_xor,
        |  bool_and(cents >= 0) AS all_nonneg,
        |  bool_or(event_type = 'error') AS any_error,
        |  COUNT(*) AS n
        |FROM (SELECT user_id, event_type,
        |        CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ratio_report" ->
      """WITH c AS (
        |  SELECT event_id, user_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |t AS (
        |  SELECT event_id, user_id, cents,
        |    SUM(cents) OVER (PARTITION BY user_id) AS total
        |  FROM c)
        |SELECT event_id, user_id,
        |  CASE WHEN total <> 0
        |       THEN CAST((cents * 1000000) // total AS BIGINT)
        |       ELSE 0 END AS share_ppm
        |FROM t ORDER BY event_id""".stripMargin,
    "q_map_ops" ->
      """SELECT user_id, event_type,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2
        |HAVING SUM(CAST(ROUND(value * 100) AS BIGINT)) >= 100000
        |ORDER BY 1, 2""".stripMargin,
    "d_mix_sources" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
        |  FROM documents),
        |t AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS t_s
        |      FROM d GROUP BY 1),
        |m AS (SELECT MIN(t_s) AS t_min FROM t),
        |k AS (
        |  SELECT d.source, d.tok, t.t_s, m.t_min,
        |    CAST(('0x' || substr(md5('salt2' || CAST(d.doc_id AS VARCHAR)),
        |      1, 4)) AS BIGINT) AS v
        |  FROM d JOIN t USING(source) CROSS JOIN m)
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(tok) AS BIGINT) AS tok_kept,
        |  CAST(MAX((t_min * 1000000) // t_s) AS BIGINT) AS f_ppm
        |FROM k WHERE v * t_s < t_min * 65536
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_nearest" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k
        |  FROM events),
        |p AS (SELECT user_id, event_id, k FROM e
        |      WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, k AS vk FROM e WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.event_id,
        |    arg_min(v.vk, abs(v.vk - p.k) * 2 +
        |      CASE WHEN v.vk > p.k THEN 1 ELSE 0 END) AS nearest_view_k
        |  FROM p JOIN v ON p.user_id = v.user_id
        |  GROUP BY 1)
        |SELECT p.event_id, p.user_id,
        |  COALESCE(m.nearest_view_k, -1) AS nearest_view_k
        |FROM p LEFT JOIN m USING(event_id)
        |ORDER BY p.event_id""".stripMargin,
    "q_transition_matrix" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k,
        |    event_type
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY k)
        |      AS prev_type
        |  FROM e)
        |SELECT prev_type, event_type, COUNT(*) AS n
        |FROM p WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_calendar" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_cogroup" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k,
        |    event_type
        |  FROM events),
        |p AS (SELECT user_id, COUNT(*) AS n_purchases, MIN(k) AS first_k
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
        |v AS (SELECT user_id, COUNT(*) AS n_views, MIN(k) AS first_k
        |      FROM e WHERE event_type = 'view' GROUP BY 1)
        |SELECT COALESCE(p.user_id, v.user_id) AS user_id,
        |  COALESCE(p.n_purchases, 0) AS n_purchases,
        |  COALESCE(p.first_k, -1) AS first_purchase_k,
        |  COALESCE(v.n_views, 0) AS n_views,
        |  COALESCE(v.first_k, -1) AS first_view_k
        |FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
        |ORDER BY user_id""".stripMargin,
    "q_variant" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_listagg" ->
      """SELECT o_custkey,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses,
        |  COUNT(*) AS n_orders
        |FROM orders WHERE o_custkey < 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_offset_limit" ->
      """SELECT o_orderkey,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders ORDER BY cents DESC, o_orderkey
        |LIMIT 25 OFFSET 100""".stripMargin,
    "q_try_arith" ->
      """SELECT event_id,
        |  CAST(ROUND(COALESCE(
        |    CAST(ROUND(value * 100) AS BIGINT) / NULLIF(user_id % 7, 0),
        |    -1.0) * 1e6) AS BIGINT) AS div7_e6,
        |  COALESCE(TRY_CAST(
        |    CASE WHEN event_id % 10 = 0 THEN 'x' || event_id
        |         ELSE CAST(event_id AS VARCHAR) END AS BIGINT), -1)
        |    AS parsed
        |FROM events ORDER BY event_id""".stripMargin
  )
}
