package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** SURVEY.md §2 operator inventory over the driver's synthetic tables —
  * every GB-engine operator class re-expressed as a standalone query with a
  * DuckDB oracle. Naming: q_<operator-class>. See CoreQueries for the
  * determinism conventions (cents trick, string dates, unique-key ORDER BY).
  */
object OperatorQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J5: dictionary decode join with miss → sentinel (reference
    // gb_type_details.rs:24-30 "Missing app info"). Dict deliberately
    // filtered so some keys miss.
    "q_dict_decode" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val dict = load(s, dir, "nation").filter(col("n_nationkey") < 20)
        .select(col("n_nationkey").as("k"), col("n_name"))
      c.join(broadcast(dict), c("c_nationkey") === dict("k"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_name"), lit("Missing app info")).as("nation_name"))
        .orderBy(col("c_custkey"))
    }),

    // P3: regex FK extraction (entry.rs:46-61) over synthesized hrefs.
    "q_regex_extract" -> ((s, dir) => {
      load(s, dir, "events")
        .withColumn("href",
          concat(lit("https://x/espi/1_1/resource/MeterReading/"),
            col("user_id"), lit("/IntervalBlock/"), col("event_id")))
        .select(col("event_id"),
          regexp_extract(col("href"), "(.*MeterReading/[^/]*)/", 1).as("mr_href"))
        .orderBy(col("event_id"))
    }),

    // P1: text-or-default projection (parse_helpers.rs:27-40) — empty
    // extraction falls back to a default.
    "q_text_or_default" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("event_id"),
          coalesce(nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit("")),
            lit("missing")).as("k_or_default"))
        .orderBy(col("event_id"))
    }),

    // P4/A1: boolean ANY aggregate (has_cost, timeseries.rs:183-190).
    "q_bool_any" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          bool_or(col("event_type") === "purchase" && col("value") > 150)
            .as("any_big_purchase"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // F6: DST-rule bit decode (local_time_parameters.rs:108-143) applied to
    // a synthesized u32 per row.
    "q_bit_decode" -> ((s, dir) => {
      load(s, dir, "events")
        .withColumn("rule", (col("event_id") * 2654435761L) % 4294967296L)
        .select(col("event_id"),
          (col("rule") % 4096).as("seconds"),
          ((col("rule") / 4096).cast("long") % 32).as("hours"),
          ((col("rule") / 131072).cast("long") % 8).as("day_of_week"),
          ((col("rule") / 1048576).cast("long") % 32).as("day_of_month"),
          ((col("rule") / 33554432).cast("long") % 8).as("operator"),
          (col("rule") / 268435456).cast("long").as("month"))
        .orderBy(col("event_id"))
    }),

    // F5: hex → integer (local_time_parameters.rs:152-159).
    "q_hex_conv" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("event_id"),
          conv(hex(col("event_id") + 123456), 16, 10).cast("long").as("roundtrip"))
        .orderBy(col("event_id"))
    }),

    // F8: conditional civil-time offset — DST window as a data-dependent
    // CASE over epoch seconds (lib.rs:157-162 shape with constant bounds).
    "q_local_time_shift" -> ((s, dir) => {
      val dstStart = 1710054000L // 2024-03-10 07:00 UTC
      val dstEnd = 1730617200L   // 2024-11-03 07:00 UTC
      load(s, dir, "events")
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .select(col("event_id"),
          (col("epoch_s") + lit(-18000L) +
            when(col("epoch_s") > dstStart && col("epoch_s") < dstEnd, 3600L)
              .otherwise(0L)).as("local_s"))
        .orderBy(col("event_id"))
    }),

    // O2: union-all of two scans (TimeSeries::extend, timeseries.rs:149-171).
    "q_union_all" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val b = li.filter(col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      a.unionByName(b)
        .groupBy((col("l_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("bucket"))
    }),

    // A2: per-group min/max extent (date_aggregated_chart.ts:6-20).
    "q_minmax_extent" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("min_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("max_ts"),
          round(max(col("value")) * 100).cast("long").as("max_value_cents"))
        .orderBy(col("event_type"))
    }),

    // F10: measurement-name sanitize (timeseries.rs:312-317).
    "q_sanitize" -> ((s, dir) => {
      load(s, dir, "part")
        .select(col("p_partkey"),
          regexp_replace(regexp_replace(col("p_name"), " ", "_"),
            "[^A-Za-z0-9_]", "").as("clean_name"))
        .orderBy(col("p_partkey"))
    }),

    // P7-analog: anti join — rows failing a referential check (validation
    // as data, SURVEY §7.4): customers with no orders.
    "q_anti_join" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders").filter(col("o_totalprice") > 250000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J1-analog: semi join — existence probe against a built hash side.
    "q_semi_join" -> ((s, dir) => {
      val su = load(s, dir, "supplier")
      val li = load(s, dir, "lineitem").filter(col("l_quantity") > 45)
      su.join(li, su("s_suppkey") === li("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // Windowed time aggregation (streaming analog §2.8): hourly buckets.
    "q_time_window" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")) * 100).cast("long").as("sum_cents"))
        .orderBy(col("hour"))
    }),

    // S6-analog: explode/unnest of a split string.
    "q_explode_split" -> ((s, dir) => {
      load(s, dir, "part")
        .select(col("p_partkey"),
          explode(split(col("p_type"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("word"))
    }),

    // F2: constant-factor normalization (interval_reading.rs:36-38) — pure
    // per-row double arithmetic, bit-identical across engines.
    "q_cost_norm" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / 100000.0).as("cost_dollars"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(500)
    }),

    // Pivot (wide conditional aggregation): per-user event-type counts.
    "q_pivot" -> ((s, dir) => {
      val types = Seq("click", "purchase", "error", "signup", "view")
      val aggs = types.map(t =>
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("user_id"))
    }),

    // Lag/delta + running sum: interval-to-interval deltas per key — the
    // accumulation-behaviour semantics of meter readings (bulkQuantity →
    // deltaData conversion) expressed as window functions.
    "q_lag_delta" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      load(s, dir, "events")
        .withColumn("prev", lag(col("value"), 1).over(w))
        .withColumn("delta_e2",
          round((col("value") - coalesce(col("prev"), lit(0.0))) * 100).cast("long"))
        .withColumn("running_e2",
          round(sum(col("value")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            * 100).cast("long"))
        .select(col("event_id"), col("user_id"), col("delta_e2"), col("running_e2"))
        .orderBy(col("event_id"))
    }),

    // Range join: events falling inside per-day "maintenance windows"
    // (02:00-05:00 UTC) — bucketed-interval composition (operators.RangeJoin,
    // one hash shuffle) vs a plain inequality join in the oracle.
    "q_range_join" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .withColumn("epoch_s", unix_timestamp(col("ts")))
      val windows = ev
        .select(unix_timestamp(date_trunc("day", col("ts"))).as("day_s"))
        .distinct()
        .select((col("day_s") + 7200).as("w_start"), (col("day_s") + 18000).as("w_end"))
      graft.operators.RangeJoin.pointInInterval(
        ev.select(col("event_id"), col("epoch_s")), windows,
        "epoch_s", "w_start", "w_end", bucketWidth = 3600)
        .groupBy(col("w_start"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("w_start"))
    }),

    // 5-way star join: revenue per region.
    "q_star_join" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
      val o = load(s, dir, "orders")
      val c = load(s, dir, "customer")
      val n = load(s, dir, "nation")
      val r = load(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000))
            .cast("long").as("revenue_e4"))
        .orderBy(col("r_name"))
    }),

    // As-of join (point-in-time): for each purchase, the latest prior error
    // value of the same user — composed Spark-first (union + running last
    // over one shuffle, operators.AsOfJoin); oracle is DuckDB's native ASOF.
    "q_asof_join" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsOfJoin.asOf(purchases, errors,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightVals = Seq("value"))
        .select(col("event_id"), col("user_id"), col("asof_value"))
        .orderBy(col("event_id"))
    }),

    // Rollup aggregation (hierarchical subtotals).
    "q_rollup" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Exact distinct aggregation (shuffle-dedup path).
    "q_distinct_agg" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    }),

    // Exact interpolated percentiles per group.
    "q_percentile" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Runtime Bloom-filter join pruning: build a Bloom filter over the
    // selective dim side's keys, pre-filter the fact scan BEFORE its
    // shuffle/join (the explicit form of Spark's InjectRuntimeFilter). At
    // 100TB this is the difference between shuffling the whole fact table
    // and shuffling the ~matching fraction; false positives are removed by
    // the join itself, so the result equals the plain join (the oracle).
    "q_bloom_join" -> ((s, dir) => {
      import graft.functions.BloomFilters
      val hot = load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_orderdate"))
      val bloom = org.apache.spark.sql.graftshim.ColumnBridge.scalarSubquery(
        hot.agg(
          BloomFilters.bloom_agg(col("o_orderkey"), 100000L, 800000L).as("bf")))
      load(s, dir, "lineitem")
        .filter(BloomFilters.might_contain(bloom, col("l_orderkey")))
        .join(broadcast(hot), col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")) * 100).cast("long").as("qty_e2"))
        .orderBy(col("month"))
    }),

    // Grouping sets (generalized multi-dimensional subtotals — the shape
    // ROLLUP/CUBE compile to): per-flag, per-status, and grand total in one
    // pass (Expand + single shuffle, not three scans).
    "q_grouping_sets" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")) * 100).cast("long").as("qty_e2"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n_rows"), col("qty_e2"))
        .orderBy(col("rf"), col("ls"))
    }),

    // RANGE-frame window: per-user rolling 1-hour sum over event time — the
    // value-based frame (RANGE BETWEEN) as opposed to q_lag_delta's
    // row-based frames. Values are fixed to cents per row before summing so
    // the rolling sum is order-independent (DuckDB's segment-tree window
    // accumulates doubles in a different order).
    "q_range_frame" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("epoch_s"))
        .rangeBetween(-3600L, 0L)
      load(s, dir, "events")
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(col("event_id"), col("user_id"),
          sum(col("cents")).over(w).as("hour_cents"),
          count(lit(1)).over(w).as("hour_n"))
        .orderBy(col("event_id"))
    }),

    // Batch sessionization (gaps-and-islands): the SQL-portable twin of
    // streaming.StreamingIngest.sessionize — session index = running count
    // of >30min gaps per user; then per-session stats. Two windows over
    // ONE partitioning (a single shuffle + sort services both).
    "q_sessionize" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("epoch_s"), col("event_id"))
      load(s, dir, "events")
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .withColumn("gap",
          when(col("epoch_s") - lag(col("epoch_s"), 1).over(byUser) > 1800, 1)
            .otherwise(0))
        .withColumn("session_idx", sum(col("gap")).over(
          byUser.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("epoch_s")) - min(col("epoch_s"))).as("duration_s"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // ntile bucketing: per-user value quartiles — the distribution-split
    // window shape (equal-count buckets, deterministic tie order).
    "q_ntile" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("event_id"))
    }),

    // F4: RFC-3339 naive-local parse quirk (entry.rs:96-111) — format with
    // the clock time, reparse discarding the zone.
    "q_rfc3339_quirk" -> ((s, dir) => {
      load(s, dir, "events")
        .withColumn("txt",
          concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("-05:00")))
        .select(col("event_id"),
          unix_timestamp(to_timestamp(
            regexp_replace(col("txt"), "(Z|[+-]\\d\\d:\\d\\d)$", ""),
            "yyyy-MM-dd'T'HH:mm:ss")).as("naive_unix"))
        .orderBy(col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_dict_decode" ->
      """SELECT c_custkey,
        |  COALESCE(n_name, 'Missing app info') AS nation_name
        |FROM customer LEFT JOIN (
        |  SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey < 20) d
        |ON c_nationkey = k ORDER BY c_custkey""".stripMargin,
    "q_regex_extract" ->
      """SELECT event_id,
        |  regexp_extract('https://x/espi/1_1/resource/MeterReading/' || user_id ||
        |    '/IntervalBlock/' || event_id, '(.*MeterReading/[^/]*)/', 1) AS mr_href
        |FROM events ORDER BY event_id""".stripMargin,
    "q_text_or_default" ->
      """SELECT event_id,
        |  COALESCE(NULLIF(regexp_extract(props, '"k": (\d+)', 1), ''), 'missing')
        |    AS k_or_default
        |FROM events ORDER BY event_id""".stripMargin,
    "q_bool_any" ->
      """SELECT user_id,
        |  bool_or(event_type = 'purchase' AND value > 150) AS any_big_purchase,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bit_decode" ->
      """SELECT event_id,
        |  rule % 4096 AS seconds,
        |  (rule // 4096) % 32 AS hours,
        |  (rule // 131072) % 8 AS day_of_week,
        |  (rule // 1048576) % 32 AS day_of_month,
        |  (rule // 33554432) % 8 AS operator,
        |  rule // 268435456 AS month
        |FROM (SELECT event_id, (event_id * 2654435761) % 4294967296 AS rule
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,
    "q_hex_conv" ->
      """SELECT event_id,
        |  CAST(concat('0x', to_hex(event_id + 123456)) AS BIGINT) AS roundtrip
        |FROM events ORDER BY event_id""".stripMargin,
    "q_local_time_shift" ->
      """SELECT event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) + (-18000) +
        |  CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) > 1710054000
        |        AND CAST(floor(epoch(ts)) AS BIGINT) < 1730617200
        |       THEN 3600 ELSE 0 END AS local_s
        |FROM events ORDER BY event_id""".stripMargin,
    "q_union_all" ->
      """SELECT l_orderkey % 10 AS bucket, COUNT(*) AS n_rows,
        |  SUM(l_quantity) AS sum_qty
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |   WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |   WHERE l_returnflag = 'A')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_minmax_extent" ->
      """SELECT event_type,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
        |  CAST(ROUND(MAX(value) * 100) AS BIGINT) AS max_value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sanitize" ->
      """SELECT p_partkey,
        |  regexp_replace(regexp_replace(p_name, ' ', '_', 'g'),
        |    '[^A-Za-z0-9_]', '', 'g') AS clean_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        |ORDER BY s_suppkey""".stripMargin,
    "q_time_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  COUNT(*) AS n,
        |  CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_explode_split" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cost_norm" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice / 100000.0 AS cost_dollars
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lag_delta" ->
      """SELECT event_id, user_id,
        |  CAST(ROUND((value - COALESCE(prev, 0.0)) * 100) AS BIGINT) AS delta_e2,
        |  CAST(ROUND(running * 100) AS BIGINT) AS running_e2
        |FROM (
        |  SELECT event_id, user_id, value,
        |    LAG(value, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev,
        |    SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM events) t
        |ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      """WITH ev AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |              ts FROM events),
        |w AS (SELECT DISTINCT
        |        CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) + 7200 AS w_start,
        |        CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) + 18000 AS w_end
        |      FROM events)
        |SELECT w_start, COUNT(*) AS n_events
        |FROM ev JOIN w ON ev.epoch_s >= w.w_start AND ev.epoch_s < w.w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, COUNT(*) AS n_rows,
        |  CAST(ROUND(SUM(l_extendedprice*(1.0-l_discount)*10000)) AS BIGINT)
        |    AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, r.value AS asof_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                WHERE event_type = 'error') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bloom_join" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_items,
        |  CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS qty_e2
        |FROM lineitem JOIN (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_totalprice > 400000) o
        |ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n_rows,
        |  CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS qty_e2
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY 1, 2""".stripMargin,
    "q_range_frame" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS hour_cents,
        |  COUNT(*) OVER w AS hour_n
        |FROM (SELECT event_id, user_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |        CAST(ROUND(value * 100) AS BIGINT) AS cents
        |      FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_id, epoch_s,
        |    CASE WHEN epoch_s - LAG(epoch_s, 1) OVER w > 1800
        |         THEN 1 ELSE 0 END AS gap
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id)),
        |s AS (
        |  SELECT user_id, epoch_s,
        |    CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM g)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  MAX(epoch_s) - MIN(epoch_s) AS duration_s
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ntile" ->
      """SELECT event_id, user_id,
        |  CAST(ntile(4) OVER (PARTITION BY user_id
        |    ORDER BY value, event_id) AS INT) AS quartile
        |FROM events ORDER BY event_id""".stripMargin,
    "q_rfc3339_quirk" ->
      """SELECT event_id,
        |  CAST(floor(epoch(strptime(
        |    regexp_replace(strftime(ts, '%Y-%m-%dT%H:%M:%S') || '-05:00',
        |      '(Z|[+-]\d\d:\d\d)$', ''),
        |    '%Y-%m-%dT%H:%M:%S'))) AS BIGINT) AS naive_unix
        |FROM events ORDER BY event_id""".stripMargin
  )
}
