package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.AsOfJoin
import graft.text.TextOps

/** Round-5 surface widening — product/behavioral analytics and corpus-prep
  * shapes every warehouse workload needs:
  *
  *   - ordered-stage funnel (ONE shuffle: per-user sort + fold, not the
  *     textbook k-pass self-join)
  *   - cohort retention (first-touch cohorts × activity offsets)
  *   - interval merge (gaps-and-islands over overlapping spans)
  *   - SCD type-2 change capture (lag-compress + lead-close)
  *   - exact median/IQR by position (no interpolation ambiguity)
  *   - winsorized robust stats (disc-percentile clip)
  *   - cross-document EXACT n-gram dedup coverage (the inverted-index
  *     formulation of suffix-style substring dedup)
  *   - native session_window aggregation (vs the manual islands twin
  *     q_sessionize — same oracle technique, engine operator exercised)
  *   - as-of join with staleness tolerance
  *
  * Determinism conventions follow NOTES.md: packed (second, event_id) BIGINT
  * order keys, cents integerization before any cross-engine aggregation,
  * every query ORDER BY a unique key set.
  */
object Round5Queries {

  private def packedK: Column = QueryShared.packedK

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ordered-stage funnel signup→view→click→purchase over the first three
    // days. The textbook formulation is k staged self-joins (k passes over
    // the fact table); here each user's events take ONE shuffle
    // (groupBy user) + a sorted fold: collect_list → sort_array →
    // aggregate() walking events in (time, id) order carrying the
    // first-completion key of each stage. Per-user event counts are bounded,
    // so the collected array is small and the whole query is a single
    // map-side-combinable aggregation — at 100TB that is k× fewer scans
    // than the join form (the oracle keeps the join form as the spec).
    "q_funnel" -> ((s, dir) => {
      val e = load(s, dir, "events")
        .filter(col("ts") < to_timestamp(lit("2024-01-04 00:00:00")))
        .select(col("user_id"), packedK.as("k"), col("event_type"))
      val init = struct(lit(-1L).as("s"), lit(-1L).as("v"),
        lit(-1L).as("c"), lit(-1L).as("p"))
      val folded = e
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("k"), col("event_type"))))
          .as("evs"))
        .select(col("user_id"),
          aggregate(col("evs"), init, (st, ev) => {
            val k = ev.getField("k")
            val t = ev.getField("event_type")
            struct(
              when(st.getField("s") < 0 && t === "signup", k)
                .otherwise(st.getField("s")).as("s"),
              when(st.getField("v") < 0 && st.getField("s") >= 0 &&
                t === "view", k).otherwise(st.getField("v")).as("v"),
              when(st.getField("c") < 0 && st.getField("v") >= 0 &&
                t === "click", k).otherwise(st.getField("c")).as("c"),
              when(st.getField("p") < 0 && st.getField("c") >= 0 &&
                t === "purchase", k).otherwise(st.getField("p")).as("p"))
          }).as("st"))
      folded
        .select(
          when(col("st.p") >= 0, 4).when(col("st.c") >= 0, 3)
            .when(col("st.v") >= 0, 2).when(col("st.s") >= 0, 1)
            .otherwise(0).cast("long").as("stage"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("stage"))
    }),

    // Cohort retention: cohort = first active day, activity = distinct
    // (user, day); count users active at each day offset. Two shuffles on
    // user_id (Catalyst reuses the partitioning for the join), final tiny
    // agg on offset.
    "q_retention" -> ((s, dir) => {
      val e = load(s, dir, "events")
      val first = e.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("d0"))
      val active = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      active.join(first, "user_id")
        .groupBy(datediff(col("d"), col("d0")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("day_offset"))
    }),

    // Interval merge: each event spawns a 600-second span; overlapping or
    // touching spans coalesce into islands (new island when start > running
    // max of all previous ends). One shuffle on user_id; both windows and
    // the final agg reuse it.
    "q_interval_merge" -> ((s, dir) => {
      val e = load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("st"))
        .withColumn("en", col("st") + 600L)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("st"), col("event_id"))
      val runMax = max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1))
      val isl = e
        .withColumn("new_isl",
          when(runMax.isNull || col("st") > runMax, 1).otherwise(0))
        .withColumn("isl",
          sum(col("new_isl")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("isl"))
        .agg((max(col("en")) - min(col("st"))).as("covered"))
      isl.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"), sum(col("covered")).as("covered_s"))
        .orderBy(col("user_id"))
    }),

    // SCD type-2 change capture: per-user attribute stream (props.k)
    // compressed to change rows (lag ≠ current), each closed by the next
    // change's key (lead) — the standard dimension-history build. Both
    // windows share one user_id shuffle.
    "d_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("k"))
      val e = load(s, dir, "events")
        .filter(col("user_id") < 50)
        .select(col("user_id"), packedK.as("k"),
          get_json_object(col("props"), "$.k").cast("long").as("attr"))
      e.withColumn("prev", lag(col("attr"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("attr"))
        .select(col("user_id"), col("attr"), col("k").as("valid_from_k"),
          coalesce(lead(col("k"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("k"))), lit(-1L))
            .as("valid_to_k"))
        .withColumn("is_current", col("valid_to_k") === -1L)
        .orderBy(col("user_id"), col("valid_from_k"))
    }),

    // Exact median + interquartile range by POSITION (row_number against
    // counts) — no percentile interpolation semantics to disagree on. The
    // per-group sort is one shuffle; rank selection is a codegen'd filter.
    "q_median_iqr" -> ((s, dir) => {
      val e = load(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cents"), col("event_id"))
      val ranked = e
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      ranked
        .groupBy(col("event_type"))
        .agg(
          max(col("n")).as("n"),
          (sum(when(col("rn") === expr("(n + 1) div 2"), col("cents"))
              .otherwise(0L)) +
            sum(when(col("rn") === expr("(n + 2) div 2"), col("cents"))
              .otherwise(0L))).as("med2"),
          sum(when(col("rn") === expr("(n + 3) div 4"), col("cents"))
            .otherwise(0L)).as("q1"),
          sum(when(col("rn") === expr("(3 * n + 3) div 4"), col("cents"))
            .otherwise(0L)).as("q3"))
        .orderBy(col("event_type"))
    }),

    // Winsorized stats: per-language n_chars clipped at discrete p05/p95
    // (value at rank ceil(q·n) — exact, interpolation-free). Bounds are a
    // tiny per-group aggregate broadcast back; the clip is a map-only pass.
    "d_winsorize" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      val ranked = d
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      val bounds = ranked
        .groupBy(col("lang"))
        .agg(
          sum(when(col("rn") === expr("(n + 19) div 20"), col("n_chars"))
            .otherwise(0L)).as("lo"),
          sum(when(col("rn") === expr("(19 * n + 19) div 20"), col("n_chars"))
            .otherwise(0L)).as("hi"))
      d.join(broadcast(bounds), "lang")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), max(col("lo")).as("lo"),
          max(col("hi")).as("hi"),
          sum(col("n_chars")).as("sum_raw"),
          sum(greatest(least(col("n_chars"), col("hi")), col("lo")))
            .as("sum_clip"))
        .orderBy(col("lang"))
    }),

    // Cross-document EXACT n-gram dedup coverage — the inverted-index
    // formulation of substring-level dedup (Lee et al. "Deduplicating
    // Training Data Makes Language Models Better"): per doc, how many of
    // its distinct 5-grams appear in ≥2 docs. Grams are hashed to 64-bit
    // BEFORE the two shuffles (index build + count join-back): 8 bytes on
    // the wire instead of ~40-char strings — at 100TB that is the
    // difference between shuffling the corpus and shuffling 2% of it.
    // (xxhash64 collisions can in principle merge two grams; at 2^-64 per
    // pair that is ~1e-7 across a trillion-gram corpus — the standard
    // trade every production substring-dedup makes.)
    "d_dedup_ngram_cross" -> ((s, dir) => {
      // materialize the per-doc gram-id arrays ONCE: three plan branches
      // consume them (dup-set build, shared-count semi join, n_grams), and
      // without staging each branch would re-run tokenize+hash over the
      // corpus (the 100TB analog is a staging write, as in
      // QueryShared.chainClusterLabels)
      val docs = load(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(TextOps.ngramHashes(TextOps.tokens(col("text")), 5))
            .as("garr"))
        .localCheckpoint(true)
      val grams = docs.select(col("doc_id"), explode(col("garr")).as("g"))
      // Only grams in ≥2 docs matter downstream, and that set is a small
      // fraction of all distinct grams in any remotely-deduped corpus —
      // so instead of joining the full gram table back to per-gram counts
      // (a second full-size shuffle), broadcast the dup set and semi-join.
      // ONE corpus-sized shuffle total (the count groupBy); n_grams never
      // leaves the map side. If the dup set outgrows broadcast range at
      // extreme dup rates, fall back to the plain join-back — same answer.
      val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1).select(col("g"))
      val shared = grams.join(broadcast(dup), Seq("g"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      // docs with <n tokens have no grams — excluded, matching the
      // oracle's grams CTE (its generate_series is empty for them; a
      // left-join-from-docs formulation would emit a (doc_id, 0, 0) row
      // the oracle doesn't have)
      docs.filter(size(col("garr")) > 0)
        .select(col("doc_id"), size(col("garr")).cast("long").as("n_grams"))
        .join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // Native session_window aggregation — the engine operator twin of the
    // manual gaps-and-islands q_sessionize. Timestamps truncated to whole
    // seconds FIRST so the oracle's floor(epoch) islands see the identical
    // time base. Boundary semantics (verified empirically at sf0.1, where
    // exactly one event pair sits exactly 1800s apart): Spark merges
    // TOUCHING windows — an event at prev + gap extends the session — so
    // the islands oracle must split on diff > gap, strictly.
    "q_session_native" -> ((s, dir) => {
      load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          date_trunc("second", col("ts")).as("tss"))
        .groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          (unix_timestamp(max(col("tss"))) - unix_timestamp(min(col("tss"))))
            .as("duration_s"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("session_start"),
          col("n_events"), col("duration_s"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // As-of join with staleness tolerance: each purchase picks the latest
    // preceding view by the SAME user, but only within 1 hour — older
    // matches null out. Times are packed keys, so the tolerance window and
    // tie behavior are bit-identical to the oracle's arg_max formulation.
    "q_asof_tolerance" -> ((s, dir) => {
      val e = load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), packedK.as("k"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), packedK.as("vk"),
          round(col("value") * 100).cast("long").as("v_cents"))
      AsOfJoin.asOfTolerance(purchases, views, Seq("user_id"),
          leftTime = "k", rightTime = "vk",
          rightVals = Seq("vk", "v_cents"), tolerance = 3600L * 1000000L)
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_vk"), lit(-1L)).as("view_k"),
          coalesce(col("asof_v_cents"), lit(-1L)).as("view_cents"))
        .orderBy(col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k,
        |    event_type
        |  FROM events WHERE ts < TIMESTAMP '2024-01-04 00:00:00'),
        |s AS (SELECT user_id, MIN(k) AS k0 FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |v AS (SELECT e.user_id, MIN(k) AS k1 FROM e JOIN s USING(user_id)
        |      WHERE event_type = 'view' AND k > k0 GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(k) AS k2 FROM e JOIN v USING(user_id)
        |      WHERE event_type = 'click' AND k > k1 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(k) AS k3 FROM e JOIN c USING(user_id)
        |      WHERE event_type = 'purchase' AND k > k2 GROUP BY 1)
        |SELECT stage, COUNT(*) AS n_users FROM (
        |  SELECT u.user_id,
        |    CASE WHEN k3 IS NOT NULL THEN 4 WHEN k2 IS NOT NULL THEN 3
        |         WHEN k1 IS NOT NULL THEN 2 WHEN k0 IS NOT NULL THEN 1
        |         ELSE 0 END AS stage
        |  FROM (SELECT DISTINCT user_id FROM e) u
        |  LEFT JOIN s USING(user_id) LEFT JOIN v USING(user_id)
        |  LEFT JOIN c USING(user_id) LEFT JOIN p USING(user_id))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_retention" ->
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
        |           FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS day_offset,
        |  COUNT(*) AS n_users
        |FROM act JOIN f USING(user_id) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_interval_merge" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS st,
        |    CAST(floor(epoch(ts)) AS BIGINT) + 600 AS en
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, st, en,
        |    MAX(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
        |  FROM e),
        |g AS (
        |  SELECT user_id, st, en,
        |    CASE WHEN run_max IS NULL OR st > run_max THEN 1 ELSE 0 END
        |      AS new_isl, event_id
        |  FROM m),
        |i AS (
        |  SELECT user_id, st, en,
        |    CAST(SUM(new_isl) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS isl
        |  FROM g),
        |isla AS (
        |  SELECT user_id, isl, MAX(en) - MIN(st) AS covered
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(covered) AS BIGINT) AS covered_s
        |FROM isla GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_scd2" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS attr
        |  FROM events WHERE user_id < 50),
        |ch AS (
        |  SELECT user_id, k, attr,
        |    LAG(attr, 1) OVER (PARTITION BY user_id ORDER BY k) AS prev
        |  FROM e),
        |kept AS (SELECT user_id, k, attr FROM ch
        |         WHERE prev IS NULL OR prev <> attr)
        |SELECT user_id, attr, k AS valid_from_k,
        |  COALESCE(LEAD(k, 1) OVER (PARTITION BY user_id ORDER BY k), -1)
        |    AS valid_to_k,
        |  (LEAD(k, 1) OVER (PARTITION BY user_id ORDER BY k) IS NULL)
        |    AS is_current
        |FROM kept ORDER BY user_id, valid_from_k""".stripMargin,
    "q_median_iqr" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN cents ELSE 0 END) +
        |       SUM(CASE WHEN rn = (n + 2) // 2 THEN cents ELSE 0 END)
        |    AS BIGINT) AS med2,
        |  CAST(SUM(CASE WHEN rn = (n + 3) // 4 THEN cents ELSE 0 END)
        |    AS BIGINT) AS q1,
        |  CAST(SUM(CASE WHEN rn = (3 * n + 3) // 4 THEN cents ELSE 0 END)
        |    AS BIGINT) AS q3
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_winsorize" ->
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |b AS (
        |  SELECT lang,
        |    CAST(SUM(CASE WHEN rn = (n + 19) // 20 THEN n_chars ELSE 0 END)
        |      AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN rn = (19 * n + 19) // 20 THEN n_chars
        |      ELSE 0 END) AS BIGINT) AS hi
        |  FROM r GROUP BY 1)
        |SELECT d.lang, COUNT(*) AS n_docs, MAX(lo) AS lo, MAX(hi) AS hi,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_raw,
        |  CAST(SUM(GREATEST(LEAST(n_chars, hi), lo)) AS BIGINT) AS sum_clip
        |FROM documents d JOIN b ON d.lang = b.lang
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_dedup_ngram_cross" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
        |  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS s(i)),
        |gc AS (SELECT g, COUNT(*) AS n_docs FROM grams GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN gc.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared
        |FROM grams JOIN gc USING(g) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_session_native" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT)
        |    AS epoch_s
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
        |SELECT user_id, MIN(epoch_s) AS session_start,
        |  COUNT(*) AS n_events,
        |  MAX(epoch_s) - MIN(epoch_s) AS duration_s
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_start""".stripMargin,
    "q_asof_tolerance" ->
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
        |  FROM p JOIN v ON p.user_id = v.user_id
        |    AND v.vk <= p.k AND v.vk >= p.k - 3600000000
        |  GROUP BY 1)
        |SELECT p.event_id, p.user_id,
        |  COALESCE(m.view_k, -1) AS view_k,
        |  COALESCE(m.view_cents, -1) AS view_cents
        |FROM p LEFT JOIN m USING(event_id)
        |ORDER BY p.event_id""".stripMargin
  )
}
