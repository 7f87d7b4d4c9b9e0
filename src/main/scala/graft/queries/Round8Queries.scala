package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.plans.AsOfNative
import graft.queries.QueryShared.packedK

/** Round-8 additions — queries driving this session's new operators:
  *
  *   - the NATIVE as-of join (custom logical plan + strategy + streaming
  *     merge exec, `graft.plans`), oracled against the same DuckDB ASOF
  *     forms as the window-composition queries it accelerates
  *   - blocked fuzzy (edit-distance) dedup — the non-token near-dup
  *     family (typo'd titles, OCR noise) that MinHash misses
  *   - deterministic train/eval corpus split with a leakage guard
  *   - integer-exact PageRank (iterative-fixpoint family next to the
  *     connected-components dedup clustering)
  *   - deterministic per-group sampling on the custom BottomKByHash
  *     partial-aggregable aggregate
  */
object Round8Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Native as-of: purchases pick up the closest at-or-before view, on
    // the packed key (unique, monotone ⇒ unambiguous oracle).
    "q_asof_native" -> ((s, dir) => {
      val e = load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), packedK.as("k"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), packedK.as("vk"),
          round(col("value") * 100).cast("long").as("v_cents"))
      AsOfNative.asOf(purchases, views, Seq("user_id"),
          leftTime = "k", rightTime = "vk",
          rightVals = Seq("vk", "v_cents"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_vk"), lit(-1L)).as("view_k"),
          coalesce(col("asof_v_cents"), lit(-1L)).as("view_cents"))
        .orderBy(col("event_id"))
    }),

    // Native as-of with bounded staleness — same expected output as
    // q_asof_tolerance, produced by the merge exec's tolerance gate.
    "q_asof_native_tol" -> ((s, dir) => {
      val e = load(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), packedK.as("k"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), packedK.as("vk"),
          round(col("value") * 100).cast("long").as("v_cents"))
      AsOfNative.asOf(purchases, views, Seq("user_id"),
          leftTime = "k", rightTime = "vk",
          rightVals = Seq("vk", "v_cents"),
          tolerance = Some(3600L * 1000000L))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_vk"), lit(-1L)).as("view_k"),
          coalesce(col("asof_v_cents"), lit(-1L)).as("view_cents"))
        .orderBy(col("event_id"))
    }),

    // Blocked fuzzy dedup: edit-distance near-dups (typo'd titles, OCR
    // noise) that token-level MinHash misses. Candidate generation is TWO
    // equi-join blocking passes — same (lang, first-8-chars) OR same
    // (lang, last-8-chars) — so the only shuffles are hash joins on
    // blocking keys, never an all-pairs product; Levenshtein verifies just
    // the candidates on a bounded 100-char head (edit distance is O(n²)
    // per pair — the cap is the cost control). At 100 TB the block key
    // length is the selectivity knob (longer key = smaller blocks), plus a
    // bucket-size cap for adversarial pileups, same as the MinHash path.
    // Planted typos (char 21 replaced with 'x') make the expected output
    // non-trivial at every SF: each planted pair shares its prefix-8 block
    // and has head distance exactly 1.
    "d_dedup_fuzzy" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("doc_id") < 500)
        .filter(length(col("text")) >= 60)
        .select(col("doc_id"), col("lang"), col("text"))
      val typos = base.filter(col("doc_id") < 40)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          concat(substring(col("text"), 1, 20), lit("x"),
            expr("substring(text, 22)")).as("text"))
      graft.text.FuzzyDedup.pairs(base.unionByName(typos),
          idCol = "doc_id", textCol = "text", groupCols = Seq("lang"),
          blockLen = 8, headLen = 100, maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // The SAME fuzzy pass with the adversarial-pileup guard ACTIVE
    // (maxBlockSize=3): oversized blocks drop before pairing, per pass.
    // The cap predicate is plain SQL (HAVING COUNT(*) <= 3 per block), so
    // the guard's exact semantics — which blocks drop, which pairs
    // survive via the OTHER anchor — are oracle-checked, not just spec'd.
    "d_dedup_fuzzy_capped" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("doc_id") < 500)
        .filter(length(col("text")) >= 60)
        .select(col("doc_id"), col("lang"), col("text"))
      val typos = base.filter(col("doc_id") < 40)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          concat(substring(col("text"), 1, 20), lit("x"),
            expr("substring(text, 22)")).as("text"))
      graft.text.FuzzyDedup.pairs(base.unionByName(typos),
          idCol = "doc_id", textCol = "text", groupCols = Seq("lang"),
          blockLen = 8, headLen = 100, maxDist = 2, maxBlockSize = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Deterministic train/eval split + leakage guard: ~10% eval by md5
    // hash threshold (stable across runs/engines — no RNG), with an
    // exact-duplicate cross-split leak count over md5(text) so shuffled
    // bytes are 32-hex digests, not document bodies (the 100 TB shape:
    // split assignment is map-only; the leak check is ONE shuffle on the
    // text digest). Planted copies of the first 25 docs land in whichever
    // split their new id hashes to, so the leak count is non-zero and
    // oracle-checkable at every SF.
    "d_split_train_eval" -> ((s, dir) => {
      val base = load(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"), col("n_chars"))
      val docs = base.unionByName(base.filter(col("doc_id") < 25)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          col("n_chars")))
      val tagged = docs.withColumn("split",
          when(substring(md5(concat(lit("split"), col("doc_id").cast("string"))
            .cast("binary")), 1, 2) < "1a", "eval").otherwise("train"))
        .withColumn("h", md5(col("text").cast("binary")))
      val leaks = tagged.select(col("h"), col("split")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("ns"))
        .filter(col("ns") === 2)
        .select(col("h"), lit(1).as("leak"))
      tagged.join(leaks, Seq("h"), "left")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_sum"),
          sum(coalesce(col("leak"), lit(0))).as("n_leaked"))
        .orderBy(col("split"))
    }),

    // Integer-exact PageRank (3 Lloyd-style rounds, damping 0.85) over the
    // event-type transition graph — the iterative-fixpoint family next to
    // connected components. All arithmetic is BIGINT ppm with a single
    // integer division per edge ((rank*850000*w) div (1000000*out_w)), so
    // both engines compute bit-identical ranks — no float fixpoint to
    // diverge. Each round is two joins + one aggregation over the EDGE
    // list (never the event log), with a per-round eager localCheckpoint —
    // the DedupClusters/KMeans lineage rule: an un-truncated loop embeds
    // the previous plan twice per round and canonicalization goes 2^n. At
    // a 100 TB graph the edge list shuffle-partitions on src and the rank
    // vector broadcasts until it outgrows the dim threshold.
    "q_pagerank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("k"))
      val edges = load(s, dir, "events")
        .select(col("user_id"), packedK.as("k"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type").as("src"), col("event_type").as("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .localCheckpoint(true) // reused 3x per round: stage once
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
      var rank = nodes.withColumn("rank", lit(1000000L))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(rank.select(col("node").as("src"), col("rank")), "src")
          .join(outw, "src")
          .select(col("dst").as("node"),
            expr("(rank * 850000 * w) div (1000000 * out_w)").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
        rank = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("in_sum"), lit(0L))).as("rank"))
          .localCheckpoint(true)
      }
      rank.select(col("node"), col("rank").as("rank_ppm"))
        .orderBy(col("node"))
    }),

    // Interval×interval overlap join via the grid-bucket trick
    // (operators.RangeJoin.intervalOverlap): purchase attribution windows
    // [k, k+1h) against view windows [k, k+30m) per user. A bare overlap
    // predicate would plan BroadcastNestedLoopJoin (O(n·m)); the bucketed
    // form is ONE hash shuffle on (user, bucket), and the canonical-bucket
    // rule makes the output exactly-once without a distinct. The oracle is
    // the naive inequality join — same pairs, any plan.
    "q_interval_overlap" -> ((s, dir) => {
      val e = load(s, dir, "events")
      val H = 3600L * 1000000L
      val HALF = 1800L * 1000000L
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          packedK.as("p_start"))
        .withColumn("p_end", col("p_start") + H)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"),
          packedK.as("v_start"))
        .withColumn("v_end", col("v_start") + HALF)
      graft.operators.RangeJoin.intervalOverlap(purch, views, Seq("user_id"),
          "p_start", "p_end", "v_start", "v_end", bucketWidth = H)
        .select(col("p_id"), col("v_id"))
        .orderBy(col("p_id"), col("v_id"))
    }),

    // Deterministic per-group k-sample via the custom partial-aggregable
    // BottomKByHash aggregate (TypedImperativeAggregate): the shuffle
    // carries one O(k) buffer per (group × map task), never the group's
    // rows — unlike collect_list+sort — and the sample is a pure function
    // of the data (md5 priorities, no RNG), so the DuckDB oracle states
    // the exact rows.
    "d_sample_bottomk" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(concat_ws(",", graft.functions.BottomK.bottomKByHash(
            col("doc_id").cast("string"), 5, "s8")).as("sample_ids"),
          count(lit(1)).as("n"))
        .orderBy(col("lang"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_asof_native" ->
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
    "q_asof_native_tol" ->
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
        |FROM p LEFT JOIN m ON p.event_id = m.event_id
        |ORDER BY p.event_id""".stripMargin,
    "d_dedup_fuzzy" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id < 500 AND length(text) >= 60),
        |docs AS (
        |  SELECT doc_id, lang, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang,
        |    substr(text, 1, 20) || 'x' || substr(text, 22)
        |  FROM base WHERE doc_id < 40),
        |d AS (
        |  SELECT doc_id, lang, substr(text, 1, 100) AS head,
        |    substr(text, 1, 8) AS pre,
        |    substr(text, length(text) - 7) AS suf
        |  FROM docs),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.head AS head_a, b.head AS head_b
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.pre = b.pre AND a.doc_id < b.doc_id
        |  UNION
        |  SELECT a.doc_id, b.doc_id, a.head, b.head
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.suf = b.suf AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, levenshtein(head_a, head_b) AS dist
        |FROM cand
        |WHERE levenshtein(head_a, head_b) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "d_dedup_fuzzy_capped" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id < 500 AND length(text) >= 60),
        |docs AS (
        |  SELECT doc_id, lang, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang,
        |    substr(text, 1, 20) || 'x' || substr(text, 22)
        |  FROM base WHERE doc_id < 40),
        |d AS (
        |  SELECT doc_id, lang, substr(text, 1, 100) AS head,
        |    substr(text, 1, 8) AS pre,
        |    substr(text, length(text) - 7) AS suf
        |  FROM docs),
        |pre_ok AS (SELECT lang, pre FROM d GROUP BY 1, 2
        |           HAVING COUNT(*) <= 3),
        |suf_ok AS (SELECT lang, suf FROM d GROUP BY 1, 2
        |           HAVING COUNT(*) <= 3),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.head AS head_a, b.head AS head_b
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.pre = b.pre AND a.doc_id < b.doc_id
        |  JOIN pre_ok k ON k.lang = a.lang AND k.pre = a.pre
        |  UNION
        |  SELECT a.doc_id, b.doc_id, a.head, b.head
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.suf = b.suf AND a.doc_id < b.doc_id
        |  JOIN suf_ok k ON k.lang = a.lang AND k.suf = a.suf)
        |SELECT id_a, id_b, levenshtein(head_a, head_b) AS dist
        |FROM cand
        |WHERE levenshtein(head_a, head_b) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "d_split_train_eval" ->
      """WITH base AS (
        |  SELECT doc_id, text, n_chars FROM documents WHERE doc_id < 500),
        |docs AS (
        |  SELECT doc_id, text, n_chars FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, n_chars FROM base
        |  WHERE doc_id < 25),
        |tagged AS (
        |  SELECT doc_id, n_chars, md5(text) AS h,
        |    CASE WHEN substring(md5(concat('split',
        |        CAST(doc_id AS VARCHAR))), 1, 2) < '1a'
        |      THEN 'eval' ELSE 'train' END AS split
        |  FROM docs),
        |leaks AS (
        |  SELECT h FROM (SELECT DISTINCT h, split FROM tagged)
        |  GROUP BY h HAVING COUNT(*) = 2)
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
        |  CAST(SUM(CASE WHEN h IN (SELECT h FROM leaks)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
        |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pagerank" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k,
        |    event_type
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY k)
        |      AS prev_type
        |  FROM e),
        |edges AS (
        |  SELECT prev_type AS src, event_type AS dst, COUNT(*) AS w
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |nodes AS (
        |  SELECT DISTINCT src AS node FROM edges
        |  UNION SELECT DISTINCT dst FROM edges),
        |outw AS (SELECT src AS node, SUM(w) AS out_w FROM edges GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |r1 AS (SELECT n.node, 150000 + COALESCE((
        |    SELECT CAST(SUM((p.rank * 850000 * e.w)
        |      // (1000000 * o.out_w)) AS BIGINT)
        |    FROM edges e JOIN r0 p ON p.node = e.src
        |      JOIN outw o ON o.node = e.src
        |    WHERE e.dst = n.node), 0) AS rank FROM nodes n),
        |r2 AS (SELECT n.node, 150000 + COALESCE((
        |    SELECT CAST(SUM((p.rank * 850000 * e.w)
        |      // (1000000 * o.out_w)) AS BIGINT)
        |    FROM edges e JOIN r1 p ON p.node = e.src
        |      JOIN outw o ON o.node = e.src
        |    WHERE e.dst = n.node), 0) AS rank FROM nodes n),
        |r3 AS (SELECT n.node, 150000 + COALESCE((
        |    SELECT CAST(SUM((p.rank * 850000 * e.w)
        |      // (1000000 * o.out_w)) AS BIGINT)
        |    FROM edges e JOIN r2 p ON p.node = e.src
        |      JOIN outw o ON o.node = e.src
        |    WHERE e.dst = n.node), 0) AS rank FROM nodes n)
        |SELECT node, CAST(rank AS BIGINT) AS rank_ppm
        |FROM r3 ORDER BY node""".stripMargin,
    "q_interval_overlap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k
        |  FROM events),
        |p AS (SELECT user_id, event_id AS p_id, k AS p_start,
        |        k + 3600000000 AS p_end
        |      FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS v_id, k AS v_start,
        |        k + 1800000000 AS v_end
        |      FROM e WHERE event_type = 'view')
        |SELECT p.p_id, v.v_id
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND p.p_start < v.v_end AND v.v_start < p.p_end
        |ORDER BY 1, 2""".stripMargin,
    "d_sample_bottomk" ->
      """SELECT lang,
        |  array_to_string((list(CAST(doc_id AS VARCHAR)
        |     ORDER BY md5('s8' || CAST(doc_id AS VARCHAR)),
        |       CAST(doc_id AS VARCHAR)))[1:5], ',') AS sample_ids,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
