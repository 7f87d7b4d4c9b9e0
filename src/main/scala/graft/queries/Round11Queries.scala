package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.Upsert
import graft.text.SubstringDedup

/** Round-11 additions — corpus maintenance and substring-level dedup:
  *
  *   - EXACT-substring dedup (the ExactSubstr shape: repeated length-L
  *     character windows across documents → maximal per-doc spans), and
  *     the strip step that removes the spans — both fully value-checked
  *     (the hash pre-filter is verified against exact gram text inside
  *     the operator, so the oracle can state the pure string semantics)
  *   - deterministic WEIGHTED sampling (priority = hash div weight —
  *     heavier docs draw smaller priorities, bottom-k per stratum wins;
  *     pure integer arithmetic, engine-exact)
  *   - MERGE INTO semantics over plain DataFrames (update / insert /
  *     conditional-delete in one full-outer pass) — the CDC apply step
  *     of an incremental corpus snapshot
  */
object Round11Queries {

  /** Window length for the substring-dedup queries: long enough that a
    * cross-doc repeat is boilerplate rather than chance n-gram reuse,
    * short enough that sf0.01's word-salad docs exercise multi-span
    * island merging (294 spans, up to 5 per doc, at L=25). */
  private val SubstrL = 25

  private def substrSpans(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.spans(load(s, dir, "documents"), "doc_id", "text",
      SubstrL)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Maximal duplicated spans per doc. The operator's corpus-sized
    // shuffles carry only (hash, doc_id, pos) ints; gram text shuffles
    // once (1× corpus bytes, doc_id-keyed re-attach) plus the
    // candidate-only verification — see SubstringDedup's scale notes.
    "d_substr_dedup" -> ((s, dir) =>
      substrSpans(s, dir)
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("n_win"))
        .orderBy(col("doc_id"), col("span_start"))),

    // Strip the spans: every doc emits a row (a fully-covered doc keeps
    // an EMPTY string — it must not vanish, or downstream token
    // accounting silently double-counts the removed text). md5 keeps the
    // output narrow while still pinning every kept byte.
    "d_substr_strip" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      SubstringDedup.strip(docs, substrSpans(s, dir), "doc_id", "text")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("clean_len"),
          md5(col("text").cast("binary")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic weighted sampling: each doc draws a 60-bit uniform
    // from md5(seed||id); priority = draw div weight, bottom-20 per
    // source stratum win (ties by doc_id). Heavier docs shrink their
    // priority range ⇒ selection rate increases monotonically with
    // weight, with NO float arithmetic and no RNG — the sample is a pure
    // function of the data, reproducible across engines and re-runs.
    // Map-only until one top-k aggregation per stratum.
    "d_sample_weighted" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pri = load(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr("conv(substring(md5(cast(concat('wsamp', " +
            "cast(doc_id as string)) as binary)), 1, 15), 16, 10)")
            .cast("long").as("v"),
          col("n_chars"))
        .select(col("source"), col("doc_id"),
          expr("v div greatest(n_chars, 1)").as("priority"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("priority"), col("doc_id"))
      pri.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("source"), col("doc_id"), col("priority"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // MERGE INTO: target = orders not divisible by 4; source = even keys
    // with doubled price and status 'U'; matched 1-URGENT rows are
    // deleted. Exercises all four merge outcomes (update, insert,
    // delete, untouched) in one pass; from_source is the audit column.
    "d_merge_cdc" -> ((s, dir) => {
      val orders = load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 4 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderstatus", lit("U"))
      Upsert.mergeTagged(target, source, Seq("o_orderkey"),
          deleteCond = Some(col("o_orderpriority") === "1-URGENT"))
        .select(col("o_orderkey"),
          expr("cast(round(o_totalprice * 100) as bigint)")
            .as("price_cents"),
          col("o_orderstatus"), col("from_source"))
        .orderBy(col("o_orderkey"))
    }))

  def oracleSql: Map[String, String] = Map(
    "d_substr_dedup" ->
      s"""WITH w AS (
        |  SELECT d.doc_id, gs.i AS pos,
        |    substr(d.text, gs.i::INT, $SubstrL) AS gram
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(length(d.text) - ${SubstrL - 1}, 0))) AS i) gs),
        |dup AS (
        |  SELECT gram FROM w GROUP BY gram
        |  HAVING count(DISTINCT doc_id) >= 2),
        |marked AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (gram)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |           IS NULL
        |         OR pos > lag(pos) OVER (PARTITION BY doc_id
        |           ORDER BY pos) + $SubstrL
        |         THEN 1 ELSE 0 END AS brk
        |  FROM marked),
        |grp AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM isl)
        |SELECT doc_id, min(pos) AS span_start,
        |  max(pos) + ${SubstrL - 1} AS span_end, count(*) AS n_win
        |FROM grp GROUP BY doc_id, g
        |ORDER BY doc_id, span_start""".stripMargin,
    "d_substr_strip" ->
      s"""WITH w AS (
        |  SELECT d.doc_id, gs.i AS pos,
        |    substr(d.text, gs.i::INT, $SubstrL) AS gram
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(length(d.text) - ${SubstrL - 1}, 0))) AS i) gs),
        |dup AS (
        |  SELECT gram FROM w GROUP BY gram
        |  HAVING count(DISTINCT doc_id) >= 2),
        |marked AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (gram)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |           IS NULL
        |         OR pos > lag(pos) OVER (PARTITION BY doc_id
        |           ORDER BY pos) + $SubstrL
        |         THEN 1 ELSE 0 END AS brk
        |  FROM marked),
        |grp AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM isl),
        |spans AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + ${SubstrL - 1} AS e
        |  FROM grp GROUP BY doc_id, g),
        |gaps AS (
        |  SELECT doc_id,
        |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s) + 1,
        |      1) AS gs,
        |    s - 1 AS ge
        |  FROM spans
        |  UNION ALL
        |  SELECT sp.doc_id, max(sp.e) + 1, max(length(d.text))
        |  FROM spans sp JOIN documents d USING (doc_id)
        |  GROUP BY sp.doc_id),
        |segs AS (
        |  SELECT g.doc_id, g.gs,
        |    substr(d.text, g.gs::INT, (g.ge - g.gs + 1)::INT) AS seg
        |  FROM gaps g JOIN documents d USING (doc_id)
        |  WHERE g.ge >= g.gs),
        |agg AS (
        |  SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS ctext
        |  FROM segs GROUP BY doc_id),
        |sd AS (SELECT DISTINCT doc_id FROM spans),
        |cleaned AS (
        |  SELECT d.doc_id,
        |    CASE WHEN sd.doc_id IS NULL THEN d.text
        |         ELSE coalesce(a.ctext, '') END AS ct
        |  FROM documents d
        |  LEFT JOIN sd USING (doc_id) LEFT JOIN agg a USING (doc_id))
        |SELECT doc_id, length(ct) AS clean_len, md5(ct) AS clean_md5
        |FROM cleaned ORDER BY doc_id""".stripMargin,
    "d_sample_weighted" ->
      """WITH pri AS (
        |  SELECT source, doc_id,
        |    CAST(('0x' || substr(md5('wsamp' || CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) // greatest(n_chars, 1) AS priority
        |  FROM documents),
        |rk AS (
        |  SELECT source, doc_id, priority,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY priority, doc_id) AS rn
        |  FROM pri)
        |SELECT source, doc_id, priority FROM rk WHERE rn <= 20
        |ORDER BY source, doc_id""".stripMargin,
    "d_merge_cdc" ->
      """WITH t AS (
        |  SELECT * FROM orders WHERE o_orderkey % 4 <> 0),
        |s AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice, o_orderdate,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |merged AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus,
        |    TRUE AS from_source
        |  FROM s
        |  WHERE NOT (o_orderpriority = '1-URGENT'
        |    AND o_orderkey IN (SELECT o_orderkey FROM t))
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, FALSE
        |  FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s))
        |SELECT o_orderkey,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  o_orderstatus, from_source
        |FROM merged ORDER BY o_orderkey""".stripMargin)
}
