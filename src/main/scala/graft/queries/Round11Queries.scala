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
    }),

    // Snapshot delta between two corpus versions: A = ids < 400, B = ids
    // ≥ 100 with every 5th text revised. Output scales with churn
    // (unchanged rows omitted) — the release-audit step between crawls.
    "d_snapshot_diff" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val before = docs.filter(col("doc_id") < 400)
      val after = docs.filter(col("doc_id") >= 100)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.SnapshotDiff.diff(before, after, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // Retrieval quality as oracled DATA: nDCG@10 and MRR of exact
    // brute-force cosine retrieval, judged by label agreement. The log2
    // rank discounts are a LITERAL integer table (values fixed at
    // authoring time, echoed verbatim in the SQL twin) — so the metric
    // pipeline is pure integer joins/aggregation with zero cross-engine
    // float risk; the ranking itself reuses the sequential-fold cosine
    // contract every ANN oracle already pins.
    "d_retrieval_ndcg" -> ((s, dir) => {
      import s.implicits._
      val pool = load(s, dir, "embeddings").filter(col("vec_id") < 200)
        .select(col("vec_id"), col("embedding"), col("label"))
      val probes = pool.filter(col("vec_id") < 30)
      val ranked = graft.similarity.Similarity.bruteTopK(
        probes.select(col("vec_id"), col("embedding")), pool, 10)
      val disc = Seq(1 -> 1000000L, 2 -> 630930L, 3 -> 500000L,
        4 -> 430677L, 5 -> 386853L, 6 -> 356207L, 7 -> 333333L,
        8 -> 315465L, 9 -> 301030L, 10 -> 289065L).toDF("dr", "d_e6")
      val cum = Seq(1 -> 1000000L, 2 -> 1630930L, 3 -> 2130930L,
        4 -> 2561607L, 5 -> 2948460L, 6 -> 3304667L, 7 -> 3638000L,
        8 -> 3953465L, 9 -> 4254495L, 10 -> 4543560L).toDF("cn", "c_e6")
      val qlab = probes.select(col("vec_id").as("query_id"),
        col("label").as("qlabel"))
      val nlab = pool.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlabel"))
      val rel = ranked
        .join(broadcast(qlab), Seq("query_id"))
        .join(broadcast(nlab), Seq("neighbor_id"))
        .join(broadcast(disc), col("dr") === col("rank"))
        .groupBy(col("query_id"))
        .agg(min(when(col("nlabel") === col("qlabel"), col("rank")))
          .as("first_rel"),
          sum(when(col("nlabel") === col("qlabel"), col("d_e6"))
            .otherwise(0L)).as("dcg_e6"))
      // fresh aliases: qlab and pool share lineage (self-join) — renamed
      // projections give Spark unambiguous attribute ids
      val poolRef = pool.select(col("vec_id").as("p_vec"),
        col("label").as("p_label"))
      val nrel = qlab.join(poolRef,
          col("p_label") === col("qlabel") &&
            col("p_vec") =!= col("query_id"), "left")
        .groupBy(col("query_id"))
        .agg(least(count(col("p_vec")), lit(10L)).as("nr"))
      rel.join(nrel, Seq("query_id"))
        .join(broadcast(cum), col("cn") === col("nr"), "left")
        .select(col("query_id"),
          expr("cast(coalesce(1000000 div first_rel, 0) as bigint)")
            .as("mrr_ppm"),
          col("dcg_e6"),
          expr("cast(coalesce(c_e6, 0) as bigint)").as("idcg_e6"),
          expr("cast(case when c_e6 is null then 0 " +
            "else (dcg_e6 * 1000000) div c_e6 end as bigint)")
            .as("ndcg_ppm"))
        .orderBy(col("query_id"))
    }),

    // Deterministic epoch shuffle — the training-loader contract: each
    // epoch reshuffles the corpus into shards with a DIFFERENT but fully
    // reproducible permutation (draw = md5(epoch, doc_id); shard = draw
    // mod nShards; order within shard by draw). No RNG state to
    // checkpoint, any worker can recompute its shard, and engines agree
    // bit-for-bit. Map-only until one per-(epoch, shard) window.
    "d_epoch_shuffle" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = load(s, dir, "documents")
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(2))).as("ep"))
        .select(col("ep").cast("long").as("epoch"), col("doc_id"),
          expr("cast(conv(substring(md5(cast(concat('ep', " +
            "cast(ep as string), ':', cast(doc_id as string)) as binary" +
            ")), 1, 15), 16, 10) as bigint)").as("draw"))
        .withColumn("shard", col("draw") % 8)
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("draw"), col("doc_id"))
      d.withColumn("pos", row_number().over(w).cast("long"))
        .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    }),

    // Column profiling of the corpus table — single-pass, exact distinct
    // (the approx path is spec'd plan-level in ProfileSpec).
    "d_profile" -> ((s, dir) =>
      graft.operators.Profile.profile(load(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("col_name"))))

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
        |FROM merged ORDER BY o_orderkey""".stripMargin,
    "d_snapshot_diff" ->
      """WITH a AS (SELECT * FROM documents WHERE doc_id < 400),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END
        |      AS text,
        |    lang, source, n_chars
        |  FROM documents WHERE doc_id >= 100)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM a FULL JOIN b ON a.doc_id = b.doc_id
        |WHERE a.doc_id IS NULL OR b.doc_id IS NULL
        |   OR a.text IS DISTINCT FROM b.text
        |   OR a.lang IS DISTINCT FROM b.lang
        |   OR a.source IS DISTINCT FROM b.source
        |   OR a.n_chars IS DISTINCT FROM b.n_chars
        |ORDER BY doc_id""".stripMargin,
    "d_retrieval_ndcg" ->
      """WITH pool AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  WHERE vec_id < 200),
        |p AS (
        |  SELECT vec_id AS query_id, embedding AS qemb, label AS qlabel
        |  FROM pool WHERE vec_id < 30),
        |ranked AS (
        |  SELECT * FROM (
        |    SELECT p.query_id, p.qlabel, c.vec_id AS neighbor_id,
        |      c.label AS nlabel,
        |      row_number() OVER (PARTITION BY p.query_id ORDER BY
        |        (list_dot_product(p.qemb, c.embedding) /
        |         (sqrt(list_dot_product(p.qemb, p.qemb)) *
        |          sqrt(list_dot_product(c.embedding, c.embedding)))) DESC,
        |        c.vec_id) AS r
        |    FROM pool c JOIN p ON c.vec_id <> p.query_id) WHERE r <= 10),
        |disc(dr, d_e6) AS (VALUES (1,1000000),(2,630930),(3,500000),
        |  (4,430677),(5,386853),(6,356207),(7,333333),(8,315465),
        |  (9,301030),(10,289065)),
        |cum(cn, c_e6) AS (VALUES (1,1000000),(2,1630930),(3,2130930),
        |  (4,2561607),(5,2948460),(6,3304667),(7,3638000),(8,3953465),
        |  (9,4254495),(10,4543560)),
        |rel AS (
        |  SELECT query_id,
        |    min(CASE WHEN nlabel = qlabel THEN ranked.r END) AS first_rel,
        |    CAST(SUM(CASE WHEN nlabel = qlabel THEN d.d_e6 ELSE 0 END)
        |      AS BIGINT) AS dcg_e6
        |  FROM ranked JOIN disc d ON d.dr = ranked.r GROUP BY query_id),
        |nrel AS (
        |  SELECT p.query_id,
        |    least(count(*) FILTER (WHERE c.label = p.qlabel), 10) AS nr
        |  FROM p LEFT JOIN pool c ON c.vec_id <> p.query_id
        |  GROUP BY p.query_id, p.qlabel)
        |SELECT rel.query_id,
        |  CAST(coalesce(1000000 // rel.first_rel, 0) AS BIGINT)
        |    AS mrr_ppm,
        |  rel.dcg_e6,
        |  CAST(coalesce(c.c_e6, 0) AS BIGINT) AS idcg_e6,
        |  CAST(CASE WHEN c.c_e6 IS NULL THEN 0
        |       ELSE (rel.dcg_e6 * 1000000) // c.c_e6 END AS BIGINT)
        |    AS ndcg_ppm
        |FROM rel JOIN nrel n USING (query_id)
        |LEFT JOIN cum c ON c.cn = n.nr
        |ORDER BY query_id""".stripMargin,
    "d_epoch_shuffle" ->
      """WITH ep AS (SELECT unnest(generate_series(0, 2)) AS epoch),
        |d AS (
        |  SELECT ep.epoch, doc_id,
        |    CAST(('0x' || substr(md5('ep' || CAST(ep.epoch AS VARCHAR)
        |      || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      AS draw
        |  FROM documents CROSS JOIN ep),
        |s AS (
        |  SELECT epoch, doc_id, draw, draw % 8 AS shard,
        |    row_number() OVER (PARTITION BY epoch, draw % 8
        |      ORDER BY draw, doc_id) AS pos
        |  FROM d)
        |SELECT epoch, shard, pos, doc_id FROM s
        |ORDER BY epoch, shard, pos""".stripMargin,
    "d_profile" ->
      """SELECT 'doc_id' AS col_name, count(*) AS n_rows,
        |  count(*) - count(doc_id) AS n_null,
        |  count(DISTINCT doc_id) AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_s,
        |  CAST(max(doc_id) AS VARCHAR) AS max_s
        |FROM documents
        |UNION ALL
        |SELECT 'lang', count(*), count(*) - count(lang),
        |  count(DISTINCT lang), min(lang), max(lang) FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |  count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
        |  CAST(max(n_chars) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(*) - count(source),
        |  count(DISTINCT source), min(source), max(source)
        |FROM documents
        |ORDER BY col_name""".stripMargin)
}
