package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.operators.Drift
import graft.text.BpeTrain

/** Round-12 additions — corpus release hygiene:
  *
  *   - distribution DRIFT between snapshots (PSI per feature, integer
  *     1e-9 units so the float sum is engine-exact) — the check a corpus
  *     release runs before training on it; [[graft.streaming
  *     .StreamingDrift]] evaluates the identical contract per ingest
  *     micro-batch
  *   - cluster-aware train/eval split: the leakage guard
  *     `d_split_train_eval` can't give — near-duplicate documents must
  *     land in the SAME split (an eval doc whose near-twin sits in train
  *     leaks), so the split key is the dedup CLUSTER label, not the doc
  *   - BPE merge training + tokenization ([[graft.text.BpeTrain]]): the
  *     tokenizer-training shape, oracled by UNROLLING the k merge rounds
  *     as generated chained CTEs (the PageRank oracle technique applied
  *     to an argmax-per-round loop)
  *   - corpus-trained bigram-LM document scoring ([[graft.text
  *     .NgramLm]]): the model-based quality gate (CCNet shape), integer-
  *     exact except the per-transition round(ln·1e6)
  */
object Round12Queries {

  /** Merge rounds for the BPE queries — enough for multi-char merges to
    * emerge (incl. marker merges) while the generated oracle stays
    * readable. */
  private[queries] val BpeK = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PSI drift between the even-doc_id and odd-doc_id halves of the
    // corpus (deterministic stand-ins for "previous release / candidate
    // release"). Two features show the one-scan-per-side multi-feature
    // extraction: categorical lang and a derived length band.
    "d_drift_psi" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val ref = docs.filter(col("doc_id") % 2 === 0)
      val cur = docs.filter(col("doc_id") % 2 =!= 0)
      Drift.psi(ref, cur, Seq(
          "lang" -> col("lang"),
          "len_band" -> expr("cast(n_chars as bigint) div 100")))
        .orderBy(col("feature"), col("bucket"))
    }),

    // Cluster-aware split: assign train/eval by md5 draw on the dedup
    // cluster label (QueryShared.chainClusterLabels — the same
    // connected-components labels d_dedup_clusters oracles), so every
    // member of a near-dup cluster lands in one split. cluster_intact
    // states that invariant as data: min==max split within the cluster.
    "d_split_by_cluster" -> ((s, dir) => {
      val cl = QueryShared.chainClusterLabels(s, dir)
        .select(col("id").as("doc_id"), col("cluster"))
      val sp = cl.withColumn("split",
        when(expr("cast(conv(substring(md5(cast(concat('sp:', " +
            "cast(cluster as string)) as binary)), 1, 15), 16, 10) " +
            "as bigint) % 10") < 2,
          lit("eval")).otherwise(lit("train")))
      val byCluster = Window.partitionBy(col("cluster"))
      sp.withColumn("cluster_intact",
          min(col("split")).over(byCluster) ===
            max(col("split")).over(byCluster))
        .orderBy(col("doc_id"))
    }),

    // Learn the first BpeK merges from the corpus. The corpus-sized work
    // is one distributed word count; the merge loop runs on the
    // vocabulary-sized frequency table (see BpeTrain's scale notes).
    "d_bpe_train" -> ((s, dir) =>
      BpeTrain.merges(load(s, dir, "documents"), "text", BpeK)
        .orderBy(col("rank"))),

    // Tokenize the corpus with the learned merges and emit the token
    // histogram — the "what did the tokenizer learn" readout.
    "d_bpe_tokens" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      BpeTrain.tokenize(docs, "text", BpeTrain.merges(docs, "text", BpeK))
        .orderBy(col("token"))
    }),

    // Score every doc under a corpus-trained Laplace bigram LM — the
    // model-based quality gate (CCNet shape) with integer-exact sums;
    // only the per-transition round(ln·1e6) touches floats.
    "d_lm_score" -> ((s, dir) =>
      graft.text.NgramLm.score(load(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Temperature-scaled source mixing (α = 0.5): keep-rate ∝ 1/√T_s
    // normalized so the smallest source keeps everything — the standard
    // knob BETWEEN d_mix_sources' full flattening and no resampling.
    // Integer-exact: the only float step is sqrt (correctly rounded IEEE
    // in both engines), immediately integerized to s_x =
    // round(√T_x · 1e6); the per-doc gate v·s_s < s_min·65536 and the
    // reported rate are pure integer arithmetic on those.
    // Delivery-shard manifest: deterministic md5 shard assignment (the
    // engine-portable convention — no RNG, no engine hash) with per-
    // shard doc and token counts; operators.Export.jsonlShards writes
    // the matching artifact.
    "d_export_shards" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
        .select(col("doc_id"),
          graft.text.TextOps.tokenCountWs(col("text")).cast("long")
            .as("tok"))
      docs.withColumn("shard",
          graft.operators.Export.shardOf(col("doc_id"), 8))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
        .orderBy(col("shard"))
    }),

    // Deletion propagation with a verification MANIFEST: remove the
    // (deterministic stand-in) deletion list from the corpus and every
    // derived artifact — chunk table, gram index, embedding set — and
    // emit the per-artifact receipt as data. Grams are STRINGS here (not
    // 64-bit hashes) so the oracle states exact set semantics.
    "d_forget" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val dels = docs.filter(col("doc_id") % 37 === 0).select("doc_id")
      val t = graft.text.TextOps.tokens(col("text"))
      val toks = docs.select(col("doc_id"), t.as("t"))
      val chunks = toks.select(col("doc_id"),
        explode(sequence(lit(0), greatest(size(col("t")) - 1, lit(0)),
          lit(40))).as("start"))
      val grams = toks.select(col("doc_id"),
        explode(when(size(col("t")) >= 3, array_distinct(
          transform(sequence(lit(1), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1),
              element_at(col("t"), i + 2)))))
          .otherwise(array().cast("array<string>"))).as("g"))
      graft.operators.Forget.manifest(dels, Seq(
          ("documents", docs, "doc_id"),
          ("chunks", chunks, "doc_id"),
          ("gram_index", grams, "doc_id"),
          ("embeddings", load(s, dir, "embeddings"), "vec_id")))
        .orderBy(col("artifact"))
    }),

    "d_mix_temperature" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.text.TextOps.tokenCountWs(col("text")).cast("long")
            .as("tok"))
      val totals = docs.groupBy(col("source"))
        .agg(sum(col("tok")).as("t_s"))
        .withColumn("s_s",
          round(sqrt(col("t_s").cast("double")) * 1e6).cast("long"))
      val smin = totals.agg(min(col("s_s")).as("s_min"))
      val v = conv(substring(md5(
        concat(lit("temp:"), col("doc_id").cast("string")).cast("binary")),
        1, 4), 16, 10).cast("long")
      docs.join(broadcast(totals), "source")
        .crossJoin(broadcast(smin))
        .filter(v * col("s_s") < col("s_min") * 65536L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("tok_kept"),
          max(expr("(s_min * 1000000) div s_s")).as("r_ppm"))
        .orderBy(col("source"))
    }))

  private val tokensSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** The BPE merge chain as DuckDB CTEs, generated for [[BpeK]] rounds:
    * w0 is the word-frequency table with space-delimited symbol strings;
    * each round r derives pair counts (p_r), the argmax merge (b_r, ties
    * by pair string — the same (cnt DESC, pair ASC) the Spark side
    * collects), and the post-merge table (w_{r+1}) via the identical
    * doubled-delimiter left-to-right replace. Both engines state the
    * SAME arithmetic, so the compare is exact. */
  private[queries] def bpeChain(k: Int): String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so each
    // round's reference to the previous round would RE-EVALUATE the whole
    // chain (per row, via the argmax reference) — measured 511s for k=8
    // at sf0.01 vs 0.5s materialized. The argmax joins in as a 1-row
    // LEFT JOIN ON TRUE rather than scalar subqueries for the same
    // reason; LEFT (not cross) so a round past the corpus's merge
    // capacity (b_r empty) carries w_r through unchanged — mirroring the
    // Spark side's early stop — instead of collapsing w_{r+1} to empty.
    val sb = new StringBuilder
    sb ++= s"""WITH w0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
       |    regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym
       |  FROM (SELECT unnest($tokensSql) AS word FROM documents)
       |  GROUP BY word)""".stripMargin
    for (r <- 0 until k) {
      sb ++= s""",
       |p$r AS MATERIALIZED (
       |  SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(list_transform(
       |        range(1, len(string_split(sym, ' '))),
       |        i -> string_split(sym, ' ')[i] || ' ' ||
       |             string_split(sym, ' ')[i+1])) AS p
       |    FROM w$r) GROUP BY p),
       |b$r AS MATERIALIZED (
       |  SELECT CAST(${r + 1} AS BIGINT) AS rank, p AS pair,
       |    replace(p, ' ', '') AS merged, cnt AS freq
       |  FROM p$r ORDER BY cnt DESC, p ASC LIMIT 1),
       |w${r + 1} AS MATERIALIZED (
       |  SELECT w.word, w.freq,
       |    CASE WHEN b.pair IS NULL THEN w.sym
       |      ELSE trim(regexp_replace(replace(
       |        ' ' || replace(w.sym, ' ', '  ') || ' ',
       |        ' ' || replace(b.pair, ' ', '  ') || ' ',
       |        ' ' || b.merged || ' '),
       |        ' +', ' ', 'g')) END AS sym
       |  FROM w$r w LEFT JOIN b$r b ON TRUE)""".stripMargin
    }
    sb.toString
  }

  def oracleSql: Map[String, String] = Map(

    // Chain shared with d_ppl_buckets (QueryShared.lmScoreCtes) — one
    // SQL definition of the LM score per engine, like qualitySql.
    "d_lm_score" ->
      s"""WITH ${QueryShared.lmScoreCtes}
         |SELECT doc_id, n_trans, sum_logp_e6, avg_logp_e6
         |FROM lmsc ORDER BY doc_id""".stripMargin,

    "d_export_shards" ->
      """SELECT CAST(('0x' || substr(md5('shard:' ||
        |    CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |    AS n_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "d_forget" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |ch AS (SELECT doc_id,
         |  unnest(range(0, greatest(len(t) - 1, 0) + 1, 40)) AS start
         |  FROM t),
         |gr AS (SELECT doc_id, unnest(list_distinct(
         |  CASE WHEN len(t) < 3 THEN []
         |    ELSE list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS g
         |  FROM t),
         |m AS (
         |  SELECT 'documents' AS artifact, count(*) AS n_before,
         |    count(*) FILTER (doc_id % 37 = 0) AS n_removed FROM documents
         |  UNION ALL SELECT 'chunks', count(*),
         |    count(*) FILTER (doc_id % 37 = 0) FROM ch
         |  UNION ALL SELECT 'gram_index', count(*),
         |    count(*) FILTER (doc_id % 37 = 0) FROM gr
         |  UNION ALL SELECT 'embeddings', count(*),
         |    count(*) FILTER (vec_id IN (
         |      SELECT doc_id FROM documents WHERE doc_id % 37 = 0))
         |    FROM embeddings)
         |SELECT artifact, CAST(n_before AS BIGINT) AS n_before,
         |  CAST(n_removed AS BIGINT) AS n_removed,
         |  CAST(n_before - n_removed AS BIGINT) AS n_after
         |FROM m ORDER BY artifact""".stripMargin,

    "d_mix_temperature" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
        |  FROM documents),
        |t AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS t_s
        |      FROM d GROUP BY 1),
        |w AS (SELECT source, t_s,
        |        CAST(round(sqrt(CAST(t_s AS DOUBLE)) * 1e6) AS BIGINT)
        |          AS s_s FROM t),
        |m AS (SELECT MIN(s_s) AS s_min FROM w),
        |k AS (
        |  SELECT d.source, d.tok, w.s_s, m.s_min,
        |    CAST(('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)),
        |      1, 4)) AS BIGINT) AS v
        |  FROM d JOIN w USING (source), m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(tok) AS BIGINT) AS tok_kept,
        |  CAST(max((s_min * 1000000) // s_s) AS BIGINT) AS r_ppm
        |FROM k WHERE v * s_s < s_min * 65536
        |GROUP BY source ORDER BY source""".stripMargin,

    "d_bpe_train" -> (bpeChain(BpeK) + "\n" +
      (0 until BpeK).map(r => s"SELECT * FROM b$r")
        .mkString(" UNION ALL ") + " ORDER BY rank"),

    "d_bpe_tokens" -> (bpeChain(BpeK) +
      s"""
       |SELECT token, CAST(sum(freq) AS BIGINT) AS n
       |FROM (SELECT freq, unnest(string_split(sym, ' ')) AS token
       |      FROM w$BpeK)
       |GROUP BY token ORDER BY token""".stripMargin),

    "d_drift_psi" ->
      """WITH f AS (
        |  SELECT doc_id % 2 = 0 AS is_ref, 'lang' AS feature,
        |    lang AS bucket FROM documents
        |  UNION ALL
        |  SELECT doc_id % 2 = 0, 'len_band',
        |    CAST(CAST(n_chars AS BIGINT) // 100 AS VARCHAR)
        |  FROM documents),
        |b AS (SELECT feature, bucket,
        |        count(*) FILTER (is_ref) AS n_ref,
        |        count(*) FILTER (NOT is_ref) AS n_cur
        |      FROM f GROUP BY 1, 2),
        |t AS (
        |  SELECT feature, bucket, n_ref, n_cur,
        |    (CAST(n_ref + 1 AS DOUBLE) /
        |      (SUM(n_ref) OVER (PARTITION BY feature)
        |        + COUNT(*) OVER (PARTITION BY feature))) AS p,
        |    (CAST(n_cur + 1 AS DOUBLE) /
        |      (SUM(n_cur) OVER (PARTITION BY feature)
        |        + COUNT(*) OVER (PARTITION BY feature))) AS q
        |  FROM b)
        |SELECT feature, bucket, n_ref, n_cur,
        |  CAST(round((p - q) * ln(p / q) * 1e9) AS BIGINT) AS psi_e9,
        |  CAST(SUM(CAST(round((p - q) * ln(p / q) * 1e9) AS BIGINT))
        |    OVER (PARTITION BY feature) AS BIGINT) AS psi_total_e9
        |FROM t ORDER BY feature, bucket""".stripMargin,
    "d_split_by_cluster" ->
      s"""WITH g AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN []
         |    ELSE list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS grams
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents)),
         |j AS (
         |  SELECT a.doc_id,
         |    CASE WHEN len(list_distinct(a.grams || b.grams)) > 0
         |      THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |           / len(list_distinct(a.grams || b.grams))
         |      ELSE 0 END AS jac
         |  FROM g a JOIN g b ON b.doc_id = a.doc_id - 1),
         |flags AS (
         |  SELECT g.doc_id, COALESCE(j.jac >= 0.005, FALSE) AS linked_prev
         |  FROM g LEFT JOIN j ON g.doc_id = j.doc_id),
         |cl AS (
         |  SELECT doc_id,
         |    MAX(CASE WHEN NOT linked_prev THEN doc_id END)
         |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cluster
         |  FROM flags),
         |sp AS (
         |  SELECT doc_id, cluster,
         |    CASE WHEN CAST(('0x' ||
         |        substr(md5('sp:' || CAST(cluster AS VARCHAR)), 1, 15))
         |        AS BIGINT) % 10 < 2 THEN 'eval' ELSE 'train' END AS split
         |  FROM cl)
         |SELECT doc_id, cluster, split,
         |  (MIN(split) OVER (PARTITION BY cluster))
         |    = (MAX(split) OVER (PARTITION BY cluster)) AS cluster_intact
         |FROM sp ORDER BY doc_id""".stripMargin)
}
