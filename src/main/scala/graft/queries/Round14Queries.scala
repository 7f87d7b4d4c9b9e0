package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.text.{Decontaminate, Dsir, MixPlanner, NgramLm, TextOps}

/** Round-14 additions — the data-SELECTION quartet a pre-training corpus
  * pipeline runs between cleaning and delivery:
  *
  *   - DSIR importance selection ([[Dsir]]) — keep the raw docs most
  *     target-like under a two-model token log-ratio;
  *   - data-constrained epoch allocation ([[MixPlanner]]) — per-source
  *     token budgets with a repeat cap (the "how many epochs of each
  *     source" plan);
  *   - CCNet-style perplexity buckets over the [[NgramLm]] score —
  *     head/middle/tail per language;
  *   - Bloom-prefiltered decontamination ([[Decontaminate.flagBloom]]) —
  *     the exact eval-overlap flag behind a map-only Bloom prefilter
  *     (Spark's `BloomFilterAggregate` as an explicit runtime filter);
  *     false positives die in the verify join, so the oracle is the
  *     EXACT overlap query.
  *
  * Exactness: every float touch is an established convention — round(ln·
  * 1e6) per token (the d_lm_score PSI ladder), round(sqrt·1e6) (the
  * d_mix_temperature convention) — integerized immediately, with all
  * downstream sums/divisions in BIGINTs and sign-corrected division
  * where a numerator can be negative.
  */
object Round14Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DSIR selection: target = the EN/src0 slice, raw = the full corpus;
    // keep the 50 docs with the highest summed token log-ratio. Ties
    // break by doc_id inside the distributed TakeOrdered.
    "d_dsir_select" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      Dsir.selectTop(docs,
          docs.filter(col("lang") === "en" && col("source") === "src0"),
          "doc_id", "text", m = 50)
        .orderBy(col("doc_id"))
    }),

    // Epoch allocation: α=0.5 temperature shares of a 50k-token budget,
    // capped at 2.00 epochs per source. At sf0.01 the cap binds for the
    // smallest sources and not the largest (both branches live under the
    // oracle); at sf0.1 the same budget is a sub-epoch skim.
    "d_mix_epochs" -> ((s, dir) => {
      MixPlanner.epochAllocation(load(s, dir, "documents"), "source",
          TextOps.tokenCountWs(col("text")).cast("long"),
          budget = 50000L, capX100 = 200L)
        .orderBy(col("source"))
    }),

    // Perplexity buckets: rank docs per language by LM score (higher avg
    // log-prob = lower perplexity = bucket 1), split into thirds by rank
    // arithmetic — `(r-1)·3 div n + 1` with the (avg DESC, doc_id) order
    // is deterministic on both engines, unlike quantile interpolation.
    // The per-lang window is the gate form; the 100 TB path derives cut
    // thresholds from a quantile sketch (d_quantile_sketch) and buckets
    // map-only.
    "d_ppl_buckets" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val scored = NgramLm.score(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      // per-lang sizes come from the raw table, not the scored one —
      // scoring runs once
      val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      scored
        .withColumn("r", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("avg_logp_e6").desc, col("doc_id").asc)))
        .join(broadcast(n), Seq("lang"))
        .withColumn("bucket", expr("((r - 1) * 3) div n + 1"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("avg_logp_e6")).as("min_avg_e6"),
          max(col("avg_logp_e6")).as("max_avg_e6"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // Content-defined chunking ([[graft.text.CdcChunk]]): Rabin-style
    // boundaries on the 16-bit md5 prefix of the 4-token gram ending at
    // each position (mod 8 → ~8-token chunks). Map-only; the md5
    // convention makes the DuckDB oracle replay boundaries exactly.
    "d_chunk_cdc" -> ((s, dir) => {
      graft.text.CdcChunk.chunks(load(s, dir, "documents"),
          "doc_id", "text", w = 4, modulus = 8)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Tokenizer fertility by language under the learned BPE merges
    // ([[graft.text.BpeTrain.fertility]]): tokens-per-word ×1000, the
    // standard tokenizer-evaluation readout. The oracle derives
    // per-word token counts from the trained w_k table of the shared
    // BPE merge chain (sym split length) — no per-doc replay needed.
    "d_bpe_fertility" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      graft.text.BpeTrain.fertility(docs, "lang", "text",
          graft.text.BpeTrain.merges(docs, "text", Round12Queries.BpeK))
        .orderBy(col("lang"))
    }),

    // Version-to-version chunk REUSE — the CDC property as gate data:
    // every 41st doc gets a token prepended ("the new crawl edited it");
    // content-defined boundaries re-sync, so all but the first chunk or
    // two keep their md5 and the release dedups/delta-encodes against
    // the previous chunk table. Multiset reuse counted by joining on
    // (doc_id, chunk_md5, occurrence-rank).
    "d_chunk_delta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = load(s, dir, "documents")
      val v2 = docs.withColumn("text",
        when(pmod(col("doc_id"), lit(41)) === 0,
          concat(lit("edit "), col("text"))).otherwise(col("text")))
      def occ(d: DataFrame) =
        graft.text.CdcChunk.chunks(d, "doc_id", "text", 4, 8)
          .filter(pmod(col("doc_id"), lit(41)) === 0)
          .withColumn("occ", row_number().over(
            Window.partitionBy(col("doc_id"), col("chunk_md5"))
              .orderBy(col("chunk_id"))))
      val a = occ(docs).localCheckpoint(true)
      val b = occ(v2).localCheckpoint(true)
      val reused = a.join(b, Seq("doc_id", "chunk_md5", "occ"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_reused"))
      a.groupBy(col("doc_id")).agg(count(lit(1)).as("n_v1"))
        .join(b.groupBy(col("doc_id")).agg(count(lit(1)).as("n_v2")),
          Seq("doc_id"))
        .join(reused, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_v1"), col("n_v2"),
          coalesce(col("n_reused"), lit(0L)).as("n_reused"))
        .orderBy(col("doc_id"))
    }),

    // Chunk-level dedup over the CDC table — the operator's use case:
    // chunks repeated across documents, found by ONE groupBy on
    // chunk_md5 (32-hex digests on the shuffle, never chunk text).
    "d_chunk_dedup" -> ((s, dir) => {
      graft.text.CdcChunk.chunks(load(s, dir, "documents"),
          "doc_id", "text", w = 4, modulus = 8)
        .groupBy(col("chunk_md5"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("n_toks")).as("min_toks"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("chunk_md5"))
    }),

    // Bloom-prefiltered decontamination: eval = docs 5-9 (a different
    // slice from d_decontaminate, which pins the plain-broadcast form).
    // numBits sized ~8 bits/gram; ANY sizing yields the same rows — the
    // oracle is the exact overlap.
    "d_decontaminate_bloom" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      Decontaminate.flagBloom(docs,
          docs.filter(col("doc_id") >= 5 && col("doc_id") < 10),
          "doc_id", "text", n = 8,
          estimatedItems = 100000L, numBits = 800000L)
        .orderBy(col("doc_id"))
    })
  )

  private val tokensSql = QueryShared.tokensSql

  /** The [[graft.text.CdcChunk.chunks]] pipeline as DuckDB CTEs over a
    * source relation with (doc_id, text) — ONE SQL definition shared by
    * every chunk oracle (the lmScoreCtes convention). `sfx` uniquifies
    * CTE names so two chains can coexist in one query; the final CTE is
    * `chunks$sfx(doc_id, chunk_id, start_tok, n_toks, chunk_md5)`. */
  private[queries] def cdcSql(src: String, sfx: String): String =
    s"""tt$sfx AS (SELECT doc_id, $tokensSql AS t FROM $src),
       |b$sfx AS (
       |  SELECT doc_id, t,
       |    CASE WHEN len(t) >= 5 THEN list_filter(range(4, len(t)),
       |      j -> CAST(('0x' || substr(md5(
       |             array_to_string(array_slice(t, j - 3, j), ' ')),
       |             1, 4)) AS BIGINT) % 8 = 0)
       |    ELSE [] END AS bp
       |  FROM tt$sfx),
       |c$sfx AS (SELECT doc_id, t, [0] || bp || [len(t)] AS cuts
       |          FROM b$sfx),
       |ch$sfx AS (SELECT doc_id, t, cuts,
       |  unnest(range(1, len(cuts))) AS i FROM c$sfx),
       |chunks$sfx AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |    CAST(cuts[i] + 1 AS BIGINT) AS start_tok,
       |    CAST(cuts[i+1] - cuts[i] AS BIGINT) AS n_toks,
       |    md5(array_to_string(array_slice(t, cuts[i] + 1, cuts[i+1]), ' '))
       |      AS chunk_md5
       |  FROM ch$sfx)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "d_dsir_select" ->
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, lang, source, unnest($tokensSql) AS w
         |  FROM documents),
         |cr AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cr FROM tk GROUP BY w),
         |ct AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS ct FROM tk
         |  WHERE lang = 'en' AND source = 'src0' GROUP BY w),
         |md AS MATERIALIZED (
         |  SELECT cr.w, cr.cr, COALESCE(ct.ct, 0) AS ct
         |  FROM cr LEFT JOIN ct USING (w)),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
         |  CAST(sum(ct) AS BIGINT) AS tt,
         |  CAST(count(*) AS BIGINT) AS v FROM md),
         |mw AS MATERIALIZED (
         |  SELECT w,
         |    CAST(round(ln(CAST(ct + 1 AS DOUBLE) / (tt + v)) * 1e6) AS BIGINT)
         |    - CAST(round(ln(CAST(cr + 1 AS DOUBLE) / (tr + v)) * 1e6) AS BIGINT)
         |    AS dsir_e6
         |  FROM md, tot),
         |sc AS (
         |  SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |    CAST(sum(dsir_e6) AS BIGINT) AS sum_dsir_e6
         |  FROM tk JOIN mw USING (w) GROUP BY tk.doc_id),
         |f AS (
         |  SELECT d.doc_id, COALESCE(n_toks, 0) AS n_toks,
         |    COALESCE(sum_dsir_e6, 0) AS sum_dsir_e6,
         |    CASE WHEN COALESCE(n_toks, 0) = 0 THEN 0
         |      WHEN sum_dsir_e6 >= 0 THEN sum_dsir_e6 // n_toks
         |      ELSE -((-sum_dsir_e6) // n_toks) END AS avg_dsir_e6
         |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)
         |SELECT * FROM (
         |  SELECT doc_id, n_toks, sum_dsir_e6, avg_dsir_e6 FROM f
         |  ORDER BY sum_dsir_e6 DESC, doc_id ASC LIMIT 50)
         |ORDER BY doc_id""".stripMargin,

    "d_mix_epochs" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |s AS (SELECT *,
        |  CAST(round(sqrt(CAST(toks AS DOUBLE)) * 1e6) AS BIGINT) AS s_s
        |  FROM t),
        |ss AS (SELECT CAST(sum(s_s) AS BIGINT) AS s_sum FROM s),
        |p AS (SELECT source, toks, (s_s * 1000000) // s_sum AS share_ppm
        |  FROM s, ss),
        |w AS (SELECT *, (50000 * share_ppm) // 1000000 AS want_toks FROM p),
        |a AS (SELECT *,
        |  LEAST(want_toks, (toks * 200) // 100) AS alloc_toks FROM w)
        |SELECT source, toks, share_ppm, want_toks, alloc_toks,
        |  CASE WHEN toks = 0 THEN 0
        |    ELSE (alloc_toks * 1000) // toks END AS epochs_x1000
        |FROM a ORDER BY source""".stripMargin,

    "d_ppl_buckets" ->
      s"""WITH ${QueryShared.lmScoreCtes},
         |wl AS (
         |  SELECT l.doc_id, d.lang, l.avg_logp_e6
         |  FROM lmsc l JOIN documents d USING (doc_id)),
         |rk AS (
         |  SELECT lang, avg_logp_e6,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY avg_logp_e6 DESC, doc_id ASC) AS r,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM wl)
         |SELECT lang, ((r - 1) * 3) // n + 1 AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  MIN(avg_logp_e6) AS min_avg_e6,
         |  MAX(avg_logp_e6) AS max_avg_e6
         |FROM rk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "d_chunk_cdc" ->
      s"""WITH ${cdcSql("documents", "")}
         |SELECT doc_id, chunk_id, start_tok, n_toks, chunk_md5
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    "d_chunk_delta" ->
      s"""WITH v2src AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 41 = 0 THEN 'edit ' || text ELSE text END
         |      AS text
         |  FROM documents),
         |${cdcSql("documents", "1")},
         |${cdcSql("v2src", "2")},
         |o1 AS (
         |  SELECT doc_id, chunk_md5, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id, chunk_md5 ORDER BY chunk_id) AS occ
         |  FROM chunks1 WHERE doc_id % 41 = 0),
         |o2 AS (
         |  SELECT doc_id, chunk_md5, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id, chunk_md5 ORDER BY chunk_id) AS occ
         |  FROM chunks2 WHERE doc_id % 41 = 0),
         |r AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_reused
         |  FROM o1 JOIN o2 USING (doc_id, chunk_md5, occ) GROUP BY 1),
         |n1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_v1
         |       FROM chunks1 WHERE doc_id % 41 = 0 GROUP BY 1),
         |n2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_v2
         |       FROM chunks2 WHERE doc_id % 41 = 0 GROUP BY 1)
         |SELECT doc_id, n_v1, n_v2, COALESCE(n_reused, 0) AS n_reused
         |FROM n1 JOIN n2 USING (doc_id) LEFT JOIN r USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "d_bpe_fertility" ->
      (Round12Queries.bpeChain(Round12Queries.BpeK) + s""",
         |lw AS (SELECT lang, unnest($tokensSql) AS word FROM documents),
         |lwf AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
         |        FROM lw GROUP BY 1, 2),
         |wc AS (SELECT word,
         |  CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_syms
         |  FROM w${Round12Queries.BpeK})
         |SELECT lang, CAST(sum(freq) AS BIGINT) AS n_words,
         |  CAST(sum(freq * n_syms) AS BIGINT) AS n_tokens,
         |  (CAST(sum(freq * n_syms) AS BIGINT) * 1000)
         |    // CAST(sum(freq) AS BIGINT) AS fert_x1000
         |FROM lwf JOIN wc USING (word)
         |GROUP BY lang ORDER BY lang""".stripMargin),

    "d_chunk_dedup" ->
      s"""WITH ${cdcSql("documents", "")}
         |SELECT chunk_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occ, MIN(n_toks) AS min_toks
         |FROM chunks GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY chunk_md5""".stripMargin,

    "d_decontaminate_bloom" ->
      QueryShared.decontaminateSql("doc_id >= 5 AND doc_id < 10")
  )
}
