package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.text.{Fingerprint, SftOps}

/** Round-16 additions — three new first-class pipeline surfaces:
  *
  *   - winnowing fingerprints ([[Fingerprint]]) — MOSS-style local
  *     similarity with the k+w−1 coverage guarantee, the
  *     position-aware complement to MinHash (whole-doc) and
  *     exact-substring (contiguous-run) dedup; with the full family:
  *     overlap pairs, match LOCATIONS, asymmetric containment,
  *     incremental index probe, and CC keep-one dedup (the first
  *     arbitrary-topology component graph under the gate);
  *   - SFT conversation preparation ([[SftOps]]) — loss-mask span
  *     emission over rendered chat sequences, whole-turn
  *     context-window truncation, and DPO preference-pair
  *     construction;
  *   - the mixing feedback edge ([[graft.text.MixPlanner
  *     .reweightByLoss]]) — linearized DoReMi over held-out backoff-LM
  *     loss.
  *
  * Exactness: winnowing is 60-bit packed-integer algebra over md5
  * prefixes (both engines agree on md5); SFT spans are integer window
  * cumsums over string lengths; truncation and reweighting are integer
  * suffix-sums/ratios; preference pairing rides the round(q·1e6)
  * integer quality order. Zero float surface anywhere — every oracle
  * replays the full semantics.
  */
object Round16Queries {

  /** Winnow parameters for the oracled queries: 12-char grams, window
    * of 5 → any shared normalized run of ≥ 16 chars is guaranteed a
    * shared fingerprint. On this corpus (~300-char docs, small shared
    * vocabulary) that yields ~77 fingerprints/doc and a planted-pair
    * overlap readout at minShared = 5.
    */
  private val WinK = 12
  private val WinW = 5
  private val WinShared = 5

  private val SftT = 12 // tokens per synthetic turn
  private val SftMax = 24L // truncation budget in tokens

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Winnowed fingerprint set, exploded: the full (pos, hash)
    // selection per document — the artifact overlap detection and
    // match-locating tools consume. Selection (window min + rightmost
    // tie-break) replays exactly in SQL via the packed-key trick.
    "d_winnow" -> ((s, dir) => {
      Fingerprint.winnow(load(s, dir, "documents"), "doc_id", "text",
          k = WinK, w = WinW)
        .orderBy(col("doc_id"), col("fp_pos"))
    }),

    // MOSS overlap: pairs sharing ≥ 5 fingerprint hashes. Uncapped
    // (maxBucket = 0) so the oracle states the full pair semantics;
    // the skew cap is the at-scale knob, spec'd separately.
    "d_winnow_overlap" -> ((s, dir) => {
      val fps = Fingerprint.winnow(load(s, dir, "documents"),
        "doc_id", "text", k = WinK, w = WinW)
      Fingerprint.overlapPairs(fps, "doc_id", minShared = WinShared)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Winnow-index FORGET receipt: delete every doc_id % 37 == 0 plus
    // one never-ingested id from the fingerprint index; the receipt
    // reports per requested id how many fingerprint rows were retained
    // and removed (0/false for the absent id — compliance wants the
    // negative confirmation too). forget == rebuild parity is
    // spec-pinned (FingerprintSpec); this oracles the receipt numbers.
    "d_winnow_forget" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val fps = Fingerprint.winnow(docs, "doc_id", "text",
          k = WinK, w = WinW)
        .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
      val dels = docs.filter(col("doc_id") % 37 === 0).select(col("doc_id"))
        .unionByName(s.range(999999L, 1000000L)
          .select(col("id").as("doc_id")))
      val (_, receipt) = Fingerprint.forgetFromIndex(fps, dels)
      receipt.orderBy(col("id"))
    }),

    // Loss-mask spans over the rendered chat sequence. masked_text is
    // extracted from the ACTUAL rendered string at the emitted span —
    // so the span arithmetic and the rendering are cross-checked
    // against each other in both engines, not just row-counted.
    "d_sft_mask" -> ((s, dir) => {
      val turns = SftOps.toTurns(load(s, dir, "documents"),
        "doc_id", "text", turnTokens = SftT)
      SftOps.flattenWithMask(turns, "doc_id")
        .orderBy(col("doc_id"), col("turn_idx"))
    }),

    // Whole-turn tail truncation receipt: per conversation, how many
    // turns fit the 24-token budget from the tail, their token total,
    // and the first kept index — the audit row a packing planner
    // consumes before rendering.
    "d_sft_truncate" -> ((s, dir) => {
      val turns = SftOps.toTurns(load(s, dir, "documents"),
        "doc_id", "text", turnTokens = SftT)
      SftOps.truncateReceipt(turns, "doc_id", maxTokens = SftMax)
        .orderBy(col("doc_id"))
    }),

    // Incremental winnow probe: the %10 id slice arrives as a "new
    // crawl batch" against a fingerprint index of the rest — emitted
    // pairs are exactly the full recompute restricted to batch-touching
    // pairs (corpus text never re-read; parity spec'd incl. redelivery
    // and the bucket cap).
    "d_winnow_incremental" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val index = Fingerprint.winnow(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
          k = WinK, w = WinW)
        .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
      Fingerprint.pairsAgainstIndex(
          docs.filter(col("doc_id") % 10 === 0), index,
          "doc_id", "text", WinK, WinW, minShared = WinShared)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Winnow-pair dedup: the MOSS application end-to-end — overlap
    // pairs (≥ 5 shared fingerprints) solved to connected components,
    // keep-lowest-id per cluster. The FIRST arbitrary-topology CC under
    // the gate (d_dedup_clusters' graph is chain-shaped by
    // construction); the DuckDB twin labels reachability with a
    // recursive CTE — min reachable id == the operator's min-label
    // convergence.
    "d_winnow_dedup" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val pairs = Fingerprint.overlapPairs(
          Fingerprint.winnow(docs, "doc_id", "text", WinK, WinW),
          "doc_id", minShared = WinShared)
        .select(col("id_a"), col("id_b"))
      graft.similarity.DedupClusters.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        .withColumn("kept", col("cluster") === col("id"))
        .orderBy(col("id"))
    }),

    // Per-cluster edge density over the winnow dedup graph: clique-like
    // clusters (density -> 1e6 ppm) are genuine mutual near-dups;
    // star-like ones (2e6/n ppm) hang off one promiscuous hub and
    // keep-one deletes their spokes on transitive evidence only — the
    // audit that separates the two before deletion.
    "d_cluster_density" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val pairs = Fingerprint.overlapPairs(
          Fingerprint.winnow(docs, "doc_id", "text", WinK, WinW),
          "doc_id", minShared = WinShared)
        .select(col("id_a"), col("id_b"))
      val labels = graft.similarity.DedupClusters.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs)
      graft.similarity.DedupClusters.clusterDensity(labels, pairs)
        .orderBy(col("cluster"))
    }),

    // MOSS match locations: for the strong pairs (≥ 5 shared hashes),
    // every shared hash with both documents' anchor positions — the
    // report view that justifies POSITIONAL fingerprints over MinHash.
    "d_winnow_spans" -> ((s, dir) => {
      Fingerprint.matchSpans(
          Fingerprint.winnow(load(s, dir, "documents"), "doc_id",
            "text", WinK, WinW),
          "doc_id", minShared = WinShared)
        .orderBy(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"))
    }),

    // Asymmetric near-containment: the smaller fingerprint set ≥ 50%
    // inside the other — quote/subset detection the symmetric shared
    // count can't rank. Uncapped, full SQL replay.
    "d_winnow_contain" -> ((s, dir) => {
      val fps = Fingerprint.winnow(load(s, dir, "documents"),
        "doc_id", "text", WinK, WinW)
      Fingerprint.containmentPairs(fps, "doc_id",
          minContainPpm = 500000L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // DPO preference pairs: prompt = first 8 tokens, chosen = own
    // completion, rejected = the next-lower-quality same-language
    // doc's completion (mismatched-continuation construction), margin
    // ≥ 0.002 quality (2000 e6). Integer quality order → engine-exact
    // pairing.
    "d_sft_pairs" -> ((s, dir) => {
      graft.text.SftOps.preferencePairs(load(s, dir, "documents"),
          "doc_id", "text", "lang", promptTokens = 8,
          marginE6 = 2000L)
        .orderBy(col("chosen_id"))
    }),

    // Loss-aware mixture reweighting (linearized DoReMi): the held-out
    // backoff-LM scores (d_lm_backoff's exact chain) aggregated per
    // SOURCE, excess micro-nats over the best domain, and the
    // integer-exact reweight share × (1000 + excess÷1000) normalized
    // to ppm — the feedback edge from LM scoring into the mix planner.
    "d_mix_reweight" -> ((s, dir) => {
      val d = load(s, dir, "documents")
      val (tri, bi0, uni, total) = graft.text.NgramLm.fitBackoff(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      val scored = graft.text.NgramLm.scoreBackoffWith(
        d, "doc_id", "text", tri, bi0.localCheckpoint(true), uni, total)
      graft.text.MixPlanner.reweightByLoss(
          scored.join(d.select(col("doc_id"), col("source")), "doc_id"),
          "source")
        .orderBy(col("source"))
    })
  )

  private val tokensSql = QueryShared.tokensSql

  private def winnowFpsSql: String =
    s"""WITH n AS (
       |  SELECT doc_id,
       |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, s,
       |    unnest(range(1, greatest(length(s) - $WinK + 1, 0) + 1)) AS pos
       |  FROM n),
       |h AS (
       |  SELECT doc_id, pos,
       |    CAST(('0x' || substr(md5(substr(s, CAST(pos AS INT), $WinK)),
       |      1, 10)) AS BIGINT) * 1048576 + (1048575 - pos) AS key,
       |    max(pos) OVER (PARTITION BY doc_id) AS maxpos
       |  FROM g),
       |wmin AS (
       |  -- frame BEFORE the full-window filter: the tail rows beyond
       |  -- the last window START still participate in earlier frames
       |  SELECT doc_id, pos, maxpos,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS sel
       |  FROM h),
       |fp AS (
       |  SELECT DISTINCT doc_id,
       |    CAST(1048575 - (sel % 1048576) AS BIGINT) AS fp_pos,
       |    CAST(sel // 1048576 AS BIGINT) AS fp_hash
       |  FROM wmin WHERE pos <= maxpos - ${WinW - 1})""".stripMargin

  private def sftTurnsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, $tokensSql AS tok FROM documents),
       |turns AS (
       |  SELECT doc_id,
       |    unnest(range(0, CAST(ceil(len(tok) / $SftT.0) AS BIGINT))) AS ti,
       |    tok
       |  FROM t),
       |pieces AS (
       |  SELECT doc_id, ti,
       |    array_to_string(
       |      list_slice(tok, ti * $SftT + 1, ti * $SftT + $SftT), ' ') AS txt,
       |    CASE WHEN ti % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    CASE WHEN ti % 2 = 0 THEN 8 ELSE 13 END AS mk
       |  FROM turns)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "d_winnow" -> (winnowFpsSql +
      "\nSELECT doc_id, fp_pos, fp_hash FROM fp ORDER BY doc_id, fp_pos"),

    "d_winnow_forget" -> (winnowFpsSql +
      s""",
       |dels AS (
       |  SELECT doc_id AS id FROM documents WHERE doc_id % 37 = 0
       |  UNION ALL SELECT 999999),
       |cnt AS (SELECT doc_id AS id, count(*) AS n FROM fp GROUP BY doc_id)
       |SELECT d.id, COALESCE(c.n, 0) AS n_fp_removed,
       |  c.n IS NOT NULL AS was_indexed
       |FROM dels d LEFT JOIN cnt c USING (id)
       |ORDER BY d.id""".stripMargin),

    "d_winnow_overlap" -> (winnowFpsSql +
      s"""
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM (SELECT DISTINCT doc_id, fp_hash FROM fp) a
       |JOIN (SELECT DISTINCT doc_id, fp_hash FROM fp) b
       |  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $WinShared
       |ORDER BY id_a, id_b""".stripMargin),

    "d_winnow_incremental" -> (winnowFpsSql +
      s"""
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM (SELECT DISTINCT doc_id, fp_hash FROM fp) a
       |JOIN (SELECT DISTINCT doc_id, fp_hash FROM fp) b
       |  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
       |GROUP BY 1, 2 HAVING count(*) >= $WinShared
       |ORDER BY id_a, id_b""".stripMargin),

    "d_sft_mask" -> (sftTurnsSql +
      s""",
       |seqs AS (
       |  SELECT doc_id,
       |    string_agg('<|' || role || '|>' || txt, '' ORDER BY ti) AS seq
       |  FROM pieces GROUP BY doc_id),
       |cum AS (
       |  SELECT doc_id, ti, txt, role, mk,
       |    COALESCE(SUM(mk + length(txt)) OVER (PARTITION BY doc_id
       |      ORDER BY ti ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING), 0) AS bef
       |  FROM pieces)
       |SELECT c.doc_id, CAST(c.ti AS BIGINT) AS turn_idx,
       |  CAST(c.bef + c.mk AS BIGINT) AS s,
       |  CAST(c.bef + c.mk + length(c.txt) AS BIGINT) AS e,
       |  substr(q.seq, CAST(c.bef + c.mk + 1 AS INT),
       |    CAST(length(c.txt) AS INT)) AS masked_text,
       |  CAST(length(q.seq) AS BIGINT) AS seq_len
       |FROM cum c JOIN seqs q ON c.doc_id = q.doc_id
       |WHERE c.role = 'assistant'
       |ORDER BY c.doc_id, c.ti""".stripMargin),

    "d_sft_truncate" -> (sftTurnsSql +
      s""",
       |rc AS (
       |  SELECT doc_id, ti,
       |    len(string_split(txt, ' ')) AS n_tok,
       |    SUM(len(string_split(txt, ' ')))
       |      OVER (PARTITION BY doc_id ORDER BY ti DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ts
       |  FROM pieces)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_turns,
       |  CAST(count(*) FILTER (ts <= $SftMax) AS BIGINT) AS n_kept,
       |  CAST(COALESCE(sum(n_tok) FILTER (ts <= $SftMax), 0) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(min(ti) FILTER (ts <= $SftMax) AS BIGINT) AS head_kept_idx
       |FROM rc GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // DuckDB 1.0 allows ONE recursive arm per CTE, so the undirected
    // step joins a symmetrized edge list; RECURSIVE scopes the whole
    // WITH list (hence the replaceFirst on the shared chain prefix)
    "d_winnow_dedup" -> (winnowFpsSql
      .replaceFirst("^WITH ", "WITH RECURSIVE ") +
      s""",
       |edges AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM (SELECT DISTINCT doc_id, fp_hash FROM fp) a
       |  JOIN (SELECT DISTINCT doc_id, fp_hash FROM fp) b
       |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $WinShared),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
       |        UNION ALL SELECT id_b, id_a FROM edges),
       |reach(id, l) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.l FROM reach r JOIN sym e ON e.src = r.id),
       |lbl AS (SELECT id, min(l) AS cluster FROM reach GROUP BY id)
       |SELECT id, cluster, cluster = id AS kept
       |FROM lbl ORDER BY id""".stripMargin),

    "d_cluster_density" -> (winnowFpsSql
      .replaceFirst("^WITH ", "WITH RECURSIVE ") +
      s""",
       |edges AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM (SELECT DISTINCT doc_id, fp_hash FROM fp) a
       |  JOIN (SELECT DISTINCT doc_id, fp_hash FROM fp) b
       |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $WinShared),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
       |        UNION ALL SELECT id_b, id_a FROM edges),
       |reach(id, l) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.l FROM reach r JOIN sym e ON e.src = r.id),
       |lbl AS (SELECT id, min(l) AS cluster FROM reach GROUP BY id),
       |nn AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |       FROM lbl GROUP BY 1 HAVING COUNT(*) > 1),
       |ec AS (SELECT l2.cluster, CAST(COUNT(*) AS BIGINT) AS n_edges
       |       FROM edges e JOIN lbl l2 ON l2.id = e.id_a GROUP BY 1)
       |SELECT nn.cluster, nn.n_nodes,
       |  CAST(COALESCE(ec.n_edges, 0) AS BIGINT) AS n_edges,
       |  (CAST(COALESCE(ec.n_edges, 0) AS BIGINT) * 2000000)
       |    // (nn.n_nodes * (nn.n_nodes - 1)) AS density_ppm
       |FROM nn LEFT JOIN ec ON ec.cluster = nn.cluster
       |ORDER BY nn.cluster""".stripMargin),

    "d_winnow_spans" -> (winnowFpsSql +
      s""",
       |dfp AS (SELECT DISTINCT doc_id, fp_hash FROM fp),
       |pr AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM dfp a JOIN dfp b
       |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $WinShared)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.fp_pos AS pos_a, b.fp_pos AS pos_b, a.fp_hash
       |FROM fp a JOIN fp b
       |  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |JOIN pr ON pr.id_a = a.doc_id AND pr.id_b = b.doc_id
       |ORDER BY id_a, id_b, pos_a, pos_b""".stripMargin),

    "d_winnow_contain" -> (winnowFpsSql +
      s""",
       |dfp AS (SELECT DISTINCT doc_id, fp_hash FROM fp),
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
       |        FROM dfp GROUP BY 1),
       |pr AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM dfp a JOIN dfp b
       |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT pr.id_a, pr.id_b, pr.n_shared,
       |  ca.n AS n_a, cb.n AS n_b,
       |  (pr.n_shared * 1000000) // least(ca.n, cb.n) AS contain_ppm
       |FROM pr JOIN cnt ca ON ca.doc_id = pr.id_a
       |  JOIN cnt cb ON cb.doc_id = pr.id_b
       |WHERE (pr.n_shared * 1000000) // least(ca.n, cb.n) >= 500000
       |ORDER BY id_a, id_b""".stripMargin),

    "d_sft_pairs" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, $tokensSql AS tok,
         |    CAST(ROUND(${QueryShared.qualitySql} * 1e6) AS BIGINT) AS q
         |  FROM documents),
         |e AS (SELECT * FROM t WHERE len(tok) > 8),
         |w AS (
         |  SELECT doc_id, lang, tok, q,
         |    lead(doc_id) OVER win AS r_id,
         |    lead(q) OVER win AS r_q,
         |    lead(tok) OVER win AS r_tok
         |  FROM e WINDOW win AS (PARTITION BY lang
         |    ORDER BY q DESC, doc_id))
         |SELECT doc_id AS chosen_id, r_id AS rejected_id,
         |  array_to_string(list_slice(tok, 1, 8), ' ') AS prompt,
         |  array_to_string(list_slice(tok, 9, len(tok)), ' ')
         |    AS chosen_text,
         |  array_to_string(list_slice(r_tok, 9, len(r_tok)), ' ')
         |    AS rejected_text,
         |  q AS q_chosen_e6, r_q AS q_rejected_e6,
         |  q - r_q AS gap_e6
         |FROM w WHERE r_id IS NOT NULL AND q - r_q >= 2000
         |ORDER BY chosen_id""".stripMargin,

    "d_mix_reweight" -> (Round15Queries.lmBackoffChainSql +
      s""",
       |ds AS (
       |  SELECT d.source,
       |    COALESCE(a.n_trans, 0) AS n_trans,
       |    COALESCE(a.sum_logp_e6, 0) AS sum_logp_e6
       |  FROM documents d LEFT JOIN ag a USING (doc_id)),
       |per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_trans) AS BIGINT) AS n_trans,
       |    CAST(sum(sum_logp_e6) AS BIGINT) AS s_logp
       |  FROM ds GROUP BY 1),
       |pa AS (
       |  SELECT *, CASE WHEN n_trans = 0 THEN 0
       |    ELSE (-s_logp) // n_trans END AS avg_nll_e6
       |  FROM per),
       |tots AS (
       |  SELECT min(avg_nll_e6) FILTER (n_trans > 0) AS base_nll,
       |    CAST(sum(n_trans) AS BIGINT) AS trans_sum
       |  FROM pa),
       |rw AS (
       |  SELECT pa.source, pa.n_docs, pa.n_trans, pa.avg_nll_e6,
       |    CASE WHEN pa.n_trans = 0 THEN 0
       |      ELSE pa.avg_nll_e6 - tots.base_nll END AS excess_e6,
       |    CASE WHEN tots.trans_sum = 0 THEN 0
       |      ELSE (pa.n_trans * 1000000) // tots.trans_sum END AS share_ppm
       |  FROM pa, tots),
       |raw AS (
       |  SELECT *, CASE WHEN n_trans = 0 THEN 0
       |    ELSE share_ppm * (1000 + excess_e6 // 1000) END AS r
       |  FROM rw),
       |rs AS (SELECT CAST(sum(r) AS BIGINT) AS raw_sum FROM raw)
       |SELECT raw.source, raw.n_docs, raw.n_trans, raw.avg_nll_e6,
       |  raw.excess_e6, raw.share_ppm,
       |  CASE WHEN rs.raw_sum = 0 THEN 0
       |    ELSE CAST((raw.r * 1000000) // rs.raw_sum AS BIGINT)
       |  END AS new_weight_ppm
       |FROM raw, rs ORDER BY raw.source""".stripMargin)
  )
}
