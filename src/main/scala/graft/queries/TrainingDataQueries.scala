package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.RollingHash.rolling_hash
import graft.similarity.Similarity
import graft.text.TextOps

/** Training-data pipeline operators over the `documents` and `embeddings`
  * tables: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), similarity search (brute + LSH), text analysis
  * (lang-id, quality, token counts, fingerprint).
  *
  * Oracle coverage: everything whose definition is portable to DuckDB SQL
  * (per-row double arithmetic, sequential-fold dot products, md5, regex
  * counting, the mod-prime rolling hash). The xxhash64-seeded operators
  * (MinHash, SimHash, hyperplane LSH) have no SQL twin → rows-only checks
  * plus ScalaTest specs with planted duplicates.
  */
object TrainingDataQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- text analysis ---------------------------------------------------
    "d_token_count" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCountWs(col("text")).as("ws_tokens"),
          TextOps.tokenCountBpe(col("text")).as("bpe_tokens"),
          length(col("text")).as("n_chars_m"))
        .orderBy(col("doc_id"))
    }),

    "d_quality_score" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "d_lang_id" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_guess"))
        .orderBy(col("doc_id"))
    }),

    "d_fingerprint" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"), rolling_hash(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // PII scrubbing: redaction applied per row + detection counts; the
    // synthetic corpus has no PII, so the round-trip law (scrubbed == when
    // counts are 0) is exactly what the oracle certifies.
    "d_pii_scrub" -> ((s, dir) => {
      val (emails, phones) = TextOps.piiCounts(col("text"))
      load(s, dir, "documents")
        .select(col("doc_id"),
          emails.as("n_emails"), phones.as("n_phones"),
          length(TextOps.piiScrub(col("text"))).as("scrubbed_len"))
        .orderBy(col("doc_id"))
    }),

    // normalization as a dedup key: normalized-text hash groups.
    "d_normalize" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"),
          length(TextOps.normalize(col("text"))).as("norm_len"),
          md5(TextOps.normalize(col("text")).cast("binary")).as("norm_hash"))
        .orderBy(col("doc_id"))
    }),

    // corpus stats per (lang, source): the bookkeeping pass every corpus
    // build runs — counts, char volume, mean doc length.
    "d_corpus_stats" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          round(sum(col("n_chars")) / count(lit(1)), 4).as("mean_chars"))
        .orderBy(col("lang"), col("source"))
    }),

    // --- dedup -----------------------------------------------------------
    // exact: hash-groupBy; emit group representative + multiplicity
    "d_dedup_exact" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_doc_id"))
    }),

    // d_dedup_minhash / d_dedup_simhash (xxhash64-seeded full outputs)
    // RETIRED in round 10: xxhash64 has no DuckDB twin, so they could
    // only ever be rows-only checks. Their output contracts live on,
    // fully oracled, as d_dedup_minhash_md5 / d_dedup_simhash_md5
    // (Round18Queries + PortableSim); the xxhash64 production operators
    // stay covered by the planted recall oracles (Round7Queries) and
    // SimilaritySpec.

    // n-gram Jaccard between consecutive doc ids — linear pair set, exact
    // set arithmetic, portable to DuckDB.
    "d_ngram_jaccard" -> ((s, dir) => {
      // 64-bit gram ids + one materialization feeding both join sides
      // (same staging convention as QueryShared.chainClusterLabels); the
      // rounded jaccard equals the string-gram value up to 2^-64 id
      // collisions
      val d = load(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(TextOps.ngramHashes(TextOps.tokens(col("text")), 3))
            .as("g"))
        .localCheckpoint(true)
      val a = d.select(col("doc_id").as("id_a"), col("g").as("g_a"))
      val b = d.select((col("doc_id") - 1).as("id_a"), col("g").as("g_b"))
      a.join(b, Seq("id_a"))
        .select(col("id_a").as("doc_id"),
          round(Similarity.jaccard(col("g_a"), col("g_b")), 6).as("jaccard_next"))
        .orderBy(col("doc_id"))
    }),

    // HLL sketch distinct counts (DataSketches): mergeable across
    // partitions — the sketch path for cardinality at 100TB. The estimate
    // VALUE is engine-specific, but its accuracy contract is checkable:
    // |est − exact| ≤ 5% of exact (3× the lgK=12 RSE of 1.04/√2¹²≈1.6%) —
    // emitted as a boolean DuckDB states as literal TRUE, next to the
    // exact counts it can verify directly. SketchSpec additionally bounds
    // the error at the operator level.
    "d_sketch_distinct" -> ((s, dir) => {
      // spread the compute-bound sketch updates (~1µs/token) across cores:
      // a single-row-group parquet file scans as ONE partition, which would
      // serialize the whole partial agg. At cluster scale the input arrives
      // in many splits and this tiny pre-shuffle is dwarfed by the agg win.
      load(s, dir, "documents")
        .repartition(col("doc_id"))
        .select(explode(TextOps.tokens(col("text"))).as("term"),
          col("lang"))
        .groupBy(col("lang"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(term))").as("approx"),
          count(lit(1)).as("n_tokens"),
          countDistinct(col("term")).as("n_distinct"))
        .select(col("lang"), col("n_tokens"), col("n_distinct"),
          (abs(col("approx") - col("n_distinct")) <=
            col("n_distinct").cast("double") * lit(0.05)).as("est_ok"))
        .orderBy(col("lang"))
    }),

    // TF-IDF: top-3 terms per document (first 50 docs to bound output).
    "d_tfidf" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      graft.text.TfIdf.topTerms(docs.filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text")), "doc_id", "text", 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"),
          round(col("tf_idf"), 6).as("tf_idf"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Corpus token frequency: top-20 tokens with counts and ranks.
    // TakeOrderedAndProject (orderBy+limit = per-partition top-20 then a
    // 20-row merge) instead of ranking the full vocabulary through a global
    // single-partition window — the shape that survives a 100TB vocabulary.
    "d_token_freq" -> ((s, dir) => {
      val top = load(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(20)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(
          graft.functions.WindowKeys.constantPartitionKey(col("term")))
        .orderBy(col("n").desc, col("term"))
      top.withColumn("rank", row_number().over(w))
        .select("rank", "term", "n")
        .orderBy("rank")
    }),

    // Deterministic stratified sampling: ~30% per language by md5 threshold
    // (hash sampling is reproducible across engines — md5 is md5).
    "d_sample_stratified" -> ((s, dir) => {
      load(s, dir, "documents")
        .filter(substring(md5(concat(lit("salt1"), col("doc_id").cast("string"))
          .cast("binary")), 1, 2) < "4d") // 0x4d/0x100 ≈ 30%
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"))
    }),

    // Length-band filter: keep docs between the 10th and 90th length
    // percentile of their language (percent_rank window).
    "d_length_band" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      load(s, dir, "documents")
        .withColumn("pr", percent_rank().over(w))
        .filter(col("pr") >= 0.1 && col("pr") <= 0.9)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("n_chars")).as("min_len"), max(col("n_chars")).as("max_len"))
        .orderBy(col("lang"))
    }),

    // Corpus profiling histogram: fixed-width doc-length buckets per
    // language — pure per-row arithmetic + one shuffle-on-(lang,bucket).
    "d_histogram" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("lang"),
          floor(col("n_chars") / 100.0).cast("long").as("bucket"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "bucket")
    }),

    // Benchmark decontamination: flag corpus docs sharing any 8-gram with
    // an eval set (docs 0-4 stand in for it). The eval-set fingerprint is
    // tiny and BROADCAST — the corpus explodes its shingles map-side, semi
    // joins without shuffling, and re-aggregates per doc. The standard
    // pre-training decontamination shape at any corpus size.
    "d_decontaminate" -> ((s, dir) => {
      // the plain-broadcast form of graft.text.Decontaminate (64-bit
      // gram ids both sides); d_decontaminate_bloom pins the
      // bloom-prefiltered plan of the SAME operator on docs 5-9
      val docs = load(s, dir, "documents")
      graft.text.Decontaminate.flag(docs, docs.filter(col("doc_id") < 5),
          "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // Transitive dedup clustering: connected components over a similarity
    // edge set (iterative min-label propagation, one shuffle per round —
    // similarity.DedupClusters). Edges here are the DETERMINISTIC
    // consecutive-doc 3-gram Jaccard pairs above a loose threshold (0.005 — the synthetic corpus has no true near-dups), so the
    // graph is a union of chains and the DuckDB oracle can solve it with
    // gaps-and-islands instead of recursion.
    "d_dedup_clusters" -> ((s, dir) => {
      QueryShared.chainClusterLabels(s, dir)
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy(col("doc_id"))
    }),

    // Incremental corpus upsert: re-ingest docs with doc_id % 10 == 0 at a
    // new "version"; merged corpus keeps update rows on collision.
    "d_upsert" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val updates = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("n_chars", col("n_chars") + 1000000)
      graft.operators.Merge.upsert(docs, updates, Seq("doc_id"))
        .groupBy((col("doc_id") % 7).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("bucket"))
    }),

    // --- embedding similarity -------------------------------------------
    "e_ann_brute" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      Similarity.bruteTopK(emb.filter(col("vec_id") < 5), emb, 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // FULLY oracled since round 7: stride centroids are SQL-expressible,
    // so DuckDB replays the whole pipeline — argmin cell assignment,
    // nprobe-cell query probing, within-cell cosine ranking — with the
    // bit-identical-double argument of e_dedup_semantic (which borrowed
    // the technique from this query's planted twin).
    "e_ann_ivf" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 50), emb, k = 3,
        centroidStride = 50, nprobe = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // e_ann_lsh (xxhash64-seeded hyperplanes) RETIRED in round 10 —
    // replaced by the fully-oracled e_ann_lsh_md5 (Round18Queries);
    // production lshTopK stays covered by e_ann_lsh_planted + specs.

    // e_ann_pq RETIRED in round 10 — the ADC sum is now an ordered
    // per-subspace fold, which made the whole PQ pipeline (stride
    // codebooks, encode argmin, ADC cutoff, exact re-rank)
    // SQL-replayable; the identical query lives on as e_ann_pq_full
    // (Round18Queries) WITH a full DuckDB oracle. Codebook-size note
    // preserved there: stride derives from the corpus count to pin ~256
    // codes per subspace at any SF (corpus-proportional codebooks turn
    // encode into O(n²)).

    // Per-label centroid statistics: position-wise mean of embeddings —
    // the array-aggregation shape behind k-means/IVF training (posexplode →
    // partial-agg → reassemble). First 8 dims to bound output.
    "e_label_centroid" -> ((s, dir) => {
      load(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .filter(col("pos") < 8)
        .groupBy(col("label"), col("pos"))
        .agg(round(sum(col("x").cast("double") * 1000000)).cast("long").as("sum_e6"),
          count(lit(1)).as("n"))
        .orderBy(col("label"), col("pos"))
    }),

    // embedding near-dup: per-vector max off-diagonal cosine within its
    // label group (labels bound the pair sets like LSH buckets would).
    "e_dedup_cosine" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val l = emb.select(col("label"), col("vec_id").as("id_a"),
        col("embedding").as("e_a"))
      val r = emb.select(col("label"), col("vec_id").as("id_b"),
        col("embedding").as("e_b"))
      l.join(r, Seq("label")).filter(col("id_a") =!= col("id_b"))
        .withColumn("cos", Similarity.cosine(col("e_a"), col("e_b")))
        .groupBy(col("id_a"))
        .agg(round(max(col("cos")), 6).as("max_cos"),
          count(lit(1)).as("n_same_label"))
        .select(col("id_a").as("vec_id"), col("max_cos"), col("n_same_label"),
          (col("max_cos") > 0.99).as("is_near_dup"))
        .orderBy(col("vec_id"))
    })
  )

  private val tokensSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  val oracleSql: Map[String, String] = Map(
    // inequality oracle: exact counts checked directly; the HLL estimate
    // enters only through the est_ok bound, which must be TRUE
    "d_sketch_distinct" ->
      s"""SELECT lang, COUNT(*) AS n_tokens,
         |  COUNT(DISTINCT term) AS n_distinct, TRUE AS est_ok
         |FROM (SELECT lang, unnest($tokensSql) AS term FROM documents)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_token_count" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\S+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens,
        |  length(text) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_quality_score" ->
      s"""SELECT doc_id, ${QueryShared.qualitySql} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "d_lang_id" ->
      s"""SELECT doc_id,
         |  CASE GREATEST(s_en, s_de, s_es, s_fr, s_zh)
         |    WHEN 0 THEN (CASE WHEN s_en > 0 THEN 'en' ELSE 'und' END)
         |    WHEN s_en THEN 'en'
         |    WHEN s_de THEN 'de'
         |    WHEN s_es THEN 'es'
         |    WHEN s_fr THEN 'fr'
         |    ELSE 'zh' END AS lang_guess
         |FROM (
         |  SELECT doc_id,
         |    len(list_intersect($tokensSql, ['the','and','of','is','with'])) AS s_en,
         |    len(list_intersect($tokensSql, ['der','und','die','ist','mit'])) AS s_de,
         |    len(list_intersect($tokensSql, ['el','los','que','es','con'])) AS s_es,
         |    len(list_intersect($tokensSql, ['le','les','et','est','avec'])) AS s_fr,
         |    len(list_intersect($tokensSql, ['de5','shi4','le5','zai4','he2'])) AS s_zh
         |  FROM documents) t
         |ORDER BY doc_id""".stripMargin,
    "d_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |        i -> CAST(unicode(text[i]) AS BIGINT))),
        |    (h, cp) -> (h * 31 + cp) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_tfidf" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($tokensSql) AS term
         |    FROM documents WHERE doc_id < 50)
         |  GROUP BY 1, 2),
         |idf AS (
         |  SELECT term, ln((50.0 + 1) / (COUNT(DISTINCT doc_id) + 1)) + 1 AS idf
         |  FROM tf GROUP BY 1)
         |SELECT doc_id, rank, term, tf, tf_idf FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf,
         |    ROUND(tf.tf * idf.idf, 6) AS tf_idf,
         |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf * idf.idf DESC, tf.term) AS rank
         |  FROM tf JOIN idf ON tf.term = idf.term) t
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "d_token_freq" ->
      s"""SELECT rank, term, n FROM (
         |  SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank
         |  FROM (SELECT term, COUNT(*) AS n FROM (
         |          SELECT unnest($tokensSql) AS term FROM documents)
         |        GROUP BY 1) c) t
         |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "d_sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc
        |FROM documents
        |WHERE substring(md5(concat('salt1', CAST(doc_id AS VARCHAR))), 1, 2) < '4d'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_length_band" ->
      """SELECT lang, COUNT(*) AS n_kept, MIN(n_chars) AS min_len,
        |  MAX(n_chars) AS max_len
        |FROM (SELECT lang, doc_id, n_chars,
        |        percent_rank() OVER (PARTITION BY lang
        |          ORDER BY n_chars, doc_id) AS pr
        |      FROM documents) t
        |WHERE pr >= 0.1 AND pr <= 0.9
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_upsert" ->
      """WITH updates AS (
        |  SELECT doc_id, text, lang, source, n_chars + 1000000 AS n_chars
        |  FROM documents WHERE doc_id % 10 = 0),
        |merged AS (
        |  SELECT * FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM updates)
        |  UNION ALL SELECT * FROM updates)
        |SELECT doc_id % 7 AS bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_histogram" ->
      """SELECT lang, CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d_decontaminate" -> QueryShared.decontaminateSql("doc_id < 5"),
    "d_dedup_clusters" ->
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
         |  FROM g LEFT JOIN j ON g.doc_id = j.doc_id)
         |SELECT doc_id,
         |  MAX(CASE WHEN NOT linked_prev THEN doc_id END)
         |    OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cluster
         |FROM flags ORDER BY doc_id""".stripMargin,
    "d_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin,
    "d_pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '[0-9][0-9 ().-]{7,}[0-9]')) AS n_phones,
        |  length(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9][0-9 ().-]{7,}[0-9]', '<PHONE>', 'g')) AS scrubbed_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_normalize" ->
      """SELECT doc_id,
        |  length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_len,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d_corpus_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS mean_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d_ngram_jaccard" ->
      s"""WITH g AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN []
         |    ELSE list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS grams
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents))
         |SELECT a.doc_id AS doc_id,
         |  ROUND(CASE WHEN len(list_distinct(a.grams || b.grams)) > 0
         |    THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |         / len(list_distinct(a.grams || b.grams))
         |    ELSE 0 END, 6) AS jaccard_next
         |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
         |ORDER BY doc_id""".stripMargin,
    "e_label_centroid" ->
      """SELECT label, pos, CAST(ROUND(SUM(CAST(x AS DOUBLE) * 1000000))
        |    AS BIGINT) AS sum_e6, COUNT(*) AS n
        |FROM (SELECT label, unnest(embedding) AS x,
        |        generate_subscripts(embedding, 1) - 1 AS pos
        |      FROM embeddings) t
        |WHERE pos < 8
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e_ann_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |assigned AS (
         |  SELECT vec_id AS neighbor_id, centroid_id, embedding FROM (
         |    SELECT e.vec_id, c.centroid_id, e.embedding,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY -(${Round13Queries.cosSql("e.embedding", "c.centroid")}) ASC,
         |          c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) t
         |  WHERE rn = 1),
         |probed AS (
         |  SELECT vec_id AS query_id, centroid_id, embedding AS q_emb FROM (
         |    SELECT q.vec_id, c.centroid_id, q.embedding,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY -(${Round13Queries.cosSql("q.embedding", "c.centroid")}) ASC,
         |          c.centroid_id ASC) AS rn
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 50) t
         |  WHERE rn <= 3),
         |scored AS (
         |  SELECT p.query_id, a.neighbor_id,
         |    ${Round13Queries.cosSql("p.q_emb", "a.embedding")} AS cos_sim
         |  FROM assigned a JOIN probed p ON a.centroid_id = p.centroid_id
         |  WHERE p.query_id <> a.neighbor_id)
         |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "e_ann_brute" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_zip(q.embedding, c.embedding),
        |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
        |      (a, b) -> a + b) /
        |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (a, b) -> a + b)) *
        |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (a, b) -> a + b))) AS cos_sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5)
        |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "e_dedup_cosine" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS id_a,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_zip(a.embedding, b.embedding),
        |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
        |      (x, y) -> x + y) /
        |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (x, y) -> x + y)) *
        |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (x, y) -> x + y))) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id)
        |SELECT id_a AS vec_id, ROUND(MAX(cos), 6) AS max_cos,
        |  COUNT(*) AS n_same_label,
        |  ROUND(MAX(cos), 6) > 0.99 AS is_near_dup
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
