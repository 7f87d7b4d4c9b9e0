package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.PortableSim

/** Round-10 additions: FULL-OUTPUT oracled twins of the four queries
  * that were `no_oracle` rows through round 9 (`d_dedup_minhash`,
  * `d_dedup_simhash`, `e_ann_lsh`, `e_ann_pq` — xxhash64-seeded, which
  * DuckDB cannot replay). Those four keys are retired; each twin here
  * runs the SAME pipeline shape with md5-derived hashes
  * ([[graft.similarity.PortableSim]]) or, for PQ (which never hashed),
  * an ordered ADC fold — so the complete output (every candidate, every
  * score, every rank) replays in DuckDB SQL. The xxhash64 production
  * paths remain covered by the planted-duplicate recall oracles
  * ([[Round7Queries]]) and their unit specs.
  */
object Round18Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MinHash+LSH per-doc candidate summary — the retired
    // d_dedup_minhash's exact output contract (candidate count, best
    // verified Jaccard, 0.8 near-dup flag; every doc present), now
    // fully replayable: 8 md5-slice hash slots, 4 bands × 2 rows.
    "d_dedup_minhash_md5" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val pairs = PortableSim.minhashPairsMd5(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.0)
      val perDoc = pairs.select(col("id_a").as("doc_id"), col("jaccard"))
        .unionByName(pairs.select(col("id_b").as("doc_id"), col("jaccard")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_candidates"),
          round(max(col("jaccard")), 6).as("best_jaccard"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
          (coalesce(col("best_jaccard"), lit(0.0)) >= 0.8).as("is_near_dup"))
        .orderBy(col("doc_id"))
    }),

    // SimHash signature + nearest-candidate hamming per doc — the
    // retired d_dedup_simhash's contract over the portable 32-bit md5
    // signature and 2-probe block LSH. min_hamming = 32 (the signature
    // width) when no block collision ≤ 10 exists.
    "d_dedup_simhash_md5" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val sigs = PortableSim.simhashSigsMd5(docs, "doc_id", "text")
      val pairs = PortableSim.simhashPairsMd5(docs, "doc_id", "text",
        maxHamming = 10)
      val perDoc = pairs.select(col("id_a").as("id"), col("hamming"))
        .unionByName(pairs.select(col("id_b").as("id"), col("hamming")))
        .groupBy("id").agg(min(col("hamming")).as("min_hamming"))
      sigs.join(perDoc, Seq("id"), "left")
        .select(col("id").as("doc_id"), col("simhash"),
          coalesce(col("min_hamming"), lit(32L)).as("min_hamming"))
        .orderBy(col("doc_id"))
    }),

    // Hyperplane-LSH ANN top-3 — the retired e_ann_lsh's contract with
    // md5-parity sign planes (2 tables × 8 planes): bucket bits replay
    // because the plane dot is the repo's sequential double fold.
    "e_ann_lsh_md5" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      PortableSim.lshTopKMd5(emb.filter(col("vec_id") < 50), emb,
        dim = 64, numPlanes = 8, k = 3, numTables = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ, end to end THROUGH PERSISTENCE (the e_ann_ivf_incremental
    // lifecycle): encode cells+codes -> saveIvfPqIndex (parquet,
    // partitioned by centroid) -> reload -> probe. Planted contract:
    // an identical embedding assigns to the query's own argmin cell
    // (probe #1 contains it) and encodes to identical codes, so its ADC
    // score equals the query's own quantization score — rerank=32 keeps
    // it through the cutoff and the exact re-score pins cosine 1.
    "e_ann_ivfpq_planted" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val bookStride = math.max(1L,
        QueryShared.cachedCount(s, dir, "embeddings") / 20L).toInt
      val books = graft.similarity.ProductQuantizer.codebooks(
        emb, dim = 64, numSub = 8, stride = bookStride)
      // keyed by dir AND the Spark application id (the e_ann_opq_trained
      // convention): two concurrent processes benching the same dataset
      // must not interleave one artifact's save/load
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_ivfpq_idx_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      graft.similarity.TrainedState.saveIvfPqIndex(
        graft.similarity.IvfPq.encode(corpus, centroids, books,
          dim = 64, numSub = 8), idxPath)
      val index = graft.similarity.TrainedState.loadIvfPqIndex(s, idxPath)
      val queries = emb.filter(col("vec_id") < 30)
      graft.similarity.IvfPq.topKFromIndex(queries, index, corpus, k = 1,
        centroids, books, dim = 64, numSub = 8, nprobe = 2, rerank = 32)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // RESIDUAL IVF-PQ (FAISS by_residual=true): codes quantize
    // x − c_cell, the accuracy default at scale. Planted contract is
    // arithmetic-invariant: an identical embedding lands in the same
    // cell, yields the bit-identical f32 residual, hence identical
    // codes; its ADC score equals the query's own quantization score
    // plus the same coarse dot, so rerank=32 keeps it to the exact
    // re-score — cosine 1, rank 1, for every query.
    "e_ann_ivfpq_res_planted" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val bookStride = math.max(1L,
        QueryShared.cachedCount(s, dir, "embeddings") / 20L).toInt
      val books = graft.similarity.IvfPq.residualBooks(emb, centroids,
        dim = 64, numSub = 8, stride = bookStride)
      val index = graft.similarity.IvfPq.encodeResidual(corpus, centroids,
        books, dim = 64, numSub = 8)
      val queries = emb.filter(col("vec_id") < 30)
      graft.similarity.IvfPq.topKFromIndexResidual(queries, index, corpus,
        k = 1, centroids, books, dim = 64, numSub = 8, nprobe = 2,
        rerank = 32)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // IVF-PQ recall-vs-nprobe — the dial a 100 TB deployment tunes: for
    // nprobe in {1, 2, 4}, the fraction of exact brute-force top-3
    // neighbors the funnel recovers. FULLY oracled: cells, codes, ADC
    // ordered folds, cutoffs and the brute reference all replay in SQL,
    // so the recall numbers themselves are engine-exact.
    "e_ann_ivfpq_recall" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 30)
      val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val bookStride = math.max(1L,
        QueryShared.cachedCount(s, dir, "embeddings") / 20L).toInt
      val books = graft.similarity.ProductQuantizer.codebooks(
        emb, dim = 64, numSub = 8, stride = bookStride)
      // one encode feeds all three probes (lazy persist — the
      // PortableSim staging convention)
      val index = graft.similarity.IvfPq.encode(emb, centroids, books,
        dim = 64, numSub = 8).persist()
      val brute = graft.similarity.Similarity.bruteTopK(queries, emb, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val hits = Seq(1, 2, 4).map { nprobe =>
        graft.similarity.IvfPq.topKFromIndex(queries, index, emb, k = 3,
          centroids, books, dim = 64, numSub = 8, nprobe, rerank = 8)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("nprobe", lit(nprobe))
      }.reduce(_ unionByName _)
        .join(brute, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
      val total = brute.count()
      hits.select(col("nprobe").cast("int").as("nprobe"), col("n_hits"),
          lit(total).as("n_total"),
          round(lit(1000000.0) * col("n_hits") / lit(total.toDouble))
            .cast("long").as("recall_e6"))
        .orderBy(col("nprobe"))
    }),

    // REAL-DECODE content-ID under the gate: two checked-in animated
    // GIFs (library resources — real javax.imageio frame decode, no
    // synthetic stub anywhere in the path) share exactly one rendered
    // frame; frameDupPairs must surface exactly that cross-video frame
    // pair. The oracle is the constant expected pair — the planted-
    // oracle convention, here with REAL bytes instead of planted rows.
    // Ignores the table dir by design: the input is the binary fixture.
    "m_gif_content_id" -> ((s, dir) => {
      def bytes(name: String): Array[Byte] = {
        val in = getClass.getResourceAsStream(s"/multimodal/$name")
        require(in != null, s"resource $name missing")
        try in.readAllBytes() finally in.close()
      }
      import s.implicits._
      val media = s.createDataset(Seq(
        graft.multimodal.Multimodal.MediaRow(1L, "video",
          bytes("anim_a.gif"), 32, 24, 0, 0),
        graft.multimodal.Multimodal.MediaRow(2L, "video",
          bytes("anim_b.gif"), 32, 24, 0, 0)))
      graft.multimodal.Multimodal.frameDupPairs(media, maxHamming = 3)
        .select(col("media_a"), col("frame_a"), col("media_b"),
          col("frame_b"))
        .orderBy(col("media_a"), col("frame_a"))
    }),

    // OPQ-lite rotated PQ: the structured orthogonal H·D/√d rotation
    // before quantization (energy-spread preprocessing, codebooks
    // trained on the rotated corpus). Planted contract is
    // rotation-invariant: identical vectors rotate identically, encode
    // identically, and cosine of identical rotated vectors is exactly
    // 1 through the rerank.
    "e_ann_pq_rotated" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val queries = emb.filter(col("vec_id") < 30)
        .select(col("vec_id"), col("embedding"))
      val stride = math.max(1L,
        QueryShared.cachedCount(s, dir, "embeddings") / 256L)
      graft.similarity.ProductQuantizer.topKRotated(queries, corpus,
        dim = 64, numSub = 8, k = 1, stride = stride.toInt, rerank = 32)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // Binary (1-bit) quantization ANN: coarse Hamming over packed sign
    // bits (32× compression, integer-only), exact cosine re-rank of
    // the 24-deep shortlist. FULLY oracled — every coarse value is
    // integer arithmetic, so the whole pipeline replays in SQL.
    "e_ann_bq" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      graft.similarity.BinaryQuantize.topKBinary(
        emb.filter(col("vec_id") < 50), emb, dim = 64, k = 3, rerank = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // PQ ANN top-3 — the retired e_ann_pq VERBATIM (stride codebooks,
    // ADC candidates, exact re-rank): PQ never hashed, and with the ADC
    // sum now an ordered per-subspace fold the whole pipeline — encode
    // argmin, ADC ranking cutoff, exact re-score — replays in SQL.
    "e_ann_pq_full" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val stride = math.max(1L, QueryShared.cachedCount(s, dir, "embeddings") / 256L)
      graft.similarity.ProductQuantizer.topK(
        emb.filter(col("vec_id") < 50), emb, dim = 64, numSub = 8, k = 3,
        stride = stride.toInt, rerank = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    })
  )

  import Round13Queries.{cosSql, dotSql}

  /** md5-slice → BIGINT, the winnowFpsSql convention. */
  private def hx(expr: String, off: Int, width: Int): String =
    s"CAST(('0x' || substr($expr, $off, $width)) AS BIGINT)"

  private val toksSql = QueryShared.tokensSql

  /** Shared CTE block for the IVF-PQ replay: stride cells and books,
    * corpus cell assignment, per-subspace PQ encode. Same argmin /
    * tie-break / kernel-dot conventions as the e_ann_ivf and
    * e_ann_pq_full oracles. */
  private def ivfpqCoreSql: String =
    s"""WITH params AS (
       |  SELECT greatest(1, (SELECT count(*) FROM embeddings) // 20) AS bstride),
       |cents AS (
       |  SELECT vec_id AS centroid_id, embedding AS centroid
       |  FROM embeddings WHERE vec_id % 50 = 0),
       |books AS (SELECT gs.s AS sub,
       |    CAST(e.vec_id // p.bstride AS INT) AS code,
       |    list_slice(e.embedding, gs.s*8 + 1, gs.s*8 + 8) AS centroid
       |  FROM embeddings e CROSS JOIN params p
       |    CROSS JOIN generate_series(0, 7) gs(s)
       |  WHERE e.vec_id % p.bstride = 0),
       |assigned AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY -(${cosSql("e.embedding", "c.centroid")}) ASC,
       |          c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c) t
       |  WHERE rn = 1),
       |subs AS (SELECT e.vec_id, gs.s AS sub,
       |    list_slice(e.embedding, gs.s*8 + 1, gs.s*8 + 8) AS subvec
       |  FROM embeddings e CROSS JOIN generate_series(0, 7) gs(s)),
       |enc AS (SELECT vec_id, sub, code FROM (
       |    SELECT sv.vec_id, sv.sub, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
       |        ORDER BY (${dotSql("b.centroid", "b.centroid")}
       |          - 2 * ${dotSql("sv.subvec", "b.centroid")}) ASC,
       |          b.code ASC) AS rn
       |    FROM subs sv JOIN books b ON b.sub = sv.sub) t
       |  WHERE rn = 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "e_ann_ivfpq_planted" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 30 ORDER BY query_id""".stripMargin,

    "e_ann_ivfpq_res_planted" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 30 ORDER BY query_id""".stripMargin,

    "e_ann_pq_rotated" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 30 ORDER BY query_id""".stripMargin,

    "m_gif_content_id" ->
      """SELECT CAST(1 AS BIGINT) AS media_a, 1 AS frame_a,
        |  CAST(2 AS BIGINT) AS media_b, 1 AS frame_b""".stripMargin,

    "e_ann_ivfpq_recall" -> (ivfpqCoreSql +
      s""",
       |np AS (SELECT unnest([1, 2, 4]) AS nprobe),
       |probedranks AS (
       |  SELECT q.vec_id AS query_id, c.centroid_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY -(${cosSql("q.embedding", "c.centroid")}) ASC,
       |        c.centroid_id ASC) AS crank
       |  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 30),
       |probed AS (SELECT n.nprobe, pr.query_id, pr.centroid_id
       |  FROM probedranks pr CROSS JOIN np n WHERE pr.crank <= n.nprobe),
       |adc AS (SELECT sv.vec_id AS query_id, sv.sub, b.code,
       |    ${dotSql("sv.subvec", "b.centroid")} AS part
       |  FROM subs sv JOIN books b ON b.sub = sv.sub WHERE sv.vec_id < 30),
       |approx AS (SELECT p.nprobe, p.query_id, a.vec_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(d.part ORDER BY d.sub)), (x, y) -> x + y) AS adc_score,
       |    count(*) AS n
       |  FROM probed p
       |  JOIN assigned a
       |    ON a.centroid_id = p.centroid_id AND a.vec_id <> p.query_id
       |  JOIN enc e ON e.vec_id = a.vec_id
       |  JOIN adc d
       |    ON d.query_id = p.query_id AND d.sub = e.sub AND d.code = e.code
       |  GROUP BY p.nprobe, p.query_id, a.vec_id),
       |short AS (SELECT nprobe, query_id, vec_id AS neighbor_id FROM (
       |    SELECT nprobe, query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
       |        ORDER BY adc_score DESC, vec_id) AS r
       |    FROM approx WHERE n = 8) t
       |  WHERE r <= 24),
       |rer AS (SELECT nprobe, query_id, neighbor_id FROM (
       |    SELECT s.nprobe, s.query_id, s.neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.nprobe, s.query_id
       |        ORDER BY ${cosSql("qe.embedding", "ce.embedding")} DESC,
       |          s.neighbor_id) AS rk
       |    FROM short s
       |    JOIN embeddings qe ON qe.vec_id = s.query_id
       |    JOIN embeddings ce ON ce.vec_id = s.neighbor_id) t
       |  WHERE rk <= 3),
       |brute AS (SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC,
       |          c.vec_id) AS rk
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 30) t
       |  WHERE rk <= 3),
       |tot AS (SELECT count(*) AS n_total FROM brute)
       |SELECT r.nprobe, count(*) AS n_hits, t.n_total,
       |  CAST(ROUND(1000000.0 * count(*) / t.n_total) AS BIGINT) AS recall_e6
       |FROM rer r
       |JOIN brute b
       |  ON b.query_id = r.query_id AND b.neighbor_id = r.neighbor_id
       |CROSS JOIN tot t
       |GROUP BY r.nprobe, t.n_total
       |ORDER BY r.nprobe""".stripMargin),

    "e_ann_bq" ->
      s"""WITH bits AS (
         |  SELECT vec_id, list(word ORDER BY w) AS bits FROM (
         |    SELECT vec_id, (j-1) // 32 AS w,
         |      SUM(CASE WHEN x > 0
         |        THEN CAST(1 AS BIGINT) << ((j-1) % 32) ELSE 0 END) AS word
         |    FROM (SELECT vec_id, unnest(embedding) AS x,
         |            generate_subscripts(embedding, 1) AS j
         |          FROM embeddings) t
         |    GROUP BY vec_id, (j-1) // 32) g
         |  GROUP BY vec_id),
         |ham AS (SELECT q.vec_id AS query_id, c.vec_id,
         |    bit_count(xor(q.bits[1], c.bits[1]))
         |      + bit_count(xor(q.bits[2], c.bits[2])) AS hamming
         |  FROM bits q JOIN bits c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 50),
         |short AS (SELECT query_id, vec_id AS neighbor_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY hamming ASC, vec_id) AS r
         |    FROM ham) t
         |  WHERE r <= 24),
         |scored AS (SELECT sh.query_id, sh.neighbor_id,
         |    ${cosSql("qe.embedding", "ce.embedding")} AS cos_sim
         |  FROM short sh
         |  JOIN embeddings qe ON qe.vec_id = sh.query_id
         |  JOIN embeddings ce ON ce.vec_id = sh.neighbor_id)
         |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM (SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "d_dedup_minhash_md5" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS tok FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tok) - 1),
         |      i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS gram
         |    FROM t WHERE len(tok) >= 3)),
         |h AS (SELECT doc_id, md5(gram) AS m1, md5('x' || gram) AS m2 FROM g),
         |hh AS (SELECT doc_id, ${hx("m1", 1, 15)} AS gid,
         |  ${hx("m1", 1, 8)} AS h0, ${hx("m1", 9, 8)} AS h1,
         |  ${hx("m1", 17, 8)} AS h2, ${hx("m1", 25, 8)} AS h3,
         |  ${hx("m2", 1, 8)} AS h4, ${hx("m2", 9, 8)} AS h5,
         |  ${hx("m2", 17, 8)} AS h6, ${hx("m2", 25, 8)} AS h7
         |  FROM h),
         |sig AS (SELECT doc_id, list(DISTINCT gid) AS gs,
         |  min(h0) AS s0, min(h1) AS s1, min(h2) AS s2, min(h3) AS s3,
         |  min(h4) AS s4, min(h5) AS s5, min(h6) AS s6, min(h7) AS s7
         |  FROM hh GROUP BY doc_id),
         |b AS (
         |  SELECT doc_id, 0 AS band,
         |    CAST(s0 AS VARCHAR) || '_' || CAST(s1 AS VARCHAR) AS bucket FROM sig
         |  UNION ALL SELECT doc_id, 1,
         |    CAST(s2 AS VARCHAR) || '_' || CAST(s3 AS VARCHAR) FROM sig
         |  UNION ALL SELECT doc_id, 2,
         |    CAST(s4 AS VARCHAR) || '_' || CAST(s5 AS VARCHAR) FROM sig
         |  UNION ALL SELECT doc_id, 3,
         |    CAST(s6 AS VARCHAR) || '_' || CAST(s7 AS VARCHAR) FROM sig),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |  FROM b a JOIN b c
         |    ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
         |j AS (SELECT id_a, id_b,
         |  CASE WHEN len(list_distinct(sa.gs || sb.gs)) > 0
         |    THEN CAST(len(list_intersect(sa.gs, sb.gs)) AS DOUBLE)
         |         / len(list_distinct(sa.gs || sb.gs))
         |    ELSE 0 END AS jaccard
         |  FROM p JOIN sig sa ON sa.doc_id = p.id_a
         |         JOIN sig sb ON sb.doc_id = p.id_b),
         |perdoc AS (SELECT doc_id, count(*) AS n_candidates,
         |    round(max(jaccard), 6) AS best_jaccard
         |  FROM (SELECT id_a AS doc_id, jaccard FROM j
         |        UNION ALL SELECT id_b, jaccard FROM j) u
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_candidates, 0) AS n_candidates,
         |  COALESCE(best_jaccard, 0.0) AS best_jaccard,
         |  COALESCE(best_jaccard, 0.0) >= 0.8 AS is_near_dup
         |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "d_dedup_simhash_md5" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |th AS (SELECT doc_id, ${hx("md5(tok)", 1, 8)} AS h FROM tk),
         |bits AS (SELECT doc_id, b,
         |    CASE WHEN SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
         |      THEN CAST(1 AS BIGINT) << b ELSE 0 END AS bv
         |  FROM th CROSS JOIN generate_series(0, 31) gs(b)
         |  GROUP BY doc_id, b),
         |sg AS (SELECT doc_id, CAST(SUM(bv) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id),
         |sig AS (SELECT d.doc_id, COALESCE(sg.simhash, 0) AS simhash
         |  FROM (SELECT DISTINCT doc_id FROM documents) d
         |  LEFT JOIN sg USING (doc_id)),
         |b AS (
         |  SELECT doc_id, simhash, 0 AS t, (simhash >> 16) & 65535 AS bucket
         |  FROM sig
         |  UNION ALL SELECT doc_id, simhash, 1, simhash & 65535 FROM sig),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |    CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
         |  FROM b a JOIN b c
         |    ON a.t = c.t AND a.bucket = c.bucket AND a.doc_id < c.doc_id
         |  WHERE bit_count(xor(a.simhash, c.simhash)) <= 10),
         |m AS (SELECT doc_id, MIN(hamming) AS min_hamming FROM (
         |    SELECT id_a AS doc_id, hamming FROM p
         |    UNION ALL SELECT id_b, hamming FROM p) u
         |  GROUP BY doc_id)
         |SELECT s.doc_id, s.simhash,
         |  CAST(COALESCE(m.min_hamming, 32) AS BIGINT) AS min_hamming
         |FROM sig s LEFT JOIN m USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin,

    "e_ann_lsh_md5" ->
      s"""WITH planes AS (
         |  SELECT t, p, list(CASE WHEN
         |      ${hx("md5(CAST(t*1000 + p AS VARCHAR) || '_' || CAST(j AS VARCHAR))", 1, 4)}
         |      % 2 = 1 THEN 1.0 ELSE -1.0 END ORDER BY j) AS s
         |  FROM generate_series(0, 1) tt(t)
         |    CROSS JOIN generate_series(0, 7) pp(p)
         |    CROSS JOIN generate_series(0, 63) jj(j)
         |  GROUP BY t, p),
         |bits AS (SELECT e.vec_id, pl.t, pl.p,
         |    CASE WHEN ${dotSql("e.embedding", "pl.s")} > 0
         |      THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END AS bv
         |  FROM embeddings e CROSS JOIN planes pl),
         |buckets AS (SELECT vec_id, t,
         |    t * 4294967296 + SUM(bv) AS bucket
         |  FROM bits GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM buckets q JOIN buckets c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id),
         |scored AS (SELECT cd.query_id, cd.neighbor_id,
         |    ${cosSql("qe.embedding", "ce.embedding")} AS cos_sim
         |  FROM cand cd
         |  JOIN embeddings qe ON qe.vec_id = cd.query_id
         |  JOIN embeddings ce ON ce.vec_id = cd.neighbor_id)
         |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM (SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "e_ann_pq_full" ->
      s"""WITH params AS (
         |  SELECT greatest(1, (SELECT count(*) FROM embeddings) // 256) AS stride),
         |books AS (SELECT gs.s AS sub,
         |    CAST(e.vec_id // p.stride AS INT) AS code,
         |    list_slice(e.embedding, gs.s*8 + 1, gs.s*8 + 8) AS centroid
         |  FROM embeddings e CROSS JOIN params p
         |    CROSS JOIN generate_series(0, 7) gs(s)
         |  WHERE e.vec_id % p.stride = 0),
         |subs AS (SELECT e.vec_id, gs.s AS sub,
         |    list_slice(e.embedding, gs.s*8 + 1, gs.s*8 + 8) AS subvec
         |  FROM embeddings e CROSS JOIN generate_series(0, 7) gs(s)),
         |enc AS (SELECT vec_id, sub, code FROM (
         |    SELECT sv.vec_id, sv.sub, b.code,
         |      ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
         |        ORDER BY (${dotSql("b.centroid", "b.centroid")}
         |          - 2 * ${dotSql("sv.subvec", "b.centroid")}) ASC,
         |          b.code ASC) AS rn
         |    FROM subs sv JOIN books b ON b.sub = sv.sub) t
         |  WHERE rn = 1),
         |qsubs AS (SELECT vec_id AS query_id, sub, subvec
         |  FROM subs WHERE vec_id < 50),
         |adc AS (SELECT q.query_id, q.sub, b.code,
         |    ${dotSql("q.subvec", "b.centroid")} AS part
         |  FROM qsubs q JOIN books b ON b.sub = q.sub),
         |approx AS (SELECT a.query_id, e.vec_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(a.part ORDER BY a.sub)), (x, y) -> x + y) AS adc_score,
         |    count(*) AS n
         |  FROM enc e JOIN adc a ON a.sub = e.sub AND a.code = e.code
         |  WHERE a.query_id <> e.vec_id
         |  GROUP BY a.query_id, e.vec_id),
         |cand AS (SELECT query_id, vec_id AS neighbor_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY adc_score DESC, vec_id) AS r
         |    FROM approx WHERE n = 8) t
         |  WHERE r <= 24),
         |scored AS (SELECT cd.query_id, cd.neighbor_id,
         |    ${cosSql("qe.embedding", "ce.embedding")} AS cos_sim
         |  FROM cand cd
         |  JOIN embeddings qe ON qe.vec_id = cd.query_id
         |  JOIN embeddings ce ON ce.vec_id = cd.neighbor_id)
         |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
         |FROM (SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  )
}
