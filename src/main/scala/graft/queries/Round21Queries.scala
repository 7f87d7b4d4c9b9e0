package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{Hnsw, Similarity}

/** Round-11 additions (continued): the two-level coarse quantizer for
  * IVF assignment — the fix for the flat argmin's n×C wall SCALE.md
  * documents past ~10⁵ cells — and the HNSW incremental-insert
  * lifecycle (layer assignment by the same deterministic hash, per-layer
  * insert-by-search). Both replay in DuckDB as CTE chains over the same
  * kernel-exact cosine.
  */
object Round21Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HNSW INCREMENTAL INSERT, full-output oracle: 6 held-out vectors
    // (ids ≡ 7 mod 20) insert into the layered index built over the
    // other 114 — batch levels from the SAME md5 hash, per-layer beam-3
    // 2-hop search over the pre-batch layer graph seeded at that
    // LAYER'S OWN elected entry (lowest pre-batch id with level ≥ ℓ —
    // a member of the layer, preserving nested membership), forward
    // edges = top-4 results, reverse edges re-prune only the touched
    // sources. The ENTIRE updated layered edge table is the output;
    // DuckDB replays every layer's entry election, search trajectory,
    // forward ranks, and the touched-source re-prune windows
    // (untouched rows keep their build ranks — passthrough is part of
    // the contract).
    "e_ann_hnsw_insert" -> ((s, dir) => {
      val all = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding"))
      val batch = all.filter(col("vec_id") % 20 === 7).localCheckpoint(true)
      val pre = all.filter(col("vec_id") % 20 =!= 7).localCheckpoint(true)
      val layered = Hnsw.buildIndex(pre, degree = 4, m = 4, maxLevel = 2)
        .localCheckpoint(true)
      Hnsw.insert(layered, batch, pre, m = 4, maxLevel = 2,
          beam = 3, hops = 2, degree = 4)
        .select(col("layer"), col("query_id"), col("rank"),
          col("neighbor_id"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("layer"), col("query_id"), col("rank"))
    }),

    // HNSW FORGET receipts: per-layer graphForget accounting merged to
    // one row per requested id (totals across the 3 layers — a node's
    // edges vanish from every layer it inhabits; nested membership
    // means an upper-layer node loses edges at each layer below too),
    // including the never-indexed id's all-zero negative row. Pure rank
    // arithmetic over the per-layer degree-4 brute graphs, fully
    // replayed in DuckDB.
    "e_ann_hnsw_forget" -> ((s, dir) => {
      import s.implicits._
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      // checkpointed: the lifecycle coverage guard runs one agg over the
      // index at construction, and the final write reads it again
      val layered = Hnsw.buildIndex(corpus, degree = 4, m = 4, maxLevel = 2)
        .localCheckpoint(true)
      val del = Seq(7L, 44L, 999999L).toDF("vec_id")
      val (_, receipts) = Hnsw.forget(layered, del, maxLevel = 2)
      receipts.orderBy(col("vec_id"))
    }),

    // HNSW index AUDIT: per-layer node/edge counts and degree extent —
    // the health check a serving fleet runs before trusting a layered
    // artifact (geometric layer sizes, degree bound, layer-0
    // completeness). Pure counting over the per-layer brute graphs,
    // fully replayed in DuckDB.
    "e_ann_hnsw_stats" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 200)
        .select(col("vec_id"), col("embedding"))
      Hnsw.indexStats(
        Hnsw.buildIndex(corpus, degree = 4, m = 4, maxLevel = 2))
    }),

    // DiskANN-LAYERED serving, FULL-trajectory oracle: the hierarchy
    // searched entirely over PQ codes — stride-codebook ADC (8
    // subspaces) scores the descent through both upper layers AND the
    // layer-0 beam walk, floats touched once by the exact top-3 re-rank
    // of the 12 ADC survivors. The oracle composes the e_ann_hnsw
    // descent CTEs with the e_ann_pq_full ADC fold — every stage
    // (encode argmin, per-layer ADC descent cuts, hop expansions,
    // shortlist cutoff, exact re-score) replays in DuckDB value by
    // value. The graphs are built at full precision (offline index /
    // codes-only serving — the e_ann_graph_pq_full convention).
    "e_ann_hnsw_pq" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val layered = Hnsw.buildIndex(corpus, degree = 4, m = 4,
        maxLevel = 2).localCheckpoint(true)
      val (entryId, entryLevel) =
        Hnsw.entryOf(Hnsw.levels(corpus, m = 4, maxLevel = 2))
      val books = graft.similarity.ProductQuantizer.codebooks(
        corpus, dim = 64, numSub = 8, stride = 10)
      val codes = graft.similarity.ProductQuantizer.encode(
        corpus, books, dim = 64, numSub = 8).localCheckpoint(true)
      val probes = corpus.filter(col("vec_id") % 20 === 0)
      Hnsw.searchPq(probes, layered, codes, books, dim = 64, numSub = 8,
          corpus, entryId, entryLevel, beamUpper = 1, hopsUpper = 2,
          beam = 3, hops = 2, k = 3, rerank = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // METADATA-FILTERED hierarchical search: descent and layer-0 walk
    // both unfiltered (a filtered descent could strand a query in a
    // region with no matching nodes — the searchGraphFiltered
    // disconnection hazard, one layer up), predicate bound at the
    // FINAL rank only. The oracle is the e_ann_hnsw replay with one
    // added clause on the last cut — the same parameterized-builder
    // convention as e_ann_graph_filtered.
    "e_ann_hnsw_filtered" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val layered = Hnsw.buildIndex(corpus, degree = 4, m = 4,
        maxLevel = 2).localCheckpoint(true)
      val (entryId, entryLevel) =
        Hnsw.entryOf(Hnsw.levels(corpus, m = 4, maxLevel = 2))
      val probes = corpus.filter(col("vec_id") % 20 === 0)
      Hnsw.searchFiltered(probes, layered, corpus, entryId, entryLevel,
          beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3,
          pred = col("vec_id") % 3 === 0)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // HNSW FORGET+REPAIR: each layer drops the deleted ids' rows, then
    // the layer's affected surviving sources re-derive their out-lists
    // by saturating search over the layer's post-forget graph (repair
    // entry elected per layer — lowest surviving source — because one
    // deleted id IS an upper-layer node). Deletion set is itself
    // oracle-derived (the two lowest upper-layer ids, the lowest
    // layer-0-only id, and a never-indexed id), so both sides agree on
    // it without hardcoding hash outcomes. Output = the repaired
    // affected slices per layer; DuckDB replays the saturated walk
    // reachability-aware (per-layer recursive CTE over kept edges).
    "e_ann_hnsw_repair" -> ((s, dir) => {
      import s.implicits._
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val n = corpus.count().toInt
      val lv = Hnsw.levels(corpus, m = 4, maxLevel = 2).localCheckpoint(true)
      val upper2 = lv.filter(col("level") >= 1).orderBy(col("vec_id"))
        .limit(2).collect().map(_.getLong(0)).toSeq
      val low1 = lv.filter(col("level") === 0).agg(min(col("vec_id")))
        .collect()(0).getLong(0)
      val del = (upper2 :+ low1 :+ 999999L).toDF("vec_id")
        .localCheckpoint(true)
      val layered = Hnsw.buildIndex(corpus, degree = 4, m = 4, maxLevel = 2)
        .localCheckpoint(true)
      val (repaired, _) = Hnsw.forgetRepaired(layered, corpus, del,
        maxLevel = 2, beam = n, hops = n, degree = 4)
      val affectedPairs = (0 to 2).map { l =>
        layered.filter(col("layer") === l)
          .join(del.withColumnRenamed("vec_id", "neighbor_id"),
            Seq("neighbor_id"))
          .join(del.withColumnRenamed("vec_id", "query_id"),
            Seq("query_id"), "left_anti")
          .select(lit(l).as("layer"), col("query_id")).distinct()
      }.reduce(_.unionByName(_))
      repaired.join(affectedPairs, Seq("layer", "query_id"), "left_semi")
        .select(col("layer"), col("query_id"), col("rank"),
          col("neighbor_id"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("layer"), col("query_id"), col("rank"))
    }),

    // The layered repair receipts: per-layer forget accounting plus
    // n_repaired (distinct surviving sources per layer that pointed at
    // the deleted id), totals across layers — a source affected at two
    // layers counts twice, one re-derivation per layer. Pure rank
    // arithmetic over the per-layer brute graphs, fully replayed —
    // through the receipts-ONLY path (the flat forgetRepairReceipts
    // convention): the repair's per-layer hop loops are driver-eager,
    // so the audit query must not pay for searches it discards
    // (measured 16.6 s → arithmetic-only when it did).
    "e_ann_hnsw_repair_receipts" -> ((s, dir) => {
      import s.implicits._
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val lv = Hnsw.levels(corpus, m = 4, maxLevel = 2).localCheckpoint(true)
      val upper2 = lv.filter(col("level") >= 1).orderBy(col("vec_id"))
        .limit(2).collect().map(_.getLong(0)).toSeq
      val low1 = lv.filter(col("level") === 0).agg(min(col("vec_id")))
        .collect()(0).getLong(0)
      val del = (upper2 :+ low1 :+ 999999L).toDF("vec_id")
        .localCheckpoint(true)
      val layered = Hnsw.buildIndex(corpus, degree = 4, m = 4, maxLevel = 2)
        .localCheckpoint(true) // coverage guard + final write both read it
      Hnsw.forgetRepairReceipts(layered, del, maxLevel = 2)
        .orderBy(col("vec_id"))
    }),

    // Two-level assignment at REDUCED fan-out (fanout=2 of the S
    // supers) — the approximate production shape, fully replayed: the
    // centroid table (stride 50) is itself quantized into supers
    // (stride 200 → every 4th centroid), each vector probes its 2
    // nearest supers and argmins over just their member centroids.
    // Full-fan-out == flat parity is spec-pinned (TwoLevelAssignSpec);
    // this gate query pins the REDUCED path's every-bit (assignment of
    // every vector, not a slice — row preservation is part of the
    // contract).
    "e_ann_ivf_twolevel" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val supers = Similarity.superCentroids(cents, stride = 200)
      Similarity.ivfAssignTwoLevel(emb, cents, supers, fanout = 2)
        .select(col("vec_id"), col("centroid_id"))
        .orderBy(col("vec_id"))
    })
  )

  import Round13Queries.{cosSql, dotSql}

  /** The DiskANN-layered replay: the e_ann_hnsw hierarchy CTEs
    * (levels, entry, per-layer cosine graphs, descent chains, base
    * hops) with `qs` swapped from exact cosine to the e_ann_pq_full
    * ADC fold — the same structural composition the engine performs
    * ([[graft.similarity.Hnsw.searchPq]] runs [[graft.similarity
    * .GraphAnn.walkPq]] per layer instead of the float scorer). The
    * extra layer-2 descent is a no-op identity when the corpus has no
    * level-2 node, exactly like the engine starting at a lower
    * entryLevel. */
  private def hnswPqSql: String =
    s"""WITH emb AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 120),
       |ap AS MATERIALIZED (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    ${cosSql("a.embedding", "b.embedding")} AS s
       |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
       |lv AS (
       |  SELECT vec_id,
       |    (CASE WHEN h % 4 = 0 THEN 1 ELSE 0 END +
       |     CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END) AS level
       |  FROM (SELECT vec_id,
       |      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))
       |        AS BIGINT) AS h
       |    FROM emb) t),
       |entry AS (
       |  SELECT min(vec_id) AS e FROM lv
       |  WHERE level = (SELECT max(level) FROM lv)),
       |e0 AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
       |    FROM ap) t WHERE r <= 4),
       |e1 AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
       |    FROM ap WHERE src IN (SELECT vec_id FROM lv WHERE level >= 1)
       |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 1)) t
       |  WHERE r <= 4),
       |e2 AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
       |    FROM ap WHERE src IN (SELECT vec_id FROM lv WHERE level >= 2)
       |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 2)) t
       |  WHERE r <= 4),
       |books AS (SELECT gs.s AS sub,
       |    CAST(e.vec_id // 10 AS INT) AS code,
       |    list_slice(e.embedding, gs.s*8 + 1, gs.s*8 + 8) AS centroid
       |  FROM emb e CROSS JOIN generate_series(0, 7) gs(s)
       |  WHERE e.vec_id % 10 = 0),
       |subs AS (SELECT e.vec_id, gs.s AS sub,
       |    list_slice(e.embedding, gs.s*8 + 1, gs.s*8 + 8) AS subvec
       |  FROM emb e CROSS JOIN generate_series(0, 7) gs(s)),
       |enc AS MATERIALIZED (SELECT vec_id, sub, code FROM (
       |    SELECT sv.vec_id, sv.sub, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
       |        ORDER BY (${dotSql("b.centroid", "b.centroid")}
       |          - 2 * ${dotSql("sv.subvec", "b.centroid")}) ASC,
       |          b.code ASC) AS rn
       |    FROM subs sv JOIN books b ON b.sub = sv.sub) t
       |  WHERE rn = 1),
       |p AS (SELECT vec_id AS query_id FROM emb WHERE vec_id % 20 = 0),
       |adc AS (SELECT q.vec_id AS query_id, q.sub, b.code,
       |    ${dotSql("q.subvec", "b.centroid")} AS part
       |  FROM subs q JOIN books b ON b.sub = q.sub
       |  WHERE q.vec_id % 20 = 0),
       |qs AS MATERIALIZED (
       |  -- ADC score per (query, node), SELF INCLUDED, complete-code
       |  -- rows only (n = 8), parts folded in subspace order — the
       |  -- e_ann_pq_full fold, scoring descent AND base walk alike
       |  SELECT query_id, node, score FROM (
       |    SELECT a.query_id, e.vec_id AS node,
       |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list(a.part ORDER BY a.sub)), (x, y) -> x + y) AS score,
       |      count(*) AS n
       |    FROM enc e JOIN adc a ON a.sub = e.sub AND a.code = e.code
       |    GROUP BY a.query_id, e.vec_id) t
       |  WHERE n = 8),
       |seed2 AS (SELECT query_id, (SELECT e FROM entry) AS node FROM p),
       |""".stripMargin +
      Round20Queries.descentSql("_l2", "seed2", "e2", beam = 1, hops = 2) +
      ",\n" +
      Round20Queries.descentSql("_l1", "ent_l2", "e1", beam = 1, hops = 2) +
      ",\n" +
      s"""v0_l0 AS (
       |  SELECT s.query_id, s.node, qs.score
       |  FROM ent_l1 s JOIN qs
       |    ON qs.query_id = s.query_id AND qs.node = s.node),
       |""".stripMargin +
      (1 to 2).map(i =>
          Round20Queries.hopSql("_l0", i, beam = 3, edges = "e0"))
        .mkString(",\n") + ",\n" +
      s"""short AS (
       |  SELECT query_id, node AS neighbor_id FROM (
       |    SELECT query_id, node,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, node) AS r
       |    FROM v2_l0 WHERE node <> query_id) t
       |  WHERE r <= 12),
       |scored AS (SELECT sh.query_id, sh.neighbor_id,
       |    ${cosSql("qe.embedding", "ce.embedding")} AS cos_sim
       |  FROM short sh
       |  JOIN emb qe ON qe.vec_id = sh.query_id
       |  JOIN emb ce ON ce.vec_id = sh.neighbor_id)
       |SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
       |FROM (SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** One layer's insert replay: seed the layer's sub-batch at the
    * layer's OWN elected entry (`entry$l` — lowest pre-batch id with
    * level ≥ l, the engine's per-layer election), run the hop
    * recurrence ([[Round20Queries.hopSql]] at beam 3 × 2 hops over the
    * PRE-insert layer edges `pe$l`), then forward top-`degree`,
    * reverse swap, and the touched-source re-prune window; untouched
    * sources keep their build ranks. */
  private def insertLayerSql(l: Int, beam: Int, degree: Int): String = {
    val p = s"_i$l"
    Seq(
      s"""v0$p AS (
         |  SELECT b.vec_id AS query_id, (SELECT e FROM entry$l) AS node,
         |    qs.score
         |  FROM b$l b JOIN qs ON qs.query_id = b.vec_id
         |    AND qs.node = (SELECT e FROM entry$l))""".stripMargin,
      Round20Queries.hopSql(p, 1, beam, s"pe$l"),
      Round20Queries.hopSql(p, 2, beam, s"pe$l"),
      s"""fwd$p AS (
         |  SELECT query_id, rank, neighbor_id, score FROM (
         |    SELECT query_id, node AS neighbor_id, score,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, node) AS rank
         |    FROM v2$p) t
         |  WHERE rank <= $degree)""".stripMargin,
      s"""rev$p AS (
         |  SELECT neighbor_id AS query_id, query_id AS neighbor_id, score
         |  FROM fwd$p)""".stripMargin,
      s"""tch$p AS (SELECT DISTINCT query_id FROM rev$p)""",
      s"""rep$p AS (
         |  SELECT query_id, rank, neighbor_id, score FROM (
         |    SELECT query_id, neighbor_id, score,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, neighbor_id) AS rank
         |    FROM (
         |      SELECT e.src AS query_id, e.dst AS neighbor_id, e.s AS score
         |      FROM pe$l e JOIN tch$p t ON t.query_id = e.src
         |      UNION ALL
         |      SELECT query_id, neighbor_id, score FROM rev$p) u) t
         |  WHERE rank <= $degree)""".stripMargin,
      s"""upd$p AS (
         |  SELECT e.src AS query_id, e.r AS rank, e.dst AS neighbor_id,
         |    e.s AS score
         |  FROM pe$l e
         |  WHERE e.src NOT IN (SELECT query_id FROM tch$p)
         |  UNION ALL
         |  SELECT query_id, rank, neighbor_id, score FROM rep$p
         |  UNION ALL
         |  SELECT query_id, rank, neighbor_id, score FROM fwd$p)""".stripMargin
    ).mkString(",\n")
  }

  /** Shared preamble for the repair twins: the < 100 corpus, all-pairs
    * cosine, md5 levels, the oracle-derived deletion set, and the
    * per-layer degree-4 brute graphs `e0..e2` (with scores and ranks). */
  private def repairPreambleSql: String =
    s"""emb AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60),
       |ap AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    ${cosSql("a.embedding", "b.embedding")} AS s
       |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
       |lv AS (
       |  SELECT vec_id,
       |    (CASE WHEN h % 4 = 0 THEN 1 ELSE 0 END +
       |     CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END) AS level
       |  FROM (SELECT vec_id,
       |      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))
       |        AS BIGINT) AS h
       |    FROM emb) t),
       |del AS (
       |  SELECT vec_id FROM (
       |    SELECT vec_id FROM lv WHERE level >= 1
       |    ORDER BY vec_id LIMIT 2) t
       |  UNION ALL
       |  SELECT min(vec_id) FROM lv WHERE level = 0
       |  UNION ALL
       |  SELECT CAST(999999 AS BIGINT)),
       |e0 AS (
       |  SELECT src, dst, s, r FROM (
       |    SELECT src, dst, s,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
       |    FROM ap) t WHERE r <= 4),
       |e1 AS (
       |  SELECT src, dst, s, r FROM (
       |    SELECT src, dst, s,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
       |    FROM ap WHERE src IN (SELECT vec_id FROM lv WHERE level >= 1)
       |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 1)) t
       |  WHERE r <= 4),
       |e2 AS (
       |  SELECT src, dst, s, r FROM (
       |    SELECT src, dst, s,
       |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
       |    FROM ap WHERE src IN (SELECT vec_id FROM lv WHERE level >= 2)
       |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 2)) t
       |  WHERE r <= 4)""".stripMargin

  /** One layer's repair replay: kept edges, affected sources, per-layer
    * entry (lowest surviving source), the reachable set over kept edges
    * (recursive CTE — the saturated walk's visited set, so the replay
    * holds even if the deletion fragments the layer), candidates =
    * reachable ∪ surviving out-edges, top-`degree` re-rank. NOTE the
    * explicit DISTINCT in `cand`: inside a WITH RECURSIVE block DuckDB
    * treats UNION in non-recursive CTEs as UNION ALL (observed at
    * e_ann_graph_repair), so the engine's pair-dedup must be spelled
    * out. */
  private def repairLayerSql(l: Int, degree: Int): String =
    s"""kept$l AS (
       |  SELECT src, dst, s FROM e$l
       |  WHERE src NOT IN (SELECT vec_id FROM del)
       |    AND dst NOT IN (SELECT vec_id FROM del)),
       |aff$l AS (
       |  SELECT DISTINCT src AS query_id FROM e$l
       |  WHERE dst IN (SELECT vec_id FROM del)
       |    AND src NOT IN (SELECT vec_id FROM del)),
       |ent$l AS (
       |  SELECT min(src) AS e FROM e$l
       |  WHERE src NOT IN (SELECT vec_id FROM del)),
       |reach$l AS (
       |  SELECT (SELECT e FROM ent$l) AS node
       |  UNION
       |  SELECT k.dst FROM kept$l k JOIN reach$l r ON k.src = r.node),
       |cand$l AS (
       |  SELECT DISTINCT query_id, neighbor_id FROM (
       |    SELECT a.query_id, r.node AS neighbor_id
       |    FROM aff$l a JOIN reach$l r ON r.node <> a.query_id
       |    UNION ALL
       |    SELECT k.src AS query_id, k.dst AS neighbor_id
       |    FROM kept$l k JOIN aff$l a ON k.src = a.query_id) u),
       |rep$l AS (
       |  SELECT query_id, rank, neighbor_id, s FROM (
       |    SELECT c.query_id, c.neighbor_id, ap.s,
       |      ROW_NUMBER() OVER (PARTITION BY c.query_id
       |        ORDER BY ap.s DESC, c.neighbor_id) AS rank
       |    FROM cand$l c JOIN ap ON ap.src = c.query_id
       |      AND ap.dst = c.neighbor_id) t
       |  WHERE rank <= $degree)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "e_ann_hnsw_pq" -> hnswPqSql,

    "e_ann_hnsw_stats" ->
      (s"""WITH emb AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
         |ap AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${cosSql("a.embedding", "b.embedding")} AS s
         |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
         |lv AS (
         |  SELECT vec_id,
         |    (CASE WHEN h % 4 = 0 THEN 1 ELSE 0 END +
         |     CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END) AS level
         |  FROM (SELECT vec_id,
         |      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))
         |        AS BIGINT) AS h
         |    FROM emb) t),
         |alledges AS (
         |  SELECT 0 AS layer, src, r FROM (
         |    SELECT src, dst, s,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap) t WHERE r <= 4
         |  UNION ALL
         |  SELECT 1 AS layer, src, r FROM (
         |    SELECT src, dst, s,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap
         |    WHERE src IN (SELECT vec_id FROM lv WHERE level >= 1)
         |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 1)) t
         |  WHERE r <= 4
         |  UNION ALL
         |  SELECT 2 AS layer, src, r FROM (
         |    SELECT src, dst, s,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap
         |    WHERE src IN (SELECT vec_id FROM lv WHERE level >= 2)
         |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 2)) t
         |  WHERE r <= 4)
         |SELECT layer, COUNT(DISTINCT src) AS n_nodes,
         |  COUNT(*) AS n_edges, MAX(r) AS max_degree
         |FROM alledges GROUP BY layer ORDER BY layer""".stripMargin),

    "e_ann_hnsw_filtered" ->
      Round20Queries.hnswSql(finalFilter = "AND node % 3 = 0"),

    "e_ann_hnsw_repair" ->
      ("WITH RECURSIVE " + repairPreambleSql + ",\n" +
        (0 to 2).map(l => repairLayerSql(l, degree = 4)).mkString(",\n") +
        "\n" +
        s"""SELECT layer, query_id, rank, neighbor_id,
         |  ROUND(s, 6) AS cos_sim
         |FROM (
         |  SELECT 0 AS layer, * FROM rep0
         |  UNION ALL SELECT 1 AS layer, * FROM rep1
         |  UNION ALL SELECT 2 AS layer, * FROM rep2)
         |ORDER BY layer, query_id, rank""".stripMargin),

    "e_ann_hnsw_repair_receipts" ->
      ("WITH " + repairPreambleSql + ",\n" +
        s"""alledges AS (
         |  SELECT 0 AS layer, src, dst FROM e0
         |  UNION ALL SELECT 1 AS layer, src, dst FROM e1
         |  UNION ALL SELECT 2 AS layer, src, dst FROM e2),
         |outr AS (
         |  SELECT src AS vec_id, COUNT(*) AS n_out FROM alledges
         |  WHERE src IN (SELECT vec_id FROM del) GROUP BY 1),
         |inr AS (
         |  SELECT dst AS vec_id, COUNT(*) AS n_in FROM alledges
         |  WHERE dst IN (SELECT vec_id FROM del) GROUP BY 1),
         |repc AS (
         |  SELECT vec_id, COUNT(*) AS n_rep FROM (
         |    SELECT DISTINCT layer, src, dst AS vec_id FROM alledges
         |    WHERE dst IN (SELECT vec_id FROM del)
         |      AND src NOT IN (SELECT vec_id FROM del)) t
         |  GROUP BY 1)
         |SELECT d.vec_id,
         |  COALESCE(outr.n_out, 0) AS n_out_removed,
         |  COALESCE(inr.n_in, 0) AS n_in_removed,
         |  (COALESCE(outr.n_out, 0) + COALESCE(inr.n_in, 0)) > 0
         |    AS was_indexed,
         |  COALESCE(repc.n_rep, 0) AS n_repaired
         |FROM del d
         |LEFT JOIN outr ON outr.vec_id = d.vec_id
         |LEFT JOIN inr ON inr.vec_id = d.vec_id
         |LEFT JOIN repc ON repc.vec_id = d.vec_id
         |ORDER BY d.vec_id""".stripMargin),

    "e_ann_hnsw_insert" ->
      (s"""WITH emb AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 120),
         |ap AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${cosSql("a.embedding", "b.embedding")} AS s
         |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
         |lv AS (
         |  SELECT vec_id,
         |    (CASE WHEN h % 4 = 0 THEN 1 ELSE 0 END +
         |     CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END) AS level
         |  FROM (SELECT vec_id,
         |      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))
         |        AS BIGINT) AS h
         |    FROM emb) t),
         |entry0 AS (
         |  SELECT min(vec_id) AS e FROM lv WHERE vec_id % 20 <> 7),
         |entry1 AS (
         |  SELECT min(vec_id) AS e FROM lv
         |  WHERE vec_id % 20 <> 7 AND level >= 1),
         |entry2 AS (
         |  SELECT min(vec_id) AS e FROM lv
         |  WHERE vec_id % 20 <> 7 AND level >= 2),
         |pe0 AS (
         |  SELECT src, dst, s, r FROM (
         |    SELECT src, dst, s,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap WHERE src % 20 <> 7 AND dst % 20 <> 7) t
         |  WHERE r <= 4),
         |pe1 AS (
         |  SELECT src, dst, s, r FROM (
         |    SELECT src, dst, s,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap WHERE src % 20 <> 7 AND dst % 20 <> 7
         |      AND src IN (SELECT vec_id FROM lv WHERE level >= 1)
         |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 1)) t
         |  WHERE r <= 4),
         |pe2 AS (
         |  SELECT src, dst, s, r FROM (
         |    SELECT src, dst, s,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap WHERE src % 20 <> 7 AND dst % 20 <> 7
         |      AND src IN (SELECT vec_id FROM lv WHERE level >= 2)
         |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 2)) t
         |  WHERE r <= 4),
         |qs AS (
         |  SELECT src AS query_id, dst AS node, s AS score
         |  FROM ap WHERE src % 20 = 7 AND dst % 20 <> 7),
         |b0 AS (SELECT vec_id FROM emb WHERE vec_id % 20 = 7),
         |b1 AS (SELECT b.vec_id FROM b0 b
         |       JOIN lv ON lv.vec_id = b.vec_id AND lv.level >= 1),
         |b2 AS (SELECT b.vec_id FROM b0 b
         |       JOIN lv ON lv.vec_id = b.vec_id AND lv.level >= 2),
         |""".stripMargin +
        (0 to 2).map(l => insertLayerSql(l, beam = 3, degree = 4))
          .mkString(",\n") + "\n" +
        s"""SELECT layer, query_id, rank, neighbor_id,
         |  ROUND(score, 6) AS cos_sim
         |FROM (
         |  SELECT 0 AS layer, * FROM upd_i0
         |  UNION ALL SELECT 1 AS layer, * FROM upd_i1
         |  UNION ALL SELECT 2 AS layer, * FROM upd_i2)
         |ORDER BY layer, query_id, rank""".stripMargin),

    "e_ann_hnsw_forget" ->
      (s"""WITH emb AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 120),
         |ap AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${cosSql("a.embedding", "b.embedding")} AS s
         |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
         |lv AS (
         |  SELECT vec_id,
         |    (CASE WHEN h % 4 = 0 THEN 1 ELSE 0 END +
         |     CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END) AS level
         |  FROM (SELECT vec_id,
         |      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))
         |        AS BIGINT) AS h
         |    FROM emb) t),
         |alledges AS (
         |  SELECT 0 AS layer, src, dst FROM (
         |    SELECT src, dst,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap) t WHERE r <= 4
         |  UNION ALL
         |  SELECT 1 AS layer, src, dst FROM (
         |    SELECT src, dst,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap
         |    WHERE src IN (SELECT vec_id FROM lv WHERE level >= 1)
         |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 1)) t
         |  WHERE r <= 4
         |  UNION ALL
         |  SELECT 2 AS layer, src, dst FROM (
         |    SELECT src, dst,
         |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
         |    FROM ap
         |    WHERE src IN (SELECT vec_id FROM lv WHERE level >= 2)
         |      AND dst IN (SELECT vec_id FROM lv WHERE level >= 2)) t
         |  WHERE r <= 4),
         |del AS (SELECT CAST(v AS BIGINT) AS vec_id
         |        FROM (VALUES (7), (44), (999999)) AS t(v)),
         |outr AS (
         |  SELECT src AS vec_id, COUNT(*) AS n_out FROM alledges
         |  WHERE src IN (SELECT vec_id FROM del) GROUP BY 1),
         |inr AS (
         |  SELECT dst AS vec_id, COUNT(*) AS n_in FROM alledges
         |  WHERE dst IN (SELECT vec_id FROM del) GROUP BY 1)
         |SELECT d.vec_id,
         |  COALESCE(outr.n_out, 0) AS n_out_removed,
         |  COALESCE(inr.n_in, 0) AS n_in_removed,
         |  (COALESCE(outr.n_out, 0) + COALESCE(inr.n_in, 0)) > 0
         |    AS was_indexed
         |FROM del d
         |LEFT JOIN outr ON outr.vec_id = d.vec_id
         |LEFT JOIN inr ON inr.vec_id = d.vec_id
         |ORDER BY d.vec_id""".stripMargin),

    "e_ann_ivf_twolevel" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |supers AS (
         |  SELECT centroid_id AS super_id, centroid AS super_c
         |  FROM cents WHERE centroid_id % 200 = 0),
         |c2s AS (
         |  SELECT centroid_id, super_id, centroid FROM (
         |    SELECT c.centroid_id, s.super_id, c.centroid,
         |      ROW_NUMBER() OVER (PARTITION BY c.centroid_id
         |        ORDER BY -(${Round13Queries.cosSql("c.centroid", "s.super_c")}) ASC,
         |          s.super_id ASC) AS rn
         |    FROM cents c CROSS JOIN supers s) t
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id, embedding, super_id FROM (
         |    SELECT e.vec_id, e.embedding, s.super_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY -(${Round13Queries.cosSql("e.embedding", "s.super_c")}) ASC,
         |          s.super_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN supers s) t
         |  WHERE rn <= 2),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT p.vec_id, m.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |        ORDER BY -(${Round13Queries.cosSql("p.embedding", "m.centroid")}) ASC,
         |          m.centroid_id ASC) AS rn
         |    FROM probes p JOIN c2s m ON p.super_id = m.super_id) t
         |  WHERE rn = 1)
         |SELECT vec_id, centroid_id FROM assigned ORDER BY vec_id""".stripMargin
  )
}
