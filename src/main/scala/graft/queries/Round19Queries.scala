package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{GraphAnn, Similarity}

/** Round-10 continuation: graph-based ANN — the third ANN architecture
  * (navigable-graph search, the NSW/HNSW family's base layer) next to
  * the hashing (LSH) and clustering (IVF / PQ / BQ) families already
  * under the gate. The search is deterministic by construction (pinned
  * entry node, fixed beam/hop budget, the `e_ann_brute` f64 scoring and
  * tie-break conventions), so the WHOLE search — graph build, per-hop
  * beam cut, expansion, final top-k — replays in DuckDB as chained
  * CTEs, one pair per hop.
  */
object Round19Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Beam search over a degree-4 exact kNN graph: 6 probes, entry node
    // 0, beam 3, 2 hops, top-3. Every visited candidate's score and both
    // beam cuts replay in SQL — a recall statement with no slack.
    "e_ann_graph" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding"))
      val probes = corpus.filter(col("vec_id") % 20 === 0)
      val edges = Similarity.bruteTopK(corpus, corpus, 4)
      GraphAnn.searchGraph(probes, edges, corpus,
          entryId = 0L, beam = 3, hops = 2, k = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // INCREMENTAL graph-index growth: planted copies attach by
    // insert-by-search (the NSW insert — no rebuild), then a saturating
    // search over the UPDATED graph must reach each copy and pin it at
    // cosine 1. The contract is prune-proof: a duplicate scores 1
    // against its original, so the mutual edge survives any degree cut,
    // and saturating beam search on a connected graph visits everything
    // reachable — so a miss can only mean insert broke reachability.
    "e_ann_graph_incremental" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      // degree 6, not 4: the degree-4 kNN graph over this corpus slice
      // has 3 nodes unreachable from entry 0 (measured at sf0.01) —
      // degree 6 is entry-connected at every gate SF, including after
      // the insert re-prune (simulated exactly)
      // the beam loop re-reads its edge table EVERY hop — a persisted
      // index serves that read at scale (isin row-group pruning); these
      // DERIVED edge tables are materialized once instead of replaying
      // the graph-build plan per hop (caller-owned persistence, the
      // searchGraph contract)
      val edges = Similarity.bruteTopK(base, base, 6).localCheckpoint(true)
      val planted = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      // both batches are exactly 20 rows by construction (vec_id 0..19
      // exist at every gate SF) — the caller-known bound lets both
      // walks skip their guard count job (r13 added one per flat walk;
      // the bound removes it where the caller already knows the size)
      val updated = graft.similarity.GraphAnn.insertBySearch(
        edges, base, planted, entryId = 0L, beam = 64, hops = 64,
        degree = 6, batchBound = 20L).localCheckpoint(true)
      val full = base.unionByName(planted)
      graft.similarity.GraphAnn.searchGraph(
          base.filter(col("vec_id") < 20), updated, full,
          entryId = 0L, beam = 84, hops = 64, k = 1, queryBound = 20L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // Metadata-FILTERED graph search: the walk is unfiltered (a filtered
    // expansion would disconnect the graph), the predicate binds at the
    // final rank — top-3 of (visited ∩ vec_id%3==0). FULLY oracled: the
    // e_ann_graph unrolled-hop CTEs plus one WHERE clause.
    "e_ann_graph_filtered" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding"))
      val probes = corpus.filter(col("vec_id") % 20 === 0)
      val edges = Similarity.bruteTopK(corpus, corpus, 4)
      graft.similarity.GraphAnn.searchGraphFiltered(probes, edges, corpus,
          entryId = 0L, beam = 3, hops = 2, k = 3,
          pred = col("vec_id") % 3 === 0)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // The efSearch DIAL as oracled data: recall@3 of the beam search vs
    // exact brute force at beams 1/2/4 (hops 2) — every probe emits a
    // row per beam (a recall-zero probe must show n_hit = 0, the
    // e_ann_quant_recall convention), and the WHOLE dial replays in
    // DuckDB: per-beam unrolled hop CTEs over the shared all-pairs
    // scores, so wider-beam ≥ narrower-beam recall is verified VALUE by
    // VALUE, not asserted.
    "e_ann_graph_recall" -> ((s, dir) => {
      val corpus = load(s, dir, "embeddings").filter(col("vec_id") < 120)
        .select(col("vec_id"), col("embedding"))
      val probes = corpus.filter(col("vec_id") % 20 === 0)
        .localCheckpoint(true)
      val edges = Similarity.bruteTopK(corpus, corpus, 4)
        .localCheckpoint(true)
      val exact = Similarity.bruteTopK(probes, corpus, 3)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val perBeam = GraphRecallBeams.map { b =>
        val got = graft.similarity.GraphAnn.searchGraph(probes, edges,
            corpus, entryId = 0L, beam = b, hops = 2, k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val hits = exact.join(got, Seq("query_id", "neighbor_id"),
            "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        probes.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(lit(b).as("beam"), col("query_id"),
            coalesce(col("hits"), lit(0L)).as("n_hit"))
      }
      perBeam.reduce(_.unionByName(_)).orderBy(col("beam"), col("query_id"))
    }),

    // DiskANN-shaped serving: graph beam search scored by PQ codes (the
    // hop loop reads adjacency + numSub-int code rows only; the float
    // corpus is touched once, by the exact re-rank). Planted contract:
    // an exact duplicate shares the query's codes, rides the beam at the
    // query's own ADC self-score through the (simulated-connected)
    // degree-6 graph, and the exact re-rank pins cosine 1.
    "e_ann_graph_pq" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val planted = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = base.unionByName(planted)
      val edges = Similarity.bruteTopK(corpus, corpus, 6)
        .localCheckpoint(true)
      val books = graft.similarity.ProductQuantizer.codebooks(
        corpus, dim = 64, numSub = 4, stride = 10)
      val codes = graft.similarity.ProductQuantizer.encode(
        corpus, books, dim = 64, numSub = 4).localCheckpoint(true)
      graft.similarity.GraphAnn.searchGraphPq(
          base.filter(col("vec_id") < 20), edges, codes, books,
          dim = 64, numSub = 4, corpus, entryId = 0L, beam = 84,
          hops = 16, k = 1, rerank = 32)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // Graph-index FORGET with per-id deletion receipts — FULLY oracled:
    // on a brute degree-3 graph the receipts are pure rank arithmetic
    // (out_removed = out-degree 3 for indexed ids, in_removed = how
    // often the id ranks top-3 for someone else), so DuckDB replays
    // every count, including the negative confirmation for an id that
    // was never indexed.
    "e_ann_graph_forget" -> ((s, dir) => {
      import s.implicits._
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"), col("embedding"))
      val edges = Similarity.bruteTopK(base, base, 3)
      val (kept, receipts) = graft.similarity.GraphAnn.graphForget(
        edges, Seq(0L, 25L, 50L, 75L, 999999L).toDF("vec_id"))
      // surviving-edge count rides along as a cross-check that the kept
      // side dropped exactly what the receipts account for
      receipts
        .crossJoin(broadcast(kept.agg(count(lit(1)).as("n_kept_edges"))))
        .select(col("vec_id"), col("n_out_removed"), col("n_in_removed"),
          col("was_indexed"), col("n_kept_edges"))
        .orderBy(col("vec_id"))
    }),

    // REAL VIDEO-CONTAINER parse under the gate: two checked-in
    // uncompressed AVIs (RIFF chunk walk, 24-bit BI_RGB bottom-up DIB
    // frames — a true video container, not an animation format) share
    // exactly one rendered frame; frameDupPairs must surface exactly
    // that cross-video pair. Constant-oracled like m_gif_content_id.
    "m_avi_content_id" -> ((s, dir) => {
      def bytes(name: String): Array[Byte] = {
        val in = getClass.getResourceAsStream(s"/multimodal/$name")
        require(in != null, s"resource $name missing")
        try in.readAllBytes() finally in.close()
      }
      val media = s.createDataset(Seq(
        graft.multimodal.Multimodal.MediaRow(1L, "video",
          bytes("clip_a.avi"), 16, 8, 0, 0),
        graft.multimodal.Multimodal.MediaRow(2L, "video",
          bytes("clip_b.avi"), 16, 8, 0, 0)))(
        org.apache.spark.sql.Encoders.product[
          graft.multimodal.Multimodal.MediaRow])
      graft.multimodal.Multimodal.frameDupPairs(media, maxHamming = 3)
        .select(col("media_a"), col("frame_a"), col("media_b"),
          col("frame_b"))
        .orderBy(col("media_a"), col("frame_a"))
    }),

    // TRAINED OPQ, end to end: learn the Procrustes rotation (1
    // alternation at bench strength), persist + reload it through
    // TrainedState (the train-once artifact split), retrain codebooks on
    // the final rotation, then serve. The planted contract is
    // rotation-proof: identical embeddings rotate identically under ANY
    // R, so the duplicate encodes to the query's own codes, survives the
    // ADC cut, and the exact re-score pins cosine 1 — same argument as
    // e_ann_pq_trained, now through a trained orthogonal transform.
    "e_ann_opq_trained" -> ((s, dir) => {
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val queries = load(s, dir, "embeddings").filter(col("vec_id") < 30)
      val trainHalf = load(s, dir, "embeddings")
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding"))
      val rotTrained = graft.similarity.Opq.trainRotation(trainHalf,
        dim = 64, numSub = 4, k = 16, kmeansIters = 1, opqIters = 1)
      // keyed by dir AND the Spark application id: two concurrent
      // processes on the same dataset must not interleave one artifact
      val rotPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_opq_rot_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      graft.similarity.TrainedState.saveRotation(s, rotTrained, rotPath)
      val rot = graft.similarity.TrainedState.loadRotation(s, rotPath)
      val books = graft.similarity.ProductQuantizer.codebooksKMeans(
        graft.similarity.Opq.applyRotation(trainHalf, rot),
        dim = 64, numSub = 4, k = 16, iters = 1)
      graft.similarity.Opq.topKOpq(queries, corpus, dim = 64, numSub = 4,
          k = 1, rot = rot, booksDf = books, rerank = 32)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }))

  private val GraphRecallBeams = Seq(1, 2, 4)

  /** One beam's unrolled 2-hop search as SQL CTEs (suffix `_b<beam>`),
    * over the shared `ap`/`edges` CTEs — the e_ann_graph oracle's blocks
    * parameterized by the beam width. */
  private def beamSearchSql(b: Int): String = {
    val s = s"_b$b"
    s"""v0$s AS (
       |  SELECT p.query_id, 0 AS node, ap.s AS score
       |  FROM p JOIN ap ON ap.src = p.query_id AND ap.dst = 0),
       |f1$s AS (
       |  SELECT query_id, node FROM (
       |    SELECT query_id, node,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, node) AS r
       |    FROM v0$s) t
       |  WHERE r <= $b),
       |n1$s AS (
       |  SELECT DISTINCT f.query_id, e.dst AS node
       |  FROM f1$s f JOIN edges e ON e.src = f.node
       |  WHERE NOT EXISTS (SELECT 1 FROM v0$s v
       |    WHERE v.query_id = f.query_id AND v.node = e.dst)),
       |v1$s AS (
       |  SELECT * FROM v0$s
       |  UNION ALL
       |  SELECT n.query_id, n.node, ap.s AS score
       |  FROM n1$s n JOIN ap ON ap.src = n.query_id AND ap.dst = n.node),
       |f2$s AS (
       |  SELECT query_id, node FROM (
       |    SELECT query_id, node,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, node) AS r
       |    FROM v1$s) t
       |  WHERE r <= $b),
       |n2$s AS (
       |  SELECT DISTINCT f.query_id, e.dst AS node
       |  FROM f2$s f JOIN edges e ON e.src = f.node
       |  WHERE NOT EXISTS (SELECT 1 FROM v1$s v
       |    WHERE v.query_id = f.query_id AND v.node = e.dst)),
       |v2$s AS (
       |  SELECT * FROM v1$s
       |  UNION ALL
       |  SELECT n.query_id, n.node, ap.s AS score
       |  FROM n2$s n JOIN ap ON ap.src = n.query_id AND ap.dst = n.node),
       |res$s AS (
       |  SELECT query_id, node AS neighbor_id FROM (
       |    SELECT query_id, node,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, node) AS rank
       |    FROM v2$s WHERE node <> query_id) t
       |  WHERE rank <= 3),
       |hits$s AS (
       |  SELECT e.query_id, COUNT(*) AS n
       |  FROM exact e JOIN res$s r
       |    ON r.query_id = e.query_id AND r.neighbor_id = e.neighbor_id
       |  GROUP BY 1)""".stripMargin
  }

  /** Shared all-pairs cosine CTE over the bounded corpus (self-pairs
    * included — the search scores a query against its own node when the
    * walk reaches it). The f32→f64 widened left-to-right fold of
    * `e_ann_brute`. */
  private val apSql =
    """WITH emb AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 120),
      |ap AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(list_zip(a.embedding, b.embedding),
      |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
      |      (x, y) -> x + y) /
      |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (x, y) -> x + y)) *
      |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (x, y) -> x + y))) AS s
      |  FROM emb a JOIN emb b ON true),
      |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "e_ann_opq_trained" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 30 ORDER BY query_id""".stripMargin,
    "e_ann_graph_incremental" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 20 ORDER BY query_id""".stripMargin,
    "m_avi_content_id" ->
      """SELECT CAST(1 AS BIGINT) AS media_a, 1 AS frame_a,
        |  CAST(2 AS BIGINT) AS media_b, 1 AS frame_b""".stripMargin,
    "e_ann_graph_pq" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 20 ORDER BY query_id""".stripMargin,
    "e_ann_graph_recall" -> (apSql +
      """edges AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
        |    FROM ap WHERE src <> dst) t
        |  WHERE r <= 4),
        |p AS (SELECT vec_id AS query_id FROM emb WHERE vec_id % 20 = 0),
        |exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT p.query_id, ap.dst AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY ap.s DESC, ap.dst) AS r
        |    FROM p JOIN ap ON ap.src = p.query_id AND ap.dst <> p.query_id) t
        |  WHERE r <= 3),
        |""".stripMargin +
      GraphRecallBeams.map(beamSearchSql).mkString(",\n") + "\n" +
      GraphRecallBeams.map(b =>
        s"""SELECT $b AS beam, p.query_id, COALESCE(h.n, 0) AS n_hit
           |FROM p LEFT JOIN hits_b$b h ON h.query_id = p.query_id""".stripMargin)
        .mkString("\nUNION ALL\n") +
      "\nORDER BY beam, query_id"),
    "e_ann_graph_forget" ->
      """WITH emb AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
        |ap AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list_zip(a.embedding, b.embedding),
        |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
        |      (x, y) -> x + y) /
        |    (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (x, y) -> x + y)) *
        |     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (x, y) -> x + y))) AS s
        |  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id),
        |edges AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
        |    FROM ap) t
        |  WHERE r <= 3),
        |del AS (SELECT CAST(v AS BIGINT) AS vec_id
        |        FROM (VALUES (0), (25), (50), (75), (999999)) AS t(v)),
        |kept AS (
        |  SELECT COUNT(*) AS n_kept_edges FROM edges
        |  WHERE src NOT IN (SELECT vec_id FROM del)
        |    AND dst NOT IN (SELECT vec_id FROM del)),
        |outr AS (
        |  SELECT src AS vec_id, COUNT(*) AS n_out FROM edges
        |  WHERE src IN (SELECT vec_id FROM del) GROUP BY 1),
        |inr AS (
        |  SELECT dst AS vec_id, COUNT(*) AS n_in FROM edges
        |  WHERE dst IN (SELECT vec_id FROM del) GROUP BY 1)
        |SELECT d.vec_id,
        |  COALESCE(outr.n_out, 0) AS n_out_removed,
        |  COALESCE(inr.n_in, 0) AS n_in_removed,
        |  (COALESCE(outr.n_out, 0) + COALESCE(inr.n_in, 0)) > 0
        |    AS was_indexed,
        |  kept.n_kept_edges
        |FROM del d
        |LEFT JOIN outr ON outr.vec_id = d.vec_id
        |LEFT JOIN inr ON inr.vec_id = d.vec_id
        |CROSS JOIN kept
        |ORDER BY d.vec_id""".stripMargin,
    "e_ann_graph_filtered" -> graphSearchOracle(
      "node <> query_id AND node % 3 = 0"),
    "e_ann_graph" -> graphSearchOracle("node <> query_id"))

  /** The e_ann_graph unrolled 2-hop oracle, parameterized by the final
    * rank's WHERE clause so the filtered twin shares every CTE. */
  private def graphSearchOracle(finalWhere: String): String = (apSql +
      """edges AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS r
        |    FROM ap WHERE src <> dst) t
        |  WHERE r <= 4),
        |p AS (SELECT vec_id AS query_id FROM emb WHERE vec_id % 20 = 0),
        |v0 AS (
        |  SELECT p.query_id, 0 AS node, ap.s AS score
        |  FROM p JOIN ap ON ap.src = p.query_id AND ap.dst = 0),
        |f1 AS (
        |  SELECT query_id, node FROM (
        |    SELECT query_id, node,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, node) AS r
        |    FROM v0) t
        |  WHERE r <= 3),
        |n1 AS (
        |  SELECT DISTINCT f1.query_id, e.dst AS node
        |  FROM f1 JOIN edges e ON e.src = f1.node
        |  WHERE NOT EXISTS (SELECT 1 FROM v0
        |    WHERE v0.query_id = f1.query_id AND v0.node = e.dst)),
        |v1 AS (
        |  SELECT * FROM v0
        |  UNION ALL
        |  SELECT n1.query_id, n1.node, ap.s AS score
        |  FROM n1 JOIN ap ON ap.src = n1.query_id AND ap.dst = n1.node),
        |f2 AS (
        |  SELECT query_id, node FROM (
        |    SELECT query_id, node,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, node) AS r
        |    FROM v1) t
        |  WHERE r <= 3),
        |n2 AS (
        |  SELECT DISTINCT f2.query_id, e.dst AS node
        |  FROM f2 JOIN edges e ON e.src = f2.node
        |  WHERE NOT EXISTS (SELECT 1 FROM v1
        |    WHERE v1.query_id = f2.query_id AND v1.node = e.dst)),
        |v2 AS (
        |  SELECT * FROM v1
        |  UNION ALL
        |  SELECT n2.query_id, n2.node, ap.s AS score
        |  FROM n2 JOIN ap ON ap.src = n2.query_id AND ap.dst = n2.node)
        |SELECT query_id, rank, neighbor_id, ROUND(score, 6) AS cos_sim
        |FROM (
        |  SELECT query_id, node AS neighbor_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, node) AS rank
        |  FROM v2 WHERE """.stripMargin + finalWhere + """) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
}
