package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{GraphAnn, Similarity, TrainedState}

/** Round-15 additions: the PERSISTED-CORPUS serving path under the
  * gate — the corpus-vectors artifact
  * ([[graft.similarity.TrainedState.saveVectors]] /
  * `appendVectorsDelta` / fingerprint-cached `loadVectorsCached`) that
  * the production fold-in loops now keep beside the edge index instead
  * of an in-memory per-trigger union. The planted-twin contract makes
  * the lifecycle oracle-exact end to end: every original's served
  * top-1 is its twin at cosine 1, with the corpus read back ENTIRELY
  * from the artifact (base + live delta generation), never from the
  * in-memory frames that wrote it.
  */
object Round25Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // save base vectors → append the planted twins as a delta
    // generation → serve a graph search whose SCORING SOURCE is the
    // reconciled artifact load. Twins only exist in the delta, so a
    // reconcile that dropped or duplicated generation rows would break
    // the exact contract; originals only exist in the base, so a load
    // that re-read base rows through the delta path would too.
    "e_ann_vectors_persisted" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val vecPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_vecart_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveVectors(base, vecPath)
      TrainedState.appendVectorsDelta(twins, vecPath)
      val corpus = TrainedState.loadVectorsCached(s, vecPath)
      // graph over the artifact corpus: edges from the full reconciled
      // set, then a saturating walk — one code path with the e_ann
      // family, so the twin-at-rank-1 contract carries verbatim
      val edges = Similarity.bruteTopK(corpus, corpus, 6)
      GraphAnn.searchGraph(
          base.filter(col("vec_id") < 10), edges, corpus,
          entryId = 0L, beam = 84, hops = 64, k = 1, queryBound = 10L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // TWO-LEVEL IVF PROBE through the persisted index at the
    // saturating fan-out (the exactness dial: every super probed ⇒
    // identical candidate ranking to the flat probe), so the planted
    // contract is exact: each original's top-1 is its twin at cosine 1
    // — the twin's identical vector lands in the SAME argmin cell as
    // the original, and that cell is every original-query's
    // nearest-ranked cell.
    // TOMBSTONE deltas on the corpus-vectors artifact: save base →
    // append planted twins as a delta → FORGET the twins (a newer
    // tombstone generation must outrank the append under newest-wins)
    // → serve brute from the reconciled load. The result must equal
    // brute over the base alone — as if the twins never existed — so
    // a reconcile that leaked a tombstoned row (every query's top-1
    // would be its twin at cosine 1) or dropped a live one fails the
    // oracle loudly.
    "e_ann_vectors_forget" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val vecPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_vecforget_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveVectors(base, vecPath)
      TrainedState.appendVectorsDelta(twins, vecPath)
      TrainedState.forgetVectorsDelta(twins.select(col("vec_id")), vecPath)
      Similarity.bruteTopK(
          base.filter(col("vec_id") < 10),
          TrainedState.loadVectorsCached(s, vecPath), k = 1)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // The FULLY-PERSISTED late-interaction funnel: token bags live as
    // a doc_id-sorted artifact (saveTokens → appendTokensDelta →
    // reconciled loadTokensCached), the pooled coarse side is derived
    // FROM the reconciled artifact and persisted (savePooled →
    // loadPooledCached), and the funnel serves from the two paths
    // alone. The base deliberately writes CORRUPTED rows (negated
    // floats) for the first 100 tokens and the delta re-appends the
    // correct ones — newest-wins per (doc_id, token_idx) must pick the
    // delta generation for the result to match the e_maxsim_funnel
    // oracle bit for bit, so a reconcile that dropped, duplicated, or
    // mis-keyed token rows fails the gate loudly.
    "e_maxsim_tokens_persisted" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") % 5).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
      val dv = emb.select((col("vec_id") % 50).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      val corrupted = dv.filter(col("token_idx") < 100)
        .withColumn("embedding", transform(col("embedding"), x => -x))
      val tokPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_tokart_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveTokens(
        dv.filter(col("token_idx") >= 100).unionByName(corrupted), tokPath)
      TrainedState.appendTokensDelta(dv.filter(col("token_idx") < 100),
        tokPath)
      val tokens = TrainedState.loadTokensCached(s, tokPath)
      val pooledPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_poolart_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.savePooled(
        graft.similarity.LateInteraction.poolSum(tokens, "doc_id", 64),
        pooledPath, dims = 64)
      graft.similarity.LateInteraction.maxSimFunnelWith(qv, tokens,
          TrainedState.loadPooledCached(s, pooledPath), k = 3, dims = 64,
          shortlist = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // The full lazy-delete → CONSOLIDATE lifecycle on a persisted
    // graph deployment: graph + vectors built over base ∪ twins, the
    // twins tombstoned (vectors artifact only — edges still name
    // them), then consolidateGraphArtifact derives the dangling ids
    // from the two artifacts' disagreement, repairs every surviving
    // out-list that lost an edge, and rewrites the edge base. The
    // saturating serve over the consolidated artifacts must equal
    // brute over the base alone — a leaked twin (top-1 at cosine 1), a
    // dropped live row, or a repair that fractured reachability all
    // fail the oracle.
    "e_ann_graph_consolidate" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = base.unionByName(twins)
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_gcons_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveGraphIndex(
        Similarity.bruteTopK(corpus, corpus, 6), s"$root/graph")
      TrainedState.saveVectors(corpus, s"$root/graph.vectors")
      TrainedState.forgetVectorsDelta(twins.select(col("vec_id")),
        s"$root/graph.vectors")
      TrainedState.consolidateGraphArtifact(s, s"$root/graph",
        s"$root/graph.vectors", entryId = 0L, beam = 8, hops = 6,
        degree = 6)
      GraphAnn.searchGraph(
          base.filter(col("vec_id") < 10),
          TrainedState.loadGraphIndexCached(s, s"$root/graph"),
          TrainedState.loadVectorsCached(s, s"$root/graph.vectors"),
          entryId = 0L, beam = 84, hops = 64, k = 1, queryBound = 10L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // The lazy-delete → consolidate lifecycle on the LAYERED artifact:
    // 2-layer HNSW + vectors built over base ∪ twins, twins tombstoned,
    // consolidateHnswArtifact repairs per layer (re-electing live
    // entries where a deleted node was one), and the saturating
    // hierarchical serve over the consolidated artifacts must equal
    // brute over the base alone.
    "e_ann_hnsw_consolidate" -> ((s, dir) => {
      import graft.similarity.Hnsw
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = base.unionByName(twins)
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_hcons_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveHnswIndex(
        Hnsw.buildIndex(corpus, degree = 6, m = 4, maxLevel = 1),
        s"$root/hnsw")
      TrainedState.saveVectors(corpus, s"$root/hnsw.vectors")
      TrainedState.forgetVectorsDelta(twins.select(col("vec_id")),
        s"$root/hnsw.vectors")
      TrainedState.consolidateHnswArtifact(s, s"$root/hnsw",
        s"$root/hnsw.vectors", beam = 8, hops = 6, degree = 6)
      Hnsw.searchAuto(
          base.filter(col("vec_id") < 10),
          TrainedState.loadHnswIndexCached(s, s"$root/hnsw"),
          TrainedState.loadVectorsCached(s, s"$root/hnsw.vectors"),
          beamUpper = 8, hopsUpper = 8, beam = 84, hops = 64, k = 1)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // TOMBSTONE deltas on the token-bag artifact: save the live docs
    // PLUS planted twin docs (each query's bag verbatim, ids
    // 100+query_id), then FORGET the twins through forgetTokensDelta
    // (the tombstone generation enumerates the twins' (doc_id,
    // token_idx) keys from the artifact itself) and serve the brute
    // funnel from the artifacts. A leaked twin token would put the
    // twin at rank 1 / score 2e6 for its query; the oracle is the
    // twin-free e_maxsim_funnel replay, so the result must be as if
    // the twins were never ingested.
    "e_maxsim_tokens_forget" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") % 5).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
      val twins = qv.select((col("query_id") + 100L).as("doc_id"),
        col("token_idx"), col("embedding"))
      val dv = emb.select((col("vec_id") % 50).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_tokforget_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveTokens(dv.unionByName(twins), s"$root/tokens")
      TrainedState.forgetTokensDelta(s,
        twins.select(col("doc_id")).distinct(), s"$root/tokens")
      val tokens = TrainedState.loadTokensCached(s, s"$root/tokens")
      TrainedState.savePooled(
        graft.similarity.LateInteraction.poolSum(tokens, "doc_id", 64),
        s"$root/pooled", dims = 64)
      graft.similarity.LateInteraction.maxSimFunnelWith(qv, tokens,
          TrainedState.loadPooledCached(s, s"$root/pooled"), k = 3,
          dims = 64, shortlist = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // The ANN-COARSE MaxSim funnel (the 100 TB ColBERT serving shape:
    // probed IVF over mean-pooled vectors shortlists, id-pruned MaxSim
    // rerank scores) with a planted-twin exact contract: each query's
    // token bag is planted VERBATIM as a doc (ids 100+query_id). The
    // twin's mean vector is the query's mean vector, so it lands in
    // the query's own argmin cell and tops the coarse ranking at
    // cosine 1; MaxSim then scores it at exactly n_tokens · 1e6 (every
    // query token matches its identical twin token at cosine 1) —
    // strictly maximal, so top-1 = twin at score 2e6 for these 2-token
    // bags. Query ids ride at +1000 (the no-collision contract).
    "e_maxsim_funnel_ann" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") < 10)
        .select((lit(1000L) + col("vec_id") % 5).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
      val twins = qv.select((col("query_id") - 900L).as("doc_id"),
        col("token_idx"), col("embedding"))
      val dv = emb.select((col("vec_id") % 50).as("doc_id"),
          col("vec_id").as("token_idx"), col("embedding"))
        .unionByName(twins)
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_msann_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveTokens(dv, s"$root/tokens")
      val tokens = TrainedState.loadTokensCached(s, s"$root/tokens")
      val means = graft.similarity.LateInteraction.meanVectors(
        graft.similarity.LateInteraction.poolSum(tokens, "doc_id", 64))
      val cents = means.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      TrainedState.saveCentroids(cents, s"$root/cents")
      TrainedState.saveIvfIndex(
        Similarity.ivfAssign(means, cents), s"$root/ivf")
      graft.similarity.LateInteraction.maxSimFunnelAnn(
          qv, tokens,
          TrainedState.loadIvfIndexCached(s, s"$root/ivf"),
          TrainedState.loadCentroids(s, s"$root/cents"),
          k = 1, dims = 64, shortlist = 4, nprobe = 3)
        .orderBy(col("query_id"))
    }),

    "e_ann_ivf_twolevel_probe" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = base.unionByName(twins)
      val cents = base.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val supers = Similarity.superCentroids(cents, stride = 30)
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_ivf2l_" + Integer.toHexString(dir.hashCode) + "_" +
          s.sparkContext.applicationId).getAbsolutePath
      TrainedState.saveIvfIndex(Similarity.ivfAssign(corpus, cents),
        idxPath)
      Similarity.ivfTopKFromIndexTwoLevel(
          base.filter(col("vec_id") < 10),
          TrainedState.loadIvfIndexCached(s, idxPath), k = 1, cents,
          supers, fanout = 64, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // The planted-duplicate contract through the persisted-corpus
    // lifecycle (save → delta append → reconciled load → serve): each
    // original's top-1 is its twin at cosine 1.
    "e_ann_vectors_persisted" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    // Forgotten twins must leave the serve as-if-never-ingested: brute
    // top-1 over the base corpus alone, self excluded.
    "e_ann_vectors_forget" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${Round13Queries.cosSql("q.embedding", "c.embedding")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10 AND c.vec_id < 60)
         |SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank = 1 ORDER BY query_id""".stripMargin,

    // Consolidation must serve as-if-the-twins-never-existed: the
    // e_ann_vectors_forget contract through the repaired edge base.
    "e_ann_graph_consolidate" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${Round13Queries.cosSql("q.embedding", "c.embedding")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10 AND c.vec_id < 60)
         |SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank = 1 ORDER BY query_id""".stripMargin,

    // Layered consolidation serves as-if-the-twins-never-existed: the
    // same brute-over-base contract through the repaired hierarchy.
    "e_ann_hnsw_consolidate" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${Round13Queries.cosSql("q.embedding", "c.embedding")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10 AND c.vec_id < 60)
         |SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank = 1 ORDER BY query_id""".stripMargin,

    // Tombstoned twin docs leave the funnel output exactly twin-free:
    // the e_maxsim_funnel replay verbatim.
    "e_maxsim_tokens_forget" ->
      Round17Queries.oracleSql("e_maxsim_funnel"),

    // The persisted-tokens funnel reconciles to exactly the live token
    // table, so the oracle is the e_maxsim_funnel replay verbatim.
    "e_maxsim_tokens_persisted" ->
      Round17Queries.oracleSql("e_maxsim_funnel"),

    // Planted twin bag: top-1 is the twin doc (query_id − 900) at the
    // maximal MaxSim score n_tokens·1e6 = 2e6.
    "e_maxsim_funnel_ann" ->
      """SELECT DISTINCT 1000 + (vec_id % 5) AS query_id, 1 AS rank,
        |  100 + (vec_id % 5) AS doc_id, CAST(2000000 AS BIGINT) AS score
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    // Saturating fan-out = flat-probe semantics, so the planted twin
    // serves at rank 1, cosine 1 for every original.
    "e_ann_ivf_twolevel_probe" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin
  )
}
