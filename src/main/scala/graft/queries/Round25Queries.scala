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

    // The persisted-tokens funnel reconciles to exactly the live token
    // table, so the oracle is the e_maxsim_funnel replay verbatim.
    "e_maxsim_tokens_persisted" ->
      Round17Queries.oracleSql("e_maxsim_funnel"),

    // Saturating fan-out = flat-probe semantics, so the planted twin
    // serves at rank 1, cosine 1 for every original.
    "e_ann_ivf_twolevel_probe" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin
  )
}
