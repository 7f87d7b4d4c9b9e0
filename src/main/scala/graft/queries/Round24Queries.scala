package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{GraphAnn, Similarity, TrainedState}

/** Round-14 additions: the COMPACTION-POLICY lifecycle under the gate —
  * a fold-in loop whose artifact compacts BY POLICY mid-stream
  * ([[graft.similarity.TrainedState.compactIfNeeded]], the r13 verdict's
  * "no production caller" gap) and then keeps folding deltas on top of
  * the compacted base, serving through the fingerprint-cached reconcile.
  * The planted-twin contract makes the whole interleaving
  * oracle-exact: a twin's mutual edge with its original survives any
  * degree prune, any fold order, and any compaction, so each
  * original's served top-1 is its twin at cosine 1 regardless of which
  * persistence path every intermediate step took.
  */
object Round24Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // save → fold batch 1 as a delta → POLICY COMPACTION fires
    // (maxGenerations = 1) → fold batch 2 as a delta on the compacted
    // base → serve through loadGraphIndexCached (reconciled: base from
    // the compaction + batch 2's generation). Twins 0..4 reach the
    // serve only through compacted-in edges, twins 5..9 only through
    // the live delta generation — one query pins both halves of the
    // fold/compact/fold interleaving against the exact oracle.
    "e_ann_graph_fold_compact" -> ((s, dir) => {
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val edges = Similarity.bruteTopK(base, base, 6).localCheckpoint(true)
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_gfold_idx_" + Integer.toHexString(dir.hashCode))
        .getAbsolutePath
      TrainedState.saveGraphIndex(edges, idxPath)
      def plant(lo: Int, hi: Int) = base
        .filter(col("vec_id") >= lo && col("vec_id") < hi)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      // trigger 1: fold twins 0..4, then the policy compaction folds
      // the generation into the base (threshold 1)
      val b1 = plant(0, 5)
      val loaded1 = TrainedState.loadGraphIndexCached(s, idxPath)
      val (_, chg1) = GraphAnn.insertBySearchParts(loaded1, base, b1,
        entryId = 0L, beam = 64, hops = 64, degree = 6, batchBound = 5L)
      TrainedState.appendGraphDelta(chg1, idxPath)
      TrainedState.compactIfNeeded(s, idxPath, maxGenerations = 1L)(
        TrainedState.compactGraphIndex(_, _))
      // trigger 2: fold twins 5..9 against the COMPACTED artifact;
      // this generation stays live (1 < threshold would now hold a
      // fleet's default — here it simply is not compacted again)
      val corpus1 = base.unionByName(b1)
      val b2 = plant(5, 10)
      val loaded2 = TrainedState.loadGraphIndexCached(s, idxPath)
      val (_, chg2) = GraphAnn.insertBySearchParts(loaded2, corpus1, b2,
        entryId = 0L, beam = 64, hops = 64, degree = 6, batchBound = 5L)
      TrainedState.appendGraphDelta(chg2, idxPath)
      // serve: the reconciled load must route every original to its
      // twin — 0..4 through compacted base files, 5..9 through the
      // delta generation
      val served = TrainedState.loadGraphIndexCached(s, idxPath)
      val full = corpus1.unionByName(b2)
      GraphAnn.searchGraph(
          base.filter(col("vec_id") < 10), served, full,
          entryId = 0L, beam = 84, hops = 64, k = 1, queryBound = 10L)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // The LAYERED artifact through the same interleaving: build a
    // 2-layer HNSW over the base, save, fold twin batch 1 as a delta
    // (insertWithDelta's layer-tagged changed slice) → policy
    // compaction folds it → fold twin batch 2 → serve via searchAuto
    // (entry re-derived from the reconciled index) at saturating
    // budgets. Twins 0..4 live only in compacted base files, twins
    // 5..9 only in the live generation; each original's served top-1
    // must be its twin at cosine 1 either way.
    "e_ann_hnsw_fold_compact" -> ((s, dir) => {
      import graft.similarity.Hnsw
      val base = load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_hfold_idx_" + Integer.toHexString(dir.hashCode))
        .getAbsolutePath
      TrainedState.saveHnswIndex(
        Hnsw.buildIndex(base, degree = 6, m = 4, maxLevel = 1), idxPath)
      def plant(lo: Int, hi: Int) = base
        .filter(col("vec_id") >= lo && col("vec_id") < hi)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val b1 = plant(0, 5)
      val (_, chg1) = Hnsw.insertWithDelta(
        TrainedState.loadHnswIndexCached(s, idxPath), b1, base,
        m = 4, maxLevel = 1, beam = 64, hops = 64, degree = 6)
      TrainedState.appendHnswDelta(chg1, idxPath)
      TrainedState.compactIfNeeded(s, idxPath, maxGenerations = 1L)(
        TrainedState.compactHnswIndex(_, _))
      val corpus1 = base.unionByName(b1)
      val b2 = plant(5, 10)
      val (_, chg2) = Hnsw.insertWithDelta(
        TrainedState.loadHnswIndexCached(s, idxPath), b2, corpus1,
        m = 4, maxLevel = 1, beam = 64, hops = 64, degree = 6)
      TrainedState.appendHnswDelta(chg2, idxPath)
      val served = TrainedState.loadHnswIndexCached(s, idxPath)
      val full = corpus1.unionByName(b2)
      Hnsw.searchAuto(base.filter(col("vec_id") < 10), served, full,
          beamUpper = 8, hopsUpper = 8, beam = 84, hops = 64, k = 1)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // The planted-duplicate contract survives the save → fold →
    // policy-compact → fold → cached-reconcile-serve interleaving
    // exactly: each original's top-1 is its twin at cosine 1.
    "e_ann_graph_fold_compact" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    // The layered interleaving serves the same planted contract: the
    // twin's mutual layer-0 edge survives any prune, fold order, and
    // compaction, and the saturating walk reaches it from any entry.
    "e_ann_hnsw_fold_compact" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  1.0 AS cos_sim
        |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin
  )
}
