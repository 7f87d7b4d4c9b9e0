package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GRAPH-BASED ANN: deterministic beam search over a prebuilt kNN graph
  * — the NSW/HNSW family's base-layer search, the third major ANN
  * architecture next to the hashing (LSH) and clustering (IVF/PQ)
  * families already in [[Similarity]] / [[IvfPq]]. The reference engine
  * has no ANN at all (its queries are exact relational pipelines over
  * metered readings); this is part of the training-data extension
  * surface, mirroring how FAISS/Lucene pair a graph index with the
  * quantization ladder.
  *
  * Shape: the graph is the output of [[Similarity.knnGraph]] /
  * [[Similarity.knnGraphAdjacent]] / [[Similarity.bruteTopK]] — directed
  * edges `(query_id, rank, neighbor_id, …)` with bounded out-degree.
  * Search starts every query at one shared entry node, then repeats
  * `hops` rounds of: expand the current best `beam` visited nodes
  * through their out-edges, score the newly reached nodes against the
  * query, and fold them into the visited set. The answer is the top-k
  * of everything visited. With `beam` ≥ |corpus| and enough hops on a
  * connected graph this degenerates to exact brute force
  * (spec-pinned, the [[Similarity.knnGraphAdjacent]] convention).
  *
  * Determinism/oracle contract: scoring is the f32→f64 widened
  * left-to-right cosine of every other ANN surface here (`e_ann_brute`
  * conventions), ties break `(score desc, node asc)` at BOTH the beam
  * cut and the final top-k, and the entry node is caller-pinned — so a
  * fixed-hop search unrolls to chained SQL CTEs and the whole output
  * replays in DuckDB (`e_ann_graph`).
  *
  * Scale design (100 TB): the graph and corpus NEVER shuffle and are
  * never collected — each hop joins the corpus-sized edge table against
  * a broadcast frontier (|queries| × beam rows, bounded by the same
  * bounded-query-batch contract as [[Similarity.bruteTopK]]), and
  * embedding fetch for scoring is a broadcast semi-probe into the
  * corpus. Per-hop work is |frontier| × out-degree candidate rows —
  * independent of corpus size, the whole point of graph ANN. The
  * visited set is localCheckpoint'd each hop (the [[KMeans]] /
  * [[graft.text.BpeTrain]] iterative-lineage convention), so plans stay
  * flat for any hop count.
  */
object GraphAnn {

  /** Beam search every row of `queries` through `edges` over `corpus`.
    *
    * @param queries bounded batch `(vec_id, embedding)` — broadcast side
    * @param edges   kNN-graph edges `(query_id, neighbor_id)` (extra
    *                columns ignored) as produced by
    *                [[Similarity.knnGraph]]-family builders
    * @param corpus  `(vec_id, embedding)` — the scoring source of truth
    * @param entryId shared entry node (must exist in `corpus`); the
    *                deterministic analog of HNSW's top-layer entry point
    * @param beam    expansion width per hop (HNSW's efSearch analog)
    * @param hops    search rounds; 0 scores only the entry node
    * @param k       neighbors returned per query
    * @return `(query_id, rank, neighbor_id, cos_sim)` — rank 1..k by
    *         (cos_sim desc, neighbor_id asc) over the visited set minus
    *         the query itself; queries whose visited set holds only
    *         themselves emit no rows (the recall-zero convention)
    */
  def searchGraph(queries: DataFrame, edges: DataFrame, corpus: DataFrame,
                  entryId: Long, beam: Int, hops: Int, k: Int): DataFrame = {
    require(beam >= 1, s"searchGraph: beam=$beam must be >= 1")
    require(hops >= 0, s"searchGraph: hops=$hops must be >= 0")
    require(k >= 1, s"searchGraph: k=$k must be >= 1")
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val adj = edges.select(col("query_id").as("_src"),
      col("neighbor_id").as("_dst"))
    val nodes = corpus.select(col("vec_id").as("node"),
      col("embedding").as("n_emb"))

    // Score a small (query_id, node) candidate set: fetch each node's
    // embedding by streaming the corpus past the broadcast candidate
    // list, then attach the broadcast query embedding. Both joins keep
    // the big side shuffle-free.
    def score(cand: DataFrame): DataFrame =
      nodes.join(broadcast(cand), Seq("node"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("node"),
          Similarity.cosineGuarded(col("q_emb"), col("n_emb")).as("score"))

    val wBeam = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("node"))

    // hops = 0 stays a LAZY plan (no job at construction — the
    // simhashPairsFromSigs lesson); any hop > 0 is inherently an
    // iterative driver loop and materializes per round like [[KMeans]]
    var visited = score(
      q.select(col("query_id")).withColumn("node", lit(entryId)))
    if (hops > 0) visited = visited.localCheckpoint(true)
    var visitedCount = if (hops > 0) visited.count() else 0L
    var hop = 0
    var converged = false
    while (hop < hops && !converged) {
      val frontier = visited
        .withColumn("_r", row_number().over(wBeam))
        .filter(col("_r") <= beam)
        .select(col("query_id"), col("node"))
      // corpus-sized edge table joins the broadcast frontier — the only
      // big-table touch this hop, and it never shuffles
      val reached = adj.join(broadcast(frontier),
          adj("_src") === frontier("node"))
        .select(col("query_id"), col("_dst").as("node"))
        .distinct()
      val fresh = reached.join(visited.select(col("query_id"), col("node")),
        Seq("query_id", "node"), "left_anti")
      // eager per-hop materialization: visited is tiny (≤ |q|·beam·deg·hop)
      // and re-read 3× next round — the iterative-lineage convention
      visited = visited.unionByName(score(fresh)).localCheckpoint(true)
      // `hops` is a BUDGET: once a round adds no nodes, every further
      // round is a fixpoint, so stopping early returns the identical
      // answer (the count is free — visited is already materialized)
      val n = visited.count()
      converged = n == visitedCount
      visitedCount = n
      hop += 1
    }
    visited
      .filter(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(wBeam))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("node").as("neighbor_id"),
        col("score").as("cos_sim"))
  }
}
