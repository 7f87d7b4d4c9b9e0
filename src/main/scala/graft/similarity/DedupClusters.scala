package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive dedup clustering: near-dup PAIRS (from MinHash/SimHash) form
  * a graph; keep-one-per-cluster needs its connected components. Iterative
  * min-label propagation PLUS pointer jumping (label ← label's label) over
  * the edge list — propagation alone moves a label one hop per round, so a
  * duplicate CHAIN of length L (the common near-dup topology) would take L
  * rounds; the jump halves the remaining depth each round, giving
  * O(log diameter) convergence. Each round is two shuffle joins; stale
  * per-round caches are unpersisted as the frontier advances.
  */
object DedupClusters {

  /** @param pairs edge list with columns (id_a, id_b)
    * @param ids   node universe (one column `id`)
    * @return (id, cluster) — cluster = min id reachable. The result is
    *         CACHED (it is the loop's fixpoint and would otherwise replay
    *         every round on first use); callers that keep the session
    *         alive after consuming it should `.unpersist()` it.
    */
  def connectedComponents(ids: DataFrame, pairs: DataFrame,
                          maxIter: Int = 12): DataFrame = {
    // both directions via ONE explode, not a union of two branches: the
    // pairs subtree (often an expensive similarity join) appears once in
    // the plan instead of twice — half the codegen and half the first
    // materialization before the cache takes over
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .distinct()
      .cache()
    var labels = ids.select(col("id"), col("id").as("cluster"))
    var prev: DataFrame = null
    // Convergence via the label-sum invariant: min-label propagation is
    // monotone non-increasing per node, so the total strictly decreases
    // exactly while something still changes — one cheap aggregate per
    // round instead of a join against the previous labels.
    var lastSum: java.math.BigDecimal = null
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate: min over neighbors' labels and own
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("cluster").as("n_cluster"))
      val propagated = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster")))
            .as("cluster"))
        .cache() // self-joined below — uncached it would compute twice
      // pointer jump: follow my label to ITS label (path halving)
      val next = propagated
        .join(propagated.select(col("id").as("_cid"), col("cluster").as("_cc")),
          col("cluster") === col("_cid"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("_cc"), col("cluster")))
            .as("cluster"))
        .cache()
      // decimal sum: overflow-free for any id domain; null sum = empty
      // input = nothing to converge
      val newSum = next
        .agg(sum(col("cluster").cast("decimal(38,0)"))).head.getDecimal(0)
      changed =
        if (newSum == null) 0L
        else if (lastSum == null || newSum.compareTo(lastSum) < 0) 1L
        else 0L
      lastSum = newSum
      propagated.unpersist()
      if (prev != null) prev.unpersist()
      prev = next
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Cluster summary: representative (min doc id), size. */
  def clusterSummary(labels: DataFrame): DataFrame =
    labels.groupBy("cluster")
      .agg(count(lit(1)).as("size"), min("id").as("keep_id"))
}
