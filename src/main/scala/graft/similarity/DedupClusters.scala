package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive dedup clustering: near-dup PAIRS (from MinHash/SimHash) form
  * a graph; keep-one-per-cluster needs its connected components. Iterative
  * label propagation (min-id) over the edge list — each round is one
  * shuffle join; components of diameter d converge in ≤ d rounds (doubling
  * via both-direction edges). maxIter bounds a pathological chain.
  */
object DedupClusters {

  /** @param pairs edge list with columns (id_a, id_b)
    * @param ids   node universe (one column `id`)
    * @return (id, cluster) — cluster = min id reachable
    */
  def connectedComponents(ids: DataFrame, pairs: DataFrame,
                          maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = ids.select(col("id"), col("id").as("cluster"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate: min over neighbors' labels and own
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("cluster").as("n_cluster"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster")))
            .as("cluster"))
        .cache()
      changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** Cluster summary: representative (min doc id), size. */
  def clusterSummary(labels: DataFrame): DataFrame =
    labels.groupBy("cluster")
      .agg(count(lit(1)).as("size"), min("id").as("keep_id"))
}
