package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Transitive dedup clustering: near-dup PAIRS (from MinHash/SimHash) form
  * a graph; keep-one-per-cluster needs its connected components.
  *
  * Two-phase design (the "filtering" pattern — Lattanzi et al., SPAA'11):
  * the edge list of a dedup graph is tiny relative to the corpus by
  * construction (it holds only the near-duplicate pairs), so once it is
  * known to fit on the driver we finish with a local union-find and ship
  * the labels back as ONE broadcast join — O(1) jobs instead of
  * O(log diameter) rounds of shuffle joins. Above the threshold (or for
  * non-integral id types) we run the distributed loop: iterative min-label
  * propagation PLUS pointer jumping (label ← label's label), which
  * converges in O(log diameter) rounds of two shuffle joins each. On a
  * 1000-executor cluster the same adaptive split applies — the corpus
  * never moves either way, only the near-dup pair list.
  */
object DedupClusters {

  /** @param pairs edge list with columns (id_a, id_b)
    * @param ids   node universe (one column `id`)
    * @param localEdgeThreshold collect-and-union-find when the (deduped,
    *        undirected) edge count is at or below this; set to -1 to force
    *        the distributed loop (used by parity tests)
    * @return (id, cluster) — cluster = min id reachable. On the distributed
    *         path the result is an eagerly localCheckpointed fixpoint
    *         (lineage-free); its blocks are reclaimed by the ContextCleaner
    *         when the Dataset is dropped.
    */
  def connectedComponents(ids: DataFrame, pairs: DataFrame,
                          maxIter: Int = 12,
                          localEdgeThreshold: Long = 10L * 1000 * 1000)
      : DataFrame = {
    val idType = ids.schema("id").dataType
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // one canonical direction is enough here; both algorithms symmetrize
    // as needed. distinct() early: similarity joins emit duplicate pairs.
    // Edges are restricted to the node universe: without this, an edge
    // through an out-of-universe node would union its endpoints on the
    // local path but not on the distributed one (no label row to
    // propagate through), and the local path could even emit a cluster
    // label that is not an id.
    val universe = ids.select(col("id"))
    val undirected = pairs
      .select(least(col("id_a"), col("id_b")).as("src"),
        greatest(col("id_a"), col("id_b")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(universe.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(universe.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
      .distinct()
      .cache()
    val nEdges = undirected.count()

    if (integral && localEdgeThreshold >= 0 && nEdges <= localEdgeThreshold) {
      val edgeRows = undirected
        .select(col("src").cast("long"), col("dst").cast("long")).collect()
      undirected.unpersist()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) {
          val n = parent.get(c); parent.put(c, r); c = n
        }
        r
      }
      edgeRows.foreach { row =>
        val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
        // min root wins so the representative is the min reachable id
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
      val relabeled = parent.keySet().toArray(Array.empty[java.lang.Long])
        .map(id => (id.longValue(), find(id.longValue())))
        .filter { case (id, root) => id != root }
      if (relabeled.isEmpty) {
        ids.select(col("id"), col("id").as("cluster"))
      } else {
        val spark = ids.sparkSession
        import spark.implicits._
        val mapping = broadcast(
          spark.createDataset(relabeled.toSeq).toDF("id", "_root")
            .select(col("id").cast(idType).as("id"),
              col("_root").cast(idType).as("_root")))
        ids.join(mapping, Seq("id"), "left")
          .select(col("id"), coalesce(col("_root"), col("id")).as("cluster"))
      }
    } else {
      connectedComponentsDistributed(ids, undirected, maxIter)
    }
  }

  /** The distributed fixpoint loop (edge list too large to collect, or
    * non-integral ids — min-label works for any orderable type).
    *
    * Lineage is TRUNCATED each round with eager `localCheckpoint` rather
    * than `cache()`: every round's plan embeds the previous round's twice
    * (label join + pointer-jump self-join), so an un-truncated loop grows a
    * 2^rounds logical plan and `CacheManager.cacheQuery` canonicalization
    * goes exponential — round 2's bench spent 20+ s (and a 12-round test
    * minutes) purely planning. Checkpointed rounds are leaf RDD scans;
    * planning stays O(1) per round. On a multi-executor cluster prefer
    * `sc.setCheckpointDir` + reliable `checkpoint()` for fault tolerance —
    * localCheckpoint blocks die with their executor.
    */
  private def connectedComponentsDistributed(ids: DataFrame,
      undirected: DataFrame, maxIter: Int): DataFrame = {
    // both directions via ONE explode, not a union of two branches: the
    // undirected subtree appears once in the plan instead of twice
    val edges = undirected.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .localCheckpoint(true)
    undirected.unpersist()
    var labels = ids.select(col("id"), col("id").as("cluster"))
      .localCheckpoint(true)
    // Convergence via the label-sum invariant: min-label propagation is
    // monotone non-increasing per node, so the total strictly decreases
    // exactly while something still changes — one cheap aggregate per
    // round instead of a join against the previous labels. INTEGRAL ids
    // only: fractional ids cast to decimal(38,0) collide after rounding
    // (0.01 and 0.30 both become 0), blinding the invariant and exiting
    // before the fixpoint — every other type uses the changed-count join.
    val numeric = labels.schema("cluster").dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
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
        .localCheckpoint(true) // self-joined below; also cuts the lineage
      // pointer jump: follow my label to ITS label (path halving)
      val next = propagated
        .join(propagated.select(col("id").as("_cid"), col("cluster").as("_cc")),
          col("cluster") === col("_cid"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("_cc"), col("cluster")))
            .as("cluster"))
        .localCheckpoint(true)
      if (numeric) {
        // decimal sum: overflow-free for any id domain; null sum = empty
        // input = nothing to converge
        val newSum = next
          .agg(sum(col("cluster").cast("decimal(38,0)"))).head.getDecimal(0)
        changed =
          if (newSum == null) 0L
          else if (lastSum == null || newSum.compareTo(lastSum) < 0) 1L
          else 0L
        lastSum = newSum
      } else {
        changed = next.as("n")
          .join(labels.as("p"), col("n.id") === col("p.id"))
          .filter(col("n.cluster") =!= col("p.cluster")).count()
      }
      // superseded rounds' checkpoint blocks are reclaimed by the
      // ContextCleaner once unreferenced; nothing to unpersist by hand
      labels = next
      iter += 1
    }
    labels
  }

  /** Cluster summary: representative (min doc id), size. */
  def clusterSummary(labels: DataFrame): DataFrame =
    labels.groupBy("cluster")
      .agg(count(lit(1)).as("size"), min("id").as("keep_id"))

  /** Per-cluster edge DENSITY — the dedup-quality diagnostic keep-one
    * reduction hides: a near-dup cluster formed by genuine mutual
    * similarity is clique-like (density → 1e6 ppm), while a cluster
    * glued together by one promiscuous hub (boilerplate-heavy doc, hot
    * LSH bucket survivor) is star-like (density → 2e6/n ppm) — and
    * keep-one deletes its spokes on transitive evidence only. Density
    * = 2·10⁶·E / (n·(n−1)), all-integer; singletons are excluded (no
    * pair evidence to audit). Edges land in exactly one cluster by CC
    * construction, so one endpoint lookup suffices — one join against
    * the labels table plus two cluster-grained aggregations. */
  def clusterDensity(labels: DataFrame, edges: DataFrame): DataFrame = {
    val eCnt = edges
      .join(labels.select(col("id").as("id_a"), col("cluster")), Seq("id_a"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_edges"))
    labels.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_nodes"))
      .filter(col("n_nodes") > 1)
      .join(eCnt, Seq("cluster"), "left")
      .select(col("cluster"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        expr("coalesce(n_edges, 0L) * 2000000 div (n_nodes * (n_nodes - 1))")
          .as("density_ppm"))
  }
}
