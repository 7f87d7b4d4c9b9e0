package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.knnGraph]] + [[Similarity.labelPropagate]] — full-probe
  * brute parity, planted cell geometry, the fat-cell skew guard, and
  * hand-computed vote/tie/no-voter semantics. */
class KnnGraphSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  private def centroids(e: DataFrame) =
    e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))

  private def collectTopK(df: DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("full probe == brute force for every corpus vector") {
    val e = emb
    val cents = centroids(e)
    val nCells = cents.count().toInt
    val graph = Similarity.knnGraph(Similarity.ivfAssign(e, cents),
      cents, k = 3, nprobe = nCells)
    val brute = Similarity.bruteTopK(e, e, 3)
    assert(collectTopK(graph) === collectTopK(brute))
  }

  test("planted two-cell geometry: neighbors stay in probed cells") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid A
      (50L, Array(0.0f, 1.0f)),  // centroid B
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.8f, 0.2f)),
      (3L, Array(0.1f, 0.9f)),
      (4L, Array(0.2f, 0.8f))
    ).toDF("vec_id", "embedding")
    val cents = centroids(vecs)
    val graph = Similarity.knnGraph(Similarity.ivfAssign(vecs, cents),
        cents, k = 2, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    // with nprobe=1, A-side vectors only see A-cell members
    val bySide = graph.groupBy(_._1)
    val aSide = Set(0L, 1L, 2L); val bSide = Set(50L, 3L, 4L)
    bySide.foreach { case (q, edges) =>
      val home = if (aSide(q)) aSide else bSide
      assert(edges.map(_._2).forall(home), s"query $q crossed cells: " +
        edges.mkString(","))
    }
    // nprobe=2 == full probe here: brute parity
    val full = Similarity.knnGraph(Similarity.ivfAssign(vecs, cents),
      cents, k = 2, nprobe = 2)
    assert(collectTopK(full) === collectTopK(Similarity.bruteTopK(vecs, vecs, 2)))
  }

  test("maxCellSize drops fat-cell candidates (documented recall trade)") {
    val e = emb
    val cents = centroids(e)
    val index = Similarity.ivfAssign(e, cents).localCheckpoint(true)
    val sizes = index.groupBy("centroid_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = sizes.values.min
    val fat = sizes.filter(_._2 > cap).keySet
    assume(fat.nonEmpty, "all cells equal-sized; cap test vacuous")
    val capped = Similarity.knnGraph(index, cents, k = 3, nprobe = 2,
      maxCellSize = cap)
    // no returned neighbor lives in a dropped cell
    val fatMembers = index
      .filter(col("centroid_id").isin(fat.toSeq: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val neighbors = capped.select("neighbor_id").collect()
      .map(_.getLong(0)).toSet
    assert(neighbors.intersect(fatMembers).isEmpty)
  }

  test("knnGraphAdjacent: full probe == brute force (same degeneration " +
      "law as the per-vector walk)") {
    val e = emb
    val cents = centroids(e)
    val nCells = cents.count().toInt
    val graph = Similarity.knnGraphAdjacent(Similarity.ivfAssign(e, cents),
      cents, k = 3, nprobe = nCells)
    assert(collectTopK(graph) === collectTopK(Similarity.bruteTopK(e, e, 3)))
  }

  test("knnGraphAdjacent == per-vector walk on well-separated cells; " +
      "own cell always probed (real corpus law)") {
    // planted: two orthogonal clusters — the cell adjacency and the
    // per-vector walk agree exactly
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (50L, Array(0.0f, 1.0f)),
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.8f, 0.2f)),
      (3L, Array(0.1f, 0.9f)), (4L, Array(0.2f, 0.8f))
    ).toDF("vec_id", "embedding")
    val cents2 = centroids(vecs)
    val idx2 = Similarity.ivfAssign(vecs, cents2)
    assert(
      collectTopK(Similarity.knnGraphAdjacent(idx2, cents2, 2, 1)) ===
      collectTopK(Similarity.knnGraph(idx2, cents2, 2, 1)))
    // real corpus: every vector's best SAME-CELL neighbor must appear in
    // its adjacency-probed top-k candidates' reachable set — own cell is
    // rank-1 in the adjacency list by construction
    val e = emb
    val cents = centroids(e)
    val index = Similarity.ivfAssign(e, cents).localCheckpoint(true)
    val g = Similarity.knnGraphAdjacent(index, cents, k = 1000, nprobe = 1)
    // with nprobe=1 the probed set IS the own cell: candidate edges ==
    // all same-cell ordered pairs
    val gotEdges = g.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellPairs = index.select(col("vec_id"), col("centroid_id")).collect()
      .groupBy(_.getLong(1)).values.flatMap { rs =>
        val ids = rs.map(_.getLong(0)).toSeq
        for (a <- ids; b <- ids if a != b) yield (a, b)
      }.toSet
    assert(gotEdges === cellPairs)
  }

  test("labelPropagate: majority vote, smallest-label tie-break, " +
      "no-voter rows absent") {
    val graph = Seq(
      // target 100: votes 2,2,5 -> pred 2
      (100L, 1, 1L), (100L, 2, 2L), (100L, 3, 3L),
      // target 200: tie 1,1,3,3 -> pred 1 (smallest label)
      (200L, 1, 4L), (200L, 2, 5L), (200L, 3, 6L), (200L, 4, 7L),
      // target 300: only unlabeled neighbors -> no row
      (300L, 1, 301L),
      // labeled node 1 also has edges — must NOT get a prediction
      (1L, 1, 2L)
    ).toDF("query_id", "rank", "neighbor_id")
      .withColumn("cos_sim", lit(0.5))
    val labels = Seq(
      (1L, Some(2)), (2L, Some(2)), (3L, Some(5)),
      (4L, Some(1)), (5L, Some(1)), (6L, Some(3)), (7L, Some(3)),
      (100L, None), (200L, None), (300L, None), (301L, None)
    ).toDF("vec_id", "label")
    val got = Similarity.labelPropagate(graph, labels)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === Set(100L, 200L))
    assert(got(100L) === ((2, 2L, 3L)))
    assert(got(200L) === ((1, 2L, 4L)))
  }

  test("label propagation over the real corpus: every masked node with " +
      "a labeled neighbor gets a sane prediction") {
    val full = graft.Tables.load(spark, sfDir, "embeddings")
    val cents = centroids(full.select("vec_id", "embedding"))
    val graph = Similarity.knnGraph(
      Similarity.ivfAssign(full.select("vec_id", "embedding"), cents),
      cents, k = 5, nprobe = 2).localCheckpoint(true)
    val labels = full.select(col("vec_id"),
      when(pmod(col("vec_id"), lit(7)) === 0, lit(null))
        .otherwise(col("label")).as("label"))
    val preds = Similarity.labelPropagate(graph, labels).cache()
    try {
      val masked = full.filter(pmod(col("vec_id"), lit(7)) === 0).count()
      val n = preds.count()
      assert(n > 0 && n <= masked)
      assert(preds.filter(col("pred_label") < 0 || col("pred_label") > 9)
        .count() === 0)
      assert(preds.filter(col("n_votes") > col("n_labeled")).count() === 0)
      assert(preds.filter(pmod(col("vec_id"), lit(7)) =!= 0).count() === 0)
    } finally preds.unpersist()
  }
}
