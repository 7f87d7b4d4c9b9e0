package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-shape guarantees for the k-means trainer — the two properties the
  * round-3 review flagged as the last remaining exponential-lineage /
  * window-shuffle instances, plus the trained-state disk round-trip.
  */
class KMeansSpec extends SparkTestBase {

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")

  test("assign (argmin aggregation) is bit-identical to the window form") {
    val corpus = emb.limit(300)
    val centroids = KMeans.fit(corpus, k = 8, iters = 1)

    // the pre-round-4 formulation: score all |corpus|×k rows, rank with a
    // per-vector window — semantically the ground truth, shuffle-heavy
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("_cos").desc, col("centroid_id"))
    val viaWindow = corpus.crossJoin(broadcast(centroids))
      .withColumn("_cos", Similarity.cosine(col("embedding"), col("centroid")))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val viaArgmin = KMeans.assign(corpus, centroids)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(viaArgmin == viaWindow)
  }

  test("a degenerate (zero-norm, NaN-cosine) centroid never wins an " +
      "assignment — the argmin's nanvl pins its sort key to +inf") {
    import spark.implicits._
    val corpus = emb.limit(40)
    val good = KMeans.fit(corpus, k = 3, iters = 1)
      .filter(col("centroid_id") < 3)
    val degenerate = Seq((99L, Array.fill(64)(0.0f)))
      .toDF("centroid_id", "centroid")
    val out = KMeans.assign(corpus, good.unionByName(degenerate))
      .select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!out.contains(99L),
      s"zero-norm centroid won assignments: $out")
  }

  test("assign carries extra corpus columns through unchanged") {
    val corpus = emb.limit(50).withColumn("label", col("vec_id") % 7)
    val centroids = KMeans.fit(emb.limit(50), k = 4, iters = 1)
    val out = KMeans.assign(corpus, centroids)
    assert(out.columns.toSeq ==
      corpus.columns.toSeq :+ "centroid_id")
    assert(out.filter(col("label") =!= col("vec_id") % 7).count() == 0)
  }

  test("fit(iters=20) plans in O(1) per round (lineage truncated)") {
    val corpus = emb.limit(200)
    val t0 = System.nanoTime()
    val centroids = KMeans.fit(corpus, k = 4, iters = 20)
    // localCheckpoint per round → the result is a LogicalRDD leaf, not a
    // 2^20-node join tree; without it iters=20 dies in the planner (the
    // DedupClusters round-2 lesson)
    val planLines = centroids.queryExecution.analyzed.treeString.linesIterator.size
    assert(planLines <= 5, s"lineage not truncated: $planLines-line plan")
    assert(centroids.count() == 4)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"fit(k=4, iters=20) on 200 vectors: $secs%.1f s, $planLines-line plan")
    assert(secs < 120, f"20-iteration fit took $secs%.0f s — lineage blowup?")
  }

  test("fused codebook training (fitGrouped) matches the per-subspace " +
      "fit loop it replaces — same codes, same centroids") {
    val corpus = emb.limit(300)
    val (dim, numSub, k, iters) = (64, 8, 8, 2)
    val subDim = dim / numSub
    val fused = ProductQuantizer
      .codebooksKMeans(corpus, dim, numSub, k, iters).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    // the pre-fusion formulation: one independent fit per subspace
    val legacy = (0 until numSub).flatMap { s =>
      KMeans.fit(
        corpus.select(col("vec_id"),
          slice(col("embedding"), lit(s * subDim + 1), lit(subDim))
            .as("embedding")), k, iters)
        .collect()
        .map(r => (s, r.getLong(0).toInt) -> r.getSeq[Float](1))
    }.toMap
    assert(fused.keySet == legacy.keySet,
      s"codebook keys differ: ${fused.keySet} vs ${legacy.keySet}")
    // identical math per group; only float-summation order can differ
    fused.foreach { case (key, c) =>
      val l = legacy(key)
      assert(c.length == l.length)
      c.zip(l).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-5f, s"$key: $a vs $b") }
    }
  }

  test("trained codebooks round-trip through disk bit-identically and " +
      "keep PQ recall") {
    val queries = emb.filter(col("vec_id") < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val brute = topSet(Similarity.bruteTopK(queries, emb, 3))
    def recall(pq: Map[Long, Set[Long]]): Double = {
      val hits = brute.map { case (q, truth) =>
        pq.getOrElse(q, Set.empty).count(truth.contains).toDouble / truth.size
      }
      hits.sum / hits.size
    }

    val books = ProductQuantizer.codebooksKMeans(emb, dim = 64, numSub = 8,
      k = 16, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("pq_books").toString +
      "/books"
    TrainedState.saveCodebooks(books, path)
    val loaded = TrainedState.loadCodebooks(spark, path)

    // disk round-trip must be lossless: float arrays bit-identical
    val inMem = books.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    val fromDisk = loaded.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    assert(fromDisk == inMem, "codebooks changed through parquet round-trip")

    val pqTrained = topSet(ProductQuantizer.topKWith(queries, emb, dim = 64,
      numSub = 8, k = 3, loaded, rerank = 8))
    val rTrained = recall(pqTrained)
    val pqStride = topSet(ProductQuantizer.topK(queries, emb, dim = 64,
      numSub = 8, k = 3, stride = 50, rerank = 8))
    val rStride = recall(pqStride)
    info(f"PQ recall@3: trained-from-disk=$rTrained%.2f stride=$rStride%.2f")
    assert(rTrained > 0.3, s"trained-book recall collapsed: $rTrained")
  }

  test("centroids round-trip through disk and loadCentroids rejects a " +
      "mis-shaped file") {
    val centroids = KMeans.fit(emb.limit(100), k = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("km_cent").toString
    TrainedState.saveCentroids(centroids, dir + "/cent")
    val loaded = TrainedState.loadCentroids(spark, dir + "/cent")
    val a = centroids.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = loaded.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)

    emb.limit(3).write.parquet(dir + "/junk")
    val e = intercept[IllegalArgumentException] {
      TrainedState.loadCentroids(spark, dir + "/junk")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }
}
