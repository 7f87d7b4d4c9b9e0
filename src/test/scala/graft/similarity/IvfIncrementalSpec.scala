package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** IVF incremental fold-in contract: folding a batch into an existing
  * codes index (same centroids, no retrain) probes identically to
  * rebuilding the index over corpus ∪ batch — at full probe AND partial
  * probe — plus the persisted-index round-trip.
  */
class IvfIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("probe(foldIn(index, batch)) == probe(rebuild(corpus ∪ batch)) " +
      "at full and partial probe") {
    val corpus = emb.filter(col("vec_id") >= 100).localCheckpoint(true)
    val batch = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 20)
    val nCells = centroids.count().toInt
    val folded = Similarity.ivfFoldIn(
      Similarity.ivfAssign(corpus, centroids), batch, centroids)
    val rebuilt = Similarity.ivfAssign(corpus.unionByName(batch), centroids)
    for (nprobe <- Seq(1, 2, nCells)) {
      val a = collectTopK(Similarity.ivfTopKFromIndex(queries, folded,
        k = 5, centroids, nprobe))
      val b = collectTopK(Similarity.ivfTopKFromIndex(queries, rebuilt,
        k = 5, centroids, nprobe))
      assert(a == b, s"fold-in diverged from rebuild at nprobe=$nprobe")
    }
  }

  test("full probe from an index equals brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val nCells = centroids.count().toInt
    val viaIndex = collectTopK(Similarity.ivfTopKFromIndex(queries,
      Similarity.ivfAssign(emb, centroids), k = 3, centroids, nCells))
    val brute = collectTopK(Similarity.bruteTopK(queries, emb, k = 3))
    assert(viaIndex == brute)
  }

  test("ivfTopKWith is exactly assign-then-probe (refactor guard)") {
    val queries = emb.filter(col("vec_id") < 10)
    val a = collectTopK(Similarity.ivfTopKWith(queries, emb, k = 4,
      centroids, nprobe = 2))
    val b = collectTopK(Similarity.ivfTopKFromIndex(queries,
      Similarity.ivfAssign(emb, centroids), k = 4, centroids, nprobe = 2))
    assert(a == b)
  }

  test("persisted index round-trips; append fold-in lands in the " +
      "touched cells only; schema mismatch fails fast") {
    val corpus = emb.filter(col("vec_id") >= 50).localCheckpoint(true)
    val batch = emb.filter(col("vec_id") < 50).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    TrainedState.saveIvfIndex(Similarity.ivfAssign(corpus, centroids),
      dir + "/idx")
    // fold-in as an APPEND write: only the batch's cells gain files
    TrainedState.saveIvfIndex(Similarity.ivfAssign(batch, centroids),
      dir + "/idx", append = true)
    val loaded = TrainedState.loadIvfIndex(spark, dir + "/idx")
    val fromDisk = collectTopK(Similarity.ivfTopKFromIndex(queries, loaded,
      k = 5, centroids, nprobe = 2))
    val inMem = collectTopK(Similarity.ivfTopKFromIndex(queries,
      Similarity.ivfAssign(emb, centroids), k = 5, centroids, nprobe = 2))
    assert(fromDisk == inMem, "persisted index probe diverged")
    // the layout is one directory per cell — the probe's partition-prune
    // unit
    val cellDirs = new java.io.File(dir + "/idx").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("centroid_id="))
    assert(cellDirs.nonEmpty, "expected centroid_id=... partition dirs")
    // schema validation
    Seq((1L, "x")).toDF("a", "b").write.parquet(dir + "/junk")
    val e = intercept[IllegalArgumentException](
      TrainedState.loadIvfIndex(spark, dir + "/junk"))
    assert(e.getMessage.contains("missing"))
  }
}
