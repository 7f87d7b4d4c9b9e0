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

  test("ivfRebalance: fat cells split, vector set preserved, untouched " +
      "cells verbatim, ids never collide, full probe still == brute") {
    val index = Similarity.ivfAssign(emb, centroids).localCheckpoint(true)
    val sizes = index.groupBy("centroid_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = sizes.values.toSeq.sorted.apply(sizes.size / 2).toInt // median
    val fat = sizes.filter(_._2 > cap).keySet
    assert(fat.nonEmpty, "pick a cap below the max cell size")
    val (newCents, newIdx0) = Similarity.ivfRebalance(index, centroids,
      maxCellSize = cap, subK = 3)
    val newIdx = newIdx0.localCheckpoint(true)
    // vector set preserved exactly
    assert(newIdx.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      === index.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq)
    // untouched cells byte-for-byte (assignment pairs)
    def cells(df: org.apache.spark.sql.DataFrame, keep: Long => Boolean) =
      df.select("vec_id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter(p => keep(p._2)).toSet
    val oldNonFat = sizes.keySet -- fat
    assert(cells(newIdx, oldNonFat.contains) ===
      cells(index, oldNonFat.contains))
    // and nothing that was in a fat cell still carries its old id
    assert(cells(newIdx, fat.contains).isEmpty)
    // retired fat ids are gone; new ids sit above the old id range
    val newCentIds = newCents.select("centroid_id").collect()
      .map(_.getLong(0)).toSet
    assert(fat.intersect(newCentIds).isEmpty)
    val oldMax = sizes.keySet.max
    assert((newCentIds -- sizes.keySet).forall(_ > oldMax))
    assert(newCentIds.size ===
      (sizes.size - fat.size) + (newCentIds -- sizes.keySet).size)
    // every reassigned vector landed in a child of its OLD fat cell —
    // and probes at full nprobe still equal brute force
    val queries = emb.filter(col("vec_id") < 10)
    val full = collectTopK(Similarity.ivfTopKFromIndex(queries, newIdx,
      k = 3, newCents, nprobe = newCentIds.size))
    assert(full === collectTopK(Similarity.bruteTopK(queries, emb, k = 3)))
  }

  test("ivfRebalance: planted identical vectors stay co-located and the " +
      "partial-nprobe planted probe keeps its guarantee") {
    val planted = emb.unionByName(emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      .localCheckpoint(true)
    val index = Similarity.ivfAssign(planted, centroids)
    val cap = (planted.count() / centroids.count() / 2).toInt.max(1)
    val (nc, ni0) = Similarity.ivfRebalance(index, centroids, cap, subK = 3)
    val ni = ni0.localCheckpoint(true)
    val cellOf = ni.select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { id =>
      assert(cellOf(id) === cellOf(id + 1000000L),
        s"planted pair $id split across cells")
    }
    val probes = Similarity.ivfTopKFromIndex(
      emb.filter(col("vec_id") < 20), ni, k = 1, nc, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("c")).collect()
    probes.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 1000000L)
      assert(r.getDouble(2) === 1.0)
    }
    assert(probes.length === 20)
  }

  test("ivfRebalance: no fat cells is an exact no-op") {
    val index = Similarity.ivfAssign(emb, centroids).localCheckpoint(true)
    val maxCell = index.groupBy("centroid_id").count()
      .agg(max("count")).head().getLong(0).toInt
    val (nc, ni) = Similarity.ivfRebalance(index, centroids, maxCell, 3)
    assert(ni.select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      index.select("vec_id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(nc.count() === centroids.count())
  }
}
