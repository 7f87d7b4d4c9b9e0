package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.ivfTopKFiltered]] — predicate-filtered ANN with an
  * adaptive cell walk: exact-brute degeneration at a full candidate
  * floor, the k-row guarantee a fixed nprobe lacks, the planted case
  * where the nearest cell holds zero qualifying rows, and the
  * precomputed cell-counts artifact path. */
class FilteredAnnSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")

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

  test("minCandidates >= total qualifying degenerates to exact filtered " +
      "brute force") {
    val e = emb
    val cents = centroids(e)
    val pred = col("label") === 3
    val queries = e.filter(col("vec_id") < 10).select("vec_id", "embedding")
    val index = Similarity.ivfAssignWith(e, cents, Seq("label"))
    val total = e.filter(pred).count().toInt
    val got = collectTopK(Similarity.ivfTopKFiltered(
      queries, index, pred, k = 4, cents, minCandidates = total + 10))
    val want = collectTopK(Similarity.bruteTopK(queries, e.filter(pred), 4))
    assert(got === want)
  }

  test("every query gets k rows under a selective predicate; a fixed " +
      "nprobe=1 probe under-delivers for at least one query") {
    val e = emb
    val cents = centroids(e)
    val pred = col("label") === 3
    val queries = e.filter(col("vec_id") < 20).select("vec_id", "embedding")
    val index = Similarity.ivfAssignWith(e, cents, Seq("label"))
    val k = 3
    val adaptive = Similarity.ivfTopKFiltered(
      queries, index, pred, k, cents, minCandidates = 12)
    val perQuery = adaptive.groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perQuery.size === 20)
    assert(perQuery.values.forall(_ == k),
      s"short queries: ${perQuery.filter(_._2 < k)}")
    // the problem the operator exists for: a fixed shallow probe over
    // the filtered index leaves some query short of k
    val naive = Similarity.ivfTopKFromIndex(
      queries, index.filter(pred), k, cents, nprobe = 1)
    val naivePer = naive.groupBy("query_id").count()
      .collect().map(r => r.getLong(1))
    assert(naivePer.exists(_ < k) || naivePer.length < 20,
      "nprobe=1 unexpectedly satisfied every query — test data no " +
        "longer exercises the adaptive branch")
  }

  test("planted: nearest cell empty of qualifying rows — the walk skips " +
      "it and still returns exact filtered top-k") {
    // 2-d geometry: centroid A at (1,0), centroid B at (0,1). The query
    // sits on A's axis; all qualifying (label 1) vectors live in B's
    // cell. minCandidates = k forces the minimal walk — correctness
    // must come from skipping A (zero qualifying), not from over-probing.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),      // centroid A (label 0 — not qual)
      (50L, Array(0.0f, 1.0f), 0),     // centroid B
      (2L, Array(0.9f, 0.1f), 0),      // A-cell, not qualifying
      (3L, Array(0.1f, 0.9f), 1),      // B-cell, qualifying
      (4L, Array(0.2f, 0.8f), 1),      // B-cell, qualifying
      (5L, Array(0.95f, 0.05f), 0)     // query: deep in A's cell
    ).toDF("vec_id", "embedding", "label")
    val cents = centroids(vecs)
    val index = Similarity.ivfAssignWith(vecs, cents, Seq("label"))
    val queries = vecs.filter(col("vec_id") === 5).select("vec_id", "embedding")
    val got = collectTopK(Similarity.ivfTopKFiltered(
      queries, index, col("label") === 1, k = 2, cents, minCandidates = 2))
    val want = collectTopK(Similarity.bruteTopK(
      queries, vecs.filter(col("label") === 1), 2))
    assert(got === want)
    assert(got.map(_._3) === Set(3L, 4L))
  }

  test("precomputed cellCounts artifact path == computed path") {
    val e = emb
    val cents = centroids(e)
    val pred = col("label") === 3
    val queries = e.filter(col("vec_id") < 10).select("vec_id", "embedding")
    val index = Similarity.ivfAssignWith(e, cents, Seq("label"))
    val counts = Similarity.ivfCellCounts(index, pred).localCheckpoint(true)
    val a = collectTopK(Similarity.ivfTopKFiltered(
      queries, index, pred, 3, cents, 12))
    val b = collectTopK(Similarity.ivfTopKFiltered(
      queries, index, pred, 3, cents, 12, cellCounts = Some(counts)))
    assert(a === b)
  }
}
