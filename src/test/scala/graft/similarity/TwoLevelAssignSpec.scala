package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Two-level coarse quantizer contract ([[Similarity.ivfAssignTwoLevel]]):
  * the exactness dial — full fan-out IS the flat argmin bit-for-bit —
  * plus the invariants that make the reduced-fanout form safe to feed
  * every downstream IVF surface: every vector keeps exactly one
  * assignment (non-empty super-cells by construction), the assigned
  * cell is drawn from the probed supers' members, and the output is
  * schema-compatible with [[Similarity.ivfAssign]].
  */
class TwoLevelAssignSpec extends SparkTestBase {

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def centroids = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("centroid_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two-level assignment at full fan-out == flat ivfAssign " +
      "bit-for-bit (every super probed ⇒ every centroid a candidate ⇒ " +
      "the identical min_by argmin)") {
    val supers = Similarity.superCentroids(centroids, stride = 50)
    val s = supers.count().toInt
    assert(s >= 2, s"want a real hierarchy, got $s supers")
    val flat = collectAssign(Similarity.ivfAssign(emb, centroids))
    val two = collectAssign(
      Similarity.ivfAssignTwoLevel(emb, centroids, supers, fanout = s))
    assert(two == flat)
    // and over-asking beyond S is the same full fan-out, not an error
    val over = collectAssign(
      Similarity.ivfAssignTwoLevel(emb, centroids, supers, fanout = s + 7))
    assert(over == flat)
  }

  test("reduced fan-out: every vector keeps exactly one assignment " +
      "(non-empty super-cells — no silent drops), and each assigned " +
      "cell is a member of one of the vector's probed supers") {
    val supers = Similarity.superCentroids(centroids, stride = 50)
    val n = emb.count()
    val two = Similarity.ivfAssignTwoLevel(emb, centroids, supers,
      fanout = 1)
    assert(two.count() == n, "row preservation at fanout=1")
    assert(two.select("vec_id").distinct().count() == n,
      "one assignment per vector")
    // membership: rebuild the centroid→super map independently and check
    // every assignment's cell belongs to the vector's single probed super
    val c2s = Similarity.ivfAssign(
        centroids.select(col("centroid_id").as("vec_id"),
          col("centroid").as("embedding")),
        supers.select(col("super_id").as("centroid_id"),
          col("super_c").as("centroid")))
      .select(col("vec_id").as("centroid_id"),
        col("centroid_id").as("super_id"))
    val vecSuper = Similarity.ivfAssign(
        emb, supers.select(col("super_id").as("centroid_id"),
          col("super_c").as("centroid")))
      .select(col("vec_id"), col("centroid_id").as("super_id"))
    val bad = two.join(c2s, Seq("centroid_id"))
      .join(vecSuper.withColumnRenamed("super_id", "probed_super"),
        Seq("vec_id"))
      .filter(col("super_id") =!= col("probed_super"))
    assert(bad.count() == 0,
      "every fanout=1 assignment must come from the vector's own " +
        "probed super-cell")
  }

  test("output schema matches ivfAssign (feeds probe/fold-in/PQ encode " +
      "unchanged), and degenerate inputs fail or guard like the flat path") {
    val supers = Similarity.superCentroids(centroids, stride = 50)
    val two = Similarity.ivfAssignTwoLevel(emb, centroids, supers, fanout = 2)
    val flat = Similarity.ivfAssign(emb, centroids)
    assert(two.schema.map(f => (f.name, f.dataType)) ==
      flat.schema.map(f => (f.name, f.dataType)))
    // the reduced-fanout index probes through the standard serving path
    val queries = emb.filter(col("vec_id") < 5)
    val served = Similarity.ivfTopKFromIndex(queries,
      two, k = 3, centroids, nprobe = 2)
    assert(served.count() > 0)
    intercept[IllegalArgumentException] {
      Similarity.ivfAssignTwoLevel(emb, centroids, supers, fanout = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.superCentroids(centroids, stride = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfAssignTwoLevel(emb, centroids,
        supers.filter(lit(false)), fanout = 1)
    }
  }

  test("ivfAssignAuto: below the cell threshold it IS flat ivfAssign " +
      "bit-for-bit (the small-C low-agreement regime is unreachable); " +
      "above it the √C-stride two-level path keeps schema and row " +
      "count; saturating fanout restores flat equality") {
    val flat = collectAssign(Similarity.ivfAssign(emb, centroids))
    // small C (default threshold far above this table) → flat branch
    assert(collectAssign(Similarity.ivfAssignAuto(emb, centroids)) == flat)
    // forced two-level branch (threshold 1): schema + one row per
    // vector survive, and every vector keeps exactly one assignment
    val auto2 = Similarity.ivfAssignAuto(emb, centroids, fanout = 2,
      minCellsForTwoLevel = 1)
    assert(auto2.schema.map(f => (f.name, f.dataType)) ==
      Similarity.ivfAssign(emb, centroids).schema
        .map(f => (f.name, f.dataType)))
    assert(auto2.count() == emb.count())
    assert(auto2.select(col("vec_id")).distinct().count() == emb.count())
    // the exactness dial carries through the auto path: fanout ≥ S
    // (over-asking is safe) → flat bit-for-bit
    val c = centroids.count().toInt
    val autoFull = Similarity.ivfAssignAuto(emb, centroids, fanout = c,
      minCellsForTwoLevel = 1)
    assert(collectAssign(autoFull) == flat)
    intercept[IllegalArgumentException] {
      Similarity.ivfAssignAuto(emb, centroids, fanout = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfAssignAuto(emb, centroids, minCellsForTwoLevel = 0)
    }
  }
}
