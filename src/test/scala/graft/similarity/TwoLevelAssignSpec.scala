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

  test("two-level PROBE at full fan-out == flat ivfTopKFromIndex " +
      "bit-for-bit (the exactness dial on the probe side), and reduced " +
      "fan-out results are drawn from the probed supers' member cells") {
    val supers = Similarity.superCentroids(centroids, stride = 10)
    val s = supers.count().toInt
    assert(s >= 2, s"want a real hierarchy, got $s supers")
    val index = Similarity.ivfAssign(emb, centroids).localCheckpoint(true)
    val probes = emb.filter(col("vec_id") % 37 === 3).localCheckpoint(true)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val flat = norm(Similarity.ivfTopKFromIndex(probes, index, k = 3,
      centroids, nprobe = 2))
    val two = norm(Similarity.ivfTopKFromIndexTwoLevel(probes, index,
      k = 3, centroids, supers, fanout = s, nprobe = 2))
    assert(two == flat,
      "full fan-out two-level probe must equal the flat probe")
    // over-asking beyond S is the same full fan-out, not an error
    assert(norm(Similarity.ivfTopKFromIndexTwoLevel(probes, index, k = 3,
      centroids, supers, fanout = s + 5, nprobe = 2)) == flat)
    // a STAGED centroid->super map (the serving shape: index metadata
    // computed once, not re-scored per trigger) serves identically
    val staged = Similarity.centroidSuperMap(centroids, supers)
      .localCheckpoint(true)
    assert(norm(Similarity.ivfTopKFromIndexTwoLevel(probes, index, k = 3,
      centroids, supers, fanout = s, nprobe = 2,
      c2sDf = Some(staged))) == flat)
    // reduced fan-out: every result row's neighbor belongs to a cell
    // under one of ITS query's probed supers — no candidate leaks in
    // from unprobed supers
    val reduced = Similarity.ivfTopKFromIndexTwoLevel(probes, index,
      k = 3, centroids, supers, fanout = 1, nprobe = 2)
    val cellOf = index.select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute each query's fanout-1 super and its member cells
    val supRows = supers.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val centRows = centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) Double.NegativeInfinity else dot / (na * nb)
    }
    val superOfCent = centRows.map { case (cid, c) =>
      cid -> supRows.map { case (sid, sc) => (-cos(c, sc), sid) }.min._2
    }.toMap
    val probeRows = probes.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val topSuper = probeRows.map { case (qid, q) =>
      qid -> supRows.map { case (sid, sc) => (-cos(q, sc), sid) }.min._2
    }.toMap
    reduced.collect().foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(2))
      assert(superOfCent(cellOf(nid)) == topSuper(qid),
        s"query $qid served neighbor $nid from an unprobed super")
    }
  }
}
