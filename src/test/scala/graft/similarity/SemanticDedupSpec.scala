package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.semanticDedup]] — hand-built geometry where every
  * cell assignment and cosine is knowable by inspection.
  *
  * Corpus layout (2-d vectors; cells are the two axes):
  *   cluster X (near [1, 0]):   id 0 [1,0], id 1 [1,0] (exact dup),
  *     id 2 [0.999, 0.045] (cos≈0.999 to 0/1), id 3 [0.9, 0.45]
  *     (cos≈0.894 to 0 — below a 0.99 threshold, same cell)
  *   cluster Y (near [0, 1]):   id 10 [0,1], id 11 [0.045, 0.999]
  *     (cos≈0.999 to 10)
  * Centroids: c0 = [1,0], c1 = [0,1].
  */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def emb(xs: (Long, Seq[Float])*): DataFrame =
    xs.toDF("vec_id", "embedding").repartition(2)

  private val centroids = Seq(
    (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
    .toDF("centroid_id", "centroid").repartition(2)

  private val corpus = emb(
    0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f),
    2L -> Seq(0.999f, 0.045f), 3L -> Seq(0.9f, 0.45f),
    10L -> Seq(0f, 1f), 11L -> Seq(0.045f, 0.999f))

  private def decisions(threshold: Double, maxCellSize: Int = 0) =
    Similarity.semanticDedup(corpus, centroids, threshold, maxCellSize)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSeq

  test("keep-lowest-id within cells; cross-cell near-pairs never compared") {
    // threshold 0.99: dup edges are (0,1) exact, (0,2)/(1,2) ≈0.999,
    // (10,11) ≈0.999; id 3 is same-cell but below threshold.
    assert(decisions(0.99) === Seq(
      (0L, 0L, false, -1L),   // cell head — kept
      (1L, 0L, true, 0L),     // exact dup of 0
      (2L, 0L, true, 0L),     // near-dup; dup_of = MIN(0, 1) = 0
      (3L, 0L, false, -1L),   // same cell, cos 0.894 < 0.99 — kept
      (10L, 1L, false, -1L),  // other cell head — kept
      (11L, 1L, true, 10L)))
  }

  test("threshold is a real dial: lowering it sweeps in weaker pairs") {
    val d = decisions(0.85)
    // now (0,3) cos≈0.894 also qualifies
    assert(d.find(_._1 == 3L).get === ((3L, 0L, true, 0L)))
  }

  test("per-edge, not transitive: a chain drops every non-head member") {
    // a [1,0] ~ b [cos .995] ~ c [cos(b,c) .995] but cos(a,c) ≈ .98 < .99:
    // c is still dropped — via b (a dropped-row witness still counts;
    // SemDeDup semantics, NOT connected-components keep-one)
    val chain = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.995f, 0.0999f),  // cos(0,1) ≈ 0.995
      2L -> Seq(0.980f, 0.1987f))  // cos(1,2) ≈ 0.995, cos(0,2) ≈ 0.980
    val d = Similarity.semanticDedup(chain, centroids, 0.99)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(d === Seq((0L, false, -1L), (1L, true, 0L), (2L, true, 1L)))
  }

  test("maxCellSize skew guard: oversized cells skipped, rows kept") {
    // cell 0 holds 4 vectors, cell 1 holds 2: cap at 3 → cell 0 is
    // skipped entirely (its exact dup survives — the documented contract:
    // run exact dedup first / train more centroids), cell 1 still dedups.
    assert(decisions(0.99, maxCellSize = 3) === Seq(
      (0L, 0L, false, -1L), (1L, 0L, false, -1L),
      (2L, 0L, false, -1L), (3L, 0L, false, -1L),
      (10L, 1L, false, -1L), (11L, 1L, true, 10L)))
  }

  test("planted exact copies always drop, under trained centroids") {
    val base = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = base.unionByName(base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val cents = KMeans.fit(planted, k = 4, iters = 1)
    val out = Similarity.semanticDedup(planted, cents, 0.9999)
      .filter(col("vec_id") >= 1000000L)
      .orderBy("vec_id").collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getBoolean(2), s"planted ${r.getLong(0)} not dropped")
      assert(r.getLong(3) === r.getLong(0) - 1000000L) // dup_of = original
    }
  }

  test("persisted-index path: dedup over a saved+reloaded codes index " +
      "matches the one-shot composition exactly") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup_idx").toString
    TrainedState.saveIvfIndex(Similarity.ivfAssign(corpus, centroids), dir)
    val viaIndex = Similarity.semanticDedupFromIndex(
      TrainedState.loadIvfIndex(spark, dir), 0.99)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val oneShot = Similarity.semanticDedup(corpus, centroids, 0.99)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(viaIndex === oneShot)
  }

  test("incremental == rebuild: batch decisions against an index equal " +
      "the full recompute restricted to batch ids, cells counted union-wide") {
    val base = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // interleaved split — both sides contribute lower-id witnesses
    val index = base.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val batch = base.filter(pmod(col("vec_id"), lit(3)) === 0)
    val cents = KMeans.fit(base, k = 4, iters = 1)
    for (cap <- Seq(0, 40)) {
      val inc = Similarity.semanticDedupAgainstIndex(
        batch, Similarity.ivfAssign(index, cents), cents, 0.4, cap)
        .orderBy("vec_id").collect().map(_.toString).toSeq
      val full = Similarity.semanticDedup(base, cents, 0.4, cap)
        .join(batch.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .orderBy("vec_id").collect().map(_.toString).toSeq
      assert(inc === full, s"cap=$cap")
      assert(inc.nonEmpty)
    }
  }

  test("incremental: a batch-mate is a valid witness; an index vector " +
      "wins regardless of batch order") {
    // index holds id 0 [1,0]; batch brings 5 (dup of 0), 6 (dup of 5),
    // 20 (clean, other cell)
    val index = Similarity.ivfAssign(emb(0L -> Seq(1f, 0f)), centroids)
    val batch = emb(5L -> Seq(1f, 0f), 6L -> Seq(0.999f, 0.045f),
      20L -> Seq(0f, 1f))
    val d = Similarity.semanticDedupAgainstIndex(batch, index, centroids, 0.99)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(d === Seq((5L, true, 0L), (6L, true, 0L), (20L, false, -1L)))
  }

  test("incremental: redelivered same-id vector emits a kept row, not a " +
      "self-dup") {
    val index = Similarity.ivfAssign(emb(7L -> Seq(1f, 0f)), centroids)
    val d = Similarity.semanticDedupAgainstIndex(
      emb(7L -> Seq(1f, 0f)), index, centroids, 0.99)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(d === Seq((7L, false)))
  }

  test("max_cos reports the strongest qualifying witness") {
    val d = Similarity.semanticDedup(corpus, centroids, 0.99)
      .filter(col("vec_id") === 1L).collect().head
    // exact dup pair: cos(x, x) within 3 ulp of 1
    assert(math.abs(d.getDouble(4) - 1.0) < 1e-12)
  }
}
