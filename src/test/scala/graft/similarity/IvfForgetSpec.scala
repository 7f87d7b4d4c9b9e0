package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.ivfForget]] — the deletion contract: forget == rebuild
  * without the deleted vectors (exact), receipt arithmetic, touched
  * cells only. */
class IvfForgetSpec extends SparkTestBase {

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  test("forget == rebuild over the surviving corpus; receipt sums and " +
      "touched-cell law") {
    val cents = centroids.localCheckpoint(true)
    val index = Similarity.ivfAssign(emb, cents).localCheckpoint(true)
    val dels = emb.filter(col("vec_id") % 37 === 0).select("vec_id")
    val (cleaned, receipt) = Similarity.ivfForget(index, dels)

    // assignment is per-vector under fixed centroids: forgetting is
    // EXACTLY rebuilding over the surviving corpus
    val rebuilt = Similarity.ivfAssign(
      emb.join(dels, Seq("vec_id"), "left_anti"), cents)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(cleaned) === rows(rebuilt))

    val rec = receipt.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rec.nonEmpty)
    rec.values.foreach { case (before, removed, after) =>
      assert(removed >= 1, "untouched cell in the receipt")
      assert(after === before - removed)
    }
    // receipt accounts for every deleted vector that was in the index
    assert(rec.values.map(_._2).sum ===
      index.join(dels, Seq("vec_id"), "left_semi").count())
    // probes over the cleaned index never return a deleted vector
    val probed = Similarity.ivfTopKFromIndex(
      emb.filter(col("vec_id") < 10), cleaned, k = 5, cents,
      nprobe = cents.count().toInt)
    assert(probed.filter(col("neighbor_id") % 37 === 0).count() === 0)
  }

  test("empty deletion list: receipt empty, index unchanged") {
    val cents = centroids
    val index = Similarity.ivfAssign(emb, cents).localCheckpoint(true)
    val (cleaned, receipt) = Similarity.ivfForget(index,
      index.filter(lit(false)).select("vec_id"))
    assert(receipt.count() === 0)
    assert(cleaned.count() === index.count())
  }
}
