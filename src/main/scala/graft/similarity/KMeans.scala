package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spherical k-means (cosine objective) expressed entirely as DataFrame
  * algebra — Lloyd iterations where each step is:
  *
  *   assign: broadcast the k centroids, argmax-cosine per vector (window)
  *   update: posexplode → per-(centroid, position) mean → reassemble arrays
  *
  * No MLlib, no RDDs, no driver-side math: every step is a shuffle-bounded
  * aggregation, so the same plan trains on 10⁹ vectors. Deterministic
  * seeding (hash-spread pick of initial centroids) keeps results
  * reproducible run-to-run.
  */
object KMeans {

  /** @return DataFrame(centroid_id LONG, centroid ARRAY<FLOAT>) */
  def fit(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    // deterministic, hash-spread initialization: the k vectors with the
    // smallest xxhash64(vec_id) — spread uniformly, no RNG state
    var centroids = corpus
      .withColumn("_h", xxhash64(col("vec_id")))
      .orderBy(col("_h")).limit(k)
      .withColumn("centroid_id", // k rows post-limit, one partition
        row_number().over(
          Window.partitionBy(
            graft.functions.WindowKeys.constantPartitionKey(col("_h")))
            .orderBy(col("_h"))).cast("long") - 1)
      .select(col("centroid_id"), col("embedding").as("centroid"))

    for (_ <- 1 to iters) {
      val assigned = assign(corpus, centroids)
      val updated = assigned
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(avg(col("x")).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("centroid"))
      // a centroid that won zero vectors emits no update row; keep its
      // previous position instead of silently shrinking the codebook below
      // k (callers size structures by k — PQ codes, IVF cells)
      centroids = centroids
        .select(col("centroid_id"), col("centroid").as("_prev"))
        .join(updated, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("centroid"), col("_prev")).as("centroid"))
    }
    centroids
  }

  /** Nearest-centroid assignment by cosine (broadcast centroids). */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("_cos").desc, col("centroid_id"))
    corpus.crossJoin(broadcast(centroids))
      .withColumn("_cos", Similarity.cosine(col("embedding"), col("centroid")))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .drop("_cos", "_r", "centroid")
  }
}
