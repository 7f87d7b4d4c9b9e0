package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution drift between two corpus snapshots — the check a corpus
  * release (or an ingest batch) runs against the previous release before
  * training on it: per feature, the Population Stability Index over the
  * feature's observed buckets.
  *
  * PSI(feature) = Σ_buckets (p_b − q_b) · ln(p_b / q_b), with additive
  * (+1) smoothing so a bucket present on only one side contributes a
  * finite term instead of ∞. Conventional reading: < 0.1 stable,
  * 0.1–0.2 moderate shift, > 0.2 investigate.
  *
  * Engine-exactness: shares are derived from integer counts, each
  * bucket's term is rounded to an integer at 1e-9 resolution
  * (`psi_e9`), and the per-feature total sums those INTEGERS — so the
  * result is reproducible bit-for-bit across engines and partitionings
  * (a double sum would depend on association order).
  *
  * Plan shape: one scan per side (all features extracted in a single
  * projection, then exploded — F histogram rows per input row, never F
  * scans), one hash aggregation keyed (feature, bucket), then
  * per-feature windows over the AGGREGATED frame (≤ bucket-count rows,
  * negligible). At 100 TB the data-sized cost is the two scans and one
  * shuffle of (feature, bucket, side) counts — partial aggregation
  * collapses to at most F × |buckets| rows per map task before it.
  */
object Drift {

  /** Per-(feature, bucket) drift report.
    *
    * @param ref      baseline snapshot
    * @param cur      candidate snapshot
    * @param features (name, bucket expression) pairs, evaluated against
    *                 both frames; buckets are stringified, nulls bucket
    *                 as "&lt;null&gt;"
    * @return (feature, bucket, n_ref, n_cur, psi_e9, psi_total_e9)
    */
  def psi(ref: DataFrame, cur: DataFrame,
          features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "psi requires at least one feature")
    def hist(df: DataFrame, isRef: Boolean): DataFrame =
      df.select(explode(array(features.map { case (name, c) =>
          struct(lit(name).as("feature"),
            coalesce(c.cast("string"), lit("<null>")).as("bucket"))
        }: _*)).as("f"))
        .select(lit(isRef).as("is_ref"), col("f.feature"), col("f.bucket"))
    val counts = hist(ref, isRef = true).unionAll(hist(cur, isRef = false))
      .groupBy(col("feature"), col("bucket"))
      .agg(count(when(col("is_ref"), lit(1))).as("n_ref"),
        count(when(!col("is_ref"), lit(1))).as("n_cur"))
    val byFeature = Window.partitionBy(col("feature"))
    val p = (col("n_ref") + 1).cast("double") /
      (sum(col("n_ref")).over(byFeature) + count(lit(1)).over(byFeature))
    val q = (col("n_cur") + 1).cast("double") /
      (sum(col("n_cur")).over(byFeature) + count(lit(1)).over(byFeature))
    counts
      .withColumn("psi_e9",
        round((p - q) * log(p / q) * lit(1e9)).cast("long"))
      .withColumn("psi_total_e9", sum(col("psi_e9")).over(byFeature))
  }
}
