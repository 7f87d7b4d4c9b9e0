package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-ANONYMITY suppression over quasi-identifier columns — the release
  * gate a privacy review runs before corpus delivery: a row whose
  * quasi-identifier combination is shared by fewer than `k` rows is
  * re-identifiable by that combination and must not ship. This is the
  * SUPPRESSION form (drop under-k groups outright); generalization
  * (coarsening values until groups reach k) is a caller-side iteration
  * of the same receipt — coarsen the named columns and re-run until the
  * receipt shows no suppressed groups.
  *
  * Scale: one `groupBy(quasiCols)` count (two-phase, quasi values +
  * a count on the shuffle) and one semi-join back; the group table is
  * quasi-cardinality-sized and broadcasts while small. Deterministic,
  * zero float surface — the receipt is oracle-checkable data.
  */
object Anonymize {

  /** Per-group receipt: `(quasiCols…, n, suppressed)` — every observed
    * quasi combination, flagged when its size is below `k`. */
  def kAnonymityReceipt(df: DataFrame, quasiCols: Seq[String],
                        k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityReceipt: no quasi columns")
    require(k >= 2, s"kAnonymityReceipt: k=$k must be >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("suppressed", col("n") < k)
  }

  /** Suppress: rows of under-`k` groups removed; returns
    * `(kept rows, receipt)`. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long)
      : (DataFrame, DataFrame) = {
    val receipt = kAnonymityReceipt(df, quasiCols, k)
    val keepGroups = receipt.filter(!col("suppressed"))
      .select(quasiCols.map(col): _*)
    (df.join(broadcast(keepGroups), quasiCols, "left_semi"), receipt)
  }
}
