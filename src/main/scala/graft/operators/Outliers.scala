package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / median-absolute-deviation
  * (MAD) flags — the heavy-tail-safe alternative to mean/stddev z-scores
  * for corpus-quality gating (a handful of 100 MB documents shifts a mean
  * arbitrarily but moves a median not at all).
  *
  * Exactness: both medians use the repo's POSITIONAL convention (lower
  * median = value at rank `(n+1) div 2` under `(value, id)` order — the
  * q_median_iqr / d_winsorize precedent), so on integer inputs every
  * derived number is an exact integer and the oracle replays it
  * verbatim; the outlier test `|x−med| > k·MAD` is pure integer
  * arithmetic.
  *
  * Scale shape: two rank-window passes on the group key (the same
  * hash-partitioning both times — Spark reuses the exchange) plus two
  * tiny per-group aggregate joins broadcast back (the d_winsorize
  * pattern). Group cardinality bounds the broadcast, row count bounds
  * the windows; no driver math, no collect.
  */
object Outliers {

  /** Flag rows whose |value − groupMedian| exceeds `k` × the group's MAD.
    * Emits the input keys plus `med`, `mad`, `dev`, `is_outlier`.
    * Groups where MAD = 0 (over half the rows share the median) flag
    * every row strictly off the median — the standard MAD degeneracy,
    * stated rather than patched so the oracle states it identically. */
  def madFlag(df: DataFrame, groupCol: String, valueCol: String,
              idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"madFlag: k=$k must be >= 1")
    val v = col(valueCol).cast("long")
    val wRank = Window.partitionBy(col(groupCol)).orderBy(v, col(idCol))
    val wGrp = Window.partitionBy(col(groupCol))
    val meds = df
      .withColumn("_rn", row_number().over(wRank))
      .withColumn("_n", count(lit(1)).over(wGrp))
      .groupBy(col(groupCol))
      .agg(sum(when(col("_rn") === expr("(_n + 1) div 2"), v)
        .otherwise(0L)).as("med"))
    val withDev = df.join(broadcast(meds), Seq(groupCol))
      .withColumn("dev", abs(v - col("med")))
    val wDev = Window.partitionBy(col(groupCol))
      .orderBy(col("dev"), col(idCol))
    val mads = withDev
      .withColumn("_rn", row_number().over(wDev))
      .withColumn("_n", count(lit(1)).over(wGrp))
      .groupBy(col(groupCol))
      .agg(sum(when(col("_rn") === expr("(_n + 1) div 2"), col("dev"))
        .otherwise(0L)).as("mad"))
    withDev.join(broadcast(mads), Seq(groupCol))
      .withColumn("is_outlier", (col("dev") > col("mad") * k).cast("int"))
      .select(col(groupCol), col(idCol), v.as(valueCol), col("med"),
        col("mad"), col("dev"), col("is_outlier"))
  }
}
