package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality audit a corpus release ships with:
  * per column, row count, null count, distinct count, and min/max
  * (stringified so heterogeneous column types stack into one report).
  *
  * ONE aggregation pass over the data computes every column's stats
  * (map-side partial aggregation; no per-column re-scan), then a `stack`
  * pivots the single result row into one report row per column — the
  * generator runs on one row, so the pivot is free. Exact distinct counts
  * plan with Expand (one duplicate of each input row per profiled
  * column): the honest cost of exactness. At 100 TB profile with
  * `approxDistinct = true` — HyperLogLog++ partial-aggregates without
  * Expand, and everything else is unchanged.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema: $missing")
    def nd(c: String) =
      if (approxDistinct) approx_count_distinct(col(c))
      else countDistinct(col(c))
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        nd(c).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`")
      .mkString(", ")
    one.select(col("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
