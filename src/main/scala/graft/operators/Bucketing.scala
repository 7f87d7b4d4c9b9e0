package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once at write time so
  * repeated joins/aggregations on the bucket key run with NO exchange —
  * the ahead-of-time alternative to per-query shuffles for hot join keys
  * (SURVEY §2.3 "co-located joins via bucketing").
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
