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
    * the property bucketed joins buy. Walks the plan tree (including AQE
    * stages) for ShuffleExchangeLike nodes rather than grepping one
    * partitioning flavor out of the plan string: range/single-partition
    * exchanges are shuffles too, and broadcast exchanges are not. */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def hasShuffle(p: SparkPlan): Boolean =
      p.isInstanceOf[ShuffleExchangeLike] ||
        (p match {
          case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
          case s: QueryStageExec => hasShuffle(s.plan)
          case _ => p.children.exists(hasShuffle)
        })
    !hasShuffle(df.queryExecution.executedPlan)
  }
}
