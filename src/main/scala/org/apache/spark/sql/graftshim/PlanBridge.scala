package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ClassicConversions, Dataset => ClassicDataset}
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge to the `private[sql]` plan-level surface (Spark 4.x hides the
  * classic internals behind the Connect-compatible API): wrap a custom
  * [[LogicalPlan]] as a DataFrame, read a DataFrame's analyzed plan, and
  * register an extra planner strategy on a live session. Lives in the sql
  * package namespace for access; together with [[ColumnBridge]] this is the
  * only Spark-internal surface graft touches.
  */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(ClassicConversions.castToImpl(spark), plan)

  def analyzed(df: DataFrame): LogicalPlan =
    ClassicConversions.castToImpl(df).queryExecution.analyzed

  /** Idempotently append a planner strategy to the session (the
    * `spark.experimental` hook — public API, but typed against classic).
    * Lets operators that plan to a custom SparkPlan self-register on first
    * use, so callers don't have to configure `spark.sql.extensions`. */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = ClassicConversions.castToImpl(spark)
    cs.experimental.synchronized {
      if (!cs.experimental.extraStrategies.contains(s))
        cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }
}
