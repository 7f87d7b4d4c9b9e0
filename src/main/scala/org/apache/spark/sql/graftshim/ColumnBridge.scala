package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions (Spark 4.x hides
  * them behind the Connect-compatible Column API). Lives in the sql package
  * namespace for access; the only Spark-internal surface we touch.
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Wrap a 1-row/1-column DataFrame as a scalar-subquery expression (the
    * shape `might_contain` and friends require for their constant input —
    * Spark plans it as an independent subquery stage whose result is
    * inlined, keeping the whole computation one lazy DAG). */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
        .queryExecution.analyzed))

  /** Register a custom expression for SQL use. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
