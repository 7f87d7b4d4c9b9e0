package graft.gb

import org.apache.spark.sql.SparkSession

/** Formatted-plan audit of the GB denormalize pipeline:
  * `runMain graft.gb.GbPlanAudit [pathGlob]`. */
object GbPlanAudit {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/root/reference/test_files/*.xml"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ts = GreenButton.timeseries(spark, path)
    ts.count() // materialize with AQE so the final plan is the real one
    println(ts.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
