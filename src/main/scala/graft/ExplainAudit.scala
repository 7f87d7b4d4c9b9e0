package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for selected queries so
  * scale properties (pushdown, broadcast choice, shuffle count, codegen
  * spans) can be reviewed — `runMain graft.ExplainAudit [query ...]`. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
