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
    // GRAFT_EXPLAIN_ALL=1: also capture EVERY execution the query's
    // CONSTRUCTION and run trigger (localized probe collects, shortlist
    // collects, lifecycle writes) — the serving paths localize bounded
    // stages eagerly, so the final DataFrame's own plan no longer shows
    // the hot candidate stage; the listener capture is where pushdown /
    // fused-expression claims are checkable.
    val captureAll = sys.env.get("GRAFT_EXPLAIN_ALL").contains("1")
    for (n <- names) {
      println(s"\n========== $n ==========")
      val plans =
        new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          plans.add((funcName, qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))); ()
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      if (captureAll) spark.listenerManager.register(listener)
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (captureAll) {
        try {
          df.write.format("noop").mode("overwrite").save()
          Thread.sleep(500) // async listener drain
        } finally spark.listenerManager.unregister(listener)
        import scala.jdk.CollectionConverters._
        plans.asScala.zipWithIndex.foreach { case ((fn, p), i) =>
          println(s"\n---------- $n execution $i ($fn) ----------")
          println(p)
        }
      }
    }
    spark.stop()
  }
}
