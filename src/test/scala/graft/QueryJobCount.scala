package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Time + Spark-job-count probe for named gate queries — the audit
  * instrument behind NOTES.md's job-count attributions (a stage that
  * re-executes a predecessor's plan through a lazy broadcast shows up
  * as a job count far above the plan's natural action count; the fix
  * class is localizing the bounded table so its broadcast schedules
  * nothing). Runs each named query 3 times after a warmup rep.
  *
  * Run: `sbt "Test/runMain graft.QueryJobCount e_ann_opq_trained ..."`
  */
object QueryJobCount {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryJobCount <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      def once(): (Double, Int) = {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        val j0 = jobCount.get()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drain
        (t, jobCount.get() - j0)
      }
      once() // warmup
      (1 to 3).foreach { i =>
        val (t, j) = once()
        println(f"[jobs] $name rep$i time=$t%7.3f s jobs=$j")
      }
    }
    spark.stop()
  }
}
