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
    // GRAFT_JOB_TRACE=1: count jobs per CALLSITE so a job-heavy query
    // attributes its scheduler round trips to code lines
    val trace = sys.env.get("GRAFT_JOB_TRACE").contains("1")
    val sites = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        if (trace) {
          // the SQL execution pool's jobs carry a lambda frame as the
          // stage NAME; the stage DETAILS hold the full callsite stack —
          // the first graft frame is the attributable line
          val fromDetails = j.stageInfos.lastOption.flatMap(si =>
            si.details.split('\n').find(_.contains("graft."))
              .map(_.trim))
          val site = fromDetails
            .orElse(j.stageInfos.lastOption
              .map(_.name.takeWhile(_ != '\n')))
            .getOrElse("?")
          if (site.contains("withThreadLocalCaptured") &&
              sys.env.contains("GRAFT_JOB_DUMP")) {
            val si = j.stageInfos.lastOption
            println(s"[jobdump] name=${si.map(_.name).getOrElse("?")}")
            println(s"[jobdump] details=${si.map(_.details).getOrElse("?")}")
            println(s"[jobdump] props=" + Option(j.properties).map(p =>
              p.stringPropertyNames().toArray.toSeq.map(k =>
                s"$k=${p.getProperty(k.toString).take(120)}")
                .mkString("; ")).getOrElse("none"))
          }
          sites.computeIfAbsent(site,
            _ => new java.util.concurrent.atomic.AtomicInteger)
            .incrementAndGet()
        }
        ()
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
      sites.clear()
      (1 to 3).foreach { i =>
        val (t, j) = once()
        println(f"[jobs] $name rep$i time=$t%7.3f s jobs=$j")
      }
      if (trace) {
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq.sortBy(-_._2.get()).foreach { case (s, n) =>
          println(f"[jobs]   ${n.get()}%4d x $s")
        }
        sites.clear()
      }
    }
    spark.stop()
  }
}
