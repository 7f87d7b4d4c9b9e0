package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.QuickTime <sfDir>
  * <query> [query...]` — same session config and noop-sink execution as
  * graft.Bench, without the 150-query sweep. For A/B iteration on one
  * operator; BENCH numbers still come from graft.Bench.
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      // one warmup + one timed pass, like Bench
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val t = run()
      println(f"QUICKTIME $n%-24s $t%7.3f s")
    }
    spark.stop()
  }
}
