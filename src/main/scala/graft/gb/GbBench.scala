package graft.gb

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Green Button pipeline benchmark — the analog of the reference's criterion
  * benches (lib/personalgreenbutton/benches/parse_test_files.rs: parse+
  * denormalize, and sort). Replicates the EGD corpus file N times and
  * measures end-to-end parse→denormalize→count and the global sort.
  *
  *   runMain graft.gb.GbBench [nCopies]
  */
object GbBench {
  def main(args: Array[String]): Unit = {
    val nCopies = if (args.nonEmpty) args(0).toInt else 50
    val src = Paths.get(
      "/root/reference/test_files/EGD_Gas_EnergyUsage_20221225_20241225.xml")
    val dir = Files.createTempDirectory("gb_bench")
    (0 until nCopies).foreach { i =>
      Files.copy(src, dir.resolve(s"copy_$i.xml"), StandardCopyOption.REPLACE_EXISTING)
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (codegen + file listing)
    GreenButton.timeseries(spark, s"$dir/copy_0.xml").count()

    val bytes = Files.size(src) * nCopies
    val t0 = System.nanoTime()
    val ts = GreenButton.timeseries(spark, s"$dir/*.xml")
    val rows = ts.count()
    val parseSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    TimeSeriesOps.sortSeries(ts).count()
    val sortSec = (System.nanoTime() - t1) / 1e9

    println(f"""{"bench":"gb_pipeline","files":$nCopies,"rows":$rows,""" +
      f""""mb":${bytes / 1e6}%.1f,"parse_denorm_sec":$parseSec%.3f,""" +
      f""""mb_per_sec":${bytes / 1e6 / parseSec}%.1f,"sort_sec":$sortSec%.3f}""")
    spark.stop()
  }
}
