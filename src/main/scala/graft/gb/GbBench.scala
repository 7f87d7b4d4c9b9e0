package graft.gb

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Green Button pipeline benchmark — the analog of the reference's criterion
  * benches (lib/personalgreenbutton/benches/parse_test_files.rs: parse+
  * denormalize, and sort). Replicates the EGD corpus file N times and
  * measures, per repetition:
  *
  *   - `disk`: end-to-end scan→parse→denormalize→count from files (what a
  *     cluster deployment pays; read-bound — Hadoop local FS + checksums)
  *   - `mem`: parse→denormalize from a pre-loaded, pre-materialized
  *     in-memory corpus — the reference criterion setup (the whole test
  *     corpus is read into memory before iterations start,
  *     parse_test_files.rs:28-35), so this is the single-node
  *     throughput-parity number
  *   - `sort`: the reference's `sort` bench analog (sort_and_chunk)
  *
  *   runMain graft.gb.GbBench [nCopies] [reps]
  */
object GbBench {
  def main(args: Array[String]): Unit = {
    val nCopies = if (args.nonEmpty) args(0).toInt else 50
    val reps = if (args.length > 1) args(1).toInt else 1
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
    spark.sparkContext.setLogLevel("ERROR") // FileStreamSink glob-probe WARNs
    import spark.implicits._

    // warmup (codegen + file listing)
    GreenButton.timeseries(spark, s"$dir/copy_0.xml").count()

    val bytes = Files.size(src) * nCopies
    val mb = bytes / 1e6

    // ---- disk path: scan + parse + denormalize, per rep. The staging
    // cache is unpersisted between reps — leaked per-rep caches would turn
    // later reps (and the sort bench) into a GC measurement. The JSON
    // summary reports the BEST rep (criterion-style), not whichever ran
    // last.
    var rows = 0L
    var diskSec = Double.MaxValue
    for (i <- 1 to reps) {
      val parsed = GreenButton.parse(spark, s"$dir/*.xml")
      val t0 = System.nanoTime()
      rows = GreenButton.denormalize(spark,
        GreenButton.staging(parsed), Permissive).count()
      val sec = (System.nanoTime() - t0) / 1e9
      diskSec = math.min(diskSec, sec)
      parsed.unpersist(blocking = true)
      if (reps > 1) println(f"disk rep $i: $sec%.3f s (${mb / sec}%.1f MB/s)")
    }

    // ---- in-memory path: the criterion setup — corpus pre-loaded and
    // materialized as a cached Dataset; time parse+denormalize only
    val corpus = {
      val xml = new String(Files.readAllBytes(src),
        java.nio.charset.StandardCharsets.UTF_8)
      (0 until nCopies).map(i => (s"copy_$i.xml", xml))
    }
    val corpusDs = spark.createDataset(corpus)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    corpusDs.count() // materialize before timing, like criterion's setup
    var memSec = Double.MaxValue
    for (i <- 1 to reps) {
      val parsed = corpusDs.map { case (p, xml) => EspiXml.parseFeed(p, xml) }
      val t0 = System.nanoTime()
      val n = GreenButton.denormalize(spark,
        GreenButton.staging(parsed, cache = true), Permissive).count()
      val sec = (System.nanoTime() - t0) / 1e9
      memSec = math.min(memSec, sec)
      parsed.unpersist(blocking = true)
      require(n == rows, s"mem path row mismatch: $n vs $rows")
      if (reps > 1) println(f"mem rep $i: $sec%.3f s (${mb / sec}%.1f MB/s)")
    }
    corpusDs.unpersist(blocking = true)

    // sort bench over the MATERIALIZED output (criterion's sort bench takes
    // parsed data as given, parse_test_files.rs:37-44) — not pipeline+sort.
    // Built from an explicit parse handle so its staging cache can be
    // released before timing: only ts is resident during the sort.
    val parsedForSort = GreenButton.parse(spark, s"$dir/*.xml")
    val ts = GreenButton.denormalize(spark,
      GreenButton.staging(parsedForSort), Permissive).drop("file", "seq")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ts.count()
    parsedForSort.unpersist(blocking = true)
    val t1 = System.nanoTime()
    TimeSeriesOps.sortSeries(ts).count()
    val sortSec = (System.nanoTime() - t1) / 1e9

    println(f"""{"bench":"gb_pipeline","files":$nCopies,"rows":$rows,""" +
      f""""mb":$mb%.1f,"disk_sec":$diskSec%.3f,"disk_mb_per_sec":${mb / diskSec}%.1f,""" +
      f""""mem_sec":$memSec%.3f,"mem_mb_per_sec":${mb / memSec}%.1f,""" +
      f""""sort_sec":$sortSec%.3f}""")
    spark.stop()
  }
}
