package graft.gb

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** E2E over a SECOND provider shape — a synthetic feed in the form of the
  * stripped EPC NonInterval fixture (/root/reference/.MISSING_LARGE_BLOBS):
  * daily register reads with NO cost, an ElectricPowerQualitySummary
  * entry, and MULTIPLE IntervalBlock elements in one content element (the
  * Hydro One quirk content.rs:27-29 documents). The Enbridge feed the
  * golden suite runs never exercises any of these, so a parser or
  * denormalize fallthrough on them would ship unseen. */
class SecondProviderSpec extends SparkTestBase {

  private val feedPath = {
    // materialize the classpath resource as a real file for the glob-based
    // readers (and keep a stable name for the `file` column)
    val dir = java.nio.file.Files.createTempDirectory("epc_synth").toFile
    val f = new java.io.File(dir, "epc_noninterval_synthetic.xml")
    val in = getClass.getResourceAsStream("/epc_noninterval_synthetic.xml")
    java.nio.file.Files.copy(in, f.toPath)
    in.close()
    f.getAbsolutePath
  }

  test("parses every entry type incl. ElectricPowerQualitySummary; the " +
      "multi-IntervalBlock content yields ALL its readings") {
    val parsed = EspiXml.parseFeed("epc.xml", new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(feedPath)),
      java.nio.charset.StandardCharsets.UTF_8))
    assert(parsed.error == null, s"parse failed: ${parsed.error}")
    val types = parsed.entries.map(_.entryType)
    assert(types.count(_ == "Other") == 4, // UP, EPQS, MR, US
      s"expected 4 Other entries, got $types")
    assert(types.contains("IntervalBlock") && types.contains("ReadingType")
      && types.contains("LocalTimeParameters"))
    // both IntervalBlock elements of the one content node parsed
    assert(parsed.readings.length == 4,
      s"multi-block content dropped readings: ${parsed.readings.length}")
    // non-interval reads carry no cost element → NaN (missing marker)
    assert(parsed.readings.forall(r => r.cost.isNaN))
  }

  test("denormalize resolves the two-hop link chain on the second " +
      "provider's href shapes; local time uses the feed's own tz") {
    val ts = GreenButton.timeseries(spark, feedPath)
    val rows = ts.collect()
    assert(rows.length == 4)
    // RT attributes decoded through the dictionary for every row
    assert(ts.filter(col("uom").isNull || col("uom") === "").count() == 0)
    assert(ts.select("commodity").distinct().count() == 1)
    // power-of-ten 0 → raw values pass through
    val values = rows.map(_.getAs[Float]("value")).toSet
    assert(values == Set(18250f, 19020f, 17775f, 20110f))
    // December, tzOffset -25200, DST off → civil shift is exactly tzOffset
    val starts = rows.map(_.getAs[Long]("time_period_start_unix")).toSet
    val utc = Set(1734048000L, 1734134400L, 1734220800L, 1734307200L)
    assert(starts == utc.map(_ - 25200L),
      s"local-time shift wrong for tzOffset -25200: $starts")
    // no cost anywhere → the schema-variant boolean says so
    assert(!TimeSeriesOps.hasCost(ts))
  }

  test("CLI csv + influxdb e2e: csv matches the library string; influx " +
      "lines OMIT the cost field (hasCost=false variant)") {
    val out = java.nio.file.Files.createTempDirectory("epc_cli").toFile
    GreenButtonCli.run(Array("--filetype", "csv",
      "--out", out.getAbsolutePath + "/csv", feedPath), spark)
    val csvPart = new java.io.File(out, "csv").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(csvPart.length == 1)
    val written = new String(
      java.nio.file.Files.readAllBytes(csvPart.head.toPath))
    val ts = GreenButton.timeseries(spark, feedPath)
      .orderBy(col("file"), col("seq")).drop("file", "seq")
    assert(written == TimeSeriesOps.csvString(ts))
    // cost cells are NaN-rendered, not zero (missing != free)
    assert(written.linesIterator.drop(1).forall(_.split(",")(1) == "NaN"))

    GreenButtonCli.run(Array("--filetype", "influxdb",
      "--out", out.getAbsolutePath + "/ifx", feedPath), spark)
    val lines = spark.read.text(out.getAbsolutePath + "/ifx")
      .collect().map(_.getString(0))
    assert(lines.length == 4)
    assert(lines.forall(!_.contains("cost=")),
      s"cost field leaked into a no-cost feed's lines:\n${lines.head}")
    assert(lines.forall(_.startsWith("Daily_Register_Read,db=greenbutton,")))
  }
}
