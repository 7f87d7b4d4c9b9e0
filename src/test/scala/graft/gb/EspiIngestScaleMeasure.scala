package graft.gb

import org.apache.spark.sql.SparkSession

/** r15 verdict #6: the streaming ESPI ingest path had NO scale
  * measurement — the XML corpus does not scale with the sf directories,
  * so this harness GENERATES synthetic Atom/ESPI feeds two decades
  * apart (same shape as the reference fixtures: LTP + ReadingType +
  * MeterReading metadata entries, one IntervalBlock entry carrying the
  * readings) and measures [[graft.streaming.StreamingIngest
  * .ingestXmlStream]]'s per-trigger cost at both scales.
  *
  *   1×   leg:  4 feed files ×    600 readings =   2,400 readings
  *   100× leg: 40 feed files × 6,000 readings = 240,000 readings
  *
  * Per-trigger cost is the foreachBatch body (parse → staging →
  * denormalize → sink); the claim to check is that it scales with the
  * BATCH BYTES (readings), with a bounded fixed planning term — not
  * with anything corpus-sized.
  *
  * Run: sbt "Test/runMain graft.gb.EspiIngestScaleMeasure"
  */
object EspiIngestScaleMeasure {

  private def reading(i: Int): String =
    s"""<espi:IntervalReading><espi:timePeriod>
       |<espi:duration>3600</espi:duration>
       |<espi:start>${1670025600L + i * 3600L}</espi:start>
       |</espi:timePeriod><espi:value>${1000 + i}</espi:value>
       |</espi:IntervalReading>""".stripMargin

  private def feed(fileNo: Int, nReadings: Int): String = {
    val up = s"/espi/UsagePoint/$fileNo"
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<feed xmlns="http://www.w3.org/2005/Atom"
       |      xmlns:espi="http://naesb.org/espi">
       |<entry><title>ltp</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="/espi/LocalTimeParameters/1"/>
       |  <content><espi:LocalTimeParameters>
       |    <espi:dstStartRule>FFFFFFFF</espi:dstStartRule>
       |    <espi:dstEndRule>FFFFFFFF</espi:dstEndRule>
       |    <espi:dstOffset>3600</espi:dstOffset>
       |    <espi:tzOffset>-18000</espi:tzOffset>
       |  </espi:LocalTimeParameters></content></entry>
       |<entry><title>rt</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="$up/MeterReading/7/ReadingType/9"/>
       |  <content><espi:ReadingType>
       |    <espi:accumulationBehaviour>4</espi:accumulationBehaviour>
       |    <espi:commodity>7</espi:commodity>
       |    <espi:currency>124</espi:currency>
       |    <espi:dataQualifier>12</espi:dataQualifier>
       |    <espi:flowDirection>1</espi:flowDirection>
       |    <espi:kind>58</espi:kind>
       |    <espi:powerOfTenMultiplier>-3</espi:powerOfTenMultiplier>
       |    <espi:uom>42</espi:uom>
       |  </espi:ReadingType></content></entry>
       |<entry><title>mr</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="$up/MeterReading/7"/>
       |  <link rel="related" type="espi-entry/ReadingType"
       |        href="$up/MeterReading/7/ReadingType/9"/>
       |  <content><espi:MeterReading/></content></entry>
       |<entry><title>Meter data</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="$up/MeterReading/7/IntervalBlock/1"/>
       |  <content><espi:IntervalBlock>${
         (0 until nReadings).map(reading).mkString
       }</espi:IntervalBlock></content></entry>
       |</feed>""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def leg(tag: String, nFiles: Int, nReadings: Int): (Double, Long) = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"espi_scale_$tag").toString
      (0 until nFiles).foreach { i =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/feed_$i.xml"),
          feed(i, nReadings))
      }
      var rows = 0L
      val batchTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      def once(): Unit = {
        batchTimes.clear(); rows = 0L
        val q = graft.streaming.StreamingIngest.ingestXmlStream(
          spark, dir,
          sink = (df, _) => {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            rows += df.count()
            batchTimes += (System.nanoTime() - t0) / 1e9
          })
        q.awaitTermination()
      }
      once() // warm (codegen, parquet-free path, state dirs)
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[espi-scale] $tag files=$nFiles readings/file=$nReadings " +
        f"rows=$rows wall=$t%.2fs sink_batches=${batchTimes.size}")
      (t, rows)
    }

    val (t1, r1) = leg("1x", 4, 600)
    val (tN, rN) = leg("100x", 40, 6000)
    println(f"[espi-scale] 100x ratio: wall=${tN / t1}%.2f over " +
      f"${rN.toDouble / r1}%.0fx rows — per-reading cost ratio " +
      f"${(tN / rN) / (t1 / r1)}%.3f (claim: well under 1 — the 1x wall " +
      "is fixed per-trigger overhead, the 100x wall is data)")
    spark.stop()
  }
}
