package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class EspiDataSourceSpec extends SparkTestBase {

  val corpus = "/root/reference/test_files/*.xml"

  lazy val df = spark.read.format("espi").load(corpus)

  test("reads one row per Atom entry with the union schema") {
    assert(df.schema.fieldNames.toSeq == EspiDataSource.schema.fieldNames.toSeq)
    assert(df.count() > 0)
    // entry types partition the rows
    val types = df.groupBy("entry_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.contains("IntervalBlock"))
    assert(types.contains("ReadingType"))
    assert(types.contains("LocalTimeParameters"))
  }

  test("payload structs attach only to their entry type") {
    assert(df.filter(col("entry_type") =!= "IntervalBlock" &&
      col("readings").isNotNull).count() == 0)
    assert(df.filter(col("entry_type") === "ReadingType" &&
      col("reading_type").isNull).count() == 0)
    assert(df.filter(col("entry_type") === "LocalTimeParameters" &&
      col("local_time_params").isNull).count() == 0)
  }

  test("column pruning: envelope-only projection works") {
    val slim = df.select("title", "href")
    assert(slim.count() == df.count())
    val plan = slim.queryExecution.executedPlan.toString
    assert(!plan.contains("readings") || plan.contains("title"))
  }

  test("explode(readings) matches the flatMap staging row count") {
    val viaSource = df.select(explode(col("readings"))).count()
    val staging = graft.gb.GreenButton.staging(
      graft.gb.GreenButton.parse(spark, corpus))
    assert(viaSource == staging.readings.count())
  }

  test("file-predicate pushdown prunes whole files before they are opened") {
    // two files, one unparseable; failfast would throw if the bad file were
    // ever parsed — the file predicate must prune it at planning time
    val dir = java.nio.file.Files.createTempDirectory("espi_push").toFile
    val good = new java.io.File(dir, "good.xml")
    val bad = new java.io.File(dir, "bad.xml")
    val feed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/test_files/EGD_Gas_EnergyUsage_20221225_20241225.xml")),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.writeString(good.toPath, feed)
    java.nio.file.Files.writeString(bad.toPath, "<feed><entry>not espi")
    val read = spark.read.format("espi")
      .option("mode", "failfast").load(dir.getAbsolutePath + "/*.xml")
    val n = read.filter(col("file").endsWith("good.xml")).count()
    assert(n > 0)
    // and the pushed filter is visible in the plan
    val plan = read.filter(col("file").endsWith("good.xml"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("StringEndsWith"),
      s"pushdown not visible:\n$plan")
    // sanity: without the predicate, failfast does hit the bad file
    intercept[Exception] { read.count() }
  }

  test("entry_type pushdown matches post-filter semantics") {
    val filtered = df.filter(col("entry_type") === "ReadingType")
      .select("file", "idx", "href").collect().toSet
    val manual = df.collect().filter(_.getAs[String]("entry_type") == "ReadingType")
      .map(r => org.apache.spark.sql.Row(
        r.getAs[String]("file"), r.getAs[Int]("idx"), r.getAs[String]("href")))
      .toSet
    assert(filtered == manual)
    assert(filtered.nonEmpty)
  }

  test("streaming: micro-batch source ingests newly arrived files exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("espi_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("espi_ckpt").toFile
    val feed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/test_files/EGD_Gas_EnergyUsage_20221225_20241225.xml")),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.writeString(
      new java.io.File(dir, "a.xml").toPath, feed)
    val q = spark.readStream.format("espi")
      .load(dir.getAbsolutePath + "/*.xml")
      .select("file", "idx", "entry_type")
      .writeStream.format("memory").queryName("espi_mem")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      val n1 = spark.sql("SELECT count(*) FROM espi_mem").head.getLong(0)
      assert(n1 > 0)
      // second file arrives; only its entries are appended (exactly once)
      java.nio.file.Files.writeString(
        new java.io.File(dir, "b.xml").toPath, feed)
      q.processAllAvailable()
      val n2 = spark.sql("SELECT count(*) FROM espi_mem").head.getLong(0)
      assert(n2 == 2 * n1, s"expected ${2 * n1}, got $n2")
      // no new files → no new rows
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM espi_mem").head.getLong(0) == n2)
    } finally q.stop()
  }

  test("streaming: restart from checkpoint does not reprocess committed files") {
    val dir = java.nio.file.Files.createTempDirectory("espi_restart").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("espi_restart_ck").toFile
    val feed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/test_files/EGD_Gas_EnergyUsage_20221225_20241225.xml")),
      java.nio.charset.StandardCharsets.UTF_8)
    val out = java.nio.file.Files.createTempDirectory("espi_restart_out").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a.xml").toPath, feed)
    // file sink: supports checkpoint recovery (the memory sink doesn't)
    def startQuery() = spark.readStream.format("espi")
      .load(dir.getAbsolutePath + "/*.xml")
      .select("file", "idx")
      .writeStream.format("parquet")
      .option("path", out.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val n1 = spark.read.parquet(out.getAbsolutePath).count()
    assert(n1 > 0)
    // new query, same checkpoint: a.xml is committed; only b.xml is new
    java.nio.file.Files.writeString(new java.io.File(dir, "b.xml").toPath, feed)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out.getAbsolutePath)
      assert(rows.count() == 2 * n1,
        s"expected ${2 * n1} total rows, got ${rows.count()}")
      val perFile = rows.groupBy("file").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perFile.size == 2 && perFile.values.forall(_ == n1),
        s"per-file counts off (a.xml reprocessed?): $perFile")
    } finally q2.stop()
  }

  test("streaming offset is log-compacted: O(grace-window), not O(files-seen)") {
    // pin the (session-configurable) grace window so the mod-time spacing
    // below puts exactly one file inside it
    spark.conf.set("spark.graft.espi.graceMs", "5000")
    val dir = java.nio.file.Files.createTempDirectory("espi_compact").toFile
    val nFiles = 30
    val base = System.currentTimeMillis() - 1000L * 3600
    (0 until nFiles).foreach { i =>
      val f = new java.io.File(dir, f"f$i%03d.xml")
      java.nio.file.Files.writeString(f.toPath, "<feed/>")
      // spread mod times 60s apart — far beyond the 5s grace window
      assert(f.setLastModified(base + i * 60000L))
    }
    val scan = new EspiScan(Seq(dir.getAbsolutePath + "/*.xml"),
      EspiDataSource.schema, failfast = false)
    val stream = new EspiMicroBatchStream(scan)
    val latest = stream.latestOffset().asInstanceOf[EspiOffset]
    // only files within graceMs of the newest mod time ride the offset
    assert(latest.recent.size == 1,
      s"offset not compacted: ${latest.recent.size} of $nFiles files retained")
    assert(latest.watermark == base + (nFiles - 1) * 60000L)
    // ...yet the first batch still covers every file
    val batch = stream.planInputPartitions(stream.initialOffset(), latest)
    assert(batch.length == nFiles)
    // and a no-change step is empty (no reprocessing)
    assert(stream.planInputPartitions(latest, latest).isEmpty)
    // ties inside the grace window stay in `recent` and are deduped by name
    val lateTwin = new java.io.File(dir, "f999.xml")
    java.nio.file.Files.writeString(lateTwin.toPath, "<feed/>")
    assert(lateTwin.setLastModified(latest.watermark)) // same mtime as max
    val latest2 = stream.latestOffset().asInstanceOf[EspiOffset]
    assert(latest2.recent.toSet ==
      Set(latest.recent.head, lateTwin.getAbsolutePath.replaceFirst("^", "file:")))
    val batch2 = stream.planInputPartitions(latest, latest2)
    assert(batch2.length == 1, s"grace-window twin missed or duplicated: " +
      batch2.map(_.asInstanceOf[EspiFilePartition].path).mkString(","))
  }

  test("admission control: maxFilesPerTrigger bounds each micro-batch and " +
      "every file still ingests exactly once across batches") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    spark.sparkContext // force the shared session (listing reads its conf)
    val dir = java.nio.file.Files.createTempDirectory("espi_admit").toFile
    val base = System.currentTimeMillis() - 1000L * 600
    (0 until 5).foreach { i =>
      val f = new java.io.File(dir, f"f$i.xml")
      java.nio.file.Files.writeString(f.toPath, "<feed/>")
      assert(f.setLastModified(base + i * 60000L)) // distinct mod times
    }
    // option wiring: the DataFrameReader option string reaches the scan
    val viaBuilder = new EspiScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir.getAbsolutePath + "/*.xml",
          "maxFilesPerTrigger", "2"))).build().asInstanceOf[EspiScan]
    assert(viaBuilder.maxFilesPerTrigger == Some(2))
    val scan = new EspiScan(Seq(dir.getAbsolutePath + "/*.xml"),
      EspiDataSource.schema, failfast = false,
      maxFilesPerTrigger = Some(2))
    val stream = new EspiMicroBatchStream(scan)
    assert(stream.getDefaultReadLimit.toString.contains("2"))
    // drive the admission loop the way MicroBatchExecution does
    var start = stream.initialOffset().asInstanceOf[EspiOffset]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var done = false
    while (!done) {
      val end = stream.latestOffset(start, ReadLimit.maxFiles(2))
        .asInstanceOf[EspiOffset]
      if (end == start) done = true
      else {
        batches += stream.planInputPartitions(start, end)
          .map(_.asInstanceOf[EspiFilePartition].path).toSeq.sorted
        start = end
      }
    }
    assert(batches.map(_.size) == Seq(2, 2, 1),
      s"batch sizes ${batches.map(_.size)}")
    // exactly once, all files, in (modTime, path) order
    val all = batches.flatten
    assert(all.distinct.size == 5 && all.size == 5)
    assert(all == all.sorted) // f0..f4 mtime order == name order here
    // no further batch once drained
    assert(stream.latestOffset(start, ReadLimit.maxFiles(2)) == start)
  }

  test("a late-within-grace arrival is ingested through " +
      "latestOffset(start, limit) — the end offset dominates start") {
    // mv/rsync -a deliveries carry their ORIGINAL mtime, so a file can
    // enter the watch dir with a mod time BELOW the committed watermark.
    // latestOffset(start, limit) is the engine's only planning path (the
    // source implements SupportsAdmissionControl), and a bare frontier
    // compaction here yields end.watermark < start.watermark → the
    // monotonicity guard holds start → the identical empty batch recurs
    // every trigger and the late file is withheld forever.
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = java.nio.file.Files.createTempDirectory("espi_late").toFile
    val t = (System.currentTimeMillis() / 1000L) * 1000L - 600000L
    val a = new java.io.File(dir, "a.xml")
    java.nio.file.Files.writeString(a.toPath, "<feed/>")
    assert(a.setLastModified(t))
    val scan = new EspiScan(Seq(dir.getAbsolutePath + "/*.xml"),
      EspiDataSource.schema, failfast = false, graceMs = 5000L)
    val stream = new EspiMicroBatchStream(scan)
    val init = stream.initialOffset().asInstanceOf[EspiOffset]
    val o1 = stream.latestOffset(init, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(stream.planInputPartitions(init, o1).length == 1)
    // late delivery: mtime 2s OLDER than the watermark, inside the 5s grace
    val late = new java.io.File(dir, "late.xml")
    java.nio.file.Files.writeString(late.toPath, "<feed/>")
    assert(late.setLastModified(t - 2000L))
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(o2.watermark == o1.watermark, "end watermark regressed below start")
    val batch = stream.planInputPartitions(o1, o2)
      .map(_.asInstanceOf[EspiFilePartition].path)
    assert(batch.toSeq == Seq("file:" + late.getAbsolutePath),
      s"late-within-grace file withheld: planned=$batch off=${o2.json()}")
    // the state must not recur: the next trigger is a clean no-op
    val o3 = stream.latestOffset(o2, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(o3 == o2 && stream.planInputPartitions(o2, o3).isEmpty)
  }

  test("an equal-mtime arrival keeps already-ingested same-mtime files in " +
      "the end offset (no silent drop → re-ingestion)") {
    // a.xml and c.xml ingested at mtime t; b.xml arrives later with the
    // SAME mtime (coarse-granularity or rsync-preserved timestamps),
    // sorting between them. A bare compaction of the admitted frontier
    // {..., b} drops c from `recent`; c then re-enters as new on the next
    // trigger — an exactly-once violation.
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = java.nio.file.Files.createTempDirectory("espi_eqmt").toFile
    val t = (System.currentTimeMillis() / 1000L) * 1000L - 600000L
    def mk(name: String): java.io.File = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.writeString(f.toPath, "<feed/>")
      assert(f.setLastModified(t))
      f
    }
    mk("a.xml"); val c = mk("c.xml")
    val scan = new EspiScan(Seq(dir.getAbsolutePath + "/*.xml"),
      EspiDataSource.schema, failfast = false, graceMs = 5000L)
    val stream = new EspiMicroBatchStream(scan)
    val init = stream.initialOffset().asInstanceOf[EspiOffset]
    val o1 = stream.latestOffset(init, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(stream.planInputPartitions(init, o1).length == 2)
    val b = mk("b.xml") // same mtime, sorts between a and c
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(o2.recent.contains("file:" + c.getAbsolutePath),
      s"same-mtime file dropped from the end offset: ${o2.json()}")
    val batch = stream.planInputPartitions(o1, o2)
      .map(_.asInstanceOf[EspiFilePartition].path)
    assert(batch.toSeq == Seq("file:" + b.getAbsolutePath))
    // next trigger: nothing re-enters
    val o3 = stream.latestOffset(o2, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(o3 == o2 && stream.planInputPartitions(o2, o3).isEmpty,
      s"re-ingestion after same-mtime arrival: ${o3.json()}")
  }

  test("a file deleted after ingest AGES OUT of the offset — bounded " +
      "state under delete-after-ingest retention, not unbounded growth") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = java.nio.file.Files.createTempDirectory("espi_delete").toFile
    val t = (System.currentTimeMillis() / 1000L) * 1000L - 600000L
    val a = new java.io.File(dir, "a.xml")
    java.nio.file.Files.writeString(a.toPath, "<feed/>")
    assert(a.setLastModified(t))
    val scan = new EspiScan(Seq(dir.getAbsolutePath + "/*.xml"),
      EspiDataSource.schema, failfast = false, graceMs = 5000L)
    val stream = new EspiMicroBatchStream(scan)
    val init = stream.initialOffset().asInstanceOf[EspiOffset]
    val o1 = stream.latestOffset(init, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(stream.planInputPartitions(init, o1).length == 1)
    assert(o1.mts == Seq(t), s"offset lost the member mtime: ${o1.json()}")
    // retention pipeline: the ingested file is deleted, and a new file
    // arrives WELL past the grace window — the dead path must age out of
    // the offset instead of riding every future checkpoint
    assert(a.delete())
    val b = new java.io.File(dir, "b.xml")
    java.nio.file.Files.writeString(b.toPath, "<feed/>")
    assert(b.setLastModified(t + 60000L))
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
      .asInstanceOf[EspiOffset]
    assert(stream.planInputPartitions(o1, o2)
      .map(_.asInstanceOf[EspiFilePartition].path).toSeq ==
      Seq("file:" + b.getAbsolutePath))
    assert(o2.recent == Seq("file:" + b.getAbsolutePath),
      s"deleted path retained past the grace horizon: ${o2.json()}")
    // the enriched offset (with mtimes) round-trips through the log format
    assert(EspiOffset.fromJson(o2.json()) == o2)
  }

  test("a transient empty listing does not regress the offset (a regressed " +
      "end would erase dedup state and mass re-ingest on the next trigger)") {
    val dir = java.nio.file.Files.createTempDirectory("espi_regress").toFile
    val f = new java.io.File(dir, "a.xml")
    java.nio.file.Files.writeString(f.toPath, "<feed/>")
    val scan = new EspiScan(Seq(dir.getAbsolutePath + "/*.xml"),
      EspiDataSource.schema, failfast = false)
    val stream = new EspiMicroBatchStream(scan)
    val o1 = stream.latestOffset().asInstanceOf[EspiOffset]
    assert(o1.recent.nonEmpty)
    // listing hiccup: the file vanishes for one trigger
    assert(f.delete())
    val o2 = stream.latestOffset().asInstanceOf[EspiOffset]
    assert(o2 == o1, s"offset regressed to $o2 on an empty listing")
    // and the held offset plans an empty batch, not a re-ingest
    assert(stream.planInputPartitions(o1, o2).isEmpty)
  }

  test("a file whose mod time advances after ingest is NOT re-ingested " +
      "(membership beats the watermark)") {
    // the non-atomic-write race: a file is listed at creation (mt=t), the
    // batch ingests it, then its mtime bumps on content flush/close
    // (t' > t). The next trigger's listing must not plan it again.
    val t = 1723500000000L
    val off = EspiOffset(t, Seq("file:/d/b.xml"))
    val rs = off.recent.toSet
    assert(!EspiOffset.isNew(off, rs, "file:/d/b.xml", modTime = t + 3000L))
    assert(!EspiOffset.isNew(off, rs, "file:/d/b.xml", modTime = t + 60000L))
    // while a genuinely new path past the watermark IS picked up,
    assert(EspiOffset.isNew(off, rs, "file:/d/c.xml", modTime = t + 1L))
    // a new path inside the grace window IS picked up,
    assert(EspiOffset.isNew(off, rs, "file:/d/g.xml", modTime = t - 4000L))
    // and a late file beyond the grace window stays dropped (bounded
    // lateness — the maxFileAge trade)
    assert(!EspiOffset.isNew(off, rs, "file:/d/late.xml",
      modTime = t - EspiOffset.graceMs - 1L))
  }

  test("offset json round-trips (incl. hostile names) and legacy array " +
      "offsets deserialize with membership semantics") {
    val off = EspiOffset(1723500000123L,
      Seq("/plain.xml", "/quote\"back\\slash.xml", "/new\nline\t.xml"))
    val back = EspiOffset.fromJson(off.json())
    assert(back == off, s"round-trip changed offset: ${off.json()}")
    // a filename that embeds the key tokens must not confuse the parser
    val tricky = EspiOffset(7L, Seq("""/evil","r":[".xml"""))
    assert(EspiOffset.fromJson(tricky.json()) == tricky)
    // ...including the mtime key, with mtimes present
    val trickyM = EspiOffset(9L, Seq("""/evil","m":[9],".xml"""), Seq(5L))
    assert(EspiOffset.fromJson(trickyM.json()) == trickyM)
    // pre-mtime compacted offsets ({"w","r"} — no "m") deserialize with
    // unknown mtimes (empty), not a parse failure
    val preM = EspiOffset.fromJson("""{"w":123,"r":["/a.xml"]}""")
    assert(preM == EspiOffset(123L, Seq("/a.xml")))

    // pre-compaction checkpoints stored a bare JSON array of all files
    val legacy = EspiOffset.fromJson("""["/a.xml","/b.xml"]""")
    assert(legacy.watermark == Long.MinValue)
    val rs = legacy.recent.toSet
    assert(!EspiOffset.isNew(legacy, rs, "/a.xml", modTime = 1L))
    assert(EspiOffset.isNew(legacy, rs, "/c.xml", modTime = 1L))
    assert(EspiOffset.seenBy(legacy, rs, "/b.xml", modTime = 1L))
  }

  test("SQL over the source") {
    df.createOrReplaceTempView("espi_entries")
    val n = spark.sql(
      """SELECT count(*) FROM espi_entries
        |LATERAL VIEW explode(readings) AS r
        |WHERE r.value > 0""".stripMargin).head.getLong(0)
    assert(n > 0)
  }
}
