package graft.gb

import graft.SparkTestBase

/** Edge-case parity with the reference parser (FIXTURES.md §1.5): provider
  * bugs tolerated, spec violations rejected, file-scoped failure handling.
  */
class EspiXmlSpec extends SparkTestBase {

  private def feed(entries: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<feed xmlns="http://www.w3.org/2005/Atom"
       |      xmlns:espi="http://naesb.org/espi">$entries</feed>""".stripMargin

  private def ltpEntry(tz: Long = -18000, dst: Long = 3600,
                       href: String = "/espi/LocalTimeParameters/1"): String =
    s"""<entry>
       |  <title>ltp</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="$href"/>
       |  <content><espi:LocalTimeParameters>
       |    <espi:dstStartRule>FFFFFFFF</espi:dstStartRule>
       |    <espi:dstEndRule>FFFFFFFF</espi:dstEndRule>
       |    <espi:dstOffset>$dst</espi:dstOffset>
       |    <espi:tzOffset>$tz</espi:tzOffset>
       |  </espi:LocalTimeParameters></content>
       |</entry>""".stripMargin

  private def rtEntry(upHref: String = "/espi/UsagePoint/1"): String =
    s"""<entry>
       |  <title>rt</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="$upHref/MeterReading/7/ReadingType/9"/>
       |  <content><espi:ReadingType>
       |    <espi:accumulationBehaviour>4</espi:accumulationBehaviour>
       |    <espi:commodity>7</espi:commodity>
       |    <espi:currency>124</espi:currency>
       |    <espi:dataQualifier>12</espi:dataQualifier>
       |    <espi:flowDirection>1</espi:flowDirection>
       |    <espi:kind>58</espi:kind>
       |    <espi:powerOfTenMultiplier>-3</espi:powerOfTenMultiplier>
       |    <espi:uom>42</espi:uom>
       |  </espi:ReadingType></content>
       |</entry>""".stripMargin

  private def mrEntry(upHref: String = "/espi/UsagePoint/1"): String =
    s"""<entry>
       |  <title>mr</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="$upHref/MeterReading/7"/>
       |  <link rel="related" type="espi-entry/ReadingType"
       |        href="$upHref/MeterReading/7/ReadingType/9"/>
       |  <content><espi:MeterReading/></content>
       |</entry>""".stripMargin

  private def ibEntry(readings: String, upHref: String = "/espi/UsagePoint/1",
                      blocks: Int = 1): String = {
    val block = s"<espi:IntervalBlock>$readings</espi:IntervalBlock>" * blocks
    s"""<entry>
       |  <title>Meter data</title>
       |  <published>2024-01-01T00:00:00Z</published>
       |  <updated>2024-01-01T00:00:00Z</updated>
       |  <link rel="self" href="$upHref/MeterReading/7/IntervalBlock/1"/>
       |  <content>$block</content>
       |</entry>""".stripMargin
  }

  private def reading(value: Long, cost: String = "", start: Long = 1670025600L): String =
    s"""<espi:IntervalReading>
       |  $cost
       |  <espi:timePeriod>
       |    <espi:duration>3600</espi:duration>
       |    <espi:start>$start</espi:start>
       |  </espi:timePeriod>
       |  <espi:value>$value</espi:value>
       |</espi:IntervalReading>""".stripMargin

  private def fullFeed(extra: String = "", ibBlocks: Int = 1,
                       readings: String = reading(58000),
                       upHref: String = "/espi/UsagePoint/1"): String =
    feed(ltpEntry() + rtEntry(upHref) + mrEntry(upHref) +
      ibEntry(readings, upHref, ibBlocks) + extra)

  private def run(xml: String, mode: ParseMode = FailFast) =
    GreenButton.timeseriesFromStrings(spark, Seq(("test.xml", xml)), mode)

  test("minimal feed denormalizes end-to-end") {
    val rows = run(fullFeed()).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("title") == "Meter data")
    // 58000 * 10^-3 computed in f32 — 58.000004, the reference's own
    // rounding (visible in its golden output too)
    assert(r.getAs[Float]("value") == 58000f * 0.001f)
    assert(r.getAs[String]("uom") == "m3")             // code 42
    assert(r.getAs[String]("quality") == "other")      // default 16
    assert(r.getAs[Float]("cost").isNaN)               // missing cost → NaN
    assert(r.getAs[Long]("time_period_start_unix") == 1670025600L - 18000L)
  }

  test("empty cost tag parses as 0 (Hydro One bug)") {
    val r = run(fullFeed(readings =
      reading(100, cost = "<espi:cost/>"))).collect().head
    assert(r.getAs[Float]("cost") == 0f)
  }

  test("cost is converted to dollars (1/100000ths)") {
    val r = run(fullFeed(readings =
      reading(100, cost = "<espi:cost>250000</espi:cost>"))).collect().head
    assert(r.getAs[Float]("cost") == 2.5f)
  }

  test("multiple IntervalBlocks in one content are tolerated") {
    assert(run(fullFeed(ibBlocks = 3)).count() == 3)
  }

  test("mixed content types are a file error") {
    val bad = fullFeed(extra =
      """<entry><title>x</title>
        |<published>2024-01-01T00:00:00Z</published>
        |<updated>2024-01-01T00:00:00Z</updated>
        |<link rel="self" href="/x"/>
        |<content><espi:IntervalBlock/><espi:ReadingType/></content>
        |</entry>""".stripMargin)
    val errs = GreenButton.staging(
      GreenButton.parseStrings(spark, Seq(("bad.xml", bad)))).errors.collect()
    assert(errs.length == 1 && errs.head.getString(1).contains("mixed content"))
  }

  test("unknown espi tag inside IntervalReading is a file error") {
    val bad = fullFeed(readings = reading(1).replace("<espi:value>",
      "<espi:bogusTag>1</espi:bogusTag><espi:value>"))
    val errs = GreenButton.staging(
      GreenButton.parseStrings(spark, Seq(("bad.xml", bad)))).errors.collect()
    assert(errs.length == 1 && errs.head.getString(1).contains("Unmatched tag"))
  }

  test("missing LocalTimeParameters fails the file in failfast") {
    val noLtp = feed(rtEntry() + mrEntry() + ibEntry(reading(1)))
    val e = intercept[Exception] { run(noLtp).collect() }
    assert(e.getMessage != null)
  }

  test("permissive mode skips bad files, keeps good ones") {
    val good = fullFeed()
    val ts = GreenButton.denormalize(spark, GreenButton.staging(
      GreenButton.parseStrings(spark,
        Seq(("good.xml", good), ("bad.xml", "<not-xml")))), Permissive)
    assert(ts.count() == 1)
  }

  test("permissive skips the WHOLE file on a denormalize violation") {
    // brokenLink.xml: readings reference a MeterReading entry that doesn't
    // exist → in the reference the whole file errors; permissive must drop
    // every row of that file while keeping the good file intact
    val broken = feed(ltpEntry() + rtEntry() + /* no mrEntry! */
      ibEntry(reading(1) + reading(2)))
    val st = GreenButton.staging(GreenButton.parseStrings(spark,
      Seq(("good.xml", fullFeed()), ("broken.xml", broken))))
    val ts = GreenButton.denormalize(spark, st, Permissive)
    assert(ts.count() == 1) // only good.xml's single reading
    val skipped = GreenButton.skippedFiles(spark, st).collect()
    assert(skipped.exists(r => r.getString(0) == "broken.xml"))
    // and failfast raises on the same input
    intercept[Exception] {
      GreenButton.denormalize(spark, st, FailFast).collect()
    }
  }

  test("enova href triggers cost x100 patch (keyed off FIRST entry href)") {
    // the patch looks only at entries.href[0] (timeseries.rs:187 caller);
    // here the first entry is the LTP entry, so give it the enova href
    val x = feed(
      ltpEntry(href = "https://enova.example/espi/LocalTimeParameters/1") +
        rtEntry() + mrEntry() +
        ibEntry(reading(100, cost = "<espi:cost>100000</espi:cost>")))
    val r = run(x).collect().head
    assert(r.getAs[Float]("cost") == 100.0f) // 1 dollar * 100

    // and with a non-enova first entry, no patch
    val r2 = run(fullFeed(readings =
      reading(100, cost = "<espi:cost>100000</espi:cost>"))).collect().head
    assert(r2.getAs[Float]("cost") == 1.0f)
  }

  test("published/updated use the naive-local quirk (offset discarded)") {
    val x = fullFeed().replace("2024-01-01T00:00:00Z", "2024-01-01T10:30:00-05:00")
    val st = GreenButton.staging(GreenButton.parseStrings(spark, Seq(("q.xml", x))))
    val pub = st.entries.select("publishedUnix").head.getLong(0)
    // 10:30 clock time treated as UTC, not 15:30
    assert(pub == java.time.LocalDateTime.of(2024, 1, 1, 10, 30)
      .toEpochSecond(java.time.ZoneOffset.UTC))
  }

  test("DST offset applies within rule bounds") {
    // second Sunday of March / first Sunday of November @02:00 (rules from
    // GBA docs); reading in July → DST applies
    val x = fullFeed(readings = reading(1000, start = 1689152400L)) // 2023-07-12
      .replace("FFFFFFFF</espi:dstStartRule>", "360E2000</espi:dstStartRule>")
      .replace("FFFFFFFF</espi:dstEndRule>", "B40E2000</espi:dstEndRule>")
    val r = run(x).collect().head
    assert(r.getAs[Long]("time_period_start_unix") == 1689152400L + 3600L - 18000L)
  }

  test("failfast errors a file with ZERO readings overall via the " +
      "error-carrier row (even under count)") {
    // no fact rows exist to carry a guard; the raising generator row stands
    // in — the reference errors during link resolution before readings flow
    val broken = fullFeed(readings = "",
      extra = ibEntry("", upHref = "/espi/UsagePoint/9"))
    val st = GreenButton.staging(GreenButton.parseStrings(spark,
      Seq(("empty.xml", broken))))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      GreenButton.denormalize(spark, st, FailFast).collect()
    }
    assert(msgs(e).exists(_.contains("Missing meter reading entry")),
      s"wrong failure: ${msgs(e)}")
    // count() prunes projection columns but must evaluate the generator
    intercept[Exception] {
      GreenButton.denormalize(spark, st, FailFast).count()
    }
  }

  test("failfast reports the link error (not 'Missing reading type') when " +
      "the dangling-link entry carries readings") {
    // the bad entry's own fact rows have rt_idx NULL too — the file-level
    // link guard must win, matching the reference's link-resolution-first
    // error order
    val broken = fullFeed(
      extra = ibEntry(reading(77), upHref = "/espi/UsagePoint/9"))
    val st = GreenButton.staging(GreenButton.parseStrings(spark,
      Seq(("broken2.xml", broken))))
    val e = intercept[Exception] {
      GreenButton.denormalize(spark, st, FailFast).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("Missing meter reading entry")),
      s"wrong failure: ${msgs(e)}")
  }

  test("failfast raises on a broken-link entry with no readings when the " +
      "file has any readings") {
    // A dangling-link IntervalBlock entry with ZERO readings alongside a
    // valid readings entry: the reference errors the file (the entry map is
    // built for all entries before readings flow). Link errors are
    // aggregated per file and woven into every fact row, so the guard fires
    // regardless of which entry carries the readings — not dependent on the
    // optimizer evaluating a pruned per-entry column.
    val broken = fullFeed(extra = ibEntry("", upHref = "/espi/UsagePoint/9"))
    val st = GreenButton.staging(GreenButton.parseStrings(spark,
      Seq(("broken.xml", broken))))
    val e = intercept[Exception] {
      GreenButton.denormalize(spark, st, FailFast).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("Missing meter reading entry")),
      s"wrong failure: ${msgs(e)}")
  }
}
