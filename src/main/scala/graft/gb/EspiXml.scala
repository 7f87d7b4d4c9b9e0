package graft.gb

import scala.collection.mutable.ArrayBuffer
import scala.xml.{Elem, Node, XML}

/** Staging-table row types (SURVEY.md §1.2). One ParsedFeed per XML file;
  * the four staging tables are derived from it by explode (operator S4 —
  * relational shredding of the entry union).
  */
object Schemas {
  /** Atom entry envelope (reference entry.rs:16-31). entryType is the
    * flattened tagged union: "IntervalBlock" | "ReadingType" |
    * "LocalTimeParameters" | "Other"; rtIndex carries the
    * ReadingTypeWithIndex payload (-1 when n/a).
    */
  case class EntryRaw(
      idx: Int,
      entryType: String,
      rtIndex: Int,
      href: String,
      title: String,
      publishedUnix: Long,
      updatedUnix: Long,
      relatedMeterReadingHref: String,
      relatedReadingTypeHref: String)

  /** interval_reading.rs:11-25. cost NaN = missing; quality 16 = "other". */
  case class IntervalReadingRaw(
      entryIdx: Int,
      cost: Float,
      quality: Int,
      value: Long,
      tou: Int,
      startUnix: Long,
      durationSec: Int)

  /** reading_type.rs:7-22. phase defaults to 0 = "none". */
  case class ReadingTypeRaw(
      rtIndex: Int,
      entryIdx: Int,
      accumulationBehaviour: Int,
      commodity: Int,
      currency: Int,
      dataQualifier: Int,
      flowDirection: Int,
      kind: Int,
      powerOfTenMultiplier: Int,
      phase: Int,
      uom: Int)

  /** local_time_parameters.rs:15-22; rules are u32 parsed from hex. */
  case class LocalTimeParamsRaw(
      dstStartRule: Long,
      dstEndRule: Long,
      dstOffset: Long,
      tzOffset: Long)

  /** One parsed file. error != null ⇒ the file failed to parse and the
    * other fields are empty (multi-file scan skips it in permissive mode —
    * reference cli-frontend/src/main.rs:34-37). */
  case class ParsedFeed(
      file: String,
      error: String,
      entries: Seq[EntryRaw],
      readings: Seq[IntervalReadingRaw],
      readingTypes: Seq[ReadingTypeRaw],
      localTimeParams: Seq[LocalTimeParamsRaw])
}

/** ESPI Atom-XML shredder (operators S1, S4-S8). Pure Scala, runs inside a
  * `flatMap` over whole files — one task per file, no driver involvement.
  *
  * Behavior contract is the reference parser
  * (lib/personalgreenbutton/src/{lib,entry,content,interval_reading,
  * reading_type,local_time_parameters,time_period,parse_helpers}.rs):
  *   - per-entry Atom envelope: title, published/updated (RFC-3339 parsed
  *     with the zone offset *discarded* — naive local treated as UTC,
  *     entry.rs:96-111), self link href, related ReadingType link href, and
  *     the MeterReading parent href extracted from the self href by regex;
  *   - content dispatch by single espi element; mixed entity types error;
  *     multiple IntervalBlocks tolerated (Hydro One bug, content.rs:27-39);
  *     unknown tags error;
  *   - text-or-default: concatenated trimmed descendant text, empty →
  *     type default (Hydro One empty-cost bug, parse_helpers.rs:27-40);
  *   - defaults: cost NaN, quality 16, tou 0, phase 0; all other fields
  *     required (missing → file error).
  */
object EspiXml {
  import Schemas._

  private val MeterReadingRe = "(.*MeterReading/[^/]*)/".r.unanchored

  /** Exception type for file-scoped parse failures. */
  final class EspiParseException(msg: String) extends RuntimeException(msg)

  private def fail(msg: String): Nothing = throw new EspiParseException(msg)

  /** parse_helpers.rs:14-25 — all descendant text nodes, each trimmed,
    * concatenated. */
  private def allText(n: Node): String =
    n.descendant.collect { case a: scala.xml.Atom[_] => a.text.trim }.mkString

  /** parse_helpers.rs:27-40 — empty text → default. */
  private def textOrDefault[T](n: Node, parse: String => T, default: T): T = {
    val t = allText(n)
    if (t.isEmpty) default
    else
      try parse(t)
      catch { case e: Exception => fail(s"Bad value '$t': ${e.getMessage}") }
  }

  /** RFC-3339 → unix seconds with the reference's naive-local quirk: the
    * clock time as written is interpreted as UTC, discarding the offset. */
  private def rfc3339NaiveUnix(text: String): Long =
    try java.time.OffsetDateTime.parse(text).toLocalDateTime
      .toEpochSecond(java.time.ZoneOffset.UTC)
    catch { case e: Exception => fail(s"Bad timestamp '$text': ${e.getMessage}") }

  private def elems(n: Node): Seq[Elem] = n.child.collect { case e: Elem => e }

  /** Parse one feed document. Never throws — failures land in
    * ParsedFeed.error (the multi-file scan decides skip-vs-fail). */
  def parseFeed(file: String, xml: String): ParsedFeed =
    try parseFeedOrThrow(file, xml)
    catch {
      case e: Exception =>
        ParsedFeed(file, s"${e.getClass.getSimpleName}: ${e.getMessage}",
          Nil, Nil, Nil, Nil)
    }

  def parseFeedOrThrow(file: String, xml: String): ParsedFeed = {
    val root = XML.loadString(xml)
    if (root.label != "feed") fail("Missing feed")

    val entries = ArrayBuffer.empty[EntryRaw]
    val readings = ArrayBuffer.empty[IntervalReadingRaw]
    val readingTypes = ArrayBuffer.empty[ReadingTypeRaw]
    val ltps = ArrayBuffer.empty[LocalTimeParamsRaw]

    for (entryNode <- elems(root) if entryNode.label == "entry") {
      val idx = entries.length
      var title: Option[String] = None
      var published: Option[Long] = None
      var updated: Option[Long] = None
      var href: Option[String] = None
      var relatedMr = ""
      var relatedRt = ""
      var contentNode: Option[Elem] = None

      for (child <- elems(entryNode)) child.label match {
        case "title" =>
          val t = child.text
          if (t.isEmpty) fail("Empty title.")
          title = Some(t)
        case "published" => published = Some(rfc3339NaiveUnix(allText(child)))
        case "updated" => updated = Some(rfc3339NaiveUnix(allText(child)))
        case "content" => contentNode = Some(child)
        case "link" =>
          val h = child \@ "href"
          if (h.nonEmpty) {
            if ((child \@ "rel") == "related" &&
                (child \@ "type") == "espi-entry/ReadingType") relatedRt = h
            if ((child \@ "rel") == "self") {
              href = Some(h)
              h match {
                case MeterReadingRe(mr) => relatedMr = mr
                case _ =>
              }
            }
          }
        case _ =>
      }

      val content = contentNode.getOrElse(fail("Missing content node"))

      // content dispatch (content.rs:14-74): classify, tolerate repeated
      // IntervalBlocks, reject mixed entity types and unknown tags.
      var entryType = ""
      def setType(t: String): Unit =
        if (entryType.isEmpty || entryType == t) entryType = t
        else fail("Entry has mixed content types.")
      val intervalBlocks = ArrayBuffer.empty[Elem]
      var rtNode: Option[Elem] = None
      var ltpNode: Option[Elem] = None

      for (c <- elems(content)) c.label match {
        case "IntervalBlock" => setType("IntervalBlock"); intervalBlocks += c
        case "ReadingType" => setType("ReadingType"); rtNode = Some(c)
        case "LocalTimeParameters" =>
          setType("LocalTimeParameters"); ltpNode = Some(c)
        case "MeterReading" | "UsagePoint" | "UsageSummary" |
            "ElectricPowerQualitySummary" => setType("Other")
        case other => fail(s"Unknown tag name $other")
      }

      val rtIndex = if (entryType == "ReadingType") readingTypes.length else -1

      for (ib <- intervalBlocks; c <- elems(ib) if c.label == "IntervalReading")
        readings += parseIntervalReading(c, idx)
      rtNode.foreach(n => readingTypes += parseReadingType(n, idx, rtIndex))
      ltpNode.foreach(n => ltps += parseLocalTimeParams(n))

      entries += EntryRaw(
        idx = idx,
        entryType = if (entryType.isEmpty) "Unset" else entryType,
        rtIndex = rtIndex,
        href = href.getOrElse(fail("Missing field href")),
        title = title.getOrElse(fail("Missing field title")),
        publishedUnix = published.getOrElse(fail("Missing field published")),
        updatedUnix = updated.getOrElse(fail("Missing field updated")),
        relatedMeterReadingHref = relatedMr,
        relatedReadingTypeHref = relatedRt)
    }

    ParsedFeed(file, null, entries.toSeq, readings.toSeq,
      readingTypes.toSeq, ltps.toSeq)
  }

  private def parseIntervalReading(n: Elem, entryIdx: Int): IntervalReadingRaw = {
    var cost = Float.NaN // NaN = missing (interval_reading.rs:16-17)
    var quality = 16 // "other"
    var value: Option[Long] = None
    var tou = 0
    var start: Option[Long] = None
    var duration: Option[Int] = None
    for (c <- elems(n)) c.label match {
      // ESPI stores cost in 1/100000ths of the currency unit
      case "cost" => cost = textOrDefault(c, _.toFloat, 0f) / 100000.0f
      case "ReadingQuality" => quality = textOrDefault(c, _.toInt, 0)
      case "value" => value = Some(textOrDefault(c, _.toLong, 0L))
      case "tou" => tou = textOrDefault(c, _.toInt, 0)
      case "timePeriod" =>
        for (t <- elems(c)) t.label match {
          case "start" => start = Some(textOrDefault(t, _.toLong, 0L))
          case "duration" => duration = Some(textOrDefault(t, _.toInt, 0))
          case _ =>
        }
        if (start.isEmpty) fail("Missing start time.")
        if (duration.isEmpty) fail("Missing duration")
      case other => fail(s"Unmatched tag name: $other")
    }
    IntervalReadingRaw(entryIdx, cost, quality,
      value.getOrElse(fail("Missing field value")), tou,
      start.getOrElse(fail("Missing field time_period_start_unix")),
      duration.getOrElse(fail("Missing field time_period_duration_seconds")))
  }

  private def parseReadingType(n: Elem, entryIdx: Int, rtIndex: Int): ReadingTypeRaw = {
    val f = scala.collection.mutable.Map.empty[String, Int]
    for (c <- elems(n))
      c.label match {
        case k @ ("accumulationBehaviour" | "commodity" | "currency" |
            "dataQualifier" | "flowDirection" | "kind" |
            "powerOfTenMultiplier" | "phase" | "uom") =>
          f(k) = textOrDefault(c, _.toInt, 0)
        case _ => // other ReadingType fields (intervalLength, …) are ignored
      }
    def req(k: String): Int = f.getOrElse(k, fail(s"Missing field $k"))
    ReadingTypeRaw(rtIndex, entryIdx,
      accumulationBehaviour = req("accumulationBehaviour"),
      commodity = req("commodity"),
      currency = req("currency"),
      dataQualifier = req("dataQualifier"),
      flowDirection = req("flowDirection"),
      kind = req("kind"),
      powerOfTenMultiplier = req("powerOfTenMultiplier"),
      phase = f.getOrElse("phase", 0),
      uom = req("uom"))
  }

  private def parseLocalTimeParams(n: Elem): LocalTimeParamsRaw = {
    var startRule: Option[Long] = None
    var endRule: Option[Long] = None
    var dstOffset: Option[Long] = None
    var tzOffset: Option[Long] = None
    for (c <- elems(n)) c.label match {
      // DST rules are hex-encoded u32 (local_time_parameters.rs:152-159)
      case "dstStartRule" =>
        startRule = Some(textOrDefault(c, java.lang.Long.parseLong(_, 16), 0L))
      case "dstEndRule" =>
        endRule = Some(textOrDefault(c, java.lang.Long.parseLong(_, 16), 0L))
      case "dstOffset" => dstOffset = Some(textOrDefault(c, _.toLong, 0L))
      case "tzOffset" => tzOffset = Some(textOrDefault(c, _.toLong, 0L))
      case other => fail(s"Unmatched tag name: $other")
    }
    LocalTimeParamsRaw(
      startRule.getOrElse(fail("Missing field dst_start_rule")),
      endRule.getOrElse(fail("Missing field dst_end_rule")),
      dstOffset.getOrElse(fail("Missing field dst_offset")),
      tzOffset.getOrElse(fail("Missing field tz_offset")))
  }
}
