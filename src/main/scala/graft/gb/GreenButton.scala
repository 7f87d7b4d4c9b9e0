package graft.gb

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Schemas._

/** Parse mode for the multi-file scan (S2): Permissive skips files that fail
  * to parse or denormalize (reference CLI skip-with-warning,
  * cli-frontend/src/main.rs:34-37); FailFast raises on the first bad file
  * (reference library behavior — parse_xml returns Err).
  */
sealed trait ParseMode
case object Permissive extends ParseMode
case object FailFast extends ParseMode

/** The Green Button engine: ESPI Atom-XML feeds → one denormalized
  * TimeSeries DataFrame (SURVEY.md §1-§3) → CSV / Parquet / InfluxDB sinks.
  *
  * Spark-first design:
  *   - one `map` over whole files does all shredding (S1-S8); everything
  *     downstream is declarative DataFrame algebra, so Catalyst handles
  *     pushdown/pruning and AQE picks join strategies;
  *   - the reference's hand-fused 4-way hash join (denormalize_and_link,
  *     lib/personalgreenbutton/src/lib.rs:32-190) becomes equi-joins keyed
  *     by (file, …) — per-file metadata tables (entries, reading types,
  *     local-time parameters) are tiny relative to readings, the one big
  *     fact table, so the plan is broadcast-join shaped at any scale;
  *   - the per-year DST memoization (lib.rs:117-156) becomes a derived
  *     (file, year) → [dst_start, dst_end) bounds table, broadcast-joined
  *     back to readings;
  *   - the enum decode (J5, gb_type_details.rs:8-31) is a broadcast
  *     dictionary join, applied to reading_types *before* the fact join so
  *     each code decodes once per reading type, not once per reading
  *     (mirrors the reference's enums_to_strings pre-pass, lib.rs:86-108).
  */
object GreenButton {

  /** The 15-column output schema, in reference order (timeseries.rs:244-262). */
  val outputColumns: Seq[String] = Seq(
    "title", "cost", "quality", "value", "tou",
    "time_period_start_unix", "time_period_duration_seconds",
    "accumulation_behaviour", "commodity", "currency", "data_qualifier",
    "flow_direction", "kind", "phase", "uom")

  // ---------------------------------------------------------------- sources

  /** S1/S2: scan files (glob ok) → one ParsedFeed row per file. */
  def parse(spark: SparkSession, path: String): Dataset[ParsedFeed] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        EspiXml.parseFeed(p, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** Parse in-memory documents (tests, incremental ingest S3). */
  def parseStrings(spark: SparkSession, docs: Seq[(String, String)]): Dataset[ParsedFeed] = {
    import spark.implicits._
    docs.toDS().map { case (name, xml) => EspiXml.parseFeed(name, xml) }
  }

  /** Staging tables derived from the parsed feeds (relational shredding S4).
    * Each carries the `file` key for per-file denormalization. */
  case class Staging(entries: DataFrame, readings: DataFrame,
                     readingTypes: DataFrame, localTimeParams: DataFrame,
                     errors: DataFrame)

  /** The denormalize DAG references the staging tables many times (self
    * joins, titles, DST years, diagnostics); without persistence every
    * branch would re-read and re-parse the XML. Caching the parsed feeds is
    * load-bearing: it turns ~8 parse passes into 1. `cache=false` opts out
    * for single-pass uses (streaming foreachBatch micro-batches). */
  def staging(parsed: Dataset[ParsedFeed], cache: Boolean = true): Staging = {
    val src = if (cache) parsed.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else parsed
    val ok = src.filter(col("error").isNull)
    def exploded(field: String): DataFrame =
      ok.select(col("file"), explode(col(field)).as("x")).select(col("file"), col("x.*"))
    Staging(
      entries = exploded("entries"),
      readings = exploded("readings"),
      readingTypes = exploded("readingTypes"),
      localTimeParams = exploded("localTimeParams"),
      errors = src.filter(col("error").isNotNull).select(col("file"), col("error")))
  }

  // ----------------------------------------------------------- denormalize

  /** In-plan assertion: guard a *live* column — when `bad` holds the
    * expression raises, otherwise the column value passes through. The
    * guard must be woven into a column that flows to the output: a guard in
    * a dropped side-column is dead code after Catalyst column pruning. */
  private def guarded(df: DataFrame, colName: String, bad: Column,
                      msg: Column): DataFrame =
    df.withColumn(colName, when(bad, raise_error(msg)).otherwise(col(colName)))

  /** Dictionary slice (value → decoded string) for one coded column. */
  private def dictSlice(dict: DataFrame, scope: String, field: String,
                        valueCol: String, outCol: String): DataFrame =
    dict.filter(col("scope") === scope && col("field") === field)
      .select(col("value").as(valueCol), col("app_info").as(outCol))

  /** UTC calendar year of a unix-seconds column, session-timezone-free. */
  private def utcYear(unixSec: Column): Column =
    year(date_from_unix_date(floor(unixSec / 86400L).cast("int")))

  /** The full denormalize_and_link as DataFrame algebra. Output: the 15
    * TimeSeries columns plus `file`. */
  def denormalize(spark: SparkSession, st: Staging,
                  mode: ParseMode = FailFast): DataFrame = {
    import spark.implicits._
    val failfast = mode == FailFast

    val dict = broadcast(GbTypeDetails.load(spark))

    // --- P7: exactly one LocalTimeParameters per file (lib.rs:42-50)
    val ltpCounts = st.localTimeParams.groupBy("file")
      .agg(count(lit(1)).as("ltp_n"),
        first("dstStartRule").as("dstStartRule"),
        first("dstEndRule").as("dstEndRule"),
        first("dstOffset").as("dstOffset"),
        first("tzOffset").as("tzOffset"))
    val filesWithEntries = st.entries.select("file").distinct()
    val ltp = filesWithEntries.join(ltpCounts, Seq("file"), "left")
      .withColumn("ltp_ok", col("ltp_n") === 1)
    val ltp1 =
      if (failfast)
        guarded(guarded(ltp, "tzOffset",
          col("ltp_n").isNull || col("ltp_n") === 0,
          lit("Missing LocalTimeParameters.")),
          "dstOffset", col("ltp_n") > 1,
          lit("Input with multiple LocalTimeParameters is currently unsupported."))
      else ltp.filter(col("ltp_ok"))

    // --- J2: two-hop FK resolution entry → meter-reading entry →
    //         reading-type entry (lib.rs:58-83)
    val e = st.entries.select(
      col("file"), col("idx"), col("relatedMeterReadingHref"))
    val mrSide = st.entries.select(
      col("file").as("mr_file"), col("href").as("mr_href"),
      col("relatedReadingTypeHref").as("rt_entry_href"))
    val rtSide = st.entries.select(
      col("file").as("rte_file"), col("href").as("rte_href"),
      col("entryType").as("rte_type"), col("rtIndex").as("rt_idx"))

    val hop1 = e.filter(col("relatedMeterReadingHref") =!= "")
      .join(mrSide,
        col("file") === col("mr_file") &&
          col("relatedMeterReadingHref") === col("mr_href"), "left")
    val hop2 = hop1
      .join(rtSide,
        col("file") === col("rte_file") &&
          col("rt_entry_href") === col("rte_href"), "left")
    // entry → reading-type index map (null when the entry has no meter link)
    val entryRt = hop2.select(
      col("file"), col("idx").as("entryIdx"), col("rt_idx"))

    // Failfast link errors are aggregated PER FILE, not woven into per-entry
    // columns: the reference builds the link map for every entry before any
    // readings flow (lib.rs:58-83), so a dangling link on an entry with zero
    // readings still errors the whole file. A per-row guard would be dead
    // code for such an entry (nothing downstream ever evaluates its
    // columns); the file-level memo joins onto every fact row of the file,
    // carrying the first bad entry's message (entry order, like the
    // reference's sequential loop).
    val linkErrPerFile = hop2.select(col("file"), col("idx"),
        when(col("mr_href").isNull,
          concat(lit("Missing meter reading entry "),
            col("relatedMeterReadingHref")))
        .when(col("rte_href").isNull || col("rte_type") =!= "ReadingType",
          concat(lit("Mismatched reading type "),
            coalesce(col("rte_type"), lit("missing"))))
        .as("link_err"))
      .filter(col("link_err").isNotNull)
      .groupBy("file")
      .agg(min_by(col("link_err"), col("idx")).as("file_link_err"))

    // --- J5 pre-pass: decode the 8 enum columns + pow10 on reading_types
    val rtFields = Seq(
      "accumulationBehaviour" -> "accumulation_behaviour",
      "commodity" -> "commodity", "currency" -> "currency",
      "dataQualifier" -> "data_qualifier", "flowDirection" -> "flow_direction",
      "kind" -> "kind", "phase" -> "phase", "uom" -> "uom")
    var rt = st.readingTypes
    for ((in, out) <- rtFields) {
      val slice = dictSlice(dict, "ReadingType", in, s"_v_$out", s"_s_$out")
      rt = rt.join(broadcast(slice), col(in) === col(s"_v_$out"), "left")
        .drop(in, s"_v_$out")
        .withColumn(out, coalesce(col(s"_s_$out"), lit(GbTypeDetails.MissingAppInfo)))
        .drop(s"_s_$out")
    }
    // F1: 10^powerOfTenMultiplier in f32, computed once per reading type;
    // Pow10F (StrictMath/fdlibm) is bit-stable across JVMs and yields the
    // correctly-rounded f32 the reference's f32::powf produces (lib.rs:172)
    val rtDecoded = rt
      .withColumn("pow10",
        graft.functions.Pow10F.pow10f(col("powerOfTenMultiplier").cast("int")))
      .withColumnRenamed("rtIndex", "rt_idx")
      .select((Seq("file", "rt_idx", "pow10") ++ rtFields.map(_._2)).map(col): _*)

    // --- F7/F8: per-(file, year) DST bounds, evaluated once and joined back
    val years = st.readings
      .select(col("file"), utcYear(col("startUnix")).as("year")).distinct()
    val bounds = years
      .join(ltp1.select("file", "dstStartRule", "dstEndRule"), Seq("file"))
      .as[(String, Int, Long, Long)]
      .map { case (file, yr, startRule, endRule) =>
        (file, yr,
          DstRules.epochOrNone(startRule, yr),
          DstRules.epochOrNone(endRule, yr))
      }
      .toDF("file", "year", "dst_start_epoch", "dst_end_epoch")

    // --- consolidate ALL per-entry and per-file metadata into ONE
    // entry-level side table, so the big fact table (readings) joins a
    // single time. At 100TB the readings are the cost driver: separate
    // joins for titles / rt map / decoded dims / LTP / DST bounds / enova
    // would each reshuffle the facts; entryMeta keeps those joins
    // metadata-sized and leaves one (file, entryIdx) equi-join (which AQE
    // turns into a broadcast when the metadata fits).
    val dstBoundsMap = bounds
      .groupBy("file")
      .agg(map_from_entries(collect_list(struct(
        col("year"),
        struct(col("dst_start_epoch"), col("dst_end_epoch")).as("b"))))
        .as("dst_bounds"))

    // F3 flag: enova patch keys off the *first* entry's href per file
    // (timeseries.rs:173-177)
    val enova = st.entries.filter(col("idx") === 0)
      .select(col("file"), col("href").contains("enova").as("enova_fix"))

    val entryMeta = st.entries
      .select(col("file"), col("idx").as("entryIdx"), col("title"))
      .join(entryRt, Seq("file", "entryIdx"), "left")
      .join(rtDecoded, Seq("file", "rt_idx"), "left")
      // per-FILE sides (one row per file) get explicit broadcast hints:
      // AQE would usually pick broadcast anyway, but its empty-partition
      // demotion heuristic can leave a sort-merge join on sparse inputs —
      // these sides are one-row-per-file by construction, so the hint is
      // always right
      .join(broadcast(ltp1.select("file", "dstOffset", "tzOffset")),
        Seq("file"))
      .join(broadcast(dstBoundsMap), Seq("file"), "left")
      .join(broadcast(enova), Seq("file"), "left")

    val qualityDict = broadcast(
      dictSlice(dict, "", "QualityOfReading", "_v_q", "quality_str"))

    var facts = st.readings
      .join(entryMeta, Seq("file", "entryIdx"))
    facts =
      if (failfast)
        // guards woven into `title` — a column that reaches the OUTPUT
        // projection; a guard on a pruned column (e.g. rt_idx, which is only
        // a join key) is dead code after Catalyst column pruning. The
        // file-level link guard is OUTERMOST: its predicate is checked
        // before the inner rt_idx one, so a dangling link reports the
        // reference's link-resolution message even when the bad entry's own
        // readings also have rt_idx NULL (link map is built before readings
        // flow, lib.rs:58-83)
        guarded(
          guarded(facts.join(linkErrPerFile, Seq("file"), "left"),
            "title", col("rt_idx").isNull, lit("Missing reading type")),
          "title", col("file_link_err").isNotNull, col("file_link_err"))
          .drop("file_link_err")
      else facts // permissive: rows of bad files are dropped file-wise below
    facts = facts
      .join(qualityDict, col("quality") === col("_v_q"), "left")
      .withColumn("quality_str",
        coalesce(col("quality_str"), lit(GbTypeDetails.MissingAppInfo)))

    // F8: civil-time shift — strict bounds, naive-UTC space (lib.rs:157-162);
    // the per-year memo is a map lookup on the year of each reading
    val b = element_at(col("dst_bounds"), utcYear(col("startUnix")))
    val shifted = facts.withColumn("ts_local",
      col("startUnix") + col("tzOffset") +
        when(b.isNotNull &&
          b.getField("dst_start_epoch").isNotNull &&
          b.getField("dst_end_epoch").isNotNull &&
          col("startUnix") > b.getField("dst_start_epoch") &&
          col("startUnix") < b.getField("dst_end_epoch"), col("dstOffset"))
          .otherwise(lit(0L)))

    val out = shifted
      .withColumn("cost_fixed",
        when(coalesce(col("enova_fix"), lit(false)),
          col("cost") * lit(100.0f)).otherwise(col("cost")))
      .withColumn("value_scaled",
        (col("value").cast("float") * col("pow10")).cast("float"))

    val selected = out.select(
      col("file"),
      col("seq"),
      col("title"),
      col("cost_fixed").as("cost"),
      col("quality_str").as("quality"),
      col("value_scaled").as("value"),
      col("tou"),
      col("ts_local").as("time_period_start_unix"),
      col("durationSec").as("time_period_duration_seconds"),
      col("accumulation_behaviour"), col("commodity"), col("currency"),
      col("data_qualifier"), col("flow_direction"), col("kind"),
      col("phase"), col("uom"))

    // Permissive = reference CLI semantics: a file that would fail
    // denormalize contributes NOTHING (skip whole file), not partial rows
    // (cli-frontend/src/main.rs:34-37: any parse_xml error skips the file).
    if (failfast) {
      // Error-carrier rows for files with violations but ZERO fact rows
      // (e.g. a dangling link or bad LTP in a file with no readings): the
      // per-fact guards above never evaluate for such a file, while the
      // reference errors during link/LTP resolution before readings flow
      // (lib.rs:42-50, 58-83). One raising row per bad file is unioned in;
      // when the file also has facts, those raise anyway and the query
      // aborts before any row reaches the caller.
      val ltpErrs = ltp.filter(col("ltp_n").isNull || col("ltp_n") =!= 1)
        .select(col("file"),
          when(col("ltp_n").isNull || col("ltp_n") === 0,
            lit("Missing LocalTimeParameters."))
            .otherwise(lit(
              "Input with multiple LocalTimeParameters is currently unsupported."))
            .as("err"))
      val allErrs = linkErrPerFile
        .select(col("file"), col("file_link_err").as("err"))
        .unionByName(ltpErrs)
      // the raise rides a GENERATOR: even a bare count() must evaluate the
      // generator to know the row count, so the error cannot be pruned away
      // the way a raising projection column can
      val errRows = allErrs
        .withColumn("_t", explode(array(raise_error(col("err")).cast("string"))))
        .select(col("file") +: selected.schema.fields.filter(_.name != "file")
          .map { f =>
            if (f.name == "title") col("_t").as("title")
            else lit(null).cast(f.dataType).as(f.name)
          }.toSeq: _*)
      selected.unionByName(errRows)
    } else selected.join(
      badDenormFiles(hop2, entryRt, st, ltp).select("file"),
      Seq("file"), "left_anti")
  }

  /** Files whose denormalization would error (link resolution, missing
    * reading type, LocalTimeParameters cardinality) with a reason — the
    * file-level skip set for permissive mode, and the CLI's warning feed. */
  private def badDenormFiles(hop2: DataFrame, entryRt: DataFrame,
                             st: Staging, ltp: DataFrame): DataFrame = {
    val badLinks = hop2.filter(
      col("mr_href").isNull || col("rte_href").isNull ||
        col("rte_type") =!= "ReadingType")
      .select(col("file"), lit("unresolvable reading-type link").as("reason"))
    val readingEntries = st.readings.select("file", "entryIdx").distinct()
    val badRt = readingEntries
      .join(entryRt, Seq("file", "entryIdx"), "left")
      .filter(col("rt_idx").isNull)
      .select(col("file"), lit("Missing reading type").as("reason"))
    val badLtp = ltp.filter(col("ltp_ok").isNull || !col("ltp_ok"))
      .select(col("file"), lit("LocalTimeParameters count != 1").as("reason"))
    badLinks.unionByName(badRt).unionByName(badLtp).distinct()
  }

  /** Public diagnostics: (file, reason) for every input file the permissive
    * pipeline skips — parse failures plus denormalize violations. */
  def skippedFiles(spark: SparkSession, st: Staging): DataFrame = {
    val denorm = denormalizeDiagnostics(spark, st)
    st.errors.select(col("file"), col("error").as("reason"))
      .unionByName(denorm).distinct()
  }

  private def denormalizeDiagnostics(spark: SparkSession, st: Staging): DataFrame = {
    val mrSide = st.entries.select(
      col("file").as("mr_file"), col("href").as("mr_href"),
      col("relatedReadingTypeHref").as("rt_entry_href"))
    val rtSide = st.entries.select(
      col("file").as("rte_file"), col("href").as("rte_href"),
      col("entryType").as("rte_type"), col("rtIndex").as("rt_idx"))
    val hop2 = st.entries
      .select(col("file"), col("idx"), col("relatedMeterReadingHref"))
      .filter(col("relatedMeterReadingHref") =!= "")
      .join(mrSide, col("file") === col("mr_file") &&
        col("relatedMeterReadingHref") === col("mr_href"), "left")
      .join(rtSide, col("file") === col("rte_file") &&
        col("rt_entry_href") === col("rte_href"), "left")
    val entryRt = hop2.select(col("file"), col("idx").as("entryIdx"), col("rt_idx"))
    val ltpCounts = st.localTimeParams.groupBy("file")
      .agg(count(lit(1)).as("ltp_n"))
    val ltp = st.entries.select("file").distinct()
      .join(ltpCounts, Seq("file"), "left")
      .withColumn("ltp_ok", col("ltp_n") === 1)
    badDenormFiles(hop2, entryRt, st, ltp)
  }

  /** End-to-end: path glob → TimeSeries DataFrame (15 columns; file order is
    * not retained — the reference CLI doesn't sort either, use
    * [[TimeSeriesOps.sortSeries]] for the deterministic order). */
  def timeseries(spark: SparkSession, path: String,
                 mode: ParseMode = Permissive): DataFrame = {
    val parsed = parse(spark, path)
    denormalize(spark, staging(parsed), mode).drop("file", "seq")
  }

  /** Like [[timeseries]] but rows come back in the reference CLI's output
    * order — file order then document order (cli-frontend/src/main.rs:30-38
    * never sorts; row order is ingestion order). */
  def timeseriesInputOrdered(spark: SparkSession, path: String,
                             mode: ParseMode = Permissive): DataFrame = {
    val parsed = parse(spark, path)
    denormalize(spark, staging(parsed), mode)
      .orderBy(col("file"), col("seq"))
      .drop("file", "seq")
  }

  def timeseriesFromStrings(spark: SparkSession, docs: Seq[(String, String)],
                            mode: ParseMode = FailFast): DataFrame =
    denormalize(spark, staging(parseStrings(spark, docs)), mode)
      .drop("file", "seq")
}
