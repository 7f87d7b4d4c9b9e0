package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.gb.{EspiXml, Schemas}

/** DataSource V2 for ESPI Atom-XML feeds: `spark.read.format("espi")
  * .load(pathGlob)` yields **one row per Atom entry** — the flattened
  * entry-union of SURVEY.md §1.3 (envelope columns + nullable payload
  * structs/arrays), the relational form of the reference's per-entity
  * shredder (content.rs:14-74).
  *
  * Scale shape: one input partition per file (feeds are single-digit MB;
  * parallelism = number of files), parsing runs inside the scan, and
  * top-level column pruning is pushed into the reader (a projection that
  * only needs the envelope never materializes readings arrays).
  *
  * Options: `mode=permissive` (default: skip unparseable files) |
  * `failfast`.
  */
class EspiDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "espi"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EspiDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EspiTable(properties)

  override def supportsExternalMetadata(): Boolean = false
}

object EspiDataSource {
  val readingType: StructType = StructType(Seq(
    StructField("cost", FloatType, nullable = false),
    StructField("quality", IntegerType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("tou", IntegerType, nullable = false),
    StructField("start_unix", LongType, nullable = false),
    StructField("duration_seconds", IntegerType, nullable = false)))

  val rtType: StructType = StructType(Seq(
    "accumulation_behaviour", "commodity", "currency", "data_qualifier",
    "flow_direction", "kind", "power_of_ten_multiplier", "phase", "uom")
    .map(StructField(_, IntegerType, nullable = false)))

  val ltpType: StructType = StructType(Seq(
    StructField("dst_start_rule", LongType, nullable = false),
    StructField("dst_end_rule", LongType, nullable = false),
    StructField("dst_offset", LongType, nullable = false),
    StructField("tz_offset", LongType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("entry_type", StringType, nullable = false),
    StructField("rt_index", IntegerType, nullable = false),
    StructField("href", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("published_unix", LongType, nullable = false),
    StructField("updated_unix", LongType, nullable = false),
    StructField("related_meter_reading_href", StringType, nullable = false),
    StructField("related_reading_type_href", StringType, nullable = false),
    StructField("readings", ArrayType(readingType, containsNull = false)),
    StructField("reading_type", rtType),
    StructField("local_time_params", ltpType)))
}

class EspiTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "espi"
  override def schema(): StructType = EspiDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EspiScanBuilder(options)
}

class EspiScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = EspiDataSource.schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `file` predicates prune WHOLE FILES at planning time (a query for one
    * meter's feed out of a 100TB corpus never lists, opens, or parses the
    * rest); `entry_type` predicates skip rows before payload
    * materialization. Every filter is also returned as a post-scan filter,
    * so Spark re-applies them — pushdown is a pure pruning optimization,
    * never a semantics change. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(EspiScan.pushable)
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan = {
    val paths = Option(options.get("paths"))
      .map(_.split(",").toSeq)
      .orElse(Option(options.get("path")).map(Seq(_)))
      .getOrElse(Seq.empty)
    val failfast =
      Option(options.get("mode")).exists(_.equalsIgnoreCase("failfast"))
    val maxFilesPerTrigger =
      Option(options.get("maxFilesPerTrigger")).map(_.trim.toInt)
    // grace resolved ONCE here (option > session conf > default): offset
    // planning and batch planning on different driver threads must observe
    // the SAME lateness horizon, or the isNew/seenBy algebra the
    // exactly-once contract depends on skews mid-query
    val graceMs = Option(options.get("graceMs")).map(_.trim.toLong)
      .getOrElse(EspiOffset.graceMs)
    new EspiScan(paths, required, failfast, pushed, maxFilesPerTrigger, graceMs)
  }
}

case class EspiFilePartition(path: String) extends InputPartition

object EspiScan {
  import org.apache.spark.sql.sources._

  /** Filters usable for pruning: file-path predicates (whole-file skip) and
    * entry_type predicates (pre-materialization row skip). */
  def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => a == "file" || a == "entry_type"
    case In(a, _) => a == "file" || a == "entry_type"
    case StringStartsWith("file", _) => true
    case StringEndsWith("file", _) => true
    case StringContains("file", _) => true
    case _ => false
  }

  /** Evaluate the pushed predicates against one attribute value; filters on
    * other attributes pass (conjunction semantics). */
  def accepts(filters: Seq[Filter], attr: String, value: String): Boolean =
    filters.forall {
      case EqualTo(`attr`, v) => value == v
      case In(`attr`, vs) => vs.contains(value)
      case StringStartsWith(`attr`, p) => value.startsWith(p)
      case StringEndsWith(`attr`, s) => value.endsWith(s)
      case StringContains(`attr`, s) => value.contains(s)
      case _ => true
    }
}

class EspiScan(paths: Seq[String], required: StructType, failfast: Boolean,
               pushed: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
               private[sources] val maxFilesPerTrigger: Option[Int] = None,
               // default arg evaluates at CONSTRUCTION (driver thread with
               // the session active), so direct constructions also pin one
               // grace horizon for the scan's lifetime
               private[sources] val graceMs: Long = EspiOffset.graceMs)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EspiMicroBatchStream(this)

  private[sources] def listFiles(): Seq[String] = listFilesWithTimes().map(_._1)

  /** (path, modificationTime) per matched file — mod times drive the
    * compacted streaming offset's watermark. */
  private[sources] def listFilesWithTimes(): Seq[(String, Long)] = {
    val conf = hadoopConf
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }.map(st => st.getPath.toString -> st.getModificationTime)
    }.distinctBy(_._1)
      .filter { case (p, _) => EspiScan.accepts(pushed, "file", p) }
      .sortBy(_._1)
  }

  private[sources] def readerFactory(): PartitionReaderFactory =
    new EspiReaderFactory(required, failfast,
      new org.apache.spark.util.SerializableConfiguration(hadoopConf), pushed)

  override def description(): String =
    s"espi PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  private def hadoopConf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration

  // partition pruning inside listFiles: a file whose path fails the pushed
  // predicates is never opened, read, or parsed
  override def planInputPartitions(): Array[InputPartition] =
    listFiles().map(EspiFilePartition(_): InputPartition).toArray

  // ships the session's Hadoop conf to the executors so filesystem
  // settings/credentials (e.g. object-store keys) apply at read time,
  // same as the listing uses
  override def createReaderFactory(): PartitionReaderFactory =
    readerFactory()
}

/** Log-compacted streaming offset: `watermark` is the highest file
  * modification time fully ingested, `recent` the (sorted) files whose mod
  * time falls within [[EspiOffset.graceMs]] of it. A file is NEW iff its
  * mod time is past the watermark, or inside the grace window but not in
  * `recent` — so the offset is O(arrival-rate × grace), not O(files ever
  * seen): a year-long watch of a million-file directory checkpoints a
  * handful of paths, not the full history (the round-3 review's unbounded-
  * offset gap). The grace window absorbs filesystem timestamp granularity
  * and listing races; a file that materializes with a mod time older than
  * `watermark − graceMs` is NOT picked up — the same bounded-lateness
  * contract as Spark's own FileStreamSource `maxFileAge`.
  *
  * `watermark == Long.MinValue` marks the initial offset AND deserialized
  * legacy offsets (pre-compaction checkpoints stored the full file list as
  * a bare JSON array): for those, `recent` IS the complete seen set and
  * membership alone decides newness, so existing checkpoints restart
  * correctly and the very next offset written is the compacted form.
  */
case class EspiOffset(watermark: Long, recent: Seq[String],
                      mts: Seq[Long] = Seq.empty)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  // `mts` carries the LAST-KNOWN modification time per `recent` entry
  // (aligned by index; empty on legacy/hand-built offsets = unknown). It
  // exists so a path that disappears from the listing (deleted after
  // ingest — a standard retention pattern) still AGES OUT of the offset
  // within one grace window instead of being retained forever: without a
  // stored mtime, an absent path is indistinguishable from a transient
  // listing flicker and the safe direction (retain) grows the offset
  // without bound. With it, retention is exactly the window in which
  // isNew could re-admit the path — the FileStreamSource maxFileAge
  // semantics.
  /** Last-known mtime per member; `default` for legacy offsets. */
  def mtMap(default: Long): Map[String, Long] =
    if (mts.length == recent.length) recent.zip(mts).toMap
    else recent.map(_ -> default).toMap
  // escape ALL control characters too: the offset log is line-oriented, so
  // a (legal) file name containing a newline would otherwise split the
  // offset across log lines and corrupt recovery
  private def esc(f: String): String =
    "\"" + f.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  // "m" MUST precede "r": the r-parser collects every quoted string after
  // the "r": key, so a trailing "m" KEY would be swallowed as a path
  override def json(): String =
    s"""{"w":$watermark,"m":${mts.mkString("[", ",", "]")},""" +
      s""""r":${recent.map(esc).mkString("[", ",", "]")}}"""
}

object EspiOffset {
  /** Mod-time slack absorbed by the `recent` set: files whose mod time is
    * within this window of the watermark stay in the dedup set, and a file
    * materializing with an OLDER mod time than `watermark - graceMs` is
    * permanently dropped (bounded lateness, like FileStreamSource's
    * maxFileAge). The default covers the canonical atomic-delivery pattern
    * (mv/rsync/cp -p preserve the ORIGINAL mtime, so a file can enter the
    * watch dir minutes "late" by mod time). Session-configurable —
    * `spark.graft.espi.graceMs` — because the trade is offset size
    * (O(arrivals within grace)) vs lateness tolerance; like maxFileAge,
    * changing it mid-checkpoint shifts the lateness horizon for
    * subsequent batches only.
    */
  val defaultGraceMs: Long = 300000L
  def graceMs: Long =
    org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(sp => scala.util.Try(
        sp.conf.get("spark.graft.espi.graceMs").toLong).toOption)
      .getOrElse(defaultGraceMs)

  val initial: EspiOffset = EspiOffset(Long.MinValue, Seq.empty)

  /** Is (path, modTime) NOT yet ingested as of `off`? Membership in
    * `recent` always wins: a file's mod time can ADVANCE after it was
    * listed and ingested (non-atomic create-then-write, copies into the
    * watch dir, mtime bumped on close) and a bare `modTime > watermark`
    * test would re-ingest it — an observed exactly-once violation under
    * load. Like Spark's FileStreamSource, a modification to an
    * already-seen file is NOT a new file; only a path unseen in the grace
    * window is. (A file touched long after aging out of `recent`
    * re-enters as new — the same bounded-memory trade `maxFileAge`
    * makes.) */
  def isNew(off: EspiOffset, recentSet: Set[String], path: String,
            modTime: Long, grace: Long = graceMs): Boolean =
    if (off.watermark == Long.MinValue) !recentSet.contains(path) // legacy/initial
    else !recentSet.contains(path) && modTime >= off.watermark - grace

  /** Was (path, modTime) already listed when `off` was taken? (Bounds a
    * batch's end: a file that raced in after the end offset waits for the
    * next batch — exactly-once.) */
  def seenBy(off: EspiOffset, recentSet: Set[String], path: String,
             modTime: Long, grace: Long = graceMs): Boolean =
    if (off.watermark == Long.MinValue) recentSet.contains(path)
    else modTime < off.watermark - grace || recentSet.contains(path)

  /** Monotone high-water advance: a freshly-listed offset may only move
    * the committed frontier forward — an empty/partial listing (lower
    * watermark) holds the previous offset, and an equal-watermark listing
    * unions the membership sets (a partial listing at the same watermark
    * must not drop same-mtime files from the dedup set). Pure — property-
    * tested in PropertySpec against arbitrary arrival schedules. */
  def advance(hw: EspiOffset, listed: EspiOffset,
              grace: Long = graceMs): EspiOffset =
    if (hw == null) listed
    else if (listed.watermark < hw.watermark) hw
    else if (listed.watermark == hw.watermark)
      build(hw.watermark,
        hw.mtMap(hw.watermark) ++ listed.mtMap(listed.watermark), grace)
    else listed

  /** Assemble an offset from a path→last-known-mtime map, keeping only
    * members still inside the grace window of `w` — the single aging
    * rule every construction path shares. */
  private def build(w: Long, byPath: Map[String, Long],
                    grace: Long): EspiOffset = {
    val kept = byPath.toSeq.filter(_._2 >= w - grace).sortBy(_._1)
    EspiOffset(w, kept.map(_._1), kept.map(_._2))
  }

  /** Compact a full listing into an offset. */
  def ofListing(listing: Seq[(String, Long)], grace: Long = graceMs): EspiOffset =
    if (listing.isEmpty) initial
    else build(listing.map(_._2).max, listing.toMap, grace)

  /** End-offset algebra for an admitted batch: the planned end must
    * DOMINATE the start. A bare `ofListing(frontier)` breaks it two ways:
    * (a) when every admitted file is late-within-grace (mt < start
    * watermark — the mv/rsync old-mtime deliveries the grace window
    * exists for), the frontier's watermark is BELOW start's, a
    * monotonicity guard then holds `start`, and the identical empty batch
    * recurs every trigger — the late file is withheld forever; (b) when
    * the frontier's watermark EQUALS start's, the frontier compaction
    * contains only frontier files, silently dropping already-ingested
    * same-mtime paths that sort after the admitted frontier — they
    * re-enter as new next trigger (re-ingestion). So: watermark =
    * max(start, frontier), recent = union of both memberships, and every
    * member ages by its best-known mtime (current listing first, then the
    * mtime stored in the offset, then — legacy offsets without stored
    * mtimes — the new watermark, i.e. retained one full grace window).
    * A path below the grace horizon is dropped whether listed or absent:
    * isNew can never re-admit it, so dropping is free, and retaining
    * ABSENT paths forever would grow the offset without bound under
    * delete-after-ingest retention; a transiently flickering path is
    * still protected for exactly the window in which it could re-enter. */
  def dominate(start: EspiOffset, frontier: EspiOffset,
               listing: Seq[(String, Long)], grace: Long): EspiOffset = {
    val w = math.max(start.watermark, frontier.watermark)
    val listedMt = listing.toMap
    val merged = (start.mtMap(w) ++ frontier.mtMap(frontier.watermark))
      .map { case (p, mt) => p -> listedMt.getOrElse(p, mt) }
    build(w, merged, grace)
  }

  def fromJson(json: String): EspiOffset = {
    val t = json.trim
    if (t.startsWith("[")) EspiOffset(Long.MinValue, parseStrings(t)) // legacy
    else {
      // {"w":N,"m":[...],"r":[...]} — the key tokens are safe to search
      // for: quotes inside file-name strings are escaped, and "w"/"m"
      // precede the only string content, so the FIRST "r": is the real
      // key. Offsets from before the mtime field ({"w":N,"r":[...]})
      // deserialize with mts empty = unknown.
      val rPos = t.indexOf("\"r\":")
      val wPos = t.indexOf("\"w\":") + 4
      require(rPos > 0 && wPos >= 4, s"malformed espi offset: $t")
      val w = t.substring(wPos, t.indexOf(',', wPos)).trim.toLong
      val mPos = t.indexOf("\"m\":")
      val mts =
        if (mPos < 0 || mPos > rPos) Seq.empty[Long]
        else {
          val body = t.substring(t.indexOf('[', mPos) + 1,
            t.indexOf(']', mPos))
          if (body.trim.isEmpty) Seq.empty[Long]
          else body.split(',').toSeq.map(_.trim.toLong)
        }
      val paths = parseStrings(t.substring(rPos + 4))
      EspiOffset(w, paths,
        if (mts.length == paths.length) mts else Seq.empty)
    }
  }

  // parse a JSON string array (no nested structures; escapes: \" \\ \uXXXX)
  private def parseStrings(json: String): Seq[String] = {
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\') {
          val n = json.charAt(i + 1)
          if (n == 'u') {
            sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
            i += 5
          } else { sb.append(n); i += 1 }
        } else if (c == '"') { items += sb.result(); sb.clear(); inStr = false }
        else sb.append(c)
      } else if (c == '"') inStr = true
      i += 1
    }
    items.toSeq
  }
}

/** Micro-batch stream over an ESPI feed directory: each batch is the set of
  * newly arrived files (one input partition per file — the same partition
  * and reader code path as the batch scan, so column pruning and filter
  * pushdown apply to the stream too). `spark.readStream.format("espi")`. */
class EspiMicroBatchStream(scan: EspiScan)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit,
    ReadMaxFiles}

  // Monotonicity guard: a transient empty/partial listing (object-store
  // hiccup, glob race, dir briefly moved) must not regress the offset —
  // committing a REGRESSED end (worst case `initial`) would erase the
  // dedup state and re-ingest every still-present file on the next
  // trigger. The high-water offset only ever advances within a run;
  // across restarts the committed offset log plays the same role (a
  // regressed end never gets committed, so no start ever goes backward).
  @volatile private var highWater: EspiOffset = null
  // last offset actually computed by a planning call — reportLatestOffset
  // returns this instead of performing an independent second listing per
  // trigger (cost on object stores, and two listings can observe different
  // directory snapshots, making the reported offset disagree with the
  // planned one)
  @volatile private var lastComputed: EspiOffset = null

  override def initialOffset(): Offset = EspiOffset.initial

  override def latestOffset(): Offset = {
    val next = EspiOffset.advance(highWater,
      EspiOffset.ofListing(scan.listFilesWithTimes(), scan.graceMs))
    highWater = next
    lastComputed = next
    next
  }

  // ---- admission control (maxFilesPerTrigger): bound each micro-batch to
  // N new files so a backfill against a full directory proceeds in
  // bounded-size batches instead of one giant batch 0. The end offset of a
  // capped batch is the compaction of the listing PREFIX at-or-before the
  // admitted frontier in (modTime, path) order — the same offset algebra,
  // just evaluated on a prefix, so isNew/seenBy bound the batch exactly
  // and the files beyond the frontier surface as new on the next trigger.
  override def getDefaultReadLimit: ReadLimit =
    scan.maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset =
    if (lastComputed != null) lastComputed else latestOffset()

  // This is the engine's ONLY planning path once SupportsAdmissionControl
  // is implemented (MicroBatchExecution calls it even for allAvailable),
  // so the end offset must DOMINATE start — see EspiOffset.dominate for
  // the two failure modes of a bare frontier compaction (late-within-grace
  // withholding; same-mtime membership drop).
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val grace = scan.graceMs
    val s = start.asInstanceOf[EspiOffset]
    val sRecent = s.recent.toSet
    val listing = scan.listFilesWithTimes()
    val fresh = listing
      .filter { case (p, mt) => EspiOffset.isNew(s, sRecent, p, mt, grace) }
      .sortBy { case (p, mt) => (mt, p) }
    val admitted = limit match {
      case rm: ReadMaxFiles => fresh.take(rm.maxFiles())
      case _ => fresh
    }
    val end =
      if (admitted.isEmpty) s // nothing new (or a listing hiccup): hold
      else {
        val (lastP, lastMt) = admitted.last
        val frontier = listing.filter { case (p, mt) =>
          mt < lastMt || (mt == lastMt && p <= lastP) }
        EspiOffset.dominate(s, EspiOffset.ofListing(frontier, grace),
          listing, grace)
      }
    lastComputed = end
    end
  }

  // The compacted offset no longer carries the batch's file list, so the
  // batch is re-derived from a fresh listing bounded by (start, end]:
  // new-as-of-start AND already-listed-by-end. Replay of a committed batch
  // therefore requires the source files to still exist — the same contract
  // as every file-based streaming source — AND assumes no file
  // materializes with a mod time older than end.watermark - graceMs
  // between the original attempt and the replay (such a file would pass
  // seenBy's below-grace branch and join the replayed batch). Both halves
  // of that listing-stability assumption are the price of O(grace)
  // offsets; widen spark.graft.espi.graceMs if deliveries carry old
  // mtimes (mv/rsync -a).
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EspiOffset]
    val e = end.asInstanceOf[EspiOffset]
    val sRecent = s.recent.toSet
    val eRecent = e.recent.toSet
    val listing = scan.listFilesWithTimes()
    val planned = listing.collect {
      case (p, mt) if EspiOffset.isNew(s, sRecent, p, mt, scan.graceMs) &&
        EspiOffset.seenBy(e, eRecent, p, mt, scan.graceMs) =>
        EspiFilePartition(p): InputPartition
    }.toArray
    if (sys.env.contains("ESPI_DEBUG_OFFSETS"))
      System.err.println(s"[espi-debug] plan start=${s.json()} end=${e.json()} " +
        s"listing=$listing planned=${planned.mkString(",")}")
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.readerFactory()

  override def deserializeOffset(json: String): Offset = EspiOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class EspiReaderFactory(required: StructType, failfast: Boolean,
                        conf: org.apache.spark.util.SerializableConfiguration,
                        pushed: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EspiPartitionReader(
      partition.asInstanceOf[EspiFilePartition].path, required, failfast,
      conf.value, pushed)
}

/** Parses one file and serves its entries as InternalRows, projecting only
  * the pruned columns. */
class EspiPartitionReader(path: String, required: StructType, failfast: Boolean,
                          conf: org.apache.hadoop.conf.Configuration,
                          pushed: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
    extends PartitionReader[InternalRow] {

  private val feed: Schemas.ParsedFeed = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(conf)
    val in = fs.open(hp)
    val bytes =
      try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      finally in.close()
    val parsed = EspiXml.parseFeed(path,
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    if (parsed.error != null && failfast)
      throw new EspiXml.EspiParseException(s"$path: ${parsed.error}")
    parsed
  }

  private val readingsByEntry: Map[Int, Seq[Schemas.IntervalReadingRaw]] =
    if (feed.error != null) Map.empty else feed.readings.groupBy(_.entryIdx)
  private val rtByEntry: Map[Int, Schemas.ReadingTypeRaw] =
    if (feed.error != null) Map.empty
    else feed.readingTypes.map(r => r.entryIdx -> r).toMap
  // the reference attaches LTP to the entry that carried it; we attach the
  // file's single LTP to its LocalTimeParameters entries in order
  private var ltpServed = 0

  // entry_type pushdown: skip rows before payload materialization (the
  // readings array of a filtered-out entry is never built). NOTE: only safe
  // ahead of the ltpServed bookkeeping because LocalTimeParameters rows are
  // either all kept or all skipped by an entry_type predicate.
  private val it =
    if (feed.error != null) Iterator.empty
    else feed.entries.iterator.filter(e =>
      EspiScan.accepts(pushed, "entry_type", e.entryType))
  private var cur: Schemas.EntryRaw = _

  override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }

  override def get(): InternalRow = {
    val e = cur
    val values: Array[Any] = required.fields.map { f =>
      f.name match {
        case "file" => UTF8String.fromString(feed.file)
        case "idx" => e.idx
        case "entry_type" => UTF8String.fromString(e.entryType)
        case "rt_index" => e.rtIndex
        case "href" => UTF8String.fromString(e.href)
        case "title" => UTF8String.fromString(e.title)
        case "published_unix" => e.publishedUnix
        case "updated_unix" => e.updatedUnix
        case "related_meter_reading_href" =>
          UTF8String.fromString(e.relatedMeterReadingHref)
        case "related_reading_type_href" =>
          UTF8String.fromString(e.relatedReadingTypeHref)
        case "readings" =>
          readingsByEntry.get(e.idx).map { rs =>
            new GenericArrayData(rs.map(r => InternalRow(
              r.cost, r.quality, r.value, r.tou, r.startUnix, r.durationSec
            )).toArray[Any]): ArrayData
          }.orNull
        case "reading_type" =>
          rtByEntry.get(e.idx).map(rt => InternalRow(
            rt.accumulationBehaviour, rt.commodity, rt.currency,
            rt.dataQualifier, rt.flowDirection, rt.kind,
            rt.powerOfTenMultiplier, rt.phase, rt.uom)).orNull
        case "local_time_params" =>
          if (e.entryType == "LocalTimeParameters" &&
              ltpServed < feed.localTimeParams.length) {
            val l = feed.localTimeParams(ltpServed)
            ltpServed += 1
            InternalRow(l.dstStartRule, l.dstEndRule, l.dstOffset, l.tzOffset)
          } else null
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
