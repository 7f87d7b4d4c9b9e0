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
    new EspiScan(paths, required, failfast, pushed)
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
               pushed: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EspiMicroBatchStream(this)

  private[sources] def listFiles(): Seq[String] = {
    val conf = hadoopConf
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }.map(_.getPath.toString)
    }.distinct
      .filter(EspiScan.accepts(pushed, "file", _))
      .sorted
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

/** Streaming offset = the sorted set of files already ingested, serialized
  * as a JSON array. Honest scale note: at feed-corpus cardinalities this is
  * small; a production deployment at millions of files would keep a
  * compacted file log beside the checkpoint (as Spark's FileStreamSource
  * does) and put only its sequence number here. */
case class EspiOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  // escape ALL control characters too: the offset log is line-oriented, so
  // a (legal) file name containing a newline would otherwise split the
  // offset across log lines and corrupt recovery
  override def json(): String =
    files.map(f => "\"" + f.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\"").mkString("[", ",", "]")
}

object EspiOffset {
  def fromJson(json: String): EspiOffset = {
    // parse the JSON string array written by json() (no nested structures;
    // escapes: \" \\ \uXXXX)
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
    EspiOffset(items.toSeq)
  }
}

/** Micro-batch stream over an ESPI feed directory: each batch is the set of
  * newly arrived files (one input partition per file — the same partition
  * and reader code path as the batch scan, so column pruning and filter
  * pushdown apply to the stream too). `spark.readStream.format("espi")`. */
class EspiMicroBatchStream(scan: EspiScan)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = EspiOffset(Seq.empty)

  override def latestOffset(): Offset = EspiOffset(scan.listFiles())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[EspiOffset].files.toSet
    end.asInstanceOf[EspiOffset].files.filterNot(seen)
      .map(EspiFilePartition(_): InputPartition).toArray
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
