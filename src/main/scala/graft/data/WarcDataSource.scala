package graft.data

import java.io.BufferedInputStream
import java.time.Instant
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import java.util.OptionalLong

import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{And => SAnd, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not => SNot, Or => SOr, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("warc")` — DataSource V2 over WARC crawl archives.
  *
  * Plan shape at scale (see [[Warc]]'s scale notes):
  *  - one [[InputPartition]] per `.warc`/`.warc.gz` file (the framing and
  *    per-record gzip members are not splittable — identical to Spark's
  *    own `.gz` text contract); a 100-TB crawl is O(100k) files, far above
  *    any cluster's core count, so scheduling stays saturated;
  *  - [[SupportsPushDownRequiredColumns]] pushes column pruning INTO the
  *    record parser: when `content` is pruned the payload bytes are
  *    skipped, not buffered, so metadata scans never materialize bodies
  *    (`.explain` shows the pruned ReadSchema on the BatchScan node).
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Warc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

private[data] class WarcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"warc(${WarcTable.paths(options).mkString(",")})"
  override def schema(): StructType = Warc.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(o)
    new WarcScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[data] object WarcTable {
  /** `load(paths*)` passes one `path` or a JSON-array `paths` option. */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val multi = options.get("paths")
    if (multi != null) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      out ++= mapper.readValue(multi, classOf[Array[String]])
    }
    val single = options.get("path")
    if (single != null) out += single
    require(out.nonEmpty, "warc source requires a path: spark.read.format(\"warc\").load(dir)")
    out.toSeq
  }

  private def isWarcFile(name: String): Boolean =
    (name.endsWith(".warc") || name.endsWith(".warc.gz")) &&
      !name.startsWith("_") && !name.startsWith(".")

  /** Driver-side file expansion (dirs list non-recursively, globs expand),
    * sorted for deterministic partition numbering.
    */
  def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val stats =
        if (p.exists("*?[{".contains(_))) fs.globStatus(path).toSeq
        else Seq(fs.getFileStatus(path))
      stats.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(s => s.isFile && isWarcFile(s.getPath.getName))
            .map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }.distinct.sorted
  }
}

/** Metadata-filter pushdown for the WARC reader.
  *
  * Supported filters are evaluated on a record's HEADERS, before its
  * payload is read — a rejected record's body is skipped byte-for-byte
  * ([[Warc.records]]' `keep`), so `warc_type = 'response'` over a crawl
  * decompresses headers plus only the matching payloads. Every filter is
  * ALSO returned to Spark as a post-scan residual: the reader-side eval
  * is an I/O optimization, never the correctness gate, so its only
  * obligation is to never under-keep (it returns `false` for a
  * null-valued field exactly where SQL yields unknown → dropped, and
  * `Not` can then only over-keep).
  */
private[data] object WarcFilters {
  private val MetaCols =
    Set("url", "warc_type", "record_id", "content_type", "content_length")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => MetaCols(a)
    case In(a, _) => MetaCols(a)
    case StringStartsWith(a, _) => MetaCols(a)
    case StringEndsWith(a, _) => MetaCols(a)
    case StringContains(a, _) => MetaCols(a)
    case GreaterThan(a, _) => a == "content_length"
    case GreaterThanOrEqual(a, _) => a == "content_length"
    case LessThan(a, _) => a == "content_length"
    case LessThanOrEqual(a, _) => a == "content_length"
    case IsNotNull(a) => MetaCols(a)
    case IsNull(a) => MetaCols(a)
    case SAnd(l, r) => supported(l) && supported(r)
    case SOr(l, r) => supported(l) && supported(r)
    case SNot(c) => supported(c)
    case _ => false
  }

  private def str(r: Warc.WarcRecord, a: String): String = a match {
    case "url" => r.targetUri
    case "warc_type" => r.warcType
    case "record_id" => r.recordId
    case "content_type" => r.contentType
    case other => throw new IllegalArgumentException(s"not a string meta column: $other")
  }

  private def lng(v: Any): Long = v.asInstanceOf[Number].longValue()

  def eval(f: Filter, r: Warc.WarcRecord): Boolean = f match {
    case EqualTo("content_length", v) => r.contentLength == lng(v)
    case GreaterThan("content_length", v) => r.contentLength > lng(v)
    case GreaterThanOrEqual("content_length", v) => r.contentLength >= lng(v)
    case LessThan("content_length", v) => r.contentLength < lng(v)
    case LessThanOrEqual("content_length", v) => r.contentLength <= lng(v)
    case In("content_length", vs) => vs.exists(v => v != null && r.contentLength == lng(v))
    case IsNotNull("content_length") | IsNull("content_length") =>
      f.isInstanceOf[IsNotNull] // content_length is never null
    case EqualTo(a, v) => { val s = str(r, a); s != null && s == v }
    case In(a, vs) => { val s = str(r, a); s != null && vs.contains(s) }
    case StringStartsWith(a, p) => { val s = str(r, a); s != null && s.startsWith(p) }
    case StringEndsWith(a, p) => { val s = str(r, a); s != null && s.endsWith(p) }
    case StringContains(a, p) => { val s = str(r, a); s != null && s.contains(p) }
    case IsNotNull(a) => str(r, a) != null
    case IsNull(a) => str(r, a) == null
    case SAnd(l, r2) => eval(l, r) && eval(r2, r)
    case SOr(l, r2) => eval(l, r) || eval(r2, r)
    case SNot(c) => !eval(c, r)
    case other => throw new IllegalArgumentException(s"unsupported pushed filter: $other")
  }
}

private[data] class WarcScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = Warc.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(WarcFilters.supported)
    filters // ALL filters stay post-scan residuals (reader eval = I/O saving only)
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new WarcScan(options, required, pushed)
}

private[data] class WarcScan(options: CaseInsensitiveStringMap,
                             required: StructType,
                             pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Size estimate from the file listing, so Catalyst can make broadcast
    * decisions for WARC-sourced relations (without this a V2 scan defaults
    * to "unknown = huge" and a 10 MB crawl extract never broadcasts).
    * Gzip files are scaled by a conservative 4× decompression factor;
    * pruning `content` shrinks the estimate to the header fraction.
    */
  override def estimateStatistics(): Statistics = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val bytes = WarcTable.listFiles(options).map { p =>
      val path = new Path(p)
      val len = path.getFileSystem(conf).getFileStatus(path).getLen
      if (p.endsWith(".gz")) len * 4 else len
    }.sum
    val fraction = if (required.fieldNames.contains("content")) 1.0 else 0.1
    val est = math.max(1L, (bytes * fraction).toLong)
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(est)
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }
  override def description(): String =
    s"warc files=${WarcTable.listFiles(options).size} " +
      s"schema=${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    WarcTable.listFiles(options).map(WarcInputPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required.fieldNames, pushed)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(options, required.fieldNames, pushed)
}

/** Offset for the WARC stream: the snapshot of files seen so far. A batch
  * is `end.files -- start.files` — each file processed exactly once, in
  * whole-file units (the same non-splittable contract as the batch scan).
  * The snapshot lives in the streaming checkpoint; at O(10^4)+ files per
  * stream, rotate the input directory (crawls ship day-partitioned dirs)
  * the same way Spark's own FileStreamSource expects log compaction.
  */
private[data] case class WarcOffset(files: Seq[String]) extends Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(files.toArray)
  }
}

/** `spark.readStream.format("warc").load(dir)` — continuous crawl ingest:
  * each micro-batch picks up the `.warc(.gz)` files that appeared since
  * the last one (one task per new file; pruning and metadata-filter
  * pushdown apply exactly as in the batch scan). Exactly-once per file via
  * the checkpointed offset snapshot; files must be immutable once visible
  * (write-then-rename, the standard crawl-dump contract).
  *
  * `option("maxFilesPerTrigger", n)` bounds a micro-batch to n files —
  * without it, restarting against a backlog (a day of crawl dumps) turns
  * the whole backlog into ONE batch whose failure loses all its work;
  * with it, progress commits every n files.
  */
private[data] class WarcMicroBatchStream(options: CaseInsensitiveStringMap,
                                         fields: Array[String],
                                         pushed: Array[Filter])
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = WarcOffset(Seq.empty)
  override def latestOffset(): Offset = WarcOffset(WarcTable.listFiles(options))
  override def getDefaultReadLimit: ReadLimit = {
    val v = options.get("maxFilesPerTrigger")
    if (v == null) ReadLimit.allAvailable() else ReadLimit.maxFiles(v.toInt)
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[WarcOffset].files.toSet
    val fresh = WarcTable.listFiles(options).filterNot(seen).sorted
    val capped = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    WarcOffset((seen.toSeq ++ capped).sorted)
  }
  override def deserializeOffset(json: String): Offset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    WarcOffset(mapper.readValue(json, classOf[Array[String]]).toSeq)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcOffset].files.toSet
    end.asInstanceOf[WarcOffset].files.filterNot(seen).sorted
      .map(WarcInputPartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(fields, pushed)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[data] case class WarcInputPartition(path: String) extends InputPartition

private[data] case class WarcReaderFactory(fields: Array[String],
                                           pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].path,
      fields, pushed)
}

/** Streams one WARC file; builds only the pruned columns. Uses the default
  * Hadoop `Configuration` executor-side (classpath `core-site.xml`) — the
  * local/HDFS cases a crawl reader meets; an object-store with custom conf
  * belongs behind a mounted config, not per-query options.
  */
private[data] class WarcPartitionReader(path: String, fields: Array[String],
                                        pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val needContent = fields.contains("content")
  private val hPath = new Path(path)
  private val in = new BufferedInputStream(
    hPath.getFileSystem(new Configuration()).open(hPath), 1 << 16)
  private val keep: Warc.WarcRecord => Boolean =
    if (pushed.isEmpty) _ => true
    else r => pushed.forall(WarcFilters.eval(_, r))
  private val it = Warc.records(in, gzipped = path.endsWith(".gz"),
    skipContent = !needContent, keep = keep)
  private var row: InternalRow = _

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def tsMicros(iso: String): Any =
    if (iso == null) null
    else try {
      val inst = Instant.parse(iso)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    } catch { case _: java.time.format.DateTimeParseException => null }

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val r = it.next()
    val out = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      val v: Any = fields(i) match {
        case "url" => utf8(r.targetUri)
        case "warc_type" => utf8(r.warcType)
        case "warc_date" => tsMicros(r.warcDate)
        case "record_id" => utf8(r.recordId)
        case "content_type" => utf8(r.contentType)
        case "content_length" => r.contentLength
        case "headers" => new ArrayBasedMapData(
          new GenericArrayData(r.headers.map(h => utf8(h._1)).toArray[Any]),
          new GenericArrayData(r.headers.map(h => utf8(h._2)).toArray[Any]))
        case "content" => r.content
        case other => throw new IllegalArgumentException(s"unknown warc column $other")
      }
      out.update(i, v)
      i += 1
    }
    row = out
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
