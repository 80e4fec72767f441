package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 reader for WARC web-archive files (ISO 28500 — the container
  * format web crawls ship in; Common Crawl's WARC/WET layout):
  * `spark.read.format("warc").option("path", dir).load()` → one row per
  * WARC record with the headers lifted to columns, the HTTP envelope of
  * `application/http` blocks parsed off, and the payload as binary.
  *
  * Scale shape, the part that matters at 100 TB of crawl:
  *  - plain `.warc` files are SPLITTABLE: files are planned in
  *    `maxPartitionBytes` chunks and each task aligns to the first
  *    record boundary inside its split by sync-scanning for a
  *    `WARC/...` version line that (a) parses as a full header block
  *    and (b) CHAINS — the record it describes ends at EOF or at
  *    another parseable record. A payload that merely CONTAINS WARC
  *    bytes (a crawl of a page about WARC) cannot satisfy the chain
  *    test without being a well-formed record stream, so false syncs
  *    don't survive (spec-pinned with a planted trap payload);
  *  - `.warc.gz` files SPLIT TOO when the writer's member-offset
  *    sidecar (`.name.idx`, see [[WarcGzIndex]]) sits beside them:
  *    splits own contiguous member ranges (the plain reader's ownership
  *    protocol at member granularity) and seek straight to their first
  *    member. Without a sidecar (third-party archives) gzip members are
  *    not seekable, so the FILE is the unit of parallelism — exactly
  *    the layout crawls publish (tens of thousands of ~1 GiB files).
  *    Multi-member streams (the record-per-member convention that makes
  *    `.warc.gz` appendable) decode transparently either way;
  *  - column pruning is real IO: a projection without `payload` /
  *    `http_*` SEEKS past every content block and reads header bytes
  *    only (`explain` shows `read=headers-only`) — a URL/type listing
  *    over a 100 TB crawl touches well under 1% of the bytes;
  *  - `warc_type` equality and `target_uri` prefix filters push down
  *    as IO skips (non-matching records never read their block; the
  *    filters stay residual so correctness never rides the skip).
  *
  * Truncated tails (a crawler died mid-record) drop the partial record
  * and end the scan instead of failing the job — the archive-reader
  * convention (warcio does the same); malformed bytes at a position the
  * reader ALIGNED to (not a tail) fail loudly with file@offset. */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(MarcDataSource.resolvePaths(properties.asScala.toMap))
}

object WarcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** Header-block byte caps: a WARC named-field block beyond 64 KiB or
    * an HTTP header block beyond 64 KiB is corruption, not data (the
    * spec puts no limit, but crawlers cap around 8-16 KiB). */
  val MaxWarcHeaderBytes: Int = 64 * 1024
  val MaxHttpHeaderBytes: Int = 64 * 1024
  /** Window capacity for the splittable plain reader: header cap plus
    * slack; blocks are SEEKED past, never windowed, so this bounds task
    * memory regardless of payload size. */
  private[sources] val WindowBytes: Int = 2 * (MaxWarcHeaderBytes + 4096)
  /** Records a sync-scan candidate must chain through before the
    * position is trusted as a record boundary (see `chainValidAt`). */
  private[sources] val ChainHops: Int = 3
}

final class WarcTable(paths: Seq[String])
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  /** Same provenance contract as the MARC source: (file, byte offset)
    * — for `.warc.gz` the offset is in the UNCOMPRESSED stream (gzip
    * offsets would need the member index the format doesn't carry). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_input_file"
      override def dataType(): DataType = StringType
      override def comment(): String = "input file path"
    },
    new MetadataColumn {
      override def name(): String = "_record_offset"
      override def dataType(): DataType = LongType
      override def comment(): String =
        "record byte offset (uncompressed stream offset for .warc.gz)"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths,
      Option(options.get("maxfilespertrigger")).map(_.toInt))
}

/** Header-only record predicate: evaluable before any block byte is
  * read, so a miss seeks straight to the next record. */
final case class WarcPred(types: Option[Set[String]],
                          uriPrefixes: Seq[String]) extends Serializable {
  def matches(warcType: String, uri: String): Boolean =
    types.forall(_.contains(warcType)) &&
      (uriPrefixes.isEmpty || (uri != null && uriPrefixes.forall(uri.startsWith)))
  def isEmpty: Boolean = types.isEmpty && uriPrefixes.isEmpty
}

final class WarcScanBuilder(paths: Seq[String],
                            maxFilesPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}
  private var required: StructType = WarcDataSource.schema
  private var accepted: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accepted filters skip block IO but are returned residual — Spark
    * re-evaluates them post-scan, so pushdown can only skip bytes. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case EqualTo("warc_type", _: String) => true
      case In("warc_type", vs) => vs.forall(_.isInstanceOf[String])
      case StringStartsWith("target_uri", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan = {
    val eqs = accepted.collect {
      case EqualTo("warc_type", v: String) => Set(v)
      case In("warc_type", vs) => vs.map(_.asInstanceOf[String]).toSet
    }
    val pred = WarcPred(eqs.reduceOption(_ intersect _),
      accepted.collect { case StringStartsWith("target_uri", p) => p }.toSeq)
    new WarcScan(paths, required, pred, maxFilesPerTrigger)
  }
}

/** For `indexed` gz partitions, `start`/`length` are COMPRESSED byte
  * ranges; ownership is member-granular (see WarcGzPartitionReader). */
final case class WarcInputPartition(path: String, start: Long, length: Long,
                                    gzipped: Boolean,
                                    indexed: Boolean = false) extends InputPartition

final class WarcScan(paths: Seq[String], required: StructType,
                     pred: WarcPred = WarcPred(None, Nil),
                     maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String = {
    val needBlock = required.fieldNames.exists(n =>
      n == "payload" || n == "http_status" || n == "http_content_type")
    val mode = if (needBlock) "read=full" else "read=headers-only"
    val filt = if (pred.isEmpty) "" else s" recfilter=$pred"
    s"warc(${paths.mkString(",")}) $mode$filt"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (files, sidecars) = WarcScan.listFilesWithSidecars(paths)
    WarcScan.partitionsFor(files, Some(sidecars))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // session conf captured DRIVER-side: executors have no active session
    // on a real cluster, and spark.hadoop.* (object-store credentials,
    // custom fs impls) must reach the readers (same shape as the
    // WebDataset source)
    new WarcReaderFactory(required, pred, new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf()))

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WarcMicroBatchStream(paths, required, pred, checkpointLocation,
      maxFilesPerTrigger)
}

object WarcScan {

  /** (path, length) of every data file under `paths` (dirs expand one
    * level; Spark-metadata `_`/`.` names skip), deterministic order. */
  def listFiles(paths: Seq[String]): Seq[(String, Long)] =
    listFilesWithSidecars(paths)._1

  /** Data files PLUS the gz member-index sidecars seen in the SAME
    * listing — planning must not pay one `exists` RPC per gz file when
    * the directory listing already named every sidecar. An explicitly
    * named single FILE (not a directory) gets one sidecar probe, since
    * its siblings were never listed. */
  def listFilesWithSidecars(paths: Seq[String]): (Seq[(String, Long)], Set[String]) = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val data = Seq.newBuilder[(String, Long)]
    val side = Set.newBuilder[String]
    paths.foreach { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      // glob paths expand first (`crawl-out/round_*` — the shape
      // `curate.stream` watches when Crawl.run lands one WARC dir per
      // round); an as-yet-matchless glob lists empty rather than
      // throwing, so a stream can start BEFORE the crawl's first round
      // commits and admit new round dirs as they appear
      val roots: Seq[org.apache.hadoop.fs.FileStatus] =
        if (p.exists(c => "*?[{".contains(c)))
          Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
        else Seq(fs.getFileStatus(path))
      roots.foreach { root =>
        if (root.isDirectory) {
          fs.listStatus(root.getPath).foreach { s =>
            val n = s.getPath.getName
            if (s.isFile) {
              if (n.startsWith("_") || n.startsWith(".")) {
                if (n.endsWith(".idx")) side += s.getPath.toString
              } else data += ((s.getPath.toString, s.getLen))
            }
          }
        } else {
          data += ((root.getPath.toString, root.getLen))
          val idx = WarcGzIndex.sidecarPath(root.getPath)
          if (root.getPath.getName.endsWith(".gz") && fs.exists(idx))
            side += idx.toString
        }
      }
    }
    (data.result().sortBy(_._1), side.result())
  }

  /** The one partition-planning rule, shared by the batch scan and the
    * streaming per-batch plan: plain `.warc` splits in
    * `maxPartitionBytes` chunks; `.warc.gz` splits the same way WHEN its
    * member-offset sidecar exists (our writer always emits one —
    * [[WarcGzIndex]]; ownership is member-granular, resolved reader-side
    * from the tiny sidecar, so planning reads NO index bytes), else one
    * partition per file (gzip members aren't seekable without an index —
    * the file is the parallelism unit, as in every published crawl
    * layout). */
  def partitionsFor(files: Seq[(String, Long)]): Array[InputPartition] =
    partitionsFor(files, None)

  /** `sidecars = Some(set)`: membership check against sidecar paths
    * captured from the listing (the batch scan). `None`: one existence
    * probe per gz file (the streaming per-batch plan, whose file count
    * the trigger cap bounds). */
  def partitionsFor(files: Seq[(String, Long)],
                    sidecars: Option[Set[String]]): Array[InputPartition] = {
    val maxSplit = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    val conf = SparkSession.active.sessionState.newHadoopConf()
    def ranges(p: String, len: Long, gz: Boolean, idx: Boolean) =
      (0L until math.max(len, 1L) by maxSplit).map { off =>
        WarcInputPartition(p, off, math.min(maxSplit, len - off),
          gzipped = gz, indexed = idx)
      }
    files.flatMap { case (p, len) =>
      if (p.endsWith(".gz")) {
        val path = new Path(p)
        val idxPath = WarcGzIndex.sidecarPath(path)
        val hasIdx = sidecars match {
          case Some(s) => s.contains(idxPath.toString)
          case None => path.getFileSystem(conf).exists(idxPath)
        }
        if (hasIdx) ranges(p, len, gz = true, idx = true)
        else Seq(WarcInputPartition(p, 0L, len, gzipped = true))
      } else ranges(p, len, gz = false, idx = false)
    }.toArray
  }
}

/** Streaming offset = number of admitted file BATCHES. The batch→files
  * mapping lives in a metadata log under the checkpoint (one atomic
  * file per batch index recording `length\tpath` lines), so a replayed
  * batch after restart reads the IDENTICAL file set — the same
  * mechanism Spark's built-in FileStreamSource uses. */
final case class WarcFilesOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

/** Watch WARC directories as a micro-batch stream: each trigger admits
  * the data files not seen before (path-diff, not mtime watermark — a
  * late file with an old timestamp still admits), caps admission at
  * `maxFilesPerTrigger`, and logs the batch's file list atomically
  * under the checkpoint. Restart: the logs rebuild the seen-set and the
  * latest batch index, and a planned-but-uncommitted batch replays
  * byte-identically from its log. `Trigger.AvailableNow` snapshots the
  * pending file set at prepare time and drains it in capped batches —
  * the cron-less "process today's crawl drop then exit" mode. */
final class WarcMicroBatchStream(paths: Seq[String], required: StructType,
                                 pred: WarcPred, checkpointLocation: String,
                                 maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val hconf = SparkSession.active.sessionState.newHadoopConf()
  private val logDir = new Path(checkpointLocation, "graft-warc-files")
  private val fs = logDir.getFileSystem(hconf)

  private val seen = scala.collection.mutable.Set.empty[String]
  private var latestBatch: Long = 0L
  // AvailableNow: the pending snapshot taken at prepare time
  private var availableNowPending: Option[List[(String, Long)]] = None

  // rebuild state from the metadata log (restart path)
  if (fs.exists(logDir)) {
    fs.listStatus(logDir).foreach { st =>
      val name = st.getPath.getName
      if (!name.startsWith(".")) {
        val idx = name.toLong
        if (idx > latestBatch) latestBatch = idx
        readLog(idx).foreach { case (p, _) => seen += p }
      }
    }
  }

  private def readLog(idx: Long): Seq[(String, Long)] = {
    val in = fs.open(new Path(logDir, idx.toString))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.map {
      line =>
        val tab = line.indexOf('\t')
        (line.substring(tab + 1), line.substring(0, tab).toLong)
    } finally in.close()
  }

  private def writeLog(idx: Long, files: Seq[(String, Long)]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-$idx")
    val out = fs.create(tmp, true)
    try out.write(files.map { case (p, len) => s"$len\t$p\n" }
      .mkString.getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(logDir, idx.toString)))
      throw new java.io.IOException(
        s"warc stream: cannot commit metadata log $logDir/$idx")
  }

  private def cap: Int = maxFilesPerTrigger.getOrElse(Int.MaxValue)

  /** Per-trigger admission cap from the ReadLimit Spark actually passed
    * (AvailableNow wrapping, admission-control overrides) — NOT the
    * captured constructor option; they coincide today only because
    * `getDefaultReadLimit` derives from the same option. Limit kinds a
    * file source can't honor (row-based) fall back to the option cap. */
  private def capFor(limit: ReadLimit): Int = limit match {
    case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
      m.maxFiles()
    case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
      Int.MaxValue
    case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
      val caps = c.getReadLimits.map(capFor)
      if (caps.isEmpty) cap else caps.min
    case _ => cap
  }

  private def discoverNew(): List[(String, Long)] =
    WarcScan.listFiles(paths).filterNot(f => seen.contains(f._1)).toList

  private def admit(candidates: List[(String, Long)], cap: Int): Offset = {
    val batchFiles = candidates.take(cap)
    if (batchFiles.isEmpty) return WarcFilesOffset(latestBatch)
    latestBatch += 1
    writeLog(latestBatch, batchFiles)
    batchFiles.foreach { case (p, _) => seen += p }
    WarcFilesOffset(latestBatch)
  }

  override def initialOffset(): Offset = WarcFilesOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowPending = Some(discoverNew())
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    synchronized {
      val c = capFor(limit)
      availableNowPending match {
        case Some(pending) =>
          val off = admit(pending, c)
          availableNowPending = Some(pending.drop(c))
          off
        case None => admit(discoverNew(), c)
      }
    }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = synchronized {
    WarcFilesOffset(latestBatch)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[WarcFilesOffset].batch
      val e = end.asInstanceOf[WarcFilesOffset].batch
      val files = ((s + 1) to e).flatMap(readLog)
      WarcScan.partitionsFor(files)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, pred, new SerializableHadoopConf(hconf))

  override def deserializeOffset(json: String): Offset =
    WarcFilesOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final class WarcReaderFactory(required: StructType, pred: WarcPred,
                              conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcInputPartition]
    if (p.gzipped) new WarcGzPartitionReader(p, required, pred, conf)
    else new WarcSplitPartitionReader(p, required, pred, conf)
  }
}

/** Parsed WARC named-field block. Field names are lowercased (the spec
  * says names are case-insensitive). `headerLen` spans the version line
  * through the blank line, so `recordStart + headerLen` is byte 0 of
  * the content block. */
private[sources] final case class WarcHeader(fields: Map[String, String],
                                             headerLen: Int) {
  def apply(name: String): String = fields.getOrElse(name, null)
  def contentLength: Long = {
    val v = fields.getOrElse("content-length", null)
    if (v == null) -1L else try v.toLong catch { case _: NumberFormatException => -1L }
  }
}

private[sources] object Warc {
  /** Parses one WARC header block at `off`. Returns null when the bytes
    * there are not a well-formed header (no `WARC/` magic, no blank-line
    * terminator within the cap, or a malformed field line) — the sync
    * scan uses null as "not a record here". Tolerates bare-LF line
    * endings (the spec mandates CRLF; lenient readers accept LF) and
    * folded continuation lines. */
  def parseHeader(buf: Array[Byte], off: Int, end0: Int): WarcHeader = {
    val end = math.min(end0, off + WarcDataSource.MaxWarcHeaderBytes)
    if (off + 8 >= end) return null
    if (buf(off) != 'W' || buf(off + 1) != 'A' || buf(off + 2) != 'R' ||
        buf(off + 3) != 'C' || buf(off + 4) != '/') return null
    var p = off + 5
    // version chars up to EOL: digits and dots only (WARC/1.0, /1.1, /0.18)
    while (p < end && buf(p) != '\r' && buf(p) != '\n') {
      val c = buf(p)
      if (!((c >= '0' && c <= '9') || c == '.')) return null
      p += 1
    }
    if (p == off + 5) return null
    val fields = Map.newBuilder[String, String]
    var lastName: String = null
    var lastValue: String = null
    var done = false
    while (!done) {
      // consume the EOL of the previous line
      if (p < end && buf(p) == '\r') p += 1
      if (p >= end || buf(p) != '\n') return null
      p += 1
      if (p >= end) return null
      if (buf(p) == '\r' || buf(p) == '\n') {
        // blank line: end of header block
        if (buf(p) == '\r') p += 1
        if (p >= end || buf(p) != '\n') return null
        p += 1
        done = true
      } else if (buf(p) == ' ' || buf(p) == '\t') {
        // folded continuation of the previous field value
        if (lastName == null) return null
        val vs = p
        while (p < end && buf(p) != '\r' && buf(p) != '\n') p += 1
        if (p >= end) return null
        lastValue = lastValue + " " +
          new String(buf, vs, p - vs, java.nio.charset.StandardCharsets.UTF_8).trim
      } else {
        if (lastName != null) fields += lastName -> lastValue
        val ns = p
        while (p < end && buf(p) != ':' && buf(p) != '\r' && buf(p) != '\n') p += 1
        if (p >= end || buf(p) != ':') return null
        val name = new String(buf, ns, p - ns,
          java.nio.charset.StandardCharsets.UTF_8).trim.toLowerCase(java.util.Locale.ROOT)
        if (name.isEmpty) return null
        p += 1
        val vs = p
        while (p < end && buf(p) != '\r' && buf(p) != '\n') p += 1
        if (p >= end) return null
        lastName = name
        lastValue = new String(buf, vs, p - vs,
          java.nio.charset.StandardCharsets.UTF_8).trim
      }
    }
    if (lastName != null) fields += lastName -> lastValue
    val h = WarcHeader(fields.result(), p - off)
    if (h.contentLength < 0 || h("warc-type") == null) null else h
  }

  /** Is `[off, end)` a valid PREFIX of a WARC header block — bytes that
    * would have parsed had EOF not clipped them? Used to distinguish a
    * crawler dying mid-header (valid prefix → truncated tail) from
    * arbitrary bytes that merely sit near EOF (junk → not a tail). A
    * complete, blank-line-terminated block is NOT a prefix — if the full
    * block was available and `parseHeader` still failed, the failure was
    * real (missing mandatory fields, malformed lines), not truncation. */
  def headerPrefixValid(buf: Array[Byte], off: Int, end0: Int): Boolean = {
    val end = math.min(end0, off + WarcDataSource.MaxWarcHeaderBytes)
    if (end0 > off + WarcDataSource.MaxWarcHeaderBytes) return false // over cap: unterminated
    var p = off
    // magic "WARC/" for as many bytes as exist
    val magic = Array[Byte]('W', 'A', 'R', 'C', '/')
    var m = 0
    while (m < 5) {
      if (p >= end) return true
      if (buf(p) != magic(m)) return false
      p += 1; m += 1
    }
    // version: digits/dots, non-empty once an EOL is reached
    val vs = p
    while (p < end && buf(p) != '\r' && buf(p) != '\n') {
      val c = buf(p)
      if (!((c >= '0' && c <= '9') || c == '.')) return false
      p += 1
    }
    if (p < end && p == vs) return false // EOL right after "WARC/": no version
    var sawField = false
    while (true) {
      // EOL of the previous line (tolerate bare LF like parseHeader)
      if (p < end && buf(p) == '\r') p += 1
      if (p >= end) return true
      if (buf(p) != '\n') return false
      p += 1
      if (p >= end) return true
      if (buf(p) == '\r' || buf(p) == '\n') {
        // blank line: the full block WAS available — not a prefix,
        // unless EOF clipped the blank line's own terminator
        if (buf(p) == '\r') p += 1
        if (p >= end) return true
        return false
      } else if (buf(p) == ' ' || buf(p) == '\t') {
        if (!sawField) return false // folded line with nothing to fold into
        while (p < end && buf(p) != '\r' && buf(p) != '\n') p += 1
      } else {
        val ns = p
        while (p < end && buf(p) != ':' && buf(p) != '\r' && buf(p) != '\n') p += 1
        if (p >= end) return true // EOF mid-name
        if (buf(p) != ':') return false
        if (p == ns) return false // empty name
        p += 1
        sawField = true
        while (p < end && buf(p) != '\r' && buf(p) != '\n') p += 1
      }
    }
    false // unreachable
  }

  /** Parses the HTTP response/request envelope at the head of a block:
    * (status, content-type, body offset). A block that doesn't start
    * with `HTTP/` yields (-1, null, 0) — the whole block is payload. */
  def parseHttp(buf: Array[Byte], off: Int, end0: Int): (Int, String, Int) = {
    val end = math.min(end0, off + WarcDataSource.MaxHttpHeaderBytes)
    if (off + 5 > end || buf(off) != 'H' || buf(off + 1) != 'T' ||
        buf(off + 2) != 'T' || buf(off + 3) != 'P' || buf(off + 4) != '/')
      return (-1, null, 0)
    var p = off
    // status line: HTTP/x.y SP status ...
    while (p < end && buf(p) != ' ' && buf(p) != '\r' && buf(p) != '\n') p += 1
    var status = -1
    if (p < end && buf(p) == ' ') {
      p += 1
      var s = 0
      var digits = 0
      while (p < end && buf(p) >= '0' && buf(p) <= '9') {
        s = s * 10 + (buf(p) - '0'); digits += 1; p += 1
      }
      if (digits == 3) status = s
    }
    while (p < end && buf(p) != '\n') p += 1
    if (p >= end) return (-1, null, 0) // status line never ended: not HTTP
    p += 1
    var contentType: String = null
    var bodyOff = -1
    while (bodyOff < 0 && p < end) {
      if (buf(p) == '\r' || buf(p) == '\n') {
        if (buf(p) == '\r') p += 1
        if (p < end && buf(p) == '\n') bodyOff = p + 1 - off
        else return (-1, null, 0)
      } else {
        val ns = p
        while (p < end && buf(p) != ':' && buf(p) != '\n') p += 1
        if (p >= end || buf(p) != ':') { // malformed header line: bail
          while (p < end && buf(p) != '\n') p += 1
          if (p >= end) return (-1, null, 0)
          p += 1
        } else {
          val name = new String(buf, ns, p - ns,
            java.nio.charset.StandardCharsets.UTF_8).trim
          p += 1
          val vs = p
          while (p < end && buf(p) != '\r' && buf(p) != '\n') p += 1
          if (name.equalsIgnoreCase("content-type") && contentType == null)
            contentType = new String(buf, vs, p - vs,
              java.nio.charset.StandardCharsets.UTF_8).trim
          if (p < end && buf(p) == '\r') p += 1
          if (p >= end || buf(p) != '\n') return (-1, null, 0)
          p += 1
        }
      }
    }
    // headers ran past the cap without a blank line: treat as opaque
    if (bodyOff < 0) (-1, null, 0) else (status, contentType, bodyOff)
  }
}

/** Shared row assembly for both readers. */
private[sources] abstract class WarcReaderBase(part: WarcInputPartition,
                                               required: StructType)
    extends PartitionReader[InternalRow] {
  protected val needPayload: Boolean = required.fieldNames.contains("payload")
  protected val needHttp: Boolean = required.fieldNames.exists(n =>
    n == "http_status" || n == "http_content_type") || needPayload
  protected val needBlock: Boolean = needPayload || needHttp
  private val pathUtf8 = UTF8String.fromString(part.path)

  protected var current: InternalRow = _

  /** (status, contentType, payload) from a block prefix + optional body;
    * `httpEnvelope` = record Content-Type says application/http. */
  protected def assemble(h: WarcHeader, offset: Long, status: Int,
                         httpContentType: String, payload: Array[Byte]): Unit = {
    val values = new Array[Any](required.fields.length)
    var i = 0
    for (f <- required.fields) {
      values(i) = f.name match {
        case "record_id" =>
          val v = h("warc-record-id"); if (v == null) null else UTF8String.fromString(v)
        case "warc_type" => UTF8String.fromString(h("warc-type"))
        case "target_uri" =>
          val v = h("warc-target-uri"); if (v == null) null else UTF8String.fromString(v)
        case "warc_date" =>
          val v = h("warc-date"); if (v == null) null else UTF8String.fromString(v)
        case "content_type" =>
          val v = h("content-type"); if (v == null) null else UTF8String.fromString(v)
        case "content_length" => h.contentLength
        case "http_status" => if (status < 0) null else status
        case "http_content_type" =>
          if (httpContentType == null) null else UTF8String.fromString(httpContentType)
        case "payload" => payload
        case "_input_file" => pathUtf8
        case "_record_offset" => offset
      }
      i += 1
    }
    current = new GenericInternalRow(values)
  }

  override def get(): InternalRow = current
}

/** Splittable reader for plain `.warc`: bounded sliding window, block
  * bytes seeked past unless required, sync-scan alignment with chain
  * validation. Ownership protocol is the MARC reader's: a record
  * starting at absolute f belongs to the split with
  * `start < f <= start + length`, and the offset-0 reader owns from
  * byte 0 — the intervals partition the file. */
final class WarcSplitPartitionReader(part: WarcInputPartition,
                                     required: StructType, pred: WarcPred,
                                     serConf: SerializableHadoopConf =
                                       new SerializableHadoopConf(
                                         SparkSession.active.sessionState.newHadoopConf()))
    extends WarcReaderBase(part, required) {

  private val conf = serConf.value
  private val fsPath = new Path(part.path)
  private val fs = fsPath.getFileSystem(conf)
  private val fileLen = fs.getFileStatus(fsPath).getLen
  private val in = fs.open(fsPath)
  private val w = new MarcFileWindow(in, fileLen, part.start,
    WarcDataSource.WindowBytes)
  private val limitAbs = part.start + part.length

  /** Positioned read of up to `len0` bytes at `abs` (clipped at EOF) —
    * alignment uses these instead of the record loop's forward-only
    * window, because chain validation hops PAST candidate positions
    * and the scan then resumes just after them (a window rewind). */
  private def readAt(abs: Long, len0: Int): Array[Byte] = {
    val len = math.max(math.min(len0.toLong, fileLen - abs), 0L).toInt
    val b = new Array[Byte](len)
    if (len > 0) in.readFully(abs, b, 0, len)
    b
  }

  private def headerAt(p: Long): WarcHeader = {
    val b = readAt(p, WarcDataSource.MaxWarcHeaderBytes)
    Warc.parseHeader(b, 0, b.length)
  }

  /** Is there a chain-valid record at `p`? The header must parse AND
    * the records it starts must CHAIN: each block ends at EOF or at
    * another parseable header, followed for up to [[WarcDataSource.ChainHops]]
    * hops. Single-hop validation is spoofable by a payload that embeds
    * one well-formed record (a crawl of a .warc file); a multi-hop
    * chain additionally requires the embedded stream to line up with
    * the real record grid for N records in a row — each extra hop
    * multiplies the coincidence a false sync needs. (No finite
    * validation is airtight against a payload that embeds a well-formed
    * archive whose end aligns exactly with its carrier's block end;
    * warcio's seek-based readers share the limitation.) */
  private def chainValidAt(p0: Long): Boolean = {
    var p = p0
    var hops = 0
    while (hops < WarcDataSource.ChainHops) {
      val h = headerAt(p)
      if (h == null) {
        // A hop whose header fails to parse solely because EOF clipped
        // it is the file's truncated TAIL (a crawler died mid-header) —
        // it ENDS the chain rather than breaking it: the complete
        // records already hopped through are real, and dropping them
        // would exceed the documented "drop only the partial record"
        // convention. "Solely because clipped" is checked precisely:
        // the remaining bytes must be a valid header PREFIX — junk that
        // merely sits near EOF (a trap payload's run-off) is not. At
        // hops == 0 the candidate ITSELF is the clipped partial — not a
        // sync point.
        return hops > 0 && clippedTailAt(p)
      }
      var q = p + h.headerLen + h.contentLength
      if (q >= fileLen) return true
      // tolerate the two record-separator CRLFs (or bare LFs)
      val sep = readAt(q, 4)
      var i = 0
      while (i < sep.length && (sep(i) == '\r' || sep(i) == '\n')) i += 1
      q += i
      if (q >= fileLen) return true
      p = q
      hops += 1
    }
    headerAt(p) != null || clippedTailAt(p)
  }

  /** Is `p` the start of an EOF-clipped partial header (a truncated
    * tail)? Requires the clip to be real (less than a full header window
    * remains) AND the remaining bytes to be a valid header prefix. */
  private def clippedTailAt(p: Long): Boolean = {
    if (fileLen - p >= WarcDataSource.MaxWarcHeaderBytes) return false
    val rest = readAt(p, WarcDataSource.MaxWarcHeaderBytes)
    Warc.headerPrefixValid(rest, 0, rest.length)
  }

  /** First chain-valid record start in [from, scanEnd), or -1. */
  private def firstChainValidFrom(from: Long, scanEnd: Long): Long = {
    var p = from
    var found = -1L
    while (found < 0 && p < scanEnd) {
      val chunk = readAt(p, 1 << 20)
      if (chunk.isEmpty) p = scanEnd
      else {
        val n = chunk.length
        var i = 0
        while (found < 0 && i < n && p + i < scanEnd) {
          // cheap in-buffer "WARC/" precheck before paying a
          // positioned-read header parse (chunk-straddling candidates
          // fall through to the full check)
          val maybe = chunk(i) == 'W' &&
            (i + 5 > n || (chunk(i + 1) == 'A' && chunk(i + 2) == 'R' &&
              chunk(i + 3) == 'C' && chunk(i + 4) == '/'))
          if (maybe && chainValidAt(p + i)) found = p + i
          i += 1
        }
        if (found < 0) p += n
      }
    }
    found
  }

  // alignment: first chain-valid record start strictly inside the split
  // (ownership is start < f <= start+length, so scan begins at start+1
  // and a candidate past limitAbs means this split owns nothing)
  private var cur: Long = {
    if (part.start == 0) 0L
    else {
      val found = firstChainValidFrom(part.start + 1,
        math.min(limitAbs + 1, fileLen))
      if (found < 0) fileLen else found
    }
  }
  private var done = false

  override def next(): Boolean = {
    while (!done) {
      // skip inter-record CRLFs
      while (cur < fileLen && { val b = w.byteAt(cur); b == '\r' || b == '\n' })
        cur += 1
      if (cur >= fileLen || cur > limitAbs) { done = true; w.close(); return false }
      val recordStart = cur
      val rel = w.ensure(cur, WarcDataSource.MaxWarcHeaderBytes)
      val h = Warc.parseHeader(w.exposed, rel, w.exposed.length)
      if (h == null) {
        // Distinguish a truncated TAIL from aligned corruption. With
        // the full header cap available, unparseable bytes at an
        // aligned position are corruption — fail loudly.
        if (fileLen - recordStart >= WarcDataSource.MaxWarcHeaderBytes)
          throw new java.io.IOException(
            s"${part.path}@$recordStart: malformed WARC header")
        // EOF clipped the header window: usually a record a crawler
        // died writing (drop the partial, end the scan — warcio's
        // convention). But corruption that merely SITS near EOF is
        // distinguishable and must stay loud: a chain-valid record
        // begins later in the remaining bytes, or the file never
        // parsed as WARC at all — neither is a truncated tail.
        val resync = firstChainValidFrom(recordStart + 1, fileLen)
        if (resync >= 0)
          throw new java.io.IOException(
            s"${part.path}@$recordStart: malformed WARC header with " +
              s"valid records after it (next at $resync) — corruption, " +
              "not a truncated tail")
        if (recordStart == 0L && part.start == 0L) {
          // a file whose very first record is the clipped one is still
          // a WARC a crawler died writing IF it opens with a version
          // line ("WARC/"); anything else is simply not a WARC file
          val head = readAt(0L, 5)
          val startsWarc = head.length == 5 && head(0) == 'W' &&
            head(1) == 'A' && head(2) == 'R' && head(3) == 'C' &&
            head(4) == '/'
          if (!startsWarc)
            throw new java.io.IOException(
              s"${part.path}: not a WARC file (no record parses at offset 0)")
        }
        done = true; w.close(); return false
      }
      val blockStart = recordStart + h.headerLen
      cur = blockStart + h.contentLength
      if (cur > fileLen) {
        // truncated tail: drop the partial record, end of scan
        done = true; w.close(); return false
      }
      val keep = pred.isEmpty || pred.matches(h("warc-type"), h("warc-target-uri"))
      if (keep) {
        var status = -1
        var httpCt: String = null
        var payload: Array[Byte] = if (needPayload) Array.emptyByteArray else null
        if (needBlock && h.contentLength > 0) {
          val ct = h("content-type")
          val isHttp = ct != null &&
            ct.toLowerCase(java.util.Locale.ROOT).startsWith("application/http")
          var bodyOff = 0
          if (isHttp) {
            val want = math.min(h.contentLength,
              WarcDataSource.MaxHttpHeaderBytes.toLong).toInt
            val brel = w.ensure(blockStart, want)
            val (st, hct, bo) = Warc.parseHttp(w.exposed, brel,
              math.min(brel + want, w.exposed.length))
            status = st; httpCt = hct; bodyOff = bo
          }
          if (needPayload) {
            val bodyLen = h.contentLength - bodyOff
            require(bodyLen <= Int.MaxValue,
              s"${part.path}@$recordStart: ${bodyLen} B payload exceeds a JVM array")
            val b = new Array[Byte](bodyLen.toInt)
            in.readFully(blockStart + bodyOff, b, 0, bodyLen.toInt)
            payload = b
          }
        }
        assemble(h, recordStart, status, httpCt, payload)
        return true
      }
      // filtered out: the block was never read — pure seek
    }
    false
  }

  override def close(): Unit = w.close()
}

/** Sequential reader for `.warc.gz` (record-per-member and monolithic
  * streams both decode — member framing is owned by
  * [[GzipMembersInputStream]], not `GZIPInputStream`'s broken
  * concatenation probe; offsets are uncompressed-stream positions).
  * Blocks are decompress-skipped when not required — cheaper than
  * materializing, though unlike the plain reader the bytes still move
  * through the codec (inherent to gzip, not a reader choice).
  *
  * Truncated tails — EOF mid-header, mid-block, or inside a cut-short
  * gzip member — drop the partial record and end the scan; gzip CRC /
  * ISIZE mismatches and unparseable header bytes at an aligned
  * position stay loud (IOException with file@offset). */
final class WarcGzPartitionReader(part: WarcInputPartition,
                                  required: StructType, pred: WarcPred,
                                  serConf: SerializableHadoopConf =
                                    new SerializableHadoopConf(
                                      SparkSession.active.sessionState.newHadoopConf()))
    extends WarcReaderBase(part, required) {

  private val conf = serConf.value
  private val fsPath = new Path(part.path)
  private val fs = fsPath.getFileSystem(conf)
  private val raw = fs.open(fsPath)
  private var pos = 0L
  private var done = false

  /** Indexed mode: resolve this split's owned MEMBER range from the
    * sidecar and bound the raw stream to exactly those members'
    * compressed bytes. Ownership mirrors the plain reader's protocol at
    * member granularity — a member starting at compressed offset o
    * belongs to the split with start < o <= start + length, and the
    * offset-0 split owns from byte 0 — so the splits partition the
    * member set. Owned members are contiguous, hence ONE seek + one
    * bounded sequential read; `pos` starts at the first owned member's
    * uncompressed offset, keeping `_record_offset` provenance identical
    * to a sequential (unindexed) read. */
  private val rawBounded: java.io.InputStream =
    if (!part.indexed) raw
    else {
      val (c, u) = WarcGzIndex.read(fs, fsPath)
      val fileLen = fs.getFileStatus(fsPath).getLen
      var lo = 0
      if (part.start > 0) {
        // first member with c(lo) > part.start
        lo = java.util.Arrays.binarySearch(c, part.start + 1) match {
          case found if found >= 0 => found
          case ins => -ins - 1
        }
      }
      // last member with c(hi) <= part.start + part.length
      val hi = (java.util.Arrays.binarySearch(c, part.start + part.length) match {
        case found if found >= 0 => found
        case ins => -ins - 2
      }).min(c.length - 1)
      // c(lo) >= fileLen: the file was truncated BEFORE this split's
      // first owned member — nothing of it exists to read (a tail)
      if (lo > hi || c(lo) >= fileLen) { done = true; raw }
      else {
        val rangeStart = c(lo)
        val rangeEnd = if (hi + 1 < c.length) c(hi + 1) else fileLen
        raw.seek(rangeStart)
        pos = u(lo)
        new LimitedInputStream(raw, rangeEnd - rangeStart)
      }
    }

  private val in = new java.io.BufferedInputStream(
    new GzipMembersInputStream(
      new java.io.BufferedInputStream(rawBounded, 1 << 16), 1 << 16), 1 << 16)

  private def readByte(): Int = {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  private def skipFully(n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) { left -= s; pos += s }
      else if (readByte() < 0) return false
      else left -= 1
    }
    true
  }

  private def readFully(b: Array[Byte], off0: Int, len: Int): Boolean = {
    var off = off0
    var left = len
    while (left > 0) {
      val n = in.read(b, off, left)
      if (n < 0) return false
      off += n; left -= n; pos += n
    }
    true
  }

  /** Reads bytes through the blank line that ends a WARC header block
    * (cap-enforced); null at clean EOF before any header byte,
    * EOFException when the stream ends INSIDE the header (a truncated
    * tail — `next()` turns it into end-of-scan), IOException on
    * garbage at an aligned position. */
  private def readHeaderBlock(): (WarcHeader, Long) = {
    // skip inter-record CRLFs to the first header byte
    var b = readByte()
    while (b == '\r' || b == '\n') b = readByte()
    if (b < 0) return null
    val start = pos - 1
    val buf = new java.io.ByteArrayOutputStream(1024)
    buf.write(b)
    // read until \n\r\n or \n\n (blank line), capped
    var prev2 = 0; var prev1 = b
    var ended = false
    while (!ended) {
      val c = readByte()
      if (c < 0)
        throw new java.io.EOFException(
          s"${part.path}@$start: EOF inside WARC header")
      buf.write(c)
      if (buf.size > WarcDataSource.MaxWarcHeaderBytes)
        throw new java.io.IOException(s"${part.path}@$start: unterminated WARC header")
      if (c == '\n' && (prev1 == '\n' || (prev1 == '\r' && prev2 == '\n'))) ended = true
      prev2 = prev1; prev1 = c
    }
    val arr = buf.toByteArray
    val h = Warc.parseHeader(arr, 0, arr.length)
    if (h == null)
      throw new java.io.IOException(s"${part.path}@$start: malformed WARC header")
    (h, start)
  }

  override def next(): Boolean = {
    try nextImpl()
    catch {
      // EOF anywhere inside a record — mid-header, mid-block, or a
      // cut-short gzip member underneath — is a tail the writer died
      // on: drop the partial record, end the scan. (IOException —
      // malformed headers, CRC mismatches — still propagates.)
      case _: java.io.EOFException => done = true; false
    }
  }

  private def nextImpl(): Boolean = {
    while (!done) {
      val hs = readHeaderBlock()
      if (hs == null) { done = true; return false }
      val (h, recordStart) = hs
      val keep = pred.isEmpty || pred.matches(h("warc-type"), h("warc-target-uri"))
      if (!keep || !needBlock || h.contentLength == 0) {
        if (!skipFully(h.contentLength)) { done = true; return false }
        if (keep) { assemble(h, recordStart, -1, null,
          if (needPayload) Array.emptyByteArray else null); return true }
      } else {
        val ct = h("content-type")
        val isHttp = ct != null &&
          ct.toLowerCase(java.util.Locale.ROOT).startsWith("application/http")
        var status = -1
        var httpCt: String = null
        var payload: Array[Byte] = null
        if (needPayload) {
          // the >2 GiB guard applies ONLY when the block must
          // materialize — envelope-only and skip paths stream past
          // oversized records instead of failing the job
          require(h.contentLength <= Int.MaxValue,
            s"${part.path}@$recordStart: ${h.contentLength} B block exceeds a JVM array")
          val block = new Array[Byte](h.contentLength.toInt)
          if (!readFully(block, 0, block.length)) { done = true; return false }
          var bodyOff = 0
          if (isHttp) {
            val (st, hct, bo) = Warc.parseHttp(block, 0, block.length)
            status = st; httpCt = hct; bodyOff = bo
          }
          payload =
            if (bodyOff == 0) block
            else java.util.Arrays.copyOfRange(block, bodyOff, block.length)
        } else if (isHttp) {
          // envelope-only projection: decode just the HTTP-header cap,
          // decompress-skip the remainder of the block
          val want = math.min(h.contentLength,
            WarcDataSource.MaxHttpHeaderBytes.toLong).toInt
          val head = new Array[Byte](want)
          if (!readFully(head, 0, want)) { done = true; return false }
          val (st, hct, _) = Warc.parseHttp(head, 0, want)
          status = st; httpCt = hct
          if (!skipFully(h.contentLength - want)) { done = true; return false }
        } else if (!skipFully(h.contentLength)) { done = true; return false }
        assemble(h, recordStart, status, httpCt, payload)
        return true
      }
    }
    false
  }

  override def close(): Unit = in.close()
}
