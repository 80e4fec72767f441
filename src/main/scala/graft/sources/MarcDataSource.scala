package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, ExpressionEncoder}
import org.apache.spark.sql.catalyst.encoders.AgnosticEncoder
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Encoders

import graft.marc.MarcRecord

/** Splittable DataSource V2 for ISO 2709 MARC binary files:
  * `spark.read.format("marc").load(path)` → rows of (leader, fields).
  *
  * Scale design: files are split into `maxPartitionBytes` chunks planned on
  * the driver; each reader aligns to the next record terminator (0x1D) past
  * its split start — records are length-prefixed and terminator-delimited,
  * so any byte offset can resynchronize, making a 100 TB MARC dump read as
  * parallel as its block count. Corresponds to the reference's sequential
  * MarcReader for `marc_source.type = binary`
  * (/root/reference/lib/traject/marc_reader.rb:54-90), which our planner
  * replaces with a parallel scan.
  */
class MarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "marc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MarcDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val props = properties.asScala.toMap
    val encoding = props.getOrElse("encoding", "UTF-8")
    Iso2709.decoderFor(encoding) // validate eagerly (ArgumentError parity)
    new MarcTable(MarcDataSource.resolvePaths(props), encoding)
  }
}

object MarcDataSource {
  val schema: StructType =
    ExpressionEncoder(Encoders.product[MarcRecord].asInstanceOf[AgnosticEncoder[MarcRecord]]).schema

  /** Worst-case record size: the length field is 5 ASCII digits. */
  val MaxRecordBytes: Int = 100000

  /** Extra overflow read so a record whose preceding inter-record padding
    * straddles the split end can still be completed by the split that owns
    * it (padding runs longer than this between two records are pathological). */
  val PaddingAllowance: Int = 65536

  /** Bytes tolerated between records (decodeAll's padding set). */
  @inline def isSeparator(b: Byte): Boolean =
    b == Iso2709.RecordTerminator || b == '\n' || b == '\r' || b == ' ' || b == 0

  def resolvePaths(props: Map[String, String]): Seq[String] =
    props.get("paths")
      .map(p => com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .readValue(p, classOf[Array[String]]).toSeq)
      .orElse(props.get("path").map(Seq(_)))
      .getOrElse(Seq.empty)
}

final class MarcTable(paths: Seq[String], encoding: String = "UTF-8")
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"marc(${paths.mkString(",")})"
  override def schema(): StructType = MarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  /** Provenance metadata (SURVEY §7 "per-record position"): the reference's
    * sequential position/input_name ordinals (indexer.rb:549-574) become
    * (file, byte offset) — stable under a parallel scan and
    * ordering-compatible within each input file. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_input_file"
      override def dataType(): DataType = StringType
      override def comment(): String = "input file path (input_name analog)"
    },
    new MetadataColumn {
      override def name(): String = "_record_offset"
      override def dataType(): DataType = LongType
      override def comment(): String = "record's byte offset in its file (position analog)"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MarcScanBuilder(paths, encoding,
      Option(options.get("tags")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet))
}

final class MarcScanBuilder(paths: Seq[String], encoding: String,
                            tags: Option[Set[String]])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MarcDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new MarcScan(paths, required, encoding, tags)
}

final case class MarcInputPartition(path: String, start: Long, length: Long,
                                    encoding: String = "UTF-8")
  extends InputPartition

/** `tags`: the source-level interesting-tags restriction (opt-in via
  * `.option("tags", "001,245,880")`): only matching directory entries are
  * decoded — the `fields` column then CONTAINS only those fields, the
  * same contract as the reference's interesting-tag prefilter computed
  * from a MarcExtractor's spec set. Spark's DSv2 pushdown prunes
  * top-level columns only (verified: a `fields.tag` projection still
  * scans the full `fields`), so sub-record pruning has to ride an
  * explicit scan option rather than pruneColumns. */
final class MarcScan(paths: Seq[String], required: StructType,
                     encoding: String = "UTF-8",
                     tags: Option[Set[String]] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Decode mode is visible in `explain()` via this description. */
  override def description(): String = {
    val mode =
      if (!required.fieldNames.contains("fields")) "decode=leader-only"
      else tags.map(t => s"decode=tags[${t.toSeq.sorted.mkString(",")}]")
        .getOrElse("decode=full")
    s"marc(${paths.mkString(",")}) $mode"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val statuses =
        if (fs.getFileStatus(path).isDirectory)
          fs.listStatus(path).toSeq.filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        else Seq(fs.getFileStatus(path))
      statuses.flatMap { st =>
        val len = st.getLen
        (0L until math.max(len, 1L) by maxSplit).map { off =>
          MarcInputPartition(st.getPath.toString, off, math.min(maxSplit, len - off), encoding)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MarcReaderFactory(required, tags)
}

final class MarcReaderFactory(required: StructType, tags: Option[Set[String]])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MarcPartitionReader(partition.asInstanceOf[MarcInputPartition], required, tags)
}

/** Forward-only sliding byte window over a file region: `base` is the
  * absolute offset of `exposed(0)`, and `exposed` always holds exactly the
  * loaded bytes (so decoders can treat `exposed.length` as end-of-data, as
  * they did with the old whole-split buffer). Access must be monotonic. */
private[sources] final class MarcFileWindow(
    in: org.apache.hadoop.fs.FSDataInputStream,
    fileLen: Long, startAbs: Long, capacity: Int) {
  private val buf = new Array[Byte](capacity)
  var base: Long = startAbs
  private var valid: Int = 0
  var exposed: Array[Byte] = Array.emptyByteArray
  private var closed = false

  /** Make [abs, abs+need) available (clipped at EOF); returns the index of
    * `abs` within `exposed`. */
  def ensure(abs: Long, need0: Int): Int = {
    val need = math.min(need0.toLong, math.max(fileLen - abs, 0L)).toInt
    if (abs < base) throw new IllegalStateException(s"window rewind: $abs < $base")
    if (abs + need > base + valid) {
      val keepFrom = (abs - base).toInt
      val keep = if (keepFrom < valid) valid - keepFrom else 0
      if (keep > 0 && keepFrom > 0) System.arraycopy(buf, keepFrom, buf, 0, keep)
      base = abs
      valid = keep
      val target = math.min(capacity.toLong, fileLen - base).toInt
      if (target > valid) {
        in.readFully(base + valid, buf, valid, target - valid)
        valid = target
      }
      exposed = if (valid == buf.length) buf else java.util.Arrays.copyOf(buf, valid)
    }
    (abs - base).toInt
  }

  def byteAt(abs: Long): Byte = {
    val i = ensure(abs, 1) // must run before reading `exposed` (it swaps it)
    exposed(i)
  }

  def close(): Unit = if (!closed) { closed = true; in.close() }
}

/** Reads records whose start offset lies in [start, start+length), aligning
  * to the first record boundary at/after `start` (except at offset 0).
  *
  * Decode modes (same record ACCEPTANCE in all three — row counts are
  * invariant under pruning):
  *  - leader-only (no `fields` column required): skips the directory and
  *    all field/subfield parsing and character decoding;
  *  - tag subset (`tags` scan option): decodes only matching directory
  *    entries;
  *  - full: everything. */
final class MarcPartitionReader(part: MarcInputPartition, required: StructType,
                                tags: Option[Set[String]] = None)
    extends PartitionReader[InternalRow] {

  private val decoder = Iso2709.decoderFor(part.encoding)
  private val leaderOnly = !required.fieldNames.contains("fields")
  private val tagFilter: String => Boolean = tags.map(t => t.contains(_)).orNull
  private var window: MarcFileWindow = _
  private val fullSchema = MarcDataSource.schema
  private val serializer =
    ExpressionEncoder(Encoders.product[MarcRecord].asInstanceOf[AgnosticEncoder[MarcRecord]]).createSerializer()
  // ordinal into the full record schema, or a metadata marker
  private final val InputFileOrd = -1
  private final val RecordOffsetOrd = -2
  private val ordinals = required.fields.map(_.name match {
    case "_input_file"   => InputFileOrd
    case "_record_offset" => RecordOffsetOrd
    case other           => fullSchema.fieldIndex(other)
  })
  private val pathUtf8 = org.apache.spark.unsafe.types.UTF8String.fromString(part.path)

  private val records: Iterator[(MarcRecord, Long)] = {
    // Executors have no active SparkSession; a default Hadoop conf handles
    // file:// (and picks up HADOOP_CONF_DIR on a real cluster).
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val path = new Path(part.path)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen
    // Streaming decode through a bounded sliding window: task memory is
    // O(2 × max record) regardless of split size (a 128 MiB split no
    // longer buffers 128 MiB; a straddling record is completed by sliding
    // past the split end).
    val in = fs.open(path)
    window = new MarcFileWindow(in, fileLen, part.start,
      2 * (MarcDataSource.MaxRecordBytes + MarcDataSource.PaddingAllowance))
    val w = window

    // Alignment protocol (LineRecordReader-style): ownership is by a
    // record's FIRST byte — a record starting at absolute position f
    // belongs to the split with start < f <= start+length (inclusive right
    // edge, so a record beginning exactly at a boundary belongs to the
    // PREVIOUS split). These intervals partition the file, so every record
    // has exactly one owner regardless of padding. A reader at offset 0
    // owns from byte 0; any other reader aligns to the first record start
    // strictly inside its split:
    //  - if its first byte is inter-record padding, the split began inside
    //    a padding run — the record right after the run starts strictly
    //    inside this split and is OURS. (Scanning for a 0x1D here instead
    //    would run past that record's own terminator and silently drop it
    //    whenever the straddling padding contains no 0x1D, e.g.
    //    newline-padded dumps — the padded-split loss bug.)
    //  - otherwise we are mid-record (or exactly at a previous-owned
    //    boundary record): skip to just past the first 0x1D terminator;
    //    the decode loop's padding skip does the rest.
    // The padding branch is guarded by a leader plausibility check because
    // record CONTENT may legally contain padding-class bytes (space, NUL,
    // newline) — a false match falls back to the terminator scan.
    var start: Long = part.start
    if (part.start > 0) {
      var aligned = false
      if (part.start < fileLen && MarcDataSource.isSeparator(w.byteAt(part.start))) {
        var p = part.start
        while (p < fileLen && MarcDataSource.isSeparator(w.byteAt(p))) p += 1
        if (p < fileLen) {
          val rel = w.ensure(p, MarcDataSource.MaxRecordBytes)
          if (Iso2709.plausibleRecordAt(w.exposed, rel)) { start = p; aligned = true }
        }
      }
      if (!aligned) {
        var p = part.start
        while (p < fileLen && w.byteAt(p) != Iso2709.RecordTerminator) p += 1
        start = p + 1
      }
    }
    val limitAbs = part.start + part.length
    new Iterator[(MarcRecord, Long)] {
      private var cur: Long = start
      private var nextRec: Option[(MarcRecord, Long)] = advance()
      private def advance(): Option[(MarcRecord, Long)] = {
        while (cur < fileLen) {
          // skip padding between records
          while (cur < fileLen && MarcDataSource.isSeparator(w.byteAt(cur))) cur += 1
          if (cur >= fileLen || cur > limitAbs) { w.close(); return None }
          val recordStart = cur
          val rel = w.ensure(cur, MarcDataSource.MaxRecordBytes)
          val (rec, next) =
            if (leaderOnly) {
              val (leader, n) = Iso2709.decodeLeaderAt(w.exposed, rel)
              (leader.map(l => graft.marc.MarcRecord(l, Vector.empty)), n)
            } else Iso2709.decodeAt(w.exposed, rel, decoder, tagFilter)
          cur = w.base + math.max(next, rel + 1)
          if (rec.isDefined) return rec.map((_, recordStart))
        }
        w.close()
        None
      }
      def hasNext: Boolean = nextRec.isDefined
      def next(): (MarcRecord, Long) = {
        val r = nextRec.get
        nextRec = advance()
        r
      }
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (records.hasNext) {
      val (rec, offset) = records.next()
      val full = serializer(rec).copy()
      current =
        if (ordinals.length == fullSchema.length && !ordinals.exists(_ < 0)) full
        else {
          val proj = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(ordinals.length)
          var i = 0
          while (i < ordinals.length) {
            ordinals(i) match {
              case InputFileOrd    => proj.update(i, pathUtf8)
              case RecordOffsetOrd => proj.update(i, offset)
              case ord             => proj.update(i, full.get(ord, fullSchema(ord).dataType))
            }
            i += 1
          }
          proj
        }
      true
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (window != null) window.close()
}
