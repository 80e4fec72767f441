package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 reader for WebDataset-style tar shards (the
  * [[graft.sinks.WebDatasetWriter]] format, and any POSIX-ustar tar
  * whose samples are runs of adjacent entries sharing a basename):
  * `spark.read.format("webdataset").option("path", dir).load()` →
  * one row per sample, `(key string, entries map<ext, binary>)`.
  *
  * Scale shape: ONE partition per shard file — tar has no record index,
  * so a shard is the unit of parallelism by design (the writer's
  * `numShards` is the knob; training loaders make the same choice).
  * Column pruning is real IO savings: a `key`-only projection reads the
  * 512-byte headers and SEEKS past every data block — sample listings
  * over a 100 TB corpus touch ~0.1% of the bytes. */
class WebDatasetDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "webdataset"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebDatasetDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val props = properties.asScala.toMap
    new WdsTable(MarcDataSource.resolvePaths(props),
      props.exists { case (k, v) =>
        k.equalsIgnoreCase("hashedShards") && v.equalsIgnoreCase("true") },
      props.collectFirst { case (k, v) if k.equalsIgnoreCase("numShards") =>
        v.toInt })
  }
}

object WebDatasetDataSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("entries",
      MapType(StringType, BinaryType, valueContainsNull = false),
      nullable = false)))
}

final class WdsTable(paths: Seq[String], hashedShards: Boolean = false,
                     numShards: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String = s"webdataset(${paths.mkString(",")})"
  override def schema(): StructType = WebDatasetDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WdsScanBuilder(paths, hashedShards ||
      options.getBoolean("hashedShards", false),
      numShards.orElse(
        Option(options.get("numShards")).map(_.toInt)),
      Option(options.get("targetPartitionBytes")).map(_.toLong))
}

/** Conjunction of key predicates the tar reader can evaluate from the
  * entry HEADER alone (the sample key is the entry basename): a
  * non-matching sample's data blocks are SEEKED past, never read — at
  * 100 TB a keyed lookup touches ~0.1% of the bytes, same as the
  * headers-only projection path. Empty = no filtering. */
final case class WdsKeyPred(equalTo: Option[Set[String]],
                            prefixes: Seq[String]) extends Serializable {
  def matches(key: String): Boolean =
    equalTo.forall(_.contains(key)) && prefixes.forall(key.startsWith)
  def isEmpty: Boolean = equalTo.isEmpty && prefixes.isEmpty
}

final class WdsScanBuilder(paths: Seq[String], hashedShards: Boolean = false,
                           numShards: Option[Int] = None,
                           targetPartitionBytes: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}
  private var required: StructType = WebDatasetDataSource.schema
  private var accepted: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Key filters are used to SKIP IO but returned as residual too —
    * Spark re-evaluates them post-scan, so pushdown can only skip
    * bytes, never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case EqualTo("key", _: String) => true
      case In("key", vs) => vs.forall(_.isInstanceOf[String])
      case StringStartsWith("key", _) => true
      case _ => false
    }
    filters // all residual: correctness never rides the skip logic
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan = {
    val eqs = accepted.collect {
      case EqualTo("key", v: String) => Set(v)
      case In("key", vs) => vs.map(_.asInstanceOf[String]).toSet
    }
    // several equality sets conjoin by intersection
    val eq = eqs.reduceOption(_ intersect _)
    val pred = WdsKeyPred(eq,
      accepted.collect { case StringStartsWith("key", p) => p }.toSeq)
    new WdsScan(paths, required, pred, hashedShards, numShards,
      targetPartitionBytes)
  }
}

final case class WdsInputPartition(path: String, length: Long)
  extends InputPartition

/** Several shard files read sequentially by ONE task — the opt-in
  * (`targetPartitionBytes`) answer to ragged tiny-shard layouts, where
  * one-task-per-shard degenerates into thousands of sub-MB tasks whose
  * scheduling overhead dwarfs the IO. Shards are packed greedily in
  * name order up to the byte target; key-filter pushdown and column
  * pruning apply per file exactly as in the single-shard path. */
final case class WdsPackedPartition(files: Seq[WdsInputPartition])
  extends InputPartition

final class WdsScan(paths: Seq[String], required: StructType,
                    pred: WdsKeyPred = WdsKeyPred(None, Nil),
                    hashedShards: Boolean = false,
                    numShards: Option[Int] = None,
                    targetPartitionBytes: Option[Long] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Pruning mode is visible in `explain()`. */
  override def description(): String = {
    val mode = if (required.fieldNames.contains("entries")) "read=full"
    else "read=headers-only"
    val filt = if (pred.isEmpty) "" else s" keyfilter=$pred"
    val hs = if (hashedShards) " hashedShards" else ""
    val pack = targetPartitionBytes.fold("")(t => s" packBytes=$t")
    s"webdataset(${paths.mkString(",")}) $mode$filt$hs$pack"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    // pruning is only sound when the shard set is COMPLETE — i.e. it
    // came from listing a directory (the writer's whole layout). A
    // caller passing explicit shard files may hold a contiguous SUBSET
    // (shard-000000..2 of an 8-shard layout), where the inferred
    // modulus would be wrong and matching rows silently unreachable.
    var allFromDirListing = true
    val all = paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val statuses =
        if (fs.getFileStatus(path).isDirectory)
          fs.listStatus(path).toSeq.filter(s =>
            s.isFile && s.getPath.getName.endsWith(".tar"))
        else { allFromDirListing = false; Seq(fs.getFileStatus(path)) }
      statuses.map(st => WdsInputPartition(st.getPath.toString, st.getLen)
        : InputPartition)
    }.toArray
    // shard PRUNING, opt-in (`option("hashedShards", true)`): the writer
    // assigns each sample to pmod(xxhash64(key), numShards) and names
    // shards shard-NNNNNN.tar, so a key-equality lookup needs exactly
    // one shard per key — 1/N of the file opens at any corpus size. The
    // option is an assertion that the directory IS a WebDatasetWriter
    // layout; on a foreign archive it would silently drop samples, hence
    // never inferred. The layout is still validated (complete contiguous
    // shard-NNNNNN numbering) and pruning declines when it doesn't hold.
    val pruned = pred.equalTo match {
      case Some(keys) if hashedShards && allFromDirListing && all.nonEmpty =>
        val nums = all.map(p =>
          new Path(p.asInstanceOf[WdsInputPartition].path).getName).map {
          case WdsScan.ShardName(n) => n.toInt
          case _ => -1
        }
        val n = all.length
        val isWriterLayout = !nums.contains(-1) && nums.sorted.sameElements(0 until n)
        // an explicit numShards option is the caller's claim about the
        // true hash modulus; if the file count disagrees (e.g. an older
        // layout whose empty shards left no file), the inferred modulus
        // would be wrong — decline pruning rather than silently miss rows
        val modulusAgrees = numShards.forall(_ == n)
        if (!isWriterLayout || !modulusAgrees) all
        else {
          val byNum = nums.zip(all).toMap
          val wanted = keys.map { k =>
            val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
              .hash(org.apache.spark.unsafe.types.UTF8String.fromString(k),
                org.apache.spark.sql.types.StringType, 42L)
            (((h % n) + n) % n).toInt
          }
          wanted.toArray.sorted.flatMap(byNum.get)
        }
      case _ => all
    }
    // tiny-shard COALESCING, opt-in (`option("targetPartitionBytes", n)`):
    // one task per shard is right for training-sized shards but
    // degenerates on ragged small shards (thousands of sub-MB tasks);
    // greedy name-order packing up to the byte target keeps task count ≈
    // totalBytes/target. Applied AFTER pruning, so a keyed lookup still
    // opens 1/N files; each packed file is read with the same per-file
    // pushdown (key skip + header-only projection)
    targetPartitionBytes match {
      case Some(target) if target > 0 && pruned.length > 1 =>
        val sorted = pruned.map(_.asInstanceOf[WdsInputPartition])
          .sortBy(_.path)
        val groups = Seq.newBuilder[InputPartition]
        var cur = Vector.empty[WdsInputPartition]
        var bytes = 0L
        for (f <- sorted) {
          if (cur.nonEmpty && bytes + f.length > target) {
            groups += WdsPackedPartition(cur); cur = Vector.empty; bytes = 0L
          }
          cur :+= f; bytes += f.length
        }
        if (cur.nonEmpty) groups += WdsPackedPartition(cur)
        groups.result().toArray
      case _ => pruned
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WdsReaderFactory(required, new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf()), pred)
}

object WdsScan {
  private[sources] val ShardName = "shard-(\\d{6})\\.tar".r
}

final class WdsReaderFactory(required: StructType, conf: SerializableHadoopConf,
                             pred: WdsKeyPred)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: WdsInputPartition =>
        new WdsPartitionReader(p, required, conf, pred)
      case p: WdsPackedPartition =>
        new WdsChainedReader(p.files, required, conf, pred)
    }
}

/** Reads a packed partition's shard files sequentially — one underlying
  * [[WdsPartitionReader]] at a time, so per-task memory stays bounded by
  * one sample regardless of how many tiny shards are packed together. */
final class WdsChainedReader(files: Seq[WdsInputPartition],
                             required: StructType,
                             conf: SerializableHadoopConf,
                             pred: WdsKeyPred)
    extends PartitionReader[InternalRow] {
  private val it = files.iterator
  private var cur: WdsPartitionReader = _

  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!it.hasNext) return false
        cur = new WdsPartitionReader(it.next(), required, conf, pred)
      }
      if (cur.next()) return true
      cur.close(); cur = null
    }
    false
  }

  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

final class WdsPartitionReader(part: WdsInputPartition, required: StructType,
                               serConf: SerializableHadoopConf,
                               pred: WdsKeyPred = WdsKeyPred(None, Nil))
    extends PartitionReader[InternalRow] {

  private val needEntries = required.fieldNames.contains("entries")
  private val in = new Path(part.path).getFileSystem(serConf.value)
    .open(new Path(part.path))
  private var pos = 0L
  private val header = new Array[Byte](512)

  // one-entry lookahead: a sample ends when the basename changes
  private var pendingName: String = null
  private var pendingData: Array[Byte] = null
  private var row: InternalRow = _
  private var eof = false

  private def headerString(off: Int, len: Int): String = {
    var end = off
    while (end < off + len && header(end) != 0) end += 1
    new String(header, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Reads the next tar entry into (pendingName, pendingData); false at
    * end of archive. Data is skipped (seek) unless `entries` is needed.
    * Foreign-archive tolerance: GNU long-name entries ('L') apply to the
    * following entry; pax extended headers ('x'/'g') and non-file types
    * (dirs, links) are skipped — so shards produced by external tools
    * still sample correctly, not just [[graft.sinks.WebDatasetWriter]]'s. */
  private def readEntry(): Boolean = {
    var longName: String = null
    while (true) {
      if (eof) return false
      if (pos + 512 > part.length) { eof = true; return false }
      in.readFully(pos, header, 0, 512)
      if (header(0) == 0) { eof = true; return false } // zero block = end
      val magic = headerString(257, 6)
      require(magic == "ustar" || magic.startsWith("ustar"),
        s"${part.path}@$pos: not a ustar header (magic '$magic')")
      val name = headerString(0, 100)
      val size = java.lang.Long.parseLong(headerString(124, 12).trim, 8)
      val typeflag = header(156)
      pos += 512
      val dataStart = pos
      pos += ((size + 511) / 512) * 512
      typeflag match {
        case 'L' => // GNU long name: the data IS the next entry's name
          require(size <= 4096, s"${part.path}@$dataStart: longname $size B")
          val b = new Array[Byte](size.toInt)
          in.readFully(dataStart, b, 0, size.toInt)
          var n = b.length
          while (n > 0 && b(n - 1) == 0) n -= 1
          longName = new String(b, 0, n, java.nio.charset.StandardCharsets.UTF_8)
        case '0' | 0 =>
          pendingName = if (longName != null) longName else name
          // pushed key filters: a non-matching sample's data blocks are
          // seeked past here, never read (the header gave us the key)
          val keep = pred.isEmpty ||
            pred.matches(baseAndExt(pendingName)._1)
          pendingData =
            if (!needEntries || !keep) Array.emptyByteArray
            else {
              require(size <= Int.MaxValue,
                s"${part.path}: entry $name is ${size} B — tar entries " +
                  "above 2 GiB exceed a JVM array (re-shard the sample)")
              val b = new Array[Byte](size.toInt)
              in.readFully(dataStart, b, 0, size.toInt)
              b
            }
          return true
        case _ => // pax headers, dirs, links: not sample entries
          longName = null
      }
    }
    false
  }

  private def baseAndExt(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i <= 0) (name, "") else (name.substring(0, i), name.substring(i + 1))
  }

  override def next(): Boolean = {
    var base: String = null
    var exts: scala.collection.mutable.Builder[UTF8String, Seq[UTF8String]] = null
    var datas: scala.collection.mutable.Builder[Array[Byte], Seq[Array[Byte]]] = null
    // consume samples until one passes the pushed key filter (filtered
    // samples cost their headers only; Spark re-applies the filter
    // post-scan, so this is an IO skip, not the correctness gate)
    var found = false
    while (!found) {
      if (pendingName == null && !readEntry()) return false
      base = baseAndExt(pendingName)._1
      exts = Seq.newBuilder[UTF8String]
      datas = Seq.newBuilder[Array[Byte]]
      var more = true
      while (more && pendingName != null && baseAndExt(pendingName)._1 == base) {
        exts += UTF8String.fromString(baseAndExt(pendingName)._2)
        datas += pendingData
        pendingName = null
        pendingData = null
        more = readEntry()
      }
      found = pred.isEmpty || pred.matches(base)
    }
    val values = new Array[Any](required.fields.length)
    var i = 0
    for (f <- required.fields) {
      values(i) = f.name match {
        case "key" => UTF8String.fromString(base)
        case "entries" => new ArrayBasedMapData(
          new GenericArrayData(exts.result().toArray[Any]),
          new GenericArrayData(datas.result().toArray[Any]))
      }
      i += 1
    }
    row = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
