package graft.streaming

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Paginated-pull Structured Streaming source — the OAI-PMH ListRecords
  * shape (/root/reference/lib/traject/oai_pmh_nokogiri_reader.rb:28-163):
  * fetch page, follow resumptionToken, stop when the token is empty.
  *
  * Streaming mapping: one page = one micro-batch unit; the page index is
  * the checkpointable offset, and the resumption-token chain is replayed
  * deterministically by the fetcher. Pages are an order-dependent server
  * cursor, so fetching happens in offset order (single partition per page —
  * SURVEY §7 "single-partition read, parallelize downstream"); heavy
  * per-record work belongs in the downstream stages, which Spark fans out.
  *
  * The fetcher is pluggable: `OaiPageFetcher` implementations are looked up
  * by class name from the `fetcher` option, so tests inject a deterministic
  * fake while production uses an HTTP fetcher.
  */
trait OaiPageFetcher extends Serializable {
  /** Fetch one page: (records, nextResumptionToken) — None = last page. */
  def fetch(token: Option[String]): (Seq[String], Option[String])
}

object PagedSource {
  val schema: StructType = StructType(Seq(StructField("record", StringType)))

  /** Resolve + cache fetcher instances per class name (one per executor). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, OaiPageFetcher]()
  def fetcherFor(className: String): OaiPageFetcher =
    cache.computeIfAbsent(className, cn =>
      Class.forName(cn).getDeclaredConstructor().newInstance().asInstanceOf[OaiPageFetcher])

  /** Walk the token chain from page 0 to `page`, returning its records.
    * Fetchers are deterministic, so replay from a checkpoint is exact. */
  def fetchPage(fetcher: OaiPageFetcher, page: Long): (Seq[String], Option[String]) = {
    var token: Option[String] = None
    var i = 0L
    var result: (Seq[String], Option[String]) = (Seq.empty, None)
    while (i <= page) {
      result = fetcher.fetch(token)
      token = result._2
      i += 1
    }
    result
  }
}

class PagedStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "oai-paged"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(properties.asScala.toMap)
}

final class PagedTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"oai-paged(${props.getOrElse("fetcher", "?")})"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PagedScan(options.asScala.toMap)
    }
}

final case class PageOffset(page: Long) extends Offset {
  override def json(): String = s"""{"page":$page}"""
}

final class PagedScan(options: Map[String, String]) extends Scan {
  override def readSchema(): StructType = PagedSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedMicroBatchStream(options("fetcher"),
      options.getOrElse("maxPagesPerTrigger", "1").toInt)
}

/** Offsets count completed pages: batch (start, end] replays pages
  * start..end-1. `latestOffset` keeps a monotonic probe cursor (page +
  * resumption token) independent of commit timing — the engine may call it
  * any number of times per trigger and before commits; each call advances
  * the cursor by at most `maxPagesPerTrigger` pages (backpressure, like
  * maxOffsetsPerTrigger). On checkpoint restart the cursor re-probes from
  * page 0 and catches up — deterministic fetchers make the replay exact. */
final class PagedMicroBatchStream(fetcherClass: String, maxPagesPerTrigger: Int)
    extends MicroBatchStream {

  private val fetcher = PagedSource.fetcherFor(fetcherClass)
  private var probedPage: Long = 0
  private var probedToken: Option[String] = None
  private var exhausted = false

  override def initialOffset(): Offset = PageOffset(0)

  override def latestOffset(): Offset = synchronized {
    var advanced = 0
    while (!exhausted && advanced < maxPagesPerTrigger) {
      val (_, next) = fetcher.fetch(probedToken)
      probedPage += 1
      advanced += 1
      probedToken = next
      if (next.isEmpty) exhausted = true
    }
    PageOffset(probedPage)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    (s until e).map(p => PagePartition(fetcherClass, p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val pp = partition.asInstanceOf[PagePartition]
        new PagePartitionReader(pp)
      }
    }

  override def commit(end: Offset): Unit = ()

  override def deserializeOffset(json: String): Offset = {
    val page = """"page"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(0L)
    PageOffset(page)
  }

  override def stop(): Unit = ()
}

final case class PagePartition(fetcherClass: String, page: Long) extends InputPartition

final class PagePartitionReader(part: PagePartition)
    extends PartitionReader[InternalRow] {
  private val records: Iterator[String] = {
    val fetcher = PagedSource.fetcherFor(part.fetcherClass)
    PagedSource.fetchPage(fetcher, part.page)._1.iterator
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (records.hasNext) {
      current = InternalRow(UTF8String.fromString(records.next()))
      true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Production fetcher: OAI-PMH ListRecords over HTTP with resumptionToken
  * pagination and gzip (oai_pmh_nokogiri_reader.rb:72-99). Records are the
  * raw <record> elements; parse downstream with xpath()/from_xml. */
final class HttpOaiPageFetcher(baseUrl: String, metadataPrefix: String = "oai_dc")
    extends OaiPageFetcher {
  def this() = this(sys.props.getOrElse("graft.oai.url", ""))

  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()

  def fetch(token: Option[String]): (Seq[String], Option[String]) = {
    val url = token match {
      case Some(t) => s"$baseUrl?verb=ListRecords&resumptionToken=${java.net.URLEncoder.encode(t, "UTF-8")}"
      case None    => s"$baseUrl?verb=ListRecords&metadataPrefix=$metadataPrefix"
    }
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Accept-Encoding", "identity").GET().build()
    val body = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    (extractRecords(body), extractToken(body))
  }

  private[streaming] def extractRecords(xml: String): Seq[String] =
    """(?s)<record[ >].*?</record>""".r.findAllIn(xml).toSeq

  private[streaming] def extractToken(xml: String): Option[String] =
    """(?s)<resumptionToken[^>]*>\s*([^<\s][^<]*?)\s*</resumptionToken>""".r
      .findFirstMatchIn(xml).map(_.group(1)).filter(_.nonEmpty)
}
