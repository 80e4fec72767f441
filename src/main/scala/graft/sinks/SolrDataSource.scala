package graft.sinks

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 write path for the Solr JSON sink: `df.write.format("solr")
  * .option("url", ...).mode("append").save()` — the same batching /
  * retry-singles / maxSkipped / commit-on-close protocol as
  * [[SolrJsonSink.write]], expressed through `BatchWrite` so it composes
  * with the standard writer API (modes, option plumbing, job-level
  * commit/abort) instead of requiring the foreachPartition entry point.
  *
  * Options: `url` (required), `batchSize`, `maxSkipped` (-1 = unlimited),
  * `commitOnClose`, `user`/`password`, `transportClass` (no-arg
  * [[SolrJsonSink.SolrTransport]] implementation — the fake-transport
  * test seam; defaults to the real HTTP transport).
  *
  * Job-level semantics: each task counts its skipped docs and aborts past
  * `maxSkipped` (conservative local check, like the foreachPartition
  * path); task commit messages carry (sent, skipped) so the driver
  * re-checks the GLOBAL skip count before issuing the Solr commit —
  * a job whose tasks each skirt under the limit still fails loudly, and
  * the commit is withheld. Solr has no transactional abort: like the
  * reference writer, already-posted documents stay until the next
  * delete-all + reindex; abort() therefore only skips the commit. */
class SolrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "solr"

  // write-only source: schema is whatever the incoming frame carries —
  // supportsExternalMetadata makes Spark pass the query schema into
  // getTable instead of validating against the (empty) inferred one
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SolrWriteTable(schema)
}

final class SolrWriteTable(schema: StructType) extends Table with SupportsWrite {
  override def name(): String = "solr-json-sink"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite mode = the reference's delete-all + reindex flow
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new SolrWrite(
        SolrWriteConfig.fromOptions(info.options), info.schema(), truncateFirst)
    }
}

final case class SolrWriteConfig(
    settings: SolrJsonSink.Settings,
    transportClass: String) {
  def transport(): SolrJsonSink.SolrTransport =
    Class.forName(transportClass).getDeclaredConstructor().newInstance()
      .asInstanceOf[SolrJsonSink.SolrTransport]
}

object SolrWriteConfig {
  def fromOptions(options: CaseInsensitiveStringMap): SolrWriteConfig = {
    val url = Option(options.get("url")).getOrElse(
      throw new IllegalArgumentException("solr sink requires an 'url' option"))
    val auth = (Option(options.get("user")), Option(options.get("password"))) match {
      case (Some(u), p) => Some((u, p.getOrElse("")))
      case _            => None
    }
    val maxSkipped = Option(options.get("maxSkipped")).map(_.toLong) match {
      case Some(n) if n < 0 => None
      case Some(n)          => Some(n)
      case None             => Some(0L)
    }
    SolrWriteConfig(
      SolrJsonSink.Settings(
        url = url,
        batchSize = Option(options.get("batchSize")).map(_.toInt).getOrElse(100),
        maxSkipped = maxSkipped,
        commitOnClose = Option(options.get("commitOnClose"))
          .forall(_.toBoolean),
        basicAuth = auth),
      Option(options.get("transportClass"))
        .getOrElse(classOf[SolrJsonSink.HttpTransport].getName))
  }
}

final case class SolrCommitMessage(sent: Long, skipped: Long)
  extends WriterCommitMessage

final class SolrWrite(config: SolrWriteConfig, schema: StructType,
                      truncateFirst: Boolean) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      // truncate happens once, before any task writes (driver-side)
      if (truncateFirst) SolrJsonSink.deleteAll(config.settings, config.transport())
      SolrWriterFactory(config, schema)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val skipped = messages.collect { case m: SolrCommitMessage => m.skipped }.sum
      config.settings.maxSkipped.foreach { max =>
        if (skipped > max) throw new SolrJsonSink.MaxSkippedExceeded(skipped, max)
      }
      if (config.settings.commitOnClose) {
        val t = config.transport()
        val url = SolrJsonSink.commitUrl(config.settings)
        val resp = t.postJson(url, "{}")
        if (resp.status < 200 || resp.status >= 300)
          throw new RuntimeException(
            s"Solr commit failed: HTTP ${resp.status} at $url: ${resp.body}")
      }
    }

    // no transactional abort in Solr: posted docs stay (reference
    // semantics); withholding the commit is the only safe action
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
}

final case class SolrWriterFactory(config: SolrWriteConfig, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SolrDataWriter(config, schema)
}

final class SolrDataWriter(config: SolrWriteConfig, schema: StructType)
  extends DataWriter[InternalRow] {

  private val transport = config.transport()
  private val mapper = new ObjectMapper()
  private val url = SolrJsonSink.updateUrl(config.settings)
  private val toRow = CatalystTypeConverters.createToScalaConverter(schema)
  private val buffer = new scala.collection.mutable.ArrayBuffer[String](
    config.settings.batchSize)
  private var sent = 0L
  private var skipped = 0L

  override def write(record: InternalRow): Unit = {
    val row = toRow(record).asInstanceOf[Row]
    buffer += SolrJsonSink.docJson(rowWithSchema(row), mapper)
    if (buffer.length >= config.settings.batchSize) flush()
  }

  // createToScalaConverter yields GenericRowWithSchema for struct types,
  // but guard for plain rows: docJson walks row.schema
  private def rowWithSchema(row: Row): Row =
    if (row.schema != null) row
    else new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      row.toSeq.toArray, schema)

  private def flush(): Unit = {
    if (buffer.isEmpty) return
    val body = buffer.mkString("[", ",", "]")
    val resp = transport.postJson(url, body)
    if (resp.status >= 200 && resp.status < 300) sent += buffer.length
    else {
      // batch failed: retry each doc individually (the reference's
      // retry-singles, solr_json_writer.rb:208-231)
      buffer.foreach { doc =>
        val single = transport.postJson(url, s"[$doc]")
        if (single.status >= 200 && single.status < 300) sent += 1
        else skipped += 1
      }
    }
    buffer.clear()
    config.settings.maxSkipped.foreach { max =>
      if (skipped > max) throw new SolrJsonSink.MaxSkippedExceeded(skipped, max)
    }
  }

  override def commit(): WriterCommitMessage = {
    flush()
    SolrCommitMessage(sent, skipped)
  }

  override def abort(): Unit = buffer.clear()
  override def close(): Unit = ()
}
