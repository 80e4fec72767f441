package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.sinks.SolrJsonSink

/** Streaming → Solr composition — the reference's marquee streaming use
  * case (OAI-PMH harvest indexed to Solr,
  * /root/reference/lib/traject/oai_pmh_nokogiri_reader.rb doc example +
  * solr_json_writer.rb): an `oai-paged` (or any) streaming source, an
  * indexing function (e.g. DemoIndexer.index after parsing), and the
  * batching/retry-singles SolrJsonSink, glued with checkpointed
  * foreachBatch.
  *
  * Delivery semantics: offsets commit AFTER each foreachBatch completes, so
  * every record is delivered at-least-once; on a graceful stop/restart each
  * record is delivered exactly once (asserted in StreamingSpec), and after
  * a crash mid-batch only that batch re-posts — idempotent because Solr
  * updates upsert by doc id, the same contract the reference's writer
  * relies on. Batches do NOT commit Solr; call [[commit]] after the run
  * (commit-on-close semantics, solr_json_writer.rb:311-341).
  */
object StreamingSolr {

  /** Start a checkpointed stream that maps every micro-batch through
    * `indexBatch` and posts the documents to Solr. */
  def start(stream: DataFrame, checkpoint: String,
            indexBatch: DataFrame => DataFrame,
            settings: SolrJsonSink.Settings,
            transport: SolrJsonSink.SolrTransport,
            oneBatch: Boolean = false): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val docs = indexBatch(batch.toDF())
        SolrJsonSink.write(docs, settings.copy(commitOnClose = false), transport)
        ()
      }
    (if (oneBatch) writer.trigger(Trigger.Once()) else writer).start()
  }

  /** Commit-on-close for a finished streaming run. */
  def commit(settings: SolrJsonSink.Settings,
             transport: SolrJsonSink.SolrTransport): Unit = {
    val resp = transport.postJson(SolrJsonSink.commitUrl(settings), "{}")
    if (resp.status < 200 || resp.status >= 300)
      throw new RuntimeException(s"Solr commit failed: HTTP ${resp.status}: ${resp.body}")
  }

  /** Parse a marc-in-json `record` string column into the record-struct
    * frame the pipeline DSL consumes (bad lines skipped, NDJReader
    * semantics) — the standard bridge from a paged feed to DemoIndexer. */
  def marcJsonRecords(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    import graft.marc.MarcFunctions.marcRecordEncoder
    batch.select(col("record").cast("string")).as[String]
      .flatMap(graft.marc.MarcJson.parseOption(_))
      .toDF()
      .select(struct(col("leader"), col("fields")).as("record"))
  }
}
