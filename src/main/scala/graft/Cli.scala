package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.examples.DemoIndexer
import graft.marc.MarcFunctions.marcRecordEncoder
import graft.sinks.{SolrJsonSink, Writers}
import graft.sources.MarcIo

/** spark-submit main mirroring the reference's `traject` CLI
  * (/root/reference/lib/traject/command_line.rb:14-278):
  *
  *   graft.Cli [process|marcout] -i marc|json|xml [-o outDir]
  *             [-w json|csv|debug|null|solr] [-u solrUrl]
  *             [-s key=value ...] input files...
  *
  * `process` runs the demo indexing pipeline (the `-c config` analog is a
  * Scala Pipeline — supply your own via the library API); `marcout`
  * bypasses mapping and re-serializes records (command_line.rb:102-142).
  * Exit code is non-zero when the Solr writer skipped records, matching
  * the reference's batch contract (doc/batch_execution.md:164-183).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var command = "process"
    var inputType = "marc"
    var outDir = "graft-out"
    var writer = "json"
    var solrUrl: Option[String] = None
    val settings = scala.collection.mutable.Map[String, String]()
    val inputs = scala.collection.mutable.Buffer[String]()

    var i = 0
    while (i < args.length) {
      args(i) match {
        case "process" | "marcout" if inputs.isEmpty => command = args(i)
        case "-i" => i += 1; inputType = args(i)
        case "-o" => i += 1; outDir = args(i)
        case "-w" => i += 1; writer = args(i)
        case "-u" => i += 1; solrUrl = Some(args(i))
        case "-s" => i += 1
          args(i).split("=", 2) match {
            case Array(k, v) => settings(k) = v
            case _ => sys.error(s"bad -s setting: ${args(i)}")
          }
        case path => inputs += path
      }
      i += 1
    }
    require(inputs.nonEmpty, "no input files given")

    val spark = GraftSession.get("graft-cli")
    try {
      val records = inputType match {
        case "marc" => inputs.map(MarcIo.readBinary(spark, _)).reduce(_ unionByName _)
        case "json" => inputs.map(MarcIo.readJson(spark, _)).reduce(_ unionByName _)
        case "xml"  => inputs.map(MarcIo.readXml(spark, _)).reduce(_ unionByName _)
        case other  => sys.error(s"unknown input type $other")
      }

      command match {
        case "marcout" =>
          MarcIo.writeBinary(records, outDir)
          System.err.println(s"[graft] marcout: wrote ${records.count()} records to $outDir")

        case "process" =>
          val docs = DemoIndexer.index(
            records.toDF().select(struct(col("leader"), col("fields")).as("record")))
          writer match {
            case "json"  => Writers.writeJson(docs, outDir)
            case "yaml"  => Writers.writeYaml(docs, outDir)
            case "csv"   => Writers.writeCsv(docs, docs.columns.toSeq, outDir)
            case "debug" => Writers.writeDebug(docs, "id", outDir)
            case "null"  => Writers.writeNull(docs)
            case "solr"  =>
              val url = solrUrl.getOrElse(sys.error("-u solrUrl required for -w solr"))
              val stats = SolrJsonSink.write(docs,
                SolrJsonSink.Settings(url,
                  batchSize = settings.getOrElse("solr_writer.batch_size", "100").toInt,
                  maxSkipped = settings.get("solr_writer.max_skipped_records").map(_.toLong)),
                new SolrJsonSink.HttpTransport())
              System.err.println(s"[graft] solr: sent=${stats.sent} skipped=${stats.skipped}")
              if (stats.skipped > 0) sys.exit(2) // skipped records ⇒ non-zero
            case other => sys.error(s"unknown writer $other")
          }
          System.err.println(s"[graft] process complete → $outDir")
      }
    } finally spark.stop()
  }
}
