package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic-XML record source — the reference's NokogiriReader re-expressed
  * for Spark (/root/reference/lib/traject/nokogiri_reader.rb:61-177):
  *
  *  - `eachRecordXpath` splits each input document into one source record
  *    per matching node; each record is re-rooted as a standalone XML
  *    string with in-scope namespaces preserved (used declarations kept,
  *    unused dropped — libxml2 reconciliation semantics);
  *  - no `eachRecordXpath` → the whole document is one record;
  *  - prefixes used in `eachRecordXpath` must be registered, with the
  *    reference's error contract (nokogiri_reader.rb:153-169);
  *  - `extra_xpath_hooks` becomes [[extraXpathValues]]: a second,
  *    independent scan of the same files yielding matched-node text (the
  *    clipboard-lambda use case — e.g. `//oai:resumptionToken` — is a
  *    DataFrame the caller consumes however it likes).
  *
  * Scale shape: one task per input file (whole-file DOM parse, exactly the
  * reference's memory model); a 100 TB corpus is many files, so
  * parallelism comes from the file count, not intra-file splits. The
  * experimental streaming reader in the reference is explicitly unstable
  * and not ported (SURVEY.md §2.1); fixed-schema XML at scale should use
  * Spark's native splittable XML source instead.
  */
object XmlRead {

  /** Read XML files into one row per record:
    * (input_file, record_index, xml).
    *
    * `permissive = false` (default): malformed XML raises, the reference's
    * strict-mode contract. `permissive = true`: malformed FILES are
    * skipped (logged to executor stderr) — at 100 TB one corrupt file must
    * not kill the job; count skips by diffing file counts. */
  def readRecords(spark: SparkSession, paths: Seq[String],
                  eachRecordXpath: Option[String] = None,
                  namespaces: Map[String, String] = Map.empty,
                  permissive: Boolean = false): DataFrame = {
    eachRecordXpath.foreach(XmlDom.validateXpathPrefixes(_, namespaces, "each_record_xpath"))
    import spark.implicits._
    val files = wholeFiles(spark, paths)

    def guard[T](path: String, bytes: Array[Byte])(parse: => Seq[T]): Seq[T] =
      if (!permissive) parse
      else try parse catch {
        case e: org.xml.sax.SAXException =>
          System.err.println(s"[graft.xml] skipping malformed $path: ${e.getMessage}")
          Seq.empty
      }

    eachRecordXpath match {
      case None =>
        // whole input doc is the single source record (parse validates)
        files.flatMap { case (path, bytes) =>
          guard(path, bytes) {
            val doc = XmlDom.parse(XmlDom.newDocumentBuilder(), bytes)
            Seq((path, 0, XmlDom.serialize(doc)))
          }
        }.toDF("input_file", "record_index", "xml")
      case Some(xp) =>
        val work = new XmlWork(xp, namespaces)
        files.flatMap { case (path, bytes) =>
          guard(path, bytes) {
            val doc = XmlDom.parse(work.builder, bytes)
            XmlDom.evalNodes(work.compiled, doc).zipWithIndex.map { case (node, i) =>
              (path, i, XmlDom.serializeSubtree(node))
            }
          }
        }.toDF("input_file", "record_index", "xml")
    }
  }

  /** extra_xpath_hooks analog: matched-node text per file
    * (nokogiri_reader.rb:171-177). Returns (input_file, value). */
  def extraXpathValues(spark: SparkSession, paths: Seq[String], xpath: String,
                       namespaces: Map[String, String] = Map.empty): DataFrame = {
    XmlDom.validateXpathPrefixes(xpath, namespaces, "extra_xpath_hooks")
    import spark.implicits._
    val work = new XmlWork(xpath, namespaces)
    wholeFiles(spark, paths).flatMap { case (path, bytes) =>
      val doc = XmlDom.parse(work.builder, bytes)
      XmlDom.evalNodes(work.compiled, doc).map(n => (path, XmlDom.nodeToText(n)))
    }.toDF("input_file", "value")
  }

  /** One (path, content) row per file via the binaryFile source — file
    * pruning/listing stays in Spark's scan machinery. */
  private def wholeFiles(spark: SparkSession, paths: Seq[String]) = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
  }
}
