package graft.examples

import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Transforms
import graft.functions.XPathExtractExpression.extractXpath
import graft.pipeline.{IndexerConfig, Pipeline}

/** The reference's XML demo configuration
  * (/root/reference/test/test_support/nokogiri_demo_config.rb) re-expressed
  * in the same Pipeline DSL the MARC path uses — the NokogiriIndexer
  * equivalence proof: records are raw XML strings (from
  * [[graft.sources.XmlRead.readRecords]] or a paged OAI stream) and every
  * rule is an `extract_xpath` over them. Note the reference's repeated
  * `creator` field (dc:creator then dc:format): declaring the same field
  * twice appends values in order, exactly as `to_field` does.
  */
object XmlDemoIndexer extends IndexerConfig {

  val Namespaces: Map[String, String] = Map(
    "oai"    -> "http://www.openarchives.org/OAI/2.0/",
    "dc"     -> "http://purl.org/dc/elements/1.1/",
    "oai_dc" -> "http://www.openarchives.org/OAI/2.0/oai_dc/")

  private def xp(xpath: String): Column => Column =
    rec => extractXpath(rec, xpath, Namespaces)

  def pipeline: Pipeline = Pipeline.builder
    .toField("institution", _ => Transforms.literal("University of Hogwarts"))
    .toField("id", xp("//oai:record//oai:metadata/oai_dc:dc/dc:identifier"),
      Transforms.firstOnly)
    .toField("title", xp("//oai:metadata/oai_dc:dc/dc:title"))
    .toField("rights", xp("//oai:metadata/oai_dc:dc/dc:rights"))
    .toField("creator", xp("//oai:metadata/oai_dc:dc/dc:creator"))
    .toField("description", xp("//oai:metadata/oai_dc:dc/dc:description"))
    .toField("creator", xp("//oai:metadata/oai_dc:dc/dc:format"))

  /** records: one row per XML record in column `xml` (XmlRead's shape). */
  def index(records: DataFrame): DataFrame =
    pipeline.run(records, recordCol = "xml")
}
