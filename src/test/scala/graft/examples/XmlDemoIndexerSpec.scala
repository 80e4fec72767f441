package graft.examples

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.sources.XmlRead

/** Goldens for the XML demo config, mirroring
  * test/indexer/nokogiri_indexer_test.rb's smoke expectations over a
  * synthesized sample-oai-pmh-shaped fixture. */
class XmlDemoIndexerSpec extends SparkSpec {

  private val sample =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
      |<ListRecords>
      |  <record>
      |    <header><identifier>oai:x:1</identifier></header>
      |    <metadata><oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                         xmlns:dc="http://purl.org/dc/elements/1.1/">
      |      <dc:identifier>id-1</dc:identifier><dc:identifier>alt-1</dc:identifier>
      |      <dc:title>First</dc:title>
      |      <dc:creator>Alice</dc:creator>
      |      <dc:format>text/plain</dc:format>
      |      <dc:rights>CC-BY</dc:rights>
      |    </oai_dc:dc></metadata>
      |  </record>
      |  <record>
      |    <header><identifier>oai:x:2</identifier></header>
      |    <metadata><oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                         xmlns:dc="http://purl.org/dc/elements/1.1/">
      |      <dc:identifier>id-2</dc:identifier>
      |      <dc:title>Second</dc:title>
      |      <dc:description>About things</dc:description>
      |    </oai_dc:dc></metadata>
      |  </record>
      |</ListRecords>
      |</OAI-PMH>""".stripMargin

  test("XML demo config maps OAI records like the reference's nokogiri demo") {
    val dir = Files.createTempDirectory("xmldemo")
    Files.write(dir.resolve("oai.xml"), sample.getBytes(StandardCharsets.UTF_8))

    val records = XmlRead.readRecords(spark, Seq(dir.toString + "/oai.xml"),
      Some("//oai:record"), XmlDemoIndexer.Namespaces)
    val docs = XmlDemoIndexer.index(records).orderBy("id")
    val rows = docs.collect()
    assert(rows.length === 2)

    def field(i: Int, name: String): Seq[String] = {
      val r = rows(i)
      val ord = docs.schema.fieldIndex(name)
      if (r.isNullAt(ord)) Nil else r.getSeq[String](ord)
    }
    // first_only keeps one id; title/rights extracted; the twice-declared
    // creator field appends dc:creator then dc:format values in order
    assert(field(0, "id") === Seq("id-1"))
    assert(field(0, "title") === Seq("First"))
    assert(field(0, "rights") === Seq("CC-BY"))
    assert(field(0, "creator") === Seq("Alice", "text/plain"))
    assert(field(0, "institution") === Seq("University of Hogwarts"))
    assert(field(1, "id") === Seq("id-2"))
    assert(field(1, "description") === Seq("About things"))
    assert(field(1, "creator") === Nil) // empty field omitted (NULL)
  }

  test("XML demo config works via the CLI -c loader") {
    val cfg = graft.pipeline.IndexerConfig.load("graft.examples.XmlDemoIndexer")
    assert(cfg eq XmlDemoIndexer)
  }
}
