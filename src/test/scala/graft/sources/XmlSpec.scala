package graft.sources

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.XPathExtractExpression.extractXpath

/** Generic-XML path goldens, ported from the reference's behavior specs
  * (/root/reference/test/nokogiri_reader_test.rb,
  * test/indexer/nokogiri_indexer_test.rb). Fixtures are synthesized
  * equivalents of sample-oai-pmh.xml / namespace-test.xml structure.
  */
class XmlSpec extends SparkSpec {

  private val OaiNs = Map(
    "oai"    -> "http://www.openarchives.org/OAI/2.0/",
    "dc"     -> "http://purl.org/dc/elements/1.1/",
    "oai_dc" -> "http://www.openarchives.org/OAI/2.0/oai_dc/")

  /** OAI-PMH-shaped sample: 3 records + a resumptionToken. */
  private val oaiSample: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
      |  <ListRecords>
      |    <record>
      |      <header status="deleted"><identifier>oai:x:1</identifier></header>
      |      <metadata><oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                           xmlns:dc="http://purl.org/dc/elements/1.1/">
      |        <dc:identifier>id-1</dc:identifier>
      |        <dc:title>First Title</dc:title>
      |        <dc:creator>Alice</dc:creator>
      |        <dc:creator>Bob</dc:creator>
      |      </oai_dc:dc></metadata>
      |    </record>
      |    <record>
      |      <header><identifier>oai:x:2</identifier></header>
      |      <metadata><oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                           xmlns:dc="http://purl.org/dc/elements/1.1/">
      |        <dc:identifier>id-2</dc:identifier>
      |        <dc:title>Second &amp; Third</dc:title>
      |      </oai_dc:dc></metadata>
      |    </record>
      |    <record>
      |      <header><identifier>oai:x:3</identifier></header>
      |      <metadata><oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
      |                           xmlns:dc="http://purl.org/dc/elements/1.1/">
      |        <dc:identifier>id-3</dc:identifier>
      |        <dc:title>Third Title</dc:title>
      |      </oai_dc:dc></metadata>
      |    </record>
      |    <resumptionToken>oai_dc.f(2018).t(6387):100</resumptionToken>
      |  </ListRecords>
      |</OAI-PMH>""".stripMargin

  /** namespace-test.xml equivalent: default + used + unused declarations. */
  private val nsSample: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<top xmlns="http://example.org/top" xmlns:a="http://example.org/a"
      |     xmlns:b="http://example.org/b" xmlns:unused="http://example.org/unused">
      |  <record>
      |    <a:something>a:something</a:something>
      |    <b:something>b:something</b:something>
      |  </record>
      |</top>""".stripMargin

  private def tmpXml(content: String): String = {
    val dir: Path = Files.createTempDirectory("graft-xml")
    val f = dir.resolve("sample.xml")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  private lazy val oaiPath = tmpXml(oaiSample)
  private lazy val nsPath = tmpXml(nsSample)

  test("each_record_xpath fixed path splits records") {
    val df = XmlRead.readRecords(spark, Seq(oaiPath),
      Some("/oai:OAI-PMH/oai:ListRecords/oai:record"), OaiNs)
    assert(df.count() === 3)
  }

  test("each_record_xpath floating path splits records, document order") {
    val df = XmlRead.readRecords(spark, Seq(oaiPath), Some("//oai:record"), OaiNs)
    val ids = df.orderBy("record_index")
      .select(element_at(extractXpath(col("xml"), "//dc:identifier", OaiNs), 1))
      .collect().map(_.getString(0))
    assert(ids.toSeq === Seq("id-1", "id-2", "id-3"))
  }

  test("unregistered prefix in each_record_xpath raises with reference message") {
    val e = intercept[IllegalArgumentException] {
      XmlRead.readRecords(spark, Seq(oaiPath), Some("//foo:bar"), OaiNs)
    }
    assert(e.getMessage.contains("Can't find namespace prefix 'foo'"))
  }

  test("no each_record_xpath yields whole document as one record") {
    val df = XmlRead.readRecords(spark, Seq(oaiPath))
    assert(df.count() === 1)
    val xml = df.select("xml").collect().head.getString(0)
    // whole doc: all three records present in the single yielded record
    assert(extract(xml, "//oai:record", OaiNs).size === 3)
  }

  test("extra_xpath_hooks analog captures resumption token") {
    val df = XmlRead.extraXpathValues(spark, Seq(oaiPath), "//oai:resumptionToken", OaiNs)
    val values = df.collect().map(_.getString(1))
    assert(values.toSeq === Seq("oai_dc.f(2018).t(6387):100"))
  }

  test("outer namespaces: used declarations preserved, unused dropped") {
    val df = XmlRead.readRecords(spark, Seq(nsPath), Some("//mytop:record"),
      Map("mytop" -> "http://example.org/top"))
    val xml = df.select("xml").collect().head.getString(0)
    assert(xml.contains("http://example.org/top"))
    assert(xml.contains("http://example.org/a"))
    assert(xml.contains("http://example.org/b"))
    assert(!xml.contains("http://example.org/unused"))
    // and the re-rooted record is semantically intact under a ns-aware parser
    assert(extract(xml, "//a:something", Map("a" -> "http://example.org/a")) === Seq("a:something"))
    assert(extract(xml, "//b:something", Map("b" -> "http://example.org/b")) === Seq("b:something"))
  }

  test("malformed XML raises (strict-mode parity; JVM parser is always strict)") {
    val badPath = tmpXml("<doc></doc><doc></doc>")
    val e = intercept[Exception] {
      XmlRead.readRecords(spark, Seq(badPath)).count()
    }
    assert(e.getMessage != null)
  }

  test("permissive mode skips malformed files instead of failing the job") {
    val bad = tmpXml("<doc></doc><doc></doc>")
    val good = tmpXml("<doc><v>ok</v></doc>")
    val df = XmlRead.readRecords(spark, Seq(bad, good), permissive = true)
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows.head.getString(2).contains("<v>ok</v>"))
  }

  // ---- extract_xpath macro semantics (nokogiri_indexer_test.rb) ----

  private def extract(xml: String, xpath: String, ns: Map[String, String] = Map.empty,
                      toText: Boolean = true): Seq[String] = {
    import spark.implicits._
    Seq(xml).toDF("xml")
      .select(extractXpath(col("xml"), xpath, ns, toText).as("v"))
      .collect().head.getSeq[String](0)
  }

  test("extract_xpath: namespaced element text") {
    val recs = XmlRead.readRecords(spark, Seq(oaiPath), Some("//oai:record"), OaiNs)
      .orderBy("record_index").select("xml").collect().map(_.getString(0))
    assert(extract(recs(0), "//oai:metadata/oai_dc:dc/dc:title", OaiNs) === Seq("First Title"))
    // entity unescaping through the round trip
    assert(extract(recs(1), "//dc:title", OaiNs) === Seq("Second & Third"))
    // repeated elements produce one value each, in document order
    assert(extract(recs(0), "//dc:creator", OaiNs) === Seq("Alice", "Bob"))
  }

  test("extract_xpath: attribute nodes yield their value") {
    val recs = XmlRead.readRecords(spark, Seq(oaiPath), Some("//oai:record"), OaiNs)
      .orderBy("record_index").select("xml").collect().map(_.getString(0))
    assert(extract(recs(0), "//oai:header/@status", OaiNs) === Seq("deleted"))
    assert(extract(recs(1), "//oai:header/@status", OaiNs) === Seq.empty)
  }

  test("extract_xpath: non-terminal element joins non-blank descendant text with spaces") {
    val xml =
      """<record>
        |  <name>
        |    <first>José</first>
        |    <last>Lopez</last>
        |  </name>
        |  <name>
        |    <first>Sue</first>
        |    <last>Jones</last>
        |  </name>
        |</record>""".stripMargin
    assert(extract(xml, "/record/name") === Seq("José Lopez", "Sue Jones"))
  }

  test("extract_xpath: to_text=false yields standalone serialized nodes") {
    val xml = "<record><name><first>Sue</first></name></record>"
    val nodes = extract(xml, "/record/name", toText = false)
    assert(nodes.size === 1)
    assert(nodes.head.contains("<name>") && nodes.head.contains("<first>Sue</first>"))
    // the serialized node is itself a parseable record
    assert(extract(nodes.head, "/name/first") === Seq("Sue"))
  }

  test("extract_xpath: unprefixed xpath does not match namespaced elements (XPath 1.0)") {
    val recs = XmlRead.readRecords(spark, Seq(oaiPath), Some("//oai:record"), OaiNs)
      .select("xml").collect().map(_.getString(0))
    assert(extract(recs(0), "//title", OaiNs) === Seq.empty)
  }

  test("escape → parse → extract round-trips arbitrary XML-safe text") {
    // the x01 oracle depends on this property: esc(s) embedded in an
    // element must extract back to exactly s
    val rnd = new scala.util.Random(11)
    val pool = "ab <>&\"' &amp; x&#xFFFD;y <tag> ]]> é中文 \n\t"
    for (_ <- 1 to 40) {
      val s = Seq.fill(rnd.nextInt(30) + 1)(pool(rnd.nextInt(pool.length))).mkString
      val escaped = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      val got = extract(s"<d>$escaped</d>", "/d")
      // to_text joins non-blank descendant text; an all-whitespace or empty
      // payload yields a single empty-joined value
      val want = if (s.forall(Character.isWhitespace)) Seq("") else Seq(s)
      assert(got === want, s"round trip failed for ${s.map(_.toInt)}")
    }
  }

  test("x01/x02 queries survive markup characters in every embedded column") {
    // regression: lang/source were embedded unescaped inside the <name>
    // blocks, so an '&' or '<' in those columns made malformed XML and
    // failed the whole query on other corpora
    val dir = Files.createTempDirectory("xmlesc").toString
    spark.range(1).select(
        lit(7L).as("doc_id"),
        lit("a & b <tag> \"q\"").as("text"),
        lit("l&<g").as("lang"),
        lit("s<&>rc").as("source"),
        lit(10L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val x1 = graft.queries.XmlQueries.queries("x01_xpath_extract")(spark, dir).collect()
    assert(x1.length == 1)
    assert(x1.head.getString(1) == "s<&>rc")
    assert(x1.head.getString(2) == "a & b <tag> \"q\"")
    val x2 = graft.queries.XmlQueries.queries("x02_xpath_totext")(spark, dir).collect()
    assert(x2.head.getString(1) == "l&<g s<&>rc|s<&>rc l&<g")
    assert(x2.head.getInt(2) == 2)
  }

  test("extract_xpath: ns override merge (indexer_test 'namespaces to extract_xpath')") {
    // default namespaces carry a wrong uri for edm; per-call ns wins
    val xml = """<r xmlns:e="http://right.example/"><e:rights>CC</e:rights></r>"""
    val defaults = Map("e" -> "http://wrong.example/")
    val merged = defaults ++ Map("e" -> "http://right.example/")
    assert(extract(xml, "//e:rights", defaults) === Seq.empty)
    assert(extract(xml, "//e:rights", merged) === Seq("CC"))
  }
}
