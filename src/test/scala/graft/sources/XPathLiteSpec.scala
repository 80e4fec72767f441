package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Equivalence pin for the XPathLite DOM walker vs javax XPath — the
  * fast path must be indistinguishable (same nodes, same order) on
  * every xpath shape it accepts, and must REJECT (fall back) on shapes
  * outside its grammar rather than misinterpreting them. */
class XPathLiteSpec extends AnyFunSuite {

  private val Sm = Map("sm" -> "http://www.sitemaps.org/schemas/sitemap/0.9")
  private val G = Map("g" -> "urn:graft:rec", "dc" -> "http://purl.org/dc/elements/1.1/",
    "oai" -> "http://www.openarchives.org/OAI/2.0/")

  private def viaJavax(xml: String, xpath: String, ns: Map[String, String]): Seq[String] = {
    val b = XmlDom.newDocumentBuilder()
    val doc = XmlDom.parse(b, xml.getBytes("UTF-8"))
    XmlDom.evalNodes(XmlDom.compileXPath(xpath, ns), doc).map(XmlDom.nodeToText)
  }

  private def viaLite(xml: String, xpath: String, ns: Map[String, String]): Option[Seq[String]] =
    XPathLite.compile(xpath, ns).map { c =>
      val b = XmlDom.newDocumentBuilder()
      val doc = XmlDom.parse(b, xml.getBytes("UTF-8"))
      c.eval(doc).map(XmlDom.nodeToText)
    }

  private def assertSame(xml: String, xpath: String, ns: Map[String, String]): Unit = {
    val lite = viaLite(xml, xpath, ns)
    assert(lite.isDefined, s"walker rejected supported xpath: $xpath")
    assert(lite.get == viaJavax(xml, xpath, ns), s"mismatch on $xpath")
  }

  private val sitemap =
    """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<url><loc>http://a/1</loc><lastmod>2026-01-01</lastmod></url>
      |<url><loc>http://a/2</loc></url>
      |<url><loc>http://a/3</loc><lastmod>2026-01-15</lastmod></url>
      |</urlset>""".stripMargin
  private val index =
    """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<sitemap><loc>http://a/a.xml</loc><lastmod>2026-01-01</lastmod></sitemap>
      |<sitemap><loc>http://a/b.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin
  private val rec =
    """<g:rec xmlns:g="urn:graft:rec" id="r-9">
      |<name><first>José</first><last>Lopez</last></name>
      |<name><first>B</first></name>
      |<g:src>alpha</g:src><g:body>the body text</g:body>
      |</g:rec>""".stripMargin
  private val oai =
    """<oai:root xmlns:oai="http://www.openarchives.org/OAI/2.0/"
      | xmlns:dc="http://purl.org/dc/elements/1.1/">
      |<oai:record><dc:title>T1</dc:title></oai:record>
      |<wrap><oai:record><dc:title>T2</dc:title><dc:title>T3</dc:title></oai:record></wrap>
      |</oai:root>""".stripMargin

  test("the full registry xpath inventory agrees with javax") {
    for (i <- 1 to 3) {
      assertSame(sitemap, s"/sm:urlset/sm:url[$i]/sm:loc", Sm)
      assertSame(sitemap, s"/sm:urlset/sm:url[$i]/sm:lastmod", Sm)
    }
    assertSame(sitemap, "/sm:urlset/sm:url[4]/sm:loc", Sm) // past the end: empty
    assertSame(sitemap, "/sm:urlset/sm:url", Sm)
    assertSame(index, "/sm:sitemapindex", Sm)
    assertSame(index, "/sm:sitemapindex/sm:sitemap/sm:loc", Sm)
    assertSame(sitemap, "/sm:sitemapindex", Sm)  // wrong root: empty
    assertSame(rec, "/g:rec/name", G)
    assertSame(rec, "/g:rec/g:src", G)
    assertSame(rec, "//name/first", G)
    assertSame(rec, "//g:body", G)
    assertSame(oai, "//oai:record/dc:title", G)
  }

  test("attribute steps: unprefixed = no-namespace attr; value semantics") {
    val lite = viaLite(rec, "/g:rec/@id", G)
    assert(lite.isDefined && lite.get == viaJavax(rec, "/g:rec/@id", G))
    assert(lite.get == Seq("r-9"))
  }

  test("unprefixed element steps match NO-namespace elements only (XPath 1.0)") {
    // 'url' without prefix must NOT match default-ns sitemap entries
    assertSame(sitemap, "/urlset/url/loc", Sm)
    assert(viaLite(sitemap, "/urlset/url/loc", Sm).get.isEmpty)
    // but matches genuinely un-namespaced elements
    assertSame(rec, "//name/last", G)
  }

  test("document order matches javax on nested descendant matches") {
    val nested =
      """<r><a><name><first>1</first></name>
        |<deep><name><first>2</first><first>3</first></name></deep></a>
        |<name><first>4</first></name></r>""".stripMargin
    assertSame(nested, "//name/first", Map.empty)
    assert(viaLite(nested, "//name/first", Map.empty).get == Seq("1", "2", "3", "4"))
  }

  test("unsupported shapes are rejected (fallback), never misread") {
    val ns = Sm
    for (xp <- Seq(
        "sm:urlset/sm:url",          // relative
        "/sm:urlset//sm:loc",        // internal descent
        "//sm:url[2]",               // positional on descendant head
        "/sm:urlset/*",              // wildcard
        "/sm:urlset/sm:url[last()]", // function predicate
        "/sm:urlset/sm:url[@x='1']", // attribute predicate
        "/a/b | /c/d",               // union
        "/a/../b",                   // parent axis
        "/a/text()",                 // node-type test
        "/sm:urlset/nope:loc"))      // unknown prefix -> javax raises
      assert(XPathLite.compile(xp, ns).isEmpty, s"should reject: $xp")
  }

  test("literal [0] and oversized positions fall back to javax (r19 ADVICE)") {
    // XPath 1.0: e[0] is the EMPTY node-set — the walker's pos=0 sentinel
    // means "all matches", so a literal [0] must compile to None (javax
    // then returns the correct empty result), never be misread as "all".
    assert(XPathLite.compile("/sm:urlset/sm:url[0]/sm:loc", Sm).isEmpty)
    assert(XPathLite.compile("/sm:urlset/sm:url[0]", Sm).isEmpty)
    assert(XPathLite.compile("/sm:urlset/sm:url[00]", Sm).isEmpty)
    // positions longer than 9 digits would overflow Int — fallback, not a
    // NumberFormatException out of compile()
    assert(XPathLite.compile("/sm:urlset/sm:url[12345678901]", Sm).isEmpty)
    // the javax path agrees: [0] selects nothing
    val xml = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>u</loc></url></urlset>"""
    assert(viaJavax(xml, "/sm:urlset/sm:url[0]/sm:loc", Sm).isEmpty)
    // sanity: [1] stays in-grammar and matches
    assert(viaLite(xml, "/sm:urlset/sm:url[1]/sm:loc", Sm).get == Seq("u"))
  }

  test("randomized sitemap corpora agree with javax on the hot paths") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 60) {
      val nUrls = rnd.nextInt(5)
      val body = (1 to nUrls).map { i =>
        val lastmod = if (rnd.nextBoolean()) s"<lastmod>2026-0${1 + rnd.nextInt(9)}-01</lastmod>" else ""
        s"<url><loc>http://s${rnd.nextInt(7)}.com/$i</loc>$lastmod</url>"
      }.mkString
      val xml = s"""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">$body</urlset>"""
      for (i <- 1 to math.max(1, nUrls)) {
        assertSame(xml, s"/sm:urlset/sm:url[$i]/sm:loc", Sm)
        assertSame(xml, s"/sm:urlset/sm:url[$i]/sm:lastmod", Sm)
      }
      assertSame(xml, "/sm:urlset/sm:url", Sm)
      assertSame(xml, "//sm:loc", Sm)
    }
  }
}
