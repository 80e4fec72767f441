package graft.functions

import graft.SparkSpec

class RobotsSpec extends SparkSpec {

  private def allowed(txt: String, path: String, agent: String = "graftbot") =
    RobotsKernel.allowed(txt, agent, path)
  private def delay(txt: String, agent: String = "graftbot") =
    Option(RobotsKernel.crawlDelay(txt, agent)).map(_.doubleValue)

  test("group selection: named prefix beats *, longest named wins, merge") {
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graft
        |Disallow: /a/
        |
        |User-agent: graftbot
        |Disallow: /b/
        |Crawl-delay: 1.5
        |
        |User-agent: graftbot
        |Disallow: /c/
        |""".stripMargin
    // longest matching named value is "graftbot": BOTH graftbot groups
    // merge; the * group and the shorter "graft" prefix group are out
    assert(!allowed(txt, "/b/x"))
    assert(!allowed(txt, "/c/x"))
    assert(allowed(txt, "/a/x"))
    assert(allowed(txt, "/anything"))
    assert(delay(txt).contains(1.5))
    // an agent matching only the shorter prefix gets that group
    assert(!allowed(txt, "/a/x", agent = "graftling"))
    assert(allowed(txt, "/b/x", agent = "graftling"))
    // an unrelated agent falls back to *
    assert(!allowed(txt, "/anything", agent = "otherbot"))
    assert(delay(txt, agent = "otherbot").isEmpty)
    // case-insensitive on both sides
    assert(!allowed(txt, "/b/x", agent = "GraftBot"))
  }

  test("rule matching: longest pattern wins, allow wins ties, wildcards, $") {
    val txt =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/public/
        |Disallow: /*.pdf$
        |Allow: /tie
        |Disallow: /tie
        |""".stripMargin
    assert(!allowed(txt, "/private/x"))
    assert(allowed(txt, "/private/public/x")) // longer allow wins
    assert(!allowed(txt, "/docs/file.pdf"))   // wildcard + anchor
    assert(allowed(txt, "/docs/file.pdfx"))   // $ anchors: no match
    assert(allowed(txt, "/docs/file.pdf/"))
    assert(allowed(txt, "/tie"))              // equal length: allow wins
    assert(allowed(txt, "/other"))            // no rule -> allowed
    // '*' spans path segments; multiple stars
    val w = "User-agent: *\nDisallow: /a/*/c*e\n"
    assert(!allowed(w, "/a/bb/cde"))
    assert(!allowed(w, "/a/b/b/cxxxe-and-more"))
    assert(allowed(w, "/a/bb/cd"))
  }

  test("line model: comments, CRLF, BOM, unknown directives, empty rules") {
    val txt = "﻿User-agent: graftbot # our crawler\r\n" +
      "Sitemap: http://x/s.xml\r\n" +
      "Disallow: /x/ # block\r\n" +
      "Disallow:\r\n" + // empty pattern: unrestricted, dropped
      "Unknown-directive: whatever\r\n"
    assert(!allowed(txt, "/x/1"))
    assert(allowed(txt, "/y"))
    // rules before any user-agent line are ignored
    assert(allowed("Disallow: /\nUser-agent: nobody\nDisallow: /z/", "/q"))
    // bad crawl-delay value: unset, not an error
    assert(delay("User-agent: *\nCrawl-delay: soon").isEmpty)
    // null/empty robots: crawl default
    assert(RobotsKernel.allowed(null, "graftbot", "/a"))
    assert(allowed("", "/a"))
  }

  test("Sitemap: directives extract in file order, deduped; broken values drop") {
    val txt = "﻿# seeds\n" +
      "User-agent: *\nDisallow: /private/\n" +
      "Sitemap: http://a.example/s1.xml\r\n" +
      "sitemap: https://a.example/s2.xml # trailing comment\n" +
      "Sitemap: /relative-broken.xml\n" +
      "Sitemap: ftp://a.example/nope.xml\n" +
      "Sitemap:\n" + // empty value
      "Sitemap: http://a.example/s1.xml\n" // duplicate
    assert(RobotsKernel.sitemaps(txt).toSeq == Seq(
      "http://a.example/s1.xml", "https://a.example/s2.xml"))
    // the directive is group-independent: inside a foreign UA group too
    assert(RobotsKernel.sitemaps(
      "User-agent: nobody\nSitemap: http://b.example/x.xml\n").toSeq ==
      Seq("http://b.example/x.xml"))
    assert(RobotsKernel.sitemaps(null).isEmpty)
    assert(RobotsKernel.sitemaps("").isEmpty)
    assert(RobotsKernel.sitemaps("User-agent: *\nDisallow: /\n").isEmpty)
    // and extracting it never disturbs rule matching (it never did —
    // regression pin for the parser sharing)
    assert(!allowed("User-agent: *\nSitemap: http://x/s.xml\nDisallow: /p/", "/p/x"))
  }

  test("graft_robots_sitemaps SQL registration evaluates and is null-safe") {
    import spark.implicits._
    val got = Seq(
      (1L, "Sitemap: http://h.example/a.xml\nSitemap: http://h.example/b.xml"),
      (2L, "User-agent: *\nDisallow: /"),
      (3L, null.asInstanceOf[String])).toDF("id", "robots")
      .selectExpr("id", "graft_robots_sitemaps(robots) AS sm")
      .orderBy("id").collect()
    assert(got(0).getAs[scala.collection.Seq[String]]("sm").toList ==
      List("http://h.example/a.xml", "http://h.example/b.xml"))
    assert(got(1).getAs[scala.collection.Seq[String]]("sm").isEmpty)
    assert(got(2).isNullAt(1), "null robots -> null (no file, nothing known)")
  }

  test("SQL registrations evaluate and are null-safe") {
    import spark.implicits._
    val txt = "User-agent: *\nDisallow: /private/\nCrawl-delay: 3"
    val df = Seq(
      (1L, txt, "/private/x"),
      (2L, txt, "/open/x"),
      (3L, null.asInstanceOf[String], "/any")).toDF("id", "robots", "path")
    val got = df.selectExpr("id",
        "graft_robots_allowed(robots, path, 'graftbot') AS ok",
        "graft_robots_crawl_delay(robots, 'graftbot') AS cd")
      .orderBy("id").collect()
    assert(!got(0).getBoolean(1) && got(0).getDouble(2) == 3.0)
    assert(got(1).getBoolean(1))
    assert(got(2).getBoolean(1), "null robots.txt = allowed")
    assert(got(2).isNullAt(2))
    val n = df.limit(1).selectExpr(
      "graft_robots_allowed(robots, CAST(NULL AS STRING), 'a')").collect()(0)
    assert(n.isNullAt(0), "null path -> null")
  }
}
