package graft.ops

import graft.SparkSpec

/** Sitemap-index expansion pins beyond x04's oracle: unfetched children
  * contribute nothing (they're next-round frontier, not errors), cycles
  * terminate at maxDepth, and an index nested past maxDepth stays
  * unexpanded instead of looping. */
class SitemapsSpec extends SparkSpec {

  private val Sm = "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
  private val Ix = "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"

  private def urlset(locs: (String, Option[String])*): String =
    Sm + locs.map { case (l, lm) =>
      s"<url><loc>$l</loc>${lm.map(d => s"<lastmod>$d</lastmod>").getOrElse("")}</url>"
    }.mkString + "</urlset>"

  private def index(children: String*): String =
    Ix + children.map(c => s"<sitemap><loc>$c</loc></sitemap>").mkString +
      "</sitemapindex>"

  test("expand resolves nesting, skips unfetched children, terminates on cycles") {
    import spark.implicits._
    val docs = Seq(
      // root -> (child1: urlset, child2: nested index, ghost: NOT fetched)
      ("http://x.example/root.xml",
        index("http://x.example/c1.xml", "http://x.example/c2.xml",
          "http://x.example/ghost.xml")),
      ("http://x.example/c1.xml",
        urlset("http://x.example/p/1" -> Some("2026-01-01"),
          "http://x.example/p/2" -> None)),
      ("http://x.example/c2.xml", index("http://x.example/c3.xml")),
      ("http://x.example/c3.xml", urlset("http://x.example/p/3" -> None)),
      // a self-cycle: must terminate, contribute nothing
      ("http://y.example/loop.xml", index("http://y.example/loop.xml"))
    ).toDF("url", "xml")
    val roots = Seq("http://x.example/root.xml", "http://y.example/loop.xml")
      .toDF("url")
    val got = Sitemaps.expand(roots, docs, maxDepth = 3)
      .collect()
      .map(r => (r.getAs[String]("root"), r.getAs[String]("sitemap"),
        r.getAs[String]("loc"), Option(r.getAs[String]("lastmod"))))
      .sortBy(t => (t._2, t._3))
    assert(got.toSeq == Seq(
      ("http://x.example/root.xml", "http://x.example/c1.xml",
        "http://x.example/p/1", Some("2026-01-01")),
      ("http://x.example/root.xml", "http://x.example/c1.xml",
        "http://x.example/p/2", None),
      ("http://x.example/root.xml", "http://x.example/c3.xml",
        "http://x.example/p/3", None)))
  }

  test("an entry missing <loc> drops instead of failing the job under ANSI mode") {
    import spark.implicits._
    val xml = Sm + "<url><lastmod>2026-01-01</lastmod></url>" + // loc-less
      "<url><loc>http://m.example/ok</loc></url></urlset>"
    val docs = Seq(("http://m.example/s.xml", xml)).toDF("url", "xml")
    val roots = Seq("http://m.example/s.xml").toDF("url")
    val got = Sitemaps.expand(roots, docs).select("loc").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("http://m.example/ok"))
  }

  test("expand leaves no checkpoint residue beyond its own result (GraphSpec discipline)") {
    import spark.implicits._
    val sc = spark.sparkContext
    def settled(): Int = {
      // let async unpersist RPCs and the ContextCleaner queue drain —
      // the assertion is about what the operator freed DETERMINISTICALLY
      System.gc()
      Thread.sleep(200)
      sc.getPersistentRDDs.size
    }
    val before = settled()
    val docs = Seq(
      ("http://r.example/root.xml", index("http://r.example/c.xml")),
      ("http://r.example/c.xml", urlset("http://r.example/p/1" -> None))
    ).toDF("url", "xml")
    val roots = Seq("http://r.example/root.xml").toDF("url")
    val got = Sitemaps.expand(roots, docs, maxDepth = 3)
    assert(got.count() == 1)
    // the classification checkpoint must have been released by expand
    // itself; only the eagerly-materialized result may remain (r15: the
    // unreleased checkpoint accumulated per call until the whole
    // session's unified pool degraded — the x04 pass-2 18×)
    val residue = settled() - before
    assert(residue <= 1, s"expand left $residue persisted RDDs (want <= 1: its own result)")
    // and after the caller drops the result, GC + ContextCleaner can
    // reclaim everything — the session returns to baseline
  }

  test("an index nested past maxDepth stays unexpanded (bounded recursion)") {
    import spark.implicits._
    val docs = Seq(
      ("http://d.example/i0.xml", index("http://d.example/i1.xml")),
      ("http://d.example/i1.xml", index("http://d.example/i2.xml")),
      ("http://d.example/i2.xml", urlset("http://d.example/deep" -> None))
    ).toDF("url", "xml")
    val roots = Seq("http://d.example/i0.xml").toDF("url")
    // depth 3: i0 -> i1 -> i2's entries emit
    assert(Sitemaps.expand(roots, docs, maxDepth = 3).count() == 1)
    // depth 2: the chain stops at i2 before its entries emit
    assert(Sitemaps.expand(roots, docs, maxDepth = 2).count() == 0)
  }
}
