package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.XPathExtractExpression.extractXpath

/** Generic-XML extraction surface (SURVEY.md §2.3 `extract_xpath`, §2.1
  * NokogiriReader): namespaced XML is synthesized per row from the
  * documents table, then extracted back via [[graft.functions.XPathExtractExpression]];
  * the DuckDB oracle recomputes the same values straight from the parquet
  * columns, so the XML build → parse → XPath → to_text round trip is
  * hash-checked end-to-end (escaping included).
  */
object XmlQueries extends QueryPack {

  private val Ns = Map("g" -> "http://graft.example/ns")

  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** One namespaced XML doc per documents row. */
  private def docXml(s: SparkSession, d: String): DataFrame =
    Tables.documentsBalanced(s, d).select(
      col("doc_id"),
      concat(
        lit("<g:rec xmlns:g=\"http://graft.example/ns\" id=\""), col("doc_id"), lit("\">"),
        lit("<g:src>"), esc(col("source")), lit("</g:src>"),
        lit("<g:body>"), esc(col("text")), lit("</g:body>"),
        lit("<name><first>"), esc(col("lang")), lit("</first><last>"), esc(col("source")),
        lit("</last></name>"),
        lit("<name><first>"), esc(col("source")), lit("</first><last>"), esc(col("lang")),
        lit("</last></name>"),
        lit("</g:rec>")).as("xml"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // attribute + namespaced-element extraction, escaped-text round trip
    "x01_xpath_extract" -> ((s, d) => {
      // sort on the SOURCE doc_id, not the parsed @id (they are equal;
      // the parsed value is still emitted and hash-checked per row):
      // ordering by a derived column makes the range-partitioner's
      // sampling pass execute the whole parse pipeline a second time,
      // while a scan column lets sampling prune to one parquet column —
      // the XML parse then runs exactly once
      docXml(s, d).select(
          element_at(extractXpath(col("xml"), "/g:rec/@id", Ns), 1)
            .cast("long").as("doc_id"),
          element_at(extractXpath(col("xml"), "/g:rec/g:src", Ns), 1).as("src"),
          element_at(extractXpath(col("xml"), "//g:body", Ns), 1).as("body"),
          col("doc_id").as("_oid"))
        .orderBy("_oid").drop("_oid")
    }),

    // non-terminal elements: each match joins its descendant text with
    // spaces (nokogiri_macros.rb:28-38 "José Lopez" semantics), and
    // multi-match ordering is document order
    "x02_xpath_totext" -> ((s, d) => {
      docXml(s, d).select(
          col("doc_id"),
          array_join(extractXpath(col("xml"), "/g:rec/name", Ns), "|").as("names"),
          size(extractXpath(col("xml"), "//name/first", Ns)).as("n_first"))
        .orderBy("doc_id")
    }),

    // sitemap.xml parsing (crawl discovery — the companion to the t49
    // robots gate; robots' `Sitemap:` directive points here): each
    // synthesized sitemap carries three <url> entries in the sitemaps.org
    // namespace, the middle one WITHOUT <lastmod> (the alignment trap:
    // parallel //loc and //lastmod extractions would mis-pair — the
    // per-entry positional XPath keeps loc/lastmod paired; `get()` turns
    // the missing match into NULL, ANSI-safe)
    "x03_sitemap" -> ((s, d) => {
      val Sm = Map("sm" -> "http://www.sitemaps.org/schemas/sitemap/0.9")
      val k = (col("doc_id") % 7).cast("string")
      val id = col("doc_id").cast("string")
      val m = ((col("doc_id") % 9) + 1).cast("string")
      val xml = concat(
        lit("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
          "<url><loc>http://s"), k, lit(".com/a/"), id,
        lit("</loc><lastmod>2026-0"), m, lit("-01</lastmod></url>" +
          "<url><loc>http://s"), k, lit(".com/b/"), id,
        lit("</loc></url><url><loc>http://s"), k, lit(".com/c/"), id,
        lit("</loc><lastmod>2026-01-15</lastmod></url></urlset>"))
      def entry(i: Int) = struct(
        get(extractXpath(col("xml"),
          s"/sm:urlset/sm:url[$i]/sm:loc", Sm), lit(0)).as("loc"),
        get(extractXpath(col("xml"),
          s"/sm:urlset/sm:url[$i]/sm:lastmod", Sm), lit(0)).as("lastmod"))
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"), xml.as("xml"))
        .select(col("doc_id"),
          posexplode(array(entry(1), entry(2), entry(3))).as(Seq("pos", "e")))
        .select(col("doc_id"), col("pos"),
          col("e.loc").as("loc"), col("e.lastmod").as("lastmod"))
        .orderBy("doc_id", "pos")
    }),

    // <sitemapindex> RECURSION (x03's missing half — real sites over 50k
    // URLs nest sitemaps): per doc, a root index lists a.xml + b.xml;
    // a.xml is a 2-entry urlset (second entry missing <lastmod> — the
    // variable-count pairing trap raw-fragment parsing must survive);
    // b.xml is a urlset for most docs but ANOTHER index (spec-forbidden,
    // crawler-tolerated nesting) pointing at c.xml when doc_id%10==0.
    // Sitemaps.expand resolves the chain as bounded-depth lookup joins
    // against the fetched corpus; the oracle states the grid analytically
    "x04_sitemap_index" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val k = (col("doc_id") % 7).cast("string")
      val m = ((col("doc_id") % 9) + 1).cast("string")
      def u(name: String) =
        concat(lit("http://s"), k, lit(".com/sm/"), id, lit("/"), lit(name))
      val base = Tables.documentsBalanced(s, d).select(col("doc_id"))
      val SmOpen = "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
      val IxOpen = "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
      val index = base.select(u("index.xml").as("url"), concat(
        lit(IxOpen + "<sitemap><loc>"), u("a.xml"),
        lit("</loc><lastmod>2026-01-01</lastmod></sitemap><sitemap><loc>"),
        u("b.xml"), lit("</loc></sitemap></sitemapindex>")).as("xml"))
      val a = base.select(u("a.xml").as("url"), concat(
        lit(SmOpen + "<url><loc>http://s"), k, lit(".com/p/"), id,
        lit("/1</loc><lastmod>2026-0"), m, lit("-01</lastmod></url>" +
          "<url><loc>http://s"), k, lit(".com/p/"), id,
        lit("/2</loc></url></urlset>")).as("xml"))
      val b = base.select(u("b.xml").as("url"),
        when(col("doc_id") % 10 === 0, concat(
          lit(IxOpen + "<sitemap><loc>"), u("c.xml"),
          lit("</loc></sitemap></sitemapindex>")))
        .otherwise(concat(
          lit(SmOpen + "<url><loc>http://s"), k, lit(".com/p/"), id,
          lit("/3</loc><lastmod>2026-01-15</lastmod></url></urlset>")))
        .as("xml"))
      val c = base.filter(col("doc_id") % 10 === 0)
        .select(u("c.xml").as("url"), concat(
          lit(SmOpen + "<url><loc>http://s"), k, lit(".com/p/"), id,
          lit("/4</loc></url></urlset>")).as("xml"))
      val docs = index.unionByName(a).unionByName(b).unionByName(c)
      val roots = base.select(u("index.xml").as("url"))
      graft.ops.Sitemaps.expand(roots, docs, maxDepth = 3)
        .select(
          regexp_extract(col("root"), "/sm/(\\d+)/", 1).cast("long")
            .as("doc_id"),
          regexp_extract(col("sitemap"), "/([a-z]+\\.xml)$", 1).as("sitemap"),
          col("loc"), col("lastmod"))
        .orderBy("doc_id", "sitemap", "loc")
    }),

    // robots `Sitemap:` discovery composed END-TO-END (sitemaps.org
    // #submit_robots: the directive is the standard discovery seed):
    // per-HOST robots.txt carries the directive (plus a broken relative
    // one the extractor must drop and a duplicate it must dedupe) →
    // robotsSitemaps() seeds the roots → Sitemaps.expand resolves the
    // host index (one child urlset per doc, built by a 7-key groupBy)
    // → each discovered page url re-gates against its host's robots
    // (broadcast join on domain — 7 small texts) → the fetchable
    // frontier. The /private/ entry per doc is DISCOVERED but dropped
    // by the gate; only robots-clean urls survive.
    "x05_robots_discovery" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val k = (col("doc_id") % 7).cast("string")
      val m = ((col("doc_id") % 9) + 1).cast("string")
      val base = Tables.documentsBalanced(s, d).select(col("doc_id"))
      val SmOpen = "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
      val IxOpen = "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
      val host = concat(lit("s"), k, lit(".com"))
      val indexUrl = concat(lit("http://"), host, lit("/sitemap-index.xml"))
      val childUrl = concat(lit("http://"), host, lit("/sm/a-"), id, lit(".xml"))
      // one robots per HOST (the production shape): directive names the
      // host's index; a relative directive is broken (dropped); the
      // duplicate dedupes
      val robotsTable = base
        .select(host.as("domain"), indexUrl.as("sm")).distinct()
        .select(col("domain"), concat(
          lit("User-agent: *\nDisallow: /private/\n\nSitemap: "), col("sm"),
          lit("\nSitemap: /broken-relative.xml\nSitemap: "), col("sm"),
          lit("\n")).as("robots"))
      val roots = robotsTable.select(explode(
        graft.functions.RobotsExpressions.robotsSitemaps(col("robots")))
        .as("url")).distinct()
      // fetched corpus: 7 host indexes (each listing its docs' child
      // urlsets, document order by doc_id) + one 3-entry urlset per doc
      val index = base
        .select(host.as("domain"), col("doc_id"),
          concat(lit("<sitemap><loc>"), childUrl, lit("</loc></sitemap>"))
            .as("frag"))
        .groupBy(col("domain"))
        .agg(concat(lit(IxOpen),
          concat_ws("", array_sort(collect_list(struct(col("doc_id"),
            col("frag")))).getField("frag")),
          lit("</sitemapindex>")).as("xml"))
        .select(concat(lit("http://"), col("domain"),
          lit("/sitemap-index.xml")).as("url"), col("xml"))
      val children = base.select(childUrl.as("url"), concat(
        lit(SmOpen + "<url><loc>http://s"), k, lit(".com/p/"), id,
        lit("/1</loc><lastmod>2026-0"), m, lit("-01</lastmod></url>" +
          "<url><loc>http://s"), k, lit(".com/private/"), id,
        lit("/2</loc></url><url><loc>http://s"), k, lit(".com/p/"), id,
        lit("/3</loc></url></urlset>")).as("xml"))
      val corpus = index.unionByName(children)
      val entries = graft.ops.Sitemaps.expand(roots, corpus, maxDepth = 2)
      entries
        .select(col("loc"), col("lastmod"),
          regexp_extract(col("loc"), "^[a-z]+://([^/]+)", 1).as("domain"),
          regexp_replace(col("loc"), "^[a-z]+://[^/]+", "").as("path"))
        .join(broadcast(robotsTable), Seq("domain"))
        .filter(graft.functions.RobotsExpressions.robotsAllowed(
          col("robots"), col("path"), lit("graftbot")))
        .select(
          regexp_extract(col("loc"), "/(\\d+)/\\d+$", 1).cast("long")
            .as("doc_id"),
          col("loc"), col("lastmod"))
        .orderBy("doc_id", "loc")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x01_xpath_extract" ->
      "SELECT doc_id, source AS src, text AS body FROM documents ORDER BY doc_id",

    "x02_xpath_totext" ->
      """SELECT doc_id,
              lang || ' ' || source || '|' || source || ' ' || lang AS names,
              2 AS n_first
         FROM documents ORDER BY doc_id""",

    // the three planted entries per sitemap, positionally: entry 1
    // carries the doc-derived month, entry 2 has no lastmod (NULL),
    // entry 3 a fixed date
    "x03_sitemap" ->
      """SELECT doc_id, CAST(pos AS INT) AS pos,
           CASE pos
             WHEN 0 THEN 'http://s' || (doc_id % 7) || '.com/a/' || doc_id
             WHEN 1 THEN 'http://s' || (doc_id % 7) || '.com/b/' || doc_id
             ELSE 'http://s' || (doc_id % 7) || '.com/c/' || doc_id
           END AS loc,
           CASE pos
             WHEN 0 THEN '2026-0' || ((doc_id % 9) + 1) || '-01'
             WHEN 1 THEN NULL
             ELSE '2026-01-15'
           END AS lastmod
         FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS p(pos)
         ORDER BY doc_id, pos""",

    // the resolved grid: a.xml yields entries /1 (doc-derived lastmod)
    // and /2 (none) for every doc; b.xml yields /3 except for %10==0
    // docs, whose b.xml is a nested index resolving to c.xml's /4
    "x04_sitemap_index" ->
      """WITH p AS (
           SELECT doc_id, 'http://s' || (doc_id % 7) || '.com/p/' || doc_id AS pre
           FROM documents)
         SELECT doc_id, sitemap, loc, lastmod FROM (
           SELECT doc_id, 'a.xml' AS sitemap, pre || '/1' AS loc,
                  '2026-0' || ((doc_id % 9) + 1) || '-01' AS lastmod FROM p
           UNION ALL
           SELECT doc_id, 'a.xml', pre || '/2', NULL FROM p
           UNION ALL
           SELECT doc_id, 'b.xml', pre || '/3', '2026-01-15' FROM p
           WHERE doc_id % 10 <> 0
           UNION ALL
           SELECT doc_id, 'c.xml', pre || '/4', NULL FROM p
           WHERE doc_id % 10 = 0)
         ORDER BY doc_id, sitemap, loc""",

    // the fetchable frontier: per doc, /p/<id>/1 (doc-derived lastmod)
    // and /p/<id>/3 (none) survive; the discovered /private/<id>/2 is
    // dropped by the robots gate
    "x05_robots_discovery" ->
      """WITH p AS (
           SELECT doc_id, 'http://s' || (doc_id % 7) || '.com/p/' || doc_id AS pre
           FROM documents)
         SELECT doc_id, loc, lastmod FROM (
           SELECT doc_id, pre || '/1' AS loc,
                  '2026-0' || ((doc_id % 9) + 1) || '-01' AS lastmod FROM p
           UNION ALL
           SELECT doc_id, pre || '/3', NULL FROM p)
         ORDER BY doc_id, loc"""
  )
}
