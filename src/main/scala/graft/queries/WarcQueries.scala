package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextAnalysis
import graft.sinks.WarcWriter

/** WARC entry-path queries: the 100 TB design point's input format,
  * graded end-to-end. The fixture is generated DETERMINISTICALLY from
  * the documents table (one `response` + one `request` record per doc,
  * split across plain `.warc` shards and a record-per-member
  * `.warc.gz`), so the DuckDB oracle can assemble the expected output
  * analytically from the same parquet — the reader, HTTP envelope
  * parse, charset decode, and curation chain are all on the hook.
  *
  * w02's three charset families make decode correctness OBSERVABLE:
  * cp1252 bytes declared in the HTTP Content-Type header, cp1252 bytes
  * declared only by an HTML `<meta charset>` (the prescan path), and
  * bare UTF-8 (the default path). Each family's text carries a
  * non-ASCII marker (`café` / `señor`) whose bytes are NOT valid UTF-8
  * — a decoder that ignores the declared charset produces U+FFFD and
  * the oracle's tail probe catches it. */
object WarcQueries extends QueryPack {

  private def fixtureDir(d: String, tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_warc_${tag}_${d.replaceAll("[^A-Za-z0-9]", "_")}").getAbsolutePath

  /** The fixture is a pure function of the documents table, so a
    * completed build (marker present AND the source parquet unchanged —
    * the marker records the source files' name/length/mtime, checked
    * driver-side with zero Spark jobs) is reused: repeated query
    * construction pays the generation jobs once, not per call, and a
    * regenerated testdata dir invalidates the cache. */
  private def sourceToken(d: String): String = {
    val files = Option(new java.io.File(d, "documents.parquet").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .sortBy(_.getName)
    files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("\n")
  }

  private def built(dir: String, d: String): Boolean = {
    val f = new java.io.File(dir, "_GRAFT_FIXTURE_COMPLETE")
    f.exists() && {
      val recorded = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      recorded == sourceToken(d)
    }
  }

  private def markBuilt(dir: String, d: String): Unit = {
    val f = new java.io.File(dir, "_GRAFT_FIXTURE_COMPLETE")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, sourceToken(d).getBytes("UTF-8"))
  }

  /** Clear any stale/partial previous build before regenerating. */
  private def resetDir(dir: String): Unit = {
    val root = new java.io.File(dir)
    if (root.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
    }
  }

  private val WarcCols =
    Seq("record_id", "warc_type", "target_uri", "warc_date", "content_type", "payload")

  /** One response (status 200, or 404 when doc_id%11==0) + one request
    * record per document; doc_id%5==4 goes to the gz shard. */
  private def buildW01(s: SparkSession, d: String): String = {
    val dir = fixtureDir(d, "w01")
    if (built(dir, d)) return dir
    resetDir(dir)
    val docs = Tables.documents(s, d)
    val uri = concat(lit("http://www.site"), col("doc_id") % 7,
      lit(".example.co.uk/articles/"), col("doc_id"))
    val status = when(col("doc_id") % 11 === 0, 404).otherwise(200).cast("string")
    val html = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
    val responses = docs.select(
      concat(lit("<urn:uuid:doc-"), col("doc_id"), lit(">")).as("record_id"),
      lit("response").as("warc_type"),
      uri.as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      lit("application/http; msgtype=response").as("content_type"),
      encode(concat(lit("HTTP/1.1 "), status,
        lit(" OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"), html),
        "UTF-8").as("payload"),
      col("doc_id"))
    val requests = docs.select(
      concat(lit("<urn:uuid:req-"), col("doc_id"), lit(">")).as("record_id"),
      lit("request").as("warc_type"),
      uri.as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      lit("application/http; msgtype=request").as("content_type"),
      encode(concat(lit("GET /articles/"), col("doc_id"),
        lit(" HTTP/1.1\r\nHost: h\r\n\r\n")), "UTF-8").as("payload"),
      col("doc_id"))
    val all = responses.unionByName(requests)
    WarcWriter.write(
      all.filter(col("doc_id") % 5 =!= 4).select(WarcCols.map(col): _*)
        .repartition(3), s"$dir/plain")
    WarcWriter.write(
      all.filter(col("doc_id") % 5 === 4).select(WarcCols.map(col): _*)
        .coalesce(1), s"$dir/gz", gzip = true)
    markBuilt(dir, d)
    dir
  }

  /** Three charset families (see class doc); every payload is a full
    * HTTP response whose html wraps the family-marked text. */
  private def buildW02(s: SparkSession, d: String): String = {
    val dir = fixtureDir(d, "w02")
    if (built(dir, d)) return dir
    resetDir(dir)
    val docs = Tables.documents(s, d)
    val fam = col("doc_id") % 3
    val text2 = when(fam === 0, concat(col("text"), lit(" café")))
      .when(fam === 1, concat(col("text"), lit(" señor")))
      .otherwise(col("text"))
    val meta = when(fam === 1, lit("<meta charset=\"windows-1252\">"))
      .otherwise(lit(""))
    val html = concat(lit("<html><head>"), meta,
      lit("</head><body><p>"), text2, lit("</p></body></html>"))
    val headerCt = when(fam === 0, lit("text/html; charset=windows-1252"))
      .otherwise(lit("text/html"))
    // cp1252 families carry Latin-1 bytes (é=0xE9, ñ=0xF1 — identical in
    // ISO-8859-1 and windows-1252 for these points); fam 2 is UTF-8
    val body = when(fam === 2, encode(html, "UTF-8"))
      .otherwise(encode(html, "ISO-8859-1"))
    val envelope = concat(
      encode(concat(lit("HTTP/1.1 200 OK\r\nContent-Type: "), headerCt,
        lit("\r\n\r\n")), "UTF-8"),
      body)
    val rows = docs.select(
      concat(lit("<urn:uuid:doc-"), col("doc_id"), lit(">")).as("record_id"),
      lit("response").as("warc_type"),
      concat(lit("http://crawl.example.org/articles/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      lit("application/http; msgtype=response").as("content_type"),
      envelope.as("payload"))
    WarcWriter.write(rows.select(WarcCols.map(col): _*).repartition(3),
      s"$dir/warc")
    markBuilt(dir, d)
    dir
  }

  /** Frontier → fetch executor → WARC archive, fixture-cached like
    * w01/w02. The frontier is a pure function of the documents table
    * (seven hosts, one URL per doc); the injectable transport is the
    * deterministic [[graft.crawl.SyntheticCorpusTransport]], so every
    * archived byte is analytic. Small batchSize forces SEVERAL
    * commit-marker batches even at sf0.001 — the exactly-once machinery
    * is on the graded path, not just in its spec. */
  private def buildW03(s: SparkSession, d: String): String = {
    // tag bumped r16: the fixture gained planted /r/ redirects — a new
    // dir name self-invalidates stale caches on any host (the marker
    // tokens only the SOURCE parquet, not the fixture-generator code)
    val dir = fixtureDir(d, "w03r2")
    if (built(dir, d)) return dir
    resetDir(dir)
    // %13 docs enter the frontier as /r/<id> urls: the synthetic
    // transport 301-redirects them (relative Location) to /a/<id>, so
    // the executor's redirect following — resolve, re-fetch, archive
    // the FINAL response under the ORIGINAL target-uri — is on the
    // graded path (a %13 ∩ %17 doc redirects onto a 404, also graded)
    val frontier = Tables.documents(s, d).select(
      concat(lit("http://www.d"), col("doc_id") % 7,
        when(col("doc_id") % 13 === 0, lit(".org/r/"))
          .otherwise(lit(".org/a/")),
        col("doc_id")).as("url"))
    graft.crawl.Fetch.run(frontier, s"$dir/out", checkpointDir = null,
      cfg = graft.crawl.Fetch.Config(
        transportClass = classOf[graft.crawl.SyntheticCorpusTransport].getName,
        batchSize = 200L,
        warcDate = "2026-01-01T00:00:00Z"))
    markBuilt(dir, d)
    dir
  }

  /** The multimodal WARC fixture (w04): one response per document whose
    * body is the mm02 synthetic media payload (real PNG/JPEG header
    * bytes, planted dims, %97 truncated garbage), plus the mm07
    * PixelPlants pairs as `/plant/a/<id>` / `/plant/b/<id>` records —
    * the crawl-shaped packaging of the verified multimodal parts. */
  private def buildW04(s: SparkSession, d: String): String = {
    val dir = fixtureDir(d, "w04")
    if (built(dir, d)) return dir
    resetDir(dir)
    import s.implicits._
    def rec(uri: org.apache.spark.sql.Column,
            media: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
      lit(null).cast("string").as("record_id"),
      lit("response").as("warc_type"),
      uri.as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      lit("application/http; msgtype=response").as("content_type"),
      concat(encode(
        lit("HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n"),
        "UTF-8"), media).as("payload"))
    val corpus = OpsQueries.syntheticMedia(s, d).select(rec(
      concat(lit("http://img.example.org/media/"), col("doc_id")),
      col("payload")): _*)
    val plants = (0 to 9).map { k =>
      val (a, b) = PixelPlants.pair(k)
      (k, a, b)
    }.toDF("cls", "pa", "pb")
    val family = Tables.documents(s, d).select(col("doc_id"))
      .filter(col("doc_id") % 11 === 0 && col("doc_id").between(0, 99))
      .join(broadcast(plants), col("doc_id") === col("cls") * 11)
    val plantRecs = family.select(rec(
        concat(lit("http://img.example.org/plant/a/"), col("doc_id")),
        col("pa")): _*)
      .unionByName(family.select(rec(
        concat(lit("http://img.example.org/plant/b/"), col("doc_id")),
        col("pb")): _*))
    WarcWriter.write(corpus.unionByName(plantRecs).repartition(2),
      s"$dir/warc")
    markBuilt(dir, d)
    dir
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WARC read-back: mixed plain (splittable) + record-per-member gz
    // shards; warc_type equality pushes down (requests are IO-skipped),
    // the HTTP envelope parses off, and the payload body round-trips
    // byte-for-byte — the oracle assembles every column analytically
    "w01_warc_roundtrip" -> ((s, d) => {
      val dir = buildW01(s, d)
      s.read.format("warc").load(s"$dir/plain", s"$dir/gz")
        .filter(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "articles/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("target_uri"),
          col("http_status"),
          col("http_content_type"),
          col("content_length"),
          col("payload").cast("string").as("body"))
        .orderBy("doc_id")
    }),

    // the 100 TB entry path END-TO-END: WARC bytes → charset-sniffed
    // decode (header param / meta prescan / UTF-8 default) → htmlInput
    // curation (extract → exact dedup → LSH near-dup → components →
    // gates). The tail6 probe pins the decode: a wrong charset turns
    // the families' non-ASCII markers into U+FFFD and the hash breaks
    "w02_warc_curate" -> ((s, d) => {
      val dir = buildW02(s, d)
      val decoded = s.read.format("warc").load(s"$dir/warc")
        .filter(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "articles/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          TextAnalysis.decodeHttpText(col("payload"), col("http_content_type"))
            .as("text"))
      // lang rides in the corpus table; production would carry it as a
      // WARC header or classify post-extract (t02) — id join here keeps
      // the oracle exact
      val withLang = decoded
        .join(Tables.documents(s, d).select("doc_id", "lang"), Seq("doc_id"))
      val emptyBenchmark = s.range(0).selectExpr("CAST(null AS STRING) AS text")
      graft.examples.CurationPipeline.curate(withLang, emptyBenchmark,
          cfg = graft.examples.CurationPipeline.Config(
            htmlInput = true, cacheWorkingSet = true))
        .select(col("doc_id"), expr("right(text, 6)").as("tail6"))
        .orderBy("doc_id")
    }),

    // the crawl loop CLOSED: frontier → fetch executor (politeness
    // partitioning, retry machinery, batch commit-log exactly-once) →
    // WARC archive → read back through the DSv2 source with the HTTP
    // envelope parsed off. The oracle replays the synthetic server
    // analytically — any fetch dropped, duplicated, or mis-archived by
    // the batch/restart machinery breaks rows or hash
    "w03_crawl_fetch" -> ((s, d) => {
      val dir = buildW03(s, d)
      s.read.format("warc").load(s"$dir/out")
        .filter(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "/[ar]/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("target_uri").as("url"),
          col("http_status"),
          col("http_content_type"),
          col("payload").cast("string").as("body"))
        .orderBy("doc_id")
    }),

    // the multimodal twin of w02, crawl-shaped end to end: WARC response
    // records carrying image bytes → HTTP envelope parse → pixel dHash
    // near-dup (mm07's machinery over the crawl, +5M plant members of
    // surfaced same-class pairs drop) → survivors sharded to WebDataset
    // → shards read back and header-decoded (mm02's machinery over the
    // round-tripped bytes). Every output row is analytic: corpus dims
    // are the mm02 plant, /plant/a survivors decode as the 9×8 PNG,
    // the lone /plant/b survivor (class 8, distance past the threshold)
    // is a BMP the header decoder honestly reports as unknown
    "w04_warc_media" -> ((s, d) => {
      val dir = buildW04(s, d)
      val id = regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("long")
      val media = s.read.format("warc").load(s"$dir/warc")
        .filter(col("warc_type") === "response")
        .select(
          when(col("target_uri").contains("/plant/a/"), id + 4000000L)
            .when(col("target_uri").contains("/plant/b/"), id + 5000000L)
            .otherwise(id).as("media_id"),
          col("payload"))
      val drops = graft.ops.Multimodal
        .pixelNearDupPairs(media, "media_id", "payload", maxDistance = 7)
        .filter(col("id_a") >= 4000000L &&
          col("id_b") === col("id_a") + 1000000L)
        .select(col("id_b").as("media_id"))
      val survivors = media.join(drops, Seq("media_id"), "left_anti")
      graft.sinks.WebDatasetWriter.writeShards(
        survivors.withColumn("key", col("media_id").cast("string")),
        s"$dir/wds", "key", Seq("bin" -> col("payload")), numShards = 4)
      val back = s.read.format("webdataset").option("path", s"$dir/wds").load()
        .select(col("key").cast("long").as("media_id"),
          element_at(col("entries"), "bin").as("payload"))
      graft.ops.Multimodal.decodeHeaders(back, "media_id", "payload")
        .select(col("media_id"), col("format").as("fmt"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy("media_id")
    }),

    // the crawl loop closed over DISCOVERY (w03 fetches a known
    // frontier; here the frontier is discovered by crawling): seeds →
    // fetch → parse outlinks from the fetched HTML → canonicalize →
    // visited anti-join → next round, bounded depth. The synthetic web
    // is a pure function of the URL, so the oracle states the whole
    // min-depth reachable set with a recursive CTE — any URL fetched
    // twice, dropped, mis-resolved, or discovered at the wrong depth
    // breaks rows or hash
    "w05_crawl_bfs" -> ((s, d) => {
      val seeds = Tables.documents(s, d).select(
        concat(lit("http://site"), (col("doc_id") % 5).cast("string"),
          lit(".test/p/"), (col("doc_id") % 32).cast("string")).as("url"))
      graft.crawl.Crawl.bfs(seeds,
          graft.crawl.Fetch.Config(transportClass =
            classOf[graft.crawl.SyntheticWebTransport].getName),
          maxDepth = 3)
        .select(col("url"), col("depth"), col("status"),
          md5(col("body")).as("body_md5"))
        .orderBy("url")
    }))

  def oracleSql: Map[String, String] = Map(

    // envelope arithmetic: status line 17 B + Content-Type line 40 B +
    // blank line 2 B = 59; html wrapper 33 B; text is ASCII so chars==bytes
    "w01_warc_roundtrip" ->
      """SELECT doc_id,
           'http://www.site' || (doc_id % 7) || '.example.co.uk/articles/'
             || doc_id AS target_uri,
           CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS INT)
             AS http_status,
           'text/html; charset=utf-8' AS http_content_type,
           CAST(59 + 33 + length(text) AS BIGINT) AS content_length,
           '<html><body><p>' || text || '</p></body></html>' AS body
         FROM documents ORDER BY doc_id""",

    // independent replay of decode + curation: family texts assembled
    // analytically (the decode is correct IFF the curated text equals
    // them), then the t45 chain — exact dedup, brute-force jaccard
    // pairs, recursive components with min-id survivors, quality/dup3/
    // language gates — and the tail probe
    "w02_warc_curate" ->
      """WITH RECURSIVE docs0 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' café'
                  WHEN doc_id % 3 = 1 THEN text || ' señor'
                  ELSE text END AS text,
             lang
           FROM documents),
         ex AS (
           SELECT doc_id, text, lang FROM (
             SELECT doc_id, text, lang,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             FROM docs0) t WHERE rn = 1),
         shq AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(w) < 3
               THEN [array_to_string(w, ' ')]
               ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
             END) s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM ex) g),
         pairs AS (
           SELECT a.doc_id AS a, b.doc_id AS b
           FROM shq a JOIN shq b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
         bidir AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT a AS id FROM bidir),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT bidir.b, reach.r FROM bidir JOIN reach ON bidir.a = reach.id),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         undup AS (
           SELECT e.doc_id, e.text, e.lang FROM ex e
           WHERE e.doc_id NOT IN
             (SELECT id FROM comp WHERE id <> component))
         SELECT doc_id, right(text, 6) AS tail6 FROM undup
         WHERE round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) * 0.4
             + least(round(length(replace(text, ' ', '')) * 1.0 / len(string_split(trim(text), ' ')), 4) / 8.0, 1.0) * 0.3
             + least(round(len(list_filter(string_split(trim(text), ' '),
                 x -> list_contains(['the','a','an','and','or','of','to','in','is','was','it','for','on','with','as','by','at','this','that','be'], x))) * 1.0
                 / len(string_split(trim(text), ' ')), 4) * 4.0, 1.0) * 0.3 >= 0.3
           AND (CASE WHEN len(string_split(text, ' ')) < 3 THEN 0.0
                ELSE round(1.0 - len(list_distinct(
                       [array_to_string(string_split(text, ' ')[i:i+2], ' ')
                        for i in range(1, len(string_split(text, ' ')) - 1)]
                     )) * 1.0 / (len(string_split(text, ' ')) - 2), 4) END) <= 0.5
           AND lang IN ('en', 'es', 'de', 'fr')
         ORDER BY doc_id""",

    // the synthetic server stated analytically: 404 family at
    // doc_id%17==0, 200 html everywhere else, body a pure function of
    // (doc_id, host)
    // %13 docs were fetched via a /r/ 301 redirect: the archive keys
    // them under the ORIGINAL /r/ url, with the FINAL /a/ response
    "w03_crawl_fetch" ->
      """SELECT doc_id,
           'http://www.d' || (doc_id % 7) || '.org/'
             || CASE WHEN doc_id % 13 = 0 THEN 'r' ELSE 'a' END
             || '/' || doc_id AS url,
           CAST(CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS INT)
             AS http_status,
           CASE WHEN doc_id % 17 = 0 THEN 'text/plain'
                ELSE 'text/html; charset=utf-8' END AS http_content_type,
           CASE WHEN doc_id % 17 = 0 THEN 'not found'
                ELSE '<html><body><p>page ' || doc_id || ' of www.d'
                  || (doc_id % 7) || '.org</p></body></html>'
           END AS body
         FROM documents ORDER BY doc_id""",

    // analytic survivors grid: every corpus record survives (mm02's
    // planted dims; %97 truncated-garbage family decodes unknown);
    // /plant/a records all survive as 9×8 PNGs; /plant/b records drop
    // at classes 0..7 (distance ≤ 7) and 9 (lossy re-encode, distance
    // 0) — only class 8 (doc 88) survives, a BMP the header decoder
    // reports unknown
    "w04_warc_media" ->
      """SELECT media_id, fmt, width, height FROM (
           SELECT doc_id AS media_id,
             CASE WHEN doc_id % 97 = 0 THEN 'unknown'
                  WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
             CAST(CASE WHEN doc_id % 97 = 0 THEN -1
                  ELSE doc_id % 4096 + 1 END AS BIGINT) AS width,
             CAST(CASE WHEN doc_id % 97 = 0 THEN -1
                  ELSE n_chars % 4096 + 1 END AS BIGINT) AS height
           FROM documents
           UNION ALL
           SELECT doc_id + 4000000, 'png', CAST(9 AS BIGINT), CAST(8 AS BIGINT)
           FROM documents WHERE doc_id % 11 = 0 AND doc_id BETWEEN 0 AND 99
           UNION ALL
           SELECT doc_id + 5000000, 'unknown', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
           FROM documents WHERE doc_id = 88)
         ORDER BY media_id""",

    // independent BFS replay: the synthetic web's link function
    // ((2i+5)%N, (3i+1)%N, host hop; 404s at i%13=0 emit no links —
    // SyntheticWebTransport.body, constants H=5 N=400) expanded to the
    // bounded-depth closure by a recursive CTE, min depth per node, and
    // the page bytes restated character-for-character under md5
    "w05_crawl_bfs" ->
      """WITH RECURSIVE
         seeds AS (
           SELECT DISTINCT (doc_id % 5) AS h, (doc_id % 32) AS id
           FROM documents),
         kinds AS (SELECT unnest([0, 1, 2]) AS k),
         reach AS (
           SELECT h, id, 0 AS depth FROM seeds
           UNION
           SELECT CASE WHEN k.k = 2 THEN (r.h + 1) % 5 ELSE r.h END,
                  CASE WHEN k.k = 0 THEN (2 * r.id + 5) % 400
                       WHEN k.k = 1 THEN (3 * r.id + 1) % 400
                       ELSE r.id END,
                  r.depth + 1
           FROM reach r CROSS JOIN kinds k
           WHERE r.depth < 3 AND r.id % 13 <> 0),
         nodes AS (SELECT h, id, MIN(depth) AS depth FROM reach GROUP BY h, id)
         SELECT 'http://site' || h || '.test/p/' || id AS url,
           CAST(depth AS INT) AS depth,
           CAST(CASE WHEN id % 13 = 0 THEN 404 ELSE 200 END AS INT) AS status,
           md5(CASE WHEN id % 13 = 0 THEN 'gone'
             ELSE '<html><body><h1>node ' || h || '/' || id
               || '</h1><a href="/p/' || (2 * id + 5) % 400
               || '">x</a> <a href="/p/' || (3 * id + 1) % 400
               || '">y</a> <a href="http://site' || (h + 1) % 5
               || '.test/p/' || id || '">hop</a></body></html>'
           END) AS body_md5
         FROM nodes ORDER BY url"""
  )
}
