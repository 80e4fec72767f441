package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Deterministic 3-page fake OAI feed (2 records per page, resumption
  * tokens t1, t2, then exhausted) — top-level with a no-arg constructor so
  * the source can instantiate it by class name on any executor. */
class FakeOaiFetcher extends OaiPageFetcher {
  def fetch(token: Option[String]): (Seq[String], Option[String]) = token match {
    case None       => (Seq("<record>r1</record>", "<record>r2</record>"), Some("t1"))
    case Some("t1") => (Seq("<record>r3</record>", "<record>r4</record>"), Some("t2"))
    case Some("t2") => (Seq("<record>r5</record>"), None)
    case other      => throw new IllegalStateException(s"unexpected token $other")
  }
}

/** Growable fake feed for checkpoint-restart tests: pages come from a
  * JVM-static buffer so a test can extend the feed between runs; every
  * fetch call is counted so tests can pin the fetch-per-page contract. */
class GrowingOaiFetcher extends OaiPageFetcher {
  def fetch(token: Option[String]): (Seq[String], Option[String]) = {
    GrowingOaiFetcher.fetchCount.incrementAndGet()
    val pages = GrowingOaiFetcher.pages.get()
    val idx = token.map(_.toInt).getOrElse(0)
    val next = if (idx + 1 < pages.length) Some((idx + 1).toString) else None
    (pages(idx), next)
  }
}
object GrowingOaiFetcher {
  val pages = new java.util.concurrent.atomic.AtomicReference[Vector[Seq[String]]](Vector.empty)
  val fetchCount = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Sink for the failure-injection test: records one entry per foreachBatch
  * invocation (batchId, delivered ids) and, while armed, crashes AFTER a
  * partial side effect — the worst case for a non-transactional sink. */
object CrashingBatchSink {
  val attempts = new java.util.concurrent.CopyOnWriteArrayList[(Long, Vector[Long])]()
  @volatile var armed = false
  def reset(): Unit = { attempts.clear(); armed = false }
}

/** Pages of marc-in-json lines for the streaming→Solr end-to-end test. */
class MarcPageFetcher extends OaiPageFetcher {
  def fetch(token: Option[String]): (Seq[String], Option[String]) = {
    val pages = MarcPageFetcher.pages
    val idx = token.map(_.toInt).getOrElse(0)
    (pages(idx), if (idx + 1 < pages.length) Some((idx + 1).toString) else None)
  }
}
object MarcPageFetcher { @volatile var pages: Vector[Seq[String]] = Vector.empty }

class StreamingSpec extends SparkSpec {

  test("oai-paged → DemoIndexer → SolrJsonSink delivers each doc exactly once across restart") {
    import graft.sinks.{FakeTransport, SolrJsonSink}
    val recs = graft.marc.Fixtures.records("test_data.utf8").take(6)
    MarcPageFetcher.pages = recs.grouped(2).map(_.map(graft.marc.MarcJson.write)).toVector // 3 pages
    FakeTransport.queue.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("solr_stream_ckpt").toString
    val settings = SolrJsonSink.Settings("http://s/core", batchSize = 100)
    val transport = new FakeTransport()

    def runOnce(oneBatch: Boolean): Unit = {
      val stream = spark.readStream.format("oai-paged")
        .option("fetcher", classOf[MarcPageFetcher].getName)
        .option("maxPagesPerTrigger", "1")
        .load()
      val q = StreamingSolr.start(stream, ckpt,
        b => graft.examples.DemoIndexer.index(StreamingSolr.marcJsonRecords(b)),
        settings, transport, oneBatch = oneBatch)
      try { if (oneBatch) q.awaitTermination() else q.processAllAvailable() }
      finally q.stop()
    }

    runOnce(oneBatch = true)  // page 0 committed
    runOnce(oneBatch = true)  // page 1 committed
    runOnce(oneBatch = false) // restart from checkpoint: only page 2 remains

    import scala.jdk.CollectionConverters._
    val posts = FakeTransport.queue.asScala.toVector
    val postedIds = posts.filter(_._1.contains("/update"))
      .flatMap(p => """"id":\["([^"]*)"""".r.findAllMatchIn(p._2).map(_.group(1)))
    val wantIds = recs.map(r => "bib_" + r.fields.head.value)
    assert(postedIds.sorted == wantIds.sorted.toVector,
      s"each doc exactly once: got ${postedIds.sorted}")
    assert(!posts.exists(_._1.contains("commit=true")), "no commit during batches")

    StreamingSolr.commit(settings, transport)
    assert(FakeTransport.queue.asScala.exists(_._1 == "http://s/core/update?commit=true"))
  }

  test("oai-paged XML records → extract_xpath → Solr (the reference's marquee flow)") {
    import graft.sinks.{FakeTransport, SolrJsonSink}
    import graft.functions.XPathExtractExpression.extractXpath
    // OAI-shaped XML records in pages, extracted with namespaced xpaths
    val ns = Map("dc" -> "http://purl.org/dc/elements/1.1/")
    val recXml = (i: Int) =>
      s"""<record xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
        s"<dc:identifier>oai-$i</dc:identifier><dc:title>Title $i</dc:title></record>"
    MarcPageFetcher.pages = Vector(Seq(recXml(1), recXml(2)), Seq(recXml(3)))
    FakeTransport.queue.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("oai_xml_ckpt").toString
    val stream = spark.readStream.format("oai-paged")
      .option("fetcher", classOf[MarcPageFetcher].getName)
      .option("maxPagesPerTrigger", "1").load()
    val q = StreamingSolr.start(stream, ckpt,
      batch => batch.select(
        extractXpath(col("record"), "//dc:identifier", ns).as("id"),
        extractXpath(col("record"), "//dc:title", ns).as("title_display")),
      SolrJsonSink.Settings("http://s/core"), new FakeTransport())
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val ids = FakeTransport.queue.asScala.toVector
      .flatMap(p => """oai-\d""".r.findAllIn(p._2))
    assert(ids.sorted == Vector("oai-1", "oai-2", "oai-3"))
  }

  test("oai-paged restart from checkpoint delivers only new pages, no replays") {
    // Interrupted-harvest restart with 3 committed pages and a LIVE token:
    // the restored (page, token) offset must floor the probe cursor, so a
    // regressing latestOffset would re-deliver pages 0..2 — the exact
    // failure mode a 2-page test masks.
    GrowingOaiFetcher.pages.set(Vector(
      Seq("p0a", "p0b"), Seq("p1a"), Seq("p2a"), Seq("p3a", "p3b"), Seq("p4a")))
    GrowingOaiFetcher.fetchCount.set(0)
    val ckpt = java.nio.file.Files.createTempDirectory("oai_ckpt").toString
    val received = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())

    def runOnce(oneBatch: Boolean): Unit = {
      val writer = spark.readStream.format("oai-paged")
        .option("fetcher", classOf[GrowingOaiFetcher].getName)
        .option("maxPagesPerTrigger", "1")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.collect().foreach(r => received.add(r.getString(0)))
        }
        .outputMode(OutputMode.Append())
      val q = if (oneBatch)
        writer.trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
      else writer.start()
      try {
        if (oneBatch) q.awaitTermination() else q.processAllAvailable()
      } finally q.stop()
    }

    // run 1: three single-batch runs commit pages 0..2; token "3" is live
    (1 to 3).foreach(_ => runOnce(oneBatch = true))
    assert(received.toArray(Array.empty[String]).toVector == Vector("p0a", "p0b", "p1a", "p2a"))
    assert(GrowingOaiFetcher.fetchCount.get() == 3,
      "3 committed pages must mean exactly 3 fetches")

    // restart from the checkpoint and drain: only pages 3..4 may arrive
    val fetchesBefore = GrowingOaiFetcher.fetchCount.get()
    runOnce(oneBatch = false)
    val fetchesInRun2 = GrowingOaiFetcher.fetchCount.get() - fetchesBefore
    val all = received.toArray(Array.empty[String]).toVector
    assert(all == Vector("p0a", "p0b", "p1a", "p2a", "p3a", "p3b", "p4a"),
      s"committed pages must not replay and nothing may be lost: $all")
    // no probe-from-zero, no O(P²) chain replay: the 2 remaining pages cost
    // exactly 2 fetches (the restored token resumes the chain in place)
    assert(fetchesInRun2 == 2, s"expected 2 fetches for 2 new pages, got $fetchesInRun2")
  }

  test("oai-paged fetches each page exactly once (no chain replay)") {
    GrowingOaiFetcher.pages.set(Vector(Seq("a1"), Seq("b1", "b2"), Seq("c1"), Seq("d1")))
    GrowingOaiFetcher.fetchCount.set(0)
    val before = GrowingOaiFetcher.fetchCount.get()
    val stream = spark.readStream.format("oai-paged")
      .option("fetcher", classOf[GrowingOaiFetcher].getName)
      .option("maxPagesPerTrigger", "1")
      .load()
    val query = stream.writeStream.format("memory").queryName("oai_once")
      .outputMode(OutputMode.Append()).start()
    try {
      query.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM oai_once").head().getLong(0)
      assert(n == 5)
      val fetches = GrowingOaiFetcher.fetchCount.get() - before
      assert(fetches == 4, s"4 pages must mean exactly 4 fetches, got $fetches")
    } finally query.stop()
  }

  test("crash recovery: a planned-but-uncommitted batch refetches by chaining from its start token") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    GrowingOaiFetcher.pages.set(Vector(Seq("c0"), Seq("c1a", "c1b"), Seq("c2")))
    GrowingOaiFetcher.fetchCount.set(0)
    // instance 1: the engine probes 3 pages and plans 3 batches, but only
    // batches 0 and 1 commit before the "crash"
    val s1 = new PagedMicroBatchStream(classOf[GrowingOaiFetcher].getName, 1)
    val o0 = s1.initialOffset().asInstanceOf[PageOffset]
    val o1 = s1.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[PageOffset]
    val o2 = s1.latestOffset(o1, ReadLimit.allAvailable()).asInstanceOf[PageOffset]
    val o3 = s1.latestOffset(o2, ReadLimit.allAvailable()).asInstanceOf[PageOffset]
    assert(s1.planInputPartitions(o0, o1).length == 1)
    assert(s1.planInputPartitions(o1, o2).length == 1)
    s1.commit(o1); s1.commit(o2)
    assert(GrowingOaiFetcher.fetchCount.get() == 3, "probe fetches each page once")

    // instance 2 = restarted driver: the offset log holds start=o2 (last
    // committed) and end=o3 (the pending batch); its page cache is empty,
    // so planning must chain-fill from o2's token — exactly one refetch
    val s2 = new PagedMicroBatchStream(classOf[GrowingOaiFetcher].getName, 1)
    val start = s2.deserializeOffset(o2.json()).asInstanceOf[PageOffset]
    val end = s2.deserializeOffset(o3.json()).asInstanceOf[PageOffset]
    val parts = s2.planInputPartitions(start, end)
    assert(parts.length == 1)
    assert(parts.head.asInstanceOf[PagePartition].records.toSeq == Seq("c2"))
    assert(GrowingOaiFetcher.fetchCount.get() == 4, "exactly one refetch for the pending batch")

    // and the restored floor: latestOffset from the pending end never
    // regresses even though this instance probed nothing before it
    val next = s2.latestOffset(end, ReadLimit.allAvailable()).asInstanceOf[PageOffset]
    assert(next.page >= end.page, s"latestOffset must not regress: $next < $end")
  }

  test("PageOffset json round-trips tokens with escapes") {
    val off = PageOffset(7, Some("""tok "quoted" \ back"""))
    assert(PageOffset.fromJson(off.json()) == off)
    assert(PageOffset.fromJson(PageOffset(3, None).json()) == PageOffset(3, None))
    assert(PageOffset.fromJson("""{"page":5}""") == PageOffset(5, None))
  }

  test("oai-paged micro-batch source streams every page exactly once") {
    val stream = spark.readStream.format("oai-paged")
      .option("fetcher", classOf[FakeOaiFetcher].getName)
      .option("maxPagesPerTrigger", "1")
      .load()
    val query = stream.writeStream
      .format("memory").queryName("oai_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      query.processAllAvailable()
      val rows = spark.sql("SELECT record FROM oai_out ORDER BY record")
        .collect().map(_.getString(0)).toVector
      assert(rows == (1 to 5).map(i => s"<record>r$i</record>").toVector)
    } finally query.stop()
  }

  test("oai-paged checkpointed offsets replay deterministically") {
    // second run from scratch sees the same 5 records (token chain replay)
    val stream = spark.readStream.format("oai-paged")
      .option("fetcher", classOf[FakeOaiFetcher].getName)
      .option("maxPagesPerTrigger", "2")
      .load()
    val query = stream.writeStream.format("memory").queryName("oai_out2")
      .outputMode(OutputMode.Append()).start()
    try {
      query.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM oai_out2").head().getLong(0) == 5)
    } finally query.stop()
  }

  test("HttpOaiPageFetcher XML extraction (records + resumption token)") {
    val f = new HttpOaiPageFetcher("http://x")
    val xml =
      """<OAI-PMH><ListRecords>
        |<record><header/><metadata>a</metadata></record>
        |<record status="deleted">b</record>
        |<resumptionToken cursor="0">tokABC</resumptionToken>
        |</ListRecords></OAI-PMH>""".stripMargin
    assert(f.extractRecords(xml).size == 2)
    assert(f.extractToken(xml).contains("tokABC"))
    assert(f.extractToken("<OAI-PMH><resumptionToken/></OAI-PMH>").isEmpty)
    assert(f.extractToken("<OAI-PMH></OAI-PMH>").isEmpty)
  }

  test("selective-harvest URL composition (set/from/until) and resumption stripping") {
    // convenience composer: only provided params appear, values URL-encoded
    assert(HttpOaiPageFetcher.listRecordsUrl("http://ex.org/oai") ==
      "http://ex.org/oai?verb=ListRecords&metadataPrefix=oai_dc")
    assert(HttpOaiPageFetcher.listRecordsUrl("http://ex.org/oai",
        metadataPrefix = "marc21", set = Some("maps & charts"),
        from = Some("2020-01-01"), until = Some("2020-12-31")) ==
      "http://ex.org/oai?verb=ListRecords&metadataPrefix=marc21" +
        "&set=maps+%26+charts&from=2020-01-01&until=2020-12-31")
    // resumption pages keep ONLY verb + resumptionToken, per the OAI-PMH
    // spec (oai_pmh_nokogiri_reader.rb:92-99): set/from/until must drop
    val f = new HttpOaiPageFetcher(HttpOaiPageFetcher.listRecordsUrl(
      "http://ex.org/oai", set = Some("s1"), from = Some("2020-01-01")))
    assert(f.resumptionUrl("t/ok=1") ==
      "http://ex.org/oai?verb=ListRecords&resumptionToken=t%2Fok%3D1")
    // a non-ListRecords start verb is preserved on resumption
    val f2 = new HttpOaiPageFetcher("http://ex.org/oai?verb=ListIdentifiers&metadataPrefix=oai_dc")
    assert(f2.resumptionUrl("x") ==
      "http://ex.org/oai?verb=ListIdentifiers&resumptionToken=x")
  }

  test("legacy base-URL configs normalize to a default ListRecords request") {
    import HttpOaiPageFetcher.normalizeStartUrl
    // a bare base URL would issue a verb-less request whose OAI error
    // response harvests zero records silently — normalize appends defaults
    assert(normalizeStartUrl("http://ex.org/oai") ==
      "http://ex.org/oai?verb=ListRecords&metadataPrefix=oai_dc")
    assert(normalizeStartUrl("http://ex.org/oai?apikey=k") ==
      "http://ex.org/oai?apikey=k&verb=ListRecords&metadataPrefix=oai_dc")
    // full start URLs (the documented contract) pass through verbatim
    val full = "http://ex.org/oai?verb=ListIdentifiers&metadataPrefix=marc21"
    assert(normalizeStartUrl(full) == full)
    assert(normalizeStartUrl("") == "")
  }

  test("HttpOaiPageFetcher drives a set-scoped paged harvest over real HTTP with gzip") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    def page(recs: Seq[String], token: Option[String]): String =
      s"""<OAI-PMH><ListRecords>${recs.map(r => s"<record>$r</record>").mkString}""" +
        token.map(t => s"<resumptionToken>$t</resumptionToken>").getOrElse("") +
        "</ListRecords></OAI-PMH>"
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/oai", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        hits.add(q)
        // page 1 only when the set filter arrived; page 2 via token
        val body =
          if (q.contains("resumptionToken=page2")) page(Seq("c", "d"), None)
          else if (q.contains("set=maps")) page(Seq("a", "b"), Some("page2"))
          else page(Seq("WRONG-SET"), None)
        val gzip = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
          .exists(_.contains("gzip"))
        val raw = body.getBytes("UTF-8")
        val out =
          if (gzip) {
            val bos = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(bos)
            gz.write(raw); gz.close()
            ex.getResponseHeaders.add("Content-Encoding", "gzip")
            bos.toByteArray
          } else raw
        ex.sendResponseHeaders(200, out.length.toLong)
        ex.getResponseBody.write(out)
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val f = new HttpOaiPageFetcher(HttpOaiPageFetcher.listRecordsUrl(
        s"http://127.0.0.1:$port/oai", set = Some("maps")))
      val (p1, t1) = f.fetch(None)
      assert(p1 == Seq("<record>a</record>", "<record>b</record>"))
      assert(t1.contains("page2"))
      val (p2, t2) = f.fetch(t1)
      assert(p2 == Seq("<record>c</record>", "<record>d</record>"))
      assert(t2.isEmpty)
      import scala.jdk.CollectionConverters._
      val qs = hits.asScala.toVector
      assert(qs.head.contains("set=maps"), "start request must carry the set")
      assert(!qs(1).contains("set="), "resumption request must drop the set")
    } finally server.stop(0)
  }

  test("windowed stats with watermark over the events table (batch parity)") {
    val events = graft.Tables.events(spark, sfSmoke)
      .select(timestamp_micros(col("ts_us")).as("ts"),
        col("event_type"), col("value"))
    val out = EventPipelines.windowedStats(events, window_ = "1 hour")
    val rows = out.orderBy("window_start", "event_type").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == events.count())
  }

  test("windowed stats runs as a real stream with watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val query = EventPipelines.windowedStats(df, watermark = "0 seconds", window_ = "1 minute")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:10"), "view", 1.0),
        (Timestamp.valueOf("2024-01-01 00:00:20"), "view", 2.0))
      query.processAllAvailable()
      // advance event time past the window so append-mode emits it
      mem.addData((Timestamp.valueOf("2024-01-01 00:05:00"), "view", 9.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM win_out").collect()
      assert(rows.exists(r => r.getAs[Long]("n") == 2 && r.getAs[Double]("sum_value") == 3.0))
    } finally query.stop()
  }

  test("streaming exact dedup drops repeated content within the watermark window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingCuration.dedupExact(docs, "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "alpha beta gamma"),
        (Timestamp.valueOf("2024-01-01 00:00:02"), 2L, "different text entirely"),
        (Timestamp.valueOf("2024-01-01 00:00:03"), 3L, "alpha beta gamma"))
      query.processAllAvailable()
      // a later batch re-sending the same content is still suppressed
      mem.addData((Timestamp.valueOf("2024-01-01 00:10:00"), 4L, "alpha beta gamma"))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L))
    } finally query.stop()
  }

  test("composed gates on one stream: exact dedup chains into multi-band near-dup") {
    // Spark disallows redefining the event-time watermark, so a chain
    // sets it once (the upstream gate) and passes assumeWatermarked
    // downstream — the StreamBench production shape
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val chained = StreamingCuration.nearDupSuppressMultiBand(
      StreamingCuration.dedupExact(docs, "text", "ts", watermark = "1 hour"),
      "text", "ts", assumeWatermarked = true)
    val query = chained.writeStream.format("memory").queryName("chain_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:01"), 1L, base),
        (Timestamp.valueOf("2024-01-01 00:00:02"), 2L, base), // exact dup
        (Timestamp.valueOf("2024-01-01 00:00:03"), 3L, base + " extra"), // near dup
        (Timestamp.valueOf("2024-01-01 00:00:04"), 4L,
          "completely unrelated content about database systems and query planners"))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM chain_out").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(1L, 4L),
        s"chain must drop the exact dup (2) and the near dup (3): $ids")
    } finally query.stop()
  }

  test("streaming near-dup suppression drops band-colliding docs, keeps distinct ones") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingCuration.nearDupSuppress(docs, "text", "ts")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:01"), 1L, base),
        (Timestamp.valueOf("2024-01-01 00:00:02"), 2L, base), // exact dup: all minhashes equal
        (Timestamp.valueOf("2024-01-01 00:00:03"), 3L, "completely unrelated content about database systems and query planners"))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM neardup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L))
    } finally query.stop()
  }

  test("multi-band streaming near-dup matches the batch banding on a replayed stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (bands, rows, n) = (4, 2, 3)
    // 20 distinct originals; every original is followed later in the
    // stream by a near-duplicate (one word swapped near the end: high
    // jaccard, so at least one of the 4 bands collides w.h.p.) and by
    // one exact duplicate (all bands collide with certainty)
    val rnd = new scala.util.Random(5)
    val originals = (1L to 20L).map { i =>
      i -> (1 to 24).map(_ => s"w${rnd.nextInt(400)}").mkString(" ")
    }
    val nearDups = originals.map { case (i, t) =>
      val ws = t.split(" "); ws(ws.length - 2) = "swapped"
      (i + 100L) -> ws.mkString(" ")
    }
    val exactDups = originals.map { case (i, t) => (i + 200L) -> t }
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:${s}%02d")

    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val query = StreamingCuration.nearDupSuppressMultiBand(docs, "text", "ts",
        bands = bands, rowsPerBand = rows, shingleN = n)
      .writeStream.format("memory").queryName("mband_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(originals.map { case (i, t) => (ts(1), i, t) }: _*)
      query.processAllAvailable()
      mem.addData((nearDups ++ exactDups).map { case (i, t) => (ts(30), i, t) }: _*)
      query.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM mband_out").collect()
        .map(_.getLong(0)).toSet
      assert((1L to 20L).forall(kept), "an original was wrongly suppressed")
      assert(exactDups.forall { case (i, _) => !kept(i) },
        "an exact duplicate survived the multi-band gate")

      // recall parity with the batch banding: every near-dup pair the
      // batch LSH (same bands/rows/shingles, no verify) finds against its
      // original must be suppressed by the stream, which saw the original
      // first. Threshold 0 disables the exact-jaccard verify so both
      // sides express pure banding.
      val batchDf = (originals ++ nearDups).toDF("doc_id", "text")
      val batchPairs = graft.ops.Dedup.minhashNearDupPairs(batchDf, "doc_id",
          "text", threshold = 0.0, bands = bands, rowsPerBand = rows, shingleN = n)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      val batchCaught = batchPairs.collect {
        case (a, b) if b == a + 100L => b
        case (a, b) if a == b + 100L => a
      }.toSet
      assert(batchCaught.nonEmpty, "test corpus produced no banded near-dup pairs")
      val wronglyKept = batchCaught.filter(kept)
      assert(wronglyKept.isEmpty,
        s"stream kept near-dups the batch banding catches: $wronglyKept")
      // and the multi-band gate must beat the single-band one on this corpus
      assert(batchCaught.size >= 15, s"weak corpus: only ${batchCaught.size}/20 banded")
    } finally query.stop()
  }

  test("streaming quality filter and PII scrub run stateless on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val curated = StreamingCuration.scrubPii(
      StreamingCuration.qualityFilter(docs, "text", minScore = 0.3), "text")
    val query = curated.writeStream.format("memory").queryName("quality_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:01"), 1L,
          "A perfectly reasonable English sentence with an email bob@example.com in it."),
        (Timestamp.valueOf("2024-01-01 00:00:02"), 2L, "@@@@ #### !!!! %%%% ^^^^ &&&&"))
      query.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, text FROM quality_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet == Set(1L))
      assert(rows(1L).contains("<EMAIL>") && !rows(1L).contains("bob@example.com"))
    } finally query.stop()
  }

  test("sessionize with mapGroupsWithState counts per-user events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventPipelines._
    implicit val eventEnc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val sessions = EventPipelines.sessionize(mem.toDS().as[Event])
    val query = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        Event(1, Timestamp.valueOf("2024-01-01 00:00:01"), 7, "view", 1.0),
        Event(2, Timestamp.valueOf("2024-01-01 00:00:02"), 7, "click", 1.0),
        Event(3, Timestamp.valueOf("2024-01-01 00:00:03"), 9, "view", 1.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("events"))).toMap
      assert(rows == Map(7L -> 2L, 9L -> 1L))
    } finally query.stop()
  }

  test("streaming LM gate drops rare-token soup using a batch-trained model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ops.TextAnalysis
    // batch-train on fluent text; the literal-map column must equal the
    // batch join formulation on the training corpus itself
    val corpus = Seq.tabulate(50)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val model = TextAnalysis.lmBitsModel(corpus, "text")
    val viaCol = corpus.select(col("doc_id"),
        TextAnalysis.lmBitsCol(col("text"), model).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaBatch = TextAnalysis.lmBitsScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(viaCol == viaBatch)

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val fluentBits = viaBatch(0L)
    val query = StreamingCuration.lmFilter(docs, "text", model,
        maxBitsPerToken = fluentBits + 1.0)
      .writeStream.format("memory").queryName("lm_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog"), // in-model
        (2L, "zxqv wvuk qqjx mmvp zzkw"),                    // OOV soup
        (3L, null.asInstanceOf[String]))                     // unscored
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM lm_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L)) // soup over threshold, null dropped by default
    } finally query.stop()
  }

  test("streaming DSIR gate keeps target-like docs using a batch-trained model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ops.TextAnalysis
    // batch-train toward the "good" half; the literal-map column must
    // equal the batch join formulation on the training corpus itself
    val corpus = (Seq.tabulate(20)(i =>
        (i.toLong, "clean fluent prose words here", true)) ++
      Seq.tabulate(20)(i =>
        (100L + i, "spam junk noise garbage tokens", false)))
      .toDF("doc_id", "text", "tgt")
    val model = TextAnalysis.dsirModel(corpus, "text", col("tgt"))
    val viaCol = corpus.select(col("doc_id"),
        TextAnalysis.dsirCol(col("text"), model).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaBatch = TextAnalysis.dsirScore(corpus, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(viaCol == viaBatch)
    assert(viaCol(0L) > viaCol(100L))

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val cut = (viaCol(0L) + viaCol(100L)) / 2
    val query = StreamingCuration.dsirFilter(docs, "text", model, cut)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "clean fluent prose words here"),   // target-like
        (2L, "spam junk noise garbage tokens"),  // off-distribution
        (3L, null.asInstanceOf[String]))         // unscored
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dsir_out")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L))
    } finally query.stop()
  }

  test("trending terms: the MG sketch aggregates per event-time window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val mem = MemoryStream[(Timestamp, String)]
    val docs = mem.toDF().toDF("ts", "text")
    val out = docs
      .select(col("ts"), explode(split(col("text"), " ")).as("term"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(graft.functions.HeavyHittersAggregate
        .heavyHitters(col("term"), 8).as("hh"))
      .select(col("window.start").as("w"), col("hh"))
    val query = out.writeStream.format("memory").queryName("trend_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (at(1), "gpu gpu gpu training run"),
        (at(5), "gpu cluster training gpu"),
        (at(12), "tokenizer bug gpu"))
      query.processAllAvailable()
      // advance the watermark past the first window to emit it
      mem.addData((at(50), "later window content"))
      query.processAllAvailable()
      val rows = spark.sql("SELECT w, hh FROM trend_out").collect()
      assert(rows.nonEmpty)
      val first = rows.minBy(_.getTimestamp(0).getTime)
      val top = first.getSeq[org.apache.spark.sql.Row](1).head
      assert(top.getString(0) == "gpu" && top.getLong(1) == 6L,
        s"got $top") // exact: vocabulary fits the capacity
    } finally query.stop()
  }

  test("windowed latency quantiles: the quantile sketch aggregates per event-time window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val mem = MemoryStream[(Timestamp, Double)]
    val evs = mem.toDF().toDF("ts", "latency_ms")
    val out = evs
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(graft.functions.QuantileSketchAggregate
        .quantileSketch(col("latency_ms"), 1024).as("sk"))
      .select(col("window.start").as("w"),
        graft.functions.QuantileSketchAggregate
          .sketchQuantile(col("sk"), 1, 2).as("p50"),
        graft.functions.QuantileSketchAggregate
          .sketchQuantile(col("sk"), 9, 10).as("p90"))
    val query = out.writeStream.format("memory").queryName("lat_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // 20 latencies 1..20 in the first window: exact mode (fits 1024)
      mem.addData((1 to 20).map(i => (at(i % 25), i.toDouble)): _*)
      query.processAllAvailable()
      mem.addData((at(50), 999.0)) // advance watermark, emit window 1
      query.processAllAvailable()
      val rows = spark.sql("SELECT w, p50, p90 FROM lat_out").collect()
      assert(rows.nonEmpty)
      val first = rows.minBy(_.getTimestamp(0).getTime)
      // rank convention: k = (num*(n+1)) DIV den over n = 20 values
      assert(first.getDouble(1) == 10.0, s"p50 ${first.getDouble(1)}")
      assert(first.getDouble(2) == 18.0, s"p90 ${first.getDouble(2)}")
    } finally query.stop()
  }

  test("windowed distinct cardinality: the distinct sketch aggregates per event-time window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val mem = MemoryStream[(Timestamp, String)]
    val evs = mem.toDF().toDF("ts", "source")
    // the streaming twin of CorpusReport's cardinalities: mergeable
    // sketch state in the store, exact while distinct values fit 2^p
    val out = evs
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(graft.functions.DistinctSketchAggregate
        .distinctSketch(col("source"), 10).as("n_sources"))
      .select(col("window.start").as("w"), col("n_sources"))
    val query = out.writeStream.format("memory").queryName("card_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // 40 events over 7 distinct sources in window 1: exact regime
      mem.addData((1 to 40).map(i => (at(i % 25), s"src${i % 7}")): _*)
      query.processAllAvailable()
      mem.addData((at(50), "late")) // advance watermark, emit window 1
      query.processAllAvailable()
      val rows = spark.sql("SELECT w, n_sources FROM card_out").collect()
      assert(rows.nonEmpty)
      val first = rows.minBy(_.getTimestamp(0).getTime)
      assert(first.getLong(1) == 7L,
        s"exact-regime streaming cardinality: ${first.getLong(1)}")
    } finally query.stop()
  }

  test("streaming decontamination gate drops benchmark-overlapping docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(benchText).toDF("text")
    val bloom = graft.ops.Dedup.benchmarkBloom(bench, "text", n = 8)
    assert(bloom.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val query = StreamingCuration.decontaminationGate(docs, "text", bloom)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, s"prefix words here $benchText suffix tail"), // contains an 8-gram
        (2L, "totally unrelated clean document with enough distinct words"),
        (3L, "another clean one about spark partitions and shuffles"))
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM decon_out")
        .collect().map(_.getLong(0)).toSet
      assert(!ids.contains(1L), "contaminated doc must drop (no false negatives)")
      assert(ids.contains(2L) && ids.contains(3L),
        s"clean docs should survive at fpp=0.01: $ids")
    } finally query.stop()
    // empty benchmark -> empty sketch -> gate keeps everything
    val none = graft.ops.Dedup.benchmarkBloom(bench.limit(0), "text")
    assert(none.isEmpty)
  }

  test("streaming temperature gate keeps exactly the batch mix on a replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // skewed batch corpus: en-heavy; rates trained on its counts
    val rows = Seq.tabulate(600)(i =>
      (i.toLong, if (i % 3 == 0) "fr" else "en"))
    val batch = rows.toDF("doc_id", "lang")
    val batchKept = graft.ops.Sampling.temperatureMix(batch, col("doc_id"),
        col("lang"), target = 200)
      .select("doc_id").as[Long].collect().toSet
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
    val rates = graft.ops.Sampling.temperatureRates(counts, target = 200)
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "lang")
    val query = StreamingCuration.temperatureGate(docs, "doc_id", "lang", rates)
      .writeStream.format("memory").queryName("temp_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM temp_out")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batchKept) // bit-for-bit the batch operator's mix
      assert(streamed.nonEmpty && streamed.size < 600)
    } finally query.stop()
  }

  test("epoch upsampling gates a stream with exact batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // stateless narrow transform (literal CASE chain + explode): the
    // ingest stage repeats mixture-weighted documents identically in
    // batch and stream — no state store, no watermark needed
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, if (i % 3 == 0) "fr" else "en"))
    val w = Map("en" -> 1.5, "fr" -> 1.0)
    val batchOut = graft.ops.Sampling.epochUpsample(
        rows.toDF("doc_id", "lang"), col("doc_id"), col("lang"), w)
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    val mem = MemoryStream[(Long, String)]
    val query = graft.ops.Sampling.epochUpsample(
        mem.toDF().toDF("doc_id", "lang"), col("doc_id"), col("lang"), w)
      .writeStream.format("memory").queryName("epoch_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, copy FROM epoch_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchOut)
      assert(streamed.size > 300, "en docs must repeat")
    } finally query.stop()
  }
}
