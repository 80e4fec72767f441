package graft.crawl

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Throws on any call — proves a resumed crawl never touches the wire.
  * Top-level so Class.forName can see it. */
final class NeverTransport extends FetchTransport {
  override def fetch(url: String, userAgent: String): FetchResponse =
    throw new IllegalStateException(s"resume must not fetch: $url")
}

/** A five-page web with a redirect in the middle, for the two
  * redirect-discovery contracts: (1) a page reached THROUGH a redirect
  * resolves its relative links against the final hop target, and (2)
  * every url a chain passed through joins the visited set (a later
  * direct link to the redirect target must not re-fetch it).
  *
  *   /p/1            200, links /r/2 and /p/3
  *   /r/2            301 → /d/sub/index.html
  *   /d/sub/index.html  200, RELATIVE link "x.html"
  *   /d/sub/x.html   200, leaf
  *   /p/3            200, links /d/sub/index.html directly
  */
final class RedirectWebTransport extends FetchTransport {
  import java.nio.charset.StandardCharsets.UTF_8
  private def html(body: String) = FetchResponse(200,
    "text/html; charset=utf-8",
    s"<html><body>$body</body></html>".getBytes(UTF_8))
  override def fetch(url: String, userAgent: String): FetchResponse = {
    RedirectWebTransport.calls.add(url): Unit
    url.substring(url.indexOf("://") + 3).dropWhile(_ != '/') match {
      case "/p/1" => html("""<a href="/r/2">a</a> <a href="/p/3">b</a>""")
      case "/r/2" => FetchResponse(301, null, Array.emptyByteArray,
        location = "/d/sub/index.html")
      case "/d/sub/index.html" => html("""<a href="x.html">rel</a>""")
      case "/d/sub/x.html" => html("leaf")
      case "/p/3" => html("""<a href="/d/sub/index.html">c</a>""")
      case p => FetchResponse(404, "text/plain", s"no:$p".getBytes(UTF_8))
    }
  }
}
object RedirectWebTransport {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** The synthetic web with TOGGLABLE transport failures: while
  * [[BrittleWebTransport.broken]], urls whose id % 7 == 0 throw (a
  * transient network condition); after the flag clears they answer
  * normally — the recrawl-tombstone fixture. */
final class BrittleWebTransport extends FetchTransport {
  private val real = new SyntheticWebTransport
  override def fetch(url: String, userAgent: String): FetchResponse = {
    BrittleWebTransport.calls.add(url): Unit
    if (BrittleWebTransport.broken) {
      val m = "/p/(\\d+)$".r.findFirstMatchIn(url)
      if (m.exists(_.group(1).toLong % 7 == 0))
        throw new java.io.IOException(s"transient: $url")
    }
    real.fetch(url, userAgent)
  }
}
object BrittleWebTransport {
  @volatile var broken = true
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** One-host chain /p/1 → /p/2 → /p/3 …, recording (url, logical clock)
  * per call — the cross-round politeness fixture (single host, so the
  * global logical clock never races across tasks). */
final class ChainWebTransport extends FetchTransport {
  import java.nio.charset.StandardCharsets.UTF_8
  override def fetch(url: String, userAgent: String): FetchResponse = {
    ChainWebTransport.calls.add((url, FetchTestState.clock.get())): Unit
    val i = url.substring(url.lastIndexOf('/') + 1).toInt
    FetchResponse(200, "text/html",
      s"""<html><body><a href="/p/${i + 1}">n</a></body></html>"""
        .getBytes(UTF_8))
  }
}
object ChainWebTransport {
  val calls =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
}

/** One host; /p/1 answers 200 with a link to /p/2; /p/2 THROWS while
  * [[FloorBrittleTransport.broken]] and answers 200 after — records
  * (url, logical clock) per call: the recrawl floors/backoff fixture. */
final class FloorBrittleTransport extends FetchTransport {
  import java.nio.charset.StandardCharsets.UTF_8
  override def fetch(url: String, userAgent: String): FetchResponse = {
    FloorBrittleTransport.calls.add((url, FetchTestState.clock.get())): Unit
    if (url.endsWith("/p/2")) {
      if (FloorBrittleTransport.broken)
        throw new java.io.IOException(s"down: $url")
      FetchResponse(200, "text/html", "<html>up</html>".getBytes(UTF_8))
    } else
      FetchResponse(200, "text/html",
        """<html><a href="/p/2">n</a></html>""".getBytes(UTF_8))
  }
}
object FloorBrittleTransport {
  @volatile var broken = true
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
}

/** 256 KB bodies in a 4-page chain, snapshotting which persisted RDDs
  * hold MEMORY blocks at every fetch — the bfs DISK_ONLY round pin:
  * while round d is fetching, rounds 0..d-1 are persisted, and none of
  * their body-sized blocks may sit in storage memory. Tests run one
  * JVM, so the executor-side hook can read the driver's block stats. */
final class BigBodyChainTransport extends FetchTransport {
  import BigBodyChainTransport._
  override def fetch(url: String, userAgent: String): FetchResponse = {
    val sc = org.apache.spark.SparkContext.getOrCreate()
    sc.getRDDStorageInfo
      .filter(i => i.memSize > 64 * 1024 && !preExisting.contains(i.id))
      .foreach(i => memoryResidents.add(s"rdd ${i.id} memSize=${i.memSize}"))
    val i = url.substring(url.lastIndexOf('/') + 1).toInt
    val next = if (i < 4) s"""<a href="/p/${i + 1}">n</a>""" else ""
    FetchResponse(200, "text/html; charset=utf-8",
      (s"<html><body>$next<pre>" + "x" * (256 * 1024) + "</pre></body></html>")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
object BigBodyChainTransport {
  @volatile var preExisting: Set[Int] = Set.empty
  val memoryResidents = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class CrawlSpec extends SparkSpec {
  import SyntheticWebTransport.{H, N}

  private def cfg = Fetch.Config(
    transportClass = classOf[SyntheticWebTransport].getName)

  private def url(h: Long, id: Long) = s"http://site$h.test/p/$id"

  /** The transport's link function, restated independently. */
  private def children(h: Long, id: Long): Seq[(Long, Long)] =
    if (id % 13 == 0) Nil
    else Seq((h, (2 * id + 5) % N), (h, (3 * id + 1) % N), ((h + 1) % H, id))

  /** Min-depth BFS closure over the synthetic web, driver-side. */
  private def closure(seeds: Seq[(Long, Long)],
                      maxDepth: Int): Map[(Long, Long), Int] = {
    val depth = mutable.Map.empty[(Long, Long), Int]
    var frontier = seeds.distinct
    frontier.foreach(s => depth(s) = 0)
    var d = 0
    while (d < maxDepth && frontier.nonEmpty) {
      val next = frontier.flatMap { case (h, id) => children(h, id) }
        .distinct.filterNot(depth.contains)
      next.foreach(n => depth(n) = d + 1)
      frontier = next
      d += 1
    }
    depth.toMap
  }

  test("bfs crawls the reachable set at min depth, bodies exact") {
    import spark.implicits._
    val seeds = Seq(url(0, 1)).toDF("url")
    val out = Crawl.bfs(seeds, cfg, maxDepth = 2)
    val got = out.select("url", "depth", "status", "body").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSeq
    val want = closure(Seq((0L, 1L)), 2)
    assert(got.size == want.size, s"got ${got.map(t => (t._1, t._2)).sorted}")
    got.foreach { case (u, d, st, body) =>
      val m = "site(\\d+)\\.test/p/(\\d+)".r.findFirstMatchIn(u).get
      val (h, id) = (m.group(1).toLong, m.group(2).toLong)
      assert(want((h, id)) == d, s"$u depth")
      if (id % 13 == 0) { assert(st == 404); assert(body == "gone") }
      else { assert(st == 200)
             assert(body == SyntheticWebTransport.body(h, id)) }
    }
  }

  test("maxDepth=0 fetches the seeds only; each URL fetched exactly once") {
    import spark.implicits._
    val seeds = Seq(url(0, 1), url(0, 1), url(1, 2)).toDF("url") // dup seed
    val before = SyntheticWebTransport.calls.get()
    val out = Crawl.bfs(seeds, cfg, maxDepth = 0)
    assert(out.select("url").as[String].collect().sorted.toSeq ==
      Seq(url(0, 1), url(1, 2)))
    assert(out.select("depth").distinct().as[Int].collect().toSeq == Seq(0))
    assert(SyntheticWebTransport.calls.get() - before == 2,
      "duplicate seed must not refetch")
  }

  test("no URL is ever fetched twice across rounds (visited anti-join)") {
    import spark.implicits._
    // (0,4)'s two path-links collide on (0,13) and (1,1) rediscovers
    // (1,4)/(1,7) that (0,7)'s hop also reaches — heavy convergence
    val seeds = Seq(url(0, 1), url(0, 4)).toDF("url")
    val before = SyntheticWebTransport.calls.get()
    val out = Crawl.bfs(seeds, cfg, maxDepth = 3)
    val rows = out.count()
    assert(out.select("url").distinct().count() == rows)
    assert(SyntheticWebTransport.calls.get() - before == rows,
      "one transport call per distinct reachable URL")
    assert(rows == closure(Seq((0L, 1L), (0L, 4L)), 3).size)
  }

  test("404 nodes are archived but contribute no outlinks") {
    import spark.implicits._
    val seeds = Seq(url(2, 13)).toDF("url") // 13 % 13 == 0
    val out = Crawl.bfs(seeds, cfg, maxDepth = 3)
    val got = out.select("url", "status").collect()
    assert(got.length == 1 && got(0).getString(0) == url(2, 13) &&
      got(0).getInt(1) == 404)
  }

  test("scope predicate bounds discovery (cross-host hop dropped)") {
    import spark.implicits._
    val seeds = Seq(url(0, 1)).toDF("url")
    val out = Crawl.bfs(seeds, cfg, maxDepth = 4,
      scope = u => u.startsWith("http://site0.test/"))
    val hosts = out.select(regexp_extract(col("url"), "site(\\d+)", 1))
      .distinct().as[String].collect().toSeq
    assert(hosts == Seq("0"))
    // the expected set is NOT just closure ∩ host-0: host-0 nodes
    // reachable only THROUGH another host are out too — recompute the
    // closure with the scoped link function
    val scoped = {
      val depth = mutable.Map[(Long, Long), Int]((0L, 1L) -> 0)
      var frontier = Seq((0L, 1L)); var d = 0
      while (d < 4 && frontier.nonEmpty) {
        val next = frontier.flatMap { case (h, id) => children(h, id) }
          .filter(_._1 == 0L).distinct.filterNot(depth.contains)
        next.foreach(n => depth(n) = d + 1); frontier = next; d += 1
      }
      depth.keySet
    }
    assert(out.count() == scoped.size)
  }

  test("frontier explosion fails loudly, pointing at scope") {
    import spark.implicits._
    val seeds = Seq(url(0, 1)).toDF("url")
    val e = intercept[IllegalArgumentException] {
      Crawl.bfs(seeds, cfg, maxDepth = 2, maxFrontierPerRound = 1L)
    }
    assert(e.getMessage.contains("scope"))
  }

  test("empty seed set is total: empty archive with the full schema") {
    import spark.implicits._
    val out = Crawl.bfs(Seq.empty[String].toDF("url"), cfg, maxDepth = 2)
    assert(out.count() == 0)
    assert(out.columns.toSeq.contains("depth"))
    assert(out.columns.toSeq.contains("body"))
  }

  test("run: per-round disk archives equal the in-memory bfs, depth by depth") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("crawl-run").toString
    val seeds = Seq(url(0, 1), url(3, 2)).toDF("url")
    val stats = Crawl.run(seeds, out, cfg, maxDepth = 2)
    assert(stats.size == 3)
    val mem = Crawl.bfs(seeds, cfg, maxDepth = 2)
      .select("url", "depth", "status", "body").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"))).toSet
    val disk = (0 to 2).flatMap { d =>
      spark.read.format("warc").load(s"$out/round_$d")
        .select("target_uri", "http_status", "payload").collect()
        .map(r => (r.getString(0), d, r.getInt(1),
          new String(r.getAs[Array[Byte]](2), "UTF-8")))
    }.toSet
    assert(disk == mem)
  }

  test("run: a completed crawl resumes as a no-op — zero transport calls") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("crawl-rerun").toString
    val seeds = Seq(url(0, 1)).toDF("url")
    Crawl.run(seeds, out, cfg, maxDepth = 2)
    // same outDir, a transport that throws on ANY call: every batch of
    // every round is committed, so the re-run must finish without one
    val stats = Crawl.run(seeds, out, Fetch.Config(
      transportClass = classOf[NeverTransport].getName,
      maxAttempts = 1), maxDepth = 2)
    assert(stats.forall(s => s.attempted == 0 && s.failed == 0))
  }

  test("run: extending a finished crawl fetches only the NEW rounds") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("crawl-extend").toString
    val seeds = Seq(url(0, 1)).toDF("url")
    Crawl.run(seeds, out, cfg, maxDepth = 0)
    val before = SyntheticWebTransport.calls.get()
    Crawl.run(seeds, out, cfg, maxDepth = 2)
    val fetched = SyntheticWebTransport.calls.get() - before
    val full = closure(Seq((0L, 1L)), 2)
    assert(fetched == full.size - 1, // everything except the depth-0 seed
      s"resume refetched round 0 ($fetched calls, want ${full.size - 1})")
  }

  private def rw(path: String) = s"http://rw.test$path"

  test("bfs: redirect targets resolve links and join the visited set") {
    import spark.implicits._
    RedirectWebTransport.calls.clear()
    val out = Crawl.bfs(Seq(rw("/p/1")).toDF("url"),
      Fetch.Config(transportClass = classOf[RedirectWebTransport].getName),
      maxDepth = 3)
    val got = out.select("url", "depth", "status").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    // /r/2 archives under its request url with the FINAL response;
    // /d/sub/index.html never appears as a row of its own (it is the
    // redirect landing, reached only through /r/2 and /p/3's link);
    // /d/sub/x.html exists ONLY if the relative link "x.html" resolved
    // against the redirect TARGET (against /r/2 it would be /r/x.html,
    // a 404 page that answers, so the wrong crawl would differ)
    assert(got == Set(
      (rw("/p/1"), 0, 200),
      (rw("/r/2"), 1, 200),
      (rw("/p/3"), 1, 200),
      (rw("/d/sub/x.html"), 2, 200)), s"got: $got")
    import scala.jdk.CollectionConverters._
    val calls = RedirectWebTransport.calls.asScala.toSeq
    assert(calls.count(_ == rw("/d/sub/index.html")) == 1,
      "the redirect landing must fetch exactly once (visited via the hop " +
        s"chain — /p/3's direct link must not re-fetch it): $calls")
    assert(calls.size == 5, s"5 exchanges total: $calls")
  }

  test("run: redirect targets resolve links and join the visited set (audit-carried)") {
    import spark.implicits._
    RedirectWebTransport.calls.clear()
    val out = java.nio.file.Files.createTempDirectory("crawl-redir").toString
    Crawl.run(Seq(rw("/p/1")).toDF("url"), out,
      Fetch.Config(transportClass = classOf[RedirectWebTransport].getName),
      maxDepth = 3): Unit
    val round2 = spark.read.format("warc").load(s"$out/round_2")
      .select("target_uri").as[String].collect().toSeq
    assert(round2 == Seq(rw("/d/sub/x.html")),
      s"round 2 must be exactly the relative link resolved against the " +
        s"redirect target: $round2")
    assert(!new java.io.File(s"$out/round_3").exists(),
      "round 3 must drain (x.html is a leaf)")
    import scala.jdk.CollectionConverters._
    val calls = RedirectWebTransport.calls.asScala.toSeq
    assert(calls.count(_ == rw("/d/sub/index.html")) == 1,
      s"the redirect landing must fetch exactly once: $calls")
    assert(calls.size == 5, s"5 exchanges total: $calls")
    // the tombstone tables exist (and are empty — nothing failed)
    for (d <- 0 to 2)
      assert(spark.read.parquet(s"$out/_crawl/failures_$d").count() == 0)
  }

  test("run: terminal failures persist as tombstones; recrawlFailures re-queues exactly them") {
    import spark.implicits._
    BrittleWebTransport.broken = true
    BrittleWebTransport.calls.clear()
    val out = java.nio.file.Files.createTempDirectory("crawl-tomb").toString
    val cfg = Fetch.Config(
      transportClass = classOf[BrittleWebTransport].getName,
      maxAttempts = 1, backoffMs = 1L)
    // (0,1) links (0,7), (0,4), (1,1); while broken, id%7==0 throws —
    // round 1 loses exactly site0/p/7 to a transport failure
    val stats = Crawl.run(Seq(url(0, 1)).toDF("url"), out, cfg, maxDepth = 1)
    assert(stats.size == 2)
    assert(stats(1).attempted == 3 && stats(1).ok == 2 && stats(1).failed == 1)
    assert(spark.read.parquet(s"$out/_crawl/failures_0").count() == 0)
    val tomb = spark.read.parquet(s"$out/_crawl/failures_1").collect()
    assert(tomb.length == 1)
    assert(tomb(0).getAs[String]("url") == url(0, 7))
    assert(tomb(0).getAs[String]("error").contains("transient"))
    assert(tomb(0).getAs[Int]("round") == 1)

    // the network recovers: one recrawl attempt fetches ONLY the tombstone
    BrittleWebTransport.broken = false
    val before = BrittleWebTransport.calls.size
    val r = Crawl.recrawlFailures(out, cfg)
    assert(r.attempted == 1 && r.ok == 1 && r.failed == 0,
      s"recrawl must attempt exactly the tombstone: $r")
    import scala.jdk.CollectionConverters._
    val recrawled = BrittleWebTransport.calls.asScala.toSeq.drop(before)
    assert(recrawled == Seq(url(0, 7)), s"recrawled: $recrawled")
    val retry = spark.read.format("warc").load(s"$out/retry_0")
      .select("target_uri", "http_status").collect()
      .map(rr => (rr.getString(0), rr.getInt(1))).toSeq
    assert(retry == Seq((url(0, 7), 200)),
      s"the recovered page must archive in the retry round: $retry")
    assert(spark.read.parquet(s"$out/_crawl/failures_retry_0").count() == 0,
      "nothing still failing after recovery")
    // stats reconcile across the two runs: every frontier url accounted
    // once — round fetches (2 ok + 1 failed) + retry (1 ok)
    assert(stats(1).ok + r.ok == 3 && stats(1).attempted == 3)

    // idempotence: a second call finds nothing pending, touches nothing
    val before2 = BrittleWebTransport.calls.size
    val r2 = Crawl.recrawlFailures(out, cfg)
    assert(r2 == FetchStats(0L, 0L, 0L, 0L, 0L), s"nothing pending: $r2")
    assert(BrittleWebTransport.calls.size == before2,
      "an empty recrawl must not touch the wire")
  }

  test("bfs: crawl-delay politeness spans rounds (floor from the previous round)") {
    import spark.implicits._
    FetchTestState.reset()
    FetchTestState.clock.set(1000L)
    ChainWebTransport.calls.clear()
    val cfg = Fetch.Config(
      transportClass = classOf[ChainWebTransport].getName,
      defaultDelayMs = 500L,
      clock = () => FetchTestState.clock.get(),
      sleeper = ms => { FetchTestState.clock.addAndGet(ms): Unit })
    Crawl.bfs(Seq("http://ch.test/p/1").toDF("url"), cfg,
      maxDepth = 1).count(): Unit
    import scala.jdk.CollectionConverters._
    val calls = ChainWebTransport.calls.asScala.toSeq
    assert(calls == Seq(("http://ch.test/p/1", 1000L),
      ("http://ch.test/p/2", 1500L)),
      s"round 1's first fetch of the host must wait out the crawl-delay " +
        s"from round 0's fetch: $calls")
  }

  test("run: crawl-delay politeness spans rounds through the audit sidecar") {
    import spark.implicits._
    FetchTestState.reset()
    FetchTestState.clock.set(1000L)
    ChainWebTransport.calls.clear()
    val out = java.nio.file.Files.createTempDirectory("crawl-polite").toString
    val cfg = Fetch.Config(
      transportClass = classOf[ChainWebTransport].getName,
      defaultDelayMs = 500L,
      clock = () => FetchTestState.clock.get(),
      sleeper = ms => { FetchTestState.clock.addAndGet(ms): Unit })
    Crawl.run(Seq("http://ch.test/p/1").toDF("url"), out, cfg,
      maxDepth = 1): Unit
    import scala.jdk.CollectionConverters._
    val calls = ChainWebTransport.calls.asScala.toSeq
    assert(calls == Seq(("http://ch.test/p/1", 1000L),
      ("http://ch.test/p/2", 1500L)),
      s"the floor must survive the parquet round-trip: $calls")
  }

  test("bfs: per-host cap defers overflow to later rounds, politeness floors intact") {
    import spark.implicits._
    FetchTestState.reset()
    FetchTestState.clock.set(1000L)
    val cfg = Fetch.Config(
      transportClass = classOf[RecordingTransport].getName,
      defaultDelayMs = 500L,
      maxPerHostPerRound = 1L,
      clock = () => FetchTestState.clock.get(),
      sleeper = ms => { FetchTestState.clock.addAndGet(ms): Unit })
    val seeds = (1 to 3).map(i => s"http://cap.test/p/$i").toDF("url")
    val out = Crawl.bfs(seeds, cfg, maxDepth = 3)
    val rows = out.select("url", "depth", "status").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rows.length == 3 && rows.forall(_._3 == 200),
      s"all three urls fetch eventually, no deferred residue: ${rows.toSeq}")
    assert(rows.map(_._2).sorted.toSeq == Seq(0, 1, 2),
      "one url per round under cap 1 — depth records the FETCH round")
    import scala.jdk.CollectionConverters._
    val times = FetchTestState.calls.asScala.toSeq.map(_._2).sorted
    assert(times == Seq(1000L, 1500L, 2000L),
      s"a deferred url's round must still wait out the host's crawl-delay " +
        s"floor from the round that fetched: $times")
  }

  test("bfs: capped crawl drains to the same archive as uncapped, one fetch per URL") {
    import spark.implicits._
    // ids < 60 on host 0: a 9-url closed subweb (4 rounds uncapped)
    val scope: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      u => u.rlike("^http://site0\\.test/p/([0-9]|[1-5][0-9])$")
    val seeds = Seq(url(0, 1)).toDF("url")
    def archive(c: Fetch.Config, depth: Int) =
      Crawl.bfs(seeds, c, maxDepth = depth, scope = scope)
        .select("url", "status", "body").collect()
        .map(r => (r.getString(0), r.getInt(1),
          new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSet
    val before = SyntheticWebTransport.calls.get()
    val plain = archive(cfg, 10)
    val mid = SyntheticWebTransport.calls.get()
    val capped = archive(cfg.copy(maxPerHostPerRound = 2L), 12)
    val after = SyntheticWebTransport.calls.get()
    assert(plain.size == 9, s"subweb size: ${plain.size}")
    assert(capped == plain,
      "cap changes WHEN a url fetches, never WHETHER (both crawls drain)")
    assert(mid - before == 9 && after - mid == 9,
      "exactly one transport call per reachable url, capped or not")
  }

  test("bfs: cap overflow still pending at maxDepth stays as deferred marker rows") {
    import spark.implicits._
    val seeds = (1 to 3).map(i => s"http://trunc.test/p/$i").toDF("url")
    val out = Crawl.bfs(seeds,
      Fetch.Config(transportClass = classOf[RecordingTransport].getName,
        maxPerHostPerRound = 1L),
      maxDepth = 0)
    val byStatus = out.select("status").as[Int].collect().toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(byStatus == Map(200 -> 1, Fetch.StatusDeferred -> 2),
      s"nothing silently lost at truncation: $byStatus")
  }

  test("run: cap-deferred urls archive in the round they fetch; extending picks up leftovers") {
    import spark.implicits._
    FetchTestState.reset()
    val dir = java.nio.file.Files.createTempDirectory("crawl-cap").toString
    val seeds = (1 to 3).map(i => s"http://rcap.test/p/$i").toDF("url")
    val cfg = Fetch.Config(
      transportClass = classOf[RecordingTransport].getName,
      maxPerHostPerRound = 1L)
    Crawl.run(seeds, dir, cfg, maxDepth = 1): Unit
    def uris(d: Int) = spark.read.format("warc").load(s"$dir/round_$d")
      .select("target_uri").as[String].collect().toSeq
    assert(uris(0).size == 1 && uris(1).size == 1,
      "cap 1: exactly one url per round")
    // deferred rows are visible in the final round's audit, not tombstoned
    assert(spark.read.parquet(s"$dir/_crawl/audit_1/batch-*")
      .filter(col("status") === Fetch.StatusDeferred).count() == 1)
    assert(spark.read.parquet(s"$dir/_crawl/failures_1").count() == 0,
      "deferred is not failed")
    // extending the same outDir fetches exactly the leftover
    Crawl.run(seeds, dir, cfg, maxDepth = 2): Unit
    val all = (0 to 2).flatMap(uris)
    assert(all.toSet == (1 to 3).map(i => s"http://rcap.test/p/$i").toSet &&
      all.size == 3, s"every url archived exactly once across rounds: $all")
    assert((1 to 3).forall(i =>
      FetchTestState.counts(s"http://rcap.test/p/$i") == 1),
      "the extend run must not re-fetch committed rounds")
  }

  test("recrawlFailures: politeness floors from all audits, linear backoff per attempt") {
    import spark.implicits._
    FetchTestState.reset()
    FetchTestState.clock.set(1000L)
    FloorBrittleTransport.broken = true
    FloorBrittleTransport.calls.clear()
    val dir = java.nio.file.Files.createTempDirectory("crawl-floors").toString
    val cfg = Fetch.Config(
      transportClass = classOf[FloorBrittleTransport].getName,
      maxAttempts = 1, backoffMs = 1L, defaultDelayMs = 500L,
      clock = () => FetchTestState.clock.get(),
      sleeper = ms => { FetchTestState.clock.addAndGet(ms): Unit })
    // round 0: /p/1 at t=1000; round 1: /p/2 at 1500 (floor) -> FAILS
    Crawl.run(Seq("http://fb.test/p/1").toDF("url"), dir, cfg, maxDepth = 1): Unit
    // attempt 0 while down: floor 1500 -> fires at 2000 (T + D)
    assert(Crawl.recrawlFailures(dir, cfg).failed == 1)
    // attempt 1 while down: floor 2000, + 1x backoff -> fires at 3000 (T' + 2D)
    assert(Crawl.recrawlFailures(dir, cfg).failed == 1)
    FloorBrittleTransport.broken = false
    // attempt 2 recovered: floor 3000, + 2x backoff -> fires at 4500 (T'' + 3D)
    assert(Crawl.recrawlFailures(dir, cfg).ok == 1)
    import scala.jdk.CollectionConverters._
    val p2 = FloorBrittleTransport.calls.asScala.toSeq
      .filter(_._1.endsWith("/p/2")).map(_._2)
    assert(p2 == Seq(1500L, 2000L, 3000L, 4500L),
      s"each retry attempt must wait floor + (attempt+1) x delay: $p2")
  }

  test("run: a resumed/extended crawl reconstructs politeness floors from on-disk audits") {
    import spark.implicits._
    FetchTestState.reset()
    FetchTestState.clock.set(1000L)
    ChainWebTransport.calls.clear()
    val dir = java.nio.file.Files.createTempDirectory("crawl-refloor").toString
    val cfg = Fetch.Config(
      transportClass = classOf[ChainWebTransport].getName,
      defaultDelayMs = 500L,
      clock = () => FetchTestState.clock.get(),
      sleeper = ms => { FetchTestState.clock.addAndGet(ms): Unit })
    // first process stops after round 0 (maxDepth=0) — the same on-disk
    // state as a crash between rounds (round 0 committed, frontier_1
    // absent); the second process extends and must rebuild the floor
    // from audit_0, not start round 1 floorless
    Crawl.run(Seq("http://ch.test/p/1").toDF("url"), dir, cfg, maxDepth = 0): Unit
    Crawl.run(Seq("http://ch.test/p/1").toDF("url"), dir, cfg, maxDepth = 1): Unit
    import scala.jdk.CollectionConverters._
    val calls = ChainWebTransport.calls.asScala.toSeq
    assert(calls == Seq(("http://ch.test/p/1", 1000L),
      ("http://ch.test/p/2", 1500L)),
      s"the resumed round's first fetch must honor the recovered floor: $calls")
  }

  test("bfs: round archives live on disk, never in storage memory") {
    import spark.implicits._
    val sc = spark.sparkContext
    BigBodyChainTransport.preExisting =
      sc.getRDDStorageInfo.filter(_.memSize > 64 * 1024).map(_.id).toSet
    BigBodyChainTransport.memoryResidents.clear()
    val out = Crawl.bfs(Seq("http://big.test/p/1").toDF("url"),
      Fetch.Config(transportClass = classOf[BigBodyChainTransport].getName),
      maxDepth = 3)
    assert(out.count() == 4)
    assert(out.select(min(length(col("body")))).collect()(0).getInt(0) >
      256 * 1024, "bodies are genuinely body-sized")
    import scala.jdk.CollectionConverters._
    val residents = BigBodyChainTransport.memoryResidents.asScala.toSeq.distinct
    assert(residents.isEmpty,
      s"while a round fetches, earlier rounds' body blocks must be " +
        s"DISK_ONLY, not in storage memory: $residents")
  }

  test("crawl loop leaves no checkpoint residue beyond the result") {
    import spark.implicits._
    val sc = spark.sparkContext
    def settled(): Int = {
      System.gc(); Thread.sleep(200)
      sc.getPersistentRDDs.size
    }
    val before = settled()
    val out = Crawl.bfs(Seq(url(0, 1), url(3, 2)).toDF("url"), cfg,
      maxDepth = 3)
    assert(out.count() > 0)
    val residue = settled() - before
    assert(residue <= 1,
      s"crawl left $residue persisted RDDs (want only the eager result)")
  }
}
