package graft.crawl

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shared executor-side state for the injectable-transport fakes. Tests
  * run local[*] (one JVM), so static state observes executor calls. */
object FetchTestState {
  val clock = new java.util.concurrent.atomic.AtomicLong(0L)
  /** (url, logical time at fetch) in arrival order. */
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  val counts = TrieMap.empty[String, Int]
  def reset(): Unit = { clock.set(0L); calls.clear(); counts.clear() }
  def bump(url: String): Int =
    counts.updateWith(url) { c => Some(c.getOrElse(0) + 1) }.get
}

/** Records (url, logical clock) per call; pages derive from the url. */
final class RecordingTransport extends FetchTransport {
  override def fetch(url: String, userAgent: String): FetchResponse = {
    FetchTestState.calls.add((url, FetchTestState.clock.get())): Unit
    FetchTestState.bump(url): Unit
    FetchResponse(200, "text/plain", s"page:$url".getBytes(StandardCharsets.UTF_8))
  }
}

/** Deterministically flaky: urls containing "flaky" throw on the first
  * two attempts; urls containing "s503" always answer 503; urls
  * containing "dead" always throw. */
final class FlakyTransport extends FetchTransport {
  override def fetch(url: String, userAgent: String): FetchResponse = {
    val n = FetchTestState.bump(url)
    if (url.contains("dead")) throw new java.io.IOException(s"connect refused: $url")
    if (url.contains("flaky") && n <= 2) throw new java.io.IOException(s"reset: $url")
    if (url.contains("s503")) FetchResponse(503, "text/plain", Array.emptyByteArray)
    else FetchResponse(200, "text/plain", s"ok:$url".getBytes(StandardCharsets.UTF_8))
  }
}

/** Redirect fixture: paths under /chain hop twice then land on content;
  * /loop/<i> 301s forever to /loop/<i+1>; /cycle/a and /cycle/b 301 to
  * each other; /cross 301s to other.example; /rel uses a RELATIVE
  * Location; /tmpfail's target answers 503. */
final class RedirectTransport extends FetchTransport {
  import StandardCharsets.UTF_8
  override def fetch(url: String, userAgent: String): FetchResponse = {
    FetchTestState.calls.add((url, FetchTestState.clock.get())): Unit
    FetchTestState.bump(url): Unit
    val path = url.substring(url.indexOf("://") + 3).dropWhile(_ != '/')
    path match {
      case "/chain/1" => FetchResponse(301, null, Array.emptyByteArray,
        location = url.replace("/chain/1", "/chain/2"))
      case "/chain/2" => FetchResponse(302, null, Array.emptyByteArray,
        location = url.replace("/chain/2", "/chain/final"))
      case p if p.startsWith("/loop/") =>
        val i = p.substring(6).toInt
        FetchResponse(301, null, Array.emptyByteArray,
          location = url.replace(s"/loop/$i", s"/loop/${i + 1}"))
      case "/cycle/a" => FetchResponse(301, null, Array.emptyByteArray,
        location = url.replace("/cycle/a", "/cycle/b"))
      case "/cycle/b" => FetchResponse(308, null, Array.emptyByteArray,
        location = url.replace("/cycle/b", "/cycle/a"))
      case "/cross" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://other.example/landed")
      case "/cross-port" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://rd.example:8080/landed")
      // the built-in robots re-gate fixture: three target hosts with
      // distinct robots availability (200-with-rules / 404 / 503)
      case "/to-guarded" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://guarded.example/blocked/x")
      case "/to-guarded-open" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://guarded.example/open/x")
      case "/to-bare" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://bare.example/anything")
      case "/to-flaky-robots" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://flakyrobots.example/page")
      case "/to-redirrobots" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://redirrobots.example/blocked/x")
      case "/to-redirrobots-open" => FetchResponse(301, null, Array.emptyByteArray,
        location = "http://redirrobots.example/open/x")
      case "/to-flakonce-1" | "/to-flakonce-2" =>
        FetchResponse(301, null, Array.emptyByteArray,
          location = url.replaceAll("/to-flakonce-\\d",
            "").replace("rd.example", "flakonce.example") + "/page")
      case "/real-robots.txt" => FetchResponse(200, "text/plain",
        "User-agent: *\nDisallow: /blocked/\n".getBytes(UTF_8))
      case "/robots.txt" =>
        val host = url.substring(url.indexOf("://") + 3).takeWhile(_ != '/')
        host match {
          case "guarded.example" => FetchResponse(200, "text/plain",
            "User-agent: *\nDisallow: /blocked/\n".getBytes(UTF_8))
          case "bare.example" => FetchResponse(404, "text/plain",
            "no robots".getBytes(UTF_8))
          // the ubiquitous robots.txt redirect (http->https shape)
          case "redirrobots.example" => FetchResponse(301, null,
            Array.emptyByteArray, location = "/real-robots.txt")
          // throws on the FIRST call, allows afterwards — pins that a
          // transport failure is not cached as permanent disallow
          case "flakonce.example" =>
            if (FetchTestState.bump(s"robots-attempt") == 1)
              throw new java.io.IOException("robots blip")
            else FetchResponse(200, "text/plain",
              "User-agent: *\nAllow: /\n".getBytes(UTF_8))
          case _ => FetchResponse(503, "text/plain", Array.emptyByteArray)
        }
      case "/rel" => FetchResponse(303, null, Array.emptyByteArray,
        location = "/chain/final")
      case "/noloc" => FetchResponse(301, null, Array.emptyByteArray)
      case "/tmpfail" => FetchResponse(302, null, Array.emptyByteArray,
        location = url.replace("/tmpfail", "/s503"))
      case "/s503" => FetchResponse(503, "text/plain", Array.emptyByteArray)
      case p => FetchResponse(200, "text/plain",
        s"content:$p".getBytes(UTF_8))
    }
  }
}

/** Cross-host gate recorder: denies hops onto blocked.example. */
object RedirectGates {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  val deny: (String, String) => Boolean = (from, to) => {
    seen.add((from, to)): Unit
    !to.contains("blocked.example") && !to.contains("other.example")
  }
}

/** Fetch executor pins: per-host crawl-delay spacing under a logical
  * clock, retry/backoff attempt accounting, transport-failure audit rows
  * (kept out of the archive), and batch commit-log exactly-once across
  * restarts — completed batches never re-fetch, a crash-window batch
  * re-fetches exactly once with no duplicate records in the archive. */
class FetchSpec extends SparkSpec {

  private def logicalCfg(transport: Class[_], maxAttempts: Int = 3,
                         batchSize: Long = 100000L): Fetch.Config =
    Fetch.Config(
      transportClass = transport.getName,
      maxAttempts = maxAttempts,
      backoffMs = 1L,
      batchSize = batchSize,
      warcDate = "2026-01-01T00:00:00Z",
      clock = () => FetchTestState.clock.get(),
      sleeper = ms => { FetchTestState.clock.addAndGet(ms); () })

  test("per-host crawl-delay: consecutive fetches of a host are spaced, hosts don't cross-block") {
    FetchTestState.reset()
    import spark.implicits._
    val frontier = (for (h <- 0 until 3; i <- 0 until 10) yield
      (s"http://h$h.example/p/$i", s"h$h.example", 100L, i.toLong))
      .toDF("url", "domain", "crawl_delay_ms", "pos")
    val fetched = Fetch.fetchFrontier(frontier, logicalCfg(classOf[RecordingTransport]))
    assert(fetched.count() == 30)
    import scala.jdk.CollectionConverters._
    val byHost = FetchTestState.calls.asScala.toSeq
      .groupBy { case (url, _) => url.split("/")(2) }
    assert(byHost.keySet == Set("h0.example", "h1.example", "h2.example"))
    for ((host, calls) <- byHost) {
      val times = calls.map(_._2)
      assert(times.length == 10)
      // arrival order within a host IS fetch order (one task owns the host)
      times.sliding(2).foreach { case Seq(a, b) =>
        assert(b - a >= 100L, s"$host fetched ${b - a} apart (< crawl delay)")
      }
      // priority order: pos ascending
      val ids = calls.map(_._1.split("/").last.toInt)
      assert(ids == ids.sorted, s"$host fetched out of priority order: $ids")
    }
  }

  test("retry with backoff: flaky urls recover, 5xx exhausts attempts, counters add up") {
    FetchTestState.reset()
    import spark.implicits._
    val frontier = ((0 until 20).map(i => s"http://r.example/ok/$i") ++
      (0 until 5).map(i => s"http://r.example/flaky/$i") ++
      (0 until 3).map(i => s"http://r.example/s503/$i")).toDF("url")
    val fetched = Fetch.fetchFrontier(frontier, logicalCfg(classOf[FlakyTransport]))
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[Int]("status"), r.getAs[Int]("attempts"))).toMap
    assert(fetched.size == 28)
    for ((url, (status, attempts)) <- fetched) {
      if (url.contains("flaky")) assert((status, attempts) == (200, 3), s"$url: $status/$attempts")
      else if (url.contains("s503")) assert((status, attempts) == (503, 3), s"$url: $status/$attempts")
      else assert((status, attempts) == (200, 1), s"$url: $status/$attempts")
    }
  }

  test("transport failure after all attempts: audit row with error, excluded from the archive") {
    FetchTestState.reset()
    import spark.implicits._
    val frontier = (Seq("http://f.example/dead/1", "http://f.example/dead/2") ++
      (0 until 4).map(i => s"http://f.example/ok/$i")).toDF("url")
    val fetched = Fetch.fetchFrontier(frontier, logicalCfg(classOf[FlakyTransport]))
    fetched.cache()
    try {
      val rows = fetched.collect()
      assert(rows.length == 6)
      val dead = rows.filter(_.getAs[Int]("status") == -1)
      assert(dead.length == 2)
      dead.foreach { r =>
        assert(r.getAs[Int]("attempts") == 3)
        assert(r.getAs[String]("error").contains("connect refused"))
        assert(r.isNullAt(r.fieldIndex("body")))
      }
      assert(Fetch.toWarcRows(fetched).count() == 4,
        "failed fetches must not become WARC records")
    } finally { fetched.unpersist(); () }
  }

  test("run: batch commit log gives exactly-once across restart and crash window") {
    FetchTestState.reset()
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch_run").toString
    // ten hosts: batch membership is DOMAIN-derived (one batch owns all
    // of a host's urls — politeness holds across batch boundaries), so
    // the fixture needs several hosts for several non-empty batches
    val urls = for (h <- 0 until 10; i <- 0 until 10)
      yield s"http://b$h.example/p/$i"
    val frontier = urls.toDF("url")
    val cfg = logicalCfg(classOf[RecordingTransport], batchSize = 30L)

    val s1 = Fetch.run(frontier, s"$dir/out", checkpointDir = null, cfg = cfg)
    assert(s1.attempted == 100 && s1.ok == 100 && s1.failed == 0)
    assert(urls.forall(FetchTestState.counts(_) == 1))
    val back = spark.read.format("warc").load(s"$dir/out")
      .select("target_uri").as[String].collect()
    assert(back.length == 100 && back.toSet == urls.toSet,
      "archive must hold every url exactly once")

    // restart after completion: nothing re-fetches
    val s2 = Fetch.run(frontier, s"$dir/out", checkpointDir = null, cfg = cfg)
    assert(s2.attempted == 0, "completed batches must not re-fetch")
    assert(urls.forall(FetchTestState.counts(_) == 1))

    // crash window: batch 1 wrote its shards but never committed —
    // simulate by deleting its marker and rerunning
    val marker = new java.io.File(s"$dir/out/_fetch_commits/batch-00001.done")
    assert(marker.exists()); assert(marker.delete())
    val s3 = Fetch.run(frontier, s"$dir/out", checkpointDir = null, cfg = cfg)
    val batch1 = frontier
      .withColumn("b", pmod(xxhash64(
        regexp_extract(col("url"), "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)),
        lit(4L)))
      .filter(col("b") === 1L).select("url").as[String].collect().toSet
    // whole hosts re-fetch together: batch 1's url set is a union of
    // complete hosts (10 urls per member host)
    assert(batch1.nonEmpty && batch1.size % 10 == 0,
      s"domain batching must map whole hosts: ${batch1.size}")
    assert(s3.attempted == batch1.size,
      s"crash-window rerun must re-fetch exactly batch 1 (${batch1.size} urls), got ${s3.attempted}")
    for (u <- urls)
      assert(FetchTestState.counts(u) == (if (batch1(u)) 2 else 1), u)
    val back2 = spark.read.format("warc").load(s"$dir/out")
      .select("target_uri").as[String].collect()
    assert(back2.length == 100 && back2.toSet == urls.toSet,
      "the rewritten batch must not duplicate records")
  }

  test("run: the checkpoint plan pins nBatches and the frontier across resumes") {
    FetchTestState.reset()
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch_plan").toString
    val urls = (0 until 40).map(i => s"http://p.example/p/$i")
    val frontier = urls.toDF("url")
    Fetch.run(frontier, s"$dir/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RecordingTransport], batchSize = 10L)): Unit
    assert(urls.forall(FetchTestState.counts(_) == 1))
    // resume with a DIFFERENT batchSize: the recorded plan wins — no
    // url re-maps, nothing re-fetches
    val s2 = Fetch.run(frontier, s"$dir/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RecordingTransport], batchSize = 3L))
    assert(s2.attempted == 0, "recorded plan must govern the resume")
    // a CHANGED frontier under the same checkpoint fails loudly instead
    // of skipping/duplicating urls across committed batch indexes
    val grown = (urls :+ "http://p.example/p/new").toDF("url")
    val e = intercept[IllegalArgumentException] {
      Fetch.run(grown, s"$dir/out", checkpointDir = null,
        cfg = logicalCfg(classOf[RecordingTransport], batchSize = 10L))
    }
    assert(e.getMessage.contains("frontier changed"), e.getMessage)
    // a SAME-COUNT frontier with one url swapped must also fail: the
    // plan's content fingerprint (order-independent xxhash64 xor)
    // catches what the count cannot — silently resuming would never
    // fetch urls mapped into already-committed batches
    val swapped = (urls.tail :+ "http://p.example/p/swapped").toDF("url")
    val e2 = intercept[IllegalArgumentException] {
      Fetch.run(swapped, s"$dir/out", checkpointDir = null,
        cfg = logicalCfg(classOf[RecordingTransport], batchSize = 10L))
    }
    assert(e2.getMessage.contains("CONTENT changed"), e2.getMessage)
    // gzip mode: politeness repartition leaves most partitions empty —
    // the archive must stay readable (no 0-byte members) and indexed
    val dir2 = Files.createTempDirectory("fetch_gz").toString
    Fetch.run(frontier, s"$dir2/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RecordingTransport], batchSize = 10L)
        .copy(gzip = true)): Unit
    import spark.implicits._
    val back = spark.read.format("warc").load(s"$dir2/out")
      .select("target_uri").as[String].collect()
    assert(back.length == 40 && back.toSet == urls.toSet)
    // config validation is loud, before any job runs
    intercept[IllegalArgumentException] {
      logicalCfg(classOf[RecordingTransport], batchSize = 0L)
    }: Unit
    intercept[IllegalArgumentException] {
      logicalCfg(classOf[RecordingTransport], maxAttempts = 0)
    }: Unit
  }

  test("redirects: chains follow to content, caps/cycles/no-location record the 3xx") {
    FetchTestState.reset()
    import spark.implicits._
    val frontier = Seq(
      "http://rd.example/chain/1",   // 301 -> 302 -> 200
      "http://rd.example/rel",       // 303 with RELATIVE location
      "http://rd.example/loop/0",    // infinite: stops at maxRedirects
      "http://rd.example/cycle/a",   // a <-> b: stops at revisit
      "http://rd.example/noloc",     // 301 without Location: records
      "http://rd.example/tmpfail"    // redirects onto a 503: retries there
    ).toDF("url")
    val got = Fetch.fetchFrontier(frontier,
      logicalCfg(classOf[RedirectTransport]).copy(maxRedirects = 3))
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Int]("status"), r.getAs[scala.collection.Seq[String]]("redirects").toList,
          Option(r.getAs[Array[Byte]]("body"))
            .map(new String(_, StandardCharsets.UTF_8)).getOrElse(""),
          r.getAs[Int]("attempts")))).toMap

    val (cs, cchain, cbody, _) = got("http://rd.example/chain/1")
    assert(cs == 200 && cbody == "content:/chain/final")
    assert(cchain == Seq("http://rd.example/chain/2",
      "http://rd.example/chain/final"),
      s"chain must record resolved hops: $cchain")

    val (rs, rchain, rbody, _) = got("http://rd.example/rel")
    assert(rs == 200 && rbody == "content:/chain/final")
    assert(rchain == Seq("http://rd.example/chain/final"),
      "relative Location must resolve against the current url")

    // capped: /loop/0 -> 1 -> 2 -> 3, then the 301 at /loop/3 records
    val (ls, lchain, _, _) = got("http://rd.example/loop/0")
    assert(ls == 301 && lchain.size == 3, s"cap: $ls $lchain")

    // cycle: a -> b, then b's target (a) is already visited -> record b's 308
    val (ys, ychain, _, _) = got("http://rd.example/cycle/a")
    assert(ys == 308 && ychain == Seq("http://rd.example/cycle/b"),
      s"cycle: $ys $ychain")

    val (ns, nchain, _, _) = got("http://rd.example/noloc")
    assert(ns == 301 && nchain.isEmpty)

    // hop target retries: 302 -> 503 (3 attempts there), 4 attempts total
    val (ts, _, _, tatt) = got("http://rd.example/tmpfail")
    assert(ts == 503 && tatt == 4, s"tmpfail: $ts/$tatt")

    // the archive keys redirected rows under the ORIGINAL url
    val warc = Fetch.toWarcRows(Fetch.fetchFrontier(frontier,
      logicalCfg(classOf[RedirectTransport]).copy(maxRedirects = 3)))
      .select("target_uri").as[String].collect().toSet
    assert(warc.contains("http://rd.example/chain/1") &&
      !warc.exists(_.contains("/chain/final")),
      "final responses must archive under the original target-uri")
  }

  test("redirects: cross-host hops consult the robots re-gate") {
    FetchTestState.reset()
    RedirectGates.seen.clear()
    import spark.implicits._
    val frontier = Seq("http://rd.example/cross").toDF("url")
    // denied: the 301 records as-is and the gate saw the hop
    val denied = Fetch.fetchFrontier(frontier,
      logicalCfg(classOf[RedirectTransport])
        .copy(redirectGate = RedirectGates.deny))
      .collect().head
    assert(denied.getAs[Int]("status") == 301)
    assert(denied.getAs[scala.collection.Seq[String]]("redirects").toList.isEmpty)
    import scala.jdk.CollectionConverters._
    assert(RedirectGates.seen.asScala.toSeq ==
      Seq(("http://rd.example/cross", "http://other.example/landed")))
    // default gate allows: the hop lands on the other host's content
    val followed = Fetch.fetchFrontier(frontier,
      logicalCfg(classOf[RedirectTransport]))
      .collect().head
    assert(followed.getAs[Int]("status") == 200)
    assert(new String(followed.getAs[Array[Byte]]("body"),
      StandardCharsets.UTF_8) == "content:/landed")
  }

  test("redirects: the built-in robots re-gate fetches the target's robots.txt through the transport") {
    FetchTestState.reset()
    import spark.implicits._
    val frontier = Seq(
      "http://rd.example/to-guarded",      // target disallowed by robots
      "http://rd.example/to-guarded-open", // target allowed by robots
      "http://rd.example/to-bare",         // robots 404 -> crawl default
      "http://rd.example/to-flaky-robots"  // robots 503 -> assume disallow
    ).toDF("url")
    val got = Fetch.fetchFrontier(frontier,
      logicalCfg(classOf[RedirectTransport])
        .copy(redirectRobotsGate = true))
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Int]("status"),
          r.getAs[scala.collection.Seq[String]]("redirects").toList))).toMap
    assert(got("http://rd.example/to-guarded") == ((301, Nil)),
      "disallowed target: record the 3xx, don't follow")
    assert(got("http://rd.example/to-guarded-open")._1 == 200)
    assert(got("http://rd.example/to-bare")._1 == 200,
      "robots 404 means no robots: crawl default allows")
    assert(got("http://rd.example/to-flaky-robots") == ((301, Nil)),
      "robots 5xx: RFC 9309 assume-complete-disallow")
    // memoized per authority: guarded.example's robots fetched ONCE for
    // its two hops (may be 0 here if another test in this JVM already
    // cached it — assert <= 1, the anti-thrash bound)
    assert(FetchTestState.counts.getOrElse(
      "http://guarded.example/robots.txt", 0) <= 1,
      "robots.txt must be fetched at most once per authority per JVM")
  }

  test("redirects: robots.txt redirects follow; a robots transport blip is never cached") {
    FetchTestState.reset()
    import spark.implicits._
    // redirrobots.example serves robots via a 301 (the http->https
    // shape): the gate must follow it and read the REAL rules — a
    // never-following gate would see no rules and allow /blocked/
    val frontier = Seq(
      ("http://rd.example/to-redirrobots", 0L),
      ("http://rd.example/to-redirrobots-open", 1L),
      // flakonce: robots fetch THROWS once; the failure must deny this
      // hop without poisoning the cache for the next row
      ("http://rd.example/to-flakonce-1", 2L),
      ("http://rd.example/to-flakonce-2", 3L)).toDF("url", "pos")
    val got = Fetch.fetchFrontier(frontier,
      logicalCfg(classOf[RedirectTransport])
        .copy(redirectRobotsGate = true))
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Int]("status"))
      .toMap
    assert(got("http://rd.example/to-redirrobots") == 301,
      "redirected robots rules must still gate /blocked/")
    assert(got("http://rd.example/to-redirrobots-open") == 200)
    assert(got("http://rd.example/to-flakonce-1") == 301,
      "a robots transport failure denies the hop")
    assert(got("http://rd.example/to-flakonce-2") == 200,
      "the failure must not be cached as permanent disallow")
  }

  test("redirects: a same-hostname different-port hop is a cross-ORIGIN hop (gate consulted)") {
    FetchTestState.reset()
    RedirectGates.seen.clear()
    import spark.implicits._
    // RFC 9309 scopes robots per scheme+authority: rd.example:8080 has
    // its own robots file, so the hop must consult the gate even though
    // the hostname matches
    val denyPorts: (String, String) => Boolean = (from, to) => {
      RedirectGates.seen.add((from, to)): Unit
      false
    }
    val row = Fetch.fetchFrontier(
      Seq("http://rd.example/cross-port").toDF("url"),
      logicalCfg(classOf[RedirectTransport]).copy(redirectGate = denyPorts))
      .collect().head
    assert(row.getAs[Int]("status") == 301)
    import scala.jdk.CollectionConverters._
    assert(RedirectGates.seen.asScala.toSeq == Seq(
      ("http://rd.example/cross-port", "http://rd.example:8080/landed")),
      "the port-crossing hop must reach the gate")
  }

  test("run: a plan from a different batching release fails loudly; duplicate urls fingerprint") {
    FetchTestState.reset()
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch_legacy").toString
    val urls = (0 until 10).map(i => s"http://lg.example/p/$i")
    Fetch.run(urls.toDF("url"), s"$dir/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RecordingTransport])): Unit
    // overwrite the plan with a legacy 2-field line (url-hash era);
    // drop the Hadoop local-FS checksum sidecar or the read-back fails
    // on the crc instead of the version check
    val plan = java.nio.file.Paths.get(s"$dir/out/_fetch_commits/plan")
    java.nio.file.Files.write(plan, "1\t10\n".getBytes(StandardCharsets.UTF_8)): Unit
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/out/_fetch_commits/.plan.crc")): Unit
    val e = intercept[IllegalArgumentException] {
      Fetch.run(urls.toDF("url"), s"$dir/out", checkpointDir = null,
        cfg = logicalCfg(classOf[RecordingTransport]))
    }
    assert(e.getMessage.contains("batch-membership"), e.getMessage)

    // even-multiplicity blindness: {A,A,B} vs {C,C,B} share count AND
    // xor; the SUM fingerprint must tell them apart
    val dir2 = Files.createTempDirectory("fetch_dupfp").toString
    val aab = Seq("http://fp.example/a", "http://fp.example/a",
      "http://fp.example/b").toDF("url")
    val ccb = Seq("http://fp.example/c", "http://fp.example/c",
      "http://fp.example/b").toDF("url")
    Fetch.run(aab, s"$dir2/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RecordingTransport])): Unit
    val e2 = intercept[IllegalArgumentException] {
      Fetch.run(ccb, s"$dir2/out", checkpointDir = null,
        cfg = logicalCfg(classOf[RecordingTransport]))
    }
    assert(e2.getMessage.contains("CONTENT changed"), e2.getMessage)
  }

  test("toWarcRows round-trips through the writer with parsed HTTP envelope") {
    FetchTestState.reset()
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch_warc").toString
    val frontier = (0 until 6).map(i => s"http://w.example/p/$i").toDF("url")
    Fetch.run(frontier, s"$dir/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RecordingTransport])): Unit
    val got = spark.read.format("warc").load(s"$dir/out")
      .select("target_uri", "http_status", "http_content_type", "record_id",
        "warc_date", "payload")
      .collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getAs[Int]("http_status") == 200)
      assert(r.getAs[String]("http_content_type") == "text/plain")
      assert(r.getAs[String]("record_id").startsWith("<urn:uuid:"))
      assert(r.getAs[String]("warc_date") == "2026-01-01T00:00:00Z")
      assert(new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8)
        == s"page:${r.getAs[String]("target_uri")}")
    }
  }

  test("host failure budget: a dead host short-circuits to audited skips, healthy hosts unaffected") {
    FetchTestState.reset()
    import spark.implicits._
    // host A: 100% 5xx; host B: healthy; host C: fail,OK,fail,fail — the
    // mid-sequence success must reset the consecutive counter, so the
    // budget of 2 never trips on C (no url there ever skips)
    val frontier = (
      (0 until 10).map(i => (s"http://a.example/s503/$i", i.toLong)) ++
      (0 until 5).map(i => (s"http://b.example/ok/$i", i.toLong)) ++
      Seq((s"http://c.example/dead/0", 0L), (s"http://c.example/ok/1", 1L),
        (s"http://c.example/dead/2", 2L), (s"http://c.example/dead/3", 3L))
    ).toDF("url", "pos")
    val cfg = logicalCfg(classOf[FlakyTransport], maxAttempts = 2)
      .copy(maxHostFailures = 2)
    val rows = Fetch.fetchFrontier(frontier, cfg).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Int]("status"), r.getAs[Int]("attempts"),
          Option(r.getAs[String]("error")).getOrElse("")))).toMap
    assert(rows.size == 19)
    // host A: the first two urls (pos order) burn the budget, the rest skip
    for (i <- 0 until 10) {
      val (st, att, err) = rows(s"http://a.example/s503/$i")
      if (i < 2) assert((st, att) == (503, 2), s"a/$i: $st/$att")
      else {
        assert((st, att) == (-1, 0), s"a/$i must be a budget skip: $st/$att")
        assert(err.contains("host failure budget"), err)
        assert(FetchTestState.counts.get(s"http://a.example/s503/$i").isEmpty,
          s"a/$i must never touch the wire")
      }
    }
    // host B: untouched by A's budget
    for (i <- 0 until 5)
      assert(rows(s"http://b.example/ok/$i")._1 == 200)
    // host C: every dead url genuinely attempted (attempts==2 — a budget
    // skip would show 0), because the ok/1 success reset the counter
    assert(rows("http://c.example/ok/1")._1 == 200)
    for (i <- Seq(0, 2, 3))
      assert((rows(s"http://c.example/dead/$i")._1,
        rows(s"http://c.example/dead/$i")._2) == ((-1, 2)),
        s"c/$i: ${rows(s"http://c.example/dead/$i")}")
  }

  test("cross-round politeness: a last_fetch_ms floor delays the host's FIRST fetch") {
    FetchTestState.reset()
    FetchTestState.clock.set(1000L)
    import spark.implicits._
    // host f1 carries a floor from a 'previous round' at t=900 with
    // crawl_delay 300: its FIRST fetch must wait until 1200, and
    // within-round spacing still applies after it. (One host per call —
    // the logical clock is global, so a second host's sleeps would race.)
    val withFloor = Seq(
      ("http://f1.example/p/0", 900L, 0L),
      ("http://f1.example/p/1", 900L, 1L))
      .toDF("url", "last_fetch_ms", "pos")
      .withColumn("crawl_delay_ms", lit(300L))
    Fetch.fetchFrontier(withFloor, logicalCfg(classOf[RecordingTransport]))
      .count(): Unit
    import scala.jdk.CollectionConverters._
    val at = FetchTestState.calls.asScala.toSeq.toMap
    assert(at("http://f1.example/p/0") == 1200L,
      s"floor must delay the first fetch: ${at("http://f1.example/p/0")}")
    assert(at("http://f1.example/p/1") == 1500L,
      s"within-round spacing after the floor: ${at("http://f1.example/p/1")}")
    // no floor (0/absent) = original semantics: first fetch is immediate
    FetchTestState.reset()
    FetchTestState.clock.set(1000L)
    val noFloor = Seq(("http://f2.example/p/0", 0L, 0L))
      .toDF("url", "last_fetch_ms", "pos")
      .withColumn("crawl_delay_ms", lit(300L))
    Fetch.fetchFrontier(noFloor, logicalCfg(classOf[RecordingTransport]))
      .count(): Unit
    val at2 = FetchTestState.calls.asScala.toSeq.toMap
    assert(at2("http://f2.example/p/0") == 1000L,
      s"no floor, no wait: ${at2("http://f2.example/p/0")}")
  }

  test("per-hop WARC records: includeHops archives the 3xx envelope per followed hop") {
    FetchTestState.reset()
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch_hops").toString
    val frontier = Seq("http://rd.example/chain/1",
      "http://rd.example/plain").toDF("url")
    Fetch.run(frontier, s"$dir/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RedirectTransport]).copy(warcHops = true)): Unit
    val got = spark.read.format("warc").load(s"$dir/out")
      .select("target_uri", "http_status", "warc_type", "payload")
      .collect()
      .map(r => (r.getAs[String]("target_uri"), r.getAs[Int]("http_status"),
        r.getAs[String]("warc_type"),
        new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8)))
      .toSet
    // the chain's request url carries the FINAL response (the standing
    // convention) AND its own 301 hop record; the intermediate hop its
    // 302; hop payloads are envelope-only (empty body after the parse)
    assert(got == Set(
      ("http://rd.example/chain/1", 200, "response", "content:/chain/final"),
      ("http://rd.example/chain/1", 301, "response", ""),
      ("http://rd.example/chain/2", 302, "response", ""),
      ("http://rd.example/plain", 200, "response", "content:/plain")),
      s"got: $got")
    // the raw record bytes carry the Location header per ISO 28500 §6
    val raw = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".warc"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath),
        StandardCharsets.ISO_8859_1)).mkString
    assert(raw.contains("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: http://rd.example/chain/2"),
      "hop 1's envelope must carry its status line + Location")
    assert(raw.contains("HTTP/1.1 302 Found\r\n" +
      "Location: http://rd.example/chain/final"),
      "hop 2's envelope must carry its status line + Location")
    // default (warcHops=false) stays byte-compatible: finals only
    val dir2 = Files.createTempDirectory("fetch_nohops").toString
    Fetch.run(frontier, s"$dir2/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RedirectTransport])): Unit
    assert(spark.read.format("warc").load(s"$dir2/out").count() == 2)
  }

  test("run: the audit sidecar lands per batch, commits with the batch, and carries chains/failures/marks") {
    FetchTestState.reset()
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch_audit").toString
    // FlakyTransport covers ok/failure rows; chains ride through a
    // second RedirectTransport run below (one transport per run)
    val urls = Seq("http://au.example/ok/1", "http://au.example/dead/2")
    val s1 = Fetch.run(urls.take(2).toDF("url"), s"$dir/out",
      checkpointDir = null,
      cfg = logicalCfg(classOf[FlakyTransport], maxAttempts = 2),
      auditDir = s"$dir/audit")
    assert(s1.attempted == 2 && s1.ok == 1 && s1.failed == 1)
    val audit = spark.read.parquet(s"$dir/audit/batch-*")
    assert(audit.columns.toSet ==
      Set("url", "domain", "status", "content_type", "attempts", "error",
        "redirects", "fetched_at", "hops"),
      "audit = FetchedRow minus body")
    val byUrl = audit.collect().map(r => r.getAs[String]("url") -> r).toMap
    assert(byUrl("http://au.example/ok/1").getAs[Int]("status") == 200)
    val dead = byUrl("http://au.example/dead/2")
    assert(dead.getAs[Int]("status") == -1 &&
      dead.getAs[String]("error").contains("connect refused"))
    assert(byUrl.values.forall(_.getAs[Long]("fetched_at") >= 0L))
    // a completed run's resume must not rewrite audit (no re-fetch)
    val s2 = Fetch.run(urls.take(2).toDF("url"), s"$dir/out",
      checkpointDir = null,
      cfg = logicalCfg(classOf[FlakyTransport], maxAttempts = 2),
      auditDir = s"$dir/audit")
    assert(s2.attempted == 0)
    // redirect chains ride in the audit (the crawl loop's resolution base)
    val dir2 = Files.createTempDirectory("fetch_audit2").toString
    Fetch.run(Seq("http://rd.example/chain/1").toDF("url"), s"$dir2/out",
      checkpointDir = null, cfg = logicalCfg(classOf[RedirectTransport]),
      auditDir = s"$dir2/audit"): Unit
    val chain = spark.read.parquet(s"$dir2/audit/batch-*").collect()(0)
    assert(chain.getAs[scala.collection.Seq[String]]("redirects").toList ==
      List("http://rd.example/chain/2", "http://rd.example/chain/final"))
    val hops = chain.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hops")
    assert(hops.map(h => (h.getAs[String]("url"), h.getAs[Int]("status"))).toList ==
      List(("http://rd.example/chain/1", 301),
        ("http://rd.example/chain/2", 302)))
  }

  test("per-host round cap: overflow defers in priority order with zero wire calls, other hosts unaffected") {
    FetchTestState.reset()
    import spark.implicits._
    // Zipf shape: one host floods the frontier, a small host rides along
    val frontier = ((0 until 50).map(i =>
      (s"http://big.example/p/$i", "big.example", 0L, i.toLong)) ++
      (0 until 3).map(i =>
        (s"http://small.example/p/$i", "small.example", 0L, i.toLong)))
      .toDF("url", "domain", "crawl_delay_ms", "pos")
    val cfg = logicalCfg(classOf[RecordingTransport])
      .copy(maxPerHostPerRound = 10L)
    val fetched = Fetch.fetchFrontier(frontier, cfg)
    fetched.cache()
    try {
      val rows = fetched.collect()
      assert(rows.length == 53, "every frontier row is accounted for")
      val (big, small) = rows.partition(_.getAs[String]("domain") == "big.example")
      assert(small.forall(_.getAs[Int]("status") == 200),
        "the small host must be untouched by the big host's cap")
      val (done, deferred) = big.partition(_.getAs[Int]("status") == 200)
      assert(done.length == 10 && deferred.length == 40,
        s"cap 10 on 50 urls: got ${done.length} fetched / ${deferred.length} deferred")
      // the 10 FETCHED rows are the host's priority head (pos 0-9)
      assert(done.map(_.getAs[String]("url").split("/").last.toInt).sorted.toSeq ==
        (0 until 10), "the cap must keep the politeness-order head")
      deferred.foreach { r =>
        assert(r.getAs[Int]("status") == Fetch.StatusDeferred)
        assert(r.getAs[Int]("attempts") == 0, "deferred rows make no exchange")
        assert(r.getAs[Long]("fetched_at") == 0L,
          "deferred rows must not move the politeness high-water mark")
        assert(r.getAs[String]("error").contains("per-host round cap"))
      }
      // zero wire calls for the overflow: exactly 13 transport calls
      assert(FetchTestState.calls.size == 13,
        s"wire calls: ${FetchTestState.calls.size} (want 10 + 3)")
      // deferred rows are neither archive records nor failure tombstones
      assert(Fetch.toWarcRows(fetched).count() == 13)
    } finally { fetched.unpersist(); () }
  }

  test("per-host round cap: run() counts deferrals in stats, separate from attempted/failed") {
    FetchTestState.reset()
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch_cap").toString
    val frontier = (0 until 8).map(i => s"http://capped.example/p/$i").toDF("url")
    val st = Fetch.run(frontier, s"$dir/out", checkpointDir = null,
      cfg = logicalCfg(classOf[RecordingTransport]).copy(maxPerHostPerRound = 3L),
      auditDir = s"$dir/audit")
    assert(st.attempted == 3 && st.ok == 3 && st.failed == 0 && st.deferred == 5,
      s"stats must separate deferrals: $st")
    assert(spark.read.format("warc").load(s"$dir/out").count() == 3)
    assert(spark.read.parquet(s"$dir/audit/batch-*")
      .filter(col("status") === Fetch.StatusDeferred).count() == 5,
      "the audit carries the deferred rows for the crawl loop to re-queue")
  }
}
