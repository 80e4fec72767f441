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
    val urls = (0 until 100).map(i => s"http://b.example/p/$i")
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
      .withColumn("b", pmod(xxhash64(col("url")), lit(4L)))
      .filter(col("b") === 1L).select("url").as[String].collect().toSet
    assert(batch1.nonEmpty && s3.attempted == batch1.size,
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
}
