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
