package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

import graft.ops.TextAnalysis

/** The crawl loop CLOSED OVER DISCOVERY: bounded-depth BFS where the
  * edges are not a table but the web itself — fetch the frontier, parse
  * the fetched HTML for outlinks, resolve + canonicalize them, drop the
  * already-visited, and fetch the survivors as the next round. This is
  * the orchestrator a real corpus build runs on top of
  * [[Fetch.fetchFrontier]] (which owns politeness, retries, redirects,
  * robots re-gating); [[graft.ops.Graph.bfsLevels]] is the static-edge
  * sibling (levels over a KNOWN link table).
  *
  * 100 TB shape: every shuffle in the loop is keyed on URLs and carries
  * URL-SIZED rows only — link extraction happens in the same stage that
  * reads the fetched round (bodies never shuffle), the visited set is a
  * url-only frame, and the next frontier is `distinct ⋈ anti-join`
  * exactly like distributed BFS. Rounds are localCheckpoint barriers
  * (flat lineage — depth-d lineage would re-FETCH the whole crawl on a
  * retry), with superseded rounds freed deterministically
  * (CheckpointBridge, the pageRank discipline) so a long crawl does not
  * strand storage. Depth and per-round frontier size are loud bounds:
  * the web is unbounded by construction, so an un-scoped crawl failing
  * fast beats one that OOMs the visited set three hours in.
  */
object Crawl {

  /** Runaway guard: a round's frontier exceeding this fails loudly with
    * a pointer at `scope` — mirroring Sampling.MaxMixGroups. At 100 TB
    * the visited set shards fine far beyond this, but a frontier
    * GROWING past it means the scope predicate is not actually bounding
    * the crawl, and every further round multiplies the damage. */
  val MaxFrontierPerRound: Long = 50000000L

  /** Fetched rows ([[FetchedRow]] columns) + `depth` (BFS hop at which
    * the URL was first discovered; seeds are depth 0). One row per
    * distinct canonical URL — a URL reachable from many parents fetches
    * once, at its minimum depth.
    *
    * @param seeds    frame with a `url` column (canonicalized here)
    * @param cfg      transport/politeness config, per [[Fetch.Config]]
    * @param maxDepth rounds past the seeds (0 = fetch seeds only)
    * @param scope    predicate over the canonical URL column gating
    *                 which discovered links enter the frontier (host
    *                 allowlists, path prefixes…). Seeds bypass it.
    * @param maxFrontierPerRound loud runaway bound, see
    *                 [[MaxFrontierPerRound]]
    */
  def bfs(seeds: DataFrame, cfg: Fetch.Config, maxDepth: Int,
          scope: Column => Column = _ => lit(true),
          maxFrontierPerRound: Long = MaxFrontierPerRound): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be non-negative: $maxDepth")
    require(maxFrontierPerRound >= 1,
      s"maxFrontierPerRound must be positive: $maxFrontierPerRound")

    var frontier = seeds
      .select(TextAnalysis.canonicalUrl(col("url")).as("url"))
      .filter(col("url").isNotNull).distinct()
      .localCheckpoint(false)
    var visited = frontier
    var prevFrontier: DataFrame = null
    var prevVisited: DataFrame = null
    var rounds = Vector.empty[DataFrame]
    var depth = 0
    // round 0 always runs — on an empty seed set it fetches nothing and
    // the output is the (correctly-schemad) empty archive, total for free
    var drained = false
    while (depth <= maxDepth && !drained) {
      // EAGER: fetching is the externally-visible side effect — it must
      // run exactly once per round, here, not wherever a lazy plan
      // happens to first act on it (and never AGAIN on a downstream
      // re-execution: the checkpoint truncates lineage at the archive)
      val fetched = Fetch.fetchFrontier(frontier, cfg)
        .withColumn("depth", lit(depth))
        .localCheckpoint(true)
      rounds :+= fetched
      if (depth == maxDepth) drained = true
      else {
        val next = fetched
          .filter(col("status").between(200, 299) &&
            col("content_type").startsWith("text/html"))
          .select(col("url").as("base"),
            explode(TextAnalysis.htmlLinks(col("body").cast("string")))
              .as("link"))
          .select(TextAnalysis.canonicalUrl(
            TextAnalysis.resolveUrl(col("base"), col("link.url"))).as("url"))
          .filter(col("url").isNotNull &&
            (col("url").startsWith("http://") ||
              col("url").startsWith("https://")) &&
            scope(col("url")))
          .distinct()
          .join(visited, Seq("url"), "left_anti")
          .localCheckpoint(false)
        val n = next.count() // materializes; doubles as the runaway gauge
        drained = n == 0L
        if (n > maxFrontierPerRound)
          throw new IllegalArgumentException(
            s"crawl frontier exploded: round ${depth + 1} discovered $n new " +
              s"URLs (bound $maxFrontierPerRound). Tighten `scope` (host " +
              "allowlist / path prefix) or raise maxFrontierPerRound if the " +
              "storage budget genuinely covers it.")
        if (drained) CheckpointBridge.unpersist(next)
        else {
          // the round before last is provably dead (this round's frames
          // are materialized); free it deterministically
          if (prevFrontier ne null) CheckpointBridge.unpersist(prevFrontier)
          if ((prevVisited ne null) && (prevVisited ne prevFrontier))
            CheckpointBridge.unpersist(prevVisited)
          prevFrontier = frontier
          prevVisited = visited
          visited = visited.union(next).localCheckpoint(false)
          frontier = next
        }
      }
      depth += 1
    }
    // EAGER final materialization, then free every loop frame — the
    // per-round archives, the frontier/visited chain — so the session
    // settles back to (exactly) the one result checkpoint
    val out = rounds.reduce(_ unionByName _).localCheckpoint(true)
    val live = rounds ++ Seq(prevFrontier, prevVisited, frontier, visited)
    live.filter(_ ne null).zipWithIndex
      .filter { case (df, i) => live.take(i).forall(_ ne df) }
      .foreach { case (df, _) => CheckpointBridge.unpersist(df) }
    out
  }

  /** The RESTARTABLE production form of [[bfs]]: each round's archive
    * goes straight to disk through [[Fetch.run]]'s batch commit-log
    * (exactly-once WARC under `outDir/round_<d>/`), each round's
    * frontier is persisted as parquet BEFORE fetching
    * (`outDir/_crawl/frontier_<d>/` — the resume identity
    * [[Fetch.run]]'s plan fingerprint verifies), and link extraction
    * reads the round's archive back from disk. Re-running a crashed
    * crawl with the same `outDir` therefore resumes at the first
    * unfinished batch of the first unfinished round and never re-fetches
    * a committed batch — a multi-hour 100 TB crawl survives driver loss
    * with bounded re-work, where [[bfs]] (checkpoint-barrier rounds in
    * executor storage) would restart from the seeds.
    *
    * Semantics match [[bfs]] (min-depth, one fetch per distinct
    * canonical URL, `scope`/`maxFrontierPerRound` gates). Differences,
    * both inherited from [[Fetch.run]]: terminal transport failures are
    * counted in the returned stats but have no archive record (re-crawl
    * them with a fresh outDir); archives land per ROUND, so depth is the
    * directory, not a column. `curate.stream` can watch any round dir.
    *
    * Returns one [[FetchStats]] per executed round (resumed rounds
    * report only the re-fetched crash window — already-committed batches
    * contribute zero, the [[Fetch.run]] contract). */
  def run(seeds: DataFrame, outDir: String, cfg: Fetch.Config, maxDepth: Int,
          scope: Column => Column = _ => lit(true),
          maxFrontierPerRound: Long = MaxFrontierPerRound): Seq[FetchStats] = {
    require(maxDepth >= 0, s"maxDepth must be non-negative: $maxDepth")
    val spark = seeds.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    def frontierDir(d: Int) = s"$outDir/_crawl/frontier_$d"
    def roundDir(d: Int) = s"$outDir/round_$d"
    def complete(dir: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      p.getFileSystem(hconf).exists(p)
    }
    var stats = Vector.empty[FetchStats]
    var visitedDirs = Vector.empty[String]
    var frontier = seeds
      .select(TextAnalysis.canonicalUrl(col("url")).as("url"))
      .filter(col("url").isNotNull).distinct()
    var depth = 0
    var drained = false
    while (!drained) {
      val fDir = frontierDir(depth)
      // the persisted parquet IS the round's identity: on resume it is
      // read back VERBATIM (recomputing it from a prior round's archive
      // yields the same multiset, but the disk copy is what Fetch.run's
      // plan fingerprint was recorded against); a partial write (no
      // _SUCCESS) is overwritten
      if (!complete(fDir))
        frontier.write.mode("overwrite").parquet(fDir)
      val persisted = spark.read.parquet(fDir)
      if (depth == 0 && persisted.isEmpty) return stats // nothing to crawl
      visitedDirs :+= fDir
      stats :+= Fetch.run(persisted, roundDir(depth),
        checkpointDir = s"$outDir/_crawl/commits_$depth", cfg)
      if (depth == maxDepth) drained = true
      else {
        val links = spark.read.format("warc").load(roundDir(depth))
          .filter(col("warc_type") === "response" &&
            col("http_status").between(200, 299) &&
            col("http_content_type").startsWith("text/html"))
          .select(col("target_uri").as("base"),
            explode(TextAnalysis.htmlLinks(col("payload").cast("string")))
              .as("link"))
          .select(TextAnalysis.canonicalUrl(
            TextAnalysis.resolveUrl(col("base"), col("link.url"))).as("url"))
          .filter(col("url").isNotNull &&
            (col("url").startsWith("http://") ||
              col("url").startsWith("https://")) &&
            scope(col("url")))
          .distinct()
        val visited = visitedDirs.map(spark.read.parquet(_))
          .reduce(_ unionByName _)
        val next = links.join(visited, Seq("url"), "left_anti")
        // cheap double-execution: both actions read url-sized frames off
        // disk-backed rounds (the archive scan is the only corpus-sized
        // leaf, and it prunes to 2xx-html rows either way)
        val n = next.count()
        if (n > maxFrontierPerRound)
          throw new IllegalArgumentException(
            s"crawl frontier exploded: round ${depth + 1} discovered $n " +
              s"new URLs (bound $maxFrontierPerRound). Tighten `scope` " +
              "(host allowlist / path prefix) or raise " +
              "maxFrontierPerRound if the storage budget genuinely " +
              "covers it.")
        drained = n == 0L
        frontier = next
        depth += 1
      }
    }
    stats
  }
}

/** Deterministic LINKED web for tests and the graded w05 fixture: the
  * page at `http://site<h>.test/p/<id>` (h mod [[SyntheticWebTransport.H]],
  * id mod [[SyntheticWebTransport.N]]) links to `/p/<(2·id+5) mod N>`,
  * `/p/<(3·id+1) mod N>`, and the same id on the next host — a pure
  * function of the URL, so a DuckDB recursive CTE states the whole
  * reachable set analytically. `id % 13 == 0` pages are planted 404s
  * (fetched, archived, but contributing no outlinks). */
final class SyntheticWebTransport extends FetchTransport {
  import SyntheticWebTransport._
  override def fetch(url: String, userAgent: String): FetchResponse = {
    calls.incrementAndGet(): Unit
    val m = UrlRe.findFirstMatchIn(url).getOrElse(
      throw new IllegalArgumentException(s"not a synthetic-web url: $url"))
    val h = m.group(1).toLong
    val id = m.group(2).toLong
    require(h < H && id < N, s"node ($h, $id) outside the ($H, $N) web: $url")
    if (id % 13 == 0)
      FetchResponse(404, "text/plain",
        "gone".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    else
      FetchResponse(200, "text/html; charset=utf-8",
        body(h, id).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

object SyntheticWebTransport {
  /** Web dimensions — the w05 oracle SQL states the same constants. */
  val H = 5L
  val N = 400L
  private val UrlRe = "^http://site(\\d+)\\.test/p/(\\d+)$".r
  /** Executor-call counter (tests run one-JVM local mode): the
    * no-refetch pin — a correct BFS calls fetch exactly once per
    * distinct reachable URL. */
  val calls = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Replicated CHARACTER-FOR-CHARACTER by the w05 oracle's SQL concat —
    * change one and the hash gate breaks. */
  def body(h: Long, id: Long): String =
    s"""<html><body><h1>node $h/$id</h1><a href="/p/${(2 * id + 5) % N}">x</a> <a href="/p/${(3 * id + 1) % N}">y</a> <a href="http://site${(h + 1) % H}.test/p/$id">hop</a></body></html>"""
}
