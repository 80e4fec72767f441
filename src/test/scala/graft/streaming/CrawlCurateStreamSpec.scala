package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.crawl.{Crawl, Fetch, FetchResponse, FetchTransport}
import graft.examples.CurationPipeline

/** Corpus-quality linked web for the crawl→curation integration golden:
  * `/p/<i>` carries a deterministic 30-word body (the
  * IncrementalCurationSpec doc generator, inside an HTML wrapper — far
  * from every other page, past the quality gates) and links to
  * `/p/<(2i+5)%N>` and `/p/<(3i+1)%N>`. */
final class CorpusWebTransport extends FetchTransport {
  import CorpusWebTransport._
  override def fetch(url: String, userAgent: String): FetchResponse = {
    val i = url.substring(url.lastIndexOf('/') + 1).toLong
    FetchResponse(200, "text/html; charset=utf-8",
      page(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
object CorpusWebTransport {
  val N = 40L
  def text(i: Long): String = {
    val r = new scala.util.Random(i)
    val words = (0 until 30).map(_ => s"w${r.nextInt(500)}")
    ("the of and to in a " * 3) + words.mkString(" ")
  }
  def page(i: Long): String =
    s"""<html><body><p>${text(i)}</p> <a href="/p/${(2 * i + 5) % N}">x</a> <a href="/p/${(3 * i + 1) % N}">y</a></body></html>"""
}

/** The one-command production pipeline END-TO-END: a restartable crawl
  * (`Crawl.run`) lands one WARC dir per round, `curate.stream` watches
  * `round_*` and drives each micro-batch through the full curation +
  * standing-corpus dedup chain — and the result must equal the BATCH
  * curate of the final archive (same pages in, same corpus out,
  * regardless of how the rounds were sliced into micro-batches). */
class CrawlCurateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("crawl rounds stream into curation; standing corpus equals the batch curate of the archive") {
    val out = java.nio.file.Files.createTempDirectory("ccs-crawl").toString
    val standing = java.nio.file.Files.createTempDirectory("ccs-std").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ccs-ckpt").toString

    val stats = Crawl.run(Seq("http://cw.test/p/1").toDF("url"), out,
      Fetch.Config(transportClass = classOf[CorpusWebTransport].getName),
      maxDepth = 2)
    assert(stats.size == 3 && stats.map(_.ok).sum > 3,
      s"the crawl must land several pages across 3 rounds: $stats")

    // stream the round dirs through the SAME projection + batch body the
    // CLI wires (warcDocs → IncrementalCuration); maxFilesPerTrigger=1
    // forces several micro-batches so the INCREMENTAL path (bootstrap +
    // dedup-against-standing increments) is exercised, not one big batch
    val benchmark = Seq.empty[String].toDF("text")
    val cfg = CurationPipeline.Config(htmlInput = true)
    val q = IncrementalCuration.start(
      IncrementalCuration.warcDocs(
        spark.readStream.format("warc")
          .option("maxFilesPerTrigger", 1)
          .load(s"$out/round_*")),
      standing, benchmark, ckpt, cfg)
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(standing)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    val batch = CurationPipeline.curate(
        IncrementalCuration.warcDocs(
          spark.read.format("warc").load(s"$out/round_*")),
        benchmark, cfg = cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(streamed.nonEmpty, "the curated corpus must not be empty")
    assert(streamed == batch,
      s"streamed corpus must equal the batch curate: " +
        s"stream-only=${(streamed -- batch).map(_._1)}, " +
        s"batch-only=${(batch -- streamed).map(_._1)}")

    // restart from the checkpoint: every round file's offset is
    // committed, so a re-run admits nothing and appends nothing
    val q2 = IncrementalCuration.start(
      IncrementalCuration.warcDocs(
        spark.readStream.format("warc")
          .option("maxFilesPerTrigger", 1)
          .load(s"$out/round_*")),
      standing, benchmark, ckpt, cfg)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(standing).count() == streamed.size.toLong,
      "a restarted stream over committed offsets must append nothing")
  }
}
