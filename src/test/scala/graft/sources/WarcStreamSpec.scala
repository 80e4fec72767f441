package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sinks.WarcWriter

/** Streaming WARC ingest: the 100 TB entry path's FOLLOW mode — watch a
  * crawl directory, admit each dropped `.warc[.gz]` file exactly once,
  * survive restarts from the checkpoint's metadata log.
  */
class WarcStreamSpec extends SparkSpec {

  private def mkRecords(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      (s"<urn:uuid:doc-$i>", "response", s"http://h.example/p/$i",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody-$i"
          .getBytes("UTF-8"))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date",
      "content_type", "payload")
  }

  /** Write ONE .warc (or .warc.gz) file named `name` into `watched`. */
  private def drop(ids: Seq[Long], watched: String, name: String,
                   gzip: Boolean = false): Unit = {
    val tmp = Files.createTempDirectory("warc-drop").toString
    WarcWriter.write(mkRecords(ids).coalesce(1), tmp, gzip = gzip)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("part-")).head
    Files.move(part.toPath, Paths.get(watched, name))
  }

  private def uris(df: DataFrame): Set[String] = {
    import spark.implicits._
    df.select("target_uri").as[String].collect().toSet
  }

  private def uriSet(ids: Seq[Long]): Set[String] =
    ids.map(i => s"http://h.example/p/$i").toSet

  test("stream admits drops exactly once and survives restart") {
    val watched = Files.createTempDirectory("warc-watch").toString
    val ckpt = Files.createTempDirectory("warc-ck").toString
    val out = Files.createTempDirectory("warc-out").toString
    drop(1L to 5L, watched, "crawl-0001.warc")
    drop(6L to 8L, watched, "crawl-0002.warc.gz", gzip = true)

    def start() = spark.readStream.format("warc").load(watched)
      .select("record_id", "warc_type", "target_uri", "payload")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(100))
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(uris(spark.read.parquet(out)) == uriSet(1L to 8L))
      // MID-STREAM drop (mixed gz) absorbs without reprocessing old files
      drop(9L to 11L, watched, "crawl-0003.warc.gz", gzip = true)
      q1.processAllAvailable()
      assert(uris(spark.read.parquet(out)) == uriSet(1L to 11L))
      assert(spark.read.parquet(out).count() == 11,
        "no record may appear twice")
    } finally q1.stop()

    // restart from the checkpoint: a new drop admits, nothing replays
    drop(12L to 13L, watched, "crawl-0004.warc")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val df = spark.read.parquet(out)
      assert(uris(df) == uriSet(1L to 13L))
      assert(df.count() == 13, "restart must not re-append logged batches")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger paces admission; AvailableNow drains and exits") {
    val watched = Files.createTempDirectory("warc-watch2").toString
    val ckpt = Files.createTempDirectory("warc-ck2").toString
    drop(Seq(1L), watched, "a.warc")
    drop(Seq(2L), watched, "b.warc")
    drop(Seq(3L), watched, "c.warc")
    val batchSizes = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    val q = spark.readStream.format("warc")
      .option("maxFilesPerTrigger", "1").load(watched)
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) => {
        batchSizes.add(df.count()); ()
      })
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must terminate")
    import scala.collection.JavaConverters._
    val sizes = batchSizes.asScala.filter(_ > 0)
    assert(sizes.sum == 3)
    assert(sizes.forall(_ == 1L),
      s"maxFilesPerTrigger=1 must pace one file per batch: $sizes")
    assert(sizes.length == 3)
  }

  test("latestOffset honors the ReadLimit Spark passes, not the constructor option") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val watched = Files.createTempDirectory("warc-watch4").toString
    val ckpt = Files.createTempDirectory("warc-ck4").toString
    drop(Seq(1L), watched, "a.warc")
    drop(Seq(2L), watched, "b.warc")
    drop(Seq(3L), watched, "c.warc")
    // option says 2 per trigger, but Spark passes maxFiles(1) — the
    // passed limit must win (AvailableNow wrapping, admission control)
    val s = new WarcMicroBatchStream(Seq(watched), WarcDataSource.schema,
      WarcPred(None, Nil), ckpt, Some(2))
    def filesIn(off1: Long, off2: Long): Int =
      s.planInputPartitions(WarcFilesOffset(off1), WarcFilesOffset(off2))
        .map(_.asInstanceOf[WarcInputPartition].path).distinct.length
    val o1 = s.latestOffset(s.initialOffset(), ReadLimit.maxFiles(1))
    assert(o1.asInstanceOf[WarcFilesOffset].batch == 1L)
    assert(filesIn(0, 1) == 1, "maxFiles(1) must admit exactly one file")
    // a composite limit takes the tightest file cap it contains
    val o2 = s.latestOffset(o1, ReadLimit.compositeLimit(
      Array(ReadLimit.allAvailable(), ReadLimit.maxFiles(1))))
    assert(o2.asInstanceOf[WarcFilesOffset].batch == 2L)
    assert(filesIn(1, 2) == 1, "composite(maxFiles(1)) must admit one file")
    // allAvailable drains the rest regardless of the option cap
    val o3 = s.latestOffset(o2, ReadLimit.allAvailable())
    assert(o3.asInstanceOf[WarcFilesOffset].batch == 3L)
    assert(filesIn(2, 3) == 1, "one file was left")
  }

  test("streaming replays a planned batch byte-identically from the log") {
    // simulate the crash window: offset log written, batch not committed
    // — a fresh stream instance must rebuild seen-set + latest batch
    // from the metadata log and plan the SAME files for (0, 1]
    val watched = Files.createTempDirectory("warc-watch3").toString
    val ckpt = Files.createTempDirectory("warc-ck3").toString
    drop(1L to 4L, watched, "x.warc")
    val s1 = new WarcMicroBatchStream(Seq(watched), WarcDataSource.schema,
      WarcPred(None, Nil), ckpt, None)
    val off = s1.latestOffset(s1.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(off.asInstanceOf[WarcFilesOffset].batch == 1L)
    val parts1 = s1.planInputPartitions(s1.initialOffset(), off)
    // fresh instance (the restarted driver)
    val s2 = new WarcMicroBatchStream(Seq(watched), WarcDataSource.schema,
      WarcPred(None, Nil), ckpt, None)
    val parts2 = s2.planInputPartitions(WarcFilesOffset(0), WarcFilesOffset(1))
    assert(parts1.map(_.toString).toSeq == parts2.map(_.toString).toSeq)
    // and the already-admitted file never re-admits
    val off2 = s2.latestOffset(WarcFilesOffset(1),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(off2.asInstanceOf[WarcFilesOffset].batch == 1L, "nothing new")
  }
}
