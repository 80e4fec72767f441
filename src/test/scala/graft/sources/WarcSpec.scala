package graft.sources

import java.io.{ByteArrayInputStream, EOFException, IOException, InputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sinks.WarcWriter
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** WARC DSv2 pins: writer→reader round trip (plain and record-per-member
  * gz), split-alignment sync scan with a planted trap payload, multi-member
  * gz decode under an `available()==0` stream, truncated-tail drop vs
  * aligned-corruption loud failure, headers-only IO (pruning is real byte
  * skipping, not post-hoc projection), and pushdown-residual correctness. */
class WarcSpec extends SparkSpec {

  private def http(body: String,
                   status: Int = 200,
                   ct: String = "text/html; charset=utf-8"): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ct\r\n\r\n$body")
      .getBytes(StandardCharsets.UTF_8)

  private def record(id: Long, body: String, status: Int = 200): Array[Byte] =
    WarcWriter.encodeRecord(
      warcType = "response",
      recordId = s"<urn:uuid:rec-$id>",
      targetUri = s"http://site$id.example.org/p/$id",
      warcDate = "2026-01-01T00:00:00Z",
      contentType = "application/http; msgtype=response",
      payload = http(body, status))

  private def writeFile(dir: String, name: String, chunks: Array[Byte]*): String = {
    val p = Paths.get(dir, name)
    val out = Files.newOutputStream(p)
    chunks.foreach(out.write)
    out.close()
    p.toString
  }

  private def readWarc(path: String) =
    spark.read.format("warc").load(path)

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b.scan.description() }
      .getOrElse(sys.error("no BatchScan leaf in plan"))

  // --------------------------------------------------------------- round trip

  test("writer -> reader round trip, plain .warc, all columns") {
    val dir = Files.createTempDirectory("warc_rt").toString
    import spark.implicits._
    val rows = (0L until 20L).map { i =>
      (s"<urn:uuid:rec-$i>", "response", s"http://site${i % 3}.example.org/p/$i",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        http(s"<html><body>doc $i</body></html>"))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date",
      "content_type", "payload")
    WarcWriter.write(rows.repartition(2), s"$dir/out")
    val back = readWarc(s"$dir/out")
      .select("record_id", "warc_type", "target_uri", "http_status",
        "http_content_type", "payload")
      .collect()
    assert(back.length == 20)
    val byId = back.map(r => r.getString(0) -> r).toMap
    for (i <- 0L until 20L) {
      val r = byId(s"<urn:uuid:rec-$i>")
      assert(r.getString(1) == "response")
      assert(r.getString(2) == s"http://site${i % 3}.example.org/p/$i")
      assert(r.getInt(3) == 200)
      assert(r.getString(4) == "text/html; charset=utf-8")
      // payload is the HTTP BODY (envelope parsed off)
      assert(new String(r.getAs[Array[Byte]](5), StandardCharsets.UTF_8) ==
        s"<html><body>doc $i</body></html>")
    }
  }

  test("format(\"warc\") resolves via DataSourceRegister (services file)") {
    // would throw "Failed to find data source: warc" if unregistered
    val dir = Files.createTempDirectory("warc_reg").toString
    writeFile(dir, "a.warc", record(1, "x"))
    assert(spark.read.format("warc").load(s"$dir/a.warc").count() == 1)
  }

  // ------------------------------------------------------ gz multi-member

  test("record-per-member .warc.gz: every member decodes (writer round trip)") {
    val dir = Files.createTempDirectory("warc_gz").toString
    import spark.implicits._
    val rows = (0L until 30L).map { i =>
      (s"<urn:uuid:rec-$i>", "response", s"http://h.example.org/$i",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        http(s"body $i"))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date",
      "content_type", "payload")
    WarcWriter.write(rows.coalesce(1), s"$dir/out", gzip = true)
    val files = new java.io.File(s"$dir/out").listFiles
      .filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 1)
    val got = readWarc(s"$dir/out")
      .select("record_id", "payload").collect()
      .map(r => r.getString(0) ->
        new String(r.getAs[Array[Byte]](1), StandardCharsets.UTF_8)).toMap
    assert(got.size == 30, s"expected 30 members decoded, got ${got.size}")
    for (i <- 0L until 30L) assert(got(s"<urn:uuid:rec-$i>") == s"body $i")
  }

  test("GzipMembersInputStream survives available()==0 member boundaries") {
    // the java.util GZIPInputStream failure mode: wrapped stream reports
    // available()==0 (object-store streams do), members after the first
    // silently vanish. Our framing must not consult available() at all.
    def member(s: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(b)
      gz.write(s.getBytes(StandardCharsets.UTF_8)); gz.close()
      b.toByteArray
    }
    val concat = (0 until 50).map(i => member(s"m$i|")).reduce(_ ++ _)
    val starving = new InputStream { // 1 byte per read, available()==0
      private val in = new ByteArrayInputStream(concat)
      override def read(): Int = in.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        in.read(b, off, math.min(len, 1))
      override def available(): Int = 0
    }
    val out = new String(
      new GzipMembersInputStream(starving).readAllBytes(),
      StandardCharsets.UTF_8)
    assert(out == (0 until 50).map(i => s"m$i|").mkString)
  }

  test("GzipMembersInputStream: corrupt member CRC fails loudly") {
    val b = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(b)
    gz.write(("x" * 200).getBytes(StandardCharsets.UTF_8)); gz.close()
    val bytes = b.toByteArray
    bytes(bytes.length - 12) = (bytes(bytes.length - 12) ^ 0x41).toByte // flip deflate tail byte
    val ex = intercept[IOException] {
      new GzipMembersInputStream(new ByteArrayInputStream(bytes)).readAllBytes()
    }
    assert(!ex.isInstanceOf[EOFException]) // corruption, not truncation
  }

  test("GzipMembersInputStream: truncated member is EOFException, earlier members intact") {
    def member(s: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(b)
      gz.write(s.getBytes(StandardCharsets.UTF_8)); gz.close()
      b.toByteArray
    }
    val m1 = member("first-member-payload")
    val m2 = member("second-member-payload")
    val cut = m1 ++ m2.take(m2.length / 2)
    val in = new GzipMembersInputStream(new ByteArrayInputStream(cut))
    val buf = new Array[Byte]("first-member-payload".length)
    var got = 0
    val ex = intercept[EOFException] {
      while (true) {
        val n = in.read(buf, 0, buf.length)
        if (n < 0) throw new IllegalStateException("clean EOF on a truncated stream")
        got += n
      }
    }
    assert(ex.getMessage.contains("truncated"))
    assert(got >= "first-member-payload".length) // member 1 fully delivered
  }

  // ------------------------------------------------ split alignment + trap

  /** A payload embedding a SHORT well-formed WARC record stream (2
    * records then junk). Single-hop chain validation would false-sync on
    * it; the multi-hop chain runs off the embedded stream into junk and
    * rejects every embedded position. */
  private def trapPayload: Array[Byte] = {
    val embedded = record(9001, "embedded A") ++ record(9002, "embedded B")
    http("<html><pre>archive dump:\n") ++ embedded ++
      ("\n</pre><p>" + ("filler " * 2000) + "</p></html>")
        .getBytes(StandardCharsets.UTF_8)
  }

  test("split alignment: trap payload yields no spurious or duplicate rows") {
    val dir = Files.createTempDirectory("warc_trap").toString
    val trapRec = WarcWriter.encodeRecord("response", "<urn:uuid:trap>",
      "http://trap.example.org/", "2026-01-01T00:00:00Z",
      "application/http; msgtype=response", trapPayload)
    // records around the trap so several split boundaries land inside it
    val pre = (0 until 5).map(i => record(i, s"pre $i " * 50)).reduce(_ ++ _)
    val post = (5 until 10).map(i => record(i, s"post $i " * 50)).reduce(_ ++ _)
    val path = writeFile(dir, "trap.warc", pre, trapRec, post)
    val fileLen = Files.size(Paths.get(path))

    val unsplit = readWarc(path).select("record_id", "target_uri").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toVector
    assert(unsplit.length == 11)
    assert(!unsplit.exists(_._1.contains("rec-900")),
      "embedded trap records leaked into the unsplit read")

    // force many small splits: boundaries WILL land inside the trap
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, (fileLen / 7).max(1024L).toString)
      val split = readWarc(path).select("record_id", "target_uri").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toVector
      assert(split == unsplit,
        s"split read diverged: ${split.length} rows vs ${unsplit.length}")
    } finally spark.conf.set(key, old)
  }

  test("split alignment: every adversarial boundary partition pair covers exactly the file") {
    val dir = Files.createTempDirectory("warc_bound").toString
    val recs = (0 until 8).map(i => record(i, s"content $i " * 30))
    val path = writeFile(dir, "b.warc", recs.reduce(_ ++ _))
    val fileLen = Files.size(Paths.get(path))
    val truth = readWarc(path).select("record_id").collect()
      .map(_.getString(0)).sorted.toVector
    assert(truth.length == 8)
    // cut at every 997-byte stride: reader pair [0,cut) + [cut,len) must
    // reproduce the truth exactly (ownership protocol partitions records)
    val schema = StructType(WarcDataSource.schema.filter(_.name == "record_id"))
    for (cut <- 997L until fileLen by 997L) {
      val parts = Seq(
        WarcInputPartition(path, 0L, cut, gzipped = false),
        WarcInputPartition(path, cut, fileLen - cut, gzipped = false))
      val got = parts.flatMap { p =>
        val r = new WarcSplitPartitionReader(p, schema, WarcPred(None, Nil))
        val out = scala.collection.mutable.ArrayBuffer[String]()
        try { while (r.next()) out += r.get().getUTF8String(0).toString }
        finally r.close()
        out
      }.sorted.toVector
      assert(got == truth, s"boundary at $cut: ${got.length} rows")
    }
  }

  test("split region holding only the last complete records before a clipped tail still yields them") {
    // r8's header is clipped by EOF. A split boundary landing in the last
    // few records used to yield ZERO rows from that split: every chain
    // from r5..r7 hops into the clipped header, and a chain break there
    // rejected the (real) sync candidates — dropping complete records,
    // beyond the documented "drop only the partial record" convention.
    val dir = Files.createTempDirectory("warc_cliptail").toString
    val recs = (0 until 8).map(i => record(i, s"tail doc $i " * 20))
    val clipped = record(8, "never finished").take(40) // dies mid-HEADER
    val path = writeFile(dir, "cliptail.warc", recs.reduce(_ ++ _), clipped)
    val fileLen = Files.size(Paths.get(path))
    val want = (0 until 8).map(i => s"<urn:uuid:rec-$i>").sorted.toVector

    val schema = StructType(WarcDataSource.schema.filter(_.name == "record_id"))
    for (cut <- 997L until fileLen by 997L) {
      val parts = Seq(
        WarcInputPartition(path, 0L, cut, gzipped = false),
        WarcInputPartition(path, cut, fileLen - cut, gzipped = false))
      val got = parts.flatMap { p =>
        val r = new WarcSplitPartitionReader(p, schema, WarcPred(None, Nil))
        val out = scala.collection.mutable.ArrayBuffer[String]()
        try { while (r.next()) out += r.get().getUTF8String(0).toString }
        finally r.close()
        out
      }.sorted.toVector
      assert(got == want, s"boundary at $cut: ${got.length} of 8 rows")
    }
  }

  test("headerPrefixValid: clipped prefixes accepted, junk and complete blocks rejected") {
    def pv(s: String): Boolean = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      Warc.headerPrefixValid(b, 0, b.length)
    }
    // valid prefixes: EOF could have clipped a real header here
    assert(pv("WAR"))
    assert(pv("WARC/1."))
    assert(pv("WARC/1.0"))
    assert(pv("WARC/1.0\r\nWARC-Type: resp"))
    assert(pv("WARC/1.0\r\nWARC-Type: response\r\nContent-Le"))
    assert(pv("WARC/1.0\r\nWARC-Type: response\r\n")) // EOF before next line
    // junk: no amount of further bytes would make these parse
    assert(!pv("</pre><p>filler run-off from a trap payload"))
    assert(!pv("WARCX"))
    assert(!pv("WARC/zz"))
    assert(!pv("WARC/\r\n")) // empty version
    assert(!pv("WARC/1.0\r\n  folded-with-no-field"))
    assert(!pv("WARC/1.0\r\n: empty-name\r\n"))
    // a COMPLETE block (blank line present) that parseHeader rejects
    // failed for real reasons, not truncation
    assert(!pv("WARC/1.0\r\nFoo: bar\r\n\r\nrest-of-file"))
  }

  // ------------------------------------------------------- truncated tails

  test("plain .warc truncated mid-block: partial record dropped, scan ends clean") {
    val dir = Files.createTempDirectory("warc_tail").toString
    val full = (0 until 3).map(i => record(i, s"doc $i " * 40)).reduce(_ ++ _)
    val r3 = record(3, "tail " * 40)
    val cut = full ++ r3.take(r3.length - 50) // dies inside record 3's block
    val path = writeFile(dir, "cut.warc", cut)
    val ids = readWarc(path).select("record_id").collect().map(_.getString(0))
    assert(ids.sorted.toSeq ==
      (0 until 3).map(i => s"<urn:uuid:rec-$i>").sorted)
  }

  test("plain .warc truncated mid-header: partial record dropped") {
    val dir = Files.createTempDirectory("warc_tail2").toString
    val full = (0 until 3).map(i => record(i, s"doc $i")).reduce(_ ++ _)
    val r3 = record(3, "x")
    val cut = full ++ r3.take(30) // dies 30 bytes into record 3's HEADER
    val path = writeFile(dir, "cut2.warc", cut)
    assert(readWarc(path).count() == 3)
  }

  test(".warc.gz truncated mid-member: records before the cut survive") {
    val dir = Files.createTempDirectory("warc_tailgz").toString
    def gzMember(rec: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(b)
      gz.write(rec); gz.close()
      b.toByteArray
    }
    val members = (0 until 4).map(i => gzMember(record(i, s"doc $i " * 20)))
    val cutLast = members.last.take(members.last.length / 2)
    val path = writeFile(dir, "cut.warc.gz",
      (members.init :+ cutLast).reduce(_ ++ _))
    val ids = readWarc(path).select("record_id").collect().map(_.getString(0))
    assert(ids.sorted.toSeq == (0 until 3).map(i => s"<urn:uuid:rec-$i>").sorted)
  }

  test("corruption NEAR EOF with valid records after it fails loudly") {
    val dir = Files.createTempDirectory("warc_corrupt_eof").toString
    val good = record(0, "ok")
    // a short garbage run (well under the 64 KiB header cap from EOF)
    // followed by MORE VALID RECORDS: the tail heuristic must not
    // swallow them — a chain-valid record after the bad bytes proves
    // corruption, not a crawler dying mid-write
    val garbage = "XX-corrupted-record-bytes-XX".getBytes(StandardCharsets.UTF_8)
    val after = (1 until 4).map(i => record(i, s"doc $i")).reduce(_ ++ _)
    val path = writeFile(dir, "midbad.warc", good, garbage, after)
    val ex = intercept[Exception] { readWarc(path).count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IOException] &&
      c.getMessage != null && c.getMessage.contains("corruption")),
      s"wanted loud corruption failure, got $ex")
  }

  test("a file whose ONLY record was clipped mid-header drops as a tail") {
    val dir = Files.createTempDirectory("warc_firstclip").toString
    // the crawler died 30 bytes into the very first header: the file
    // opens with "WARC/", so it IS a WARC — a truncated one, not junk
    val cut = record(0, "never finished").take(30)
    val path = writeFile(dir, "firstclip.warc", cut)
    assert(readWarc(path).count() == 0)
  }

  test("a small non-WARC file fails loudly instead of yielding 0 rows") {
    val dir = Files.createTempDirectory("warc_notwarc").toString
    val junk = "this is a 200-byte text file, not a web archive at all "
      .getBytes(StandardCharsets.UTF_8)
    val path = writeFile(dir, "notwarc.warc", junk)
    val ex = intercept[Exception] { readWarc(path).count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IOException] &&
      c.getMessage != null && c.getMessage.contains("not a WARC file")),
      s"wanted loud not-a-WARC failure, got $ex")
  }

  test("aligned corruption (not a tail) fails loudly with file@offset") {
    val dir = Files.createTempDirectory("warc_corrupt").toString
    val good = record(0, "ok")
    // corruption followed by >64 KiB of data: unambiguously not a tail
    val garbage = ("GARBAGE-NOT-A-WARC-HEADER " * 4000).getBytes(StandardCharsets.UTF_8)
    val path = writeFile(dir, "bad.warc", good, garbage)
    val ex = intercept[Exception] { readWarc(path).count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IOException] &&
      c.getMessage != null && c.getMessage.contains("malformed WARC header")),
      s"wanted loud malformed-header failure, got $ex")
  }

  // ------------------------------------------------------------ pruning IO

  test("headers-only projection reads a small fraction of the bytes (plain)") {
    val dir = Files.createTempDirectory("warc_prune").toString
    val bigBody = "payload-byte " * 300000 // ~3.9 MB per record
    val path = writeFile(dir, "big.warc",
      (0 until 4).map(i => record(i, bigBody)).reduce(_ ++ _))
    val fileLen = Files.size(Paths.get(path))
    assert(fileLen > (4L << 20))

    val headerSchema = StructType(WarcDataSource.schema.filter(f =>
      f.name == "record_id" || f.name == "warc_type" || f.name == "content_length"))
    val part = WarcInputPartition(path, 0L, fileLen, gzipped = false)

    def fileBytesRead: Long = {
      import scala.collection.JavaConverters._
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .filter(_.getScheme == "file").map(_.getBytesRead).sum
    }
    def bytesRead(run: () => Unit): Long = {
      val before = fileBytesRead
      run()
      fileBytesRead - before
    }

    val headerBytes = bytesRead { () =>
      val r = new WarcSplitPartitionReader(part, headerSchema, WarcPred(None, Nil))
      var n = 0
      try { while (r.next()) n += 1 } finally r.close()
      assert(n == 4)
    }
    val fullBytes = bytesRead { () =>
      val r = new WarcSplitPartitionReader(part, WarcDataSource.schema, WarcPred(None, Nil))
      var n = 0
      try { while (r.next()) n += 1 } finally r.close()
      assert(n == 4)
    }
    assert(fullBytes >= fileLen,
      s"full read should touch every byte: $fullBytes of $fileLen")
    assert(headerBytes < fileLen / 4,
      s"headers-only read should SKIP blocks: read $headerBytes of $fileLen")
    // and the plan advertises the mode
    val prunedPlan = readWarc(path).select("record_id", "warc_type")
    assert(scanDescription(prunedPlan).contains("read=headers-only"),
      scanDescription(prunedPlan))
    assert(scanDescription(readWarc(path)).contains("read=full"))
  }

  test("gz envelope-only projection: http columns without payload materialization") {
    val dir = Files.createTempDirectory("warc_gzenv").toString
    import spark.implicits._
    val rows = (0 until 6).map { i =>
      (s"<urn:uuid:rec-$i>", "response", s"http://h/$i", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        http(s"b $i " * 50000, status = if (i % 2 == 0) 200 else 404))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date",
      "content_type", "payload")
    WarcWriter.write(rows.coalesce(1), s"$dir/out", gzip = true)
    val got = readWarc(s"$dir/out").select("record_id", "http_status").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.size == 6)
    for (i <- 0 until 6) assert(got(s"<urn:uuid:rec-$i>") == (if (i % 2 == 0) 200 else 404))
  }

  // ------------------------------------------------- gz member-index splits

  private def writeGzCorpus(n: Int): (String, String) = {
    val dir = Files.createTempDirectory("warc_gzidx").toString
    import spark.implicits._
    val rows = (0L until n.toLong).map { i =>
      (s"<urn:uuid:rec-$i>", "response", s"http://h.example/$i",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        http(s"payload $i " * 40))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date",
      "content_type", "payload")
    WarcWriter.write(rows.coalesce(1), s"$dir/out", gzip = true)
    val part = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    (dir, part.getAbsolutePath)
  }

  test("gz member index: writer emits sidecar, planner splits within the file, results match") {
    val (dir, gzFile) = writeGzCorpus(60)
    val sidecar = new java.io.File(new java.io.File(gzFile).getParent,
      s".${new java.io.File(gzFile).getName}.idx")
    assert(sidecar.exists(), "writer must emit the member-offset sidecar")
    val truth = readWarc(s"$dir/out").select("record_id").collect()
      .map(_.getString(0)).sorted.toVector
    assert(truth.length == 60)
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "4096")
      // planning pin: more partitions than files, all member-indexed
      val parts = WarcScan.partitionsFor(WarcScan.listFiles(Seq(s"$dir/out")))
        .map(_.asInstanceOf[WarcInputPartition])
      assert(parts.length > 1,
        s"an indexed gz file must split (got ${parts.length} partition)")
      assert(parts.forall(p => p.gzipped && p.indexed))
      val got = readWarc(s"$dir/out").select("record_id").collect()
        .map(_.getString(0)).sorted.toVector
      assert(got == truth, s"split gz read diverged: ${got.length} rows")
    } finally spark.conf.set(key, old)
  }

  test("gz member index: every adversarial boundary pair covers exactly the member set") {
    val (dir, gzFile) = writeGzCorpus(24)
    val fileLen = Files.size(Paths.get(gzFile))
    val truth = readWarc(s"$dir/out").select("record_id").collect()
      .map(_.getString(0)).sorted.toVector
    val schema = StructType(WarcDataSource.schema.filter(_.name == "record_id"))
    for (cut <- 101L until fileLen by 101L) {
      val parts = Seq(
        WarcInputPartition(gzFile, 0L, cut, gzipped = true, indexed = true),
        WarcInputPartition(gzFile, cut, fileLen - cut, gzipped = true, indexed = true))
      val got = parts.flatMap { p =>
        val r = new WarcGzPartitionReader(p, schema, WarcPred(None, Nil))
        val out = scala.collection.mutable.ArrayBuffer[String]()
        try { while (r.next()) out += r.get().getUTF8String(0).toString }
        finally r.close()
        out
      }.sorted.toVector
      assert(got == truth, s"boundary at $cut: ${got.length} of ${truth.length} rows")
    }
  }

  test("gz member index: provenance offsets identical to the sequential read; fallback without sidecar") {
    val (dir, gzFile) = writeGzCorpus(20)
    def offsets(): Map[String, Long] = {
      import org.apache.spark.sql.functions.col
      readWarc(s"$dir/out")
        .select(col("record_id"), col("_record_offset"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    val indexed = try { spark.conf.set(key, "4096"); offsets() }
      finally spark.conf.set(key, old)
    // delete the sidecar: same file must read file-granular, same offsets
    val sidecar = new java.io.File(new java.io.File(gzFile).getParent,
      s".${new java.io.File(gzFile).getName}.idx")
    assert(sidecar.delete())
    val parts = WarcScan.partitionsFor(WarcScan.listFiles(Seq(s"$dir/out")))
      .map(_.asInstanceOf[WarcInputPartition])
    assert(parts.length == 1 && !parts.head.indexed,
      "without a sidecar the file is one partition")
    val sequential = offsets()
    assert(indexed == sequential,
      "_record_offset must be the uncompressed offset in BOTH read modes")
  }

  test("empty partitions write no file; an empty third-party sidecar reads as zero rows") {
    val dir = Files.createTempDirectory("warc_empty").toString
    import spark.implicits._
    val rows = (0L until 3L).map { i =>
      (s"<urn:uuid:rec-$i>", "response", s"http://h.example/$i",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        http(s"b $i"))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date",
      "content_type", "payload")
    // 3 rows across 8 partitions: most are empty — no 0-byte archives or
    // 0-member sidecars may appear (the politeness-repartition shape)
    WarcWriter.write(rows.repartition(8), s"$dir/out", gzip = true)
    val files = new java.io.File(s"$dir/out").listFiles()
    assert(files.forall(_.length > 0), "no 0-byte files allowed")
    assert(files.count(_.getName.endsWith(".warc.gz")) ==
      files.count(_.getName.endsWith(".idx")), "sidecar per data file")
    assert(readWarc(s"$dir/out").count() == 3)
    // a third-party 0-byte gz with an EMPTY sidecar is valid: zero rows
    Files.write(Paths.get(s"$dir/out/extra.warc.gz"), Array.emptyByteArray)
    Files.write(Paths.get(s"$dir/out/.extra.warc.gz.idx"), Array.emptyByteArray)
    assert(readWarc(s"$dir/out").count() == 3)
  }

  test("gz member index: truncated tail drops only the partial member under split reads") {
    val (dir, gzFile) = writeGzCorpus(12)
    // cut the LAST member in half; keep the (now over-long) sidecar
    val bytes = Files.readAllBytes(Paths.get(gzFile))
    val idxFile = new java.io.File(new java.io.File(gzFile).getParent,
      s".${new java.io.File(gzFile).getName}.idx")
    val lastOff = scala.io.Source.fromFile(idxFile).getLines()
      .map(_.split("\t")(0).toLong).toSeq.last
    val cutLen = lastOff + (bytes.length - lastOff) / 2
    Files.write(Paths.get(gzFile), bytes.take(cutLen.toInt))
    // the rewrite above bypassed Hadoop's local FS, whose .crc sidecar
    // is now stale — remove it (the truncation is the point of the test)
    val crc = new java.io.File(new java.io.File(gzFile).getParent,
      s".${new java.io.File(gzFile).getName}.crc")
    if (crc.exists()) assert(crc.delete())
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "2048")
      val ids = readWarc(s"$dir/out").select("record_id").collect()
        .map(_.getString(0)).sorted.toVector
      assert(ids == (0 until 11).map(i => s"<urn:uuid:rec-$i>").sorted.toVector,
        s"split read over the truncated file kept ${ids.length} of 11")
    } finally spark.conf.set(key, old)
  }

  // ------------------------------------------------- mandatory WARC fields

  test("writer synthesizes mandatory WARC-Record-ID and WARC-Date when null (ISO 28500)") {
    val dir = Files.createTempDirectory("warc_mand").toString
    import spark.implicits._
    val rows = (0 until 4).map { i =>
      (Option.empty[String], "response", s"http://h.example/$i",
        Option.empty[String], "application/http; msgtype=response", http(s"b $i"))
    }.toDF("record_id", "warc_type", "target_uri", "warc_date",
      "content_type", "payload")
    WarcWriter.write(rows.coalesce(1), s"$dir/out")
    val back = readWarc(s"$dir/out").select("record_id", "warc_date").collect()
    assert(back.length == 4)
    val uuidRe = "<urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}>".r
    back.foreach { r =>
      assert(uuidRe.matches(r.getString(0)), s"bad synthesized id: ${r.getString(0)}")
      // WARC-Date grammar; must also parse as a real instant
      java.time.Instant.parse(r.getString(1)): Unit
    }
    assert(back.map(_.getString(0)).distinct.length == 4,
      "distinct records must get distinct synthesized ids")
  }

  test("synthesized record ids are deterministic given explicit dates") {
    val a = WarcWriter.encodeRecord("response", null, "http://u.example/",
      "2026-01-01T00:00:00Z", null, "payload-bytes".getBytes(StandardCharsets.UTF_8))
    val b = WarcWriter.encodeRecord("response", null, "http://u.example/",
      "2026-01-01T00:00:00Z", null, "payload-bytes".getBytes(StandardCharsets.UTF_8))
    assert(a.sameElements(b), "re-encoding the same record must be byte-identical")
    val text = new String(a, StandardCharsets.UTF_8)
    assert(text.contains("WARC-Record-ID: <urn:uuid:"))
    assert(text.contains("WARC-Date: 2026-01-01T00:00:00Z"))
  }

  // --------------------------------------------------------------- pushdown

  test("pushed filters skip IO but stay residual-correct") {
    val dir = Files.createTempDirectory("warc_push").toString
    val recs = (0 until 12).map { i =>
      WarcWriter.encodeRecord(
        warcType = if (i % 3 == 0) "response" else "request",
        recordId = s"<urn:uuid:rec-$i>",
        targetUri = s"http://site${i % 2}.example.org/p/$i",
        warcDate = "2026-01-01T00:00:00Z",
        contentType = if (i % 3 == 0) "application/http; msgtype=response" else null,
        payload = http(s"doc $i"))
    }
    val path = writeFile(dir, "f.warc", recs.reduce(_ ++ _))
    val all = readWarc(path).collect()
    assert(all.length == 12)

    val filtered = readWarc(path)
      .filter(col("warc_type") === "response" &&
        col("target_uri").startsWith("http://site0."))
    assert(scanDescription(filtered).contains("recfilter="),
      s"filter did not reach the scan: ${scanDescription(filtered)}")
    val got = filtered.select("record_id").collect().map(_.getString(0)).sorted
    val want = all.filter(r => r.getAs[String]("warc_type") == "response" &&
        r.getAs[String]("target_uri").startsWith("http://site0."))
      .map(_.getAs[String]("record_id")).sorted
    assert(got.toSeq == want.toSeq && want.nonEmpty)

    // a predicate the source can NOT evaluate pre-block stays correct
    val residual = readWarc(path).filter(col("http_status") === 200).count()
    assert(residual == all.count(_.getAs[String]("warc_type") == "response"))
  }
}
