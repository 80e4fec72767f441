package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}

/** WARC writer (ISO 28500): one record per input row, with the same
  * rename-on-commit part-file semantics as the MARC/WebDataset sinks
  * (task-attempt-unique temp, first rename wins — speculative retries
  * never interleave).
  *
  * Expected columns: `warc_type` (required), `payload` (binary,
  * required — pass the FULL content block: for `application/http`
  * records that means the HTTP envelope + body), optional `record_id`,
  * `target_uri`, `warc_date`, `content_type`. Null/missing `target_uri`
  * and `content_type` are omitted; null `record_id` / `warc_date` are
  * SYNTHESIZED (mandatory per ISO 28500 — see [[encodeRecord]]).
  *
  * `gzip = true` writes ONE GZIP MEMBER PER RECORD — the appendable
  * convention crawls publish (`warc.paths`-style layouts), and the
  * framing [[graft.sources.GzipMembersInputStream]] decodes member-by-
  * member on the way back in. Member-per-record implies each record is
  * buffered once while its member is deflated; WARC records are
  * crawler-response-sized, so this is bounded task memory, not a
  * corpus-sized buffer.
  *
  * Scale shape: pure per-partition streaming writes — no shuffle, no
  * driver data path; parallelism is the input's partitioning (callers
  * repartition to choose shard count, exactly like the MARC sink). */
object WarcWriter {

  private val CRLF = "\r\n".getBytes(StandardCharsets.UTF_8)

  /** Serialized header block + payload + record separator.
    *
    * WARC-Record-ID and WARC-Date are MANDATORY for every record per
    * ISO 28500 — an archive omitting them may be rejected by conformant
    * external readers (warcio validation), not just re-read by our own
    * lenient one. A null `recordId` therefore synthesizes a
    * `<urn:uuid:...>` derived DETERMINISTICALLY (UUIDv3 name-based) from
    * the record's own bytes, so re-running a job writes byte-identical
    * archives; byte-identical records share an id, which is harmless
    * (they ARE the same record). A null `warcDate` takes `fallbackDate`
    * (the job-level timestamp `write` stamps once per job) or, for
    * direct callers, the current instant. */
  private[graft] def encodeRecord(
      warcType: String, recordId: String, targetUri: String,
      warcDate: String, contentType: String,
      payload: Array[Byte], fallbackDate: String = null): Array[Byte] = {
    require(warcType != null && warcType.nonEmpty, "warc_type is required")
    val body = if (payload == null) Array.emptyByteArray else payload
    val date =
      if (warcDate != null) warcDate
      else if (fallbackDate != null) fallbackDate
      else nowIso()
    val id =
      if (recordId != null) recordId
      else {
        val seed = new java.io.ByteArrayOutputStream(body.length + 128)
        seed.write(warcType.getBytes(StandardCharsets.UTF_8))
        if (targetUri != null) seed.write(targetUri.getBytes(StandardCharsets.UTF_8))
        seed.write(date.getBytes(StandardCharsets.UTF_8))
        seed.write(body)
        s"<urn:uuid:${java.util.UUID.nameUUIDFromBytes(seed.toByteArray)}>"
      }
    val sb = new java.lang.StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(id).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    if (targetUri != null) sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    if (contentType != null) sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    System.arraycopy(CRLF, 0, out, head.length + body.length, 2)
    System.arraycopy(CRLF, 0, out, head.length + body.length + 2, 2)
    out
  }

  /** `YYYY-MM-DDThh:mm:ssZ` — the WARC-Date grammar (ISO 28500 §5.4). */
  private def nowIso(): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS))

  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(buf)
    gz.write(record)
    gz.close()
    buf.toByteArray
  }

  /** Writes `df` as `<prefix>part-NNNNN.warc[.gz]` files under `outDir`.
    * Default is overwrite semantics (`clear = true` empties the dir
    * first); `clear = false` appends alongside existing files — the
    * fetch executor's batch mode, where each batch owns a distinct
    * `prefix` and clears only its own files before a rewrite. EMPTY
    * partitions write NO file (a politeness repartition routinely leaves
    * most shuffle partitions empty — 0-byte archives and 0-member
    * sidecars would be pure noise). */
  def write(df: DataFrame, outDir: String, gzip: Boolean = false,
            prefix: String = "", clear: Boolean = true): Unit = {
    val schema = df.schema
    def ord(name: String): Int = schema.fieldNames.indexOf(name)
    val typeOrd = ord("warc_type")
    val payloadOrd = ord("payload")
    require(typeOrd >= 0 && payloadOrd >= 0,
      s"WarcWriter needs warc_type and payload columns; got ${schema.fieldNames.mkString(", ")}")
    val idOrd = ord("record_id"); val uriOrd = ord("target_uri")
    val dateOrd = ord("warc_date"); val ctOrd = ord("content_type")
    def str(r: Row, i: Int): String =
      if (i < 0 || r.isNullAt(i)) null else r.getString(i)

    val ext = if (gzip) "warc.gz" else "warc"
    // one job-level stamp so a job's synthesized WARC-Dates agree across
    // tasks/retries (per-row now() would make speculative retries diverge)
    val jobDate = nowIso()
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new Path(outDir)
    val dfs = dirPath.getFileSystem(hconf.value)
    if (clear && dfs.exists(dirPath)) dfs.delete(dirPath, true): Unit
    dfs.mkdirs(dirPath): Unit
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (!rows.hasNext) Iterator.empty[Unit]
      else {
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val fin = new Path(f"$outDir/${prefix}part-$idx%05d.$ext")
      val tmp = new Path(f"$outDir/.${prefix}part-$idx%05d-attempt-$attempt.$ext.tmp")
      val fs = tmp.getFileSystem(hconf.value)
      // gz mode also writes the member-offset sidecar (one line per
      // member: compressedStart \t uncompressedStart) so readers can
      // SPLIT the file — member-granular parallelism instead of
      // file-granular (graft.sources.WarcGzIndex). Both temp names share
      // the `.<prefix>` shape so batch crash-window cleanup sweeps them.
      val idxFin = graft.sources.WarcGzIndex.sidecarPath(fin)
      val idxTmp = new Path(f"$outDir/.${prefix}part-$idx%05d-attempt-$attempt.$ext.idx.tmp")
      val idxLines = if (gzip) new java.lang.StringBuilder(4096) else null
      var cpos = 0L
      var upos = 0L
      val out = fs.create(tmp, true)
      try {
        rows.foreach { r =>
          val rec = encodeRecord(str(r, typeOrd), str(r, idOrd),
            str(r, uriOrd), str(r, dateOrd), str(r, ctOrd),
            if (r.isNullAt(payloadOrd)) null
            else r.getAs[Array[Byte]](payloadOrd), fallbackDate = jobDate)
          if (gzip) {
            val member = gzipMember(rec)
            idxLines.append(cpos).append('\t').append(upos).append('\n'): Unit
            out.write(member)
            cpos += member.length
            upos += rec.length
          } else out.write(rec)
        }
        out.close()
        if (gzip) {
          val io = fs.create(idxTmp, true)
          try io.write(idxLines.toString.getBytes(StandardCharsets.UTF_8))
          finally io.close()
        }
      } catch {
        case e: Throwable =>
          out.close(); fs.delete(tmp, false)
          if (gzip) fs.delete(idxTmp, false)
          throw e
      }
      // data first, sidecar second: a crash between the two degrades to
      // the sidecar-less (file-granular) read, never to a stale index.
      // First rename wins; the loser (speculative retry) discards both.
      if (fs.rename(tmp, fin)) {
        if (gzip && !fs.rename(idxTmp, idxFin)) fs.delete(idxTmp, false): Unit
      } else {
        fs.delete(tmp, false): Unit
        if (gzip) fs.delete(idxTmp, false): Unit
      }
      Iterator.empty[Unit]
      }
    }.count(): Unit
  }
}
