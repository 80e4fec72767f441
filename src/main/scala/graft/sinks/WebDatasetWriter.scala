package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** WebDataset-style sharded tar export — the loader format multimodal
  * training stacks stream (each shard a plain POSIX tar; each sample a
  * run of adjacent entries sharing a basename: `<key>.json`,
  * `<key>.txt`, `<key>.bin`, ...). Trainers read shards sequentially
  * with zero random IO, which is the entire point at 100 TB: one open
  * file handle per worker, no per-sample object-store requests.
  *
  * Scale/layout discipline (the [[CorpusWriter]] rules, adapted):
  *  - shard assignment is a PURE FUNCTION of the sample key
  *    (pmod(xxhash64(key), numShards)) — reproducible across runs and
  *    cluster sizes, never dependent on input partitioning;
  *  - one shuffle total (repartition on the shard id), samples sorted
  *    by (shard, key) within each task so every shard's byte stream is
  *    deterministic;
  *  - shards are streamed straight to the filesystem (Hadoop
  *    FileSystem API — file:/, hdfs:/, s3a:/ alike), one tar per shard
  *    id, written to a temp name and RENAMED on success so a failed or
  *    re-attempted task never leaves a half shard under the final name.
  *
  * The tar layer is hand-rolled (~40 lines: ustar header + 512-byte
  * padding) because the JVM stdlib has none and this repo takes no
  * dependencies; headers are plain POSIX ustar, readable by GNU/BSD
  * tar and Python tarfile. Entries are capped at 8 GiB − 1 (the octal
  * size-field limit; a single training sample near that size is a
  * pipeline bug, not a format need).
  */
object WebDatasetWriter {

  /** Write `df` as `numShards` tar shards at `path/shard-NNNNNN.tar`.
    *
    * `entries` maps extension → column; every column is cast to binary
    * (strings become their UTF-8 bytes). Null entry values are SKIPPED
    * for that sample (WebDataset treats missing extensions as absent
    * fields); null keys are rejected. Keys must fit a tar name
    * (≤ 90 chars before the extension) and be unique — duplicate keys
    * make downstream sample grouping ambiguous. */
  def writeShards(df: DataFrame, path: String, keyCol: String,
                  entries: Seq[(String, Column)], numShards: Int): Unit = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    require(entries.nonEmpty, "entries must be non-empty")
    val exts = entries.map(_._1)
    require(exts.distinct.size == exts.size, s"duplicate extensions: $exts")
    // OVERWRITE semantics, matching the sibling writers' mode("overwrite"):
    // stale shards from a previous run with a HIGHER shard count would
    // otherwise survive (each task renames only its own shard ids) and
    // pollute any read of the directory
    locally {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir))
        fs.listStatus(dir).foreach { st =>
          val n = st.getPath.getName
          if (st.isFile && (n.matches("shard-\\d{6}\\.tar") ||
              n.matches("\\.shard-\\d{6}\\.tar\\.(\\d+|backfill)\\.tmp")))
            fs.delete(st.getPath, false)
        }
    }
    val prepped = df.select(
      col(keyCol).cast("string").as("_key") +:
        entries.map { case (ext, c) => c.cast("binary").as(s"_e_$ext") }: _*)
      .withColumn("_shard", pmod(xxhash64(col("_key")), lit(numShards.toLong)))
      .repartition(numShards, col("_shard"))
      .sortWithinPartitions(col("_shard"), col("_key"))
    // session Hadoop conf (spark.hadoop.* — s3a credentials, endpoints)
    // must travel to the executor-side FileSystem handles
    val serConf = new graft.sources.SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    prepped.foreachPartition { (rows: Iterator[Row]) =>
      // executor-side FS handles; hash-partitioning can co-locate several
      // shard ids in one task (and leave some tasks empty) — rows arrive
      // sorted by shard, so shards are contiguous runs and each run
      // streams into its own tar
      val fsConf = serConf.value
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var current: Long = -1L
      var out: java.io.OutputStream = null
      var tmp: org.apache.hadoop.fs.Path = null
      var fin: org.apache.hadoop.fs.Path = null
      def close(): Unit = if (out != null) {
        out.write(new Array[Byte](1024)) // two zero blocks = end of archive
        out.close()
        val fs = tmp.getFileSystem(fsConf)
        if (fs.exists(fin)) fs.delete(fin, false) // re-attempt: last wins
        require(fs.rename(tmp, fin), s"rename $tmp -> $fin failed")
        out = null
      }
      for (row <- rows) {
        val shard = row.getLong(row.fieldIndex("_shard"))
        val key = row.getString(row.fieldIndex("_key"))
        require(key != null, "WebDataset sample key must not be null")
        require(key.length <= 90, s"key too long for a tar name: $key")
        if (shard != current) {
          close()
          current = shard
          fin = new org.apache.hadoop.fs.Path(path, f"shard-$shard%06d.tar")
          tmp = new org.apache.hadoop.fs.Path(path,
            f".shard-$shard%06d.tar.$attempt%d.tmp")
          val fs = tmp.getFileSystem(fsConf)
          out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
        }
        for (ext <- exts) {
          val i = row.fieldIndex(s"_e_$ext")
          if (!row.isNullAt(i))
            writeEntry(out, s"$key.$ext", row.getAs[Array[Byte]](i))
        }
      }
      close()
    }
    // Backfill EMPTY shards: tasks only write shards they receive rows
    // for, so a shard id with no samples would leave no file. The
    // hashedShards reader infers the hash modulus from the tar file
    // count — with k < numShards files whose numbers happen to be
    // contiguous 0..k-1 (likely on small corpora), keyed lookups would
    // compute pmod against the wrong modulus and silently miss rows.
    // An empty tar (two zero blocks) per missing id keeps the layout
    // self-describing: file count == true modulus, always.
    locally {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      // an all-rows-filtered frame writes no shard at all — the dir may
      // not even exist yet; the contract is still numShards valid tars
      if (!fs.exists(dir)) fs.mkdirs(dir)
      val present = fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
        case n if n.matches("shard-\\d{6}\\.tar") =>
          n.stripPrefix("shard-").stripSuffix(".tar").toInt
      }.toSet
      (0 until numShards).filterNot(present).foreach { s =>
        // same tmp-then-rename discipline as the row-writing tasks: an
        // interrupted backfill must never leave a truncated file under
        // the FINAL name (it would pass the contiguous-layout check and
        // then fail every tar reader)
        val fin = new org.apache.hadoop.fs.Path(path, f"shard-$s%06d.tar")
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".shard-$s%06d.tar.backfill.tmp")
        val out = fs.create(tmp, true)
        out.write(new Array[Byte](1024))
        out.close()
        if (fs.exists(fin)) fs.delete(fin, false)
        require(fs.rename(tmp, fin), s"rename $tmp -> $fin failed")
      }
    }
  }

  /** One POSIX ustar entry: 512-byte header, data, zero-pad to 512. */
  private[sinks] def writeEntry(out: java.io.OutputStream, name: String,
                                data: Array[Byte]): Unit = {
    require(data.length < (1L << 33),
      s"tar entry ${name} exceeds the 8 GiB octal size field")
    val h = new Array[Byte](512)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      require(b.length < len, s"tar field overflow: $s")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(v: Long, off: Int, len: Int): Unit =
      put(("%0" + (len - 1) + "o").format(v), off, len)
    put(name, 0, 100)
    putOctal(420, 100, 8)          // mode 0644
    putOctal(0, 108, 8)            // uid
    putOctal(0, 116, 8)            // gid
    putOctal(data.length.toLong, 124, 12)
    putOctal(0L, 136, 12)          // mtime 0: deterministic shard bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum placeholder
    h(156) = '0'                   // typeflag: regular file
    put("ustar", 257, 6)           // magic (NUL-terminated by the zero fill)
    put("00", 263, 3)              // version
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(("%06o").format(sum) + "\u0000 ", 148, 9)
    out.write(h)
    out.write(data)
    val pad = (512 - (data.length % 512)) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }
}
