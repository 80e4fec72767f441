package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WebDatasetWriterSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal independent ustar reader: (name, bytes) in archive order.
    * Validates magic and recomputes the header checksum — a writer bug
    * in either would fail here, not just round-trip. */
  private def readTar(path: java.nio.file.Path): Seq[(String, Array[Byte])] = {
    val all = Files.readAllBytes(path)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    def str(o: Int, l: Int): String = {
      val end = (o until o + l).find(all(_) == 0).getOrElse(o + l)
      new String(all, o, end - o, StandardCharsets.UTF_8)
    }
    while (off + 512 <= all.length && all(off) != 0) {
      val name = str(off, 100)
      val size = java.lang.Long.parseLong(str(off + 124, 12).trim, 8).toInt
      assert(str(off + 257, 6) == "ustar", s"bad magic at $off")
      val stored = java.lang.Long.parseLong(str(off + 148, 8).trim, 8)
      var sum = 0L
      for (i <- 0 until 512)
        sum += (if (i >= 148 && i < 156) ' '.toLong else all(off + i) & 0xff)
      assert(sum == stored, s"checksum mismatch for $name")
      out += name -> java.util.Arrays.copyOfRange(all, off + 512, off + 512 + size)
      off += 512 + ((size + 511) / 512) * 512
    }
    out.result()
  }

  private def samples = (1L to 25L).map { i =>
    (i, s"""{"id":$i}""", Array.tabulate[Byte]((i % 7 + 1).toInt)(b => (i + b).toByte))
  }.toDF("doc_id", "meta", "payload")

  test("tar shards round-trip: valid ustar, adjacent per-sample entries, all keys once") {
    val dir = Files.createTempDirectory("graft-wds").toString
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta"), "bin" -> col("payload")), numShards = 4)
    val shards = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted
    assert(shards.nonEmpty && shards.forall(_.contains("shard-00000")))
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(_.contains(".tmp")) == 0, "temp files left behind")
    val entries = shards.flatMap(s => readTar(Paths.get(s)))
    // every sample contributes exactly (key.json, key.bin), adjacent
    assert(entries.length == 50)
    entries.grouped(2).foreach { case Array((j, _), (b, _)) =>
      assert(j.endsWith(".json") && b.endsWith(".bin"))
      assert(j.stripSuffix(".json") == b.stripSuffix(".bin"))
    }
    val byName = entries.toMap
    for ((id, meta, payload) <- samples.collect()
           .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))) {
      assert(new String(byName(s"$id.json"), StandardCharsets.UTF_8) == meta)
      assert(java.util.Arrays.equals(byName(s"$id.bin"), payload))
    }
  }

  test("shard assignment and bytes are deterministic across runs") {
    val d1 = Files.createTempDirectory("graft-wds1").toString
    val d2 = Files.createTempDirectory("graft-wds2").toString
    for (d <- Seq(d1, d2))
      WebDatasetWriter.writeShards(samples.repartition(7), d, "doc_id",
        Seq("json" -> col("meta"), "bin" -> col("payload")), numShards = 3)
    for (i <- 0 until 3) {
      val (a, b) = (Paths.get(d1, f"shard-$i%06d.tar"), Paths.get(d2, f"shard-$i%06d.tar"))
      assert(Files.exists(a) == Files.exists(b))
      if (Files.exists(a))
        assert(java.util.Arrays.equals(Files.readAllBytes(a), Files.readAllBytes(b)),
          s"shard $i bytes differ between identical runs")
    }
  }

  test("null entry values are skipped; system tar can list the shard") {
    val dir = Files.createTempDirectory("graft-wds3").toString
    val df = Seq((1L, "has meta", "payload"), (2L, null, "only bin"))
      .toDF("doc_id", "meta", "payload")
    WebDatasetWriter.writeShards(df, dir, "doc_id",
      Seq("json" -> col("meta"), "bin" -> col("payload")), numShards = 1)
    val names = readTar(Paths.get(dir, "shard-000000.tar")).map(_._1)
    assert(names.toSet == Set("1.json", "1.bin", "2.bin"))
    // cross-check with the system tar if present (GNU tar reads ustar)
    if (Files.exists(Paths.get("/bin/tar")) || Files.exists(Paths.get("/usr/bin/tar"))) {
      import scala.sys.process._
      val listed = Seq("tar", "-tf", s"$dir/shard-000000.tar").!!.trim
        .split("\n").toSet
      assert(listed == Set("1.json", "1.bin", "2.bin"),
        s"system tar disagrees: $listed")
    }
  }
  test("webdataset source round-trips the writer's shards through Spark") {
    val dir = Files.createTempDirectory("graft-wds-rt").toString
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta"), "bin" -> col("payload")), numShards = 3)
    val back = spark.read.format("webdataset").option("path", dir).load()
    assert(back.schema.fieldNames.toSeq == Seq("key", "entries"))
    val rows = back.collect().map { r =>
      r.getString(0) -> r.getMap[String, Array[Byte]](1)
    }.toMap
    assert(rows.size == 25)
    for ((id, meta, payload) <- samples.collect()
           .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))) {
      val m = rows(id.toString)
      assert(new String(m("json"), java.nio.charset.StandardCharsets.UTF_8) == meta)
      assert(java.util.Arrays.equals(m("bin"), payload))
    }
    // parallelism = one task per shard file
    assert(back.rdd.getNumPartitions == 3)
    // key-only projection plans the headers-only scan (data bytes seeked
    // past, the leader-only analog) and still counts every sample
    val keyOnly = back.select("key")
    assert(keyOnly.queryExecution.executedPlan.toString.contains("headers-only"),
      keyOnly.queryExecution.executedPlan.toString)
    assert(keyOnly.count() == 25)
  }
  test("re-writing with fewer shards removes stale shard files (overwrite semantics)") {
    val dir = Files.createTempDirectory("graft-wds-ow").toString
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta")), numShards = 8)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar")) == 8)
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta")), numShards = 2)
    // stale shard-000002..07 from the first run must be gone — a reader
    // over the directory would otherwise double-count samples
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar")) == 2)
    assert(spark.read.format("webdataset").option("path", dir).load()
      .count() == samples.count())
  }

  test("key filters push into the tar reader: plan-pinned, IO-skipped, result-identical") {
    val dir = Files.createTempDirectory("graft-wds-filt").toString
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta"), "bin" -> col("payload")), numShards = 3)
    val back = spark.read.format("webdataset").option("path", dir).load()
    // equality lookup: pushed filter visible in the plan, exact result
    val one = back.filter(col("key") === "7")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("keyfilter="), plan)
    val got = one.collect()
    assert(got.length == 1 && got(0).getString(0) == "7")
    assert(got(0).getMap[String, Array[Byte]](1).contains("bin"))
    // IN and prefix filters
    assert(back.filter(col("key").isin("3", "15", "nope"))
      .select("key").collect().map(_.getString(0)).toSet == Set("3", "15"))
    assert(back.filter(col("key").startsWith("1"))
      .count() == samples.collect()
        .count(r => r.getLong(0).toString.startsWith("1")))
    // a non-key / unsupported filter is untouched (residual-only)
    assert(back.filter(length(col("key")) === 1).count() ==
      samples.collect().count(_.getLong(0).toString.length == 1))
  }

  test("hashedShards prunes a key lookup to one shard; declines on foreign layouts") {
    val dir = Files.createTempDirectory("graft-wds-prune").toString
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta")), numShards = 8)
    def read(hashed: Boolean) = spark.read.format("webdataset")
      .option("path", dir).option("hashedShards", hashed.toString).load()
    // pruned lookup: exactly ONE shard planned, identical result
    val pruned = read(hashed = true).filter(col("key") === "11")
    assert(pruned.rdd.getNumPartitions == 1,
      s"expected 1 planned shard, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.collect().map(_.getString(0)).toSeq == Seq("11"))
    // IN over several keys plans <= |keys| shards
    val in3 = read(hashed = true).filter(col("key").isin("1", "2", "3"))
    assert(in3.rdd.getNumPartitions <= 3)
    assert(in3.select("key").collect().map(_.getString(0)).toSet ==
      Set("1", "2", "3"))
    // without the opt-in: all shards planned, same answer
    assert(read(hashed = false).filter(col("key") === "11")
      .rdd.getNumPartitions == 8)
    // explicit-file SUBSET of the layout: contiguous shard-000000..2
    // would infer the WRONG modulus — pruning must decline (results are
    // whatever those files hold, but never hash-pruned away)
    val subset = spark.read.format("webdataset")
      .option("hashedShards", "true")
      .load((0 to 2).map(i => f"$dir/shard-$i%06d.tar"): _*)
    val subsetKeys = subset.select("key").collect().map(_.getString(0)).toSet
    for (k <- subsetKeys)
      assert(subset.filter(col("key") === k).count() == 1,
        s"subset read must not prune away key $k")
    // foreign layout (a renamed shard breaks contiguous numbering):
    // pruning declines, results stay complete
    val f = new java.io.File(dir, "shard-000003.tar")
    assert(f.renameTo(new java.io.File(dir, "part-000003.tar")))
    val foreign = read(hashed = true)
    assert(foreign.rdd.getNumPartitions == 8, "pruning must decline")
    assert(foreign.count() == samples.count())
  }

  test("empty shards are backfilled: file count == modulus, keyed lookups stay correct") {
    // 25 samples over 64 shards leave many shard ids with no rows; the
    // writer must still emit a (valid, empty) tar per id so the
    // hashedShards reader's inferred modulus equals the true one —
    // without backfill, nonempty shards numbered 0..k-1 would pass the
    // contiguity check with k != 64 and keyed lookups would hash into
    // the wrong shard, silently returning no rows
    val dir = Files.createTempDirectory("graft-wds-empty").toString
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta")), numShards = 64)
    val tars = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted
    assert(tars.length == 64, s"expected 64 shard files, got ${tars.length}")
    // backfilled empties are valid end-of-archive-only tars
    assert(tars.exists(t => Files.size(Paths.get(t)) == 1024))
    tars.filter(t => Files.size(Paths.get(t)) == 1024)
      .foreach(t => assert(readTar(Paths.get(t)).isEmpty))
    val read = spark.read.format("webdataset")
      .option("path", dir).option("hashedShards", "true").load()
    for (k <- samples.collect().map(_.getLong(0).toString)) {
      val got = read.filter(col("key") === k)
      assert(got.rdd.getNumPartitions == 1, s"lookup of $k not pruned")
      assert(got.count() == 1, s"pruned lookup lost key $k")
    }
  }

  test("writeShards on an all-filtered (empty) frame still writes numShards valid empty tars") {
    val dir = Files.createTempDirectory("graft-wds-allempty").toString + "/out"
    WebDatasetWriter.writeShards(samples.filter(col("doc_id") < 0L), dir,
      "doc_id", Seq("json" -> col("meta")), numShards = 5)
    val tars = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted
    assert(tars.length == 5, s"expected 5 empty shards, got ${tars.length}")
    tars.foreach { t =>
      assert(Files.size(Paths.get(t)) == 1024)
      assert(readTar(Paths.get(t)).isEmpty)
    }
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(_.contains(".tmp")) == 0, "backfill tmp files left behind")
    val back = spark.read.format("webdataset").option("path", dir).load()
    assert(back.count() == 0)
  }

  test("explicit numShards option declines pruning when the file count disagrees") {
    val dir = Files.createTempDirectory("graft-wds-modulus").toString
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta")), numShards = 64)
    def read(opts: (String, String)*) = {
      val base = spark.read.format("webdataset")
        .option("path", dir).option("hashedShards", "true")
      opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    // option agrees with the layout: pruning stays on
    assert(read("numShards" -> "64").filter(col("key") === "7")
      .rdd.getNumPartitions == 1)
    // simulate a pre-backfill layout: strip trailing empty shards so the
    // remaining files are contiguous 0..k-1 with k < 64 — the dangerous
    // shape the advisory describes
    val names = (0 until 64).map(i => Paths.get(dir, f"shard-$i%06d.tar"))
    var last = 63
    while (last >= 0 && Files.size(names(last)) == 1024) {
      Files.delete(names(last)); last -= 1
    }
    assert(last < 63, "test setup: expected at least one trailing empty shard")
    val k = last + 1
    // the explicit option disagrees with the k-file count: pruning must
    // decline and every key must still be found
    val guarded = read("numShards" -> "64")
    assert(guarded.filter(col("key") === "7").rdd.getNumPartitions == k,
      "pruning must decline on modulus disagreement")
    for (key <- samples.collect().map(_.getLong(0).toString))
      assert(guarded.filter(col("key") === key).count() == 1,
        s"guarded read lost key $key")
  }

  test("targetPartitionBytes packs tiny shards into few tasks; pushdown and pruning survive") {
    val dir = Files.createTempDirectory("graft-wds-pack").toString
    // 16 tiny shards (25 samples spread thin) — the ragged-layout shape
    WebDatasetWriter.writeShards(samples, dir, "doc_id",
      Seq("json" -> col("meta"), "bin" -> col("payload")), numShards = 16)
    def read(opts: (String, String)*) = {
      val base = spark.read.format("webdataset").option("path", dir)
      opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    val plain = read()
    assert(plain.rdd.getNumPartitions == 16)
    // packing: large target => few partitions, identical rows
    val packed = read("targetPartitionBytes" -> (1L << 20).toString)
    assert(packed.rdd.getNumPartitions < 4,
      s"sub-MB shards must pack, got ${packed.rdd.getNumPartitions} partitions")
    val want = plain.select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(packed.select("key").collect().map(_.getString(0)).sorted.toSeq
      == want)
    // full-entry reads round-trip identically through the chained reader
    val fullPlain = plain.collect().map(r => r.getString(0) ->
      r.getMap[String, Array[Byte]](1).view.mapValues(_.toSeq).toMap).toMap
    val fullPacked = packed.collect().map(r => r.getString(0) ->
      r.getMap[String, Array[Byte]](1).view.mapValues(_.toSeq).toMap).toMap
    assert(fullPacked == fullPlain)
    // key-filter pushdown still applies per packed file (plan pin) and
    // returns the exact row
    val one = packed.filter(col("key") === "7")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("keyfilter=") && plan.contains("packBytes="), plan)
    assert(one.collect().map(_.getString(0)).toSeq == Seq("7"))
    // hashedShards pruning composes: prune to one shard FIRST, then pack
    val prunedPacked = read("hashedShards" -> "true",
      "targetPartitionBytes" -> (1L << 20).toString)
      .filter(col("key") === "11")
    assert(prunedPacked.rdd.getNumPartitions == 1)
    assert(prunedPacked.collect().map(_.getString(0)).toSeq == Seq("11"))
    // a mid-target (two shards' worth) splits into several packed tasks
    val shardBytes = Files.list(Paths.get(dir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".tar")).map(Files.size).sum
    val mid = read("targetPartitionBytes" -> (shardBytes / 4).toString)
    assert(mid.rdd.getNumPartitions >= 4 && mid.rdd.getNumPartitions < 16,
      s"got ${mid.rdd.getNumPartitions}")
    assert(mid.select("key").collect().map(_.getString(0)).sorted.toSeq == want)
  }

  test("reader tolerates foreign archives: GNU long names, directories") {
    if (Files.exists(Paths.get("/bin/tar")) || Files.exists(Paths.get("/usr/bin/tar"))) {
      import scala.sys.process._
      val work = Files.createTempDirectory("graft-wds-foreign")
      val sub = Files.createDirectory(work.resolve("d"))
      val longBase = "x" * 120 // > 100 chars forces a GNU 'L' entry
      Files.write(sub.resolve(s"$longBase.txt"), "long payload".getBytes)
      Files.write(sub.resolve("short.txt"), "short payload".getBytes)
      val shardDir = Files.createTempDirectory("graft-wds-foreign-shard")
      // archive contains a DIRECTORY entry plus a long-named member
      assert(Seq("tar", "-cf", s"$shardDir/shard-000000.tar", "-C",
        work.toString, "d").! == 0)
      val back = spark.read.format("webdataset")
        .option("path", shardDir.toString).load()
        .collect().map(r => r.getString(0) -> r.getMap[String, Array[Byte]](1)).toMap
      assert(back.keySet == Set(s"d/$longBase", "d/short"))
      assert(new String(back(s"d/$longBase")("txt")) == "long payload")
      assert(new String(back("d/short")("txt")) == "short payload")
    }
  }
}
