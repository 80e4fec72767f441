package graft.sources

import graft.SparkSpec
import graft.marc.Fixtures
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Column pruning on the marc DSv2. Spark's V2 pushdown prunes TOP-LEVEL
  * columns only (verified: a `fields.tag` projection still scans the full
  * `fields` column), so the source implements its own two reductions:
  * a leader-only decode when `fields` is not required, and an opt-in
  * `tags` scan option that decodes only matching directory entries.
  * Record acceptance is identical in every mode — row counts are
  * invariant under pruning. */
class MarcPruningSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("marcprune").toString
    val out = Files.newOutputStream(Paths.get(d, "data.mrc"))
    Fixtures.records("test_data.utf8").foreach(r => out.write(Iso2709.encode(r)))
    out.close()
    d
  }

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b.scan.description() }
      .getOrElse(sys.error("no BatchScan leaf in plan"))

  test("nested projections equal full-read projections (values survive pruning)") {
    val full = spark.read.format("marc").load(s"$dir/data.mrc").cache()
    try {
      val wantTags = full.collect().map(_.getSeq[org.apache.spark.sql.Row](1)
        .map(_.getString(0)).mkString("|")).sorted.toVector
      val gotTags = spark.read.format("marc").load(s"$dir/data.mrc")
        .select(col("fields.tag")).collect()
        .map(_.getSeq[String](0).mkString("|")).sorted.toVector
      assert(gotTags == wantTags,
        "pruned fields.tag diverges from the full read")
    } finally full.unpersist()
  }

  test("leader-only scans: same rows, leader-only decode mode in the plan") {
    val full = spark.read.format("marc").load(s"$dir/data.mrc")
    val wantLeaders = full.select("leader").collect().map(_.getString(0)).sorted
    assert(wantLeaders.nonEmpty)
    val pruned = spark.read.format("marc").load(s"$dir/data.mrc").select("leader")
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == wantLeaders.toSeq)
    assert(scanDescription(pruned).contains("decode=leader-only"),
      s"expected leader-only decode: ${scanDescription(pruned)}")
    assert(scanDescription(full).contains("decode=full"))
    // counts too (acceptance parity): leader-only must see every record
    assert(pruned.count() == full.count())
    // metadata columns compose with the leader-only path
    val withMeta = spark.read.format("marc").load(s"$dir/data.mrc")
      .select(col("leader"), col("_record_offset"), col("_input_file"))
    assert(scanDescription(withMeta).contains("decode=leader-only"))
    val rows = withMeta.collect()
    assert(rows.length == wantLeaders.length)
    assert(rows.forall(_.getString(2).endsWith("data.mrc")))
  }

  test("tags option decodes only matching fields, same record count") {
    val full = spark.read.format("marc").load(s"$dir/data.mrc").cache()
    try {
      val restricted = spark.read.format("marc").option("tags", "001,245")
        .load(s"$dir/data.mrc")
      assert(scanDescription(restricted).contains("decode=tags[001,245]"))
      assert(restricted.count() == full.count(), "tags must not drop records")
      val tagSets = restricted.collect().map(_.getSeq[org.apache.spark.sql.Row](1)
        .map(_.getString(0)).toSet)
      assert(tagSets.forall(_.subsetOf(Set("001", "245"))),
        "a non-requested tag was decoded")
      // requested fields carry the same values as in the full read
      val want001 = full.collect().map(_.getSeq[org.apache.spark.sql.Row](1)
        .find(_.getString(0) == "001").map(_.getString(3))).toVector.sortBy(_.toString)
      val got001 = restricted.collect().map(_.getSeq[org.apache.spark.sql.Row](1)
        .find(_.getString(0) == "001").map(_.getString(3))).toVector.sortBy(_.toString)
      assert(got001 == want001)
    } finally full.unpersist()
  }

  test("leader-only and full decodes accept/reject identically on dirty input") {
    // malformed record (bad length digits) between two good ones: both
    // paths must skip it the same way and agree on counts and offsets
    val recs = Fixtures.records("test_data.utf8").take(2)
    val d = Files.createTempDirectory("marcdirty").toString
    val out = Files.newOutputStream(Paths.get(d, "dirty.mrc"))
    out.write(Iso2709.encode(recs.head))
    out.write("XXXXXjunk".getBytes("UTF-8")) // recLen parse fails → resync
    out.write(Iso2709.encode(recs(1)))
    out.close()
    val full = spark.read.format("marc").load(s"$d/dirty.mrc")
    val pruned = full.select("leader", "_record_offset")
    assert(scanDescription(pruned).contains("decode=leader-only"))
    // keeping `fields` in the projection forces the FULL decode path
    val fullDecode = full.select("leader", "_record_offset", "fields")
    assert(scanDescription(fullDecode).contains("decode=full"))
    val fullRows = fullDecode.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
    val prunedRows = pruned.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
    assert(prunedRows == fullRows)
    assert(fullRows.length == 2)
  }
}
