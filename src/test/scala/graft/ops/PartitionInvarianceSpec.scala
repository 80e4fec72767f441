package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Partition-invariance pins for the round-9 operators: a distributed
  * operator's RESULT must be a pure function of its input ROWS — never
  * of how those rows happen to be partitioned. Each op runs over the
  * same data at 1, 3, and 7 input partitions and must produce identical
  * sorted output (hash aggregates, window elections, greedy selections,
  * grid fills — each has a plausible partition-dependent failure mode
  * this would catch). */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val shared = "aa bb cc dd ee ff aa bb cc dd ee ff"
    (1L to 60L).map { i =>
      val body = Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
      val t = if (i % 4 == 0) shared + " " + body.mkString(" ")
        else body.mkString(" ")
      (i, if (i % 3 == 0) "en" else "de", t)
    }.toDF("doc_id", "lang", "text")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def invariant(name: String)(f: DataFrame => DataFrame): Unit = {
    val results = Seq(1, 3, 7).map(p => canon(f(docs.repartition(p))))
    assert(results.distinct.size == 1,
      s"$name result depends on input partitioning")
  }

  test("round-9 operators are partition-invariant") {
    invariant("removeDuplicatePassages")(d =>
      Dedup.removeDuplicatePassages(d, "doc_id", "text", w = 6))
    invariant("dsirScore")(d =>
      TextAnalysis.dsirScore(d, "doc_id", "text", col("lang") === "en"))
    invariant("contaminationReport")(d =>
      Dedup.contaminationReport(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text", "lang", n = 4))
    invariant("driftReport")(d =>
      TextAnalysis.driftReport(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "text", "lang"))
    invariant("packBinsFFD")(d =>
      Packing.packBinsFFD(
        d.select(col("doc_id"), length(col("text")).as("n")),
        "doc_id", "n", budget = 64L, chunkIdSpan = 16L))
  }

  test("round-9 vector and graph operators are partition-invariant") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val mmr = Seq(1, 3, 7).map(p => canon(
      Similarity.mmrSelectInt8(vecs.repartition(p),
        vecs.filter(col("vec_id") <= 2L), "vec_id", "embedding",
        k = 5, shortlist = 10)))
    assert(mmr.distinct.size == 1, "mmrSelectInt8 depends on partitioning")

    val edges = (1L to 50L).map(i => (i, i / 2)).toDF("src", "dst")
    val bfs = Seq(1, 3, 7).map(p => canon(
      Graph.bfsLevels(edges.repartition(p), "src", "dst",
        Seq(25L, 26L).toDF("id"), "id", maxHops = 8)))
    assert(bfs.distinct.size == 1, "bfsLevels depends on partitioning")

    val ev = (1L to 300L).map(i =>
      (i % 7, i * 13L % 500L, (i % 11).toDouble)).toDF("k", "ts_us", "value")
    val rs = Seq(1, 3, 7).map(p => canon(
      Resample.resampleLocf(ev.repartition(p), "k", "ts_us",
        col("value"), stepUs = 50L)))
    assert(rs.distinct.size == 1, "resampleLocf depends on partitioning")

    // exact-mode quantile sketch: while inputs fit capacity the summary
    // is the full value set, so partitioning cannot matter
    val qsk = Seq(1, 3, 7).map(p => canon(
      ev.repartition(p).groupBy("k")
        .agg(graft.functions.QuantileSketchAggregate
          .quantileSketch(col("value"), 1024).as("s"))
        .select(col("k"),
          graft.functions.QuantileSketchAggregate
            .sketchQuantile(col("s"), 1, 2).as("p50"))))
    assert(qsk.distinct.size == 1, "exact-mode sketch depends on partitioning")
  }
}
