package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistinctSketchSpec extends SparkSpec {

  test("exact regime: sketch == COUNT(DISTINCT) on fuzzed grouped data, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    val rows = (1 to 20000).map { _ =>
      val g = s"g${rnd.nextInt(7)}"
      val v = s"v${rnd.nextInt(3000)}" // <= 3000 distinct < 2^12: exact
      (g, v)
    }
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = df.groupBy("g")
        .agg(DistinctSketchAggregate.distinctSketch(col("v"), 12).as("n"))
      val want = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      assert(got.orderBy("g").collect().toSeq ==
        want.orderBy("g").collect().toSeq,
        s"exact regime must equal countDistinct at $parts partitions")
    }
  }

  test("SQL registry surface + null skipping") {
    import spark.implicits._
    Seq(Some("a"), None, Some("b"), Some("a"), None)
      .toDF("v").createOrReplaceTempView("dcs_vals")
    val n = spark.sql(
      "SELECT graft_distinct_sketch(v, 8) FROM dcs_vals").head().getLong(0)
    assert(n == 2L, s"nulls must be skipped: got $n")
    spark.catalog.dropTempView("dcs_vals")
    // empty input -> 0
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("v", StringType))))
    assert(empty.agg(DistinctSketchAggregate.distinctSketch(col("v"), 8))
      .head().getLong(0) == 0L)
  }

  test("dense regime: HLL estimate within 5% (3 sigma at p=12) of 100k distinct") {
    import spark.implicits._
    val df = (1 to 100000).map(i => s"val_$i").toDF("v").repartition(8)
    val est = df.agg(DistinctSketchAggregate.distinctSketch(col("v"), 12))
      .head().getLong(0)
    val err = math.abs(est - 100000.0) / 100000.0
    assert(err < 0.05, s"estimate $est is ${err * 100}%% off (expect <5%%)")
  }

  test("densification boundary and sparse/dense merge agreement (unit)") {
    // while <= 2^8 distinct hashes: sparse + exact
    val s = new DcSketch(8)
    (1 to 256).foreach(i => s.add(i.toLong * 0x9e3779b97f4a7c15L))
    assert(!s.dense && s.estimate() == 256L)
    s.add(257L * 0x9e3779b97f4a7c15L)
    assert(s.dense, "adding the 257th distinct hash must densify")
    // merging a sparse sketch into a dense one == one sketch fed everything
    val all = new DcSketch(8)
    val a = new DcSketch(8)
    val b = new DcSketch(8)
    val rnd = new scala.util.Random(17)
    val hs = Array.fill(2000)(rnd.nextLong())
    hs.foreach(all.add)
    hs.take(1500).foreach(a.add) // densifies
    hs.drop(1500).foreach(b.add) // stays sparse (500 > 256? densifies too — fine)
    a.mergeFrom(b)
    assert(a.estimate() == all.estimate(),
      "merge must be equivalent to single-sketch ingestion")
    // zero-hash totality
    val z = new DcSketch(4)
    z.add(0L); z.add(0L); z.add(1L)
    assert(z.estimate() == 2L)
  }

  test("precision bounds fail loudly from SQL; weight/empty edges are total") {
    import spark.implicits._
    Seq("a").toDF("v").createOrReplaceTempView("dcs_edge")
    for (p <- Seq(3, 19)) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_distinct_sketch(v, $p) FROM dcs_edge").collect()
      }
      assert(e.getMessage.contains("precision must be in [4, 18]"),
        s"p=$p: ${e.getMessage.take(120)}")
    }
    spark.catalog.dropTempView("dcs_edge")
  }

  test("serialization roundtrip preserves both modes") {
    val agg = DistinctSketch(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val sparse = new DcSketch(8)
    (1 to 100).foreach(i => sparse.add(i * 31L))
    val sparse2 = agg.deserialize(agg.serialize(sparse))
    assert(!sparse2.dense && sparse2.estimate() == sparse.estimate())
    val dense = new DcSketch(8)
    (1 to 5000).foreach(i => dense.add(i * 0x9e3779b97f4a7c15L))
    val dense2 = agg.deserialize(agg.serialize(dense))
    assert(dense2.dense && dense2.estimate() == dense.estimate())
  }
}
