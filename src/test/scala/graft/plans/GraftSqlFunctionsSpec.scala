package graft.plans

import graft.SparkSpec
import graft.marc.{MarcField, MarcRecord, MarcSource}

/** The SQL surface: every registered graft_* function must be reachable
  * from spark.sql on a GraftSession (extensions-installed). */
class GraftSqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vector kernels work from SQL") {
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("v")
    val dot = spark.sql("SELECT graft_dot(a, b) AS d FROM v").as[Double].head()
    assert(dot == 11.0)
    val d8 = spark.sql(
      "SELECT graft_dot_int8(CAST(ARRAY(1,2) AS ARRAY<TINYINT>), CAST(ARRAY(3,4) AS ARRAY<TINYINT>)) AS d"
    ).as[Long].head()
    assert(d8 == 11L)
  }

  test("graft_topk aggregates from SQL with the documented ordering") {
    (1L to 10L).map(i => (i % 2, i.toDouble, i)).toDF("g", "score", "id")
      .createOrReplaceTempView("scored")
    val top = spark.sql(
      """SELECT g, graft_topk(score, id, 2) AS top FROM scored GROUP BY g ORDER BY g"""
    ).selectExpr("g", "top.id AS ids").as[(Long, Seq[Long])].collect().toMap
    assert(top(0L) == Seq(10L, 8L))
    assert(top(1L) == Seq(9L, 7L))
  }

  test("quantize and token-weight kernels work from SQL") {
    val (scale, q) = spark.sql(
      "SELECT graft_quantize_int8(CAST(ARRAY(0.5, -1.0, 0.0) AS ARRAY<DOUBLE>)) AS z")
      .selectExpr("z.scale", "z.q").as[(Double, Seq[Byte])].head()
    assert(scale == 1.0 / 127.0 && q == Seq[Byte](64, -127, 0))
    val w = spark.sql("SELECT graft_token_weight('hello') AS w").as[Long].head()
    assert(-128L <= w && w <= 127L)
    // pins the md5-bucket definition: first two hex digits minus 128
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString, 16) - 128
    assert(w == expected)
  }

  test("text kernels work from SQL") {
    val sh = spark.sql("SELECT graft_shingles('a b c d', 3) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val j = spark.sql(
      "SELECT graft_shingle_jaccard(graft_shingles('a b c d', 2), graft_shingles('a b c e', 2)) AS j"
    ).as[Double].head()
    assert(j == 0.5)
    val lang = spark.sql("SELECT graft_lang_id('the of and to in a') AS l").as[String].head()
    assert(lang == "en")
    val wh = spark.sql(
      "SELECT graft_window_hashes('a b c d', 3) AS h, md5('a b c') AS m1, md5('b c d') AS m2")
      .collect()(0)
    assert(wh.getSeq[String](0) == Seq(wh.getString(1), wh.getString(2)))
    assert(spark.sql("SELECT graft_window_hashes('a b', 3) AS h")
      .collect()(0).getSeq[String](0).isEmpty)
    val bands = spark.sql("SELECT graft_minhash_bands('x y z w v', 4, 2, 3, 42) AS b")
      .as[Seq[Int]].head()
    assert(bands.length == 4)
  }

  test("marc_extract and extract_xpath work from SQL") {
    val rec = MarcRecord("00000cam a2200000 a 4500", Seq(
      MarcField.data("245", "1", "0", "a" -> "Title", "b" -> "subtitle")))
    MarcSource.fromRecords(spark, Seq(rec)).createOrReplaceTempView("marc")
    val title = spark.sql("SELECT marc_extract(record, '245ab') AS t FROM marc")
      .as[Seq[String]].head()
    assert(title == Seq("Title subtitle"))
    val noSep = spark.sql("SELECT marc_extract(record, '245ab', '') AS t FROM marc")
      .as[Seq[String]].head()
    assert(noSep == Seq("Title", "subtitle"))

    val x = spark.sql(
      "SELECT extract_xpath('<r><a>1</a><a>2</a></r>', '//a') AS v"
    ).as[Seq[String]].head()
    assert(x == Seq("1", "2"))
  }

  test("graft_percentile_disc matches the rank-k member convention from SQL") {
    // 1..10 twice per group: p50 member of n=20 is rank (21)//2 = 10 -> 5.0
    val rows = (1 to 10).flatMap(i => Seq(("a", i.toDouble), ("a", i.toDouble))) :+ (("b", 7.0))
    rows.toDF("g", "v").createOrReplaceTempView("pd")
    val got = spark.sql(
      """SELECT g, graft_percentile_disc(v, 1, 2) AS p50,
                   graft_percentile_disc(v, 99, 100) AS p99
         FROM pd GROUP BY g ORDER BY g""")
      .as[(String, Double, Double)].collect().toSeq
    // group a: n=20, k50 = 10 -> value 5.0; k99 = floor(99*21/100) = 20 -> 10.0
    // group b: single member is every percentile
    assert(got == Seq(("a", 5.0, 10.0), ("b", 7.0, 7.0)))
    // nulls are excluded; empty (all-null) group yields NULL
    Seq(("a", Some(1.0)), ("a", None), ("b", Option.empty[Double]))
      .toDF("g", "v").createOrReplaceTempView("pdn")
    val nn = spark.sql(
      "SELECT g, graft_percentile_disc(v, 1, 2) AS p FROM pdn GROUP BY g ORDER BY g")
      .collect()
    assert(nn(0).getDouble(1) == 1.0 && nn(1).isNullAt(1))
  }

  test("graft_cap_keys reproduces capPerGroup's kept set from SQL") {
    import graft.ops.Sampling
    val docs = Seq.tabulate(60)(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    docs.createOrReplaceTempView("caps")
    val sql = spark.sql(
      """SELECT grp, k.id AS id FROM (
           SELECT grp, graft_cap_keys(id, 5, 'graft') AS keys
           FROM caps GROUP BY grp) t
         LATERAL VIEW explode(keys) e AS k""")
      .as[(String, Long)].collect().toSet
    val scala = Sampling.capPerGroup(docs, "grp", "id", 5)
      .as[(Long, String)].collect().map(_.swap).toSet
    assert(sql == scala && sql.size == 15)
  }

  test("graft_media_info decodes headers from SQL and is total on garbage") {
    val row = spark.sql(
      """SELECT graft_media_info(unhex(
           '89504E470D0A1A0A0000000D494844520000002000000010080600000000')) AS m"""
    ).selectExpr("m.format", "m.width", "m.height", "m.bit_depth")
      .as[(String, Int, Int, Int)].head()
    assert(row == (("png", 32, 16, 8)))
    val garbage = spark.sql(
      "SELECT graft_media_info(CAST('notanimage' AS BINARY)) AS m")
      .selectExpr("m.format").as[String].head()
    assert(garbage == "unknown")
    val nul = spark.sql("SELECT graft_media_info(CAST(NULL AS BINARY)) AS m")
      .filter("m IS NULL").count()
    assert(nul == 1L)
  }

  test("graft_binary_simhash matches the kernel/driver reference from SQL") {
    val sig = spark.sql(
      "SELECT graft_binary_simhash(CAST('hello payload bytes' AS BINARY), 4)")
      .as[Long].head()
    assert(sig == graft.ops.Dedup.binarySimhash(
      "hello payload bytes".getBytes("UTF-8"), 4))
    // identical payloads agree; null is total
    val same = spark.sql(
      """SELECT graft_binary_simhash(CAST('aaa' AS BINARY), 4) =
                graft_binary_simhash(CAST('aaa' AS BINARY), 4)""")
      .as[Boolean].head()
    assert(same)
    assert(spark.sql(
      "SELECT graft_binary_simhash(CAST(NULL AS BINARY), 4)")
      .filter("1=1").head().isNullAt(0))
  }

  test("config arguments must be literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b', CAST(rand()*3 AS INT)) AS s").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
