package graft.functions

import graft.SparkSpec

class DeflateRatioSpec extends SparkSpec {

  private def r(s: String): Double =
    DeflateRatioExpression.ratio(s.getBytes("UTF-8"))

  test("ratio separates repetition, prose, and high-entropy text") {
    val spam = "buy now click here " * 100
    val prose = "The quick brown fox jumps over the lazy dog near the " +
      "river bank while the morning sun rises slowly over distant hills " +
      "and the farmer walks his field checking every row of wheat."
    // 16-symbol alphabet, no repeats: ~4 bits/char entropy floor
    val hexish = (1 to 40).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"seed-$i".getBytes).map("%02x".format(_)).mkString).mkString
    assert(r(spam) < 0.1, s"repetition: ${r(spam)}")
    assert(r(prose) > 0.3 && r(prose) < 0.9, s"prose: ${r(prose)}")
    // a 16-symbol no-repeat stream cannot beat its ~4-bit/char entropy
    // floor by much: deflate stays above 0.5 at any length
    assert(r(hexish) > 0.5, s"hex floor: ${r(hexish)}")
    // the signal's point: repetition sits FAR below both (short prose
    // can out-ratio long hex — smaller redundancy pool — so no ordering
    // is pinned between those two, only the spam gap)
    assert(r(spam) < r(prose) / 3 && r(spam) < r(hexish) / 3)
    // deterministic across calls (fixed level, pure JDK deflate)
    assert(r(prose) == r(prose))
    // empty: nothing to compress
    assert(r("") == 1.0)
    // multi-byte UTF-8 counts BYTES, not chars
    assert(r("日本語" * 200) < 0.2)
  }

  test("SQL registration, null-safety, codegen path") {
    import spark.implicits._
    val df = Seq((1L, "word " * 200), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.selectExpr("id", "graft_deflate_ratio(t) AS dr")
      .orderBy("id").collect()
    assert(got(0).getDouble(1) < 0.1)
    assert(got(1).isNullAt(1))
    // kernel == column API == SQL
    val viaCol = df.filter($"id" === 1)
      .select(graft.ops.TextAnalysis.deflateRatio($"t")).head().getDouble(0)
    assert(viaCol == got(0).getDouble(1))
  }
}
