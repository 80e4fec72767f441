package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {

  private def norm(s: String, strip: Boolean = false): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(NormalizeTextExpression.nfcNormalize(col("t"), strip).as("n"))
      .as[String].collect().head
  }

  test("composes decomposed sequences to canonical NFC") {
    assert(norm("cafe\u0301") == "caf\u00e9")
    assert(norm("A\u030angstro\u0308m") == "\u00c5ngstr\u00f6m")
    // already-composed input unchanged
    assert(norm("caf\u00e9") == "caf\u00e9")
  }

  test("ASCII fast path returns the input unchanged") {
    val s = "plain ascii text 123 with tabs\tand newlines\n"
    assert(norm(s) == s)
  }

  test("stripControls drops C0/C1 controls but keeps tab/newline/CR") {
    assert(norm("a\u0000b\u0007c", strip = true) == "abc")
    assert(norm("a\tb\nc\rd", strip = true) == "a\tb\nc\rd")
    assert(norm("x\u009fy", strip = true) == "xy")
    // combined: normalization happens before the strip
    assert(norm("cafe\u0301\u0002", strip = true) == "caf\u00e9")
  }

  test("compression ratio separates template spam from prose, null-total") {
    import spark.implicits._
    val prose = "the quarterly report outlines revenue growth across " +
      "distinct market segments with varied terminology throughout analysis"
    val spam = ("buy cheap pills now " * 40).trim
    val rows = Seq((1L, prose), (2L, spam), (3L, ""),
      (4L, null.asInstanceOf[String]))
    val got = rows.toDF("id", "t")
      .select(col("id"),
        CompressionRatioExpression.compressionRatio(col("t")).as("cr"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(got(2L).doubleValue() < 0.2, s"template spam: ${got(2L)}")
    assert(got(1L).doubleValue() > got(2L).doubleValue() * 2)
    assert(got(3L).doubleValue() == 1.0)
    assert(got(4L) == null)
    // deterministic across partitionings (pure per-row function)
    val again = rows.toDF("id", "t").repartition(3)
      .select(col("id"),
        CompressionRatioExpression.compressionRatio(col("t")).as("cr"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))))
      .toMap
    assert(again == got)
  }

  test("null-total and non-BMP-safe") {
    import spark.implicits._
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, "\ud83d\ude00 ok"))
      .toDF("id", "t")
      .select(col("id"), NormalizeTextExpression.nfcNormalize(col("t")).as("n"))
      .collect()
    assert(out.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(out.find(_.getLong(0) == 2L).get.getString(1) == "\ud83d\ude00 ok")
  }
}
