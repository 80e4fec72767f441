package graft.functions

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Pinned charset-sniff rules of [[HttpDecodeExpression]] (browser
  * order: BOM > Content-Type charset param > meta prescan > UTF-8),
  * the WHATWG Latin-1→cp1252 superset rule, replacement on malformed
  * bytes, and whole-stage-codegen execution through the DataFrame API. */
class HttpDecodeSpec extends SparkSpec {

  private def decode(bytes: Array[Byte], ct: String): String =
    HttpDecodeExpression.decode(bytes, ct)

  test("Content-Type charset parameter wins over default") {
    val cp1252 = "café".getBytes("windows-1252") // é = 0xE9, invalid UTF-8
    assert(decode(cp1252, "text/html; charset=windows-1252") == "café")
    assert(decode(cp1252, "text/html; charset=\"windows-1252\"") == "café")
    // same bytes without the declaration: UTF-8 default → replacement
    assert(decode(cp1252, "text/html") == "caf�")
    assert(decode(cp1252, null) == "caf�")
  }

  test("WHATWG superset rule: Latin-1 labels decode as windows-1252") {
    // 0x92 is cp1252 RIGHT SINGLE QUOTATION MARK but an ISO-8859-1
    // control char — the superset rule is observable, not cosmetic
    val smart = Array[Byte]('i'.toByte, 't'.toByte, 0x92.toByte, 's'.toByte)
    assert(decode(smart, "text/plain; charset=iso-8859-1") == "it’s")
    assert(decode(smart, "text/plain; charset=latin1") == "it’s")
  }

  test("meta charset prescan fires when the header is silent") {
    val html = "<html><head><meta charset=\"windows-1252\"></head><body>café</body></html>"
    val bytes = html.getBytes("windows-1252")
    assert(decode(bytes, "text/html") contains "café")
    // http-equiv form
    val html2 = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"></head><body>café</body></html>"
    assert(decode(html2.getBytes("windows-1252"), null) contains "café")
    // header param OUTRANKS meta: utf-8 declared, meta lies
    val utf8Doc = ("<html><head><meta charset=\"windows-1252\"></head>" +
      "<body>café</body></html>").getBytes(StandardCharsets.UTF_8)
    assert(decode(utf8Doc, "text/html; charset=utf-8") contains "café")
    // meta beyond the 1024-byte prescan window is ignored
    val far = ("<html><body>" + ("x" * 1100) +
      "<meta charset=\"windows-1252\">café</body></html>")
    assert(decode(far.getBytes("windows-1252"), null) contains "caf�")
    // a bare charset= OUTSIDE a <meta> tag must NOT trigger the
    // prescan: link URLs, scripts, and page text mention charsets
    val trap = ("<html><head><script>var u='/conv?charset=big5';</script>" +
      "</head><body>see charset=koi8-r docs … café</body></html>")
      .getBytes(StandardCharsets.UTF_8)
    assert(new String(decode(trap, "text/html")) contains "café",
      "bare charset= in content must not select an encoding")
    // ...but inside a meta tag it still does, even with other attrs first
    val metaLate = ("<html><head><meta name=\"x\" charset=\"windows-1252\">" +
      "</head><body>café</body></html>").getBytes("windows-1252")
    assert(decode(metaLate, null) contains "café")
    // '<metadata>' (inline SVG) is NOT a meta tag: no name boundary
    val svg = ("<html><body><svg><metadata>author charset=big5 n</metadata>" +
      "</svg>café</body></html>").getBytes(StandardCharsets.UTF_8)
    assert(decode(svg, "text/html") contains "café")
    // a meta tag CLIPPED by the 1024-byte prescan window (no '>' inside)
    // must not yield a truncated charset label — UTF-8 fallback
    val clipped = ("<html><head>" + ("x" * 1000) +
      "<meta charset=iso-8859-15 more-attrs-that-never-close café")
      .getBytes(StandardCharsets.UTF_8)
    assert(decode(clipped, null) contains "café")
    // an unterminated quoted value inside a closed tag is malformed
    val badQuote = ("<html><meta charset=\"windows-1252></html>" +
      "café").getBytes(StandardCharsets.UTF_8)
    assert(decode(badQuote, null) contains "café")
  }

  test("hostile Content-Type with length-changing case folds stays correct") {
    val cp1252 = "café".getBytes("windows-1252")
    // U+0130 (İ) lowercases to TWO chars under ROOT: index arithmetic
    // computed on the folded copy must not slice the original
    assert(decode(cp1252, "text/html; İİcharset=windows-1252")
      == "café")
  }

  test("BOM outranks every declaration and is consumed") {
    val utf8Bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "café".getBytes(StandardCharsets.UTF_8)
    assert(decode(utf8Bom, "text/html; charset=windows-1252") == "café")
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++
      "hi".getBytes(StandardCharsets.UTF_16BE)
    assert(decode(be, "text/html; charset=utf-8") == "hi")
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      "hi".getBytes(StandardCharsets.UTF_16LE)
    assert(decode(le, null) == "hi")
  }

  test("unknown labels fall back to UTF-8; decode is total on garbage") {
    val b = "plain".getBytes(StandardCharsets.UTF_8)
    assert(decode(b, "text/html; charset=klingon-8") == "plain")
    assert(decode(b, "text/html; charset=") == "plain")
    val junk = Array[Byte](0xC3.toByte, 0x28.toByte, 0x80.toByte) // broken UTF-8
    assert(decode(junk, null).contains("�")) // replaced, no throw
  }

  test("DataFrame execution inside whole-stage codegen, null contract") {
    import spark.implicits._
    val df = Seq(
      (1L, "café".getBytes("windows-1252"), "text/html; charset=windows-1252"),
      (2L, "café".getBytes(StandardCharsets.UTF_8), null.asInstanceOf[String]),
      (3L, null.asInstanceOf[Array[Byte]], "text/html")
    ).toDF("id", "payload", "ct")
    val got = df.select(col("id"),
        TextAnalysis.decodeHttpText(col("payload"), col("ct")).as("text"))
      .orderBy("id").collect()
    assert(got(0).getString(1) == "café")
    assert(got(1).getString(1) == "café")
    assert(got(2).isNullAt(1)) // null payload → null out
    // the plan stays inside WholeStageCodegen (no fallback split) — a
    // LocalRelation folds eagerly, so pin over a real scan
    val dir = java.nio.file.Files.createTempDirectory("httpdec").toString
    df.write.mode("overwrite").parquet(s"$dir/t")
    val scanned = spark.read.parquet(s"$dir/t")
      .select(col("id"), TextAnalysis.decodeHttpText(col("payload"), col("ct")).as("text"))
    val exec = scanned.queryExecution.executedPlan
    assert(exec.exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      exec.toString)
    assert(scanned.orderBy("id").collect()(0).getString(1) == "café")
  }
}
