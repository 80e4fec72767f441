package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MojibakeSpec extends SparkSpec {

  private def f(s: String) = MojibakeExpression.fix(s)

  test("repairs the canonical cp1252/Latin-1 misdecodes") {
    // UTF-8 e-acute (C3 A9) read as cp1252 -> "A-tilde copyright"
    assert(f("caf\u00C3\u00A9") == "caf\u00E9")
    // right single quote (E2 80 99): 0x80 is the cp1252 euro display
    assert(f("it\u00E2\u20AC\u2122s") == "it\u2019s")
    // trademark (E2 84 A2): 0x84 via the cp1252 low-quote display char
    assert(f("x\u00E2\u201E\u00A2y") == "x\u2122y")
    // Latin-1 variant: C1 control chars carry the raw 0x80-0x9F bytes
    assert(f("a\u00E2\u0080\u0099b") == "a\u2019b")
    // 4-byte sequence (emoji F0 9F 98 80 via cp1252 displays)
    assert(f("\u00F0\u0178\u02DC\u20AC") == new String(Character.toChars(0x1F600)))
    // multiple sequences in one string, ASCII interleaved
    assert(f("na\u00C3\u00AFve caf\u00C3\u00A9") == "na\u00EFve caf\u00E9")
  }

  test("never rewrites clean text: the conservative round-trip rule") {
    // correctly-decoded accents re-encode to single high bytes -> not UTF-8
    assert(f("caf\u00E9") == "caf\u00E9")
    assert(f("na\u00EFve r\u00E9sum\u00E9") == "na\u00EFve r\u00E9sum\u00E9")
    // ASCII fast path
    assert(f("plain ascii") == "plain ascii")
    assert(f("") == "")
    // chars outside the cp1252 image (CJK, Cyrillic) -> untouched
    assert(f("\u4E2D\u6587 text") == "\u4E2D\u6587 text")
    assert(f("\u043F\u0440\u0438\u0432\u0435\u0442") == "\u043F\u0440\u0438\u0432\u0435\u0442")
    // already-repaired curly quote: single U+2019 -> cp1252 0x92 alone
    // is a bare continuation byte -> unchanged
    assert(f("it\u2019s") == "it\u2019s")
    // overlong (C0 80 would be NUL) can't arise: 0xC0 lead rejects
    assert(f("\u00C0\u20AC") == "\u00C0\u20AC")
    // truncated lead at end of string
    assert(f("bad\u00C3") == "bad\u00C3")
  }

  test("kernel is total on fuzzed high-char soup and never throws") {
    val gen = Gen.listOfN(24, Gen.oneOf(
      Gen.choose(0x20.toChar, 0x7E.toChar),
      Gen.choose(0x80.toChar, 0xFF.toChar),
      Gen.oneOf('\u20AC', '\u2122', '\u201E', '\u2018', '\u2019', '\u0152'),
      Gen.choose(0x2000.toChar, 0x21FF.toChar))).map(_.mkString)
    var seed = Seed(7L)
    (1 to 500).foreach { _ =>
      val s = gen.apply(Gen.Parameters.default, seed).getOrElse("")
      seed = seed.next
      val r = f(s)
      assert(r != null)
      // idempotence on the repaired form is NOT promised (double
      // mojibake repairs one layer per call, pinned) — but totality is
      assert(f(r) != null)
    }
  }

  test("column path and SQL registration match the kernel; null-total") {
    import spark.implicits._
    val rows = Seq("caf\u00C3\u00A9", "caf\u00E9", "plain", "a\u00E2\u20AC\u2122b")
    val got = rows.toDF("t")
      .select(graft.ops.TextAnalysis.fixMojibake(col("t")).as("f"))
      .as[String].collect().toSeq
    assert(got == rows.map(f))
    val sqlGot = rows.toDF("t")
      .selectExpr("graft_fix_mojibake(t) AS f").as[String].collect().toSeq
    assert(sqlGot == rows.map(f))
    val n = Seq[Option[String]](None).toDF("t")
      .select(graft.ops.TextAnalysis.fixMojibake(col("t"))).collect()
    assert(n.head.isNullAt(0))
    // curation knob: mojibake doc now exact-matches its clean twin
    val docs = Seq(
      (1L, "the of and to in a caf\u00E9 words here now", "en"),
      (2L, "the of and to in a caf\u00C3\u00A9 words here now", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.examples.CurationPipeline.curate(
      docs, Seq.empty[String].toDF("text"),
      cfg = graft.examples.CurationPipeline.Config(fixEncoding = true))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L),
      "repaired mojibake twin must dedup against the clean doc")
  }
}
