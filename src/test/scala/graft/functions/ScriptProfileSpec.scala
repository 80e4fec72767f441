package graft.functions

import graft.SparkSpec

class ScriptProfileSpec extends SparkSpec {

  private def p(s: String) = ScriptProfileExpression.profile(s)

  test("dominant script, mix fraction, letters-only voting") {
    assert(p("plain english text") == ("LATIN", 0.0))
    assert(p("привет мир") == ("CYRILLIC", 0.0))
    assert(p("中文文本")._1 == "HAN")
    // digits/punctuation/whitespace never vote
    assert(p("abc 123 !!! def") == ("LATIN", 0.0))
    assert(p("12345 !!!") == (null, 0.0))
    assert(p("") == (null, 0.0))
    // mixed: 6 Cyrillic + 3 Latin letters -> dominant CYRILLIC, 3/9 mix
    val (sc, mix) = p("привет abc")
    assert(sc == "CYRILLIC" && math.abs(mix - 3.0 / 9.0) < 1e-12)
    // the spoofing shape: one Cyrillic lookalike inside a Latin word
    val (sc2, mix2) = p("pаypal account") // 'а' is U+0430 CYRILLIC
    assert(sc2 == "LATIN" && mix2 > 0.0)
    // deterministic tie-break: 1 Greek vs 1 Latin letter -> GREEK < LATIN
    assert(p("aα")._1 == "GREEK")
    // supplementary-plane letters count once (Deseret, U+10400)
    assert(p(new String(Character.toChars(0x10400)))._1 == "DESERET")
  }

  test("SQL registration and null-safety") {
    import spark.implicits._
    val df = Seq((1L, "hello мир mixed"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.selectExpr("id", "graft_script_profile(t) AS p")
      .selectExpr("id", "p.script", "p.mix").orderBy("id").collect()
    assert(got(0).getString(1) == "LATIN")
    assert(got(0).getDouble(2) > 0.0)
    assert(got(1).isNullAt(1) || got(1).get(1) == null)
  }
}
