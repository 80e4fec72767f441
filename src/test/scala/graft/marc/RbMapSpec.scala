package graft.marc

import org.scalatest.funsuite.AnyFunSuite

/** The declarative `.rb` translation-map parser: constructs from the
  * reference's test maps (translation_map_test.rb fixtures), loud
  * failures on procedural Ruby, YAML round-trip. */
class RbMapSpec extends AnyFunSuite {

  private val rubyMapStyle =
    """foo = "bar"
      |
      |some_hash = {
      |  "key1" => "value1",
      |  "array_key" => %w{one two three},
      |  "key_to_be_overridden" => "value_from_ruby"
      |}
      |some_hash["also"] = "this"
      |
      |# can be other ruby here, last line needs to evaluate as a Hash
      |some_hash
      |""".stripMargin

  test("hash literal + %w + mutation + last-line variable (ruby_map shape)") {
    val m = RbMap.parse(rubyMapStyle).toMap
    assert(m("key1") == "value1")
    assert(m("array_key") == Vector("one", "two", "three"))
    assert(m("key_to_be_overridden") == "value_from_ruby")
    assert(m("also") == "this")
    assert(!m.contains("foo"))
  }

  test("defaults flow into TranslationMap: literal and passthrough") {
    val lit = RbMap.toTranslationMap(
      """h = { "key1" => "value1" }
        |h["__default__"] = "DEFAULT LITERAL"
        |h""".stripMargin)
    assert(lit.translateArray(Seq("key1", "missing")) ==
      Vector("value1", "DEFAULT LITERAL"))
    val pass = RbMap.toTranslationMap(
      """{ "key1" => "value1", "__default__" => "__passthrough__" }""")
    assert(pass.translateArray(Seq("key1", "missing")) ==
      Vector("value1", "missing"))
  }

  test("literal forms: nil removal, symbols, numbers, freeze, arrays, escapes") {
    val m = RbMap.parse(
      """{
        |  "gone" => nil,
        |  :sym => "v",
        |  "n" => 42,
        |  "f" => -1.5,
        |  "frozen" => "str".freeze,
        |  "arr" => ["a", "b"],
        |  "esc" => "line\nbreak 'q' \"dq\"",
        |  "single" => 'it\'s ok',
        |  "flag" => true
        |}""".stripMargin).toMap
    assert(m("gone") == null)
    assert(m("sym") == "v")
    assert(m("n") == 42L)
    assert(m("f") == -1.5)
    assert(m("frozen") == "str")
    assert(m("arr") == Vector("a", "b"))
    assert(m("esc") == "line\nbreak 'q' \"dq\"")
    assert(m("single") == "it's ok")
    assert(m("flag") == true)
    // nil entries remove the input value in translate
    assert(TranslationMap.fromRaw(m).translateArray(Seq("gone", "sym")) == Vector("v"))
  }

  test("procedural Ruby fails loudly, never silently") {
    val bad = Seq(
      "x+y\n\nThis is\n  not valid ruby",       // bad_ruby.rb shape
      "require 'match_map'\nmm = MatchMap.new\nmm", // the MatchMap maps
      """{ "k" => "#{interpolated}" }""",
      "h = { \"k\" => \"v\" }\nh.merge({})",
      """def f; end""",
      """foo = "bar"""",                         // last line not a hash
      // Ruby evaluates `h["k"] = v` to v, so a mutation-last file is a
      // non-Hash result — the reference loader rejects it; so do we
      "h = { \"a\" => \"b\" }\nh[\"c\"] = \"d\"")
    for (src <- bad) {
      val e = intercept[IllegalArgumentException](RbMap.parse(src))
      assert(e.getMessage.contains("declarative") ||
        e.getMessage.contains("hash expression"), s"weak error for: $src\n$e")
    }
  }

  test("YAML round-trip loads back identically (snakeyaml → fromRaw)") {
    import scala.jdk.CollectionConverters._
    val yaml = RbMap.toYaml(rubyMapStyle)
    val loaded = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[Any, Any]](yaml).asScala.toMap
    assert(TranslationMap.fromRaw(loaded) == RbMap.toTranslationMap(rubyMapStyle))
  }

  test("converts the reference's real declarative maps (country_map et al)") {
    val fixtures = Seq(
      "/root/reference/test/translation_maps/ruby_map.rb",
      "/root/reference/test/translation_maps/both_map.rb",
      "/root/reference/test/translation_maps/default_literal.rb",
      "/root/reference/test/translation_maps/default_passthrough.rb",
      "/root/reference/index_bench/translation_maps/ht/country_map.rb")
      .map(java.nio.file.Paths.get(_)).filter(java.nio.file.Files.exists(_))
    assume(fixtures.nonEmpty, "reference fixtures not present")
    for (p <- fixtures) {
      val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val tm = RbMap.toTranslationMap(src)
      assert(tm.entries.nonEmpty || tm.default.nonEmpty, s"empty map from $p")
    }
    // spot semantics on the real country map
    val cm = fixtures.find(_.toString.contains("country_map"))
    cm.foreach { p =>
      val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val tm = RbMap.toTranslationMap(src)
      assert(tm.translateArray(Seq("us")) == Vector("United States"))
    }
    // and the reference's bad_ruby fixture must be rejected
    val badPath = java.nio.file.Paths.get(
      "/root/reference/test/translation_maps/bad_ruby.rb")
    if (java.nio.file.Files.exists(badPath)) {
      val src = new String(java.nio.file.Files.readAllBytes(badPath), "UTF-8")
      intercept[IllegalArgumentException](RbMap.parse(src))
    }
  }
}
