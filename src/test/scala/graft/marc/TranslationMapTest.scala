package graft.marc

import org.scalatest.funsuite.AnyFunSuite

/** Semantics from the reference's translation_map.rb and
  * test/translation_map_test.rb. */
class TranslationMapTest extends AnyFunSuite {

  test("string, array, nil, and missing-key semantics") {
    val tm = TranslationMap.fromRaw(Map(
      "a" -> "A", "multi" -> List("X", "Y"), "gone" -> null))
    assert(tm.translateArray(Seq("a")) == Vector("A"))
    assert(tm.translateArray(Seq("multi")) == Vector("X", "Y"))
    assert(tm.translateArray(Seq("gone")) == Vector())
    assert(tm.translateArray(Seq("missing")) == Vector())
    assert(tm.translateArray(Seq("a", "multi", "gone", "a")) == Vector("A", "X", "Y", "A"))
  }

  test("__default__ literal and __passthrough__") {
    val lit = TranslationMap.fromRaw(Map("a" -> "A", "__default__" -> "Other"))
    assert(lit.translateArray(Seq("zzz")) == Vector("Other"))
    val pass = TranslationMap.fromRaw(Map("a" -> "A", "__default__" -> "__passthrough__"))
    assert(pass.translateArray(Seq("zzz")) == Vector("zzz"))
    assert(pass.translateArray(Seq("a")) == Vector("A"))
  }

  test("merge: later entries and default win") {
    val base = TranslationMap.fromPairs("a" -> "A", "b" -> "B")
    val over = TranslationMap.fromRaw(Map("b" -> "B2", "__default__" -> "D"))
    val merged = base.merge(over)
    assert(merged.translateArray(Seq("a", "b", "zz")) == Vector("A", "B2", "D"))
  }

  test("bundled yaml maps load (marc_languages et al)") {
    val langs = TranslationMap.named("marc_languages")
    assert(langs.translateArray(Seq("eng")) == Vector("English"))
    assert(langs.translateArray(Seq("fre")) == Vector("French"))
    val lcc = TranslationMap.named("lcc_top_level")
    assert(lcc.translateArray(Seq("A")) == Vector("General Works"))
    assert(TranslationMap.named("marc_instruments").entries.nonEmpty)
    assert(TranslationMap.named("marc_geographic").entries.nonEmpty)
    assert(TranslationMap.named("marc_genre_leader").entries.nonEmpty)
    assert(TranslationMap.named("marc_genre_007").entries.nonEmpty)
  }

  test("properties format") {
    val tm = TranslationMap.fromProperties("key1 = Value One\n# comment\nkey2: Value Two\n")
    assert(tm.translateArray(Seq("key1", "key2")) == Vector("Value One", "Value Two"))
  }

  test("named() falls back to a classpath .properties map (translation_map.rb:124-142)") {
    val tm = TranslationMap.named("test_props_map")
    assert(tm.translateArray(Seq("eng", "fre", "spa")) ==
      Vector("English", "French", "Spanish"))
    assert(tm.lookup("key with space").contains(Vector("Spaced")))
    // __default__ applies to missing keys
    assert(tm.translateArray(Seq("zzz")) == Vector("Unknown"))
    // __passthrough__ default returns the key itself
    val pass = TranslationMap.named("test_props_passthrough")
    assert(pass.translateArray(Seq("eng", "zzz")) == Vector("English", "zzz"))
    // unknown names still raise with both searched paths in the message
    val e = intercept[IllegalArgumentException](TranslationMap.named("no_such_map_xyz"))
    assert(e.getMessage.contains(".yaml") && e.getMessage.contains(".properties"))
  }

  test("extract_marc post-options order: first, translate, trim, dedup, default") {
    val rec = MarcRecord("", Vector(
      MarcField.data("040", " ", " ", "a" -> "DLC", "d" -> "DLC"),
      MarcField.data("245", "1", "0", "a" -> "Title :", "b" -> "subtitle.")))
    // dedup is ON by default (marc21.rb:133-135); separator=nil keeps the
    // two $-values distinct so dedup has something to do
    assert(ExtractMarc.compile("040ad", ExtractMarc.Options(separator = None))(rec) ==
      Vector("DLC"))
    assert(ExtractMarc.compile("040ad",
      ExtractMarc.Options(separator = None, allowDuplicates = true))(rec) ==
      Vector("DLC", "DLC"))
    // joined form: two subfields in spec ⇒ one space-joined value per field
    assert(ExtractMarc.compile("040ad")(rec) == Vector("DLC DLC"))
    assert(ExtractMarc.compile("245ab", ExtractMarc.Options(trimPunctuation = true))(rec) ==
      Vector("Title : subtitle"))
    assert(ExtractMarc.compile("999a", ExtractMarc.Options(default = Some("Unknown")))(rec) ==
      Vector("Unknown"))
    assert(ExtractMarc.compile("040ad",
      ExtractMarc.Options(separator = None, first = true, allowDuplicates = true))(rec) ==
      Vector("DLC"))
    val tm = TranslationMap.fromPairs("DLC" -> "Library of Congress")
    assert(ExtractMarc.compile("040a", ExtractMarc.Options(translationMap = Some(tm)))(rec) ==
      Vector("Library of Congress"))
  }
}
