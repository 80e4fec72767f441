package graft.marc

import org.scalatest.funsuite.AnyFunSuite

/** Golden expectations ported from the reference's
  * test/marc_extractor_test.rb (assertions cited inline). */
class MarcExtractorSpecTest extends AnyFunSuite {

  test("parses single spec with all elements (245|1*|abcg)") {
    val set = MarcSpec.parse("245|1*|abcg")
    assert(set.tags == Set("245"))
    val spec = set.specsForTag("245").head
    assert(spec.ind1.contains("1"))
    assert(spec.ind2.isEmpty)
    assert(spec.subfields.contains(Vector("a", "b", "c", "g")))
  }

  test("parses a mixed bag (245abcdes:810:700|*4|bcd)") {
    val set = MarcSpec.parse("245abcdes:810:700|*4|bcd")
    assert(set.byTag.size == 3)
    val s245 = set.specsForTag("245").head
    assert(s245.ind1.isEmpty && s245.ind2.isEmpty)
    assert(s245.subfields.contains(Vector("a", "b", "c", "d", "e", "s")))
    val s810 = set.specsForTag("810").head
    assert(s810.subfields.isEmpty, "no subfields = all subfields")
    val s700 = set.specsForTag("700").head
    assert(s700.ind1.isEmpty && s700.ind2.contains("4"))
    assert(s700.subfields.contains(Vector("b", "c", "d")))
  }

  test("parses fixed field byte offsets (005[5]:008[7-10])") {
    val set = MarcSpec.parse("005[5]:008[7-10]")
    val s005 = set.specsForTag("005").head
    assert(s005.byte1.contains(5) && s005.byte2.isEmpty)
    val s008 = set.specsForTag("008").head
    assert(s008.byte1.contains(7) && s008.byte2.contains(10))
  }

  test("parses array specs and keeps per-tag order (245a:245abc)") {
    val set = MarcSpec.parse(Seq("245abcde", "100:110:111", "810", "700|*4|bcd"))
    assert(set.byTag.size == 6)
    val multi = MarcSpec.parse("245a:245abc")
    assert(multi.specsForTag("245").map(_.subfields.get) ==
      Vector(Vector("a"), Vector("a", "b", "c")))
  }

  test("rejects malformed spec") {
    intercept[IllegalArgumentException] { MarcSpec.parse("24") }
    intercept[IllegalArgumentException] { MarcSpec.parse("245|1|abc") }
  }

  test("blank indicator must match blank; * matches anything") {
    val blankSpec = MarcSpec.parsePart("245| 0|ab")
    assert(blankSpec.matchesIndicators(MarcField.data("245", " ", "0", "a" -> "x")))
    assert(!blankSpec.matchesIndicators(MarcField.data("245", "1", "0", "a" -> "x")))
  }

  // ---- extraction goldens over manufacturing_consent.marc -----------------

  private lazy val consent = Fixtures.first("manufacturing_consent")

  test("extracts a basic case in record order (700abcdef:856|*2|:505|1*|:245ba)") {
    val values = MarcExtractor("700abcdef:856|*2|:505|1*|:245ba").extract(consent)
    // marc_extractor_test.rb "respects original record order"
    assert(values == Vector(
      "Manufacturing consent : the political economy of the mass media /",
      "Chomsky, Noam.",
      "Contributor biographical information http://www.loc.gov/catdir/bios/random051/2001050014.html",
      "Publisher description http://www.loc.gov/catdir/description/random044/2001050014.html"))
    // "does not have 505, due to non-matching indicators"
    assert(!values.exists(_.contains("propaganda model")))
  }

  test("extracts fixed fields complete / single byte / range") {
    assert(MarcExtractor("001").extract(consent) == Vector("2710183"))
    assert(MarcExtractor("008[5]").extract(consent) == Vector("1"))
    assert(MarcExtractor("008[7-10]").extract(consent) == Vector("2002"))
  }

  test("separator nil causes non-join; custom separator joins") {
    assert(MarcExtractor("245", None, AlternateScript.Include).extract(consent).size == 3)
    val custom = MarcExtractor("245", Some("!! "), AlternateScript.Include).extract(consent)
    assert(custom == Vector("Manufacturing consent :!! the political economy of the mass media /!! " +
      "Edward S. Herman and Noam Chomsky ; with a new introduction by the authors."))
  }

  test("returns empty for no matching tags or subfields") {
    assert(MarcExtractor("999abc").extract(consent).isEmpty)
    assert(MarcExtractor("999").extract(consent).isEmpty)
    assert(MarcExtractor("245xyz").extract(consent).isEmpty)
  }

  test("collect_matching_lines analog") {
    val ex = MarcExtractor("245abc")
    val results = ex.collectMatchingLines(consent)((f, s) => ex.collectSubfields(f, s))
    assert(results == Vector("Manufacturing consent : the political economy of the mass media / " +
      "Edward S. Herman and Noam Chomsky ; with a new introduction by the authors."))
  }

  // ---- alternate script (hebrew880s.marc) ---------------------------------

  private lazy val hebrew = Fixtures.first("hebrew880s")

  test("alternate script :include (default) gets original + 880") {
    val values = MarcExtractor("245b").extract(hebrew)
    assert(values == Vector(
      "ben Marṭin Buber le-Aharon Daṿid Gordon /",
      "בין מרטין בובר לאהרן דוד גורדון /"))
  }

  test("alternate script :only gets just the 880") {
    val values = MarcExtractor("245b", Some(" "), AlternateScript.Only).extract(hebrew)
    assert(values == Vector("בין מרטין בובר לאהרן דוד גורדון /"))
  }

  test("alternate script false gets just the original") {
    val values = MarcExtractor("245b", Some(" "), AlternateScript.Exclude).extract(hebrew)
    assert(values == Vector("ben Marṭin Buber le-Aharon Daṿid Gordon /"))
  }

  test("880 with no $6 is ignored for base specs") {
    val rec = Fixtures.first("880_with_no_6.utf8")
    assert(MarcExtractor("001").extract(rec) == Vector("3468569"))
  }

  // ---- subfield join defaults ---------------------------------------------

  test("multi-subfield spec joins per field; single-subfield spec stays separate; doubled code forces join") {
    val rec = MarcRecord("", Vector(
      MarcField.data("020", " ", " ", "a" -> "285197145X", "a" -> "9782851971456"),
      MarcField.data("600", " ", " ", "a" -> "Chomsky, Noam", "x" -> "Philosophy.")))
    assert(MarcExtractor("020a").extract(rec) == Vector("285197145X", "9782851971456"))
    assert(MarcExtractor("020aa").extract(rec) == Vector("285197145X 9782851971456"))
    assert(MarcExtractor("600ax").extract(rec) == Vector("Chomsky, Noam Philosophy."))
  }
}
