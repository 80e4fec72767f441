package graft.marc

import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from the reference's
  * test/indexer/macros/macros_marc21_semantics_test.rb and
  * test/marc_format_classifier_test.rb (assertions cited). */
class Marc21SemanticsTest extends AnyFunSuite {
  import Marc21Semantics._

  private lazy val consent = Fixtures.first("manufacturing_consent")
  // like ruby-marc MARC::Record.new: blank 24-char leader
  private def emptyRecord = MarcRecord(" " * 24,
    Vector(MarcField.control("008", " " * 40)))

  test("oclcnum basic + all prefixed forms") {
    assert(oclcnum(consent) == Vector("47971712"))
    val extra = consent.copy(fields = consent.fields ++ Vector(
      MarcField.data("035", " ", " ", "a" -> "(OCoLC)ocm111111111"),
      MarcField.data("035", " ", " ", "a" -> "(OCoLC)222222222"),
      MarcField.data("035", " ", " ", "a" -> "ocm333333333"),
      MarcField.data("035", " ", " ", "a" -> "ocn444444444"),
      MarcField.data("035", " ", " ", "a" -> "(OCoLC)ocn555555555"),
      MarcField.data("035", " ", " ", "a" -> "(OCoLC)on666666666"),
      MarcField.data("035", " ", " ", "a" -> "777777777")))
    assert(oclcnum(extra) == Vector("47971712", "111111111", "222222222",
      "333333333", "444444444", "555555555", "666666666"))
    assert(oclcnum(emptyRecord).isEmpty)
  }

  test("marc_series_facet") {
    val armstrong = Fixtures.first("louis_armstrong")
    assert(seriesFacet(armstrong) == Vector("Big bands"))
    assert(seriesFacet(emptyRecord).isEmpty)
  }

  test("marc_sortable_author collates author and title") {
    assert(sortableAuthor(consent) ==
      "Herman, Edward S.   Manufacturing consent the political economy of the mass media Edward S. Herman and Noam Chomsky ; with a new introduction by the authors")
    assert(sortableAuthor(emptyRecord) == "")
  }

  test("marc_sortable_author respects non-filing") {
    val ren = Fixtures.first("the_business_ren")
    assert(sortableAuthor(ren) == "Business renaissance quarterly [electronic resource].")
  }

  test("marc_sortable_title") {
    assert(sortableTitle(consent).contains(
      "Manufacturing consent : the political economy of the mass media"))
    assert(sortableTitle(Fixtures.first("the_business_ren")).contains(
      "Business renaissance quarterly"))
    assert(sortableTitle(Fixtures.first("245_no_ab")).contains("Papers"))
  }

  test("marc_languages unpacks packed 041a and translates") {
    val packed = Fixtures.first("packed_041a_lang")
    assert(languages(packed) ==
      Vector("English", "French", "German", "Italian", "Spanish", "Russian"))
    assert(languages(emptyRecord).isEmpty)
  }

  test("marc_languages handles ISO 639-3 codes") {
    val iso = Fixtures.first("iso639-3_lang")
    assert(languages(iso) == Vector("Norwegian", "English", "Norwegian (Bokmål)"))
  }

  test("marc_instrumentation_humanized translates and dedups") {
    val cage = Fixtures.first("musical_cage")
    assert(instrumentationHumanized(cage).filter(_ != null) ==
      Vector("Larger ensemble, Unspecified", "Piano", "Soprano voice",
        "Tenor voice", "Violin", "Larger ensemble, Ethnic", "Guitar",
        "Voices, Unspecified"))
  }

  test("marc_instrument_codes_normalized") {
    val cage = Fixtures.first("musical_cage")
    assert(instrumentCodesNormalized(cage) ==
      Vector("on", "ka01", "ka", "va01", "va", "vd01", "vd", "sa01", "sa",
        "oy", "tb01", "tb", "vn12", "vn"))
  }

  test("marc_instrument_codes_normalized codes soloist 048$b") {
    val rec = MarcRecord("", Vector(
      MarcField.data("048", " ", " ", "b" -> "bb01", "a" -> "oe")))
    assert(instrumentCodesNormalized(rec) ==
      Vector("bb01", "bb01.s", "bb", "bb.s", "oe"))
  }

  test("publication_date state machine (all reference fixture branches)") {
    assert(publicationDate(consent).contains(2002)) // 008 date_type s
    assert(publicationDate(emptyRecord).isEmpty)
    assert(publicationDate(Fixtures.first("date_with_u")).contains(1845)) // 19u5-ish estimate
    assert(publicationDate(Fixtures.first("date_resort_to_264")).contains(2015))
    assert(publicationDate(Fixtures.first("date_resort_to_260")).contains(1980))
    assert(publicationDate(Fixtures.first("date_type_r_missing_date2")).contains(1957))
    assert(publicationDate(Fixtures.first("missing-second-date")).contains(1678))
  }

  test("publication_date date_type q uses range midpoint within tolerance") {
    def qRec(d1: String, d2: String) = MarcRecord("00000cam a2200000 a 4500",
      Vector(MarcField.control("008", "      q" + d1 + d2 + (" " * 25))))
    assert(publicationDate(qRec("1910", "1928"), estimateTolerance = 20).contains(1919))
    assert(publicationDate(qRec("1910", "1920")).contains(1915))
    // outside tolerance → no date from 008, nothing else → None
    assert(publicationDate(qRec("1910", "1980")).isEmpty)
  }

  test("marc_lcc_to_broad_category") {
    assert(lccBroadCategory(consent) == Vector("Language & Literature"))
    assert(lccBroadCategory(emptyRecord) == Vector("Unknown"))
    assert(lccBroadCategory(emptyRecord, default = None).isEmpty)
    // LCC_REGEX rejects a non-LCC
    assert(LccRegex.pattern.matcher("Video record 123").matches() === false)
    assert(LccRegex.pattern.matcher("PR124.5 .B4").matches())
  }

  test("marc_geo_facet maps a complicated record") {
    val geo = Fixtures.first("multi_geo")
    assert(geoFacet(geo) == Vector("Europe", "Middle East", "Africa, North",
      "Agora (Athens, Greece)", "Rome (Italy)", "Italy"))
    assert(geoFacet(emptyRecord).isEmpty)
  }

  test("marc_era_facet maps a complicated record") {
    val era = Fixtures.first("multi_era")
    assert(eraFacet(era) == Vector("Early modern, 1500-1700", "17th century",
      "Great Britain: Puritan Revolution, 1642-1660",
      "Great Britain: Civil War, 1642-1649", "1642-1660"))
  }

  test("assemble_lcsh formatting") {
    assert(assembleLcsh(MarcField.data("650", " ", " ",
      "a" -> "Psychoanalysis and literature", "z" -> "England",
      "x" -> "History", "y" -> "19th century.")).contains(
      "Psychoanalysis and literature — England — History — 19th century"))
    assert(assembleLcsh(MarcField.data("650", " ", " ",
      "a" -> "Psychoanalysis and literature", "x" -> "History",
      "0" -> "01234", "3" -> "Some part")).contains(
      "Psychoanalysis and literature — History"))
    assert(assembleLcsh(MarcField.data("600", " ", " ",
      "a" -> "Eliot, George,", "d" -> "1819-1880.", "t" -> "Middlemarch")).contains(
      "Eliot, George, 1819-1880. Middlemarch"))
    assert(assembleLcsh(MarcField.data("600", " ", " ",
      "a" -> "Eliot, George,", "d" -> "1819-1880.", "t" -> "Middlemarch",
      "x" -> "Criticism.")).contains(
      "Eliot, George, 1819-1880. Middlemarch — Criticism"))
    assert(assembleLcsh(MarcField.data("650", " ", " ")).isEmpty)
  }

  test("marc_lcsh_formatted smoke over george_eliot") {
    val eliot = Fixtures.first("george_eliot")
    val out = lcshFormatted(eliot)
    assert(out.nonEmpty)
    assert(out.contains("Eliot, George, 1819-1880 — Characters"))
  }

  test("extract_marc_filing_version") {
    val ren = Fixtures.first("the_business_ren")
    assert(extractFilingVersion(ren, "245ab") == Vector("Business renaissance quarterly"))
    assert(extractFilingVersion(ren, "245ab", includeOriginal = true) ==
      Vector("The Business renaissance quarterly", "Business renaissance quarterly"))
    // first-subfield quirk: spec not covering the field's first subfield → unchanged
    assert(extractFilingVersion(ren, "245h") == Vector("[electronic resource]."))
  }

  // ---- format classifier (marc_format_classifier_test.rb) ----------------

  private def classifier(name: String) = MarcFormatClassifier(Fixtures.first(name))

  test("genre") {
    assert(classifier("manufacturing_consent").genreClean == Vector("Book"))
    assert(classifier("microform_online_conference").genreClean == Vector("Book"))
    assert(classifier("musical_cage").genreClean == Vector("Musical Recording"))
    assert(classifier("the_business_ren").genreClean == Vector("Journal/Newspaper"))
  }

  test("print? / online? / microform? / thesis? / proceeding? / manuscript?") {
    assert(classifier("manufacturing_consent").print)
    assert(!classifier("online_only").print)
    assert(classifier("online_only").online)
    assert(classifier("microform_online_conference").online)
    assert(classifier("manuscript_online_thesis").online)
    assert(!classifier("manufacturing_consent").online)
    assert(classifier("microform_online_conference").microform)
    assert(!classifier("manufacturing_consent").microform)
    assert(!classifier("online_only").microform)
    assert(classifier("nature").microform) // 007-carried microform
    assert(classifier("microform_online_conference").proceeding)
    assert(!classifier("manufacturing_consent").proceeding)
    assert(classifier("manuscript_online_thesis").thesis)
    assert(!classifier("manufacturing_consent").thesis)
    assert(classifier("manuscript_online_thesis").manuscriptArchive)
  }

  test("formats returns Print for an empty-ish record") {
    assert(MarcFormatClassifier(emptyRecord).formats() == Vector("Print"))
  }
}
