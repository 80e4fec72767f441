package graft.marc

import org.scalatest.funsuite.AnyFunSuite

/** Goldens from the reference's
  * test/indexer/macros/marc21/trim_punctuation_test.rb. */
class TrimPunctuationTest extends AnyFunSuite {
  private def t(s: String) = TrimPunctuation(s)

  test("works as expected (reference golden set)") {
    assert(t("one two three") == "one two three")
    assert(t("one two three,") == "one two three")
    assert(t("one two three/") == "one two three")
    assert(t("one two three;") == "one two three")
    assert(t("one two three:") == "one two three")
    assert(t("one two three .") == "one two three .")
    assert(t("one two three.") == "one two three")
    assert(t("one two three...") == "one two three...")
    assert(t(" one two three.") == "one two three")
    assert(t("one two [three]") == "one two [three]")
    assert(t("one two three]") == "one two three")
    assert(t("[one two three") == "one two three")
    assert(t("[one two three]") == "one two three")
    // "This one was a bug before"
    assert(t("Feminism and art.") == "Feminism and art")
    assert(t("Le réve.") == "Le réve")
    // "This one was a bug on the bug"
    assert(t("Bill Dueber, Jr.") == "Bill Dueber, Jr.")
  }

  test("null passes through") {
    assert(t(null) == null)
  }
}
