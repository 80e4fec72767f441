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

  test("char-scan implementation matches the original regex formulation") {
    // adversarial alphabet: punctuation classes, brackets, periods, spaces,
    // multi-byte letters, combining marks, connector punctuation, and a
    // supplementary-plane letter (surrogate pair)
    val pool: Array[String] = Array(
      "a", "b", "é", "中", "ʼ", "_", "9", "́", " ", "  ", ",", "/", ";",
      ":", ".", "..", "[", "]", "[]", "(", "\t", "𐐷", "Jr.", "art")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20000) {
      val s = Seq.fill(rnd.nextInt(8))(pool(rnd.nextInt(pool.length))).mkString
      assert(TrimPunctuation(s) == TrimPunctuationSpecOracle(s),
        s"mismatch for input ${s.map(_.toInt.toHexString).mkString("[", " ", "]")}")
    }
  }
}
