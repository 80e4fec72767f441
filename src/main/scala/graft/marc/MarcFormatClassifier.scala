package graft.marc

/** Format/genre classifier — semantics from
  * /root/reference/lib/traject/macros/marc_format_classifier.rb (test-pinned
  * by the reference's marc_format_classifier_test.rb, replicated in our
  * Marc21SemanticsTest).
  */
final class MarcFormatClassifier(record: MarcRecord) {

  private def leaderAt(i: Int): String =
    if (record.leader != null && record.leader.length > i) record.leader.substring(i, i + 1)
    else ""

  /** leader 6+7 via marc_genre_leader, else leader 6, else 007 byte 0 via
    * marc_genre_007 (classifier lines 86-95). */
  def genre: Vector[String] = {
    val leaderMap = TranslationMap.named("marc_genre_leader")
    val map007 = TranslationMap.named("marc_genre_007")
    val two = if (record.leader != null && record.leader.length >= 8)
      record.leader.substring(6, 8) else ""
    leaderMap.lookup(two).map(_.toVector)
      .orElse(leaderMap.lookup(leaderAt(6)).map(_.toVector))
      .getOrElse(record.fields.filter(_.tag == "007")
        // unmapped 007s contribute nil in the reference (kept until output
        // compaction, and their presence suppresses the "Other" default)
        .map(f => map007.lookup(Option(f.value).getOrElse("").take(1))
          .map(_.mkString(" ")).orNull)
        .toVector)
  }

  def genreClean: Vector[String] = genre.filter(_ != null)

  def thesis: Boolean = record.fields.exists(_.tag == "502")

  private val Congresses = """^\s*(C|c)ongresses\.?\s*$""".r
  def proceeding: Boolean = record.fields.exists(f =>
    f.tag.startsWith("6") && f.subfields.exists(sf =>
      sf.code == "v" && Congresses.pattern.matcher(sf.value).find()))

  /** 245$h GMD, downcased; empty when absent (lines 189-193). */
  def normalizedGmd: String =
    record.firstField("245").flatMap(_.subfield("h")).map(_.toLowerCase).getOrElse("")

  def print: Boolean = {
    val rda338 = record.fields.filter(f =>
      f.tag == "338" && f.subfield("2").contains("rdacarrier"))
    if (rda338.nonEmpty)
      rda338.exists(_.subfields.exists(sf =>
        (sf.code == "a" && Set("volume", "card", "sheet").contains(sf.value)) ||
        (sf.code == "b" && Set("nc", "no", "nb").contains(sf.value))))
    else normalizedGmd.isEmpty
  }

  def online: Boolean = {
    val f007s = record.fields.filter(f => f.tag == "007" && f.value != null)
    if (f007s.exists(f => f.value.startsWith("cr"))) true
    else normalizedGmd.startsWith("[electronic resource]") &&
      !f007s.exists(_.value.startsWith("c"))
  }

  def microform: Boolean =
    normalizedGmd.startsWith("[microform]") ||
      leaderAt(6) == "h" ||
      record.fields.exists(f => f.tag == "007" && Option(f.value).exists(_.startsWith("h")))

  def manuscriptArchive: Boolean =
    Set("t", "d", "f", "b").contains(leaderAt(6)) || leaderAt(8) == "a"

  /** The grab-bag vocabulary (classifier lines 44-74): genre + form flags,
    * audio suppresses Print, thesis replaces Book, default "Other". */
  def formats(default: String = "Other"): Vector[String] = {
    var out = genre
    if (manuscriptArchive) out :+= "Manuscript/Archive"
    if (microform) out :+= "Microform"
    if (online) out :+= "Online"
    if (print && !out.contains("Non-musical Recording") && !out.contains("Musical Recording"))
      out :+= "Print"
    if (thesis) {
      out = out.filterNot(_ == "Book")
      out :+= "Dissertation/Thesis"
    }
    if (proceeding) out :+= "Conference"
    if (out.isEmpty) out :+= default
    out.filter(_ != null) // output-hash nil compaction
  }
}

object MarcFormatClassifier {
  def apply(rec: MarcRecord): MarcFormatClassifier = new MarcFormatClassifier(rec)
  def formats(rec: MarcRecord): Vector[String] = new MarcFormatClassifier(rec).formats()
}
