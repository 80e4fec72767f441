package graft.marc

/** How to treat 880 alternate-script fields linked via $6
  * (/root/reference/lib/traject/marc_extractor.rb:130-158). */
sealed trait AlternateScript extends Serializable
object AlternateScript {
  case object Include extends AlternateScript // default: base fields + linked 880s
  case object Exclude extends AlternateScript // base fields only
  case object Only    extends AlternateScript // linked 880s only
}

/** Compiled, immutable extractor: spec set + options, applied per record.
  *
  * Semantics mirror /root/reference/lib/traject/marc_extractor.rb:205-270:
  * fields are visited in record order, restricted to the "interesting" tag
  * set (the pre-filter at marc_extractor.rb:143-158); each field is paired
  * with every covering spec in spec order; control fields yield a byte slice
  * (null if out of range — dropped later at output normalization, matching
  * the reference where nils survive until Context#add_output), data fields
  * yield matched subfield values, joined per spec.joinable.
  *
  * Construction is plan-time (the reference's `cached` hotspot mitigation,
  * marc_extractor.rb:182-202, is moot here — the extractor is compiled once
  * into the query plan / closure, never per record).
  */
final case class MarcExtractor(
    specSet: SpecSet,
    separator: Option[String] = Some(" "),
    alternateScript: AlternateScript = AlternateScript.Include) extends Serializable {

  private val fetchAlternateScript: Boolean = alternateScript != AlternateScript.Exclude

  private val interestingTags: Set[String] = {
    val base = if (alternateScript == AlternateScript.Only) Set.empty[String] else specSet.tags
    if (fetchAlternateScript) base + SpecSet.AlternateScriptTag else base
  }

  def interesting(tag: String): Boolean = interestingTags.contains(tag)

  /** All (field, spec) matches in record order — the `each_matching_line`
    * surface (marc_extractor.rb:227-235) used by custom macros. */
  def matchingLines(rec: MarcRecord): Seq[(MarcField, MarcSpec)] =
    for {
      field <- rec.fields if interesting(field.tag)
      spec <- specSet.specsMatchingField(field, fetchAlternateScript)
    } yield (field, spec)

  /** collect_matching_lines analog: map each matching (field, spec) pair and
    * flatten (marc_extractor.rb:243-249). */
  def collectMatchingLines[A](rec: MarcRecord)(f: (MarcField, MarcSpec) => Seq[A]): Vector[A] =
    matchingLines(rec).iterator.flatMap { case (fld, spec) => f(fld, spec) }.toVector

  /** Extracted values; may contain nulls (out-of-range byte slices) which are
    * compacted at output-normalization time like the reference. */
  def extract(rec: MarcRecord): Vector[String] =
    matchingLines(rec).iterator.flatMap { case (field, spec) =>
      if (field.isControl)
        Seq(if (spec.hasByteSlice) spec.byteSlice(field.value).orNull else field.value)
      else collectSubfields(field, spec)
    }.toVector

  /** marc_extractor.rb:258-270: filter subfields by spec, join when joinable
    * and a separator is configured. */
  def collectSubfields(field: MarcField, spec: MarcSpec): Seq[String] = {
    val vals = field.subfields.collect {
      case Subfield(code, v) if spec.includesSubfieldCode(code) => v
    }
    if (vals.isEmpty) vals
    else separator match {
      case Some(sep) if spec.joinable => Seq(vals.mkString(sep))
      case _ => vals
    }
  }
}

object MarcExtractor {
  def apply(spec: String): MarcExtractor = cached(spec)

  def apply(spec: String, separator: Option[String],
            alternateScript: AlternateScript): MarcExtractor =
    cached(spec, separator, alternateScript)

  /** Spec-parse + tag-set precompute once per (spec, options) per JVM — the
    * reference's MarcExtractor.cached (marc_extractor.rb:182-202), which its
    * profiling showed to be THE hotspot when constructed per record. All
    * row-level semantic functions route through this. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Option[String], AlternateScript), MarcExtractor]()

  def cached(spec: String, separator: Option[String] = Some(" "),
             alternateScript: AlternateScript = AlternateScript.Include): MarcExtractor =
    cache.computeIfAbsent((spec, separator, alternateScript),
      k => MarcExtractor(MarcSpec.parse(k._1), k._2, k._3))
}

/** Row-level `extract_marc` with its post-options, applied in the reference's
  * order: first → translation_map → trim_punctuation → dedup (ON by default)
  * → default (/root/reference/lib/traject/macros/marc21.rb:115-140). */
object ExtractMarc {
  final case class Options(
      first: Boolean = false,
      translationMap: Option[TranslationMap] = None,
      trimPunctuation: Boolean = false,
      default: Option[String] = None,
      allowDuplicates: Boolean = false,
      separator: Option[String] = Some(" "),
      alternateScript: AlternateScript = AlternateScript.Include)

  def compile(spec: String, opts: Options = Options()): MarcRecord => Vector[String] = {
    val extractor = MarcExtractor.cached(spec, opts.separator, opts.alternateScript)
    rec => postProcess(extractor.extract(rec), opts)
  }

  def postProcess(extracted: Vector[String], opts: Options): Vector[String] = {
    var acc = extracted
    if (opts.first) acc = acc.take(1).filter(_ != null) // Array(acc[0]) drops a nil head
    for (tm <- opts.translationMap) acc = tm.translateArray(acc)
    if (opts.trimPunctuation) acc = acc.map(TrimPunctuation.apply)
    if (!opts.allowDuplicates) acc = acc.distinct
    if (acc.isEmpty) acc = opts.default.map(Vector(_)).getOrElse(acc)
    acc
  }
}

/** AACR2 punctuation-trimming heuristic; semantics from
  * /root/reference/lib/traject/macros/marc21.rb:252-271 (golden cases in
  * test/indexer/macros/marc21/trim_punctuation_test.rb).
  *
  * Implemented with direct char scans from the string's end instead of the
  * original three `\z`-anchored regex replaceFirsts: regex leftmost-match
  * search probes every position of the subject, which made this THE
  * hottest function of the whole mapping pipeline (it runs on every
  * extracted subfield). The scans preserve the regex semantics exactly —
  * [[TrimPunctuationSpecOracle]] keeps the original regex formulation and
  * a property test pins equivalence. */
object TrimPunctuation {

  /** `[[:word:]]` in ruby = Letter | Mark | Decimal_Number |
    * Connector_Punctuation; code-point-aware like the regex engine. */
  @inline private def isWordCp(cp: Int): Boolean = {
    val t = Character.getType(cp)
    Character.isLetter(cp) ||
      t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK || t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.CONNECTOR_PUNCTUATION
  }

  def apply(s: String): String = {
    if (s == null) return null
    // step 1: """ *[ ,/;:] *\z""" → "" — strip trailing spaces; if the
    // char before them is , / ; or : strip it and its preceding spaces too
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == ' ') end -= 1
    // (trailing spaces alone already satisfy the class — they are removed)
    if (end > 0) {
      val c = s.charAt(end - 1)
      if (c == ',' || c == '/' || c == ';' || c == ':') {
        end -= 1
        while (end > 0 && s.charAt(end - 1) == ' ') end -= 1
      }
    }
    // step 2: """( *[[:word:]]{3,})\. *\z""" → "$1" — a period ending a
    // ≥3-word-char run (after optional spaces, which group 1 keeps) drops
    var str = if (end == s.length) s else s.substring(0, end)
    if (str.nonEmpty && str.charAt(str.length - 1) == '.') {
      var k = str.length - 1
      var words = 0
      var cont = true
      while (cont && k > 0) {
        val cp = Character.codePointBefore(str, k)
        if (isWordCp(cp)) { k -= Character.charCount(cp); words += 1 }
        else cont = false
      }
      if (words >= 3) str = str.substring(0, str.length - 1)
    }
    // step 3: """\A\[?([^\[\]]+)\]?\z""" → "$1" — strip one balanced-ish
    // layer of brackets when the interior has none
    if (str.nonEmpty) {
      val hasL = str.charAt(0) == '['
      val hasR = str.charAt(str.length - 1) == ']'
      if (hasL || hasR) {
        val from = if (hasL) 1 else 0
        val until = if (hasR) str.length - 1 else str.length
        if (until > from) {
          var i = from
          var clean = true
          while (clean && i < until) {
            val c = str.charAt(i)
            if (c == '[' || c == ']') clean = false
            i += 1
          }
          if (clean) str = str.substring(from, until)
        }
      }
    }
    str.trim
  }
}

/** The original regex formulation of [[TrimPunctuation]], kept as the
  * equivalence oracle for its property test (marc21.rb:252-271). */
private[marc] object TrimPunctuationSpecOracle {
  private val word = """[\p{L}\p{M}\p{Nd}\p{Pc}]"""
  private val trailing = """ *[ ,/;:] *\z""".r
  private val trailingPeriod = ("""( *""" + word + """{3,})\. *\z""").r
  private val brackets = """\A\[?([^\[\]]+)\]?\z""".r

  def apply(s: String): String = {
    if (s == null) return null
    var str = trailing.replaceFirstIn(s, "")
    str = trailingPeriod.replaceFirstIn(str, "$1")
    str = brackets.replaceFirstIn(str, "$1")
    str.trim
  }
}
