package graft.marc

/** One extraction specification for a single MARC tag — the compiled form of
  * spec-string parts like "245|1*|abc" or "008[35-37]".
  *
  * Grammar and matching semantics follow the reference
  * (/root/reference/lib/traject/marc_extractor_spec.rb:165-198 for the
  * grammar, 85-134 for joinable/indicator/subfield matching):
  *  - datafield: `{tag}{|ind1 ind2|}{subfields}`; `*` indicator = don't care,
  *    space = must be blank; no subfields listed = include all;
  *  - controlfield: `{tag}[b]` or `{tag}[b1-b2]` — *byte* slice, inclusive;
  *  - a spec with exactly one subfield yields one value per subfield
  *    occurrence; any other spec joins a field's matched subfields into one
  *    string (doubling a code, "020aa", forces the join).
  */
final case class MarcSpec(
    tag: String,
    ind1: Option[String],
    ind2: Option[String],
    subfields: Option[Vector[String]],   // None = all subfields
    byte1: Option[Int],
    byte2: Option[Int]) {

  def hasByteSlice: Boolean = byte1.isDefined

  /** '630' or '630abc' ⇒ join; '633a' ⇒ keep separate; '633aa' ⇒ join. */
  def joinable: Boolean = subfields.forall(_.size != 1)

  def matchesIndicators(f: MarcField): Boolean =
    ind1.forall(_ == Option(f.ind1).getOrElse("")) &&
      ind2.forall(_ == Option(f.ind2).getOrElse(""))

  def includesSubfieldCode(code: String): Boolean =
    subfields.forall(_.contains(code))

  /** Ruby String#byteslice semantics on the UTF-8 bytes: single byte → one
    * byte (None if out of range); range → truncated at end, None if the
    * start is past the end. */
  def byteSlice(value: String): Option[String] = byte1 match {
    case None => Some(value)
    case Some(b1) =>
      val bytes = value.getBytes("UTF-8")
      if (b1 >= bytes.length || b1 < 0) None
      else byte2 match {
        case None => Some(new String(bytes, b1, 1, "UTF-8"))
        case Some(b2) =>
          val end = math.min(b2, bytes.length - 1)
          if (end < b1) Some("")
          else Some(new String(bytes, b1, end - b1 + 1, "UTF-8"))
      }
  }
}

object MarcSpec {
  // Same grammar as the reference's DATAFIELD_PATTERN / CONTROLFIELD_PATTERN
  // (/root/reference/lib/traject/marc_extractor_spec.rb:165-166).
  private val DataFieldPattern =
    """\A([a-zA-Z0-9]{3})(\|([a-z0-9 *])([a-z0-9 *])\|)?([a-z0-9]*)?\z""".r
  private val ControlFieldPattern =
    """\A([a-zA-Z0-9]{3})(\[(\d+)(-(\d+))?\])\z""".r

  def parsePart(part: String): MarcSpec = part match {
    case DataFieldPattern(tag, _, i1, i2, sf) =>
      MarcSpec(
        tag = tag,
        ind1 = Option(i1).filter(_ != "*"),
        ind2 = Option(i2).filter(_ != "*"),
        subfields = Option(sf).filter(_.nonEmpty).map(_.split("").toVector),
        byte1 = None, byte2 = None)
    case ControlFieldPattern(tag, _, b1, _, b2) =>
      MarcSpec(tag, None, None, None, Some(b1.toInt), Option(b2).map(_.toInt))
    case _ =>
      throw new IllegalArgumentException(s"Unrecognized marc extract specification: $part")
  }

  /** Parse a colon-separated spec string into per-tag ordered spec lists. */
  def parse(spec: String): SpecSet = parse(Seq(spec))

  def parse(specs: Seq[String]): SpecSet = {
    val parts = specs.flatMap(_.split("""\s*:\s*""")).filter(_.nonEmpty)
    // plain Map (serializable, unlike VectorMap); extraction order is
    // record order + per-tag spec order, so tag-key order is irrelevant
    val byTag = parts.map(parsePart).foldLeft(Map.empty[String, Vector[MarcSpec]]) {
      (acc, s) => acc.updated(s.tag, acc.getOrElse(s.tag, Vector.empty) :+ s)
    }
    new SpecSet(byTag)
  }
}

/** Tag-keyed set of specs; resolves which specs cover a concrete field,
  * including the 880 alternate-script linkage: an 880 field carrying
  * `$6 <tag>-<occurrence>` is matched by specs for `<tag>`
  * (/root/reference/lib/traject/marc_extractor_spec.rb:51-67). */
final class SpecSet(val byTag: Map[String, Vector[MarcSpec]]) extends Serializable {
  val tags: Set[String] = byTag.keySet

  def specsForTag(tag: String): Vector[MarcSpec] =
    byTag.getOrElse(tag, Vector.empty)

  def specsMatchingField(field: MarcField, useAlternateScript: Boolean): Vector[MarcSpec] = {
    val effective =
      if (useAlternateScript && field.tag == SpecSet.AlternateScriptTag) effectiveTag(field)
      else field.tag
    specsForTag(effective).filter(_.matchesIndicators(field))
  }

  /** 880's base tag = first 3 bytes of its $6; an 880 with no $6 can only be
    * matched by a literal "880" spec. */
  def effectiveTag(field: MarcField): String =
    field.subfield(SpecSet.Subfield6) match {
      case Some(six) =>
        val b = six.getBytes("UTF-8")
        new String(b, 0, math.min(3, b.length), "UTF-8")
      case None => SpecSet.AlternateScriptTag
    }
}

object SpecSet {
  val AlternateScriptTag = "880"
  val Subfield6 = "6"
}
