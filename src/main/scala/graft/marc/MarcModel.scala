package graft.marc

/** MARC data model (SURVEY.md §1.1).
  *
  * Mirrors the structure consumed by the reference's extractor
  * (/root/reference/lib/traject/marc_extractor.rb:206-218,258-270): a record
  * is a 24-byte leader plus ordered fields; control fields (conventionally
  * tag < "010") carry a flat `value`, data fields carry two 1-char indicators
  * and repeated (code, value) subfields.
  *
  * Spark schema (via ExpressionEncoder):
  * struct<leader:string, fields:array<struct<tag:string, ind1:string,
  * ind2:string, value:string, subfields:array<struct<code:string,value:string>>>>>
  */
final case class Subfield(code: String, value: String)

final case class MarcField(
    tag: String,
    ind1: String,
    ind2: String,
    value: String,               // non-null ⇔ control field
    subfields: Seq[Subfield]) {

  def isControl: Boolean = value != null

  /** First subfield with the given code, like ruby-marc `field['6']`. */
  def subfield(code: String): Option[String] =
    subfields.collectFirst { case Subfield(`code`, v) => v }

  def subfieldValues: Seq[String] = subfields.map(_.value)
}

object MarcField {
  def control(tag: String, value: String): MarcField =
    MarcField(tag, null, null, value, Nil)

  def data(tag: String, ind1: String, ind2: String, subfields: (String, String)*): MarcField =
    MarcField(tag, ind1, ind2, null, subfields.map { case (c, v) => Subfield(c, v) })
}

final case class MarcRecord(leader: String, fields: Seq[MarcField]) {
  /** Fields in record order whose tag is in `tags` — matches ruby-marc
    * `record.fields(array)` which yields document order regardless of the
    * filter array's order. */
  def fieldsWithTags(tags: Set[String]): Seq[MarcField] =
    fields.filter(f => tags.contains(f.tag))

  def firstField(tag: String): Option[MarcField] = fields.find(_.tag == tag)
}
