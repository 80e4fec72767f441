package graft.marc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** marc-in-json codec (the NDJ serialization the reference reads/writes:
  * /root/reference/lib/traject/ndj_reader.rb:31, lib/traject/marc_reader.rb:66-73).
  *
  * Record shape: {"leader": "...", "fields": [{"001": "value"},
  * {"245": {"ind1":"1","ind2":"0","subfields":[{"a":"..."}, ...]}}, ...]}
  * — a field object has exactly one key (the tag); a string value means a
  * control field, an object means a data field.
  */
object MarcJson {

  // ObjectMapper is thread-safe after configuration; one per JVM.
  @transient private lazy val mapper = new ObjectMapper()

  def parse(line: String): MarcRecord = {
    val root = mapper.readTree(line)
    val leader = Option(root.get("leader")).map(_.asText()).orNull
    val fields = Option(root.get("fields")).map(_.elements().asScala.flatMap(parseField).toVector)
      .getOrElse(Vector.empty)
    MarcRecord(leader, fields)
  }

  /** Lenient parse: None on malformed JSON (NDJReader logs+skips bad lines,
    * ndj_reader.rb:30-36). */
  def parseOption(line: String): Option[MarcRecord] =
    try Some(parse(line)) catch { case _: Exception => None }

  private def parseField(fieldObj: JsonNode): Option[MarcField] = {
    val it = fieldObj.fields()
    if (!it.hasNext) return None
    val entry = it.next()
    val tag = entry.getKey
    val body = entry.getValue
    if (body.isTextual) Some(MarcField.control(tag, body.asText()))
    else {
      val subfields = Option(body.get("subfields")).map(_.elements().asScala.flatMap { sf =>
        val sit = sf.fields()
        if (sit.hasNext) { val e = sit.next(); Some(Subfield(e.getKey, e.getValue.asText())) }
        else None
      }.toVector).getOrElse(Vector.empty)
      Some(MarcField(
        tag,
        Option(body.get("ind1")).map(_.asText()).getOrElse(" "),
        Option(body.get("ind2")).map(_.asText()).getOrElse(" "),
        null,
        subfields))
    }
  }

  def write(rec: MarcRecord): String = {
    val root = mapper.createObjectNode()
    if (rec.leader != null) root.put("leader", rec.leader)
    val fields = root.putArray("fields")
    rec.fields.foreach { f =>
      val obj = fields.addObject()
      if (f.isControl) obj.put(f.tag, f.value)
      else {
        val body = obj.putObject(f.tag)
        body.put("ind1", Option(f.ind1).getOrElse(" "))
        body.put("ind2", Option(f.ind2).getOrElse(" "))
        val sfs = body.putArray("subfields")
        f.subfields.foreach { sf => sfs.addObject().put(sf.code, sf.value) }
      }
    }
    mapper.writeValueAsString(root)
  }
}
