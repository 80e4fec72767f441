package graft.sources

import graft.marc.MarcRecord

/** MARCXML serializer (the FastXMLWriter analog used by
  * serialized_marc(:xml), /root/reference/lib/traject/macros/marc21.rb:191-192).
  * Standard MARCXML namespace layout; values XML-escaped. */
object MarcXmlWriter {

  private def esc(s: String): String = {
    if (s == null) return ""
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def encode(rec: MarcRecord, includeNamespace: Boolean = true): String = {
    val sb = new StringBuilder(1024)
    val ns = if (includeNamespace) """ xmlns="http://www.loc.gov/MARC21/slim"""" else ""
    sb.append(s"<record$ns>")
    if (rec.leader != null) sb.append("<leader>").append(esc(rec.leader)).append("</leader>")
    rec.fields.foreach { f =>
      if (f.isControl) {
        sb.append(s"""<controlfield tag="${esc(f.tag)}">""")
          .append(esc(f.value)).append("</controlfield>")
      } else {
        sb.append(s"""<datafield tag="${esc(f.tag)}" ind1="${esc(Option(f.ind1).getOrElse(" "))}" ind2="${esc(Option(f.ind2).getOrElse(" "))}">""")
        f.subfields.foreach { sf =>
          sb.append(s"""<subfield code="${esc(sf.code)}">""")
            .append(esc(sf.value)).append("</subfield>")
        }
        sb.append("</datafield>")
      }
    }
    sb.append("</record>")
    sb.toString
  }

  def collection(records: Seq[MarcRecord]): String =
    """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<collection xmlns="http://www.loc.gov/MARC21/slim">""" +
      records.map(encode(_, includeNamespace = false)).mkString +
      "</collection>"
}
