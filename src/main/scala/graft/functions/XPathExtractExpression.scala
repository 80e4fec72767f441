package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{XmlDom, XmlWork}

/** `extract_xpath(xml, 'xpath', ns, to_text)` — namespace-aware XPath
  * extraction over an XML string column, with the reference's semantics
  * (/root/reference/lib/traject/macros/nokogiri_macros.rb:13-46):
  *
  *  - every XPath match contributes one accumulator value;
  *  - `toText = true` (default): attribute matches yield their value;
  *    element matches yield all non-blank descendant text joined by single
  *    spaces ("José" + "Lopez" → "José Lopez");
  *  - `toText = false`: matches yield standalone serialized XML (the Spark
  *    representation of "raw Nokogiri nodes"), namespaces re-declared.
  *
  * Spark's built-in Hive-compat `xpath()` family parses namespace-UNaware
  * and cannot express prefix-mapped queries like `//oai:record`; this
  * expression exists for that namespace parity. The XPath is compiled once
  * per thread (not per row); the DOM parse per row is the price of
  * arbitrary-XPath semantics — identical to the reference's per-record
  * Nokogiri documents. For fixed schemas prefer Spark's native XML
  * source/`from_xml`, which stays in codegen.
  */
case class XPathExtractExpression(
    child: Expression,
    xpath: String,
    namespaces: Map[String, String],
    toText: Boolean)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "extract_xpath"

  @transient private lazy val work = new XmlWork(xpath, namespaces)
  // Fast path (r18): simple child paths walk the DOM directly — the
  // javax evaluation copies the whole document into a fresh DTM table
  // per evaluate() call, ~10× the parse cost on small documents (see
  // [[graft.sources.XPathLite]]). None = unsupported shape → javax,
  // identical semantics either way (spec-pinned equivalence).
  @transient private lazy val lite = graft.sources.XPathLite.compile(xpath, namespaces)

  override def evalChild(childValue: AnyRef): AnyRef = {
    val xml = childValue.asInstanceOf[UTF8String]
    if (xml == null) return new GenericArrayData(Array.empty[Any])
    val doc = XmlDom.parse(work.builder, xml.getBytes)
    val nodes = lite match {
      case Some(c) => c.eval(doc)
      case None    => XmlDom.evalNodes(work.compiled, doc)
    }
    val out = nodes.map { n =>
      val s = if (toText) XmlDom.nodeToText(n) else XmlDom.serializeSubtree(n)
      UTF8String.fromString(s): Any
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XPathExtractExpression {
  /** Column form: `extractXpath(col("xml"), "//oai:record/dc:title", ns)`. */
  def extractXpath(xml: Column, xpath: String,
                   ns: Map[String, String] = Map.empty,
                   toText: Boolean = true): Column =
    ColumnBridge.column(XPathExtractExpression(
      ColumnBridge.expression(xml), xpath, ns, toText))
}

/** N XPath extractions over ONE DOM parse — the dominant per-row cost of
  * the XML path is the parse, so a row queried by k xpaths pays k parses
  * as independent expressions but one here. Auto-applied by
  * [[graft.plans.FuseMarcExtracts]] when ≥2 extractions share a child
  * column and namespace map. */
case class XPathExtractBatch(
    child: Expression,
    entries: Seq[(String, Boolean)], // (xpath, toText)
    namespaces: Map[String, String])
  extends UnaryExpression with KernelCodegen {

  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(entries.zipWithIndex.map {
    case (_, i) => StructField(s"x$i", ArrayType(StringType, containsNull = false), nullable = false)
  })
  override def nullable: Boolean = false
  override def prettyName: String = "extract_xpath_batch"

  // Per-entry fast path (r18, see [[graft.sources.XPathLite]]): entries
  // whose xpath fits the simple-child-path grammar walk the DOM
  // directly; the rest keep the javax evaluation (which pays a full
  // document→DTM copy PER evaluate call). Mixed batches are fine — all
  // entries share the one DOM parse either way.
  @transient private lazy val lites =
    entries.map(e => graft.sources.XPathLite.compile(e._1, namespaces)).toArray
  @transient private lazy val local =
    ThreadLocal.withInitial[(javax.xml.parsers.DocumentBuilder, Array[javax.xml.xpath.XPathExpression])] { () =>
      // compile the javax form only for entries the walker rejected —
      // never pay ServiceLoader/compile work the fast path makes dead
      (XmlDom.newDocumentBuilder(),
        entries.zipWithIndex.map { case (e, i) =>
          if (lites(i).isDefined) null
          else XmlDom.compileXPath(e._1, namespaces)
        }.toArray)
    }

  override def evalChild(childValue: AnyRef): AnyRef = {
    val xml = childValue.asInstanceOf[UTF8String]
    val n = entries.length
    val out = new Array[Any](n)
    if (xml == null) {
      var i = 0
      while (i < n) { out(i) = new GenericArrayData(Array.empty[Any]); i += 1 }
    } else {
      val (builder, compiled) = local.get()
      val doc = XmlDom.parse(builder, xml.getBytes)
      var i = 0
      while (i < n) {
        val toText = entries(i)._2
        val nodes = lites(i) match {
          case Some(c) => c.eval(doc)
          case None    => XmlDom.evalNodes(compiled(i), doc)
        }
        val vals = nodes.map { node =>
          val s = if (toText) XmlDom.nodeToText(node) else XmlDom.serializeSubtree(node)
          UTF8String.fromString(s): Any
        }
        out(i) = new GenericArrayData(vals.toArray)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
