package graft.sources

import java.io.ByteArrayInputStream
import java.io.StringWriter
import javax.xml.XMLConstants
import javax.xml.namespace.NamespaceContext
import javax.xml.parsers.{DocumentBuilder, DocumentBuilderFactory}
import javax.xml.transform.{OutputKeys, TransformerFactory}
import javax.xml.transform.dom.DOMSource
import javax.xml.transform.stream.StreamResult
import javax.xml.xpath.{XPathConstants, XPathExpression, XPathFactory}

import org.w3c.dom.{Attr, Document, Node, NodeList}

/** Shared namespace-aware DOM plumbing for the generic-XML path — the JVM
  * equivalent of the reference's Nokogiri usage
  * (/root/reference/lib/traject/nokogiri_reader.rb:94-125,
  * lib/traject/macros/nokogiri_macros.rb:20-45).
  *
  * All JAXP objects (DocumentBuilder, XPathExpression, Transformer) are NOT
  * thread-safe; callers hold them in ThreadLocals (see [[XmlWork]]).
  *
  * Divergence from the reference, documented: the JVM parser is always
  * strict (`nokogiri.strict_mode` semantics); libxml2's lenient best-guess
  * recovery has no JAXP equivalent. Malformed XML raises, as the reference
  * does in strict mode.
  */
object XmlDom {

  // JAXP `*Factory.newInstance()` is a ServiceLoader classpath scan under
  // a classloader lock: 32 executor threads initializing their per-thread
  // builders at the start of a parse stage convoy on it (a fresh query
  // construction re-initializes every thread-local). One configured
  // factory per JVM; instance creation off it is cheap and guarded by a
  // short lock (JAXP factories are not thread-safe by contract).
  private lazy val builderFactory: DocumentBuilderFactory = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f
  }
  private lazy val xpathFactory: XPathFactory = XPathFactory.newInstance()

  /** Namespace-aware builder with DTD loading off (no network/entity I/O in
    * executors) and secure processing on. */
  def newDocumentBuilder(): DocumentBuilder =
    builderFactory.synchronized { builderFactory.newDocumentBuilder() }

  /** XPath-1.0 namespace context over a prefix→URI map. Unknown prefixes
    * raise, matching Nokogiri's undefined-prefix XPath error. */
  def namespaceContext(ns: Map[String, String]): NamespaceContext = new NamespaceContext {
    override def getNamespaceURI(prefix: String): String = prefix match {
      case XMLConstants.XML_NS_PREFIX   => XMLConstants.XML_NS_URI
      case XMLConstants.XMLNS_ATTRIBUTE => XMLConstants.XMLNS_ATTRIBUTE_NS_URI
      case p if ns.contains(p)          => ns(p)
      case "" => XMLConstants.NULL_NS_URI // unprefixed = no-namespace (XPath 1.0)
      case p =>
        throw new IllegalArgumentException(
          s"Can't find namespace prefix '$p' in registered namespaces: $ns")
    }
    override def getPrefix(uri: String): String =
      ns.collectFirst { case (p, u) if u == uri => p }.orNull
    override def getPrefixes(uri: String): java.util.Iterator[String] =
      ns.collect { case (p, u) if u == uri => p }.iterator match {
        case it => new java.util.Iterator[String] {
          override def hasNext: Boolean = it.hasNext
          override def next(): String = it.next()
        }
      }
  }

  def compileXPath(expr: String, ns: Map[String, String]): XPathExpression = {
    val xp = xpathFactory.synchronized { xpathFactory.newXPath() }
    xp.setNamespaceContext(namespaceContext(ns))
    xp.compile(expr)
  }

  /** Upfront prefix validation for reader-level xpaths, with the reference's
    * error contract (nokogiri_reader.rb:153-169). */
  def validateXpathPrefixes(xpath: String, ns: Map[String, String], keyName: String): Unit =
    xpath.split('/').foreach { component =>
      val name = component.takeWhile(c => c != '[' && c != '@')
      name.split(':') match {
        case Array(prefix, _) if prefix.nonEmpty && !ns.contains(prefix) =>
          throw new IllegalArgumentException(
            s"$keyName: Can't find namespace prefix '$prefix' in '$xpath'. To use a " +
              s"namespace it has to be registered with xml.namespaces: $ns")
        case _ => ()
      }
    }

  def parse(builder: DocumentBuilder, bytes: Array[Byte]): Document =
    builder.parse(new ByteArrayInputStream(bytes))

  def evalNodes(compiled: XPathExpression, context: AnyRef): Seq[Node] = {
    val nl = compiled.evaluate(context, XPathConstants.NODESET).asInstanceOf[NodeList]
    (0 until nl.getLength).map(nl.item)
  }

  /** `to_text: true` semantics (nokogiri_macros.rb:28-38): attribute nodes
    * yield their value; element nodes yield all descendant text nodes that
    * are not entirely whitespace, joined with single spaces. */
  def nodeToText(node: Node): String = node match {
    case a: Attr => a.getValue
    case n =>
      val sb = new java.lang.StringBuilder
      collectText(n, sb)
      sb.toString
  }

  private def collectText(node: Node, sb: java.lang.StringBuilder): Unit = {
    var child = node.getFirstChild
    while (child != null) {
      child.getNodeType match {
        case Node.TEXT_NODE | Node.CDATA_SECTION_NODE =>
          val t = child.getNodeValue
          if (t != null && !isAllWhitespace(t)) {
            if (sb.length > 0) sb.append(' ')
            sb.append(t)
          }
        case _ => collectText(child, sb)
      }
      child = child.getNextSibling
    }
  }

  private def isAllWhitespace(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (!Character.isWhitespace(s.charAt(i))) return false
      i += 1
    }
    true
  }

  /** Serialize a node subtree to standalone XML with namespace fixup: the
    * extracted element becomes the root of a fresh document and in-scope
    * namespaces *used by the subtree* are re-declared on it — the same
    * reconciliation libxml2 does when the reference re-roots a matched node
    * (nokogiri_reader.rb:102-114: unused outer declarations drop, used ones
    * are preserved). */
  def serializeSubtree(node: Node): String = node match {
    case d: Document => serialize(d)
    case a: Attr     => a.getValue
    case el =>
      val doc = newDocumentBuilder().newDocument()
      val imported = doc.importNode(el, true)
      doc.appendChild(imported)
      declareInScopeNamespaces(el, imported)
      serialize(doc)
  }

  /** Copy ancestor xmlns declarations that the subtree actually uses onto
    * the new root (skipping any the subtree redeclares itself). */
  private def declareInScopeNamespaces(original: Node, newRoot: Node): Unit = {
    val used = scala.collection.mutable.LinkedHashSet.empty[String] // URIs used by subtree
    collectUsedNamespaces(original, used)
    val declared = scala.collection.mutable.Map.empty[String, String] // prefix -> uri (innermost wins)
    var anc: Node = original
    while (anc != null && anc.getNodeType == Node.ELEMENT_NODE) {
      val attrs = anc.getAttributes
      var i = 0
      while (attrs != null && i < attrs.getLength) {
        val a = attrs.item(i).asInstanceOf[Attr]
        val name = a.getName
        if (name == "xmlns" || name.startsWith("xmlns:")) {
          val prefix = if (name == "xmlns") "" else name.substring(6)
          if (!declared.contains(prefix)) declared(prefix) = a.getValue
        }
        i += 1
      }
      anc = anc.getParentNode
    }
    val root = newRoot.asInstanceOf[org.w3c.dom.Element]
    declared.foreach { case (prefix, uri) =>
      if (used.contains(uri)) {
        val qname = if (prefix.isEmpty) "xmlns" else s"xmlns:$prefix"
        if (!root.hasAttribute(qname))
          root.setAttributeNS(XMLConstants.XMLNS_ATTRIBUTE_NS_URI, qname, uri)
      }
    }
  }

  private def collectUsedNamespaces(node: Node, used: scala.collection.mutable.Set[String]): Unit = {
    if (node.getNodeType == Node.ELEMENT_NODE) {
      if (node.getNamespaceURI != null) used += node.getNamespaceURI
      val attrs = node.getAttributes
      var i = 0
      while (attrs != null && i < attrs.getLength) {
        val a = attrs.item(i)
        if (a.getNamespaceURI != null &&
            a.getNamespaceURI != XMLConstants.XMLNS_ATTRIBUTE_NS_URI)
          used += a.getNamespaceURI
        i += 1
      }
      var child = node.getFirstChild
      while (child != null) {
        collectUsedNamespaces(child, used)
        child = child.getNextSibling
      }
    }
  }

  // the same one-configured-factory-per-JVM discipline as
  // builderFactory/xpathFactory — serialize() used to run
  // `TransformerFactory.newInstance()` (a ServiceLoader classpath scan
  // under a classloader lock) PER SERIALIZED NODE, which on a 32-thread
  // XML scan is thousands of synchronized classpath scans per second:
  // pure overhead, and exactly the classloading-churn signature the
  // wandering pass-2 deopt convoys pointed at. One factory; one
  // Transformer per thread (Transformers are reusable but not
  // thread-safe, the JAXP contract).
  private lazy val transformerFactory: TransformerFactory =
    TransformerFactory.newInstance()
  private val localTransformer =
    ThreadLocal.withInitial[javax.xml.transform.Transformer] { () =>
      val t = transformerFactory.synchronized {
        transformerFactory.newTransformer()
      }
      t.setOutputProperty(OutputKeys.OMIT_XML_DECLARATION, "yes")
      t
    }

  def serialize(doc: Document): String = {
    val w = new StringWriter()
    localTransformer.get().transform(new DOMSource(doc), new StreamResult(w))
    w.toString
  }
}

/** Per-thread JAXP state: one DocumentBuilder + one compiled XPath per
  * (xpath, namespaces) held per executor thread. */
final class XmlWork(xpath: String, ns: Map[String, String]) extends Serializable {
  @transient private lazy val local =
    ThreadLocal.withInitial[(DocumentBuilder, XPathExpression)] { () =>
      (XmlDom.newDocumentBuilder(), XmlDom.compileXPath(xpath, ns))
    }
  def builder: DocumentBuilder = local.get()._1
  def compiled: XPathExpression = local.get()._2
}
