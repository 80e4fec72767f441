package graft.sources

import org.w3c.dom.{Document, Element, Node}

/** Direct DOM walker for the restricted XPath subset the hot query paths
  * actually use — the JDK's `javax.xml.xpath` copies the ENTIRE document
  * into a fresh DTM table for EVERY `evaluate()` call
  * (`XPathContext.getDTMHandleFromNode` → `DOM2DTM`), which profiling
  * showed is ~10× the cost of the DOM parse itself on small documents
  * (x04's two-pass sitemap expansion: 66 executor-seconds at sf0.1, all
  * in DTM construction). This walker evaluates the compiled steps
  * against the already-parsed DOM with zero copies.
  *
  * Supported grammar (anything else returns None from [[compile]] and
  * the caller falls back to javax XPath — including unknown prefixes,
  * so the error contract is unchanged):
  *
  *   path      := '/' steps | '//' steps
  *   steps     := step ('/' step)*
  *   step      := elem | attr(last only)
  *   elem      := [prefix ':'] local ['[' positive-int ']']
  *   attr      := '@' [prefix ':'] local
  *
  * A leading '//' applies to the FIRST step only (descendant search from
  * the document node, document order); positional predicates on that
  * first descendant step are rejected (their per-parent grouping
  * semantics are not worth hand-rolling). Wildcards, functions, other
  * predicates, axes, unions, '..', '.', text() and internal '//' are all
  * rejected — fallback, not error.
  *
  * XPath-1.0 semantics preserved: an UNPREFIXED element step matches
  * no-namespace elements only (there is no default-namespace inheritance
  * in XPath 1.0 — the same rule [[XmlDom.namespaceContext]] implements
  * for the javax path); prefixed steps match on (namespace URI, local
  * name); results come back in document order, exactly what the javax
  * NODESET evaluation returns for these paths. */
object XPathLite {

  /** One resolved location step: `uri` is null for the no-namespace
    * match, `pos` 0 means "all matches", k>0 means the k-th matching
    * child within each context (1-based). */
  private final case class Step(uri: String, local: String, pos: Int)

  final class Compiled private[XPathLite] (
      private[XPathLite] val steps: Array[Step],
      private[XPathLite] val attr: (String, String), // (uri|null, local) or null
      private[XPathLite] val descendantFirst: Boolean) {

    def eval(doc: Document): Seq[Node] = {
      var contexts: collection.Seq[Node] =
        if (descendantFirst) {
          val first = steps(0)
          val buf = collection.mutable.ArrayBuffer.empty[Node]
          collectDescendants(doc.getDocumentElement, first, buf)
          buf
        } else {
          val buf = collection.mutable.ArrayBuffer.empty[Node]
          childMatches(doc, steps(0), buf)
          buf
        }
      var i = 1
      while (i < steps.length && contexts.nonEmpty) {
        val step = steps(i)
        val next = collection.mutable.ArrayBuffer.empty[Node]
        contexts.foreach(c => childMatches(c, step, next))
        contexts = next
        i += 1
      }
      if (attr == null) contexts.toSeq
      else contexts.iterator.flatMap { c =>
        val el = c.asInstanceOf[Element]
        Option(if (attr._1 == null) el.getAttributeNode(attr._2)
               else el.getAttributeNodeNS(attr._1, attr._2))
      }.toSeq
    }

    /** Matching child ELEMENTS of `parent` in document order, honoring a
      * positional predicate (k-th matching child, 1-based). */
    private def childMatches(parent: Node, step: Step,
                             out: collection.mutable.ArrayBuffer[Node]): Unit = {
      var child = parent.getFirstChild
      var seen = 0
      while (child != null) {
        if (child.getNodeType == Node.ELEMENT_NODE && matches(child, step)) {
          seen += 1
          if (step.pos == 0) out += child
          else if (seen == step.pos) { out += child; return }
        }
        child = child.getNextSibling
      }
    }

    /** All descendant-or-self elements of `node` matching `step`, in
      * document order (pre-order walk). */
    private def collectDescendants(node: Node, step: Step,
                                   out: collection.mutable.ArrayBuffer[Node]): Unit = {
      if (node == null) return
      if (node.getNodeType == Node.ELEMENT_NODE && matches(node, step)) out += node
      var child = node.getFirstChild
      while (child != null) {
        if (child.getNodeType == Node.ELEMENT_NODE) collectDescendants(child, step, out)
        child = child.getNextSibling
      }
    }

    private def matches(n: Node, step: Step): Boolean =
      step.local == n.getLocalName &&
        (if (step.uri == null) n.getNamespaceURI == null
         else step.uri == n.getNamespaceURI)
  }

  private val NamePat = "([A-Za-z_][A-Za-z0-9_.-]*)".r
  private val ElemPat = s"(?:$NamePat:)?$NamePat(?:\\[([0-9]+)\\])?".r
  private val AttrPat = s"@(?:$NamePat:)?$NamePat".r

  /** Compile `xpath` against the prefix→URI map; None = unsupported
    * shape (caller falls back to javax XPath). */
  def compile(xpath: String, ns: Map[String, String]): Option[Compiled] = {
    if (xpath == null || xpath.isEmpty) return None
    val (descendant, rest) =
      if (xpath.startsWith("//")) (true, xpath.substring(2))
      else if (xpath.startsWith("/")) (false, xpath.substring(1))
      else return None
    if (rest.isEmpty || rest.contains("//")) return None
    val parts = rest.split('/')
    if (parts.exists(_.isEmpty)) return None
    val steps = collection.mutable.ArrayBuffer.empty[Step]
    var attr: (String, String) = null
    for ((p, i) <- parts.zipWithIndex) {
      val last = i == parts.length - 1
      p match {
        case AttrPat(prefix, local) if last =>
          // attribute step: prefixed attrs match on (URI, local); an
          // unprefixed attribute name is in NO namespace (XPath 1.0)
          val uri = prefix match {
            case null => null
            case pr   => ns.getOrElse(pr, return None)
          }
          attr = (uri, local)
        case ElemPat(prefix, local, posStr) =>
          val uri = prefix match {
            case null => null
            case pr   => ns.getOrElse(pr, return None)
          }
          // Positional predicates: the internal sentinel pos=0 means "all
          // matches", but XPath 1.0 defines a literal e[0] as the EMPTY
          // node-set — that shape (and any position too long for Int)
          // must fall back to javax rather than silently matching all.
          val pos = posStr match {
            case null                  => 0
            case s if s.length > 9     => return None // would overflow Int
            case s                     => s.toInt
          }
          if (posStr != null && pos == 0) return None // literal [0]: javax
          if (pos > 0 && descendant && i == 0) return None // per-parent grouping
          steps += Step(uri, local, pos)
        case _ => return None
      }
    }
    if (steps.isEmpty) return None // bare "/@attr" — let javax handle it
    Some(new Compiled(steps.toArray, attr, descendant))
  }
}
