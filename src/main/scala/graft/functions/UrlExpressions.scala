package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + public-suffix registered-domain extraction —
  * the producers of the `domain` column that [[graft.ops.Sampling
  * .capPerGroup]]-style per-domain policies assume. Real crawls carry
  * raw URLs: mixed case, default ports, fragments, tracking params, and
  * hosts where the REGISTERED domain sits two or three labels deep
  * (`news.bbc.co.uk` → `bbc.co.uk`, not `co.uk`). Both kernels are
  * hand-rolled single-pass parsers (java.net.URI throws on crawl
  * garbage; these are total — unparseable input passes through /
  * nulls out).
  *
  * PINNED canonicalization (applied in order):
  *  1. scheme and authority lowercase (paths/queries untouched — they
  *     are case-sensitive);
  *  2. default ports drop (`:80` for http, `:443` for https);
  *  3. the fragment drops;
  *  4. tracking params drop: any name starting `utm_`, plus
  *     {gclid, dclid, fbclid, msclkid, yclid, igshid, mc_cid, mc_eid,
  *     _ga}; remaining params keep their original order; a query left
  *     empty drops its `?`;
  *  5. an empty path becomes `/`.
  *  No percent-decoding, no param sorting, no www-stripping — those
  *  conflate distinct resources. Input without `://` is returned
  *  unchanged (not a URL); null → null.
  *
  * Registered domain ([[RegisteredDomainExpression]]): host extracted
  * (or the bare input when no `://`), lowercased, trailing dot
  * stripped; the public-suffix algorithm (publicsuffix.org rules:
  * exception beats wildcard beats exact, longest match, default rule
  * `*`) runs against the bundled FULL public list
  * (`/graft/public_suffix.dat`, ~9.5k rules in the PSL format: `//`
  * comments, `*.` wildcards, `!` exceptions; Unicode IDN rules indexed
  * under both Unicode and punycode forms; provenance note at the top of
  * the resource). Output = public suffix + one label; null when the
  * host IS a public suffix, is an IPv4/IPv6 literal, or is empty.
  */
object UrlKernel {

  private val trackingExact: Set[String] = Set(
    "gclid", "dclid", "fbclid", "msclkid", "yclid", "igshid",
    "mc_cid", "mc_eid", "_ga")

  @inline private def isTracking(name: String): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || trackingExact.contains(n)
  }

  def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return url // not a URL; pass through untouched
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(schemeEnd + 3)
    // authority ends at the first '/', '?' or '#'
    var aEnd = 0
    while (aEnd < rest.length && { val c = rest.charAt(aEnd)
      c != '/' && c != '?' && c != '#' }) aEnd += 1
    // lowercase only the host[:port] portion: userinfo (before the
    // last '@') is case-sensitive per RFC 3986 — folding it would
    // conflate distinct resources, the same principle that keeps
    // paths/queries untouched
    var authority = {
      val raw = rest.substring(0, aEnd)
      val atIx = raw.lastIndexOf('@')
      if (atIx < 0) raw.toLowerCase(java.util.Locale.ROOT)
      else raw.substring(0, atIx + 1) +
        raw.substring(atIx + 1).toLowerCase(java.util.Locale.ROOT)
    }
    // default-port strip (after the LAST ':' so IPv6 [..]:443 works too)
    val portIx = authority.lastIndexOf(':')
    if (portIx > 0 && portIx > authority.lastIndexOf(']')) {
      val port = authority.substring(portIx + 1)
      if ((scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443"))
        authority = authority.substring(0, portIx)
    }
    // split path / query / fragment
    val afterAuth = rest.substring(aEnd)
    val hashIx = afterAuth.indexOf('#')
    val noFrag = if (hashIx >= 0) afterAuth.substring(0, hashIx) else afterAuth
    val qIx = noFrag.indexOf('?')
    val path0 = if (qIx >= 0) noFrag.substring(0, qIx) else noFrag
    val path = if (path0.isEmpty) "/" else path0
    val query = if (qIx >= 0) noFrag.substring(qIx + 1) else null
    val keptQuery =
      if (query == null) null
      else {
        val kept = query.split("&", -1).filter { p =>
          val eq = p.indexOf('=')
          val name = if (eq >= 0) p.substring(0, eq) else p
          !isTracking(name)
        }
        if (kept.isEmpty) null else kept.mkString("&")
      }
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(scheme).append("://").append(authority).append(path)
    if (keptQuery != null) sb.append('?').append(keptQuery)
    sb.toString
  }

  // ---- public-suffix rules -------------------------------------------------

  /** Hash-indexed rule sets: O(#host-labels) lookups per call instead of
    * a linear scan over all ~9.5k rules — the full bundled list is large
    * enough that the scan would dominate per-URL cost at crawl scale.
    * Unicode (IDN) rules are indexed under BOTH their Unicode form and
    * their punycode (`xn--`) form, so hosts arrive matchable either way.
    */
  private final class PslIndex(
      val exact: java.util.HashSet[String],
      val wildcardParents: java.util.HashSet[String],
      val exceptions: java.util.HashSet[String])

  private lazy val index: PslIndex = {
    val exact = new java.util.HashSet[String](16384)
    val wild = new java.util.HashSet[String](64)
    val exc = new java.util.HashSet[String](16)
    def add(set: java.util.HashSet[String], labels: Array[String]): Unit = {
      set.add(labels.mkString("."))
      if (labels.exists(_.exists(_ > 127))) {
        val ascii = labels.map { l =>
          try java.net.IDN.toASCII(l) catch { case _: Exception => l }
        }
        set.add(ascii.mkString(".").toLowerCase(java.util.Locale.ROOT))
      }
    }
    loadRules("/graft/public_suffix.dat").foreach { case (rev, isExc, isWild) =>
      val labels = rev.reverse
      if (isExc) add(exc, labels)
      else if (isWild) add(wild, labels)
      else add(exact, labels)
    }
    new PslIndex(exact, wild, exc)
  }

  /** (labels reversed, isException, isWildcard); parse of the PSL format
    * (`//` comments, `*.` wildcards, `!` exceptions). Kept as the parse
    * layer under [[index]]; tests also run it over the subset fixture to
    * pin the format handling independent of list size. */
  private[graft] def loadRules(resource: String): Array[(Array[String], Boolean, Boolean)] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"public-suffix resource not found: $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        val exception = l.startsWith("!")
        val body = if (exception) l.substring(1) else l
        val wildcard = body.startsWith("*.")
        val labels = (if (wildcard) body.substring(2) else body)
          .toLowerCase(java.util.Locale.ROOT).split('.').reverse
        (labels, exception, wildcard)
      }.toArray
    finally src.close()
  }

  /** Host of a URL (or the input itself when it has no `://`), without
    * port/userinfo/brackets, lowercased, trailing dot stripped. */
  def hostOf(url: String): String = {
    val schemeEnd = url.indexOf("://")
    val rest = if (schemeEnd > 0) url.substring(schemeEnd + 3) else url
    var aEnd = 0
    while (aEnd < rest.length && { val c = rest.charAt(aEnd)
      c != '/' && c != '?' && c != '#' }) aEnd += 1
    var auth = rest.substring(0, aEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    if (auth.startsWith("[")) { // IPv6 literal — no registered domain
      return auth.toLowerCase(java.util.Locale.ROOT)
    }
    val portIx = auth.lastIndexOf(':')
    if (portIx >= 0) auth = auth.substring(0, portIx)
    if (auth.endsWith(".")) auth = auth.substring(0, auth.length - 1)
    auth.toLowerCase(java.util.Locale.ROOT)
  }

  private def isIpv4(host: String): Boolean = {
    val parts = host.split('.')
    parts.length == 4 && parts.forall(p =>
      p.nonEmpty && p.length <= 3 && p.forall(c => c >= '0' && c <= '9') &&
        p.toInt <= 255)
  }

  /** publicsuffix.org match: suffix label count for `labels` (host
    * labels in NORMAL order), or -1 when no rule constrains it. Walks
    * the host's suffixes right-to-left — one hash probe per rule set per
    * suffix. Exception rules win (public suffix = rule minus its
    * leftmost label); otherwise longest of exact / wildcard matches. */
  private def suffixLen(labels: Array[String]): Int = {
    val idx = index
    val n = labels.length
    var bestException = -1
    var best = -1
    var suffix: String = null
    var i = n - 1
    while (i >= 0) {
      suffix = if (suffix == null) labels(i) else labels(i) + "." + suffix
      val len = n - i
      if (idx.exceptions.contains(suffix) && len - 1 > bestException)
        bestException = len - 1
      if (idx.exact.contains(suffix) && len > best) best = len
      // `*.X`: the suffix X plus ONE more host label is a public suffix
      if (i >= 1 && idx.wildcardParents.contains(suffix) && len + 1 > best)
        best = len + 1
      i -= 1
    }
    if (bestException >= 0) bestException else best
  }

  /** Registered domain or null (see object scaladoc). */
  def registeredDomain(urlOrHost: String): String = {
    val host = hostOf(urlOrHost)
    if (host.isEmpty || host.startsWith("[") || isIpv4(host)) return null
    val labels = host.split('.')
    if (labels.exists(_.isEmpty)) return null // "a..b" etc.
    val sufLen = suffixLen(labels) match {
      case -1 => 1 // the default rule "*": the TLD itself
      case n => n
    }
    if (labels.length <= sufLen) null // the host IS a public suffix
    else labels.takeRight(sufLen + 1).mkString(".")
  }

  /** RFC 3986 §5 reference resolution (the crawl-frontier step between
    * [[graft.functions.HtmlLinksExpression]]'s raw hrefs and
    * [[canonicalize]]), TOTAL on garbage. PINNED subset:
    *  - `rel` with a scheme (`letter (letter|digit|+|-|.)* :`) → as-is;
    *  - `//authority/...` → base's scheme attached;
    *  - `/path` → base's scheme+authority + path (dot-segments removed);
    *  - `?query` / `#frag` → replace base's query / fragment;
    *  - empty → base without its fragment;
    *  - anything else → merged with the base path's directory,
    *    dot-segments (`.` / `..`) removed per the RFC algorithm.
    *  - a base without `://` cannot anchor a relative ref → `rel`
    *    returned verbatim (total, never throws). */
  def resolve(base: String, rel: String): String = {
    def stripFragment(u: String): String = {
      val h = u.indexOf('#'); if (h >= 0) u.substring(0, h) else u
    }
    if (rel.isEmpty) return stripFragment(base)
    // scheme detection on rel
    var i = 0
    var hasScheme = false
    if (rel.nonEmpty && isAsciiLetterCh(rel.charAt(0))) {
      i = 1
      while (i < rel.length && {
        val c = rel.charAt(i)
        isAsciiLetterCh(c) || (c >= '0' && c <= '9') ||
          c == '+' || c == '-' || c == '.'
      }) i += 1
      hasScheme = i < rel.length && rel.charAt(i) == ':'
    }
    if (hasScheme) return rel
    val schemeEnd = base.indexOf("://")
    if (schemeEnd <= 0) return rel // unanchorable base: stay total
    val scheme = base.substring(0, schemeEnd)
    if (rel.startsWith("//")) return scheme + ":" + rel
    val afterScheme = base.substring(schemeEnd + 3)
    var aEnd = 0
    while (aEnd < afterScheme.length && {
      val c = afterScheme.charAt(aEnd)
      c != '/' && c != '?' && c != '#'
    }) aEnd += 1
    val root = base.substring(0, schemeEnd + 3) + afterScheme.substring(0, aEnd)
    val pathQF = afterScheme.substring(aEnd)
    val basePath = {
      val noF = stripFragment(pathQF)
      val q = noF.indexOf('?')
      if (q >= 0) noF.substring(0, q) else noF
    }
    if (rel.startsWith("#")) return root + {
      val noF = stripFragment(pathQF); noF
    } + rel
    if (rel.startsWith("?")) return root + basePath + rel
    // split rel into path / query+fragment tail
    var rEnd = 0
    while (rEnd < rel.length && rel.charAt(rEnd) != '?' &&
      rel.charAt(rEnd) != '#') rEnd += 1
    val relPath = rel.substring(0, rEnd)
    val relTail = rel.substring(rEnd)
    val merged =
      if (relPath.startsWith("/")) relPath
      else {
        val dir = basePath.lastIndexOf('/') match {
          case -1 => "/"
          case ix => basePath.substring(0, ix + 1)
        }
        (if (dir.isEmpty) "/" else dir) + relPath
      }
    root + removeDotSegments(merged) + relTail
  }

  @inline private def isAsciiLetterCh(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path —
    * the literal input/output-buffer algorithm, so EMPTY segments
    * survive (`/a/b//c` stays `/a/b//c`: double slashes are distinct
    * resources on many servers; only `.` and `..` segments rewrite). */
  private[graft] def removeDotSegments(path: String): String = {
    var in = path
    val out = new java.lang.StringBuilder(path.length)
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        // pop the last complete segment (including its leading '/')
        val cut = out.lastIndexOf("/")
        out.setLength(if (cut < 0) 0 else cut)
      }
      else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (a leading '/' plus up to the next '/')
        val from = if (in.charAt(0) == '/') 1 else 0
        val next = in.indexOf('/', from)
        val segEnd = if (next < 0) in.length else next
        out.append(in, 0, segEnd)
        in = in.substring(segEnd)
      }
    }
    out.toString
  }
}

case class UrlCanonicalExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonical_url"
  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) null
    else UTF8String.fromString(UrlKernel.canonicalize(utf.toString))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RegisteredDomainExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "registered_domain"
  override def evalChild(childValue: AnyRef): AnyRef = {
    val utf = childValue.asInstanceOf[UTF8String]
    if (utf == null) return null
    val d = UrlKernel.registeredDomain(utf.toString)
    if (d == null) null else UTF8String.fromString(d)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RFC 3986 reference resolution as a codegen binary expression —
  * `resolve_url(base, rel)`; see [[UrlKernel.resolve]] for the pinned
  * rules. Null if either side is null; total otherwise. */
case class ResolveUrlExpression(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"
  override protected def nullSafeEval(base: Any, rel: Any): Any =
    UTF8String.fromString(UrlKernel.resolve(base.toString, rel.toString))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UrlKernel.resolve($b.toString(), $r.toString()));")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UrlExpressions {
  def canonicalUrl(url: Column): Column =
    ColumnBridge.column(UrlCanonicalExpression(ColumnBridge.expression(url)))
  def registeredDomain(urlOrHost: Column): Column =
    ColumnBridge.column(RegisteredDomainExpression(ColumnBridge.expression(urlOrHost)))
  def resolveUrl(base: Column, rel: Column): Column =
    ColumnBridge.column(ResolveUrlExpression(
      ColumnBridge.expression(base), ColumnBridge.expression(rel)))
}
