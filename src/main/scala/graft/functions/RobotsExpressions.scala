package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the crawl-pipeline gate between a harvested frontier (t46/t48's
  * chain) and the fetcher: given a host's robots.txt body, may `agent`
  * fetch `path`, and at what politeness delay? At corpus scale this is
  * a per-row kernel over (robots_body, url_path) pairs — robots bodies
  * join to URLs on registered domain (bounded: one small text per
  * host), text never shuffles, and the whole evaluation stays inside
  * whole-stage codegen.
  *
  * PINNED semantics:
  *  - Line model: `#` comments strip to end-of-line; CR/CRLF/LF all
  *    accepted; directives are case-insensitive (`User-agent`, `Allow`,
  *    `Disallow`, `Crawl-delay`; anything else — `Sitemap`, unknown —
  *    is ignored for matching). A UTF-8 BOM on the first line strips.
  *  - Grouping (RFC 9309 §2.1): consecutive `User-agent` lines open ONE
  *    group serving all named agents; rules attach to the open group; a
  *    `User-agent` line AFTER rules starts a new group; rules before
  *    any `User-agent` line are ignored.
  *  - Group selection (§2.2.1, the googlebot behavior): a group value
  *    matches when it is a case-insensitive PREFIX of the crawler's
  *    product token (`graft` matches agent `graftbot`); the groups with
  *    the LONGEST matching value are selected and their rules MERGE;
  *    `*` groups apply only when no named group matches. No group →
  *    everything is allowed.
  *  - Rule matching (§2.2.2): patterns match from the path START; `*`
  *    matches any run of characters; a trailing `$` anchors at
  *    path end ("$" elsewhere is literal). The longest PATTERN that
  *    matches decides; equal lengths → Allow wins. Empty-pattern rules
  *    drop (an empty `Disallow:` means unrestricted). No matching rule
  *    → allowed.
  *  - NULL/empty robots body → allowed (no robots.txt = crawl default);
  *    null path → null. `Crawl-delay` (ubiquitous extension): first
  *    parseable value among the selected groups' rules, else null.
  */
object RobotsKernel {

  /** (isAllow, pattern) rules + crawl delay for the selected group(s). */
  final class Policy(val rules: Array[(Boolean, String)],
                     val crawlDelay: java.lang.Double)

  val AllowAll = new Policy(Array.empty, null)

  /** Single-entry per-thread memo: frontier rows arrive clustered by
    * host (the domain join), so consecutive rows carry the SAME robots
    * body — re-parsing it per row (and twice when both allowed and
    * crawl_delay are selected) is pure waste. The equality check is a
    * byte compare, far cheaper than the line-split/group parse.
    * ThreadLocal because one expression instance can be shared across
    * concurrently-executing tasks; the entry is REMOVED when the
    * owning Spark task completes (executor threads are pooled — the
    * last host's robots body must not live on an idle thread forever). */
  private val memo =
    new ThreadLocal[(String, String, Policy)]

  def policyForCached(robotsTxt: String, agent: String): Policy = {
    if (robotsTxt == null || robotsTxt.isEmpty) return AllowAll
    val m = memo.get()
    if (m != null && m._1 == robotsTxt && m._2 == agent) return m._3
    val p = policyFor(robotsTxt, agent)
    if (m == null) {
      // first set in this task: clear on task end so pooled executor
      // threads don't retain the final body/policy indefinitely
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => memo.remove())
    }
    memo.set((robotsTxt, agent, p))
    p
  }

  /** The ONE robots.txt line model, shared by rule parsing and
    * `Sitemap:` extraction (a fix to a comment/whitespace edge case must
    * never diverge what the extractor sees from what matching sees):
    * UTF-8 BOM strips off line 1, `#` comments strip to end-of-line,
    * CR/CRLF/LF all split, and only `key: value` lines yield \u2014 as
    * (lowercased trimmed key, trimmed raw value). */
  private def directives(robotsTxt: String): Iterator[(String, String)] = {
    val lines = robotsTxt.split("\r\n|\r|\n", -1)
    Iterator.range(0, lines.length).flatMap { li =>
      var line = lines(li)
      if (li == 0 && line.nonEmpty && line.charAt(0) == '\uFEFF')
        line = line.substring(1)
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = line.trim
      val colon = line.indexOf(':')
      if (colon > 0)
        Some((line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT),
          line.substring(colon + 1).trim))
      else None
    }
  }

  def policyFor(robotsTxt: String, agent: String): Policy = {
    if (robotsTxt == null || robotsTxt.isEmpty) return AllowAll
    val want = agent.trim.toLowerCase(java.util.Locale.ROOT)
    // one parse pass: collect (groupUaValues, rules, delay) per group
    final case class Group(uas: java.util.ArrayList[String],
                           rules: java.util.ArrayList[(Boolean, String)],
                           var delay: java.lang.Double)
    val groups = new java.util.ArrayList[Group]()
    var open: Group = null // group still accepting user-agent lines
    var inUaRun = false
    for ((key, value) <- directives(robotsTxt)) {
      key match {
        case "user-agent" =>
          if (!inUaRun) {
            open = Group(new java.util.ArrayList[String](),
              new java.util.ArrayList[(Boolean, String)](), null)
            groups.add(open)
            inUaRun = true
          }
          if (value.nonEmpty)
            open.uas.add(value.toLowerCase(java.util.Locale.ROOT))
        case "allow" | "disallow" =>
          inUaRun = false
          if (open != null && value.nonEmpty)
            open.rules.add((key == "allow", value))
        case "crawl-delay" =>
          inUaRun = false
          if (open != null && open.delay == null)
            try open.delay = java.lang.Double.valueOf(value.toDouble)
            catch { case _: NumberFormatException => () }
        case _ => inUaRun = false // sitemap / unknown: group continues
      }
    }
    // selection: longest UA value that is a prefix of the agent token;
    // '*' groups only as fallback
    var bestLen = -1
    var i = 0
    while (i < groups.size) {
      val g = groups.get(i)
      var j = 0
      while (j < g.uas.size) {
        val ua = g.uas.get(j)
        if (ua != "*" && want.startsWith(ua) && ua.length > bestLen)
          bestLen = ua.length
        j += 1
      }
      i += 1
    }
    val rules = new java.util.ArrayList[(Boolean, String)]()
    var delay: java.lang.Double = null
    i = 0
    while (i < groups.size) {
      val g = groups.get(i)
      var selected = false
      var j = 0
      while (!selected && j < g.uas.size) {
        val ua = g.uas.get(j)
        selected =
          if (bestLen >= 0) ua != "*" && ua.length == bestLen && want.startsWith(ua)
          else ua == "*"
        j += 1
      }
      if (selected) {
        rules.addAll(g.rules)
        if (delay == null) delay = g.delay
      }
      i += 1
    }
    if (rules.isEmpty && delay == null) AllowAll
    else new Policy(rules.toArray(Array.empty[(Boolean, String)]), delay)
  }

  /** Does `pattern` (robots syntax) match `path`? Non-anchored patterns
    * match a path PREFIX — equivalent to a full wildcard match of
    * `pattern + "*"`; a trailing `$` anchors the full path. Classic
    * greedy single-backtrack `*` matcher, O(|pat|·|path|) worst case. */
  def pathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat =
      if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern + "*"
    var p = 0; var i = 0
    var star = -1; var mark = 0
    while (i < path.length) {
      if (p < pat.length && pat.charAt(p) == '*') { star = p; mark = i; p += 1 }
      else if (p < pat.length && pat.charAt(p) == path.charAt(i)) { p += 1; i += 1 }
      else if (star >= 0) { p = star + 1; mark += 1; i = mark }
      else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  /** Longest matching pattern decides; ties → allow; no match → allow. */
  def allowed(policy: Policy, path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < policy.rules.length) {
      val (isAllow, pat) = policy.rules(i)
      if (pathMatches(pat, path)) {
        if (pat.length > bestLen ||
          (pat.length == bestLen && isAllow && !bestAllow)) {
          bestLen = pat.length
          bestAllow = isAllow
        }
      }
      i += 1
    }
    bestAllow
  }

  def allowed(robotsTxt: String, agent: String, path: String): Boolean =
    allowed(policyForCached(robotsTxt, agent), path)

  def crawlDelay(robotsTxt: String, agent: String): java.lang.Double =
    policyForCached(robotsTxt, agent).crawlDelay

  /** `Sitemap:` directive values, in file order, duplicates dropped —
    * the sitemaps.org discovery seed (sitemaps.org/protocol.html
    * #submit_robots: the directive is independent of any user-agent
    * group and may appear anywhere in the file; its value is a FULL
    * url, unlike the path-valued Allow/Disallow rules). Same line
    * model as [[policyFor]] (comments strip, CR/CRLF/LF, BOM,
    * case-insensitive key); values that don't look like absolute
    * http(s) urls drop — a relative value is a broken directive, not a
    * fetchable sitemap. */
  def sitemaps(robotsTxt: String): Array[String] = {
    if (robotsTxt == null || robotsTxt.isEmpty) return Array.empty
    val out = new java.util.LinkedHashSet[String]()
    for ((key, value) <- directives(robotsTxt) if key == "sitemap") {
      val lower = value.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("http://") || lower.startsWith("https://"))
        out.add(value): Unit
    }
    out.toArray(Array.empty[String])
  }
}

/** graft_robots_allowed(robots_txt, path, agent) → boolean. */
case class RobotsAllowedExpression(first: Expression, second: Expression,
                                   third: Expression)
  extends TernaryExpression with TernaryKernelCodegen {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_allowed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_allowed expects (string, string, string), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def evalChildren(robots: AnyRef, path: AnyRef,
                            agent: AnyRef): AnyRef = {
    if (path == null || agent == null) return null
    val txt = if (robots == null) null else robots.toString
    java.lang.Boolean.valueOf(
      RobotsKernel.allowed(txt, agent.toString, path.toString))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** graft_robots_crawl_delay(robots_txt, agent) → double (null = unset). */
case class RobotsCrawlDelayExpression(left: Expression, right: Expression)
  extends BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_crawl_delay expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def evalChildren(robots: AnyRef, agent: AnyRef): AnyRef = {
    if (agent == null) return null
    val txt = if (robots == null) null else robots.toString
    RobotsKernel.crawlDelay(txt, agent.toString)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_robots_sitemaps(robots_txt) → array<string> (the `Sitemap:`
  * directive urls, file order, deduped; empty array when none). */
case class RobotsSitemapsExpression(child: Expression)
  extends UnaryExpression with KernelCodegen {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "robots_sitemaps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_sitemaps expects string, got ${child.dataType.simpleString}")

  override def evalChild(robots: AnyRef): AnyRef = {
    if (robots == null) return null
    val urls = RobotsKernel.sitemaps(robots.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      urls.map(org.apache.spark.unsafe.types.UTF8String.fromString(_))
        .asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RobotsExpressions {

  def robotsSitemaps(robotsTxt: Column): Column =
    ColumnBridge.column(RobotsSitemapsExpression(
      ColumnBridge.expression(robotsTxt)))

  def robotsAllowed(robotsTxt: Column, path: Column, agent: Column): Column =
    ColumnBridge.column(RobotsAllowedExpression(
      ColumnBridge.expression(robotsTxt), ColumnBridge.expression(path),
      ColumnBridge.expression(agent)))

  def robotsCrawlDelay(robotsTxt: Column, agent: Column): Column =
    ColumnBridge.column(RobotsCrawlDelayExpression(
      ColumnBridge.expression(robotsTxt), ColumnBridge.expression(agent)))
}
