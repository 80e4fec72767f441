package graft.marc

import scala.collection.mutable

/** Parser for the DECLARATIVE subset of Ruby that the reference's `.rb`
  * translation maps actually use (reference: translation_map.rb:124-142
  * evals the file and requires the last expression to be a Hash; the
  * bundled/test maps are hash literals with at most variable assignment,
  * `%w` word arrays, `[key] = value` mutation, and `.freeze`):
  *
  *   some_hash = { "k" => "v", "a" => %w{one two}, :sym => nil }
  *   some_hash["also"] = "this"
  *   some_hash          # last statement must evaluate to a hash
  *
  * Anything procedural — `require`, method calls, lambdas, string
  * interpolation, `MatchMap.new` — fails loudly: those maps are code in
  * the reference too and have no data equivalent. No Ruby interpreter is
  * involved; this is a tokenizer over literals, so untrusted map files
  * cannot execute anything. */
object RbMap {

  /** Ordered entries of the final hash; values are String, Long, Double,
    * Boolean, null, or Seq of those. */
  def parse(src: String): Vector[(String, Any)] = {
    val env = mutable.LinkedHashMap.empty[String, Any]
    var last: Option[Any] = None
    for (stmt <- splitStatements(src)) {
      last = Some(new P(stmt, env).statement())
    }
    last match {
      case Some(m: mutable.LinkedHashMap[_, _]) =>
        m.asInstanceOf[mutable.LinkedHashMap[String, Any]].toVector
      case other => throw new IllegalArgumentException(
        s"translation map .rb must end in a hash expression, got: " +
          other.map(_.getClass.getSimpleName).getOrElse("nothing"))
    }
  }

  /** Parse and emit equivalent YAML (snakeyaml block style — loadable by
    * [[TranslationMap]]'s yaml path and by the reference's Psych). */
  def toYaml(src: String): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    val jmap = new java.util.LinkedHashMap[String, Object]()
    parse(src).foreach { case (k, v) => jmap.put(k, toJava(v)) }
    new org.yaml.snakeyaml.Yaml(opts).dump(jmap)
  }

  /** TranslationMap straight from `.rb` source. */
  def toTranslationMap(src: String): TranslationMap =
    TranslationMap.fromRaw(parse(src).toMap)

  private def toJava(v: Any): Object = v match {
    case null      => null
    case s: Seq[_] =>
      val l = new java.util.ArrayList[Object](s.length)
      s.foreach(e => l.add(toJava(e)))
      l
    case other     => other.asInstanceOf[Object]
  }

  /** Top-level statements: split at newlines/';' outside strings and
    * brackets; strip comments. */
  private def splitStatements(src: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    def flush(): Unit = { if (cur.toString.trim.nonEmpty) out += cur.toString; cur.clear() }
    while (i < src.length) {
      val c = src.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == '\\' && i + 1 < src.length) { cur.append(src.charAt(i + 1)); i += 1 }
        else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur.append(c)
        case '#' => while (i + 1 < src.length && src.charAt(i + 1) != '\n') i += 1
        case '{' | '[' | '(' => depth += 1; cur.append(c)
        case '}' | ']' | ')' => depth -= 1; cur.append(c)
        case '\n' | ';' if depth == 0 => flush()
        case _ => cur.append(c)
      }
      i += 1
    }
    flush()
    out.result()
  }

  /** Recursive-descent parser over one statement. */
  private final class P(s: String, env: mutable.LinkedHashMap[String, Any]) {
    private var i = 0

    def statement(): Any = {
      ws()
      val start = i
      if (peekIdent()) {
        val id = ident()
        ws()
        if (!eof && s.charAt(i) == '[') {
          // ident["key"] = value  (mutation)
          i += 1; ws()
          val key = keyExpr(); ws(); expect(']'); ws(); expect('=')
          val v = expr(); end()
          val m = env.getOrElse(id, fail(s"undefined variable $id"))
            .asInstanceOf[mutable.LinkedHashMap[String, Any]]
          m.put(key, v)
          // Ruby: `h["k"] = v` evaluates to v, NOT the hash — so a file
          // whose LAST statement is a mutation yields the value and the
          // reference loader rejects it (non-Hash result); match that.
          v
        } else if (!eof && s.charAt(i) == '=' && (i + 1 >= s.length || s.charAt(i + 1) != '=')) {
          i += 1
          val v = expr(); end()
          env.put(id, v)
          v
        } else {
          // bare expression starting with an identifier
          i = start
          val v = expr(); end(); v
        }
      } else {
        val v = expr(); end(); v
      }
    }

    private def expr(): Any = {
      ws()
      if (eof) fail("unexpected end of statement")
      val v = s.charAt(i) match {
        case '{' => hash()
        case '[' => array()
        case '\'' | '"' => str()
        case '%' => percentW()
        case ':' => sym()
        case c if c.isDigit || c == '-' => num()
        case c if c.isLetter || c == '_' => word()
        case c => fail(s"unsupported syntax at '$c'")
      }
      ws()
      // tolerate `.freeze` (a no-op on immutable data); any other call is code
      while (!eof && s.charAt(i) == '.') {
        val save = i
        i += 1
        val m = ident()
        if (m != "freeze") { i = save; fail(s"method call .$m is not declarative") }
        ws()
      }
      v
    }

    private def hash(): Any = {
      expect('{')
      val m = mutable.LinkedHashMap.empty[String, Any]
      ws()
      if (!eof && s.charAt(i) == '}') { i += 1; return m }
      var done = false
      while (!done) {
        ws()
        val k = keyExpr()
        ws()
        if (i + 1 < s.length && s.charAt(i) == '=' && s.charAt(i + 1) == '>') i += 2
        else if (!eof && s.charAt(i) == ':') i += 1 // `key: value` new-style (symbol keys)
        else fail("expected => or : in hash entry")
        m.put(k, expr())
        ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      m
    }

    private def keyExpr(): String = {
      ws()
      s.charAt(i) match {
        case '\'' | '"' => str()
        case ':' => sym()
        case c if c.isLetter || c == '_' => ident() // bare word before `:`
        case c => fail(s"unsupported hash key at '$c'")
      }
    }

    private def array(): Any = {
      expect('[')
      val b = Vector.newBuilder[Any]
      ws()
      if (!eof && s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += expr()
        ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def str(): String = {
      val q = s.charAt(i); i += 1
      val b = new StringBuilder
      while (!eof && s.charAt(i) != q) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          i += 1
          b.append(s.charAt(i) match {
            case 'n' => '\n'; case 't' => '\t'; case other => other
          })
        } else if (c == '#' && q == '"' && i + 1 < s.length && s.charAt(i + 1) == '{') {
          fail("string interpolation is not declarative")
        } else b.append(c)
        i += 1
      }
      expect(q)
      b.toString
    }

    private def percentW(): Any = {
      expect('%')
      if (eof || (s.charAt(i) != 'w' && s.charAt(i) != 'W')) fail("unsupported % literal")
      i += 1
      val close = s.charAt(i) match {
        case '{' => '}'; case '[' => ']'; case '(' => ')'; case '<' => '>'
        case c => fail(s"unsupported %w delimiter '$c'")
      }
      i += 1
      val start = i
      while (!eof && s.charAt(i) != close) i += 1
      val words = s.substring(start, i).trim.split("\\s+").toVector.filter(_.nonEmpty)
      expect(close)
      words
    }

    private def sym(): String = { expect(':'); ident() }

    private def num(): Any = {
      val start = i
      if (s.charAt(i) == '-') i += 1
      while (!eof && (s.charAt(i).isDigit || s.charAt(i) == '.' || s.charAt(i) == '_')) i += 1
      val t = s.substring(start, i).replace("_", "")
      if (t.contains('.')) t.toDouble else t.toLong
    }

    private def word(): Any = {
      val id = ident()
      id match {
        case "nil" => null
        case "true" => java.lang.Boolean.TRUE
        case "false" => java.lang.Boolean.FALSE
        case "require" | "require_relative" =>
          fail("require is not declarative — this map is Ruby code, not data")
        case _ =>
          env.getOrElse(id, fail(s"unknown identifier '$id' — " +
            "method calls/constants are not declarative"))
      }
    }

    private def ident(): String = {
      val start = i
      while (!eof && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }

    private def peekIdent(): Boolean =
      !eof && (s.charAt(i).isLetter || s.charAt(i) == '_')

    private def ws(): Unit = {
      while (!eof && s.charAt(i).isWhitespace) i += 1
      if (!eof && s.charAt(i) == '#') { i = s.length } // trailing comment
    }

    private def end(): Unit = {
      ws()
      if (!eof) fail(s"trailing content: '${s.substring(i).take(30)}'")
    }

    private def expect(c: Char): Unit = {
      if (eof || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    private def eof: Boolean = i >= s.length
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"not a declarative translation map ($msg) in statement: ${s.trim.take(80)}")
  }
}
