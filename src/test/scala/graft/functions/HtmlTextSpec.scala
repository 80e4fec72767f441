package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class HtmlTextSpec extends SparkSpec {

  private def x(s: String): String = HtmlTextExpression.extract(s)

  test("tags strip; block tags break lines; inline tags never split words") {
    assert(x("<html><body><h1>Title</h1><p>a b</p></body></html>") ==
      "Title\na b")
    assert(x("super<b>cali</b>fragi") == "supercalifragi")
    assert(x("a<br>b<br/>c") == "a\nb\nc")
    assert(x("<ul><li>one</li><li>two</li></ul>") == "one\ntwo")
    // consecutive block boundaries collapse to ONE newline
    assert(x("<div><p></p><p>x</p></div><div>y</div>") == "x\ny")
    // inline close/open around spaces keep a single space
    assert(x("a <span>b</span> c") == "a b c")
  }

  test("script, style, and comments drop whole, content included") {
    assert(x("<script>var x = '<p>not text</p>';</script>after") == "after")
    assert(x("<style type='text/css'>p { color: red }</style>t") == "t")
    assert(x("a<!-- <p>hidden</p> -->b") == "ab")
    // unterminated raw-text/comment drops to end (never throws)
    assert(x("keep<script>var x=1;") == "keep")
    assert(x("keep<!-- unclosed") == "keep")
    // case-insensitive
    assert(x("<SCRIPT>x</SCRIPT>y<STYLE>z</STYLE>") == "y")
    // <scripty> is an ordinary (non-raw-text) tag
    assert(x("<scripty>text</scripty>") == "text")
  }

  test("character references decode; unknown stay literal") {
    assert(x("fish &amp; chips &lt;b&gt;") == "fish & chips <b>")
    assert(x("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(x("a&nbsp;b") == "a b")
    assert(x("ex&#33; hex&#x21;") == "ex! hex!")
    assert(x("&#x1F600;") == new String(Character.toChars(0x1F600)))
    // unknown, unterminated, overflow, surrogate → literal
    assert(x("&unknown; &amp tail") == "&unknown; &amp tail")
    assert(x("&#99999999999; &#xD800; &#;") == "&#99999999999; &#xD800; &#;")
  }

  test("whitespace: collapse runs, trim lines and edges; entities count as text whitespace") {
    assert(x("  a   b\t\nc  ") == "a b c")
    assert(x("<p>  lead  </p><p>  trail  </p>") == "lead\ntrail")
    assert(x("a&#10;b") == "a b") // decoded newline is text whitespace
    assert(x("") == "")
    assert(x("<p></p><div></div>") == "")
  }

  test("malformed markup is total: stray <, quoted >, unterminated tags") {
    assert(x("3 < 4 and 5 > 2") == "3 < 4 and 5 > 2")
    assert(x("""a<img alt="x > y">b""") == "ab") // quoted > doesn't close
    assert(x("a<p unterminated") == "a")
    assert(x("<") == "<")
    assert(x("a<2") == "a<2") // '<' before a digit is literal
  }

  test("kernel is total on arbitrary strings and equals the column path") {
    import spark.implicits._
    // fuzz with markup-heavy alphabets: totality (never throws, never
    // null) on arbitrary tag soup
    val soup = Gen.listOfN(40, Gen.oneOf(
      Gen.oneOf("<", ">", "&", "#", ";", "/", "!", "-", "\"", "'", " ",
        "\n", "\t", "=", "x", "p", "scr", "<p>", "</p>", "<script>",
        "</script>", "<!--", "-->", "&amp;", "&#", "q"),
      Gen.alphaNumStr.map(_.take(6)))).map(_.mkString)
    var seed = Seed(42L)
    (1 to 400).foreach { _ =>
      val s = soup.apply(Gen.Parameters.default, seed).getOrElse("")
      seed = seed.next
      assert(x(s) != null) // total
    }
    val rows = Seq(
      "<html><body><h1>T</h1><p>fish &amp; chips</p></body></html>",
      "plain text", "", "<script>x", "3 < 4 &#33;")
    val got = rows.toDF("html")
      .select(graft.ops.TextAnalysis.htmlToText(col("html")).as("t"))
      .as[String].collect().toSeq
    assert(got == rows.map(x))
    // null-total through the column path
    val n = Seq[Option[String]](None).toDF("html")
      .select(graft.ops.TextAnalysis.htmlToText(col("html")))
      .collect()
    assert(n.head.isNullAt(0))
  }

  private def m(s: String) = HtmlTextExpression.extractMain(s, 5, 0.33)

  test("main content: containers drop, link-dense and short blocks drop") {
    val page =
      "<html><head><title>Site</title></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
        "<header><h1>The Daily Page</h1></header>" +
        "<p>This body paragraph carries the actual article content here.</p>" +
        "<aside><ul><li><a>rel one</a></li><li><a>rel two</a></li></ul></aside>" +
        "<div><a>alpha beta gamma delta epsilon zeta</a></div>" +
        "<footer>Copyright 2026 Example Site All Rights Reserved</footer>" +
        "</body></html>"
    // tag stripping alone KEEPS all the chrome...
    val full = x(page)
    assert(full.contains("Home") && full.contains("Copyright") &&
      full.contains("alpha beta"))
    // ...main-content extraction keeps exactly the body paragraph
    assert(m(page) ==
      "This body paragraph carries the actual article content here.")
    // header container drops even though the h1 has words; the footer
    // drops despite 7 words (container rule, not the word floor)
    assert(!m(page).contains("Daily") && !m(page).contains("Copyright"))
  }

  test("main content: word floor, link density boundary, multi-block join") {
    // word floor: 4-word block drops, 5-word block survives
    assert(m("<p>one two three four</p>") == "")
    assert(m("<p>one two three four five</p>") == "one two three four five")
    // link density: just under the ceiling survives, above drops.
    // "linkage" inside <a> = 7 link chars; 7/20 = 0.35 > 0.33 drops,
    // 7/22 = 0.318 <= 0.33 keeps
    val dense = "<p><a>linkage</a> one two three fr</p>"   // 7 link / 20 vis
    val ok = "<p><a>linkage</a> one two three four</p>"    // 7 link / 22 vis
    assert(m(dense) == "")
    assert(m(ok) == "linkage one two three four")
    // two qualifying paragraphs join with one \n, order kept
    assert(m("<p>alpha one two three four</p><p>beta five six seven eight</p>") ==
      "alpha one two three four\nbeta five six seven eight")
    // <br/> splits blocks (each half must qualify separately)
    assert(m("<p>left side words here now<br/>tail bit</p>") ==
      "left side words here now")
  }

  test("main content: tag-soup depth tracking is total and floors at zero") {
    // unbalanced closes never go negative; self-closing changes no depth
    assert(m("</nav></footer><p>real body paragraph with five words</p>") ==
      "real body paragraph with five words")
    assert(m("<nav/><p>self closing nav keeps this body text</p>") ==
      "self closing nav keeps this body text")
    // unterminated container swallows the rest
    assert(m("<nav><p>menu menu menu menu menu</p>") == "")
    // anchors: unbalanced </a> floors; entity chars count as link text
    assert(m("</a><p>plain body words one two three</p>") ==
      "plain body words one two three")
    // totality on soup
    assert(m("<<<>>&&#;<nav foo='>'><a") != null)
    assert(m("") == "")
    // an unclosed <a> (no </a> anywhere — routine tag soup) poisons at
    // most its OWN block's link density: anchors are block-local
    assert(m("<p><a href=/x>logo<p>This body paragraph has plenty of words</p>") ==
      "This body paragraph has plenty of words")
    // unquoted attr value ending in '/' does not self-close a container
    assert(m("<nav data=x/><p>menu menu menu menu menu</p></nav>" +
      "<p>real body paragraph with five words</p>") ==
      "real body paragraph with five words")
  }

  private def lk(s: String) = HtmlTextExpression.links(s)

  test("links: href forms, entity decode, anchor assembly, exclusion zones") {
    // quoted (both), unquoted, attr order, case-insensitive name
    assert(lk("""<a href="/a">x</a><a href='/b'>y</a><a href=/c>z</a>""") ==
      Seq(("/a", "x"), ("/b", "y"), ("/c", "z")))
    assert(lk("""<a class="big" HREF="/up">t</a>""") == Seq(("/up", "t")))
    // entity in href decodes; anchor entities + inline tags + collapse
    assert(lk("""<a href="/p?a=1&amp;b=2">fish &amp; <b>chips</b>  !</a>""") ==
      Seq(("/p?a=1&b=2", "fish & chips !")))
    // block boundary inside an anchor contributes one space
    assert(lk("""<a href="/x">line<br>two</a>""") == Seq(("/x", "line two")))
    // no-href <a>, script/comment links, self-closing, unterminated
    assert(lk("""<a>plain</a>""") == Seq.empty)
    assert(lk("""<script>var x='<a href="/s">n</a>';</script>""") == Seq.empty)
    assert(lk("""<!-- <a href="/c">n</a> -->""") == Seq.empty)
    assert(lk("""<a href="/sc"/>after""") == Seq(("/sc", "")))
    assert(lk("""<a href="/open">dangling""") == Seq(("/open", "dangling")))
    // nested <a> (invalid HTML) closes the pending link first
    assert(lk("""<a href="/1">one<a href="/2">two</a>""") ==
      Seq(("/1", "one"), ("/2", "two")))
    // totality on soup
    assert(lk("""<a href=<a href href= ><a""") != null)
    assert(lk("") == Seq.empty)
    // unquoted href ending in '/' is VALUE text, not a self-closer
    // (the HTML5 attribute-value rule) — anchor text must survive
    assert(lk("""<a href=http://example.com/>Example</a>""") ==
      Seq(("http://example.com/", "Example")))
    // spaced trailing solidus IS a top-level self-closer
    assert(lk("""<a href=/x />after""") == Seq(("/x", "")))
  }

  test("links column path and SQL registration match the kernel") {
    import spark.implicits._
    val rows = Seq("""<a href="/a">x</a> mid <a href='/b?q=1&amp;r=2'>y z</a>""")
    val got = rows.toDF("html")
      .select(explode(graft.ops.TextAnalysis.htmlLinks(col("html"))).as("l"))
      .select("l.url", "l.anchor").as[(String, String)].collect().toSeq
    assert(got == Seq(("/a", "x"), ("/b?q=1&r=2", "y z")))
    val sqlGot = rows.toDF("html")
      .selectExpr("inline(graft_html_links(html))")
      .as[(String, String)].collect().toSeq
    assert(sqlGot == got)
    val n = Seq[Option[String]](None).toDF("html")
      .select(graft.ops.TextAnalysis.htmlLinks(col("html"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("property: every main-content line is verbatim a line of the full extraction") {
    // extractMain may only DROP blocks, never synthesize or edit text:
    // both kernels share the block boundaries and text-assembly rules,
    // so each kept main line must appear among the full extract's lines
    val soup = Gen.listOfN(30, Gen.oneOf(
      Gen.oneOf("<p>", "</p>", "<nav>", "</nav>", "<footer>", "</footer>",
        "<a href=/x>", "</a>", "<br/>", "<div>", "</div>", "<b>", "</b>",
        "&amp;", " ", "<script>j</script>", "<!-- c -->"),
      Gen.alphaNumStr.map(w => " " + w.take(8) + " "))).map(_.mkString)
    var seed = Seed(99L)
    (1 to 300).foreach { _ =>
      val s = soup.apply(Gen.Parameters.default, seed).getOrElse("")
      seed = seed.next
      val fullLines = x(s).split("\n").toSet
      val mainLines = HtmlTextExpression.extractMain(s, 1, 1.0).split("\n")
      mainLines.filter(_.nonEmpty).foreach { line =>
        assert(fullLines.contains(line),
          s"main line not in full extract: '$line'\nsoup: $s")
      }
    }
  }

  test("main content column path and SQL registration match the kernel") {
    import spark.implicits._
    val rows = Seq(
      "<nav><a>x</a></nav><p>body copy with plenty of words</p>",
      "plain text that is long enough to keep", "", "<footer>f</footer>")
    val got = rows.toDF("html")
      .select(graft.ops.TextAnalysis.htmlMainText(col("html")).as("t"))
      .as[String].collect().toSeq
    assert(got == rows.map(m))
    val sqlGot = rows.toDF("html")
      .selectExpr("graft_html_main_text(html) AS t")
      .as[String].collect().toSeq
    assert(sqlGot == rows.map(m))
    val n = Seq[Option[String]](None).toDF("html")
      .select(graft.ops.TextAnalysis.htmlMainText(col("html")))
      .collect()
    assert(n.head.isNullAt(0))
  }
}
