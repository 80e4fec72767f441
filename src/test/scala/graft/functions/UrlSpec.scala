package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSpec {

  private def canon(s: String) = UrlKernel.canonicalize(s)
  private def dom(s: String) = UrlKernel.registeredDomain(s)

  test("canonicalize: case, default ports, fragments, tracking params, empty path") {
    assert(canon("HTTP://WWW.Example.COM:80/Path/X?utm_source=a&id=7&utm_medium=b#frag") ==
      "http://www.example.com/Path/X?id=7")
    assert(canon("https://Site.ORG:443") == "https://site.org/")
    assert(canon("https://site.org:8443/a") == "https://site.org:8443/a")
    // tracking-only query drops its '?'; param order otherwise kept
    assert(canon("http://a.com/p?utm_campaign=x&gclid=1") == "http://a.com/p")
    assert(canon("http://a.com/p?b=2&a=1&fbclid=zz") == "http://a.com/p?b=2&a=1")
    // path/query case preserved (case-sensitive server-side)
    assert(canon("http://A.com/CaseD?Q=Vv") == "http://a.com/CaseD?Q=Vv")
    // ftp: no default-port rule, fragment still drops
    assert(canon("FTP://Files.X.org/d#s") == "ftp://files.x.org/d")
    // non-URL input passes through untouched
    assert(canon("not a url") == "not a url")
    assert(canon("") == "")
    // userinfo is case-sensitive (RFC 3986): only the host folds
    assert(canon("http://User:PW@Host.COM/x") == "http://User:PW@host.com/x")
    assert(canon("http://User@h.com/") != canon("http://user@h.com/"))
  }

  test("registered domain: PSL depth, wildcard, exception, default rule, IPs") {
    assert(dom("http://news.bbc.co.uk/page") == "bbc.co.uk")
    assert(dom("WWW.Example.COM") == "example.com")
    assert(dom("a.b.c.example.com.au") == "example.com.au")
    assert(dom("example.org") == "example.org")
    // wildcard *.ck: any single label under ck is a public suffix
    assert(dom("www.city.ck") == "www.city.ck")
    assert(dom("city.ck") == null) // city.ck IS a public suffix
    // exception !www.ck beats the wildcard
    assert(dom("www.ck") == "www.ck")
    assert(dom("sub.www.ck") == "www.ck")
    // default rule: unknown TLD -> last two labels
    assert(dom("host.unknowntld") == "host.unknowntld")
    assert(dom("a.b.host.unknowntld") == "host.unknowntld")
    assert(dom("unknowntld") == null)
    // bare suffix, IPs, garbage
    assert(dom("co.uk") == null)
    assert(dom("http://192.168.0.1/x") == null)
    assert(dom("http://[2001:db8::1]:8080/x") == null)
    assert(dom("http://user:pw@Sub.Example.COM:99/x") == "example.com")
    assert(dom("example.com.") == "example.com") // trailing dot
    assert(dom("a..b") == null)
    assert(dom("") == null)
  }

  test("resolve: RFC 3986 reference resolution, pinned subset, total") {
    val b = "http://h.com/a/b/c.html?q=1#f"
    def r(rel: String) = UrlKernel.resolve(b, rel)
    // absolute / protocol-relative pass through with scheme handling
    assert(r("https://x.org/p") == "https://x.org/p")
    assert(r("mailto:a@b.c") == "mailto:a@b.c")
    assert(r("//cdn.x.org/l.js") == "http://cdn.x.org/l.js")
    // root-relative, query, fragment, empty
    assert(r("/z/w") == "http://h.com/z/w")
    assert(r("?k=2") == "http://h.com/a/b/c.html?k=2")
    assert(r("#top") == "http://h.com/a/b/c.html?q=1#top")
    assert(r("") == "http://h.com/a/b/c.html?q=1")
    // relative merge + dot segments (RFC 5.4 examples)
    assert(r("g") == "http://h.com/a/b/g")
    assert(r("./g") == "http://h.com/a/b/g")
    assert(r("../g") == "http://h.com/a/g")
    assert(r("../../g") == "http://h.com/g")
    assert(r("../../../g") == "http://h.com/g") // over-popped floors at root
    assert(r("g/") == "http://h.com/a/b/g/")
    assert(r("g?y#s") == "http://h.com/a/b/g?y#s")
    // empty segments survive (RFC 5.2.4 moves them verbatim): double
    // slashes are distinct resources on many servers
    assert(UrlKernel.resolve("http://h.com/a/", "b//c") == "http://h.com/a/b//c")
    assert(r("..//g") == "http://h.com/a//g")
    // unanchorable base stays total
    assert(UrlKernel.resolve("not a url", "/x") == "/x")
    assert(UrlKernel.resolve("", "rel/p") == "rel/p")
    // column + SQL paths
    import spark.implicits._
    val got = Seq((b, "../g")).toDF("b", "r")
      .selectExpr("graft_resolve_url(b, r) AS u").as[String].head()
    assert(got == "http://h.com/a/g")
  }

  test("expanded PSL: deep wildcard/exception families, private registries, drift pins") {
    // drift pin: the bundled resource is the FULL public list (~9.5k
    // rules) — someone swapping a subset back in fails loudly here, not
    // as silent mis-grouping in t43/t46/per-domain caps
    assert(UrlKernel.loadRules("/graft/public_suffix.dat").length >= 9000)
    // the PSL-format parse layer stays pinned on the small fixture
    // (wildcards, exceptions, comments) independent of list size
    assert(UrlKernel.loadRules("/graft/public_suffix_subset.dat").length >= 300)
    // multi-label ccTLD families
    assert(dom("www.firm.example.com.tr") == "example.com.tr")
    assert(dom("shop.example.co.il") == "example.co.il")
    assert(dom("a.b.example.com.sg") == "example.com.sg")
    assert(dom("www.example.nhs.uk") == "example.nhs.uk")
    // wildcard ccTLD: any label under bd is a registry
    assert(dom("example.com.bd") == "example.com.bd")
    assert(dom("com.bd") == null)
    // Japanese city families: *.kawasaki.jp wildcard with the
    // !city.kawasaki.jp exception — three-label suffix matching
    assert(dom("a.b.kawasaki.jp") == "a.b.kawasaki.jp")
    assert(dom("b.kawasaki.jp") == null) // b.kawasaki.jp IS a suffix
    assert(dom("foo.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(dom("city.kawasaki.jp") == "city.kawasaki.jp")
    // private-section registries: each subdomain is its own publisher
    assert(dom("alice.github.io") == "alice.github.io")
    assert(dom("a.b.alice.github.io") == "alice.github.io")
    assert(dom("github.io") == null)
    assert(dom("myapp.herokuapp.com") == "myapp.herokuapp.com")
    // the r12 pins must survive the expansion (t43 unchanged)
    assert(dom("http://news.bbc.co.uk/page") == "bbc.co.uk")
    assert(dom("www.city.ck") == "www.city.ck")
    assert(dom("www.ck") == "www.ck")
    assert(dom("host.unknowntld") == "host.unknowntld")
  }

  test("full PSL: suffixes absent from the old subset now resolve correctly") {
    // 4-label US school-district registry (nowhere near the subset)
    assert(dom("www.example.pvt.k12.ma.us") == "example.pvt.k12.ma.us")
    assert(dom("pvt.k12.ma.us") == null)
    // private-section hosting registries
    assert(dom("myblog.blogspot.com") == "myblog.blogspot.com")
    assert(dom("a.b.myblog.blogspot.com") == "myblog.blogspot.com")
    // wildcard Japanese city family beyond the subset's kawasaki pins
    assert(dom("shop.foo.nagoya.jp") == "shop.foo.nagoya.jp")
    assert(dom("foo.nagoya.jp") == null)
    // gov.uk family
    assert(dom("www.example.gov.uk") == "example.gov.uk")
  }

  test("IDN rules match both Unicode and punycode hosts") {
    // рф is a Unicode rule in the list; xn--p1ai is its punycode form
    assert(dom("пример.рф") == "пример.рф")
    assert(dom("www.example.xn--p1ai") == "example.xn--p1ai")
    assert(dom("xn--p1ai") == null)
    assert(dom("рф") == null)
  }

  test("SQL registrations are null-safe and match the kernel") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://WWW.Example.CO.UK:80/a?utm_source=x&id=1#f",
      "https://cdn.site9.COM:443/", "not a url")
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "u")
    val got = df.selectExpr("id", "graft_canonical_url(u) AS c",
        "graft_registered_domain(u) AS d")
      .orderBy("id").collect()
    urls.zipWithIndex.foreach { case (u, i) =>
      assert(got(i).getString(1) == canon(u))
      assert(got(i).getString(2) == dom(u) ||
        (got(i).isNullAt(2) && dom(u) == null))
    }
    val n = df.selectExpr("graft_canonical_url(CAST(NULL AS STRING))",
      "graft_registered_domain(CAST(NULL AS STRING))").collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }
}
