package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Conv, Expression, ExpressionInfo, Literal, Md5, Substring, Subtract, UnaryMinus}
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._
import graft.marc.AlternateScript

/** SQL FunctionRegistry entries for the graft kernel expressions, so the
  * full operator surface is reachable from `spark.sql(...)` — not only
  * the Column API. Config arguments (specs, k, shingle width) are
  * required to be foldable literals, mirroring how Spark's own
  * parameterized builtins (e.g. `xpath`) take their patterns.
  *
  * Registered via [[GraftExtensions]] (`spark.sql.extensions`), so any
  * session the driver or a library user builds gets them without code. */
object GraftSqlFunctions {

  private def str(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: argument <$arg> must be a string literal, got $e")
  }

  private def int(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: argument <$arg> must be an integer literal, got $e")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** name → (usage, builder). */
  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      "graft_dot(a, b) - dot product of two array<double> vectors",
      { case Seq(a, b) => DotProduct(a, b) }),

    ("graft_dot_int8",
      "graft_dot_int8(a, b) - exact integer dot product of two array<tinyint> vectors",
      { case Seq(a, b) => Int8DotProduct(a, b) }),

    ("graft_topk",
      "graft_topk(score, id, k) - aggregate: top-k (score desc, id asc) pairs as array<struct<score,id>>",
      { case Seq(s, i, k) =>
        TopKByScore(s, i, int(k, "graft_topk", "k")).toAggregateExpression() }),

    ("graft_percentile_disc",
      "graft_percentile_disc(value, num, den) - aggregate: exact discrete percentile, " +
        "the member value at rank clamp((num*(n+1)) DIV den, 1, n); buffer is " +
        "O(distinct values) - for discrete domains",
      { case Seq(v, num, den) =>
        PercentileDiscAgg(Cast(v, DoubleType),
          int(num, "graft_percentile_disc", "num"),
          int(den, "graft_percentile_disc", "den")).toAggregateExpression() }),

    ("graft_cap_keys",
      "graft_cap_keys(key, n, salt) - aggregate: the <= n keys kept per group under " +
        "capPerGroup's deterministic md5-hash retention, as array<struct<score,id>> " +
        "(ids ascend in hash order; extract .id)",
      { case Seq(key, n, salt) =>
        // the capPerGroup scoring tree verbatim (Sampling.capPerGroup):
        // ascending (md5(key||salt) 13-hex prefix, key) via a negated
        // 52-bit-exact double through the largest-first topk aggregate
        val hash = Conv(Substring(
          Md5(Cast(Concat(Seq(Cast(key, StringType), salt)), BinaryType)),
          Literal(1), Literal(13)), Literal(16), Literal(10))
        TopKByScore(UnaryMinus(Cast(hash, DoubleType)), Cast(key, LongType),
          int(n, "graft_cap_keys", "n")).toAggregateExpression() }),

    ("graft_media_info",
      "graft_media_info(payload) - decode an image container header (JPEG SOF+EXIF, " +
        "PNG IHDR, GIF) from a binary column: struct<format,width,height,orientation,bit_depth>; " +
        "-1 marks absent fields, malformed bytes degrade to 'unknown'",
      { case Seq(p) => MediaInfoExpression(p) }),

    ("graft_shingles",
      "graft_shingles(text, n) - distinct space-joined word n-grams, order of first occurrence",
      { case Seq(t, n) => ShinglesExpression(t, int(n, "graft_shingles", "n")) }),

    ("graft_shingle_jaccard",
      "graft_shingle_jaccard(a, b) - Jaccard similarity of two shingle arrays",
      { case Seq(a, b) => ShingleJaccardExpression(a, b) }),

    ("graft_quantile_sketch",
      "graft_quantile_sketch(value, capacity) - aggregate: bounded mergeable " +
        "quantile summary as array<struct<v,w>>; exact while inputs fit capacity",
      { case Seq(v, c) =>
        QuantileSketch(v, int(c, "graft_quantile_sketch", "capacity"))
          .toAggregateExpression() }),

    ("graft_sketch_quantile",
      "graft_sketch_quantile(sketch, num, den) - discrete quantile of a " +
        "graft_quantile_sketch summary at num/den (q24's rank convention)",
      { case Seq(s, n, d) =>
        SketchQuantileExpression(s, Cast(n, LongType), Cast(d, LongType)) }),

    ("graft_sketch_merge",
      "graft_sketch_merge(sketch, capacity) - aggregate: fold stored " +
        "graft_quantile_sketch summaries into one (rollup from partials); " +
        "exact while total inputs fit capacity",
      { case Seq(s, c) =>
        QuantileSketchMerge(s, int(c, "graft_sketch_merge", "capacity"))
          .toAggregateExpression() }),

    ("graft_binary_simhash",
      "graft_binary_simhash(payload, n) - 64-bit SimHash over byte n-gram " +
        "windows of a binary column (content near-dup for opaque payloads)",
      { case Seq(p, n) =>
        BinarySimhashExpression(p, int(n, "graft_binary_simhash", "n")) }),

    ("graft_distinct_sketch",
      "graft_distinct_sketch(value, p) - aggregate: mergeable distinct count " +
        "(2^p bytes of state); EXACT while distinct values fit 2^p, " +
        "HyperLogLog estimate (~1.04/sqrt(2^p) error) beyond",
      { case Seq(v, p) =>
        DistinctSketch(v, int(p, "graft_distinct_sketch", "p"))
          .toAggregateExpression() }),

    ("graft_window_hashes",
      "graft_window_hashes(text, w) - md5 hex of every w-token window by " +
        "position (the passage-dedup kernel; [] when fewer than w tokens)",
      { case Seq(t, w) =>
        WindowHashesExpression(t, int(w, "graft_window_hashes", "w")) }),

    ("graft_minhash_bands",
      "graft_minhash_bands(text, bands, rows, shingle_n, seed) - LSH band hashes of the text's shingle set",
      { case Seq(t, b, r, n, s) => MinhashBandsExpression(t,
          int(b, "graft_minhash_bands", "bands"), int(r, "graft_minhash_bands", "rows"),
          int(n, "graft_minhash_bands", "shingle_n"), int(s, "graft_minhash_bands", "seed")) }),

    ("graft_quantize_int8",
      "graft_quantize_int8(v) - one-pass symmetric int8 quantization: struct(scale, q array<tinyint>)",
      { case Seq(v) => QuantizeInt8(v) }),

    ("graft_token_weight",
      "graft_token_weight(token) - deterministic hashed classifier weight in [-128, 127]",
      { case Seq(t) =>
        // catalyst nodes directly: a Column-built tree stays unresolved
        // inside a FunctionRegistry builder
        Subtract(
          Cast(Conv(Substring(Md5(Cast(t, BinaryType)),
            Literal(1), Literal(2)), Literal(16), Literal(10)), LongType),
          Literal(128L)) }),

    ("graft_bpe_count",
      "graft_bpe_count(text) - byte-level BPE token count under the pinned " +
        "corpus-learned merge table (resources/graft/bpe_merges.txt)",
      { case Seq(t) => BpeCountExpression(t) }),

    ("graft_bpe_encode",
      "graft_bpe_encode(text) - BPE token-id sequence (array<int>) under the " +
        "pinned merge table; byte-value ids for alphabet chars, 256+rank for merges",
      { case Seq(t) => BpeEncodeExpression(t) }),

    ("graft_html_to_text",
      "graft_html_to_text(html) - plain text from tag-soup HTML: script/style/" +
        "comment drop, block tags to line breaks, entities decoded",
      { case Seq(t) => HtmlTextExpression(t) }),

    ("graft_html_main_text",
      "graft_html_main_text(html) - MAIN-CONTENT text: graft_html_to_text plus " +
        "boilerplate removal (nav/header/footer/aside/form containers drop; " +
        "blocks need >=5 words and <=0.33 link density)",
      { case Seq(t) => HtmlMainTextExpression(t) }),

    ("graft_fix_mojibake",
      "graft_fix_mojibake(text) - repair UTF-8 misdecoded as cp1252/Latin-1 " +
        "(conservative: only round-trips that form valid multi-byte UTF-8 rewrite)",
      { case Seq(t) => MojibakeExpression(t) }),

    ("graft_html_links",
      "graft_html_links(html) - array<struct<url,anchor>> outlinks: href-bearing " +
        "<a> tags with entity-decoded hrefs and collapsed anchor text",
      { case Seq(t) => HtmlLinksExpression(t) }),

    ("graft_resolve_url",
      "graft_resolve_url(base, rel) - RFC 3986 reference resolution " +
        "(dot-segment removal; total on garbage)",
      { case Seq(b, r) => ResolveUrlExpression(b, r) }),

    ("graft_canonical_url",
      "graft_canonical_url(url) - lowercase scheme/authority, strip default " +
        "ports, fragments, and tracking params (utm_*, gclid, ...)",
      { case Seq(t) => UrlCanonicalExpression(t) }),

    ("graft_registered_domain",
      "graft_registered_domain(url_or_host) - public-suffix registered domain " +
        "(news.bbc.co.uk -> bbc.co.uk); null for IPs and bare suffixes",
      { case Seq(t) => RegisteredDomainExpression(t) }),

    ("graft_robots_allowed",
      "graft_robots_allowed(robots_txt, path, agent) - RFC 9309 evaluation: " +
        "may agent fetch path under this robots.txt? (longest-match, allow " +
        "wins ties, '*'/'$' patterns, prefix agent groups; null robots = true)",
      { case Seq(r, p, a) => RobotsAllowedExpression(r, p, a) }),

    ("graft_script_profile",
      "graft_script_profile(text) - struct<script,mix>: dominant Unicode " +
        "script of the LETTERS and the non-dominant letter fraction " +
        "(mixed-script spam/spoofing signal); script null when letterless",
      { case Seq(t) => ScriptProfileExpression(t) }),

    ("graft_deflate_ratio",
      "graft_deflate_ratio(text) - deflate(text)/utf8_bytes: repeated-span " +
        "spam < ~0.15, natural prose ~0.3-0.8; empty -> 1.0",
      { case Seq(t) => DeflateRatioExpression(t) }),

    ("graft_robots_crawl_delay",
      "graft_robots_crawl_delay(robots_txt, agent) - Crawl-delay seconds from " +
        "the agent's selected group, or null when unset",
      { case Seq(r, a) => RobotsCrawlDelayExpression(r, a) }),

    ("graft_robots_sitemaps",
      "graft_robots_sitemaps(robots_txt) - `Sitemap:` directive urls in file " +
        "order, deduped (sitemaps.org discovery seeds; group-independent, " +
        "absolute http(s) urls only)",
      { case Seq(r) => RobotsSitemapsExpression(r) }),

    ("graft_lang_id",
      "graft_lang_id(text) - n-gram heuristic language id over the bundled marker set",
      { case Seq(t) => LangIdExpression(t, graft.ops.TextAnalysis.LangMarkers) }),

    ("marc_extract",
      "marc_extract(record, spec[, separator]) - traject spec extraction over a MARC record struct; " +
        "separator '' selects array output",
      {
        case Seq(rec, spec) =>
          MarcExtractExpression(rec, str(spec, "marc_extract", "spec"),
            Some(" "), AlternateScript.Include)
        case Seq(rec, spec, sep) =>
          val s = str(sep, "marc_extract", "separator")
          MarcExtractExpression(rec, str(spec, "marc_extract", "spec"),
            if (s.isEmpty) None else Some(s), AlternateScript.Include)
      }),

    ("extract_xpath",
      "extract_xpath(xml, xpath[, to_text]) - xpath node extraction (serialized, or text with to_text=1)",
      {
        case Seq(xml, xp) =>
          XPathExtractExpression(xml, str(xp, "extract_xpath", "xpath"), Map.empty, toText = true)
        case Seq(xml, xp, toText) =>
          XPathExtractExpression(xml, str(xp, "extract_xpath", "xpath"), Map.empty,
            toText = int(toText, "extract_xpath", "to_text") != 0)
      })
  )

  def register(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info(name, usage), builder))
    }
}
