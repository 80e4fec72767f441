package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. Extension surface (SURVEY.md §2.9) — not present in the
  * reference, but generalizing its per-value string pipeline (§2.4).
  *
  * All column ops are built from codegen'd built-ins (no UDFs) so they run
  * inside whole-stage codegen over a 100 TB corpus: a narrow map over the
  * text column, no shuffle, pushdown-friendly.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), """\s+""", 0))

  /** BPE-ish token count: letter runs, digit runs, or single non-space
    * symbols — a cheap proxy for subword tokenizer load. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("""[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""), lit(0)))

  /** Fraction of characters that are ASCII letters, rounded to 4 places.
    * 0.0 for the empty string — the unguarded division throws
    * DIVIDE_BY_ZERO under ANSI mode, so one empty document would kill a
    * whole corpus scan (test data has no empties; real corpora do). */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text), 4))

  /** Within-document duplicate n-gram ratio — the Gopher-style repetition
    * quality signal (fraction of word n-gram occurrences that repeat an
    * earlier one; 0 for documents shorter than n words). High values flag
    * boilerplate/spam for training-data filtering. One narrow pass: total
    * grams from the word count, distinct grams via the shingle kernel. */
  def duplicateNgramRatio(text: Column, n: Int): Column = {
    val words = split(text, " ", 0)
    val total = (size(words) - n + 1).cast("double")
    when(size(words) < n, lit(0.0))
      .otherwise(round(lit(1.0) - size(Dedup.shingleCol(text, n)) / total, 4))
  }

  /** Unicode NFC canonicalization ([[graft.functions.NormalizeTextExpression]])
    * — run before exact dedup / fingerprinting so canonically-equal
    * strings share one byte sequence; `stripControls` additionally drops
    * C0/C1 controls except tab/newline/CR. Codegen kernel with an
    * allocation-free ASCII fast path; null-total. */
  def normalizeNfc(text: Column, stripControls: Boolean = false): Column =
    graft.functions.NormalizeTextExpression.nfcNormalize(text, stripControls)

  /** HTML → plain text ([[graft.functions.HtmlTextExpression]], pinned
    * semantics there) — the web-corpus ingest step that precedes every
    * other gate: strips script/style/comments, drops tags (block tags
    * become single newlines), decodes character references, collapses
    * whitespace. Single-pass codegen kernel, total on tag soup;
    * null-total. Wire as the [[graft.examples.CurationPipeline]]
    * `htmlInput` pre-gate. */
  def htmlToText(html: Column): Column =
    graft.functions.HtmlTextExpression.htmlToText(html)

  /** HTML → MAIN-CONTENT text ([[graft.functions.HtmlMainTextExpression]],
    * pinned rules there) — [[htmlToText]] plus boilerplate removal:
    * nav/header/footer/aside/form containers drop, and surviving blocks
    * must clear a word-count floor and a link-density ceiling (the
    * readability/boilerpipe step as deterministic rules). Use instead
    * of [[htmlToText]] when the crawl page's chrome (menus, link boxes,
    * footers) must not enter the corpus. */
  def htmlMainText(html: Column, minWords: Int = 5,
                   maxLinkDensity: Double = 0.33): Column =
    graft.functions.HtmlTextExpression.htmlMainText(html, minWords, maxLinkDensity)

  /** HTTP payload bytes → text with browser-order charset sniffing
    * ([[graft.functions.HttpDecodeExpression]], pinned rules there):
    * BOM, then the Content-Type `charset=` parameter, then an HTML
    * `<meta charset>` prescan of the first 1024 bytes, then UTF-8;
    * Latin-1 labels decode as windows-1252 (the WHATWG superset rule),
    * malformed bytes become U+FFFD, never an exception. This is the
    * step between a WARC `response` payload and every text operator —
    * chain `format("warc")` → this → [[htmlToText]]/curation. */
  def decodeHttpText(payload: Column, contentType: Column): Column =
    graft.functions.HttpDecodeExpression.decodeHttpText(payload, contentType)

  /** Writing-system profile ([[graft.functions.ScriptProfileExpression]],
    * pinned there): struct(script, mix) — dominant Unicode script of the
    * letters and the mixed-script fraction (spoofing/extraction-garbage
    * signal; the cheap language-routing prior before [[langId]]). */
  def scriptProfile(text: Column): Column =
    graft.functions.ScriptProfileExpression.scriptProfile(text)

  /** Compression-ratio quality signal ([[graft.functions
    * .DeflateRatioExpression]], pinned there): deflate(text)/bytes —
    * repeated-span spam compresses below ~0.15, natural prose sits
    * ~0.3-0.8. The approximate/long-range redundancy detector that
    * complements [[repetitionRatio]]'s exact window repeats. */
  def deflateRatio(text: Column): Column =
    graft.functions.DeflateRatioExpression.deflateRatio(text)

  /** RFC 9309 robots.txt evaluation ([[graft.functions.RobotsKernel]],
    * pinned semantics there): may `agent` fetch `path` under this
    * robots.txt body? The politeness gate between a harvested frontier
    * (t46/t48) and the fetcher; null robots body = allowed. */
  def robotsAllowed(robotsTxt: Column, path: Column, agent: Column): Column =
    graft.functions.RobotsExpressions.robotsAllowed(robotsTxt, path, agent)

  /** Crawl-delay seconds for `agent`'s selected robots.txt group, or
    * null when unset (the ubiquitous non-RFC politeness extension). */
  def robotsCrawlDelay(robotsTxt: Column, agent: Column): Column =
    graft.functions.RobotsExpressions.robotsCrawlDelay(robotsTxt, agent)

  /** Mojibake repair ([[graft.functions.MojibakeExpression]], pinned
    * conservative rule there): UTF-8 text that was misdecoded as
    * Windows-1252/Latin-1 upstream re-decodes; correctly-decoded
    * accented text NEVER rewrites. Run before any byte-level hashing
    * or tokenization — mojibake docs otherwise duplicate their clean
    * twins without matching them. */
  def fixMojibake(text: Column): Column =
    graft.functions.MojibakeExpression.fixMojibake(text)

  /** HTML → (url, anchor) outlinks ([[graft.functions.HtmlLinksExpression]],
    * pinned rules there) — the web-graph construction step: raw hrefs +
    * anchor text in document order, `array<struct<url,anchor>>`. Chain
    * [[resolveUrl]] + [[canonicalUrl]] + [[registeredDomain]] for the
    * domain-graph edge list PageRank/HITS consume. */
  def htmlLinks(html: Column): Column =
    graft.functions.HtmlTextExpression.htmlLinks(html)

  /** RFC 3986 reference resolution ([[graft.functions.UrlKernel.resolve]],
    * pinned subset there): absolute refs pass through, `//`, `/`, `?`,
    * `#`, and relative paths resolve against the base with dot-segment
    * removal; total on garbage. The step between [[htmlLinks]]' raw
    * hrefs and [[canonicalUrl]]. */
  def resolveUrl(base: Column, rel: Column): Column =
    graft.functions.UrlExpressions.resolveUrl(base, rel)

  /** Canonical URL ([[graft.functions.UrlExpressions]], pinned rules
    * there): lowercase scheme/authority, default-port + fragment +
    * tracking-param strip, empty path → `/`. Run before URL-keyed exact
    * dedup so trivially-equivalent crawl URLs collapse. */
  def canonicalUrl(url: Column): Column =
    graft.functions.UrlExpressions.canonicalUrl(url)

  /** Public-suffix registered domain (`news.bbc.co.uk` → `bbc.co.uk`)
    * from a URL or bare host; null for IPs / bare public suffixes. THE
    * producer of the `domain` column for per-domain caps
    * ([[Sampling.capPerGroup]]) and per-domain stats — a raw-host
    * groupBy would treat every subdomain as its own publisher. */
  def registeredDomain(urlOrHost: Column): Column =
    graft.functions.UrlExpressions.registeredDomain(urlOrHost)

  /** Fraction of tokens equal to the single most frequent token (the
    * Gopher "most common word" repetition gate, arXiv:2112.11446 A1.1) —
    * high values flag keyword-stuffed spam. 0.0 for empty text; the raw
    * IEEE quotient of two exact ints, so engine-portable bit-for-bit.
    *
    * ONE narrow pass, no explode: the token array is sorted and the top
    * count is the longest run of equal neighbors (an `aggregate` HOF over
    * the row's own array) — the explode + two-level groupBy spelling
    * would shuffle every (doc, token) pair of the corpus to answer a
    * per-document question. */
  def topTokenFraction(text: Column): Column = {
    val toks = split(trim(text), """\s+""", 0)
    val best = aggregate(
      array_sort(toks),
      struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("b")),
      (acc, x) => {
        val run = when(x === acc.getField("p"), acc.getField("r") + 1L)
          .otherwise(lit(1L))
        struct(x.as("p"), run.as("r"),
          greatest(acc.getField("b"), run).as("b"))
      },
      acc => acc.getField("b"))
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(best.cast("double") / size(toks))
  }

  /** First-occurrence span deduplication WITHIN a document (the
    * RefinedWeb "remove repeated lines/sentences inside the page" step):
    * split on `sepPattern`, keep each span's first occurrence in order,
    * re-join with `joiner`. ONE narrow HOF pass per row — a span is kept
    * iff its first position in the array is its own (array_position is
    * 1-based, the filter index 0-based). Null-total. */
  def dedupSpansInDoc(text: Column, sepPattern: String = "\\. ",
                      joiner: String = ". "): Column = {
    val spans = split(text, sepPattern, 0)
    array_join(
      filter(spans, (x, i) => array_position(spans, x) === (i + 1).cast("long")),
      joiner)
  }

  /** Approximate top terms via the Misra–Gries sketch aggregate
    * ([[graft.functions.HeavyHittersAggregate]]): ONE bounded-memory
    * pass — each task reduces its tokens to a ≤ capacity-entry sketch
    * before the exchange, so the shuffle carries tasks × capacity
    * entries, never the term universe (the exact groupBy moves every
    * distinct term). Estimates carry the MG guarantee: within
    * N/(capacity+1) below true counts, exact when the vocabulary fits.
    * Output: (term, est_count) sorted by (est desc, term). */
  def approxTopTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
                     capacity: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(split(trim(col(textCol)), """\s+""", 0)).as("term"))
      .filter(length(col("term")) > 0)
      .agg(graft.functions.HeavyHittersAggregate
        .heavyHitters(col("term"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("term"), col("e.count").as("est_count"))

  /** Deflate compression ratio (compressed/raw bytes) — the long-range
    * repetition signal n-gram ratios miss; see
    * [[graft.functions.CompressionRatioExpression]]. Filter-only (zlib
    * lengths are implementation-versioned): gate with e.g.
    * `compressionRatio(text).between(0.3, 0.95)`. */
  def compressionRatio(text: Column): Column =
    graft.functions.CompressionRatioExpression.compressionRatio(text)

  /** ROUGE-N overlap between a candidate and a reference text (Lin 2004)
    * — the summarization/caption eval metric, needed when scoring
    * generated training pairs. Distinct-n-gram overlap (set semantics,
    * the common implementation): precision = |∩|/|cand grams|, recall =
    * |∩|/|ref grams|, f1 = 2pr/(p+r). All three are quotients of exact
    * integer set sizes (and one guarded composite), engine-portable
    * bit-for-bit; 0.0 when either side has no n-grams. ONE narrow pass —
    * both shingle sets derive from the row's own columns (the d03
    * shape). Returns struct(p, r, f1). */
  def rougeN(candidate: Column, reference: Column, n: Int = 2): Column = {
    val cs = Dedup.shingleCol(candidate, n)
    val rs = Dedup.shingleCol(reference, n)
    val inter = size(array_intersect(cs, rs)).cast("double")
    val p = when(size(cs) > 0, inter / size(cs)).otherwise(lit(0.0))
    val r = when(size(rs) > 0, inter / size(rs)).otherwise(lit(0.0))
    val f = when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0))
    struct(p.as("p"), r.as("r"), f.as("f1"))
  }

  /** Fixed-size token-window chunking with overlap — the RAG/pretraining
    * prep step that splits long documents into model-window-sized pieces
    * (stride = chunkTokens − overlap; the final partial window is kept,
    * so every token lands in ≥ 1 chunk). Returns (idCol, chunk_ix,
    * chunk, n_tokens) — one narrow generate pass: the chunk list is
    * built per row from the token array (HOF slice+join), then
    * posexplodes; nothing shuffles, and at 100 TB the output feeds a
    * partitioned write directly. Documents with no tokens emit nothing.
    *
    * Unlike [[graft.ops.Packing.packSequences]] (which concatenates
    * SHORT documents up to a budget), this SPLITS long ones; the two
    * compose into the standard fixed-window training layout. */
  def chunkDocs(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, chunkTokens: Int,
                overlap: Int = 0): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap")
    val stride = chunkTokens - overlap
    val toks = split(trim(col(textCol)), """\s+""", 0)
    // last chunk start = ceil((n - chunkTokens)/stride)·stride + 1 (≥ 1):
    // the stride-grid start whose window reaches the final token, adding
    // one partial window when the tail would otherwise be orphaned.
    // floor of the double quotient — small exact ints, and the same
    // floor-division the oracle's SQL computes
    val n = size(toks)
    val lastStart = greatest(
      floor((n - lit(chunkTokens) + lit(stride) - 1) / lit(stride))
        * lit(stride) + lit(1),
      lit(1)).cast("int")
    // isNull check explicit: length(NULL)===0 is NULL (falls through to
    // otherwise) and greatest() IGNORES nulls, so a null text would
    // fabricate one null chunk instead of none
    val starts = when(col(textCol).isNull ||
        length(trim(col(textCol))) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(1), lastStart, lit(stride)))
    df.select(col(idCol), posexplode(
        transform(starts, s =>
          array_join(slice(toks, s, lit(chunkTokens)), " ")))
        .as(Seq("chunk_ix", "chunk")))
      .select(col(idCol), col("chunk_ix").cast("long").as("chunk_ix"),
        col("chunk"), tokenCountWs(col("chunk")).cast("long").as("n_tokens"))
  }

  /** Adjacent-token co-occurrence statistics with the PMI ratio
    * P(xy)/(P(x)·P(y)) = c_xy·N / (c_x·c_y) — the association measure
    * behind collocation mining and phrase vocabularies (PMI itself is
    * ln(ratio): left to the caller, because the RATIO is a quotient of
    * exact integer counts — bit-identical on every engine — while ln's
    * last ulp is libm-specific). Output: (bigram "w1 w2", c_xy, c_x,
    * c_y, pmi_ratio) for bigrams with c_xy ≥ minCount.
    *
    * Scale shape: two explode→groupBy count passes (unigrams, bigrams)
    * whose shuffles carry (token, partial count) pairs with map-side
    * combine — text never shuffles; the count join is an equi-join on
    * the token key. The corpus token total N is a one-row aggregate
    * collected to the driver. */
  def cooccurrenceRatio(df: org.apache.spark.sql.DataFrame, textCol: String,
                        minCount: Long = 5): org.apache.spark.sql.DataFrame = {
    val toks = split(trim(col(textCol)), """\s+""", 0)
    val uni = df.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum("c")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    if (n == 0L)
      return df.sparkSession.emptyDataFrame
        .select(lit("").as("bigram"), lit(0L).as("c_xy"), lit(0L).as("c_x"),
          lit(0L).as("c_y"), lit(0.0).as("pmi_ratio")).limit(0)
    val bigrams = df
      .select(toks.as("_toks"))
      .select(explode(when(size(col("_toks")) < 2,
          array().cast("array<string>"))
        .otherwise(expr(
          "transform(sequence(1, size(_toks) - 1), " +
            "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))")))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    bigrams
      .join(uni.select(col("tok"), col("c").as("c_x")),
        split_part(col("bigram"), lit(" "), lit(1)) === col("tok"))
      .drop("tok")
      .join(uni.select(col("tok"), col("c").as("c_y")),
        split_part(col("bigram"), lit(" "), lit(2)) === col("tok"))
      .drop("tok")
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        (col("c_xy").cast("double") * lit(n.toDouble) /
          (col("c_x").cast("double") * col("c_y"))).as("pmi_ratio"))
  }

  /** Type-token ratio: distinct tokens / tokens — the classic lexical-
    * diversity signal (low = repetitive/templated). Raw IEEE quotient of
    * exact ints; 0.0 on empty text. One narrow pass. */
  def typeTokenRatio(text: Column): Column = {
    val toks = split(trim(text), """\s+""", 0)
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Fraction of DISTINCT tokens occurring exactly once (hapax legomena
    * share — vocabulary-richness companion to [[typeTokenRatio]]).
    * Computed as run-length-1 counting over the sorted token array (the
    * [[topTokenFraction]] shape — no explode, no shuffle); 0.0 on empty
    * text. */
  def hapaxFraction(text: Column): Column = {
    val toks = split(trim(text), """\s+""", 0)
    val hapax = aggregate(
      array_sort(toks),
      struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("h")),
      (acc, x) => {
        val isNew = x =!= acc.getField("p")
        struct(x.as("p"),
          when(isNew, lit(1L)).otherwise(acc.getField("r") + 1L).as("r"),
          when(isNew && acc.getField("r") === 1L, acc.getField("h") + 1L)
            .otherwise(acc.getField("h")).as("h"))
      },
      acc => when(acc.getField("r") === 1L, acc.getField("h") + 1L)
        .otherwise(acc.getField("h")))
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(hapax.cast("double") / size(array_distinct(toks)))
  }

  /** Mean word length (chars per whitespace token), rounded to 4. */
  def meanWordLen(text: Column): Column =
    round(length(regexp_replace(text, """\s+""", "")).cast("double") / tokenCountWs(text), 4)

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "was", "it",
    "for", "on", "with", "as", "by", "at", "this", "that", "be")

  /** Fraction of tokens that are stopwords, rounded to 4. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val sw = typedlit(stopwords)
    val toks = split(trim(text), """\s+""", 0)
    round(size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks), 4)
  }

  /** Composite quality score in [0,1]: rewards alphabetic text with
    * mid-length words and some (but not all) stopwords. Deterministic and
    * reproducible in plain SQL: the three summands are pre-rounded, and the
    * final sum is NOT rounded — a final round(…,4) sits on a half-way
    * boundary often enough to diverge between engines with different
    * rounding modes (Spark HALF_UP vs nearbyint half-to-even). */
  def qualityScore(text: Column): Column =
    alphaRatio(text) * lit(0.4) +
      least(meanWordLen(text) / lit(8.0), lit(1.0)) * lit(0.3) +
      least(stopwordRatio(text) * lit(4.0), lit(1.0)) * lit(0.3)

  /** Language-marker stopword sets for the n-gram/stopword-hit language-ID
    * heuristic. Sets chosen to be pairwise disjoint. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "was", "with", "this"),
    "es" -> Seq("el", "los", "una", "pero", "como"),
    "fr" -> Seq("le", "les", "dans", "avec", "pour"),
    "de" -> Seq("der", "und", "nicht", "auch", "eine"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  /** Heuristic language ID: count marker-token hits per language, pick the
    * argmax (ties broken by language-list order, 'und' when no hits). */
  def langId(text: Column): Column =
    graft.functions.LangIdExpression.langId(text, LangMarkers)

  /** Conservative PII patterns shared by the scrubber and its tests —
    * written in the regex subset Java and RE2 (the DuckDB oracle) parse
    * identically. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\b\d{3}[-.]\d{3}[-.]\d{4}\b""" -> "<PHONE>",
    """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""" -> "<IP>")

  /** Replace email addresses, phone numbers, and IPv4 addresses with typed
    * placeholder tags — the standard pre-training PII scrub pass. Pure
    * codegen regexp_replace chain: narrow, no UDF. */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Exact content fingerprint: md5 of the lowercased, space-collapsed text
    * — the exact-dedup key for 100 TB runs (hash-shuffle on 16 bytes instead
    * of full documents). */
  def fingerprintMd5(text: Column): Column =
    md5(to_binary(regexp_replace(lower(text), """\s+""", " "), lit("utf-8")))

  // ---- linear text classifier (fastText-style quality filtering) ---------

  /** Deterministic hashed token weight in [-128, 127]: the first two hex
    * digits of md5(token), minus 128. Integer weights keep the per-doc sum
    * EXACT and order-independent, so the score is bit-identical across
    * engines and partitionings (a double-weight sum is neither). */
  def hashTokenWeight(token: Column): Column =
    conv(substring(md5(token), 1, 2), 16, 10).cast("long") - 128

  /** Hashing-trick linear classifier score per document — the distributed
    * shape of fastText-style quality filtering (classify each doc against
    * a reference corpus, keep high scorers). The hashed weight table
    * stands in for trained weights (the real path is
    * [[linearScoreWithWeights]]); the Spark-side mechanics are identical:
    * tokenize narrow, score per token in codegen, one (id, long) groupBy
    * with map-side combine. Output: (idCol, n_tokens, score in [-1, 1]).
    */
  def hashedLinearScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String): org.apache.spark.sql.DataFrame =
    // explode_outer, not explode: a NULL text yields one null-token row,
    // so the document survives as (id, 0 tokens, null score) instead of
    // vanishing from the output — totality, like the rest of the stack
    df.select(col(idCol), explode_outer(split(col(textCol), " ")).as("_tok"))
      .select(col(idCol), hashTokenWeight(col("_tok")).as("_w"), col("_tok"))
      .groupBy(idCol)
      .agg(sum(col("_w")).as("_wsum"), count(col("_tok")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        // no round(): the operands are exactly-representable integers, so
        // the IEEE quotient is bit-identical on every engine — while
        // round() diverges on decimal ties (Spark rounds the shortest
        // decimal rendering, DuckDB the binary double). The zero-token
        // guard keeps ANSI division total on null-text documents.
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(col("_wsum") / (lit(128.0) * col("n_tokens")))
          .as("score"))

  /** Linear classifier with a REAL weight table (token, weight): tokens
    * explode narrow, weights broadcast-join (a vocabulary fits an executor
    * at any corpus scale), unknown tokens contribute 0, one groupBy of
    * (id, double) pairs. The mean-weight score feeds a keep/drop gate. */
  def linearScoreWithWeights(df: org.apache.spark.sql.DataFrame, idCol: String,
                             textCol: String,
                             weights: org.apache.spark.sql.DataFrame,
                             tokenCol: String = "token",
                             weightCol: String = "weight"): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode_outer(split(col(textCol), " ")).as(tokenCol))
      .join(broadcast(weights.select(col(tokenCol), col(weightCol))),
        Seq(tokenCol), "left")
      .groupBy(idCol)
      .agg(sum(coalesce(col(weightCol), lit(0.0))).as("wsum"),
        count(col(tokenCol)).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(col("wsum") / col("n_tokens")).as("score"))

  /** Unigram-LM quality score — the CCNet/KenLM-shaped perplexity filter,
    * distributed. Each document scores its mean information content in
    * BITS PER TOKEN under the corpus's own unigram model (Laplace
    * smoothed): low = common fluent tokens, high = rare-token soup.
    *
    * Determinism: per-token weights are INTEGER milli-bits
    * (round(−1000·log2 p̂), computed once on the driver), so the per-doc
    * sum is exact and order-independent; the final score is one exact
    * IEEE division. The oracle recomputes the same ln(x)/ln(2) operator
    * tree, so both engines round the same doubles.
    *
    * Scale: pass 1 shuffles (token, count) pairs only; the retained
    * vocabulary (top `maxVocab` by count, ties by token) is a bounded
    * driver collect broadcast back; pass 2 is explode + broadcast join +
    * one (id, long) groupBy with map-side combine — text never shuffles.
    * Out-of-vocabulary tokens take the smoothed unseen-token weight.
    * Output: (idCol, n_tokens, bits, score), null score on token-less
    * docs (explode_outer totality, the [[hashedLinearScore]] contract). */
  /** The trained model behind [[lmBitsScore]]: per-token integer
    * milli-bit weights plus the smoothed unseen-token weight. Train once
    * in batch, then score anywhere — including as a stateless literal-map
    * column in a stream ([[lmBitsCol]]). */
  final case class LmBitsModel(weights: Array[(String, Long)], oov: Long)

  def lmBitsModel(df: org.apache.spark.sql.DataFrame, textCol: String,
                  maxVocab: Int = 1 << 16): LmBitsModel = {
    val cnts = df.select(explode(split(col(textCol), " ")).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).as("_c"))
    val totRow = cnts.agg(coalesce(sum("_c"), lit(0L)), count(lit(1))).collect()(0)
    val total = totRow.getLong(0)
    val v = totRow.getLong(1)
    def bits(c: Long): Long =
      math.round(-1000.0 *
        (math.log((c + 1.0) / ((total + v) + 1.0)) / math.log(2.0)))
    LmBitsModel(
      cnts.orderBy(col("_c").desc, col("_tok").asc).limit(maxVocab)
        .collect().map(r => (r.getString(0), bits(r.getLong(1)))),
      bits(0L))
  }

  /** Stateless per-row LM score from a trained model: mean milli-bits per
    * token via a LITERAL weight map — a pure column expression (no join,
    * no state), so it gates a structured stream inside the ingest stage.
    * The map literal lives in the plan: meant for the bounded-vocab gate
    * contract (10⁴-10⁵ entries), not an unbounded vocabulary. Null or
    * token-less text scores null (same totality as the batch frame). */
  def lmBitsCol(text: Column, model: LmBitsModel): Column = {
    val m = map(model.weights.flatMap { case (t, w) =>
      Seq(lit(t), lit(w)) }.toIndexedSeq: _*)
    val toks = split(text, " ")
    // try_element_at, not element_at: ANSI mode throws on a missing map
    // key, and an OOV token must cost the smoothed unseen weight instead
    // of killing the stream
    val bits = aggregate(toks, lit(0L),
      (acc, t) => acc + coalesce(try_element_at(m, t), lit(model.oov)))
    when(text.isNull || size(toks) === 0, lit(null).cast("double"))
      .otherwise(bits / (lit(1000.0) * size(toks)))
  }

  def lmBitsScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String,
                  maxVocab: Int = 1 << 16): org.apache.spark.sql.DataFrame = {
    val model = lmBitsModel(df, textCol, maxVocab)
    val vocab = model.weights
    val oov = model.oov
    val spark = df.sparkSession
    import spark.implicits._
    val weights = spark.createDataset(vocab.toSeq).toDF("_tok", "_wt")
    df.select(col(idCol), explode_outer(split(col(textCol), " ")).as("_tok"))
      .join(broadcast(weights), Seq("_tok"), "left")
      .groupBy(idCol)
      .agg(sum(when(col("_tok").isNull, lit(0L))
            .otherwise(coalesce(col("_wt"), lit(oov)))).as("bits"),
        count(col("_tok")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        coalesce(col("bits"), lit(0L)).as("bits"),
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(col("bits") / (lit(1000.0) * col("n_tokens")))
          .as("score"))
  }

  /** Interpolated hashed-BIGRAM language-model score — the step from
    * [[lmBitsScore]]'s unigram filter toward the n-gram LMs real
    * curation stacks use (CCNet's KenLM): each adjacent token pair
    * scores −log2(λ·p̂₂ + (1−λ)·p̂₁) bits, where p̂₂ is the
    * Laplace-smoothed probability of the pair's hashed BIGRAM bucket
    * (16⁴ buckets) and p̂₁ of the second token's unigram bucket (16³) —
    * the hashing-trick feature space, so the model is bounded driver
    * state at any corpus size. Fluent common phrases score low;
    * rare-pair soup scores high even when its unigrams are common (the
    * signal a unigram filter cannot see). λ = 7/10 fixed.
    *
    * Determinism (the t15 discipline, applied per POSITION): each
    * pair's milli-bits are round(−1000·ln(mix)/ln(2)) of doubles built
    * from exact integer counts in a fixed operator tree, and the
    * per-document sum is over INTEGERS. Docs with < 2 tokens score
    * null. Output: (idCol, n_pairs, bits, score = bits/(1000·n_pairs)).
    *
    * Scale: ONE bounded bucket-count aggregate — both marginals come out
    * of a single grouping-sets pass over the exploded pair keys (≤ 16³ +
    * 16⁴ groups survive map-side combine), collected and broadcast;
    * scoring is one explode → two broadcast joins → one (id, long)
    * groupBy — text never shuffles, and the tokenize+md5 subtree (a
    * one-pass codegen kernel, [[graft.functions.BigramBucketsExpression]])
    * executes exactly twice: once for the model, once for scoring. */
  def lmBigramBitsScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String): org.apache.spark.sql.DataFrame = {
    // per-row array of 7-hex-char keys (3 unigram-bucket chars of token
    // i+1 ++ 4 bigram-bucket chars of the pair), built in one kernel pass
    val occ = df.select(col(idCol), explode_outer(
      graft.functions.BigramBucketsExpression.bigramBuckets(col(textCol)))
      .as("_bk"))
    // single pass, both marginals: grouping sets {(_b1), (_b2)} keep the
    // aggregate state bounded (16³ + 16⁴ groups) at any corpus size —
    // never the joint (b1, b2) table, whose 16⁷ key space would outgrow
    // driver state on a large corpus
    val marginals = occ.filter(col("_bk").isNotNull)
      .select(substring(col("_bk"), 1, 3).as("_b1"),
        substring(col("_bk"), 4, 4).as("_b2"))
      .groupingSets(Seq(Seq(col("_b1")), Seq(col("_b2"))),
        col("_b1"), col("_b2"))
      .agg(count(lit(1)).as("_c")).collect()
    val c1Rows = marginals.filter(!_.isNullAt(0))
      .map(r => (r.getString(0), r.getLong(2)))
    val c2Rows = marginals.filter(!_.isNullAt(1))
      .map(r => (r.getString(1), r.getLong(2)))
    val n = c2Rows.map(_._2).sum // total pairs (same for both marginals)
    val spark = df.sparkSession
    import spark.implicits._
    val w1 = spark.createDataset(c1Rows.toSeq).toDF("_b1", "_c1")
    val w2 = spark.createDataset(c2Rows.toSeq).toDF("_b2", "_c2")
    val b1Space = 4096.0
    val b2Space = 65536.0
    // exact-integer operands, fixed operator tree — both engines round
    // the same doubles (mirrored in the t37 oracle)
    val p1 = (coalesce(col("_c1"), lit(0L)) + lit(1.0)) / lit(n + b1Space)
    val p2 = (coalesce(col("_c2"), lit(0L)) + lit(1.0)) / lit(n + b2Space)
    val bitsExpr = round(lit(-1000.0) *
      (log(lit(0.7) * p2 + lit(0.3) * p1) / log(lit(2.0)))).cast("long")
    occ.select(col(idCol),
        substring(col("_bk"), 1, 3).as("_b1"),
        substring(col("_bk"), 4, 4).as("_b2"))
      .join(broadcast(w1), Seq("_b1"), "left")
      .join(broadcast(w2), Seq("_b2"), "left")
      .groupBy(idCol)
      .agg(sum(when(col("_b1").isNull, lit(0L)).otherwise(bitsExpr)).as("bits"),
        count(col("_b1")).as("n_pairs"))
      .select(col(idCol), col("n_pairs"),
        coalesce(col("bits"), lit(0L)).as("bits"),
        when(col("n_pairs") === 0, lit(null).cast("double"))
          .otherwise(col("bits") / (lit(1000.0) * col("n_pairs")))
          .as("score"))
  }

  /** DSIR-style importance weights over hashed unigram buckets (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every document by how much more likely its
    * tokens are under a TARGET distribution (the rows matching
    * `targetFilter` — a trusted high-quality subset) than under the raw
    * corpus. log w(doc) = Σ_tokens [ln p̂_target(b) − ln p̂_raw(b)] with
    * b = hashed token bucket, both distributions Laplace-smoothed over
    * the fixed bucket space. High-scoring documents are the ones
    * importance resampling keeps when curating toward the target domain.
    *
    * Buckets are the first `hexChars` hex digits of md5(token) — 16^h
    * buckets (default 4096), the hashing-trick feature space of the
    * paper, engine-portable because the bucket id is a substring of a
    * standard digest, not a private hash.
    *
    * Determinism (the [[lmBitsScore]] discipline): per-bucket weights
    * are INTEGER micro-nats — floor(10⁶·(ln p̂_t − ln p̂_r)), computed
    * once on the driver — so the per-doc sum is exact and
    * order-independent; the mean is one exact IEEE division. floor, not
    * round: weights here can be negative, and half-even/half-away
    * conventions disagree across engines at .5 while floor never does.
    *
    * Scale: pass 1 shuffles (bucket, count, targetCount) partial
    * aggregates — at most 16^h groups survive map-side combine per task;
    * the collected model is ≤ 16^h rows of bounded driver state,
    * broadcast back. Pass 2 is explode → broadcast join → one (id, long)
    * groupBy — text never shuffles. Output: (idCol, n_tokens,
    * logw_micro, avg_logw), null avg on token-less docs. */
  /** The trained model behind [[dsirScore]]: per-bucket integer
    * micro-nat weights (the [[LmBitsModel]] pattern — train once in
    * batch, score anywhere, including as a stateless literal-map column
    * in a stream via [[dsirCol]]). Buckets absent from the training
    * corpus weigh 0. */
  final case class DsirModel(weights: Array[(String, Long)], hexChars: Int)

  def dsirModel(df: org.apache.spark.sql.DataFrame, textCol: String,
                targetFilter: Column, hexChars: Int = 3): DsirModel = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1, 8]: $hexChars (16^h buckets must stay " +
        "bounded driver state; 8 hex digits is already 4.3e9 — far past " +
        "the hashing-trick regime)")
    val nBuckets = math.pow(16.0, hexChars)
    val cnts = df.select(targetFilter.as("_tgt"),
        explode(split(col(textCol), " ")).as("_tok"))
      .select(substring(md5(col("_tok")), 1, hexChars).as("_b"), col("_tgt"))
      .groupBy("_b")
      .agg(count(lit(1)).as("_cr"),
        sum(when(col("_tgt"), lit(1L)).otherwise(lit(0L))).as("_ct"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nr = cnts.map(_._2).sum
    val nt = cnts.map(_._3).sum
    def wt(cr: Long, ct: Long): Long =
      math.floor(1e6 * (math.log((ct + 1.0) / (nt + nBuckets)) -
        math.log((cr + 1.0) / (nr + nBuckets)))).toLong
    DsirModel(cnts.map { case (b, cr, ct) => (b, wt(cr, ct)) }, hexChars)
  }

  /** Stateless per-row DSIR score from a trained model: mean micro-nats
    * per token via a LITERAL bucket-weight map — a pure column
    * expression (≤ 16^hexChars entries in the plan), so it gates a
    * structured stream inside the ingest stage like [[lmBitsCol]].
    * Unseen buckets weigh 0; null or token-less text scores null. */
  def dsirCol(text: Column, model: DsirModel): Column = {
    val m = map(model.weights.flatMap { case (b, w) =>
      Seq(lit(b), lit(w)) }.toIndexedSeq: _*)
    val toks = split(text, " ")
    val sum = aggregate(toks, lit(0L), (acc, t) =>
      acc + coalesce(try_element_at(m, substring(md5(t), 1, model.hexChars)),
        lit(0L)))
    when(text.isNull || size(toks) === 0, lit(null).cast("double"))
      .otherwise(sum / (lit(1.0e6) * size(toks)))
  }

  def dsirScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, targetFilter: Column,
                hexChars: Int = 3): org.apache.spark.sql.DataFrame = {
    val model = dsirModel(df, textCol, targetFilter, hexChars)
    val toks = df.select(col(idCol),
      explode_outer(split(col(textCol), " ")).as("_tok"))
      .withColumn("_b", substring(md5(col("_tok")), 1, hexChars))
    val spark = df.sparkSession
    import spark.implicits._
    val weights = spark.createDataset(model.weights.toSeq).toDF("_b", "_wt")
    // every non-null token hashes to a bucket the model saw (trained on
    // this same frame), so the broadcast join is effectively total; the
    // left join + coalesce(0) keeps an unseen bucket (scoring a FOREIGN
    // frame against this model) harmless instead of row-dropping
    toks.join(broadcast(weights), Seq("_b"), "left")
      .groupBy(idCol)
      .agg(sum(when(col("_tok").isNull, lit(0L))
          .otherwise(coalesce(col("_wt"), lit(0L)))).as("logw_micro"),
        count(col("_tok")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"),
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(col("logw_micro") / (lit(1.0e6) * col("n_tokens")))
          .as("avg_logw"))
  }

  /** Corpus drift report — snapshot-over-snapshot distribution shift,
    * the "did this crawl change under me" check a training pipeline runs
    * before kicking off a multi-week job. Per group (language, source,
    * split): document/token deltas, the fraction of new-snapshot tokens
    * falling in hashed-unigram buckets the OLD snapshot never saw
    * (vocabulary novelty), and the L1 distance between the two
    * bucket distributions (total-variation ×2 over the hashing-trick
    * feature space — the [[dsirScore]] buckets).
    *
    * Determinism: every per-bucket L1 contribution is
    * floor(10⁶·|p_new − p_old|) — both p's are quotients of exact
    * integers, the subtraction/abs are single IEEE ops, and the
    * cross-bucket SUM is over integers, so no float-accumulation order
    * can leak in (the t15/t33 discipline). Rates are exact integer
    * quotients.
    *
    * Scale: two bucket-count aggregates (≤ groups × 16^hexChars rows
    * survive map-side combine), a full-outer bucket join, per-group
    * totals joined back, one integer aggregate — text never shuffles.
    * Output, one row per group present in either snapshot:
    * (groupCol, n_docs_old, n_docs_new, n_tokens_old, n_tokens_new,
    * new_bucket_tokens, new_bucket_rate, l1_drift_micro). */
  def driftReport(oldDf: org.apache.spark.sql.DataFrame,
                  newDf: org.apache.spark.sql.DataFrame,
                  textCol: String, groupCol: String,
                  hexChars: Int = 3): org.apache.spark.sql.DataFrame = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1, 8]: $hexChars")
    def buckets(df: org.apache.spark.sql.DataFrame, cnt: String) =
      df.select(col(groupCol).as("_g"),
          explode(split(col(textCol), " ")).as("_tok"))
        .select(col("_g"), substring(md5(col("_tok")), 1, hexChars).as("_b"))
        .groupBy("_g", "_b").agg(count(lit(1)).as(cnt))
    def totals(df: org.apache.spark.sql.DataFrame, docs: String, toks: String) =
      df.select(col(groupCol).as("_g"),
          size(split(col(textCol), " ")).cast("long").as("_n"))
        .groupBy("_g")
        .agg(count(lit(1)).as(docs), sum(col("_n")).as(toks))
    val bo = buckets(oldDf, "_co")
    val bn = buckets(newDf, "_cn")
    val to = totals(oldDf, "n_docs_old", "n_tokens_old")
    val tn = totals(newDf, "n_docs_new", "n_tokens_new")
    val tot = to.join(tn, Seq("_g"), "full_outer")
      .select(col("_g"),
        coalesce(col("n_docs_old"), lit(0L)).as("n_docs_old"),
        coalesce(col("n_docs_new"), lit(0L)).as("n_docs_new"),
        coalesce(col("n_tokens_old"), lit(0L)).as("n_tokens_old"),
        coalesce(col("n_tokens_new"), lit(0L)).as("n_tokens_new"))
    val perBucket = bo.join(bn, Seq("_g", "_b"), "full_outer")
      .select(col("_g"),
        coalesce(col("_co"), lit(0L)).as("_co"),
        coalesce(col("_cn"), lit(0L)).as("_cn"))
      .join(tot, "_g")
      // greatest(total, 1): an absent-side group divides 0/1, never 0/0
      // (Spark 4 ANSI double division THROWS on /0)
      .withColumn("_contrib", floor(lit(1e6) * abs(
        col("_cn") / greatest(col("n_tokens_new"), lit(1L)) -
        col("_co") / greatest(col("n_tokens_old"), lit(1L)))).cast("long"))
      .withColumn("_novel", when(col("_co") === 0, col("_cn")).otherwise(lit(0L)))
    val agg = perBucket.groupBy("_g")
      .agg(sum(col("_contrib")).as("l1_drift_micro"),
        sum(col("_novel")).as("new_bucket_tokens"))
    tot.join(agg, Seq("_g"), "left")
      .select(col("_g").as(groupCol),
        col("n_docs_old"), col("n_docs_new"),
        col("n_tokens_old"), col("n_tokens_new"),
        coalesce(col("new_bucket_tokens"), lit(0L)).as("new_bucket_tokens"),
        (coalesce(col("new_bucket_tokens"), lit(0L)) /
          greatest(col("n_tokens_new"), lit(1L)).cast("double"))
          .as("new_bucket_rate"),
        coalesce(col("l1_drift_micro"), lit(0L)).as("l1_drift_micro"))
  }

  /** Winnowing fingerprint (row-level; Schleimer/Wilkerson/Aiken-style):
    * k-gram rolling hashes, minimum per sliding window, distinct kept
    * set. The kernel form ([[graft.functions.WinnowExpression]]) shares
    * [[winnowCore]], so driver and engine fingerprints are identical. */
  def winnow(text: String, k: Int = 5, window: Int = 4): Set[Long] =
    winnowCore(text, k, window).toSet

  /** Sorted distinct window minima of the k-gram rolling hashes —
    * allocation-light: base-31 polynomial over Z/2^64 (a RING, so the
    * leading term subtracts back out exactly: h' = (h − c_out·31^(k−1))
    * ·31 + c_in, one multiply-add per character instead of O(k)); no
    * per-gram strings; minima collected into one array, sorted,
    * deduplicated in place. */
  private[graft] def winnowCore(text: String, k: Int,
                                window: Int): Array[Long] = {
    val s = text.toLowerCase.replaceAll("""\s+""", " ")
    val n = s.length
    if (n == 0) return Array.emptyLongArray
    if (n < k) return Array(polyHash(s))
    val m = n - k + 1
    var pow = 1L
    var i = 1
    while (i < k) { pow *= 31L; i += 1 }
    val grams = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * 31L + s.charAt(i); i += 1 }
    grams(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * 31L + s.charAt(i + k - 1)
      grams(i) = h
      i += 1
    }
    if (m <= window) {
      var mn = grams(0); i = 1
      while (i < m) { if (grams(i) < mn) mn = grams(i); i += 1 }
      return Array(mn)
    }
    val mins = new Array[Long](m - window + 1)
    i = 0
    while (i <= m - window) {
      var mn = grams(i)
      var j = i + 1
      while (j < i + window) { if (grams(j) < mn) mn = grams(j); j += 1 }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    // in-place dedup of the sorted minima
    var w = 1
    i = 1
    while (i < mins.length) {
      if (mins(i) != mins(w - 1)) { mins(w) = mins(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(mins, w)
  }

  /** Whole-string base-31 polynomial over Z/2^64 (the short-text path). */
  private def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31L + s.charAt(i); i += 1 }
    h
  }
}
