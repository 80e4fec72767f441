package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenizer (GPT-2 construction: byte-to-unicode alphabet
  * remap, pre-tokenization into word/number/symbol/whitespace runs, then
  * merges applied in rank order, each as ONE left-to-right disjoint sweep).
  *
  * The merge sweep is deliberately formulated so it is bit-reproducible by
  * a chain of SQL `replace()` calls: a token sequence is encoded as a
  * string with a DOUBLE separator at every boundary ("▁▁a▁▁b▁▁"), and one
  * sweep of merge (l, r) is exactly `s.replace("▁l▁▁r▁", "▁lr▁")` —
  * leftmost, non-overlapping, scan continuing after each replacement,
  * which is the same contract as Java `String.replace` and DuckDB/ANSI
  * `replace()`. The double separator means back-to-back occurrences share
  * no characters, so one pass == the tokenizer's one greedy sweep. For a
  * valid merge table (every merge's constituents are produced by earlier
  * merges), applying merges in rank order with one sweep each is
  * equivalent to the classic lowest-rank-pair loop: a swept pair cannot
  * reappear (merging only concatenates neighbors, and any pair involving a
  * merge's output token necessarily has a higher rank than the merge that
  * created it).
  *
  * The merge table is LEARNED from the corpus by [[graft.tools.LearnBpe]]
  * and pinned as a classpath resource, so engine and oracle replay the
  * identical table. Extension surface (SURVEY.md §2.9): token-count
  * realism for the packing / token-budget family — whitespace counts
  * undercount code/markup-heavy documents that a real subword tokenizer
  * (and therefore a real training-token budget) charges much more for.
  *
  * Scale: a narrow codegen map over the text column — no shuffle, no UDF;
  * per-word results are memoized per task (crawled corpora repeat words
  * heavily), so steady-state cost is one hash lookup per word.
  */
object Bpe {

  /** Token-boundary separator for the sweep encoding. Chosen OUTSIDE the
    * byte-remapped alphabet (which is ⊂ [U+0021..U+0143]) so no corpus
    * byte can collide with it. */
  val Sep = '▁'
  private val SepS = Sep.toString

  /** GPT-2 bytes_to_unicode: printable latin-1 bytes keep their codepoint,
    * the 68 others (controls, space, DEL, soft hyphen, ...) shift to
    * 256+n in byte order — every byte becomes one printable char and the
    * mapping is invertible. (Public construction from the GPT-2 encoder.) */
  val ByteToChar: Array[Char] = {
    val keep = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  @inline private def isLetter(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isDigit(c: Char) = c >= '0' && c <= '9'
  @inline private def isWs(c: Char) =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Pre-tokenize into runs, hand-rolled but EXACTLY the leftmost-first
    * greedy semantics of the RE2/Java pattern
    * {{{ ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+}}}
    * (a single leading 0x20 attaches to the following word/number/symbol
    * run; whitespace runs otherwise stand alone). ASCII classes on both
    * sides keep the oracle's RE2 and the JVM in exact agreement. */
  def preTokenize(text: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      var start = i
      var j = if (c == ' ' && i + 1 < n && !isWs(text.charAt(i + 1))) i + 1 else i
      val c0 = text.charAt(j)
      if (isLetter(c0)) {
        j += 1; while (j < n && isLetter(text.charAt(j))) j += 1
      } else if (isDigit(c0)) {
        j += 1; while (j < n && isDigit(text.charAt(j))) j += 1
      } else if (!isWs(c0)) {
        j += 1; while (j < n && { val x = text.charAt(j); !isWs(x) && !isLetter(x) && !isDigit(x) }) j += 1
      } else {
        // whitespace run (includes a lone trailing ' ' with nothing after)
        j = i; j += 1; while (j < n && isWs(text.charAt(j))) j += 1
        start = i
      }
      out.add(text.substring(start, j))
      i = j
    }
    out
  }

  /** Raw pre-token → byte-remapped word over the BPE alphabet. */
  def mapWord(tok: String): String = {
    val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** Merge table: resource lines "left<TAB>right" in rank order, compiled
    * to the sweep's (pattern, replacement) pairs. */
  def loadMerges(resource: String): Array[(String, String)] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"BPE merges resource not found: $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val t = line.indexOf('\t')
      require(t > 0, s"bad merges line: $line")
      val l = line.substring(0, t); val r = line.substring(t + 1)
      (SepS + l + SepS + SepS + r + SepS, SepS + l + r + SepS)
    }.toArray
    finally src.close()
  }

  val DefaultMergesResource = "/graft/bpe_merges.txt"
  lazy val defaultMerges: Array[(String, String)] = loadMerges(DefaultMergesResource)

  /** Seed the sweep encoding: "▁▁c1▁▁c2▁▁...▁▁". */
  private def seed(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 3 + 2)
    sb.append(Sep).append(Sep)
    var i = 0
    while (i < word.length) { sb.append(word.charAt(i)).append(Sep).append(Sep); i += 1 }
    sb.toString
  }

  /** BPE a mapped word: token strings in order. (Test/debug surface; the
    * hot path is [[countWord]].) */
  def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    val merged = runMerges(word, merges)
    // split on the double separator, dropping the empty ends
    merged.split(SepS + SepS).filter(_.nonEmpty)
  }

  private def runMerges(word: String, merges: Array[(String, String)]): String = {
    var s = seed(word)
    var i = 0
    while (i < merges.length) {
      val m = merges(i)
      // skip the allocation when the pattern cannot occur
      if (s.length >= m._1.length && s.contains(m._1)) s = s.replace(m._1, m._2)
      i += 1
    }
    s
  }

  def countWord(word: String, merges: Array[(String, String)]): Int = {
    val s = runMerges(word, merges)
    var seps = 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == Sep) seps += 1; i += 1 }
    seps / 2 - 1
  }

  /** Token-string → id vocabulary, the GPT-2 construction: the 256
    * byte-alphabet chars take their BYTE value as id (invertible through
    * [[ByteToChar]]), then merge k's output token (its two constituents
    * concatenated) takes id 256+k — first rank wins if two merges
    * produce the same string. Every token the sweep can emit is covered:
    * a token is either a single alphabet char or the output of exactly
    * the replace() that created it. */
  def vocabOf(merges: Array[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](512)
    var b = 0
    while (b < 256) { m.put(ByteToChar(b).toString, Integer.valueOf(b)); b += 1 }
    var k = 0
    while (k < merges.length) {
      // rep = Sep + l + r + Sep; the token string is l+r
      val rep = merges(k)._2
      val tok = rep.substring(1, rep.length - 1)
      if (!m.containsKey(tok)) m.put(tok, Integer.valueOf(256 + k))
      k += 1
    }
    m
  }
  lazy val defaultVocab: java.util.HashMap[String, Integer] = vocabOf(defaultMerges)

  /** BPE a mapped word to ids under the vocabulary. */
  def encodeWordIds(word: String, merges: Array[(String, String)],
                    vocab: java.util.HashMap[String, Integer]): Array[Int] = {
    val toks = encodeWord(word, merges)
    val out = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      val id = vocab.get(toks(i))
      // structurally impossible for a table built by vocabOf over the
      // SAME merges (see vocabOf); a miss means mismatched resources
      require(id != null,
        s"BPE token '${toks(i)}' missing from vocabulary — merges/vocab resources disagree")
      out(i) = id.intValue()
      i += 1
    }
    out
  }

  /** Per-task word→ids memo (the [[Counter]] shape, array-valued). */
  final class Encoder(merges: Array[(String, String)],
                      vocab: java.util.HashMap[String, Integer],
                      cacheCap: Int = 1 << 16) {
    private val cache = new java.util.HashMap[String, Array[Int]](1024)
    def encodeText(text: String): Array[Int] = {
      val toks = preTokenize(text)
      val parts = new java.util.ArrayList[Array[Int]](toks.size())
      var total = 0
      var i = 0
      while (i < toks.size()) {
        val raw = toks.get(i)
        var ids = cache.get(raw)
        if (ids == null) {
          ids = encodeWordIds(mapWord(raw), merges, vocab)
          if (cache.size() >= cacheCap) cache.clear()
          cache.put(raw, ids)
        }
        parts.add(ids)
        total += ids.length
        i += 1
      }
      val out = new Array[Int](total)
      var off = 0
      i = 0
      while (i < parts.size()) {
        val p = parts.get(i)
        System.arraycopy(p, 0, out, off, p.length)
        off += p.length
        i += 1
      }
      out
    }
  }

  /** Per-task word→count memo: crawled text repeats words heavily, so the
    * steady state is one hash probe per word. Cleared when full — a cap,
    * not an LRU, because clearing is O(1) amortized and the refill cost is
    * one sweep per distinct word. */
  final class Counter(merges: Array[(String, String)], cacheCap: Int = 1 << 16) {
    private val cache = new java.util.HashMap[String, Integer](1024)
    def countText(text: String): Long = {
      val toks = preTokenize(text)
      var total = 0L
      var i = 0
      while (i < toks.size()) {
        val raw = toks.get(i)
        var c = cache.get(raw)
        if (c == null) {
          c = Integer.valueOf(countWord(mapWord(raw), merges))
          if (cache.size() >= cacheCap) cache.clear()
          cache.put(raw, c)
        }
        total += c.intValue()
        i += 1
      }
      total
    }
  }
}

/** `graft_bpe_count(text)`: BPE token count of the text under the pinned
  * corpus-learned merge table — LongType, 0 for the empty string, null for
  * null. Primitive-returning kernel, so codegen rides `nullSafeCodeGen`
  * (the Simhash pattern) and the count lands unboxed in the generated
  * long slot. */
case class BpeCountExpression(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val counter = new Bpe.Counter(Bpe.defaultMerges)

  def compute(text: AnyRef): Long =
    counter.countText(text.asInstanceOf[UTF8String].toString)

  override def nullSafeEval(t: Any): Any = compute(t.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeCountExpression].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCountExpression {
  def bpeCount(text: Column): Column =
    ColumnBridge.column(BpeCountExpression(ColumnBridge.expression(text)))
}

/** `graft_bpe_encode(text)`: the text's BPE token-id sequence
  * (`array<int>`, loader-ready) under the pinned merge table and the
  * GPT-2 id construction ([[Bpe.vocabOf]]: byte value for alphabet
  * chars, 256+rank for merge outputs). Empty string → empty array; null
  * → null. Same replayable-sweep construction as [[BpeCountExpression]],
  * so a SQL oracle can replay the identical id sequence; shipped in
  * [[graft.examples.CurationPipeline.exportTrainingShards]]'s sidecar so
  * shards need no loader-side re-tokenization. */
case class BpeEncodeExpression(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val encoder =
    new Bpe.Encoder(Bpe.defaultMerges, Bpe.defaultVocab)

  def compute(text: AnyRef): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(
        encoder.encodeText(text.asInstanceOf[UTF8String].toString))

  override def nullSafeEval(t: Any): Any = compute(t.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncExpr", this, classOf[BpeEncodeExpression].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeExpression {
  def bpeEncode(text: Column): Column =
    ColumnBridge.column(BpeEncodeExpression(ColumnBridge.expression(text)))
}
