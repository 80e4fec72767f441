package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The BPE kernel's three load-bearing equivalences:
  *  1. the hand-rolled pre-tokenizer == the published regex (the oracle's
  *     RE2 pattern) under Java's regex engine;
  *  2. the replace-sweep encoder == the canonical lowest-rank-pair BPE
  *     loop, for VALID merge tables (tables learned by training, where
  *     every merge's constituents exist before it) — the property that
  *     makes the SQL-replayable formulation a real BPE;
  *  3. the Spark expression (Column + SQL registration) == the kernel.
  */
class BpeUnitSpec extends AnyFunSuite {

  /** Deterministic sampling (scalatestplus bridge isn't on the classpath;
    * raw scalacheck generators with a fixed seed chain). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val v = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    samples(g, 300).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(g1.flatMap(a => g2.map(b => (a, b))), 150).foreach(f.tupled)

  // --- 1. pre-tokenizer vs the regex it claims to implement ---
  private val Pattern = java.util.regex.Pattern.compile(
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+")

  private def regexPreTokenize(s: String): List[String] = {
    val m = Pattern.matcher(s)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toList
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.numChar,
    1 -> Gen.oneOf('.', ',', '!', '-', '\'', '\t', '\n', '(', ')'),
    1 -> Gen.oneOf('é', 'ü', '中'))).map(_.mkString)

  test("preTokenize matches the RE2/Java pattern on arbitrary text") {
    forAll(textGen) { s =>
      val got = {
        val a = Bpe.preTokenize(s); (0 until a.size()).map(a.get).toList
      }
      assert(got == regexPreTokenize(s), s"text=${s.map(c => f"\\u${c.toInt}%04x")}")
      assert(got.mkString == s, "pre-tokens must partition the input")
    }
  }

  // --- 2. sweep encoder vs canonical lowest-rank-pair BPE ---

  /** Canonical BPE from the literature: find the present pair with the
    * lowest merge rank, merge all its occurrences in one left-to-right
    * disjoint sweep, repeat until no mergeable pair remains. */
  private def canonicalBpe(word: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var toks = word.toCharArray.map(_.toString).toList
    var done = false
    while (!done && toks.length > 1) {
      val pairs = toks.zip(toks.tail)
      val present = pairs.filter(rank.contains).map(p => rank(p) -> p)
      if (present.isEmpty) done = true
      else {
        val (_, (l, r)) = present.minBy(_._1)
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = toks
        while (rest.nonEmpty) rest match {
          case a :: b :: tail if a == l && b == r => out += (a + b); rest = tail
          case a :: tail => out += a; rest = tail
          case Nil =>
        }
        toks = out.toList
      }
    }
    toks
  }

  /** Tiny trainer (LearnBpe's algorithm) so the property only tests VALID
    * tables — ones where each merge's constituents precede it. */
  private def train(vocab: Seq[String], nMerges: Int): Seq[(String, String)] = {
    var words = vocab.map(_.toCharArray.map(_.toString).toVector).toVector
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    while (it < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Int]
      for (w <- words; i <- 0 until w.length - 1)
        counts.update((w(i), w(i + 1)), counts.getOrElse((w(i), w(i + 1)), 0) + 1)
      if (counts.isEmpty) it = nMerges
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { w =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            if (i < w.length - 1 && w(i) == best._1 && w(i + 1) == best._2) {
              out += w(i) + w(i + 1); i += 2
            } else { out += w(i); i += 1 }
          }
          out.toVector
        }
        it += 1
      }
    }
    merges.toSeq
  }

  private def compile(merges: Seq[(String, String)]): Array[(String, String)] = {
    val S = Bpe.Sep.toString
    merges.map { case (l, r) => (S + l + S + S + r + S, S + l + r + S) }.toArray
  }

  private val wordGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  test("replace-sweep encoding == canonical lowest-rank BPE on trained tables") {
    forAll(Gen.listOfN(8, wordGen), Gen.choose(0, 12)) { (vocab, n) =>
      val merges = train(vocab, n)
      val compiled = compile(merges)
      // test on the training vocab AND unseen words over the same alphabet
      for (w <- vocab ++ Seq("aaa", "aaaa", "aaaaa", "abab", "dcba")) {
        val got = Bpe.encodeWord(w, compiled).toList
        val want = canonicalBpe(w, merges)
        assert(got == want, s"word=$w merges=$merges")
        assert(got.mkString == w)
        assert(Bpe.countWord(w, compiled) == want.length)
      }
    }
  }

  test("byte remap is the GPT-2 construction: invertible, space->U+0120") {
    assert(Bpe.ByteToChar(' '.toInt) == 'Ġ') // Ġ
    assert(Bpe.ByteToChar('\t'.toInt) == 'ĉ') // ĉ
    assert(Bpe.ByteToChar('a'.toInt) == 'a')
    assert(Bpe.ByteToChar.distinct.length == 256)
    assert(!Bpe.ByteToChar.contains(Bpe.Sep), "separator must be outside the alphabet")
  }

  test("pinned merges resource loads and is non-trivial") {
    assert(Bpe.defaultMerges.length >= 50)
    // every pattern/replacement pair is a well-formed sweep rule
    Bpe.defaultMerges.foreach { case (pat, rep) =>
      assert(pat.count(_ == Bpe.Sep) == 4 && rep.count(_ == Bpe.Sep) == 2)
    }
  }
}

class BpeSparkSpec extends SparkSpec {
  test("graft_bpe_encode: ids invert to the text; count parity; vocab covers the sweep") {
    import spark.implicits._
    // invert the vocab (id -> token string) and the alphabet (char ->
    // byte): decoding the id sequence must reproduce the exact text
    import scala.jdk.CollectionConverters._
    val idToTok = Bpe.defaultVocab.asScala.map { case (t, i) => i.intValue -> t }.toMap
    val charToByte = Bpe.ByteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap
    def decode(ids: Seq[Int]): String = {
      val chars = ids.map(idToTok).mkString
      new String(chars.map(charToByte).toArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    val counter = new Bpe.Counter(Bpe.defaultMerges)
    val texts = Seq("the cat sat on the mat", "", "aaa  bbb\tccc",
      "one 22 three!!", "unseen zqxjk vvvv", "café ☃")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = df.selectExpr("id", "graft_bpe_encode(t) AS ids").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(decode(got(i.toLong)) == t, s"ids must invert to the text: $t")
      assert(got(i.toLong).length == counter.countText(t),
        s"id count must equal bpe_count: $t")
    }
    assert(got(1L).isEmpty, "empty string encodes to empty array")
    // merge outputs take 256+rank ids; some id beyond the alphabet must
    // appear for stopword-y english text
    assert(got(0L).exists(_ >= 256), "merged tokens must surface")
    val n = df.selectExpr("graft_bpe_encode(CAST(NULL AS STRING)) AS ids")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("graft_bpe_count: SQL registration == kernel, null-safe, merges bite") {
    import spark.implicits._
    val counter = new Bpe.Counter(Bpe.defaultMerges)
    val texts = Seq("the cat sat on the mat", "", "aaa  bbb\tccc",
      "one 22 three!!", "unseen zqxjk vvvv")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = df.selectExpr("id", "graft_bpe_count(t) AS n").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == counter.countText(t), s"text=$t")
    }
    assert(got(1L) == 0L, "empty string counts 0 tokens")
    // merges actually compress: fewer tokens than mapped characters
    assert(got(0L) < "the cat sat on the mat".length)
    // null in, null out
    val n = df.selectExpr("graft_bpe_count(CAST(NULL AS STRING)) AS n")
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
