package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {

  private val docs = Seq(
    (1L, "Dup scan dup MERGE dup"),
    (2L, "vector vector vector merge scan table"),
    (3L, "scan table filter join group order window sort"),
    (4L, ""),
    (5L, "dup"),
    (6L, "merge merge merge merge merge merge merge merge"),
    (7L, "unrelated words only here"),
    (8L, "Vector, merge; dup!")
  )

  /** Reference BM25 computed the slow obvious way in plain Scala. */
  private def referenceScores(corpus: Seq[(Long, String)], terms: Seq[String],
                              k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    def toks(s: String) = s.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val tokenized = corpus.map { case (id, t) => id -> toks(t) }
    val n = tokenized.size
    val avgdl = tokenized.map(_._2.size).sum.toDouble / n
    val df = terms.map(t => t -> tokenized.count(_._2.contains(t))).toMap
    tokenized.map { case (id, tk) =>
      val dl = tk.size
      val score = terms.map { t =>
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        val tf = tk.count(_ == t).toDouble
        idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      id -> math.rint(score * 10000) / 10000 // round(4), ties impossible here
    }.toMap
  }

  test("bm25Score matches a plain-Scala reference implementation") {
    import spark.implicits._
    val terms = Seq("dup", "vector", "merge")
    val got = Ranking.bm25Score(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = referenceScores(docs, terms)
    assert(got.keySet == want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 5e-5, s"doc $id: got ${got(id)}, want $w")
    // empty doc and no-hit doc are total, not dropped or NaN
    assert(got(4L) == 0.0 && got(7L) == 0.0)
    // every term-matching doc outscores every no-hit doc
    assert(Seq(1L, 2L, 5L, 6L, 8L).map(got).min > got(7L))
  }

  test("bm25TopK ranks by rounded score with doc_id tie-break and bounds k") {
    import spark.implicits._
    val top = Ranking.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("dup", "vector", "merge"), k = 3).collect()
    assert(top.length == 3)
    assert(top.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // the two zero-score docs tie; with k covering them, ids break the tie
    val all = Ranking.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("dup", "vector", "merge"), k = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val zeros = all.filter(_._2 == 0.0).map(_._1).toSeq
    assert(zeros == zeros.sorted)
  }

  test("degenerate corpora: all-empty docs score 0, singleton corpus works") {
    import spark.implicits._
    val empty = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = Ranking.bm25Score(empty, "doc_id", "text", Seq("dup"))
      .collect().map(_.getDouble(1))
    assert(got.forall(_ == 0.0)) // avgdl = 0 must not divide by zero (ANSI)
    val one = Ranking.bm25TopK(Seq((9L, "dup dup")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("dup"), k = 5).collect()
    assert(one.length == 1 && one(0).getInt(2) == 1 && one(0).getDouble(1) > 0)
  }

  test("termFreqs/docFreqs agree with the narrow-scan statistics") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val stats = Ranking.bm25Stats(df, "text", Seq("dup", "vector", "merge"))
    val viaExplode = Ranking.docFreqs(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- Seq("dup", "vector", "merge"))
      assert(stats.df(t) == viaExplode.getOrElse(t, 0L), t)
    val tf = Ranking.termFreqs(df, "doc_id", "text")
      .filter(col("term") === "dup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tf == Map(1L -> 3L, 5L -> 1L, 8L -> 1L))
  }

  test("rrfFuse: exact scores, absent ranks contribute zero, ties by id") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Ranking.rrfFuse(a, b, "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(4))).toList
    // doc 20: both lists (1/62 + 1/61); docs 10/40/30: single-list
    val s20 = 1.0 / 62 + 1.0 / 61
    val s10 = 1.0 / 61
    val s40 = 1.0 / 62
    val s30 = 1.0 / 63
    assert(got == List((20L, s20, 1), (10L, s10, 2), (40L, s40, 3), (30L, s30, 4)))
    // equal single-rank entries tie-break by id
    val t1 = Seq((5L, 1)).toDF("id", "rank")
    val t2 = Seq((3L, 1)).toDF("id", "rank")
    val tied = Ranking.rrfFuse(t1, t2, "id", "rank", k = 2)
      .collect().map(_.getLong(0)).toList
    assert(tied == List(3L, 5L))
  }

  test("bm25Score matches the reference on fuzzed corpora (incl. term-free and dup-heavy)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Seq("dup", "vector", "merge", "scan", "the", "zz", "q")
    for (trial <- 1 to 5) {
      val corpus = (1L to (20 + rnd.nextInt(60))).map { id =>
        val n = rnd.nextInt(30)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val terms = rnd.shuffle(vocab).take(1 + rnd.nextInt(3))
      val got = Ranking.bm25Score(corpus.toDF("doc_id", "text"), "doc_id",
          "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = referenceScores(corpus, terms)
      assert(got.keySet == want.keySet, s"trial $trial")
      for ((id, w) <- want)
        assert(math.abs(got(id) - w) < 5e-5,
          s"trial $trial doc $id: got ${got(id)}, want $w (terms $terms)")
    }
  }

  test("bm25 plan: no explode, no text shuffle; top-k is TakeOrderedAndProject") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val scored = Ranking.bm25Score(df, "doc_id", "text", Seq("dup", "merge"))
    val scoredPlan = scored.queryExecution.executedPlan.toString
    assert(!scoredPlan.contains("Exchange"),
      s"bm25Score must be a narrow scan:\n$scoredPlan")
    assert(!scoredPlan.toLowerCase.contains("generate"),
      s"bounded-term bm25 must not explode tokens:\n$scoredPlan")
    val topPlan = Ranking.bm25TopK(df, "doc_id", "text", Seq("dup"), k = 5)
      .queryExecution.executedPlan.toString
    assert(topPlan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$topPlan")
  }

  test("tfidfKeywords: discriminative terms outrank ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark shuffle common"),
      (2L, "duck oracle common"),
      (3L, "kernel codegen common")).toDF("doc_id", "text")
    val out = Ranking.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3)))
    val byDoc = out.groupBy(_._1)
    // doc 1's top term: 'spark' (tf=2, df=1) = 2*ln(3) = 2.1972
    val d1 = byDoc(1L).sortBy(_._4)
    assert(d1.head._2 == "spark" && d1.head._3 == 2.1972)
    // 'common' appears in every doc: ln(3/3) = 0 score, never outranks
    assert(byDoc.values.flatten.filter(_._2 == "common").forall(_._3 == 0.0))
    // exactly k rows per doc, ranks 1..k
    assert(byDoc.values.forall(v => v.map(_._4).sorted.toSeq == Seq(1, 2)))
    // empty corpus total
    assert(Ranking.tfidfKeywords(docs.limit(0), "doc_id", "text").count() == 0)
  }

  test("cooccurrenceRatio: exact counts and ratio on a known corpus") {
    import spark.implicits._
    // 4 docs, "a b" appears 3 times; tokens: a x5, b x4, N = 12
    val docs = Seq("a b a b", "a b c", "c a a", "b x").toDF("text")
    val out = TextAnalysis.cooccurrenceRatio(docs, "text", minCount = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.length == 1)
    val (bg, cxy, cx, cy, ratio) = out.head
    assert(bg == "a b" && cxy == 3 && cx == 5 && cy == 4)
    assert(ratio == 3.0 * 12.0 / (5.0 * 4.0)) // = 1.8
    // empty corpus total
    assert(TextAnalysis.cooccurrenceRatio(docs.limit(0), "text").count() == 0)
  }
}
