package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval (TF-IDF / BM25) and rank fusion over the `documents`
  * table — the "find the right training shards / search the corpus" shape a
  * large-scale data pipeline needs next to the vector paths in
  * [[Similarity]].
  *
  * Scale design (100 TB corpus, bounded query):
  *  - A search query is O(10) terms and does NOT grow with the corpus, so
  *    per-document statistics (per-term tf, doc length) are computed in ONE
  *    narrow scan — `size(filter(tokens, _ = term))` per term — with no
  *    explode and no shuffle of text or tokens. The only exchanges are a
  *    single-row global aggregate (N, Σdl, per-term df) and the bounded
  *    top-k merge (TakeOrderedAndProject: per-partition heads, never a
  *    global sort).
  *  - Corpus-wide term analytics (document frequency over ALL terms) use the
  *    explode shape instead — see [[termFreqs]]/[[docFreqs]] — where the
  *    shuffle carries (doc_id, term, count) pairs, never document text.
  *
  * Engine-portability (the DuckDB oracle hash-compares values):
  *  - tokenization is lowercase + split on runs of non-letters, identical
  *    regex in Spark and `string_split_regex`;
  *  - idf/avgdl are exact one-division quotients of exact integer sums; the
  *    per-term score components are summed in FIXED term order (explicit
  *    `+` chain, never a float SUM whose order the engine picks);
  *  - the final score is rounded to 4 decimals BEFORE ranking, so rank
  *    comparisons never depend on a sub-ulp difference between engines.
  */
object Ranking {

  /** Lowercased letter-run tokens; empties from leading/trailing separators
    * dropped. Matches the oracle's
    * `list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')`. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), t => length(t) > 0)

  /** (doc, term, tf) for corpus analytics: tokens explode narrow, the
    * count shuffle carries (doc_id, term) pairs only — text stays in the
    * scan stage. */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** (term, df): number of documents containing each term. Map-side
    * distinct on (doc_id, term) before the tiny per-term count. */
  def docFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** Per-document TF-IDF keyword extraction: the k highest-scoring terms
    * of each document, score = tf · ln(N/df) rounded to 4 BEFORE ranking
    * (the BM25 rule: cross-engine rank comparisons must never hinge on
    * ln's last ulp; ties break by term). Output (doc_id, term, score,
    * rank ≤ k).
    *
    * Scale shape: ONE tokenize→(doc, term) count shuffle feeds both tf
    * and df (df = per-term count of the distinct (doc, term) rows — no
    * second scan of the text); df re-attaches by term equi-join; the
    * per-document top-k window partitions on doc_id — high cardinality,
    * so no task serializes (the q24 low-cardinality trap does not apply).
    * The corpus size N rides the plan as a broadcast one-row aggregate
    * (the bm25Stats pattern folded inline) instead of a separate
    * `docs.count()` ACTION — one job total, and the count branch is a
    * zero-column scan (metadata-weight on parquet), not a second pass
    * over the text. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = termFreqs(docs, idCol, textCol)
    // count(when(tf >= 1, 1)), not count(1): tf >= 1 always holds (a tf
    // row exists only for counted pairs) so the value is identical, but
    // an expression the optimizer cannot fold away keeps this branch's
    // subtree canonically EQUAL to the join's tf branch (plain count(1)
    // lets pruning drop the count from the lower aggregate, splitting
    // the subtrees), so the planner reuses ONE tokenize shuffle instead
    // of scanning + exploding the text twice — pinned by PlanShapeSpec
    val dfreq = tf.groupBy("term")
      .agg(count(when(col("tf") >= 1, 1)).as("df"))
    // one-row broadcast: the only crossJoin form that is scale-safe
    val nDf = broadcast(docs.agg(count(lit(1)).cast("double").as("_n")))
    val scored = tf.join(dfreq, "term")
      .crossJoin(nDf)
      .withColumn("score",
        round(col("tf").cast("double") *
          log(col("_n") / col("df").cast("double")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rank"))
  }

  /** Corpus statistics for a bounded term set, from ONE aggregate pass:
    * document count, total token count, and per-term document frequency. */
  final case class Bm25Stats(nDocs: Long, sumDl: Long, df: Map[String, Long]) {
    def avgdl: Double = if (nDocs == 0) 0.0 else sumDl.toDouble / nDocs
    /** Lucene-style always-positive idf: ln(1 + (N - df + ½)/(df + ½)). */
    def idf(term: String): Double = {
      val d = df.getOrElse(term, 0L).toDouble
      math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5))
    }
  }

  def bm25Stats(docs: DataFrame, textCol: String,
                terms: Seq[String]): Bm25Stats = {
    val toks = tokens(col(textCol))
    val base = Seq(count(lit(1)).as("n"),
      coalesce(sum(size(toks)), lit(0L)).as("sumdl"))
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(array_contains(toks, t), 1L).otherwise(0L)), lit(0L))
        .as(s"df_$i")
    }
    val row = docs.agg(base.head, (base.tail ++ dfAggs): _*).collect()(0)
    Bm25Stats(row.getLong(0), row.getLong(1),
      terms.zipWithIndex.map { case (t, i) => t -> row.getLong(2 + i) }.toMap)
  }

  /** BM25 score of every document against a bounded query-term set, in one
    * narrow scan (plus the one-row stats aggregate). Output:
    * (idCol, score) with score already rounded to 4 decimals — see the
    * object doc for why rounding precedes ranking.
    *
    * score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * the textbook BM25 with Lucene's positive idf. The denominator is
    * always > 0 (k1·(1−b) > 0 for b < 1), and a degenerate all-empty
    * corpus (avgdl = 0) scores 0 everywhere instead of dividing by zero —
    * Spark 4 ANSI throws on double division by zero, so totality here is a
    * job-survival property, not pedantry. */
  def bm25Score(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k1: Double = 1.2,
                b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Score needs at least one query term")
    require(b >= 0 && b < 1, s"b must be in [0, 1): $b")
    val stats = bm25Stats(docs, textCol, terms)
    val toked = docs.select(col(idCol), tokens(col(textCol)).as("_toks"))
    val dl = size(col("_toks")).cast("double")
    val lenNorm =
      if (stats.avgdl == 0) lit(1.0 - b)
      else lit(1.0 - b) + lit(b) * dl / lit(stats.avgdl)
    // fixed-order component chain: term order is the caller's, both engines
    // add in the same sequence, so the float sum is bit-deterministic
    val score = terms.map { t =>
      val tf = size(filter(col("_toks"), x => x === t)).cast("double")
      lit(stats.idf(t)) * tf * lit(k1 + 1.0) / (tf + lit(k1) * lenNorm)
    }.reduce(_ + _)
    toked.select(col(idCol), round(score, 4).as("score"))
  }

  /** Top-k BM25 retrieval: (doc_id, score, rank), rank 1 = best, ties on
    * the rounded score broken by doc_id. Plans as TakeOrderedAndProject —
    * per-partition top-k then a driver merge of k·partitions rows, never a
    * global sort — then ranks the k survivors. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int, k1: Double = 1.2,
               b: Double = 0.75): DataFrame = {
    val scored = bm25Score(docs, idCol, textCol, terms, k1, b)
      .orderBy(col("score").desc, col(idCol)).limit(k)
    // the window runs over the k already-selected rows, not the corpus
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("rank", row_number().over(
      Window.orderBy(col("score").desc, col(idCol))))
  }

  /** Reciprocal-rank fusion of two rank lists (full outer join on id):
    * rrf = Σ 1/(k0 + rank), a list the document is absent from contributes
    * 0. Both divisions and the two-term sum are exact IEEE operations in a
    * fixed order, so the fused score is bit-identical across engines — no
    * rounding needed. Output: (id, rrf, rank_a, rank_b) with absent ranks
    * null, ordered/ranked by (rrf desc, id). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
              k: Int, k0: Int = 60): DataFrame = {
    val l = a.select(col(idCol).as("id"), col(rankCol).cast("int").as("rank_a"))
    val r = b.select(col(idCol).as("id"), col(rankCol).cast("int").as("rank_b"))
    val fused = l.join(r, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(k0) + col("rank_a")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(k0) + col("rank_b")), lit(0.0))).as("rrf"),
        col("rank_a"), col("rank_b"))
    val top = fused.orderBy(col("rrf").desc, col("id")).limit(k)
    import org.apache.spark.sql.expressions.Window
    top.withColumn("rank", row_number().over(
      Window.orderBy(col("rrf").desc, col("id"))))
  }
}
