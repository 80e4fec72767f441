package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Clustering, Ranking, Similarity, TextAnalysis}

/** Retrieval + clustering queries: lexical BM25 ranking, hybrid
  * lexical/vector fusion, and k-means corpus bucketing.
  *
  * Oracle determinism notes (beyond QueryPack's rules):
  *  - BM25 components are summed in fixed term order on both sides and the
  *    score rounds to 4 decimals BEFORE ranking (see [[graft.ops.Ranking]]);
  *    the oracle SQL mirrors the engine's exact operator order, and derived
  *    constants are written as the same arithmetic (`1.2 + 1.0`, not
  *    `2.2`) so both engines do the identical IEEE operations.
  *  - RRF scores are quotients-plus-sum of small integers in fixed order —
  *    bit-exact across engines, shipped unrounded.
  *  - c01's cluster seeds are the k lowest-id vectors (SQL-expressible
  *    init); assignment ties break to the higher seed id on both sides,
  *    matching IvfCellsExpression's (sim desc, index desc) order.
  */
object RankingQueries extends QueryPack {

  private val Terms = Seq("dup", "vector", "merge")

  private def bm25ToksCte(table: String): String =
    s"""toked AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             x -> x <> '') AS toks
          FROM $table),
        stats AS (
          SELECT count(*) AS n, sum(len(toks)) AS sumdl,
                 count(*) FILTER (WHERE list_contains(toks, 'dup')) AS df0,
                 count(*) FILTER (WHERE list_contains(toks, 'vector')) AS df1,
                 count(*) FILTER (WHERE list_contains(toks, 'merge')) AS df2
          FROM toked),
        scored AS (
          SELECT t.doc_id, round(
              ((ln(1.0 + (((s.n - s.df0) + 0.5) / (s.df0 + 0.5)))
                * len(list_filter(t.toks, x -> x = 'dup')) * (1.2 + 1.0))
               / (len(list_filter(t.toks, x -> x = 'dup'))
                  + (1.2 * (0.25 + ((0.75 * len(t.toks))
                                    / (s.sumdl * 1.0 / s.n))))))
            + ((ln(1.0 + (((s.n - s.df1) + 0.5) / (s.df1 + 0.5)))
                * len(list_filter(t.toks, x -> x = 'vector')) * (1.2 + 1.0))
               / (len(list_filter(t.toks, x -> x = 'vector'))
                  + (1.2 * (0.25 + ((0.75 * len(t.toks))
                                    / (s.sumdl * 1.0 / s.n))))))
            + ((ln(1.0 + (((s.n - s.df2) + 0.5) / (s.df2 + 0.5)))
                * len(list_filter(t.toks, x -> x = 'merge')) * (1.2 + 1.0))
               / (len(list_filter(t.toks, x -> x = 'merge'))
                  + (1.2 * (0.25 + ((0.75 * len(t.toks))
                                    / (s.sumdl * 1.0 / s.n)))))), 4) AS score
          FROM toked t CROSS JOIN stats s)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-20 for a 3-term query over the documents table: ONE narrow
    // scan computes per-doc (dl, tf per term) with no explode and no text
    // shuffle; a single-row aggregate supplies (N, Σdl, df); the top-k is
    // TakeOrderedAndProject. 'dup' is the rare discriminative term
    // (df ≈ 5%), 'vector'/'merge' are common — scores spread across idf
    // regimes instead of collapsing to tf ordering.
    "r01_bm25_topk" -> ((s, d) =>
      Ranking.bm25TopK(Tables.documents(s, d), "doc_id", "text", Terms,
          k = 20)
        .orderBy("rank")),

    // Hybrid retrieval: BM25 top-50 (lexical) fused with cosine top-50
    // around a probe embedding (vector side shares ids with documents) via
    // reciprocal-rank fusion — the standard two-tower search composition.
    // Each list is bounded (k rows), the fusion join is k-vs-k tiny; at
    // 100 TB both inputs are the bounded OUTPUTS of their scale paths.
    "r02_hybrid_rrf" -> ((s, d) => {
      val lex = Ranking.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        Terms, k = 50)
      val emb = Tables.embeddings(s, d)
      val vec = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      Ranking.rrfFuse(lex, vec, "doc_id", "rank", k = 10)
        .select(col("id").as("doc_id"), col("rrf"),
          col("rank_a").as("lex_rank"), col("rank_b").as("vec_rank"),
          col("rank"))
        .orderBy("rank")
    }),

    // k-means corpus bucketing, oracle-able form: seeds = the 8 lowest-id
    // vectors, 0 Lloyd iterations (the seed Voronoi partition), assignment
    // through the same distributed kernel path the trained variant uses —
    // one narrow pass over the broadcast centroid matrix, zero shuffles.
    // Lloyd-refined training is engine-side only and pinned by
    // ClusteringSpec (cohesion monotone, planted clusters recovered).
    // per-doc TF-IDF keywords: top-3 terms by tf*ln(N/df), rounded to 4
    // before ranking (the BM25 ulp rule), ties by term
    "r04_tfidf_keywords" -> ((s, d) =>
      Ranking.tfidfKeywords(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")),

    // collocation mining: adjacent-pair PMI ratio c_xy*N/(c_x*c_y) —
    // quotients of exact integer counts, no ln, so engine-exact
    "r03_pmi_bigrams" -> ((s, d) =>
      TextAnalysis.cooccurrenceRatio(
          Tables.documents(s, d).select(col("text")), "text", minCount = 20)
        .orderBy("bigram")),

    "c01_kmeans_assign" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (labels, cents) =
        Clustering.seedCentroids(emb, "vec_id", "embedding", 8)
      Clustering.assign(emb, "vec_id", "embedding", cents, labels)
        .select(col("id").as("vec_id"), col("cluster").as("cluster_id"))
        .orderBy("vec_id")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "r01_bm25_topk" ->
      s"""WITH ${bm25ToksCte("documents")},
         r AS (
           SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           FROM scored)
         SELECT doc_id, score, rank FROM r WHERE rank <= 20 ORDER BY rank""",

    "r02_hybrid_rrf" ->
      s"""WITH ${bm25ToksCte("documents")},
         lex AS (
           SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
           FROM scored QUALIFY lex_rank <= 50),
         vq AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         vec AS (
           SELECT e.vec_id AS doc_id,
             row_number() OVER (ORDER BY
               list_cosine_similarity(e.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]) DESC,
               e.vec_id) AS vec_rank
           FROM embeddings e CROSS JOIN vq q
           WHERE e.vec_id <> 0 QUALIFY vec_rank <= 50),
         fused AS (
           SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
             (coalesce(1.0 / (60 + l.lex_rank), 0.0)
              + coalesce(1.0 / (60 + v.vec_rank), 0.0)) AS rrf,
             l.lex_rank, v.vec_rank
           FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id),
         r AS (
           SELECT doc_id, rrf, lex_rank, vec_rank,
             row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
           FROM fused)
         SELECT doc_id, rrf, lex_rank, vec_rank, rank FROM r
         WHERE rank <= 10 ORDER BY rank""",

    // same tokenization as bm25ToksCte; row_number cast to INT matches
    // Spark's int rank
    "r04_tfidf_keywords" ->
      """WITH toked AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS toks
           FROM documents),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM toked),
         tf AS (
           SELECT doc_id, unnest(toks) AS term FROM toked),
         tfc AS (
           SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
         dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
         scored AS (
           SELECT t.doc_id, t.term,
             round(CAST(t.tf AS DOUBLE)
                   * ln(n.nd / CAST(d.df AS DOUBLE)), 4) AS score
           FROM tfc t JOIN dfc d USING (term) CROSS JOIN n),
         r AS (
           SELECT doc_id, term, score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS INT) AS rank
           FROM scored)
         SELECT doc_id, term, score, rank FROM r WHERE rank <= 3
         ORDER BY doc_id, rank""",

    "r03_pmi_bigrams" ->
      """WITH docs AS (
           SELECT string_split(trim(text), ' ') AS w FROM documents),
         uni AS (SELECT unnest(w) AS tok FROM docs),
         uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uc),
         big AS (
           SELECT unnest(CASE WHEN len(w) < 2 THEN []::VARCHAR[]
             ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
             END) AS bigram
           FROM docs),
         bc AS (
           SELECT bigram, count(*) AS cxy FROM big
           GROUP BY 1 HAVING count(*) >= 20)
         SELECT bigram, CAST(bc.cxy AS BIGINT) AS c_xy,
           CAST(u1.c AS BIGINT) AS c_x, CAST(u2.c AS BIGINT) AS c_y,
           CAST(bc.cxy AS DOUBLE) * tot.n
             / (CAST(u1.c AS DOUBLE) * u2.c) AS pmi_ratio
         FROM bc
         JOIN uc u1 ON u1.tok = split_part(bigram, ' ', 1)
         JOIN uc u2 ON u2.tok = split_part(bigram, ' ', 2)
         CROSS JOIN tot
         ORDER BY bigram""",

    "c01_kmeans_assign" ->
      """WITH seeds AS (
           SELECT vec_id AS cid, embedding FROM embeddings
           ORDER BY vec_id LIMIT 8),
         d AS (
           SELECT e.vec_id, s.cid,
             list_cosine_similarity(e.embedding::DOUBLE[],
                                    s.embedding::DOUBLE[]) AS cos
           FROM embeddings e CROSS JOIN seeds s),
         r AS (
           SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid DESC) AS rn
           FROM d)
         SELECT vec_id, cid AS cluster_id FROM r WHERE rn = 1
         ORDER BY vec_id"""
  )
}
