package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Clustering, Dedup, Multimodal, Packing, Sampling, Similarity, TextAnalysis}

/** Extension-operator surface (SURVEY.md §2.9): dedup, similarity search,
  * text analysis, multimodal plumbing — driver-checkable over the
  * documents/embeddings tables.
  *
  * Oracle philosophy: where feasible the DuckDB SQL recomputes the ground
  * truth *exactly and independently* (full pairwise Jaccard vs the engine's
  * LSH+verify; planted language labels vs the marker classifier), so
  * probabilistic shortcuts in the engine are graded against exact answers.
  */
object OpsQueries extends QueryPack {

  /** Originals ∪ planted near-duplicates (text + one appended token ⇒
    * shingle-Jaccard (w-2)/(w-1) ≥ 8/9 for w ≥ 10 words). */
  private def withPlantedDups(s: SparkSession, d: String): DataFrame = {
    // no rebalance: minhashNearDupPairs starts with a groupBy shuffle that
    // redistributes anyway
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup via hash-groupBy on a derived key (first 3 words)
    "d01_exact_dedup" -> ((s, d) => {
      Dedup.exactDedupGroups(
          Tables.documents(s, d),
          substring_index(col("text"), " ", 3), col("doc_id"))
        .filter(col("group_size") >= 2)
        .orderBy("dup_key")
    }),

    // MinHash+LSH near-dup detection, graded against exact pairwise Jaccard
    "d02_minhash_neardup" -> ((s, d) => {
      Dedup.minhashNearDupPairs(withPlantedDups(s, d), "doc_id", "text",
          threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // exact n-gram Jaccard on the planted pairs (deterministic set math) —
    // both shingle sets derive from ONE scan; no join, no shuffle of
    // shingle arrays
    "d03_ngram_jaccard" -> ((s, d) => {
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"), Dedup.shingleCol(col("text")).as("sh"),
          Dedup.shingleCol(concat(col("text"), lit(" zzz"))).as("sh2"))
        .select(col("doc_id"),
          round(Dedup.jaccardCol(col("sh"), col("sh2")), 4).as("jaccard"))
        .orderBy("doc_id")
    }),

    // SimHash near-dup (pigeonhole banding + hamming verify): identical
    // texts at distance 0 must all be found
    "d04_simhash_neardup" -> ((s, d) => {
      // no rebalance: simhashNearDupPairs band join shuffles anyway
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val dupped = docs.unionByName(docs.select(
        (col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.simhashNearDupPairs(dupped, "doc_id", "text", maxDistance = 0)
        .filter(col("id_b") === col("id_a") + 1000000L) // exact-copy pairs
        .select(col("id_a").as("doc_id"), col("distance"))
        .orderBy("doc_id")
    }),

    // text analysis: token counts + ratios + quality score
    "t01_text_stats" -> ((s, d) => {
      // codegen'd string built-ins: cheaper than a repartition shuffle
      Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
          TextAnalysis.tokenCountRegex(col("text")).as("n_btokens"),
          TextAnalysis.alphaRatio(col("text")).as("alpha_ratio"),
          TextAnalysis.meanWordLen(col("text")).as("mean_word_len"),
          TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // language ID: marker tokens planted per row's true label; the
    // classifier must recover the label (oracle = the label itself)
    "t02_lang_id" -> ((s, d) => {
      val markers = TextAnalysis.LangMarkers.map { case (l, ms) =>
        l -> Array.fill(15)(ms).flatten.mkString(" ")
      }.toMap
      val markerCol = TextAnalysis.LangMarkers.foldRight(lit(""): org.apache.spark.sql.Column) {
        case ((lang, _), acc) => when(col("lang") === lang, lit(markers(lang))).otherwise(acc)
      }
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"),
          TextAnalysis.langId(concat_ws(" ", col("text"), markerCol)).as("detected"))
        .orderBy("doc_id")
    }),

    // connected components over a planted near-dup chain graph: every
    // doc joins a 3-node chain (id — id+1M — id+2M), plus a cross-chain
    // bridge on every 50th doc; the oracle computes reachability exactly
    // with a recursive CTE
    "d06_components" -> ((s, d) => {
      val ids = Tables.documents(s, d).select(col("doc_id"))
      val chain = ids.select(col("doc_id").as("a"), (col("doc_id") + 1000000L).as("b"))
        .unionByName(ids.select((col("doc_id") + 1000000L).as("a"),
          (col("doc_id") + 2000000L).as("b")))
        .unionByName(ids.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("a"), (col("doc_id") + 2000001L).as("b")))
      Dedup.connectedComponents(chain, "a", "b")
        .orderBy("id")
    }),

    // component-size distribution over the d06 graph — the dedup-report
    // artifact ("how big are the duplicate clusters"): one extra
    // two-level integer aggregate on top of connectedComponents
    "d17_component_sizes" -> ((s, d) => {
      val ids = Tables.documents(s, d).select(col("doc_id"))
      val chain = ids.select(col("doc_id").as("a"), (col("doc_id") + 1000000L).as("b"))
        .unionByName(ids.select((col("doc_id") + 1000000L).as("a"),
          (col("doc_id") + 2000000L).as("b")))
        .unionByName(ids.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("a"), (col("doc_id") + 2000001L).as("b")))
      Dedup.connectedComponents(chain, "a", "b")
        .groupBy("component").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_components"))
        .orderBy("size")
    }),

    // C4-style boilerplate detection: a banner sentence planted into every
    // 10th document must surface as a cross-document repeated span; the
    // oracle recomputes span document-frequencies exactly in SQL
    "d05_boilerplate_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(lit("Subscribe to our newsletter. "), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.repeatedSpans(docs, "doc_id", "text", minDocs = 4)
        .orderBy("span")
    }),

    // Gopher-style repetition quality signal: within-document duplicate
    // bigram/trigram ratios — the oracle recomputes both exactly from the
    // raw text in SQL
    "t04_repetition" -> ((s, d) => {
      Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.duplicateNgramRatio(col("text"), 2).as("dup2"),
          TextAnalysis.duplicateNgramRatio(col("text"), 3).as("dup3"))
        .orderBy("doc_id")
    }),

    // PII scrub: deterministic synthetic PII planted from doc_id, scrubbed
    // to typed tags; the oracle plants and scrubs identically in SQL
    "t07_pii_scrub" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" Contact doc"), col("doc_id"), lit("@example.com or 555-"),
          lpad(col("doc_id") % 1000, 3, "0"), lit("-1234 at 10.0."),
          col("doc_id") % 256, lit(".1 now")).as("text"))
      planted.select(col("doc_id"),
          TextAnalysis.scrubPii(col("text")).as("scrubbed"))
        .orderBy("doc_id")
    }),

    // deterministic hash sampling: membership is a pure function of the
    // key (md5-based), so the oracle reproduces the exact sample
    "t05_sample" -> ((s, d) => {
      Sampling.deterministicSample(Tables.documents(s, d), col("doc_id"), 0.1)
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),

    // stratified rebalancing: per-language keep fractions, others dropped
    "t08_stratified_sample" -> ((s, d) => {
      Sampling.stratifiedSample(Tables.documents(s, d), col("doc_id"),
          col("lang"), Map("en" -> 0.5, "es" -> 0.2))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // reproducible train/val/test split assignment by key hash
    "t06_split" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"),
          Sampling.splitAssign(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .orderBy("doc_id")
    }),

    // md5 content fingerprint (dedup key for 100 TB exact dedup)
    "t03_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.fingerprintMd5(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // brute-force cosine top-1 over a BOUNDED broadcast query set — the
    // documented contract of the exact path (Similarity.bruteForceTopK):
    // a FIXED 64-query panel (vec_id < 64), so |Q| stays O(1) as the
    // corpus scales and the O(|Q|·n) stage is one narrow broadcast pass,
    // never an all-pairs cross join
    "s01_cosine_top1" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 64)
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id")
    }),

    // LSH-bucketed ANN with planted exact-duplicate queries: every query
    // vector is an identical copy of a corpus vector, so it shares every
    // LSH bucket with its source and the true top-1 (cosine 1.0) is found
    // deterministically — which makes the approximate path hash-checkable
    // against an exact-equality oracle (ties on duplicate corpus vectors
    // break to the smallest neighbor id on both sides)
    "s02_lsh_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id")
    }),

    // IVF ANN (coarse-quantizer cells + nprobe + exact re-rank): planted
    // exact-duplicate queries land in their source's cell with certainty,
    // so the approximate path is graded against the exact oracle. Auto
    // nlist (= √n, clamped): cells hold ~√n vectors, so the probed
    // fraction shrinks as the corpus grows instead of staying n·m/16
    "s03_ivf_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.ivfTopKAuto(emb, queries, "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id")
    }),

    // Matryoshka truncated-prefix ANN: candidates scored on the first 16
    // of 64 dims (the sweep reads a quarter of the vector bytes), exact
    // re-rank on full vectors. Planted exact-copy queries (a FIXED
    // 64-query panel — the bounded-|Q| production contract, so the
    // O(|Q|·n) sweep stays linear in the corpus) have identical prefixes
    // (truncated cosine 1.0 = max), so the true top-1 survives both
    // stages with certainty and the exact-equality oracle applies
    // MMR-diversified top-8 from a 16-candidate shortlist, λ = 2/3, over
    // the int8-quantized dot space: every greedy comparison is exact
    // integer arithmetic, so the sequential selection is bit-reproducible
    // against the DuckDB recursive-CTE replay of the same picks
    "s10_mmr_diversify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mmrSelectInt8(emb, emb.filter(col("vec_id") < 16),
          "vec_id", "embedding", k = 8, shortlist = 16)
        .orderBy("query_id", "rank")
    }),

    "s09_truncated_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 64)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.truncatedTopK(emb, queries, "vec_id", "embedding", k = 1,
          dims = 16)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id")
    }),

    // hard-negative mining (contrastive training data): top-1 most-similar
    // corpus row whose cosine is ≤ 0.999, for a FIXED 64-query panel of
    // planted duplicates (bounded |Q| — the ceiling filter and top-k tail
    // run inside one linear corpus sweep). The planted copies make the
    // exclusion observable (each query's exact copy, cosine 1.0, must be
    // skipped in favor of the nearest organic neighbor, which maxes out
    // at ~0.51 — far from the ceiling, so the filter cannot straddle an
    // engine ulp)
    "s08_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 64)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.hardNegatives(emb, queries, "vec_id", "embedding", k = 1,
          maxCosine = 0.999)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id")
    }),

    // embedding-cosine near-duplicate pairs (LSH buckets + exact verify):
    // planted exact copies are the complete ground truth — the organic
    // corpus maxes out at cosine ~0.51 (measured), far from the threshold
    "s04_cosine_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val withCopies = emb.select(col("vec_id"), col("embedding")).unionByName(
        emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      Similarity.cosineNearDupPairs(withCopies, "vec_id", "embedding", threshold = 0.9)
        .orderBy("id_a", "id_b")
    }),

    // int8 embedding quantization: the oracle recomputes scale + quantized
    // elements exactly (same IEEE arithmetic, same away-from-zero rounding).
    // The q array is pinned via scalar aggregates (sum, position-weighted
    // sum, min, max) because the driver's comparator hashes scalar cells
    "s05_quantize_int8" -> ((s, d) => {
      Tables.embeddings(s, d).select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding").cast("array<double>")).as("qv"))
        .select(col("vec_id"),
          round(col("qv").getField("scale"), 6).as("scale"),
          col("qv").getField("q").as("q"))
        .select(col("vec_id"), col("scale"),
          aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
          aggregate(zip_with(col("q"), sequence(lit(1L), size(col("q")).cast("long")),
              (x, i) => x.cast("long") * i),
            lit(0L), (a, x) => a + x).as("q_wsum"),
          array_min(col("q")).cast("long").as("q_min"),
          array_max(col("q")).cast("long").as("q_max"))
        .orderBy("vec_id")
    }),

    // quantized ANN: int8 candidate sweep + exact re-rank over a FIXED
    // 64-query panel (the bounded-|Q| broadcast contract — the sweep is
    // LINEAR in the corpus, not n·m); planted exact copies quantize
    // identically, so the copy tops the approx window and the exact
    // re-rank grades against the same oracle as s02/s03
    "s06_quantized_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 64)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      // the linear int8 sweep is pure CPU: rebalance the single-split local
      // corpus scan so it spreads across cores (production multi-split
      // inputs pass through the gate untouched)
      Similarity.quantizedTopK(Tables.balanced(s, emb), queries,
          "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id")
    }),

    // product-quantization ANN: M one-byte codes per corpus vector, ADC
    // table lookups in the sweep, exact re-rank on survivors — over the
    // same FIXED 64-query panel (bounded |Q|: the 64×M×ksub LUT block is
    // a few KB broadcast-side, and the sweep is linear in the corpus).
    // Planted exact copies encode to identical codes, so the oracle is
    // the same exact ground truth as s02/s03/s06. ksub=16 keeps the
    // LUT working set cache-resident (see Similarity.pqTopK's cache
    // note); recall is unaffected here (overfetch + exact re-rank)
    "s07_pq_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 64)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.pqTopK(Tables.balanced(s, emb), queries,
          "vec_id", "embedding", k = 1, ksub = 16)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id")
    }),

    // benchmark decontamination: every 20th document IS the benchmark, so
    // those docs (and any doc organically sharing an 8-gram) must surface;
    // the oracle recomputes the overlap exactly on shingle strings while
    // the engine joins on xxhash64 keys — identical absent a 64-bit
    // collision between two specific n-grams
    "d07_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 20 === 0)
      Dedup.contamination(docs, bench, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // benchmark-side contamination report: per-language benchmark split
    // (every 20th doc), fraction of its distinct 8-grams present in the
    // REST of the corpus — the model-card eval-integrity artifact; the
    // corpus side streams unshuffled through a broadcast join
    "d15_contamination_report" -> ((s, d) => {
      val docs = Tables.documentsBalanced(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
      Dedup.contaminationReport(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", "lang", n = 8)
        .orderBy("lang")
    }),

    // SURGICAL decontamination: remove every benchmark 8-gram window
    // from the corpus text (all occurrences — an eval span keeps no
    // copy), leaving the rest of the document — the alternative to
    // d07's whole-doc drop for mostly-clean docs that quote eval items.
    // Same benchmark split as d07 (every 20th doc); oracle replays the
    // token-window machinery in DuckDB (the t32 pattern) against the
    // benchmark's distinct window hashes
    "d20_scrub_contamination" -> ((s, d) => {
      val docs = Tables.documentsBalanced(s, d)
        .select(col("doc_id"), col("text"))
      Dedup.scrubContamination(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // decontamination behind a Bloom prefilter: same answer as d07
    // (no false negatives; the exact join removes false positives), but
    // clean docs are dismissed inside the narrow scan — the 100 TB plan
    "d10_bloom_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 20 === 0)
      Dedup.bloomContamination(docs, bench, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // fuzzy record linkage: part-name pairs within 2 edits inside brand
    // blocks — the equi-join on the block key bounds the quadratic (never
    // an all-pairs cross join); a length bound + Spark's early-exit
    // levenshtein(l, r, k) prune before the full comparison
    "d08_fuzzy_pairs" -> ((s, d) =>
      Dedup.fuzzyDupPairs(Tables.part(s, d), "p_partkey", "p_name",
          Seq("p_brand", "p_type"), maxDist = 2)
        .orderBy("id_a", "id_b")),

    // winnowing fingerprints at threshold 1.0: every planted copy must
    // pair with its original at overlap exactly 1.0 (equal text ⇒ equal
    // fingerprint sets). Filtered to the planted family (the d04
    // pattern): winnow sets are deliberately lossy, so DIFFERENT texts
    // can legitimately share a set — those extra true positives aren't
    // SQL-expressible ground truth
    "d13_winnow_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val dupped = docs.unionByName(docs.select(
        (col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.winnowNearDupPairs(dupped, "doc_id", "text", threshold = 1.0)
        .filter(col("id_b") === col("id_a") + 1000000L && col("id_a") < 1000000L)
        .orderBy("id_a", "id_b")
    }),

    // incremental dedup: today's batch (exact copies, near copies,
    // genuinely novel reversed docs) against the standing corpus — only
    // the novel rows survive; the oracle recomputes exact text equality
    // and full bipartite max-Jaccard
    "d12_dedup_increment" -> ((s, d) => {
      val prior = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val batch = prior.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(prior.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" zzz")).as("text")))
        .unionByName(prior.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            array_join(reverse(split(col("text"), " ", 0)), " ").as("text")))
      Dedup.dedupAgainst(batch, prior, "doc_id", "text", threshold = 0.8)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // the PRODUCTION incremental path through the same ground truth:
    // exact/band stages run off a pre-built (id, fp, bands) signature
    // table (Dedup.signatures — what curate.against maintains) while the
    // standing text is read only for candidate verification. Same oracle
    // as d12: the keep set must be identical whichever path computes it
    "d19_dedup_increment_sigs" -> ((s, d) => {
      val prior = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val batch = prior.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(prior.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" zzz")).as("text")))
        .unionByName(prior.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            array_join(reverse(split(col("text"), " ", 0)), " ").as("text")))
      Dedup.dedupAgainstSignatures(batch,
          Dedup.signatures(prior, "doc_id", "text"), prior,
          "doc_id", "text", threshold = 0.8)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // near-dup dedup with SURVIVOR ELECTION (the production convention:
    // keep the highest-quality copy, not the min id): the d02 planted
    // universe (originals + ' zzz'-tailed copies at +1M), score = token
    // count, so every planted cluster keeps its LONGER copy and drops
    // the original — the exact inverse of the min-id election, which the
    // oracle's recursive-component + argmax recompute grades
    "d18_neardup_keep_best" -> ((s, d) => {
      Dedup.nearDupDedupBy(withPlantedDups(s, d), "doc_id", "text",
          size(split(col("text"), " ")), threshold = 0.8)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // SemDedup at the PRODUCTION k: auto k = √n seed-Voronoi buckets
    // (clamped ≥ 16 — the semDedupAuto scale rule, so the within-cluster
    // pair count stays ~n^1.5 as the corpus grows instead of n²/k for a
    // pinned k); within-cluster cosine >= 0.9 drops the higher id.
    // Planted exact copies are ground truth (cosine 1.0, same cluster as
    // their original); organic pairs max out far below the threshold, so
    // the kept set is engine-portable and the oracle recomputes the same
    // k from the same count.
    "d09_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val withCopies = emb.unionByName(
        emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      Similarity.semDedupAutoSeeded(withCopies, emb, "vec_id", "embedding",
          threshold = 0.9)
        .select(col("vec_id")).orderBy("vec_id")
    }),

    // PageRank over the customer->nation citation graph (nations offset
    // to avoid id collisions; nations are dangling, so the correction
    // path is exercised). Output = rank POSITION (ulp-robust: distinct
    // true ranks differ by >> ulp; equal ranks tie-break by id) plus the
    // 4-decimal rank. The oracle unrolls the same 5 power iterations
    // with the identical operation order
    // rank POSITION via Sampling.globalOrdinal (range-partitioned prefix
    // sums), NOT row_number over an unpartitioned window — the latter
    // plans as Exchange SinglePartition and serializes every node
    // through one task at scale. pageRank's output is localCheckpoint'd,
    // so the ordinal's two passes read materialized partitions.
    "d11_pagerank" -> ((s, d) => {
      val e = Tables.customer(s, d).select(col("c_custkey").as("src"),
        (col("c_nationkey") + 1000000L).as("dst"))
      val pr = graft.ops.Graph.pageRank(e, "src", "dst", iters = 5)
      graft.ops.Sampling.globalOrdinal(pr,
          Seq(col("rank").desc, col("id")), "pos")
        .select(col("id"), round(col("rank"), 4).as("rank4"), col("pos"))
        .orderBy("id")
    }),

    // min-hop BFS levels over the region→nation→customer→order DAG —
    // the recursive-CTE reachability query Spark SQL cannot express
    // natively, oracled against DuckDB's actual WITH RECURSIVE. Levels:
    // region 0, nation 1, customer 2, order 3; maxHops 10 exercises the
    // frontier-drained early stop
    "d16_bfs_levels" -> ((s, d) => {
      val e = Tables.nation(s, d).select(
          (col("n_regionkey") + 2000000L).as("src"),
          (col("n_nationkey") + 1000000L).as("dst"))
        .unionByName(Tables.customer(s, d).select(
          (col("c_nationkey") + 1000000L).as("src"),
          col("c_custkey").as("dst")))
        .unionByName(Tables.orders(s, d).select(
          col("o_custkey").as("src"),
          (col("o_orderkey") + 3000000L).as("dst")))
      val seeds = Tables.region(s, d)
        .select((col("r_regionkey") + 2000000L).as("id"))
      graft.ops.Graph.bfsLevels(e, "src", "dst", seeds, "id", maxHops = 10)
        .orderBy("id")
    }),

    // HITS hubs/authorities (Graph.hits) on a two-layer link graph
    // (customer->nation, nation->region, so nations are BOTH hub and
    // authority): 3 L1-normalized rounds, oracle-unrolled with the
    // identical IEEE operation order (join+sum, coalesce 0, divide by the
    // round's scalar total) exactly as d11 proved viable for pagerank.
    // 4-decimal round absorbs summation-order ulps on both engines.
    "d14_hits" -> ((s, d) => {
      val e = Tables.customer(s, d).select(col("c_custkey").as("src"),
          (col("c_nationkey") + 1000000L).as("dst"))
        .union(Tables.nation(s, d).select(
          (col("n_nationkey") + 1000000L).as("src"),
          (col("n_regionkey") + 2000000L).as("dst")))
      graft.ops.Graph.hits(e, "src", "dst", iters = 3)
        .select(col("id"), round(col("hub"), 4).as("hub4"),
          round(col("auth"), 4).as("auth4"))
        .orderBy("id")
    }),

    // Misra–Gries heavy hitters through the sketch aggregate in its
    // exact regime (capacity 64 ≥ the corpus vocabulary ⇒ no counter
    // ever decrements, estimates == true counts — the contract
    // HeavyHittersSpec pins), so a plain GROUP BY oracle hash-matches
    // the sketch path. The plan is the scale story: each task folds its
    // tokens into a ≤64-entry sketch before the exchange, so the shuffle
    // carries tasks × capacity rows, never the token universe.
    "t29_heavy_hitters" -> ((s, d) =>
      TextAnalysis.approxTopTerms(Tables.documents(s, d), "text",
          capacity = 64)
        .orderBy(desc("est_count"), asc("term"))),

    // byte-level BPE token counts under the pinned corpus-learned merge
    // table (token-count realism for the packing/token-budget family:
    // whitespace counts undercount what a subword tokenizer charges).
    // Through the SQL surface, so the oracle also grades the
    // graft_bpe_count registration; the DuckDB side replays the identical
    // merge table as a chain of replace() sweeps (see Bpe's scaladoc for
    // why one replace == one greedy merge sweep).
    "t30_bpe_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .selectExpr("doc_id", "graft_bpe_count(text) AS n_bpe")
        .orderBy("doc_id")),

    // URL canonicalization + registered-domain extraction over planted
    // crawl-URL variants (five shapes: tracking params + default port +
    // fragment + mixed case on a multi-label ccTLD; https default port
    // with empty path; non-default port with mixed tracking; bare IPv4
    // (no registered domain); non-http scheme with fragment). The
    // oracle assembles the expected canonical form and domain directly
    // from the plant arithmetic.
    "t43_url_canonical" -> ((s, d) => {
      val k = col("doc_id") % 5
      val raw =
        when(k === 0, concat(lit("HTTP://WWW.News"),
          (col("doc_id") % 7).cast("string"),
          lit(".Example.CO.UK:80/Articles/"), col("doc_id").cast("string"),
          lit("?utm_source=tw&id="), col("doc_id").cast("string"),
          lit("&utm_medium=s#top")))
        .when(k === 1, concat(lit("https://CDN.Site"),
          col("doc_id").cast("string"), lit(".COM:443")))
        .when(k === 2, lit("http://blog.foo.GOV.UK:8080/a/b?x=1&gclid=abc&y=2"))
        .when(k === 3, concat(lit("http://192.168.0."),
          (col("doc_id") % 250).cast("string"), lit("/path")))
        .otherwise(lit("FTP://Files.Example.Org/data#sec"))
      Tables.documents(s, d).select(col("doc_id"), raw.as("raw"))
        .selectExpr("doc_id", "graft_canonical_url(raw) AS canon",
          "graft_registered_domain(raw) AS domain")
        .orderBy("doc_id")
    }),

    // BPE encode-to-ids under the same pinned merge table and the GPT-2
    // id construction (byte value for alphabet chars, 256+rank for
    // merge outputs) — the loader-ready token sequence shipped in
    // exportTrainingShards' sidecar. The oracle replays the identical
    // sweep per pre-token, splits the result on the double separator,
    // and joins a generated (token, id) vocabulary, reassembling in
    // (pre-token, token) order. Registered POSITIONALLY — (doc_id, pos,
    // token_id) scalar rows via posexplode — because an array column is
    // unsortable by the harness comparator (r12's err); the id SEQUENCE
    // is still fully graded, one row per element in order.
    "t42_bpe_encode" -> ((s, d) =>
      Tables.documentsBalanced(s, d)
        .selectExpr("doc_id",
          "posexplode(graft_bpe_encode(text)) AS (pos, token_id)")
        .orderBy("doc_id", "pos")),

    // t17's budget selection costed in BPE tokens — the budget a real
    // subword tokenizer would charge a training run (same
    // range-partitioned prefix-sum machinery, new cost column)
    "t31_bpe_budget" -> ((s, d) =>
      Sampling.takeUntilBudget(
          Tables.documents(s, d).selectExpr(
            "doc_id", "n_chars", "graft_bpe_count(text) AS toks"),
          col("doc_id"), col("n_chars"), col("toks"), budget = 30000L)
        .orderBy("doc_id")),

    // corpus n-gram document frequency (vocabulary/boilerplate mining):
    // bigrams appearing in >= 25 distinct documents, exact oracle
    "t09_ngram_df" -> ((s, d) =>
      Dedup.ngramDocFreq(Tables.documents(s, d), "text", n = 2, minDocs = 25)
        .orderBy("ngram")),

    // group-wise top-k selection (data mixing: best docs per language by
    // quality score) via the bounded topk aggregate — candidates collapse
    // map-side to k per group per task, versus a window that shuffles and
    // sorts every row
    "t13_topk_per_lang" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .groupBy("lang")
        .agg(graft.functions.TopKAggregate.topk(
          col("quality"), col("doc_id"), 3).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("pos", "c")))
        .select(col("lang"), col("c.id").as("doc_id"),
          col("c.score").as("quality"), (col("pos") + 1).as("rank"))
        .orderBy("lang", "rank")
    }),

    // unigram-LM perplexity-style filter (CCNet/KenLM shape): mean
    // milli-bits per token under the corpus's own smoothed unigram model.
    // Integer milli-bit weights make the per-doc sum exact; one division
    // at the end — engine-portable without rounding
    "t15_lm_bits" -> ((s, d) =>
      TextAnalysis.lmBitsScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // interpolated hashed-bigram LM bits (the CCNet-direction upgrade of
    // t15): per adjacent pair, integer milli-bits of the mixed bigram +
    // unigram bucket probability; rare-PAIR soup scores high even when
    // its unigrams are common
    "t37_lm_bigram_bits" -> ((s, d) =>
      TextAnalysis.lmBigramBitsScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // deterministic per-source document cap (C4/RefinedWeb "at most n per
    // domain"): survivors chosen by md5 order of the key — kept set
    // computed over (source, doc_id) pairs via the bounded topk aggregate
    // (map-side collapse to n per group per task, no per-group window
    // sort), rows re-attached by left-semi join
    "t14_cap_per_source" -> ((s, d) =>
      Sampling.capPerGroup(Tables.documents(s, d), "source", "doc_id", 10)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")),

    // capPerGroup's retention reachable from pure spark.sql via the
    // graft_cap_keys aggregate (GraftExtensions registry): the bounded
    // topk collapses candidates map-side to <= n per group per task, the
    // kept keys explode back and survivors re-attach by LEFT SEMI JOIN
    // on (group, key) — the same plan shape as the Scala operator, with
    // no window sort anywhere
    "t28_sql_cap_keys" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT d.source, d.doc_id
        FROM documents_v d
        LEFT SEMI JOIN (
          SELECT source, k.id AS doc_id FROM (
            SELECT source, graft_cap_keys(doc_id, 7, 'graft') AS keys
            FROM documents_v GROUP BY source) t
          LATERAL VIEW explode(keys) e AS k
        ) c ON d.source = c.source AND d.doc_id = c.doc_id
        ORDER BY d.source, d.doc_id""")
    }),

    // fixed-window chunking with overlap (30-token windows, 10-token
    // overlap): every token covered, partial tail kept; chunks hashed
    // so the oracle compares content without dumping it
    "t21_chunking" -> ((s, d) =>
      TextAnalysis.chunkDocs(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 30, overlap = 10)
        .select(col("doc_id"), col("chunk_ix"),
          md5(col("chunk").cast("binary")).as("chunk_md5"), col("n_tokens"))
        .orderBy("doc_id", "chunk_ix")),

    // intra-document span dedup: each doc's text is planted as two
    // identical "sentences"; first-occurrence dedup must restore the
    // original exactly (restored == 1 for every row)
    "t20_span_dedup" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"), col("text"),
          concat(col("text"), lit(". "), col("text")).as("raw"))
        .select(col("doc_id"),
          md5(TextAnalysis.dedupSpansInDoc(col("raw")).cast("binary"))
            .as("dedup_md5"),
          (TextAnalysis.dedupSpansInDoc(col("raw")) === col("text"))
            .cast("int").as("restored"))
        .orderBy("doc_id")),

    // CROSS-document passage dedup (Lee et al. exact-substring): every
    // 12-token window occurring twice anywhere in the corpus is removed
    // from all but its global first occurrence; the generator's planted
    // near-dup documents share long spans, so their later copies lose
    // them while the first keeps its text intact
    "t32_passage_dedup" -> ((s, d) =>
      Dedup.removeDuplicatePassages(Tables.documentsBalanced(s, d),
          "doc_id", "text", w = 12)
        .orderBy("doc_id")),

    // mergeable quantile sketch in its exact-when-fits contract (the t29
    // discipline): capacity 32768 >= the WHOLE events table at the gate
    // sf (10k rows), so the exact-mode contract survives any regeneration
    // that reshuffles event_type frequencies; quantiles are the exact
    // discrete percentiles DuckDB computes by sorting — through
    // spark.sql, exercising both registry entries
    "t36_quantile_sketch" -> ((s, d) => {
      val v = s"qsk_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      Tables.events(s, d).select(col("event_type"), col("value"))
        .createOrReplaceTempView(v)
      val out = s.sql(
        s"""SELECT event_type,
              graft_sketch_quantile(sk, 1, 2) AS p50,
              graft_sketch_quantile(sk, 9, 10) AS p90,
              graft_sketch_quantile(sk, 99, 100) AS p99
            FROM (SELECT event_type, graft_quantile_sketch(value, 32768) AS sk
                  FROM $v GROUP BY event_type)
            ORDER BY event_type""")
      s.catalog.dropTempView(v)
      out
    }),

    // deterministic epoch upsampling (the DoReMi-style training mix:
    // weights above 1 REPEAT documents — en 2.3 epochs, es 1.0,
    // de 0.4, fr dropped): realized copies are a pure function of
    // (doc_id, salt), replayed exactly by the oracle's md5 arithmetic
    "t39_epoch_upsample" -> ((s, d) =>
      Sampling.epochUpsample(Tables.documents(s, d)
          .select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        Map("en" -> 2.3, "es" -> 1.0, "de" -> 0.4))
        .orderBy("doc_id", "copy")),

    // distinct-count sketch in its exact-when-small contract (the
    // t29/t36 discipline): p=12 -> exact while <= 4096 distinct values,
    // which covers doc_id at the gate sf (500 docs) and any sane
    // lang/source vocabulary — so a plain COUNT(DISTINCT) oracle
    // hash-matches through the real sketch path; beyond 4096 the same
    // aggregate degrades to a merge-invariant HyperLogLog estimate
    // carrying 4 KiB per task instead of every distinct value
    "t38_distinct_count" -> ((s, d) => {
      val v = s"dcs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      Tables.documents(s, d).select(col("lang"), col("source"), col("doc_id"))
        .createOrReplaceTempView(v)
      val out = s.sql(
        s"""SELECT lang,
              graft_distinct_sketch(source, 12) AS n_sources,
              graft_distinct_sketch(CAST(doc_id AS STRING), 12) AS n_docs
            FROM $v GROUP BY lang ORDER BY lang""")
      s.catalog.dropTempView(v)
      out
    }),

    // sketch ROLLUP: per-group quantile sketches (the stored-daily-partial
    // analog) re-aggregated into one global summary via the second-order
    // graft_sketch_merge — the production path that rolls months up from
    // stored partials without re-touching raw data. Exact-when-fits
    // composes (every per-type sketch exact + total fits the merge
    // capacity), so the oracle is the plain global exact percentile
    "t40_sketch_rollup" -> ((s, d) => {
      val v = s"qsr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      Tables.events(s, d).select(col("event_type"), col("value"))
        .createOrReplaceTempView(v)
      val out = s.sql(
        s"""SELECT graft_sketch_quantile(m, 1, 2) AS p50,
              graft_sketch_quantile(m, 9, 10) AS p90,
              graft_sketch_quantile(m, 99, 100) AS p99
            FROM (SELECT graft_sketch_merge(sk, 65536) AS m
                  FROM (SELECT event_type,
                          graft_quantile_sketch(value, 32768) AS sk
                        FROM $v GROUP BY event_type))""")
      s.catalog.dropTempView(v)
      out
    }),

    // first-fit-decreasing bin packing (no document splitting), 128-token
    // bins, 64-id chunks: the greedy is pure integer arithmetic, replayed
    // bit-for-bit by a DuckDB recursive CTE
    "t35_pack_ffd" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tok"))
      Packing.packBinsFFD(toks, "doc_id", "n_tok",
          budget = 128L, chunkIdSpan = 64L)
        .orderBy("doc_id")
    }),

    // snapshot drift report: even-id docs are the "old" crawl, odd-id the
    // "new"; per-language doc/token deltas, novel-bucket token rate, and
    // integer-quantized L1 bucket-distribution distance
    "t34_drift_report" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
      TextAnalysis.driftReport(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "text", "lang")
        .orderBy("lang")
    }),

    // DSIR importance weights toward the English subset: hashed unigram
    // buckets (3 hex chars of md5 = 4096), integer micro-nat weights —
    // the importance-resampling score a curation pass would rank by
    "t33_dsir_weights" -> ((s, d) =>
      TextAnalysis.dsirScore(Tables.documents(s, d), "doc_id", "text",
          targetFilter = col("lang") === "en")
        .orderBy("doc_id")),

    // Unicode NFC canonicalization: planted decomposed suffixes (e +
    // combining acute, A + combining ring) must compose to the same
    // bytes DuckDB's nfc_normalize produces — compared via md5 of the
    // normalized string
    "t19_nfc_normalize" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"), lit(" cafe\u0301 A\u030A")).as("raw"))
        .select(col("doc_id"),
          md5(TextAnalysis.normalizeNfc(col("raw")).cast("binary")).as("norm_md5"),
          (TextAnalysis.normalizeNfc(col("raw")) =!= col("raw"))
            .cast("int").as("changed"))
        .orderBy("doc_id")),

    // HTML → text: wrap each document's text in planted tag soup
    // (head with style+script, comment, heading, entity-bearing
    // paragraph, inline spans, nbsp) and extract; the oracle assembles
    // the expected text directly from the plant — scripts/styles/
    // comments gone, block tags as single newlines, entities decoded,
    // whitespace collapsed. The corpus text is verified clean of
    // &/</>/doubled-space (plant-safe) at all SFs.
    "t41_html_to_text" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{color:red}</style>"),
        lit("<script>var x='<p>not text</p>';</script></head><body>"),
        lit("<!-- "), col("source"), lit(" --><h1>"), upper(col("lang")),
        lit("  heading</h1><p>fish &amp; chips &#33;</p><p>  "),
        col("text"),
        lit("  </p><div><span>tail</span>&nbsp;end</div></body></html>"))
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"),
          TextAnalysis.htmlToText(html).as("extracted"))
        .orderBy("doc_id")
    }),

    // main-content extraction over a planted full crawl page: nav menu,
    // header, aside link box, a link-dense tag-cloud div, and a footer
    // — ALL of which tag-stripping alone (t41, emitted alongside as
    // full_text) keeps — plus two real body paragraphs. htmlMainText
    // must keep exactly the body paragraphs: containers drop by rule,
    // the tag cloud by link density, the title by the word floor. The
    // oracle assembles both expected strings analytically from doc_id.
    "t44_html_main" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val m = (col("doc_id") % 97).cast("string")
      val html = concat(
        lit("<html><head><title>Site</title><style>p{a:b}</style></head><body>"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> <a href=\"/c\">Contact</a></nav>"),
        lit("<header><h1>Doc "), id, lit("</h1></header>"),
        lit("<article><p>Opening paragraph of document "), id,
        lit(" holds the <b>primary</b> body copy readers came for.</p>"),
        lit("<p>Second paragraph adds detail number "), m,
        lit(" &amp; keeps going with plenty of ordinary words.</p></article>"),
        lit("<aside><ul><li><a href=\"/r1\">related article one</a></li>"),
        lit("<li><a href=\"/r2\">related article two</a></li></ul></aside>"),
        lit("<div><a href=\"/t\">tag cloud alpha beta gamma delta epsilon</a></div>"),
        lit("<footer>Copyright 2026 Example Site All Rights Reserved</footer>"),
        lit("</body></html>"))
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"),
          TextAnalysis.htmlMainText(html).as("main_text"),
          TextAnalysis.htmlToText(html).as("full_text"))
        .orderBy("doc_id")
    }),

    // Mojibake repair over planted misdecodes: cp1252 double-encoding
    // (cafA~A(c)-style) and Latin-1/cp1252 punctuation mojibake must
    // re-decode; a correctly-accented suffix (whose cp1252 round-trip
    // is NOT valid UTF-8) and plain ASCII must pass through unchanged.
    // The oracle assembles the expected repaired strings from chr()
    // code points — fully independent of the kernel.
    "t47_fix_mojibake" -> ((s, d) => {
      val m4 = col("doc_id") % 4
      // escapes, not literal chars, so the source file's own encoding
      // can never corrupt the plant: variant 0 = "cafA~(c)"-style UTF-8
      // read as cp1252, 1 = correctly-accented (must NOT rewrite),
      // 2 = trademark sign misread via the cp1252 0x84 display char
      val suffix = when(m4 === 0,
          lit(" caf\u00C3\u00A9 \u00E2\u20AC\u2122 na\u00C3\u00AFve"))
        .when(m4 === 1, lit(" caf\u00E9"))
        .when(m4 === 2, lit(" \u00E2\u201E\u00A2 mark"))
        .otherwise(lit(""))
      val planted = concat(col("text"), suffix)
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"),
          TextAnalysis.fixMojibake(planted).as("fixed"),
          (TextAnalysis.fixMojibake(planted) =!= planted)
            .cast("int").as("changed"))
        .orderBy("doc_id")
    }),

    // Outlink harvesting + the full URL chain — the web-graph
    // construction step: html_links pulls (href, anchor) pairs from a
    // planted crawl page (absolute link with &amp; entity, root-relative,
    // dot-segment relative, protocol-relative, fragment-only; plus a
    // script-embedded and a commented link that must NOT appear and an
    // href-less <a>), each resolved against the page's base URL
    // (RFC 3986), canonicalized, and domain-extracted. The oracle
    // assembles all five expected edges analytically from doc_id.
    "t46_html_links" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val m = (col("doc_id") % 5).cast("string")
      val k = (col("doc_id") % 7).cast("string")
      val base = concat(lit("http://www.site"), k,
        lit(".example.co.uk/sec/page.html"))
      val html = concat(
        lit("<html><head><script>var a='<a href=\"/no\">x</a>';</script>" +
          "</head><body><!-- <a href=\"/commented\">no</a> -->" +
          "<nav><a href=\"/articles/"), id,
        lit("\">Read &amp; more</a><a>no href here</a></nav>" +
          "<p>See <a href='https://ext.example.com/p?a=1&amp;b="), m,
        lit("'>the <b>external</b>  source</a> now.</p>" +
          "<p><a href=\"../img/"), id,
        lit(".png\">image link</a>" +
          "<a href=\"//cdn.other.org/lib.js\">cdn</a>" +
          "<a href=\"#top\"></a></p></body></html>"))
      def resolved(link: org.apache.spark.sql.Column) =
        TextAnalysis.canonicalUrl(
          TextAnalysis.resolveUrl(col("base"), link))
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"), base.as("base"),
          posexplode(TextAnalysis.htmlLinks(html)).as(Seq("pos", "link")))
        .select(col("doc_id"), col("pos"),
          resolved(col("link.url")).as("url"),
          col("link.anchor").as("anchor"),
          TextAnalysis.registeredDomain(resolved(col("link.url")))
            .as("domain"))
        .orderBy("doc_id", "pos")
    }),

    // WEB-GRAPH COMPOSITION: the t46 link chain consumed end-to-end —
    // HTML anchors → RFC 3986 resolve → canonicalize → registered
    // domain → domain-level edges (self-loops dropped, the standard
    // webgraph hygiene step) → d11's pageRank. The planted crawl has
    // three structural families: 20 organic domains d0..d19.com (each
    // links to the hub, its ring neighbor, and itself — the self link
    // exercises relative resolution then drops), a hub (hub.org,
    // indegree 20), and a 6-domain LINK FARM f0..f5.net whose pages
    // link ONLY to boost.net — farm pages donate their FULL share
    // (outdeg 1) so boost.net outranks every organic domain on 6
    // in-links (the inflation a farm buys; asserted in WebGraphSpec).
    // FP-safety is by construction, same as d11: every per-node
    // contribution sum is over EQUAL values (all d-ranks equal by ring
    // symmetry, all f-ranks equal) or a single value, and the dangling
    // mass is a 2-element sum — partition order cannot change a bit.
    // The oracle replays the identical 5 power iterations over the
    // analytically-assembled edge set.
    "t48_web_graph" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val k = expr("(doc_id DIV 2) % 20").cast("string")
      val k1 = expr("((doc_id DIV 2) % 20 + 1) % 20").cast("string")
      val j = expr("(doc_id DIV 2) % 6").cast("string")
      val organic = col("doc_id") % 2 === 0
      val base = when(organic,
          concat(lit("http://www.d"), k, lit(".com/a/page.html")))
        .otherwise(concat(lit("http://f"), j, lit(".net/x/y.html")))
      val html = when(organic, concat(
          lit("<html><body><p><a href=\"https://www.hub.org/dir?id="), id,
          lit("\">Hub</a> <a href=\"//www.d"), k1,
          lit(".com/next/page.html\">Next</a> <a href=\"../self/p"), id,
          lit(".html\">Self</a></p></body></html>")))
        .otherwise(concat(
          lit("<html><body><a href=\"http://boost.net/win?ref="), j,
          lit("\">WIN</a></body></html>")))
      val edges = Tables.documentsBalanced(s, d)
        .select(base.as("base"), html.as("html"))
        .select(col("base"),
          explode(TextAnalysis.htmlLinks(col("html"))).as("link"))
        .select(TextAnalysis.registeredDomain(col("base")).as("src"),
          TextAnalysis.registeredDomain(TextAnalysis.canonicalUrl(
            TextAnalysis.resolveUrl(col("base"), col("link.url"))))
            .as("dst"))
        .filter(col("src") =!= col("dst"))
      val pr = graft.ops.Graph.pageRank(edges, "src", "dst", iters = 5)
      graft.ops.Sampling.globalOrdinal(pr,
          Seq(col("rank").desc, col("id")), "pos")
        .select(col("id"), round(col("rank"), 4).as("rank4"), col("pos"))
        .orderBy("id")
    }),

    // robots.txt evaluation (RFC 9309) — the politeness gate between a
    // harvested frontier and the fetcher. Four planted robots families
    // × five path families cover the semantics that matter: named-group
    // selection overriding '*' (family 0: the graftbot group does NOT
    // inherit the * group's /private/ block), wildcard + '$' anchor
    // (family 1), disallow-all with a longest-match allow carve-out
    // (family 2), and the no-robots default-allow (family 3). The
    // oracle states the 4×5 decision grid analytically. Per-row codegen
    // kernel: nothing shuffles.
    "t49_robots" -> ((s, d) => {
      val r = col("doc_id") % 4
      val robots = when(r === 0, lit(
          "User-agent: *\nDisallow: /private/\nAllow: /private/public/\n\n" +
          "User-agent: graftbot\nDisallow: /secret/\nCrawl-delay: 2.5\n"))
        .when(r === 1, lit(
          "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/\n"))
        .when(r === 2, lit(
          "User-agent: *\nDisallow: /\nAllow: /articles/\n"))
        .otherwise(lit(null).cast("string"))
      val p = col("doc_id") % 5
      val path = when(p === 0, concat(lit("/articles/"), col("doc_id")))
        .when(p === 1, concat(lit("/private/x/"), col("doc_id")))
        .when(p === 2, concat(lit("/private/public/"), col("doc_id")))
        .when(p === 3, concat(lit("/files/"), col("doc_id"), lit(".pdf")))
        .otherwise(concat(lit("/secret/"), col("doc_id")))
      Tables.documentsBalanced(s, d).select(col("doc_id"),
          TextAnalysis.robotsAllowed(robots, path, lit("graftbot"))
            .as("allowed"),
          TextAnalysis.robotsCrawlDelay(robots, lit("graftbot"))
            .as("crawl_delay"))
        .orderBy("doc_id")
    }),

    // anchor-text aggregation: the per-target-URL anchor corpus (the
    // training-data enrichment search engines build from the web graph
    // — what OTHER pages call this page). Harvest → resolve →
    // canonicalize as in t46, then ONE groupBy(url): link count,
    // distinct citing pages, and the deduped sorted anchor vocabulary.
    // Anchors ride the single url-keyed shuffle as short strings; at
    // corpus scale this is the classic map-side-combinable aggregation.
    "t50_anchor_text" -> ((s, d) => {
      val base = concat(lit("http://www.d"), (col("doc_id") % 7).cast("string"),
        lit(".org/p.html"))
      val html = concat(
        lit("<html><body><a href=\"https://target.example.com/page/"),
        (col("doc_id") % 20).cast("string"),
        lit("\">ref-"), (col("doc_id") % 3).cast("string"),
        lit("</a> <a href=\"/local/"), (col("doc_id") % 4).cast("string"),
        lit(".html\">local "), (col("doc_id") % 2).cast("string"),
        lit("</a></body></html>"))
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"), base.as("base"),
          explode(TextAnalysis.htmlLinks(html)).as("link"))
        .select(col("doc_id"),
          TextAnalysis.canonicalUrl(
            TextAnalysis.resolveUrl(col("base"), col("link.url"))).as("url"),
          col("link.anchor").as("anchor"))
        .groupBy("url")
        .agg(count(lit(1)).as("n_links"),
          countDistinct(col("doc_id")).as("n_pages"),
          array_join(sort_array(collect_set(col("anchor"))), "|")
            .as("anchors"))
        .orderBy("url")
    }),

    // domain-fair frontier ordering (crawl politeness): a 60%-skewed
    // domain mix (big.com gets 6 of every 10 URLs) must NOT monopolize
    // the queue head — every domain's k-th fetch lands after every
    // domain's (k-1)-th, priority-ordered within a domain. The oracle
    // replays the same two-rank construction with window functions.
    "t51_frontier" -> ((s, d) => {
      val m = col("doc_id") % 10
      val domain = when(m < 6, lit("big.com"))
        .when(m < 8, lit("mid.org"))
        .when(m === 8, lit("a.net"))
        .otherwise(lit("b.net"))
      val frontier = Tables.documentsBalanced(s, d).select(
        concat(lit("http://"), domain, lit("/p/"), col("doc_id")).as("url"),
        domain.as("domain"),
        ((col("doc_id") * 37) % 100).as("score"))
      graft.ops.Sampling.fairInterleave(frontier, col("domain"),
          Seq(col("score").desc, col("url")), "pos")
        .orderBy("pos")
    }),

    // compression-ratio quality gate (the Gopher/RedPajama-class
    // compressibility filter): template spam built by repeating a
    // 20-char slice 50× deflates below 0.15 with a wide margin, while
    // the natural document text sits ~0.3-0.8 — the classifier output
    // (not the raw ratio, which no SQL engine can replay) is what the
    // oracle grades, with the planted family as ground truth. Per-row
    // codegen kernel; nothing shuffles.
    "t54_compress_filter" -> ((s, d) => {
      val spam = concat(lit("x"),
        // repeat a short doc-derived slice: approximate long-range
        // redundancy that t04's exact window repeats also flag, but
        // deflate catches at ANY period length
        expr("repeat(substring(text, 1, 20), 50)"))
      val t = when(col("doc_id") % 2 === 1, spam).otherwise(col("text"))
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"),
          (TextAnalysis.deflateRatio(t) < 0.15).as("is_repetitive"))
        .orderBy("doc_id")
    }),

    // writing-system consistency gate: four planted families — pure
    // Latin (the document text), a Cyrillic body carrying a Latin
    // minority (mixed-script spam/spoofing shape: 49 Cyrillic letters
    // dominate the ≤40-char Latin slice with wide margins), pure
    // Cyrillic, pure Han — graded on the CLASS (dominant script +
    // mixed flag at the 0.05 threshold), which the construction makes
    // analytic; the raw ratio depends on per-doc letter counts no SQL
    // replay can see. Per-row codegen kernel; nothing shuffles.
    "t55_script_mix" -> ((s, d) => {
      val cyr = "привет мир это тест совершенно обычного текста на русском"
      val han = "这是一个中文测试文本用于写作系统分析"
      val fam = col("doc_id") % 4
      val t = when(fam === 0, col("text"))
        .when(fam === 1, concat(lit(cyr + " "), substring(col("text"), 1, 40)))
        .when(fam === 2, lit(cyr))
        .otherwise(lit(han))
      val prof = TextAnalysis.scriptProfile(t)
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"), prof.as("p"))
        .select(col("doc_id"), col("p.script").as("script"),
          (col("p.mix") > 0.05).as("mixed"))
        .orderBy("doc_id")
    }),

    // crawl-delta detection (recrawl scheduling): diff two crawl
    // snapshots by URL on content fingerprint — new / changed /
    // unchanged / gone. ONE full-outer join on url moving (url, md5)
    // pairs only; document text never shuffles. The plant: every 10th
    // page vanished, every 7th changed content, every 13th spawned a
    // new URL; the oracle states the grid analytically.
    "t53_crawl_diff" -> ((s, d) => {
      val docs = Tables.documentsBalanced(s, d).select(col("doc_id"), col("text"))
      val url = concat(lit("http://site.example.com/p/"), col("doc_id"))
      val prev = docs.select(url.as("url"), md5(col("text")).as("ph"))
      val curBase = docs.filter(col("doc_id") % 10 =!= 0)
        .select(url.as("url"),
          md5(when(col("doc_id") % 7 === 0,
              concat(col("text"), lit(" updated")))
            .otherwise(col("text"))).as("ch"))
      val curNew = docs.filter(col("doc_id") % 13 === 0)
        .select(concat(lit("http://site.example.com/new/"), col("doc_id"))
          .as("url"), md5(col("text")).as("ch"))
      prev.join(curBase.unionByName(curNew), Seq("url"), "full_outer")
        .select(col("url"),
          when(col("ph").isNull, lit("new"))
          .when(col("ch").isNull, lit("gone"))
          .when(col("ph") === col("ch"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
        .orderBy("url")
    }),

    // the FETCHABLE frontier, end-to-end: harvest outlinks from HTML →
    // resolve + canonicalize + registered domain → dedup the URL set →
    // join each host's robots.txt → drop disallowed paths (RFC 9309
    // gate) → domain-fair politeness order. Three domain families:
    // k%3==0 hosts disallow /local/ (their harvested deep links die at
    // the gate), k%3==1 hosts allow with a crawl-delay, k%3==2 have no
    // robots.txt (default allow) — and the cross-domain target links
    // hit a host with no robots row at all (null-join → allowed). The
    // robots table is per-HOST (bounded: one small text per domain),
    // the URL set is what shuffles.
    "t52_fetch_frontier" -> ((s, d) => {
      val k = (col("doc_id") % 7).cast("string")
      val base = concat(lit("http://www.d"), k, lit(".org/p.html"))
      val html = concat(
        lit("<html><body><a href=\"https://target.example.com/page/"),
        (col("doc_id") % 20).cast("string"),
        lit("\">t</a> <a href=\"/local/"), (col("doc_id") % 4).cast("string"),
        lit(".html\">l</a></body></html>"))
      val docs = Tables.documentsBalanced(s, d)
      val urls = docs
        .select(base.as("base"), html.as("html"))
        .select(col("base"), explode(TextAnalysis.htmlLinks(col("html")))
          .as("link"))
        .select(TextAnalysis.canonicalUrl(
          TextAnalysis.resolveUrl(col("base"), col("link.url"))).as("url"))
        .select(col("url"),
          TextAnalysis.registeredDomain(col("url")).as("domain"),
          regexp_extract(col("url"), "^[a-z]+://[^/]+(/.*)$", 1).as("path"))
        .distinct()
      val robots = docs.select((col("doc_id") % 7).as("k")).distinct()
        .select(concat(lit("d"), col("k").cast("string"), lit(".org"))
            .as("domain"),
          when(col("k") % 3 === 0,
            lit("User-agent: *\nDisallow: /local/\n"))
          .when(col("k") % 3 === 1,
            lit("User-agent: *\nCrawl-delay: 4\n"))
          .otherwise(lit(null).cast("string")).as("robots"))
      val fetchable = urls.join(robots, Seq("domain"), "left")
        .filter(TextAnalysis.robotsAllowed(col("robots"), col("path"),
          lit("graftbot")))
        .select(col("url"), col("domain"),
          (length(col("url")) % 17).cast("long").as("score"))
      graft.ops.Sampling.fairInterleave(fetchable, col("domain"),
          Seq(col("score").desc, col("url")), "pos")
        .orderBy("pos")
    }),

    // END-TO-END htmlInput curation: the full curate() chain over a
    // planted CRAWL — every doc wrapped in chrome that extracts away
    // cleanly (so downstream gates see exactly the original text, which
    // the oracle can reuse), plus three planted row families: exact
    // clones (+1e6, drop at exact dedup), near clones ' zz' (+2e6, drop
    // at the LSH+verify stage), and markup-only pages (+3e6, drop at
    // the stage -1 html pre-gate). The oracle independently replays
    // extract → exact dedup (min-id per text) → brute-force
    // jaccard>=0.8 pairs → recursive components (min-id survivor) →
    // the t01 quality / t04 dup3 / lang gates, emitting kept ids.
    "t45_curate_html" -> ((s, d) => {
      def wrap(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = concat(
        lit("<html><head><title></title><style>p{a:b}</style>" +
          "<script>var j='<p>no</p>';</script></head><body>" +
          "<!-- crawl --><p>"),
        text, lit("</p></body></html>"))
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id"),
        wrap(col("text")).as("text"), col("lang"))
      val exactClones = docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          wrap(col("text")).as("text"), col("lang"))
      val nearClones = docs
        .filter(col("doc_id") % 10 === 3 && col("n_chars") >= 200)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          wrap(concat(col("text"), lit(" zz"))).as("text"), col("lang"))
      val markupOnly = docs.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          lit("<style>x{}</style><script>junk</script>" +
            "<!-- chrome --><div><br/></div>").as("text"),
          col("lang"))
      val crawl = base.unionByName(exactClones)
        .unionByName(nearClones).unionByName(markupOnly)
      val emptyBenchmark = s.range(0)
        .selectExpr("CAST(null AS STRING) AS text")
      // cacheWorkingSet: the crawl is increment-sized, so the
      // canonicalized text persists once instead of re-running the
      // 4-way union + extraction kernel per downstream consumer
      graft.examples.CurationPipeline.curate(crawl, emptyBenchmark,
          cfg = graft.examples.CurationPipeline.Config(
            htmlInput = true, cacheWorkingSet = true))
        .select("doc_id").orderBy("doc_id")
    }),

    // video frame-sampling plan: every 24th frame index for a synthetic
    // per-doc frame count — the deterministic sampling arithmetic a
    // frame extractor follows (the extractor itself is the documented
    // stub); pure integer sequences, engine-exact
    "mm03_frame_sampling" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), (col("n_chars") % 1000 + 1).as("frames"))
        .select(col("doc_id"), col("frames"),
          Multimodal.sampleFrameIndexes(col("frames"), stride = 24)
            .as("idx"))
        .select(col("doc_id"), col("frames"),
          size(col("idx")).cast("long").as("n_sampled"),
          element_at(col("idx"), -1).cast("long").as("last_idx"))
        .orderBy("doc_id")),

    // k-anonymity audit over (lang, source) quasi-identifiers: groups
    // smaller than 8 are re-identification risks
    "t25_k_anonymity" -> ((s, d) =>
      graft.ops.Expectations.kAnonymityViolations(
          Tables.documents(s, d), Seq("lang", "source"), k = 8)
        .orderBy("lang", "source")),

    // dataset-card statistics: every figure exact, incl. the median via
    // the pivot-histogram percentile machinery (no global sort)
    "t26_corpus_report" -> ((s, d) =>
      graft.ops.CorpusReport.build(Tables.documents(s, d))
        .orderBy("metric")),

    // ROUGE-2 of a truncated candidate (first 20 words) against the full
    // text as reference: precision ~1, recall partial — quotients of
    // exact set sizes, shipped raw (no rounding)
    "t24_rouge" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(slice(split(col("text"), " ", 0), 1, 20), " ").as("cand"),
          col("text").as("ref"))
        .select(col("doc_id"),
          TextAnalysis.rougeN(col("cand"), col("ref"), 2).as("rg"))
        .select(col("doc_id"), col("rg.p").as("p"), col("rg.r").as("r"),
          col("rg.f1").as("f1"))
        .orderBy("doc_id")),

    // data-quality expectations: four checks counted in ONE aggregate
    // pass over the scan (never one scan per check)
    "t23_expectations" -> ((s, d) =>
      graft.ops.Expectations.report(Tables.lineitem(s, d), Seq(
          graft.ops.Expectations.Check("qty_in_range",
            col("l_quantity") >= 1 && col("l_quantity") <= 45),
          graft.ops.Expectations.Check("discount_cap",
            col("l_discount") <= 0.05),
          graft.ops.Expectations.Check("shipdate_present",
            col("l_shipdate").isNotNull),
          graft.ops.Expectations.Check("flag_domain",
            col("l_returnflag").isin("A", "N", "R"))))
        .orderBy("check")),

    // weighted sampling without replacement (A-Res exponential keys):
    // 50 docs drawn proportional to n_chars, deterministically
    "t22_weighted_sample" -> ((s, d) =>
      Sampling.weightedSample(Tables.documents(s, d), col("doc_id"),
          col("n_chars"), k = 50)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")),

    // lexical diversity: type-token ratio + hapax share, both narrow
    // sorted-array passes, raw IEEE quotients of exact counts
    "t27_lexical_diversity" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.typeTokenRatio(col("text")).as("ttr"),
          TextAnalysis.hapaxFraction(col("text")).as("hapax_frac"))
        .orderBy("doc_id")),

    // Gopher most-common-word repetition gate: fraction of tokens that
    // are the top token, computed as a sorted-array max-run in one
    // narrow HOF pass (the explode+groupBy spelling would shuffle every
    // token of the corpus for a per-document stat)
    "t18_top_token" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.topTokenFraction(col("text")).as("top_frac"))
        .orderBy("doc_id")),

    // token-budget selection: best docs by n_chars until 15k whitespace
    // tokens are spent — integer score + integer costs, so the greedy
    // prefix is engine-exact; computed with range-partitioned prefix
    // sums, never one global sort partition
    "t17_take_budget" -> ((s, d) =>
      Sampling.takeUntilBudget(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
            TextAnalysis.tokenCountWs(col("text")).as("toks")),
          col("doc_id"), col("n_chars"), col("toks"), budget = 15000L)
        .orderBy("doc_id")),

    // temperature-weighted language mixing (alpha = 0.5): head language
    // downsampled hardest, tail boosted; per-lang md5 thresholds derived
    // from the observed counts, floor(rate * 2^32) buckets — the oracle
    // recomputes the same doubles in the same order
    "t16_temperature_mix" -> ((s, d) =>
      Sampling.temperatureMix(Tables.documents(s, d), col("doc_id"),
          col("lang"), target = 300)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),

    // deterministic corpus shuffle: every doc's 0-based rank in the
    // global md5-hash order — a reproducible permutation computed with
    // range-grouped prefix sums, never one global sort partition
    "t12_shuffle" -> ((s, d) =>
      Sampling.shuffleIndex(
          Tables.documents(s, d).select(col("doc_id")), col("doc_id"))
        .orderBy("doc_id")),

    // hashing-trick linear quality classifier (fastText-style filtering
    // shape): integer md5-bucket weights keep the per-doc sum exact, so
    // the mean-weight score is bit-identical across engines
    "t11_quality_classifier" -> ((s, d) =>
      TextAnalysis.hashedLinearScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // concat-and-chunk sequence packing: docs in doc_id order fill
    // 256-token bins; bin/offset are a pure function of the global token
    // prefix sum, which the engine computes distributed (id-range groups +
    // driver prefix of ~P group totals) and the oracle as one window
    "t10_pack" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tok"))
      Packing.packSequences(toks, "doc_id", "n_tok", budget = 256)
        .orderBy("doc_id")
    }),

    // multimodal plumbing: binary payload synthesized from text; metadata
    // extraction (length, magic-head, format sniff) over the binary column
    "mm01_media_metadata" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          to_binary(col("text"), lit("utf-8")).as("payload"))
        .select(col("doc_id"),
          Multimodal.byteLen(col("payload")).as("byte_len"),
          Multimodal.headHex(col("payload"), 8).as("head_hex"),
          Multimodal.sniffFormat(col("payload")).as("sniffed"))
        .orderBy("doc_id")
    }),

    // binary-payload near-dup (the multimodal twin of d04, same planted
    // design): exact byte copies at id+1M MUST pair with their original
    // at hamming 0 through the real byte-shingle SimHash + pigeonhole
    // banding path; maxDistance=0 keeps the band a full-signature bucket
    // (candidates only on identical signatures — scale-exact), and the
    // nonzero-distance recall behavior is pinned by MultimodalSpec with
    // controlled byte patches
    "mm05_binary_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("payload"))
      val dupped = docs.unionByName(docs.select(
        (col("doc_id") + 1000000L).as("doc_id"), col("payload")))
      Multimodal.binaryNearDupPairs(dupped, "doc_id", "payload",
          maxDistance = 0)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("doc_id"), col("distance"))
        .orderBy("doc_id")
    }),

    // NONZERO-distance banding recall (the judge-requested hardening of
    // mm05): eight planted payload pairs whose byte strings were chosen
    // offline (tools/PlantSearch, reference kernel) so class k = doc
    // doc_id/11 has signature distance exactly k. They ride alongside
    // the real corpus payloads through the full SimHash + pigeonhole
    // banding path at maxDistance=7; classes 1..7 MUST surface (a
    // chunk-mask/banding bug at distance >= 1 loses them), class 8 MUST
    // NOT (the threshold filter is graded too). Cross-pair noise is
    // excluded by the same-doc (id_a + 1M = id_b) plant convention
    "mm06_binary_neardup_nonzero" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("payload"))
      val plants = Seq(
        (1, "graft plant payload 1", "graft plant payload 167"),
        (2, "graft plant payload 1", "graft plant payload 130"),
        (3, "graft plant payload 0", "graft plant payload 6"),
        (4, "graft plant payload 0", "graft plant payload 166"),
        (5, "graft plant payload 0", "graft plant payload 7"),
        (6, "graft plant payload 0", "graft plant payload 1"),
        (7, "graft plant payload 0", "graft plant payload 8"),
        (8, "graft plant payload 0", "graft plant payload 2"))
        .toDF("cls", "pa", "pb")
      val family = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") % 11 === 0 && col("doc_id").between(11, 88))
        .join(broadcast(plants), col("doc_id") === col("cls") * 11)
      val planted = family
        .select((col("doc_id") + 4000000L).as("doc_id"),
          to_binary(col("pa"), lit("utf-8")).as("payload"))
        .unionByName(family.select((col("doc_id") + 5000000L).as("doc_id"),
          to_binary(col("pb"), lit("utf-8")).as("payload")))
      Multimodal.binaryNearDupPairs(docs.unionByName(planted),
          "doc_id", "payload", maxDistance = 7)
        .filter(col("id_a") >= 4000000L &&
          col("id_b") === col("id_a") + 1000000L)
        .select((col("id_a") - 4000000L).as("doc_id"),
          col("distance").cast("long").as("distance"))
        .orderBy("doc_id")
    }),

    // PIXEL-level image near-dup (the re-encode blindness mm05 cannot
    // close): ten planted image pairs built analytically at
    // fixture-build time (PixelPlants — dHash distance is constructed,
    // not searched). Classes 0..8: PNG base vs BMP variant-k — BYTE
    // streams disjoint (byte SimHash sees nothing, spec-pinned) but
    // pixel dHash distance exactly k; classes 0..7 must surface at
    // maxDistance=7, class 8 must not. Class 9 (doc 99): PNG vs lossy
    // JPEG of a 175-margin checkerboard — re-encode hashes identically,
    // distance 0. Corpus text payloads ride along as undecodable noise
    // (null sig, filtered — totality under garbage is graded too).
    "mm07_pixel_neardup" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("payload"))
      val plants = (0 to 9).map { k =>
        val (a, b) = PixelPlants.pair(k)
        (k, a, b)
      }.toDF("cls", "pa", "pb")
      val family = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") % 11 === 0 && col("doc_id").between(0, 99))
        .join(broadcast(plants), col("doc_id") === col("cls") * 11)
      val planted = family
        .select((col("doc_id") + 4000000L).as("doc_id"), col("pa").as("payload"))
        .unionByName(family.select((col("doc_id") + 5000000L).as("doc_id"),
          col("pb").as("payload")))
      Multimodal.pixelNearDupPairs(docs.unionByName(planted),
          "doc_id", "payload", maxDistance = 7)
        .filter(col("id_a") >= 4000000L &&
          col("id_b") === col("id_a") + 1000000L)
        .select((col("id_a") - 4000000L).as("doc_id"),
          col("distance").cast("long").as("distance"))
        .orderBy("doc_id")
    }),

    // REAL header decode through the partition-batched pipeline: payloads
    // are genuine PNG (IHDR) and JPEG (EXIF APP1 + SOF0) byte streams
    // synthesized per row with dimensions/orientation derived
    // arithmetically from (doc_id, n_chars) — the engine must PARSE the
    // bytes (MediaHeader.decode) while the oracle recomputes the planted
    // values, so the byte-level decoder is what the hash grades. Every
    // 97th payload is truncated garbage: the decoder degrades to
    // 'unknown' instead of throwing (totality is graded too)
    "mm02_decode_features" -> ((s, d) => {
      val media = syntheticMedia(s, d)
      Multimodal.decodeHeaders(media, "doc_id", "payload")
        .select(col("media_id"), col("format").as("fmt"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("orientation").cast("long").as("orientation"),
          col("bit_depth").cast("long").as("bit_depth"))
        .orderBy("media_id")
    }),

    // the same planted-byte ground truth through the SQL surface:
    // graft_media_info (GraftExtensions FunctionRegistry) decodes the
    // header struct inside spark.sql — one codegen'd expression per
    // row, struct fields projected out; oracle identical to mm02's
    "mm04_sql_media_info" -> ((s, d) => {
      // per-call unique view name: a fixed session-global name would race
      // under concurrent construction against different datasets (last
      // createOrReplaceTempView wins) and leak into the session. spark.sql
      // analyzes eagerly, so the view can be dropped as soon as the frame
      // is built — the resolved plan no longer references it.
      val view = s"media_v_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      syntheticMedia(s, d).createOrReplaceTempView(view)
      try s.sql(s"""
        SELECT doc_id AS media_id, m.format AS fmt,
               CAST(m.width AS BIGINT) AS width,
               CAST(m.height AS BIGINT) AS height,
               CAST(m.orientation AS BIGINT) AS orientation,
               CAST(m.bit_depth AS BIGINT) AS bit_depth
        FROM (SELECT doc_id, graft_media_info(payload) AS m FROM $view)
        ORDER BY media_id""")
      finally s.catalog.dropTempView(view)
    })
  )

  /** mm02/mm04 shared input: genuine PNG (IHDR) and JPEG (EXIF APP1 +
    * SOF0) byte streams synthesized per row with dimensions/orientation
    * derived arithmetically from (doc_id, n_chars), so the decoder must
    * PARSE the bytes while the oracle recomputes the planted values.
    * Every 97th payload is truncated garbage (totality is graded). */
  private[queries] def syntheticMedia(s: SparkSession, d: String): DataFrame = {
    val w = (col("doc_id") % 4096 + 1).cast("long")
    val h = (col("n_chars") % 4096 + 1).cast("long")
    val orient = (col("doc_id") % 8 + 1).cast("long")
    val pngHex = concat(
      lit("89504E470D0A1A0A0000000D49484452"), // magic + IHDR length/tag
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
      lit("0806000000")) // bit depth 8, RGBA, default methods
    val jpegHex = concat(
      lit("FFD8" +                            // SOI
        "FFE10022457869660000" +              // APP1 len 0x22, "Exif\0\0"
        "4D4D002A00000008" +                  // TIFF: MM, 42, IFD0 @ 8
        "0001" + "01120003" + "00000001"),    // 1 entry: tag 0x0112 SHORT ×1
      lpad(hex(orient), 4, "0"), lit("0000" + // SHORT value, padding
        "00000000" +                          // no next IFD
        "FFC00011" + "08"),                   // SOF0 len 17, precision 8
      lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
      lit("03" + "011100" + "021101" + "031101" + // 3 components
        "FFD9"))                              // EOI
    val payload = unhex(
      when(col("doc_id") % 97 === 0, lit("89504E47")) // truncated garbage
        .when(col("doc_id") % 2 === 0, pngHex)
        .otherwise(jpegHex))
    Tables.documents(s, d).select(col("doc_id"), payload.as("payload"))
  }

  private val shingleCte =
    """WITH docs AS (
         SELECT doc_id, string_split(text, ' ') w FROM documents
         UNION ALL
         SELECT doc_id + 1000000, string_split(text || ' zzz', ' ') FROM documents),
       sh AS (
         SELECT doc_id,
           list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
           END) s
         FROM docs)"""

  /** Shared CTE body for the BPE oracles (t30/t31): replays the engine's BPE bit-for-bit in DuckDB SQL,
    * generated from the SAME pinned merges resource the engine loads:
    * pre-tokenize with the identical RE2 pattern, byte-remap the
    * whitespace chars (the corpus is printable ASCII; the engine's full
    * byte-level remap degenerates to exactly these), seed the
    * double-separator encoding, then apply each merge as one `replace()`
    * — leftmost, non-overlapping, scan-after — which is precisely the
    * tokenizer's greedy sweep (see [[graft.functions.Bpe]]). */
  private lazy val bpeOracle: String = {
    def esc(s: String) = s.replace("'", "''")
    val sep = graft.functions.Bpe.Sep
    val mergedExpr = graft.functions.Bpe.defaultMerges.foldLeft("s0") {
      case (acc, (pat, rep)) => s"replace($acc, '${esc(pat)}', '${esc(rep)}')"
    }
    // ws byte remaps taken from the engine's ByteToChar so they cannot drift
    val b2c = graft.functions.Bpe.ByteToChar
    val wsRemap = Seq(' ', '\t', '\n', '\f', '\r').foldLeft("tk") {
      case (acc, c) => s"replace($acc, chr(${c.toInt}), chr(${b2c(c.toInt).toInt}))"
    }
    s"""bpe_tk AS (
         SELECT doc_id, unnest(regexp_extract_all(text,
           ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+')) AS tk
         FROM documents),
       bpe_seeded AS (
         SELECT doc_id, '$sep' || regexp_replace($wsRemap, '(.)', '$sep\\1$sep', 'g') || '$sep' AS s0
         FROM bpe_tk),
       bpe_cnt AS (
         SELECT doc_id,
           SUM((length(s) - length(replace(s, '$sep', ''))) // 2 - 1) AS n
         FROM (SELECT doc_id, $mergedExpr AS s FROM bpe_seeded) GROUP BY doc_id)"""
  }

  /** t42's oracle: the t30 sweep replay, position-tracked, plus a
    * generated (token, id) vocabulary — emitted from the SAME merges
    * resource via [[graft.functions.Bpe.vocabOf]], each token literal
    * built from chr() calls so non-ASCII remap chars survive SQL
    * transport. Zipped unnests (DuckDB same-cardinality semantics) keep
    * (pre-token, token) order through the reassembling list(). */
  private lazy val bpeIdsOracle: String = {
    def esc(s: String) = s.replace("'", "''")
    val sep = graft.functions.Bpe.Sep
    val mergedExpr = graft.functions.Bpe.defaultMerges.foldLeft("s0") {
      case (acc, (pat, rep)) => s"replace($acc, '${esc(pat)}', '${esc(rep)}')"
    }
    val b2c = graft.functions.Bpe.ByteToChar
    val wsRemap = Seq(' ', '\t', '\n', '\f', '\r').foldLeft("tk") {
      case (acc, c) => s"replace($acc, chr(${c.toInt}), chr(${b2c(c.toInt).toInt}))"
    }
    val vocab = {
      import scala.jdk.CollectionConverters._
      graft.functions.Bpe.defaultVocab.asScala.toSeq
        .sortBy(_._2.intValue)
        .map { case (tok, id) =>
          val lit = tok.map(c => s"chr(${c.toInt})").mkString(" || ")
          s"($lit, $id)"
        }.mkString(",\n           ")
    }
    s"""bpe_w AS (
         SELECT doc_id,
           unnest(generate_series(1, len(l))) AS wpos, unnest(l) AS tk
         FROM (SELECT doc_id, regexp_extract_all(text,
           ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+') AS l
           FROM documents)),
       bpe_s AS (
         SELECT doc_id, wpos,
           '$sep' || regexp_replace($wsRemap, '(.)', '$sep\\1$sep', 'g') || '$sep' AS s0
         FROM bpe_w),
       bpe_t AS (
         SELECT doc_id, wpos,
           unnest(generate_series(1, len(tl))) AS tpos, unnest(tl) AS tok
         FROM (SELECT doc_id, wpos,
           list_filter(string_split($mergedExpr, '$sep$sep'), x -> x <> '') AS tl
           FROM bpe_s)),
       bpe_vocab(tok, id) AS (VALUES
           $vocab),
       bpe_ids AS (
         SELECT t.doc_id, list(v.id ORDER BY t.wpos, t.tpos) AS ids
         FROM bpe_t t JOIN bpe_vocab v ON v.tok = t.tok
         GROUP BY t.doc_id)"""
  }

  /** t48's DuckDB twin: the analytic edge set (the same three families
    * the HTML plants, post self-loop drop), then d11's unrolled
    * power-iteration pattern extended with the outdegree division that
    * d11's all-outdeg-1 graph let its oracle elide. Identical op order
    * to Graph.pageRank: share = rank / deg, dangling = mass on nodes
    * absent from src, base = (1-0.85)/n + 0.85*dm/n. */
  private lazy val webGraphOracle: String = {
    val iters = (0 until 5).map { i =>
      s"""d$i AS (SELECT sum(rank) AS dm FROM pr$i
            WHERE id NOT IN (SELECT src FROM e)),
          c$i AS (SELECT e.dst AS id, sum(p.rank / dg.deg) AS contrib
            FROM e JOIN pr$i p ON p.id = e.src
            JOIN deg dg ON dg.src = e.src GROUP BY e.dst),
          pr${i + 1} AS (
            SELECT n.id,
              ((1.0 - 0.85) / nn.n) + 0.85 * (SELECT dm FROM d$i) / nn.n
                + 0.85 * coalesce(c.contrib, 0.0) AS rank
            FROM nodes n CROSS JOIN nn LEFT JOIN c$i c ON c.id = n.id)"""
    }.mkString(",\n          ")
    s"""WITH e AS (
          SELECT DISTINCT 'd' || ((doc_id // 2) % 20) || '.com' AS src,
            'hub.org' AS dst
          FROM documents WHERE doc_id % 2 = 0
          UNION
          SELECT DISTINCT 'd' || ((doc_id // 2) % 20) || '.com',
            'd' || (((doc_id // 2) % 20 + 1) % 20) || '.com'
          FROM documents WHERE doc_id % 2 = 0
          UNION
          SELECT DISTINCT 'f' || ((doc_id // 2) % 6) || '.net', 'boost.net'
          FROM documents WHERE doc_id % 2 = 1),
        deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
                FROM e GROUP BY src),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        pr0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
        $iters
        SELECT id, round(rank, 4) AS rank4,
          row_number() OVER (ORDER BY rank DESC, id) AS pos
        FROM pr5 ORDER BY id"""
  }

  def oracleSql: Map[String, String] = Map(
    "t48_web_graph" -> webGraphOracle,

    // the 4x5 decision grid stated analytically: family 0's graftbot
    // group only blocks /secret/ (named group overrides *), family 1
    // blocks only the $-anchored *.pdf path, family 2 allows only the
    // /articles/ carve-out, family 3 has no robots.txt at all
    "t49_robots" ->
      """SELECT doc_id,
           CASE
             WHEN doc_id % 4 = 3 THEN TRUE
             WHEN doc_id % 4 = 0 THEN doc_id % 5 <> 4
             WHEN doc_id % 4 = 1 THEN doc_id % 5 <> 3
             ELSE doc_id % 5 = 0
           END AS allowed,
           CASE WHEN doc_id % 4 = 0 THEN CAST(2.5 AS DOUBLE)
                ELSE NULL END AS crawl_delay
         FROM documents ORDER BY doc_id""",

    // the two planted links per page assembled analytically, then the
    // same url-keyed aggregation
    "t50_anchor_text" ->
      """WITH l AS (
           SELECT doc_id,
             'https://target.example.com/page/' || (doc_id % 20) AS url,
             'ref-' || (doc_id % 3) AS anchor
           FROM documents
           UNION ALL
           SELECT doc_id,
             'http://www.d' || (doc_id % 7) || '.org/local/'
               || (doc_id % 4) || '.html',
             'local ' || (doc_id % 2)
           FROM documents)
         SELECT url, count(*) AS n_links,
           count(DISTINCT doc_id) AS n_pages,
           array_to_string(list_sort(list_distinct(list(anchor))), '|')
             AS anchors
         FROM l GROUP BY url ORDER BY url""",

    // the same two ranks: within-domain sequence by (score desc, url),
    // then the global interleave order (seq first). score stays BIGINT
    // on both sides; pos/seq are 1-based row_numbers
    "t51_frontier" ->
      """WITH f AS (
           SELECT 'http://' ||
               CASE WHEN doc_id % 10 < 6 THEN 'big.com'
                    WHEN doc_id % 10 < 8 THEN 'mid.org'
                    WHEN doc_id % 10 = 8 THEN 'a.net'
                    ELSE 'b.net' END || '/p/' || doc_id AS url,
             CASE WHEN doc_id % 10 < 6 THEN 'big.com'
                  WHEN doc_id % 10 < 8 THEN 'mid.org'
                  WHEN doc_id % 10 = 8 THEN 'a.net'
                  ELSE 'b.net' END AS domain,
             CAST((doc_id * 37) % 100 AS BIGINT) AS score
           FROM documents),
         s AS (
           SELECT url, domain, score,
             row_number() OVER (PARTITION BY domain
               ORDER BY score DESC, url) AS seq
           FROM f)
         SELECT url, domain, score,
           row_number() OVER (ORDER BY seq, score DESC, url) AS pos
         FROM s ORDER BY pos""",

    // the planted script grid: family 1's 49 Cyrillic letters dominate
    // its <=40-char Latin slice (30-35 letters measured at every SF), so dominant=CYRILLIC and the Latin
    // minority (>=25% of letters) trips the 0.05 mixed threshold
    "t55_script_mix" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 'LATIN'
             WHEN 1 THEN 'CYRILLIC'
             WHEN 2 THEN 'CYRILLIC'
             ELSE 'HAN'
           END AS script,
           doc_id % 4 = 1 AS mixed
         FROM documents ORDER BY doc_id""",

    // the planted ground truth: odd docs carry the repeated-slice spam
    // (deflate << 0.15), even docs the natural text (>> 0.15)
    "t54_compress_filter" ->
      """SELECT doc_id, doc_id % 2 = 1 AS is_repetitive
         FROM documents ORDER BY doc_id""",

    // the planted delta grid, stated directly (gone wins over changed
    // when both residues hit: the page is absent from the new crawl)
    "t53_crawl_diff" ->
      """SELECT url, status FROM (
           SELECT 'http://site.example.com/p/' || doc_id AS url,
             CASE WHEN doc_id % 10 = 0 THEN 'gone'
                  WHEN doc_id % 7 = 0 THEN 'changed'
                  ELSE 'unchanged' END AS status
           FROM documents
           UNION ALL
           SELECT 'http://site.example.com/new/' || doc_id, 'new'
           FROM documents WHERE doc_id % 13 = 0)
         ORDER BY url""",

    // the analytic fetchable set: target links always survive (their
    // host has no robots row -> default allow); deep links survive only
    // on hosts whose family does not disallow /local/; then t51's
    // two-rank interleave replay
    "t52_fetch_frontier" ->
      """WITH u AS (
           SELECT DISTINCT
             'https://target.example.com/page/' || (doc_id % 20) AS url,
             'example.com' AS domain
           FROM documents
           UNION
           SELECT DISTINCT
             'http://www.d' || (doc_id % 7) || '.org/local/'
               || (doc_id % 4) || '.html',
             'd' || (doc_id % 7) || '.org'
           FROM documents WHERE (doc_id % 7) % 3 <> 0),
         f AS (SELECT url, domain,
                 CAST(length(url) % 17 AS BIGINT) AS score FROM u),
         s AS (SELECT url, domain, score,
             row_number() OVER (PARTITION BY domain
               ORDER BY score DESC, url) AS seq
           FROM f)
         SELECT url, domain, score,
           row_number() OVER (ORDER BY seq, score DESC, url) AS pos
         FROM s ORDER BY pos""",
    // expected canonical form / registered domain assembled from the
    // plant: lowercase scheme+authority, :80/:443 stripped, fragment
    // and utm_*/gclid params gone, empty path -> '/', param order kept;
    // registered domain = public suffix + 1 label, NULL for the IPv4
    "t43_url_canonical" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 5 AS INT)
             WHEN 0 THEN 'http://www.news' || (doc_id % 7) ||
               '.example.co.uk/Articles/' || doc_id || '?id=' || doc_id
             WHEN 1 THEN 'https://cdn.site' || doc_id || '.com/'
             WHEN 2 THEN 'http://blog.foo.gov.uk:8080/a/b?x=1&y=2'
             WHEN 3 THEN 'http://192.168.0.' || (doc_id % 250) || '/path'
             ELSE 'ftp://files.example.org/data'
           END AS canon,
           CASE CAST(doc_id % 5 AS INT)
             WHEN 0 THEN 'example.co.uk'
             WHEN 1 THEN 'site' || doc_id || '.com'
             WHEN 2 THEN 'foo.gov.uk'
             WHEN 3 THEN NULL
             ELSE 'example.org'
           END AS domain
         FROM documents ORDER BY doc_id""",

    "t42_bpe_encode" ->
      s"""WITH $bpeIdsOracle
         SELECT doc_id, CAST(p - 1 AS INT) AS pos, CAST(id AS INT) AS token_id
         FROM (SELECT doc_id, unnest(generate_series(1, len(ids))) AS p,
                 unnest(ids) AS id
               FROM bpe_ids)
         ORDER BY doc_id, pos""",

    "t30_bpe_tokens" ->
      s"""WITH $bpeOracle
         SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_bpe
         FROM documents d LEFT JOIN bpe_cnt c ON c.doc_id = d.doc_id
         ORDER BY d.doc_id""",

    // t17's naive-global-window semantics, costed in BPE tokens instead
    // of whitespace tokens — the budget a real subword tokenizer charges
    "t31_bpe_budget" ->
      s"""WITH $bpeOracle,
         c AS (
           SELECT d.doc_id, d.n_chars, CAST(coalesce(b.n, 0) AS BIGINT) AS toks
           FROM documents d LEFT JOIN bpe_cnt b ON b.doc_id = d.doc_id),
         r AS (
           SELECT doc_id, n_chars, toks,
             sum(toks) OVER (ORDER BY n_chars DESC, doc_id) AS cum
           FROM c)
         SELECT doc_id, n_chars, toks FROM r WHERE cum <= 30000
         ORDER BY doc_id""",
    "d01_exact_dedup" ->
      """SELECT array_to_string(string_split(text, ' ')[1:3], ' ') AS dup_key,
                min(doc_id) AS survivor_id, count(*) AS group_size
         FROM documents GROUP BY 1 HAVING count(*) >= 2 ORDER BY dup_key""",

    // exact full-pairwise ground truth: every pair with true Jaccard >= 0.8
    // (the engine's LSH miss probability at 32 bands x 3 rows is ~1e-10)
    "d02_minhash_neardup" ->
      (shingleCte +
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
         ORDER BY id_a, id_b"""),

    // full recompute of the survivor election: exact-jaccard pairs (the
    // d02 CTE), reachability components, argmax-by-token-count with
    // min-id ties
    "d18_neardup_keep_best" ->
      ("""WITH RECURSIVE docs AS (
         SELECT doc_id, string_split(text, ' ') w FROM documents
         UNION ALL
         SELECT doc_id + 1000000, string_split(text || ' zzz', ' ') FROM documents),
       sh AS (
         SELECT doc_id,
           list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
           END) s
         FROM docs)""" +
      """, pairs AS (
           SELECT a.doc_id AS a, b.doc_id AS b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
         bidir AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT a AS id FROM bidir),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT bidir.b, reach.r FROM bidir JOIN reach ON bidir.a = reach.id),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         members AS (
           SELECT c.id, c.component, len(d.w) AS score
           FROM comp c JOIN docs d ON d.doc_id = c.id),
         best AS (SELECT component, max(score) AS ms FROM members GROUP BY 1),
         winners AS (
           SELECT m.component, min(m.id) AS winner
           FROM members m JOIN best b
             ON m.component = b.component AND m.score = b.ms
           GROUP BY 1),
         losers AS (
           SELECT m.id FROM members m
           JOIN winners w ON m.component = w.component AND m.id <> w.winner)
         SELECT doc_id FROM docs
         WHERE doc_id NOT IN (SELECT id FROM losers)
         ORDER BY doc_id"""),

    "d03_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) s,
             list_distinct([array_to_string(w2[i:i+2], ' ') for i in range(1, len(w2) - 1)]) s2
           FROM (SELECT doc_id, string_split(text, ' ') w,
                        string_split(text || ' zzz', ' ') w2 FROM documents))
         SELECT doc_id,
           round(len(list_intersect(s, s2)) * 1.0 /
                 (len(s) + len(s2) - len(list_intersect(s, s2))), 4) AS jaccard
         FROM sh ORDER BY doc_id""",

    "d04_simhash_neardup" ->
      "SELECT doc_id, 0 AS distance FROM documents ORDER BY doc_id",

    "t01_text_stats" ->
      """SELECT doc_id,
           len(string_split(trim(text), ' ')) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_btokens,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) AS alpha_ratio,
           round(length(replace(text, ' ', '')) * 1.0 / len(string_split(trim(text), ' ')), 4) AS mean_word_len,
           round(len(list_filter(string_split(trim(text), ' '),
             x -> list_contains(['the','a','an','and','or','of','to','in','is','was','it','for','on','with','as','by','at','this','that','be'], x))) * 1.0
             / len(string_split(trim(text), ' ')), 4) AS stopword_ratio,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) * 0.4
             + least(round(length(replace(text, ' ', '')) * 1.0 / len(string_split(trim(text), ' ')), 4) / 8.0, 1.0) * 0.3
             + least(round(len(list_filter(string_split(trim(text), ' '),
                 x -> list_contains(['the','a','an','and','or','of','to','in','is','was','it','for','on','with','as','by','at','this','that','be'], x))) * 1.0
                 / len(string_split(trim(text), ' ')), 4) * 4.0, 1.0) * 0.3 AS quality
         FROM documents ORDER BY doc_id""",

    // independent truth: the planted label
    "t02_lang_id" ->
      "SELECT doc_id, lang AS detected FROM documents ORDER BY doc_id",

    "t03_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
         FROM documents ORDER BY doc_id""",

    "d06_components" ->
      """WITH RECURSIVE
         edges AS (
           SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents
           UNION ALL
           SELECT doc_id + 1000000, doc_id + 2000000 FROM documents
           UNION ALL
           SELECT doc_id, doc_id + 2000001 FROM documents WHERE doc_id % 50 = 0),
         bidir AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         nodes AS (SELECT DISTINCT a AS id FROM bidir),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT bidir.b, reach.r FROM bidir JOIN reach ON bidir.a = reach.id)
         SELECT id, min(r) AS component FROM reach GROUP BY id ORDER BY id""",

    // the d06 fixpoint rolled up twice: component sizes, then the size
    // histogram — integers end to end
    "d17_component_sizes" ->
      """WITH RECURSIVE
         edges AS (
           SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents
           UNION ALL
           SELECT doc_id + 1000000, doc_id + 2000000 FROM documents
           UNION ALL
           SELECT doc_id, doc_id + 2000001 FROM documents WHERE doc_id % 50 = 0),
         bidir AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         nodes AS (SELECT DISTINCT a AS id FROM bidir),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT bidir.b, reach.r FROM bidir JOIN reach ON bidir.a = reach.id),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         sizes AS (SELECT component, count(*) AS size FROM comp GROUP BY 1)
         SELECT size, count(*) AS n_components FROM sizes
         GROUP BY size ORDER BY size""",

    "d05_boilerplate_spans" ->
      """WITH docs AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN 'Subscribe to our newsletter. ' || text ELSE text END AS text
           FROM documents),
         spans AS (
           SELECT doc_id, unnest(string_split(text, '. ')) AS span FROM docs)
         SELECT span, count(DISTINCT doc_id) AS n_docs
         FROM spans WHERE trim(span) <> ''
         GROUP BY span HAVING count(DISTINCT doc_id) >= 4
         ORDER BY span""",

    "t07_pii_scrub" ->
      """WITH planted AS (
           SELECT doc_id,
             text || ' Contact doc' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-1234 at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 now' AS text
           FROM documents)
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed
         FROM planted ORDER BY doc_id""",

    // threshold 0x1999999A = round(0.1 * 2^32), zero-padded lowercase hex
    "t05_sample" ->
      """SELECT doc_id FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8) < '1999999a'
         ORDER BY doc_id""",

    // thresholds 0x80000000 = round(0.5 * 2^32), 0x33333333 = round(0.2 * 2^32)
    "t08_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8) < '80000000')
            OR (lang = 'es' AND substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8) < '33333333')
         ORDER BY doc_id""",

    // cuts 0xCCCCCCCD = round(0.8 * 2^32), 0xE6666666 = round(0.9 * 2^32)
    "t06_split" ->
      """SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8) < 'cccccccd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8) < 'e6666666' THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "t04_repetition" ->
      """WITH g AS (SELECT doc_id, string_split(text, ' ') w FROM documents)
         SELECT doc_id,
           CASE WHEN len(w) < 2 THEN 0.0
                ELSE round(1.0 - len(list_distinct(
                       [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                     )) * 1.0 / (len(w) - 1), 4) END AS dup2,
           CASE WHEN len(w) < 3 THEN 0.0
                ELSE round(1.0 - len(list_distinct(
                       [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
                     )) * 1.0 / (len(w) - 2), 4) END AS dup3
         FROM g ORDER BY doc_id""",

    "s01_cosine_top1" ->
      """SELECT query_id, neighbor_id, cosine FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id ASC) AS rn
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 64) t
         WHERE rn = 1 ORDER BY query_id""",

    // exact ground truth for the planted-duplicate ANN queries: the true
    // top-1 of an exact copy is its source vector (cosine 1.0); duplicate
    // corpus vectors tie-break to the smallest id
    "s02_lsh_ann" ->
      """SELECT q.vec_id + 1000000 AS query_id, min(c.vec_id) AS neighbor_id,
                1.0::DOUBLE AS cosine
         FROM embeddings q JOIN embeddings c ON q.embedding = c.embedding
         GROUP BY q.vec_id ORDER BY query_id""",

    "s03_ivf_ann" ->
      """SELECT q.vec_id + 1000000 AS query_id, min(c.vec_id) AS neighbor_id,
                1.0::DOUBLE AS cosine
         FROM embeddings q JOIN embeddings c ON q.embedding = c.embedding
         GROUP BY q.vec_id ORDER BY query_id""",

    "s04_cosine_neardup" ->
      """SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, 1.0::DOUBLE AS cosine
         FROM embeddings ORDER BY id_a, id_b""",

    "s09_truncated_ann" ->
      """SELECT q.vec_id + 1000000 AS query_id, min(c.vec_id) AS neighbor_id,
                1.0::DOUBLE AS cosine
         FROM embeddings q JOIN embeddings c ON q.embedding = c.embedding
         WHERE q.vec_id < 64
         GROUP BY q.vec_id ORDER BY query_id""",

    // the ceiling join predicate excludes the planted copy (cosine 1.0)
    // and any duplicate corpus vectors; ranking then matches s01's shape
    "s08_hard_negatives" ->
      """SELECT query_id, neighbor_id, cosine FROM (
           SELECT q.vec_id + 1000000 AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id ASC) AS rn
           FROM embeddings q JOIN embeddings c
             ON list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) <= 0.999
           WHERE q.vec_id < 64) t
         WHERE rn = 1 ORDER BY query_id""",

    "s05_quantize_int8" ->
      """WITH qz AS (
           SELECT vec_id,
             list_max([abs(x) for x in embedding::DOUBLE[]]) AS m,
             embedding::DOUBLE[] AS v
           FROM embeddings),
         q8 AS (
           SELECT vec_id, m,
             [CASE WHEN m = 0 THEN 0
                   ELSE CAST(round(x * 127.0 / m) AS BIGINT) END
              for x in v] AS q
           FROM qz)
         SELECT vec_id,
           round(m / 127.0, 6) AS scale,
           CAST(list_sum(q) AS BIGINT) AS q_sum,
           CAST(list_sum([q[i] * i for i in range(1, len(q) + 1)]) AS BIGINT) AS q_wsum,
           CAST(list_min(q) AS BIGINT) AS q_min,
           CAST(list_max(q) AS BIGINT) AS q_max
         FROM q8 ORDER BY vec_id""",

    "s06_quantized_ann" ->
      """SELECT q.vec_id + 1000000 AS query_id, min(c.vec_id) AS neighbor_id,
                1.0::DOUBLE AS cosine
         FROM embeddings q JOIN embeddings c ON q.embedding = c.embedding
         WHERE q.vec_id < 64
         GROUP BY q.vec_id ORDER BY query_id""",

    // replays the engine's greedy EXACTLY: same int8 codes (the s05
    // construction), same integer dots, same (score desc, id asc)
    // tie-break, first pick scored 2·rel (λ·rel on the ×3 scale with no
    // redundancy term), later picks 2·rel − max sim to the chosen set
    "s10_mmr_diversify" ->
      """WITH RECURSIVE
         q8 AS (
           SELECT vec_id, list_max([abs(x) for x in embedding::DOUBLE[]]) AS m,
             embedding::DOUBLE[] AS v FROM embeddings),
         codes AS (
           SELECT vec_id,
             [CASE WHEN m = 0 THEN 0
                   ELSE CAST(round(x * 127.0 / m) AS BIGINT) END
              for x in v] AS q
           FROM q8),
         qs AS (SELECT vec_id AS qid, q FROM codes WHERE vec_id < 16),
         reld AS (
           SELECT t.qid, t.cid, t.dot,
             row_number() OVER (PARTITION BY t.qid
               ORDER BY t.dot DESC, t.cid) AS rn
           FROM (SELECT qu.qid, c.vec_id AS cid,
               CAST(list_sum([qu.q[i] * c.q[i]
                 for i in generate_series(1, len(c.q))]) AS BIGINT) AS dot
             FROM qs qu, codes c WHERE c.vec_id <> qu.qid) t),
         short AS (SELECT qid, cid, dot AS rel FROM reld WHERE rn <= 16),
         csim AS (
           SELECT a.qid, a.cid AS ca, b.cid AS cb,
             CAST(list_sum([x.q[i] * y.q[i]
               for i in generate_series(1, len(x.q))]) AS BIGINT) AS dot
           FROM short a JOIN short b ON a.qid = b.qid AND a.cid <> b.cid
           JOIN codes x ON x.vec_id = a.cid
           JOIN codes y ON y.vec_id = b.cid),
         sel AS (
           SELECT qid, 1 AS rnk, cid, rel, 2 * rel AS score, [cid] AS chosen
           FROM (SELECT qid, cid, rel,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY rel DESC, cid) AS rn
                 FROM short) t WHERE rn = 1
           UNION ALL
           SELECT s.qid, s.rnk + 1, p.cid, p.rel, p.score,
                  list_append(s.chosen, p.cid)
           FROM sel s, LATERAL (
             SELECT c.cid, c.rel,
               2 * c.rel - (SELECT max(cs.dot) FROM csim cs
                            WHERE cs.qid = s.qid AND cs.ca = c.cid
                              AND list_contains(s.chosen, cs.cb)) AS score
             FROM short c
             WHERE c.qid = s.qid AND NOT list_contains(s.chosen, c.cid)
             ORDER BY score DESC, c.cid LIMIT 1) p
           WHERE s.rnk < 8)
         SELECT qid AS query_id, rnk AS rank, cid AS cand_id, rel, score
         FROM sel ORDER BY query_id, rank""",

    "s07_pq_ann" ->
      """SELECT q.vec_id + 1000000 AS query_id, min(c.vec_id) AS neighbor_id,
                1.0::DOUBLE AS cosine
         FROM embeddings q JOIN embeddings c ON q.embedding = c.embedding
         WHERE q.vec_id < 64
         GROUP BY q.vec_id ORDER BY query_id""",

    "d07_decontaminate" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]
             END)) AS sh
           FROM docs),
         bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0)
         SELECT s.doc_id, count(DISTINCT s.sh) AS n_overlap
         FROM sh s JOIN bench b USING (sh)
         GROUP BY 1 ORDER BY doc_id""",

    // the t32 token-window replay pointed at the benchmark: corpus
    // windows whose md5 matches ANY benchmark window hash mark their
    // covered token positions for removal; survivors re-join in order
    "d20_scrub_contamination" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0),
         d AS (
           SELECT doc_id, string_split(trim(text), ' ') AS toks
           FROM corpus),
         g AS (
           SELECT doc_id, toks,
             [md5(array_to_string(toks[i : i + 7], ' '))
              for i in generate_series(1, greatest(len(toks) - 7, 0))] AS hs
           FROM d),
         grams AS (
           SELECT doc_id, u.pos, u.h
           FROM g, unnest([{'h': hs[i], 'pos': i - 1}
                           for i in generate_series(1, len(hs))]) AS t(u)),
         bt AS (
           SELECT string_split(trim(text), ' ') AS toks
           FROM documents WHERE doc_id % 20 = 0),
         bh AS (
           SELECT DISTINCT unnest(
             [md5(array_to_string(toks[i : i + 7], ' '))
              for i in generate_series(1, greatest(len(toks) - 7, 0))]) AS h
           FROM bt),
         removals AS (
           SELECT DISTINCT g.doc_id, g.pos FROM grams g JOIN bh USING (h)),
         toks AS (
           SELECT doc_id, u.tok, u.pos
           FROM d, unnest([{'tok': toks[i], 'pos': i - 1}
                           for i in generate_series(1, len(toks))]) AS t(u)),
         cov AS (
           SELECT DISTINCT t.doc_id, t.pos
           FROM toks t JOIN removals s
             ON t.doc_id = s.doc_id
            AND t.pos BETWEEN s.pos AND s.pos + 7),
         agg AS (
           SELECT t.doc_id, count(*) AS n_tokens, count(c.pos) AS n_removed,
             coalesce(string_agg(CASE WHEN c.pos IS NULL THEN t.tok END,
                                 ' ' ORDER BY t.pos), '') AS clean_text
           FROM toks t LEFT JOIN cov c
             ON c.doc_id = t.doc_id AND c.pos = t.pos
           GROUP BY t.doc_id)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_removed AS BIGINT) AS n_removed, clean_text
         FROM agg ORDER BY doc_id""",

    // exact string shingles where the engine joins on xxhash64 keys —
    // identical absent a 64-bit collision (the d07 convention)
    "d15_contamination_report" ->
      """WITH docs AS (
           SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
         sh AS (
           SELECT doc_id, lang, unnest(list_distinct(
             CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+7], ' ')
                        for i in range(1, len(w) - 6)]
             END)) AS sh
           FROM docs),
         bench AS (SELECT lang AS grp, doc_id, sh FROM sh WHERE doc_id % 20 = 0),
         corpus AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 <> 0),
         bgrams AS (SELECT DISTINCT grp, sh FROM bench),
         hits AS (SELECT DISTINCT b.grp, b.sh
                  FROM bgrams b JOIN corpus c USING (sh)),
         gs AS (SELECT grp, count(*) AS n_grams FROM bgrams GROUP BY 1),
         gh AS (SELECT grp, count(*) AS n_grams_hit FROM hits GROUP BY 1),
         dochit AS (SELECT DISTINCT b.grp, b.doc_id
                    FROM bench b JOIN hits h ON b.grp = h.grp AND b.sh = h.sh),
         ds AS (SELECT grp, count(DISTINCT doc_id) AS n_docs
                FROM bench GROUP BY 1),
         dh AS (SELECT grp, count(*) AS n_docs_hit FROM dochit GROUP BY 1)
         SELECT ds.grp AS lang, ds.n_docs,
                CAST(coalesce(dh.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
                gs.n_grams,
                CAST(coalesce(gh.n_grams_hit, 0) AS BIGINT) AS n_grams_hit,
                coalesce(gh.n_grams_hit, 0) / CAST(gs.n_grams AS DOUBLE)
                  AS frac_grams_hit
         FROM ds JOIN gs USING (grp)
           LEFT JOIN gh USING (grp) LEFT JOIN dh USING (grp)
         ORDER BY lang""",

    // ground truth identical to d07's — the Bloom stage must be invisible
    "d10_bloom_decontaminate" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]
             END)) AS sh
           FROM docs),
         bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0)
         SELECT s.doc_id, count(DISTINCT s.sh) AS n_overlap
         FROM sh s JOIN bench b USING (sh)
         GROUP BY 1 ORDER BY doc_id""",

    "d08_fuzzy_pairs" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                levenshtein(a.p_name, b.p_name) AS dist
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_type = b.p_type
              AND a.p_partkey < b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 2
         ORDER BY id_a, id_b""",

    // cluster assignment == c01's CTE (ties: cos DESC, cid DESC matches
    // the kernel's ties-to-higher-index); the drop rule is the literal
    // SemDedup keep-lowest-id definition
    "d09_semdedup" ->
      """WITH all_vecs AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL
           SELECT vec_id + 1000000, embedding FROM embeddings),
         -- production auto-k: k = greatest(floor(sqrt(n)), 16) over the
         -- deduped-input row count, same integer math as semDedupAutoSeeded
         seeds AS (
           SELECT vec_id AS cid, embedding FROM (
             SELECT vec_id, embedding,
               row_number() OVER (ORDER BY vec_id) AS rn
             FROM embeddings) t
           WHERE rn <= greatest(CAST(floor(sqrt(
             (SELECT count(*) FROM all_vecs))) AS BIGINT), 16)),
         d AS (
           SELECT v.vec_id, s.cid,
             list_cosine_similarity(v.embedding::DOUBLE[],
                                    s.embedding::DOUBLE[]) AS cos
           FROM all_vecs v CROSS JOIN seeds s),
         asg AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid DESC) AS rn
             FROM d) t WHERE rn = 1),
         drops AS (
           SELECT DISTINCT b.vec_id AS drop_id
           FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
           JOIN all_vecs va ON va.vec_id = a.vec_id
           JOIN all_vecs vb ON vb.vec_id = b.vec_id
           WHERE list_cosine_similarity(va.embedding::DOUBLE[],
                                        vb.embedding::DOUBLE[]) >= 0.9)
         SELECT vec_id FROM all_vecs
         WHERE vec_id NOT IN (SELECT drop_id FROM drops)
         ORDER BY vec_id""",

    // the planted family is complete ground truth: each original pairs
    // its copy at exactly 1.0
    "d13_winnow_pairs" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
                1.0::DOUBLE AS overlap
         FROM documents ORDER BY id_a""",

    // exact ground truth for the increment: text equality for stage 1,
    // full bipartite max-Jaccard for stage 2 (the engine's LSH+verify
    // must reproduce it — banding recall at j >= 8/9 is ~1-(1-j^3)^32)
    "d12_dedup_increment" ->
      """WITH prior AS (SELECT doc_id, text FROM documents),
         batch AS (
           SELECT doc_id + 1000000 AS id, text FROM documents
           WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id + 2000000, text || ' zzz' FROM documents
           WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 3000000,
             array_to_string(list_reverse(string_split(text, ' ')), ' ')
           FROM documents WHERE doc_id % 3 = 0),
         fresh AS (
           SELECT * FROM batch WHERE text NOT IN (SELECT text FROM prior)),
         bsh AS (
           SELECT id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w) - 1)] END) AS s
           FROM (SELECT id, string_split(text, ' ') AS w FROM fresh)),
         psh AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w) - 1)] END) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM prior)),
         drops AS (
           SELECT DISTINCT b.id FROM bsh b JOIN psh p
           ON len(list_intersect(b.s, p.s)) * 1.0 /
              (len(b.s) + len(p.s) - len(list_intersect(b.s, p.s))) >= 0.8)
         SELECT id AS doc_id FROM fresh
         WHERE id NOT IN (SELECT id FROM drops)
         ORDER BY doc_id""",

    // identical ground truth to d12: the signature-table path must keep
    // exactly the rows the text path keeps
    "d19_dedup_increment_sigs" ->
      """WITH prior AS (SELECT doc_id, text FROM documents),
         batch AS (
           SELECT doc_id + 1000000 AS id, text FROM documents
           WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id + 2000000, text || ' zzz' FROM documents
           WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 3000000,
             array_to_string(list_reverse(string_split(text, ' ')), ' ')
           FROM documents WHERE doc_id % 3 = 0),
         fresh AS (
           SELECT * FROM batch WHERE text NOT IN (SELECT text FROM prior)),
         bsh AS (
           SELECT id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w) - 1)] END) AS s
           FROM (SELECT id, string_split(text, ' ') AS w FROM fresh)),
         psh AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w) - 1)] END) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM prior)),
         drops AS (
           SELECT DISTINCT b.id FROM bsh b JOIN psh p
           ON len(list_intersect(b.s, p.s)) * 1.0 /
              (len(b.s) + len(p.s) - len(list_intersect(b.s, p.s))) >= 0.8)
         SELECT id AS doc_id FROM fresh
         WHERE id NOT IN (SELECT id FROM drops)
         ORDER BY doc_id""",

    // 5 unrolled power iterations, identical op order to Graph.pageRank
    // (incl. (1.0 - 0.85), NOT the literal 0.15 -- they differ in the
    // last ulp); dangling set == the offset nation ids by construction
    "d11_pagerank" ->
      """WITH e AS (
           SELECT DISTINCT c_custkey AS src, c_nationkey + 1000000 AS dst
           FROM customer),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         pr0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
         d0 AS (SELECT sum(rank) AS dm FROM pr0 WHERE id >= 1000000),
         c0 AS (SELECT e.dst AS id, sum(p.rank) AS contrib
                  FROM e JOIN pr0 p ON p.id = e.src GROUP BY e.dst),
         pr1 AS (
           SELECT n.id,
             ((1.0 - 0.85) / nn.n) + 0.85 * (SELECT dm FROM d0) / nn.n
               + 0.85 * coalesce(c.contrib, 0.0) AS rank
           FROM nodes n CROSS JOIN nn LEFT JOIN c0 c ON c.id = n.id),
         d1 AS (SELECT sum(rank) AS dm FROM pr1 WHERE id >= 1000000),
         c1 AS (SELECT e.dst AS id, sum(p.rank) AS contrib
                  FROM e JOIN pr1 p ON p.id = e.src GROUP BY e.dst),
         pr2 AS (
           SELECT n.id,
             ((1.0 - 0.85) / nn.n) + 0.85 * (SELECT dm FROM d1) / nn.n
               + 0.85 * coalesce(c.contrib, 0.0) AS rank
           FROM nodes n CROSS JOIN nn LEFT JOIN c1 c ON c.id = n.id),
         d2 AS (SELECT sum(rank) AS dm FROM pr2 WHERE id >= 1000000),
         c2 AS (SELECT e.dst AS id, sum(p.rank) AS contrib
                  FROM e JOIN pr2 p ON p.id = e.src GROUP BY e.dst),
         pr3 AS (
           SELECT n.id,
             ((1.0 - 0.85) / nn.n) + 0.85 * (SELECT dm FROM d2) / nn.n
               + 0.85 * coalesce(c.contrib, 0.0) AS rank
           FROM nodes n CROSS JOIN nn LEFT JOIN c2 c ON c.id = n.id),
         d3 AS (SELECT sum(rank) AS dm FROM pr3 WHERE id >= 1000000),
         c3 AS (SELECT e.dst AS id, sum(p.rank) AS contrib
                  FROM e JOIN pr3 p ON p.id = e.src GROUP BY e.dst),
         pr4 AS (
           SELECT n.id,
             ((1.0 - 0.85) / nn.n) + 0.85 * (SELECT dm FROM d3) / nn.n
               + 0.85 * coalesce(c.contrib, 0.0) AS rank
           FROM nodes n CROSS JOIN nn LEFT JOIN c3 c ON c.id = n.id),
         d4 AS (SELECT sum(rank) AS dm FROM pr4 WHERE id >= 1000000),
         c4 AS (SELECT e.dst AS id, sum(p.rank) AS contrib
                  FROM e JOIN pr4 p ON p.id = e.src GROUP BY e.dst),
         pr5 AS (
           SELECT n.id,
             ((1.0 - 0.85) / nn.n) + 0.85 * (SELECT dm FROM d4) / nn.n
               + 0.85 * coalesce(c.contrib, 0.0) AS rank
           FROM nodes n CROSS JOIN nn LEFT JOIN c4 c ON c.id = n.id)
         SELECT id, round(rank, 4) AS rank4,
           row_number() OVER (ORDER BY rank DESC, id) AS pos
         FROM pr5 ORDER BY id""",

    // DuckDB's real recursive CTE against the engine's iterative BFS;
    // min(level) collapses multi-path revisits identically on both sides
    "d16_bfs_levels" ->
      """WITH RECURSIVE
         edges AS (
           SELECT n_regionkey + 2000000 AS src, n_nationkey + 1000000 AS dst
           FROM nation
           UNION ALL
           SELECT c_nationkey + 1000000, c_custkey FROM customer
           UNION ALL
           SELECT o_custkey, o_orderkey + 3000000 FROM orders),
         bfs AS (
           SELECT r_regionkey + 2000000 AS id, 0 AS level FROM region
           UNION ALL
           SELECT e.dst, b.level + 1
           FROM bfs b JOIN edges e ON e.src = b.id
           WHERE b.level < 10)
         SELECT id, CAST(min(level) AS INT) AS level
         FROM bfs GROUP BY id ORDER BY id""",

    // 3 unrolled HITS rounds, identical op order to Graph.hits: per round
    // auth = L1-normalize(nodes ⟕ Σ_{u→v} hub(u)), then
    // hub = L1-normalize(nodes ⟕ Σ_{u→v} auth(v)); scalar totals via
    // subquery exactly where the engine collects one O(1) scalar
    "d14_hits" ->
      """WITH e AS (
           SELECT DISTINCT src, dst FROM (
             SELECT c_custkey AS src, c_nationkey + 1000000 AS dst
             FROM customer
             UNION ALL
             SELECT n_nationkey + 1000000, n_regionkey + 2000000
             FROM nation)),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         s0 AS (SELECT id, 1.0 / nn.n AS hub FROM nodes CROSS JOIN nn),
         a1r AS (SELECT e.dst AS id, sum(s.hub) AS v
                   FROM e JOIN s0 s ON s.id = e.src GROUP BY e.dst),
         a1 AS (SELECT n.id, coalesce(a.v, 0.0) AS auth
                  FROM nodes n LEFT JOIN a1r a ON a.id = n.id),
         a1n AS (SELECT id, auth / (SELECT sum(auth) FROM a1) AS auth
                   FROM a1),
         h1r AS (SELECT e.src AS id, sum(a.auth) AS v
                   FROM e JOIN a1n a ON a.id = e.dst GROUP BY e.src),
         h1 AS (SELECT n.id, coalesce(h.v, 0.0) AS hub
                  FROM nodes n LEFT JOIN h1r h ON h.id = n.id),
         h1n AS (SELECT id, hub / (SELECT sum(hub) FROM h1) AS hub
                   FROM h1),
         a2r AS (SELECT e.dst AS id, sum(s.hub) AS v
                   FROM e JOIN h1n s ON s.id = e.src GROUP BY e.dst),
         a2 AS (SELECT n.id, coalesce(a.v, 0.0) AS auth
                  FROM nodes n LEFT JOIN a2r a ON a.id = n.id),
         a2n AS (SELECT id, auth / (SELECT sum(auth) FROM a2) AS auth
                   FROM a2),
         h2r AS (SELECT e.src AS id, sum(a.auth) AS v
                   FROM e JOIN a2n a ON a.id = e.dst GROUP BY e.src),
         h2 AS (SELECT n.id, coalesce(h.v, 0.0) AS hub
                  FROM nodes n LEFT JOIN h2r h ON h.id = n.id),
         h2n AS (SELECT id, hub / (SELECT sum(hub) FROM h2) AS hub
                   FROM h2),
         a3r AS (SELECT e.dst AS id, sum(s.hub) AS v
                   FROM e JOIN h2n s ON s.id = e.src GROUP BY e.dst),
         a3 AS (SELECT n.id, coalesce(a.v, 0.0) AS auth
                  FROM nodes n LEFT JOIN a3r a ON a.id = n.id),
         a3n AS (SELECT id, auth / (SELECT sum(auth) FROM a3) AS auth
                   FROM a3),
         h3r AS (SELECT e.src AS id, sum(a.auth) AS v
                   FROM e JOIN a3n a ON a.id = e.dst GROUP BY e.src),
         h3 AS (SELECT n.id, coalesce(h.v, 0.0) AS hub
                  FROM nodes n LEFT JOIN h3r h ON h.id = n.id),
         h3n AS (SELECT id, hub / (SELECT sum(hub) FROM h3) AS hub
                   FROM h3)
         SELECT h.id, round(h.hub, 4) AS hub4, round(a.auth, 4) AS auth4
         FROM h3n h JOIN a3n a ON a.id = h.id
         ORDER BY h.id""",

    // exact-regime sketch oracle: capacity ≥ vocabulary ⇒ MG estimates
    // equal true counts, so the plain GROUP BY is the ground truth
    "t29_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents WHERE length(trim(text)) > 0)
         SELECT term, CAST(count(*) AS BIGINT) AS est_count FROM toks
         WHERE length(term) > 0
         GROUP BY term ORDER BY est_count DESC, term""",

    "t09_ngram_df" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                  ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
             END)) AS ngram
           FROM docs)
         SELECT ngram, count(*) AS n_docs
         FROM sh GROUP BY 1 HAVING count(*) >= 25 ORDER BY ngram""",

    "t12_shuffle" ->
      """SELECT doc_id,
           row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || 'graft'),
                              doc_id) - 1 AS position
         FROM documents ORDER BY doc_id""",

    // the engine's per-position operator tree verbatim: mixed probability
    // from exact-integer bucket counts, one ln(x)/ln(2), round to integer
    // milli-bits, INTEGER per-doc sum
    "t37_lm_bigram_bits" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         pr AS (
           SELECT doc_id,
             [{'b1': substr(md5(w[i + 1]), 1, 3),
               'b2': substr(md5(w[i] || ' ' || w[i + 1]), 1, 4)}
              for i in generate_series(1, len(w) - 1)] AS ps
           FROM d),
         occ AS (SELECT doc_id, u.b1 AS b1, u.b2 AS b2
                 FROM pr, unnest(ps) AS t(u)),
         c1 AS (SELECT b1, count(*) AS c1 FROM occ GROUP BY 1),
         c2 AS (SELECT b2, count(*) AS c2 FROM occ GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM occ),
         sc AS (
           SELECT o.doc_id,
             CAST(round(-1000 * (ln(
               0.7 * ((coalesce(c2.c2, 0) + 1.0) / (n + 65536.0)) +
               0.3 * ((coalesce(c1.c1, 0) + 1.0) / (n + 4096.0)))
               / ln(2.0))) AS BIGINT) AS bits
           FROM occ o LEFT JOIN c1 USING (b1) LEFT JOIN c2 USING (b2)
           CROSS JOIN tot),
         s AS (SELECT doc_id, CAST(sum(bits) AS BIGINT) AS bits,
                      count(*) AS n_pairs
               FROM sc GROUP BY 1)
         SELECT d.doc_id, coalesce(s.n_pairs, 0) AS n_pairs,
                coalesce(s.bits, 0) AS bits,
                CASE WHEN s.n_pairs IS NULL THEN NULL
                     ELSE s.bits / (1000.0 * s.n_pairs) END AS score
         FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""",

    // weight tree mirrors the engine's ln(x)/ln(2) exactly (never log2():
    // a different approximation could round a different milli-bit)
    "t15_lm_bits" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         cnts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
         tot AS (SELECT sum(c) AS total, count(*) AS v FROM cnts),
         w AS (
           SELECT tok,
             CAST(round(-1000 * (ln((c + 1.0) / ((total + v) + 1.0))
                                 / ln(2.0))) AS BIGINT) AS wt
           FROM cnts CROSS JOIN tot),
         s AS (
           -- sum(BIGINT) is HUGEINT in DuckDB; cast back so the column
           -- hashes like the engine's long
           SELECT t.doc_id, CAST(sum(w.wt) AS BIGINT) AS bits, count(*) AS n
           FROM toks t JOIN w ON t.tok = w.tok GROUP BY t.doc_id)
         SELECT doc_id, n AS n_tokens, bits,
                bits / (1000.0 * n) AS score
         FROM s ORDER BY doc_id""",

    // t14's window twin at n=7 — the SQL-registry path must reproduce
    // the identical deterministic retention
    "t28_sql_cap_keys" ->
      """WITH r AS (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 13),
                        doc_id) AS rn
           FROM documents)
         SELECT source, doc_id FROM r WHERE rn <= 7
         ORDER BY source, doc_id""",

    "t14_cap_per_source" ->
      """WITH r AS (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 13),
                        doc_id) AS rn
           FROM documents)
         SELECT source, doc_id FROM r WHERE rn <= 10
         ORDER BY source, doc_id""",

    // same floor-division chunk grid; stride 20, window 30, 1-based
    // slices; struct-zip supplies the 0-based chunk index
    "t21_chunking" ->
      """WITH docs AS (
           SELECT doc_id, string_split(trim(text), ' ') AS w
           FROM documents WHERE length(trim(text)) > 0),
         ch AS (
           SELECT doc_id,
             [array_to_string(w[s : s + 29], ' ')
              for s in generate_series(1,
                CAST(greatest(floor((len(w) - 30 + 20 - 1) / 20.0) * 20 + 1,
                              1) AS BIGINT), 20)] AS chunks
           FROM docs)
         SELECT doc_id, u.i AS chunk_ix, md5(u.c) AS chunk_md5,
                len(string_split(u.c, ' ')) AS n_tokens
         FROM ch,
           unnest([{'c': chunks[i], 'i': i - 1}
                   for i in generate_series(1, len(chunks))]) AS t(u)
         ORDER BY doc_id, chunk_ix""",

    // (x, i) -> list_position = i is the same first-occurrence rule
    // (both 1-based on the DuckDB side; Spark's 0-based index compares
    // against the 1-based array_position with a +1)
    "t20_span_dedup" ->
      """WITH raw AS (
           SELECT doc_id, text, text || '. ' || text AS raw FROM documents),
         ded AS (
           SELECT doc_id, text,
             array_to_string(list_filter(string_split(raw, '. '),
               (x, i) -> list_position(string_split(raw, '. '), x) = i),
               '. ') AS dd
           FROM raw)
         SELECT doc_id, md5(dd) AS dedup_md5,
                CAST(dd = text AS INT) AS restored
         FROM ded ORDER BY doc_id""",

    // same 12-token window grid (Spark sequence(0, n-12) == 1-based
    // generate_series(1, n-11) shifted), same md5-of-joined-window hash,
    // same global-first-occurrence keeper (min (doc_id, pos)); coverage
    // resolved by a per-doc range join, rebuild by ordered string_agg
    // over uncovered tokens
    "t32_passage_dedup" ->
      """WITH d AS (
           SELECT doc_id, string_split(trim(text), ' ') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, toks,
             [md5(array_to_string(toks[i : i + 11], ' '))
              for i in generate_series(1, greatest(len(toks) - 11, 0))] AS hs
           FROM d),
         grams AS (
           SELECT doc_id, u.pos, u.h
           FROM g, unnest([{'h': hs[i], 'pos': i - 1}
                           for i in generate_series(1, len(hs))]) AS t(u)),
         occ AS (
           SELECT doc_id, pos, h,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
             count(*) OVER (PARTITION BY h) AS c
           FROM grams),
         removals AS (SELECT doc_id, pos FROM occ WHERE c > 1 AND rn > 1),
         toks AS (
           SELECT doc_id, u.tok, u.pos
           FROM d, unnest([{'tok': toks[i], 'pos': i - 1}
                           for i in generate_series(1, len(toks))]) AS t(u)),
         cov AS (
           SELECT DISTINCT t.doc_id, t.pos
           FROM toks t JOIN removals s
             ON t.doc_id = s.doc_id
            AND t.pos BETWEEN s.pos AND s.pos + 11),
         agg AS (
           SELECT t.doc_id, count(*) AS n_tokens, count(c.pos) AS n_removed,
             coalesce(string_agg(CASE WHEN c.pos IS NULL THEN t.tok END,
                                 ' ' ORDER BY t.pos), '') AS clean_text
           FROM toks t LEFT JOIN cov c
             ON t.doc_id = c.doc_id AND t.pos = c.pos
           GROUP BY t.doc_id)
         SELECT doc_id, n_tokens, n_removed, clean_text
         FROM agg ORDER BY doc_id""",

    // exact-mode ground truth by sorting: the k-th smallest value at the
    // engine's rank convention clamp((num*(n+1)) DIV den, 1, n) — the
    // selected VALUE is tie-order-independent
    "t36_quantile_sketch" ->
      """WITH r AS (
           SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type,
           max(CASE WHEN rn = greatest(least(1 * (n + 1) // 2, n), 1)
                    THEN value END) AS p50,
           max(CASE WHEN rn = greatest(least(9 * (n + 1) // 10, n), 1)
                    THEN value END) AS p90,
           max(CASE WHEN rn = greatest(least(99 * (n + 1) // 100, n), 1)
                    THEN value END) AS p99
         FROM r GROUP BY event_type ORDER BY event_type""",

    // exact replay of the engine's copy arithmetic: floor(w) + one more
    // iff the 8-hex md5 bucket falls under frac(w)·2^32
    // (0.3 → 4ccccccd, 0.4 → 66666666); fr absent → dropped
    "t39_epoch_upsample" ->
      """WITH base AS (
           SELECT doc_id, lang,
             CASE lang
               WHEN 'en' THEN 2 + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'graft-epoch'), 1, 8) < '4ccccccd' THEN 1 ELSE 0 END
               WHEN 'es' THEN 1
               WHEN 'de' THEN CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'graft-epoch'), 1, 8) < '66666666' THEN 1 ELSE 0 END
               ELSE 0 END AS n
           FROM documents)
         SELECT doc_id, lang, CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy
         FROM base WHERE n >= 1
         ORDER BY doc_id, copy""",

    // exact regime: every per-lang cardinality here fits the sketch's
    // 2^12 sparse capacity, so the sketch answer IS count(distinct)
    "t38_distinct_count" ->
      """SELECT lang,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM documents GROUP BY lang ORDER BY lang""",

    // rollup exactness: merged exact sketches = the full value multiset,
    // so the global exact discrete percentile (t36's rank convention,
    // ungrouped) is the ground truth
    "t40_sketch_rollup" ->
      """WITH r AS (
           SELECT value,
             row_number() OVER (ORDER BY value) AS rn,
             count(*) OVER () AS n
           FROM events)
         SELECT
           max(CASE WHEN rn = greatest(least(1 * (n + 1) // 2, n), 1)
                    THEN value END) AS p50,
           max(CASE WHEN rn = greatest(least(9 * (n + 1) // 10, n), 1)
                    THEN value END) AS p90,
           max(CASE WHEN rn = greatest(least(99 * (n + 1) // 100, n), 1)
                    THEN value END) AS p99
         FROM r""",

    // the exact engine greedy unrolled as a recursive CTE: per chunk, one
    // recursion step per document in (n desc, id) order; the capacity
    // list rides the recursion; first fit via list_position over a
    // list_transform (list COMPREHENSIONS can't see outer correlations
    // in this DuckDB, lambdas can); tokenCountWs == len(string_split)
    "t35_pack_ffd" ->
      """WITH RECURSIVE
         toks AS (
           SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
             CAST(floor(doc_id / 64) AS BIGINT) AS chunk
           FROM documents),
         ordered AS (
           SELECT doc_id, n, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY n DESC, doc_id) AS rn
           FROM toks),
         ffd AS (
           SELECT chunk, CAST(1 AS BIGINT) AS rn, doc_id, n,
             [CAST(greatest(128 - n, 0) AS BIGINT)] AS bins, 1 AS bin_ix
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.chunk, o.rn, o.doc_id, o.n,
             CASE WHEN list_position(
                    list_transform(f.bins, b -> b >= o.n), true) = 0
                  THEN list_append(f.bins,
                    CAST(greatest(128 - o.n, 0) AS BIGINT))
                  ELSE list_transform(
                    list_zip(f.bins, generate_series(1, len(f.bins))),
                    p -> CASE WHEN p[2] = list_position(
                                list_transform(f.bins, b -> b >= o.n), true)
                              THEN p[1] - o.n ELSE p[1] END)
             END AS bins,
             CAST(CASE WHEN list_position(
                         list_transform(f.bins, b -> b >= o.n), true) = 0
                       THEN len(f.bins) + 1
                       ELSE list_position(
                         list_transform(f.bins, b -> b >= o.n), true)
                  END AS INT) AS bin_ix
           FROM ffd f JOIN ordered o ON o.chunk = f.chunk AND o.rn = f.rn + 1)
         SELECT doc_id, n AS n_tokens, chunk, bin_ix
         FROM ffd ORDER BY doc_id""",

    // same split, same md5-3hex buckets, same floor(1e6·|Δp|) integer
    // quantization (each p an exact-integer quotient, the cross-bucket
    // sum over integers — no float accumulation order anywhere)
    "t34_drift_report" ->
      """WITH olds AS (SELECT lang, text FROM documents WHERE doc_id % 2 = 0),
         news AS (SELECT lang, text FROM documents WHERE doc_id % 2 = 1),
         bo AS (
           SELECT lang AS g, substr(md5(tok), 1, 3) AS b, count(*) AS co
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM olds)
           GROUP BY 1, 2),
         bn AS (
           SELECT lang AS g, substr(md5(tok), 1, 3) AS b, count(*) AS cn
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM news)
           GROUP BY 1, 2),
         t_o AS (
           SELECT lang AS g, count(*) AS n_docs_old,
             CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT)
               AS n_tokens_old
           FROM olds GROUP BY 1),
         t_n AS (
           SELECT lang AS g, count(*) AS n_docs_new,
             CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT)
               AS n_tokens_new
           FROM news GROUP BY 1),
         tot AS (
           SELECT coalesce(t_o.g, t_n.g) AS g,
             coalesce(n_docs_old, 0) AS n_docs_old,
             coalesce(n_docs_new, 0) AS n_docs_new,
             coalesce(n_tokens_old, 0) AS n_tokens_old,
             coalesce(n_tokens_new, 0) AS n_tokens_new
           FROM t_o FULL OUTER JOIN t_n ON t_o.g = t_n.g),
         pb AS (
           SELECT coalesce(bo.g, bn.g) AS g,
             coalesce(co, 0) AS co, coalesce(cn, 0) AS cn
           FROM bo FULL OUTER JOIN bn ON bo.g = bn.g AND bo.b = bn.b),
         pb2 AS (
           SELECT pb.g,
             CAST(floor(1000000 * abs(
               cn / CAST(greatest(n_tokens_new, 1) AS DOUBLE) -
               co / CAST(greatest(n_tokens_old, 1) AS DOUBLE))) AS BIGINT)
               AS contrib,
             CASE WHEN co = 0 THEN cn ELSE 0 END AS novel
           FROM pb JOIN tot ON pb.g = tot.g),
         agg AS (
           SELECT g, CAST(sum(contrib) AS BIGINT) AS l1_drift_micro,
             CAST(sum(novel) AS BIGINT) AS new_bucket_tokens
           FROM pb2 GROUP BY 1)
         SELECT tot.g AS lang, n_docs_old, n_docs_new,
           n_tokens_old, n_tokens_new,
           CAST(coalesce(new_bucket_tokens, 0) AS BIGINT) AS new_bucket_tokens,
           coalesce(new_bucket_tokens, 0) /
             CAST(greatest(n_tokens_new, 1) AS DOUBLE) AS new_bucket_rate,
           CAST(coalesce(l1_drift_micro, 0) AS BIGINT) AS l1_drift_micro
         FROM tot LEFT JOIN agg ON tot.g = agg.g
         ORDER BY lang""",

    // weight tree mirrors the engine's ln((ct+1)/(nt+4096)) −
    // ln((cr+1)/(nr+4096)) exactly; floor (not round) because weights go
    // negative and half-rounding conventions disagree across engines
    "t33_dsir_weights" ->
      """WITH tk AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         toks AS (SELECT doc_id, substr(md5(tok), 1, 3) AS b FROM tk),
         cnt AS (
           SELECT substr(md5(tok), 1, 3) AS b, count(*) AS cr,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
           FROM tk GROUP BY 1),
         tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr,
                        CAST(sum(ct) AS DOUBLE) AS nt FROM cnt),
         w AS (
           SELECT b, CAST(floor(1000000 * (
               ln((ct + 1.0) / (nt + 4096.0)) -
               ln((cr + 1.0) / (nr + 4096.0)))) AS BIGINT) AS wt
           FROM cnt CROSS JOIN tot),
         s AS (
           SELECT t.doc_id, CAST(sum(w.wt) AS BIGINT) AS logw_micro,
                  count(*) AS n_tokens
           FROM toks t JOIN w USING (b) GROUP BY 1)
         SELECT doc_id, n_tokens, logw_micro,
                logw_micro / (1000000.0 * n_tokens) AS avg_logw
         FROM s ORDER BY doc_id""",

    // chr(769) = U+0301 combining acute, chr(778) = U+030A combining ring
    "t19_nfc_normalize" ->
      """WITH raw AS (
           SELECT doc_id,
             text || ' cafe' || chr(769) || ' A' || chr(778) AS raw
           FROM documents)
         SELECT doc_id, md5(nfc_normalize(raw)) AS norm_md5,
                CAST(nfc_normalize(raw) <> raw AS INT) AS changed
         FROM raw ORDER BY doc_id""",

    // the expected extraction assembled from the plant: title line,
    // heading line (upper(lang) + collapsed doubled space), decoded
    // entity paragraph, the raw text (plant-safe: no &/</>, single-
    // spaced, trimmed — asserted clean at all SFs), then "tail end"
    "t41_html_to_text" ->
      """SELECT doc_id,
           'Doc ' || doc_id || chr(10) ||
           upper(lang) || ' heading' || chr(10) ||
           'fish & chips !' || chr(10) ||
           text || chr(10) ||
           'tail end' AS extracted
         FROM documents ORDER BY doc_id""",

    // expected repairs from raw code points: 233=e-acute, 8217=right
    // single quote, 239=i-diaeresis, 8482=trademark — the decoded
    // forms of the planted cp1252 misreads; variants 1/3 unchanged
    "t47_fix_mojibake" ->
      """SELECT doc_id,
           text || CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN ' caf' || chr(233) || ' ' || chr(8217) ||
               ' na' || chr(239) || 've'
             WHEN 1 THEN ' caf' || chr(233)
             WHEN 2 THEN ' ' || chr(8482) || ' mark'
             ELSE '' END AS fixed,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 1 WHEN 2 THEN 1 ELSE 0 END AS changed
         FROM documents ORDER BY doc_id""",

    // all five expected edges per doc, assembled analytically: the
    // entity decodes, the relative refs resolve (dot segments removed),
    // the fragment link collapses to the canonical base page, and the
    // script/comment/href-less links never appear
    "t46_html_links" ->
      """WITH l AS (
           SELECT doc_id, 0 AS pos,
             'http://www.site' || (doc_id % 7) || '.example.co.uk/articles/'
               || doc_id AS url,
             'Read & more' AS anchor, 'example.co.uk' AS domain
           FROM documents
           UNION ALL SELECT doc_id, 1,
             'https://ext.example.com/p?a=1&b=' || (doc_id % 5),
             'the external source', 'example.com' FROM documents
           UNION ALL SELECT doc_id, 2,
             'http://www.site' || (doc_id % 7) || '.example.co.uk/img/'
               || doc_id || '.png',
             'image link', 'example.co.uk' FROM documents
           UNION ALL SELECT doc_id, 3,
             'http://cdn.other.org/lib.js', 'cdn', 'other.org'
           FROM documents
           UNION ALL SELECT doc_id, 4,
             'http://www.site' || (doc_id % 7)
               || '.example.co.uk/sec/page.html',
             '', 'example.co.uk' FROM documents)
         SELECT doc_id, CAST(pos AS INT) AS pos, url, anchor, domain
         FROM l ORDER BY doc_id, pos""",

    // the independent replay of the whole htmlInput curation chain:
    // chrome extracts away (so gate inputs == original text), exact
    // dedup by full text, brute-force jaccard pairs + recursive
    // components with min-id survivors, then the t01-quality / t04-dup3
    // / language gates — identical formulas to those oracles
    "t45_curate_html" ->
      """WITH RECURSIVE docs0 AS (
           SELECT doc_id, text, lang FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text, lang FROM documents
           WHERE doc_id % 10 = 7
           UNION ALL
           SELECT doc_id + 2000000, text || ' zz', lang FROM documents
           WHERE doc_id % 10 = 3 AND n_chars >= 200),
         ex AS (
           SELECT doc_id, text, lang FROM (
             SELECT doc_id, text, lang,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             FROM docs0) t WHERE rn = 1),
         shq AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(w) < 3
               THEN [array_to_string(w, ' ')]
               ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
             END) s
           FROM (SELECT doc_id, string_split(text, ' ') w FROM ex) g),
         pairs AS (
           SELECT a.doc_id AS a, b.doc_id AS b
           FROM shq a JOIN shq b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
         bidir AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT a AS id FROM bidir),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT bidir.b, reach.r FROM bidir JOIN reach ON bidir.a = reach.id),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         undup AS (
           SELECT e.doc_id, e.text, e.lang FROM ex e
           WHERE e.doc_id NOT IN
             (SELECT id FROM comp WHERE id <> component))
         SELECT doc_id FROM undup
         WHERE round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) * 0.4
             + least(round(length(replace(text, ' ', '')) * 1.0 / len(string_split(trim(text), ' ')), 4) / 8.0, 1.0) * 0.3
             + least(round(len(list_filter(string_split(trim(text), ' '),
                 x -> list_contains(['the','a','an','and','or','of','to','in','is','was','it','for','on','with','as','by','at','this','that','be'], x))) * 1.0
                 / len(string_split(trim(text), ' ')), 4) * 4.0, 1.0) * 0.3 >= 0.3
           AND (CASE WHEN len(string_split(text, ' ')) < 3 THEN 0.0
                ELSE round(1.0 - len(list_distinct(
                       [array_to_string(string_split(text, ' ')[i:i+2], ' ')
                        for i in range(1, len(string_split(text, ' ')) - 1)]
                     )) * 1.0 / (len(string_split(text, ' ')) - 2), 4) END) <= 0.5
           AND lang IN ('en', 'es', 'de', 'fr')
         ORDER BY doc_id""",

    // expected main text = exactly the two planted body paragraphs;
    // expected full text = every block tag-stripping keeps (the
    // boilerplate contrast the query exists to demonstrate)
    "t44_html_main" ->
      """SELECT doc_id,
           'Opening paragraph of document ' || doc_id ||
             ' holds the primary body copy readers came for.' || chr(10) ||
             'Second paragraph adds detail number ' ||
             CAST(doc_id % 97 AS VARCHAR) ||
             ' & keeps going with plenty of ordinary words.' AS main_text,
           'Site' || chr(10) ||
             'Home About Contact' || chr(10) ||
             'Doc ' || doc_id || chr(10) ||
             'Opening paragraph of document ' || doc_id ||
             ' holds the primary body copy readers came for.' || chr(10) ||
             'Second paragraph adds detail number ' ||
             CAST(doc_id % 97 AS VARCHAR) ||
             ' & keeps going with plenty of ordinary words.' || chr(10) ||
             'related article one' || chr(10) ||
             'related article two' || chr(10) ||
             'tag cloud alpha beta gamma delta epsilon' || chr(10) ||
             'Copyright 2026 Example Site All Rights Reserved' AS full_text
         FROM documents ORDER BY doc_id""",

    // generate_series(0, frames-1, 24) == sequence(0, frames-1, 24)
    "mm03_frame_sampling" ->
      """SELECT doc_id, n_chars % 1000 + 1 AS frames,
           len(generate_series(0, n_chars % 1000, 24)) AS n_sampled,
           list_last(generate_series(0, n_chars % 1000, 24)) AS last_idx
         FROM documents ORDER BY doc_id""",

    "t25_k_anonymity" ->
      """SELECT lang, source, count(*) AS group_size
         FROM documents GROUP BY 1, 2 HAVING count(*) < 8
         ORDER BY lang, source""",

    // p50 rank convention: k = (1*(n+1)) // 2, ties permute equal
    // values only (the q24 contract)
    "t26_corpus_report" ->
      """WITH t AS (
           SELECT doc_id, lang, source, n_chars,
             len(string_split(trim(text), ' ')) AS toks
           FROM documents),
         p AS (
           SELECT n_chars FROM (
             SELECT n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER () AS n
             FROM t) s
           WHERE rn = greatest((n + 1) // 2, 1))
         SELECT metric, value FROM (
           SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM t
           UNION ALL SELECT 'n_tokens', CAST(sum(toks) AS DOUBLE) FROM t
           UNION ALL SELECT 'n_langs',
             CAST(count(DISTINCT lang) AS DOUBLE) FROM t
           UNION ALL SELECT 'n_sources',
             CAST(count(DISTINCT source) AS DOUBLE) FROM t
           UNION ALL SELECT 'mean_doc_tokens',
             CAST(sum(toks) AS DOUBLE) / CAST(count(*) AS DOUBLE) FROM t
           UNION ALL SELECT 'p50_chars', CAST(n_chars AS DOUBLE) FROM p) u
         ORDER BY metric""",

    // same distinct-bigram sets; f1 = 2*p*r/(p+r) in identical op order
    "t24_rouge" ->
      """WITH base AS (
           SELECT doc_id, string_split(text, ' ') AS w,
                  string_split(text, ' ')[1:20] AS cw
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(cw) < 2
               THEN [array_to_string(cw, ' ')]
               ELSE [array_to_string(cw[i:i+1], ' ')
                     for i in range(1, len(cw))] END) AS cs,
             list_distinct(CASE WHEN len(w) < 2
               THEN [array_to_string(w, ' ')]
               ELSE [array_to_string(w[i:i+1], ' ')
                     for i in range(1, len(w))] END) AS rs
           FROM base),
         pr AS (
           SELECT doc_id,
             CASE WHEN len(cs) > 0 THEN
               CAST(len(list_intersect(cs, rs)) AS DOUBLE) / len(cs)
               ELSE 0.0 END AS p,
             CASE WHEN len(rs) > 0 THEN
               CAST(len(list_intersect(cs, rs)) AS DOUBLE) / len(rs)
               ELSE 0.0 END AS r
           FROM sh)
         SELECT doc_id, p, r,
           CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r)
                ELSE 0.0 END AS f1
         FROM pr ORDER BY doc_id""",

    // count(*) FILTER mirrors the conditional sums; NULL predicate =
    // violation on both sides (NOT (x) is NULL for NULL x -> FILTER
    // counts only definite passes, subtracted from the total)
    "t23_expectations" ->
      """WITH t AS (SELECT
           count(*) AS n,
           count(*) FILTER (WHERE coalesce(l_quantity >= 1
                                           AND l_quantity <= 45, false)) AS p1,
           count(*) FILTER (WHERE coalesce(l_discount <= 0.05, false)) AS p2,
           count(*) FILTER (WHERE l_shipdate IS NOT NULL) AS p3,
           count(*) FILTER (WHERE coalesce(l_returnflag IN ('A','N','R'),
                                           false)) AS p4
         FROM lineitem)
         SELECT check_name AS "check", n - p AS n_violations, n AS n_rows
         FROM (
           SELECT 'qty_in_range' AS check_name, p1 AS p, n FROM t
           UNION ALL SELECT 'discount_cap', p2, n FROM t
           UNION ALL SELECT 'shipdate_present', p3, n FROM t
           UNION ALL SELECT 'flag_domain', p4, n FROM t)
         ORDER BY "check"""",

    // same A-Res keys: 13-hex md5 prefix -> exact 52-bit integer (digit
    // products and partial sums all < 2^53, so double arithmetic is
    // exact in any order), ln((v+1)/2^52)/w, top-50 by key
    "t22_weighted_sample" ->
      """WITH h AS (
           SELECT doc_id, n_chars,
             substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 13) AS hx
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         v AS (
           SELECT doc_id, n_chars,
             (SELECT sum((strpos('0123456789abcdef', substr(hx, i, 1)) - 1)
                         * power(16, 13 - i))
              FROM generate_series(1, 13) AS g(i)) AS hv
           FROM h),
         akeys AS (
           SELECT doc_id, n_chars,
             ln((hv + 1.0) / 4503599627370496.0)
               / CAST(n_chars AS DOUBLE) AS akey
           FROM v),
         pick AS (
           SELECT doc_id, n_chars FROM akeys
           ORDER BY akey DESC, doc_id LIMIT 50)
         SELECT doc_id, n_chars FROM pick ORDER BY doc_id""",

    // empty/whitespace-only text guard: DuckDB string_split('') yields
    // [''] (one empty token → ttr 1.0) where the engine returns 0.0; the
    // filter + LEFT JOIN + coalesce mirror the engine's empty-text zero
    "t27_lexical_diversity" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
           FROM documents WHERE length(trim(text)) > 0),
         tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
         agg AS (
           SELECT doc_id,
             count(*) AS n_distinct,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) FILTER (WHERE c = 1) AS n_hapax
           FROM tc GROUP BY 1)
         SELECT d.doc_id,
           coalesce(CAST(a.n_distinct AS DOUBLE) / a.n_tokens, 0.0) AS ttr,
           coalesce(CAST(a.n_hapax AS DOUBLE) / a.n_distinct, 0.0)
             AS hapax_frac
         FROM documents d LEFT JOIN agg a USING (doc_id)
         ORDER BY doc_id""",

    // top-count via group-by: equals the engine's max-run over the
    // sorted token array; raw IEEE quotient of exact ints both sides.
    // Same empty-text guard as t27 (engine returns 0.0 for empty text).
    "t18_top_token" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
           FROM documents WHERE length(trim(text)) > 0),
         tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
         agg AS (SELECT doc_id, max(c) AS mx, sum(c) AS n FROM tc GROUP BY 1)
         SELECT d.doc_id,
           coalesce(CAST(a.mx AS DOUBLE) / CAST(a.n AS DOUBLE), 0.0) AS top_frac
         FROM documents d LEFT JOIN agg a USING (doc_id)
         ORDER BY doc_id""",

    // the naive global-window spelling IS the semantics the distributed
    // prefix-sum form must reproduce
    "t17_take_budget" ->
      """WITH c AS (
           SELECT doc_id, n_chars,
             len(string_split(trim(text), ' ')) AS toks
           FROM documents),
         r AS (
           SELECT doc_id, n_chars, toks,
             sum(toks) OVER (ORDER BY n_chars DESC, doc_id) AS cum
           FROM c)
         SELECT doc_id, n_chars, toks FROM r WHERE cum <= 15000
         ORDER BY doc_id""",

    // mirrors Sampling.temperatureMix's arithmetic exactly: group-asc
    // ordered sum, left-assoc rate chain, floor(rate*2^32) buckets,
    // lowercase 8-hex threshold vs the md5 prefix
    "t16_temperature_mix" ->
      """WITH counts AS (
           SELECT lang AS g, count(*) AS n FROM documents
           WHERE lang IS NOT NULL GROUP BY 1),
         tot AS (
           SELECT sum(sqrt(CAST(n AS DOUBLE)) ORDER BY g) AS denom
           FROM counts),
         thr AS (
           SELECT g,
             least(CAST(floor(300.0 * sqrt(CAST(n AS DOUBLE)) / denom
                              / CAST(n AS DOUBLE) * 4294967296.0) AS BIGINT),
                   4294967296) AS buckets
           FROM counts CROSS JOIN tot),
         thrs AS (
           SELECT g, CASE WHEN buckets >= 4294967296 THEN 'g'
                          ELSE lower(lpad(to_hex(buckets), 8, '0'))
                     END AS thr
           FROM thr)
         SELECT d.doc_id, d.lang FROM documents d JOIN thrs t ON d.lang = t.g
         WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'graft'), 1, 8) < t.thr
         ORDER BY doc_id""",

    // quality subexpression mirrors t01's (t01 pins the doubles match)
    "t13_topk_per_lang" ->
      """WITH q AS (
           SELECT lang, doc_id,
             round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) * 0.4
               + least(round(length(replace(text, ' ', '')) * 1.0 / len(string_split(trim(text), ' ')), 4) / 8.0, 1.0) * 0.3
               + least(round(len(list_filter(string_split(trim(text), ' '),
                   x -> list_contains(['the','a','an','and','or','of','to','in','is','was','it','for','on','with','as','by','at','this','that','be'], x))) * 1.0
                   / len(string_split(trim(text), ' ')), 4) * 4.0, 1.0) * 0.3 AS quality
           FROM documents),
         r AS (
           SELECT lang, doc_id, quality,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY quality DESC, doc_id) AS INT) AS rank
           FROM q)
         SELECT lang, doc_id, quality, rank FROM r
         WHERE rank <= 3 ORDER BY lang, rank""",

    "t11_quality_classifier" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         w AS (
           SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) - 128 AS wt
           FROM toks)
         SELECT doc_id, count(*) AS n_tokens,
                sum(wt) / (128.0 * count(*)) AS score
         FROM w GROUP BY doc_id ORDER BY doc_id""",

    "t10_pack" ->
      """WITH toks AS (
           SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tokens
           FROM documents),
         cum AS (
           SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS s
           FROM toks)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(s // 256 AS BIGINT) AS bin,
                CAST(s % 256 AS BIGINT) AS bin_offset
         FROM cum ORDER BY doc_id""",

    "mm01_media_metadata" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
                hex(encode(substr(text, 1, 8))) AS head_hex,
                'unknown' AS sniffed
         FROM documents ORDER BY doc_id""",

    // planted truth (the d04 pattern): an exact byte copy pairs with its
    // original at hamming 0 — the oracle is the plant, the engine earns
    // it through the byte-shingle SimHash + banding machinery
    "mm05_binary_neardup" ->
      "SELECT doc_id, 0 AS distance FROM documents ORDER BY doc_id",

    // NONZERO-distance planted truth: eight payload-string pairs chosen
    // offline (tools/PlantSearch against the reference kernel) so pair
    // class k has SimHash distance exactly k; classes 1..7 must be
    // recalled through pigeonhole banding at maxDistance=7, class 8
    // (distance 8) must be filtered out. A banding bug that under-recalls
    // at distance >= 1 (the round-6 chunk-mask collapse class) loses rows
    // here and fails the hash
    "mm06_binary_neardup_nonzero" ->
      """SELECT doc_id, CAST(doc_id // 11 AS BIGINT) AS distance
         FROM documents
         WHERE doc_id % 11 = 0 AND doc_id BETWEEN 11 AND 77
         ORDER BY doc_id""",

    // analytic planted truth: class k = doc_id/11 has constructed dHash
    // distance exactly k (PixelPlants); class 8 exceeds maxDistance=7
    // and must be absent, class 9 (doc 99) is the lossy JPEG re-encode
    // at distance 0. Byte-disjoint encodes mean a byte-level path
    // cannot earn these rows — only genuine pixel decode + banding does
    "mm07_pixel_neardup" ->
      """SELECT doc_id,
           CAST(CASE WHEN doc_id = 99 THEN 0 ELSE doc_id // 11 END
             AS BIGINT) AS distance
         FROM documents
         WHERE doc_id % 11 = 0 AND doc_id BETWEEN 0 AND 99
           AND doc_id <> 88
         ORDER BY doc_id""",

    // the planted ground truth: the engine parses synthesized PNG/JPEG
    // bytes, the oracle recomputes the planted fields arithmetically
    "mm02_decode_features" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 97 = 0 THEN 'unknown'
                WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
           CAST(CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE doc_id % 4096 + 1 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE n_chars % 4096 + 1 END AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 97 = 0 OR doc_id % 2 = 0 THEN -1
                ELSE doc_id % 8 + 1 END AS BIGINT) AS orientation,
           CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE 8 END AS BIGINT)
             AS bit_depth
         FROM documents ORDER BY media_id""",

    // same planted ground truth as mm02 — mm04 only changes the ENGINE
    // path (graft_media_info through spark.sql vs the partition-batched
    // decodeHeaders), the decoded values must be identical
    "mm04_sql_media_info" ->
      """SELECT doc_id AS media_id,
           CASE WHEN doc_id % 97 = 0 THEN 'unknown'
                WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
           CAST(CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE doc_id % 4096 + 1 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE n_chars % 4096 + 1 END AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 97 = 0 OR doc_id % 2 = 0 THEN -1
                ELSE doc_id % 8 + 1 END AS BIGINT) AS orientation,
           CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE 8 END AS BIGINT)
             AS bit_depth
         FROM documents ORDER BY media_id"""
  )
}
