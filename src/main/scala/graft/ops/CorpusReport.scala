package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus statistics — the "dataset card" numbers a corpus
  * release ships with, every figure exact and engine-checkable:
  * document/token totals, metadata cardinalities, mean document length,
  * and the exact median character length (via [[Percentiles]]' pivot
  * histogram — no global sort even for the median).
  *
  * Scale shape: one aggregate pass over the scan for the counting
  * metrics (the distinct counts ride Spark's standard two-phase
  * expand), plus the percentile machinery's O(log) count-only scans;
  * output is O(metrics) rows. */
object CorpusReport {

  /** (metric, value) rows: n_docs, n_tokens, n_langs, n_sources,
    * mean_doc_tokens, p50_chars. */
  def build(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", langCol: String = "lang",
            sourceCol: String = "source",
            charsCol: String = "n_chars"): DataFrame = {
    val toks = TextAnalysis.tokenCountWs(col(textCol)).cast("long")
    // metadata cardinalities ride the distinct-count sketch, not
    // countDistinct: Spark's exact distinct expands + shuffles every
    // distinct value, which a high-cardinality metadata column turns
    // into the report's bottleneck at corpus scale; the sketch carries
    // <= 2^12 bytes per task and stays EXACT while the true cardinality
    // fits 4096 (any sane lang/source vocabulary — and the t26 oracle
    // checks that exactness against COUNT(DISTINCT))
    val wide = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(toks).as("n_tokens"),
      graft.functions.DistinctSketchAggregate.distinctSketch(
        col(langCol).cast("string"), 12).as("n_langs"),
      graft.functions.DistinctSketchAggregate.distinctSketch(
        col(sourceCol).cast("string"), 12).as("n_sources"))
    // empty-corpus totality: null sums coalesce to 0, and the mean's
    // division is guarded (ANSI throws on 0/0 even for doubles)
    val counting = wide.select(explode(map(
      lit("n_docs"), col("n_docs").cast("double"),
      lit("n_tokens"), coalesce(col("n_tokens").cast("double"), lit(0.0)),
      lit("n_langs"), col("n_langs").cast("double"),
      lit("n_sources"), col("n_sources").cast("double"),
      lit("mean_doc_tokens"),
      when(col("n_docs") > 0,
        col("n_tokens").cast("double") / col("n_docs").cast("double"))
        .otherwise(lit(0.0))))
      .as(Seq("metric", "value")))
    val p50 = Percentiles.exactDiscrete(
        docs.select(lit("all").as("_g"), col(charsCol)),
        Seq("_g"), charsCol, Seq(Percentiles.Target("p50", 1, 2)))
      .select(lit("p50_chars").as("metric"), col("value").cast("double"))
    counting.unionByName(p50)
  }
}
