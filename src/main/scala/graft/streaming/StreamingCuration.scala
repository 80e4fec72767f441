package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Streaming data-curation operators: the batch curation family (exact
  * dedup, quality gating, PII scrubbing, near-dup candidate tagging) lifted
  * onto Structured Streaming, so an always-on ingest pipeline curates
  * documents as they arrive instead of in nightly batch sweeps.
  *
  * All transforms take a streaming-or-batch DataFrame and return one — the
  * tests drive them from MemoryStream and the same code path serves
  * readStream production. State discipline at scale: every stateful step
  * bounds its store with a watermark (state is the #1 way a streaming
  * curation job dies at 100 TB — an unbounded dedup set grows with the
  * corpus, a watermarked one with the window).
  */
object StreamingCuration {

  /** Streaming exact dedup by content fingerprint: a document whose md5
    * matches one seen within the watermark window is dropped.
    * `dropDuplicatesWithinWatermark` keeps ONE state row per distinct
    * fingerprint and expires it at the watermark — memory is bounded by
    * distinct-docs-per-window, not corpus size. Requires `tsCol` event
    * time. */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
                 watermark: String = "1 hour",
                 assumeWatermarked: Boolean = false): DataFrame = {
    val wm = if (assumeWatermarked) docs
             else docs.withWatermark(tsCol, watermark)
    wm.withColumn("_fp", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")
  }

  /** Stateless quality gate: keep documents whose composite quality score
    * clears `minScore` — runs narrow inside the ingest stage, no state, no
    * shuffle. The same TextAnalysis kernels as batch t01. */
  def qualityFilter(docs: DataFrame, textCol: String,
                    minScore: Double = 0.5): DataFrame =
    docs.filter(TextAnalysis.qualityScore(col(textCol)) >= minScore)

  /** Stateless PII scrub — email/phone/IPv4 replaced by typed tags in the
    * ingest stage (batch t07's codegen regexp chain, unchanged). */
  def scrubPii(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))

  /** Stateless LM perplexity gate (the streaming half of batch t15): drop
    * documents whose mean milli-bits per token under a BATCH-TRAINED
    * unigram model exceeds `maxBitsPerToken` — rare-token soup costs more
    * bits than fluent text. The model rides the plan as a literal weight
    * map ([[TextAnalysis.lmBitsCol]]): no join, no state, no shuffle —
    * train periodically in batch, deploy the refreshed literal to the
    * ingest stream. `keepUnscored` decides null/token-less docs. */
  def lmFilter(docs: DataFrame, textCol: String,
               model: TextAnalysis.LmBitsModel, maxBitsPerToken: Double,
               keepUnscored: Boolean = false): DataFrame = {
    val s = TextAnalysis.lmBitsCol(col(textCol), model)
    docs.filter(if (keepUnscored) s.isNull || s <= maxBitsPerToken
                else s <= maxBitsPerToken)
  }

  /** Stateless DSIR importance gate (the streaming half of batch t33):
    * keep documents whose mean hashed-unigram log target/raw likelihood
    * clears `minAvgLogw`. The model trains batch-side
    * ([[TextAnalysis.dsirModel]]) and rides the stream plan as a literal
    * bucket-weight map — no join, no state store; the ingest-time twin
    * of the offline importance-resampling selection. */
  def dsirFilter(docs: DataFrame, textCol: String,
                 model: TextAnalysis.DsirModel, minAvgLogw: Double,
                 keepUnscored: Boolean = false): DataFrame = {
    val s = TextAnalysis.dsirCol(col(textCol), model)
    docs.filter(if (keepUnscored) s.isNull || s >= minAvgLogw
                else s >= minAvgLogw)
  }

  /** Benchmark-decontamination gate for streams: a Bloom filter built
    * batch-side over the benchmark's n-gram hashes
    * (`Dedup.benchmarkBloom`) rides the stream plan as a literal sketch —
    * stateless, no join, no state store. Conservative by construction:
    * the Bloom has no false negatives, so every truly-contaminated doc
    * drops; false positives (rate = the builder's fpp) cost only extra
    * clean docs, the right trade at ingest. The batch
    * `Dedup.bloomContamination` remains the exact system of record. */
  def decontaminationGate(docs: DataFrame, textCol: String,
                          bloomBytes: Array[Byte], n: Int = 8): DataFrame =
    docs.filter(!graft.ops.Dedup.anyShingleInBloom(col(textCol), bloomBytes, n))

  /** Temperature-mix gate for streams: per-group keep rates trained on a
    * batch snapshot (e.g. `Sampling.temperatureRates` over yesterday's
    * counts) ride the plan as literals — stateless ingest-time corpus
    * rebalancing. Membership is the identical md5-threshold rule as
    * `Sampling.temperatureMix`, so replaying a batch through the gate
    * keeps EXACTLY the rows the batch operator keeps (parity-pinned by
    * the streaming suite). Groups absent from `rates` drop. */
  def temperatureGate(docs: DataFrame, keyCol: String, groupCol: String,
                      rates: Map[String, Double],
                      salt: String = "graft"): DataFrame =
    docs.filter(graft.ops.Sampling.keepByRates(
      col(keyCol), col(groupCol), rates, salt))

  /** Streaming near-duplicate SUPPRESSION by single-band MinHash: a
    * document is dropped when its band key (the first `rowsPerBand`
    * minhashes) was seen within the watermark window. One state row per
    * band key, expired at the watermark.
    *
    * Semantics (the honest contract): this is ONE band of the batch d02
    * family with no exact-Jaccard verification — streaming cannot re-read
    * the earlier document to verify. A pair with Jaccard j collides with
    * probability j^rowsPerBand (rowsPerBand=2: j=0.95 → 0.90, j=0.8 →
    * 0.64), and unrelated documents collide only on a minhash coincidence.
    * Use it as an ingest throttle in front of a periodic batch
    * `minhashNearDupPairs` sweep (which has the full bands×rows recall),
    * not as the system of record. Emits the surviving rows. */
  def nearDupSuppress(docs: DataFrame, textCol: String,
                      tsCol: String, watermark: String = "1 hour",
                      rowsPerBand: Int = 2,
                      shingleN: Int = 3,
                      assumeWatermarked: Boolean = false): DataFrame = {
    val keyed = docs.withColumn("_bkey",
      graft.functions.MinhashBandsExpression.minhashBands(
        col(textCol), 1, rowsPerBand, shingleN).getItem(0))
    val wm = if (assumeWatermarked) keyed
             else keyed.withWatermark(tsCol, watermark)
    wm.dropDuplicatesWithinWatermark("_bkey")
      .drop("_bkey")
  }

  /** Multi-band streaming near-dup suppression: a document is dropped
    * when ANY of its `bands` MinHash band keys collides within the
    * watermark window — recall per pair is 1-(1-j^rows)^bands (bands=4,
    * rows=2: j=0.9 → 0.9985, vs 0.81 for the single-band gate), the
    * batch d02 banding curve. All band signatures come from ONE kernel
    * pass; band b dedups against its own state store (chained
    * `dropDuplicatesWithinWatermark` stages — Spark runs multiple
    * watermarked stateful operators in append mode), so state is bounded
    * by bands × distinct-docs-per-window.
    *
    * Semantics note (still streaming-honest, like [[nearDupSuppress]]):
    * no exact-Jaccard verification — a retained document registers every
    * band; a dropped document registers the bands up to its colliding
    * stage. Use as an ingest throttle in front of the periodic batch
    * sweep, not as the system of record. */
  def nearDupSuppressMultiBand(docs: DataFrame, textCol: String,
                               tsCol: String, watermark: String = "1 hour",
                               bands: Int = 4, rowsPerBand: Int = 2,
                               shingleN: Int = 3,
                               assumeWatermarked: Boolean = false): DataFrame = {
    require(bands >= 1, s"bands must be >= 1: $bands")
    // `assumeWatermarked` composes gates on ONE stream: Spark disallows
    // redefining an event-time watermark, so a chain (exact dedup →
    // near-dup gate) sets it once upstream and passes true here
    val banded0 = docs
      .withColumn("_bands", graft.functions.MinhashBandsExpression.minhashBands(
        col(textCol), bands, rowsPerBand, shingleN))
    val banded = if (assumeWatermarked) banded0
                 else banded0.withWatermark(tsCol, watermark)
    (0 until bands).foldLeft(banded) { (df, b) =>
      // band index rides in the key so a band-b hash can never collide
      // with a band-c state row even though each stage has its own store
      df.withColumn("_bkey", struct(lit(b).as("b"), col("_bands").getItem(b).as("h")))
        .dropDuplicatesWithinWatermark("_bkey")
        .drop("_bkey")
    }.drop("_bands")
  }
}
