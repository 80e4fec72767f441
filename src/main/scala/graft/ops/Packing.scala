package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data export: concatenate documents in a
  * deterministic global order and chunk the stream into fixed token-budget
  * bins (GPT-style concat-and-chunk). Each document is assigned the bin in
  * which it STARTS plus its token offset within that bin; a document longer
  * than the budget simply spans bins. The assignment is a pure function of
  * (id order, token counts, budget) — reproducible across runs, engines,
  * partitionings, and cluster sizes.
  *
  * Scale shape: the naive formulation is a cumulative sum over one global
  * window (`Window.orderBy(id)` — a single-partition sort: a non-starter
  * beyond one machine). Instead the global prefix sum is computed in two
  * bounded steps over deterministic id-range groups:
  *   1. per-group token totals (one narrow groupBy; ~P rows) are collected
  *      and prefix-summed on the driver — O(P), like centroid training;
  *   2. a per-group window cumsum (groups are independent, so the sort is
  *      partition-local) plus the broadcast group offset.
  * Groups are `(id - min) DIV span` — a deterministic function of the id,
  * NOT `repartitionByRange` (whose sampled boundaries are not guaranteed
  * stable across the two job executions and would silently corrupt
  * offsets). Balance assumes roughly uniform id density — the usual case
  * for corpus exports; pathological sparsity degrades balance, never
  * correctness. Only (id, token) pairs shuffle; document text is never
  * read by this operator.
  */
object Packing {

  /** Pack `df`'s rows into `budget`-token bins in ascending `idCol` order.
    * Output: (idCol, n_tokens, bin, bin_offset), one row per input row.
    * `tokCol` must be a non-negative token count; ids must be unique. */
  def packSequences(df: DataFrame, idCol: String, tokCol: String,
                    budget: Long, numGroups: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val groups =
      if (numGroups > 0) numGroups
      else math.max(spark.sparkContext.defaultParallelism, 1)

    val narrow = df.select(col(idCol).cast("long").as("_id"),
      col(tokCol).cast("long").as("_tok"))

    // deterministic id-range grouping: group g covers ids
    // [min + g*span, min + (g+1)*span)
    val Array(idMin, idMax) = narrow.agg(min("_id"), max("_id"))
      .collect()(0) match {
        case r if r.isNullAt(0) => Array(0L, -1L) // empty input
        case r => Array(r.getLong(0), r.getLong(1))
      }
    if (idMax < idMin) {
      return df.sparkSession.emptyDataFrame
        .select(lit(0L).as(idCol), lit(0L).as("n_tokens"),
          lit(0L).as("bin"), lit(0L).as("bin_offset")).limit(0)
    }
    val span = math.max((idMax - idMin) / groups + 1, 1L)
    val grouped = narrow.withColumn("_g", expr(s"(_id - $idMin) DIV $span"))

    // step 1: per-group totals → driver prefix sum → broadcast offsets.
    // P rows cross the driver, never documents.
    val totals = grouped.groupBy("_g").agg(sum("_tok").as("_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val prefix = totals.map(_._2).scanLeft(0L)(_ + _)
    val offsets = totals.map(_._1).zip(prefix).toSeq
    import spark.implicits._
    val offDf = offsets.toDF("_g", "_goff")

    // step 2: partition-local cumsum per group + broadcast offset
    val w = Window.partitionBy("_g").orderBy("_id")
    grouped.join(broadcast(offDf), "_g")
      .withColumn("_start", sum("_tok").over(w) + col("_goff") - col("_tok"))
      .select(col("_id").as(idCol), col("_tok").as("n_tokens"),
        expr(s"_start DIV $budget").as("bin"),
        (col("_start") % budget).as("bin_offset"))
  }

  /** First-fit-decreasing bin packing WITHOUT document splitting — the
    * padding-minimizing packer for training runs that must not cut
    * documents mid-sequence (contrastive pairs, instruction examples;
    * [[packSequences]] is the splitting concat-and-chunk alternative).
    * Documents sort by (tokens desc, id) and greedily fill the first bin
    * with room; a document over the budget opens its own (oversized)
    * bin. FFD is the classic 11/9·OPT + 6/9 guarantee.
    *
    * FFD is inherently sequential, so it runs per CHUNK: chunk =
    * id DIV `chunkIdSpan` — a pure narrow function of the id (no global
    * ordinal, no shuffle for the assignment; ids are unique, so a chunk
    * holds ≤ chunkIdSpan documents, which bounds the per-group greedy
    * state). Bins never span chunks — the boundary-fragmentation cost of
    * parallelizing, bounded by one partially-empty bin set per chunk and
    * shrinking as chunkIdSpan grows. Only (id, n) pairs shuffle.
    *
    * All arithmetic is integer, so the assignment is bit-reproducible on
    * any engine — the oracle (t35) replays the same greedy as a DuckDB
    * recursive CTE. Output: (idCol, n_tokens, chunk, bin_ix), bin_ix
    * 1-based within the chunk, orderable into global bin ids as
    * (chunk, bin_ix). */
  def packBinsFFD(df: DataFrame, idCol: String, tokCol: String,
                  budget: Long, chunkIdSpan: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(chunkIdSpan >= 1, s"chunkIdSpan must be >= 1: $chunkIdSpan")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("_id"),
        col(tokCol).cast("long").as("_n"),
        // integer DIV, not double division: floor-equal for the
        // non-negative id contract and precision-safe at any id magnitude
        expr(s"CAST(`$idCol` AS BIGINT) DIV $chunkIdSpan").as("_c"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (chunk, it) =>
        val items = it.toArray.sortBy(t => (-t._2, t._1))
        val bins = scala.collection.mutable.ArrayBuffer[Long]()
        items.iterator.map { case (id, n, _) =>
          var ix = bins.indexWhere(_ >= n)
          if (ix < 0) {
            bins += math.max(budget - n, 0L)
            ix = bins.length - 1
          } else bins(ix) -= n
          (id, n, chunk, ix + 1)
        }
      }
      .toDF(idCol, "n_tokens", "chunk", "bin_ix")
  }
}
