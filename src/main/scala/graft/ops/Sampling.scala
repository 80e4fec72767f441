package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the sample changes with
  * partitioning, task retries, and Spark versions — useless for a held-out
  * split that must stay fixed across reruns of a 100 TB job. These
  * operators key every decision on `md5(key || salt)`, so membership is a
  * pure function of the row key: reproducible across runs, engines
  * (the DuckDB oracle recomputes it byte-for-byte), partitionings, and
  * cluster sizes, and trivially narrow (a filter/projection on the scan —
  * no shuffle, no RNG state).
  *
  * The first 8 hex chars of the digest are compared lexicographically
  * against a threshold — uniform over 16^8 buckets, so `fraction` is
  * honored to ~2.3e-10 granularity. */
object Sampling {

  /** Distinct-group ceiling for the driver-side rate-table operators
    * ([[temperatureMix]], [[keepByRates]]): beyond this, the literal
    * per-group predicate chain and the collected table stop being "a few
    * KB of language codes" and start being a driver hazard. The value is
    * far above any real language/source mix and far below where the
    * expression tree breaks. */
  val MaxMixGroups: Int = 4096

  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val buckets = math.round(fraction * (1L << 32)).min(1L << 32)
    if (buckets >= (1L << 32)) "ffffffffg" // > any 8-hex-digit string
    else f"$buckets%08x"
  }

  /** The hash key: first 8 hex chars of md5(key || salt). */
  def hashKey(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** Keep ~`fraction` of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          salt: String = "graft"): DataFrame =
    df.filter(hashKey(key, salt) < lit(hexThreshold(fraction)))

  /** Deterministic epoch upsampling — mixture weights as REPEAT counts
    * (the DoReMi / LLaMA-style "2.3 epochs of wikipedia, 0.8 of
    * common-crawl" training-mix step, which SELECTION operators like
    * [[temperatureMix]]/[[stratifiedSample]] cannot express: weights
    * above 1 must REPEAT documents): each row in group g emits
    * floor(w_g) copies, plus one more iff its [[hashKey]] falls under
    * frac(w_g) — so the expected copy count per row is exactly w_g (up
    * to the 2^32 threshold quantization) and the realized copy count is
    * a pure function of (key, salt), independent of partitioning,
    * cluster size, or run. Groups absent from `weights` are dropped
    * (the [[stratifiedSample]] convention — a mixture spec names its
    * sources). Output: input columns + `copy` (1..n); loaders that
    * shuffle globally ([[shuffleIndex]] on (key, copy)) interleave the
    * repeats.
    *
    * Scale shape: one narrow map + an `explode(sequence(...))` per row —
    * no shuffle, no state; the weight table rides the plan as a literal
    * CASE chain (mixture specs are small by nature). */
  def epochUpsample(df: DataFrame, key: Column, group: Column,
                    weights: Map[String, Double],
                    salt: String = "graft-epoch"): DataFrame = {
    require(weights.nonEmpty, "at least one group weight required")
    weights.foreach { case (g, w) =>
      require(w >= 0.0 && w <= 1000.0, s"weight out of range for '$g': $w " +
        "(an epoch multiplier above 1000 is a mixture-spec bug)") }
    require(!df.columns.contains("copy"),
      "epochUpsample reserves the output column name 'copy'; rename it first")
    val h = hashKey(key, salt)
    val copies = weights.foldRight(lit(0): Column) {
      case ((g, w), acc) =>
        val base = math.floor(w).toLong
        val frac = w - base
        val n = lit(base) +
          when(h < lit(hexThreshold(frac)), lit(1L)).otherwise(lit(0L))
        when(group === g, n).otherwise(acc)
    }
    // sequence(1, 0) would DESCEND ([1, 0]) — zero-copy rows need an
    // explicit empty array so explode drops them
    df.withColumn("copy", explode(
      when(copies >= 1L, sequence(lit(1L), copies))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Stratified deterministic sample: per-stratum keep fractions (strata
    * value → fraction; strata missing from the map are dropped). Same
    * hash-threshold mechanism as [[deterministicSample]], so each
    * stratum's sample nests across fractions and survives repartitioning
    * — rebalancing a skewed corpus (e.g. downsampling a dominant
    * language) without RNG state. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       fractions: Map[String, Double],
                       salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty, "at least one stratum fraction required")
    val h = hashKey(key, salt)
    val keep = fractions.foldRight(lit(false): Column) {
      case ((stratum, f), acc) =>
        when(strata === stratum, h < lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Assign each row a split label by key hash: `splits` maps label →
    * fraction (must sum to ~1; the last label absorbs rounding). Order of
    * the Seq defines the hash-range layout, so the same call always yields
    * the same assignment. */
  def splitAssign(key: Column, splits: Seq[(String, Double)],
                  salt: String = "graft"): Column = {
    require(splits.nonEmpty, "at least one split required")
    val h = hashKey(key, salt)
    val cuts = splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val labeled = splits.init.map(_._1).zip(cuts.map(hexThreshold))
    labeled.foldRight(lit(splits.last._1): Column) { case ((label, cut), acc) =>
      when(h < lit(cut), lit(label)).otherwise(acc)
    }
  }

  /** Deterministic corpus shuffle with explicit positions: every row gets
    * its 0-based rank in the global (md5(key||salt), key) ordering — a
    * reproducible random permutation for training-data export, identical
    * across runs, engines, partitionings, and cluster sizes.
    *
    * Scale shape: the naive spelling is `row_number() OVER (ORDER BY
    * hash)` — one global sort partition. Instead the hash's first 8 hex
    * chars (uniform over 2^32) are range-grouped; per-group counts are
    * prefix-summed on the driver (O(groups) rows, like
    * [[Packing.packSequences]]); positions are the broadcast group offset
    * plus a partition-local rank. Lexicographic order of the full 32-hex
    * digest equals numeric order of its top-32-bit prefix groups, so
    * cross-group ordering is exact; (hash, key) breaks intra-group ties
    * totally. Output: `df` plus a `position` long column.
    *
    * CONTRACT: `df` must be deterministic — the group-count pass and the
    * final join are two separate Spark jobs, so a nondeterministic input
    * (`.sample` without a seed, a source whose files change mid-run)
    * can differ between them and yield gapped or duplicate positions
    * instead of a permutation. Persist or localCheckpoint such inputs
    * before calling (not done here unconditionally: materializing the
    * full corpus to cache is exactly the cost this operator avoids).
    * `validatePermutation = true` makes a violated contract LOUD: it
    * re-executes the output once and requires positions to be exactly
    * 0..n-1 (the globalOrdinal `validateTotalOrder` pattern — an opt-in
    * probe for suspect inputs, not a standing tax). */
  def shuffleIndex(df: DataFrame, key: Column, salt: String = "graft",
                   numGroups: Int = 0,
                   validatePermutation: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val groups = if (numGroups > 0) numGroups
      else math.max(spark.sparkContext.defaultParallelism, 1)
    val span = math.max((1L << 32) / groups, 1L)
    val withHash = df
      .withColumn("_h", md5(concat(key.cast("string"), lit(salt))))
      .withColumn("_g",
        expr(s"CAST(conv(substring(_h, 1, 8), 16, 10) AS BIGINT) DIV $span"))
    val totals = withHash.groupBy("_g").agg(count(lit(1)).as("_n"))
      .collect().map { r =>
        // a null group means null KEYS (md5 of null is null): a permutation
        // position is undefined for an identity-less row — fail loudly
        // instead of NPE-ing here or silently dropping rows in the join
        require(!r.isNullAt(0),
          s"shuffleIndex requires non-null keys (${r.getLong(1)} null-key rows)")
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    val prefix = totals.map(_._2).scanLeft(0L)(_ + _)
    import spark.implicits._
    val offDf = totals.map(_._1).zip(prefix).toSeq.toDF("_g", "_goff")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy(col("_h"), key)
    val out = withHash.join(broadcast(offDf), "_g")
      .withColumn("position", row_number().over(w).cast("long") + col("_goff") - 1)
      .drop("_h", "_g", "_goff")
    if (validatePermutation) {
      val expected = prefix.last
      val s = out.agg(count(lit(1)).as("n"),
        min("position").as("lo"), max("position").as("hi"),
        countDistinct("position").as("d")).collect()(0)
      val n = s.getLong(0)
      val d = s.getLong(3)
      // lo/hi are NULL aggregates on an empty frame — read only when rows exist
      val (lo, hi) = if (n == 0L) (0L, -1L) else (s.getLong(1), s.getLong(2))
      require(n == expected && (n == 0L || (lo == 0L && hi == n - 1)) && d == n,
        s"shuffleIndex: positions are not a permutation (rows=$n " +
          s"counted=$expected range=[$lo,$hi] distinct=$d) — the input " +
          "changed between the count job and the rank job (the " +
          "determinism contract above); persist/localCheckpoint it first")
    }
    out
  }

  /** Global 1-based ordinal under an arbitrary TOTAL ordering — the
    * scale-safe replacement for `row_number() OVER (ORDER BY …)`, which
    * moves every row to ONE task (Spark plans an unpartitioned window as
    * Exchange SinglePartition).
    *
    * Scale shape: range-repartition on the order columns (sampled bounds,
    * the same machinery a global sort uses), then rank WITHIN each range
    * partition and add the broadcast prefix-sum of partition counts —
    * O(partitions) driver rows, like [[shuffleIndex]]'s group offsets, so
    * a billion-row frame ranks on every core instead of one.
    *
    * CONTRACT: `order` must be a total order (include a unique tie-break
    * column). Spark's range partitioner never splits EQUAL keys across
    * partitions (getPartition is a pure function of the key), so tied
    * rows always rank within one task and each RUN's ordinals are
    * consistent — but their relative order is whatever the task read
    * first, so a non-total order makes ordinals among ties
    * input-order-dependent: a retry, a different split plan, or a
    * repartitioned upstream reorders them. `validateTotalOrder = true`
    * probes for that exact hazard — any duplicate order-value — with a
    * limit-1 duplicate probe over (order-key, count) partials and logs a
    * loud warning naming a tied value. Default OFF as a documented
    * decision: the probe is one extra job over the checkpointed frame,
    * and the registry's callers all carry unique tie-break columns
    * already; turn it on when wiring a new order spec.
    *
    * The range-partitioned frame is localCheckpoint'd (lazily) before the
    * two jobs read it: range bounds come from a SAMPLE whose seed varies
    * per evaluation (it folds in the RDD id), so without the checkpoint
    * the count job and the rank job can draw DIFFERENT boundaries and
    * every position downstream of the first divergent bound shifts by the
    * difference. The checkpoint pins one partitioning for both jobs (and
    * pays the one materialization a consistent global ordinal costs). */
  def globalOrdinal(df: DataFrame, order: Seq[Column], outCol: String,
                    numParts: Int = 0,
                    validateTotalOrder: Boolean = false): DataFrame = {
    // reserved working columns (same convention as AsOf.requireNoReserved):
    // an input frame already carrying one of these would be silently
    // corrupted by the withColumn/drop below — fail loudly instead
    for (c <- Seq("_op", "_ooff", outCol) if df.columns.contains(c))
      throw new IllegalArgumentException(
        s"globalOrdinal: input must not contain column '$c' " +
          s"(reserved working/output name); rename it first")
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else math.max(spark.sparkContext.defaultParallelism, 1)
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("_op", spark_partition_id())
      .localCheckpoint(false)
    val counts = ranged.groupBy("_op").agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val prefix = counts.map(_._2).scanLeft(0L)(_ + _)
    import spark.implicits._
    val offDf = counts.map(_._1).zip(prefix).toSeq.toDF("_op", "_ooff")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_op").orderBy(order: _*)
    val ranked = ranged.join(broadcast(offDf), "_op")
      .withColumn(outCol, row_number().over(w).cast("long") + col("_ooff"))
    if (validateTotalOrder) {
      // sort direction is irrelevant to UNIQUENESS — strip SortOrder
      // wrappers and probe for any duplicated order-value (map-side
      // combined counts, one surviving row fetched)
      import org.apache.spark.sql.catalyst.expressions.SortOrder
      val keys = order.zipWithIndex.map { case (c, i) =>
        val e = org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
          match { case so: SortOrder => so.child; case e => e }
        org.apache.spark.sql.graftbridge.ColumnBridge.column(e).as(s"_k$i")
      }
      val dup = ranged.groupBy(keys: _*).agg(count(lit(1)).as("_dn"))
        .filter(col("_dn") > 1).limit(1).collect()
      dup.headOption.foreach { r =>
        val v = (0 until keys.length).map(r.get).mkString("(", ",", ")")
        System.err.println(
          s"[graft] WARNING globalOrdinal: order spec is not a total " +
            s"order — value $v occurs ${r.getLong(keys.length)} times; " +
            "ordinals among tied rows are input-order-dependent (a retry " +
            "or different split plan reorders them). Add a unique " +
            "tie-break column to the order spec.")
      }
    }
    ranked.drop("_op", "_ooff")
  }

  /** Domain-fair interleave (crawl-frontier politeness ordering): a
    * global fetch order where every group's k-th row comes after EVERY
    * group's (k-1)-th — the round-robin-by-domain schedule that stops a
    * heavy host from monopolizing the queue head while still serving
    * high-priority URLs first within each host. Position = global rank
    * of (within-group sequence, then `order`), 1-based in `outCol`.
    *
    * Scale shape: ONE shuffle on the group key (the within-group
    * row_number window, properly partitioned — never a global window) +
    * [[globalOrdinal]]'s range exchange. `order` must totally order rows
    * that share a sequence number across groups (include a unique key);
    * [[globalOrdinal]]'s validateTotalOrder pins that in tests. */
  def fairInterleave(df: DataFrame, group: Column, order: Seq[Column],
                     outCol: String): DataFrame = {
    require(!df.columns.contains("_fseq"),
      "fairInterleave: input must not contain reserved column '_fseq'")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(order: _*)
    val seq = df.withColumn("_fseq", row_number().over(w))
    globalOrdinal(seq, col("_fseq") +: order, outCol).drop("_fseq")
  }

  /** Deterministic per-group cap (the C4/RefinedWeb "at most n documents
    * per domain" curation step): keep at most `n` rows per `groupCol`,
    * chosen by md5-hash order of `keyCol` — a reproducible pseudo-random
    * retention that is a pure function of the key, independent of
    * partitioning and cluster size.
    *
    * Scale shape: the kept set is computed over (group, key) pairs only —
    * the bounded [[graft.functions.TopKAggregate]] collapses candidates
    * map-side to ≤ n per group per task (never a per-group window sort of
    * the corpus), and the full rows survive via a LEFT SEMI join on the
    * key. Payload columns (text, vectors) cross the wire only in that
    * final semi join, pruned to whatever the caller selects downstream.
    *
    * Determinism contract: ordering is (first 13 hex chars of
    * md5(key || salt) ascending, key ascending) on both engines — 13 hex
    * digits = 52 bits, exact in the double score the aggregate orders by.
    * `keyCol` must be unique per row WITHIN its group (survivors are
    * re-attached on (group, key), so cross-group key reuse is fine) and
    * non-null long-castable — a value that casts to null fails the job
    * loudly rather than silently dropping the row. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String, n: Int,
                  salt: String = "graft"): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    // working names would resolve ambiguously in the semi join — reject
    // loudly instead of corrupting the kept set (the AsOf.Reserved rule)
    val clash = df.columns.toSet.intersect(Set("_capg", "_capk", "_top"))
    require(clash.isEmpty,
      s"capPerGroup reserves column names ${clash.mkString(", ")}")
    // a null long-cast (null key, or a non-numeric string key) would
    // silently drop the row from the kept set — error instead
    val keyLong = {
      val c = col(keyCol).cast("long")
      when(c.isNotNull, c).otherwise(raise_error(concat(
        lit(s"capPerGroup: keyCol '$keyCol' must be non-null and " +
          "long-castable; got "),
        coalesce(col(keyCol).cast("string"), lit("NULL")))))
    }
    // ascending hash order through a largest-first aggregate: negate the
    // 52-bit hash prefix (exact in a double); ties fall back to id asc,
    // matching the oracle's (substr(md5, 1, 13), key) ordering
    val kept = df
      .select(col(groupCol).as("_capg"), keyLong.as("_capk"))
      .groupBy("_capg")
      .agg(graft.functions.TopKAggregate.topk(
        -conv(substring(md5(concat(col("_capk").cast("string"), lit(salt))),
          1, 13), 16, 10).cast("double"), col("_capk"), n).as("_top"))
      .select(col("_capg"), explode(col("_top.id")).as("_capk"))
    // survivors re-attach on (group, key) — a key duplicated across
    // groups must not re-admit rows past the cap in OTHER groups; <=>
    // keeps null-group rows eligible (groupBy groups them together)
    df.join(kept, col(groupCol) <=> col("_capg") &&
      col(keyCol).cast("long") === col("_capk"), "left_semi")
  }

  /** Token-budget corpus selection: rows in (`score` DESC, `key` ASC)
    * order until the cumulative `cost` exceeds `budget` — "take the best
    * documents until the token budget is spent", the data-selection tail
    * of a curation pipeline. A row is kept iff the running cost through
    * it (inclusive) is ≤ budget; a row too big to fit blocks the prefix
    * (greedy prefix semantics, not knapsack). Returns the surviving rows
    * of `df`, schema unchanged.
    *
    * Requirements: `key` unique and non-null (ties and window frames are
    * resolved by it), `cost` non-negative (the running sum must be
    * monotone; NULL costs count as 0).
    *
    * Scale shape: the naive spelling is `sum(cost) OVER (ORDER BY score
    * DESC)` — one global sort partition. Instead scores bucket on
    * approx-quantile bounds collected once to the driver (a PURE function
    * of the row value, so every job sees the same bucketing —
    * `repartitionByRange` would NOT give that: its sampler is seeded by
    * the RDD id, which changes between the totals job and the final job),
    * per-bucket cost totals are prefix-summed on the driver (O(buckets)
    * rows), and the running sum is the broadcast bucket offset plus a
    * bucket-local window — the [[shuffleIndex]] machinery. Buckets whose
    * offset already exceeds the budget are pruned BEFORE the window sort,
    * so when budget ≪ corpus the sort only touches the buckets that can
    * still contribute. The output is independent of where the bounds land
    * (offsets absorb any imbalance); a degenerate distribution (all
    * scores equal) collapses to one bucket — the honest cost of ordering
    * by a constant. Same two-job determinism contract as
    * [[shuffleIndex]]. */
  def takeUntilBudget(df: DataFrame, key: Column, score: Column,
                      cost: Column, budget: Long,
                      numGroups: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val work = Set("_tb_s", "_tb_c", "_tb_k", "_tb_g", "_tb_off", "_tb_cum")
    val clash = df.columns.toSet.intersect(work)
    require(clash.isEmpty,
      s"takeUntilBudget reserves column names ${clash.mkString(", ")}")
    val groups = if (numGroups > 0) numGroups
      else math.max(spark.sparkContext.defaultParallelism, 1)
    val scored = df
      .withColumn("_tb_s", score).withColumn("_tb_c", cost.cast("long"))
      .withColumn("_tb_k", key)
    // distinct ascending quantile bounds of score (cast to double only
    // for BUCKETING — ordering below uses the exact column); bucket =
    // count of bounds above the score, so bucket ids ascend as scores
    // descend, matching the (score DESC) global order
    val bounds = scored.stat
      .approxQuantile("_tb_s",
        (1 until groups).map(_.toDouble / groups).toArray, 0.001)
      .distinct.sorted
    val bucketed = scored.withColumn("_tb_g",
      if (bounds.isEmpty) lit(0)
      else size(filter(typedlit(bounds.toSeq),
        b => b > col("_tb_s").cast("double"))))
    val totals = bucketed.groupBy("_tb_g")
      .agg(sum("_tb_c").as("_n")).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val prefix = totals.map(_._2).scanLeft(0L)(_ + _)
    import spark.implicits._
    val offDf = totals.map(_._1).zip(prefix).toSeq.toDF("_tb_g", "_tb_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_tb_g").orderBy(col("_tb_s").desc, col("_tb_k"))
    bucketed.join(broadcast(offDf), "_tb_g")
      .filter(col("_tb_off") <= budget) // prune: cannot contribute
      .withColumn("_tb_cum", sum(col("_tb_c")).over(w) + col("_tb_off"))
      .filter(col("_tb_cum") <= budget)
      .drop(work.toSeq: _*)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-Res, Inf. Proc. Letters 97(5)): each row gets the key
    * ln(u)/w with u a pure md5-derived uniform of the row key — the k
    * LARGEST keys are exactly a weighted sample without replacement.
    * Reproducible across runs/partitionings/engines like every sampler
    * here; change `salt` for a fresh draw. Rows with weight ≤ 0 or NULL
    * cannot be sampled and are filtered.
    *
    * Scale shape: the key is a narrow projection; selection is
    * orderBy+limit → TakeOrderedAndProject (bounded per-partition heaps
    * merged on the driver, never a global sort). The 13-hex-digit
    * uniform (52 bits) is exact in a double on both engines; ln's last
    * ulp is libm-specific (the BM25 caveat), flipping membership only
    * when two keys collide within an ulp — measure-zero for continuous
    * key material. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String = "graft"): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    require(!df.columns.contains("_ws_key"),
      "weightedSample reserves column name _ws_key")
    val v = conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 13),
      16, 10).cast("double")
    val u = (v + lit(1.0)) / lit(4503599627370496.0) // (0, 1], 2^52 buckets
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("_ws_key", log(u) / weight.cast("double"))
      .orderBy(col("_ws_key").desc, key)
      .limit(k)
      .drop("_ws_key")
  }

  /** Temperature-weighted corpus mixing (the multilingual-LM data recipe,
    * e.g. arXiv:1901.07291 §3.1): resample groups (languages, sources)
    * toward weights w_g ∝ n_g^alpha, flattening the head and boosting the
    * tail. Each group keeps rate r_g = min(1, target·w_g / Σw / n_g), so
    * the expected output size is ≤ `target` rows with group shares
    * proportional to n_g^alpha. Rows whose group is NULL are dropped.
    *
    * Deterministic end to end: membership is the md5-threshold rule of
    * [[deterministicSample]] with a per-group threshold; thresholds are
    * floor(r·2^32) buckets computed from the observed counts in GROUP-
    * ASCENDING order, so an engine-portable oracle can recompute them
    * bit-for-bit (alpha = 0.5 uses sqrt, which IEEE 754 rounds correctly
    * — other alphas go through pow, whose last-ulp behavior is
    * library-specific; stick to 0.5 when cross-engine equality matters).
    * Like [[shuffleIndex]], the input is evaluated twice (count job +
    * filter job) and must be deterministic between them.
    *
    * Scale shape: one O(groups) count aggregate collected to the driver,
    * then ONE narrow filter over the scan — no shuffle of the data path,
    * no RNG state, identical output at any partitioning or cluster size. */
  def temperatureMix(df: DataFrame, key: Column, group: Column,
                     target: Long, alpha: Double = 0.5,
                     salt: String = "graft",
                     maxGroups: Int = MaxMixGroups): DataFrame = {
    // the override can only LOWER the cap: keepByRates' literal when-chain
    // is the binding constraint regardless of how big a table the caller
    // is willing to collect
    require(maxGroups >= 1 && maxGroups <= MaxMixGroups,
      s"maxGroups must be in [1, $MaxMixGroups]: $maxGroups")
    // the rate table lives on the DRIVER and the membership predicate is
    // a literal per-group chain: both are sized for bounded group keys
    // (language, source family — the operator's documented domain). The
    // limit below bounds the collect itself, then the guard fails loudly
    // instead of letting a caller who passed `group = domain` on a web
    // corpus melt the driver
    val counts = df.select(group.cast("string").as("g"))
      .filter(col("g").isNotNull)
      .groupBy("g").agg(count(lit(1)).as("n"))
      .limit(maxGroups + 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(counts.size <= maxGroups,
      s"temperatureMix: more than $maxGroups distinct groups — this " +
        "operator holds the rate table driver-side and is sized for " +
        "bounded keys (language, source family). For unbounded keys " +
        "(domain, url host), cap or bucket the key first: " +
        "Sampling.capPerGroup for per-key limits, or mix over the " +
        "t29-style heavy-hitters head (graft_topk) with a tail bucket.")
    if (counts.isEmpty) return df.limit(0)
    df.filter(keepByRates(key, group, temperatureRates(counts, target, alpha),
      salt))
  }

  /** The [[temperatureMix]] rate table from observed group counts — split
    * out so a STREAM can apply rates trained on a batch snapshot
    * ([[graft.streaming.StreamingCuration.temperatureGate]]). Groups sum
    * in group-ascending order (literal left-assoc op chain — the oracle
    * mirrors it exactly). */
  def temperatureRates(counts: Seq[(String, Long)], target: Long,
                       alpha: Double = 0.5): Map[String, Double] = {
    require(target >= 0, s"target out of range: $target")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of range: $alpha")
    def w(n: Double): Double =
      if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha)
    val sorted = counts.sortBy(_._1)
    val denom = sorted.foldLeft(0.0) { case (acc, (_, n)) => acc + w(n.toDouble) }
    sorted.map { case (g, n) =>
      g -> target.toDouble * w(n.toDouble) / denom / n.toDouble
    }.toMap
  }

  /** Membership predicate for a per-group rate table: the md5-threshold
    * rule with floor(rate·2^32) hex-bucket thresholds. Groups absent
    * from `rates` (and NULL groups) are dropped. Pure per-row function —
    * safe in batch and streaming plans alike. */
  def keepByRates(key: Column, group: Column, rates: Map[String, Double],
                  salt: String = "graft"): Column = {
    require(rates.size <= MaxMixGroups,
      s"keepByRates: ${rates.size} groups exceed $MaxMixGroups — the " +
        "predicate is a literal per-group when-chain (an expression tree " +
        "this deep breaks analysis long before the driver runs out of " +
        "memory); bucket or cap the group key first")
    val h = hashKey(key, salt)
    rates.toSeq.sortBy(_._1).foldRight(lit(false): Column) {
      case ((g, rate), acc) =>
        val buckets = math.min(math.floor(rate * 4294967296.0).toLong, 1L << 32)
        val thr = if (buckets >= (1L << 32)) "g" else f"$buckets%08x"
        when(group.cast("string") === g, h < lit(thr)).otherwise(acc)
    }
  }
}
