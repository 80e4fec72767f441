package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.hashing.MurmurHash3

/** Deduplication operators (SURVEY.md §2.9 extension surface).
  *
  * Scale design notes (the point of each shape at 100 TB):
  *  - exact dedup: hash-groupBy on a 16-byte fingerprint — one shuffle keyed
  *    on the hash, never on document bodies; survivors picked with min(id)
  *    so the result is deterministic.
  *  - MinHash+LSH: per-row signature (narrow map), explode to (band,
  *    bandHash) keys — the ONLY shuffle is on small bucket keys; candidate
  *    pairs come from equi-joins within buckets (never an O(n²) cross join),
  *    then exact-Jaccard verification on just the candidates.
  *  - SimHash: 64-bit signature per row; hamming≤3 neighbours found by the
  *    pigeonhole band trick (4 × 16-bit chunks, any equal chunk → candidate).
  */
object Dedup {

  // ---- exact --------------------------------------------------------------

  /** Exact-duplicate groups by a key column: survivor = min(idCol). */
  def exactDedupGroups(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(idCol).as("survivor_id"), count(lit(1)).as("group_size"))

  /** Drop exact duplicates, keeping the row with the smallest id per key. */
  def exactDedup(df: DataFrame, key: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(idCol.asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // ---- shingles + exact jaccard -------------------------------------------

  /** Distinct word n-gram shingles of a text. */
  def shingles(text: String, n: Int = 3): Set[String] = {
    val words = text.split(" ")
    if (words.length < n) Set(text)
    else words.sliding(n).map(_.mkString(" ")).toSet
  }

  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val inter = a.intersect(b).size
    inter.toDouble / (a.size + b.size - inter)
  }

  /** Column form: distinct 3-gram shingle array, built from built-ins only
    * (transform over word indexes — stays in codegen). */
  def shingleCol(text: Column, n: Int = 3): Column = {
    val words = split(text, " ", 0)
    val grams = transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => array_join(slice(words, i + 1, lit(n)), " "))
    array_distinct(when(size(words) < n, array(text)).otherwise(grams))
  }

  /** Exact jaccard between two shingle-array columns (set semantics). */
  def jaccardCol(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(array_union(a, b)).cast("double"))
  }

  // ---- MinHash + LSH -------------------------------------------------------

  private val MersennePrime = (1L << 61) - 1

  /** Deterministic (a,b) hash-family parameters. */
  private def hashParams(k: Int, seed: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)((math.abs(rnd.nextLong()) % MersennePrime max 1L,
                   math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** MinHash signature of a shingle set: sig_i = min over shingles of
    * (a_i * h(s) + b_i) mod p. */
  def minhashSignature(sh: Set[String], numHashes: Int, seed: Int = 42): Array[Long] = {
    val params = hashParams(numHashes, seed)
    val hashes = sh.iterator.map(s => MurmurHash3.stringHash(s).toLong & 0xffffffffL).toArray
    params.map { case (a, b) =>
      if (hashes.isEmpty) Long.MaxValue
      else {
        var min = Long.MaxValue
        var i = 0
        while (i < hashes.length) {
          val v = (a * hashes(i) + b) % MersennePrime
          if (v < min) min = v
          i += 1
        }
        min
      }
    }
  }

  /** Candidate pairs via banded MinHash-LSH, verified by exact Jaccard.
    *
    * Input: (idCol, textCol). Output: (id_a, id_b, jaccard) with id_a < id_b
    * and jaccard >= threshold. bands × rowsPerBand hashes; defaults give
    * P(detect | j=0.8) ≈ 1 - (1-0.8³)^32 ≈ 1 - 2e-5 per pair.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.8,
                          bands: Int = 32, rowsPerBand: Int = 3,
                          shingleN: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val numHashes = bands * rowsPerBand

    val sigUdf = udf((text: String) => {
      val sig = minhashSignature(shingles(text, shingleN), numHashes)
      (0 until bands).map { b =>
        val bandVals = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (b, MurmurHash3.arrayHash(bandVals))
      }
    })

    // Shuffle discipline: the band self-join moves ONLY (id, band, bhash)
    // triples — never the shingle arrays. Shingles are attached to just the
    // deduplicated candidate pairs afterwards (two hash joins against a
    // compact id→shingles frame). At 100 TB the band frame is ~rows×bands
    // small fixed-width tuples; carrying document-sized arrays through that
    // explode+join would multiply shuffle volume by the document size.
    val buckets = df
      .select(col(idCol).as("id"), explode(sigUdf(col(textCol))).as("bucket"))
      .select(col("id"), col("bucket._1").as("band"), col("bucket._2").as("bhash"))

    val candidates = buckets.alias("a").join(buckets.alias("b"),
        col("a.band") === col("b.band") &&
        col("a.bhash") === col("b.bhash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val shingled = df.select(col(idCol).as("id"), shingleCol(col(textCol), shingleN).as("sh"))

    candidates
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over word features. */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    text.split(" ").foreach { w =>
      val h = (MurmurHash3.stringHash(w).toLong << 32) |
        (MurmurHash3.stringHash(w.reverse).toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    counts.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c > 0) acc | (1L << i) else acc
    }
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Near-dup pairs with hamming(simhash) <= maxDistance, using the
    * pigeonhole principle: split the 64-bit signature into maxDistance+1
    * chunks; any pair within distance shares at least one exact chunk, so
    * candidates come from equi-joins on (chunkIdx, chunkValue). */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val bits = 64 / chunks
    val simUdf = udf((text: String) => simhash(text))
    val chunkUdf = udf((sig: Long) =>
      (0 until chunks).map(i => (i, (sig >>> (i * bits)) & ((1L << bits) - 1))))
    val hamUdf = udf((a: Long, b: Long) => hamming(a, b))

    val sigs = df.select(col(idCol).as("id"), simUdf(col(textCol)).as("sig"))
    val buckets = sigs.select(col("id"), col("sig"), explode(chunkUdf(col("sig"))).as("c"))
      .select(col("id"), col("sig"), col("c._1").as("ci"), col("c._2").as("cv"))

    buckets.alias("a").join(buckets.alias("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("distance", hamUdf(col("sig_a"), col("sig_b")))
      .filter(col("distance") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("distance"))
  }
}
