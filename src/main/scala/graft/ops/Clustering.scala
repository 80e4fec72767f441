package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Spherical k-means clustering over an embedding column — corpus
  * organization for training-data pipelines (topic bucketing, per-cluster
  * sampling quotas, cluster-balanced shuffles).
  *
  * Division of labor (the IVF pattern from [[Similarity]]): centroids are
  * trained driver-side by Lloyd iterations over a bounded seeded sample
  * (k × dim doubles — trivially broadcastable), and the corpus-wide
  * assignment is ONE narrow kernel pass (`IvfCellsExpression`: argmax
  * cosine over the broadcast centroid matrix, ties to the higher index).
  * Nothing shuffles at any corpus size; at 100 TB the assignment is a
  * map-only job whose output can feed a partitioned write.
  *
  * Cosine is scale-invariant, so the Lloyd update can use the plain member
  * mean (the normalized mean points the same way) — cluster cohesion
  * (Σ cosine to own centroid) is monotonically non-decreasing, pinned by
  * ClusteringSpec.
  */
object Clustering {

  /** The k lowest-id vectors as (labels, centroids) — the deterministic,
    * SQL-expressible initialization (the c01 oracle recomputes it in
    * DuckDB; Lloyd refinement is engine-side only and golden-tested). */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): (Array[Long], Array[Array[Double]]) = {
    val rows = df.select(col(idCol).cast("long"),
        col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(k).collect()
    (rows.map(_.getLong(0)),
     rows.map(_.getSeq[Double](1).toArray))
  }

  /** Nearest-centroid assignment: (id, cluster) via one kernel pass.
    * `labels(i)` names centroid i in the output (defaults to 0..k-1). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Double]],
             labels: Array[Long] = null): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    val lab: Array[Long] =
      if (labels == null) Array.tabulate(centroids.length)(_.toLong) else labels
    require(lab.length == centroids.length,
      s"${lab.length} labels for ${centroids.length} centroids")
    val cell = element_at(graft.functions.IvfCellsExpression.ivfCells(
      col(vecCol).cast("array<double>"), centroids, 1), 1)
    df.select(col(idCol).as("id"),
      element_at(typedlit(lab.toSeq), cell + 1).as("cluster"))
  }

  /** Driver-side spherical Lloyd over a seeded sample (bounded collect —
    * the [[Similarity]] trainer pattern). Initial centroids are the k
    * lowest-id vectors; empty clusters keep their previous centroid.
    * Assignment uses the same comparison semantics as the distributed
    * kernel (Double.compare, ties to the higher index) so a 0-iteration
    * train followed by [[assign]] IS the seed Voronoi partition. */
  def trainKMeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int, sampleSize: Int = 4096,
                  seed: Int = 42): Array[Array[Double]] = {
    val (_, init) = seedCentroids(df, idCol, vecCol, k)
    if (init.isEmpty || iters == 0) return init
    val sample = df.select(col(vecCol).cast("array<double>"))
      .orderBy(xxhash64(col(vecCol).cast("array<string>").cast("string"),
        lit(seed)))
      .limit(sampleSize).collect().map(_.getSeq[Double](0).toArray)
    var cents = init
    for (_ <- 1 to iters) {
      val dim = cents.head.length
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Int](cents.length)
      sample.foreach { v =>
        val c = nearest(v, cents)
        counts(c) += 1
        var j = 0
        val n = math.min(dim, v.length)
        while (j < n) { sums(c)(j) += v(j); j += 1 }
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** Train + assign: (id, cluster) with cluster in 0..k-1. Total on an
    * empty corpus (no centroids to train → empty assignment, same schema)
    * — at 100 TB a filtered-to-nothing input must not kill the job. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int = 5, sampleSize: Int = 4096,
                   seed: Int = 42): DataFrame = {
    val cents = trainKMeans(df, idCol, vecCol, k, iters, sampleSize, seed)
    if (cents.isEmpty)
      df.select(col(idCol).as("id"), lit(0L).as("cluster")).limit(0)
    else assign(df, idCol, vecCol, cents)
  }

  /** (cluster, n) sizes — the shuffle carries (cluster, partial count). */
  def clusterSizes(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster").agg(count(lit(1)).as("n")).orderBy("cluster")

  /** Mean cosine of each sample member to its own centroid — the spherical
    * k-means objective, for convergence tests and cluster-quality reports.
    * Driver-side over the same bounded sample contract as training. */
  def cohesion(sample: Array[Array[Double]],
               cents: Array[Array[Double]]): Double = {
    if (sample.isEmpty) return 0.0
    sample.map { v => cos(v, cents(nearest(v, cents))) }.sum / sample.length
  }

  /** Argmax cosine, NaN greatest, ties to the HIGHER index — exactly
    * `IvfCellsExpression`'s ordering. */
  private[ops] def nearest(v: Array[Double],
                           cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestSim = cos(v, cents(0))
    var c = 1
    while (c < cents.length) {
      val s = cos(v, cents(c))
      val cmp = java.lang.Double.compare(s, bestSim)
      if (cmp > 0 || cmp == 0) { best = c; bestSim = s }
      c += 1
    }
    best
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    var j = n
    while (j < a.length) { na += a(j) * a(j); j += 1 }
    j = n
    while (j < b.length) { nb += b(j) * b(j); j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
