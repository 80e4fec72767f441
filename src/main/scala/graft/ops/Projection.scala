package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening projection for embedding columns — the classic
  * preprocessing in front of the ANN stack ([[Similarity]]): rotate to
  * the principal axes so prefix truncation keeps maximal variance
  * (truncatedTopK over projected vectors), equalize axis scales so LSH
  * hyperplanes and PQ subspaces see isotropic data (the OPQ idea).
  *
  * Division of labor (the IVF/k-means pattern): the d×d covariance
  * eigenproblem is solved ONCE on the driver from a bounded seeded
  * sample — the embedding dimension is bounded (10²-10³) regardless of
  * corpus size, so cyclic-Jacobi on d×d is driver-trivial — and the
  * corpus-wide projection is one narrow kernel pass over the broadcast
  * (components × d) matrix (`MatVecExpression`: y = M·(x − mean), with
  * the mean folded into a precomputed offset). Nothing shuffles at any
  * corpus scale.
  */
object Projection {

  /** mean (d), components (c×d rows, orthonormal, top eigenvectors by
    * eigenvalue desc), eigenvalues (c, descending). */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double]) {
    /** Projection offsets: off_i = comp_i · mean, so the kernel computes
      * comp_i · x − off_i ≡ comp_i · (x − mean) in one pass. */
    def offsets: Array[Double] = components.map(r => dotArr(r, mean))
  }

  /** Fit PCA on a seeded driver sample (deterministic; the
    * [[Similarity]] trainer contract). `components` clamps to the
    * observed dimension. Returns an empty model on an empty corpus. */
  def pcaTrain(df: DataFrame, vecCol: String, components: Int,
               sampleSize: Int = 4096, seed: Int = 42): PcaModel = {
    require(components >= 1, s"components must be >= 1: $components")
    val sample = df.select(col(vecCol).cast("array<double>"))
      .orderBy(xxhash64(col(vecCol).cast("array<string>").cast("string"), lit(seed)))
      .limit(sampleSize).collect().map(_.getSeq[Double](0).toArray)
    if (sample.isEmpty)
      return PcaModel(Array.empty, Array.empty, Array.empty)
    val n = sample.length
    val d = sample.map(_.length).max
    val mean = new Array[Double](d)
    sample.foreach { v => var j = 0; while (j < v.length) { mean(j) += v(j); j += 1 } }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    // sample covariance (biased 1/n — a constant factor, eigenvectors
    // unchanged); short rows pad with zeros
    val cov = Array.fill(d)(new Array[Double](d))
    sample.foreach { v =>
      val x = Array.tabulate(d)(i => (if (i < v.length) v(i) else 0.0) - mean(i))
      var a = 0
      while (a < d) {
        val xa = x(a)
        var b = a
        while (b < d) { cov(a)(b) += xa * x(b); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => -vals(i)).take(math.min(components, d))
    PcaModel(mean,
      order.map(i => vecs.map(_(i))).toArray,
      order.map(i => math.max(vals(i), 0.0)).toArray)
  }

  /** Project every vector onto the model's principal axes: one kernel
    * pass, output (idCol, `projected` array<double> of length c). With
    * `whiten = true` each coordinate is scaled by 1/√eigenvalue
    * (zero-variance axes stay unscaled — a 0-variance coordinate is
    * exactly 0 after centering, and ANSI division by √0 would kill the
    * job for a constant embedding column). */
  def project(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
              whiten: Boolean = false): DataFrame = {
    require(model.components.nonEmpty, "project needs a fitted model")
    val comps =
      if (!whiten) model.components
      else model.components.zip(model.eigenvalues).map { case (r, ev) =>
        if (ev <= 0) r else r.map(_ / math.sqrt(ev))
      }
    val offs = PcaModel(model.mean, comps, model.eigenvalues).offsets
    df.select(col(idCol).as("id"),
      graft.functions.MatVecExpression.matVec(
        col(vecCol).cast("array<double>"), comps, offs).as("projected"))
  }

  /** Fraction of total sample variance captured by the retained
    * components (diagnostics / picking c). */
  def explainedVariance(model: PcaModel, totalVariance: Double): Double =
    if (totalVariance <= 0) 0.0 else model.eigenvalues.sum / totalVariance

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvector i in COLUMN i).
    * O(d³) per sweep, a handful of sweeps — milliseconds at d ≤ 10³. */
  private[ops] def jacobiEigen(m: Array[Array[Double]],
                               maxSweeps: Int = 32,
                               tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → 45° rotation
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
