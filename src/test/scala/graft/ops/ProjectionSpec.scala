package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    val (vals, vecs) = Projection.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-10 && math.abs(sorted(1) - 3.0) < 1e-10)
    // eigenvector columns satisfy A v = λ v
    for (i <- 0 until 2) {
      val v = Array(vecs(0)(i), vecs(1)(i))
      val av = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      assert(math.abs(av(0) - vals(i) * v(0)) < 1e-10)
      assert(math.abs(av(1) - vals(i) * v(1)) < 1e-10)
    }
  }

  test("pcaTrain: orthonormal components, descending eigenvalues, recovered subspace") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 10-dim data living in a 3-dim latent subspace + small noise
    val basis = Array.fill(3)(Array.fill(10)(rnd.nextGaussian()))
    val data = (1 to 400).map { i =>
      val z = Array.fill(3)(rnd.nextGaussian() * 4.0) // strong latent
      val v = Array.tabulate(10)(j =>
        basis.zipWithIndex.map { case (b, k) => z(k) * b(j) }.sum
          + rnd.nextGaussian() * 0.01)
      (i.toLong, v.toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val m = Projection.pcaTrain(df, "embedding", components = 3,
      sampleSize = 400)
    assert(m.components.length == 3 && m.components.head.length == 10)
    // orthonormal rows
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8, s"($a,$b): $dot")
    }
    assert(m.eigenvalues.zip(m.eigenvalues.tail).forall { case (x, y) => x >= y })
    // 3 components capture essentially all variance of rank-3 data
    val total = {
      val mean = Array.tabulate(10)(j => data.map(_._2(j)).sum / data.size)
      data.map(_._2.zipWithIndex.map { case (x, j) =>
        (x - mean(j)) * (x - mean(j)) }.sum).sum / data.size
    }
    assert(Projection.explainedVariance(m, total) > 0.999)
  }

  test("kernel projection equals the driver-side formulation, null stays null") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = (1 to 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian())))
    val df = data.toDF("vec_id", "embedding")
    val m = Projection.pcaTrain(df, "embedding", components = 4, sampleSize = 50)
    val got = Projection.project(df, "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    data.foreach { case (id, v) =>
      val want = m.components.map(r =>
        r.zipWithIndex.map { case (w, j) => w * (v(j) - m.mean(j)) }.sum)
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"id $id: $g vs $w") }
    }
    val withNull = (data :+ (99L, null.asInstanceOf[Seq[Double]]))
      .toDF("vec_id", "embedding")
    val nulls = Projection.project(withNull, "vec_id", "embedding", m)
      .filter(col("projected").isNull).collect()
    assert(nulls.map(_.getLong(0)).toSeq == Seq(99L))
  }

  test("whitening gives ~unit variance per retained axis") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // anisotropic: axis scales 10, 3, 0.5
    val data = (1 to 500).map(i => (i.toLong, Seq(
      rnd.nextGaussian() * 10, rnd.nextGaussian() * 3, rnd.nextGaussian() * 0.5)))
    val df = data.toDF("vec_id", "embedding")
    val m = Projection.pcaTrain(df, "embedding", components = 3, sampleSize = 500)
    val proj = Projection.project(df, "vec_id", "embedding", m, whiten = true)
      .collect().map(_.getSeq[Double](1))
    for (axis <- 0 until 3) {
      val xs = proj.map(_(axis))
      val mean = xs.sum / xs.size
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
      assert(math.abs(variance - 1.0) < 0.05, s"axis $axis variance $variance")
    }
  }

  test("PCA-then-ANN keeps planted-neighbor recall at a quarter of the dims") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val m = Projection.pcaTrain(emb, "embedding", components = 16)
    val queries = emb.limit(64).select((col("vec_id") + 5000L).as("vec_id"),
      zip_with(col("embedding").cast("array<double>"),
        reverse(col("embedding").cast("array<double>")),
        (a, b) => a + lit(0.05) * b).as("embedding"))
    val pc = Projection.project(emb, "vec_id", "embedding", m)
      .withColumnRenamed("projected", "embedding")
    val pq = Projection.project(queries, "vec_id", "embedding", m)
      .withColumnRenamed("projected", "embedding")
    val got = Similarity.bruteForceTopK(pc, pq, "id", "embedding", k = 1)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = got.count { case (q, n) => n == q - 5000L }
    assert(hits >= 58, s"PCA-ANN recall too low: $hits/64")
  }

  test("degenerate inputs: empty corpus trains an empty model; project requires a fit") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val m = Projection.pcaTrain(empty, "embedding", components = 4)
    assert(m.components.isEmpty && m.mean.isEmpty && m.eigenvalues.isEmpty)
    intercept[IllegalArgumentException] {
      Projection.project(empty, "vec_id", "embedding", m)
    }
  }
}
