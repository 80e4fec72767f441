package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  /** Three well-separated direction clusters (cosine geometry) + noise. */
  private def planted(seed: Int = 7): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val bases = Seq(
      Array.tabulate(16)(i => if (i < 5) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 1.0 else 0.0),
      Array.tabulate(16)(i => if (i >= 10) 1.0 else 0.0))
    (0 until 120).map { i =>
      val base = bases(i % 3)
      val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, v)
    }
  }

  test("driver Lloyd and the distributed kernel agree on every assignment") {
    import spark.implicits._
    val data = planted()
    val df = data.toDF("vec_id", "embedding")
    val cents = Clustering.trainKMeans(df, "vec_id", "embedding", k = 3,
      iters = 4, sampleSize = 200)
    val viaKernel = Clustering.assign(df, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = data.map { case (id, v) =>
      id -> Clustering.nearest(v.map(_.toDouble), cents).toLong
    }.toMap
    assert(viaKernel == viaDriver)
  }

  test("planted direction clusters are recovered exactly") {
    import spark.implicits._
    val data = planted()
    val df = data.toDF("vec_id", "embedding")
    val assigned = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 3,
        iters = 5, sampleSize = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member of a planted cluster maps to the same label, 3 labels
    val byPlant = data.groupBy(_._1 % 3).map { case (p, rows) =>
      p -> rows.map(r => assigned(r._1)).toSet
    }
    assert(byPlant.values.forall(_.size == 1), byPlant.toString)
    assert(byPlant.values.flatten.toSet.size == 3)
  }

  test("cohesion is monotonically non-decreasing over Lloyd iterations") {
    import spark.implicits._
    val data = planted(seed = 13)
    val df = data.toDF("vec_id", "embedding")
    val sample = data.map(_._2.map(_.toDouble))
    val cohesions = (0 to 4).map { it =>
      Clustering.cohesion(sample.toArray,
        Clustering.trainKMeans(df, "vec_id", "embedding", k = 3,
          iters = it, sampleSize = 200))
    }
    assert(cohesions.zip(cohesions.tail).forall { case (a, b) => b >= a - 1e-12 },
      cohesions.toString)
    assert(cohesions.last > cohesions.head) // seeds genuinely refined
  }

  test("0-iteration training IS the seed Voronoi partition (the c01 contract)") {
    import spark.implicits._
    val df = planted().toDF("vec_id", "embedding")
    val (labels, cents) = Clustering.seedCentroids(df, "vec_id", "embedding", 4)
    assert(labels.toSeq == Seq(0L, 1L, 2L, 3L)) // lowest ids, id order
    val trained = Clustering.trainKMeans(df, "vec_id", "embedding", k = 4,
      iters = 0)
    assert(trained.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    // labels rename the clusters to the seed ids
    val a = Clustering.assign(df, "vec_id", "embedding", cents, labels)
    assert(a.filter(col("id") === 2L).head().getLong(1) == 2L)
  }

  test("assignment ties break to the higher seed index like the kernel") {
    import spark.implicits._
    // two identical centroids: every vector is equidistant; index 1 wins
    val cents = Array(Array(1.0, 0.0), Array(1.0, 0.0))
    val df = Seq((1L, Array(0.5f, 0.5f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Clustering.assign(df, "vec_id", "embedding", cents)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L))
    assert(Clustering.nearest(Array(0.5, 0.5), cents) == 1)
  }

  test("assignment plan is a narrow map — no shuffle, no join") {
    import spark.implicits._
    val df = planted().toDF("vec_id", "embedding")
    val (labels, cents) = Clustering.seedCentroids(df, "vec_id", "embedding", 4)
    val plan = Clustering.assign(df, "vec_id", "embedding", cents, labels)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"assign must stay narrow:\n$plan")
  }

  test("clusterSizes partitions the corpus exactly") {
    import spark.implicits._
    val df = planted().toDF("vec_id", "embedding")
    val sizes = Clustering.clusterSizes(
        Clustering.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 3,
          sampleSize = 200))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == 120)
    assert(sizes.values.forall(_ == 40)) // balanced planted design
  }
}
