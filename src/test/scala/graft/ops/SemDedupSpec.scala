package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDedup (Similarity.semDedup): cluster-bounded cosine pruning,
  * keep-lowest-id. The distributed path must agree with a driver-side
  * brute-force of the literal drop rule. */
class SemDedupSpec extends SparkSpec {

  private def planted(seed: Int = 11): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until 90).map { i =>
      val v = Array.tabulate(12)(_ => rnd.nextGaussian())
      (i.toLong, v)
    }
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na * nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The literal rule: drop x iff a lower-id same-cluster y has
    * cos(x, y) >= t. */
  private def bruteSurvivors(data: Seq[(Long, Array[Double])],
                             cents: Array[Array[Double]],
                             t: Double): Set[Long] = {
    val byCluster = data.groupBy { case (_, v) => Clustering.nearest(v, cents) }
    byCluster.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      sorted.filter { case (id, v) =>
        !sorted.exists { case (id2, v2) => id2 < id && cos(v, v2) >= t }
      }.map(_._1)
    }.toSet
  }

  test("planted exact copies drop; originals and organic rows survive") {
    import spark.implicits._
    val data = planted()
    val df = data.toDF("id", "v")
    val withCopies = df.unionByName(
      df.select((col("id") + 1000L).as("id"), col("v")))
    val out = Similarity.semDedup(withCopies, "id", "v",
      k = 4, threshold = 0.95, iters = 0)
    val kept = out.select("id").as[Long].collect().toSet
    assert(kept == data.map(_._1).toSet) // every copy dropped, nothing else
  }

  test("distributed path equals the driver brute-force at a live threshold") {
    import spark.implicits._
    val data = planted(seed = 23)
    val df = data.toDF("id", "v")
    val cents = Clustering.trainKMeans(df, "id", "v", k = 3, iters = 2,
      sampleSize = 200)
    // 0.3 sits inside the organic cosine range, so real pruning happens
    val out = Similarity.semDedupWithCentroids(df, "id", "v", cents, 0.3)
    val kept = out.select("id").as[Long].collect().toSet
    val expect = bruteSurvivors(data, cents, 0.3)
    assert(kept == expect)
    assert(kept.size < data.size) // the threshold actually bit
  }

  test("identical triple keeps only the lowest id") {
    import spark.implicits._
    val v = Array(1.0, 2.0, 3.0)
    val df = Seq((5L, v), (9L, v), (2L, v)).toDF("id", "v")
    val out = Similarity.semDedup(df, "id", "v", k = 1, threshold = 0.99,
      iters = 0)
    assert(out.select("id").as[Long].collect().toSet == Set(2L))
  }

  test("semDedupAuto scales k with the corpus and still drops planted copies") {
    import spark.implicits._
    val data = planted(seed = 31)
    val df = data.toDF("id", "v")
    val withCopies = df.unionByName(
      df.select((col("id") + 1000L).as("id"), col("v")))
    val out = Similarity.semDedupAuto(withCopies, "id", "v", threshold = 0.95)
    val kept = out.select("id").as[Long].collect().toSet
    // identical vectors land in the same cluster at ANY k, so every
    // planted copy is dropped regardless of the auto-chosen bucket count
    assert(kept == data.map(_._1).toSet)
    // empty input total
    assert(Similarity.semDedupAuto(df.limit(0), "id", "v", 0.9).count() == 0)
  }

  test("threshold above 1 is a no-op; empty input is total") {
    import spark.implicits._
    val df = planted().toDF("id", "v")
    val out = Similarity.semDedup(df, "id", "v", k = 4, threshold = 1.5,
      iters = 0)
    assert(out.count() == 90)
    val empty = df.limit(0)
    assert(Similarity.semDedup(empty, "id", "v", k = 4, threshold = 0.9)
      .count() == 0)
  }
}
