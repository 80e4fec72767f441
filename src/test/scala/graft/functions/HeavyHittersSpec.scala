package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private def sketch(items: Seq[String], cap: Int, parts: Int = 4) = {
    import spark.implicits._
    items.toDF("item").repartition(parts)
      .agg(HeavyHittersAggregate.heavyHitters(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact when the vocabulary fits the capacity, any partitioning") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    for (parts <- Seq(1, 3, 8)) {
      val got = sketch(scala.util.Random.shuffle(items), cap = 10, parts)
      assert(got == Map("a" -> 50L, "b" -> 30L, "c" -> 7L), s"parts=$parts")
    }
  }

  test("MG guarantee on skewed data: heavy items present, bounded undercount") {
    val rnd = new scala.util.Random(9)
    // zipf-ish: item i has frequency ~ 3000/i
    val items = (1 to 60).flatMap(i => Seq.fill(3000 / i)(s"t$i"))
    val shuffled = rnd.shuffle(items)
    val n = shuffled.size
    val cap = 20
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 5, 16)) {
      val got = sketch(shuffled, cap, parts)
      assert(got.size <= cap)
      val slack = n.toLong / (cap + 1)
      // every item above the bar survives every partitioning
      truth.filter(_._2 > slack).keys.foreach { t =>
        assert(got.contains(t), s"heavy $t missing at parts=$parts")
      }
      // estimates never overcount and undercount by at most the bar
      got.foreach { case (t, est) =>
        assert(est <= truth(t), s"$t overcounted")
        assert(est >= truth(t) - slack, s"$t undercounted past the bound")
      }
    }
  }

  test("approxTopTerms finds the corpus's true top term first") {
    val d = graft.Tables.documents(spark, sfSmoke).select("text")
    val approx = TextAnalysis.approxTopTerms(d, "text", capacity = 300)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = d.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(approx.head._1 == exact.head._1)
    // generous capacity: the top-10 sets agree and estimates are close
    val a10 = approx.take(10).map(_._1).toSet
    val e10 = exact.take(10).map(_._1).toSet
    assert(a10 == e10, s"approx=$a10 exact=$e10")
  }
}
