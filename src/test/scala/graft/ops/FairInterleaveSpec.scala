package graft.ops

import graft.SparkSpec
import graft.queries.OpsQueries

/** t51's politeness property, asserted directly: the global order is a
  * round-robin by domain — every domain's k-th URL lands after every
  * domain's (k-1)-th — so the 60%-skewed domain cannot monopolize the
  * queue head, and within a domain higher scores fetch first.
  */
class FairInterleaveSpec extends SparkSpec {

  test("fair interleave: round-robin by domain, priority within domain") {
    val rows = OpsQueries.queries("t51_frontier")(spark, sfSmoke)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Number](3).longValue))
      .sortBy(_._4)
    assert(rows.length >= 40)
    // every domain appears at the queue head before ANY second fetch
    val nDomains = rows.map(_._2).distinct.length
    assert(nDomains == 4)
    assert(rows.take(nDomains).map(_._2).distinct.length == nDomains,
      s"head must serve each domain once: ${rows.take(nDomains).map(_._2).toSeq}")
    // recompute each row's within-domain sequence from the output order;
    // the sequence must be globally non-decreasing (the round-robin law)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    var prevSeq = 0
    rows.foreach { case (_, dom, _, _) =>
      val k = seen.getOrElse(dom, 0) + 1
      seen(dom) = k
      assert(k >= prevSeq, s"domain $dom's fetch #$k scheduled before an " +
        s"earlier round finished (prev round $prevSeq)")
      prevSeq = k
    }
    // priority within a domain: scores non-increasing per domain
    rows.groupBy(_._2).foreach { case (dom, rs) =>
      val scores = rs.sortBy(_._4).map(_._3)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$dom not priority-ordered")
    }
    // the skewed domain holds 60% of the tail but only 1/4 of the head
    val bigInHead = rows.take(nDomains * 4).count(_._2 == "big.com")
    assert(bigInHead == 4, s"big.com must get exactly 1 slot per round " +
      s"in the first 4 rounds, got $bigInHead")
  }
}
