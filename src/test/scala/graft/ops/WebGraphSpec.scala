package graft.ops

import graft.SparkSpec
import graft.queries.OpsQueries

/** t48's planted structure, asserted directly (the oracle hash-grades
  * the values; this pins the RANKING semantics the construction is
  * about): a 6-domain link farm whose pages donate their full share
  * (outdeg 1) inflates boost.net above every organic domain, while the
  * organically-cited hub stays #1.
  */
class WebGraphSpec extends SparkSpec {

  test("web-graph pageRank: hub #1, link farm lifts boost.net to #2") {
    val rows = OpsQueries.queries("t48_web_graph")(spark, sfSmoke).collect()
    // sf0.001 covers every residue: 20 organic + 6 farm + hub + boost
    assert(rows.length == 28)
    val byId = rows.map { r =>
      r.getString(0) -> ((r.getDouble(1), r.getAs[Number](2).longValue))
    }.toMap
    val (hubRank, hubPos) = byId("hub.org")
    val (boostRank, boostPos) = byId("boost.net")
    assert(hubPos == 1L)
    assert(boostPos == 2L)
    assert(hubRank > boostRank)
    // the farm effect: 6 dedicated in-links beat 20 ring domains that
    // each ALSO receive an organic in-link
    val dRanks = byId.collect { case (id, (r, _)) if id.startsWith("d") => r }
    val fRanks = byId.collect { case (id, (r, _)) if id.startsWith("f") => r }
    assert(dRanks.size == 20 && fRanks.size == 6)
    assert(dRanks.forall(boostRank > _))
    // ring symmetry: every organic domain has the SAME rank (the
    // FP-order-safety argument in the registration rests on this);
    // farm domains likewise, and they rank below organics (no in-links)
    assert(dRanks.toSet.size == 1)
    assert(fRanks.toSet.size == 1)
    assert(fRanks.head < dRanks.head)
  }
}
