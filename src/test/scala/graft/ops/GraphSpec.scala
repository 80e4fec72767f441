package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  /** Driver-side reference power iteration (same dangling handling). */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(pr).sum
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / out(u) }.sum).toMap
      val base = (1.0 - d) / n + d * dangling / n
      pr = nodes.map(v => v -> (base + d * contrib.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  private val diamond: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)) // 4 is dangling

  test("matches the driver reference on a dangling diamond") {
    import spark.implicits._
    val got = Graph.pageRank(diamond.toDF("src", "dst"), "src", "dst",
        iters = 8)
      .as[(Long, Double)].collect().toMap
    val exp = refPageRank(diamond, iters = 8)
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-9, k) }
    // rank is conserved: sums to 1 with the dangling correction
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the double-cited sink outranks everything
    assert(got(4L) == got.values.max)
  }

  test("hub structure: a page cited by everyone dominates") {
    import spark.implicits._
    // pure in-star: the hub is dangling, so its mass redistributes
    // uniformly instead of funneling to a single successor
    val star = (1L to 20L).map(i => (i, 100L))
    val got = Graph.pageRank(star.toDF("src", "dst"), "src", "dst", iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(got(100L) == got.values.max)
    assert(got(100L) > 0.4) // ~14x any leaf's share (dangling mass recycles)
    val exp = refPageRank(star, iters = 10)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-9, k) }
  }

  test("duplicate and null edges are cleaned; empty graph is total") {
    import spark.implicits._
    val messy = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (1L, 2L), (null, 2L), (2L, null), (2L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRank(messy, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    val exp = refPageRank(Seq((1L, 2L), (2L, 1L)), iters = 5)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-9, k) }
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(empty, "src", "dst").count() == 0)
  }

  /** Driver HITS with the same L1 normalization. */
  private def refHits(edges: Seq[(Long, Long)],
                      iters: Int): Map[Long, (Double, Double)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0 / nodes.size).toMap
    var auth = nodes.map(_ -> 1.0 / nodes.size).toMap
    def norm(m: Map[Long, Double]): Map[Long, Double] = {
      val t = m.values.sum
      if (t == 0.0) m else m.view.mapValues(_ / t).toMap
    }
    for (_ <- 1 to iters) {
      auth = norm(nodes.map(v =>
        v -> e.filter(_._2 == v).map(x => hub(x._1)).sum).toMap)
      hub = norm(nodes.map(v =>
        v -> e.filter(_._1 == v).map(x => auth(x._2)).sum).toMap)
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  test("HITS: hub/authority structure recovered, matches driver reference") {
    import spark.implicits._
    // 1..5 are hubs all pointing at authorities 100 and 200; 6 points
    // only at 100; 7 is isolated-ish (points at 8)
    val edges = (1L to 5L).flatMap(h => Seq((h, 100L), (h, 200L))) ++
      Seq((6L, 100L), (7L, 8L))
    val got = Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters = 8)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exp = refHits(edges, 8)
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, (h, a)) =>
      assert(math.abs(h - exp(k)._1) < 1e-9, s"hub $k")
      assert(math.abs(a - exp(k)._2) < 1e-9, s"auth $k")
    }
    // 100 (cited by 6 hubs) is the top authority; 200 second; hubs 1-5
    // outrank hub 6 (they cite both authorities)
    val topAuth = got.toSeq.sortBy(-_._2._2).map(_._1)
    assert(topAuth.head == 100L && topAuth(1) == 200L)
    assert(got(1L)._1 > got(6L)._1)
    // authorities have ~zero hub score; empty graph total
    assert(got(100L)._1 == 0.0)
    assert(Graph.hits(Seq.empty[(Long, Long)].toDF("src", "dst"),
      "src", "dst").count() == 0)
  }

  test("iterative loops leave no checkpoint-block residue beyond the result") {
    import spark.implicits._
    val sc = spark.sparkContext
    def settled(): Int = {
      // let the async unpersist messages and the ContextCleaner's queue
      // drain before counting — the assertion is about what the operator
      // freed DETERMINISTICALLY, but removal RPCs are themselves async
      System.gc()
      Thread.sleep(200)
      sc.getPersistentRDDs.size
    }
    val before = settled()
    val edges = (diamond ++ Seq((4L, 5L), (5L, 1L))).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iters = 5)
    assert(pr.count() == 5)
    val hx = Graph.hits(edges, "src", "dst", iters = 3)
    assert(hx.count() == 5)
    val cc = Dedup.connectedComponents(edges, "src", "dst")
    assert(cc.count() == 5)
    val bf = Graph.bfsLevels(edges, "src", "dst",
      Seq(1L).toDF("id"), "id", maxHops = 10)
    assert(bf.count() == 5)
    // each operator may leave exactly its own (eagerly materialized)
    // result persisted; the per-round intermediates and the loop inputs
    // (edge set, node set) must have been freed by the operators
    // themselves, not the garbage collector. 5-iteration pageRank alone
    // used to leave 7 frames here.
    val residue = settled() - before
    assert(residue <= 4,
      s"iterative ops left $residue persisted RDDs (want <= 1 per operator)")
  }

  test("bfsLevels: min-hop levels on a diamond with a shortcut; cycles terminate") {
    import spark.implicits._
    // 1 -> 2 -> 4, 1 -> 3 -> 4, 1 -> 4 (shortcut), 4 -> 1 (cycle back)
    val edges = Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L), (1L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.bfsLevels(edges, "src", "dst", Seq(1L).toDF("id"), "id", 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the shortcut wins: 4 is level 1, not 2; the cycle cannot re-level 1
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1))
  }

  test("bfsLevels: maxHops truncates, unreachable nodes are absent, empty seeds are total") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val hop1 = Graph.bfsLevels(chain, "src", "dst", Seq(1L).toDF("id"), "id", 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hop1 == Map(1L -> 0, 2L -> 1))
    val full = Graph.bfsLevels(chain, "src", "dst", Seq(1L).toDF("id"), "id", 99)
      .collect().map(r => r.getLong(0)).toSet
    assert(full == Set(1L, 2L, 3L, 4L)) // 10, 11 unreachable
    assert(Graph.bfsLevels(chain, "src", "dst",
      Seq.empty[Long].toDF("id"), "id", 5).count() == 0)
  }

  test("converges: successive-round L1 delta shrinks") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
    def l1(a: Map[Long, Double], b: Map[Long, Double]): Double =
      a.keys.map(k => math.abs(a(k) - b(k))).sum
    val r4 = refPageRank(edges, 4); val r5 = refPageRank(edges, 5)
    val r9 = refPageRank(edges, 9); val r10 = refPageRank(edges, 10)
    assert(l1(r9, r10) < l1(r4, r5))
    // and the distributed result tracks the reference at 10 rounds
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 10)
      .as[(Long, Double)].collect().toMap
    got.foreach { case (k, v) => assert(math.abs(v - r10(k)) < 1e-9, k) }
  }
}
