package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def lefts = Seq(
    // (lid, key, t)
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
    (4L, "b", 100L), (5L, "c", 100L)).toDF("lid", "key", "lt")

  private def rights = Seq(
    // (rid, key, t, v)
    (10L, "a", 100L, 1.0),  // equal time: matches lid=1 (<=)
    (11L, "a", 150L, 2.0),
    (12L, "a", 150L, 3.0),  // tie at t=150: larger rid wins
    (13L, "b", 101L, 4.0)   // after the only b click: no match
  ).toDF("rid", "key", "rt", "v")

  test("asofBackward: latest preceding right, ties by tie column, null when none") {
    val got = AsOf.asofBackward(lefts, rights, Seq("key"), "lt", "rt", "rid",
        payload = Seq("rid", "v"), prefix = "m_")
      .orderBy("lid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, 1.0),   // rt=100 <= lt=100 counts
      (2L, 12L, 3.0),   // t=150 tie -> rid 12
      (3L, null, null), // nothing at or before 50
      (4L, null, null), // only b-right is later
      (5L, null, null)  // key with no rights at all
    ))
  }

  test("asofBackward emits exactly one row per left row") {
    val got = AsOf.asofBackward(lefts, rights, Seq("key"), "lt", "rt", "rid",
      payload = Seq("v"))
    assert(got.count() == 5)
    assert(got.columns.toSeq == Seq("lid", "key", "lt", "asof_v"))
  }

  test("bandJoin equals the naive inequality join on random data") {
    val rnd = new scala.util.Random(11)
    val l = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextLong(10000))).toDF("lid", "key", "lt")
    val r = (1 to 300).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(5)}", rnd.nextLong(10000), rnd.nextDouble()))
      .toDF("rid", "key", "rt", "v")
    for ((lo, hi) <- Seq((-500L, 0L), (-250L, 250L), (0L, 0L), (7L, 13L))) {
      val got = AsOf.bandJoin(l, r, Seq("key"), "lt", "rt", lo, hi,
          payload = Seq("rid"), prefix = "b_")
        .select("lid", "b_rid").as[(Long, Long)].collect().toSet
      val want = l.join(r, Seq("key"))
        .filter(col("rt").between(col("lt") + lo, col("lt") + hi))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got == want, s"band [$lo,$hi]: ${got.size} vs ${want.size}")
    }
  }

  test("bandJoin handles negative times (floor bucketing, not truncation)") {
    val l = Seq((1L, "k", -5L), (2L, "k", 3L)).toDF("lid", "key", "lt")
    val r = Seq((10L, "k", -8L), (11L, "k", -1L), (12L, "k", 2L)).toDF("rid", "key", "rt")
    val got = AsOf.bandJoin(l, r, Seq("key"), "lt", "rt", -4L, 0L,
        payload = Seq("rid"), prefix = "b_")
      .select("lid", "b_rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L), (2L, 12L)))
  }

  test("asofForward: earliest at-or-after right, smallest tie, null when none") {
    val got = AsOf.asofForward(lefts, rights, Seq("key"), "lt", "rt", "rid",
        payload = Seq("rid", "v"), prefix = "m_")
      .orderBy("lid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, 1.0),   // rt=100 >= lt=100 counts (equal time)
      (2L, null, null), // nothing at or after 200
      (3L, 10L, 1.0),   // earliest a-right after 50 is t=100
      (4L, 13L, 4.0),   // b-right at 101 >= 100
      (5L, null, null)  // key with no rights
    ))
    // tie at equal time: SMALLEST rid wins going forward
    val tied = AsOf.asofForward(
      Seq((1L, "a", 120L)).toDF("lid", "key", "lt"),
      rights, Seq("key"), "lt", "rt", "rid", payload = Seq("rid"))
      .collect()(0).getLong(3)
    assert(tied == 11L)
  }

  test("as-of joins match a brute-force reference under heavy time collisions") {
    import spark.implicits._
    // times drawn from a tiny range: many exact collisions, so the
    // (time, tie) ordering contract is what decides most matches
    val rnd = new scala.util.Random(31)
    val lrows = (1 to 300).map(i => (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextLong(20)))
    val rrows = (1 to 300).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(3)}", rnd.nextLong(20), rnd.nextDouble()))
    val l = lrows.toDF("lid", "key", "lt")
    val r = rrows.toDF("rid", "key", "rt", "v")

    def reference(forward: Boolean): Map[Long, Long] = lrows.map { case (lid, k, lt) =>
      val cands = rrows.filter { case (_, rk, rt, _) =>
        rk == k && (if (forward) rt >= lt else rt <= lt) }
      val best =
        if (cands.isEmpty) -1L
        else if (forward) cands.minBy(c => (c._3, c._1))._1
        else cands.maxBy(c => (c._3, c._1))._1
      lid -> best
    }.toMap

    for (forward <- Seq(false, true)) {
      val got = (if (forward)
          AsOf.asofForward(l, r, Seq("key"), "lt", "rt", "rid", Seq("rid"))
        else
          AsOf.asofBackward(l, r, Seq("key"), "lt", "rt", "rid", Seq("rid")))
        .select("lid", "asof_rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      assert(got == reference(forward), s"forward=$forward diverges from brute force")
    }
  }

  test("chunked as-of equals the plain as-of for every chunk width") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val l = (1 to 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextLong(5000))).toDF("lid", "key", "lt")
    val r = (1 to 400).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(4)}", rnd.nextLong(5000), rnd.nextDouble()))
      .toDF("rid", "key", "rt", "v")
    val want = AsOf.asofBackward(l, r, Seq("key"), "lt", "rt", "rid",
        payload = Seq("rid", "v"))
      .select("lid", "asof_rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    for (width <- Seq(1L, 7L, 100L, 5000L, 1000000L)) {
      val got = AsOf.asofBackwardChunked(l, r, Seq("key"), "lt", "rt", "rid",
          payload = Seq("rid", "v"), chunkWidth = width)
        .select("lid", "asof_rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      assert(got == want, s"chunk width $width diverges: " +
        s"${(got -- want).take(5)} extra, ${(want -- got).take(5)} missing")
    }
  }

  test("chunked forward as-of equals the plain forward as-of for every chunk width") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // negative times included: the negation trick must survive floorDiv
    val l = (1 to 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextLong(5000) - 2500L)).toDF("lid", "key", "lt")
    val r = (1 to 400).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(4)}", rnd.nextLong(5000) - 2500L, rnd.nextDouble()))
      .toDF("rid", "key", "rt", "v")
    val want = AsOf.asofForward(l, r, Seq("key"), "lt", "rt", "rid",
        payload = Seq("rid", "v"))
      .select("lid", "asof_rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    for (width <- Seq(1L, 7L, 100L, 5000L, 1000000L)) {
      val got = AsOf.asofForwardChunked(l, r, Seq("key"), "lt", "rt", "rid",
          payload = Seq("rid", "v"), chunkWidth = width)
        .select("lid", "asof_rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      assert(got == want, s"forward chunk width $width diverges: " +
        s"${(got -- want).take(5)} extra, ${(want -- got).take(5)} missing")
    }
    // output columns match the plain forward join (working column dropped)
    val cols = AsOf.asofForwardChunked(l, r, Seq("key"), "lt", "rt", "rid",
      payload = Seq("v"), chunkWidth = 100L).columns.toSeq
    assert(cols == Seq("lid", "key", "lt", "asof_v"), cols.toString)
  }

  test("chunked as-of: equal-time tie within chunk and exactly-at-boundary rights") {
    import spark.implicits._
    val l = Seq((1L, "k", 10L), (2L, "k", 20L)).toDF("lid", "key", "lt")
    val r = Seq(
      (10L, "k", 10L, 1.0),  // equal time to lid=1, chunk boundary at width 10
      (11L, "k", 19L, 2.0),
      (12L, "k", 19L, 3.0)   // tie -> rid 12
    ).toDF("rid", "key", "rt", "v")
    val got = AsOf.asofBackwardChunked(l, r, Seq("key"), "lt", "rt", "rid",
        payload = Seq("rid"), chunkWidth = 10L)
      .orderBy("lid").select("lid", "asof_rid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 12L)))
  }

  test("timestamp columns keep sub-second precision (µs, not a seconds cast)") {
    import spark.implicits._
    // right row 850ms AFTER the left row, same wall-clock second: a
    // seconds-truncating cast would make it "preceding" and match
    val l = Seq((1L, "k", "2024-01-01 10:00:01.100"))
      .toDF("lid", "key", "ts").selectExpr("lid", "key", "CAST(ts AS TIMESTAMP) AS lt")
    val r = Seq(
      (10L, "k", "2024-01-01 10:00:01.950", 1.0),
      (11L, "k", "2024-01-01 10:00:00.900", 2.0))
      .toDF("rid", "key", "ts", "v")
      .selectExpr("rid", "key", "CAST(ts AS TIMESTAMP) AS rt", "v")
    val got = AsOf.asofBackward(l, r, Seq("key"), "lt", "rt", "rid",
      payload = Seq("rid"))
    assert(got.collect()(0).getLong(3) == 11L,
      "backward as-of matched a right row from the future")
    val fwd = AsOf.asofForward(l, r, Seq("key"), "lt", "rt", "rid",
      payload = Seq("rid"))
    assert(fwd.collect()(0).getLong(3) == 10L)
    val band = AsOf.bandJoin(l, r, Seq("key"), "lt", "rt",
      lower = -500000L, upper = 0L, payload = Seq("rid")) // preceding 500ms
    assert(band.select("band_rid").as[Long].collect().toSeq == Seq(11L))
    // dates must be converted by the caller, not silently second-cast
    val dl = l.selectExpr("lid", "key", "CAST(lt AS DATE) AS lt")
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(dl, r, Seq("key"), "lt", "rt", "rid", payload = Seq("rid"))
    }
  }

  test("reserved working-column names are rejected, not silently overwritten") {
    import spark.implicits._
    val l = Seq((1L, "k", 10L, 99L)).toDF("lid", "key", "lt", "_t")
    val r = Seq((10L, "k", 5L, 1.0)).toDF("rid", "key", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(l, r, Seq("key"), "lt", "rt", "rid", payload = Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofBackwardChunked(l, r, Seq("key"), "lt", "rt", "rid",
        payload = Seq("v"), chunkWidth = 10L)
    }
    intercept[IllegalArgumentException] {
      AsOf.bandJoin(l, r, Seq("key"), "lt", "rt", -10L, 0L, payload = Seq("v"))
    }
    val rBad = Seq((10L, "k", 5L, 1.0)).toDF("rid", "key", "rt", "_pay")
    val lOk = Seq((1L, "k", 10L)).toDF("lid", "key", "lt")
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(lOk, rBad, Seq("key"), "lt", "rt", "rid",
        payload = Seq("_pay"))
    }
  }

  test("chunked as-of accepts unorderable (map) payloads like the plain path") {
    import spark.implicits._
    val l = Seq((1L, "k", 25L), (2L, "k", 5L)).toDF("lid", "key", "lt")
    val r = Seq((10L, "k", 10L, Map("a" -> 1)), (11L, "k", 20L, Map("b" -> 2)))
      .toDF("rid", "key", "rt", "m")
    // max(struct(..., map)) would throw AnalysisException; max_by must not
    val got = AsOf.asofBackwardChunked(l, r, Seq("key"), "lt", "rt", "rid",
        payload = Seq("rid", "m"), chunkWidth = 7L)
      .orderBy("lid")
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, Some(11L)), (2L, None)))
  }

  test("asof plans one exchange; band join plans a shuffled equi-join") {
    val asofPlan = AsOf.asofBackward(lefts, rights, Seq("key"), "lt", "rt", "rid",
      payload = Seq("v")).queryExecution.executedPlan.toString
    assert(!asofPlan.contains("Join"), s"asof must not join:\n$asofPlan")
    val bandPlan = AsOf.bandJoin(lefts, rights, Seq("key"), "lt", "rt", -10L, 0L,
      payload = Seq("v")).queryExecution.executedPlan.toString
    assert(!bandPlan.contains("BroadcastNestedLoopJoin") &&
      !bandPlan.contains("CartesianProduct"),
      s"band join must stay an equi-join:\n$bandPlan")
  }
}
