package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equivalence of the chunked (skew-hardened) window operators against
  * the plain per-key window formulations, across chunk widths — the
  * AsOfSpec pattern. */
class ChunkedWindowsSpec extends SparkSpec {
  import spark.implicits._

  // randomized events with a HOT key (60% of rows on one user), duplicate
  // timestamps (tie-break coverage), and multi-chunk time spread
  private lazy val events: DataFrame = {
    val rnd = new scala.util.Random(31)
    (1L to 3000L).map { i =>
      val user = if (rnd.nextInt(10) < 6) "hot" else s"u${rnd.nextInt(20)}"
      val ts = rnd.nextInt(500).toLong * 37L // duplicates guaranteed
      (i, user, ts, s"t${rnd.nextInt(4)}", rnd.nextDouble())
    }.toDF("event_id", "user_id", "ts_us", "event_type", "value")
  }

  private def plainSessions(gap: Long): Seq[(Long, String, Long)] = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gap, 1L)
          .when(lag(col("ts_us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .select(col("event_id"), col("user_id"), col("session_id"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("sessionizeChunked equals the plain formulation across chunk widths") {
    val gap = 200L
    val want = plainSessions(gap)
    for (width <- Seq(1L, 37L, 100L, 1000L, 100000L)) {
      val got = ChunkedWindows.sessionizeChunked(events, "user_id", "ts_us",
          "event_id", gap = gap, chunkWidth = width)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"chunk width $width diverges from plain sessionize")
    }
  }

  test("leadLagChunked equals plain lag/lead across chunk widths") {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val want = events
      .select(col("event_id"),
        lag(col("value"), 1).over(w).as("pv"),
        lead(col("event_type"), 1).over(w).as("nt"),
        lag(col("ts_us"), 1).over(w).as("pt"))
      .as[(Long, Option[Double], Option[String], Option[Long])]
      .collect().sortBy(_._1).toSeq
    for (width <- Seq(1L, 37L, 500L, 100000L)) {
      val got = ChunkedWindows.leadLagChunked(events, "user_id", "ts_us",
          "event_id", lagCols = Seq("value", "ts_us"),
          leadCols = Seq("event_type"), chunkWidth = width)
        .select(col("event_id"), col("lag1_value").as("pv"),
          col("lead1_event_type").as("nt"), col("lag1_ts_us").as("pt"))
        .as[(Long, Option[Double], Option[String], Option[Long])]
        .collect().sortBy(_._1).toSeq
      assert(got == want, s"chunk width $width diverges from plain lag/lead")
    }
  }

  test("chunked windows never partition by the bare key (skew pin)") {
    // plan pin: every window partition spec must include the chunk column
    // (within-chunk) or run over the summary frame (axis) — the raw
    // stream is never sorted per bare key
    val plan = ChunkedWindows.sessionizeChunked(events, "user_id", "ts_us",
      "event_id", gap = 200L, chunkWidth = 100L)
      .queryExecution.optimizedPlan.toString
    // windowspecdefinition(partCols..., orderCols..., frame): the prefix
    // before the frame carries partition + order columns
    val specs = """windowspecdefinition\([^)]*""".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty, s"no window specs found:\n$plan")
    // raw-stream windows (ordered by _ts) must be chunk-partitioned; the
    // only per-bare-key windows allowed are the tiny chunk-AXIS ones
    // (ordered by _ck over one summary row per chunk)
    specs.filter(_.contains("_ts")).foreach { spec =>
      assert(spec.contains("_ck"), s"raw-stream window lacks chunking: $spec")
    }
  }

  test("single-row, single-user, and empty inputs are total") {
    val empty = events.limit(0)
    assert(ChunkedWindows.sessionizeChunked(empty, "user_id", "ts_us",
      "event_id", 10L, 10L).count() == 0)
    assert(ChunkedWindows.leadLagChunked(empty, "user_id", "ts_us",
      "event_id", Seq("value"), Seq("event_type"), 10L).count() == 0)
    val one = Seq((1L, "u", 5L, "t", 1.0))
      .toDF("event_id", "user_id", "ts_us", "event_type", "value")
    val s = ChunkedWindows.sessionizeChunked(one, "user_id", "ts_us",
      "event_id", 10L, 10L).as[(Long, String, Long)].collect()
    assert(s.toSeq == Seq((1L, "u", 1L)))
    val ll = ChunkedWindows.leadLagChunked(one, "user_id", "ts_us",
      "event_id", Seq("value"), Seq("event_type"), 10L)
      .select("lag1_value", "lead1_event_type").collect()(0)
    assert(ll.isNullAt(0) && ll.isNullAt(1))
  }

  test("reserved working columns are rejected loudly, not silently corrupted") {
    for (bad <- Seq("_nfirst", "_ts", "_ck", "_plast")) {
      val tainted = events.withColumn(bad, lit(1))
      val e1 = intercept[IllegalArgumentException](
        ChunkedWindows.sessionizeChunked(tainted, "user_id", "ts_us",
          "event_id", 200L, 100L))
      assert(e1.getMessage.contains(bad), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](
        ChunkedWindows.leadLagChunked(tainted, "user_id", "ts_us",
          "event_id", Seq("value"), Seq("event_type"), 100L))
      assert(e2.getMessage.contains(bad), e2.getMessage)
    }
  }
}
