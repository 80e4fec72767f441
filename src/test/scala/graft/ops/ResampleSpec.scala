package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("resampleLocf: grid spans first..last bucket, gaps carry forward, counts zero") {
    // key 1: buckets 0 and 30 occupied, 10 and 20 empty (step 10)
    // key 2: single bucket — no gaps
    val ev = Seq(
      (1L, 3L, 10.0), (1L, 7L, 5.0), (1L, 35L, 2.5),
      (2L, 12L, 7.0)).toDF("k", "ts_us", "value")
    val got = Resample.resampleLocf(ev, "k", "ts_us", col("value"), stepUs = 10L)
      .orderBy("k", "bucket_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, 15.0, 0),   // two events summed
      (1L, 10L, 0L, 15.0, 1),  // carried
      (1L, 20L, 0L, 15.0, 1),  // carried
      (1L, 30L, 1L, 2.5, 0),
      (2L, 10L, 1L, 7.0, 0)))
  }

  test("resampleLocf: oversized span fails loudly, never materializes the grid") {
    val ev = Seq((1L, 0L, 1.0), (1L, 1000000L, 1.0)).toDF("k", "ts_us", "value")
    val e = intercept[Exception] {
      Resample.resampleLocf(ev, "k", "ts_us", col("value"),
        stepUs = 1L, maxGridPerKey = 1000).collect()
    }
    assert(e.getMessage != null && (e.getMessage.contains("spans more than") ||
      e.getCause != null && e.getCause.getMessage.contains("spans more than")),
      s"expected the loud span guard, got: ${e.getMessage}")
  }

  test("resampleLocf: empty input is total") {
    val ev = Seq.empty[(Long, Long, Double)].toDF("k", "ts_us", "value")
    assert(Resample.resampleLocf(ev, "k", "ts_us", col("value"), 10L).count() == 0)
  }
}
