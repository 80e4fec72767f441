package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, Option("a"), Option(10.0)),
    (2L, Option("b"), Option(20.0)),
    (3L, Option("c"), Option(30.0)),
    (4L, Option.empty[String], Option(40.0)))
    .toDF("k", "name", "v")

  test("merge: insert / update / keep / no-op-keep in one pass") {
    val updates = Seq(
      (2L, Option("b2"), Option(21.0)), // changed -> update
      (3L, Option("c"), Option(30.0)),  // identical -> keep (no-op)
      (9L, Option("i"), Option(90.0)))  // new -> insert
      .toDF("k", "name", "v")
    val got = Upsert.merge(base, updates, Seq("k"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0, "keep"),
      (2L, "b2", 21.0, "update"),
      (3L, "c", 30.0, "keep"),
      (4L, null, 40.0, "keep"),
      (9L, "i", 90.0, "insert")))
  }

  test("merge: an update that sets a column to NULL wins (no coalesce resurrection)") {
    val updates = Seq((1L, Option.empty[String], Option(10.0)))
      .toDF("k", "name", "v")
    val row = Upsert.merge(base, updates, Seq("k"))
      .filter(col("k") === 1L).head()
    assert(row.isNullAt(1), "update's NULL must replace the base value")
    assert(row.getString(3) == "update")
    // and null-safe comparison: NULL == NULL on both sides is a no-op
    val noop = Seq((4L, Option.empty[String], Option(40.0)))
      .toDF("k", "name", "v")
    assert(Upsert.merge(base, noop, Seq("k"))
      .filter(col("k") === 4L).head().getString(3) == "keep")
  }

  test("merge: validateUniqueKeys raises on duplicate update keys") {
    val dup = Seq((2L, Option("x"), Option(1.0)), (2L, Option("y"), Option(2.0)))
      .toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(base, dup, Seq("k"), validateUniqueKeys = true)
    }
    assert(e.getMessage.contains("duplicate"))
    // schema mismatch and action-column clash fail loudly
    intercept[IllegalArgumentException] {
      Upsert.merge(base, base.withColumnRenamed("v", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Upsert.merge(base.withColumn("action", lit(1)),
        base.withColumn("action", lit(1)), Seq("k"))
    }
  }

  test("merge plans one full-outer join: base appears once, no window") {
    val updates = base.limit(2)
    val plan = Upsert.merge(base, updates, Seq("k"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
  }
}
