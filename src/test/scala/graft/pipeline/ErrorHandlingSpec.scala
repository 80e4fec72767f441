package graft.pipeline

import graft.SparkSpec
import graft.marc._
import org.apache.spark.sql.functions._

class ErrorHandlingSpec extends SparkSpec {
  import ErrorHandling._

  private def frame = MarcSource.fromRecords(spark, Seq(
    MarcRecord("ok", Vector(MarcField.control("001", "good1"))),
    MarcRecord("boom", Vector(MarcField.control("001", "bad"))),
    MarcRecord("ok", Vector(MarcField.control("001", "good2")))))

  private val explosive = safeRecordFn("explode_step") { rec =>
    if (rec.leader == "boom") throw new IllegalStateException("kaboom")
    else Vector(rec.fields.head.value)
  }

  test("step errors are captured, not fatal; dead letters route; successes clean") {
    val step = explosive(col("record"))
    val out = frame.select(
      values(step).as("id"),
      errorsColumn(Seq(error(step))).as("_errors"))
    val dead = deadLetters(out).collect()
    assert(dead.length == 1)
    assert(dead.head.getSeq[String](1).head == "explode_step: kaboom")
    val ok = successes(out).collect().map(_.getSeq[String](0).head).sorted
    assert(ok.toSeq == Seq("good1", "good2"))
  }

  test("enforceMaxErrors aborts past threshold and passes under it") {
    val step = explosive(col("record"))
    val out = frame.select(values(step).as("id"),
      errorsColumn(Seq(error(step))).as("_errors"))
    val (clean, n) = enforceMaxErrors(out, maxErrors = 1)
    assert(n == 1 && clean.count() == 2)
    intercept[MaxErrorsExceeded] { enforceMaxErrors(out, maxErrors = 0) }
  }
}
