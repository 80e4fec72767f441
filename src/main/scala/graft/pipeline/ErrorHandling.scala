package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.marc.MarcRecord
import graft.marc.MarcFunctions.marcRecordEncoder

/** Per-record error policy — the Spark analog of the reference's
  * `mapping_rescue` (/root/reference/lib/traject/indexer.rb:483-517 and
  * doc/settings.md:35-58): a step error is captured with its step name
  * instead of aborting the task; errored records route to a dead-letter
  * frame, and an abort threshold mirrors `max_skipped`-style policy.
  *
  * At scale this is the difference between one poison record killing a
  * 1000-executor job and a bounded dead-letter sample to inspect offline.
  */
object ErrorHandling {

  final case class StepResult(values: Seq[String], error: String)

  /** Wrap a record-level step: failures become (empty values, "step: msg")
    * instead of task failures. */
  def safeRecordFn(stepName: String)(f: MarcRecord => Seq[String]): Column => Column = {
    val u = udf((rec: MarcRecord) =>
      if (rec == null) StepResult(Nil, null)
      else try StepResult(f(rec), null)
      catch { case e: Exception => StepResult(Nil, s"$stepName: ${e.getMessage}") })
    rec => u(rec)
  }

  /** Split a safe-step result into its value column. */
  def values(step: Column): Column = step.getField("values")
  def error(step: Column): Column = step.getField("error")

  /** Collect per-step error columns into one `_errors` array column. */
  def errorsColumn(stepErrors: Seq[Column]): Column =
    filter(array(stepErrors: _*), e => e.isNotNull)

  /** Dead-letter routing: rows with at least one step error. */
  def deadLetters(df: DataFrame, errorsCol: String = "_errors"): DataFrame =
    df.filter(size(col(errorsCol)) > 0)

  def successes(df: DataFrame, errorsCol: String = "_errors"): DataFrame =
    df.filter(size(col(errorsCol)) === 0).drop(errorsCol)

  class MaxErrorsExceeded(val errors: Long, val max: Long)
    extends RuntimeException(s"too many errored records: $errors > $max")

  /** max_skipped-style abort: count errored rows; throw past the threshold.
    * Returns (clean frame, error count). */
  def enforceMaxErrors(df: DataFrame, maxErrors: Long,
                       errorsCol: String = "_errors"): (DataFrame, Long) = {
    val bad = deadLetters(df, errorsCol).count()
    if (bad > maxErrors) throw new MaxErrorsExceeded(bad, maxErrors)
    (successes(df, errorsCol), bad)
  }
}
