package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.marc.MarcRecord

/** Pipeline settings mirroring the reference's output-control knobs
  * (/root/reference/lib/traject/indexer.rb:282-298 defaults;
  * doc/settings.md). */
final case class PipelineSettings(
    allowNilValues: Boolean = false,
    allowDuplicateValues: Boolean = true,
    allowEmptyFields: Boolean = false)

/** Declarative indexing pipeline — the Spark-native `to_field` /
  * `each_record` DSL (SURVEY.md §2.6).
  *
  * Semantics preserved from the reference
  * (/root/reference/lib/traject/indexer.rb:343-361,464-480;
  * lib/traject/indexer/step.rb:95-163; lib/traject/indexer/context.rb:117-129):
  *  - rules evaluate in declaration order;
  *  - a field name declared twice appends values in declaration order;
  *  - one rule may target multiple field names;
  *  - `skip` rows are excluded from output (steps are pure Columns, so
  *    post-filter ≡ the reference's step short-circuit);
  *  - output normalization per PipelineSettings (compact nils, optional
  *    dedup, empty → NULL i.e. omitted-from-JSON).
  *
  * Compiles to ONE `select` over the input — a narrow map stage with no
  * shuffle, which is exactly the reference's record-at-a-time pipeline shape
  * and scales embarrassingly at 100 TB.
  */
final class Pipeline private (
    steps: Vector[Pipeline.Step],
    settings: PipelineSettings,
    skipConds: Vector[Column => Column]) {
  import Pipeline._

  def settings(s: PipelineSettings): Pipeline = new Pipeline(steps, s, skipConds)

  /** to_field: extractor yields array<string> from the record column, then
    * transforms apply in order. */
  def toField(name: String, extract: Column => Column, transforms: (Column => Column)*): Pipeline =
    toFields(Seq(name), extract, transforms: _*)

  /** to_field with multiple target names (step.rb:156-162). */
  def toFields(names: Seq[String], extract: Column => Column,
               transforms: (Column => Column)*): Pipeline =
    new Pipeline(steps :+ FieldStep(names, rec => Transforms.chain(transforms: _*)(extract(rec))),
      settings, skipConds)

  /** each_record analog for side computations: named intermediate columns
    * (the "clipboard") usable by later rules via `col(name)`. */
  def eachRecord(name: String, value: Column => Column): Pipeline =
    new Pipeline(steps :+ ClipboardStep(name, value), settings, skipConds)

  /** skip! — rows matching the condition are dropped before the sink. */
  def skipWhen(cond: Column => Column): Pipeline =
    new Pipeline(steps, settings, skipConds :+ cond)

  /** Compile against a DataFrame bearing `recordCol` (struct) — returns the
    * output document frame: one array<string> column per declared field,
    * plus any `keep` passthrough columns (ids, provenance). */
  def compile(df: DataFrame, recordCol: String = "record",
              keep: Seq[String] = Nil): DataFrame = {
    val rec = col(recordCol)

    // clipboard columns first (each_record declaration order)
    val withClipboard = steps.foldLeft(df) {
      case (acc, ClipboardStep(name, value)) => acc.withColumn(name, value(col(recordCol)))
      case (acc, _) => acc
    }

    // repeated field names append in declaration order (context.rb:122-125)
    val fieldSteps = steps.collect { case f: FieldStep => f }
    val byName = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    for (step <- fieldSteps; name <- step.names) {
      val expr = step.expr(rec)
      byName(name) = byName.get(name) match {
        case Some(prev) => concat(prev, expr)
        case None       => expr
      }
    }

    val norm = Transforms.normalizeOutput(
      settings.allowNilValues, settings.allowDuplicateValues, settings.allowEmptyFields)
    val outCols = keep.map(col) ++ byName.map { case (name, expr) => norm(expr).as(name) }.toSeq

    withClipboard.select(outCols: _*)
  }

  /** Compile with skip semantics: filter on the input frame, then project. */
  def run(df: DataFrame, recordCol: String = "record",
          keep: Seq[String] = Nil): DataFrame = {
    val rec = col(recordCol)
    val filtered = skipConds.foldLeft(df)((acc, cond) => acc.filter(!coalesce(cond(rec), lit(false))))
    compile(filtered, recordCol, keep)
  }

  /** map_record golden-test entry point (indexer.rb:429-433): one record
    * through the full pipeline; None when skipped. Empty fields are omitted
    * (NULL columns dropped) matching output_hash semantics. */
  def mapRecord(spark: SparkSession, record: MarcRecord): Option[Map[String, Seq[String]]] = {
    val df = graft.marc.MarcSource.fromRecords(spark, Seq(record))
    val out = run(df)
    out.collect().headOption.map { row =>
      out.schema.fieldNames.iterator.zipWithIndex.flatMap { case (name, i) =>
        if (row.isNullAt(i)) None else Some(name -> row.getSeq[String](i))
      }.toMap
    }
  }
}

object Pipeline {
  sealed trait Step
  final case class FieldStep(names: Seq[String], expr: Column => Column) extends Step
  final case class ClipboardStep(name: String, value: Column => Column) extends Step

  def builder: Pipeline = new Pipeline(Vector.empty, PipelineSettings(), Vector.empty)
}
