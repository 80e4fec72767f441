package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the deequ/Great-Expectations
  * shape): each check is a per-row predicate; the report counts
  * violations per check.
  *
  * Scale shape: ALL checks evaluate in ONE aggregate pass over the scan
  * — k conditional-sum aggregates, map-side combined — instead of one
  * scan per check (k full reads at 100 TB). The wide one-row aggregate
  * unpivots to (check, n_violations, n_rows) via a literal stack. NULL
  * predicate results count as violations (an expectation that cannot be
  * evaluated is not met). */
object Expectations {

  final case class Check(name: String, predicate: Column)

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val aggs = checks.map(c =>
      sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L))
        .as(s"_v_${c.name}")) :+ count(lit(1)).as("_n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.flatMap(c =>
      Seq(lit(c.name), coalesce(col(s"_v_${c.name}"), lit(0L))))
    wide.select(col("_n"),
        explode(map(pairs: _*)).as(Seq("check", "n_violations")))
      .select(col("check"), col("n_violations"),
        col("_n").as("n_rows"))
  }

  /** k-anonymity audit: quasi-identifier combinations shared by FEWER
    * than `k` rows — each is a re-identification risk (Sweeney 2002),
    * the privacy gate run before releasing a training corpus with
    * metadata columns.
    * Output: (quasi-identifier cols..., group_size) for violating
    * groups only. One groupBy pass; the shuffle carries (QI tuple,
    * partial count) with map-side combine. */
  def kAnonymityViolations(df: DataFrame, quasiIdCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k must be at least 2: $k")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }
}
