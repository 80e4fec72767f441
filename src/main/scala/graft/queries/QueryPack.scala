package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Contract (see SparkEntry): `queries` maps name -> (spark, sfDir) -> result;
  * `oracleSql` gives DuckDB-equivalent ANSI SQL over the same parquet files
  * for every SQL-expressible query (driver hash-compares values after sorting
  * columns by name). Queries without an oracle get a weaker rows-only check.
  *
  * Determinism rules for oracle queries:
  *  - every output column explicitly aliased, names identical on both sides;
  *  - total ordering (ORDER BY including a unique key) on both sides;
  *  - no raw floating-point aggregation: money columns are cast to
  *    decimal(18,2) before SUM (exact in both engines), then rounded and cast
  *    back to double so both engines emit bit-identical values;
  *  - no AVG over doubles (engines may differ in the last ulp of the division).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
