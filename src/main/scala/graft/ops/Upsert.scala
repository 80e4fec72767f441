package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE-style upsert — the everyday warehouse refresh shape
  * ("apply today's changes to the dimension table"): base rows absent
  * from the updates pass through, matched rows with ANY differing data
  * column take the update's values, matched-but-identical rows are
  * detected as no-ops (so downstream CDC/audit sees `keep`, not a fake
  * rewrite), and unmatched update rows insert.
  *
  * Scale shape: ONE full-outer equi-join on the key columns — the base
  * scans once and shuffles once on the key (or streams against a
  * broadcast when the increment is small, AQE's call); change detection
  * is a null-safe per-column comparison inside the join's projection,
  * no second pass, no window. Contrast the naive 3-join form (changed ⋈
  * + insert anti + keep anti), which scans the base twice more.
  *
  * Contract: `base` and `updates` share a schema; keys are unique per
  * side (MERGE semantics — a duplicate update key would make the result
  * order-dependent; enable `validateUniqueKeys` to fail loudly at the
  * cost of one aggregate over the increment). */
object Upsert {

  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String],
            actionCol: String = "action",
            validateUniqueKeys: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schema mismatch: base ${base.columns.toSeq} vs " +
        s"updates ${updates.columns.toSeq}")
    require(!base.columns.contains(actionCol),
      s"column '$actionCol' already exists; pass a different actionCol")
    val dataCols = base.columns.filterNot(keys.contains).toSeq
    if (validateUniqueKeys) {
      val dups = updates.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).count()
      require(dups == 0L, s"updates carry $dups duplicate key groups")
    }
    val b = base.select(base.columns.map(c => col(c).as(s"_b_$c")).toSeq: _*)
    val u = updates.select(
      updates.columns.map(c => col(c).as(s"_u_$c")).toSeq: _*)
    val cond = keys.map(k => col(s"_b_$k") === col(s"_u_$k"))
      .reduce(_ && _)
    val joined = b.join(u, cond, "full_outer")
    // null-safe (<=>): a NULL data value equal on both sides is a no-op,
    // not a change — the CDC convention
    val unchanged =
      if (dataCols.isEmpty) lit(true)
      else dataCols.map(c => col(s"_u_$c") <=> col(s"_b_$c")).reduce(_ && _)
    val action = when(keys.map(k => col(s"_b_$k").isNull).reduce(_ && _),
        lit("insert"))
      .when(keys.map(k => col(s"_u_$k").isNull).reduce(_ && _), lit("keep"))
      .when(unchanged, lit("keep"))
      .otherwise(lit("update"))
    // row provenance, not per-column coalesce: an update row wins WHOLLY
    // when present (a genuine update may set a column to NULL — coalesce
    // would silently resurrect the base value); base rows win only when
    // no update matched. Keys coalesce (equal whenever both present).
    val updateAbsent = keys.map(k => col(s"_u_$k").isNull).reduce(_ && _)
    joined.select(
      (base.columns.toSeq.map { c =>
        val v =
          if (keys.contains(c)) coalesce(col(s"_u_$c"), col(s"_b_$c"))
          else when(updateAbsent, col(s"_b_$c")).otherwise(col(s"_u_$c"))
        v.as(c)
      } :+ action.as(actionCol)): _*)
  }
}
