package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.MetaColumns

/** Copy-on-write MERGE: applies an I/U/D change set to the target table
  * contents, returning the new full table contents.
  *
  * Semantics equal the reference's Iceberg `MERGE INTO`
  * (reference: src/data_ingestion/common/iceberg.py:235-244):
  *   - matched + op='D'  → row deleted (or, with keepDeletes, kept with
  *     `hard_deleted=true` — iceberg.py:223-227)
  *   - matched + op='U'  → UPDATE SET * (take the change row)
  *   - not matched (op='I') → INSERT *
  *   - target rows not matched by any change key → kept as-is
  *
  * Implemented as `target left-anti changes` (untouched rows) unioned with
  * the applied change rows — same result as a full-outer-join resolution
  * but with one fewer wide row and a plan Catalyst can broadcast when the
  * change set is small (steady-state ingest: changes << target).
  *
  * Iceberg MERGE errors when multiple source rows match one target row;
  * we require the change set to be unique per key (the CDC path dedups via
  * ChangeSet.dedupLatest first — SURVEY.md §7.5).
  *
  * Scale: the anti join hash-partitions on the natural keys; with a small
  * change set AQE turns it into a broadcast join, so the target is
  * re-written without a shuffle. Partition-scoped rewrite (only rewriting
  * files whose partitions intersect the change set) lives in
  * [[graft.table.SnapshotTable.merge]].
  */
object Merge {
  import MetaColumns.{Op, HardDeleted}

  def apply(target: DataFrame, changes: DataFrame, keys: Seq[String],
            keepDeletes: Boolean): DataFrame = {
    val outCols = target.columns.toSeq
    val untouched = target.join(
      changes.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val applied =
      if (keepDeletes) {
        // soft delete: the D-leg rows (which originate from the target)
        // survive with hard_deleted=true; I/U rows keep their stamped flag
        changes.withColumn(HardDeleted,
          when(col(Op) === "D", lit(true))
            .otherwise(coalesce(col(HardDeleted).cast("boolean"), lit(false))))
      } else changes.filter(col(Op) =!= "D")
    untouched.unionByName(applied.select(outCols.map(col): _*))
  }
}
