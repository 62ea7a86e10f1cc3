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

  /** @param insertsPreverified set by callers whose I-leg is an anti join
    *   against this same target (full/incremental change detection): the
    *   not-matched guard below would be a no-op, so skip its join.
    */
  def apply(target: DataFrame, changes: DataFrame, keys: Seq[String],
            keepDeletes: Boolean,
            insertsPreverified: Boolean = false): DataFrame = {
    val outCols = target.columns.toSeq
    // faithful MERGE clause semantics: an op='I' row whose key ALREADY
    // exists in the target matches no clause (there is no
    // `WHEN MATCHED AND op='I'`), so the target row is kept and the
    // change ignored — exactly Iceberg's behavior on a malformed insert
    // marker. Effective changes = D/U rows + I rows that are truly new.
    val effective =
      if (insertsPreverified) changes
      else changes.filter(col(Op) =!= "I")
        .unionByName(changes.filter(col(Op) === "I")
          .join(target.select(keys.map(col): _*), keys, "left_anti"))
    val untouched = target.join(
      effective.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val applied =
      if (keepDeletes) {
        // soft delete: the D-leg rows (which originate from the target)
        // survive with hard_deleted=true; I/U rows keep their stamped flag
        effective.withColumn(HardDeleted,
          when(col(Op) === "D", lit(true))
            .otherwise(coalesce(col(HardDeleted).cast("boolean"), lit(false))))
      } else effective.filter(col(Op) =!= "D")
    untouched.unionByName(applied.select(outCols.map(col): _*))
  }
}
