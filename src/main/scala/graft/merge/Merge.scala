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

  /** Faithful clause-by-clause replication of the reference MERGE
    * (common/iceberg.py:237-244):
    * {{{
    *   WHEN MATCHED AND op='D' THEN DELETE       -- or UPDATE SET * with
    *                                             -- hard_deleted=true
    *   WHEN MATCHED AND op='U' THEN UPDATE SET *
    *   WHEN NOT MATCHED THEN INSERT *            -- UNCONDITIONAL: any op
    * }}}
    * Consequences worth noting: a matched op='I' row matches no clause
    * (target row kept, change dropped), and a NOT-matched 'U' — or even
    * 'D' — row is inserted (with keepDeletes, D rows carry
    * hard_deleted=true per the pre-merge flagging, iceberg.py:223-227).
    *
    * @param insertsPreverified set by callers whose change legs are
    *   anti/semi joins against this same target (full/incremental change
    *   detection): every I is not-matched and every U/D matched by
    *   construction, so the matched/not-matched split joins are skipped.
    */
  def apply(target: DataFrame, changes: DataFrame, keys: Seq[String],
            keepDeletes: Boolean,
            insertsPreverified: Boolean = false): DataFrame = {
    val outCols = target.columns.toSeq
    val (applied, evictKeys) =
      resolve(target, changes, keys, keepDeletes, insertsPreverified)
    // target rows keyed by a matched U or D change are replaced/deleted;
    // everything else (incl. keys of matched-I changes) is untouched
    val untouched = target.join(evictKeys, keys, "left_anti")
    untouched.unionByName(applied.select(outCols.map(col): _*))
  }

  /** The clause resolution shared by copy-on-write [[apply]] and the
    * merge-on-read path ([[graft.table.SnapshotTable.mergeMoR]]):
    * returns (applied, evictKeys) where `applied` holds the rows the
    * merge ADDS (inserts of any op when not matched, matched updates,
    * and with keepDeletes the flagged matched deletes) and `evictKeys`
    * the distinct keys whose PRE-merge target rows must disappear. CoW
    * materializes `target anti evictKeys ∪ applied`; MoR appends
    * `applied` as data files and `evictKeys` as an equality-delete file.
    */
  def resolve(target: DataFrame, changes: DataFrame, keys: Seq[String],
              keepDeletes: Boolean,
              insertsPreverified: Boolean = false): (DataFrame, DataFrame) = {
    // pre-merge soft-delete flagging (reference does this on the changes
    // frame BEFORE the merge, so not-matched D inserts arrive flagged)
    val flagged =
      if (keepDeletes)
        changes.withColumn(HardDeleted,
          when(col(Op) === "D", lit(true)).otherwise(lit(false)))
      else changes
    val applied =
      if (insertsPreverified) {
        if (keepDeletes) flagged else flagged.filter(col(Op) =!= "D")
      } else {
        // ONE matched-probe join instead of an anti + a semi (r15): the
        // change batch used to shuffle/scan twice and the target's key
        // projection fed two joins. A left join against the DISTINCT
        // target keys marks each change row matched/not-matched in one
        // pass (distinct is required — duplicate target keys would fan
        // the change rows out), and the clause algebra becomes a filter:
        // not-matched inserts any op; matched keeps U (and D under
        // keepDeletes); matched I matches no clause. NULL-key change
        // rows never equi-join and stay not-matched — exactly the old
        // anti-join behavior.
        val matchFlag = "__graft_matched"
        val tKeys = target.select(keys.map(col): _*).distinct()
          .withColumn(matchFlag, lit(true))
        val matchedKept =
          if (keepDeletes) col(Op) === "U" || col(Op) === "D"
          else col(Op) === "U" // matched D → DELETE; matched I → no clause
        flagged.join(tKeys, keys, "left")
          .filter(col(matchFlag).isNull || matchedKept)
          // a using-columns join fronts the key columns — restore the
          // change batch's own column order (callers select by name,
          // but mergeMoR writes `applied` as data files positionally)
          .select(flagged.columns.toSeq.map(col): _*)
      }
    val evictKeys = flagged.filter(col(Op) =!= "I")
      .select(keys.map(col): _*).distinct()
    (applied, evictKeys)
  }
}
