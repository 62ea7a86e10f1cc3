package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{IngestFlags, MetaColumns}

/** Change detection: builds the I/U/D change set between a source batch and
  * the current target table.
  *
  * Semantics mirror the reference's generic diff algorithm
  * (reference: src/data_ingestion/common/iceberg.py:152-216):
  *   - inserts  = source left-anti target on natural keys (iceberg.py:167-170)
  *   - deletes  = target left-anti source on natural keys (iceberg.py:178-180),
  *                skipped for incremental mode (iceberg.py:176-178), and
  *                already-soft-deleted rows are not re-deleted
  *                (iceberg.py:181-183)
  *   - updates  = source left-semi target on [keys equal] AND
  *                [source.updatedAt > target.updatedAt] (iceberg.py:190-194)
  *   - cdc      = no joins; the batch already carries `op`; window-dedup to
  *                the latest row per key (iceberg.py:203-216)
  *
  * Scale notes: all three legs are equi-joins on the natural keys, so they
  * hash-partition on the same keys and Catalyst reuses the exchange. The
  * change set is small relative to the table in steady state — Spark's AQE
  * converts the anti/semi joins to broadcast when the batch side is small.
  * The target side should be `.cache()`d by the caller when all three legs
  * run (reference: iceberg.py:153-158 "cache to avoid reading 3 times").
  */
object ChangeSet {
  import MetaColumns.{Op, HardDeleted}

  private def keyCondition(keys: Seq[String]): Column =
    keys.map(k => col(s"src.$k") <=> col(s"tgt.$k")).reduce(_ && _)

  /** Strictly-newer theta condition on the updated-at fields
    * (reference builds one `>` predicate per field, iceberg.py:162).
    */
  private def newerCondition(updatedAt: Seq[String]): Column =
    updatedAt.map(u => col(s"src.$u") > col(s"tgt.$u")).reduce(_ && _)

  /** Rows present in source but not in target (new keys) → op = I. */
  def inserts(source: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    source.alias("src")
      .join(target.alias("tgt"), keyCondition(keys), "left_anti")
      .withColumn(Op, lit("I"))

  /** Rows present in target but not in source (vanished keys) → op = D.
    * With soft deletes enabled, rows already flagged are excluded
    * (reference: iceberg.py:181-183).
    */
  def deletes(source: DataFrame, target: DataFrame, keys: Seq[String],
              keepDeletes: Boolean): DataFrame = {
    val live =
      if (keepDeletes && target.columns.contains(HardDeleted))
        target.filter(col(HardDeleted) === lit(false))
      else target
    live.alias("src")
      .join(source.alias("tgt"), keyCondition(keys), "left_anti")
      .withColumn(Op, lit("D"))
  }

  /** Rows matched by key and strictly newer in source → op = U. */
  def updates(source: DataFrame, target: DataFrame, keys: Seq[String],
              updatedAt: Seq[String]): DataFrame =
    source.alias("src")
      .join(target.alias("tgt"),
        keyCondition(keys) && newerCondition(updatedAt), "left_semi")
      .withColumn(Op, lit("U"))

  private def emptyLike(df: DataFrame): DataFrame = df.filter(lit(false))

  /** Full/incremental change set per SURVEY.md §2.12. `source` and `target`
    * must share the data columns; target may additionally carry meta
    * columns which the caller is expected to have stamped onto source too
    * (see Ingestion.stamp).
    */
  /** @param ingestionTs when set, re-stamps `ingestion_datetime` on the
    *   assembled union — the reference does this on the whole change set
    *   (iceberg.py:201-202), so even delete-leg rows (which originate from
    *   the target) carry the CURRENT run's timestamp.
    */
  def build(source: DataFrame, target: DataFrame, keys: Seq[String],
            updatedAt: Seq[String], flags: IngestFlags,
            allowDeletes: Boolean,
            ingestionTs: Option[java.sql.Timestamp] = None): DataFrame = {
    val ins =
      if (flags.insert) inserts(source, target, keys)
      else emptyLike(source).withColumn(Op, lit("I"))
    val del =
      if (flags.delete && allowDeletes) deletes(source, target, keys, flags.keepDeletes)
      else emptyLike(target).withColumn(Op, lit("D"))
    val upd =
      if (flags.update) updates(source, target, keys, updatedAt)
      else emptyLike(source).withColumn(Op, lit("U"))
    // union by name: the delete leg originates from the target and may have
    // meta columns in a different position (reference unions positionally
    // because it stamps source first, iceberg.py:201 — by-name is the safe
    // Scala equivalent)
    val union = ins.unionByName(del.select(ins.columns.map(col).toSeq: _*))
      .unionByName(upd)
    ingestionTs match {
      case Some(ts) if union.columns.contains(MetaColumns.IngestionDatetime) =>
        union.withColumn(MetaColumns.IngestionDatetime, lit(ts))
      case _ => union
    }
  }

  /** CDC latest-row-per-key dedup (reference: iceberg.py:203-216):
    * `row_number()` over keys ordered by the updated-at fields descending,
    * keep rank 1. `tiebreakers` adds trailing order columns so the result
    * is deterministic when updated-at ties (the reference is
    * nondeterministic there; we pin it down for reproducibility).
    *
    * Scale: single hash-shuffle on the natural keys; ranking windows need
    * no frame buffering beyond the current key group.
    */
  def dedupLatest(batch: DataFrame, keys: Seq[String], updatedAt: Seq[String],
                  tiebreakers: Seq[String] = Nil): DataFrame = {
    val order = updatedAt.map(col(_).desc) ++ tiebreakers.map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val rn = "__graft_rn"
    batch.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
