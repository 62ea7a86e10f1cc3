package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.merge.{ChangeSet, Merge}
import graft.table.SnapshotTable

/** End-to-end ingestion runner: the Scala-Spark re-expression of the
  * reference's `create_or_update_iceberg_table`
  * (reference: src/data_ingestion/common/iceberg.py:82-244) over our
  * [[graft.table.SnapshotTable]] layer. The mode × flag semantics matrix is
  * SURVEY.md §2.12.
  */
object Ingestion {
  import MetaColumns._

  /** Lowercase all column names (reference: DMS sources arrive mixed-case,
    * ingestion/dmsdatabase1.py:60-63).
    */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.toLowerCase): _*)

  /** Stamp the engine meta columns onto a source batch (reference:
    * common/iceberg.py:105,126-128 — `ingestion_datetime` always,
    * `hard_deleted=false` when keeping deletes).
    */
  def stamp(df: DataFrame, ingestionTs: Timestamp, keepDeletes: Boolean): DataFrame = {
    val withTs = df.withColumn(IngestionDatetime, lit(ingestionTs))
    if (keepDeletes) withTs.withColumn(HardDeleted, lit(false)) else withTs
  }

  /** Schema-drift alignment (reference: AppFlow flows enable
    * `enable_dynamic_field_update`, so new source columns may appear and
    * old ones vanish — SURVEY.md §7.5). Returns (source', target') sharing
    * the union schema: columns the other side lacks are null-filled with
    * the owning side's type. Column order: target's, then new source
    * columns (so the merged table order stays stable for `exceptAll`).
    */
  def alignSchemas(source: DataFrame, target: DataFrame,
                   keepSourceCols: Seq[String] = Nil): (DataFrame, DataFrame) = {
    // name matching is case-INSENSITIVE (Spark's default resolution):
    // an exact-case map would classify a case-drifted source column
    // ('Email' for an existing 'email') as NEW, null-fill the real one,
    // and split the data across two case-variant columns — the silent
    // wipe the storage layer's evolution guard also defends against.
    // The target's spelling wins for shared columns.
    val sFields = source.schema.map(f => f.name.toLowerCase -> f).toMap
    val tFields = target.schema.map(f => f.name.toLowerCase -> f).toMap
    val keepLower = keepSourceCols.map(_.toLowerCase).toSet
    val dataCols = source.schema.map(_.name)
      .filterNot(c => keepLower(c.toLowerCase))
    val newCols = dataCols.filterNot(c => tFields.contains(c.toLowerCase))
    val gone = target.schema.map(_.name)
      .filterNot(c => sFields.contains(c.toLowerCase))
    if (newCols.isEmpty && gone.isEmpty && keepSourceCols.isEmpty)
      return (source, target)
    val order = target.schema.map(_.name) ++ newCols
    val s2 = source.select(order.map { c =>
      sFields.get(c.toLowerCase).map(f => col(f.name).as(c))
        .getOrElse(lit(null).cast(tFields(c.toLowerCase).dataType).as(c))
    } ++ keepSourceCols.map(col): _*)
    val t2 = target.select(order.map { c =>
      tFields.get(c.toLowerCase).map(f => col(f.name).as(c))
        .getOrElse(lit(null).cast(sFields(c.toLowerCase).dataType).as(c))
    }: _*)
    (s2, t2)
  }

  /** Pure (DataFrame-in/DataFrame-out) merge pipeline: given the source
    * batch and current target contents, produce the NEW target contents for
    * the given mode. This is the engine's analytical core, independent of
    * storage, and what the DuckDB-oracle queries exercise.
    *
    * For Cdc, `source` must carry an `op` column with values I/U/D.
    * Source/target schemas may drift; they are aligned by name first.
    */
  def applyMode(source0: DataFrame, target0: DataFrame, cfg: SourceConfig,
                ingestionTs: Option[Timestamp] = None): DataFrame = {
    val (source, target) =
      if (cfg.mode == IngestMode.Replace) (source0, target0)
      else if (cfg.mode == IngestMode.Cdc)
        alignSchemas(source0, target0, keepSourceCols = Seq(Op))
      else alignSchemas(source0, target0)
    applyModeAligned(source, target, cfg, ingestionTs)
  }

  private def applyModeAligned(source: DataFrame, target: DataFrame,
                               cfg: SourceConfig,
                               ingestionTs: Option[Timestamp]): DataFrame =
    cfg.mode match {
      case IngestMode.Replace => source
      case IngestMode.Cdc =>
        val deduped = ChangeSet.dedupLatest(source, cfg.naturalKeys, cfg.updatedAtFields)
        Merge(target, deduped, cfg.naturalKeys, cfg.flags.keepDeletes)
      case IngestMode.Full | IngestMode.Incremental =>
        val allowDeletes = cfg.mode == IngestMode.Full
        val cachedTarget = target.cache() // read by all 3 diff legs (iceberg.py:153-158)
        val changes = ChangeSet.build(source, cachedTarget, cfg.naturalKeys,
          cfg.updatedAtFields, cfg.flags, allowDeletes, ingestionTs)
        Merge(cachedTarget, changes, cfg.naturalKeys, cfg.flags.keepDeletes,
          insertsPreverified = true)
    }

  /** Full storage-backed run against a SnapshotTable (reference flow:
    * ingestion/salesforce.py:60-77 — create-or-update, cleanup,
    * monthly compaction). First load = CTAS (common/iceberg.py:122-149),
    * with the CDC `op` column dropped on bootstrap (:130-132).
    */
  def run(spark: SparkSession, table: SnapshotTable, rawBatch: DataFrame,
          cfg: SourceConfig, ingestionTs: Timestamp): Unit = {
    // column-case normalization is a SOURCE concern (the reference
    // lowercases only DMS feeds, dmsdatabase1.py:60-63) — jobs do it in
    // their dataframe(); batches arriving here are taken as-is
    val source = stamp(rawBatch, ingestionTs, cfg.flags.keepDeletes)
    // M4 property sets (reference: default_iceberg_table_properties,
    // common/iceberg.py:53-80): speed → CoW + snappy, storage → MoR +
    // gzip. Storage-mode merges are PHYSICALLY merge-on-read (appended
    // data + equality-delete files, SnapshotTable.mergeMoR);
    // graft.physical-write-mode records the executed mode.
    val writeMode = cfg.optimize match {
      case Optimize.Speed   => "copy-on-write"
      case Optimize.Storage => "merge-on-read"
    }
    val props = Map(
      "write.parquet.compression-codec" -> cfg.optimize.codec,
      "write.target-file-size-bytes" -> (64L * 1024 * 1024).toString,
      "format-version" -> "2",
      "write.update.mode" -> writeMode,
      "write.delete.mode" -> writeMode,
      "write.merge.mode" -> writeMode,
      "graft.physical-write-mode" -> writeMode,
      "history.expire.max-snapshot-age-ms" -> (90L * 24 * 3600 * 1000).toString,
      "history.expire.min-snapshots-to-keep" -> "90")
    if (cfg.mode == IngestMode.Replace || !table.exists) {
      val initial =
        if (cfg.mode == IngestMode.Cdc) source.drop(Op) else source
      table.createOrReplace(initial, cfg.partitionColumns, props)
    } else {
      // storage-optimized tables merge merge-on-read (appended data +
      // equality deletes, no partition rewrite); speed-optimized tables
      // merge copy-on-write with the partition-scoped rewrite. The
      // RECORDED table property wins over this run's cfg — a config flip
      // mid-life must not silently change an existing table's physical
      // merge mode (same round-1 lesson as maintenance honoring recorded
      // properties).
      val mor = table.currentManifest.properties
        .get("graft.physical-write-mode")
        .map(_ == "merge-on-read")
        .getOrElse(cfg.optimize == Optimize.Storage)
      cfg.mode match {
        case IngestMode.Cdc =>
          val (src, _) = alignSchemas(source, table.read(spark),
            keepSourceCols = Seq(Op))
          val deduped = ChangeSet.dedupLatest(src, cfg.naturalKeys, cfg.updatedAtFields)
          val tt = (t: DataFrame) => alignSchemas(source.drop(Op), t)._2
          if (mor)
            table.mergeMoR(spark, deduped, cfg.naturalKeys,
              cfg.flags.keepDeletes, targetTransform = tt)
          else
            table.merge(spark, deduped, cfg.naturalKeys, cfg.flags.keepDeletes,
              targetTransform = tt,
              partitionStableByKey = cfg.partitionStableByKey)
        case _ =>
          val allowDeletes = cfg.mode == IngestMode.Full
          val (src, tgt) = alignSchemas(source, table.read(spark))
          val target = tgt.cache()
          try {
            val changes = ChangeSet.build(src, target, cfg.naturalKeys,
              cfg.updatedAtFields, cfg.flags, allowDeletes, Some(ingestionTs))
            val tt = (t: DataFrame) => alignSchemas(source, t)._2
            if (mor)
              table.mergeMoR(spark, changes, cfg.naturalKeys,
                cfg.flags.keepDeletes, targetTransform = tt)
            else
              table.merge(spark, changes, cfg.naturalKeys, cfg.flags.keepDeletes,
                targetTransform = tt,
                partitionStableByKey = cfg.partitionStableByKey)
          } finally target.unpersist() // merge committed eagerly; release now
      }
    }
  }

  /** The reference's own correctness oracle (`--test`): symmetric multiset
    * difference between re-read source and the ingested table must be
    * empty (reference: common/iceberg.py:291-301 — drop
    * `ingestion_datetime`, filter + drop `hard_deleted`, dual `exceptAll`,
    * count == 0).
    */
  def diffCount(spark: SparkSession, table: SnapshotTable, source: DataFrame,
                keepDeletes: Boolean): Long = {
    var t = table.read(spark).drop(IngestionDatetime)
    if (keepDeletes)
      t = t.filter(col(HardDeleted) === lit(false)).drop(HardDeleted)
    val s = lowercaseColumns(source).select(t.columns.map(col).toSeq: _*)
    t.exceptAll(s).unionByName(s.exceptAll(t)).count()
  }
}
