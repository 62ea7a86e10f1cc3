package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MetaColumns
import graft.merge.Merge

/** One snapshot's manifest: the complete list of live data files plus
  * table metadata. Replaces Iceberg's snapshot/manifest machinery
  * (reference: src/data_ingestion/common/iceberg.py — snapshots, `.files`
  * metadata table :272-278, expire_snapshots :253-259, remove_orphan_files
  * :260-262, rewrite_data_files :264-270) since no Iceberg runtime jar is
  * available offline (SURVEY.md §7.1/§7.3).
  */
final case class Manifest(
    version: Long,
    timestampMs: Long,
    schemaDdl: String,
    // data files relative to the table root, each with its partition values
    files: Seq[FileEntry],
    partitionColumns: Seq[String],
    properties: Map[String, String],
    // merge-on-read equality-delete files: keys written at `version` kill
    // matching rows of data files from OLDER versions (Iceberg v2
    // equality deletes, sequence-number semantics)
    deleteFiles: Seq[DeleteEntry] = Nil)

final case class FileEntry(path: String, partition: Map[String, String]) {
  /** Commit version the file was written at (`data/v<N>/...`) — the
    * sequence number equality deletes compare against.
    */
  def seq: Long =
    path.split('/')(1).stripPrefix("v").takeWhile(_.isDigit) match {
      case "" => 0L
      case s  => s.toLong
    }
}

final case class DeleteEntry(path: String, version: Long)

/** A versioned Parquet table with a tiny snapshot log.
  *
  * Layout under `root/`:
  * {{{
  *   data/v<N>/[p=<v>/]part-*.parquet    -- files written at snapshot N
  *   meta/v<N>.json                      -- manifest (full live-file list)
  *   meta/_current                       -- commit pointer (version number)
  * }}}
  *
  * Commit = write data dir + manifest, then atomically move a temp pointer
  * over `_current` — single-writer, same assumption as the reference
  * (Airflow `max_active_runs=1`, dags/data_ingestion_dms.py:85).
  *
  * A manifest may reference files from OLDER data dirs: a partition-scoped
  * copy-on-write merge rewrites only the files of partitions touched by
  * the change set and carries the rest forward — the property that makes
  * CoW merge viable at 100 TB (rewriting only affected partitions, like
  * Iceberg CoW, instead of the whole table).
  */
final class SnapshotTable(val root: Path) {
  private def metaDir = root.resolve("meta")
  private def dataDir = root.resolve("data")
  private def pointer = metaDir.resolve("_current")

  def exists: Boolean = Files.exists(pointer)

  def currentVersion: Long = {
    require(exists, s"table at $root does not exist (no commit pointer)")
    new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim.toLong
  }

  def currentManifest: Manifest = manifest(currentVersion)

  def manifest(v: Long): Manifest =
    ManifestJson.read(metaDir.resolve(s"v$v.json"))

  def manifestVersions: Seq[Long] =
    if (!Files.exists(metaDir)) Nil
    else scala.util.Using.resource(Files.list(metaDir)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        // strictly v<digits>.json: chunk side files (v<N>-files-<i>.json)
        // are not manifests
        .collect { case s if s.matches("v\\d+\\.json") =>
          s.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq.sorted
    }

  /** Read the current snapshot. With `partitionFilter`, only files whose
    * partition values pass are read at all — manifest-level pruning, no
    * file listing or footer reads for pruned partitions.
    *
    * Partitioned snapshots are written hive-style (`k=v` dirs), so the
    * partition column values live in the path, not the files; reads group
    * the file list by snapshot data dir and set `basePath` per group so
    * Spark reconstructs the partition columns, then union the groups (a
    * manifest can reference files from several snapshot dirs after a
    * partition-scoped merge).
    */
  def read(spark: SparkSession,
           partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame =
    readManifest(spark, currentManifest, partitionFilter)

  private def readManifest(spark: SparkSession, m: Manifest,
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
    val sel = m.files.filter(f => partitionFilter(f.partition))
    if (sel.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq
    val needSeq = m.deleteFiles.nonEmpty
    // group by snapshot data dir: partitioned reads need a per-group
    // basePath to reconstruct hive-style partition columns, and the MoR
    // path needs the group's commit version as the row sequence number
    val base =
      if (m.partitionColumns.isEmpty && !needSeq) {
        spark.read.schema(schema)
          .parquet(sel.map(f => root.resolve(f.path).toString): _*)
      } else {
        sel.groupBy(_.seq)
          .map { case (seqNo, fs) =>
            val dir = fs.head.path.split('/').take(2).mkString("/")
            val reader = spark.read.schema(schema)
            val df =
              (if (m.partitionColumns.isEmpty) reader
               else reader.option("basePath", root.resolve(dir).toString))
                .parquet(fs.map(f => root.resolve(f.path).toString): _*)
            if (needSeq) df.withColumn(SeqCol, lit(seqNo)) else df
          }
          .reduce(_ unionByName _)
      }
    if (!needSeq) return base.select(cols: _*)
    // equality deletes: a delete written at version V kills rows of data
    // files with seq < V whose key columns match. Delete files are small
    // (changed keys only); the anti join is key-equi with the sequence
    // comparison as a join-side filter.
    val dels = m.deleteFiles.groupBy(_.version)
      .map { case (v, fs) =>
        spark.read.parquet(fs.map(f => root.resolve(f.path).toString): _*)
          .withColumn(DelVerCol, lit(v))
      }
      .reduce(_ unionByName _)
    val keyCols = dels.columns.filterNot(_ == DelVerCol).toSeq
    val cond = keyCols.map(c =>
      org.apache.spark.sql.functions.col(s"r.$c") ===
        org.apache.spark.sql.functions.col(s"d.$c"))
      .reduce(_ && _) &&
      org.apache.spark.sql.functions.col(s"d.$DelVerCol") >
        org.apache.spark.sql.functions.col(s"r.$SeqCol")
    base.alias("r").join(dels.alias("d"), cond, "left_anti")
      .select(cols: _*)
  }

  private val SeqCol = "__graft_seq"
  private val DelVerCol = "__graft_delete_version"

  /** `.files` metadata relation (reference: common/iceberg.py:272-278
    * `SELECT file_path FROM db.table.files`), with per-file size — the
    * input to size-aware compaction planning.
    */
  def files(spark: SparkSession): DataFrame = {
    import spark.implicits._
    currentManifest.files.map { f =>
      val p = root.resolve(f.path)
      (p.toString,
        f.partition.map { case (k, v) => s"$k=$v" }.mkString("/"),
        if (Files.exists(p)) Files.size(p) else -1L)
    }.toDF("file_path", "partition", "file_size_bytes")
  }

  /** Time travel: read a specific retained snapshot version (Iceberg
    * `VERSION AS OF` equivalent — snapshot isolation falls out of the
    * manifest being the complete live-file list).
    */
  def readVersion(spark: SparkSession, version: Long): DataFrame =
    readManifest(spark, manifest(version))

  /** Incremental read: rows of data files PRESENT in the current snapshot
    * but ABSENT from snapshot `sinceVersion` (Iceberg incremental-scan
    * analog). Under partition-scoped copy-on-write this is exactly the
    * current contents of the partitions touched since `sinceVersion`
    * (rewritten partitions' files are new; carried files are excluded) —
    * the input a downstream incremental consumer wants, computed from two
    * manifests with no data-file diffing. Note CoW semantics: a rewritten
    * partition's rows ALL reappear, including unchanged rows that shared
    * a file with changed ones.
    */
  def readIncremental(spark: SparkSession, sinceVersion: Long): DataFrame = {
    val old = manifest(sinceVersion).files.map(_.path).toSet
    val cur = currentManifest
    val fresh = cur.files.filterNot(f => old(f.path)).map(_.path).toSet
    readManifest(spark, cur.copy(files = cur.files.filter(f => fresh(f.path))),
      _ => true)
  }

  /** Snapshot history: (version, timestampMs, nFiles, isCurrent). */
  def history(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cur = currentVersion
    manifestVersions.map { v =>
      val m = manifest(v)
      (v, m.timestampMs, m.files.size.toLong, v == cur)
    }.toDF("version", "timestamp_ms", "n_files", "is_current")
  }

  /** Rollback: move the commit pointer to an older retained snapshot
    * (Iceberg `rollback_to_snapshot` procedure). Data files are untouched;
    * the rolled-back-over versions stay retained (still time-travelable)
    * until snapshot expiry reclaims them by age, and new commits continue
    * from the highest version number so nothing is overwritten.
    */
  def rollbackTo(version: Long): Unit = {
    require(manifestVersions.contains(version), s"no snapshot v$version")
    val tmp = metaDir.resolve(s"_current.tmp.rb$version")
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** CTAS create-or-replace (reference: common/iceberg.py:111-119 CREATE OR
    * REPLACE TABLE ... AS SELECT). Data is hash-distributed on the
    * partition columns (if any) and written one directory per snapshot.
    */
  /** Next commit version: one past the HIGHEST retained manifest, not the
    * current pointer — after a rollback, committing currentVersion+1 would
    * overwrite a stale-but-retained snapshot's manifest and data dir.
    */
  private def nextVersion: Long = {
    val vs = manifestVersions
    if (vs.isEmpty) 1L else vs.max + 1
  }

  def createOrReplace(df: DataFrame, partitionColumns: Seq[String] = Nil,
                      properties: Map[String, String] = Map.empty,
                      nowMs: Long = System.currentTimeMillis()): Manifest =
    commitData(df, nextVersion, partitionColumns, properties, nowMs)

  /** Copy-on-write MERGE of an I/U/D change set, committed as a new
    * snapshot. When the table is partitioned and the change set is small,
    * only files of AFFECTED partitions are rewritten; all other files are
    * carried into the new manifest untouched — at 100 TB this is the
    * difference between rewriting gigabytes and rewriting everything.
    */
  /** @param partitionStableByKey caller-declared invariant: every
    *   partition column is a pure function of the natural keys (identity
    *   or bucket transforms), so a row can never change partitions. When
    *   true, the moved-row census scan is skipped — the steady-state fast
    *   path for bucket-partitioned tables. Declaring it falsely can
    *   duplicate moved keys; the default is the safe scan.
    */
  def merge(spark: SparkSession, changes: DataFrame, keys: Seq[String],
            keepDeletes: Boolean,
            nowMs: Long = System.currentTimeMillis(),
            targetTransform: DataFrame => DataFrame = identity,
            partitionStableByKey: Boolean = false): Manifest = {
    val m = currentManifest
    if (m.partitionColumns.isEmpty) {
      // full rewrite materializes the delete-resolved view, so pending
      // MoR deletes fold away here (commitData drops them)
      val merged = Merge(targetTransform(read(spark)), changes, keys, keepDeletes)
      commitData(merged, nextVersion, m.partitionColumns, m.properties, nowMs)
    } else {
      // partition-scoped rewrite: collect the (small, bounded) set of
      // partition values that must be rewritten — one row per partition,
      // NOT per change row. Two contributors:
      //   1. partitions of the change rows (where new/updated rows land);
      //   2. partitions of TARGET rows whose key is in the change set —
      //      required when the partition value is mutable (e.g. derived
      //      from updated_at): an update can MOVE a row across partitions
      //      and the old copy must be rewritten away. This is a
      //      column-pruned scan of (keys, partition) joined semi against
      //      the change keys — cheap relative to any rewrite, and the
      //      same target-match scan Iceberg MERGE performs.
      // The change set feeds the census AND the merge, so cache it:
      // change detection is itself a multi-join plan that must not run
      // twice.
      val pcols = m.partitionColumns
      val cached = changes.cache()
      try {
        // the census must produce EXACTLY the representation partitionOf
        // parses out of the written paths: Spark escapes path-special
        // characters and writes nulls as the default partition name, so
        // align through the same codec rather than raw cast-to-string
        def toSet(rows: Array[org.apache.spark.sql.Row]): Set[Map[String, String]] =
          rows.map(r => pcols.zipWithIndex.map { case (c, i) =>
            c -> (Option(r.getString(i))
              .getOrElse(org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.DEFAULT_PARTITION_NAME))
          }.toMap).toSet
        val changePartitions = toSet(
          cached.select(pcols.map(c => col(c).cast("string")): _*)
            .distinct().collect())
        val homePartitions =
          if (partitionStableByKey) Set.empty[Map[String, String]]
          else {
            val changeKeys = cached.select(keys.map(col): _*).distinct()
            toSet(
              read(spark).select((keys ++ pcols).map(col): _*)
                .join(changeKeys, keys, "left_semi")
                .select(pcols.map(c => col(c).cast("string")): _*)
                .distinct().collect())
          }
        val touched = changePartitions ++ homePartitions
        val affectedTarget = targetTransform(read(spark, p => touched.contains(p)))
        val merged = Merge(affectedTarget, cached, keys, keepDeletes)
        val carried = m.files.filterNot(f => touched.contains(f.partition))
        // pending MoR equality-deletes still mask rows of CARRIED files
        // and must survive this commit (dropping them would resurrect
        // superseded rows in untouched partitions). They cannot affect
        // the rewritten files: those get seq = this commit's version,
        // newer than every pending delete. The rewritten partitions'
        // reads above already resolved the deletes.
        commitData(merged, nextVersion, pcols, m.properties, nowMs,
          carryForward = carried, carryDeletes = m.deleteFiles)
      } finally cached.unpersist()
    }
  }

  /** Merge-on-read MERGE: instead of rewriting touched files (CoW), the
    * commit APPENDS the change outcome — the applied rows as new data
    * files and the evicted keys as an equality-delete file — and carries
    * every existing file forward untouched. Write amplification is
    * O(changes), not O(touched partitions): the write mode the reference
    * selects with `--optimize storage` (common/iceberg.py:70-79). Reads
    * resolve deletes by sequence number (a delete at version V kills
    * matching rows of files written before V); [[compact]] folds deletes
    * back into pure data files.
    *
    * Clause semantics are identical to [[merge]] — both paths share
    * [[graft.merge.Merge.resolve]] — including the unconditional
    * not-matched insert and matched-'I' no-op.
    */
  def mergeMoR(spark: SparkSession, changes: DataFrame, keys: Seq[String],
               keepDeletes: Boolean,
               nowMs: Long = System.currentTimeMillis(),
               targetTransform: DataFrame => DataFrame = identity): Manifest = {
    val m = currentManifest
    val v = nextVersion
    if (exists && currentVersion >= v)
      throw new IllegalStateException(
        s"concurrent commit detected: pointer already at v${currentVersion}, " +
          s"aborting commit of v$v for $root")
    val target = targetTransform(read(spark))
    val (applied, evictKeys) =
      Merge.resolve(target, changes, keys, keepDeletes)
    val dataDirV = dataDir.resolve(s"v$v")
    val clustered =
      if (m.partitionColumns.nonEmpty)
        applied.select(target.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
          .repartition(m.partitionColumns.map(org.apache.spark.sql.functions.col): _*)
      else applied.select(target.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    val writer = clustered.write.mode("overwrite")
      .option("compression",
        m.properties.getOrElse("write.parquet.compression-codec", "snappy"))
    (if (m.partitionColumns.nonEmpty)
       writer.partitionBy(m.partitionColumns: _*)
     else writer).parquet(dataDirV.toString)
    val newData = listParquet(dataDirV).map { p =>
      val rel = root.relativize(p).toString
      FileEntry(rel, partitionOf(rel, m.partitionColumns))
    }
    // equality-delete file: just the key columns, one small parquet.
    // Insert-only batches have no evictions — registering an empty delete
    // file would put every future read on the seq-resolution path for
    // nothing, so skip it entirely.
    val newDeletes =
      if (evictKeys.isEmpty) Nil
      else {
        val delDir = dataDir.resolve(s"v${v}d")
        evictKeys.repartition(1).write.mode("overwrite").parquet(delDir.toString)
        listParquet(delDir).map(p => DeleteEntry(root.relativize(p).toString, v))
      }
    // schema may have drifted through targetTransform (column adds are
    // metadata-only; carried files null-fill on read under the superset)
    val out = Manifest(v, nowMs, target.schema.toDDL, m.files ++ newData,
      m.partitionColumns, m.properties, m.deleteFiles ++ newDeletes)
    Files.createDirectories(metaDir)
    if (exists && currentVersion >= v)
      throw new IllegalStateException(
        s"concurrent commit detected: pointer already at v${currentVersion}, " +
          s"aborting commit of v$v for $root")
    ManifestJson.write(metaDir.resolve(s"v$v.json"), out)
    val tmp = metaDir.resolve(s"_current.tmp$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    out
  }

  /** Bin-pack compaction toward the target file size (reference:
    * rewrite_data_files, common/iceberg.py:264-270; 64 MB target
    * common/iceberg.py:59). Rewrites the whole current snapshot into
    * ceil(totalBytes / target) files.
    */
  /** Compaction also FOLDS merge-on-read deletes: the rewrite reads the
    * delete-resolved view, and the committed manifest carries no delete
    * files — the MoR read-cost debt is repaid here (Iceberg's
    * rewrite_data_files + rewrite_position_delete_files in one step).
    */
  def compact(spark: SparkSession,
              targetFileBytes: Long = 64L * 1024 * 1024,
              nowMs: Long = System.currentTimeMillis()): Manifest = {
    val m = currentManifest
    val totalBytes = m.files.map(f => Files.size(root.resolve(f.path))).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    // size control: unpartitioned tables bin-pack via repartition; for
    // partitioned tables commitData clusters one task per partition value,
    // so oversized partitions are split by record count instead
    // (maxRecordsPerFile, derived from the observed compressed row size)
    if (m.partitionColumns.isEmpty) {
      commitData(read(spark).repartition(nFiles), nextVersion,
        m.partitionColumns, m.properties, nowMs)
    } else {
      val rowCount = math.max(1L, read(spark).count())
      val bytesPerRow = math.max(1L, totalBytes / rowCount)
      val maxRecords = math.max(1L, targetFileBytes / bytesPerRow)
      commitData(read(spark), nextVersion, m.partitionColumns, m.properties,
        nowMs, writerOptions = Map("maxRecordsPerFile" -> maxRecords.toString))
    }
  }

  /** Snapshot expiry (reference: expire_snapshots common/iceberg.py:253-259
    * with 90-day / keep-≥90 retention from table properties :54-58).
    * Removes expired manifests and any data files no retained manifest
    * references.
    */
  def expireSnapshots(maxAgeMs: Long = 90L * 24 * 3600 * 1000,
                      minSnapshotsToKeep: Int = 90,
                      nowMs: Long = System.currentTimeMillis()): Seq[Long] = {
    val versions = manifestVersions
    val cur = currentVersion
    val candidates = versions.filter(_ != cur).sorted
    val keepCount = math.max(0, minSnapshotsToKeep - 1) // current always kept
    val byAge = candidates.filter(v => nowMs - manifest(v).timestampMs > maxAgeMs)
    val expired = byAge.dropRight(math.max(0, keepCount - (candidates.size - byAge.size)))
    if (expired.isEmpty) return Nil
    val retained = versions.diff(expired)
    val live: Set[String] = retained.flatMap { v =>
      val m = manifest(v)
      m.files.map(_.path) ++ m.deleteFiles.map(_.path)
    }.toSet
    expired.foreach { v =>
      val m = manifest(v)
      (m.files.map(_.path) ++ m.deleteFiles.map(_.path))
        .filterNot(live)
        .foreach(deleteWithSidecars)
      ManifestJson.delete(metaDir.resolve(s"v$v.json"))
    }
    pruneEmptyDirs()
    expired
  }

  /** Orphan-file removal (reference: remove_orphan_files,
    * common/iceberg.py:260-262): deletes data files under data/ that no
    * retained manifest references. Only visible `*.parquet` files count as
    * data; Hadoop sidecars (`.crc`, `_SUCCESS`) follow their data file.
    */
  def removeOrphanFiles(): Seq[String] = {
    val live: Set[String] =
      manifestVersions.flatMap { v =>
        val m = manifest(v)
        m.files.map(_.path) ++ m.deleteFiles.map(_.path)
      }.toSet
    if (!Files.exists(dataDir)) return Nil
    val all = scala.util.Using.resource(Files.walk(dataDir)) { st =>
      st.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("."))
        .map(p => root.relativize(p).toString).toSeq
    }
    val orphans = all.filterNot(live)
    orphans.foreach(deleteWithSidecars)
    pruneEmptyDirs()
    orphans
  }

  /** Delete a data file plus its Hadoop `.crc` sidecar. */
  private def deleteWithSidecars(rel: String): Unit = {
    val p = root.resolve(rel)
    Files.deleteIfExists(p)
    Files.deleteIfExists(p.resolveSibling("." + p.getFileName.toString + ".crc"))
  }

  /** Remove data/vN dirs that hold no parquet files anymore (only
    * `_SUCCESS`/crc markers), then any empty dirs.
    */
  private def pruneEmptyDirs(): Unit = {
    if (!Files.exists(dataDir)) return
    val dirs = scala.util.Using.resource(Files.walk(dataDir))(
      _.iterator().asScala.filter(Files.isDirectory(_))
        .toSeq.sortBy(-_.getNameCount))
    dirs.filter(_ != dataDir).foreach { d =>
      val hasData = scala.util.Using.resource(Files.walk(d))(
        _.iterator().asScala.exists(p =>
          Files.isRegularFile(p) && p.toString.endsWith(".parquet")
            && !p.getFileName.toString.startsWith(".")))
      if (!hasData) {
        // delete markers then the dir itself (deepest-first ordering)
        scala.util.Using.resource(Files.walk(d))(
          _.iterator().asScala.toSeq)
          .sortBy(-_.getNameCount)
          .foreach(p => Files.deleteIfExists(p))
      }
    }
  }

  // ---- commit machinery ----

  // private[graft] so the concurrent-commit abort path is testable with a
  // deliberately stale version number
  private[graft] def commitData(df: DataFrame, v: Long, pcols: Seq[String],
                         props: Map[String, String], nowMs: Long,
                         carryForward: Seq[FileEntry] = Nil,
                         carryDeletes: Seq[DeleteEntry] = Nil,
                         writerOptions: Map[String, String] = Map.empty): Manifest = {
    val dir = dataDir.resolve(s"v$v")
    // optimistic-concurrency fail-fast #1, BEFORE any data is written: a
    // commit built against a stale version would otherwise "overwrite" the
    // retained snapshot's data/v<N> dir — destroying committed data even
    // though the commit itself aborts later
    if (exists && currentVersion >= v)
      throw new IllegalStateException(
        s"concurrent commit detected: pointer already at v${currentVersion}, " +
          s"aborting commit of v$v for $root")
    // cluster by partition value before a partitioned write: otherwise
    // every task fans out across every partition dir and each commit
    // writes O(tasks × partitions) small files. One shuffle buys one
    // file per partition per commit — the layout compaction would
    // otherwise have to repair. (Heavily skewed partition values would
    // serialize on one task here; bucket counts are chosen to spread.)
    val clustered =
      if (pcols.nonEmpty) df.repartition(pcols.map(col): _*) else df
    val writer = clustered.write.mode("overwrite")
      .options(writerOptions)
      .option("compression", props.getOrElse("write.parquet.compression-codec", "snappy"))
    (if (pcols.nonEmpty) writer.partitionBy(pcols: _*) else writer)
      .parquet(dir.toString)
    val written = listParquet(dir).map { p =>
      val rel = root.relativize(p).toString
      FileEntry(rel, partitionOf(rel, pcols))
    }
    val m = Manifest(v, nowMs, df.schema.toDDL, written ++ carryForward,
      pcols, props, deleteFiles = carryDeletes)
    Files.createDirectories(metaDir)
    // fail-fast #2, BEFORE the manifest lands: we operate single-writer
    // (like the reference's max_active_runs=1), but if another writer
    // advanced the pointer during the data write above, abort pre-manifest —
    // the just-written data/v<N> dir stays unreferenced by ANY manifest (a
    // retained manifest would make its files count as live forever), so
    // removeOrphanFiles reclaims it.
    if (exists && currentVersion >= v)
      throw new IllegalStateException(
        s"concurrent commit detected: pointer already at v${currentVersion}, " +
          s"aborting commit of v$v for $root")
    ManifestJson.write(metaDir.resolve(s"v$v.json"), m)
    val tmp = metaDir.resolve(s"_current.tmp$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    m
  }

  private def listParquet(dir: Path): Seq[Path] =
    scala.util.Using.resource(Files.walk(dir)) { st =>
      st.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString)
    }

  /** Parse hive-style `k=v` partition dirs out of a relative file path,
    * using Spark's own path unescaping (the exact inverse of what its
    * partitioned writer produces — URLDecoder would corrupt '+' and miss
    * the null-partition sentinel).
    */
  private def partitionOf(rel: String, pcols: Seq[String]): Map[String, String] = {
    val parts = rel.split('/').filter(_.contains('='))
      .map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k -> org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.unescapePathName(v)
      }.toMap
    pcols.flatMap(c => parts.get(c).map(c -> _)).toMap
  }
}

object SnapshotTable {
  def at(path: String): SnapshotTable = new SnapshotTable(Paths.get(path))
}

/** Minimal JSON codec for manifests — flat structure, no external deps.
  *
  * Scalability: up to [[ManifestJson.ChunkThreshold]] file entries the
  * manifest is one JSON document. Beyond that the file list is CHUNKED
  * into `v<N>-files-<i>.json` side files of [[ManifestJson.ChunkSize]]
  * entries each, referenced from the main manifest — no single JSON
  * document grows unboundedly with table size, and a million-file table
  * commits 100 bounded documents instead of one gigantic string build.
  * (Commit cost remains O(live files); Iceberg-style reuse of unchanged
  * chunk files across commits is the next step if that ever dominates.)
  */
private[graft] object ManifestJson {
  /** Max file entries inlined in the manifest document (and per chunk). */
  val ChunkThreshold = 10000
  val ChunkSize = 10000

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def q(s: String) = "\"" + esc(s) + "\""
  private def obj(m: Map[String, String]) =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:${q(v)}" }
      .mkString("{", ",", "}")

  private def fileArr(files: Seq[FileEntry]): String =
    files.map(f => s"""{"path":${q(f.path)},"partition":${obj(f.partition)}}""")
      .mkString("[", ",", "]")

  private def base(p: Path): String =
    p.getFileName.toString.stripSuffix(".json")

  def write(p: Path, m: Manifest): Unit = {
    val (filesJson, chunksJson) =
      if (m.files.size <= ChunkThreshold) (fileArr(m.files), "[]")
      else {
        val names = m.files.grouped(ChunkSize).zipWithIndex.map { case (fs, i) =>
          val name = s"${base(p)}-files-$i.json"
          Files.write(p.resolveSibling(name),
            s"""{"files":${fileArr(fs)}}""".getBytes(StandardCharsets.UTF_8))
          name
        }.toSeq
        ("[]", names.map(q).mkString("[", ",", "]"))
      }
    val delJson = m.deleteFiles
      .map(d => s"""{"path":${q(d.path)},"version":${d.version}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"version":${m.version},"timestampMs":${m.timestampMs},""" +
      s""""schemaDdl":${q(m.schemaDdl)},"partitionColumns":${m.partitionColumns.map(q).mkString("[", ",", "]")},""" +
      s""""properties":${obj(m.properties)},"deleteFiles":$delJson,""" +
      s""""fileChunks":$chunksJson,"files":$filesJson}"""
    Files.write(p, json.getBytes(StandardCharsets.UTF_8))
  }

  private def parseFiles(v: Any): Seq[FileEntry] =
    v.asInstanceOf[List[Any]].map { f =>
      val fm = f.asInstanceOf[Map[String, Any]]
      FileEntry(fm("path").asInstanceOf[String],
        fm("partition").asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.asInstanceOf[String] })
    }

  // hand-rolled parser for exactly the JSON `write` produces
  def read(p: Path): Manifest = {
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    val parsed = JsonLite.parse(s).asInstanceOf[Map[String, Any]]
    val chunkNames = parsed.get("fileChunks") // absent in pre-chunking manifests
      .map(_.asInstanceOf[List[Any]].map(_.asInstanceOf[String]))
      .getOrElse(Nil)
    val chunked = chunkNames.flatMap { name =>
      val cs = new String(Files.readAllBytes(p.resolveSibling(name)),
        StandardCharsets.UTF_8)
      parseFiles(JsonLite.parse(cs).asInstanceOf[Map[String, Any]]("files"))
    }
    Manifest(
      version = parsed("version").asInstanceOf[Double].toLong,
      timestampMs = parsed("timestampMs").asInstanceOf[Double].toLong,
      schemaDdl = parsed("schemaDdl").asInstanceOf[String],
      files = chunked ++ parseFiles(parsed("files")),
      partitionColumns = parsed("partitionColumns").asInstanceOf[List[Any]]
        .map(_.asInstanceOf[String]),
      properties = parsed("properties").asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[String] },
      deleteFiles = parsed.get("deleteFiles") // absent in pre-MoR manifests
        .map(_.asInstanceOf[List[Any]].map { d =>
          val dm = d.asInstanceOf[Map[String, Any]]
          DeleteEntry(dm("path").asInstanceOf[String],
            dm("version").asInstanceOf[Double].toLong)
        })
        .getOrElse(Nil))
  }

  /** Delete a manifest AND its chunk side files (snapshot expiry). */
  def delete(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val parsed = JsonLite.parse(s).asInstanceOf[Map[String, Any]]
      parsed.get("fileChunks")
        .map(_.asInstanceOf[List[Any]].map(_.asInstanceOf[String]))
        .getOrElse(Nil)
        .foreach(name => Files.deleteIfExists(p.resolveSibling(name)))
    }
    Files.deleteIfExists(p)
  }
}

/** Tiny recursive-descent JSON parser (objects → Map, arrays → List,
  * numbers → Double, strings → String, booleans/null) — enough for our
  * own manifests; avoids any external dependency (offline build).
  */
private[graft] object JsonLite {
  def parse(s: String): Any = {
    val it = new Cursor(s)
    val v = it.value()
    it.ws()
    v
  }
  private final class Cursor(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws(); require(i < s.length && s.charAt(i) == c, s"expected $c at $i"); i += 1
    }
    def value(): Any = {
      ws()
      s.charAt(i) match {
        case '{' => objValue()
        case '[' => arrValue()
        case '"' => strValue()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _   => numValue()
      }
    }
    private def objValue(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws(); val k = strValue(); expect(':'); val v = value(); b += (k -> v)
        ws()
        if (s.charAt(i) == ',') i += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    private def arrValue(): List[Any] = {
      expect('['); ws()
      val b = List.newBuilder[Any]
      if (s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value(); ws()
        if (s.charAt(i) == ',') i += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    private def strValue(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb += '"'; case '\\' => sb += '\\'; case '/' => sb += '/'
            case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
          }
        } else sb += s.charAt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def numValue(): Double = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i).toDouble
    }
  }
}
