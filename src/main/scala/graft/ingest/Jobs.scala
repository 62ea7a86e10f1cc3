package graft.ingest

import java.sql.Timestamp
import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core._
import graft.table.SnapshotTable

/** Concrete ingestion jobs: raw-path resolution + run/test lifecycle,
  * re-expressing the reference's two source families over local paths
  * (reference: src/data_ingestion/ingestion/salesforce.py and
  * ingestion/dmsdatabase1.py; lifecycle run() salesforce.py:60-77 =
  * create-or-update → cleanup → monthly compaction → file-list JSON →
  * manifest JSON).
  */
abstract class IngestionJob(
    val spark: SparkSession,
    val config: SourceConfig,
    val rawRoot: String,
    val warehouseRoot: String,
    val outputRoot: String,
    val runDatetime: OffsetDateTime) {

  protected def dayPath: String =
    runDatetime.format(DateTimeFormatter.ofPattern("yyyy-MM-dd"))

  /** Table-name normalization (reference: `glue_table`,
    * salesforce.py:43 / dmsdatabase1.py:68 — dashes become underscores).
    */
  def cleanTableName: String = config.table.replace('-', '_')

  // one handle per job run: SnapshotTable memoizes manifest parses per
  // instance, and run() touches the table from half a dozen call sites
  // (ingest, census, expiry, orphan GC, compaction, outputs) — a fresh
  // instance each access would re-parse chunked manifests every time.
  // Safe because the commit POINTER is re-read on every operation; only
  // immutable per-version manifests are cached.
  lazy val table: SnapshotTable =
    SnapshotTable.at(s"$warehouseRoot/${config.database}/$cleanTableName")

  /** Where today's raw batch lands (source-family specific). */
  def rawPath: String

  /** Read the raw batch (reference: `dataframe()` contract,
    * common/iceberg.py:303-307).
    */
  def dataframe(): DataFrame = spark.read.parquet(rawPath)

  def ingestionTs: Timestamp = Timestamp.from(runDatetime.toInstant)

  /** Full run: ingest, cleanup, monthly compaction, JSON outputs.
    * Maintenance honors the TABLE PROPERTIES the ingest recorded (the
    * reference's cleanup procedures read retention/file-size from table
    * properties, common/iceberg.py:54-59) rather than hardcoded defaults.
    */
  def run(): Unit = {
    Ingestion.run(spark, table, dataframe(), config, ingestionTs)
    val props = table.currentManifest.properties
    def longProp(k: String, default: Long) =
      props.get(k).map(_.toLong).getOrElse(default)
    // cleanup every run (reference: salesforce.py:64-65)
    table.expireSnapshots(
      maxAgeMs = longProp("history.expire.max-snapshot-age-ms",
        90L * 24 * 3600 * 1000),
      minSnapshotsToKeep = longProp("history.expire.min-snapshots-to-keep", 90).toInt)
    table.removeOrphanFiles(spark)
    // compaction monthly on the 1st (reference: salesforce.py:67-69)
    if (runDatetime.getDayOfMonth == 1)
      table.compact(spark,
        targetFileBytes = longProp("write.target-file-size-bytes",
          64L * 1024 * 1024))
    writeOutputs()
  }

  /** K3: single-file JSON outputs for downstream consumers — the live
    * data-file list and the manifest pointer (reference:
    * salesforce.py:72-77, dmsdatabase1.py:106-112; S5 one-row local
    * collection → DataFrame, common/iceberg.py:280-289).
    */
  def writeOutputs(): Unit = {
    import spark.implicits._
    // dated output paths + column naming per the reference
    // (salesforce.py:31-37 `.../file_list_full/{date}`,
    // `.../manifest_file/{date}`; manifest column is Row("manifest"),
    // common/iceberg.py:286-289)
    val base = s"$outputRoot/${config.database}/$cleanTableName"
    table.files(spark).select("file_path")
      .repartition(1)
      .write.mode("overwrite").json(s"$base/file_list_full/$dayPath")
    val manifestLocation =
      s"${table.root}/meta/v${table.currentVersion}.json"
    Seq(manifestLocation).toDF("manifest")
      .repartition(1)
      .write.mode("overwrite").json(s"$base/manifest_file/$dayPath")
  }

  /** The reference's `--test` oracle (salesforce.py:80-83): re-read the
    * raw batch and assert the table is a multiset-identical copy.
    */
  def test(): Unit = {
    val d = Ingestion.diffCount(spark, table, dataframe(), config.flags.keepDeletes)
    require(d == 0, s"ingestion test failed: diff count $d for ${config.qualifiedName}")
  }
}

/** AppFlow-style source: raw lands under `{raw}/{source}/{table}/{date}`
  * (reference: salesforce.py:27-29; keys Id/SystemModstamp :48-52).
  */
class AppflowStyleJob(spark: SparkSession, config: SourceConfig,
    sourceName: String, rawRoot: String, warehouseRoot: String,
    outputRoot: String, runDatetime: OffsetDateTime)
  extends IngestionJob(spark, config, rawRoot, warehouseRoot, outputRoot, runDatetime) {

  override def rawPath: String =
    s"$rawRoot/$sourceName/${config.table}/$dayPath"
}

/** DMS-style source: full loads under `{raw}/{source}/{table}/{date}`;
  * CDC reads the day's `cdc/{schema}/{TABLE}/{yyyy/MM/dd}` folder once the
  * table exists, or the WHOLE cdc history dir for bootstrap (reference:
  * dmsdatabase1.py:35-46 — the bootstrap branch is how a new cdc table
  * catches up).
  */
class DmsStyleJob(spark: SparkSession, config: SourceConfig,
    sourceName: String, schemaName: String, rawRoot: String,
    warehouseRoot: String, outputRoot: String, runDatetime: OffsetDateTime)
  extends IngestionJob(spark, config, rawRoot, warehouseRoot, outputRoot, runDatetime) {

  override def rawPath: String =
    if (config.mode == IngestMode.Cdc) {
      val cdcRoot =
        s"$rawRoot/$sourceName/dms/cdc/$schemaName/${config.table.toUpperCase}"
      if (table.exists)
        s"$cdcRoot/${runDatetime.format(DateTimeFormatter.ofPattern("yyyy/MM/dd"))}"
      else cdcRoot // bootstrap: entire history
    } else s"$rawRoot/$sourceName/${config.table}/$dayPath"

  /** CDC dirs nest plain `yyyy/MM/dd` folders (not hive partitions), so the
    * bootstrap whole-history read needs recursive lookup. DMS feeds arrive
    * mixed-case and are lowercased here (reference:
    * dmsdatabase1.py:60-63); AppFlow feeds keep their casing.
    */
  override def dataframe(): DataFrame = {
    val raw =
      if (config.mode == IngestMode.Cdc)
        spark.read.option("recursiveFileLookup", "true").parquet(rawPath)
      else super.dataframe()
    Ingestion.lowercaseColumns(raw)
  }
}
