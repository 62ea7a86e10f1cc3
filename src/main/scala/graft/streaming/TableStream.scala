package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.table.SnapshotTable

/** Structured Streaming SOURCE over a [[SnapshotTable]] — the streaming
  * twin of the batch incremental read (Iceberg's streaming read /
  * Delta's `readStream` on a table): each micro-batch is the rows of data
  * files COMMITTED since the last processed snapshot version, planned
  * from two manifests with no directory listing and no data-file diffing
  * (the chunked-manifest doc diff makes batch planning O(changed
  * documents)). Offsets are snapshot versions, so checkpoint recovery
  * replays from a committed version boundary exactly.
  *
  * {{{
  * spark.readStream.format("graft-table")
  *   .option("startVersion", "0")      // 0 = bootstrap: first batch is the
  *                                     //     whole table; "latest" (default)
  *                                     //     = only commits after stream start
  *   .option("ignoreChanges", "true")  // permit non-append commits (CoW
  *                                     //     merge/compaction): rewritten
  *                                     //     partitions RE-EMIT wholesale
  *   .load("/path/to/table")
  * }}}
  *
  * Semantics are append-driven, like Iceberg's: an append-only span
  * streams exactly the appended rows; a span containing a rewrite
  * (CoW merge, compaction) or new equality deletes fails LOUDLY unless
  * `ignoreChanges` is set, because appends cannot represent row removal
  * and a silent default would double-count or drop rows downstream.
  * Snapshot expiry that reclaims a checkpointed version also fails
  * loudly at restart (`manifest(v)` requires retention) — set expiry
  * horizons longer than consumer lag, as with Iceberg.
  */
final class GraftTableSourceProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table source requires a table root: " +
        ".load(<path>) or .option(\"path\", <path>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val path = pathOf(parameters)
    val tbl = SnapshotTable.at(path)
    require(tbl.exists, s"no committed graft table at $path")
    // the stream's schema is pinned at start; later evolution null-fills
    // (added columns are invisible to an already-running stream)
    (s"graft-table[$path]",
      schema.getOrElse(StructType.fromDDL(tbl.currentManifest.schemaDdl)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new GraftTableSource(sqlContext.sparkSession, pathOf(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      parameters, metadataPath)
}

/** One table's streaming tail; see [[GraftTableSourceProvider]]. */
final class GraftTableSource(spark: SparkSession, path: String,
                             override val schema: StructType,
                             parameters: Map[String, String],
                             metadataPath: String)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  private val tbl = SnapshotTable.at(path)

  /** `Trigger.AvailableNow` contract (implemented natively so the exec
    * does not fall back to the single-batch wrapper): pin the version
    * visible when the trigger fired; commits landing DURING the run wait
    * for the next one.
    */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(tbl.currentVersion)

  /** Admission-control spelling of [[getOffset]] (the interface rides in
    * with SupportsTriggerAvailableNow); read limits don't apply — a
    * snapshot version is the only batch granularity.
    */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull
  private val ignoreChanges =
    parameters.get("ignoreChanges").exists(_.toBoolean)

  /** Version streaming starts AFTER: `startVersion=0` bootstraps (first
    * batch = the full table), an explicit version tails commits after it,
    * and the default `latest` pins the CURRENT version at the stream's
    * FIRST start and persists the pin in the stream's metadata dir (the
    * FileStreamSource pattern) — restarts resume from the pin even when
    * no batch ever committed an offset, so "latest" cannot silently skip
    * commits that landed between two runs of the same checkpoint.
    */
  private val startVersion: Long = parameters.get("startVersion") match {
    case Some(v) if v != "latest" => v.toLong
    case _ =>
      val dir = {
        val uri = new java.net.URI(metadataPath)
        java.nio.file.Paths.get(
          if (uri.getScheme == null) metadataPath else uri.getPath)
      }
      val pin = dir.resolve("graft-start-version")
      if (java.nio.file.Files.exists(pin))
        new String(java.nio.file.Files.readAllBytes(pin),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      else {
        val v = tbl.currentVersion
        java.nio.file.Files.createDirectories(dir)
        val tmp = java.nio.file.Files.createTempFile(dir, ".start", ".tmp")
        java.nio.file.Files.write(tmp,
          v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        try {
          java.nio.file.Files.move(tmp, pin,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          v
        } catch { // lost a (same-checkpoint) race: the winner's pin rules
          case _: java.nio.file.FileAlreadyExistsException =>
            java.nio.file.Files.deleteIfExists(tmp)
            new String(java.nio.file.Files.readAllBytes(pin),
              java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        }
      }
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong // checkpoint-recovered
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val v = availableNowCap.getOrElse(tbl.currentVersion)
    if (v <= startVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startVersion)
    val df = tbl.readIncrementalBetween(spark, from, ver(end),
      requireAppendOnly = !ignoreChanges)
    // align to the pinned stream schema: evolution during the stream may
    // have added columns (dropped here) or removed some (null-filled)
    val aligned = df.select(schema.toSeq.map { f =>
      df.columns.find(_.equalsIgnoreCase(f.name)) match {
        case Some(c) => col(c).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
    GraftBridge.streamingDataFrame(aligned)
  }

  override def stop(): Unit = ()
}
