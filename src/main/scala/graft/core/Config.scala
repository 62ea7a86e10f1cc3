package graft.core

/** Ingestion mode of a source table.
  *
  * Mirrors the reference's four modes (reference:
  * src/data_ingestion/common/iceberg.py:9-10 `INGESTION_TYPES =
  * ["full","incremental","cdc","replace"]`) — see SURVEY.md §2.12 for the
  * full mode × flag semantics matrix.
  */
sealed trait IngestMode
object IngestMode {
  case object Full        extends IngestMode
  case object Incremental extends IngestMode
  case object Cdc         extends IngestMode
  case object Replace     extends IngestMode

  def parse(s: String): IngestMode = s.toLowerCase match {
    case "full"        => Full
    case "incremental" => Incremental
    case "cdc"         => Cdc
    case "replace"     => Replace
    case other => throw new IllegalArgumentException(s"unknown mode: $other")
  }
}

/** Storage-vs-speed trade-off (reference: common/iceberg.py:13-14
  * `OPTIMIZE_FOR = ["speed","storage"]`): selects compression codec and
  * copy-on-write vs merge-on-read table properties
  * (common/iceberg.py:53-80). We implement CoW physically in both cases
  * (SURVEY.md §7.5) but honor the codec.
  */
sealed trait Optimize { def codec: String }
object Optimize {
  case object Speed   extends Optimize { val codec = "snappy" }
  case object Storage extends Optimize { val codec = "gzip"   }
  def parse(s: String): Optimize = s.toLowerCase match {
    case "speed"   => Speed
    case "storage" => Storage
    case other => throw new IllegalArgumentException(s"unknown optimize: $other")
  }
}

/** CLI-style ingestion flags (reference: app.py:40-54 `--no-insert
  * --no-update --no-delete --keep-deletes`). A disabled leg is replaced by
  * an empty change frame (common/iceberg.py:171-174,184-187,195-198);
  * keepDeletes switches hard deletes to a soft `hard_deleted=true` flag
  * (common/iceberg.py:223-227).
  */
final case class IngestFlags(
    insert: Boolean = true,
    update: Boolean = true,
    delete: Boolean = true,
    keepDeletes: Boolean = false)

/** Per-source configuration: keys and ordering fields are configuration,
  * not schema (reference: common/iceberg.py:317-325 abstract
  * `natural_keys()` / `updated_at_fields()`; Salesforce `Id`/
  * `SystemModstamp` salesforce.py:48-52; DMS `recid`/`modifieddatetime`
  * dmsdatabase1.py:73-77).
  *
  * @param naturalKeys     equality-join key columns (composite supported —
  *                        the reference builds list-valued conditions,
  *                        common/iceberg.py:161-162)
  * @param updatedAtFields theta-join ordering columns: a source row is an
  *                        update iff strictly newer on these
  * @param partitionColumns optional partition-spec column names already
  *                        present (or derivable) on the data; drives
  *                        partition-scoped copy-on-write rewrite at scale
  * @param partitionStableByKey declare that partition columns are pure
  *                        functions of the natural keys (identity/bucket),
  *                        enabling the merge fast path that skips the
  *                        moved-row census scan
  */
final case class SourceConfig(
    database: String,
    table: String,
    naturalKeys: Seq[String],
    updatedAtFields: Seq[String],
    partitionColumns: Seq[String] = Nil,
    mode: IngestMode = IngestMode.Full,
    flags: IngestFlags = IngestFlags(),
    optimize: Optimize = Optimize.Speed,
    partitionStableByKey: Boolean = false) {
  require(naturalKeys.nonEmpty, "naturalKeys must be non-empty")
  def qualifiedName: String = s"$database.$table"
}

/** Column names the engine adds (reference: common/iceberg.py:37-39). */
object MetaColumns {
  val IngestionDatetime = "ingestion_datetime"
  val HardDeleted       = "hard_deleted"
  val Op                = "op" // change marker, values I/U/D
}
