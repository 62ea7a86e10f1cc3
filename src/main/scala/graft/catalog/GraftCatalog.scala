package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.SnapshotTable

/** Spark V2 `TableCatalog` over a warehouse root: the named-identifier
  * surface the reference gets from its Glue catalog (every table is
  * addressed `database.table` — common/iceberg.py:113-119,154,237-244).
  * Register per session, no code changes:
  *
  * {{{
  * spark.sql.catalog.graft           = graft.catalog.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /data/warehouse
  * spark.sql.extensions              = graft.GraftExtensions
  * }}}
  *
  * and `graft.db.table` resolves to the snapshot table at
  * `/data/warehouse/db/table` everywhere the path form works:
  * SELECT (incl. `@v`/`@ts`/`@history`/`@files` suffixes and manifest-
  * pruned WHERE), CTAS, MERGE INTO, UPDATE, DELETE, INSERT INTO.
  * Namespaces are warehouse subdirectories (nested namespaces map to
  * nested directories); `SHOW NAMESPACES` / `SHOW TABLES` / `CREATE
  * NAMESPACE` / `DROP NAMESPACE` work through this plugin.
  *
  * '''Resolution design.''' Reads and DML do NOT flow through DSv2
  * scans: [[loadTable]] deliberately reports no-such-table, so the
  * analyzer leaves `graft.db.table` unresolved and
  * [[graft.GraftPathRelations]] (the extensions' resolution rule) claims
  * it — the one machinery serves both the path and the named form, with
  * MoR delete resolution, evolution superset schemas and manifest
  * pruning intact. A DSv2 `Table` would need a parallel Scan/Write
  * implementation and would hand MERGE/UPDATE/DELETE to Spark's
  * row-level-operation planner instead of the engine's. `DESCRIBE
  * TABLE [EXTENDED]` and `DROP TABLE` — whose V2 paths resolve through
  * `loadTable` — are instead claimed by the extensions' DML rule
  * ([[graft.GraftSqlDml]]): DESCRIBE answers from the manifest, DROP
  * deletes the table directory (purge semantics).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private[graft] var warehouse: Path = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse")
    warehouse = Paths.get(w)
  }

  override def name(): String = catalogName

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(warehouse)(_.resolve(_))

  private def dirOf(ident: Identifier): Path =
    nsPath(ident.namespace).resolve(ident.name)

  private def tableAt(ident: Identifier): SnapshotTable =
    SnapshotTable.at(dirOf(ident).toString)

  private def childDirs(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator.asScala.filter(d => Files.isDirectory(d) &&
        !d.getFileName.toString.startsWith(".")).toSeq
      finally s.close()
    }

  // ---- tables ----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = nsPath(namespace)
    if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    childDirs(ns).filter(d => SnapshotTable.at(d.toString).exists)
      .map(d => Identifier.of(namespace, d.getFileName.toString)).toArray
  }

  override def tableExists(ident: Identifier): Boolean = tableAt(ident).exists

  /** Always reports no-such-table — see the class doc: relations must
    * stay unresolved so the extensions' analyzer rule serves them
    * through the engine's own read/DML plans.
    */
  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)

  /** `CREATE TABLE` (no AS SELECT): an empty table with the declared
    * schema. Partitioning takes the FULL Iceberg transform set like
    * CTAS — `PARTITIONED BY (bucket(8, id), days(ts), ...)` records the
    * derivation as `graft.transform.*` properties (one model: writes
    * derive the hidden column at commit, manifest pruning reads the
    * same property), identity columns partition directly.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val tbl = tableAt(ident)
    if (tbl.exists) throw new TableAlreadyExistsException(ident)
    val (pcols, transformProps) = graft.GraftSqlDml.resolveTransforms(
      schema.fields.toSeq, partitions.toSeq, "declared schema")
    val spark = SparkSession.active
    val props = (properties.asScala.toMap --
      Seq(TableCatalog.PROP_OWNER, TableCatalog.PROP_PROVIDER)) ++
      transformProps
    Files.createDirectories(dirOf(ident).getParent)
    tbl.createOrReplace(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      pcols, props)
    GraftCatalogTable(ident, schema, props)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; use SnapshotTable.evolveSchema / " +
        "evolvePartitioning or MERGE ... WITH SCHEMA EVOLUTION")

  override def dropTable(ident: Identifier): Boolean =
    SnapshotTable.at(dirOf(ident).toString).drop()

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirOf(newIdent).getParent)
    Files.move(dirOf(oldIdent), dirOf(newIdent))
  }

  // ---- namespaces ------------------------------------------------------

  private def isNamespaceDir(p: Path): Boolean =
    !SnapshotTable.at(p.toString).exists

  override def listNamespaces(): Array[Array[String]] =
    childDirs(warehouse).filter(isNamespaceDir)
      .map(d => Array(d.getFileName.toString)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val ns = nsPath(namespace)
      if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
      childDirs(ns).filter(isNamespaceDir)
        .map(d => namespace :+ d.getFileName.toString).toArray
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    Files.isDirectory(nsPath(namespace)) && isNamespaceDir(nsPath(namespace))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = nsPath(namespace)
    if (Files.exists(p)) throw new NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(p)
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "ALTER NAMESPACE is not supported (namespaces are bare directories)")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace)) false
    else if (childDirs(p).nonEmpty && !cascade)
      throw new NonEmptyNamespaceException(namespace)
    else { deleteRecursively(p); true }
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally s.close()
  }
}

/** Minimal `Table` handed back by [[GraftCatalog.createTable]] (the exec
  * only needs name/schema); never served from `loadTable`.
  */
private[catalog] final case class GraftCatalogTable(
    ident: Identifier, tableSchema: StructType, props: Map[String, String])
    extends Table {
  override def name(): String = ident.toString
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
  override def properties(): util.Map[String, String] = props.asJava
}

object GraftCatalog {
  private val ClassName = classOf[GraftCatalog].getName

  /** Is `cat` registered as a graft catalog in this session's conf? */
  def isRegistered(session: SparkSession, cat: String): Boolean =
    session.conf.getOption(s"spark.sql.catalog.$cat").contains(ClassName)

  def warehouseOf(session: SparkSession, cat: String): Option[String] =
    if (!isRegistered(session, cat)) None
    else session.conf.getOption(s"spark.sql.catalog.$cat.warehouse")

  private def mapped(session: SparkSession, parts: Seq[String]): Option[String] =
    if (parts.length < 2) None
    else warehouseOf(session, parts.head).map(w =>
      parts.init.tail.foldLeft(Paths.get(w))(_.resolve(_))
        .resolve(parts.last).toString)

  /** Every table path a multi-part SQL identifier may denote, in priority
    * order (callers pick the first whose table exists, or the first
    * candidate for creation):
    *
    *   1. `graft`.`</path>` — the path literal (the original surface;
    *      needs no registration);
    *   2. `<cat>.db....table` — `warehouse/db/.../table` when `cat` is a
    *      registered [[GraftCatalog]] (also covers 2-part `<cat>.table`
    *      at the warehouse root).
    */
  def pathCandidates(session: SparkSession, parts: Seq[String]): Seq[String] = {
    val literal = parts match {
      case Seq(cat, p) if cat.equalsIgnoreCase("graft") => Seq(p)
      case _ => Nil
    }
    literal ++ mapped(session, parts).toSeq
  }

  /** The path a NEW table at this identifier would occupy (CTAS / CREATE
    * TABLE claims): the path literal needs a '/' to be unmistakably ours
    * (the table doesn't exist yet, so no exists-check can disambiguate);
    * a registered catalog's named identifier maps through the warehouse.
    */
  def createPath(session: SparkSession, parts: Seq[String]): Option[String] =
    parts match {
      case Seq(cat, p) if cat.equalsIgnoreCase("graft") && p.contains("/") =>
        Some(p)
      case _ => mapped(session, parts)
    }
}
