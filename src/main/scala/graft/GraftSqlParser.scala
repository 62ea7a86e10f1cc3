package graft

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** The graft DDL statements Spark's grammar does not know — Iceberg's
  * partition-evolution and write-order spellings:
  *
  *   - `ALTER TABLE t ADD PARTITION FIELD <col | bucket(n,src) |
  *     days(src) | months(src) | years(src) | hours(src) |
  *     truncate(w,src)> [AS <name>]`
  *   - `ALTER TABLE t DROP PARTITION FIELD <col | transform>`
  *   - `ALTER TABLE t WRITE ORDERED BY [(]c1[, c2...][)]`
  *   - `ALTER TABLE t WRITE UNORDERED`
  *   - `ALTER TABLE t WRITE DISTRIBUTED BY PARTITION
  *     [LOCALLY ORDERED BY c1[, c2...]]`
  *   - `ALTER TABLE t WRITE LOCALLY ORDERED BY c1[, c2...]`
  *   - `ALTER TABLE t CREATE BRANCH|TAG [IF NOT EXISTS] x
  *     [AS OF VERSION n]` / `DROP BRANCH|TAG [IF EXISTS] x`
  *
  * Parsed here into [[GraftAlterTableStatement]] (executed during analysis
  * by the same hints-batch rule as every other graft DML — the statement
  * resolves to an empty relation); EVERYTHING else delegates verbatim to
  * Spark's parser, so the injection is invisible outside these shapes.
  * Iceberg ships the exact same surface as a parser extension
  * (`IcebergSparkSqlExtensionsParser`); the reference's users reach
  * partition DDL through partitioned CTAS (common/iceberg.py:116,144) —
  * this completes the DDL-first story for evolution.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseGraftStatement(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    GraftSqlParser.parseGraftStatement(sqlText, delegate)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(s: String): Expression =
    delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType =
    delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String): StructType =
    delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
}

sealed trait GraftAlterOp
final case class AddPartitionFieldOp(spec: String,
                                     name: Option[String]) extends GraftAlterOp
final case class DropPartitionFieldOp(spec: String) extends GraftAlterOp
final case class WriteOrderedByOp(cols: Seq[String]) extends GraftAlterOp
case object WriteUnorderedOp extends GraftAlterOp
/** `ALTER TABLE t WRITE DISTRIBUTED BY PARTITION [LOCALLY ORDERED BY
  * c1[, c2...]]` — Iceberg's hash-distribution spelling: sets
  * `write.graft.distribution-mode=hash`; like Iceberg's
  * SetWriteDistributionAndOrdering it REPLACES the write order — the
  * LOCALLY ORDERED BY tail becomes the per-task sort order, its absence
  * clears any previous one.
  */
final case class WriteDistributedOp(order: Seq[String]) extends GraftAlterOp
/** `ALTER TABLE t WRITE LOCALLY ORDERED BY c1[, c2...]` — per-task sort
  * with NO required distribution (`write.graft.distribution-mode=none`).
  */
final case class WriteLocallyOrderedOp(cols: Seq[String]) extends GraftAlterOp
/** `ALTER TABLE t CREATE [OR REPLACE] BRANCH|TAG [IF NOT EXISTS] x
  * [AS OF VERSION n] [RETAIN n DAYS|HOURS|MINUTES]
  * [WITH SNAPSHOT RETENTION n SNAPSHOTS [m DAYS|HOURS|MINUTES] |
  *  m DAYS|HOURS|MINUTES]` / `REPLACE BRANCH|TAG x [...]` — the
  * Iceberg SQL ref spellings, routed to the existing branch/tag API
  * (the CALL create_branch/create_tag surface stays). `orReplace` moves
  * an existing ref; `replaceOnly` additionally requires it to exist.
  * `RETAIN` sets the ref's own max age; `WITH SNAPSHOT RETENTION`
  * (branches only) protects lineage snapshots from expiry.
  */
final case class CreateRefOp(isBranch: Boolean, name: String,
                             version: Option[Long],
                             ifNotExists: Boolean,
                             orReplace: Boolean = false,
                             replaceOnly: Boolean = false,
                             maxRefAgeMs: Option[Long] = None,
                             minSnapshotsToKeep: Option[Int] = None,
                             maxSnapshotAgeMs: Option[Long] = None)
    extends GraftAlterOp
final case class DropRefOp(isBranch: Boolean, name: String,
                           ifExists: Boolean) extends GraftAlterOp
/** `ALTER TABLE t SET|DROP IDENTIFIER FIELDS a[, b...]` — Iceberg's
  * row-identity DDL, recorded as an engine-fenced table property the
  * changelog machinery defaults its keys from.
  */
final case class SetIdentifierFieldsOp(cols: Seq[String]) extends GraftAlterOp
final case class DropIdentifierFieldsOp(cols: Seq[String]) extends GraftAlterOp

/** Unresolved carrier for a parsed graft ALTER statement; the hints-batch
  * rule executes it and substitutes an empty relation. Never resolved —
  * if no rule claims it (extensions not installed) analysis fails loudly
  * instead of silently dropping the statement.
  */
final case class GraftAlterTableStatement(ident: Seq[String],
                                          op: GraftAlterOp) extends LeafNode {
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false
}

/** Iceberg-analog VIEW DDL over VERSIONED stored view metadata
  * ([[graft.table.ViewStore]]):
  *
  *   - `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] graft.`<path>` AS <query>`
  *   - `DROP VIEW [IF EXISTS] graft.`<path>``
  *   - `SHOW VIEWS IN graft.`<dir>`` → (view_name, current_version) rows
  *
  * Only the unmistakable ``graft.`<path>` `` spelling is claimed —
  * session-catalog and TEMPORARY view DDL delegates to Spark untouched
  * (those spellings never carry the graft path literal).
  */
sealed trait GraftViewOp
final case class CreateViewOp(orReplace: Boolean, ifNotExists: Boolean,
                              sql: String) extends GraftViewOp
/** `ALTER VIEW v AS <query>` — Iceberg/Spark semantics: the view must
  * already exist; the new definition lands as the next stored version.
  */
final case class AlterViewOp(sql: String) extends GraftViewOp
final case class DropViewOp(ifExists: Boolean) extends GraftViewOp
case object ShowViewsOp extends GraftViewOp
/** `SHOW CREATE VIEW v` → one `createtab_stmt` row reconstructing the
  * current stored definition (the Trino/MySQL spelling; Spark's own
  * `SHOW CREATE TABLE` also serves graft views).
  */
case object ShowCreateViewOp extends GraftViewOp

final case class GraftViewStatement(ident: Seq[String],
                                    op: GraftViewOp) extends LeafNode {
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false
}

object GraftSqlParser {
  // the table identifier is captured raw (backquoted path literals hold
  // '/', '.', spaces) and re-parsed by the DELEGATE's identifier grammar
  private val AddRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)(?:\s+AS\s+([A-Za-z_][A-Za-z0-9_]*))?\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""".r
  private val OrderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+ORDERED\s+BY\s+(.+?)\s*;?\s*$""".r
  private val UnorderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+UNORDERED\s*;?\s*$""".r
  private val DistributedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+DISTRIBUTED\s+BY\s+PARTITION(?:\s+LOCALLY\s+ORDERED\s+BY\s+(.+?))?\s*;?\s*$""".r
  private val LocallyOrderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+WRITE\s+LOCALLY\s+ORDERED\s+BY\s+(.+?)\s*;?\s*$""".r
  // shared optional tail: [RETAIN n UNIT] [WITH SNAPSHOT RETENTION ...]
  private val RefTail =
    """(?:\s+RETAIN\s+(\d+)\s+(DAYS|HOURS|MINUTES))?(?:\s+WITH\s+SNAPSHOT\s+RETENTION\s+(.+?))?"""
  private val CreateRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+CREATE\s+(?:(OR\s+REPLACE)\s+)?(BRANCH|TAG)\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([A-Za-z][A-Za-z0-9_-]*)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?""" +
      RefTail + """\s*;?\s*$""").r
  private val ReplaceRefRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+REPLACE\s+(BRANCH|TAG)\s+([A-Za-z][A-Za-z0-9_-]*)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?""" +
      RefTail + """\s*;?\s*$""").r
  private val SnapRetSnapshots =
    """(?is)^(\d+)\s+SNAPSHOTS(?:\s+(\d+)\s+(DAYS|HOURS|MINUTES))?$""".r
  private val SnapRetAge = """(?is)^(\d+)\s+(DAYS|HOURS|MINUTES)$""".r
  private val SetIdFieldsRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+SET\s+IDENTIFIER\s+FIELDS\s+(.+?)\s*;?\s*$""".r
  private val DropIdFieldsRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+IDENTIFIER\s+FIELDS\s+(.+?)\s*;?\s*$""".r
  private val DropRefRe =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+(BRANCH|TAG)\s+(?:(IF\s+EXISTS)\s+)?([A-Za-z][A-Za-z0-9_-]*)\s*;?\s*$""".r
  // VIEW DDL claims two spellings: the unambiguous graft.`<path>`
  // literal, and a ≥2-part NAMED identifier whose head is a REGISTERED
  // GraftCatalog in the active session (checked at match time — the
  // named-catalog surface the reference addresses tables through must
  // serve views too, r10 verdict). Anything else (temp views,
  // session-catalog views, foreign catalogs) delegates verbatim.
  private val GraftIdent = """graft\s*\.\s*`[^`]+`"""
  private val NamedSeg = """(?:[A-Za-z_][A-Za-z0-9_]*|`[^`/]+`)"""
  private val ViewIdent =
    s"""(?:$GraftIdent|$NamedSeg(?:\\s*\\.\\s*$NamedSeg)+)"""
  private val CreateViewRe =
    ("""(?is)^\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?VIEW\s+""" +
      """(?:(IF\s+NOT\s+EXISTS)\s+)?(""" + ViewIdent +
      """)\s+AS\s+(.+?)\s*;?\s*$""").r
  private val AlterViewRe =
    ("""(?is)^\s*ALTER\s+VIEW\s+(""" + ViewIdent +
      """)\s+AS\s+(.+?)\s*;?\s*$""").r
  private val DropViewRe =
    ("""(?is)^\s*DROP\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(""" + ViewIdent +
      """)\s*;?\s*$""").r
  private val ShowViewsRe =
    ("""(?is)^\s*SHOW\s+VIEWS\s+IN\s+(""" + ViewIdent + """)\s*;?\s*$""").r
  private val ShowCreateViewRe =
    ("""(?is)^\s*SHOW\s+CREATE\s+VIEW\s+(""" + ViewIdent +
      """)\s*;?\s*$""").r

  /** Is this matched view identifier OURS to claim? The graft-path
    * literal always is; a named identifier only when its head part is a
    * registered [[graft.catalog.GraftCatalog]] in the active session
    * (no active session → never claim — the statement delegates and
    * Spark's own resolution applies).
    */
  private def claimableViewIdent(raw: String,
                                 parts: => Seq[String]): Boolean =
    raw.trim.matches(GraftIdent) ||
      // by-name + Try: a guard must never throw — an identifier the
      // delegate's grammar rejects simply isn't ours to claim
      scala.util.Try(parts).toOption.exists(p =>
        p.length >= 2 &&
          org.apache.spark.sql.SparkSession.getActiveSession.exists(s =>
            graft.catalog.GraftCatalog.isRegistered(s, p.head)))

  /** A `(c1, c2)` / `c1, c2` write-order column list: plain ascending
    * names only (shared by every WRITE ... ORDERED BY spelling).
    */
  private def orderCols(raw: String, what: String): Seq[String] = {
    val inner = raw.trim.stripPrefix("(").stripSuffix(")")
    val cols = inner.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(cols.nonEmpty, s"$what needs at least one column")
    val bad = cols.filterNot(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
    require(bad.isEmpty,
      s"$what supports plain ascending columns only, got: " +
        bad.mkString(", "))
    cols
  }

  private def identifierCols(raw: String): Seq[String] = {
    val cols = raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(cols.nonEmpty, "IDENTIFIER FIELDS needs at least one column")
    val bad = cols.filterNot(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
    require(bad.isEmpty,
      s"IDENTIFIER FIELDS takes plain column names, got: ${bad.mkString(", ")}")
    cols
  }

  private def unitMs(n: String, unit: String): Long =
    n.toLong * (unit.toUpperCase match {
      case "DAYS"    => 86400000L
      case "HOURS"   => 3600000L
      case "MINUTES" => 60000L
    })

  private def retainMs(n: String, unit: String): Option[Long] =
    if (n == null) None else Some(unitMs(n, unit))

  /** The `WITH SNAPSHOT RETENTION` tail: `n SNAPSHOTS [m UNIT]` or
    * `m UNIT` alone (Iceberg's grammar). Branches only — a tag has no
    * lineage of its own to retain.
    */
  private def parseSnapshotRetention(kind: String,
      raw: String): (Option[Int], Option[Long]) = raw match {
    case null => (None, None)
    case _ =>
      require(kind.equalsIgnoreCase("branch"),
        "WITH SNAPSHOT RETENTION applies to branches only")
      raw.trim match {
        case SnapRetSnapshots(n, m, u) =>
          (Some(n.toInt), if (m == null) None else Some(unitMs(m, u)))
        case SnapRetAge(m, u) => (None, Some(unitMs(m, u)))
        case other => throw new IllegalArgumentException(
          s"WITH SNAPSHOT RETENTION expects 'n SNAPSHOTS [m DAYS|HOURS|" +
            s"MINUTES]' or 'm DAYS|HOURS|MINUTES', got: $other")
      }
  }

  private[graft] def parseGraftStatement(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    def ident(t: String): Seq[String] = delegate.parseMultipartIdentifier(t)
    sqlText match {
      case AddRe(t, spec, name) =>
        Some(GraftAlterTableStatement(ident(t),
          AddPartitionFieldOp(spec.trim, Option(name))))
      case DropRe(t, spec) =>
        Some(GraftAlterTableStatement(ident(t),
          DropPartitionFieldOp(spec.trim)))
      case OrderedRe(t, colsRaw) =>
        Some(GraftAlterTableStatement(ident(t),
          WriteOrderedByOp(orderCols(colsRaw, "WRITE ORDERED BY"))))
      case UnorderedRe(t) =>
        Some(GraftAlterTableStatement(ident(t), WriteUnorderedOp))
      case DistributedRe(t, colsRaw) =>
        Some(GraftAlterTableStatement(ident(t), WriteDistributedOp(
          if (colsRaw == null) Nil
          else orderCols(colsRaw, "LOCALLY ORDERED BY"))))
      case LocallyOrderedRe(t, colsRaw) =>
        Some(GraftAlterTableStatement(ident(t), WriteLocallyOrderedOp(
          orderCols(colsRaw, "WRITE LOCALLY ORDERED BY"))))
      case CreateRefRe(t, orr, kind, ine, name, ver, retN, retU, snapRet) =>
        require(orr == null || ine == null,
          "CREATE OR REPLACE and IF NOT EXISTS are mutually exclusive")
        val (minKeep, snapAge) = parseSnapshotRetention(kind, snapRet)
        Some(GraftAlterTableStatement(ident(t),
          CreateRefOp(kind.equalsIgnoreCase("branch"), name,
            Option(ver).map(_.toLong), ifNotExists = ine != null,
            orReplace = orr != null,
            maxRefAgeMs = retainMs(retN, retU),
            minSnapshotsToKeep = minKeep, maxSnapshotAgeMs = snapAge)))
      case ReplaceRefRe(t, kind, name, ver, retN, retU, snapRet) =>
        val (minKeep, snapAge) = parseSnapshotRetention(kind, snapRet)
        Some(GraftAlterTableStatement(ident(t),
          CreateRefOp(kind.equalsIgnoreCase("branch"), name,
            Option(ver).map(_.toLong), ifNotExists = false,
            orReplace = true, replaceOnly = true,
            maxRefAgeMs = retainMs(retN, retU),
            minSnapshotsToKeep = minKeep, maxSnapshotAgeMs = snapAge)))
      case SetIdFieldsRe(t, colsRaw) =>
        Some(GraftAlterTableStatement(ident(t),
          SetIdentifierFieldsOp(identifierCols(colsRaw))))
      case DropIdFieldsRe(t, colsRaw) =>
        Some(GraftAlterTableStatement(ident(t),
          DropIdentifierFieldsOp(identifierCols(colsRaw))))
      case DropRefRe(t, kind, ie, name) =>
        Some(GraftAlterTableStatement(ident(t),
          DropRefOp(kind.equalsIgnoreCase("branch"), name,
            ifExists = ie != null)))
      case CreateViewRe(orr, ine, t, viewSql)
          if claimableViewIdent(t, ident(t)) =>
        require(orr == null || ine == null,
          "CREATE OR REPLACE and IF NOT EXISTS are mutually exclusive")
        Some(GraftViewStatement(ident(t),
          CreateViewOp(orReplace = orr != null, ifNotExists = ine != null,
            sql = viewSql.trim)))
      case AlterViewRe(t, viewSql) if claimableViewIdent(t, ident(t)) =>
        Some(GraftViewStatement(ident(t), AlterViewOp(viewSql.trim)))
      case DropViewRe(ie, t) if claimableViewIdent(t, ident(t)) =>
        Some(GraftViewStatement(ident(t), DropViewOp(ifExists = ie != null)))
      case ShowViewsRe(t) if claimableViewIdent(t, ident(t)) =>
        Some(GraftViewStatement(ident(t), ShowViewsOp))
      case ShowCreateViewRe(t) if claimableViewIdent(t, ident(t)) =>
        Some(GraftViewStatement(ident(t), ShowCreateViewOp))
      case _ => None
    }
  }
}
