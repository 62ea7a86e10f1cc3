package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StringType

import graft.functions.Registry
import graft.table.SnapshotTable

/** Cluster-deployable session extensions — the idiomatic Spark entry
  * point for the whole engine (the analog of how the reference's users
  * get Iceberg by setting `spark.sql.extensions=...IcebergSparkSessionExtensions`,
  * common/spark.py:23-30). Activate with
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions()(_))`)
  * and every session on the cluster gets, with no code changes:
  *
  *   - all `graft_*` SQL functions (codegen'd Catalyst expressions,
  *     [[graft.functions.Registry.builders]]);
  *   - `graft`.`/path/to/table` table identifiers: a resolution rule
  *     turns them into snapshot-table reads (sequence-resolved under
  *     pending MoR deletes, superset-schema after evolution) so plain
  *     `spark.sql` can query engine tables without touching the Scala
  *     API;
  *   - NAMED `catalog.db.table` identifiers for the same full surface
  *     (SELECT/CTAS/MERGE/UPDATE/DELETE/INSERT + @ suffixes) when a
  *     [[graft.catalog.GraftCatalog]] is registered
  *     (`spark.sql.catalog.<name>` + `.warehouse`) — the reference's
  *     Glue-style `database.table` addressing.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Registry", name), builder))
    }
    ext.injectResolutionRule(GraftPathRelations)
    // Iceberg-style partition-evolution / write-order DDL has no Spark
    // grammar — a delegating parser adds exactly those statements
    ext.injectParser((_, parser) => new GraftSqlParser(parser))
    // CTAS must be claimed BEFORE the Resolution batch:
    // ResolveSessionCatalog converts CreateTableAsSelect into a session-
    // catalog V1 command ahead of any injected resolution rule; the
    // hint-resolution slot runs in the earlier Hints batch, where the
    // statement still carries its unresolved graft identifier.
    ext.injectHintResolutionRule(GraftCtas)
  }
}

/** Early (hints-batch) claims of statements the Resolution batch would
  * otherwise convert or fail before injected rules run: CTAS
  * ([[GraftSqlDml.rewriteCtas]]), `CALL <cat>.system.<proc>` maintenance
  * procedures ([[GraftSqlDml.rewriteCall]] — ResolveProcedures would
  * demand a ProcedureCatalog), and `ALTER TABLE ADD/DROP COLUMNS`
  * ([[GraftSqlDml.rewriteAlter]] — ResolveSessionCatalog would convert
  * to a V1 command).
  */
case class GraftCtas(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftSqlDml.rewriteCtas(session, plan)
      .orElse(GraftSqlDml.rewriteCall(session, plan))
      .orElse(GraftSqlDml.rewriteAlter(session, plan))
      .orElse(GraftSqlDml.rewriteMetaAgg(session, plan))
      .getOrElse(plan)
}

/** Analyzer rule: `graft`.`<path>` → the table's read plan. Matches only
  * two-part identifiers whose first part is `graft` AND whose path holds
  * a committed table, so genuine catalog tables in a database that
  * happens to be called `graft` fall through to the normal resolver.
  * `transformUp` (not `resolveOperators`) keeps to public TreeNode API;
  * the match is idempotent — it only ever fires on unresolved relations.
  *
  * An `@` suffix selects time travel / metadata relations (the SQL-side
  * analog of Iceberg's `VERSION AS OF` / `TIMESTAMP AS OF` and
  * `db.table.history` / `db.table.files`):
  *
  *   - ``graft.`/path@v3` ``       — snapshot version 3
  *   - ``graft.`/path@ts1700000000000` `` — latest snapshot ≤ epoch-millis
  *   - ``graft.`/path@history` ``  — snapshot history relation
  *   - ``graft.`/path@files` ``    — live data-file relation
  *   - ``graft.`/path@refs` ``     — named refs (main/tags/branches)
  *   - ``graft.`/path@snapshots` `` — per-snapshot commit summaries
  *   - ``graft.`/path@partitions` `` — per-partition file/row/byte totals
  *   - ``graft.`/path@delete_files` `` — pending MoR delete files
  *   - ``graft.`/path@position_deletes` `` — pending positional
  *     tombstone ROWS (file_path, pos)
  *   - ``graft.`/path@stats` ``    — stored per-column NDV estimates
  *   - ``graft.`/path@partition_stats` `` — per-partition rollups +
  *     delete debt + sketch-store staleness
  *   - ``graft.`/path@entries` ``  — per-entry rows of the current
  *     snapshot (status added/existing/deleted, delete files included)
  *   - ``graft.`/path@all_files` `` — distinct data files across ALL
  *     retained snapshots (live and dead)
  *   - ``graft.`/path@all_manifests` `` — manifest rollups per snapshot
  *   - ``graft.`/path@all_entries` `` — @entries stacked for every
  *     retained snapshot (each against its own lineage parent)
  *   - ``graft.`/path@all_data_files` `` — alias of `@all_files`
  *     (data files only; delete files have their own relation)
  *   - ``graft.`/path@all_delete_files` `` — distinct delete files
  *     referenced by any retained snapshot (incl. already-compacted)
  *   - ``graft.`/path@metadata_log_entries` `` — one row per retained
  *     manifest document (timestamp, file, version, operation, head)
  *   - ``graft.`/path@lineage` `` — the data WITH Iceberg v3 row
  *     lineage (`_row_id`, `_last_updated_sequence_number`); requires
  *     `format-version=3`
  *
  * Unrecognized suffixes are treated as literal path characters.
  */
case class GraftPathRelations(session: SparkSession)
    extends Rule[LogicalPlan] {

  private val Suffixed =
    ("(.*)@(v[0-9]+|ts[0-9]+|history|files|refs|snapshots|partitions|" +
      "manifests|delete_files|position_deletes|stats|partition_stats|" +
      "entries|all_files|" +
      "all_manifests|all_entries|all_data_files|all_delete_files|" +
      "metadata_log_entries|lineage)$").r

  /** ``@<name>`` where `<name>` is a live TAG or BRANCH on the prefix
    * table (names cannot collide with the reserved [[Suffixed]] shapes —
    * `SnapshotTable.tag`/`branch` reject them, and the two share one
    * namespace so the suffix is unambiguous). A branch suffix reads the
    * branch HEAD.
    */
  private object TagSuffixed {
    private val Shape = "(.*)@([A-Za-z][A-Za-z0-9_-]*)$".r
    def unapply(ident: String): Option[(String, String)] = ident match {
      case Shape(p, s)
          if SnapshotTable.at(p).exists &&
            (SnapshotTable.at(p).tags.contains(s) ||
              SnapshotTable.at(p).branches.contains(s)) =>
        Some((p, s))
      case _ => None
    }
  }

  /** Candidate table paths for a relation identifier: the ``graft.`/p` ``
    * literal and/or a registered [[graft.catalog.GraftCatalog]]'s
    * warehouse mapping of `cat.db.table` ([[GraftCatalog.pathCandidates]]).
    */
  private def cands(u: UnresolvedRelation): Seq[String] =
    graft.catalog.GraftCatalog.pathCandidates(session, u.multipartIdentifier)

  /** The first candidate naming a committed CURRENT table (no suffix) —
    * the shape pruned reads and DML may target.
    */
  private def existingPath(u: UnresolvedRelation): Option[String] =
    cands(u).find(c => SnapshotTable.at(c).exists)

  private def resolve(ident: String) = {
    val (path, suffix) = ident match {
      case Suffixed(p, s) if SnapshotTable.at(p).exists => (p, Some(s))
      case TagSuffixed(p, s)                            => (p, Some(s"tag:$s"))
      case _ => (ident, None)
    }
    val tbl = SnapshotTable.at(path)
    if (!tbl.exists) None
    else Some(suffix match {
      case Some("history")                 => tbl.history(session)
      case Some("files")                   => tbl.files(session)
      case Some("refs")                    => tbl.refs(session)
      case Some("snapshots")               => tbl.snapshots(session)
      case Some("partitions")              => tbl.partitions(session)
      case Some("manifests")               => tbl.manifests(session)
      case Some("delete_files")            => tbl.deleteFilesRelation(session)
      case Some("position_deletes")        => tbl.positionDeletesRelation(session)
      case Some("stats")                   => tbl.statsRelation(session)
      case Some("partition_stats")         => tbl.partitionStatsRelation(session)
      case Some("entries")                 => tbl.entriesRelation(session)
      case Some("all_files")               => tbl.allFilesRelation(session)
      case Some("all_manifests")           => tbl.allManifestsRelation(session)
      case Some("all_entries")             => tbl.allEntriesRelation(session)
      // data-file-only by construction (delete files live in
      // @all_delete_files) — the two names answer the same relation
      case Some("all_data_files")          => tbl.allFilesRelation(session)
      case Some("all_delete_files")        => tbl.allDeleteFilesRelation(session)
      case Some("metadata_log_entries")    => tbl.metadataLogRelation(session)
      case Some("lineage")                 => tbl.readLineage(session)
      case Some(t) if t.startsWith("tag:") =>
        val n = t.drop(4)
        if (tbl.tags.contains(n)) tbl.readTag(session, n)
        else tbl.readBranch(session, n)
      case Some(v) if v.startsWith("ts")   => tbl.readAsOf(session, v.drop(2).toLong)
      case Some(v) if v.startsWith("v")    => tbl.readVersion(session, v.drop(1).toLong)
      case None =>
        // WAP session mode reads the STAGED branch when it exists on
        // this table (Iceberg `spark.wap.branch` read semantics: the
        // session audits what it writes); explicit suffixes above win,
        // and tables without the branch serve main — a session may stage
        // one pipeline's table while reading reference tables normally.
        session.conf.getOption("graft.wap.branch").filter(_.nonEmpty) match {
          case Some(b) if tbl.branches.contains(b) =>
            tbl.readBranch(session, b)
          case _ => tbl.read(session)
        }
    })
  }

  /** Resolve a relation through its first live candidate (current table
    * or recognized @ suffix).
    */
  private def resolveAny(u: UnresolvedRelation) =
    cands(u).iterator.map(resolve).collectFirst { case Some(df) => df }

  /** The snapshot table a DML statement targets. Plain identifiers write
    * `main` — unless the session conf `graft.wap.branch` names a branch,
    * in which case every DML commit stages THERE (Iceberg's
    * `spark.wap.branch` write-audit-publish session mode; loud when the
    * branch doesn't exist on the target), or `graft.wap.id` names a
    * write-audit-publish id, in which case commits stage on an
    * auto-created `wap_<id>` branch that READS NEVER SERVE (Iceberg's
    * `spark.wap.id` semantics: staged snapshots stay invisible until
    * `CALL publish_changes`) — setting both confs is refused, they are
    * contradictory audit models. A `@<branch>` suffix stages on
    * that branch explicitly; `@<tag>` and time-travel/metadata suffixes
    * are rejected loudly — tags are immutable and DML can only move a
    * lineage HEAD.
    */
  private def dmlTarget(table: LogicalPlan): Option[SnapshotTable] =
    table match {
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, child) =>
        dmlTarget(child)
      case u: UnresolvedRelation =>
        existingPath(u) match {
          case Some(p) =>
            val tbl = SnapshotTable.at(p)
            val wapBranch = session.conf.getOption("graft.wap.branch")
              .filter(_.nonEmpty)
            val wapId = session.conf.getOption("graft.wap.id")
              .filter(_.nonEmpty)
            require(wapBranch.isEmpty || wapId.isEmpty,
              "both graft.wap.branch and graft.wap.id are set — the " +
                "branch-audit and id-audit modes are mutually exclusive")
            (wapBranch, wapId) match {
              case (Some(b), _) =>
                require(tbl.branches.contains(b),
                  s"graft.wap.branch='$b' but $p has no such branch — " +
                    "CALL graft.system.create_branch first")
                Some(tbl.atBranch(b))
              case (_, Some(id)) =>
                val b = SnapshotTable.wapBranchName(id)
                if (!tbl.branches.contains(b)) tbl.branch(b)
                Some(tbl.atBranch(b))
              case _ => Some(tbl)
            }
          case None =>
            cands(u).collectFirst {
              case TagSuffixed(p, s)
                  if SnapshotTable.at(p).branches.contains(s) =>
                // explicit branch write (WAP staging through the suffix)
                SnapshotTable.at(p).atBranch(s)
            }.orElse {
              cands(u).foreach {
                case Suffixed(p, s) if SnapshotTable.at(p).exists =>
                  throw new UnsupportedOperationException(
                    s"cannot write through the @$s relation — DML targets " +
                      "a lineage head only")
                case TagSuffixed(_, s) =>
                  throw new UnsupportedOperationException(
                    s"cannot write through the @$s tag relation — tags are " +
                      "immutable; write to a branch or main")
                case _ =>
              }
              None
            }
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // SQL DML against graft tables: MERGE INTO / UPDATE / DELETE execute
    // through the engine's merge/rewrite machinery and replace the
    // statement with an empty relation (the DML-returns-nothing shape).
    // Executed during analysis — the same session-extension slot Iceberg
    // uses, without a DSv2 catalog to hang row-level-operation plans on.
    GraftSqlDml.rewrite(session, plan, dmlTarget) match {
      case Some(replaced) => return replaced
      case None =>
    }
    plan.transformDown {
      // SELECT ... WHERE over a graft table prunes AT THE MANIFEST: the
      // Filter directly above the relation resolves through the pruned
      // scan (files whose bounds exclude the predicate are never listed),
      // with the Filter itself kept on top for exact row-level semantics
      // — selection is conservative, so this is purely an IO cut.
      // transformDown so the Filter is seen before its child relation.
      case f: Filter =>
        f.child match {
          case u: UnresolvedRelation =>
            existingPath(u).map(p =>
              f.copy(child = prunedRead(p, f.condition, None))).getOrElse(f)
          case sa: SubqueryAlias =>
            sa.child match {
              case u: UnresolvedRelation =>
                existingPath(u).map(p =>
                  f.copy(child = sa.copy(child =
                    prunedRead(p, f.condition, Some(sa.alias))))).getOrElse(f)
              case _ => f
            }
          case _ => f
        }
      // standard SQL time travel — `FROM t VERSION AS OF 3` /
      // `FROM t TIMESTAMP AS OF '...'` (the Iceberg spellings; the
      // `@v3`/`@ts<millis>` suffixes remain as the compact form).
      // VERSION takes the numeric snapshot version; TIMESTAMP takes any
      // foldable expression castable to a timestamp, evaluated in the
      // session time zone.
      case tt @ org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
            u: UnresolvedRelation, tsOpt, verOpt) =>
        existingPath(u).map { p =>
          val tbl = SnapshotTable.at(p)
          val df = (verOpt, tsOpt) match {
            case (Some(v), _) =>
              // Iceberg semantics: VERSION AS OF takes a snapshot
              // version OR a named ref — a tag reads its pinned
              // snapshot, a branch reads its head
              v.toLongOption match {
                case Some(ver) => tbl.readVersion(session, ver)
                case None if tbl.tags.contains(v) => tbl.readTag(session, v)
                case None if tbl.branches.contains(v) =>
                  tbl.readBranch(session, v)
                case None =>
                  throw new UnsupportedOperationException(
                    s"VERSION AS OF takes a numeric snapshot version or " +
                      s"a live tag/branch name; '$v' is neither on $p")
              }
            case (_, Some(ts)) => tbl.readAsOf(session, tsMillis(ts))
            case _             => tbl.read(session)
          }
          df.queryExecution.analyzed
        }.orElse {
          // METADATA relations time-travel too (Iceberg's
          // `t.files VERSION AS OF n`): `@files`/`@entries` scoped to
          // the named snapshot — a version number, a tag's pinned
          // snapshot, or a branch head. The other relations are either
          // already history-wide (@history/@snapshots/@all_*) or
          // head-only by nature (@refs).
          cands(u).collectFirst {
            case Suffixed(p, s @ ("files" | "entries"))
                if SnapshotTable.at(p).exists =>
              val tbl = SnapshotTable.at(p)
              val ver = (verOpt, tsOpt) match {
                case (Some(v), _) =>
                  v.toLongOption
                    .orElse(tbl.tags.get(v))
                    .orElse(tbl.branches.get(v))
                    .getOrElse(throw new UnsupportedOperationException(
                      s"VERSION AS OF takes a numeric snapshot version " +
                        s"or a live tag/branch name; '$v' is neither on $p"))
                case (_, Some(ts)) => tbl.versionAtOrBefore(tsMillis(ts))
                  .getOrElse(throw new IllegalArgumentException(
                    s"no snapshot at or before the timestamp on $p"))
                case _ => tbl.currentVersion
              }
              val df = if (s == "files") tbl.filesAt(session, ver)
                       else tbl.entriesAt(session, ver)
              df.queryExecution.analyzed
          }
        }.getOrElse(tt)
      case u: UnresolvedRelation if cands(u).nonEmpty =>
        resolveAny(u).map(_.queryExecution.analyzed).getOrElse {
          // stored VIEW: substitute the definition's parsed plan
          // (Iceberg SQL-representation semantics — re-resolved in THIS
          // session, so nested graft relations serve through these same
          // rules on the next fixpoint pass; a table at the path always
          // wins above). `@v<n>` time-travels the VIEW METADATA: the
          // archived definition re-parses against CURRENT table state —
          // views version their SQL, not the data (the Iceberg view
          // spec's model). A self-referencing chain can't resolve and
          // fails analysis loudly at the iteration limit.
          cands(u).iterator.map(viewPlan).collectFirst {
            case Some(plan) => plan
          }.getOrElse(u)
        }
    }
  }

  private val ViewVer = "(.*)@v([0-9]+)$".r

  private def viewPlan(ident: String): Option[LogicalPlan] = {
    import graft.table.ViewStore
    val (path, ver) = ident match {
      case ViewVer(p, v) if ViewStore.exists(p) => (p, Some(v.toLong))
      case _ => (ident, None)
    }
    if (!ViewStore.exists(path)) None
    else Some(SubqueryAlias(
      java.nio.file.Paths.get(path).getFileName.toString,
      session.sessionState.sqlParser.parsePlan(ver match {
        case Some(v) => ViewStore.sqlAt(path, v)
        case None => ViewStore.sql(path)
      })))
  }

  /** Evaluate a `TIMESTAMP AS OF` expression to epoch millis: foldable
    * only, cast through TimestampType in the session zone.
    */
  private def tsMillis(e: Expression): Long = {
    if (!e.foldable)
      throw new UnsupportedOperationException(
        s"TIMESTAMP AS OF takes a literal expression, got $e")
    val cast =
      if (e.dataType == org.apache.spark.sql.types.TimestampType) e
      else org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.TimestampType,
        Some(session.sessionState.conf.sessionLocalTimeZone))
    cast.eval() match {
      case micros: java.lang.Long => micros / 1000L
      case _ =>
        throw new UnsupportedOperationException(
          s"TIMESTAMP AS OF expression does not evaluate to a timestamp: $e")
    }
  }

  /** Pruned resolution of a filtered read. Column references the bounds
    * analysis may act on must be PROVABLY the relation's own: an
    * unqualified name resolves to the inner relation first, and a
    * qualifier must equal the relation's alias. Anything else — a
    * correlated outer reference whose name collides with one of our
    * columns would otherwise prune our files on the OUTER table's
    * predicate — is wrapped opaque, so the stats walk treats it as
    * unprunable. The kept Filter enforces exact semantics either way.
    */
  private def prunedRead(ident: String, cond: Expression,
                         alias: Option[String]): LogicalPlan = {
    // WAP session mode prunes against the STAGED branch head too — the
    // filtered and unfiltered reads must serve the same snapshot
    val tbl0 = SnapshotTable.at(ident)
    val tbl = session.conf.getOption("graft.wap.branch")
      .filter(_.nonEmpty) match {
      case Some(b) if tbl0.branches.contains(b) => tbl0.atBranch(b)
      case _ => tbl0
    }
    // nested STRUCT paths are provably ours too: Spark resolves the
    // inner scope first, so a multi-part name that binds as one of this
    // relation's struct leaf paths (directly, or with the relation's
    // own alias stripped — compared case-insensitively, like Spark's
    // identifier resolution) cannot be an outer reference. LAZY: the
    // schema parse + flatten only runs when a multi-part attribute
    // actually reaches the guard — never on the common flat-predicate
    // read path.
    lazy val nestedPaths: Set[String] = graft.table.FileStats.leafTypes(
      org.apache.spark.sql.types.StructType.fromDDL(
        tbl.currentManifest.schemaDdl))
      .collect { case (n, _) if n.contains(".") => n.toLowerCase }.toSet
    def innerStructPath(parts: Seq[String]): Boolean =
      nestedPaths(parts.mkString(".").toLowerCase) ||
        alias.exists(a => parts.length > 2 &&
          parts.head.equalsIgnoreCase(a) &&
          nestedPaths(parts.tail.mkString(".").toLowerCase))
    // transformUp: the wrapper's child is the attribute itself, and a
    // top-down transform would re-match it inside the wrapper forever
    val safe = cond.transformUp {
      case ua: UnresolvedAttribute
          if ua.nameParts.length > 1 &&
            !alias.exists(a => ua.nameParts.init == Seq(a)) &&
            !innerStructPath(ua.nameParts) =>
        org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(ua))
    }
    tbl.readPruned(session, GraftBridge.column(safe))
      .queryExecution.analyzed
  }
}

/** SQL DML → engine execution. The supported statement shapes map 1:1
  * onto the engine's write surface (anything else fails loudly with the
  * supported alternative — never a silent semantic change):
  *
  *   - `MERGE INTO graft.`/p` t USING src s ON t.k = s.k [AND ...]`
  *     with the reference's clauses (common/iceberg.py:237-244)
  *     `WHEN MATCHED AND s.op='D' THEN DELETE / WHEN MATCHED AND
  *     s.op='U' THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *`
  *     → [[SnapshotTable.merge]] (or mergeMoR when the table's recorded
  *     `graft.physical-write-mode` is merge-on-read), source as the
  *     change set;
  *   - the op-less upsert `WHEN MATCHED THEN UPDATE SET * / WHEN NOT
  *     MATCHED THEN INSERT *` → the same merge with every source row an
  *     'U' (not-matched rows insert per the unconditional clause);
  *   - `UPDATE graft.`/p` SET c = expr, ... [WHERE cond]` →
  *     [[SnapshotTable.updateWhere]] (stats-scoped CoW rewrite);
  *   - `DELETE FROM graft.`/p` [WHERE cond]` →
  *     [[SnapshotTable.deleteWhere]].
  *
  * A handled statement is replaced by an empty relation — executed
  * exactly once (the fixpoint's next pass sees the resolved
  * replacement).
  *
  * '''EXPLAIN executes DML.''' Because execution happens during ANALYSIS
  * (the only injection slot without a DSv2 catalog to hang row-level
  * plans on), `EXPLAIN MERGE/UPDATE/DELETE/CTAS/INSERT/DROP TABLE/
  * CALL/ALTER TABLE` — or
  * merely analyzing the statement without an action — PERFORMS the
  * write (for DROP: the delete; for CALL: the procedure). There is no
  * reliable in-rule signal that analysis was triggered by an
  * `ExplainCommand` (the command re-analyzes its stored plan through the
  * ordinary entry point at run time). Dry-run a graft DML statement by
  * reading the table instead; the same caveat is called out in
  * README.md's SQL section.
  */
private[graft] object GraftSqlDml {
  /** Alias names under which a statement's columns may legitimately be
    * qualified: every `SubqueryAlias` wrapped around the relation.
    */
  private def aliasesOf(plan: LogicalPlan): Set[String] = plan match {
    case sa: SubqueryAlias => aliasesOf(sa.child) + sa.alias
    case _ => Set.empty
  }

  /** Bind an attribute reference to a bare engine column name. A
    * single-part name binds directly; a two-part name binds ONLY when its
    * qualifier is one of the statement's declared aliases. Anything else
    * — a nested struct field (`SET a.b = 1`) or a stray qualifier — must
    * NOT fall through to the leaf name: it would silently update a
    * top-level column that happens to share it (r4 ADVICE).
    */
  private def attrKey(e: Expression, quals: Set[String]): Option[String] =
    e match {
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
        Some(ua.nameParts.head)
      case ua: UnresolvedAttribute
          if ua.nameParts.length == 2 &&
            quals.exists(_.equalsIgnoreCase(ua.nameParts.head)) =>
        Some(ua.nameParts.last)
      case _ => None
    }

  /** ON-condition → merge keys: every conjunct must be `t.k = s.k` with
    * the SAME column name both sides (the engine merges on shared
    * natural-key columns) and qualifiers, when present, drawn from the
    * statement's target/source aliases.
    */
  private def equiKeys(cond: Expression,
                       quals: Set[String]): Option[Seq[String]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    val keys = conjuncts(cond).map {
      case EqualTo(a, b) =>
        for {
          an <- attrKey(a, quals); bn <- attrKey(b, quals)
          if an.equalsIgnoreCase(bn)
        } yield an
      case _ => None
    }
    if (keys.forall(_.isDefined) && keys.nonEmpty) Some(keys.flatten)
    else None
  }

  /** Is `c` the clause condition `op = '<v>'`? */
  private def opEquals(c: Option[Expression], v: String,
                       quals: Set[String]): Boolean = c.exists {
    case EqualTo(a, Literal(s, StringType)) =>
      attrKey(a, quals).exists(_.equalsIgnoreCase(graft.core.MetaColumns.Op)) &&
        s != null && s.toString == v
    case EqualTo(Literal(s, StringType), a) =>
      attrKey(a, quals).exists(_.equalsIgnoreCase(graft.core.MetaColumns.Op)) &&
        s != null && s.toString == v
    case _ => false
  }

  private val empty = LocalRelation(Nil)

  /** One `createtab_stmt` row reconstructing a stored view's current
    * definition — the `SHOW CREATE VIEW` payload (also served from
    * Spark's own `SHOW CREATE TABLE` when the identifier names a view).
    */
  private[graft] def showCreateViewRelation(path: String): LogicalPlan = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val stmt =
      s"CREATE VIEW graft.`$path` AS\n${graft.table.ViewStore.sql(path)}"
    LocalRelation(
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "createtab_stmt", StringType, nullable = false)()),
      Seq(InternalRow(UTF8String.fromString(stmt))))
  }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"unsupported $what on a graft table; supported: MERGE INTO with " +
        "the reference clauses (MATCHED AND op='D' DELETE / MATCHED AND " +
        "op='U' UPDATE SET * / NOT MATCHED INSERT *) or the op-less " +
        "upsert (MATCHED UPDATE SET * / NOT MATCHED INSERT *), " +
        "UPDATE ... SET ... WHERE, DELETE FROM ... WHERE, " +
        "INSERT INTO/OVERWRITE [BY NAME | (cols)]")

  /** SQL `INSERT INTO` → append-only commit ([[SnapshotTable.append]]:
    * nothing rewritten, all live files carried by reference);
    * `INSERT OVERWRITE` → DYNAMIC partition overwrite
    * ([[SnapshotTable.overwritePartitions]] — Iceberg's semantics: only
    * the partitions the query produced replace, the rest carry;
    * unpartitioned tables full-replace). Column binding is strict-loud: a positional INSERT
    * must match the table's arity; an explicit column list or BY NAME may
    * omit columns (null-filled, standard SQL) but unknown names fail.
    */
  private def runInsert(session: SparkSession, tbl: SnapshotTable,
                        ins: InsertIntoStatement): Unit = {
    if (ins.partitionSpec.nonEmpty)
      unsupported("INSERT with a PARTITION clause (partition values ride " +
        "in the rows)")
    if (ins.ifPartitionNotExists) unsupported("INSERT ... IF NOT EXISTS")
    val m = tbl.currentManifest
    val schema = org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
    val df = GraftBridge.ofRows(session, ins.query)
    val named =
      if (ins.userSpecifiedCols.nonEmpty) {
        if (ins.userSpecifiedCols.length != df.columns.length)
          unsupported(s"INSERT column list arity " +
            s"(${ins.userSpecifiedCols.length} columns for " +
            s"${df.columns.length} query outputs)")
        val unknown = ins.userSpecifiedCols
          .filterNot(c => schema.exists(_.name.equalsIgnoreCase(c)))
        if (unknown.nonEmpty)
          unsupported(s"INSERT columns not in the table schema: " +
            unknown.mkString(", "))
        df.toDF(ins.userSpecifiedCols: _*)
      } else if (ins.byName) {
        val unknown = df.columns
          .filterNot(c => schema.exists(_.name.equalsIgnoreCase(c)))
        if (unknown.nonEmpty)
          unsupported(s"INSERT BY NAME columns not in the table schema: " +
            unknown.mkString(", "))
        df
      } else {
        // hidden partitioning: transform-DERIVED columns are the
        // engine's to compute (commitData re-derives them from their
        // source on every write), so a positional INSERT binds the
        // USER-FACING columns; full arity stays accepted for writers
        // that materialized the derived values themselves
        val derived = m.properties.keySet.collect {
          case k if k.startsWith(TransformPropPrefix) =>
            k.drop(TransformPropPrefix.length).toLowerCase
        }
        val visible = schema.filterNot(f => derived(f.name.toLowerCase))
        if (df.columns.length == schema.length)
          df.toDF(schema.map(_.name).toSeq: _*)
        else if (df.columns.length == visible.length)
          df.toDF(visible.map(_.name).toSeq: _*)
        else
          unsupported(s"positional INSERT arity (${df.columns.length} " +
            s"query outputs for ${schema.length} table columns, " +
            s"${visible.length} user-facing)")
      }
    val aligned = schema.toSeq.map { f =>
      named.columns.find(_.equalsIgnoreCase(f.name)) match {
        case Some(c) => named.col(c).cast(f.dataType).as(f.name)
        case None =>
          // omitted column: the declared WRITE default when one exists
          // (v3 default values), else the standard SQL null-fill
          m.properties.get(
            graft.table.SnapshotTable.WriteDefaultPrefix +
              f.name.toLowerCase) match {
            case Some(l) => org.apache.spark.sql.functions.expr(l)
              .cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
      }
    }
    val data = named.select(aligned: _*)
    // INSERT OVERWRITE on a partitioned table = DYNAMIC partition
    // overwrite (Iceberg's default): only the partitions the query
    // produced replace; the rest carry by reference
    if (ins.overwrite) tbl.overwritePartitions(session, data)
    else tbl.append(session, data)
  }

  /** A CTAS/CREATE target that is unmistakably ours even though the table
    * does not exist yet (no exists-check can disambiguate): the
    * `graft.</path>` literal (second part contains '/') or a registered
    * [[graft.catalog.GraftCatalog]] named identifier
    * ([[graft.catalog.GraftCatalog.createPath]]).
    */
  private def graftPathIdent(session: SparkSession,
                             name: LogicalPlan): Option[String] = name match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
      graft.catalog.GraftCatalog.createPath(session, u.nameParts)
    // ResolveCatalogs may have claimed the identifier before this rule
    // runs in the fixpoint — for the session catalog the path shape is
    // still unmistakably ours; for our own plugin, the plugin says so
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier =>
      r.catalog match {
        case g: graft.catalog.GraftCatalog =>
          Some((r.identifier.namespace.toSeq :+ r.identifier.name)
            .foldLeft(g.warehouse)(_.resolve(_)).toString)
        case _
            if r.identifier.namespace.toSeq == Seq("graft") &&
              r.identifier.name.contains("/") =>
          Some(r.identifier.name)
        case _ => None
      }
    case _ => None
  }

  /** CTAS with the FULL transform vocabulary in `PARTITIONED BY` —
    * Iceberg's main table-creation path (the reference planned
    * `bucket`/`days` partitioned CTAS, dmsdatabase1.py:79-85): identity
    * columns partition directly; `bucket(n, src)` / `days`/`months`/
    * `years`/`hours(src)` / `truncate(w, src)` become HIDDEN-partitioned
    * derived columns (Iceberg default names) — recorded as
    * `graft.transform.*` properties and materialized by the write
    * chokepoint, never supplied by the query.
    */
  /** Resolve a DSv2 partitioning list (identity + the Iceberg transform
    * set) against a schema: (partition columns in declared order,
    * `graft.transform.*` properties for the derived ones). Shared by
    * SQL CTAS/RTAS and [[graft.catalog.GraftCatalog.createTable]] — one
    * transform model everywhere (write derivation and manifest pruning
    * read the same property).
    */
  private[graft] def resolveTransforms(
      fields: Seq[org.apache.spark.sql.types.StructField],
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
      what: String): (Seq[String], Map[String, String]) = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, Literal => VLiteral}
    import graft.functions.Transforms
    def refOf(as: Seq[org.apache.spark.sql.connector.expressions.Expression])
        : Option[String] = as.collectFirst {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        nr.fieldNames.head
    }
    def intOf(as: Seq[org.apache.spark.sql.connector.expressions.Expression])
        : Option[Int] = as.collectFirst {
      case l: VLiteral[_] => l.value match {
        case i: java.lang.Integer => i.intValue
        case l2: java.lang.Long => l2.intValue
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString.toInt
        case o => o.toString.toInt
      }
    }
    // canonical source spelling from the schema; loud when absent
    def srcField(c: String) = fields
      .find(_.name.equalsIgnoreCase(c)).getOrElse(unsupported(
        s"partition transform source $c is not in the $what"))
    val resolved: Seq[(String, Option[(String, String)])] = partitioning.map { t =>
      val args = t.arguments.toSeq
      t.name.toLowerCase match {
        case "identity" =>
          val c = refOf(args).getOrElse(unsupported(
            s"partition transform $t (unsupported reference shape)"))
          (srcField(c).name, None)
        case other =>
          val spec: Transforms.Spec = other match {
            case "bucket" =>
              Transforms.Bucket(intOf(args).getOrElse(unsupported(
                s"bucket() needs an integer bucket count: $t")),
                refOf(args).getOrElse(unsupported(s"bucket() needs a column: $t")))
            case "days" | "day" | "months" | "month" | "years" | "year" |
                 "hours" | "hour" =>
              Transforms.TimeUnit(other.stripSuffix("s"),
                refOf(args).getOrElse(unsupported(s"$other() needs a column: $t")))
            case "truncate" =>
              Transforms.Truncate(intOf(args).getOrElse(unsupported(
                s"truncate() needs an integer width: $t")),
                refOf(args).getOrElse(unsupported(s"truncate() needs a column: $t")))
            case _ => unsupported(s"partition transform $t")
          }
          val sf = srcField(spec.src)
          val canon = spec match {
            case b: Transforms.Bucket => b.copy(src = sf.name)
            case u: Transforms.TimeUnit => u.copy(src = sf.name)
            case tr: Transforms.Truncate => tr.copy(src = sf.name)
          }
          val dt = Transforms.derivedType(canon, sf.dataType).getOrElse(
            unsupported(s"${canon.canonical} is undefined over " +
              s"${sf.dataType.simpleString} source ${sf.name}"))
          val name = canon.defaultName
          fields.find(_.name.equalsIgnoreCase(name)).foreach { f =>
            if (f.dataType != dt) unsupported(
              s"$what column ${f.name} collides with the derived " +
                s"partition field (${f.dataType.simpleString} vs " +
                s"${dt.simpleString})")
          }
          (name, Some(TransformPropPrefix + name -> canon.canonical))
      }
    }
    (resolved.map(_._1), resolved.flatMap(_._2).toMap)
  }

  private def runCtas(session: SparkSession, tbl: SnapshotTable,
                      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
                      tableSpec: Any, query: LogicalPlan): Unit = {
    val df = GraftBridge.ofRows(session, query)
    val (pcols, transformProps) =
      resolveTransforms(df.schema.fields.toSeq, partitioning, "CTAS output")
    val props = tableSpec match {
      case u: UnresolvedTableSpec => u.properties
      case t: org.apache.spark.sql.catalyst.plans.logical.TableSpec => t.properties
      case _ => Map.empty[String, String]
    }
    tbl.createOrReplace(df, pcols, props ++ transformProps)
  }

  private val TransformPropPrefix = "graft.transform."

  /** CTAS claims, run from the HINTS batch (before ResolveSessionCatalog
    * can turn the statement into a session-catalog V1 command).
    */
  def rewriteCtas(session: SparkSession,
                  plan: LogicalPlan): Option[LogicalPlan] =
    plan match {
      case c: CreateTableAsSelect =>
        graftPathIdent(session, c.name).map { path =>
          val tbl = SnapshotTable.at(path)
          if (tbl.exists) {
            if (!c.ignoreIfExists)
              throw new UnsupportedOperationException(
                s"graft table $path already exists — use CREATE OR REPLACE")
            // IF NOT EXISTS on an existing table: no-op, per SQL
          } else runCtas(session, tbl, c.partitioning, c.tableSpec, c.query)
          empty
        }
      case r: ReplaceTableAsSelect =>
        graftPathIdent(session, r.name).map { path =>
          val tbl = SnapshotTable.at(path)
          if (!tbl.exists && !r.orCreate)
            throw new UnsupportedOperationException(
              s"graft table $path does not exist — use CREATE OR REPLACE")
          runCtas(session, tbl, r.partitioning, r.tableSpec, r.query)
          empty
        }
      case _ => None
    }

  /** The committed table a maintenance/ALTER statement names. The string
    * form mirrors the reference's procedure calls (`'db.table'`,
    * common/iceberg.py:253-270): resolved through catalog `cat`'s
    * warehouse; when `cat` is the `graft` literal the string may also be
    * a table path.
    */
  private def namedTable(session: SparkSession, cat: String,
                         t: String): SnapshotTable = {
    val cands =
      (if (cat.equalsIgnoreCase("graft")) Seq(t) else Nil) ++
        graft.catalog.GraftCatalog.pathCandidates(
          session, cat +: t.split("\\.").toSeq)
    cands.find(p => SnapshotTable.at(p).exists)
      .map(SnapshotTable.at)
      .getOrElse(throw new IllegalArgumentException(
        s"no graft table '$t' under catalog $cat"))
  }

  /** `CALL <cat>.system.<proc>(...)` — the reference's entire maintenance
    * surface is spelled this way (`CALL iceberg.system.expire_snapshots /
    * remove_orphan_files / rewrite_data_files`, common/iceberg.py:253-270).
    * Claimed for `cat` = the `graft` literal or a registered
    * [[graft.catalog.GraftCatalog]]; routed to the engine ops
    * ([[SnapshotTable.expireSnapshots]]/[[SnapshotTable.removeOrphanFiles]]/
    * [[SnapshotTable.compact]]), plus the snapshot-management set Iceberg
    * ships as procedures: `rollback_to_snapshot`, `create_tag`/`drop_tag`,
    * `create_branch`/`drop_branch`, `fast_forward`. Args follow the
    * Iceberg signatures: first positional (or `table =>`) names the
    * table; optional named args `older_than` (TIMESTAMP or epoch
    * millis), `retain_last`, `target_file_size_bytes`, `delete_ratio`,
    * `version`, `name`. Unknown procedures and unknown/unevaluable args
    * fail loudly. Like all graft SQL DML, the call executes during
    * analysis and the statement resolves to an empty relation.
    */
  def rewriteCall(session: SparkSession,
                  plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case c: Call =>
      c.procedure match {
        case org.apache.spark.sql.catalyst.analysis.UnresolvedProcedure(
              Seq(cat, ns, proc))
            if ns.equalsIgnoreCase("system") &&
              (cat.equalsIgnoreCase("graft") ||
                graft.catalog.GraftCatalog.isRegistered(session, cat)) =>
          Some(runCall(session, cat, proc.toLowerCase, c.args)
            .getOrElse(empty))
        case _ => None
      }
    case _ => None
  }

  /** Evaluate a procedure argument (foldable scalars only) to a JVM
    * value, interpreting TIMESTAMP literals as epoch millis.
    */
  private def argValue(e: Expression): Any = {
    val v = e match {
      case f if f.foldable => f.eval()
      case _ => throw new UnsupportedOperationException(
        s"procedure argument must be a literal: $e")
    }
    (v, e.dataType) match {
      case (null, _) => null
      case (micros: Long, _: org.apache.spark.sql.types.TimestampType) =>
        micros / 1000L // epoch millis
      case (s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case (other, _) => other
    }
  }

  /** Run one procedure. Most are side-effecting and return None (the
    * CALL resolves to an empty relation); row-returning procedures —
    * `ancestors_of` — return the result plan instead, like Iceberg.
    */
  private def runCall(session: SparkSession, cat: String, proc: String,
                      args: Seq[Expression]): Option[LogicalPlan] = {
    // bind positional-then-named onto the procedure's declared parameters
    val params: Seq[String] = proc match {
      case "expire_snapshots" => Seq("table", "older_than", "retain_last")
      case "remove_orphan_files" => Seq("table", "older_than", "dry_run")
      case "rewrite_data_files" =>
        Seq("table", "target_file_size_bytes", "delete_ratio", "where",
          "strategy", "sort_order")
      case "rewrite_position_delete_files" =>
        Seq("table", "target_file_size_bytes")
      case "rewrite_manifests" => Seq("table")
      case "compute_table_stats" => Seq("table", "columns")
      case "compute_partition_stats" => Seq("table", "columns")
      case "ancestors_of" => Seq("table", "snapshot_id")
      case "rollback_to_snapshot" => Seq("table", "version")
      case "rollback_to_timestamp" => Seq("table", "timestamp")
      case "set_current_snapshot" => Seq("table", "snapshot_id", "version")
      case "cherrypick_snapshot" => Seq("table", "snapshot_id", "version")
      case "add_files" => Seq("table", "source_table", "source_dir")
      case "snapshot" => Seq("source_table", "table", "source_dir")
      case "migrate" => Seq("table")
      case "register_table" => Seq("table", "metadata_file", "source_path")
      case "publish_changes" => Seq("table", "wap_id")
      case "create_tag" | "create_branch" =>
        // retention args mirror Iceberg's ref fields (all epoch-ms ages)
        Seq("table", "name", "version", "max_ref_age_ms",
          "min_snapshots_to_keep", "max_snapshot_age_ms")
      case "drop_tag" | "drop_branch" => Seq("table", "name")
      case "fast_forward" =>
        // Iceberg's (table, branch, to); the two-arg legacy spelling
        // (forward MAIN to <branch>) binds its positional as `branch`
        Seq("table", "branch", "to", "name")
      case "create_changelog_view" =>
        Seq("table", "view", "from_version", "to_version",
          "identifier_columns", "from_timestamp", "to_timestamp",
          "net_changes", "lineage")
      case other => throw new UnsupportedOperationException(
        s"unknown procedure $cat.system.$other; supported: " +
          "expire_snapshots, remove_orphan_files, rewrite_data_files, " +
          "rewrite_position_delete_files, rewrite_manifests, " +
          "compute_table_stats, compute_partition_stats, ancestors_of, " +
          "rollback_to_snapshot, rollback_to_timestamp, " +
          "set_current_snapshot, cherrypick_snapshot, add_files, " +
          "snapshot, migrate, register_table, publish_changes, " +
          "create_tag, drop_tag, create_branch, drop_branch, " +
          "fast_forward, create_changelog_view")
    }
    val (named, positional) = args.partition(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedArgumentExpression])
    if (positional.length > params.length)
      throw new UnsupportedOperationException(
        s"$proc takes at most ${params.length} arguments")
    val bound: Map[String, Any] =
      positional.zip(params).map { case (e, p) => p -> argValue(e) }.toMap ++
        named.map {
          case n: org.apache.spark.sql.catalyst.expressions.NamedArgumentExpression =>
            val key = n.key.toLowerCase
            if (!params.contains(key))
              throw new UnsupportedOperationException(
                s"unknown argument '${n.key}' for $proc " +
                  s"(takes: ${params.mkString(", ")})")
            key -> argValue(n.value)
        }
    val tableName = bound.getOrElse("table",
      throw new UnsupportedOperationException(
        s"$proc needs a table argument")) match {
      case s: String => s
      case o => throw new UnsupportedOperationException(
        s"table argument must be a string, got $o")
    }
    // `snapshot`/`migrate` CREATE their table — every other procedure
    // requires it
    lazy val tbl =
      if (proc == "snapshot" || proc == "migrate") {
        val cands =
          (if (cat.equalsIgnoreCase("graft")) Seq(tableName) else Nil) ++
            graft.catalog.GraftCatalog.pathCandidates(
              session, cat +: tableName.split("\\.").toSeq)
        SnapshotTable.at(cands.headOption.getOrElse(tableName))
      } else namedTable(session, cat, tableName)
    val now = System.currentTimeMillis()
    def longArg(k: String): Option[Long] = bound.get(k).map {
      case l: Long => l
      case i: Int => i.toLong
      case o => throw new UnsupportedOperationException(
        s"argument $k must be integral, got $o")
    }
    def doubleArg(k: String): Option[Double] = bound.get(k).map {
      case d: Double => d
      case f: Float => f.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case o => throw new UnsupportedOperationException(
        s"argument $k must be numeric, got $o")
    }
    // older_than is a point in time (Iceberg semantics); the engine ops
    // take an age — convert against the same clock passed as nowMs
    def ageOf(k: String): Option[Long] =
      longArg(k).map(ts => math.max(0L, now - ts))
    if (proc == "ancestors_of")
      return Some(tbl.ancestorsOf(session, longArg("snapshot_id"))
        .queryExecution.analyzed)
    proc match {
      case "expire_snapshots" =>
        // row-returning like Iceberg's: one row per expired snapshot.
        // Unset args fall back to Iceberg's TABLE-PROPERTY defaults
        // (history.expire.max-snapshot-age-ms / min-snapshots-to-keep)
        // before the built-in 90d/90
        val props = tbl.currentManifest.properties
        val age = ageOf("older_than")
          .orElse(props.get("history.expire.max-snapshot-age-ms")
            .map(_.toLong))
          .getOrElse(90L * 24 * 3600 * 1000)
        val keep = longArg("retain_last").map(_.toInt)
          .orElse(props.get("history.expire.min-snapshots-to-keep")
            .map(_.toInt))
          .getOrElse(90)
        import session.implicits._
        return Some(tbl.expireSnapshots(age, keep, now)
          .toDF("expired_version").queryExecution.analyzed)
      case "remove_orphan_files" =>
        // one row per reclaimed path, like Iceberg's orphan_file_location;
        // size-routed: big tables sweep distributed (live-path census and
        // listing on executors), small tables on the driver. dry_run
        // (Iceberg's audit argument) lists without deleting.
        val age = ageOf("older_than").getOrElse(3L * 24 * 3600 * 1000)
        val dry = bound.get("dry_run") match {
          case None => false
          case Some(b: Boolean) => b
          case Some(o) => throw new UnsupportedOperationException(
            s"dry_run must be a boolean, got $o")
        }
        import session.implicits._
        return Some(tbl.removeOrphanFiles(session, age, now,
            graft.table.SnapshotTable.MaxDriverOrphanEntries, dry)
          .toDF("orphan_path").queryExecution.analyzed)
      case "rewrite_data_files" =>
        // where => '<predicate>' scopes the rewrite to partition groups
        // the manifest can't exonerate (Iceberg's filter arg)
        val whereCol = bound.get("where").map {
          case str: String => org.apache.spark.sql.GraftBridge.column(
            session.sessionState.sqlParser.parseExpression(str))
          case o => throw new UnsupportedOperationException(
            s"where must be a predicate string, got $o")
        }
        // Iceberg's write.target-file-size-bytes table property is the
        // default when the arg is unset
        val target = longArg("target_file_size_bytes")
          .orElse(tbl.currentManifest.properties
            .get("write.target-file-size-bytes").map(_.toLong))
          .getOrElse(64L * 1024 * 1024)
        def str(k: String): Option[String] = bound.get(k).map {
          case v: String => v
          case o => throw new UnsupportedOperationException(
            s"$k must be a string, got $o")
        }
        val ZOrderSpec = """(?i)zorder\s*\((.*)\)""".r
        (str("strategy").map(_.toLowerCase), str("sort_order")) match {
          case (Some("binpack") | None, None) =>
            tbl.compact(session, target, now,
              doubleArg("delete_ratio"), whereCol)
          case (Some("sort") | None, Some(order)) =>
            // layout rewrites are whole-table by design — a where scope
            // would leave the table half-clustered, refuse loudly
            if (whereCol.isDefined)
              throw new UnsupportedOperationException(
                "strategy => 'sort' rewrites the whole layout; " +
                  "where does not compose with it")
            order.trim match {
              case ZOrderSpec(inner) =>
                tbl.rewriteZOrder(session,
                  inner.split(',').toSeq.map(_.trim).filter(_.nonEmpty),
                  target, nowMs = now)
              case linear =>
                tbl.rewriteSorted(session,
                  linear.split(',').toSeq.map(_.trim).filter(_.nonEmpty),
                  target, nowMs = now)
            }
          case (Some("sort"), None) =>
            throw new UnsupportedOperationException(
              "strategy => 'sort' needs sort_order => " +
                "'zorder(c1, c2)' or 'c1[, c2...]'")
          case (Some("binpack"), Some(_)) =>
            throw new UnsupportedOperationException(
              "sort_order needs strategy => 'sort' " +
                "(binpack does not re-order rows)")
          case (Some(other), _) =>
            throw new UnsupportedOperationException(
              s"unknown strategy '$other' (binpack or sort)")
        }
      case "rewrite_position_delete_files" =>
        tbl.rewritePositionDeletes(session,
          longArg("target_file_size_bytes")
            .orElse(tbl.currentManifest.properties
              .get("write.target-file-size-bytes").map(_.toLong))
            .getOrElse(64L * 1024 * 1024), now)
      case "rewrite_manifests" => tbl.rewriteManifests(now)
      case "compute_table_stats" =>
        // columns: comma-separated names; absent = every column.
        // Row-returning: (column_name, ndv), like the other procedures
        val cols = bound.get("columns") match {
          case Some(s: String) =>
            s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
          case Some(o) => throw new UnsupportedOperationException(
            s"columns must be a comma-separated string, got $o")
          case None => Nil
        }
        val ndv = tbl.computeTableStats(session, cols)
        import session.implicits._
        return Some(ndv.toSeq.sortBy(_._1).toDF("column_name", "ndv")
          .queryExecution.analyzed)
      case "compute_partition_stats" =>
        // per-partition NDV rollups (Iceberg's compute_partition_stats);
        // row-returning: (partition, column_name, ndv)
        val cols = bound.get("columns") match {
          case Some(s: String) =>
            s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
          case Some(o) => throw new UnsupportedOperationException(
            s"columns must be a comma-separated string, got $o")
          case None => Nil
        }
        val rows = tbl.computePartitionStats(session, cols)
        import session.implicits._
        return Some(rows.toDF("partition", "column_name", "ndv")
          .queryExecution.analyzed)
      case "create_changelog_view" =>
        // Iceberg's create_changelog_view analog: registers a session
        // temp view over [[SnapshotTable.readChangelog]]'s row-level
        // net changes. `identifier_columns` (comma-separated) turns
        // matched delete/insert pairs into update pre/post images.
        val viewName = bound.getOrElse("view",
          throw new UnsupportedOperationException(
            "create_changelog_view needs a view argument")) match {
          case s: String => s
          case o => throw new UnsupportedOperationException(
            s"view argument must be a string, got $o")
        }
        // explicit arg wins; otherwise the table's declared
        // IDENTIFIER FIELDS key the update pre/post collapse
        val keys = bound.get("identifier_columns").map {
          case s: String => s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
          case o => throw new UnsupportedOperationException(
            s"identifier_columns must be a comma-separated string, got $o")
        }.getOrElse(tbl.identifierFields)
        // version boundaries also accept a TAG or BRANCH name (the
        // Iceberg SCAN boundaries-by-ref shape): 'audit-2026' pins the
        // version the ref points at
        def versionArg(k: String, default: Long): Long = bound.get(k) match {
          case None => default
          case Some(l: Long) => l
          case Some(i: Int) => i.toLong
          case Some(s: String) =>
            tbl.tags.get(s).orElse(tbl.branches.get(s)).getOrElse(
              throw new UnsupportedOperationException(
                s"$k: no tag or branch named '$s'"))
          case Some(o) => throw new UnsupportedOperationException(
            s"$k must be a version number or a ref name, got $o")
        }
        // timestamp boundaries (epoch ms) resolve through the same
        // main-lineage walk as rollback_to_timestamp: `from` is the
        // latest snapshot at-or-before the cutoff (its own rows are
        // excluded — the changelog reports what changed AFTER it;
        // predating genesis means the full history), `to` must land on
        // a retained snapshot or the range is unanswerable — loud
        def tsArg(k: String): Option[Long] = bound.get(k).map {
          case l: Long => l
          case i: Int => i.toLong
          case o => throw new UnsupportedOperationException(
            s"$k must be an epoch-millis number, got $o")
        }
        def boundary(verKey: String, tsKey: String, default: Long,
                     genesis: => Long): Long =
          (bound.contains(verKey), tsArg(tsKey)) match {
            case (true, Some(_)) => throw new UnsupportedOperationException(
              s"$verKey and $tsKey are mutually exclusive")
            case (_, Some(ts)) => tbl.versionAtOrBefore(ts).getOrElse(genesis)
            case _ => versionArg(verKey, default)
          }
        val net = bound.get("net_changes") match {
          case None => false
          case Some(b: Boolean) => b
          case Some(o) => throw new UnsupportedOperationException(
            s"net_changes must be a boolean, got $o")
        }
        // Iceberg's own restriction: net mode folds churn at whole-row
        // granularity; keyed update images are the per-step view's job
        if (net && bound.contains("identifier_columns"))
          throw new UnsupportedOperationException(
            "net_changes and identifier_columns are mutually exclusive")
        // lineage mode (v3 extension): update images pair by the rows'
        // own _row_id — declaring identifier columns alongside it would
        // declare two different pairing authorities
        val lineage = bound.get("lineage") match {
          case None => false
          case Some(b: Boolean) => b
          case Some(o) => throw new UnsupportedOperationException(
            s"lineage must be a boolean, got $o")
        }
        if (lineage && (net || bound.contains("identifier_columns")))
          throw new UnsupportedOperationException(
            "lineage pairs updates by _row_id — mutually exclusive with " +
              "net_changes and identifier_columns")
        val fromB = boundary("from_version", "from_timestamp", 0L, 0L)
        val toB = boundary("to_version", "to_timestamp", tbl.currentVersion,
          throw new UnsupportedOperationException(
            "to_timestamp predates the table's first retained snapshot"))
        (if (lineage) tbl.readChangelogLineage(session, fromB, toB)
         else if (net) tbl.readChangelogNet(session, fromB, toB)
         else tbl.readChangelog(session, fromB, toB, keys))
          .createOrReplaceTempView(viewName)
      case "rollback_to_snapshot" =>
        tbl.rollbackTo(longArg("version").getOrElse(
          throw new UnsupportedOperationException(
            "rollback_to_snapshot needs a version argument")))
      case "rollback_to_timestamp" =>
        tbl.rollbackToTimestamp(longArg("timestamp").getOrElse(
          throw new UnsupportedOperationException(
            "rollback_to_timestamp needs a timestamp argument")))
      case "set_current_snapshot" =>
        // Iceberg spells the version `snapshot_id`; accept both. Unlike
        // rollback this may also move FORWARD to any retained snapshot.
        tbl.rollbackTo(longArg("snapshot_id").orElse(longArg("version"))
          .getOrElse(throw new UnsupportedOperationException(
            "set_current_snapshot needs a snapshot_id argument")))
      case "cherrypick_snapshot" =>
        tbl.cherrypick(longArg("snapshot_id").orElse(longArg("version"))
          .getOrElse(throw new UnsupportedOperationException(
            "cherrypick_snapshot needs a snapshot_id argument")), now)
      case "add_files" | "snapshot" =>
        // Iceberg's spelling is source_table => 'parquet.`/dir`'; accept
        // that form or a plain source_dir path
        val rawSrc = bound.get("source_dir").orElse(bound.get("source_table"))
          .getOrElse(throw new UnsupportedOperationException(
            s"$proc needs source_dir (or Iceberg-style source_table" +
              " => 'parquet.`/dir`'")) match {
          case s: String => s
          case o => throw new UnsupportedOperationException(
            s"source must be a string, got $o")
        }
        val srcDir = {
          val t0 = rawSrc.trim
          val t1 = if (t0.toLowerCase.startsWith("parquet."))
            t0.substring("parquet.".length) else t0
          t1.stripPrefix("`").stripSuffix("`")
        }
        if (proc == "snapshot") tbl.snapshotFrom(session, srcDir, now)
        else tbl.addFiles(session, srcDir, now)
      case "migrate" =>
        // Iceberg's in-place conversion: the identifier's directory IS
        // the parquet data — meta/ is added around it, files adopted by
        // reference ([[SnapshotTable.migrateInPlace]]); `snapshot` is
        // the create-elsewhere twin. Row-returning like Iceberg
        // (migrated_files_count).
        val m = tbl.migrateInPlace(session, now)
        import session.implicits._
        return Some(Seq((m.files.size.toLong, m.version))
          .toDF("migrated_files_count", "version")
          .queryExecution.analyzed)
      case "register_table" =>
        // Iceberg's catalog-migration procedure: expose an EXISTING
        // table under a catalog identifier without copying data. Ours
        // registers via a filesystem SYMLINK at the identifier's
        // warehouse path — every engine path (reads, commits, locks,
        // maintenance) then works through the link unchanged, and DROP
        // purges the underlying table like Iceberg's register+drop.
        // Accepts Iceberg's metadata_file spelling (…/meta/v<N>.json —
        // stripped to the table root) or a plain source_path. The link
        // is born atomically (createSymbolicLink fails if the
        // destination exists — a racing CREATE ends loudly, the RENAME
        // TO precedent). Same-JVM commits through BOTH identities share
        // one monitor: SnapshotTable.lockFor keys on toRealPath, so the
        // alias and the source resolve to the same lock entry (a
        // normalize-only key gave them different monitors and the
        // second FileChannel.lock() on the shared inode threw
        // OverlappingFileLockException instead of queueing).
        val rawSrc = bound.get("source_path").orElse(bound.get("metadata_file"))
          .getOrElse(throw new UnsupportedOperationException(
            "register_table needs source_path (or Iceberg-style " +
              "metadata_file => '<root>/meta/v<N>.json')")) match {
          case s: String => s
          case o => throw new UnsupportedOperationException(
            s"source must be a string, got $o")
        }
        // SQL-spelling concerns stay here; the filesystem mechanics
        // (exclusivity, atomic link birth, lock interaction) live in
        // SnapshotTable.register next to the publish/lock machinery
        val srcRoot = {
          val p = java.nio.file.Paths.get(
            rawSrc.trim.stripPrefix("`").stripSuffix("`"))
          // the two-segment strip fires ONLY for the engine's own
          // …/meta/v<N>.json shape — a path like /a/b/v5.json must not
          // silently resolve to root /a (r12 ADVICE); anything else is
          // a plain source path and register() validates it
          if (p.getFileName.toString.matches("v\\d+\\.json") &&
              p.getParent != null &&
              p.getParent.getFileName != null &&
              p.getParent.getFileName.toString == "meta" &&
              p.getParent.getParent != null)
            p.getParent.getParent
          else p
        }
        // graft-literal paths may contain dots — never split those
        val dest = (if (cat.equalsIgnoreCase("graft") &&
              tableName.contains("/")) Some(tableName)
          else graft.catalog.GraftCatalog.createPath(
            session, cat +: tableName.split("\\.").toSeq))
          .getOrElse(throw new UnsupportedOperationException(
            s"register_table needs a registered catalog identifier or " +
              s"a graft path with '/', got '$tableName' under $cat"))
        val (destPath, srcAbs, version) =
          SnapshotTable.register(srcRoot.toString, dest)
        import session.implicits._
        return Some(Seq((destPath.toString, srcAbs.toString, version))
          .toDF("registered_path", "source_path", "current_version")
          .queryExecution.analyzed)
      case "publish_changes" =>
        val id = bound.getOrElse("wap_id",
          throw new UnsupportedOperationException(
            "publish_changes needs a wap_id argument")) match {
          case s: String => s
          case l: Long => l.toString
          case i: Int => i.toString
          case o => throw new UnsupportedOperationException(
            s"wap_id must be a string, got $o")
        }
        tbl.publishChanges(id, now)
      case "fast_forward" =>
        def strOf(k: String): Option[String] = bound.get(k).map {
          case v: String => v
          case o => throw new UnsupportedOperationException(
            s"$k must be a string, got $o")
        }
        val branchName = strOf("branch").orElse(strOf("name")).getOrElse(
          throw new UnsupportedOperationException(
            "fast_forward needs a branch argument"))
        strOf("to") match {
          // legacy two-arg spelling: publish <branch> to MAIN
          case None => tbl.fastForward(branchName)
          // Iceberg three-arg: forward `branch` to `to`'s head
          case Some(to) if branchName.equalsIgnoreCase("main") =>
            tbl.fastForward(to)
          case Some(to) => tbl.fastForwardBranch(branchName, to)
        }
      case nameTaking =>
        val refName = bound.getOrElse("name",
          throw new UnsupportedOperationException(
            s"$nameTaking needs a name argument")) match {
          case s: String => s
          case o => throw new UnsupportedOperationException(
            s"name argument must be a string, got $o")
        }
        nameTaking match {
          case "create_tag" =>
            if (bound.contains("min_snapshots_to_keep") ||
                bound.contains("max_snapshot_age_ms"))
              throw new UnsupportedOperationException(
                "snapshot retention applies to branches only")
            tbl.tag(refName,
              longArg("version").getOrElse(tbl.currentVersion),
              longArg("max_ref_age_ms"))
          case "drop_tag" => tbl.dropTag(refName)
          case "create_branch" =>
            tbl.branch(refName,
              longArg("version").getOrElse(tbl.currentVersion),
              graft.table.RefRetention(
                maxRefAgeMs = longArg("max_ref_age_ms"),
                minSnapshotsToKeep =
                  longArg("min_snapshots_to_keep").map(_.toInt).getOrElse(1),
                maxSnapshotAgeMs = longArg("max_snapshot_age_ms")))
          case "drop_branch" => tbl.dropBranch(refName)
        }
    }
    None
  }

  /** Metadata-only aggregates over a graft table (Iceberg's aggregate
    * pushdown analog; a 100 TB table answers without touching a data
    * file), claimed BEFORE resolution while the child is still the bare
    * unresolved relation. Three exact-only shapes, anything else falls
    * through to the normal scan plan:
    *
    *  - `SELECT count(*) FROM t` — [[SnapshotTable.rowCount]] from chunk
    *    rollups (no pending MoR deletes, no pre-rowcount legacy files);
    *  - `SELECT min(c), max(c), count(*) ... FROM t` —
    *    [[SnapshotTable.columnMinMax]] per column (witnessed per-file
    *    extremes; integral/date/timestamp columns only — see there);
    *  - `SELECT count(*) FROM t WHERE <partition predicate>` —
    *    [[SnapshotTable.partitionFilteredCount]] when the predicate
    *    references ONLY partition columns through a deterministic
    *    whitelist of comparison shapes (each file is decided wholesale
    *    by its identity partition values).
    *
    * Time-travel/metadata suffixes never match (their literal paths
    * don't exist as tables).
    */
  def rewriteMetaAgg(session: SparkSession,
                     plan: LogicalPlan): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, Or, Not, In, IsNull, IsNotNull, EqualTo, EqualNullSafe, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, StartsWith, Like, Cast, BinaryComparison}
    import org.apache.spark.sql.types._
    def isCountStar(e: Expression): Boolean = e match {
      case uf: UnresolvedFunction =>
        uf.nameParts.map(_.toLowerCase) == Seq("count") && !uf.isDistinct &&
          uf.filter.isEmpty &&
          (uf.arguments match {
            case Seq(_: UnresolvedStar) => true
            case Seq(Literal(1, _)) => true
            case _ => false
          })
      case _ => false
    }
    // min/max over a bare single-part column
    def minMaxOf(e: Expression): Option[(String, String)] = e match {
      case uf: UnresolvedFunction
          if !uf.isDistinct && uf.filter.isEmpty &&
            (uf.nameParts.map(_.toLowerCase) == Seq("min") ||
              uf.nameParts.map(_.toLowerCase) == Seq("max")) =>
        uf.arguments match {
          case Seq(ua: UnresolvedAttribute) if ua.nameParts.size == 1 =>
            Some((uf.nameParts.head.toLowerCase, ua.nameParts.head))
          case _ => None
        }
      case _ => None
    }
    sealed trait Item
    case class CountItem(name: String) extends Item
    case class MinMaxItem(name: String, fn: String, col: String) extends Item
    def itemOf(e: Expression): Option[Item] = e match {
      case a: Alias if isCountStar(a.child) => Some(CountItem(a.name))
      case ua: UnresolvedAlias if isCountStar(ua.child) =>
        Some(CountItem("count(1)"))
      case a: Alias => minMaxOf(a.child).map { case (fn, c) =>
        MinMaxItem(a.name, fn, c) }
      case ua: UnresolvedAlias => minMaxOf(ua.child).map { case (fn, c) =>
        MinMaxItem(s"$fn($c)", fn, c) }
      case _ => None
    }
    def tableOf(u: UnresolvedRelation): Option[SnapshotTable] =
      graft.catalog.GraftCatalog
        .pathCandidates(session, u.multipartIdentifier)
        .find(c => SnapshotTable.at(c).exists)
        .map { c =>
          // WAP session mode answers from the staged branch (matching
          // what a read of the same relation serves)
          val t0 = SnapshotTable.at(c)
          session.conf.getOption("graft.wap.branch")
            .filter(_.nonEmpty) match {
            case Some(b) if t0.branches.contains(b) => t0.atBranch(b)
            case _ => t0
          }
        }
    // exact internal value of a decoded bound in the column's type
    def literalOf(dt: DataType,
                  b: Option[graft.table.StatsPruning.Bound]): Option[Literal] =
      b match {
        case None => Some(Literal(null, dt))
        case Some(graft.table.StatsPruning.NumB(v)) =>
          try Some(dt match {
            case ByteType => Literal(v.toByteExact, dt)
            case ShortType => Literal(v.toShortExact, dt)
            case IntegerType => Literal(v.toIntExact, dt)
            case LongType => Literal(v.toLongExact, dt)
            case DateType => Literal(v.toIntExact, dt)
            case TimestampType | TimestampNTZType =>
              Literal(v.toLongExact, dt)
            case _ => return None
          }) catch { case _: ArithmeticException => None }
        case _ => None
      }
    def answer(t: SnapshotTable, items: Seq[Item]): Option[LogicalPlan] = {
      val lits = items.map {
        case CountItem(nm) =>
          // spark-assisted: pending positional deletes subtract their
          // tombstone census instead of forcing the scan plan
          t.rowCount(session).map(n => Alias(Literal(n, LongType), nm)())
        case MinMaxItem(nm, fn, c) =>
          t.columnMinMax(c).flatMap { case (dt, bounds) =>
            literalOf(dt, bounds.map(b => if (fn == "min") b._1 else b._2))
              .map(l => Alias(l, nm)())
          }
      }
      if (lits.exists(_.isEmpty)) None
      else Some(Project(lits.map(_.get),
        org.apache.spark.sql.catalyst.plans.logical.OneRowRelation()))
    }
    // deterministic partition-predicate whitelist: comparison shapes over
    // single-part attributes and literals only — anything else declines
    def whitelisted(e: Expression): Boolean = e match {
      case _: Literal => true
      case ua: UnresolvedAttribute => ua.nameParts.size == 1
      case _: And | _: Or | _: Not | _: In | _: IsNull | _: IsNotNull |
           _: EqualNullSafe | _: StartsWith | _: Like | _: Cast |
           _: BinaryComparison =>
        e.children.forall(whitelisted)
      case _ => false
    }
    plan match {
      case p: Project => p.child match {
        case u: UnresolvedRelation if u.options.isEmpty =>
          val items = p.projectList.map(itemOf)
          if (items.isEmpty || items.exists(_.isEmpty)) None
          else tableOf(u).flatMap(t => answer(t, items.map(_.get)))
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.child match {
            case u: UnresolvedRelation if u.options.isEmpty =>
              val items = p.projectList.map(itemOf)
              // filtered form: COUNT from the partition census row sums;
              // MIN/MAX from witnessed extremes over the SAME matching
              // files (chunk-skipped candidates, exact tuple evaluation)
              if (items.isEmpty || items.exists(_.isEmpty)) None
              else if (!whitelisted(f.condition)) None
              else {
                val refs = f.condition.collect {
                  case ua: UnresolvedAttribute => ua.nameParts.head
                }.distinct
                if (refs.isEmpty) None
                else tableOf(u).flatMap { t =>
                  val pcols = t.currentManifest.partitionColumns
                    .map(_.toLowerCase).toSet
                  if (!refs.forall(r => pcols(r.toLowerCase))) None
                  else {
                    val cond =
                      org.apache.spark.sql.GraftBridge.column(f.condition)
                    val lits = items.map(_.get).map {
                      case CountItem(nm) =>
                        t.partitionFilteredCount(session, refs, cond)
                          .map(n => Alias(Literal(n, LongType), nm)())
                      case MinMaxItem(nm, fn, c) =>
                        t.partitionFilteredMinMax(session, refs, cond, c)
                          .flatMap { case (dt, bounds) =>
                            literalOf(dt, bounds.map(b =>
                              if (fn == "min") b._1 else b._2))
                              .map(l => Alias(l, nm)())
                          }
                    }
                    if (lits.exists(_.isEmpty)) None
                    else Some(Project(lits.map(_.get),
                      org.apache.spark.sql.catalyst.plans.logical
                        .OneRowRelation()))
                  }
                }
              }
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }
  }

  /** `ALTER TABLE ... ADD COLUMNS (...)` / `DROP COLUMN[S]` over a graft
    * identifier → the engine's metadata-only schema evolution
    * ([[SnapshotTable.addColumns]]/[[SnapshotTable.dropColumns]]).
    * Claimed early, before ResolveSessionCatalog converts the statement
    * to a V1 command; only simple top-level columns are supported —
    * nested fields, positions, defaults and NOT NULL fail loudly (the
    * engine cannot honor them on carried files).
    */
  def rewriteAlter(session: SparkSession,
                   plan: LogicalPlan): Option[LogicalPlan] = {
    def graftTable(node: LogicalPlan): Option[SnapshotTable] = node match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        graft.catalog.GraftCatalog
          .pathCandidates(session, u.multipartIdentifier)
          .find(p => SnapshotTable.at(p).exists).map(SnapshotTable.at)
      case _ => None
    }
    plan match {
      case a: AddColumns =>
        graftTable(a.table).map { tbl =>
          val fields = a.columnsToAdd.map { qc =>
            if (qc.path.nonEmpty)
              unsupported("ALTER TABLE ADD nested column (top-level only)")
            if (qc.position.nonEmpty)
              unsupported("ALTER TABLE ADD COLUMN FIRST/AFTER (columns append)")
            if (!qc.nullable)
              unsupported("ALTER TABLE ADD COLUMN NOT NULL (existing rows " +
                "can only read NULL)")
            org.apache.spark.sql.types.StructField(qc.colName, qc.dataType)
          }
          // DEFAULT <lit> (v3 default values): fixes the initial default
          // (pre-add rows read it) and seeds the write default
          val defaults = a.columnsToAdd.flatMap(qc =>
            qc.default.map(d => qc.colName -> d.originalSQL)).toMap
          tbl.addColumns(fields, defaults = defaults)
          empty
        }
      case d: DropColumns =>
        graftTable(d.table).map { tbl =>
          val names = d.columnsToDrop.map { fn =>
            if (fn.name.length != 1)
              unsupported("ALTER TABLE DROP nested column (top-level only)")
            fn.name.head
          }
          val todo =
            if (!d.ifExists) names
            else {
              val have = org.apache.spark.sql.types.StructType
                .fromDDL(tbl.currentManifest.schemaDdl)
                .fieldNames.map(_.toLowerCase).toSet
              names.filter(n => have(n.toLowerCase))
            }
          if (todo.nonEmpty) tbl.dropColumns(todo)
          empty
        }
      case r: org.apache.spark.sql.catalyst.plans.logical.RenameColumn =>
        graftTable(r.table).map { tbl =>
          if (r.column.name.length != 1)
            unsupported("ALTER TABLE RENAME nested column (top-level only)")
          tbl.renameColumn(r.column.name.head, r.newName)
          empty
        }
      case ac: org.apache.spark.sql.catalyst.plans.logical.AlterColumns =>
        graftTable(ac.table).map { tbl =>
          ac.specs.foreach { sp =>
            if (sp.column.name.length != 1)
              unsupported("ALTER TABLE ALTER nested column (top-level only)")
            if (sp.newNullability.nonEmpty || sp.newComment.nonEmpty ||
                sp.newPosition.nonEmpty)
              unsupported(
                "ALTER COLUMN supports TYPE widening and SET/DROP DEFAULT")
            (sp.newDataType, sp.newDefaultExpression, sp.dropDefault) match {
              // SET DEFAULT <lit> / DROP DEFAULT: the WRITE default only
              // (the initial default is fixed at add time — v3 rule)
              case (None, Some(d), _) =>
                tbl.setWriteDefault(sp.column.name.head, Some(d.originalSQL))
              case (None, None, true) =>
                tbl.setWriteDefault(sp.column.name.head, None)
              case (Some(dt), None, false) =>
                tbl.widenColumn(sp.column.name.head, dt)
              case _ =>
                unsupported("ALTER COLUMN without a TYPE change or DEFAULT")
            }
          }
          empty
        }
      case sp: org.apache.spark.sql.catalyst.plans.logical.SetTableProperties =>
        graftTable(sp.table).map { tbl =>
          tbl.setProperties(sp.properties)
          empty
        }
      case up: org.apache.spark.sql.catalyst.plans.logical.UnsetTableProperties =>
        graftTable(up.table).map { tbl =>
          tbl.unsetProperties(up.propertyKeys, up.ifExists)
          empty
        }
      // the parser extension's own statements (no Spark grammar exists,
      // so an unclaimed one can only mean "not a graft table" — loud)
      case g: GraftAlterTableStatement =>
        val tbl = graft.catalog.GraftCatalog.pathCandidates(session, g.ident)
          .find(p => SnapshotTable.at(p).exists).map(SnapshotTable.at)
          .getOrElse(throw new IllegalArgumentException(
            s"ALTER TABLE ${g.ident.mkString(".")}: no graft table — " +
              "PARTITION FIELD / WRITE ORDERED BY are graft statements"))
        g.op match {
          case AddPartitionFieldOp(spec, name) =>
            tbl.addPartitionField(spec, name)
          case DropPartitionFieldOp(spec) => tbl.dropPartitionField(spec)
          // Every WRITE ... ORDERED/DISTRIBUTED spelling REPLACES the
          // write layout in ONE commit (Iceberg's
          // SetWriteDistributionAndOrdering semantics; a set-then-unset
          // pair would leave a torn state on crash or to concurrent
          // readers) — and a newly DECLARED order must clear a stale
          // write.graft.zorder-by, or the next compaction re-clusters
          // on the OLD curve and scatters the layout the DDL promised
          // (the same hazard rewriteSorted guards)
          case WriteOrderedByOp(cols) =>
            tbl.alterProperties(
              Map("write.graft.sort-order" -> cols.mkString(",")),
              Seq("write.graft.zorder-by"))
          case WriteUnorderedOp =>
            tbl.unsetProperties(Seq("write.graft.sort-order"), ifExists = true)
          case WriteDistributedOp(order) =>
            if (order.nonEmpty)
              tbl.alterProperties(Map(
                "write.graft.distribution-mode" -> "hash",
                "write.graft.sort-order" -> order.mkString(",")),
                Seq("write.graft.zorder-by"))
            else
              tbl.alterProperties(
                Map("write.graft.distribution-mode" -> "hash"),
                Seq("write.graft.sort-order", "write.graft.zorder-by"))
          case WriteLocallyOrderedOp(cols) =>
            tbl.alterProperties(Map(
              "write.graft.distribution-mode" -> "none",
              "write.graft.sort-order" -> cols.mkString(",")),
              Seq("write.graft.zorder-by"))
          case CreateRefOp(isBranch, name, ver, ifNotExists, orReplace,
              replaceOnly, maxRefAge, minKeep, snapAge) =>
            val kind = if (isBranch) "branch" else "tag"
            val exists =
              if (isBranch) tbl.branches.contains(name)
              else tbl.tags.contains(name)
            if (replaceOnly && !exists)
              throw new IllegalArgumentException(
                s"no $kind '$name' on ${g.ident.mkString(".")} to replace " +
                  s"(use CREATE $kind to make one)")
            if (exists && !orReplace && !ifNotExists)
              throw new IllegalArgumentException(
                s"$kind '$name' already exists on ${g.ident.mkString(".")} " +
                  "(use IF NOT EXISTS, CREATE OR REPLACE, or drop it first)")
            else if (!exists || orReplace) {
              val v = ver.getOrElse(tbl.currentVersion)
              if (isBranch)
                tbl.branch(name, v, graft.table.RefRetention(
                  maxRefAgeMs = maxRefAge,
                  minSnapshotsToKeep = minKeep.getOrElse(1),
                  maxSnapshotAgeMs = snapAge))
              else tbl.tag(name, v, maxRefAge)
            }
          case SetIdentifierFieldsOp(cols) => tbl.setIdentifierFields(cols)
          case DropIdentifierFieldsOp(cols) => tbl.dropIdentifierFields(cols)
          case DropRefOp(isBranch, name, ifExists) =>
            val dropped =
              if (isBranch) tbl.dropBranch(name) else tbl.dropTag(name)
            if (!dropped && !ifExists)
              throw new IllegalArgumentException(
                s"no ${if (isBranch) "branch" else "tag"} '$name' on " +
                  s"${g.ident.mkString(".")} (use IF EXISTS for a no-op)")
        }
        Some(empty)
      // Iceberg-analog VIEW DDL over versioned stored metadata
      // (graft.table.ViewStore; served at read by GraftPathRelations)
      case v: GraftViewStatement =>
        def pathOf(what: String): String =
          graft.catalog.GraftCatalog.createPath(session, v.ident)
            .getOrElse(throw new IllegalArgumentException(
              s"$what ${v.ident.mkString(".")}: not a graft path " +
                "(use the graft.`/absolute/path` spelling or a " +
                "registered GraftCatalog's db.view name)"))
        // the definition must PARSE now — storing garbage would fail
        // every future read of the view instead of this statement —
        // and must be a QUERY: graft DML/DDL executes during ANALYSIS,
        // so a stored command (`AS DROP TABLE ...`, `AS CALL ...`)
        // would re-run its side effect on EVERY read that resolves the
        // view (r10 ADVICE)
        def requireQuery(what: String, viewSql: String): Unit = {
          val parsed = session.sessionState.sqlParser.parsePlan(viewSql)
          val cmd = parsed.collectFirst {
            case c: Command => c
            case p: ParsedStatement => p
            case e: ExecutableDuringAnalysis => e // CALL
            case g: GraftAlterTableStatement => g
            case v2: GraftViewStatement => v2
          }
          require(cmd.isEmpty,
            s"$what definition must be a query, not a " +
              s"command/DML statement (got ${cmd.get.nodeName}) — graft " +
              "statements execute during analysis, so a stored command " +
              "would run its side effect on every read of the view")
        }
        v.op match {
          case CreateViewOp(orReplace, ifNotExists, viewSql) =>
            requireQuery("CREATE VIEW", viewSql)
            graft.table.ViewStore.create(pathOf("CREATE VIEW"), viewSql,
              orReplace, ifNotExists)
            Some(empty)
          case AlterViewOp(viewSql) =>
            // Spark/Iceberg semantics: ALTER VIEW ... AS requires the
            // view to exist; the new definition lands as the next stored
            // version (REPLACE keeps priors — same versioned store)
            val p = pathOf("ALTER VIEW")
            require(graft.table.ViewStore.exists(p),
              s"no view at $p (ALTER VIEW requires an existing view — " +
                "use CREATE VIEW)")
            requireQuery("ALTER VIEW", viewSql)
            graft.table.ViewStore.create(p, viewSql,
              orReplace = true, ifNotExists = false)
            Some(empty)
          case DropViewOp(ifExists) =>
            graft.table.ViewStore.drop(pathOf("DROP VIEW"), ifExists)
            Some(empty)
          case ShowViewsOp =>
            import session.implicits._
            Some(graft.table.ViewStore.list(pathOf("SHOW VIEWS IN"))
              .toDF("view_name", "current_version")
              .queryExecution.analyzed)
          case ShowCreateViewOp =>
            val p = pathOf("SHOW CREATE VIEW")
            require(graft.table.ViewStore.exists(p), s"no view at $p")
            Some(GraftSqlDml.showCreateViewRelation(p))
        }
      case _ => None
    }
  }

  /** Multipart identifier of a DESCRIBE/DROP target, whatever resolution
    * stage the node reached before this rule saw it.
    */
  private def identParts(node: LogicalPlan): Option[Seq[String]] = node match {
    case tv: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      Some(tv.multipartIdentifier)
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
      Some(t.multipartIdentifier)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
      Some(u.nameParts)
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier =>
      r.catalog match {
        // our plugin: rebuild the registered-name parts (createPath maps
        // them back through the warehouse)
        case g: graft.catalog.GraftCatalog =>
          Some(g.name +: (r.identifier.namespace.toSeq :+ r.identifier.name))
        // the session catalog may have claimed the `graft`.`/path` literal
        // first (ResolveCatalogs runs before injected rules); the path
        // shape is still unmistakably ours
        case _ if r.identifier.namespace.toSeq == Seq("graft") &&
            r.identifier.name.contains("/") =>
          Some(Seq("graft", r.identifier.name))
        case _ => None
      }
    case _ => None
  }

  /** `DESCRIBE TABLE [EXTENDED]` over a graft identifier (path literal or
    * registered-catalog name): answered directly from the manifest —
    * columns, the partition-information block, and (extended) location/
    * provider/properties — because the V2 DESCRIBE path resolves through
    * `loadTable`, which [[graft.catalog.GraftCatalog]] deliberately does
    * not serve (see its resolution-design note).
    */
  /** `DESCRIBE` over a stored VIEW (Spark's own DESCRIBE answers for
    * views): the column block comes from ANALYZING the current stored
    * definition in this session — the same nested-analysis precedent as
    * the relation rule's own `tbl.read(session)` calls — so it tracks
    * table changes like every other view read.
    */
  private def describeView(session: SparkSession, path: String,
                           d: DescribeRelation): LogicalPlan = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val schema = GraftBridge.ofRows(session,
      session.sessionState.sqlParser.parsePlan(
        graft.table.ViewStore.sql(path))).schema
    def row(a: String, b: String, c: String): InternalRow =
      InternalRow.fromSeq(Seq(a, b, c).map(s =>
        if (s == null) null else UTF8String.fromString(s)))
    val cols = schema.toSeq.map(f => row(f.name, f.dataType.simpleString, null))
    val extended =
      if (!d.isExtended) Nil
      else row("", "", "") :: row("# Detailed View Information", "", "") ::
        row("Location", path, null) ::
        row("Provider", "graft-view", null) ::
        row("Current Version",
          graft.table.ViewStore.currentVersion(path).toString, null) :: Nil
    LocalRelation(d.output, (cols ++ extended).toIndexedSeq)
  }

  private def runDescribe(session: SparkSession, path: String,
                          d: DescribeRelation): LogicalPlan = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val m = SnapshotTable.at(path).currentManifest
    val schema = org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
    def row(a: String, b: String, c: String): InternalRow =
      InternalRow.fromSeq(Seq(a, b, c).map(s =>
        if (s == null) null else UTF8String.fromString(s)))
    val cols = schema.toSeq.map(f => row(f.name, f.dataType.simpleString, null))
    val parts =
      if (m.partitionColumns.isEmpty) Nil
      else row("# Partition Information", "", "") ::
        row("# col_name", "data_type", "comment") ::
        m.partitionColumns.toList.map { p =>
          val t = schema.find(_.name.equalsIgnoreCase(p))
            .map(_.dataType.simpleString).getOrElse("")
          row(p, t, null)
        }
    val extended =
      if (!d.isExtended) Nil
      else row("", "", "") :: row("# Detailed Table Information", "", "") ::
        row("Location", path, "") :: row("Provider", "graft", "") ::
        row("Table Properties",
          m.properties.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString("[", ", ", "]"), "") ::
        Nil
    LocalRelation(d.output, cols ++ parts ++ extended)
  }

  def rewrite(session: SparkSession, plan: LogicalPlan,
              target: LogicalPlan => Option[SnapshotTable]): Option[LogicalPlan] =
    plan match {
      case d: DescribeRelation if d.partitionSpec.isEmpty =>
        identParts(d.relation).flatMap { parts =>
          val cands = graft.catalog.GraftCatalog.pathCandidates(session, parts)
          cands.find(p => SnapshotTable.at(p).exists)
            .map(p => runDescribe(session, p, d))
            .orElse(cands.find(p => !SnapshotTable.at(p).exists &&
                graft.table.ViewStore.exists(p))
              .map(p => describeView(session, p, d)))
        }
      case sp: ShowTableProperties =>
        // same loadTable-resolution gap as DESCRIBE: answer from the
        // manifest. With a key, Spark's semantics: one row, or an
        // explanatory row when the key is absent.
        identParts(sp.table).flatMap(parts =>
          graft.catalog.GraftCatalog.pathCandidates(session, parts)
            .find(p => SnapshotTable.at(p).exists).map { p =>
              import org.apache.spark.sql.catalyst.InternalRow
              import org.apache.spark.unsafe.types.UTF8String
              val props = SnapshotTable.at(p).currentManifest.properties
              def row(k: String, v: String) = InternalRow.fromSeq(
                Seq(UTF8String.fromString(k), UTF8String.fromString(v)))
              val rows = sp.propertyKey match {
                case Some(k) => Seq(row(k, props.getOrElse(k,
                  s"Table ${parts.mkString(".")} does not have property: $k")))
                case None => props.toSeq.sortBy(_._1)
                  .map { case (k, v) => row(k, v) }
              }
              LocalRelation(sp.output, rows)
            })
      case sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions =>
        // the standard spelling of the `@partitions` relation: distinct
        // live partition values, hive-rendered and sorted (Spark's
        // semantics; the distributed `.files` scan does the work and the
        // driver holds only the distinct partition strings). Spec'd
        // `SHOW PARTITIONS t PARTITION (...)` filters, like Spark's.
        identParts(sp.table).flatMap(parts =>
          graft.catalog.GraftCatalog.pathCandidates(session, parts)
            .find(p => SnapshotTable.at(p).exists).map { p =>
              import org.apache.spark.unsafe.types.UTF8String
              val tbl = SnapshotTable.at(p)
              if (tbl.currentManifest.partitionColumns.isEmpty)
                throw new UnsupportedOperationException(
                  s"SHOW PARTITIONS is not allowed on a table that is " +
                    s"not partitioned: $p")
              val wanted: Map[String, String] = sp.pattern match {
                case Some(org.apache.spark.sql.catalyst.analysis
                    .UnresolvedPartitionSpec(spec, _)) =>
                  spec.map { case (k, v) => k.toLowerCase -> v }
                case None => Map.empty
                case other => throw new UnsupportedOperationException(
                  s"unsupported partition spec $other")
              }
              // filtered against the FileEntry partition MAPS (never by
              // re-parsing the rendered k=v string, which is ambiguous
              // for values containing '/' or '=' — r7 ADVICE)
              val vals = tbl.partitionStringsMatching(session, wanted)
                .filter(_.nonEmpty)
                .sorted
              LocalRelation(sp.output, vals.toIndexedSeq.map(s =>
                org.apache.spark.sql.catalyst.InternalRow(
                  UTF8String.fromString(s))))
            })
      case dt: DropTable =>
        // claim only identifiers unmistakably ours (path literal with '/',
        // or a registered GraftCatalog name); drop deletes the table DIR
        // (data + metadata — purge semantics, the only meaning on a
        // filesystem table)
        identParts(dt.child).flatMap(parts =>
          graft.catalog.GraftCatalog.createPath(session, parts).flatMap { p =>
            val tbl = SnapshotTable.at(p)
            if (tbl.exists) {
              // locked drop: exists flips false before data removal
              tbl.drop()
              Some(empty)
            } else if (dt.ifExists) Some(empty) // no-op, per SQL
            else if (parts.length == 2 && parts.head.equalsIgnoreCase("graft"))
              throw new UnsupportedOperationException(
                s"no graft table at ${parts(1)} (DROP TABLE without IF EXISTS)")
            else None // registered-catalog miss: let the V2 exec report it
          })
      case rt: org.apache.spark.sql.catalyst.plans.logical.RenameTable =>
        // ALTER TABLE/VIEW ... RENAME TO — the V2 path resolves through
        // loadTable (deliberately unserved), so the DML rule claims it
        // for graft identifiers: the destination resolves in the SAME
        // addressing scheme as the source (leading catalog part
        // optional, Spark's same-catalog rename semantics), and the
        // move is the directory move — snapshots, refs, views travel
        // whole. Exclusivity holds at the destination (no table OR
        // view may already live there).
        identParts(rt.child).flatMap { parts =>
          val cands = graft.catalog.GraftCatalog.pathCandidates(session, parts)
          val srcOpt =
            if (rt.isView) cands.find(graft.table.ViewStore.exists)
            else cands.find(p => SnapshotTable.at(p).exists)
          srcOpt.map { src =>
            val dstParts =
              if (rt.newName.length >= 2 &&
                  rt.newName.head.equalsIgnoreCase(parts.head)) rt.newName
              else parts.head +: rt.newName
            val dst = graft.catalog.GraftCatalog.createPath(session, dstParts)
              .getOrElse(unsupported(
                s"RENAME TO destination ${rt.newName.mkString(".")} (not " +
                  "a graft path or registered-catalog name)"))
            val (srcP, dstP) =
              (java.nio.file.Paths.get(src), java.nio.file.Paths.get(dst))
            // the move runs inside the SOURCE table's publish critical
            // section (same meta/_lock a commit holds) so a committer
            // mid-commit can't recreate the old directory after the move
            // (zombie table) — under CasPublish the section serializes
            // same-JVM only, the publisher's documented trade. The
            // destination re-check INSIDE the section narrows the
            // check-then-act window but holds only OUR lock; a racing
            // creator AT the destination holds its own — that race ends
            // LOUDLY in Files.move (FileAlreadyExists), never silently.
            // (Taking both locks would deadlock on a concurrent reverse
            // rename.) A VIEW source serializes on the same section
            // ViewStore.create/replace use, so a mid-REPLACE version
            // doc can't land in a half-moved directory.
            graft.table.AtomicPublish.default.critical(
              srcP, srcP.resolve("meta")) {
              require(!SnapshotTable.at(dst).exists &&
                !graft.table.ViewStore.exists(dst),
                s"RENAME TO destination $dst already holds a table or view")
              if (dstP.getParent != null)
                java.nio.file.Files.createDirectories(dstP.getParent)
              java.nio.file.Files.move(srcP, dstP)
            }
            empty
          }
        }
      case sct: org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable =>
        // reconstructed from the manifest (schema, partitioning, user
        // properties); engine bookkeeping prefixes are elided. A VIEW at
        // the identifier serves its stored definition (Spark's own
        // SHOW CREATE TABLE answers for views the same way).
        identParts(sct.child).flatMap { parts =>
          val cands = graft.catalog.GraftCatalog.pathCandidates(session, parts)
          // tables FIRST across all candidates, views second — the same
          // precedence the relation rule gives reads (a table at any
          // candidate wins before view substitution is attempted)
          def viewHit = cands.find(graft.table.ViewStore.exists).map { vp =>
            val rel = showCreateViewRelation(vp)
            // serve through the statement's OWN output attribute so the
            // substitution keeps references valid
            LocalRelation(sct.output, rel match {
              case lr: LocalRelation => lr.data
              case _ => Nil
            })
          }
          cands.find(p => SnapshotTable.at(p).exists).map { p =>
              import org.apache.spark.sql.catalyst.InternalRow
              import org.apache.spark.unsafe.types.UTF8String
              val m = SnapshotTable.at(p).currentManifest
              val schema = org.apache.spark.sql.types.StructType
                .fromDDL(m.schemaDdl)
              // identifiers backquoted when not simple, literal quotes
              // doubled — the emitted statement must REPARSE
              def ident(n: String) =
                if (n.matches("[A-Za-z_][A-Za-z0-9_]*")) n
                else "`" + n.replace("`", "``") + "`"
              def strLit(s: String) = "'" + s.replace("'", "''") + "'"
              val cols = schema.fields
                .map(f => s"  ${ident(f.name)} ${f.dataType.sql}")
                .mkString(",\n")
              val partClause =
                if (m.partitionColumns.isEmpty) ""
                else m.partitionColumns.map(ident)
                  .mkString("\nPARTITIONED BY (", ", ", ")")
              val userProps = m.properties.filterNot { case (k, _) =>
                k.startsWith("graft.dropped.") ||
                  k.startsWith("graft.evolution.") ||
                  k.startsWith("graft.stream.") } // sink replay markers
              val propsClause =
                if (userProps.isEmpty) ""
                else userProps.toSeq.sortBy(_._1)
                  .map { case (k, v) => s"  ${strLit(k)} = ${strLit(v)}" }
                  .mkString("\nTBLPROPERTIES (\n", ",\n", ")")
              val stmt = s"CREATE TABLE graft.`$p` (\n$cols)\n" +
                s"USING graft$partClause$propsClause"
              LocalRelation(sct.output,
                Seq(InternalRow(UTF8String.fromString(stmt))))
            }
            .orElse(viewHit)
        }
      case tt: org.apache.spark.sql.catalyst.plans.logical.TruncateTable =>
        // one empty-overwrite commit: schema, partition spec and
        // properties survive; every row (and pending delete) drops.
        // Time travel still reaches the pre-truncate snapshots.
        identParts(tt.table).flatMap(parts =>
          graft.catalog.GraftCatalog.pathCandidates(session, parts)
            .find(p => SnapshotTable.at(p).exists).map { p =>
              SnapshotTable.at(p).truncate(session)
              empty
            })
      case m: MergeIntoTable =>
        target(m.targetTable).map { tbl => runMerge(session, tbl, m); empty }
      case ins: InsertIntoStatement =>
        target(ins.table).map { tbl => runInsert(session, tbl, ins); empty }
      case u: UpdateTable =>
        target(u.table).map { tbl =>
          val quals = aliasesOf(u.table)
          val assigns = u.assignments.map { a =>
            val k = attrKey(a.key, quals).getOrElse(unsupported(
              "UPDATE assignment key (a qualified key must use the " +
                "target's alias; nested struct fields are not updatable)"))
            k -> GraftBridge.column(a.value)
          }
          val cond = u.condition.map(GraftBridge.column).getOrElse(lit(true))
          // write.graft.update.mode=merge-on-read → position-tombstone +
          // replacement append; default = the CoW census rewrite
          val mor = tbl.exists && tbl.currentManifest.properties
            .get("write.graft.update.mode").contains("merge-on-read")
          if (mor) tbl.updateWherePositional(session, assigns, cond)
          else tbl.updateWhere(session, assigns, cond)
          empty
        }
      case d: DeleteFromTable =>
        target(d.table).map { tbl =>
          // Iceberg's write.delete.mode property decides the physical
          // shape: merge-on-read writes position-delete tombstones and
          // carries every data file; the default is the copy-on-write
          // stats-census-scoped rewrite
          val mor = tbl.exists && tbl.currentManifest.properties
            .get("write.graft.delete.mode").contains("merge-on-read")
          if (mor)
            tbl.deleteWherePositional(session, GraftBridge.column(d.condition))
          else tbl.deleteWhere(session, GraftBridge.column(d.condition))
          empty
        }
      case _ => None
    }

  private def runMerge(session: SparkSession, tbl: SnapshotTable,
                       m: MergeIntoTable): Unit = {
    val quals = aliasesOf(m.targetTable) ++ aliasesOf(m.sourceTable)
    val keys = equiKeys(m.mergeCondition, quals)
      .getOrElse(unsupported("MERGE ON condition (need t.k = s.k [AND ...] " +
        "with qualifiers drawn from the statement's aliases)"))
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("MERGE WHEN NOT MATCHED BY SOURCE")
    val source = GraftBridge.ofRows(session, m.sourceTable)
    val referenceShape =
      m.matchedActions.size == 2 && m.notMatchedActions.size == 1 &&
        m.matchedActions.exists {
          case d: DeleteAction => opEquals(d.condition, "D", quals); case _ => false
        } &&
        m.matchedActions.exists {
          case u: UpdateStarAction => opEquals(u.condition, "U", quals); case _ => false
        } &&
        (m.notMatchedActions.head match {
          case i: InsertStarAction => i.condition.isEmpty; case _ => false
        })
    val upsertShape =
      m.matchedActions.size == 1 && m.notMatchedActions.size == 1 &&
        (m.matchedActions.head match {
          case u: UpdateStarAction => u.condition.isEmpty; case _ => false
        }) &&
        (m.notMatchedActions.head match {
          case i: InsertStarAction => i.condition.isEmpty; case _ => false
        })
    val changes =
      if (referenceShape) source
      else if (upsertShape) {
        // the op column is the engine's change marker: an upsert source
        // that happens to carry a DATA column named op would be silently
        // clobbered (and a target op column mis-merged) — refuse instead
        if (source.columns.exists(_.equalsIgnoreCase(graft.core.MetaColumns.Op)))
          unsupported("upsert MERGE whose source has an 'op' column " +
            "(use the op-conditioned reference clauses)")
        source.withColumn(graft.core.MetaColumns.Op, lit("U"))
      } else unsupported("MERGE clause shape")
    val mor = tbl.exists && tbl.currentManifest.properties
      .get("graft.physical-write-mode").contains("merge-on-read")
    // MERGE ... WITH SCHEMA EVOLUTION maps onto the engine's add-column
    // evolution (metadata-only for carried files)
    if (mor) tbl.mergeMoR(session, changes, keys, keepDeletes = false,
      evolveSchema = m.withSchemaEvolution)
    else tbl.merge(session, changes, keys, keepDeletes = false,
      evolveSchema = m.withSchemaEvolution)
  }
}
