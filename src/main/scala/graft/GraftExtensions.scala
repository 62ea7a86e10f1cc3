package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

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
  *     API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Registry", name), builder))
    }
    ext.injectResolutionRule(GraftPathRelations)
  }
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
  *
  * Unrecognized suffixes are treated as literal path characters.
  */
case class GraftPathRelations(session: SparkSession)
    extends Rule[LogicalPlan] {

  private val Suffixed = "(.*)@(v[0-9]+|ts[0-9]+|history|files)$".r

  private def resolve(ident: String) = {
    val (path, suffix) = ident match {
      case Suffixed(p, s) if SnapshotTable.at(p).exists => (p, Some(s))
      case _ => (ident, None)
    }
    val tbl = SnapshotTable.at(path)
    if (!tbl.exists) None
    else Some(suffix match {
      case Some("history")                => tbl.history(session)
      case Some("files")                  => tbl.files(session)
      case Some(v) if v.startsWith("ts")  => tbl.readAsOf(session, v.drop(2).toLong)
      case Some(v) if v.startsWith("v")   => tbl.readVersion(session, v.drop(1).toLong)
      case None                           => tbl.read(session)
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
        resolve(u.multipartIdentifier(1))
          .map(_.queryExecution.analyzed).getOrElse(u)
    }
}
