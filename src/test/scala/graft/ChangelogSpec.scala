package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import graft.table.SnapshotTable

/** Row-level changelog between snapshots (Iceberg create_changelog_view /
  * Delta CDF analog): net inserts/deletes per commit step, update images
  * under identifier keys, replace-step skipping, schema-evolution
  * null-fill, and the recorded per-snapshot `operation`.
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String) = {
    val root = Files.createTempDirectory(prefix).toString
    (root, SnapshotTable.at(root))
  }

  private def rows(r: Range) =
    r.map(i => (i.toLong, i.toLong % 4, s"s$i")).toDF("id", "p", "s")

  test("appends are inserts; CoW rewrite emits only net row changes") {
    val (_, t) = fresh("graft-cdc-")
    t.createOrReplace(rows(1 to 400), Seq("p"), nowMs = 1000L) // v1
    t.append(spark, rows(401 to 500), nowMs = 2000L)           // v2

    val cl12 = t.readChangelog(spark, 0L, 2L)
    assert(cl12.columns.toSeq ==
      Seq("id", "p", "s", "_change_type", "_commit_version",
        "_commit_timestamp_ms"))
    assert(cl12.count() == 500)
    assert(cl12.filter(col("_change_type") =!= "insert").count() == 0)
    assert(cl12.filter(col("_commit_version") === 1).count() == 400)
    assert(cl12.filter(col("_commit_version") === 2).count() == 100)

    // CoW UPDATE rewrites whole touched partitions — the changelog must
    // net that down to the rows that actually changed
    t.updateWhere(spark, Seq("s" -> lit("changed")),
      col("id") <= 10, nowMs = 3000L)                           // v3
    val cl23 = t.readChangelog(spark, 2L, 3L)
    assert(cl23.filter(col("_change_type") === "insert").count() == 10)
    assert(cl23.filter(col("_change_type") === "delete").count() == 10)
    assert(cl23.filter(col("_change_type") === "insert" &&
      col("s") === "changed").count() == 10)
    assert(cl23.filter(col("_change_type") === "delete" &&
      col("s") === "changed").count() == 0)

    // identifier keys pair them into update images
    val upd = t.readChangelog(spark, 2L, 3L, keys = Seq("id"))
    assert(upd.filter(col("_change_type") === "update_preimage").count() == 10)
    assert(upd.filter(col("_change_type") === "update_postimage").count() == 10)
    assert(upd.filter(col("_change_type").isin("insert", "delete")).count() == 0)

    // full-span: 500 inserts net of the 10 pre-update values
    val cl03 = t.readChangelog(spark, 0L, 3L)
    assert(cl03.filter(col("_change_type") === "insert").count() == 510)
    assert(cl03.filter(col("_change_type") === "delete").count() == 10)
  }

  test("MoR deletes emit the masked rows; compaction steps emit nothing") {
    val (_, t) = fresh("graft-cdc-mor-")
    t.createOrReplace(rows(1 to 400), Seq("p"), nowMs = 1000L)  // v1
    t.deleteWherePositional(spark, col("id") <= 20, nowMs = 2000L) // v2
    val cl12 = t.readChangelog(spark, 1L, 2L)
    assert(cl12.filter(col("_change_type") === "delete").count() == 20)
    assert(cl12.filter(col("_change_type") === "insert").count() == 0)
    assert(cl12.agg(max("id")).head.getLong(0) == 20L)

    val vBefore = t.currentVersion
    t.compact(spark, nowMs = 3000L)                              // v3: replace
    assert(t.currentVersion == vBefore + 1)
    assert(t.currentManifest.operation == "replace")
    assert(t.readChangelog(spark, vBefore, t.currentVersion).count() == 0,
      "a data-preserving compaction step must not appear in the changelog")

    // and the full span still nets correctly ACROSS the replace step
    val cl = t.readChangelog(spark, 0L, t.currentVersion)
    assert(cl.filter(col("_change_type") === "insert").count() == 400)
    assert(cl.filter(col("_change_type") === "delete").count() == 20)
  }

  test("schema evolution: old steps null-fill; operations are recorded") {
    val (_, t) = fresh("graft-cdc-evo-")
    t.createOrReplace(rows(1 to 50), Nil, nowMs = 1000L)         // v1
    t.addColumns(Seq(StructField("extra", LongType)), nowMs = 2000L) // v2
    t.append(spark, (51 to 60).map(i =>
      (i.toLong, i.toLong % 4, s"s$i", i.toLong * 10))
      .toDF("id", "p", "s", "extra"), nowMs = 3000L)             // v3

    val cl = t.readChangelog(spark, 0L, 3L)
    assert(cl.count() == 60)
    assert(cl.filter(col("_commit_version") === 1 &&
      col("extra").isNull).count() == 50,
      "rows from pre-evolution steps must null-fill the added column")
    assert(cl.filter(col("_commit_version") === 3 &&
      col("extra").isNotNull).count() == 10)

    val ops = t.snapshots(spark).orderBy("version")
      .select("operation").as[String].collect().toSeq
    assert(ops == Seq("append", "evolve-schema", "append"))
  }
}
