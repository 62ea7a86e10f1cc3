package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Iceberg-v2 POSITION deletes: predicate MoR DELETE writes exact
  * (path, pos) tombstones and carries every data file by reference;
  * reads resolve them alongside equality deletes; compaction folds them.
  */
class PositionalDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable() = {
    val root = Files.createTempDirectory("graft-posdel-").toString
    val t = SnapshotTable.at(root)
    val rows = (1 to 400).map(i => (i.toLong, i.toLong % 4, s"s$i"))
      .toDF("id", "p", "s")
    t.createOrReplace(rows.filter(col("id") <= 300), Seq("p"), nowMs = 1000L)
    t.append(spark, rows.filter(col("id") > 300), nowMs = 2000L)
    (root, t)
  }

  test("positional delete: tombstones only, carried files, exact reads") {
    val (root, t) = freshTable()
    val pathsBefore = t.currentManifest.files.map(_.path).toSet

    t.deleteWherePositional(spark, col("id") % 10 === 3 && col("p") === 1)
    val m = t.currentManifest
    assert(m.files.map(_.path).toSet == pathsBefore,
      "no data file may be rewritten or dropped")
    val dels = m.deleteFiles
    assert(dels.size == 1 && dels.head.positional)
    // id%10==3 AND id%4==1 → id%20 ∈ {13} → 20 of 400
    assert(dels.head.rows == 20)
    assert(t.read(spark).count() == 380)
    assert(t.read(spark).filter(col("id") === 13).count() == 0)
    assert(t.read(spark).filter(col("id") === 3).count() == 1,
      "id=3 is p=3 — other partitions' rows stay")
    // metadata count declines under pending deletes (can't be exact)
    assert(t.rowCount.isEmpty)
    // time travel to the pre-delete snapshot still shows every row
    assert(t.readVersion(spark, 2).count() == 400)
    // manifest JSON round-trip preserves the positional flag
    val reopened = SnapshotTable.at(root)
    assert(reopened.currentManifest.deleteFiles.head.positional)
    assert(reopened.read(spark).count() == 380)

    // stacking a second positional delete composes
    t.deleteWherePositional(spark, col("id") <= 5)
    assert(t.read(spark).count() == 375)

    // a no-hit predicate is a no-op commit
    val v = t.currentVersion
    t.deleteWherePositional(spark, col("id") > 100000)
    assert(t.currentVersion == v)

    // compaction folds the tombstones: affected groups rewrite, entries
    // drop, results unchanged
    t.compact(spark)
    assert(t.currentManifest.deleteFiles.isEmpty)
    assert(t.read(spark).count() == 375)
    // id 13 (first delete) and id 3 (second, id<=5) stay gone; 7 lives
    assert(t.read(spark).filter(col("id").isin(13L, 3L)).count() == 0)
    assert(t.read(spark).filter(col("id") === 7).count() == 1)
    assert(t.rowCount.contains(375L))
  }

  test("positional + equality deletes resolve together") {
    val (_, t) = freshTable()
    // equality-delete path: MoR update masks old copies of ids %50==0
    t.mergeMoR(spark,
      (1 to 400).filter(_ % 50 == 0)
        .map(i => (i.toLong, i.toLong % 4, s"NEW$i", "U"))
        .toDF("id", "p", "s", "op"),
      Seq("id"), keepDeletes = false)
    assert(t.currentManifest.deleteFiles.exists(!_.positional))
    assert(t.read(spark).count() == 400)
    // positional delete evaluated over RAW files also tombstones masked
    // originals — the resolved read must still agree exactly
    t.deleteWherePositional(spark, col("id") % 50 === 0)
    assert(t.currentManifest.deleteFiles.exists(_.positional))
    assert(t.read(spark).count() == 392)
    assert(t.read(spark).filter(col("s").startsWith("NEW")).count() == 0,
      "the MoR replacements match the predicate too")
    assert(t.read(spark).filter(col("id") === 7).count() == 1)
  }

  test("rewrite_position_delete_files folds only tombstone-affected groups") {
    val (root, t) = freshTable()
    // tombstones scoped to partition p=1; p∈{0,2,3} must not move
    t.deleteWherePositional(spark, col("id") % 10 === 3 && col("p") === 1)
    val before = t.currentManifest
    val untouched = before.files
      .filter(_.partition.get("p").exists(_ != "1")).map(_.path).toSet
    assert(before.deleteFiles.exists(_.positional))
    spark.sql(s"CALL graft.system.rewrite_position_delete_files('$root')")
    val after = t.currentManifest
    assert(after.deleteFiles.isEmpty, "tombstones must fold away")
    assert(untouched.subsetOf(after.files.map(_.path).toSet),
      "groups no tombstone touches carry by reference")
    assert(after.files.exists(f => !before.files.map(_.path).toSet(f.path)),
      "the affected group must be rewritten")
    assert(t.read(spark).count() == 380)
    assert(t.read(spark).filter(col("id") === 13).count() == 0)
    // a second call is a no-op (no pending position deletes)
    val v = t.currentVersion
    spark.sql(s"CALL graft.system.rewrite_position_delete_files('$root')")
    assert(t.currentVersion == v)
    // an equality delete alone does NOT trigger the targeted rewrite
    t.mergeMoR(spark,
      Seq((4L, 0L, "NEW4", "U")).toDF("id", "p", "s", "op"),
      Seq("id"), keepDeletes = false)
    val v2 = t.currentVersion
    spark.sql(s"CALL graft.system.rewrite_position_delete_files('$root')")
    assert(t.currentVersion == v2 &&
      t.currentManifest.deleteFiles.exists(!_.positional),
      "equality deletes are rewrite_data_files' business, not this one's")
  }

  test("positional UPDATE: tombstone + replacement append, one commit") {
    val (_, t) = freshTable()
    val dataBefore = t.currentManifest.files.map(_.path).toSet
    val v = t.currentVersion

    t.updateWherePositional(spark,
      Seq("s" -> concat(lit("UPD-"), col("id").cast("string"))),
      col("id") % 100 === 7)
    assert(t.currentVersion == v + 1, "one commit")
    val m = t.currentManifest
    assert(dataBefore.subsetOf(m.files.map(_.path).toSet),
      "every pre-update data file carries by reference")
    assert(m.deleteFiles.count(_.positional) == 1)
    assert(t.read(spark).count() == 400, "updates never change row count")
    val upd = t.read(spark).filter(col("s").startsWith("UPD-"))
    assert(upd.count() == 4)
    assert(upd.filter(col("id") % 100 =!= 7).count() == 0)
    // replacement rows are NOT masked by their own tombstones
    assert(t.read(spark).filter(col("id") === 7).count() == 1)

    // a row masked by a pending delete must never resurrect via UPDATE
    t.deleteWherePositional(spark, col("id") === 107)
    assert(t.read(spark).count() == 399)
    t.updateWherePositional(spark, Seq("s" -> lit("GHOST")),
      col("id") === 107)
    assert(t.read(spark).filter(col("s") === "GHOST").count() == 0,
      "masked rows stay dead through an update")
    assert(t.read(spark).count() == 399)

    // compaction folds everything back to plain files
    t.compact(spark)
    assert(t.currentManifest.deleteFiles.isEmpty)
    assert(t.read(spark).count() == 399)
    assert(t.read(spark).filter(col("s").startsWith("UPD-")).count() == 3)
  }

  test("@position_deletes lists exact tombstone rows; empty-with-schema " +
      "when clean; equality deletes never appear") {
    val root = Files.createTempDirectory("graft-posdel-rel-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace(
      (1 to 100).map(i => (i.toLong, s"s$i")).toDF("id", "s")
        .repartition(1).sortWithinPartitions("id"),
      properties = Map("write.graft.delete.mode" -> "merge-on-read",
        "write.graft.update.mode" -> "merge-on-read"))
    // clean table: empty relation, schema intact (both API and SQL)
    val empty = t.positionDeletesRelation(spark)
    assert(empty.columns.toSeq == Seq("file_path", "pos", "partition",
      "delete_file_path", "commit_version"))
    assert(empty.count() == 0)
    spark.sql(s"DELETE FROM graft.`$root` WHERE id % 10 = 0")
    val rel = spark.sql(s"SELECT * FROM graft.`$root@position_deletes`")
    // one sorted single-file fixture: tombstoned ordinals are id-1
    assert(rel.select("pos").as[Long].collect().sorted.toSeq ==
      (1 to 100).filter(_ % 10 == 0).map(_.toLong - 1))
    assert(rel.select("commit_version").distinct().as[Long].head() == 2L)
    // tombstone file_paths name live @files rows (same rendering)
    val live = t.files(spark).select("file_path")
    assert(rel.join(live, Seq("file_path"), "left_anti").isEmpty)
    assert(rel.select("delete_file_path").distinct().count() == 1)
    // an EQUALITY delete (MoR merge) adds a delete file that must NOT
    // surface here — position_deletes is positional-only by definition
    t.mergeMoR(spark, Seq((5L, "dead", "D")).toDF("id", "s", "op"),
      Seq("id"), keepDeletes = false)
    assert(t.currentManifest.deleteFiles.exists(!_.positional),
      "fixture must actually produce an equality delete")
    val after = t.positionDeletesRelation(spark)
    assert(after.count() == 10, "equality deletes must not appear")
    // a tag can't claim the reserved relation name
    intercept[IllegalArgumentException] {
      t.tag("position_deletes", 1L)
    }
  }

  test("SQL DELETE routes to position deletes under merge-on-read mode") {
    val base = spark
    val root = Files.createTempDirectory("graft-posdel-sql-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 100).map(i => (i.toLong, s"s$i")).toDF("id", "s"),
      properties = Map("write.graft.delete.mode" -> "merge-on-read",
        "write.graft.update.mode" -> "merge-on-read"))
    val paths = t.currentManifest.files.map(_.path).toSet
    base.sql(s"DELETE FROM graft.`$root` WHERE id % 10 = 0")
    assert(t.currentManifest.files.map(_.path).toSet == paths,
      "merge-on-read DELETE must not rewrite data files")
    assert(t.currentManifest.deleteFiles.exists(_.positional))
    assert(t.read(spark).count() == 90)
    assert(base.sql(s"SELECT count(*) AS c FROM graft.`$root`")
      .head.getLong(0) == 90)
    // UPDATE under merge-on-read mode: original files still carried
    base.sql(s"UPDATE graft.`$root` SET s = concat('U', s) WHERE id <= 3")
    assert(paths.subsetOf(t.currentManifest.files.map(_.path).toSet),
      "merge-on-read UPDATE must carry the original files")
    assert(base.sql(s"SELECT count(*) AS c FROM graft.`$root` " +
      "WHERE s LIKE 'U%'").head.getLong(0) == 3)
    assert(t.read(spark).count() == 90)
  }
}
