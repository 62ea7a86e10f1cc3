package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Iceberg v3 ROW LINEAGE: `_row_id` / `_last_updated_sequence_number`
  * with metadata inheritance on append, physical materialization on every
  * rewrite (compact, z-order, CoW DELETE/UPDATE/MERGE), and the central
  * publish-time range allocation (`graft.row-id.next`).
  */
class RowLineageSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-lineage-$tag-").toString + "/t"

  private def lineageRows(t: SnapshotTable): Map[Long, (Long, Long)] =
    t.readLineage(spark)
      .select(col("id"), col("_row_id"), col("_last_updated_sequence_number"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  private def mkDf(ids: Seq[Long], tagV: String) = {
    import spark.implicits._
    ids.map(i => (i, tagV)).toDF("id", "v")
  }

  test("append inheritance: dense unique ids, per-commit ranges, seq = commit") {
    val t = SnapshotTable.at(freshRoot("append"))
    t.createOrReplace(mkDf(0L until 10L, "a"),
      properties = Map("format-version" -> "3"))
    t.append(spark, mkDf(10L until 25L, "b"))
    val rows = lineageRows(t)
    assert(rows.size == 25)
    val ids = rows.values.map(_._1).toSeq
    assert(ids.distinct.size == 25, "row ids must be unique")
    assert(ids.min == 0L && ids.max == 24L,
      s"dense allocation expected [0,25), got [${ids.min},${ids.max}]")
    // the second commit's rows occupy exactly the range after the first
    val v1Ids = rows.collect { case (_, (rid, s)) if s == 1L => rid }
    val v2Ids = rows.collect { case (_, (rid, s)) if s == 2L => rid }
    assert(v1Ids.size == 10 && v2Ids.size == 15)
    assert(v1Ids.max < v2Ids.min, "ranges allocate in commit order")
    assert(t.currentManifest.properties("graft.row-id.next") == "25")
  }

  test("compaction preserves identity physically") {
    val t = SnapshotTable.at(freshRoot("compact"))
    t.createOrReplace(mkDf(0L until 8L, "a"),
      properties = Map("format-version" -> "3"))
    t.append(spark, mkDf(8L until 16L, "b"))
    val before = lineageRows(t)
    t.compact(spark)
    val after = lineageRows(t)
    assert(after == before,
      "compaction must carry (_row_id, _last_updated_seq) unchanged")
    // the spec assigns first_row_id to EVERY new data file — a rewritten
    // file's range simply goes unused because its rows carry explicit
    // ids, but the counter still advances (Iceberg v3 next-row-id rule)
    assert(t.currentManifest.properties("graft.row-id.next").toLong >= 16L)
  }

  test("CoW delete keeps survivors' lineage; update restamps only hits") {
    val t = SnapshotTable.at(freshRoot("dml"))
    t.createOrReplace(mkDf(0L until 20L, "a"),
      properties = Map("format-version" -> "3"))
    val before = lineageRows(t)
    t.deleteWhere(spark, col("id") >= 15L) // v2
    val afterDel = lineageRows(t)
    assert(afterDel.keySet == (0L until 15L).toSet)
    afterDel.foreach { case (id, (rid, s)) =>
      assert(rid == before(id)._1, s"row $id id drifted on delete")
      assert(s == before(id)._2, s"row $id last-updated drifted on delete")
    }
    t.updateWhere(spark, Seq("v" -> lit("upd")), col("id") < 5L) // v3
    val afterUpd = lineageRows(t)
    afterUpd.foreach { case (id, (rid, s)) =>
      assert(rid == before(id)._1, s"row $id id drifted on update")
      if (id < 5L) assert(s == 3L, s"updated row $id must stamp v3, got $s")
      else assert(s == before(id)._2, s"untouched row $id restamped")
    }
  }

  test("CoW merge: updates keep id + restamp, inserts fresh, carried intact") {
    import spark.implicits._
    val t = SnapshotTable.at(freshRoot("merge"))
    t.createOrReplace(mkDf(0L until 10L, "a").withColumn("op", lit("I")),
      properties = Map("format-version" -> "3"))
    val before = lineageRows(t)
    val changes = Seq(
      (3L, "u3", "U"), (7L, "u7", "U"), // updates
      (100L, "n", "I"), (101L, "n", "I"), // inserts
      (9L, "", "D") // delete
    ).toDF("id", "v", "op")
    t.merge(spark, changes, Seq("id"), keepDeletes = false)
    val after = lineageRows(t)
    assert(after.keySet == ((0L until 9L).toSet ++ Set(100L, 101L)))
    // updated rows: same _row_id, last-updated = merge commit (v2)
    Seq(3L, 7L).foreach { id =>
      assert(after(id)._1 == before(id)._1, s"update lost row id for $id")
      assert(after(id)._2 == 2L, s"update must restamp $id")
    }
    // carried rows: identity fully intact
    ((0L until 9L).toSet -- Set(3L, 7L)).foreach { id =>
      assert(after(id) == before(id), s"carried row $id drifted")
    }
    // inserts: fresh ids beyond every pre-merge allocation
    val preMax = before.values.map(_._1).max
    Seq(100L, 101L).foreach { id =>
      assert(after(id)._1 > preMax, s"insert $id must take a fresh id")
      assert(after(id)._2 == 2L)
    }
  }

  test("CoW merge on a duplicate-key target: dup keys take FRESH ids — " +
      "never the same recovered id twice (ADVICE r13)") {
    import spark.implicits._
    val t = SnapshotTable.at(freshRoot("dupkey"))
    // key 5 appears TWICE in the target (merge keys are not enforced
    // unique); recovery must not stamp one id on both output rows
    t.createOrReplace(
      (Seq(5L) ++ (0L until 10L)).map(i => (i, s"r$i"))
        .toDF("id", "v").withColumn("op", lit("I")),
      properties = Map("format-version" -> "3"))
    val changes = Seq((3L, "u3", "U")).toDF("id", "v", "op")
    t.merge(spark, changes, Seq("id"), keepDeletes = false)
    val ids = t.readLineage(spark)
      .select(col("id"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.map(_._2).distinct.length == ids.length,
      s"duplicated _row_id after a dup-key merge: ${ids.sorted.toSeq}")
    // unique keys still recover their pre-merge identity
    val before5 = ids.filter(_._1 == 5L).map(_._2)
    assert(before5.length == 2 && before5.distinct.length == 2,
      s"both rows of the dup key must survive with distinct ids: $before5")
  }

  test("MoR positional delete/update: carried files untouched, updates keep id") {
    val t = SnapshotTable.at(freshRoot("mor"))
    t.createOrReplace(mkDf(0L until 12L, "a"),
      properties = Map("format-version" -> "3",
        "write.delete.mode" -> "merge-on-read"))
    val before = lineageRows(t)
    t.deleteWherePositional(spark, col("id") === 11L) // v2: tombstone only
    val afterDel = lineageRows(t)
    assert(afterDel.keySet == (0L until 11L).toSet)
    afterDel.foreach { case (id, lin) => assert(lin == before(id)) }
    t.updateWherePositional(spark, Seq("v" -> lit("upd")),
      col("id") === 0L) // v3: tombstone + replacement row
    val afterUpd = lineageRows(t)
    assert(afterUpd(0L)._1 == before(0L)._1,
      "positional update must carry the replaced row's id")
    assert(afterUpd(0L)._2 == 3L, "positional update restamps")
    (1L until 11L).foreach(id => assert(afterUpd(id) == before(id)))
  }

  test("v3 upgrade heals existing files; z-order rewrite carries lineage") {
    val t = SnapshotTable.at(freshRoot("upg"))
    t.createOrReplace(mkDf(0L until 6L, "a")) // v1: NOT v3 yet
    t.setProperties(Map("format-version" -> "3")) // v2: upgrade commit
    t.append(spark, mkDf(6L until 9L, "c")) // v3
    // the upgrade commit itself assigns ranges to existing loose entries
    // (Iceberg v3 upgrade rule: every data file gets a first_row_id) —
    // inheritance then gives every row an id without touching a file
    val rows = lineageRows(t)
    assert(rows.size == 9)
    assert(rows.values.map(_._1).toSeq.distinct.size == 9)
    // pre-upgrade rows inherit their file's own (older) sequence
    (0L until 6L).foreach(id => assert(rows(id)._2 == 1L))
    (6L until 9L).foreach(id => assert(rows(id)._2 == 3L))
    // a layout rewrite preserves every identity physically
    t.rewriteZOrder(spark, Seq("id"), minFiles = 2)
    assert(lineageRows(t) == rows,
      "z-order rewrite must carry (_row_id, _last_updated_seq) unchanged")
  }

  test("v3 upgrade assigns ranges to CHUNK-CARRIED entries too — no " +
      "compact needed for ids on a chunked legacy table (r13 verdict #7)") {
    import graft.table.ManifestJson
    val saved = ManifestJson.ChunkSize
    val savedThr = ManifestJson.ChunkThreshold
    try {
      ManifestJson.ChunkSize = 8
      ManifestJson.ChunkThreshold = 8
      val t = SnapshotTable.at(freshRoot("upgchunk"))
      import spark.implicits._
      // 32 partitions over a threshold of 8 → chunked manifest
      t.createOrReplace((0L until 32L).map(i => (i, i % 32, s"r$i"))
        .toDF("id", "p", "v"), Seq("p"))
      t.currentManifest.files match {
        case fl: graft.table.FileList =>
          assert(fl.chunks.nonEmpty, "fixture must be chunked")
        case _ => fail("fixture must be chunked")
      }
      t.setProperties(Map("format-version" -> "3")) // THE upgrade commit
      val rows = lineageRows(t)
      assert(rows.size == 32, s"every row must read an id: ${rows.size}")
      assert(rows.values.map(_._1).toSeq.distinct.size == 32,
        "ids must be unique across chunk-carried files")
      // steady state after the upgrade: the next commit must NOT have
      // re-assigned anything (ranges are permanent once allocated)
      t.append(spark, Seq((100L, 0L, "n")).toDF("id", "p", "v"))
      val rows2 = lineageRows(t)
      (0L until 32L).foreach(id => assert(rows2(id) == rows(id),
        s"carried identity drifted for $id after a later commit"))
      assert(rows2.contains(100L))
    } finally {
      ManifestJson.ChunkSize = saved
      ManifestJson.ChunkThreshold = savedThr
    }
  }

  test("row-lineage changelog: exact update pairing by _row_id, no keys") {
    import spark.implicits._
    val t = SnapshotTable.at(freshRoot("cl"))
    t.createOrReplace(mkDf(0L until 10L, "a").withColumn("op", lit("I")),
      properties = Map("format-version" -> "3"))            // v1
    val changes = Seq((2L, "u2", "U"), (5L, "u5", "U"),
      (20L, "n20", "I"), (7L, "", "D")).toDF("id", "v", "op")
    t.merge(spark, changes, Seq("id"), keepDeletes = false) // v2
    t.updateWhere(spark, Seq("v" -> lit("z3")), col("id") === 3L) // v3
    val cl = t.readChangelogLineage(spark, 1L, 3L)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(cl == Set(
      (2L, "update_preimage", 2L), (2L, "update_postimage", 2L),
      (5L, "update_preimage", 2L), (5L, "update_postimage", 2L),
      (3L, "update_preimage", 3L), (3L, "update_postimage", 3L),
      (20L, "insert", 2L),
      (7L, "delete", 3L)), s"got $cl")
    // pre/post images pair by the SAME _row_id
    val pairs = t.readChangelogLineage(spark, 1L, 3L)
      .filter(col("_change_type").startsWith("update"))
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
    pairs.foreach { case (id, rs) =>
      assert(rs.map(_._2).distinct.length == 1,
        s"update images of $id must share one _row_id")
    }
    // the SQL spelling registers the same view
    spark.sql(s"CALL graft.system.create_changelog_view(" +
      s"table => '${t.root}', view => 'rl_cl', from_version => 1, " +
      "to_version => 3, lineage => true)")
    assert(spark.sql("SELECT count(*) FROM rl_cl").head.getLong(0) == 8L)
    val ex = intercept[Exception](spark.sql(
      s"CALL graft.system.create_changelog_view(table => '${t.root}', " +
        "view => 'x', lineage => true, net_changes => true)"))
    assert(ex.getMessage.contains("mutually exclusive"))
    // intra-range churn folds: insert-then-delete never appears
    spark.sql(s"INSERT INTO graft.`${t.root}` VALUES (99, 'tmp', 'I')")
    t.deleteWhere(spark, col("id") === 99L)
    val net = t.readChangelogLineage(spark, 3L, t.currentVersion)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(net.isEmpty, s"churn must fold away, got $net")
    // non-v3 and null-id boundaries refuse
    val t2 = SnapshotTable.at(freshRoot("clrefuse"))
    t2.createOrReplace(mkDf(0L until 3L, "x"))
    t2.setProperties(Map("format-version" -> "3"))
    val e = intercept[Exception](
      t2.readChangelogLineage(spark, 1L, t2.currentVersion).collect())
    assert(e.getMessage.contains("format-version") ||
      e.getMessage.contains("_row_id"))
  }

  test("plain reads and schema stay lineage-free; @lineage SQL works") {
    val t = SnapshotTable.at(freshRoot("sql"))
    t.createOrReplace(mkDf(0L until 5L, "a"),
      properties = Map("format-version" -> "3"))
    t.compact(spark) // forces physical lineage columns into files
    assert(t.read(spark).columns.toSeq == Seq("id", "v"),
      "physical lineage columns must never leak into plain reads")
    assert(!t.currentManifest.schemaDdl.contains("__graft"),
      "declared schema must stay clean")
    val viaSql = spark.sql(s"SELECT id, _row_id FROM graft.`${t.root}@lineage`")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql.keySet == (0L until 5L).toSet)
    // non-v3 tables refuse
    val t2 = SnapshotTable.at(freshRoot("refuse"))
    t2.createOrReplace(mkDf(0L until 3L, "x"))
    val e = intercept[Exception](t2.readLineage(spark).collect())
    assert(e.getMessage.contains("format-version"))
  }
}
