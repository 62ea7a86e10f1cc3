package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** `@snapshots` / `@partitions` metadata relations (Iceberg's
  * `db.table.snapshots` / `.partitions` analogs): commit summaries from
  * chunk rollups + manifest diffs, per-partition totals from the
  * distributed doc scan — never a data-file read.
  */
class MetadataRelationsSpec extends SparkSpec {

  test("@snapshots summarizes commits; @partitions totals match the data") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-metarel-").toString
    val t = SnapshotTable.at(root)
    val rows = (1 to 300).map(i => (i.toLong, s"p${i % 3}", s"x$i"))
      .toDF("id", "p", "s")
    t.createOrReplace(rows.filter(col("id") <= 200), Seq("p"), nowMs = 1000L)
    t.append(spark, rows.filter(col("id") > 200), nowMs = 2000L)

    // snapshots: v1 (root commit) + v2 (fast append)
    val snaps = spark.sql(s"SELECT * FROM graft.`$root@snapshots` " +
      "ORDER BY version").collect()
    assert(snaps.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L))
    assert(snaps.map(_.getAs[Long]("parent_version")).toSeq == Seq(-1L, 1L))
    assert(snaps.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, true))
    assert(snaps(0).getAs[Long]("total_records") == 200L)
    assert(snaps(1).getAs[Long]("total_records") == 300L)
    assert(snaps(1).getAs[Long]("added_files") > 0)
    assert(snaps(1).getAs[Long]("removed_files") == 0L,
      "a fast append removes nothing")
    assert(snaps.map(_.getAs[Long]("timestamp_ms")).toSeq == Seq(1000L, 2000L))

    // a replace REMOVES the old files — visible in its summary row
    t.createOrReplace(rows.filter(col("id") <= 50), Seq("p"), nowMs = 3000L)
    val v3 = spark.sql(s"SELECT * FROM graft.`$root@snapshots` " +
      "WHERE version = 3").head
    assert(v3.getAs[Long]("removed_files") > 0)
    assert(v3.getAs[Long]("total_records") == 50L)

    // partitions: per-partition totals equal the data's GROUP BY
    val parts = spark.sql(s"SELECT * FROM graft.`$root@partitions`")
      .collect().map(r => r.getAs[String]("partition") ->
        (r.getAs[Long]("file_count"), r.getAs[Long]("record_count"),
          r.getAs[Long]("total_size_bytes"))).toMap
    val expected = t.read(spark).groupBy("p").count().collect()
      .map(r => s"p=${r.getString(0)}" -> r.getLong(1)).toMap
    assert(parts.keySet == expected.keySet)
    expected.foreach { case (k, n) =>
      val (fc, rc, bytes) = parts(k)
      assert(rc == n, s"$k record_count")
      assert(fc > 0 && bytes > 0, s"$k file/byte totals")
    }

    // the relation names are reserved: refs cannot shadow them
    // @manifests answers from rollups: small table = one inline row
    // whose totals reconcile with the data
    val mf = spark.sql(s"SELECT * FROM graft.`$root@manifests`").collect()
    assert(mf.nonEmpty)
    assert(mf.map(_.getAs[Long]("file_count")).sum ==
      t.currentManifest.files.size.toLong)
    assert(mf.map(_.getAs[Long]("record_count")).sum ==
      t.read(spark).count())

    intercept[IllegalArgumentException] { t.tag("snapshots") }
    intercept[IllegalArgumentException] { t.branch("partitions") }
  }

  test("@delete_files lists pending MoR debt by kind and empties on compact") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-metadel-rel-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 100).map(i => (i.toLong, i % 2, s"s$i"))
      .toDF("id", "p", "s"), Seq("p"))
    val q = s"SELECT * FROM graft.`$root@delete_files`"
    assert(spark.sql(q).count() == 0, "a clean table has no delete debt")
    t.mergeMoR(spark, Seq((2L, 0, "x", "D"), (4L, 0, "x", "D"))
      .toDF("id", "p", "s", "op"), Seq("id"), keepDeletes = false)
    t.deleteWherePositional(spark, col("id").isin(7L, 9L))
    val rows = spark.sql(q).collect()
    assert(rows.length >= 2)
    val byContent = rows.groupBy(_.getAs[String]("content"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("record_count")).sum }
    assert(byContent.get("equality").exists(_ == 2L),
      s"equality keys recorded, got $byContent")
    assert(byContent.get("position").exists(_ == 2L),
      s"position tombstones recorded, got $byContent")
    assert(rows.forall(_.getAs[Long]("file_size_bytes") > 0))
    assert(rows.forall(_.getAs[Long]("commit_version") >= 2L))
    t.compact(spark)
    assert(spark.sql(q).count() == 0, "compaction folds the debt")
    intercept[IllegalArgumentException] { t.tag("delete_files") }
  }

  test("@entries / @all_files / @all_manifests cover history, not just live") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-entries-").toString
    val t = SnapshotTable.at(root)
    val rows = (1 to 300).map(i => (i.toLong, s"p${i % 3}", s"x$i"))
      .toDF("id", "p", "s")
    t.createOrReplace(rows.filter(col("id") <= 200), Seq("p"))        // v1
    t.append(spark, rows.filter(col("id") > 200))                     // v2
    def ent() = spark.sql(s"SELECT * FROM graft.`$root@entries`").collect()
    def sumRec(rs: Seq[org.apache.spark.sql.Row], st: Int): Long =
      rs.filter(_.getAs[Int]("status") == st)
        .map(_.getAs[Long]("record_count")).sum
    val e2 = ent().toSeq
    assert(sumRec(e2, 1) == 100L, "ADDED = exactly the appended batch")
    assert(sumRec(e2, 0) == 200L, "EXISTING = the carried files")
    assert(!e2.exists(_.getAs[Int]("status") == 2), "nothing dropped yet")
    assert(e2.filter(_.getAs[Int]("status") == 0)
      .forall(_.getAs[Long]("snapshot_id") == 1L),
      "EXISTING entries carry the commit that added them")
    // v3: whole-partition delete — p0's files drop from the manifest
    t.deleteWhere(spark, col("p") === "p0")
    val e3 = ent().toSeq
    assert(sumRec(e3, 2) == 100L, "DELETED = the dropped partition's rows")
    assert(sumRec(e3, 1) == 0L, "a metadata delete adds no files")
    assert(sumRec(e3, 0) == 200L)
    assert(e3.filter(_.getAs[Int]("status") == 2)
      .forall(_.getAs[String]("partition") == "p=p0"))
    // @all_files keeps the DEAD files too, each path exactly once
    val af = spark.sql(s"SELECT * FROM graft.`$root@all_files`").collect()
    assert(af.map(_.getAs[String]("file_path")).distinct.length == af.length)
    assert(af.map(_.getAs[Long]("record_count")).sum == 300L,
      "every row ever written stays visible across snapshots")
    assert(af.length >
      spark.sql(s"SELECT * FROM graft.`$root@files`").count(),
      "dead files outnumber the live @files listing")
    // pending MoR debt surfaces under its content kind, status ADDED
    t.mergeMoR(spark, Seq((5L, "p2", "x", "D")).toDF("id", "p", "s", "op"),
      Seq("id"), keepDeletes = false)
    assert(ent().exists(r =>
      r.getAs[String]("content") == "equality-delete" &&
        r.getAs[Int]("status") == 1),
      "the fresh delete file must list as an ADDED entry")
    // @all_manifests: rollup rows for EVERY retained snapshot
    val am = spark.sql(s"SELECT * FROM graft.`$root@all_manifests`")
      .collect()
    assert(am.map(_.getAs[Long]("version")).distinct.sorted.toSeq ==
      t.manifestVersions)
    // the new relation names are reserved ref shapes
    intercept[IllegalArgumentException] { t.tag("entries") }
    intercept[IllegalArgumentException] { t.branch("all_files") }
    intercept[IllegalArgumentException] { t.tag("all_manifests") }
    // metadata relations TIME-TRAVEL (Iceberg's t.files VERSION AS OF):
    // @files at v2 still lists the files v3's delete dropped, and
    // @entries at v2 reports v2's own ADDED census; tags resolve too
    val f2 = spark.sql(s"SELECT * FROM graft.`$root@files` " +
      "VERSION AS OF 2").collect()
    assert(f2.map(_.getAs[Long]("record_count")).sum == 300L,
      "files at v2 = everything, including the later-dropped partition")
    val e2hist = spark.sql(s"SELECT * FROM graft.`$root@entries` " +
      "VERSION AS OF 2").collect()
    assert(e2hist.filter(_.getAs[Int]("status") == 1)
      .map(_.getAs[Long]("record_count")).sum == 100L,
      "entries at v2 = v2's own ADDED census")
    t.tag("before_delete", 2L)
    assert(spark.sql(s"SELECT * FROM graft.`$root@files` " +
        "VERSION AS OF 'before_delete'").collect()
      .map(_.getAs[Long]("record_count")).sum == 300L)
    intercept[Exception](spark.sql(
      s"SELECT * FROM graft.`$root@files` VERSION AS OF 99").collect())
  }

  test("@all_entries / @all_delete_files / @metadata_log_entries " +
      "complete the history namespace") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-allentries-").toString
    val t = SnapshotTable.at(root)
    val rows = (1 to 300).map(i => (i.toLong, s"p${i % 3}", s"x$i"))
      .toDF("id", "p", "s")
    t.createOrReplace(rows.filter(col("id") <= 200), Seq("p"))        // v1
    t.append(spark, rows.filter(col("id") > 200))                     // v2
    t.mergeMoR(spark, Seq((5L, "p2", "x", "D")).toDF("id", "p", "s", "op"),
      Seq("id"), keepDeletes = false)                                 // v3
    t.compact(spark)                                                  // v4

    // @all_entries = each snapshot's own census, stacked: v1 ADDED all
    // 200 root rows, v2 ADDED its 100 and carried v1's 200 EXISTING
    val ae = spark.sql(s"SELECT * FROM graft.`$root@all_entries`")
      .collect().toSeq
    assert(ae.map(_.getAs[Long]("version")).distinct.sorted ==
      t.manifestVersions)
    def sumAdded(v: Long): Long = ae
      .filter(r => r.getAs[Long]("version") == v &&
        r.getAs[Int]("status") == 1 &&
        r.getAs[String]("content") == "data")
      .map(_.getAs[Long]("record_count")).sum
    assert(sumAdded(1L) == 200L, "v1 census = the root commit's files")
    assert(sumAdded(2L) == 100L, "v2 census = its own appended batch")
    assert(ae.filter(r => r.getAs[Long]("version") == 2L &&
        r.getAs[Int]("status") == 0)
      .map(_.getAs[Long]("record_count")).sum == 200L)
    assert(ae.exists(r => r.getAs[Long]("version") == 3L &&
      r.getAs[String]("content") == "equality-delete" &&
      r.getAs[Int]("status") == 1),
      "v3's fresh delete file lists as ADDED in ITS snapshot's census")

    // the live delete debt is folded, but @all_delete_files still sees
    // the delete file through the retained v3 manifest
    assert(spark.sql(s"SELECT * FROM graft.`$root@delete_files`")
      .count() == 0, "compaction folded the live debt")
    val adf = spark.sql(s"SELECT * FROM graft.`$root@all_delete_files`")
      .collect()
    assert(adf.length == 1 &&
      adf.head.getAs[String]("content") == "equality" &&
      adf.head.getAs[Long]("record_count") == 1L &&
      adf.head.getAs[Long]("commit_version") == 3L,
      s"folded delete file stays visible, got ${adf.toSeq}")

    // @all_data_files answers the same relation as @all_files
    val af = spark.sql(
      s"SELECT * FROM graft.`$root@all_files` ORDER BY file_path")
    val adf2 = spark.sql(
      s"SELECT * FROM graft.`$root@all_data_files` ORDER BY file_path")
    assert(af.collect().toSeq == adf2.collect().toSeq)

    // @metadata_log_entries: one row per retained manifest document,
    // exactly one head, every file on disk, operations recorded
    val ml = spark.sql(s"SELECT * FROM graft.`$root@metadata_log_entries`")
      .collect().toSeq
    assert(ml.map(_.getAs[Long]("version")).sorted == t.manifestVersions)
    assert(ml.count(_.getAs[Boolean]("is_current")) == 1)
    assert(ml.filter(_.getAs[Boolean]("is_current"))
      .head.getAs[Long]("version") == t.currentVersion)
    assert(ml.forall(r =>
      Files.exists(java.nio.file.Paths.get(r.getAs[String]("file")))))
    assert(ml.find(_.getAs[Long]("version") == 4L)
      .exists(_.getAs[String]("operation") == "replace"),
      "compaction logs as a replace operation")

    // the new names are reserved ref shapes
    intercept[IllegalArgumentException] { t.tag("all_entries") }
    intercept[IllegalArgumentException] { t.branch("all_data_files") }
    intercept[IllegalArgumentException] { t.tag("all_delete_files") }
    intercept[IllegalArgumentException] { t.branch("metadata_log_entries") }
  }

  test("CALL ancestors_of returns the lineage, newest first") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-ancestors-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 5).map(i => (i.toLong, "a")).toDF("id", "s"))
    t.append(spark, Seq((6L, "b")).toDF("id", "s"))     // v2
    t.append(spark, Seq((7L, "c")).toDF("id", "s"))     // v3
    t.rollbackTo(2L)
    t.append(spark, Seq((8L, "d")).toDF("id", "s"))     // v4, parent v2
    // the CALL RETURNS rows (not an empty relation): v3 is abandoned
    // and never appears; order is newest-first like Iceberg's
    val rows = spark.sql(
      s"CALL graft.system.ancestors_of(table => '$root')").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L, 2L, 1L),
      s"lineage: ${rows.mkString(",")}")
    assert(rows.forall(_.getLong(1) > 0L), "timestamps recorded")
    // explicit snapshot_id walks from there — the abandoned head's
    // own lineage is still answerable while retained
    val old = spark.sql(s"CALL graft.system.ancestors_of(" +
      s"table => '$root', snapshot_id => 3)").collect()
    assert(old.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
    intercept[Exception] {
      spark.sql(s"CALL graft.system.ancestors_of('$root', 99)").collect()
    }
  }
}
