package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Metadata-only DELETE (Iceberg's metadata delete): files the
  * predicate provably covers wholly drop from the manifest without a
  * read — a whole-partition DELETE is a pure metadata commit, no Spark
  * job. The proof rides the prune evaluator (negated-predicate
  * exclusion) plus a zero-null gate on every referenced column; this
  * suite pins both the fast path and the three-valued-logic safety
  * rail that keeps NULL-condition rows alive.
  */
class MetadataDeleteSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def dataDirExists(root: String, v: Long) =
    Files.isDirectory(Paths.get(root, "data", s"v$v"))

  test("whole-partition DELETE is a pure metadata commit; survivors " +
      "carry by reference; the changelog reports the drops") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-metadel-")
    val t = SnapshotTable.at(root)
    val df = (1 to 300).map(i => (i.toLong, i % 3, s"r$i")).toDF("id", "p", "s")
    t.createOrReplace(df, Seq("p"))
    val before = t.currentManifest
    val keptPaths = before.files.filter(_.partition("p") != "1")
      .map(_.path).toSet

    spark.sql(s"DELETE FROM graft.`$root` WHERE p = 1")
    val after = t.currentManifest
    assert(after.operation == "delete")
    assert(!dataDirExists(root, after.version),
      "a whole-partition delete must not write a data directory")
    assert(t.read(spark).count() == 200)
    assert(t.read(spark).filter(col("p") === 1).count() == 0)
    assert(after.files.map(_.path).toSet == keptPaths,
      "surviving partitions must carry their files by reference")
    // the metadata commit still yields row-level change rows
    val cl = t.readChangelog(spark, before.version, after.version)
    assert(cl.count() == 100 &&
      cl.select("_change_type").distinct().head.getString(0) == "delete")
  }

  test("range DELETE drops wholly-covered files without reading and " +
      "rewrites only the straddler") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-metadel-r-")
    val t = SnapshotTable.at(root)
    // ONE file per commit — so id <= 150 genuinely straddles commit 2's
    // file (a multi-file commit would split at the 150 boundary and the
    // whole delete would legitimately stay metadata-only)
    t.createOrReplace((1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "s")
      .coalesce(1))
    t.append(spark, (101 to 200).map(i => (i.toLong, s"b$i")).toDF("id", "s")
      .coalesce(1))
    t.append(spark, (201 to 300).map(i => (i.toLong, s"c$i")).toDF("id", "s")
      .coalesce(1))

    // covers ALL of commit 1's files, none of the others: pure metadata
    t.deleteWhere(spark, col("id") <= 100L)
    assert(t.currentManifest.operation == "delete")
    assert(!dataDirExists(root, t.currentVersion),
      "a file-aligned range delete must not write data")
    assert(t.read(spark).count() == 200)

    // straddles commit 2's range: its files rewrite, commit 3 carries
    val keep3 = t.currentManifest.files
      .filter(f => f.seq == 3L).map(_.path).toSet
    t.deleteWhere(spark, col("id") <= 150L)
    assert(t.read(spark).count() == 150)
    assert(t.read(spark).agg(min("id")).head.getLong(0) == 151L)
    assert(keep3.subsetOf(t.currentManifest.files.map(_.path).toSet),
      "the uncovered commit's files must carry by reference")
    assert(dataDirExists(root, t.currentVersion),
      "a straddling delete rewrites the partial file")
  }

  test("rows where the predicate is NULL survive — files with nulls in " +
      "referenced columns never metadata-drop") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-metadel-n-")
    val t = SnapshotTable.at(root)
    val rows = Seq((1L, Some(5L)), (2L, Some(5L)), (3L, None))
    t.createOrReplace(rows.toDF("id", "c").coalesce(1))
    t.deleteWhere(spark, col("c") === 5L)
    // c=5 rows go; the NULL-condition row stays (SQL three-valued DELETE)
    val left = t.read(spark).collect()
    assert(left.length == 1 && left.head.getLong(0) == 3L,
      s"NULL-cond row must survive, got ${left.mkString(",")}")
    assert(dataDirExists(root, t.currentVersion),
      "a null-bearing file must take the rewrite path, not the drop")
  }

  test("pending MoR deletes never block a metadata drop") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-metadel-m-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 200).map(i => (i.toLong, i % 2, s"r$i"))
      .toDF("id", "p", "s"), Seq("p"))
    // position-tombstone two rows inside partition 0, then drop the
    // whole partition by metadata — the masked rows were dying anyway
    t.deleteWherePositional(spark, col("id") === 2L || col("id") === 4L)
    assert(t.read(spark).count() == 198)
    t.deleteWhere(spark, col("p") === 0)
    assert(!dataDirExists(root, t.currentVersion),
      "the partition drop must stay metadata-only under pending deletes")
    assert(t.read(spark).count() == 100)
    assert(t.read(spark).filter(col("p") === 0).count() == 0)
  }

  test("file-level scoping: same-partition files the census excludes " +
      "carry by reference — through metadata drops AND rewrites") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-metadel-b-")
    val t = SnapshotTable.at(root)
    def slice(r: Range, tag: String) =
      r.map(i => (i.toLong, i % 2, s"$tag$i")).toDF("id", "p", "s")
    t.createOrReplace(slice(1 to 100, "a"), Seq("p"))
    t.append(spark, slice(101 to 200, "b"))
    val before = t.currentManifest.files.map(_.path).toSet
    // covers commit 1's p=1 file wholly; commit 2's p=1 file is a
    // same-partition BYSTANDER (excluded by id bounds) → pure metadata
    t.deleteWhere(spark, col("id") <= 100L && col("p") === 1)
    assert(t.currentManifest.operation == "delete",
      "a bystander must not force the rewrite path")
    assert(!dataDirExists(root, t.currentVersion))
    assert(t.read(spark).count() == 150)
    assert(t.currentManifest.files.map(_.path).toSet.subsetOf(before))
    // now a REWRITE with a bystander: commit 3 lands more p=1 files;
    // a mid-range delete implicates only commit 2's file — commit 3's
    // p=1 file must carry by reference through the rewrite
    val beforeC3 = t.currentManifest.files.map(_.path).toSet
    t.append(spark, slice(201 to 300, "c"))
    val c3p1 = t.currentManifest.files.map(_.path).toSet -- beforeC3
    assert(c3p1.nonEmpty)
    t.deleteWhere(spark, col("id").between(120L, 160L) && col("p") === 1)
    assert(dataDirExists(root, t.currentVersion), "a straddler rewrites")
    assert(t.read(spark).count() == 230)
    assert(c3p1.subsetOf(t.currentManifest.files.map(_.path).toSet),
      "stats-excluded same-partition files must survive the rewrite " +
        "by reference, not by copy")
  }

  test("retiring a whole day from a days()-partitioned table is a " +
      "metadata commit — the range predicate drops day-aligned files " +
      "via footer bounds") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-metadel-d-")
    val t = SnapshotTable.at(root)
    val rows = (0 until 300).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(f"2026-03-${i % 3 + 1}%02d 10:${i % 60}%02d:00"),
        s"r$i")
    }.toDF("id", "ts", "s")
    t.createOrReplace(rows, Seq("pd"),
      properties = Map("graft.transform.pd" -> "days(ts)"))
    require(t.currentManifest.files.nonEmpty)
    val before = t.currentManifest.files.map(_.path).toSet
    // the user spells the day as a timestamp range — the shape a
    // pipeline retiring day partitions actually writes
    t.deleteWhere(spark, col("ts") >= lit("2026-03-02 00:00:00").cast("timestamp")
      && col("ts") < lit("2026-03-03 00:00:00").cast("timestamp"))
    assert(t.currentManifest.operation == "delete",
      "a day-aligned range delete must be a metadata commit")
    assert(!dataDirExists(root, t.currentVersion))
    assert(t.read(spark).count() == 200)
    assert(t.currentManifest.files.map(_.path).toSet.subsetOf(before),
      "survivors carry by reference")
  }

  test("a predicate on a non-column expression declines the fast path " +
      "but deletes correctly") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-metadel-x-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    // the prune evaluator declines length(); the fast path must too
    t.deleteWhere(spark, length(col("s")) >= 3)
    assert(t.read(spark).count() == 9, "r1..r9 survive")
  }
}
