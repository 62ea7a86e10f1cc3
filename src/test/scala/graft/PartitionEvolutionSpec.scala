package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Partition-spec evolution: metadata-only commit; mixed-layout reads;
  * merges bounded per spec (legacy files rewritten only when touched
  * under THEIR spec, migrating as a side effect); compaction as the
  * eager migration path; pruning on both old and new partition columns.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val t0 = ts("2026-01-01 00:00:00")
  private val t1 = ts("2026-02-01 00:00:00")

  // p = id % 4 (original spec), q = id % 3 (evolved spec) — both are
  // ordinary data columns; the spec only decides which one is
  // path-encoded for files written under it
  private def rows(ids: Seq[Int], upd: Timestamp, v: Double) =
    ids.map(i => (i.toLong, upd, v, i % 4, i % 3))
      .toDF("id", "upd", "v", "p", "q")

  test("metadata-only evolve; merges stay bounded; touched legacy files migrate") {
    val root = Files.createTempDirectory("graft-pevo-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(rows(1 to 80, t0, 1.0), Seq("p"))
    val v1Files = tbl.currentManifest.files.map(_.path).toSet
    assert(tbl.currentManifest.files.forall(_.partition.keySet == Set("p")))

    tbl.evolvePartitioning(spark, Seq("q"))
    val m2 = tbl.currentManifest
    assert(m2.partitionColumns == Seq("q"))
    assert(m2.files.map(_.path).toSet == v1Files, "evolve must not move data")
    // mixed-era read immediately after the metadata commit: p comes from
    // paths, q from data
    val r = tbl.read(spark)
    assert(r.count() == 80)
    assert(r.filter(col("p") === col("id") % 4).count() == 80)
    assert(r.filter(col("q") === col("id") % 3).count() == 80)

    // merge touching only ids with p=1 → under the legacy spec only the
    // p=1 partition rewrites (and migrates to q=…); p∈{0,2,3} carry
    val changes = rows(Seq(1, 5, 9), t1, 2.0).withColumn("op", lit("U"))
    tbl.merge(spark, changes, Seq("id"), keepDeletes = false)
    val m3 = tbl.currentManifest
    val carried = m3.files.filter(f => v1Files(f.path))
    assert(carried.nonEmpty && carried.forall(_.partition("p") != "1"))
    val migrated = m3.files.filterNot(f => v1Files(f.path))
    assert(migrated.nonEmpty && migrated.forall(_.partition.keySet == Set("q")))
    val out = tbl.read(spark)
    assert(out.count() == 80)
    assert(out.filter(col("v") === 2.0).count() == 3)
    assert(out.filter(col("p") === col("id") % 4).count() == 80)

    // second merge touching only q=0 rows already under the new spec:
    // every remaining legacy file must survive untouched
    val legacyBefore = m3.files.filter(_.partition.keySet == Set("p")).map(_.path).toSet
    // id 9 lives in a new-spec file (q=0); ids 12..: p=0 → legacy q=0? id
    // must be chosen from the MIGRATED set to keep legacy files carried
    tbl.merge(spark, rows(Seq(9), t1, 3.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    val m4 = tbl.currentManifest
    assert(legacyBefore.subsetOf(m4.files.map(_.path).toSet),
      "merge under the new spec must not rewrite untouched legacy files")

    // pruning works on BOTH partition columns across mixed layouts:
    // q on new files from the path, q on legacy files from footer stats
    val (keptQ, total) = tbl.pruneCounts(col("q") === 99)
    assert(keptQ == 0 && total == m4.files.size)
    val (keptP, _) = tbl.pruneCounts(col("p") === 1)
    assert(keptP < total)

    // compaction migrates the remaining legacy groups eagerly
    tbl.compact(spark)
    val m5 = tbl.currentManifest
    assert(m5.files.forall(_.partition.keySet == Set("q")))
    val out2 = tbl.read(spark)
    assert(out2.count() == 80)
    assert(out2.filter(col("p") === col("id") % 4).count() == 80,
      "path-encoded legacy p values must survive migration as data")
    assert(out2.filter(col("v") === 3.0).count() == 1)
  }

  test("evolving between unpartitioned and partitioned specs") {
    val root = Files.createTempDirectory("graft-pevo2-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(rows(1 to 40, t0, 1.0)) // unpartitioned v1
    tbl.evolvePartitioning(spark, Seq("p"))
    // legacy unpartitioned files can hold any key → any merge touches them
    tbl.merge(spark, rows(Seq(2), t1, 2.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    val m = tbl.currentManifest
    assert(m.files.forall(_.partition.keySet == Set("p")),
      "unpartitioned legacy files migrate on first merge")
    assert(tbl.read(spark).count() == 40)

    // and back: evolving to unpartitioned makes merges full rewrites;
    // the partitioned files must still read correctly (p from paths)
    tbl.evolvePartitioning(spark, Nil)
    val r = tbl.read(spark)
    assert(r.count() == 40)
    assert(r.filter(col("p") === col("id") % 4).count() == 40)
    tbl.merge(spark, rows(Seq(3), t1, 3.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    assert(tbl.currentManifest.files.forall(_.partition.isEmpty))
    assert(tbl.read(spark).filter(col("v") === 3.0).count() == 1)

    // evolving to a column missing from the schema fails loudly
    intercept[IllegalArgumentException](
      tbl.evolvePartitioning(spark, Seq("nope")))
  }

  test("concurrent spec evolution aborts a rebasing merge") {
    val root = Files.createTempDirectory("graft-pevo3-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(rows(1 to 40, t0, 1.0), Seq("p"))
    val base = tbl.currentManifest
    tbl.evolvePartitioning(spark, Seq("q")) // pointer advances past base
    // a merge planned (and written) under the OLD spec must not rebase
    // over the evolution — landing it would revert partitionColumns
    intercept[IllegalStateException] {
      tbl.commitData(rows(Seq(4), t1, 2.0), Some(base), Seq("p"),
        base.properties, System.currentTimeMillis(),
        rebaseTouched = Some(Set(Map("p" -> "0"))))
    }
    assert(tbl.currentManifest.partitionColumns == Seq("q"))
  }
}
