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

  test("SQL ADD/DROP PARTITION FIELD: hidden bucket materialization + prune") {
    val root = Files.createTempDirectory("graft-pevo-sql-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(rows(1 to 40, t0, 1.0)) // unpartitioned v1
    spark.sql(s"ALTER TABLE graft.`$root` ADD PARTITION FIELD bucket(8, id) AS pb")
    val m = tbl.currentManifest
    assert(m.partitionColumns == Seq("pb"))
    assert(m.properties.get("graft.transform.pb").contains("bucket(8,id)"))
    assert(org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
      .fieldNames.contains("pb"), "derived column joins the schema")

    // hidden partitioning: the writer NEVER supplies pb — the engine
    // derives it at commit, and the new files land in bucket dirs
    tbl.append(spark, rows(41 to 120, t0, 1.0))
    val newFiles = tbl.currentManifest.files.filter(_.partition.contains("pb"))
    assert(newFiles.nonEmpty && newFiles.forall(_.partition("pb").toInt < 8))
    // point predicate on the raw key prunes to one bucket among the
    // partitioned files (legacy files drop out on their own id stats)
    val (kept, total) = tbl.pruneCounts(col("id") === 100L)
    assert(kept < total && kept >= 1)
    assert(tbl.read(spark).count() == 120)
    assert(tbl.readWhere(spark, col("id") === 100L).count() == 1)
    // derived values equal the public murmur bucket
    assert(tbl.read(spark)
      .filter(col("pb") =!= expr("graft_bucket(id, 8)")).count() == 0)

    // DROP by transform spelling reverts the spec; column+property stay
    spark.sql(s"ALTER TABLE graft.`$root` DROP PARTITION FIELD bucket(8, id)")
    assert(tbl.currentManifest.partitionColumns.isEmpty)
    assert(tbl.currentManifest.properties.contains("graft.transform.pb"))
    // identity add/drop round-trips too
    spark.sql(s"ALTER TABLE graft.`$root` ADD PARTITION FIELD p")
    assert(tbl.currentManifest.partitionColumns == Seq("p"))
    spark.sql(s"ALTER TABLE graft.`$root` DROP PARTITION FIELD p")
    assert(tbl.currentManifest.partitionColumns.isEmpty)
    // unknown spec fails loudly
    intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$root` ADD PARTITION FIELD nope"))
  }

  test("months/years/hours/truncate transforms derive and prune") {
    // months over timestamps: range predicates on the raw ts prune
    val root = Files.createTempDirectory("graft-pevo-tr-").toString
    val tbl = SnapshotTable.at(root)
    val events = (0 until 6).flatMap(mo => (1 to 20).map(d =>
      (mo.toLong * 100 + d, ts(f"2026-0${mo + 1}%d-${d % 27 + 1}%02d 06:30:00"))))
      .toDF("id", "ts")
    tbl.createOrReplace(events.limit(0)) // empty, schema only
    spark.sql(s"ALTER TABLE graft.`$root` ADD PARTITION FIELD months(ts)")
    assert(tbl.currentManifest.partitionColumns == Seq("ts_month"))
    tbl.append(spark, events)
    val mm = tbl.currentManifest
    // (the empty bootstrap commit's zero-row file carries without a spec)
    val monthFiles = mm.files.filter(_.partition.contains("ts_month"))
    assert(monthFiles.nonEmpty &&
      monthFiles.forall(_.partition("ts_month").matches("2026-0[1-6]")))
    val cut = ts("2026-05-01 00:00:00")
    val (kept, total) = tbl.pruneCounts(col("ts") >= cut)
    assert(kept < total && kept <= 2, s"months must prune ($kept/$total)")
    assert(tbl.readWhere(spark, col("ts") >= cut).count() ==
      tbl.read(spark).filter(col("ts") >= cut).count())

    // years + hours on a second table, via the Scala API spelling
    val root2 = Files.createTempDirectory("graft-pevo-tr2-").toString
    val t2 = SnapshotTable.at(root2)
    t2.createOrReplace(events.limit(0))
    t2.addPartitionField("hours(ts)")
    t2.append(spark, events.filter(col("id") < 20)) // one month, one hour
    assert(t2.currentManifest.partitionColumns == Seq("ts_hour"))
    assert(t2.currentManifest.files.filter(_.partition.contains("ts_hour"))
      .forall(_.partition("ts_hour").endsWith("-06")))
    val (kh, th) = t2.pruneCounts(col("ts") < ts("2026-01-01 06:00:00"))
    assert(kh == 0 && th > 0, "pre-hour predicate prunes everything")

    // truncate over strings: prefix partition prunes equality on the raw
    val root3 = Files.createTempDirectory("graft-pevo-tr3-").toString
    val t3 = SnapshotTable.at(root3)
    val docs = Seq("alpha1", "alpha2", "beta7", "betaXY", "gamma3", "gammaZ")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    t3.createOrReplace(docs.limit(0))
    t3.addPartitionField("truncate(4, s)", Some("s4"))
    t3.append(spark, docs)
    assert(t3.currentManifest.partitionColumns == Seq("s4"))
    assert(t3.currentManifest.files.flatMap(_.partition.get("s4")).toSet ==
      Set("alph", "beta", "gamm"))
    val (ks, tts) = t3.pruneCounts(col("s") === "betaXY")
    assert(ks < tts, "string equality prunes through the prefix")
    assert(t3.readWhere(spark, col("s") === "betaXY").count() == 1)

    // truncate over ints: floor-block semantics, negatives included
    val root4 = Files.createTempDirectory("graft-pevo-tr4-").toString
    val t4 = SnapshotTable.at(root4)
    val ints = Seq(-7L, -1L, 0L, 3L, 9L, 12L).toDF("v")
    t4.createOrReplace(ints.limit(0))
    t4.addPartitionField("truncate(5, v)")
    t4.append(spark, ints)
    assert(t4.currentManifest.files.flatMap(_.partition.get("v_trunc")).toSet ==
      Set("-10", "-5", "0", "5", "10"))
    val (ki, ti) = t4.pruneCounts(col("v") === 12L)
    assert(ki == 1 && ti >= 5)
    assert(t4.readWhere(spark, col("v") < 0L).count() == 2)
  }

  test("SQL WRITE ORDERED BY sets the sort-order property; UNORDERED unsets") {
    val root = Files.createTempDirectory("graft-pevo-so-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(rows(1 to 10, t0, 1.0))
    spark.sql(s"ALTER TABLE graft.`$root` WRITE ORDERED BY (id, upd)")
    assert(tbl.currentManifest.properties
      .get("write.graft.sort-order").contains("id,upd"))
    spark.sql(s"ALTER TABLE graft.`$root` WRITE ORDERED BY v")
    assert(tbl.currentManifest.properties
      .get("write.graft.sort-order").contains("v"))
    spark.sql(s"ALTER TABLE graft.`$root` WRITE UNORDERED")
    assert(!tbl.currentManifest.properties.contains("write.graft.sort-order"))
    // non-graft target fails loudly, and plain ALTER still parses
    intercept[Exception](
      spark.sql("ALTER TABLE nosuch.tbl WRITE ORDERED BY x"))
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
