package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.Ingestion
import graft.table.SnapshotTable

/** Storage-layer behavior the DuckDB oracle can't see: snapshot versions,
  * partition-scoped rewrite (file carry-forward), compaction bin-packing,
  * retention GC, orphan removal, and the reference's own `--test` oracle
  * (diffCount == 0, reference: common/iceberg.py:291-301).
  */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable() =
    SnapshotTable.at(Files.createTempDirectory("graft-spec-").toString)

  private val cfg = SourceConfig("db", "t", Seq("id"), Seq("updated_at"))
  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2026-02-01 00:00:00")

  private def batch(ids: Range, upd: Timestamp, v: Double) =
    ids.map(i => (i.toLong, upd, v)).toDF("id", "updated_at", "v")

  test("ingest → merge round-trips; diffCount oracle is zero") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 100, t0, 1.0), cfg, t0)
    assert(tbl.currentVersion == 1)
    val b2 = batch(1 to 110, t1, 2.0) // 10 inserts, 100 updates
    Ingestion.run(spark, tbl, b2, cfg, t1)
    assert(tbl.currentVersion == 2)
    assert(Ingestion.diffCount(spark, tbl, b2, keepDeletes = false) == 0)
  }

  test("partition-scoped merge rewrites only touched partitions") {
    val tbl = freshTable()
    val pcfg = cfg.copy(partitionColumns = Seq("p"))
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", col("id") % 4)
    Ingestion.run(spark, tbl, withP(batch(1 to 100, t0, 1.0)), pcfg, t0)
    val v1Files = tbl.currentManifest.files
    assert(v1Files.forall(_.path.startsWith("data/v1/")))
    // change only rows in partition p=0 (ids divisible by 4)
    val changes = withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 0)
    Ingestion.run(spark, tbl, changes, pcfg.copy(mode = IngestMode.Incremental), t1)
    val m2 = tbl.currentManifest
    val (rewritten, carried) = m2.files.partition(_.path.startsWith("data/v2/"))
    assert(carried.nonEmpty, "untouched partitions must carry forward v1 files")
    assert(carried.forall(_.partition("p") != "0"))
    assert(rewritten.forall(_.partition("p") == "0"))
    // contents still correct
    val out = tbl.read(spark)
    assert(out.count() == 100)
    assert(out.filter(col("p") === 0 && col("v") === 2.0).count() == 25)
    assert(out.filter(col("p") =!= 0 && col("v") === 1.0).count() == 75)
    // manifest-level partition pruning reads only the requested partition
    assert(tbl.read(spark, p => p("p") == "1").count() == 25)
  }

  test("census overflow falls back loudly to an unscoped full rewrite") {
    val tbl = freshTable()
    val pcfg = cfg.copy(partitionColumns = Seq("p"))
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", col("id") % 8)
    Ingestion.run(spark, tbl, withP(batch(1 to 100, t0, 1.0)), pcfg, t0)
    // the change batch touches 5 partitions > the (lowered) 4-value cap:
    // the census must refuse to collect and the merge must degrade to a
    // FULL rewrite — a plan choice, not a driver OOM. The scoped path
    // would have carried partitions 5..7; fallback rewrites them too.
    val prev = SnapshotTable.MaxCensusPartitions
    SnapshotTable.MaxCensusPartitions = 4
    try {
      val changes = withP(batch(1 to 100, t1, 2.0)).filter(col("p") < 5)
      Ingestion.run(spark, tbl, changes,
        pcfg.copy(mode = IngestMode.Incremental), t1)
    } finally SnapshotTable.MaxCensusPartitions = prev
    val m2 = tbl.currentManifest
    assert(m2.files.forall(_.path.startsWith("data/v2/")),
      s"fallback must rewrite everything: ${m2.files.map(_.path)}")
    val out = tbl.read(spark)
    assert(out.count() == 100)
    assert(out.filter(col("p") < 5).filter(col("v") =!= 2.0).count() == 0)
    assert(out.filter(col("p") >= 5).filter(col("v") =!= 1.0).count() == 0)
  }

  test("partition-moving UPDATE with same-partition bystanders: the " +
      "excluded file carries, moved rows land in their new partition") {
    val base = spark
    import base.implicits._
    val tbl = SnapshotTable.at(
      java.nio.file.Files.createTempDirectory("graft-upd-bys-").toString)
    def slice(r: Range, tag: String) =
      r.map(i => (i.toLong, 1L, s"$tag$i")).toDF("id", "p", "s")
    tbl.createOrReplace(slice(1 to 100, "a"), Seq("p"))
    tbl.append(spark, slice(101 to 200, "b")) // second p=1 file, ids 101+
    val bFiles = tbl.currentManifest.files.filter(_.seq == 2L)
      .map(_.path).toSet
    assert(bFiles.nonEmpty)
    // moves ids 1..50 to partition 2; commit 2's file is excluded by
    // the id bounds — it must carry by reference, NOT be rewritten
    tbl.updateWhere(spark, Seq("p" -> lit(2L)),
      col("id") <= 50L && col("p") === 1L)
    val out = tbl.read(spark)
    assert(out.filter(col("p") === 2L).select("id").as[Long]
      .collect().sorted.toSeq == (1L to 50L))
    assert(out.filter(col("p") === 1L).count() == 150)
    assert(bFiles.subsetOf(tbl.currentManifest.files.map(_.path).toSet),
      "the census-excluded same-partition file must survive by reference")
  }

  test("qualified DML keys bind only through the statement's aliases") {
    // r4 ADVICE: `SET x.v = ...` with a stray qualifier must fail loudly,
    // never silently update the same-named top-level column
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0), cfg, t0)
    val p = tbl.root.toString
    // target-alias-qualified assignment works
    spark.sql(s"UPDATE graft.`$p` AS t SET t.v = 9.0 WHERE id <= 3")
    assert(tbl.read(spark).filter(col("v") === 9.0).count() == 3)
    // stray qualifier: loud refusal, no write
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"UPDATE graft.`$p` AS t SET x.v = 7.0")
    }
    assert(e.getMessage.contains("assignment key"))
    assert(tbl.read(spark).filter(col("v") === 7.0).count() == 0)
  }

  test("compaction bin-packs to one file and preserves contents") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl,
      batch(1 to 1000, t0, 1.0).repartition(8), cfg, t0)
    assert(tbl.currentManifest.files.size > 1)
    tbl.compact(spark)
    assert(tbl.currentManifest.files.size == 1)
    assert(tbl.read(spark).count() == 1000)
  }

  test("stale-version commit aborts before touching data or manifests") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 20, t0, 1.0), cfg, t0)
    val stale = tbl.currentManifest // v1 — another writer then advances
    Ingestion.run(spark, tbl, batch(1 to 20, t1, 2.0), cfg, t1)
    assert(tbl.currentVersion == 2)
    val v2Json = new String(Files.readAllBytes(
      tbl.root.resolve("meta/v2.json")))
    // a commit planned against a stale snapshot (and without rebase
    // rights) must abort BEFORE spending the data write
    val e = intercept[IllegalStateException] {
      tbl.commitData(batch(1 to 5, t1, 9.0), Some(stale), Nil, Map.empty,
        System.currentTimeMillis())
    }
    assert(e.getMessage.contains("concurrent commit"))
    assert(new String(Files.readAllBytes(tbl.root.resolve("meta/v2.json"))) == v2Json,
      "retained manifest must not be clobbered by the aborted commit")
    assert(tbl.removeOrphanFiles().isEmpty,
      "the abort must land before any file is written")
    assert(tbl.read(spark).count() == 20)
    assert(tbl.read(spark).filter(col("v") === 2.0).count() == 20)
  }

  test("ingestion records the full reference property set in the manifest") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0),
      cfg.copy(optimize = Optimize.Storage), t0)
    val props = tbl.currentManifest.properties
    // reference: default_iceberg_table_properties (common/iceberg.py:53-80)
    assert(props("format-version") == "2")
    assert(props("write.update.mode") == "merge-on-read")
    assert(props("write.merge.mode") == "merge-on-read")
    assert(props("write.delete.mode") == "merge-on-read")
    assert(props("write.parquet.compression-codec") == "gzip")
    assert(props("history.expire.min-snapshots-to-keep") == "90")
    // storage mode is physically merge-on-read since round 2
    assert(props("graft.physical-write-mode") == "merge-on-read")
  }

  test("merge-on-read merge equals copy-on-write and carries every old file") {
    val cow = freshTable(); val mor = freshTable()
    val scfg = cfg.copy(optimize = Optimize.Storage)
    Ingestion.run(spark, cow, batch(1 to 100, t0, 1.0), cfg, t0)
    Ingestion.run(spark, mor, batch(1 to 100, t0, 1.0), scfg, t0)
    val v1Files = mor.currentManifest.files.map(_.path).toSet
    // 10 inserts, 100 updates, 0 deletes vs incremental
    val b2 = batch(1 to 110, t1, 2.0)
    Ingestion.run(spark, cow, b2, cfg, t1)
    Ingestion.run(spark, mor, b2, scfg, t1)
    val m2 = mor.currentManifest
    assert(m2.deleteFiles.nonEmpty, "MoR merge must write equality deletes")
    assert(v1Files.subsetOf(m2.files.map(_.path).toSet),
      "MoR merge must carry every pre-merge data file untouched")
    val a = cow.read(spark).drop(MetaColumns.IngestionDatetime)
      .as[(Long, java.sql.Timestamp, Double)].collect().sorted.toSeq
    val b = mor.read(spark).drop(MetaColumns.IngestionDatetime)
      .as[(Long, java.sql.Timestamp, Double)].collect().sorted.toSeq
    assert(a == b, "MoR and CoW must resolve to identical contents")
    // reference --test oracle passes against the MoR table too
    assert(Ingestion.diffCount(spark, mor, b2, keepDeletes = false) == 0)
  }

  test("MoR update chains resolve by sequence; compact folds deletes away") {
    val tbl = freshTable()
    val scfg = cfg.copy(optimize = Optimize.Storage)
    Ingestion.run(spark, tbl, batch(1 to 50, t0, 1.0), scfg, t0)
    Ingestion.run(spark, tbl, batch(1 to 50, t1, 2.0), scfg, t1) // update all
    val t2 = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")
    // incremental: absent keys are NOT deletes — update half, keep rest
    Ingestion.run(spark, tbl, batch(1 to 25, t2, 3.0),
      scfg.copy(mode = IngestMode.Incremental), t2)
    assert(tbl.currentManifest.deleteFiles.size >= 2)
    val out = tbl.read(spark)
    assert(out.count() == 50)
    assert(out.filter(col("v") === 3.0).count() == 25)
    assert(out.filter(col("v") === 2.0).count() == 25)
    assert(out.filter(col("v") === 1.0).count() == 0,
      "rows superseded twice must not resurface")
    // compact folds the deletes into plain data files, contents invariant
    tbl.compact(spark)
    assert(tbl.currentManifest.deleteFiles.isEmpty)
    val after = tbl.read(spark)
    assert(after.count() == 50)
    assert(after.filter(col("v") === 3.0).count() == 25)
    // once pre-compact snapshots age out, their delete files leave disk
    tbl.expireSnapshots(minSnapshotsToKeep = 1,
      nowMs = System.currentTimeMillis() + 250L * 24 * 3600 * 1000)
    tbl.removeOrphanFiles()
    val leftoverDeletes = java.nio.file.Files.walk(tbl.root.resolve("data"))
    try {
      import scala.jdk.CollectionConverters._
      assert(!leftoverDeletes.iterator().asScala.exists(p =>
        p.toString.contains("d/") && p.toString.endsWith(".parquet") &&
          p.getParent.getFileName.toString.matches("v\\d+d")),
        "expired delete files must be reclaimed")
    } finally leftoverDeletes.close()
    assert(tbl.read(spark).count() == 50)
  }

  test("partition-scoped CoW merge carries pending MoR deletes forward") {
    import org.apache.spark.sql.functions.lit
    val tbl = freshTable()
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", col("id") % 4)
    tbl.createOrReplace(withP(batch(1 to 100, t0, 1.0)), Seq("p"))
    // MoR merge updates EVERY key → deletes mask all v1 rows
    tbl.mergeMoR(spark, withP(batch(1 to 100, t1, 2.0)).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    assert(tbl.currentManifest.deleteFiles.nonEmpty)
    // CoW merge touching ONLY partition 0: carried partitions 1..3 hold
    // both v1 raw rows and v2 applied rows — the pending deletes must
    // survive the commit or superseded v1 rows resurrect
    val t2 = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")
    tbl.merge(spark,
      withP(batch(1 to 100, t2, 3.0)).filter(col("p") === 0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    assert(tbl.currentManifest.deleteFiles.nonEmpty,
      "pending equality deletes must be carried by the CoW commit")
    val out = tbl.read(spark)
    assert(out.count() == 100, "no superseded row may resurface")
    assert(out.filter(col("v") === 3.0).count() == 25)
    assert(out.filter(col("v") === 2.0).count() == 75)
    assert(out.filter(col("v") === 1.0).count() == 0)
  }

  test("insert-only MoR merge registers no delete file") {
    val tbl = freshTable()
    val scfg = cfg.copy(optimize = Optimize.Storage,
      mode = IngestMode.Incremental)
    Ingestion.run(spark, tbl, batch(1 to 20, t0, 1.0), scfg, t0)
    Ingestion.run(spark, tbl, batch(21 to 40, t0, 1.0), scfg, t0) // pure inserts
    assert(tbl.currentManifest.deleteFiles.isEmpty,
      "no evictions → no delete file → reads stay on the fast path")
    assert(tbl.read(spark).count() == 40)
  }

  test("recorded physical-write-mode wins over a flipped run config") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 30, t0, 1.0),
      cfg.copy(optimize = Optimize.Storage), t0)
    // later run arrives with the default (speed) config: the table's
    // recorded merge-on-read mode must still be honored
    Ingestion.run(spark, tbl, batch(1 to 30, t1, 2.0),
      cfg.copy(optimize = Optimize.Speed), t1)
    assert(tbl.currentManifest.deleteFiles.nonEmpty,
      "existing MoR table must keep merging merge-on-read")
    val out = tbl.read(spark)
    assert(out.count() == 30)
    assert(out.filter(col("v") === 2.0).count() == 30)
  }

  test("MoR soft-delete keeps flagged rows via appended files") {
    val tbl = freshTable()
    val scfg = cfg.copy(optimize = Optimize.Storage,
      flags = IngestFlags(keepDeletes = true))
    Ingestion.run(spark, tbl, batch(1 to 30, t0, 1.0), scfg, t0)
    Ingestion.run(spark, tbl, batch(1 to 20, t1, 2.0), scfg, t1) // 21..30 deleted
    val out = tbl.read(spark)
    assert(out.count() == 30)
    assert(out.filter(col(MetaColumns.HardDeleted) === true).count() == 10)
    assert(out.filter(col(MetaColumns.HardDeleted) === false &&
      col("v") === 2.0).count() == 20)
  }

  test("MoR delete files are partition-scoped and exonerate other partitions") {
    val tbl = freshTable()
    // ids interleave across partitions so KEY BOUNDS overlap: without
    // partition scoping, p=1's files would be dirty after a p=0-only merge
    val df0 = (1 to 100).map(i => (i.toLong, t0, 1.0, (i % 2).toLong))
      .toDF("id", "updated_at", "v", "p")
    tbl.createOrReplace(df0, Seq("p"))
    val changes = (2 to 50 by 2).map(i => (i.toLong, t1, 2.0, 0L))
      .toDF("id", "updated_at", "v", "p").withColumn("op", lit("U"))
    tbl.mergeMoR(spark, changes, Seq("id"), keepDeletes = false)
    val m = tbl.currentManifest
    // per-partition delete entries with the partition value recorded
    assert(m.deleteFiles.nonEmpty)
    assert(m.deleteFiles.forall(_.partition.keySet == Set("p")),
      s"deletes must be partition-scoped: ${m.deleteFiles}")
    assert(m.deleteFiles.map(_.partition("p")).toSet == Set("0"))
    // the other partition's files are NOT dirty even though the delete's
    // id bounds [2,50] overlap p=1's id range [1,99]
    val dirty = tbl.morDirtyFiles(m)
    assert(dirty.nonEmpty)
    assert(dirty.forall(_.partition("p") == "0"),
      "a p=0-scoped delete must not dirty p=1 files")
    // correctness: merged values visible, untouched partition untouched
    val out = tbl.read(spark)
    assert(out.count() == 100)
    assert(out.filter(col("p") === 0 && col("v") === 2.0).count() === 25L)
    assert(out.filter(col("p") === 1 && col("v") =!= 1.0).count() === 0L)
  }

  test("chunked manifests round-trip and REUSE unchanged chunks across commits") {
    import graft.table.{FileEntry, Manifest, ManifestJson, SnapshotTable}
    import scala.jdk.CollectionConverters._
    val tbl = SnapshotTable.at(Files.createTempDirectory("graft-chunk-").toString)
    val dir = tbl.root.resolve("meta")
    Files.createDirectories(dir)
    def listChunks() = scala.util.Using.resource(Files.list(dir))(
      _.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("files-")).toSeq.sorted)
    val n = 25000 // > chunk threshold; 64 partitions spread over buckets
    def entry(i: Int, ver: Int) = FileEntry(
      s"data/v$ver/p=${i % 64}/part-$i.parquet",
      Map("p" -> (i % 64).toString), seq = ver.toLong)
    val files1 = (0 until n).map(entry(_, 1))
    val m1 = Manifest(1L, 123L, "id BIGINT", files1, Seq("p"), Map("k" -> "v"))
    val p1 = dir.resolve("v1.json")
    ManifestJson.write(p1, m1)
    // main document stays bounded; the list lives in side chunks
    assert(Files.size(p1) < 64 * 1024, "main manifest must stay small")
    val chunks1 = listChunks()
    assert(chunks1.size >= 2 && chunks1.size <= 4) // 25000 / 10000 → ≤4 buckets
    val back = ManifestJson.read(p1)
    assert(back.copy(files = Nil) == m1.copy(files = Nil))
    assert(back.files.toSet == m1.files.toSet,
      "chunked manifest must round-trip exactly (bucketed order)")
    // commit 2 rewrites ONE partition: only the chunk holding that
    // partition's bucket changes — every other chunk is reused by name
    val files2 = files1.filterNot(_.partition("p") == "3") ++
      (0 until n).filter(_ % 64 == 3).map(entry(_, 2))
    val m2 = m1.copy(version = 2L, files = files2)
    ManifestJson.write(dir.resolve("v2.json"), m2)
    val chunks2 = listChunks()
    assert(chunks2.size == chunks1.size + 1,
      s"a one-partition commit must write exactly one new chunk " +
        s"(${chunks1.size} → ${chunks2.size})")
    assert(ManifestJson.read(dir.resolve("v2.json")).files.toSet == files2.toSet)
    // chunk GC is by reachability: shared chunks survive one manifest's
    // expiry, unreferenced ones are swept
    ManifestJson.delete(p1)
    val sweptAfterV1 = tbl.removeOrphanFiles(olderThanMs = 0L)
    assert(listChunks().toSet ==
      ManifestJson.chunkNames(dir.resolve("v2.json")).toSet,
      "chunks shared with v2 must survive v1 expiry; v1-only ones are swept")
    assert(sweptAfterV1.nonEmpty, "v1's dirty-partition chunk is unreferenced")
    ManifestJson.delete(dir.resolve("v2.json"))
    tbl.removeOrphanFiles(olderThanMs = 0L)
    assert(listChunks().isEmpty, "no manifests → all chunks swept")
  }

  test("recorded partition transforms prune raw-column predicates") {
    import graft.functions.Bucket
    // bucket(8, id): the table is partitioned by the murmur bucket of the
    // key (the reference's planned transform, dmsdatabase1.py:79-85); a
    // point predicate on the RAW key must prune to that bucket's files
    val tbl = freshTable()
    val df0 = (1 to 512).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .withColumn("pb", expr("graft_bucket(id, 8)"))
    tbl.createOrReplace(df0, Seq("pb"),
      properties = Map("graft.transform.pb" -> "bucket(8,id)"))
    val total = tbl.currentManifest.files.size
    val (kept1, _) = tbl.pruneCounts(col("id") === 42L)
    val perBucket = tbl.pruneCounts(col("pb") === Bucket.bucket(42L, 8))._1
    assert(kept1 == perBucket && kept1 < total,
      s"id=42 must keep only bucket ${Bucket.bucket(42L, 8)}'s files " +
        s"($kept1/$total)")
    assert(tbl.readWhere(spark, col("id") === 42L).count() == 1)
    // IN over two keys keeps at most both buckets
    val (keptIn, _) = tbl.pruneCounts(col("id").isin(42L, 99L))
    assert(keptIn <= tbl.pruneCounts(col("pb") === Bucket.bucket(42L, 8))._1 +
      tbl.pruneCounts(col("pb") === Bucket.bucket(99L, 8))._1)
    assert(tbl.readWhere(spark, col("id").isin(42L, 99L)).count() == 2)
    // range predicates on the key can't use the bucket (not monotonic)
    assert(tbl.pruneCounts(col("id") <= 5L)._1 > 0)

    // days(ts): a day-partitioned table prunes RANGE predicates on the
    // raw timestamp through the day value
    val tbl2 = freshTable()
    val days = (0 until 8).flatMap(d => (0 until 10).map(h =>
      (d.toLong * 10 + h, Timestamp.valueOf(f"2026-03-0${d + 1}%d $h%02d:00:00"))))
      .toDF("id", "ts")
      .withColumn("event_day", to_date(col("ts")))
    tbl2.createOrReplace(days, Seq("event_day"),
      properties = Map("graft.transform.event_day" -> "days(ts)"))
    val total2 = tbl2.currentManifest.files.size
    val cut = Timestamp.valueOf("2026-03-06 00:00:00")
    val (keptTs, _) = tbl2.pruneCounts(col("ts") >= cut)
    assert(keptTs < total2,
      s"ts range must prune via the day partition ($keptTs/$total2)")
    assert(keptTs <= 3, s"only days 06..08 can match ($keptTs)")
    assert(tbl2.readWhere(spark, col("ts") >= cut).count() ==
      tbl2.read(spark).filter(col("ts") >= cut).count())
    // a mid-day cut keeps its own day too (boundaries are [start, next))
    val mid = Timestamp.valueOf("2026-03-05 05:00:00")
    assert(tbl2.readWhere(spark, col("ts") >= mid).count() == 35)
  }

  test("STRING-key bucket transform prunes point predicates (Appendix B)") {
    import graft.functions.Bucket
    // the reference's UD1 bucketed longs only; Iceberg's spec buckets
    // strings too — a string natural key gets hidden bucket partitioning
    val tbl = freshTable()
    val df0 = (1 to 512).map(i => (i.toLong, s"name$i")).toDF("id", "s")
      .withColumn("pb", expr("graft_bucket(s, 8)"))
    tbl.createOrReplace(df0, Seq("pb"),
      properties = Map("graft.transform.pb" -> "bucket(8,s)"))
    val total = tbl.currentManifest.files.size
    val hit = Bucket.bucketUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString("name42"), 8)
    val (kept, _) = tbl.pruneCounts(col("s") === "name42")
    val perBucket = tbl.pruneCounts(col("pb") === hit)._1
    assert(kept == perBucket && kept < total,
      s"s='name42' must keep only bucket $hit's files ($kept/$total)")
    assert(tbl.readWhere(spark, col("s") === "name42").count() == 1)
    // IN over literals intersects to at most the union of their buckets
    assert(tbl.readWhere(spark, col("s").isin("name42", "name99")).count() == 2)
    // writers never supply the derived column: an append re-derives pb
    // from the string source identically (hidden-partitioning invariant)
    tbl.append(spark, Seq((513L, "name513")).toDF("id", "s"))
    assert(tbl.readWhere(spark, col("s") === "name513").count() == 1)
    val hit513 = Bucket.bucketUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString("name513"), 8)
    assert(tbl.pruneCounts(col("s") === "name513")._1 ==
      tbl.pruneCounts(col("pb") === hit513)._1)
  }

  test("orphan removal is age-gated: young files survive, aged ones go") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0), cfg, t0)
    // a stray file no manifest references — e.g. an in-flight writer's
    // output whose commit hasn't landed yet
    val strayDir = Files.createDirectories(tbl.root.resolve("data/v99"))
    val stray = strayDir.resolve("part-stray.parquet")
    Files.write(stray, Array[Byte](1, 2, 3))
    // default 3-day threshold: the young file must survive maintenance
    assert(tbl.removeOrphanFiles().isEmpty)
    assert(Files.exists(stray), "young orphan must survive (in-flight writer)")
    // pretend time passed: with 'now' beyond the threshold it is reclaimed
    val later = System.currentTimeMillis() + 4L * 24 * 3600 * 1000
    // dry_run (Iceberg's audit argument) REPORTS without deleting —
    // on the driver path and the distributed path alike
    assert(tbl.removeOrphanFiles(nowMs = later, dryRun = true) ==
      Seq("data/v99/part-stray.parquet"))
    assert(Files.exists(stray), "dry run must not delete")
    assert(tbl.removeOrphanFiles(spark, 3L * 24 * 3600 * 1000, later,
      maxDriverEntries = 0L, dryRun = true)
      .contains("data/v99/part-stray.parquet"))
    assert(Files.exists(stray), "distributed dry run must not delete")
    val removed = tbl.removeOrphanFiles(nowMs = later)
    assert(removed == Seq("data/v99/part-stray.parquet"))
    assert(!Files.exists(stray))
    assert(tbl.read(spark).count() == 10)
  }

  test("distributed orphan sweep = driver sweep, loose AND chunked layouts") {
    import graft.table.ManifestJson
    val threeDays = 3L * 24 * 3600 * 1000
    val later = System.currentTimeMillis() + 4L * 24 * 3600 * 1000
    def buildFixture(chunked: Boolean): SnapshotTable = {
      val (savedT, savedS) = (ManifestJson.ChunkThreshold, ManifestJson.ChunkSize)
      if (chunked) { ManifestJson.ChunkThreshold = 8; ManifestJson.ChunkSize = 8 }
      try {
        val t = SnapshotTable.at(
          Files.createTempDirectory("graft-orphpar-").toString)
        val df = (1 to 200).map(i => (i.toLong, i % 16, 1.0))
          .toDF("id", "p", "v")
        t.createOrReplace(df, Seq("p"))
        t.append(spark, Seq((201L, 0, 2.0)).toDF("id", "p", "v"))
        // a pending POSITIONAL delete file must count as live
        t.deleteWherePositional(spark, col("id") === 5L)
        // aged orphan debris: inside a live commit dir + a foreign dir
        Files.write(t.root.resolve("data/v1/part-stray.parquet"),
          Array[Byte](1, 2, 3))
        Files.createDirectories(t.root.resolve("data/v99/sub"))
        Files.write(t.root.resolve("data/v99/sub/part-x.parquet"),
          Array[Byte](4, 5))
        // a YOUNG stray (in-flight writer): mtime at the sweep clock
        Files.write(t.root.resolve("data/v99/part-young.parquet"),
          Array[Byte](6))
        Files.setLastModifiedTime(
          t.root.resolve("data/v99/part-young.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(later))
        // an aged EMPTY claimed dir (crashed writer)
        Files.createDirectories(t.root.resolve("data/v98"))
        t
      } finally {
        ManifestJson.ChunkThreshold = savedT; ManifestJson.ChunkSize = savedS
      }
    }
    for (chunked <- Seq(false, true)) {
      val a = buildFixture(chunked)
      val b = buildFixture(chunked)
      if (chunked)
        assert(a.currentManifest.files
          .isInstanceOf[graft.table.FileList], "fixture must chunk")
      val remA = a.removeOrphanFiles(nowMs = later)
      // maxDriverEntries=0 forces the DISTRIBUTED path on the twin fixture
      val remB = b.removeOrphanFiles(spark, threeDays, later, 0L)
      def dataOrphans(s: Seq[String]) = s.filter(_.startsWith("data/")).toSet
      val expected = Set("data/v1/part-stray.parquet",
        "data/v99/sub/part-x.parquet")
      assert(dataOrphans(remA) == expected, s"driver, chunked=$chunked")
      assert(dataOrphans(remB) == expected, s"distributed, chunked=$chunked")
      // live data, positional tombstones, and the young stray all survive
      for (t <- Seq(a, b)) {
        assert(t.read(spark).count() == 200, s"chunked=$chunked")
        assert(t.read(spark).filter(col("id") === 5L).count() == 0)
        assert(Files.exists(t.root.resolve("data/v99/part-young.parquet")),
          "young orphan must survive (in-flight writer)")
        assert(!Files.exists(t.root.resolve("data/v98")),
          "aged empty claimed dir must be reclaimed")
        assert(!Files.exists(t.root.resolve("data/v99/sub")),
          "emptied orphan dir must be reclaimed")
      }
    }
  }

  test("distributed sweep under a REAL clock: emptied dirs prune by " +
      "content, young files protect theirs, depth-1 strays reclaim") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0), cfg, t0)
    val now = System.currentTimeMillis()
    val old = java.nio.file.attribute.FileTime.fromMillis(
      now - 10L * 24 * 3600 * 1000)
    def stray(rel: String, backdate: Boolean): java.nio.file.Path = {
      val p = tbl.root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, Array[Byte](1))
      if (backdate) Files.setLastModifiedTime(p, old)
      p
    }
    // aged orphan in a nested dir: deleting it bumps the DIR's mtime —
    // the dir must still prune (content-based check, never dir mtime:
    // the old gate leaked every emptied dir forever under a real clock)
    stray("data/v77/sub/part-old.parquet", backdate = true)
    // aged orphan next to a YOUNG non-parquet temp: the dir survives
    // (an in-flight writer's claimed dir)
    stray("data/v78/part-old2.parquet", backdate = true)
    stray("data/v78/tmp-inflight", backdate = false)
    // external debris directly under data/ (no commit dir): the driver
    // walk reclaims these — the distributed listing must too
    stray("data/top-stray.parquet", backdate = true)
    val removed = tbl.removeOrphanFiles(spark,
      3L * 24 * 3600 * 1000, now, maxDriverEntries = 0L, dryRun = false)
    assert(removed.contains("data/v77/sub/part-old.parquet"))
    assert(removed.contains("data/v78/part-old2.parquet"))
    assert(removed.contains("data/top-stray.parquet"))
    assert(!Files.exists(tbl.root.resolve("data/v77")),
      "emptied dirs must prune despite their fresh mtime")
    assert(Files.exists(tbl.root.resolve("data/v78/tmp-inflight")),
      "a young temp file must protect its dir")
    assert(tbl.read(spark).count() == 10)
  }

  test("publish lock serializes commits across PROCESSES") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0), cfg, t0)
    Ingestion.run(spark, tbl, batch(1 to 12, t1, 2.0), cfg, t1)
    val lockPath = tbl.root.resolve("meta/_lock").toString
    // a second JVM (no Spark — just java.nio) takes the cross-process
    // publish lock and holds it; our pointer move must block until it
    // releases (rollbackTo is the publish critical section with no Spark
    // noise in the timing)
    val testClasses = new java.io.File(LockHolder.getClass.getProtectionDomain
      .getCodeSource.getLocation.toURI).getAbsolutePath
    val scalaLib = new java.io.File(classOf[scala.Function0[_]]
      .getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
    val cp = testClasses + java.io.File.pathSeparator + scalaLib
    val holdMs = 2000L
    val proc = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/java", "-cp", cp,
      "graft.LockHolder", lockPath, holdMs.toString)
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(out.readLine() == "LOCKED", "helper process must take the lock")
    val t0n = System.nanoTime()
    tbl.rollbackTo(1)
    val elapsedMs = (System.nanoTime() - t0n) / 1000000
    proc.waitFor()
    assert(elapsedMs >= holdMs - 600,
      s"pointer moved after ${elapsedMs}ms while another process held " +
        s"the lock for ${holdMs}ms — cross-process serialization broken")
    assert(tbl.currentVersion == 1L)
    assert(tbl.read(spark).count() == 10)
  }

  test("incremental read returns only partitions touched since a version") {
    val tbl = freshTable()
    val pcfg = cfg.copy(partitionColumns = Seq("p"))
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", col("id") % 4)
    Ingestion.run(spark, tbl, withP(batch(1 to 100, t0, 1.0)), pcfg, t0)
    val v1 = tbl.currentVersion
    // touch only partition p=0
    Ingestion.run(spark, tbl,
      withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 0),
      pcfg.copy(mode = IngestMode.Incremental), t1)
    val inc = tbl.readIncremental(spark, v1)
    // CoW semantics: the touched partition's CURRENT rows, nothing else
    assert(inc.select("p").distinct().as[Long].collect().toSeq == Seq(0L))
    assert(inc.count() == 25)
    assert(inc.filter(col("v") === 2.0).count() == 25)
    // no changes since current version → empty
    assert(tbl.readIncremental(spark, tbl.currentVersion).isEmpty)
  }

  test("expireSnapshots + removeOrphanFiles GC old data, keep current") {
    val tbl = freshTable()
    val now = System.currentTimeMillis()
    val old = now - 200L * 24 * 3600 * 1000
    Ingestion.run(spark, tbl, batch(1 to 50, t0, 1.0), cfg, t0)
    // backdate v1 so it is age-expired
    val m1 = tbl.manifest(1).copy(timestampMs = old)
    // v2 references only new files (a replace; selective compaction on an
    // already-compact table is deliberately a no-op)
    tbl.createOrReplace(batch(1 to 50, t0, 1.0), nowMs = now)
    // rewrite the backdated manifest for v1, then RE-OPEN the table:
    // manifests are immutable by contract (instances parse-once), so an
    // external edit is only visible to a fresh handle
    val metaPath = java.nio.file.Paths.get(tbl.root.toString, "meta", "v1.json")
    graft.table.ManifestJson.write(metaPath, m1)
    val reopened = SnapshotTable.at(tbl.root.toString)
    val expired = reopened.expireSnapshots(minSnapshotsToKeep = 1, nowMs = now)
    assert(expired == Seq(1L))
    assert(reopened.manifestVersions == Seq(2L))
    assert(reopened.read(spark).count() == 50)
    assert(reopened.removeOrphanFiles().isEmpty) // expiry already removed them
  }

  test("time travel, history, and rollback") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0), cfg, t0)
    Ingestion.run(spark, tbl, batch(1 to 20, t1, 2.0), cfg, t1)
    assert(tbl.readVersion(spark, 1).count() == 10)
    assert(tbl.readVersion(spark, 2).count() == 20)
    val hist = tbl.history(spark).collect()
      .map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(hist == Map(1L -> false, 2L -> true))
    tbl.rollbackTo(1)
    assert(tbl.currentVersion == 1)
    assert(tbl.read(spark).count() == 10)
    // rolled-back-over version is unreferenced → orphan GC can collect it
    intercept[IllegalArgumentException](tbl.rollbackTo(99))
  }

  test("a crash-orphaned ghost manifest is invisible and gets overwritten") {
    val tbl = freshTable()
    tbl.createOrReplace(batch(1 to 10, t0, 1.0), nowMs = 1000L)
    tbl.merge(spark, batch(1 to 20, t1, 2.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false, nowMs = 2000L)
    // simulate a writer killed between manifest write and pointer move:
    // v3.json exists but was never pointer-published
    val meta = tbl.root.resolve("meta")
    Files.copy(meta.resolve("v2.json"), meta.resolve("v3.json"))
    val fresh = SnapshotTable.at(tbl.root.toString) // no warm caches
    assert(fresh.currentVersion == 2L)
    assert(fresh.manifestVersions == Seq(1L, 2L), "ghost must stay hidden")
    assert(fresh.history(spark).count() == 2)
    assert(fresh.readAsOf(spark, Long.MaxValue / 2).count() == 20,
      "readAsOf must not serve the never-committed snapshot")
    intercept[IllegalArgumentException](fresh.readVersion(spark, 3L))
    intercept[IllegalArgumentException](fresh.rollbackTo(3L))
    // the next commit claims the ghost's slot and becomes visible
    fresh.merge(spark, batch(1 to 25, t1, 3.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false, nowMs = 3000L)
    assert(fresh.currentVersion == 3L)
    assert(fresh.read(spark).count() == 25)
    assert(fresh.readVersion(spark, 3L).count() == 25)
  }

  test("readAsOf serves the latest snapshot at or before the timestamp") {
    val tbl = freshTable()
    tbl.createOrReplace(batch(1 to 10, t0, 1.0), nowMs = 1000L)
    tbl.merge(spark, batch(1 to 20, t1, 2.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false, nowMs = 2000L)
    assert(tbl.readAsOf(spark, 1000L).count() == 10) // boundary inclusive
    assert(tbl.readAsOf(spark, 1999L).count() == 10)
    assert(tbl.readAsOf(spark, 5000L).count() == 20)
    intercept[IllegalArgumentException](tbl.readAsOf(spark, 999L))
    // same-millisecond commits (routine for metadata-only commits that
    // follow a data commit): the tie must break toward the LATEST version
    tbl.merge(spark, batch(1 to 25, t1, 3.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false, nowMs = 2000L)
    assert(tbl.readAsOf(spark, 2000L).count() == 25)
  }

  test("missing table and concurrent commits fail fast with clear errors") {
    val tbl = freshTable()
    val e = intercept[IllegalArgumentException](tbl.currentVersion)
    assert(e.getMessage.contains("does not exist"))
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0), cfg, t0)
    // simulate another writer advancing the pointer AFTER this merge
    // loaded the current manifest but before it commits: the
    // targetTransform hook runs inside that window
    val ptr = tbl.root.resolve("meta").resolve("_current")
    val changes = Ingestion.stamp(batch(1 to 3, t1, 2.0), t1, keepDeletes = false)
      .withColumn(MetaColumns.Op, org.apache.spark.sql.functions.lit("U"))
    val c = intercept[IllegalStateException](
      tbl.merge(spark, changes, Seq("id"), keepDeletes = false,
        targetTransform = t => { java.nio.file.Files.write(ptr, "7".getBytes); t }))
    assert(c.getMessage.contains("concurrent commit"))
  }

  test("days-partitioned table merges with partition-scoped rewrite") {
    val tbl = freshTable()
    val pcfg = SourceConfig("db", "ev", Seq("id"), Seq("updated_at"),
      partitionColumns = Seq("event_day"))
    // F5 days() transform: partition column = date_trunc of the event time
    def withDay(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("event_day", to_date(date_trunc("DAY", col("updated_at"))))
    val day1 = (1 to 60).map(i =>
      (i.toLong, Timestamp.valueOf(s"2026-01-0${i % 3 + 1} 10:00:00"), 1.0))
      .toDF("id", "updated_at", "v")
    Ingestion.run(spark, tbl, withDay(day1), pcfg, t0)
    // update only rows whose event moved to a NEW day (2026-01-05)
    val changes = (1 to 60).filter(_ % 6 == 0).map(i =>
      (i.toLong, Timestamp.valueOf("2026-01-05 10:00:00"), 2.0))
      .toDF("id", "updated_at", "v")
    Ingestion.run(spark, tbl, withDay(changes),
      pcfg.copy(mode = IngestMode.Incremental), t1)
    val out = tbl.read(spark)
    assert(out.count() == 60)
    assert(out.filter(col("v") === 2.0).count() == 10)
    // old days' files carry forward except... updated keys lived in old
    // partitions too: the merge rewrote the new day's partition AND any
    // partition that lost rows? (CoW: rows move partitions via rewrite)
    val m = tbl.currentManifest
    assert(m.files.exists(_.partition("event_day") == "2026-01-05"))
  }

  test("readers hold snapshot isolation across a concurrent merge") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 100, t0, 1.0), cfg, t0)
    // a reader resolves the manifest at read() time: its plan pins v1 files
    val reader = tbl.read(spark)
    Ingestion.run(spark, tbl, batch(1 to 150, t1, 2.0), cfg, t1)
    assert(tbl.currentVersion == 2)
    // the in-flight reader still sees the v1 snapshot (old files remain
    // until snapshot expiry), while a fresh read sees v2
    assert(reader.count() == 100)
    assert(reader.filter(col("v") === 2.0).count() == 0)
    assert(tbl.read(spark).count() == 150)
  }

  test("binary payload columns round-trip through the table") {
    val tbl = freshTable()
    val media = (1 to 20)
      .map(i => (i.toLong, t0, Array.fill(i * 10)(i.toByte)))
      .toDF("id", "updated_at", "payload")
    Ingestion.run(spark, tbl, media, cfg, t0)
    val back = tbl.read(spark)
      .select(col("id"), org.apache.spark.sql.functions.length(col("payload")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(back == (1 to 20).map(i => i.toLong -> i * 10).toMap)
    // and the multimodal decode runs over the stored bytes: these are
    // NOT media payloads, so the header sniff lands on the row-level
    // unknown outcome instead of failing the task
    val metas = graft.operators.Multimodal.decodeImages(spark,
      tbl.read(spark).select(col("id"), col("payload"))).collect()
    assert(metas.length == 20)
    assert(metas.forall(m => m.format == "unknown" && m.width == 0 &&
      m.n_bytes > 0))
  }

  test("commits after rollback never overwrite retained snapshots") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl, batch(1 to 10, t0, 1.0), cfg, t0)  // v1
    Ingestion.run(spark, tbl, batch(1 to 20, t0, 1.0), cfg, t0)  // v2
    Ingestion.run(spark, tbl, batch(1 to 30, t1, 2.0), cfg, t1)  // v3
    tbl.rollbackTo(1)
    Ingestion.run(spark, tbl, batch(1 to 12, t1, 3.0), cfg, t1)
    // the new commit takes v4 — v2/v3 manifests and data stay intact
    assert(tbl.currentVersion == 4)
    assert(tbl.manifestVersions == Seq(1L, 2L, 3L, 4L))
    assert(tbl.readVersion(spark, 3).count() == 30)
    assert(tbl.read(spark).count() == 12)
  }

  test("escaped and null partition values round-trip through the census") {
    val tbl = freshTable()
    val pcfg = cfg.copy(partitionColumns = Seq("p"))
    def mk(v: Double) = Seq(
      (1L, t0, v, "a+b"),       // '+' must not decode to space
      (2L, t0, v, "x y"),       // space escapes to %20 in the path
      (3L, t0, v, null: String) // null → __HIVE_DEFAULT_PARTITION__
    ).toDF("id", "updated_at", "v", "p")
    Ingestion.run(spark, tbl, mk(1.0), pcfg, t0)
    // update every row: a census/path mismatch would leave the old file
    // carried forward AND write new rows → duplicated keys
    val upd = mk(2.0).withColumn("updated_at", lit(t1))
    Ingestion.run(spark, tbl, upd, pcfg.copy(mode = IngestMode.Incremental), t1)
    val out = tbl.read(spark)
    assert(out.count() == 3, out.collect().mkString(","))
    assert(out.filter(col("v") === 2.0).count() == 3)
    assert(out.filter(col("p") === "a+b").count() == 1)
    assert(out.filter(col("p").isNull).count() == 1)
  }

  test("footer stats land in the manifest and prune predicate scans") {
    val tbl = freshTable()
    // range-cluster on id so files carry disjoint id bounds
    tbl.createOrReplace(
      batch(1 to 1000, t0, 1.0).repartitionByRange(5, col("id")))
    val m = tbl.currentManifest
    assert(m.files.size == 5)
    assert(m.files.forall(_.seq == 1L), "seq is persisted explicitly")
    assert(m.files.forall(_.stats.contains("id")), "footer bounds recorded")
    assert(m.files.forall(_.stats.contains("updated_at")),
      "timestamp bounds recorded (INT64 micros footers)")
    val cond = col("id") <= 100L
    val (kept, total) = tbl.pruneCounts(cond)
    assert(kept < total, s"id<=100 must skip files ($kept/$total)")
    assert(tbl.readWhere(spark, cond).count() == 100)
    // timestamp predicate prunes when files are time-clustered
    val tt = freshTable()
    val tsData = (1 to 1000).map(i =>
      (i.toLong, Timestamp.valueOf(f"2026-01-${i % 27 + 1}%02d 00:00:00"), 1.0))
      .toDF("id", "updated_at", "v")
    tt.createOrReplace(tsData.repartitionByRange(5, col("updated_at")))
    val tcond = col("updated_at") >= lit(Timestamp.valueOf("2026-01-25 00:00:00"))
    val (tk, ttot) = tt.pruneCounts(tcond)
    assert(tk < ttot, s"time-range filter must skip files ($tk/$ttot)")
    assert(tt.readWhere(spark, tcond).count() ==
      (1 to 1000).count(i => i % 27 + 1 >= 25))
    // compound predicates: AND tightens, OR widens, unknown columns scan
    assert(tbl.pruneCounts(col("id") <= 100L && col("v") === 1.0)._1 == kept)
    assert(tbl.pruneCounts(col("id") <= 100L || col("id") > 900L)._1 > kept)
    assert(tbl.pruneCounts(upper(col("updated_at").cast("string")) === "X")._1
      == total, "unanalyzable predicates must never prune")
  }

  test("float bounds prune in the double domain, not the float decimal") {
    val tbl = freshTable()
    // two files with constant float values: 0.1f's double value is
    // 0.10000000149…, ABOVE the double literal 0.1 — the float-decimal
    // encoding ("0.1") would wrongly prune the first file for f > 0.1d
    val df = (1 to 100).map(i =>
        (i.toLong, if (i <= 50) 0.1f else 0.9f))
      .toDF("id", "f")
    tbl.createOrReplace(df.repartitionByRange(2, col("id")))
    assert(tbl.currentManifest.files.size == 2)
    assert(tbl.pruneCounts(col("f") > 0.1)._1 == 2,
      "0.1f > 0.1d is TRUE in the double domain — neither file prunable")
    assert(tbl.readWhere(spark, col("f") > 0.1).count() == 100)
    // and the converse stays prunable: nothing is below 0.1d
    assert(tbl.pruneCounts(col("f") < 0.1)._1 == 0)
    assert(tbl.readWhere(spark, col("f") < 0.1).count() == 0)
  }

  test("null counts prune IS NULL / IS NOT NULL and all-null comparisons") {
    val tbl = freshTable()
    // file 1 (ids 1-100): s entirely null; file 2 (ids 101-200): no nulls
    val df = (1 to 200).map(i =>
        (i.toLong, if (i <= 100) null else "x"))
      .toDF("id", "s")
    tbl.createOrReplace(df.repartitionByRange(2, col("id")))
    val m = tbl.currentManifest
    assert(m.files.size == 2)
    assert(m.files.forall(_.rows == 100L), "row counts recorded")
    assert(m.files.forall(_.nulls.contains("s")), "null counts recorded")
    assert(tbl.pruneCounts(col("s").isNull)._1 == 1,
      "the null-free file can't satisfy IS NULL")
    assert(tbl.readWhere(spark, col("s").isNull).count() == 100)
    assert(tbl.pruneCounts(col("s").isNotNull)._1 == 1,
      "the all-null file can't satisfy IS NOT NULL")
    assert(tbl.readWhere(spark, col("s").isNotNull).count() == 100)
    // comparisons never match NULL: the all-null file prunes even though
    // it has no bounds for s
    assert(tbl.pruneCounts(col("s") === "x")._1 == 1)
    assert(tbl.readWhere(spark, col("s") === "x").count() == 100)
    // null-safe equality against NULL ≡ IS NULL: the all-null file is
    // exactly the one that matches and must be KEPT
    assert(tbl.pruneCounts(col("s") <=> lit(null))._1 == 1)
    assert(tbl.readWhere(spark, col("s") <=> lit(null)).count() == 100)
    // ...and <=> against a value prunes like = (null rows match neither)
    assert(tbl.pruneCounts(col("s") <=> "x")._1 == 1)
    assert(tbl.readWhere(spark, col("s") <=> "x").count() == 100)
    // manifest round-trip: a re-opened table prunes identically
    val reopened = SnapshotTable.at(tbl.root.toString)
    assert(reopened.pruneCounts(col("s").isNull)._1 == 1)
  }

  test("timestamp partition values prune correctly under a non-UTC session") {
    // Spark renders timestamp partition-path values in the SESSION
    // timezone; decodePartitionValue must parse them back with the same
    // zone or every instant-typed partition predicate shifts and prunes
    // the wrong files
    val tbl = freshTable()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val df = Seq(
        (1L, Timestamp.valueOf("2026-01-01 00:00:00")),
        (2L, Timestamp.valueOf("2026-06-01 00:00:00")))
        .toDF("id", "ts")
      tbl.createOrReplace(df, Seq("ts"))
      val cond = col("ts") === lit(Timestamp.valueOf("2026-01-01 00:00:00"))
      val (kept, total) = tbl.pruneCounts(cond)
      assert(total == 2 && kept == 1,
        s"instant equality must keep exactly the matching file ($kept/$total)")
      assert(tbl.readWhere(spark, cond).count() == 1)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("startsWith predicates prune on string bounds") {
    val tbl = freshTable()
    // file 1: strings a###..m###; file 2: n###..z###
    val df = (0 until 260).map(i =>
        (i.toLong, f"${('a' + i / 10).toChar}%c${i % 10}%03d"))
      .toDF("id", "s")
    tbl.createOrReplace(df.repartitionByRange(2, col("s")))
    assert(tbl.currentManifest.files.size == 2)
    assert(tbl.pruneCounts(col("s").startsWith("z"))._1 == 1)
    assert(tbl.readWhere(spark, col("s").startsWith("z")).count() == 10)
    assert(tbl.pruneCounts(col("s").startsWith("a0"))._1 == 1)
    // a prefix spanning the split point keeps both files; empty never prunes
    assert(tbl.pruneCounts(col("s").startsWith(""))._1 == 2)
    assert(tbl.readWhere(spark, col("s").startsWith("m")).count() == 10)
  }

  test("metadata-only rowCount agrees with the data; declines under deletes") {
    val tbl = freshTable()
    tbl.createOrReplace(batch(1 to 500, t0, 1.0).repartitionByRange(3, col("id")))
    assert(tbl.rowCount.contains(500L), "count answered from the manifest")
    // pending equality deletes: metadata alone can't count survivors
    tbl.mergeMoR(spark,
      batch(1 to 20, t1, 2.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    assert(tbl.rowCount.isEmpty)
    // compaction folds the deletes — the fast path returns
    tbl.compact(spark)
    assert(tbl.rowCount.contains(500L))
    assert(tbl.read(spark).count() == 500L)
  }

  test("partition values prune through readWhere like column stats") {
    val tbl = freshTable()
    tbl.createOrReplace(
      batch(1 to 100, t0, 1.0).withColumn("p", col("id") % 4), Seq("p"))
    val (kept, total) = tbl.pruneCounts(col("p") === 1L)
    assert(total >= 4 && kept < total)
    assert(tbl.readWhere(spark, col("p") === 1L).count() == 25)
    assert(tbl.readWhere(spark, col("p") === 1L && col("id") <= 10L).count() == 3)
  }

  test("stats-aware MoR read skips the delete join for non-overlapping files") {
    import org.apache.spark.sql.functions.lit
    val tbl = freshTable()
    tbl.createOrReplace(
      batch(1 to 1000, t0, 1.0).repartitionByRange(4, col("id")))
    // MoR update touching only ids 1..50: the delete file's key bounds
    // exonerate every data file whose id range lies beyond them
    tbl.mergeMoR(spark,
      batch(1 to 50, t1, 2.0).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    val m = tbl.currentManifest
    assert(m.deleteFiles.nonEmpty)
    assert(m.deleteFiles.forall(_.stats.contains("id")),
      "delete files must carry key-column bounds")
    val dirty = tbl.morDirtyFiles(m)
    assert(dirty.size == 1,
      s"only the v1 file covering ids 1..50 needs the anti-join, got " +
        dirty.map(_.path).mkString(", "))
    val out = tbl.read(spark)
    assert(out.count() == 1000)
    assert(out.filter(col("v") === 2.0).count() == 50)
    assert(out.filter(col("v") === 1.0).count() == 950)
  }

  test("selective compaction rewrites only groups that need it and folds deletes") {
    import org.apache.spark.sql.functions.lit
    val tbl = freshTable()
    // contiguous id ranges per partition so delete bounds can exonerate
    // the untouched partitions
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", ((col("id") - 1) / lit(100)).cast("long"))
    tbl.createOrReplace(withP(batch(1 to 400, t0, 1.0)), Seq("p"))
    tbl.mergeMoR(spark,
      withP(batch(1 to 100, t1, 2.0)).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    val before = tbl.currentManifest
    assert(before.deleteFiles.nonEmpty)
    val untouched = before.files.filter(_.partition("p") != "0").map(_.path).toSet
    assert(untouched.nonEmpty)
    tbl.compact(spark)
    val after = tbl.currentManifest
    assert(after.deleteFiles.isEmpty, "compaction folds deletes")
    assert(untouched.subsetOf(after.files.map(_.path).toSet),
      "already-compact unaffected partitions must be carried by reference")
    assert(after.files.count(_.partition("p") == "0") == 1,
      "the fragmented + delete-affected partition is rewritten")
    val out = tbl.read(spark)
    assert(out.count() == 400)
    assert(out.filter(col("v") === 2.0).count() == 100)
    assert(out.filter(col("v") === 1.0).count() == 300)
    // nothing left to do → compaction is a metadata no-op (no new commit)
    val v = tbl.currentVersion
    tbl.compact(spark)
    assert(tbl.currentVersion == v, "no-op compaction must not commit")
  }

  test("where-scoped rewrite_data_files compacts only matching partitions") {
    import org.apache.spark.sql.functions.lit
    val tbl = freshTable()
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", ((col("id") - 1) / lit(100)).cast("long"))
    // two small files per partition: every group is a bin-pack candidate
    tbl.createOrReplace(withP(batch(1 to 400, t0, 1.0)), Seq("p"))
    tbl.append(spark, withP(batch(401 to 800, t0, 1.0))
      .withColumn("p", ((col("id") - 401) / lit(100)).cast("long")))
    val before = tbl.currentManifest
    assert(before.files.count(_.partition("p") == "2") == 2)
    spark.sql(s"CALL graft.system.rewrite_data_files(" +
      s"table => '${tbl.root}', where => 'p = 2')")
    val after = tbl.currentManifest
    assert(after.files.count(_.partition("p") == "2") == 1,
      "the scoped partition bin-packs")
    val others = before.files.filterNot(_.partition("p") == "2")
      .map(_.path).toSet
    assert(others.subsetOf(after.files.map(_.path).toSet),
      "out-of-scope bin-pack candidates carry by reference")
    assert(tbl.read(spark).count() == 800)
    // the scope itself prunes at the manifest: a predicate matching
    // nothing is a no-op commit-wise
    val v = tbl.currentVersion
    tbl.compact(spark, where = Some(col("p") === 99L))
    assert(tbl.currentVersion == v, "empty scope must not commit")
  }

  test("delete-pressure compaction rewrites only groups over the ratio bar") {
    import org.apache.spark.sql.functions.lit
    val tbl = freshTable()
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", ((col("id") - 1) / lit(100)).cast("long"))
    // the table property drives the monthly maintenance cadence: compact()
    // with no argument self-heals exactly the groups whose masked-row
    // share crossed the bar
    tbl.createOrReplace(withP(batch(1 to 400, t0, 1.0)), Seq("p"),
      properties = Map("write.graft.compact.delete-ratio" -> "0.2"))
    // accumulate MoR merges: 60 masked rows on p=0 (over the bar at
    // 60/161), one masked row on p=1 (1/100, far under it — the updated
    // row MOVES to p=0, so p=1 keeps a single data file and the delete)
    tbl.mergeMoR(spark, withP(batch(1 to 30, t1, 2.0)).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    tbl.mergeMoR(spark, withP(batch(31 to 60, t1, 2.1)).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    tbl.mergeMoR(spark,
      Seq((101L, t1, 3.0, 0L)).toDF("id", "updated_at", "v", "p")
        .withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    // masked-row counts round-trip the manifest (fresh handle re-parses)
    val before = SnapshotTable.at(tbl.root.toString).currentManifest
    assert(before.deleteFiles.map(_.rows).sorted == Seq(1L, 30L, 30L))
    val carriedP1 = before.files.filter(_.partition("p") == "1").map(_.path)
    assert(carriedP1.size == 1)
    tbl.compact(spark)
    val after = tbl.currentManifest
    assert(after.files.count(_.partition("p") == "0") == 1,
      "the over-pressure group is rewritten and bin-packed")
    assert(after.deleteFiles.map(d => (d.partition("p"), d.rows)) ==
      Seq(("1", 1L)),
      "the under-pressure group keeps its delete resolving on read")
    assert(carriedP1.toSet.subsetOf(after.files.map(_.path).toSet),
      "the under-pressure group's data file is carried by reference")
    val out = tbl.read(spark)
    assert(out.count() == 400)
    assert(out.filter(col("p") === 0).count() == 101)
    assert(out.filter(col("p") === 1).count() == 99)
    assert(out.filter(col("id") === 101 && col("v") === 3.0).count() == 1)
    // an explicit eager fold (ratio 0) overrides the property and clears
    // the remaining debt
    tbl.compact(spark, deleteRatio = Some(0.0))
    assert(tbl.currentManifest.deleteFiles.isEmpty)
    assert(tbl.read(spark).count() == 400)
    assert(tbl.read(spark).filter(col("id") === 101).count() == 1)
  }

  test("concurrent partition-scoped merges on disjoint partitions both land") {
    import org.apache.spark.sql.functions.lit
    val tbl = freshTable()
    def withP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", col("id") % 4)
    tbl.createOrReplace(withP(batch(1 to 100, t0, 1.0)), Seq("p"))
    val base = tbl.currentVersion
    val changesA = withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 0)
      .withColumn("op", lit("U"))
    val changesB = withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 1)
      .withColumn("op", lit("U"))
    // writer A lands INSIDE writer B's merge window (after B planned
    // against the base manifest): B must detect the moved pointer and
    // rebase its carried files onto A's manifest instead of aborting
    tbl.merge(spark, changesB, Seq("id"), keepDeletes = false,
      targetTransform = t => {
        tbl.merge(spark, changesA, Seq("id"), keepDeletes = false)
        t
      })
    assert(tbl.currentVersion == base + 2, "both merges must commit")
    val out = tbl.read(spark)
    assert(out.count() == 100)
    assert(out.filter(col("p") === 0 && col("v") === 2.0).count() == 25)
    assert(out.filter(col("p") === 1 && col("v") === 2.0).count() == 25)
    assert(out.filter(col("v") === 1.0).count() == 50)
    // OVERLAPPING concurrent merges still abort (second writer's
    // partitions were rewritten under it)
    val e = intercept[IllegalStateException] {
      tbl.merge(spark, changesA, Seq("id"), keepDeletes = false,
        targetTransform = t => {
          tbl.merge(spark,
            withP(batch(1 to 100, Timestamp.valueOf("2026-03-01 00:00:00"), 3.0))
              .filter(col("p") === 0).withColumn("op", lit("U")),
            Seq("id"), keepDeletes = false)
          t
        })
    }
    assert(e.getMessage.contains("concurrent commit"))
  }

  test("files() metadata relation lists live files with partitions") {
    val tbl = freshTable()
    Ingestion.run(spark, tbl,
      batch(1 to 20, t0, 1.0).withColumn("p", col("id") % 2),
      cfg.copy(partitionColumns = Seq("p")), t0)
    val files = tbl.files(spark).collect()
    assert(files.nonEmpty)
    assert(files.forall(r => r.getString(1).startsWith("p=")))
  }

  test("write.parquet.bloom-filter-enabled.column writes per-column blooms") {
    import spark.implicits._
    def bloomOffsets(root: java.nio.file.Path,
                     m: graft.table.Manifest): Map[String, Long] = {
      val f = root.resolve(m.files.head.path)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toString),
          new org.apache.hadoop.conf.Configuration()))
      try {
        import scala.jdk.CollectionConverters._
        rd.getFooter.getBlocks.get(0).getColumns.asScala
          .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
      } finally rd.close()
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-bloom-").resolve("t")
    val t = SnapshotTable.at(root.toString)
    val df = (1 to 5000).map(i => (i.toLong, s"u$i")).toDF("id", "v")
    val m1 = t.createOrReplace(df, properties = Map(
      "write.parquet.bloom-filter-enabled.column.id" -> "true"))
    val offs = bloomOffsets(root, m1)
    assert(offs("id") >= 0, s"id must carry a bloom filter: $offs")
    assert(offs("v") < 0, "v was not declared — no filter")
    // without the property, no filters at all (the default stays off)
    val t2 = SnapshotTable.at(root.resolveSibling("t2").toString)
    val m2 = t2.createOrReplace(df)
    assert(bloomOffsets(root.resolveSibling("t2"), m2)
      .values.forall(_ < 0L))
  }

  test("write.parquet.row-group-size-bytes maps to parquet.block.size: " +
      "small row groups make the bloom skip possible") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-rgsize-").resolve("t")
    val t = SnapshotTable.at(root.toString)
    // one file (coalesced), ~50k rows: with 32 KiB row groups the
    // footer must carry MANY blocks; the default (128 MiB) would be one
    val df = (1 to 50000).map(i => (i.toLong, s"val$i"))
      .toDF("id", "v").coalesce(1)
    val m = t.createOrReplace(df, properties = Map(
      "write.parquet.row-group-size-bytes" -> (32 * 1024).toString))
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(
          root.resolve(m.files.head.path).toString),
        new org.apache.hadoop.conf.Configuration()))
    val blocks = try rd.getFooter.getBlocks.size finally rd.close()
    assert(blocks >= 4,
      s"32 KiB row groups over ~50k rows must yield several blocks, got $blocks")
    assert(t.read(spark).count() == 50000L)
  }
}
