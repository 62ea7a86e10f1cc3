package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.table.{FileList, ManifestJson, SnapshotTable}

/** Full-stack behavior of CHUNKED manifests — the representation a
  * 100 TB table lives in (millions of files split into bucket-stable
  * chunk documents with rollup stats). Chunk thresholds are lowered so a
  * few hundred small files exercise every chunked path at test scale;
  * suites run sequentially in one forked JVM, so mutating the knob is
  * safe (restored in afterAll).
  *
  * The assertions pin the scale contracts, not just correctness:
  *   - a predicate-pruned read parses only the chunk documents whose
  *     rollups survive;
  *   - a partition-scoped merge parses only the buckets its partitions
  *     hash to and carries every other document by reference (same name
  *     on disk, no rewrite);
  *   - rowCount/history/spec censuses answer from rollups with ZERO
  *     document parses;
  *   - MoR appends carry all chunk refs verbatim.
  */
class ChunkedManifestSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val savedThreshold = ManifestJson.ChunkThreshold
  private val savedSize = ManifestJson.ChunkSize

  override def beforeAll(): Unit = {
    super.beforeAll()
    ManifestJson.ChunkThreshold = 24
    ManifestJson.ChunkSize = 24
  }
  override def afterAll(): Unit = {
    ManifestJson.ChunkThreshold = savedThreshold
    ManifestJson.ChunkSize = savedSize
    super.afterAll()
  }

  private def parses[T](f: => T): (T, Long) = {
    val before = ManifestJson.chunkParses.get()
    val r = f
    (r, ManifestJson.chunkParses.get() - before)
  }

  private def df(n: Int, v: Double) =
    (1 to n).map(i => (i.toLong, i.toLong % 64, v))
      .toDF("id", "p", "v")

  private def chunkDocs(tbl: SnapshotTable): Set[String] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.list(tbl.root.resolve("meta")))(
      _.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("files-")).toSet)
  }

  test("chunked table: reads, pruned scans, and rollup-only metadata") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    val m = tbl.currentManifest
    val fl = m.files.asInstanceOf[FileList]
    assert(fl.chunks.nonEmpty, "64 files over a threshold of 24 must chunk")
    assert(fl.inline.isEmpty)
    // recorded byte sizes survive the chunk-document round-trip
    assert(m.files.forall(_.bytes > 0),
      "FileEntry.bytes must round-trip through chunk docs")
    val nDocs = fl.chunks.size

    // full read is correct (loads everything, as it must)
    assert(tbl.read(spark).count() == 1000)

    // metadata-only row count: rollups, zero parses
    val (rc, rcParses) = parses(tbl.rowCount)
    assert(rc.contains(1000L))
    assert(rcParses == 0, s"rowCount parsed $rcParses docs")

    // history/file counts: rollups, zero parses
    val (nf, hParses) = parses(tbl.currentManifest.files.size)
    assert(nf == 64)
    assert(hParses == 0)

    // predicate-pruned scan: only the documents whose rollups survive
    val cond = col("p") === 3
    val ((kept, total), selParses) = parses(tbl.pruneCounts(cond))
    assert(total == 64 && kept >= 1 && kept <= 8,
      s"p=3 must prune to its partition's files, got $kept/$total")
    // the point-lookup shape skips whole documents EXACTLY via the
    // partition-hash bucket (value rollups can't — hash buckets mix
    // arbitrary partitions); p=3's files live in one bucket's doc(s)
    assert(selParses <= 2,
      s"point lookup parsed $selParses of $nDocs docs — bucket skip broken")
    assert(tbl.readWhere(spark, cond).count() ==
      tbl.read(spark).filter(cond).count())
  }

  test("metadata DELETE on a chunked manifest: untouched chunk docs " +
      "carry by reference, the dropped partition's doc rewrites") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-mdel-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    val docsBefore = chunkDocs(tbl)
    val (_, delParses) = parses {
      tbl.deleteWhere(spark, col("p") === 3)
    }
    assert(tbl.currentManifest.operation == "delete")
    assert(!Files.isDirectory(
      tbl.root.resolve("data").resolve(s"v${tbl.currentVersion}")),
      "a whole-partition chunked delete must not write data")
    // planning + the touched bucket's doc rewrite — never a full rechunk
    assert(delParses <= 4,
      s"chunked metadata delete parsed $delParses docs — should be " +
        "bounded by the touched bucket")
    val docsAfter = chunkDocs(tbl)
    assert((docsBefore intersect docsAfter).size >= docsBefore.size - 2,
      "untouched chunk documents must be reused verbatim")
    assert(tbl.read(spark).count() ==
      1000 - (1 to 1000).count(_ % 64 == 3))
    assert(tbl.readWhere(spark, col("p") === 3).count() == 0)
    // rollup metadata stays zero-parse after the surgery
    val (rc, rcParses) = parses(tbl.rowCount)
    assert(rc.contains(1000L - (1 to 1000).count(_ % 64 == 3)))
    assert(rcParses == 0)
  }

  test("positional-delete-tolerant COUNT works on a chunked manifest") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-pdc-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    tbl.deleteWherePositional(spark, col("id").isin(5L, 6L, 7L))
    assert(tbl.currentManifest.deleteFiles.exists(_.positional))
    // the metadata-only nullary form declines under ANY pending deletes
    assert(tbl.rowCount.isEmpty)
    // the spark-assisted form subtracts the tombstone census — live
    // paths enumerate from the chunk docs, bounded by the census cap
    assert(tbl.rowCount(spark).contains(997L))
    assert(tbl.read(spark).count() == 997L)
  }

  test("partition-scoped merge parses only dirty buckets and reuses docs") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    val docsBefore = chunkDocs(tbl)
    val v1Paths = tbl.currentManifest.files.map(_.path).toSet
    val nDocs = tbl.currentManifest.files.asInstanceOf[FileList].chunks.size

    val changes = df(1000, 2.0).filter(col("p") === 3)
      .withColumn("op", lit("U"))
    // p = id % 64 is a pure function of the key → home census skipped;
    // what remains is exactly the chunk-aware split
    val (_, mergeParses) = parses {
      tbl.merge(spark, changes, Seq("id"), keepDeletes = false,
        partitionStableByKey = true)
    }
    assert(mergeParses <= 4,
      s"one-partition merge parsed $mergeParses of $nDocs docs")

    val m2 = tbl.currentManifest
    val fl2 = m2.files.asInstanceOf[FileList]
    assert(fl2.chunks.nonEmpty, "carried chunks must ride by reference")
    // untouched partitions' files carried verbatim
    val untouched = v1Paths.filter(!_.contains("/p=3/"))
    assert(untouched.subsetOf(m2.files.map(_.path).toSet))
    assert(!m2.files.map(_.path).toSet.exists(p =>
      v1Paths(p) && p.contains("/p=3/")), "touched partition was rewritten")
    // document reuse: at most the dirty bucket's docs (+ split) are new
    val docsAfter = chunkDocs(tbl)
    val newDocs = docsAfter -- docsBefore
    assert(newDocs.size <= 3,
      s"one-partition merge wrote ${newDocs.size} new chunk docs")
    // correctness after the chunked merge
    assert(tbl.read(spark).count() == 1000)
    assert(tbl.read(spark).filter(col("p") === 3 && col("v") === 2.0).count() ==
      tbl.read(spark).filter(col("p") === 3).count())
  }

  test("MoR append carries chunk refs verbatim; compact folds and re-chunks") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    val v1Chunks = tbl.currentManifest.files.asInstanceOf[FileList]
      .chunks.map(_.name).toSet

    val changes = df(1000, 3.0).filter(col("p") === 5)
      .withColumn("op", lit("U"))
    val nDocs = tbl.currentManifest.files.asInstanceOf[FileList].chunks.size
    val (_, morParses) = parses {
      tbl.mergeMoR(spark, changes, Seq("id"), keepDeletes = false)
    }
    // the full-target read legitimately parses every doc once (data-plane
    // scan needs all paths); the COMMIT itself adds none on top
    assert(morParses <= nDocs + 1,
      s"MoR append parsed $morParses docs (census $nDocs)")
    val m2 = tbl.currentManifest
    val fl2 = m2.files.asInstanceOf[FileList]
    // the appended file merges into ITS bucket's document (one doc per
    // bucket); every other document is carried by name, unrewritten
    assert((fl2.chunks.map(_.name).toSet intersect v1Chunks).size >=
      v1Chunks.size - 1,
      "MoR append must reuse all but the appended file's bucket doc")
    assert(m2.deleteFiles.nonEmpty)
    assert(tbl.read(spark).filter(col("p") === 5 && col("v") === 3.0).count() ==
      tbl.read(spark).filter(col("p") === 5).count())
    assert(tbl.read(spark).count() == 1000)

    // compaction folds the deletes and keeps correctness (here the
    // delete key bounds overlap every group, so most groups rewrite —
    // selective carry is pinned by SnapshotTableSpec and ScaleProbe)
    tbl.compact(spark)
    val m3 = tbl.currentManifest
    assert(m3.deleteFiles.isEmpty)
    assert(tbl.read(spark).count() == 1000)
  }

  test("incremental read diffs only differing documents") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    val v1 = tbl.currentVersion
    tbl.merge(spark,
      df(1000, 2.0).filter(col("p") === 7).withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false, partitionStableByKey = true)
    val (inc, incParses) = parses {
      tbl.readIncremental(spark, v1).collect()
    }
    assert(inc.map(_.getAs[Long]("p")).toSet == Set(7L))
    assert(inc.length == tbl.read(spark).filter(col("p") === 7).count())
    val nDocs = tbl.currentManifest.files.asInstanceOf[FileList].chunks.size
    assert(incParses <= 6,
      s"incremental read parsed $incParses docs of $nDocs + shared")
  }

  test("partition-spec evolution on a CHUNKED table keeps merges bounded") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    val df0 = (1 to 1000).map(i =>
      (i.toLong, i.toLong % 64, i.toLong % 16, 1.0))
      .toDF("id", "p", "q", "v")
    tbl.createOrReplace(df0, Seq("p"))
    assert(tbl.currentManifest.files.asInstanceOf[FileList].chunks.nonEmpty)
    val legacyPaths = tbl.currentManifest.files.map(_.path).toSet

    // metadata-only spec switch, then a merge touching ONE new-spec value
    tbl.evolvePartitioning(spark, Seq("q"))
    val changes = df0.filter(col("q") === 3)
      .withColumn("v", lit(2.0)).withColumn("op", lit("U"))
    tbl.merge(spark, changes, Seq("id"), keepDeletes = false)
    val m = tbl.currentManifest
    // the touched keys live in 4 legacy partitions (id%64 of ids ≡3 mod
    // 16) — only those migrate; the other 60 legacy partitions carry
    val carried = m.files.filter(f => legacyPaths(f.path))
    val migrated = m.files.filterNot(f => legacyPaths(f.path))
    assert(carried.forall(_.partition.keySet == Set("p")))
    assert(carried.map(_.partition("p")).toSet.size == 60,
      s"60 legacy partitions must carry, got ${carried.map(_.partition("p")).toSet.size}")
    assert(migrated.nonEmpty && migrated.forall(_.partition.keySet == Set("q")),
      "rewritten files land under the NEW spec")
    // correctness across the mixed-spec chunked manifest
    val out = tbl.read(spark)
    assert(out.count() == 1000)
    assert(out.filter(col("q") === 3 && col("v") === 2.0).count() ==
      out.filter(col("q") === 3).count())
    assert(out.filter(col("q") =!= 3 && col("v") =!= 1.0).count() == 0)
    // compaction migrates the remaining legacy groups, still chunk-aware
    tbl.compact(spark)
    val m2 = tbl.currentManifest
    assert(m2.files.forall(_.partition.keySet == Set("q")))
    assert(tbl.read(spark).count() == 1000)
  }

  test("SQL WHERE reads prune at the manifest — and never mis-prune") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    tbl.createOrReplace(df(1000, 7.0), Seq("p"))
    val root = tbl.root.toString
    val nDocs = tbl.currentManifest.files.asInstanceOf[FileList].chunks.size

    // unqualified point predicate: whole documents skipped
    val (c1, p1) = parses(
      spark.sql(s"SELECT count(*) AS c FROM graft.`$root` WHERE p = 3")
        .head.getLong(0))
    assert(c1 == tbl.read(spark).filter(col("p") === 3).count())
    assert(p1 <= 2, s"SQL point lookup parsed $p1 of $nDocs docs")

    // alias-qualified predicate prunes the same way
    val (c2, p2) = parses(
      spark.sql(s"SELECT count(*) AS c FROM graft.`$root` g WHERE g.p = 3")
        .head.getLong(0))
    assert(c2 == c1)
    assert(p2 <= 2, s"aliased SQL point lookup parsed $p2 docs")

    // SAFETY: a correlated outer reference whose name collides with one
    // of our columns must NOT prune our files on the outer predicate.
    // Every outer row has v = 999.0; our table's v is never 999 — a
    // naive prune on 'o.v = 999' would keep zero files and return 0.
    spark.range(1, 11).toDF("id").withColumn("v", lit(999.0))
      .createOrReplaceTempView("outer_side")
    val n = spark.sql(
      s"""SELECT count(*) AS c FROM outer_side o
         |WHERE EXISTS (SELECT 1 FROM graft.`$root` g
         |              WHERE g.id = o.id AND o.v = 999.0)""".stripMargin)
      .head.getLong(0)
    assert(n == 10, s"outer-reference collision mis-pruned: got $n of 10")
  }

  test("SHOW PARTITIONS answers from the distributed chunk scan") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-sp-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    assert(tbl.currentManifest.files.asInstanceOf[FileList].chunks.nonEmpty)
    val root = tbl.root.toString
    val all = spark.sql(s"SHOW PARTITIONS graft.`$root`")
      .collect().map(_.getString(0)).toSeq
    assert(all.size == 64 && all == all.sorted && all.contains("p=7"))
    // the spec filter matches on the partition MAPS across chunk docs
    val one = spark.sql(s"SHOW PARTITIONS graft.`$root` PARTITION (p = 7)")
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("p=7"), s"spec filter over chunked docs: $one")
  }

  test("distributed .files metadata scan matches the manifest") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    tbl.createOrReplace(df(500, 1.0), Seq("p"))
    val viaDf = tbl.files(spark).collect()
    val manifest = tbl.currentManifest.files
    assert(viaDf.length == manifest.size)
    assert(viaDf.map(_.getAs[String]("file_path")).toSet ==
      manifest.map(f => tbl.root.resolve(f.path).toString).toSet)
    assert(viaDf.forall(_.getAs[Long]("file_size_bytes") > 0))
    assert(viaDf.map(_.getAs[Long]("record_count")).sum == 500L)
  }

  test("bucket skip declines on type-mismatched literals (p='03' vs p=3)") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    // STRING partition values including both "3" and "03": Spark's cast
    // semantics make `p = 3` match BOTH — an int-literal bucket skip
    // would wrongly drop the "03" document
    val df = (1 to 620).map { i =>
      val p = if (i % 31 == 30) "03" else (i % 31).toString
      (i.toLong, p)
    }.toDF("id", "p")
    tbl.createOrReplace(df, Seq("p"))
    assert(tbl.currentManifest.files.asInstanceOf[FileList].chunks.nonEmpty)
    // int literal vs string column: cast semantics — skip must decline
    assert(tbl.readWhere(spark, col("p") === 3).count() ==
      tbl.read(spark).filter(col("p") === 3).count())
    assert(tbl.read(spark).filter(col("p") === 3).count() == 40,
      "sanity: '3' and '03' both cast-match 3")
    // string literal vs string column: exact — skip engages and stays
    // correct ('03' is NOT string-equal to '3')
    val (kept, total) = tbl.pruneCounts(col("p") === "3")
    assert(kept <= total / 2, s"string point lookup must skip docs ($kept/$total)")
    assert(tbl.readWhere(spark, col("p") === "3").count() ==
      tbl.read(spark).filter(col("p") === "3").count())
  }

  test("bucket-transform point lookups skip chunk DOCUMENTS via the key") {
    import graft.functions.Bucket
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    // 32 bucket partitions over a 24-entry chunk threshold → chunked
    val df = (1 to 640).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .withColumn("pb", expr("graft_bucket(id, 32)"))
    tbl.createOrReplace(df, Seq("pb"),
      properties = Map("graft.transform.pb" -> "bucket(32,id)"))
    val fl = tbl.currentManifest.files.asInstanceOf[FileList]
    assert(fl.chunks.nonEmpty)
    // a raw-key point predicate pins pb = bucket(42, 32), which pins the
    // chunk documents that partition's files can live in
    val ((kept, total), selParses) = parses(tbl.pruneCounts(col("id") === 42L))
    assert(kept == tbl.pruneCounts(col("pb") === Bucket.bucket(42L, 32))._1)
    assert(selParses <= 2,
      s"key point lookup parsed $selParses of ${fl.chunks.size} docs")
    assert(tbl.readWhere(spark, col("id") === 42L).count() == 1)
  }

  test("chunked rollups prune on data-column bounds, not just partitions") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    // unpartitioned, range-clustered: 64 files with disjoint id ranges,
    // bucketed by writer seq — all in one commit, so rollups must come
    // from footer stats
    tbl.createOrReplace(
      df(6400, 1.0).repartitionByRange(64, col("id")).drop("p"))
    val fl = tbl.currentManifest.files.asInstanceOf[FileList]
    assert(fl.chunks.nonEmpty)
    val ((kept, total), selParses) = parses(tbl.pruneCounts(col("id") <= 100))
    assert(kept < total, s"id<=100 kept $kept/$total")
    assert(tbl.readWhere(spark, col("id") <= 100).count() == 100)
  }

  test("rewrite_manifests shrinks an outgrown chunk layout, data untouched") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-").toString)
    // 128 partitions → 8 buckets at ChunkSize 24
    tbl.createOrReplace((1 to 2000).map(i => (i.toLong, i.toLong % 128, 1.0))
      .toDF("id", "p", "v"), Seq("p"))
    val buckets0 = tbl.currentManifest.files.asInstanceOf[FileList].nBuckets
    assert(buckets0 >= 8, s"128 files over ChunkSize 24 must spread buckets")

    // delete every partition whose chunk bucket is NOT 0, 1 or 2 — as a
    // positive IN list, which the stats census exonerates kept files
    // from, so the clean buckets carry by reference and the incremental
    // write path keeps the (now oversized) bucket count — only a
    // rewrite can shrink it
    val keepP = (0L until 128L).filter(v => ManifestJson.bucketOfKey(
      ManifestJson.partitionKey(Map("p" -> v.toString)), buckets0) <= 2)
    assert(keepP.size >= 25 && keepP.size <= 72, s"kept ${keepP.size}")
    val delP = (0L until 128L).filterNot(keepP.contains)
    tbl.deleteWhere(spark, col("p").isin(delP: _*))
    val fl1 = tbl.currentManifest.files.asInstanceOf[FileList]
    assert(fl1.nBuckets == buckets0,
      "clean-carried buckets must pin the old layout")
    val dataPaths = fl1.map(_.path).toSet
    val rows = tbl.read(spark).count()

    // explicit rewrite via the SQL procedure: metadata-only, data files
    // carried verbatim, chunk layout rebuilt for the CURRENT size
    val vBefore = tbl.currentVersion
    spark.sql(s"CALL graft.system.rewrite_manifests('${tbl.root}')")
    assert(tbl.currentVersion == vBefore + 1)
    val m2 = tbl.currentManifest
    assert(m2.files.map(_.path).toSet == dataPaths,
      "rewrite_manifests must not touch data files")
    val fl2 = m2.files.asInstanceOf[FileList]
    assert(fl2.chunks.nonEmpty && fl2.nBuckets < buckets0,
      s"${dataPaths.size} files want fewer buckets than $buckets0, " +
        s"got ${fl2.nBuckets}")
    assert(tbl.read(spark).count() == rows)
    // planning on the rebuilt layout still bucket-skips point lookups
    val (_, selParses) = parses(tbl.pruneCounts(col("p") === keepP.head))
    assert(selParses <= 2, s"point lookup parsed $selParses docs after rewrite")

    // shrinking below the chunk threshold folds back to an inline list
    val keep8 = keepP.take(8)
    tbl.deleteWhere(spark, !col("p").isin(keep8: _*))
    tbl.rewriteManifests()
    tbl.currentManifest.files match {
      case f: FileList => assert(f.chunks.isEmpty && f.inline.size == 8)
      case s           => assert(s.size == 8)
    }
    val expect8 = (1 to 2000).count(i => keep8.contains(i.toLong % 128))
    assert(tbl.read(spark).count() == expect8)
  }

  test("@all_entries parses each shared chunk doc ONCE across retained " +
      "snapshots — not snapshots × docs × 2 (r12 verdict #6)") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-chunked-ae-").toString)
    tbl.createOrReplace(df(1000, 1.0), Seq("p"))
    // pure appends: every new snapshot carries the prior documents by
    // reference and rewrites only the touched bucket
    (1 to 4).foreach { k =>
      tbl.append(spark,
        Seq((10000L + k, k.toLong % 64, 2.0)).toDF("id", "p", "v"))
    }
    val vs = tbl.manifestVersions
    assert(vs.size == 5)
    val perVersion = vs.map(v => tbl.manifest(v).files match {
      case fl: FileList => fl.chunks.map(_.name)
      case _ => Nil
    })
    val stacked = perVersion.map(_.size).sum
    val distinct = perVersion.flatten.distinct.size
    assert(stacked > distinct,
      s"sharing must be real in the fixture: $stacked refs / $distinct docs")
    spark.catalog.clearCache()
    val (cnt, nParses) = parses(tbl.allEntriesRelation(spark).count())
    assert(cnt >= 64L * vs.size, s"stacked census too small: $cnt")
    assert(nParses <= distinct + 2,
      s"shared docs must parse once: $nParses parses for $distinct " +
        s"distinct docs across ${vs.size} snapshots " +
        s"(the per-version re-scan would pay ~${2 * stacked})")
    spark.catalog.clearCache()
  }
}
