package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.table.SnapshotTable

/** The graft-table STREAMING source: snapshot-version offsets, manifest
  * doc-diff batches, checkpoint-exact resume, and the loud non-append
  * guard (appends cannot represent row removal).
  */
class TableStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def pass(root: String, ckpt: String, out: String,
                   ignoreChanges: Boolean = false,
                   startVersion: Option[String] = Some("0")): Unit = {
    var r = spark.readStream.format("graft-table")
    startVersion.foreach(v => r = r.option("startVersion", v))
    if (ignoreChanges) r = r.option("ignoreChanges", "true")
    val q = r.load(root).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("bootstrap then tail: appends emit exactly once across passes") {
    import spark.implicits._
    val root = tmp("graft-ts-")
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val (ckpt, out) = (tmp("graft-ts-ckpt-"), tmp("graft-ts-out-"))
    pass(root, ckpt, out)
    assert(spark.read.parquet(out).count() == 2) // bootstrap = full table
    t.append(spark, Seq((3L, "c")).toDF("id", "v"))
    t.append(spark, Seq((4L, "d")).toDF("id", "v"))
    pass(root, ckpt, out) // same checkpoint: resumes AFTER the bootstrap
    val rows = spark.read.parquet(out)
    assert(rows.count() == 4, "appends must emit exactly once, not re-emit")
    assert(rows.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    pass(root, ckpt, out) // no new commits → empty batch, nothing re-emits
    assert(spark.read.parquet(out).count() == 4)
  }

  test("startTimestamp: tails after the at-or-before snapshot, " +
      "bootstraps when predating genesis, pins durably, refuses " +
      "alongside startVersion") {
    import spark.implicits._
    val root = tmp("graft-ts-")
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"), nowMs = 1000000L)
    t.append(spark, Seq((2L, "b")).toDF("id", "v"), nowMs = 2000000L)
    t.append(spark, Seq((3L, "c")).toDF("id", "v"), nowMs = 3000000L)
    def run(opts: Map[String, String], ckpt: String, out: String): Unit = {
      var r = spark.readStream.format("graft-table")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load(root).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def ids(out: String): Seq[Long] =
      try spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      catch { case _: Throwable => Nil }
    // cutoff between v2 and v3 → exactly the commits after v2
    val (c1, o1) = (tmp("graft-ts-ckpt-"), tmp("graft-ts-out-"))
    run(Map("startTimestamp" -> "2500000"), c1, o1)
    assert(ids(o1) == Seq(3L), "commits after the cutoff snapshot only")
    // cutoff EXACTLY at v2's commit: at-or-before → v2 excluded too
    val (c2, o2) = (tmp("graft-ts-ckpt-"), tmp("graft-ts-out-"))
    run(Map("startTimestamp" -> "2000000"), c2, o2)
    assert(ids(o2) == Seq(3L), "an exact-match snapshot is the start, " +
      "not part of the stream")
    // predates genesis → Iceberg's older-than-oldest: full bootstrap
    val (c3, o3) = (tmp("graft-ts-ckpt-"), tmp("graft-ts-out-"))
    run(Map("startTimestamp" -> "500000"), c3, o3)
    assert(ids(o3) == Seq(1L, 2L, 3L))
    // the resolution is pinned: the same checkpoint tails on, exactly once
    t.append(spark, Seq((4L, "d")).toDF("id", "v"), nowMs = 4000000L)
    run(Map("startTimestamp" -> "2500000"), c1, o1)
    assert(ids(o1) == Seq(3L, 4L), "restart must tail from the pin")
    // both start options set → loud, at stream construction
    val e = intercept[Throwable] {
      run(Map("startTimestamp" -> "2500000", "startVersion" -> "0"),
        tmp("graft-ts-ckpt-"), tmp("graft-ts-out-"))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("mutually exclusive")))
  }

  test("default start=latest tails only post-creation commits") {
    import spark.implicits._
    val root = tmp("graft-ts-")
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    val (ckpt, out) = (tmp("graft-ts-ckpt-"), tmp("graft-ts-out-"))
    t.append(spark, Seq((2L, "b")).toDF("id", "v"))
    pass(root, ckpt, out, startVersion = None) // latest: nothing yet
    // the parquet sink may not have written any file for an empty run
    val first =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
    assert(first == 0)
    t.append(spark, Seq((3L, "c")).toDF("id", "v"))
    pass(root, ckpt, out, startVersion = None)
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSeq ==
      Seq(3L))
  }

  test("tail feeds a downstream table: continuous table-to-table pipeline") {
    import spark.implicits._
    val srcRoot = tmp("graft-ts-src-")
    val dstRoot = tmp("graft-ts-dst-")
    val src = SnapshotTable.at(srcRoot)
    val dst = SnapshotTable.at(dstRoot)
    src.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val ckpt = tmp("graft-ts-ckpt-")
    def run(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "0").load(srcRoot)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (!dst.exists) { dst.createOrReplace(batch); () }
          else { dst.append(spark, batch.toDF()); () }
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // bootstrap: dst created from the full source
    src.append(spark, Seq((3L, "c")).toDF("id", "v"))
    run() // tail: only the appended rows flow downstream
    assert(dst.read(spark).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L), "downstream table must equal the source exactly once")
    assert(dst.currentVersion == 2L,
      "pass 2 must land as ONE append commit on the downstream table")
  }

  test("native sink: source→sink pipeline exactly-once; replayed batches no-op") {
    import spark.implicits._
    val srcRoot = tmp("graft-snk-src-")
    val dstRoot = tmp("graft-snk-dst-")
    val src = SnapshotTable.at(srcRoot)
    val dst = SnapshotTable.at(dstRoot)
    src.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val ckpt = tmp("graft-snk-ckpt-")
    def run(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "0").load(srcRoot)
        .writeStream.format("graft-table")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dstRoot)
      q.awaitTermination()
    }
    run() // bootstrap: the sink auto-creates the downstream table
    assert(dst.exists && dst.read(spark).count() == 2)
    val v1 = dst.currentVersion
    run() // restart with no new source commits: nothing lands
    assert(dst.currentVersion == v1, "empty restart must not commit")
    src.append(spark, Seq((3L, "c")).toDF("id", "v"))
    src.append(spark, Seq((4L, "d")).toDF("id", "v"))
    run() // tail: appended rows land as ONE append commit
    assert(dst.read(spark).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    assert(dst.currentVersion == v1 + 1)

    // direct replay probe (the crash-redelivery path): re-delivering an
    // already-committed batchId is a whole-batch no-op; the next id lands
    val marker = dst.currentManifest.properties
      .find(_._1.matches("graft\\.stream\\..*\\.last-batch")).get
    val sink = new graft.streaming.GraftTableSink(spark, dstRoot,
      Map("checkpointLocation" -> ckpt), Nil)
    val before = dst.currentVersion
    sink.addBatch(marker._2.toLong, Seq((99L, "z")).toDF("id", "v"))
    assert(dst.currentVersion == before, "replayed batch must no-op")
    sink.addBatch(marker._2.toLong + 1, Seq((99L, "z")).toDF("id", "v"))
    assert(dst.read(spark).count() == 5)

    // loud guards: no durable identity; unknown batch column; non-append
    intercept[IllegalArgumentException] {
      new graft.streaming.GraftTableSink(spark, dstRoot,
        Map("path" -> dstRoot), Nil)
    }
    intercept[IllegalArgumentException] {
      sink.addBatch(marker._2.toLong + 2,
        Seq((1L, "x", 9.9)).toDF("id", "v", "extra"))
    }
    intercept[UnsupportedOperationException] {
      new graft.streaming.GraftTableSourceProvider().createSink(
        spark.sqlContext, Map("path" -> dstRoot,
          "checkpointLocation" -> ckpt), Nil,
        org.apache.spark.sql.streaming.OutputMode.Complete())
    }
  }

  test("admission control: maxFilesPerTrigger splits the bootstrap exactly once") {
    import spark.implicits._
    val root = tmp("graft-ts-adm-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 600).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v").repartition(6))
    val nFiles = t.currentManifest.files.size
    assert(nFiles >= 4, s"need several files to split ($nFiles)")
    t.append(spark, Seq((601L, "w")).toDF("id", "v")) // a tail commit too

    val (ckpt, out) = (tmp("graft-ts-adm-ckpt-"), tmp("graft-ts-adm-out-"))
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def run(trigger: Trigger): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "0")
        .option("maxFilesPerTrigger", "2")
        .load(root)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val c = df.count()
          batches.synchronized { batches += ((id, c)) }
          df.write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
      q.awaitTermination()
    }
    // ONE batch (Trigger.Once), then a crash-shaped restart: the second
    // run must resume the SAME pinned file enumeration, no dupes/gaps
    run(Trigger.Once())
    val afterOne = spark.read.parquet(out).count()
    assert(afterOne > 0 && afterOne < 600,
      s"first batch must be a bounded bootstrap slice ($afterOne rows)")
    run(Trigger.AvailableNow())
    val rows = spark.read.parquet(out)
    assert(rows.count() == 601, s"exactly-once across the restart")
    assert(rows.select("id").distinct().count() == 601)
    val bootstrapBatches = math.ceil(nFiles / 2.0).toInt
    assert(batches.size >= bootstrapBatches + 1,
      s"bootstrap must split into >= $bootstrapBatches batches + tail " +
        s"(got ${batches.size}: $batches)")
    assert(batches.map(_._2).max <= 2L * 600 / nFiles + 200,
      "no batch may blow past the per-trigger file bound")
  }

  test("admission control: file caps split a large TAIL commit into slices") {
    import spark.implicits._
    val root = tmp("graft-ts-tailsplit-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 10).map(i => (i.toLong, "base")).toDF("id", "v"))
    // pin the stream at v1, THEN land a wide backfill commit (8 files)
    val (ckpt, out) = (tmp("graft-ts-tailsplit-ckpt-"),
      tmp("graft-ts-tailsplit-out-"))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "1")
        .option("maxFilesPerTrigger", "3")
        .load(root)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val c = df.count()
          if (c > 0) batches.synchronized { batches += c }
          df.write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    t.append(spark, (11 to 810).map(i => (i.toLong, "backfill"))
      .toDF("id", "v").repartition(8))                              // v2
    val stepFiles = t.currentManifest.files.count(_.seq == 2L)
    assert(stepFiles == 8, s"the backfill must land 8 files ($stepFiles)")
    run()
    // the 8-file step streams as ceil(8/3)=3 bounded slices, union exact
    assert(batches.size == 3, s"tail step must split: $batches")
    val rows = spark.read.parquet(out)
    assert(rows.count() == 800 && rows.select("id").distinct().count() == 800,
      "the sliced step re-assembles the backfill exactly once")
    // a later small commit streams normally after the split step
    t.append(spark, Seq((900L, "tail")).toDF("id", "v"))            // v3
    run()
    assert(spark.read.parquet(out).count() == 801, "exactly-once tail")
    // restarting WITHOUT the caps against a mid-step checkpoint is the
    // same instructive failure as the bootstrap's (checkpoint from a
    // fresh mid-step stop)
    val ckpt2 = tmp("graft-ts-tailsplit-ckpt2-")
    val out2 = tmp("graft-ts-tailsplit-out2-")
    val q2 = spark.readStream.format("graft-table")
      .option("startVersion", "1").option("maxFilesPerTrigger", "3")
      .load(root).writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.Once()).start()
    q2.awaitTermination() // exactly one bounded slice → s:2:3 in the log
    val e = intercept[StreamingQueryException] {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "1") // caps dropped
        .load(root).writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e.getCause.getMessage.contains("mid-"),
      s"unexpected: ${e.getCause}")
  }

  test("admission fuzz: random caps and commit shapes stay exactly-once") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L) // deterministic
    (1 to 3).foreach { trial =>
      val root = tmp(s"graft-ts-fuzz$trial-")
      val t = SnapshotTable.at(root)
      var next = 1L
      def commit(rows: Int, files: Int): Unit = {
        val df = (next until next + rows).map(i => (i, s"t$trial"))
          .toDF("id", "v").repartition(files)
        if (next == 1L) t.createOrReplace(df) else t.append(spark, df)
        next += rows
      }
      commit(50 + rnd.nextInt(200), 1 + rnd.nextInt(4))
      val startAfterV1 = rnd.nextBoolean()
      val expectedFrom = if (startAfterV1) next else 1L
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        commit(50 + rnd.nextInt(300), 1 + rnd.nextInt(6))
      }
      val total = next - 1
      val expected = total - (expectedFrom - 1)
      val reader = spark.readStream.format("graft-table")
        .option("startVersion", if (startAfterV1) "1" else "0")
      val capped = rnd.nextInt(3) match {
        case 0 => reader.option("maxFilesPerTrigger",
          (1 + rnd.nextInt(4)).toString)
        case 1 => reader.option("maxRowsPerTrigger",
          (40 + rnd.nextInt(200)).toString)
        case _ => reader
          .option("maxFilesPerTrigger", (1 + rnd.nextInt(4)).toString)
          .option("maxBytesPerTrigger", (1 + rnd.nextInt(8)).toString + "k")
      }
      val out = tmp(s"graft-ts-fuzz$trial-out-")
      val q = capped.load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", tmp(s"graft-ts-fuzz$trial-ckpt-"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.read.parquet(out)
      assert(rows.count() == expected &&
        rows.select("id").distinct().count() == expected,
        s"trial $trial: caps must stay exactly-once " +
          s"(${rows.count()} vs $expected)")
      assert(rows.agg(org.apache.spark.sql.functions.min(col("id")))
        .head.getLong(0) == expectedFrom,
        s"trial $trial: the stream must start at the pinned boundary")
    }
  }

  test("split tail step spans an EXPIRY GAP: the offset carries its floor") {
    import spark.implicits._
    val root = tmp("graft-ts-gap-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 10).map(i => (i.toLong, "base")).toDF("id", "v"),
      nowMs = 1000L)                                                // v1
    t.tag("keep", 1L) // the stream's floor must survive expiry
    t.append(spark, (11 to 20).map(i => (i.toLong, "mid")).toDF("id", "v"),
      nowMs = 2000L)                                                // v2
    t.append(spark, (21 to 620).map(i => (i.toLong, "wide"))
      .toDF("id", "v").repartition(6), nowMs = 3000L)               // v3
    // expire v2: the parent chain under v3 now has a gap — a step floor
    // re-derived from manifest(v3).parent would read the missing v2
    val expired = t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 10000L)
    assert(expired == Seq(2L), s"v2 must expire: $expired")
    val (ckpt, out) = (tmp("graft-ts-gap-ckpt-"), tmp("graft-ts-gap-out-"))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-table")
      .option("startVersion", "1")
      .option("maxFilesPerTrigger", "3")
      .load(root)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = df.count()
        if (c > 0) batches.synchronized { batches += c }
        df.write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the 1→3 step (v2's + v3's files) streams sliced, exactly once
    assert(batches.size >= 2, s"the wide step must split: $batches")
    val rows = spark.read.parquet(out)
    assert(rows.count() == 610 &&
      rows.select("id").distinct().count() == 610,
      "the gap-spanning step re-assembles both commits exactly once")
  }

  test("admission control: maxRowsPerTrigger splits by recorded row counts") {
    import spark.implicits._
    val root = tmp("graft-ts-admr-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 900).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v").repartition(6)) // ~150 rows per file
    val rowsPerFile = t.currentManifest.files.map(_.rows)
    assert(rowsPerFile.forall(_ > 0), "commit must record row counts")
    val (ckpt, out) = (tmp("graft-ts-admr-ckpt-"), tmp("graft-ts-admr-out-"))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-table")
      .option("startVersion", "0")
      .option("maxRowsPerTrigger", "400")
      .load(root)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = df.count()
        if (c > 0) batches.synchronized { batches += c }
        df.write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.size >= 3, s"900 rows under a 400-row cap: $batches")
    // every batch respects the cap, except one carrying an oversized
    // first file (none here: files are ~150 rows)
    assert(batches.forall(_ <= 400), s"row cap must bind: $batches")
    val rows = spark.read.parquet(out)
    assert(rows.count() == 900 && rows.select("id").distinct().count() == 900)
  }

  test("admission control: maxVersionsPerTrigger bounds the tail catch-up") {
    import spark.implicits._
    val root = tmp("graft-ts-admv-")
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((0L, "z")).toDF("id", "v"))
    (1 to 6).foreach(i => t.append(spark, Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val (ckpt, out) = (tmp("graft-ts-admv-ckpt-"), tmp("graft-ts-admv-out-"))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-table")
      .option("startVersion", "1") // tail the six appends
      .option("maxVersionsPerTrigger", "2")
      .load(root)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = df.count()
        batches.synchronized { batches += c }
        df.write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 6)
    assert(batches.count(_ > 0) >= 3,
      s"six versions at <=2/trigger need >=3 batches (got $batches)")
    assert(batches.forall(_ <= 2), s"a batch exceeded 2 versions' rows: $batches")
  }

  test("readChangeFeed streams net CDC rows; replace steps stay silent") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-cdcfeed-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 100).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    base.sql(s"DELETE FROM graft.`$root` WHERE id <= 10")

    val ckpt = tmp("graft-cdcfeed-ckpt-")
    val out = tmp("graft-cdcfeed-out-")
    def cdcPass(): Unit = {
      val q = base.readStream.format("graft-table")
        .option("startVersion", "0").option("readChangeFeed", "true")
        .load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    cdcPass()
    val p1 = base.read.parquet(out)
    assert(p1.filter($"_change_type" === "insert").count() == 100)
    assert(p1.filter($"_change_type" === "delete").count() == 10)

    // a compaction commit between passes must emit NOTHING; a further
    // delete arrives exactly once
    t.compact(spark)
    base.sql(s"DELETE FROM graft.`$root` WHERE id > 95")
    cdcPass()
    val p2 = base.read.parquet(out)
    assert(p2.count() == p1.count() + 5,
      "second pass = exactly the new delete's rows, no replace noise")
    assert(p2.filter($"_change_type" === "delete" && $"id" > 95).count() == 5)

    // cdc + ignoreChanges is contradictory — refused at stream start
    val e = intercept[Exception] {
      base.readStream.format("graft-table")
        .option("readChangeFeed", "true").option("ignoreChanges", "true")
        .load(root)
        .writeStream.format("noop")
        .option("checkpointLocation", tmp("graft-cdcfeed-bad-"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage.contains("readChangeFeed") ||
      e.getCause != null && e.getCause.getMessage.contains("readChangeFeed"))
  }

  test("lineage CDC feed: per-commit legs even inside one offset span; " +
      "option guards") {
    val base = spark
    import base.implicits._
    val root = tmp("graft-lincdc-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 20).map(i => (i.toLong, s"s$i")).toDF("id", "s"),
      properties = Map("format-version" -> "3"))                   // v1
    // in-span churn: a row inserted then deleted BETWEEN two stream
    // offsets — the net boundary diff would fold both legs away; the
    // per-commit step walk must stream them
    base.sql(s"INSERT INTO graft.`$root` VALUES (99, 'ghost')")    // v2
    base.sql(s"DELETE FROM graft.`$root` WHERE id = 99")           // v3
    base.sql(s"UPDATE graft.`$root` SET s = 'u' WHERE id = 7")     // v4
    val (ckpt, out) = (tmp("graft-lincdc-ckpt-"), tmp("graft-lincdc-out-"))
    val q = base.readStream.format("graft-table")
      .option("startVersion", "0").option("readChangeFeed", "true")
      .option("lineage", "true")
      .load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = base.read.parquet(out)
    assert(got.filter($"id" === 99 && $"_change_type" === "insert" &&
      $"_commit_version" === 2).count() == 1, "ghost insert leg streamed")
    assert(got.filter($"id" === 99 && $"_change_type" === "delete" &&
      $"_commit_version" === 3).count() == 1,
      "ghost delete leg streamed at ITS commit")
    assert(got.filter($"id" === 7 && $"_change_type" === "update_preimage")
      .select("s").as[String].head() == "s7")
    assert(got.filter($"id" === 7 && $"_change_type" === "update_postimage")
      .select("s").as[String].head() == "u")
    assert(got.filter($"_row_id".isNull).count() == 0)
    // lineage without readChangeFeed refuses; lineage on a v1 table too
    val e1 = intercept[Exception] {
      base.readStream.format("graft-table").option("lineage", "true")
        .load(root).writeStream.format("noop")
        .option("checkpointLocation", tmp("graft-lincdc-bad1-"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage)
      .getOrElse("")).contains("readChangeFeed"))
    val v1root = tmp("graft-lincdc-v1-")
    SnapshotTable.at(v1root)
      .createOrReplace(Seq((1L, "a")).toDF("id", "s"))
    val e2 = intercept[Exception] {
      base.readStream.format("graft-table")
        .option("readChangeFeed", "true").option("lineage", "true")
        .load(v1root).writeStream.format("noop")
        .option("checkpointLocation", tmp("graft-lincdc-bad2-"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage)
      .getOrElse("")).contains("format-version=3"))
  }

  test("rewrite commits fail loudly; ignoreChanges re-emits rewrites") {
    import spark.implicits._
    val root = tmp("graft-ts-")
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val (ckpt, out) = (tmp("graft-ts-ckpt-"), tmp("graft-ts-out-"))
    pass(root, ckpt, out)
    // a CoW rewrite (full replace) is NOT representable as appends
    t.createOrReplace(Seq((1L, "a2"), (2L, "b2"), (3L, "c")).toDF("id", "v"))
    val e = intercept[StreamingQueryException] { pass(root, ckpt, out) }
    assert(e.getCause.getMessage.contains("streaming tail"),
      s"unexpected failure: ${e.getCause}")
    // opt-in: rewritten files re-emit wholesale (documented semantics)
    pass(root, ckpt, out, ignoreChanges = true)
    val rows = spark.read.parquet(out).select("v").as[String].collect().sorted
    assert(rows.toSeq == Seq("a", "a2", "b", "b2", "c"))
  }

  test("admission control: maxBytesPerTrigger splits by recorded sizes") {
    import spark.implicits._
    val root = tmp("graft-ts-admb-")
    val t = SnapshotTable.at(root)
    // SKEWED files: one fat partition, four thin ones — the shape where
    // a count-based cap is a poor proxy (r7 verdict item 4)
    val df = ((1 to 4000).map(i => (i.toLong, 0)) ++
      (1 to 80).map(i => (4000L + i, 1 + (i % 4)))).toDF("id", "p")
    t.createOrReplace(df.repartition(col("p")), Seq("p"))
    val m = t.currentManifest
    assert(m.files.forall(_.bytes > 0), "commit must RECORD file bytes")
    val inOrder = m.files.toSeq.sortBy(_.path)
    val sizes = inOrder.map(_.bytes)
    assert(sizes.max > sizes.min * 3, s"fixture must be skewed ($sizes)")
    // cap: three thin files fit, the fat one rides alone
    val cap = sizes.min * 3
    // expected greedy grouping (same always-admit-first rule)
    val expected = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < inOrder.size) {
      var acc = 0L
      var rows0 = 0L
      var first = true
      while (i < inOrder.size &&
        (first || acc + inOrder(i).bytes <= cap)) {
        acc += inOrder(i).bytes; rows0 += inOrder(i).rows
        first = false; i += 1
      }
      expected += rows0
    }
    assert(expected.size >= 2, "cap must actually split the bootstrap")
    val (ckpt, out) = (tmp("graft-ts-admb-ckpt-"), tmp("graft-ts-admb-out-"))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    def run(trigger: Trigger): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "0")
        .option("maxBytesPerTrigger", cap.toString)
        .load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val c = b.count()
          batches.synchronized { batches += c }
          b.write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
      q.awaitTermination()
    }
    // one batch, then a crash-shaped restart: the byte-greedy boundaries
    // are a pure function of the pinned manifest, so the resumed run
    // must produce the SAME batch plan with no dupes or gaps
    run(Trigger.Once())
    run(Trigger.AvailableNow())
    assert(spark.read.parquet(out).count() == 4080, "exactly-once bootstrap")
    assert(batches.filter(_ > 0).toSeq == expected.toSeq,
      s"byte-greedy batch rows must match the manifest-size plan " +
        s"(got ${batches.toSeq}, want ${expected.toSeq})")
  }

  test("throttled tail endpoints stay on the MAIN lineage across branches") {
    import spark.implicits._
    val root = tmp("graft-ts-lin-")
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((0L, "z")).toDF("id", "v")) // v1
    t.append(spark, Seq((1L, "m")).toDF("id", "v"))   // v2 main
    t.branch("side")
    val b = t.atBranch("side")
    b.append(spark, Seq((100L, "b")).toDF("id", "v")) // v3 BRANCH
    t.append(spark, Seq((2L, "m")).toDF("id", "v"))   // v4 main
    b.append(spark, Seq((101L, "b")).toDF("id", "v")) // v5 BRANCH
    t.append(spark, Seq((3L, "m")).toDF("id", "v"))   // v6 main
    // one version per trigger: the flat retained list would offer v3/v5
    // (branch snapshots) as endpoints — cross-lineage diffs would either
    // stream branch rows into the main tail or trip the append-only
    // guard when main's next commit "removes" branch files (r7 ADVICE)
    val (ckpt, out) = (tmp("graft-ts-lin-ckpt-"), tmp("graft-ts-lin-out-"))
    val q = spark.readStream.format("graft-table")
      .option("startVersion", "1")
      .option("maxVersionsPerTrigger", "1")
      .load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).select("id").as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L, 3L),
      "main tail must contain exactly the main-lineage appends")
  }

  test("admission misconfiguration fails loudly, never silently") {
    import spark.implicits._
    val root = tmp("graft-ts-admx-")
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4))
    t.append(spark, Seq((101L, "w")).toDF("id", "v"))
    // file/byte caps with the CDC feed: refused (version-granular only)
    val e1 = intercept[Exception] {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").option("maxFilesPerTrigger", "2")
        .load(root).writeStream.format("parquet")
        .option("path", tmp("graft-ts-admx-o1-"))
        .option("checkpointLocation", tmp("graft-ts-admx-c1-"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e1.getMessage.contains("maxVersionsPerTrigger") ||
      Option(e1.getCause).exists(_.getMessage
        .contains("maxVersionsPerTrigger")),
      s"unexpected: $e1")
    // a checkpoint holding a mid-bootstrap b:<k> offset restarted WITHOUT
    // the admission options: loud, with the recovery instruction
    val (ckpt, out) = (tmp("graft-ts-admx-ckpt-"), tmp("graft-ts-admx-out-"))
    val q1 = spark.readStream.format("graft-table")
      .option("startVersion", "0").option("maxFilesPerTrigger", "1")
      .load(root)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Once()).start()
    q1.awaitTermination() // exactly one bounded batch → b:1 in the log
    val e2 = intercept[StreamingQueryException] {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "0") // options dropped
        .load(root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e2.getCause.getMessage.contains("mid-bootstrap"),
      s"unexpected: ${e2.getCause}")
    // version caps batch by versions, file/byte/row caps split single
    // lineage steps — the combination can honor only one; refused
    val e3 = intercept[Exception] {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "0")
        .option("maxVersionsPerTrigger", "2")
        .option("maxFilesPerTrigger", "2")
        .load(root).writeStream.format("parquet")
        .option("path", tmp("graft-ts-admx-o3-"))
        .option("checkpointLocation", tmp("graft-ts-admx-c3-"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e3.getMessage.contains("admission family") ||
      Option(e3.getCause).exists(_.getMessage.contains("admission family")),
      s"unexpected: $e3")
  }

  test("CDC keys pin at first start: a later ALTER cannot re-tag the feed") {
    import spark.implicits._
    val root = tmp("graft-ts-cdckeys-")
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    def cdcPass(ck: String, o: String): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startVersion", "0").option("readChangeFeed", "true")
        .load(root).writeStream.format("parquet").option("path", o)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val (ckpt, out) = (tmp("graft-ts-cdck-ckpt-"), tmp("graft-ts-cdck-out-"))
    cdcPass(ckpt, out) // first start pins the CURRENT (keyless) identity
    spark.sql(s"ALTER TABLE graft.`$root` SET IDENTIFIER FIELDS id")
    t.updateWhere(spark, Seq("v" -> lit("u")), col("id") === 1L)
    cdcPass(ckpt, out)
    val types = spark.read.parquet(out)
      .select("_change_type").as[String].collect().toSet
    assert(types("delete") && types("insert"))
    assert(!types.contains("update_preimage") &&
      !types.contains("update_postimage"),
      "getBatch must read the checkpoint-pinned keys, never live table " +
        "metadata — a crash-replayed span would otherwise re-tag after " +
        "the ALTER (exactly-once determinism)")
    // a FRESH checkpoint started after the ALTER pins the declared keys
    val (ckpt2, out2) = (tmp("graft-ts-cdck-ckpt2-"), tmp("graft-ts-cdck-out2-"))
    cdcPass(ckpt2, out2)
    val types2 = spark.read.parquet(out2)
      .select("_change_type").as[String].collect().toSet
    assert(types2("update_preimage") && types2("update_postimage"),
      s"fresh stream must pin the declared keys (got $types2)")
  }
}
