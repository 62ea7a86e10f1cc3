package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.streaming.{EventStream, StreamingIngest}
import graft.table.SnapshotTable

/** Streaming CDC ingestion: AvailableNow over the landing dir, one
  * snapshot commit per micro-batch, checkpoint-incremental across runs.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def cdcRows(tuples: Seq[(Long, String, Double, String)]) =
    tuples.map { case (id, ts, v, op) =>
      (id, Timestamp.valueOf(ts), v, op)
    }.toDF("id", "modstamp", "v", "op")

  test("availableNow ingest bootstraps, then incrementally merges new files") {
    val base = Files.createTempDirectory("graft-sing-").toString
    val cdc = s"$base/cdc"
    val ckpt = s"$base/ckpt"
    val tbl = SnapshotTable.at(s"$base/wh/t")
    val cfg = SourceConfig("s", "t", Seq("id"), Seq("modstamp"),
      mode = IngestMode.Cdc)

    cdcRows(Seq(
      (1L, "2026-01-01 00:00:00", 1.0, "I"),
      (2L, "2026-01-01 00:00:00", 2.0, "I"),
      (1L, "2026-01-02 00:00:00", 1.5, "U"))) // same key twice in history
      .write.parquet(s"$cdc/2026/01/02")
    StreamingIngest.run(spark, tbl, cdc, cfg,
      Timestamp.valueOf("2026-01-02 00:00:00"), ckpt)

    // bootstrap = raw history verbatim minus op (batch/reference parity):
    // duplicate history rows for key 1 are both present
    val after1 = tbl.read(spark).select("id", "v").as[(Long, Double)]
      .collect().toSet
    assert(after1 == Set((1L, 1.0), (1L, 1.5), (2L, 2.0)))
    val v1 = tbl.currentVersion

    // second run with the SAME checkpoint: only the new file is processed
    cdcRows(Seq(
      (2L, "2026-01-03 00:00:00", 0.0, "D"),
      (3L, "2026-01-03 00:00:00", 3.0, "I")))
      .write.parquet(s"$cdc/2026/01/03")
    StreamingIngest.run(spark, tbl, cdc, cfg,
      Timestamp.valueOf("2026-01-03 00:00:00"), ckpt)

    val after2 = tbl.read(spark).select("id", "v").as[(Long, Double)]
      .collect().toSet
    assert(after2 == Set((1L, 1.0), (1L, 1.5), (3L, 3.0)))
    assert(tbl.currentVersion > v1)
  }

  test("streaming ingest honors storage mode: bootstrap props + MoR merges") {
    val base = Files.createTempDirectory("graft-sing-mor-").toString
    val (cdc, ckpt) = (s"$base/cdc", s"$base/ckpt")
    val tbl = SnapshotTable.at(s"$base/wh/t")
    val cfg = SourceConfig("s", "t", Seq("id"), Seq("modstamp"),
      mode = IngestMode.Cdc, optimize = graft.core.Optimize.Storage)
    cdcRows(Seq((1L, "2026-01-01 00:00:00", 1.0, "I"),
      (2L, "2026-01-01 00:00:00", 2.0, "I")))
      .write.parquet(s"$cdc/2026/01/01")
    StreamingIngest.run(spark, tbl, cdc, cfg,
      Timestamp.valueOf("2026-01-01 00:00:00"), ckpt)
    // bootstrap must record the cfg-derived table properties (the old
    // streaming path wrote none, so maintenance and later batch runs
    // fell back to speed defaults)
    val props = tbl.currentManifest.properties
    assert(props.get("graft.physical-write-mode").contains("merge-on-read"))
    assert(props.get("write.parquet.compression-codec").contains("gzip"))
    val v1Files = tbl.currentManifest.files.map(_.path).toSet
    // incremental micro-batch: a storage table must merge MERGE-ON-READ
    // (carry every base file + equality delete), not CoW-rewrite
    cdcRows(Seq((1L, "2026-01-02 00:00:00", 9.0, "U")))
      .write.parquet(s"$cdc/2026/01/02")
    StreamingIngest.run(spark, tbl, cdc, cfg,
      Timestamp.valueOf("2026-01-02 00:00:00"), ckpt)
    val m = tbl.currentManifest
    assert(m.deleteFiles.nonEmpty, "MoR merge must append an equality delete")
    assert(v1Files.subsetOf(m.files.map(_.path).toSet),
      "MoR merge must carry every base file")
    val out = tbl.read(spark).select("id", "v").as[(Long, Double)]
      .collect().toSet
    assert(out == Set((1L, 9.0), (2L, 2.0)))
  }

  private def eventRows(tuples: Seq[(Long, Long, String)]) =
    tuples.map { case (u, e, ts) => (u, e, Timestamp.valueOf(ts), "click", 1.0) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")

  /** Stage a DataFrame as a single plain parquet FILE with a controlled
    * mtime so the file stream processes files in a known order.
    */
  private def stageFile(df: org.apache.spark.sql.DataFrame, dir: String,
                        name: String, mtimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-stage-")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = scala.util.Using.resource(Files.list(tmp)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
    }
    val dest = java.nio.file.Paths.get(dir, name)
    Files.move(part, dest)
    Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  test("streaming dedup suppresses duplicate fingerprints across micro-batches") {
    val dir = Files.createTempDirectory("graft-sdedup-").toString
    val t0 = System.currentTimeMillis()
    // batch 1: two distinct texts (ids 1, 2) + an in-batch duplicate of
    // text A (id 5 — min is 1, so 1 represents)
    stageFile(Seq((5L, "text aaa"), (1L, "text aaa"), (2L, "text bbb"))
      .toDF("doc_id", "text"), dir, "01.parquet", t0)
    // batch 2: duplicate of A again (suppressed by state), one new text
    stageFile(Seq((3L, "text aaa"), (4L, "text ccc"))
      .toDF("doc_id", "text"), dir, "02.parquet", t0 + 5000)
    val got = graft.streaming.EventStream.streamingDedupDir(spark, dir,
        maxFilesPerTrigger = Some(1))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L),
      "first batch's min-id representative must stick; later dupes suppressed")
  }

  test("stateful sessionize carries open sessions and counters across micro-batches") {
    val dir = Files.createTempDirectory("graft-sess-x-").toString
    val t0 = System.currentTimeMillis()
    // file 1: user 1 opens a session (2 events); user 2 completes one
    // session and opens another
    stageFile(eventRows(Seq(
      (1L, 10L, "2026-01-01 00:00:00"),
      (1L, 11L, "2026-01-01 00:10:00"),
      (2L, 20L, "2026-01-01 00:00:00"),
      (2L, 21L, "2026-01-01 02:00:00"))), dir, "01-batch1.parquet", t0)
    // file 2 (later mtime → later micro-batch): user 1's events continue
    // WITHIN the 30-min gap (must merge into the open session, not split),
    // then a post-gap event opens session 2; user 2's event is post-gap
    // (session 3 — the counter must not restart at 1)
    stageFile(eventRows(Seq(
      (1L, 12L, "2026-01-01 00:20:00"),
      (1L, 13L, "2026-01-01 03:00:00"),
      (2L, 22L, "2026-01-01 04:00:00"))), dir, "02-batch2.parquet", t0 + 5000)

    val got = EventStream.sessionizeStatefulDir(spark, dir,
        maxFilesPerTrigger = Some(1))
      .select("user_id", "session_seq", "n_events", "first_event", "last_event")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 1L, 3L, 10L, 12L), // spans both micro-batches, merged
      (1L, 2L, 1L, 13L, 13L),
      (2L, 1L, 1L, 20L, 20L),
      (2L, 2L, 1L, 21L, 21L),
      (2L, 3L, 1L, 22L, 22L)) // counter continued across the batch boundary
    assert(got == expected)
    // and it must agree with the batch formulation over the union
    val union = spark.read.parquet(s"$dir/01-batch1.parquet",
      s"$dir/02-batch2.parquet")
    val batch = EventStream.sessionize(union)
      .select("user_id", "session_seq", "n_events", "first_event", "last_event")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("stateful sessionize spills a hot key instead of buffering its batch") {
    val dir = Files.createTempDirectory("graft-sess-hot-").toString
    val t0 = System.currentTimeMillis()
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    def at(minutes: Long) = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusMinutes(minutes).format(fmt)
    // hot user 9 carries 20× any other group's rows in ONE micro-batch:
    // 2000 events ~1/min with a 3h jump every 400 → 5 sessions; cold
    // users 1..4 have 100 events → 1 session each. Staged SHUFFLED so
    // the bounded run sort is load-bearing, with the in-heap cap forced
    // low so the hot key MUST take the spill-and-merge path (the skew
    // shape that previously buffered the whole group on-heap).
    val rnd = new scala.util.Random(42)
    val hot = (0 until 2000).map(i =>
      (9L, 10000L + i, at(i + (i / 400) * 180L)))
    val cold = for (u <- 1L to 4L; i <- 0 until 100)
      yield (u, u * 1000 + i, at(i.toLong))
    stageFile(eventRows(rnd.shuffle(hot ++ cold)), dir, "01-hot.parquet", t0)

    val prevCap = graft.streaming.SpillSort.MaxBufferedEvents
    graft.streaming.SpillSort.MaxBufferedEvents = 256
    val spillsBefore = graft.streaming.SpillSort.spilledRuns.get()
    val got =
      try EventStream.sessionizeStatefulDir(spark, dir)
        .select("user_id", "session_seq", "n_events", "first_event", "last_event")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      finally graft.streaming.SpillSort.MaxBufferedEvents = prevCap
    assert(graft.streaming.SpillSort.spilledRuns.get() > spillsBefore,
      "the hot key must sort through spilled runs, not heap")
    assert(got.count(_._1 == 9L) == 5)
    val batch = EventStream.sessionize(
        spark.read.parquet(s"$dir/01-hot.parquet"))
      .select("user_id", "session_seq", "n_events", "first_event", "last_event")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
  }
}
