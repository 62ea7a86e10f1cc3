package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.streaming.StreamingIngest
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
}
