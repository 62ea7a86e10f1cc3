package graft

import java.nio.file.Files
import java.time.OffsetDateTime

import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.{AppflowStyleJob, DmsStyleJob}

/** End-to-end job lifecycle over dated raw directories: path routing
  * (incl. the CDC bootstrap branch), two-day full ingest, JSON outputs,
  * monthly compaction trigger, and the `--test` oracle.
  */
class IngestionJobSpec extends SparkSpec {
  import spark.implicits._

  private def mkRoots() = {
    val base = Files.createTempDirectory("graft-job-").toString
    (s"$base/raw", s"$base/wh", s"$base/out")
  }

  private val cfg = SourceConfig("crm", "accounts",
    naturalKeys = Seq("id"), updatedAtFields = Seq("modstamp"))

  private def rows(ids: Range, ts: String, v: Double) =
    ids.map(i => (i.toLong, java.sql.Timestamp.valueOf(ts), v))
      .toDF("id", "modstamp", "v")

  test("appflow-style two-day ingest with outputs and --test oracle") {
    val (raw, wh, out) = mkRoots()
    // day 1
    rows(1 to 50, "2026-01-01 00:00:00", 1.0)
      .write.parquet(s"$raw/crm/accounts/2026-03-02")
    val day1 = new AppflowStyleJob(spark, cfg, "crm", raw, wh, out,
      OffsetDateTime.parse("2026-03-02T00:00:00Z"))
    day1.run()
    day1.test()
    // day 2: 10 new, 20 updated, 5 gone
    rows(6 to 60, "2026-01-02 00:00:00", 2.0)
      .write.parquet(s"$raw/crm/accounts/2026-03-03")
    val day2 = new AppflowStyleJob(spark, cfg, "crm", raw, wh, out,
      OffsetDateTime.parse("2026-03-03T00:00:00Z"))
    day2.run()
    day2.test()
    assert(day2.table.currentVersion == 2)
    assert(day2.table.read(spark).count() == 55)
    // K3 outputs: dated file list + manifest pointer (reference naming)
    val files = spark.read.json(s"$out/crm/accounts/file_list_full/2026-03-03")
    assert(files.count() >= 1)
    val manifest = spark.read.json(s"$out/crm/accounts/manifest_file/2026-03-03")
      .select("manifest").as[String].head()
    assert(manifest.endsWith("meta/v2.json"))
  }

  test("dms-style cdc routes bootstrap vs daily path, merges ops") {
    val (raw, wh, out) = mkRoots()
    val ccfg = cfg.copy(database = "dmsdb", table = "txn",
      mode = IngestMode.Cdc)
    def cdcRows(tuples: Seq[(Long, String, Double, String)]) =
      tuples.map { case (id, ts, v, op) =>
        (id, java.sql.Timestamp.valueOf(ts), v, op)
      }.toDF("id", "modstamp", "v", "op")
    // bootstrap history: two days of CDC files under the cdc root
    cdcRows(Seq((1L, "2026-01-01 00:00:00", 1.0, "I"),
        (2L, "2026-01-01 00:00:00", 2.0, "I")))
      .write.parquet(s"$raw/dms1/dms/cdc/schema1/TXN/2026/03/01")
    cdcRows(Seq((1L, "2026-01-02 00:00:00", 1.5, "U")))
      .write.parquet(s"$raw/dms1/dms/cdc/schema1/TXN/2026/03/02")
    val boot = new DmsStyleJob(spark, ccfg, "dms1", "schema1", raw, wh, out,
      OffsetDateTime.parse("2026-03-02T00:00:00Z"))
    // table absent → bootstrap reads the WHOLE history dir
    assert(boot.rawPath.endsWith("cdc/schema1/TXN"))
    boot.run()
    // bootstrap CTAS drops op; both days' rows landed
    val t1 = boot.table.read(spark)
    assert(!t1.columns.contains("op"))
    assert(t1.count() == 3)
    // daily increment: delete id=2, insert id=3
    cdcRows(Seq((2L, "2026-01-03 00:00:00", 0.0, "D"),
        (3L, "2026-01-03 00:00:00", 3.0, "I")))
      .write.parquet(s"$raw/dms1/dms/cdc/schema1/TXN/2026/03/03")
    val daily = new DmsStyleJob(spark, ccfg, "dms1", "schema1", raw, wh, out,
      OffsetDateTime.parse("2026-03-03T00:00:00Z"))
    assert(daily.rawPath.endsWith("TXN/2026/03/03"))
    daily.run()
    val got = daily.table.read(spark).select("id", "v")
      .as[(Long, Double)].collect().toMap
    // NOTE: bootstrap applied both history days as latest-per-key
    assert(got.keySet == Set(1L, 3L))
    assert(got(3L) == 3.0)
  }

  test("monthly compaction fires on the 1st") {
    val (raw, wh, out) = mkRoots()
    rows(1 to 500, "2026-01-01 00:00:00", 1.0).repartition(6)
      .write.parquet(s"$raw/crm/accounts/2026-04-01")
    val job = new AppflowStyleJob(spark, cfg, "crm", raw, wh, out,
      OffsetDateTime.parse("2026-04-01T00:00:00Z"))
    job.run()
    // v1 = CTAS (6 files), v2 = compaction to 1 file
    assert(job.table.currentVersion == 2)
    assert(job.table.currentManifest.files.size == 1)
  }

  test("CLI arg parsing handles flags and values") {
    val a = Main.parseArgs(Array("--datetime", "2026-08-12T00:00:00+00:00",
      "--source", "crm", "--table", "accounts", "--type", "full",
      "--keys", "id", "--updated-at", "modstamp", "--keep-deletes", "--test"))
    assert(a("datetime") == "2026-08-12T00:00:00+00:00")
    assert(a("keep-deletes") == "true")
    assert(a("test") == "true")
    assert(a("type") == "full")
  }

  test("CLI end-to-end run + test") {
    val (raw, wh, out) = mkRoots()
    rows(1 to 30, "2026-01-01 00:00:00", 1.0)
      .write.parquet(s"$raw/crm/accounts/2026-05-02")
    val common = Array("--datetime", "2026-05-02T00:00:00+00:00",
      "--source", "crm", "--table", "accounts", "--type", "full",
      "--keys", "id", "--updated-at", "modstamp",
      "--raw-root", raw, "--warehouse", wh, "--out", out)
    Main.main(common)
    Main.main(common :+ "--test")
    assert(spark.read.json(s"$out/crm/accounts/manifest_file/2026-05-02").count() == 1)
  }
}
