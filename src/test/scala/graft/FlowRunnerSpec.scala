package graft

import java.nio.file.Files
import java.time.OffsetDateTime

import graft.core.IngestMode
import graft.ingest.FlowRunner
import graft.table.SnapshotTable

/** Multi-table flow run from a config file: one AppFlow-style full table
  * and one DMS-style cdc table in a single invocation, tests appended
  * only for full/replace — mirroring the reference's DAG wiring.
  */
class FlowRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("flow config drives both source families; test gating per mode") {
    val base = Files.createTempDirectory("graft-flow-").toString
    val (raw, wh, out) = (s"$base/raw", s"$base/wh", s"$base/out")

    // appflow-style full table
    Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "x"))
      .toDF("Id", "SystemModstamp", "payload")
      .write.parquet(s"$raw/crm/accounts/2026-06-02")
    // dms-style cdc table (bootstrap)
    Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 5.0, "I"))
      .toDF("RECID", "MODIFIEDDATETIME", "V", "OP")
      .write.parquet(s"$raw/dms1/dms/cdc/schema1/TXN/2026/06/01")

    val config = s"$base/flows.json"
    Files.writeString(java.nio.file.Paths.get(config),
      """{"crm": {"accounts": {"type": "full"}},
        | "dms1": {"txn": {"type": "cdc", "schema": "schema1",
        |                  "keep_deletes": true}}}""".stripMargin)

    val results = FlowRunner.run(spark, config, raw, wh, out,
      OffsetDateTime.parse("2026-06-02T00:00:00Z"))
    assert(results.map(r => (r.source, r.table, r.tested)).toSet ==
      Set(("crm", "accounts", true), ("dms1", "txn", false)))

    assert(SnapshotTable.at(s"$wh/crm/accounts").read(spark).count() == 1)
    val cdc = SnapshotTable.at(s"$wh/dms1/txn").read(spark)
    // dms columns lowercased; cdc bootstrap drops op; keep_deletes stamps flag
    assert(cdc.columns.contains("recid"))
    assert(cdc.columns.contains("hard_deleted"))
    assert(!cdc.columns.contains("op"))
    // outputs written for both
    assert(Files.exists(java.nio.file.Paths.get(
      s"$out/crm/accounts/manifest_file/2026-06-02")))
    assert(Files.exists(java.nio.file.Paths.get(
      s"$out/dms1/txn/file_list_full/2026-06-02")))
  }

  test("one failed table surfaces AFTER every other table has finished") {
    val base = Files.createTempDirectory("graft-flow-fail-").toString
    val (raw, wh, out) = (s"$base/raw", s"$base/wh", s"$base/out")
    // `good` has data; `doomed` has no raw directory and will throw
    Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "x"))
      .toDF("Id", "SystemModstamp", "payload")
      .write.parquet(s"$raw/crm/good/2026-06-02")
    val config = s"$base/flows.json"
    Files.writeString(java.nio.file.Paths.get(config),
      """{"crm": {"doomed": {"type": "full"}, "good": {"type": "full"}}}""")
    intercept[Exception] {
      FlowRunner.run(spark, config, raw, wh, out,
        OffsetDateTime.parse("2026-06-02T00:00:00Z"))
    }
    // the failure must not abandon the other table mid-flight: by the
    // time run() returns (exceptionally), `good` is fully committed —
    // no background thread keeps mutating the warehouse afterward
    assert(SnapshotTable.at(s"$wh/crm/good").read(spark).count() == 1)
  }
}
