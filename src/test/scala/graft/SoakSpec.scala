package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.Ingestion
import graft.table.SnapshotTable

/** Multi-day soak of the real table loop: 8 consecutive merge days on a
  * bucket-partitioned table with rolling inserts/updates/deletes, the
  * reference's diff oracle green every day, snapshot retention applied,
  * and the partition-scoped rewrite actually limiting file churn.
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  test("8-day merge loop stays correct with retention and partition reuse") {
    val root = Files.createTempDirectory("graft-soak-").toString
    val tbl = SnapshotTable.at(root)
    val cfg = SourceConfig("soak", "t", Seq("id"), Seq("upd"),
      partitionColumns = Seq("p"))

    // day d: live keys are [d*5, 1000 + d*5) — 5 inserted + 5 deleted per
    // day; keys divisible by 17 get a fresh updated-at each day
    def batch(day: Int) = {
      val ts = Timestamp.valueOf(f"2026-03-${day + 1}%02d 00:00:00")
      // payload is a function of (key, updated-at): rows whose updated-at
      // didn't move are byte-identical across batches, matching the
      // engine's (and the reference's) update-detection contract
      val rows = (day * 5 until 1000 + day * 5).map { k =>
        val upd = if (k % 17 == 0) ts else Timestamp.valueOf("2026-01-01 00:00:00")
        (k.toLong, upd, s"v$k-${upd.getTime}")
      }
      rows.toDF("id", "upd", "payload").withColumn("p", col("id") % 8)
    }

    for (day <- 0 until 8) {
      val b = batch(day)
      Ingestion.run(spark, tbl,
        b, cfg, Timestamp.valueOf(f"2026-03-${day + 1}%02d 00:00:00"))
      assert(Ingestion.diffCount(spark, tbl, b, keepDeletes = false) == 0,
        s"day $day diff non-zero")
    }
    assert(tbl.currentVersion == 8)
    assert(tbl.read(spark).count() == 1000)

    // steady state: day 8's merge rewrote only partitions with changes;
    // with deletes+inserts crossing all 8 buckets this day, at minimum the
    // manifest must not balloon — live file count stays bounded
    val m = tbl.currentManifest
    assert(m.files.size <= 8 * 8, s"file count ${m.files.size}")

    // tight retention: keep current + 2
    val expired = tbl.expireSnapshots(maxAgeMs = -1, minSnapshotsToKeep = 3)
    assert(expired.nonEmpty)
    assert(tbl.manifestVersions.size == 3)
    assert(tbl.read(spark).count() == 1000)
    tbl.removeOrphanFiles()
    assert(tbl.read(spark).count() == 1000)
    // time travel to the oldest retained version still works
    val oldest = tbl.manifestVersions.min
    assert(tbl.readVersion(spark, oldest).count() == 1000)
  }
}
