package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.Ingestion
import graft.table.SnapshotTable

/** Storage-backed property test: random two-batch scenarios run through
  * the PARTITIONED SnapshotTable path, with a partition column derived
  * from the updated-at value (mutable — updates move rows across
  * partitions), must equal the pure DataFrame pipeline on the same
  * inputs. Guards the partition-scoped rewrite against the moved-row
  * duplication class of bugs.
  */
class PartitionedStoragePropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2026-02-0${i + 1} 00:00:00")

  test("partitioned storage merge equals the pure pipeline on 10 random scenarios") {
    val rnd = new scala.util.Random(11)
    for (i <- 0 until 10) {
      val mode = if (rnd.nextBoolean()) IngestMode.Full else IngestMode.Incremental
      val cfg = SourceConfig("p", s"t$i", Seq("id"), Seq("upd"),
        partitionColumns = Seq("p"), mode = mode)
      def mk(rows: Seq[(Long, Int, Double)]) =
        rows.map { case (id, u, v) => (id, ts(u), v) }.toDF("id", "upd", "v")
          // partition derives from updated-at → updates MOVE partitions
          .withColumn("p", dayofmonth(col("upd")) % 3)
      val day1 = (0 until 30).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(3), rnd.nextInt(50).toDouble))
      val day2 = (0 until 30).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(6), rnd.nextInt(50).toDouble))

      // pure pipeline result
      val pureSrc = Ingestion.stamp(mk(day2), ts(6), keepDeletes = false)
      val pureTgt = Ingestion.stamp(mk(day1), ts(0), keepDeletes = false)
      val expected = Ingestion.applyMode(pureSrc, pureTgt, cfg)
        .select("id", "upd", "v", "p")
        .as[(Long, Timestamp, Double, Int)].collect().sorted.toSeq

      // storage-backed result
      val tbl = SnapshotTable.at(
        Files.createTempDirectory(s"graft-pprop$i-").toString)
      Ingestion.run(spark, tbl, mk(day1), cfg, ts(0))
      Ingestion.run(spark, tbl, mk(day2), cfg, ts(6))
      val got = tbl.read(spark)
        .select("id", "upd", "v", "p")
        .as[(Long, Timestamp, Double, Int)].collect().sorted.toSeq

      assert(got == expected,
        s"scenario $i mode=$mode\n day1=$day1\n day2=$day2")
    }
  }
}
