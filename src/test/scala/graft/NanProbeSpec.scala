package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** NaN safety rail for float/double stats pruning: Spark's total order
  * puts NaN ABOVE every numeric value, so finite footer bounds on a
  * NaN-bearing file would let `x > max` pruning — and the metadata
  * DELETE's negated-exclusion proof — silently lose the NaN rows. The
  * rail holds because such files record NO usable bounds (the NaN
  * poisons the footer min/max, and absent bounds decline every prune);
  * this spec pins that end to end so a stats-collection change can't
  * quietly reopen the hole.
  */
class NanProbeSpec extends SparkSpec {
  test("NaN-bearing double columns record no bounds; NaN rows survive " +
      "pruned reads and DELETE") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-nan-").toString
    val t = SnapshotTable.at(root)
    val rows = Seq((1L, 1.0), (2L, 5.0), (3L, Double.NaN))
    t.createOrReplace(rows.toDF("id", "x").coalesce(1))
    val f = t.currentManifest.files.head
    assert(f.stats.get("x").isEmpty,
      s"a NaN-poisoned column must record no bounds, got ${f.stats.get("x")}")
    // Spark: NaN > 10.0 is TRUE — the file must stay a candidate
    assert(t.pruneCounts(col("x") > 10.0)._1 == 1,
      "absent bounds must keep the NaN file in every census")
    assert(t.readWhere(spark, col("x") > 10.0).count() == 1)
    // and the metadata-delete proof can never claim the file wholesale
    t.deleteWhere(spark, col("x") <= 5.0)
    assert(t.read(spark).collect().map(_.getLong(0)).toSeq == Seq(3L),
      "the NaN row must survive DELETE x <= 5.0")
  }
}
