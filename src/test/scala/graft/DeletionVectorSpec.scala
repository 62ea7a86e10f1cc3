package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Dv
import graft.table.SnapshotTable

/** Iceberg v3 DELETION VECTORS: the GDV1 codec itself, fold-at-write
  * (one complete vector per file), newest-wins shadowing at read,
  * supersede drop, rendering, metadata-count integration, and compaction
  * folding.
  */
class DeletionVectorSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-dv-$tag-").toString + "/t"

  private def mkDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, s"r$i")).toDF("id", "v")
  }

  test("GDV1 codec: runs, membership, cardinality, round-trip") {
    val pos = Array(0L, 1L, 2L, 7L, 9L, 10L, 500L)
    val dv = Dv.fromSortedPositions(pos)
    // 4 runs: [0,3) [7,8) [9,11) [500,501) → 8 + 4*16 bytes
    assert(dv.length == 8 + 4 * 16)
    assert(Dv.cardinality(dv) == 7L)
    assert(Dv.positions(dv).toSeq == pos.toSeq)
    pos.foreach(p => assert(Dv.contains(dv, p), s"missing $p"))
    Seq(3L, 6L, 8L, 11L, 499L, 501L, Long.MaxValue)
      .foreach(p => assert(!Dv.contains(dv, p), s"false hit $p"))
    assert(Dv.fromSortedPositions(Array.empty[Long]).length == 8)
    assert(!Dv.contains(Dv.fromSortedPositions(Array.empty[Long]), 0L))
    // a corrupt blob fails LOUDLY, never reads as empty
    intercept[Exception](Dv.cardinality("junkjunk".getBytes))
    intercept[Exception](Dv.contains("junkjunkjunk".getBytes, 1L))
    // ...including a TRUNCATED one (< 8 bytes): a silent false would
    // resurrect deleted rows (ADVICE r13 — an encoded empty vector is
    // exactly 8 bytes, so no legitimate blob is shorter)
    intercept[Exception](Dv.contains(Array[Byte]('G', 'D', 'V'), 0L))
    intercept[Exception](Dv.contains(Array.empty[Byte], 0L))
  }

  test("v3 positional delete writes a DV; read masks exactly; v2 untouched") {
    val t = SnapshotTable.at(freshRoot("basic"))
    t.createOrReplace(mkDf(0L until 100L),
      properties = Map("format-version" -> "3"))
    t.deleteWherePositional(spark, col("id") % 10 === 3L)
    val m = t.currentManifest
    assert(m.deleteFiles.size == 1 && m.deleteFiles.head.dv &&
      m.deleteFiles.head.positional)
    assert(m.deleteFiles.head.rows == 10L)
    val got = t.read(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 100L).filter(_ % 10 != 3).toSet)
    // the sidecar holds bitmap rows, not tombstone rows
    val raw = spark.read.parquet(
      t.root.resolve(m.deleteFiles.head.path).toString)
    assert(raw.columns.toSet == Set("path", "dv", "cardinality"))
    assert(raw.agg(sum("cardinality")).head.getLong(0) == 10L)
  }

  test("fold-at-write: second delete replaces the file's vector, supersedes") {
    val t = SnapshotTable.at(freshRoot("fold"))
    t.createOrReplace(mkDf(0L until 60L),
      properties = Map("format-version" -> "3"))
    t.deleteWherePositional(spark, col("id") < 10L)
    val firstEntry = t.currentManifest.deleteFiles.head
    t.deleteWherePositional(spark, col("id") >= 50L)
    val m = t.currentManifest
    // the second commit re-covers every path of the first (the table is
    // a handful of files and both deletes touch them all) OR at minimum
    // the newest vector is complete for re-deleted paths; either way the
    // read is exact
    val got = t.read(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (10L until 50L).toSet)
    // every surviving DV entry is complete for its paths: the newest
    // entry's cardinality covers BOTH deletes for any path both touched
    val newest = m.deleteFiles.filter(_.dv).maxBy(_.version)
    val newestRows = spark.read.parquet(
      t.root.resolve(newest.path).toString)
    val perPath = newestRows.select(col("path"), col("cardinality"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // paths touched by both deletes hold the FOLDED count
    val firstRows = spark.read.parquet(
        t.root.resolve(firstEntry.path).toString)
      .select(col("path"),
        explode(Dv.dvPositions(col("dv"))).as("pos"))
      .groupBy("path").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    firstRows.foreach { case (p, n1) =>
      perPath.get(p).foreach(n2 => assert(n2 >= n1,
        s"newest vector for $p must fold the prior ($n2 < $n1)"))
    }
    // @position_deletes renders each pending ordinal exactly once
    val pd = t.positionDeletesRelation(spark)
      .select("file_path", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(pd.length == pd.distinct.length, "no duplicate tombstone rows")
    assert(pd.length == 20, s"20 dead ordinals expected, got ${pd.length}")
    // metadata-only COUNT subtracts the DV census exactly
    assert(t.rowCount(spark).contains(40L))
  }

  test("updateWherePositional under v3 writes a DV tombstone side") {
    val t = SnapshotTable.at(freshRoot("upd"))
    t.createOrReplace(mkDf(0L until 30L),
      properties = Map("format-version" -> "3"))
    t.updateWherePositional(spark, Seq("v" -> lit("X")), col("id") < 5L)
    val m = t.currentManifest
    val dels = m.deleteFiles
    assert(dels.size == 1 && dels.head.dv, "update tombstones must be a DV")
    val got = t.read(spark).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 30)
    (0L until 5L).foreach(id => assert(got(id) == "X"))
    (5L until 30L).foreach(id => assert(got(id) == s"r$id"))
  }

  test("compaction folds DVs away; delete_files labels the content kind") {
    val t = SnapshotTable.at(freshRoot("fold2"))
    t.createOrReplace(mkDf(0L until 40L),
      properties = Map("format-version" -> "3"))
    t.deleteWherePositional(spark, col("id") % 4 === 0L)
    assert(t.deleteFilesRelation(spark).select("content").head.getString(0)
      == "deletion-vector")
    t.compact(spark)
    assert(t.currentManifest.deleteFiles.isEmpty, "compaction folds DVs")
    val got = t.read(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 40L).filter(_ % 4 != 0).toSet)
    // row lineage rode through the DV-resolved rewrite
    val lin = t.readLineage(spark).select("_row_id").collect()
      .map(_.getLong(0))
    assert(lin.distinct.length == 30)
  }

  test("rewrite_position_delete_files folds DV debt via the exact census") {
    val t = SnapshotTable.at(freshRoot("rpdf"))
    t.createOrReplace(mkDf(0L until 50L),
      properties = Map("format-version" -> "3"))
    t.deleteWherePositional(spark, col("id") % 5 === 1L)
    assert(t.currentManifest.deleteFiles.count(_.dv) == 1)
    t.rewritePositionDeletes(spark)
    assert(t.currentManifest.deleteFiles.isEmpty,
      "the targeted rewrite must fold the vector away")
    val got = t.read(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 50L).filter(_ % 5 != 1).toSet)
    // lineage rode through the fold
    assert(t.readLineage(spark).select("_row_id").distinct().count() == 40L)
  }

  test("v2 tables keep writing tombstone-row files (no DV without the gate)") {
    val t = SnapshotTable.at(freshRoot("v2"))
    t.createOrReplace(mkDf(0L until 20L))
    t.deleteWherePositional(spark, col("id") === 1L)
    val d = t.currentManifest.deleteFiles.head
    assert(d.positional && !d.dv)
    val raw = spark.read.parquet(t.root.resolve(d.path).toString)
    assert(raw.columns.toSet == Set("path", "pos"))
  }

  test("mixed v2 tombstones + v3 vectors on an upgraded table both apply") {
    val t = SnapshotTable.at(freshRoot("mixed"))
    t.createOrReplace(mkDf(0L until 50L))
    t.deleteWherePositional(spark, col("id") === 7L) // v2 rows file
    t.setProperties(Map("format-version" -> "3"))
    t.deleteWherePositional(spark, col("id") === 8L) // v3 DV
    val kinds = t.currentManifest.deleteFiles.map(_.dv).sorted
    assert(kinds == Seq(false, true))
    val got = t.read(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 50L).toSet -- Set(7L, 8L))
    assert(t.rowCount(spark).contains(48L))
  }
}
