package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{ZOrder, ZValue}
import graft.table.SnapshotTable

/** Z-order kernels and the layout rewrite: key-mapping monotonicity,
  * interleave bit math, expression ≡ kernel under codegen, and the
  * property the feature exists for — after `rewriteZOrder` on two
  * columns, file bounds prune on BOTH, where a linear sort leaves the
  * trailing column unprunable.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // keys live in the UNSIGNED 64-bit domain (interleave reads raw bits)
  private def unsignedSorted(xs: Seq[Long]): Boolean =
    xs.zip(xs.tail).forall { case (a, b) =>
      java.lang.Long.compareUnsigned(a, b) < 0 }

  test("key mappings preserve order per type (unsigned domain)") {
    val longs = Seq(Long.MinValue, -5L, -1L, 0L, 1L, 42L, Long.MaxValue)
    assert(unsignedSorted(longs.map(ZValue.fromLong)))
    val doubles = Seq(Double.NegativeInfinity, -1e300, -1.5, -0.0, 0.0,
      1e-300, 2.5, Double.PositiveInfinity)
    assert(unsignedSorted(doubles.map(ZValue.fromDouble)))
    val strings = Seq("", "a", "ab", "b", "ba", "zz").map(
      org.apache.spark.unsafe.types.UTF8String.fromString)
    assert(unsignedSorted(strings.map(ZValue.fromUTF8)))
  }

  test("interleave round-robins bits across columns, MSB first") {
    // column 0's MSB is the first output bit, column 1's the second
    assert(ZValue.interleave(Array(1L << 63, 0L)).toSeq ==
      (Array[Byte](0x80.toByte) ++ Array.fill[Byte](15)(0)).toSeq)
    assert(ZValue.interleave(Array(0L, 1L << 63)).toSeq ==
      (Array[Byte](0x40.toByte) ++ Array.fill[Byte](15)(0)).toSeq)
    // all-ones keys fill every output bit
    assert(ZValue.interleave(Array(-1L, -1L)).toSeq ==
      Array.fill[Byte](16)(0xff.toByte).toSeq)
    // lowest bit of the LAST column is the final output bit
    assert(ZValue.interleave(Array(0L, 1L)).toSeq ==
      (Array.fill[Byte](15)(0) ++ Array[Byte](0x01)).toSeq)
  }

  test("expression matches the kernel under codegen and maps nulls low") {
    val rows = Seq((5L, 3.5, "abc"), (-2L, -0.5, "zz"), (0L, 0.0, ""))
    val df = rows.toDF("a", "b", "c")
    val got = df.select(ZOrder.zvalue(col("a"), col("b"), col("c")))
      .as[Array[Byte]].collect().toSeq
    val want = rows.map { case (a, b, c) =>
      ZValue.interleave(Array(
        ZValue.fromLong(a), ZValue.fromDouble(b),
        ZValue.fromUTF8(org.apache.spark.unsafe.types.UTF8String.fromString(c))))
    }
    assert(got.zip(want).forall { case (g, w) => g.sameElements(w) })
    // a null key sorts below every non-null key of its column: ordering
    // by the z-value must put the null-a row first (binary sort order)
    val ordered = Seq((Some(1L), 2L), (None, 2L)).toDF("a", "b")
      .orderBy(ZOrder.zvalue(col("a"), col("b")))
      .select("a").as[Option[Long]].collect()
    assert(ordered.head.isEmpty && ordered(1).contains(1L))
    // SQL registration
    graft.functions.Registry.registerAll(spark)
    val viaSql = df.selectExpr("graft_zvalue(a, b, c)")
      .as[Array[Byte]].collect().toSeq
    assert(viaSql.zip(want).forall { case (g, w) => g.sameElements(w) })
  }

  test("z-order rewrite makes BOTH dimensions prunable; rows unchanged") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-zorder-spec-").toString)
    // a 64x64 grid: under any linear sort one of x/y is unprunable
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    tbl.createOrReplace(grid.repartitionByRange(8, col("x")))
    // baseline: x-sorted layout prunes x but not y
    assert(tbl.pruneCounts(col("x") < 8L)._1 < 8)
    assert(tbl.pruneCounts(col("y") < 8L)._1 == 8,
      "sanity: linear-on-x layout cannot prune y")
    tbl.rewriteZOrder(spark, Seq("x", "y"), minFiles = 8)
    val total = tbl.currentManifest.files.size
    assert(total >= 8)
    val keptX = tbl.pruneCounts(col("x") < 8L)._1
    val keptY = tbl.pruneCounts(col("y") < 8L)._1
    assert(keptX < total, s"x must prune after z-order ($keptX/$total)")
    assert(keptY < total, s"y must prune after z-order ($keptY/$total)")
    // layout change only: same rows, and pruned reads agree with filters
    assert(tbl.read(spark).count() == 64L * 64)
    assert(tbl.readWhere(spark, col("x") < 8L && col("y") < 8L).count() == 64)
    assert(tbl.readWhere(spark, col("x") < 8L || col("y") < 8L).count() == 960)
    // the layout is recorded in table properties (sort-order metadata)
    assert(tbl.currentManifest.properties.get("write.graft.zorder-by")
      .contains("x,y"))
  }

  test("compaction re-clusters a z-ordered table instead of scattering it") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-zorder-compact-").toString)
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    tbl.createOrReplace(grid.repartitionByRange(8, col("x")))
    tbl.rewriteZOrder(spark, Seq("x", "y"), minFiles = 8)
    // a MoR merge leaves a pending delete → compaction must fold it, and
    // the rewrite must preserve the curve layout (hash-scattering would
    // make every file's bounds span the full range on both columns)
    tbl.mergeMoR(spark,
      Seq((0L, 0L)).toDF("x", "y").withColumn("op", lit("U")),
      Seq("x", "y"), keepDeletes = false)
    val bytes = tbl.currentManifest.files
      .map(f => Files.size(tbl.root.resolve(f.path))).sum
    tbl.compact(spark, targetFileBytes = math.max(1, bytes / 8))
    val m = tbl.currentManifest
    assert(m.deleteFiles.isEmpty, "compaction folds the delete")
    val total = m.files.size
    assert(total >= 4, s"re-clustered table must stay multi-file ($total)")
    assert(tbl.pruneCounts(col("x") < 8L)._1 < total,
      "x must still prune after compaction")
    assert(tbl.pruneCounts(col("y") < 8L)._1 < total,
      "y must still prune after compaction")
    assert(tbl.read(spark).count() == 64L * 64)
  }

  test("PARTITIONED z-order: curve per partition, hive layout preserved") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-zorder-part-").toString)
    // 4 partitions × a 32x32 grid each: partition values prune partition
    // predicates, and within each partition both x and y must prune
    val grid = (0 until 4).flatMap(p =>
      (0 until 32).flatMap(x => (0 until 32).map(y =>
        (p.toLong, x.toLong, y.toLong))))
      .toDF("p", "x", "y")
    tbl.createOrReplace(grid, Seq("p"))
    // partition columns are rejected as curve dimensions
    intercept[IllegalArgumentException] {
      tbl.rewriteZOrder(spark, Seq("p", "x"))
    }
    tbl.rewriteZOrder(spark, Seq("x", "y"), minFiles = 16)
    val m = tbl.currentManifest
    val total = m.files.size
    assert(total >= 16)
    // hive layout preserved: every file still carries its partition value
    assert(m.files.forall(_.partition.keySet == Set("p")))
    assert(m.files.map(_.partition("p")).toSet == Set("0", "1", "2", "3"))
    // per-dimension prune census WITHIN a partition: p=1 alone keeps only
    // its files; adding an x (or y) range keeps only the curve's corner
    val perPart = tbl.pruneCounts(col("p") === 1L)._1
    assert(perPart < total, s"partition pruning must hold ($perPart/$total)")
    val keptX = tbl.pruneCounts(col("p") === 1L && col("x") < 8L)._1
    val keptY = tbl.pruneCounts(col("p") === 1L && col("y") < 8L)._1
    assert(keptX < perPart,
      s"x must prune within the partition ($keptX/$perPart)")
    assert(keptY < perPart,
      s"y must prune within the partition ($keptY/$perPart)")
    // global x predicate prunes across every partition's files too
    assert(tbl.pruneCounts(col("x") < 8L)._1 < total)
    // layout change only
    assert(tbl.read(spark).count() == 4L * 32 * 32)
    assert(tbl.readWhere(spark,
      col("p") === 1L && col("x") < 8L && col("y") < 8L).count() == 64)
    // partition-scoped merge on the z-ordered table keeps the layout for
    // untouched partitions and correctness everywhere
    tbl.merge(spark,
      Seq((1L, 0L, 0L)).toDF("p", "x", "y").withColumn("op", lit("U")),
      Seq("p", "x", "y"), keepDeletes = false, partitionStableByKey = true)
    assert(tbl.read(spark).count() == 4L * 32 * 32)
    assert(tbl.pruneCounts(col("p") === 2L && col("x") < 8L)._1 <
      tbl.pruneCounts(col("p") === 2L)._1,
      "untouched partition keeps its curve pruning after a merge")
  }

  test("CALL rewrite_data_files strategy=sort reaches zorder and linear") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-sortcall-spec-").toString)
    val grid = (0 until 64).flatMap(x => (0 until 64)
      .map(y => (x.toLong, y.toLong))).toDF("x", "y")
    tbl.createOrReplace(grid.repartition(8))
    // hash layout prunes neither dimension
    assert(tbl.pruneCounts(col("x") < 8L)._1 == 8)
    spark.sql("CALL graft.system.rewrite_data_files(" +
      s"table => '${tbl.root}', strategy => 'sort', " +
      "sort_order => 'zorder(x, y)', target_file_size_bytes => 4096)")
    val total = tbl.currentManifest.files.size
    assert(tbl.pruneCounts(col("x") < 8L)._1 < total &&
      tbl.pruneCounts(col("y") < 8L)._1 < total,
      "the Iceberg zorder spelling must reach rewriteZOrder")
    assert(tbl.read(spark).count() == 64L * 64)

    // linear sort order: leading column prunes, property recorded
    spark.sql("CALL graft.system.rewrite_data_files(" +
      s"table => '${tbl.root}', strategy => 'sort', " +
      "sort_order => 'y', target_file_size_bytes => 4096)")
    val total2 = tbl.currentManifest.files.size
    assert(tbl.pruneCounts(col("y") < 8L)._1 < total2,
      "linear sort must make the leading column prunable")
    assert(tbl.currentManifest.properties
      .get("write.graft.sort-order").contains("y"))
    assert(!tbl.currentManifest.properties.contains("write.graft.zorder-by"),
      "layout properties are exclusive: the stale curve must clear, or " +
        "the next compaction re-clusters on it and scatters this layout")
    assert(tbl.read(spark).count() == 64L * 64)

    // guard rails: sort + where refuses; unknown strategy refuses
    intercept[Exception](spark.sql("CALL graft.system.rewrite_data_files(" +
      s"table => '${tbl.root}', strategy => 'sort', sort_order => 'x', " +
      "where => 'x = 1')"))
    intercept[Exception](spark.sql("CALL graft.system.rewrite_data_files(" +
      s"table => '${tbl.root}', strategy => 'shuffle')"))
  }

  test("z-order rewrite of an empty table is a no-op") {
    val tbl = SnapshotTable.at(
      Files.createTempDirectory("graft-zorder-empty-").toString)
    tbl.createOrReplace(Seq.empty[(Long, Long)].toDF("x", "y"))
    val v = tbl.currentVersion
    tbl.rewriteZOrder(spark, Seq("x", "y")) // must not NPE on null bounds
    assert(tbl.currentVersion == v)
  }
}
