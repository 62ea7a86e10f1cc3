package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.table.SnapshotTable

/** NDV table stats (Iceberg compute_table_stats / Puffin analog):
  * full compute, O(delta) incremental union on append-only lineage,
  * full fallback after rewrites, the @stats relation, and the CALL
  * procedure spelling.
  */
class TableStatsSpec extends SparkSpec {

  private def close(est: Long, exact: Long): Boolean =
    math.abs(est - exact) <= math.max(1L, (0.05 * exact).toLong)

  test("full + incremental NDV: appends union sketches, rewrites rescan") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-stats-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 1000)
      .map(i => (i.toLong, i % 7, s"s${i % 50}", i.toDouble / 3))
      .toDF("id", "m7", "s50", "d"))

    val ndv1 = t.computeTableStats(spark)
    assert(close(ndv1("id"), 1000) && ndv1("m7") == 7 && ndv1("s50") == 50,
      s"full NDV off: $ndv1")
    assert(close(ndv1("d"), 1000), "string-hashed double column sketches")
    assert(t.tableStats.exists(s => s._1 == 1L && s._2 == "full"))

    // pure append: the recompute unions the delta sketch with the
    // stored one — mode records it; new ids extend, m7 stays
    t.append(spark, (1001 to 1500)
      .map(i => (i.toLong, i % 7, s"s${i % 50}", i.toDouble / 3))
      .toDF("id", "m7", "s50", "d"))
    val ndv2 = t.computeTableStats(spark)
    assert(t.tableStats.exists(s => s._1 == 2L && s._2 == "incremental"),
      s"append-only lineage must take the incremental path: ${t.tableStats}")
    assert(close(ndv2("id"), 1500) && ndv2("m7") == 7, s"merged NDV: $ndv2")

    // stale until recomputed: a new commit flips @stats is_current off
    t.append(spark, Seq((9999L, 0, "x", 0.0)).toDF("id", "m7", "s50", "d"))
    val rel = spark.sql(s"SELECT * FROM graft.`$root@stats` " +
      "WHERE column_name = 'id'").head
    assert(rel.getLong(1) == ndv2("id") && rel.getLong(2) == 2L &&
      !rel.getBoolean(3))

    // a rewrite (CoW DELETE removes files) breaks the append-only
    // proof: the next compute is a full rescan and tracks the removal
    t.deleteWhere(spark, col("id") > 1000)
    val ndv3 = t.computeTableStats(spark)
    assert(t.tableStats.exists(_._2 == "full"),
      s"rewritten lineage must force the full path: ${t.tableStats}")
    assert(close(ndv3("id"), 1000), s"post-delete NDV: $ndv3")

    // fresh stats short-circuit: same version answers from the store
    val ndv4 = t.computeTableStats(spark)
    assert(ndv4 == ndv3.filter { case (k, _) => ndv4.contains(k) })
  }

  test("partition stats: per-partition NDV, incremental union on " +
      "append, full after rewrite, @partition_stats rollups + debt") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-pstats-").toString + "/t"
    val t = SnapshotTable.at(root)
    def mk(r: Range) = r
      .map(i => (i.toLong, i % 3, s"s${i % 40}", s"u${i % 11}"))
      .toDF("id", "p", "s40", "u11")
    t.createOrReplace(mk(1 to 900), Seq("p"))

    val r1 = t.computePartitionStats(spark).groupBy(_._1)
    assert(r1.keySet == Set("p=0", "p=1", "p=2"))
    // per-partition truth: ids split 300 a partition; s40 and u11
    // cycle within each residue class
    val byKey = t.computePartitionStats(spark)
      .map { case (pk, c, n) => (pk, c) -> n }.toMap
    assert(close(byKey(("p=0", "id")), 300))
    // s${i%40} within i%3==0: i ∈ {3,6,...,900} → 40/gcd... exact set:
    // distinct s-values among multiples of 3 mod 40 = 40 (3 coprime 40)
    assert(byKey(("p=0", "s40")) == 40 && byKey(("p=0", "u11")) == 11)
    assert(t.partitionStats.exists(s => s._1 == 1L && s._2 == "full"))

    // pure append takes the INCREMENTAL path: only partition p=0 is
    // touched; untouched partitions carry their stored sketches
    t.append(spark, (901 to 1200).filter(_ % 3 == 0)
      .map(i => (i.toLong, 0, s"s${i % 40}", s"u${i % 11}"))
      .toDF("id", "p", "s40", "u11"))
    val r2 = t.computePartitionStats(spark)
      .map { case (pk, c, n) => (pk, c) -> n }.toMap
    assert(t.partitionStats.exists(s => s._1 == 2L && s._2 == "incremental"),
      s"append-only lineage must take the incremental path: ${t.partitionStats}")
    assert(close(r2(("p=0", "id")), 400), s"merged per-partition NDV: $r2")
    assert(r2(("p=1", "id")) == byKey(("p=1", "id")),
      "untouched partition keeps its stored sketch")

    // relation: rollups agree with the data; stats current after CALL
    val rel = t.partitionStatsRelation(spark).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(8), r.getBoolean(9)))).toMap
    assert(rel("p=0")._1 == 400 && rel("p=1")._1 == 300)
    assert(rel.valuesIterator.forall(v => v._2 == 2L && v._3))

    // a rewrite breaks the append-only proof → full rescan
    t.deleteWhere(spark, col("id") > 900)
    val r3 = t.computePartitionStats(spark)
      .map { case (pk, c, n) => (pk, c) -> n }.toMap
    assert(t.partitionStats.exists(_._2 == "full"),
      s"rewritten lineage must force the full path: ${t.partitionStats}")
    assert(close(r3(("p=0", "id")), 300))

    // fresh stats short-circuit + the unpartitioned refusal
    assert(t.computePartitionStats(spark)
      .map { case (pk, c, n) => (pk, c) -> n }.toMap == r3)
    val flat = SnapshotTable.at(
      Files.createTempDirectory("graft-pstats-flat-").toString + "/t")
    flat.createOrReplace(Seq((1L, "a")).toDF("id", "s"))
    assert(intercept[IllegalArgumentException] {
      flat.computePartitionStats(spark)
    }.getMessage.contains("unpartitioned"))

    // NULL partition values render as the hive default token — the
    // same spelling the manifest census records, so sketch keys and
    // the relation's rollup keys JOIN (a bare concat dropped the
    // segment — review r13)
    val np = SnapshotTable.at(
      Files.createTempDirectory("graft-pstats-null-").toString + "/t")
    np.createOrReplace(
      Seq((1L, Option("a"), "x"), (2L, Option.empty[String], "y"),
        (3L, Option.empty[String], "z")).toDF("id", "p", "s"), Seq("p"))
    val nKeys = np.computePartitionStats(spark, Seq("s")).map(_._1).distinct
    assert(nKeys.toSet ==
      Set("p=a", "p=__HIVE_DEFAULT_PARTITION__"), nKeys.toString)
    val relKeys = np.partitionStatsRelation(spark).select("partition")
      .collect().map(_.getString(0)).toSet
    assert(relKeys == nKeys.toSet,
      s"sketch keys $nKeys must join rollup keys $relKeys")

    // partition-spec evolution between computes forces the full path
    t.addPartitionField("u11")
    t.append(spark, Seq((5000L, 0, "s1", "u1")).toDF("id", "p", "s40", "u11")
      .select(col("id"), col("p"), col("s40"), col("u11")))
    val r4 = t.computePartitionStats(spark, Seq("id", "s40"))
    assert(t.partitionStats.exists(_._2 == "full"),
      "spec change must force the full path")
    assert(r4.forall(_._1.startsWith("p=")), s"new spec keys: ${r4.take(3)}")
  }

  test("@partition_stats attributes UNSCOPED positional/DV debt per " +
      "partition via the referenced data files (ADVICE r13)") {
    val base = spark
    import base.implicits._

    // v3 partitioned table: deletion vectors are written UNSCOPED —
    // the relation must attribute their debt to the partitions whose
    // data files they reference, never read 0
    val t = SnapshotTable.at(
      Files.createTempDirectory("graft-pstats-dv-").toString + "/t")
    t.createOrReplace(
      (1 to 300).map(i => (i.toLong, i % 3, s"r$i")).toDF("id", "p", "v"),
      Seq("p"), properties = Map("format-version" -> "3"))
    // kill ids ≡ 0 mod 6 → all live in partition p=0 (id%3==0)
    t.deleteWherePositional(spark, col("id") % 6 === 0L)
    assert(t.currentManifest.deleteFiles.exists(d =>
      d.dv && d.partition.isEmpty), "the fixture needs unscoped DV debt")
    val rel = t.partitionStatsRelation(spark).collect().map(r =>
      r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(rel("p=0")._2 == 50L,
      s"50 dead ordinals must attribute to p=0: $rel")
    assert(rel("p=0")._1 >= 1L, s"delete file count under p=0: $rel")
    assert(rel("p=1") == ((0L, 0L)) && rel("p=2") == ((0L, 0L)),
      s"untouched partitions carry no positional debt: $rel")

    // v2 positional tombstones on a partitioned table: same attribution
    val v2 = SnapshotTable.at(
      Files.createTempDirectory("graft-pstats-v2pos-").toString + "/t")
    v2.createOrReplace(
      (1 to 200).map(i => (i.toLong, i % 2, s"r$i")).toDF("id", "p", "v"),
      Seq("p"))
    v2.deleteWherePositional(spark, col("id") % 4 === 1L) // p=1 only
    val rel2 = v2.partitionStatsRelation(spark).collect().map(r =>
      r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(rel2("p=1")._2 == 50L && rel2("p=0") == ((0L, 0L)),
      s"v2 tombstones must attribute to p=1 only: $rel2")

    // a partition with BOTH scoped equality debt and unscoped DV debt
    // sums the two censuses (MoR merge writes scoped equality deletes)
    val both = SnapshotTable.at(
      Files.createTempDirectory("graft-pstats-both-").toString + "/t")
    both.createOrReplace(
      (1 to 100).map(i => (i.toLong, i % 2, s"r$i")).toDF("id", "p", "v"),
      Seq("p"), properties = Map("format-version" -> "3"))
    both.mergeMoR(spark,
      Seq((2L, 0, "upd", "U")).toDF("id", "p", "v", "op"), Seq("id"),
      keepDeletes = false)
    both.deleteWherePositional(spark, col("id") === 4L)
    val rel3 = both.partitionStatsRelation(spark).collect().map(r =>
      r.getString(0) -> ((r.getLong(5), r.getLong(7)))).toMap
    assert(rel3("p=0")._1 >= 1L,
      s"positional debt must surface under p=0: $rel3")
    assert(rel3.valuesIterator.map(_._2).sum >= 1L,
      s"equality debt must still render: $rel3")
  }

  test("CALL compute_table_stats + column subset + unknown column refuses") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-stats-call-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 200).map(i => (i.toLong, i % 11))
      .toDF("id", "m11"))
    val callRows = spark.sql(
      s"CALL graft.system.compute_table_stats(table => '$root', " +
        "columns => 'm11')").collect()
    assert(callRows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("m11" -> 11L), "the CALL returns (column_name, ndv) rows")
    val st = t.tableStats.get
    assert(st._3 == Map("m11" -> 11L), s"subset stats: $st")
    // widening the requested set past the stored one forces full
    t.append(spark, Seq((201L, 3)).toDF("id", "m11"))
    val all = t.computeTableStats(spark)
    assert(t.tableStats.exists(_._2 == "full") && close(all("id"), 201))
    intercept[IllegalArgumentException] {
      t.computeTableStats(spark, Seq("ghost"))
    }
    // stats name is reserved for the relation suffix now
    intercept[IllegalArgumentException] { t.tag("stats") }
  }

  test("nulls are excluded; empty table stores zero NDV") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-stats-null-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 100)
      .map(i => (i.toLong, if (i % 2 == 0) Some(i % 5) else None))
      .toDF("id", "maybe"))
    val ndv = t.computeTableStats(spark, Seq("maybe"))
    assert(ndv("maybe") == 5L, s"nulls must not count: $ndv")

    val empty = Files.createTempDirectory("graft-stats-empty-").toString
    val te = SnapshotTable.at(empty)
    te.createOrReplace((1 to 1).map(i => (i.toLong, "x")).toDF("id", "s")
      .filter(col("id") < 0))
    assert(te.computeTableStats(spark) == Map("id" -> 0L, "s" -> 0L))
  }
}
