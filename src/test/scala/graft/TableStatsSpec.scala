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
