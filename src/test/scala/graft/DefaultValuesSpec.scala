package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Iceberg v3 COLUMN DEFAULT VALUES: initial-default fills pre-add rows
  * at read (fixed forever at add time), write-default fills INSERTs that
  * omit the column (mutable via ALTER COLUMN SET/DROP DEFAULT), explicit
  * NULLs written after the add stay NULL, and rewrites materialize the
  * fill physically.
  */
class DefaultValuesSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-def-$tag-").toString + "/t"

  private def mkDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, s"r$i")).toDF("id", "v")
  }

  test("initial default fills pre-add rows; post-add NULLs stay NULL") {
    val t = SnapshotTable.at(freshRoot("init"))
    t.createOrReplace(mkDf(0L until 10L)) // v1: no 'score'
    spark.sql(s"ALTER TABLE graft.`${t.root}` " +
      "ADD COLUMNS (score BIGINT DEFAULT 42)") // v2
    // post-add append with an EXPLICIT null and an explicit value
    import spark.implicits._
    t.append(spark, Seq((100L, "x", Some(7L)), (101L, "y", None))
      .toDF("id", "v", "score")) // v3
    val got = t.read(spark).select("id", "score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    (0L until 10L).foreach(id => assert(got(id).contains(42L),
      s"pre-add row $id must read the initial default, got ${got(id)}"))
    assert(got(100L).contains(7L))
    assert(got(101L).isEmpty, "an explicit post-add NULL stays NULL")
    // SQL WHERE over the defaulted value finds the pre-add rows
    val n = spark.sql(
      s"SELECT count(*) AS n FROM graft.`${t.root}` WHERE score = 42")
      .head.getLong(0)
    assert(n == 10L)
  }

  test("write default fills omitted INSERT columns; SET/DROP DEFAULT mutate it only") {
    val t = SnapshotTable.at(freshRoot("write"))
    t.createOrReplace(mkDf(0L until 3L))
    spark.sql(s"ALTER TABLE graft.`${t.root}` " +
      "ADD COLUMNS (tier STRING DEFAULT 'bronze')")
    spark.sql(s"INSERT INTO graft.`${t.root}` (id, v) VALUES (10, 'a')")
    spark.sql(s"ALTER TABLE graft.`${t.root}` " +
      "ALTER COLUMN tier SET DEFAULT 'gold'")
    spark.sql(s"INSERT INTO graft.`${t.root}` (id, v) VALUES (11, 'b')")
    spark.sql(s"ALTER TABLE graft.`${t.root}` ALTER COLUMN tier DROP DEFAULT")
    spark.sql(s"INSERT INTO graft.`${t.root}` (id, v) VALUES (12, 'c')")
    val got = t.read(spark).select("id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    (0L until 3L).foreach(id => assert(got(id).contains("bronze"),
      "the INITIAL default must not move when the write default does"))
    assert(got(10L).contains("bronze"))
    assert(got(11L).contains("gold"))
    assert(got(12L).isEmpty, "after DROP DEFAULT an omitted column is NULL")
  }

  test("rewrites materialize the fill; defaults survive compaction") {
    val t = SnapshotTable.at(freshRoot("compact"))
    t.createOrReplace(mkDf(0L until 8L))
    t.addColumns(
      Seq(org.apache.spark.sql.types.StructField("flag",
        org.apache.spark.sql.types.IntegerType)),
      defaults = Map("flag" -> "5"))
    t.append(spark, {
      import spark.implicits._
      Seq((50L, "z", 9)).toDF("id", "v", "flag")
    })
    t.compact(spark)
    val got = t.read(spark).select("id", "flag").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 8L).foreach(id => assert(got(id) == 5))
    assert(got(50L) == 9)
    // after compaction the fill is PHYSICAL: the raw files answer without
    // any default machinery
    val m = t.currentManifest
    val raw = spark.read
      .parquet(m.files.map(f => t.root.resolve(f.path).toString): _*)
    assert(raw.filter(col("flag").isNull).count() == 0)
  }

  test("garbage defaults refuse loudly; engine properties are fenced") {
    val t = SnapshotTable.at(freshRoot("refuse"))
    t.createOrReplace(mkDf(0L until 3L))
    intercept[Exception] {
      t.addColumns(
        Seq(org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)),
        defaults = Map("x" -> "rand()"))
    }
    intercept[Exception] {
      t.addColumns(
        Seq(org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)),
        defaults = Map("y" -> "1")) // not among the added columns
    }
    intercept[Exception] {
      t.setProperties(Map("graft.default.initial.v" -> "v1:'hack'"))
    }
    intercept[Exception] {
      t.setWriteDefault("nope", Some("1"))
    }
  }
}
