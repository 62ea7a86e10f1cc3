package graft

import java.nio.file.Files

import graft.table.{SnapshotTable, ViewStore}

/** `ALTER TABLE/VIEW ... RENAME TO` over graft identifiers: the V2 path
  * resolves through the deliberately-unserved loadTable, so the DML
  * rule claims it — the rename is the directory move (snapshots, refs
  * and view versions travel whole), destination exclusivity is
  * enforced against BOTH identities, and non-graft identifiers
  * delegate to Spark untouched.
  */
class RenameTableSpec extends SparkSpec {
  import spark.implicits._

  test("table and view RENAME TO: named + path spellings, refusals") {
    val wh = Files.createTempDirectory("graft-rnm-wh-").toString
    spark.conf.set("spark.sql.catalog.rncat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rncat.warehouse", wh)
    try {
      val t1 = SnapshotTable.at(s"$wh/db/t1")
      t1.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
      t1.tag("keep", 1L)
      // named spelling; the catalog part on the destination is optional
      spark.sql("ALTER TABLE rncat.db.t1 RENAME TO db.t2")
      assert(!SnapshotTable.at(s"$wh/db/t1").exists)
      val t2 = SnapshotTable.at(s"$wh/db/t2")
      assert(t2.exists && t2.tags.contains("keep"),
        "snapshots and refs must travel with the directory")
      assert(spark.sql("SELECT count(*) AS n FROM rncat.db.t2")
        .head.getLong(0) == 2)
      // path-literal spelling
      val base = Files.createTempDirectory("graft-rnm-").toString
      SnapshotTable.at(s"$base/a").createOrReplace(Seq((9L, "z")).toDF("id", "s"))
      spark.sql(s"ALTER TABLE graft.`$base/a` RENAME TO graft.`$base/b`")
      assert(!SnapshotTable.at(s"$base/a").exists &&
        SnapshotTable.at(s"$base/b").exists)
      assert(spark.sql(s"SELECT id FROM graft.`$base/b`").head.getLong(0) == 9L)
      // occupied destination refuses — table AND view identities
      SnapshotTable.at(s"$base/c").createOrReplace(Seq((1L, "x")).toDF("id", "s"))
      val e1 = intercept[Exception](spark.sql(
        s"ALTER TABLE graft.`$base/b` RENAME TO graft.`$base/c`"))
      assert(e1.getMessage.contains("already holds"))
      spark.sql(s"CREATE VIEW graft.`$base/v` AS SELECT 1 AS x")
      val e2 = intercept[Exception](spark.sql(
        s"ALTER TABLE graft.`$base/b` RENAME TO graft.`$base/v`"))
      assert(e2.getMessage.contains("already holds"))
      // VIEW rename moves the version store; reads follow
      spark.sql(s"ALTER VIEW graft.`$base/v` RENAME TO graft.`$base/v2`")
      assert(!ViewStore.exists(s"$base/v") && ViewStore.exists(s"$base/v2"))
      assert(spark.sql(s"SELECT x FROM graft.`$base/v2`").head.getInt(0) == 1)
      // a session-catalog temp view rename still delegates to Spark
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_rnm_tmp AS SELECT 5 AS x")
      spark.sql("ALTER VIEW graft_rnm_tmp RENAME TO graft_rnm_tmp2")
      assert(spark.sql("SELECT x FROM graft_rnm_tmp2").head.getInt(0) == 5)
      spark.sql("DROP VIEW graft_rnm_tmp2")
    } finally {
      spark.conf.unset("spark.sql.catalog.rncat")
      spark.conf.unset("spark.sql.catalog.rncat.warehouse")
    }
  }
}
