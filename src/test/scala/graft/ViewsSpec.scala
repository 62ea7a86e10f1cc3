package graft

import java.nio.file.Files

import graft.table.{SnapshotTable, ViewStore}

/** Iceberg-analog VIEW surface: versioned stored metadata, SQL
  * re-resolved per read (a view tracks table changes), REPLACE
  * versioning, SHOW VIEWS, refusals, and non-interference with Spark's
  * own temp-view DDL.
  */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  test("view lifecycle: create → read → replace (versioned) → drop") {
    val dir = Files.createTempDirectory("graft-views-").toString
    val tblRoot = s"$dir/base"
    val t = SnapshotTable.at(tblRoot)
    t.createOrReplace((1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "p"))
    val vPath = s"$dir/v_even"
    spark.sql(s"CREATE VIEW graft.`$vPath` AS " +
      s"SELECT id, p FROM graft.`$tblRoot` WHERE id % 2 = 0")
    def n(path: String): Long =
      spark.sql(s"SELECT count(*) AS n FROM graft.`$path`").head.getLong(0)
    assert(n(vPath) == 50)
    // SQL-representation semantics: the view tracks TABLE changes
    t.append(spark, Seq((101L, 0), (102L, 0)).toDF("id", "p"))
    assert(n(vPath) == 51)
    // CREATE on an existing view refuses; IF NOT EXISTS no-ops
    val e1 = intercept[Exception](spark.sql(
      s"CREATE VIEW graft.`$vPath` AS SELECT 1 AS x"))
    assert(e1.getMessage.contains("already exists"))
    spark.sql(s"CREATE VIEW IF NOT EXISTS graft.`$vPath` AS SELECT 1 AS x")
    assert(n(vPath) == 51, "IF NOT EXISTS must not replace the definition")
    // REPLACE writes version 2 and keeps version 1 on disk (versioned
    // view metadata — the Iceberg view-spec shape)
    spark.sql(s"CREATE OR REPLACE VIEW graft.`$vPath` AS " +
      s"SELECT id FROM graft.`$tblRoot` WHERE id % 2 = 1")
    assert(ViewStore.currentVersion(vPath) == 2L)
    assert(ViewStore.versions(vPath) == Seq(1L, 2L))
    assert(ViewStore.sqlAt(vPath, 1L).contains("% 2 = 0"))
    assert(n(vPath) == 51) // 1..102 odd
    // SHOW VIEWS lists (view_name, current_version)
    val rows = spark.sql(s"SHOW VIEWS IN graft.`$dir`").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("v_even", 2L)))
    // @v<n> time-travels the VIEW METADATA: the archived definition
    // re-parses against CURRENT table state (views version their SQL,
    // not the data — the Iceberg view-spec model), so v1's even-keys
    // definition sees the appended rows too
    assert(n(s"$vPath@v1") == 51, "v1 = the even-keys definition")
    assert(n(s"$vPath@v2") == 51) // current (odd keys over 1..102)
    assert(spark.sql(s"SELECT * FROM graft.`$vPath@v1`")
      .columns.toSeq == Seq("id", "p"), "v1's projection, not v2's")
    intercept[Exception](spark.sql(s"SELECT * FROM graft.`$vPath@v9`"))
    // a view over a view resolves transitively in the same session
    val vTop = s"$dir/v_top"
    spark.sql(s"CREATE VIEW graft.`$vTop` AS " +
      s"SELECT count(*) AS n FROM graft.`$vPath`")
    assert(spark.sql(s"SELECT n FROM graft.`$vTop`").head.getLong(0) == 51)
    // DROP VIEW; IF EXISTS no-ops; a second plain drop refuses
    spark.sql(s"DROP VIEW graft.`$vTop`")
    intercept[Exception](spark.sql(s"SELECT * FROM graft.`$vTop`"))
    spark.sql(s"DROP VIEW IF EXISTS graft.`$vTop`")
    val e2 = intercept[Exception](spark.sql(s"DROP VIEW graft.`$vTop`"))
    assert(e2.getMessage.contains("no view"))
    // one path, one identity: a view cannot shadow an existing TABLE
    val e3 = intercept[Exception](spark.sql(
      s"CREATE VIEW graft.`$tblRoot` AS SELECT 1 AS x"))
    assert(e3.getMessage.contains("TABLE"))
    // an unparsable definition refuses at CREATE, not at first read
    intercept[Exception](spark.sql(
      s"CREATE VIEW graft.`$dir/v_bad` AS SELEKT nonsense"))
    assert(!ViewStore.exists(s"$dir/v_bad"))
    // a definition that PARSES but is a COMMAND refuses: graft
    // statements execute during analysis, so a stored `AS DROP TABLE`
    // would drop the table on EVERY read of the view (r10 ADVICE)
    for (bad <- Seq(
        s"DROP TABLE graft.`$tblRoot`",
        s"CALL graft.system.expire_snapshots(table => '$tblRoot')",
        s"DELETE FROM graft.`$tblRoot` WHERE id = 1",
        s"CREATE TABLE graft.`$dir/ctas` AS SELECT 1 AS x",
        s"ALTER TABLE graft.`$tblRoot` WRITE ORDERED BY id")) {
      val e = intercept[Exception](spark.sql(
        s"CREATE VIEW graft.`$dir/v_cmd` AS $bad"))
      assert(e.getMessage.contains("must be a query"), s"for: $bad → $e")
      assert(!ViewStore.exists(s"$dir/v_cmd"))
    }
    assert(SnapshotTable.at(tblRoot).exists,
      "the refused definitions must not have executed their side effects")
    // Spark's own temp-view DDL delegates untouched
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_tmp_v AS SELECT 7 AS x")
    assert(spark.sql("SELECT x FROM graft_tmp_v").head.getInt(0) == 7)
    spark.sql("DROP VIEW graft_tmp_v")
  }

  test("views resolve through the NAMED catalog: DDL, reads, SHOW CREATE") {
    val wh = Files.createTempDirectory("graft-views-wh-").toString
    spark.conf.set("spark.sql.catalog.vcat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vcat.warehouse", wh)
    try {
      val t = SnapshotTable.at(s"$wh/db/base")
      t.createOrReplace((1 to 60).map(i => (i.toLong, i % 3)).toDF("id", "p"))
      // CREATE via the named spelling; READ via both name and path
      spark.sql("CREATE VIEW vcat.db.v_small AS " +
        "SELECT id FROM vcat.db.base WHERE id <= 10")
      assert(ViewStore.exists(s"$wh/db/v_small"),
        "the named ident must map through the warehouse")
      def n(ident: String): Long =
        spark.sql(s"SELECT count(*) AS n FROM $ident").head.getLong(0)
      assert(n("vcat.db.v_small") == 10)
      assert(n(s"graft.`$wh/db/v_small`") == 10, "path spelling = same view")
      // ALTER VIEW replaces the definition as the NEXT stored version
      spark.sql("ALTER VIEW vcat.db.v_small AS " +
        "SELECT id FROM vcat.db.base WHERE id <= 20")
      assert(n("vcat.db.v_small") == 20)
      assert(ViewStore.versions(s"$wh/db/v_small") == Seq(1L, 2L))
      // ALTER VIEW on a missing view refuses (CREATE is the spelling)
      val eAlter = intercept[Exception](spark.sql(
        "ALTER VIEW vcat.db.v_none AS SELECT 1 AS x"))
      assert(eAlter.getMessage.contains("no view"))
      // SHOW VIEWS through the named namespace
      val shown = spark.sql("SHOW VIEWS IN vcat.db").collect()
      assert(shown.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("v_small", 2L)))
      // SHOW CREATE VIEW emits the stored definition; SHOW CREATE TABLE
      // on a view answers the same way (Spark's own behavior for views)
      val stmt = spark.sql("SHOW CREATE VIEW vcat.db.v_small")
        .head.getString(0)
      assert(stmt.contains("CREATE VIEW") && stmt.contains("id <= 20"), stmt)
      val stmt2 = spark.sql("SHOW CREATE TABLE vcat.db.v_small")
        .head.getString(0)
      assert(stmt2.contains("id <= 20"), stmt2)
      // session-catalog view DDL still delegates (head not a graft cat)
      intercept[Exception](spark.sql(
        "ALTER VIEW nosuch_db.nosuch_view AS SELECT 1 AS x"))
      // DESCRIBE a view: columns come from analyzing the stored
      // definition (so they track the CURRENT table), extended adds the
      // view block
      val desc = spark.sql("DESCRIBE vcat.db.v_small").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(desc.toSeq == Seq(("id", "bigint")), desc.mkString(","))
      val ext = spark.sql("DESCRIBE EXTENDED vcat.db.v_small").collect()
        .map(_.getString(0))
      assert(ext.contains("Current Version") && ext.contains("id"))
      // DROP via the named spelling
      spark.sql("DROP VIEW vcat.db.v_small")
      assert(!ViewStore.exists(s"$wh/db/v_small"))
    } finally {
      spark.conf.unset("spark.sql.catalog.vcat")
      spark.conf.unset("spark.sql.catalog.vcat.warehouse")
    }
  }

  test("view docs claim with O_EXCL; DROP leaves foreign dir content") {
    val dir = Files.createTempDirectory("graft-views2-").toString
    val vPath = s"$dir/v"
    // a pre-existing unrelated file in the view's directory
    Files.createDirectories(java.nio.file.Paths.get(vPath))
    Files.write(java.nio.file.Paths.get(s"$vPath/unrelated.txt"),
      "keep".getBytes)
    spark.sql(s"CREATE VIEW graft.`$vPath` AS SELECT 1 AS x")
    // simulate a crashed replace: an unreferenced v2 doc already on disk
    // — the next create must SKIP past it (O_EXCL), never truncate it
    val ghost = java.nio.file.Paths.get(s"$vPath/view/v2.json")
    Files.write(ghost, """{"version":2,"timestampMs":1,"sql":"SELECT 9 AS x"}"""
      .getBytes)
    spark.sql(s"CREATE OR REPLACE VIEW graft.`$vPath` AS SELECT 3 AS x")
    assert(ViewStore.currentVersion(vPath) == 3L,
      "the create must bump past the ghost doc, not overwrite it")
    assert(new String(Files.readAllBytes(ghost)).contains("SELECT 9"),
      "the ghost doc's content must survive untouched")
    assert(spark.sql(s"SELECT x FROM graft.`$vPath`").head.getInt(0) == 3)
    // exclusivity holds in BOTH directions: a table cannot be born at a
    // view path (it would silently shadow the view on every read)
    val eShadow = intercept[Exception] {
      SnapshotTable.at(vPath).createOrReplace(Seq((1L, "a")).toDF("id", "s"))
    }
    assert(eShadow.getMessage.contains("VIEW"))
    // DROP removes the view but leaves the foreign file (and the dir)
    spark.sql(s"DROP VIEW graft.`$vPath`")
    assert(!ViewStore.exists(vPath))
    assert(Files.exists(java.nio.file.Paths.get(s"$vPath/unrelated.txt")),
      "DROP VIEW must not destroy unrelated directory content")
  }
}
