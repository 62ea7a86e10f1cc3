package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.table.SnapshotTable

/** GraftExtensions must give a session built with ONLY
  * `withExtensions(new GraftExtensions)` (the code-free
  * `spark.sql.extensions` deployment) the whole SQL surface: `graft_*`
  * functions and `graft`.`/path`-style table identifiers, including
  * MoR delete resolution on the read path.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions session resolves graft functions and path relations") {
    val base = spark // materialize the shared context first
    import base.implicits._

    val root = Files.createTempDirectory("graft-ext-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 20).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    // a MoR merge leaves pending equality deletes — the SQL read must
    // sequence-resolve them, not just list files
    tbl.mergeMoR(base,
      Seq((5L, "S5", "U"), (99L, "S99", "I")).toDF("id", "s", "op"),
      Seq("id"), keepDeletes = false)
    assert(tbl.currentManifest.deleteFiles.nonEmpty)

    // fresh session on the same context, extensions only (no Registry call)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base)
      val out = s2.sql(
        s"SELECT id, s, graft_bucket(id, 4) AS b FROM graft.`$root`")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
        .toMap
      assert(out.size == 21)
      assert(out(5L)._1 == "S5") // update applied via delete resolution
      assert(out(99L)._1 == "S99") // insert present
      assert(out(1L)._1 == "s1")
      // function value matches the DataFrame-side expression in the base session
      val expected = graft.functions.Bucket.bucket(1L, 4)
      assert(out(1L)._2 == expected)
      // @-suffixes: version time travel + metadata relations through SQL
      assert(s2.sql(s"SELECT count(*) AS c FROM graft.`$root@v1`")
        .head.getLong(0) == 20)
      val hist = s2.sql(
        s"SELECT version, is_current FROM graft.`$root@history` ORDER BY version")
        .collect()
      assert(hist.length == 2 && hist.last.getBoolean(1))
      assert(s2.sql(s"SELECT count(*) AS c FROM graft.`$root@files`")
        .head.getLong(0) == tbl.currentManifest.files.size)
      // a graft-database identifier over a NON-table path falls through
      // to the normal resolver (and therefore fails as table-not-found)
      intercept[Exception] {
        s2.sql("SELECT * FROM graft.`/definitely/not/a/table`").collect()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("SQL DML: MERGE INTO, UPDATE, DELETE execute through the engine") {
    val base = spark
    import base.implicits._

    val root = Files.createTempDirectory("graft-dml-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(
      (1 to 20).map(i => (i.toLong, s"s$i", 1.0)).toDF("id", "s", "v"))

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits.{localSeqToDatasetHolder => s2Seq}
      // reference-shape MERGE: op-column change set, the three clauses of
      // common/iceberg.py:237-244
      s2Seq(Seq((5L, "S5", 2.0, "U"), (6L, "x", 0.0, "D"), (99L, "S99", 9.0, "I")))
        .toDF("id", "s", "v", "op").createOrReplaceTempView("changes")
      s2.sql(
        s"""MERGE INTO graft.`$root` t USING changes s ON t.id = s.id
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val afterMerge = s2.sql(s"SELECT id, s FROM graft.`$root`")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(afterMerge.size == 20) // 20 - 1 delete + 1 insert
      assert(afterMerge(5L) == "S5")
      assert(!afterMerge.contains(6L))
      assert(afterMerge(99L) == "S99")

      // upsert-shape MERGE (no op column in the source)
      s2Seq(Seq((7L, "S7", 3.0), (100L, "S100", 3.0))).toDF("id", "s", "v")
        .createOrReplaceTempView("ups")
      s2.sql(
        s"""MERGE INTO graft.`$root` t USING ups s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val afterUpsert = s2.sql(s"SELECT id, s FROM graft.`$root`")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(afterUpsert.size == 21)
      assert(afterUpsert(7L) == "S7" && afterUpsert(100L) == "S100")

      // UPDATE: simultaneous assignment against pre-update values
      s2.sql(s"UPDATE graft.`$root` SET v = v + 10.0, s = concat(s, '!') " +
        "WHERE id <= 3")
      val afterUpdate = s2.sql(s"SELECT id, s, v FROM graft.`$root`")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
        .toMap
      assert(afterUpdate(1L) == (("s1!", 11.0)))
      assert(afterUpdate(3L) == (("s3!", 11.0)))
      assert(afterUpdate(4L)._1 == "s4")

      // DELETE with predicate
      s2.sql(s"DELETE FROM graft.`$root` WHERE id > 90")
      val ids = s2.sql(s"SELECT id FROM graft.`$root`")
        .collect().map(_.getLong(0)).toSet
      assert(!ids.exists(_ > 90) && ids.size == 19)

      // INSERT INTO appends through the engine: new file added, every
      // live file carried by reference, nothing rewritten
      val filesBeforeIns = tbl.currentManifest.files.map(_.path).toSet
      s2.sql(s"INSERT INTO graft.`$root` VALUES (300, 'i300', 1.0)")
      assert(filesBeforeIns.subsetOf(tbl.currentManifest.files.map(_.path).toSet),
        "append must carry all live files by reference")
      assert(s2.sql(s"SELECT s FROM graft.`$root` WHERE id = 300")
        .head.getString(0) == "i300")
      // explicit column list: omitted columns null-fill (standard SQL)
      s2.sql(s"INSERT INTO graft.`$root` (id, s) VALUES (301, 'i301')")
      val r301 = s2.sql(s"SELECT v FROM graft.`$root` WHERE id = 301").head
      assert(r301.isNullAt(0))
      // arity mismatch and unknown columns stay loud
      val eIns = intercept[Exception] {
        s2.sql(s"INSERT INTO graft.`$root` VALUES (1, 'x')")
      }
      assert(eIns.getMessage.contains("INSERT"))
      val eIns2 = intercept[Exception] {
        s2.sql(s"INSERT INTO graft.`$root` (id, nope, v) VALUES (1, 'x', 1.0)")
      }
      assert(eIns2.getMessage.contains("nope"))
      // clean up the appended rows so later assertions keep their counts
      s2.sql(s"DELETE FROM graft.`$root` WHERE id >= 300")

      // DML through a time-travel suffix is rejected loudly
      val e2 = intercept[Exception] {
        s2.sql(s"DELETE FROM graft.`$root@v1` WHERE id = 1")
      }
      assert(e2.getMessage.contains("lineage head"))

      // unsupported MERGE shapes fail loudly, not silently differently
      val e3 = intercept[Exception] {
        s2.sql(
          s"""MERGE INTO graft.`$root` t USING ups s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      }
      assert(e3.getMessage.contains("unsupported MERGE"))

      // WITH SCHEMA EVOLUTION maps to the engine's add-column evolution
      s2Seq(Seq((50L, "S50", 4.0, "extra"))).toDF("id", "s", "v", "note")
        .createOrReplaceTempView("evo")
      s2.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$root` t
           |USING evo s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val evoRows = s2.sql(s"SELECT id, note FROM graft.`$root`").collect()
      assert(evoRows.exists(r => r.getLong(0) == 50L && r.getString(1) == "extra"))
      assert(evoRows.count(_.isNullAt(1)) == evoRows.length - 1,
        "pre-evolution rows null-fill the added column")

      // CTAS: the full SQL lifecycle — create partitioned with recorded
      // transform properties, read back, guard double-create, replace
      val root2 = Files.createTempDirectory("graft-ctas-").toString + "/t"
      s2.sql(
        s"""CREATE TABLE graft.`$root2` PARTITIONED BY (pb)
           |TBLPROPERTIES ('graft.transform.pb' = 'bucket(4,id)')
           |AS SELECT id, s, graft_bucket(id, 4) AS pb FROM graft.`$root`""".stripMargin)
      val ctasTbl = SnapshotTable.at(root2)
      assert(ctasTbl.currentManifest.partitionColumns == Seq("pb"))
      assert(ctasTbl.currentManifest.properties
        .get("graft.transform.pb").contains("bucket(4,id)"))
      assert(s2.sql(s"SELECT count(*) AS c FROM graft.`$root2`").head.getLong(0) ==
        s2.sql(s"SELECT count(*) AS c FROM graft.`$root`").head.getLong(0))
      val e4 = intercept[Exception] {
        s2.sql(s"CREATE TABLE graft.`$root2` AS SELECT 1 AS one")
      }
      assert(e4.getMessage.contains("already exists"))
      s2.sql(s"CREATE TABLE IF NOT EXISTS graft.`$root2` AS SELECT 1 AS one")
      assert(ctasTbl.currentVersion == 1L, "IF NOT EXISTS must be a no-op")
      s2.sql(s"CREATE OR REPLACE TABLE graft.`$root2` AS " +
        s"SELECT id FROM graft.`$root` WHERE id <= 5")
      assert(s2.sql(s"SELECT count(*) AS c FROM graft.`$root2`")
        .head.getLong(0) == 5)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("V2 catalog: named db.table identifiers share the whole SQL surface") {
    val base = spark
    import base.implicits._

    val wh = Files.createTempDirectory("graft-wh-").toString
    // a table created through the Scala API is immediately addressable by
    // name once the catalog points at the warehouse — and vice versa
    val orders = SnapshotTable.at(s"$wh/db1/orders")
    orders.createOrReplace(
      (1 to 20).map(i => (i.toLong, s"s$i", 1.0)).toDF("id", "s", "v"))

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.catalog.graft",
        classOf[graft.catalog.GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", wh)
      .getOrCreate()
    try {
      import s2.implicits.{localSeqToDatasetHolder => s2Seq}
      // name ↔ path parity: same rows through both spellings
      def rows(q: String) = s2.sql(q).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows("SELECT id, s FROM graft.db1.orders ORDER BY id") ==
        rows(s"SELECT id, s FROM graft.`$wh/db1/orders` ORDER BY id"))
      assert(s2.sql(
        "SELECT count(*) AS c FROM graft.db1.orders WHERE id <= 5")
        .head.getLong(0) == 5)

      // the reference-shape MERGE through the NAMED identifier
      s2Seq(Seq((5L, "S5", 2.0, "U"), (6L, "x", 0.0, "D"),
        (99L, "S99", 9.0, "I"))).toDF("id", "s", "v", "op")
        .createOrReplaceTempView("chg")
      s2.sql(
        """MERGE INTO graft.db1.orders t USING chg s ON t.id = s.id
          |WHEN MATCHED AND s.op = 'D' THEN DELETE
          |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val afterMerge = s2.sql("SELECT id, s FROM graft.db1.orders")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(afterMerge.size == 20 && afterMerge(5L) == "S5" &&
        !afterMerge.contains(6L) && afterMerge(99L) == "S99")

      // UPDATE / DELETE / INSERT / time travel by name
      s2.sql("UPDATE graft.db1.orders SET v = v + 10.0 WHERE id = 1")
      s2.sql("DELETE FROM graft.db1.orders WHERE id > 90")
      val before = orders.currentManifest.files.map(_.path).toSet
      s2.sql("INSERT INTO graft.db1.orders VALUES (200, 'n', 1.5)")
      assert(before.subsetOf(orders.currentManifest.files.map(_.path).toSet))
      assert(s2.sql("SELECT count(*) AS c FROM graft.db1.`orders@v1`")
        .head.getLong(0) == 20)

      // CTAS by name into a created namespace
      s2.sql("CREATE NAMESPACE graft.db2")
      s2.sql("CREATE TABLE graft.db2.small AS " +
        "SELECT id FROM graft.db1.orders WHERE id <= 3")
      assert(SnapshotTable.at(s"$wh/db2/small").exists)
      assert(s2.sql("SELECT count(*) AS c FROM graft.db2.small")
        .head.getLong(0) == 3)

      // catalog ops through the plugin
      val nss = s2.sql("SHOW NAMESPACES IN graft").collect()
        .map(_.getString(0)).toSet
      assert(nss == Set("db1", "db2"), s"namespaces: $nss")
      val tbls = s2.sql("SHOW TABLES IN graft.db1").collect()
        .map(_.getString(1)).toSet
      assert(tbls == Set("orders"), s"tables: $tbls")

      // CREATE TABLE (no AS SELECT): empty table with declared schema and
      // identity partitioning, then INSERT lands partitioned rows
      s2.sql("CREATE TABLE graft.db2.fresh (id BIGINT, note STRING, pt INT) " +
        "PARTITIONED BY (pt)")
      val fresh = SnapshotTable.at(s"$wh/db2/fresh")
      assert(fresh.exists && fresh.currentManifest.partitionColumns == Seq("pt"))
      s2.sql("INSERT INTO graft.db2.fresh VALUES (1, 'a', 7), (2, 'b', 8)")
      assert(s2.sql("SELECT count(*) AS c FROM graft.db2.fresh WHERE pt = 7")
        .head.getLong(0) == 1)
      assert(fresh.currentManifest.files.forall(_.partition.contains("pt")))

      // DESCRIBE answers from the manifest (named and path spellings):
      // columns, the partition block, and (EXTENDED) location/provider
      val desc = s2.sql("DESCRIBE TABLE graft.db2.fresh").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(desc.take(3).toSeq ==
        Seq(("id", "bigint"), ("note", "string"), ("pt", "int")), desc.toSeq)
      assert(desc.contains(("# Partition Information", "")) &&
        desc.last == (("pt", "int")), desc.toSeq)
      val ext = s2.sql(s"DESCRIBE TABLE EXTENDED graft.`$wh/db2/fresh`")
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      assert(ext("Location") == s"$wh/db2/fresh" && ext("Provider") == "graft")

      // SHOW TBLPROPERTIES answers from the manifest (all / one key)
      s2.sql("CREATE TABLE graft.db2.p2 TBLPROPERTIES ('a'='1','b'='2') AS " +
        "SELECT id FROM graft.db1.orders WHERE id <= 2")
      val shown = s2.sql("SHOW TBLPROPERTIES graft.db2.p2").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(shown.get("a").contains("1") && shown.get("b").contains("2"), shown)
      assert(s2.sql("SHOW TBLPROPERTIES graft.db2.p2 ('b')").head.getString(1)
        == "2")
      s2.sql("DROP TABLE graft.db2.p2")

      // DROP TABLE removes the table directory, both spellings; IF EXISTS
      // on a missing table is a no-op
      s2.sql("DROP TABLE graft.db2.small")
      assert(!SnapshotTable.at(s"$wh/db2/small").exists &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$wh/db2/small")))
      s2.sql(s"DROP TABLE graft.`$wh/db2/fresh`")
      assert(!fresh.exists)
      s2.sql("DROP TABLE IF EXISTS graft.db2.small") // no-op, no error
      intercept[Exception] { s2.sql("DROP TABLE graft.db2.small") }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("SQL CALL maintenance procedures route to the engine ops") {
    val base = spark
    import base.implicits._

    val root = Files.createTempDirectory("graft-call-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 40).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    tbl.append(base, Seq((41L, "s41")).toDF("id", "s"))
    tbl.append(base, Seq((42L, "s42")).toDF("id", "s"))
    assert(tbl.manifestVersions.size == 3)

    // expire_snapshots with Iceberg-style named args: older_than is a
    // POINT IN TIME (a future literal ⇒ every non-retained snapshot is
    // old enough), retain_last keeps only the current one
    val expiredRows = base.sql(s"CALL graft.system.expire_snapshots('$root', " +
      "older_than => TIMESTAMP '2031-01-01 00:00:00', retain_last => 1)")
      .collect()
    assert(tbl.manifestVersions.size == 1)
    // row-returning like Iceberg: one row per expired snapshot
    assert(expiredRows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // remove_orphan_files sweeps an aged stray file (positional table arg,
    // default 3-day gate; the mtime is pushed 10 days back)
    val stray = java.nio.file.Paths.get(root, "data", "stray.parquet")
    java.nio.file.Files.createDirectories(stray.getParent)
    java.nio.file.Files.write(stray, "junk".getBytes)
    java.nio.file.Files.setLastModifiedTime(stray,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10L * 24 * 3600 * 1000))
    // dry_run (Iceberg's audit argument) reports the same rows WITHOUT
    // deleting anything
    val dryRows = base.sql(s"CALL graft.system.remove_orphan_files(" +
      s"'$root', dry_run => true)").collect()
    assert(java.nio.file.Files.exists(stray), "dry_run must not delete")
    assert(dryRows.exists(_.getString(0).endsWith("stray.parquet")))
    val orphanRows =
      base.sql(s"CALL graft.system.remove_orphan_files('$root')").collect()
    assert(!java.nio.file.Files.exists(stray))
    assert(orphanRows.exists(_.getString(0).endsWith("stray.parquet")),
      s"reclaimed paths returned as rows: ${orphanRows.mkString(",")}")

    // rewrite_data_files bin-packs the small commits into one file
    assert(tbl.currentManifest.files.size > 1)
    base.sql(s"CALL graft.system.rewrite_data_files('$root')")
    assert(tbl.currentManifest.files.size == 1)
    assert(tbl.read(base).count() == 42)


    // the registered-catalog spelling takes 'db.table' like the reference
    val wh = Files.createTempDirectory("graft-callwh-").toString
    base.conf.set("spark.sql.catalog.graft_callwh",
      classOf[graft.catalog.GraftCatalog].getName)
    base.conf.set("spark.sql.catalog.graft_callwh.warehouse", wh)
    val named = SnapshotTable.at(s"$wh/db1/t1")
    named.createOrReplace((1 to 5).map(i => (i.toLong, i * 2)).toDF("id", "v"))
    named.append(base, Seq((6L, 12)).toDF("id", "v"))
    base.sql("CALL graft_callwh.system.rewrite_data_files('db1.t1')")
    assert(named.currentManifest.files.size == 1 &&
      named.read(base).count() == 6)

    // snapshot-management procedures: tag lifecycle + rollback
    val preTag = tbl.currentVersion
    base.sql(s"CALL graft.system.create_tag('$root', 'rel-1')")
    assert(tbl.tags == Map("rel-1" -> preTag))
    tbl.append(base, Seq((43L, "s43")).toDF("id", "s"))
    base.sql(s"CALL graft.system.rollback_to_snapshot('$root', $preTag)")
    assert(tbl.currentVersion == preTag && tbl.read(base).count() == 42)
    base.sql(s"CALL graft.system.drop_tag('$root', 'rel-1')")
    assert(tbl.tags.isEmpty)
    // branch procedures: create → fast_forward → drop (the full WAP
    // lifecycle through SQL is q79's query)
    base.sql(s"CALL graft.system.create_branch('$root', 'wap')")
    tbl.atBranch("wap").append(base, Seq((44L, "s44")).toDF("id", "s"))
    assert(tbl.read(base).count() == 42) // main isolated
    base.sql(s"CALL graft.system.fast_forward('$root', 'wap')")
    assert(tbl.read(base).count() == 43)
    base.sql(s"CALL graft.system.drop_branch('$root', 'wap')")
    assert(tbl.branches.isEmpty)

    // Iceberg table-property defaults drive argless maintenance calls:
    // history.expire.* feed expire_snapshots, and the aged snapshots
    // come back as rows
    tbl.append(base, Seq((43L, "s43")).toDF("id", "s"))
    tbl.append(base, Seq((44L, "s44")).toDF("id", "s"))
    tbl.setProperties(Map(
      "history.expire.max-snapshot-age-ms" -> "1",
      "history.expire.min-snapshots-to-keep" -> "2"))
    val before = tbl.manifestVersions.sorted
    val aged = base.sql(s"CALL graft.system.expire_snapshots('$root')")
      .collect().map(_.getLong(0)).sorted
    val kept = tbl.manifestVersions.sorted
    assert(kept.size == 2 && kept.last == tbl.currentVersion,
      s"min-snapshots-to-keep=2 must keep current+1 ($before -> $kept)")
    assert(aged.toSeq == before.diff(kept),
      s"expired rows must name the aged snapshots ($aged)")

    // loud failures: unknown procedure, unknown argument, missing table
    val e1 = intercept[UnsupportedOperationException] {
      base.sql(s"CALL graft.system.no_such_proc('$root')")
    }
    assert(e1.getMessage.contains("unknown procedure"))
    val e2 = intercept[UnsupportedOperationException] {
      base.sql(s"CALL graft.system.expire_snapshots('$root', nope => 1)")
    }
    assert(e2.getMessage.contains("unknown argument"))
    intercept[IllegalArgumentException] {
      base.sql("CALL graft.system.expire_snapshots('/no/such/table')")
    }
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES round-trips through SQL") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-props-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 10).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    base.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES (" +
      "'write.graft.compact.delete-ratio' = '0.2', 'team' = 'etl')")
    val props = base.sql(s"SHOW TBLPROPERTIES graft.`$root`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.graft.compact.delete-ratio").contains("0.2"))
    assert(props.get("team").contains("etl"))
    assert(tbl.currentManifest.operation == "properties")
    base.sql(s"ALTER TABLE graft.`$root` UNSET TBLPROPERTIES ('team')")
    assert(!tbl.currentManifest.properties.contains("team"))
    // unknown key without IF EXISTS is loud; with it, a no-op
    intercept[IllegalArgumentException] {
      base.sql(s"ALTER TABLE graft.`$root` UNSET TBLPROPERTIES ('nope')")
    }
    val v = tbl.currentVersion
    base.sql(s"ALTER TABLE graft.`$root` UNSET TBLPROPERTIES IF EXISTS ('nope')")
    assert(tbl.currentVersion == v)
    // engine bookkeeping prefixes are fenced off
    intercept[IllegalArgumentException] {
      base.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES (" +
        "'graft.evolution.x' = 'boom')")
    }
  }

  test("SHOW CREATE TABLE and TRUNCATE TABLE answer from the engine") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-sct-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 30).map(i => (i.toLong, s"p${i % 3}", s"s$i"))
      .toDF("id", "p", "s"), Seq("p"))
    tbl.setProperties(Map("write.graft.sort-order" -> "id"))

    val stmt = base.sql(s"SHOW CREATE TABLE graft.`$root`")
      .head.getString(0)
    assert(stmt.contains("id BIGINT") && stmt.contains("s STRING"))
    assert(stmt.contains("PARTITIONED BY (p)"))
    assert(stmt.contains("'write.graft.sort-order' = 'id'"))

    val vBefore = tbl.currentVersion
    base.sql(s"TRUNCATE TABLE graft.`$root`")
    assert(base.sql(s"SELECT count(*) AS c FROM graft.`$root`")
      .head.getLong(0) == 0L)
    val m = tbl.currentManifest
    assert(m.partitionColumns == Seq("p") &&
      m.properties.get("write.graft.sort-order").contains("id"),
      "spec and properties must survive a truncate")
    assert(m.operation == "delete")
    // time travel still reaches the pre-truncate rows
    assert(tbl.readVersion(base, vBefore).count() == 30)
  }

  test("CALL create_changelog_view registers the CDC view") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-cdcview-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 30).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    base.sql(s"DELETE FROM graft.`$root` WHERE id <= 5")
    base.sql(s"CALL graft.system.create_changelog_view('$root', " +
      "view => 'cdc_spec_view', from_version => 1)")
    val rows = base.sql("SELECT _change_type, count(*) AS n " +
      "FROM cdc_spec_view GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("delete" -> 5L))
    // the view argument is mandatory — loud failure, not a silent no-op
    val e = intercept[UnsupportedOperationException] {
      base.sql(s"CALL graft.system.create_changelog_view('$root')")
    }
    assert(e.getMessage.contains("view argument"))

    // version boundaries accept tag/branch names; unknown refs are loud
    tbl.tag("baseline", 1L)
    base.sql(s"CALL graft.system.create_changelog_view('$root', " +
      "view => 'cdc_ref_view', from_version => 'baseline')")
    assert(base.sql("SELECT count(*) AS n FROM cdc_ref_view")
      .head.getLong(0) == 5L) // just the v2 delete
    val e2 = intercept[UnsupportedOperationException] {
      base.sql(s"CALL graft.system.create_changelog_view('$root', " +
        "view => 'x', from_version => 'nope')")
    }
    assert(e2.getMessage.contains("no tag or branch"))

    // timestamp boundaries resolve via the main-lineage walk: the table
    // above committed v1 (create) then v2 (delete); re-pin both commits'
    // timestamps through a fresh table so the cutoffs are known
    val root2 = Files.createTempDirectory("graft-cdcview-ts-").toString
    val t2 = SnapshotTable.at(root2)
    t2.createOrReplace((1 to 20).map(i => (i.toLong, s"s$i")).toDF("id", "s"),
      nowMs = 1000000L)
    t2.append(spark, Seq((21L, "x")).toDF("id", "s"), nowMs = 2000000L)
    base.sql(s"CALL graft.system.create_changelog_view('$root2', " +
      "view => 'cdc_ts_view', from_timestamp => 1500000)")
    assert(base.sql("SELECT count(*) AS n FROM cdc_ts_view")
      .head.getLong(0) == 1L, "only the post-cutoff append reports")
    // predating genesis = full history; both-boundary forms refuse
    base.sql(s"CALL graft.system.create_changelog_view('$root2', " +
      "view => 'cdc_ts_all', from_timestamp => 500)")
    assert(base.sql("SELECT count(*) AS n FROM cdc_ts_all")
      .head.getLong(0) == 21L)
    val e3 = intercept[UnsupportedOperationException] {
      base.sql(s"CALL graft.system.create_changelog_view('$root2', " +
        "view => 'x', from_version => 1, from_timestamp => 1500000)")
    }
    assert(e3.getMessage.contains("mutually exclusive"))
    val e4 = intercept[UnsupportedOperationException] {
      base.sql(s"CALL graft.system.create_changelog_view('$root2', " +
        "view => 'x', to_timestamp => 500)")
    }
    assert(e4.getMessage.contains("predates"))
  }

  test("SQL ALTER TABLE ADD/DROP COLUMNS = metadata-only evolution") {
    val base = spark
    import base.implicits._

    val root = Files.createTempDirectory("graft-alter-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 10).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    val before = tbl.currentManifest.files.map(_.path).toSet

    base.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (v DOUBLE, note STRING)")
    // metadata-only: every data file carried by reference
    assert(tbl.currentManifest.files.map(_.path).toSet == before)
    val df = base.sql(s"SELECT * FROM graft.`$root`")
    assert(df.columns.toSeq == Seq("id", "s", "v", "note"))
    assert(df.filter($"v".isNull && $"note".isNull).count() == 10)

    // loud refusals: NOT NULL, existing name
    intercept[UnsupportedOperationException] {
      base.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (x INT NOT NULL)")
    }
    intercept[IllegalArgumentException] {
      base.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (ID INT)")
    }

    base.sql(s"ALTER TABLE graft.`$root` DROP COLUMN s")
    assert(base.sql(s"SELECT * FROM graft.`$root`").columns.toSeq ==
      Seq("id", "v", "note"))
    // IF EXISTS on a missing column no-ops; plain DROP fails loudly
    base.sql(s"ALTER TABLE graft.`$root` DROP COLUMN IF EXISTS nope")
    intercept[IllegalArgumentException] {
      base.sql(s"ALTER TABLE graft.`$root` DROP COLUMN nope")
    }
    // re-adding the dropped name is refused while pre-drop files live
    // (name-based mapping would resurrect the old values)
    val e = intercept[IllegalArgumentException] {
      base.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (s STRING)")
    }
    assert(e.getMessage.contains("resurrect"))

    // the drop tombstone round-trips through SHOW TBLPROPERTIES
    val props = base.sql(s"SHOW TBLPROPERTIES graft.`$root`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.contains("graft.dropped.s"), props)

    // after compaction rewrites every file under the post-drop schema,
    // the re-add is safe and reads NULL (not resurrected values)
    tbl.compact(base)
    base.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (s STRING)")
    assert(base.sql(s"SELECT count(*) AS c FROM graft.`$root` WHERE s IS NULL")
      .head.getLong(0) == 10)
  }

  test("partitioned CTAS accepts the transform vocabulary (hidden partitioning)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft-ctas-tr-").toString
    (1 to 400).map(i => (i.toLong,
        java.time.LocalDateTime.of(2026, 1 + i % 6, 1 + i % 27, i % 24, 0),
        s"v$i"))
      .toDF("id", "ts", "s").createOrReplaceTempView("graft_ctas_tr_src")
    spark.sql(s"CREATE TABLE graft.`$root` " +
      "PARTITIONED BY (bucket(8, id), months(ts)) " +
      "AS SELECT * FROM graft_ctas_tr_src")
    val t = SnapshotTable.at(root)
    val m = t.currentManifest
    assert(m.partitionColumns == Seq("id_bucket", "ts_month"))
    assert(m.properties.get("graft.transform.id_bucket").contains("bucket(8,id)"))
    assert(m.properties.get("graft.transform.ts_month").contains("months(ts)"))
    assert(m.files.forall(f => f.partition.contains("id_bucket") &&
      f.partition("ts_month").matches("2026-0[1-6]")))
    assert(t.read(spark).count() == 400)
    // raw-column predicates prune through both hidden fields
    val (kb, tb) = t.pruneCounts(col("id") === 42L)
    assert(kb < tb)
    val (km, _) = t.pruneCounts(
      col("ts") >= lit(java.time.LocalDateTime.parse("2026-06-01T00:00")))
    assert(km < tb)
    // hidden fields keep deriving on appends (the writer never supplies them)
    t.append(spark, Seq((1000L,
      java.time.LocalDateTime.parse("2026-03-02T10:00"), "x"))
      .toDF("id", "ts", "s"))
    assert(t.read(spark).filter(col("id") === 1000L)
      .select("ts_month").head.getString(0) == "2026-03")
    // bucket over a STRING key is supported (Iceberg Appendix B — the
    // r10 generalization; it used to refuse)
    spark.sql(s"CREATE TABLE graft.`${root}2` PARTITIONED BY (bucket(8, s)) " +
      "AS SELECT * FROM graft_ctas_tr_src")
    val t2 = SnapshotTable.at(s"${root}2")
    assert(t2.currentManifest.properties
      .get("graft.transform.s_bucket").contains("bucket(8,s)"))
    val (ks, ts2) = t2.pruneCounts(col("s") === "v42")
    assert(ks < ts2, "string point predicate must prune through the bucket")
    // a genuinely undefined transform still fails loudly
    intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`${root}3` PARTITIONED BY (days(s)) " +
        "AS SELECT * FROM graft_ctas_tr_src"))
  }

  test("SHOW PARTITIONS lists live partitions, filtered and sorted") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-showpart-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 40).map(i => (i.toLong, i % 3, i % 2)).toDF("id", "p", "q"),
      Seq("p", "q"))
    val rows = spark.sql(s"SHOW PARTITIONS graft.`$root`")
      .collect().map(_.getString(0)).toSeq
    assert(rows == rows.sorted && rows.size == 6 &&
      rows.contains("p=1/q=0"))
    val filtered = spark.sql(
      s"SHOW PARTITIONS graft.`$root` PARTITION (p = 2)")
      .collect().map(_.getString(0)).toSeq
    assert(filtered == Seq("p=2/q=0", "p=2/q=1"))
    // unpartitioned tables refuse, like Spark
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-showpart2-").toString
    SnapshotTable.at(root2)
      .createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    intercept[Exception](spark.sql(s"SHOW PARTITIONS graft.`$root2`").collect())
  }

  test("metadata count(*) falls through under pending MoR deletes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-metacount-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    def leaves(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
    def isMeta(sql: String) = leaves(sql).forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.OneRowRelation] ||
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val q = s"SELECT count(*) AS n FROM graft.`$root`"
    assert(isMeta(q), "clean table: metadata path")
    assert(spark.sql(q).head.getLong(0) == 100L)
    // pending equality deletes: rowCount declines, the scan answers with
    // the sequence-RESOLVED survivor count
    t.mergeMoR(spark,
      Seq((5L, "x", "D"), (6L, "x", "D")).toDF("id", "v", "op"),
      Seq("id"), keepDeletes = false)
    assert(t.currentManifest.deleteFiles.nonEmpty)
    assert(!isMeta(q), "pending deletes: must fall through to the scan")
    assert(spark.sql(q).head.getLong(0) == 98L,
      "fall-through must count the delete-resolved view")
    // compaction folds the deletes: the metadata path returns
    t.compact(spark)
    assert(isMeta(q) && spark.sql(q).head.getLong(0) == 98L)
    // pending POSITIONAL deletes keep the metadata plan: the count
    // subtracts the tombstone census (O(tombstones), not a table scan)
    t.deleteWherePositional(spark,
      org.apache.spark.sql.functions.col("id").isin(10L, 11L, 12L))
    assert(t.currentManifest.deleteFiles.exists(_.positional))
    assert(isMeta(q), "positional deletes must not force the scan plan")
    assert(spark.sql(q).head.getLong(0) == 95L)
    // re-tombstoning an already-masked row must not double-subtract
    t.deleteWherePositional(spark, org.apache.spark.sql.functions
      .col("id").between(10L, 13L)) // 10-12 re-masked, 13 new
    assert(isMeta(q) && spark.sql(q).head.getLong(0) == 94L,
      "distinct (path,pos) census: re-masked rows count once")
    // an equality delete arriving on top still declines everything
    t.mergeMoR(spark, Seq((20L, "x", "D")).toDF("id", "v", "op"),
      Seq("id"), keepDeletes = false)
    assert(!isMeta(q), "mixed pending deletes must fall through")
    assert(spark.sql(q).head.getLong(0) == 93L)
  }

  test("partition-filtered metadata COUNT survives pending positional " +
      "deletes; MIN/MAX still declines") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft-metapcd-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 120).map(i => (i.toLong, i % 3))
      .toDF("id", "p"), Seq("p"))
    def leaves(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
    def isMeta(sql: String) = leaves(sql).forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.OneRowRelation] ||
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val q = s"SELECT count(*) AS n FROM graft.`$root` WHERE p = 1"
    assert(isMeta(q) && spark.sql(q).head.getLong(0) == 40L)
    // mask two rows inside p=1 and one outside: only the in-partition
    // tombstones subtract from the filtered count
    t.deleteWherePositional(spark,
      org.apache.spark.sql.functions.col("id").isin(1L, 4L, 3L)) // 1,4∈p=1; 3∈p=0
    assert(isMeta(q), "positional deletes keep the filtered metadata path")
    assert(spark.sql(q).head.getLong(0) == 38L)
    val mm = s"SELECT max(id) AS m FROM graft.`$root` WHERE p = 1"
    assert(!isMeta(mm),
      "MIN/MAX must decline under pending deletes — a masked row could " +
        "hold the extreme")
    assert(spark.sql(mm).head.getLong(0) == 118L)
  }

  test("metadata min/max answers witnessed extremes, declines unsafe types") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-metamm-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 50).map(i =>
        (i.toLong, java.sql.Date.valueOf(f"2026-01-${i % 28 + 1}%02d"),
          i.toDouble, s"s$i", if (i <= 25) Some(i * 10L) else None))
      .toDF("id", "d", "x", "s", "opt"), Seq())
    t.append(spark, Seq((100L, java.sql.Date.valueOf("2026-03-05"), 1.0,
      "z", None: Option[Long])).toDF("id", "d", "x", "s", "opt"))
    def leaves(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
    def isMeta(sql: String) = leaves(sql).forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.OneRowRelation] ||
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val q = s"SELECT min(id) AS lo, max(id) AS hi, count(*) AS n, " +
      s"max(d) AS dmax, min(opt) AS omin FROM graft.`$root`"
    assert(isMeta(q), "integral/date min-max: metadata path")
    val r = spark.sql(q).head
    assert(r.getLong(0) == 1L && r.getLong(1) == 100L && r.getLong(2) == 51L)
    assert(r.getDate(3).toString == "2026-03-05" && r.getLong(4) == 10L)
    // double column: NaN-unsafe → scan path, same answer as the engine read
    val qd = s"SELECT max(x) AS m FROM graft.`$root`"
    assert(!isMeta(qd), "double max must fall through")
    assert(spark.sql(qd).head.getDouble(0) == 50.0)
    // string column: truncation-unsafe → scan path
    assert(!isMeta(s"SELECT max(s) AS m FROM graft.`$root`"))
    // pending deletes: declines (a masked row could hold the extreme)
    t.mergeMoR(spark, Seq((100L, java.sql.Date.valueOf("2026-03-05"), 1.0,
      "z", null.asInstanceOf[java.lang.Long], "D"))
      .toDF("id", "d", "x", "s", "opt", "op"), Seq("id"), keepDeletes = false)
    val qi = s"SELECT max(id) AS m FROM graft.`$root`"
    assert(!isMeta(qi) && spark.sql(qi).head.getLong(0) == 50L)
    // all-null column answers NULL from metadata
    t.compact(spark)
    val root2 = java.nio.file.Files.createTempDirectory("graft-metamm2-").toString
    SnapshotTable.at(root2).createOrReplace(
      Seq((1L, null.asInstanceOf[java.lang.Long]),
        (2L, null.asInstanceOf[java.lang.Long])).toDF("id", "o"))
    val qn = s"SELECT min(o) AS m FROM graft.`$root2`"
    assert(isMeta(qn) && spark.sql(qn).head.isNullAt(0))
  }

  test("partition-predicate count(*) answers from the manifest") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-metapc-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 120).map(i =>
        (i.toLong, i % 4, if (i % 10 == 0) null else s"g${i % 3}"))
      .toDF("id", "p", "g"), Seq("p", "g"))
    def leaves(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
    def isMeta(sql: String) = leaves(sql).forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.OneRowRelation] ||
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    def check(where: String): Unit = {
      val q = s"SELECT count(*) AS n FROM graft.`$root` WHERE $where"
      assert(isMeta(q), s"expected metadata path for $where")
      val scan = t.read(spark).filter(where).count()
      assert(spark.sql(q).head.getLong(0) == scan, s"wrong count for $where")
    }
    check("p = 2")
    check("p IN (1, 3)")
    check("p >= 1 AND g = 'g1'")
    check("g IS NULL")
    check("g IS NOT NULL OR p = 0")
    check("p = 2 AND g LIKE 'g%'")
    // predicates over data columns fall through to the scan
    val qd = s"SELECT count(*) AS n FROM graft.`$root` WHERE id > 100"
    assert(!isMeta(qd) && spark.sql(qd).head.getLong(0) == 20L)
    // nondeterministic / un-whitelisted shapes fall through
    assert(!isMeta(s"SELECT count(*) AS n FROM graft.`$root` " +
      "WHERE p = CAST(rand() * 4 AS INT)"))
  }

  test("partition-predicate min/max answers witnessed extremes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-metapm-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 120).map(i => (i.toLong, i % 4))
      .toDF("id", "p"), Seq("p"))
    def leaves(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
    def isMeta(sql: String) = leaves(sql).forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.OneRowRelation] ||
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    // data-column extremes under a partition predicate: witnessed from
    // the matching files' footer stats, with scan-parity asserted
    val q1 = s"SELECT min(id) AS lo, max(id) AS hi, count(*) AS n " +
      s"FROM graft.`$root` WHERE p = 2"
    assert(isMeta(q1), "filtered min/max: metadata path")
    val r1 = spark.sql(q1).head
    val ref = t.read(spark).filter("p = 2")
      .agg(org.apache.spark.sql.functions.min("id"),
        org.apache.spark.sql.functions.max("id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).head
    assert(r1.getLong(0) == ref.getLong(0) && r1.getLong(1) == ref.getLong(1)
      && r1.getLong(2) == ref.getLong(2), s"scan parity: $r1 vs $ref")
    // the partition column's own extremes under IN
    val q2 = s"SELECT max(p) AS m FROM graft.`$root` WHERE p IN (0, 1)"
    assert(isMeta(q2) && spark.sql(q2).head.getInt(0) == 1)
    // zero matching partitions: SQL NULL min, zero count
    val q3 = s"SELECT min(id) AS m, count(*) AS n FROM graft.`$root` " +
      "WHERE p = 99"
    assert(isMeta(q3))
    val r3 = spark.sql(q3).head
    assert(r3.isNullAt(0) && r3.getLong(1) == 0L)
    // predicates over data columns still fall through to the scan
    val q4 = s"SELECT max(id) AS m FROM graft.`$root` WHERE id < 50"
    assert(!isMeta(q4) && spark.sql(q4).head.getLong(0) == 49L)
    // pending deletes decline (a masked row could hold the extreme)
    t.mergeMoR(spark, Seq((118L, 2, "D")).toDF("id", "p", "op"),
      Seq("id"), keepDeletes = false)
    assert(!isMeta(q1))
    assert(spark.sql(q1).head.getLong(1) == 114L,
      "fall-through must answer from the delete-resolved view")
  }

  test("standard SQL time travel: VERSION AS OF / TIMESTAMP AS OF") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-tt-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace((1 to 10).map(i => (i.toLong, "v1")).toDF("id", "s"),
      nowMs = 1000L)
    tbl.createOrReplace((1 to 15).map(i => (i.toLong, "v2")).toDF("id", "s"),
      nowMs = 5000L)

    def c(sql: String): Long = base.sql(sql).head.getLong(0)
    assert(c(s"SELECT count(*) AS c FROM graft.`$root` VERSION AS OF 1") == 10)
    assert(c(s"SELECT count(*) AS c FROM graft.`$root` VERSION AS OF 2") == 15)
    // session zone is UTC: epoch 2s falls between the commits → v1
    assert(c(s"SELECT count(*) AS c FROM graft.`$root` " +
      "TIMESTAMP AS OF '1970-01-01 00:00:02'") == 10)
    assert(c(s"SELECT count(*) AS c FROM graft.`$root` " +
      "TIMESTAMP AS OF '1970-01-01 00:00:05'") == 15)
    // aliases and joins against the travelled relation resolve normally
    assert(c(s"SELECT count(*) AS c FROM graft.`$root` VERSION AS OF 1 t " +
      s"JOIN graft.`$root` cur ON t.id = cur.id") == 10)
    // loud failures: ghost version, pre-history timestamp, non-numeric
    intercept[Exception] {
      base.sql(s"SELECT * FROM graft.`$root` VERSION AS OF 99").collect()
    }
    intercept[Exception] {
      base.sql(s"SELECT * FROM graft.`$root` " +
        "TIMESTAMP AS OF '1969-12-31 00:00:00'").collect()
    }
    // Iceberg ref spelling: VERSION AS OF 'tag' pins, 'branch' reads the
    // branch HEAD, an unknown name refuses loudly
    tbl.tag("v1tag", 1L)
    tbl.branch("dev", 1L)
    assert(c(s"SELECT count(*) AS c FROM graft.`$root` " +
      "VERSION AS OF 'v1tag'") == 10)
    tbl.atBranch("dev").append(spark,
      Seq((100L, "b"), (101L, "b")).toDF("id", "s"))
    assert(c(s"SELECT count(*) AS c FROM graft.`$root` " +
      "VERSION AS OF 'dev'") == 12, "a branch name reads the branch head")
    val eRef = intercept[Exception] {
      base.sql(s"SELECT * FROM graft.`$root` VERSION AS OF 'nope'").collect()
    }
    assert(eRef.getMessage.contains("neither"))
  }

  test("named-catalog CREATE TABLE takes the full transform set") {
    val base = spark
    import base.implicits._
    val wh = Files.createTempDirectory("graft-ct-wh-").toString
    spark.conf.set("spark.sql.catalog.ctcat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ctcat.warehouse", wh)
    try {
      spark.sql("CREATE TABLE ctcat.db.evt (id BIGINT, ts TIMESTAMP, " +
        "s STRING) PARTITIONED BY (bucket(8, id), days(ts))")
      val t = SnapshotTable.at(s"$wh/db/evt")
      val m = t.currentManifest
      assert(m.partitionColumns == Seq("id_bucket", "ts_day"),
        s"derived partition fields (${m.partitionColumns})")
      assert(m.properties.get("graft.transform.id_bucket")
        .contains("bucket(8,id)"))
      assert(m.properties.get("graft.transform.ts_day").contains("days(ts)"))
      // writers never supply the derived columns — the engine does
      spark.sql("INSERT INTO ctcat.db.evt SELECT id, " +
        "timestamp'2024-03-05 10:00:00' AS ts, concat('s', id) AS s " +
        "FROM range(200)")
      assert(spark.sql("SELECT count(*) AS c FROM ctcat.db.evt")
        .head.getLong(0) == 200)
      // the hidden bucket prunes a point predicate on the raw key
      val (kept, total) = t.pruneCounts(
        org.apache.spark.sql.functions.col("id") === 42L)
      assert(kept < total, s"bucket transform must prune ($kept/$total)")
      assert(spark.sql("SELECT id FROM ctcat.db.evt WHERE id = 42")
        .count() == 1)
      // an undefined transform-over-type refuses loudly
      intercept[Exception](spark.sql(
        "CREATE TABLE ctcat.db.bad (x DOUBLE) PARTITIONED BY (days(x))"))
    } finally {
      spark.conf.unset("spark.sql.catalog.ctcat")
      spark.conf.unset("spark.sql.catalog.ctcat.warehouse")
    }
  }
}
