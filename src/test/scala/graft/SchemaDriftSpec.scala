package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.Ingestion
import graft.table.SnapshotTable

/** Schema drift: new source columns appear (AppFlow dynamic-field-update
  * behavior), old ones vanish — both the pure merge pipeline and the
  * storage-backed path must align by name, null-fill, and keep carried-
  * forward files readable.
  */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val cfg = SourceConfig("db", "t", Seq("id"), Seq("upd"))

  test("applyMode: added + removed columns null-fill correctly") {
    val target = Seq((1L, ts("2026-01-01 00:00:00"), "x"))
      .toDF("id", "upd", "old_col")
    val source = Seq(
      (1L, ts("2026-02-01 00:00:00"), 7.5), // update (old_col vanished)
      (2L, ts("2026-02-01 00:00:00"), 8.5)  // insert with new_col
    ).toDF("id", "upd", "new_col")
    val out = Ingestion.applyMode(source, target,
      cfg.copy(mode = IngestMode.Incremental))
    assert(out.columns.toSeq == Seq("id", "upd", "old_col", "new_col"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(byId(1L) == (None, Some(7.5)))  // updated: old gone, new present
    assert(byId(2L) == (None, Some(8.5)))  // inserted
  }

  test("nested columns: CTAS→merge→changelog pass-through, add-struct " +
      "null-fills, struct evolution refuses") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val root = Files.createTempDirectory("graft-nested-").toString
    val tbl = SnapshotTable.at(root)
    // struct + array + map columns pass through untouched (the reference
    // never declares a schema — whatever parquet ships flows through)
    val base = (1 to 40).map(i => (i.toLong, i)).toDF("id", "x")
      .select($"id",
        struct(($"x" * 1.5).as("price"),
          concat(lit("p"), $"x".cast("string")).as("tag")).as("meta"),
        array($"x", $"x" + 1).as("arr"),
        map(lit("k"), $"x").as("m"))
    tbl.createOrReplace(base)                                        // v1
    val changes = base.filter($"id" % 4 === 0)
      .withColumn("meta", struct(($"meta.price" * 2).as("price"),
        concat($"meta.tag", lit("+")).as("tag")))
      .withColumn("op", lit("U"))
    tbl.merge(spark, changes, Seq("id"), keepDeletes = false)        // v2
    val out = tbl.read(spark)
    assert(out.count() == 40)
    assert(out.filter($"id" % 4 === 0 &&
      $"meta.tag".endsWith("+")).count() == 10,
      "merge must align and update the struct payload by name")
    assert(out.filter($"id" % 4 =!= 0 &&
      $"meta.tag".endsWith("+")).count() == 0)
    // changelog NetDiff over struct+array+MAP columns nets exactly the
    // merged rows (maps canonicalize via sorted entries — Spark refuses
    // set-ops on MapType directly)
    val cdc = tbl.readChangelog(spark, 1L, 2L)
    assert(cdc.filter($"_change_type" === "insert").count() == 10)
    assert(cdc.filter($"_change_type" === "delete").count() == 10)
    // ADD COLUMNS with a nested type: metadata-only, carried files
    // null-fill the whole struct
    tbl.addColumns(Seq(StructField("extra",
      StructType.fromDDL("a int, b string"), nullable = true)))
    val evolved = tbl.read(spark)
    assert(evolved.schema("extra").dataType.isInstanceOf[StructType])
    assert(evolved.filter($"extra".isNull).count() == 40)
    // stats: struct LEAVES record under dotted paths (r10); CONTAINERS
    // themselves record nothing; array elements and map keys/values
    // record under the footer's element spelling (r11 — those are
    // element-level bounds, deliberately never row-level null counts)
    val m = tbl.currentManifest
    assert(m.files.forall(f => !f.stats.keys.exists(k =>
      Seq("meta", "arr", "m", "extra").exists(k.equalsIgnoreCase))))
    assert(m.files.exists(_.stats.contains("meta.price")),
      "struct leaf bounds must record under the dotted path")
    assert(m.files.forall(f => f.stats.keys
      .filter(_.startsWith("arr")).forall(_ == "arr.list.element")),
      "array stats live ONLY at the element path, never row-level")
    assert(m.files.forall(f => !f.nulls.keys.exists(_.startsWith("arr")) &&
      !f.nulls.keys.exists(_.startsWith("m."))),
      "element paths must never record row-level null counts")
    assert(m.files.exists(_.stats.contains("id")))
    // struct evolution refuses loudly: widening is int→long/float→double
    val e = intercept[IllegalArgumentException] {
      tbl.widenColumn("meta", LongType)
    }
    assert(e.getMessage.nonEmpty)
  }

  test("storage path: type widening reads carried int files under the long schema") {
    val root = Files.createTempDirectory("graft-widen-").toString
    val tbl = SnapshotTable.at(root)
    val pcfg = cfg.copy(partitionColumns = Seq("p"))
    // v1: v is INT across two partitions
    Ingestion.run(spark, tbl,
      (1 to 20).map(i => (i.toLong, ts("2026-01-01 00:00:00"), i, i % 2))
        .toDF("id", "upd", "v", "p"), pcfg, ts("2026-01-01 00:00:00"))
    // v2: v arrives as LONG, touches only partition 0 → partition 1 files
    // carry forward with their INT32 physical type under the widened schema
    Ingestion.run(spark, tbl,
      (2 to 20 by 2).map(i => (i.toLong, ts("2026-02-01 00:00:00"), i.toLong * 10, 0))
        .toDF("id", "upd", "v", "p"),
      pcfg.copy(mode = IngestMode.Incremental), ts("2026-02-01 00:00:00"))
    val out = tbl.read(spark)
    assert(out.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(out.count() == 20)
    // carried partition-1 rows upcast correctly (parquet INT32 → bigint)
    assert(out.filter(col("p") === 1 && col("v") === 1L).count() == 1)
    assert(out.filter(col("p") === 0 && col("v") === 20L).count() == 1)
  }

  test("storage path: new column lands; carried partitions read as null") {
    val root = Files.createTempDirectory("graft-drift-").toString
    val tbl = SnapshotTable.at(root)
    val pcfg = cfg.copy(partitionColumns = Seq("p"))
    val day1 = (1 to 40).map(i => (i.toLong, ts("2026-01-01 00:00:00"), i % 4))
      .toDF("id", "upd", "p")
    Ingestion.run(spark, tbl, day1, pcfg, ts("2026-01-01 00:00:00"))
    // day 2 adds extra_col, touches only partition 0
    val day2 = (1 to 40).filter(_ % 4 == 0)
      .map(i => (i.toLong, ts("2026-02-01 00:00:00"), i % 4, s"v$i"))
      .toDF("id", "upd", "p", "extra_col")
    Ingestion.run(spark, tbl, day2,
      pcfg.copy(mode = IngestMode.Incremental), ts("2026-02-01 00:00:00"))
    val out = tbl.read(spark)
    assert(out.columns.contains("extra_col"))
    assert(out.count() == 40)
    // updated rows carry the value; carried-forward files read nulls
    assert(out.filter(col("extra_col").isNotNull).count() == 10)
    assert(out.filter(col("p") =!= 0 && col("extra_col").isNotNull).count() == 0)
    // carried-forward v1 files are still referenced by v2
    val m = tbl.currentManifest
    assert(m.files.exists(_.path.startsWith("data/v1/")))
  }

  test("evolveSchema merge: add-column is metadata-only for untouched partitions") {
    val root = Files.createTempDirectory("graft-evo-cow-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(
      (1 to 40).map(i => (i.toLong, ts("2026-01-01 00:00:00"), i % 4))
        .toDF("id", "upd", "p"),
      Seq("p"))
    val v1Files = tbl.currentManifest.files.map(_.path).toSet
    // raw change batch (op column, no Ingestion alignment) carrying a NEW
    // column; touches only partition 1
    val changes = Seq(
      (1L, ts("2026-02-01 00:00:00"), 1, "U", "note1"),
      (101L, ts("2026-02-01 00:00:00"), 1, "I", "note101"))
      .toDF("id", "upd", "p", "op", "note")
    tbl.merge(spark, changes, Seq("id"), keepDeletes = false,
      evolveSchema = true)
    val m2 = tbl.currentManifest
    assert(m2.schemaDdl.contains("note"))
    assert(!m2.schemaDdl.contains("`op`"), "change marker must not evolve in")
    val carried = m2.files.filter(f => v1Files(f.path))
    assert(carried.nonEmpty, "untouched partitions must carry v1 files")
    assert(carried.forall(_.partition("p") != "1"))
    val out = tbl.read(spark)
    assert(out.count() == 41)
    assert(out.filter(col("note").isNotNull).count() == 2)
    assert(out.filter(col("id") === 1L).select("note").head.getString(0) == "note1")
    // pruning on the evolved column must KEEP stats-less old files
    val (kept, total) = tbl.pruneCounts(col("note") === "note1")
    assert(total == m2.files.size && kept >= carried.size)
  }

  test("dropColumns is metadata-only; same-name re-add guarded against resurrection") {
    val root = Files.createTempDirectory("graft-drop-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(
      (1 to 30).map(i => (i.toLong, ts("2026-01-01 00:00:00"), i % 3, s"x$i"))
        .toDF("id", "upd", "p", "extra"),
      Seq("p"))
    val v1Files = tbl.currentManifest.files.map(_.path).toSet
    tbl.dropColumns(Seq("extra"))
    val m2 = tbl.currentManifest
    assert(!m2.schemaDdl.contains("extra"))
    assert(m2.files.map(_.path).toSet == v1Files, "drop must not touch data")
    val out = tbl.read(spark)
    assert(!out.columns.contains("extra") && out.count() == 30)
    // merges keep working post-drop; p=2 rewrites, p∈{0,1} stay pre-drop
    tbl.merge(spark,
      Seq((5L, ts("2026-02-01 00:00:00"), 2, "U")).toDF("id", "upd", "p", "op"),
      Seq("id"), keepDeletes = false)
    assert(tbl.read(spark).count() == 30)
    // re-adding "extra" while pre-drop files are live would resurrect
    // their old x<i> values (name-based mapping) → refused
    val readd = Seq((99L, ts("2026-03-01 00:00:00"), 0, "I", "fresh"))
      .toDF("id", "upd", "p", "op", "extra")
    intercept[IllegalArgumentException] {
      tbl.merge(spark, readd, Seq("id"), keepDeletes = false,
        evolveSchema = true)
    }
    // compaction rewrites files under the manifest schema (physical
    // column gone) → the same evolve is now safe and null-fills
    tbl.compact(spark, targetFileBytes = 1) // force: every file oversized
    tbl.merge(spark, readd, Seq("id"), keepDeletes = false,
      evolveSchema = true)
    val out2 = tbl.read(spark)
    assert(out2.count() == 31)
    assert(out2.filter(col("extra").isNotNull).count() == 1)
    assert(out2.filter(col("id") === 99L).select("extra").head.getString(0) == "fresh")
    // guards: partition column, pending deletes, unknown column
    intercept[IllegalArgumentException](tbl.dropColumns(Seq("p")))
    intercept[IllegalArgumentException](tbl.dropColumns(Seq("ghost")))
  }

  test("evolveSchema casing drift neither wipes nor duplicates a column") {
    val root = Files.createTempDirectory("graft-evo-case-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(
      (1 to 10).map(i => (i.toLong, ts("2026-01-01 00:00:00"), s"e$i"))
        .toDF("id", "upd", "email"))
    // change batch arrives with "Email": under caseSensitive=false this
    // is the SAME column — an exact-case evolution check would run
    // withColumn("Email", null) and wipe every row's email
    val changes = Seq((3L, ts("2026-02-01 00:00:00"), "changed", "U"))
      .toDF("id", "upd", "Email", "op")
    tbl.merge(spark, changes, Seq("id"), keepDeletes = false,
      evolveSchema = true)
    val out = tbl.read(spark)
    assert(out.columns.count(_.equalsIgnoreCase("email")) == 1)
    assert(out.filter(col("email").isNull).count() == 0,
      "existing email values must survive the case-drifted evolve")
    assert(out.filter(col("id") === 3L).select("email").head.getString(0)
      == "changed")
  }

  test("resurrection guard matches case-insensitively") {
    val root = Files.createTempDirectory("graft-drop-case-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(
      (1 to 20).map(i => (i.toLong, ts("2026-01-01 00:00:00"), i % 2, s"x$i"))
        .toDF("id", "upd", "p", "extra"),
      Seq("p"))
    tbl.dropColumns(Seq("extra"))
    // re-add under DIFFERENT casing while pre-drop files are live: the
    // parquet reader resolves case-insensitively, so "EXTRA" would bind
    // to the old physical "extra" values — must be refused
    val readd = Seq((99L, ts("2026-02-01 00:00:00"), 1, "I", "fresh"))
      .toDF("id", "upd", "p", "op", "EXTRA")
    intercept[IllegalArgumentException] {
      tbl.merge(spark, readd, Seq("id"), keepDeletes = false,
        evolveSchema = true)
    }
  }

  test("Ingestion batch re-growing a dropped column is refused until compaction") {
    val root = Files.createTempDirectory("graft-drop-ing-").toString
    val tbl = SnapshotTable.at(root)
    val pcfg = cfg.copy(partitionColumns = Seq("p"))
    Ingestion.run(spark, tbl,
      (1 to 30).map(i => (i.toLong, ts("2026-01-01 00:00:00"), i % 3, s"x$i"))
        .toDF("id", "upd", "p", "extra"),
      pcfg, ts("2026-01-01 00:00:00"))
    tbl.dropColumns(Seq("extra"))
    // the source re-grows `extra` and touches only partition 0 — the
    // align transform would put the column back in the schema while
    // pre-drop files in p∈{1,2} are carried: refused at the commit
    // chokepoint, BEFORE any data is written
    val day2 = (1 to 30).filter(_ % 3 == 0)
      .map(i => (i.toLong, ts("2026-02-01 00:00:00"), i % 3, s"y$i"))
      .toDF("id", "upd", "p", "extra")
    intercept[IllegalArgumentException] {
      Ingestion.run(spark, tbl, day2,
        pcfg.copy(mode = IngestMode.Incremental), ts("2026-02-01 00:00:00"))
    }
    // compaction rewrites every file under the post-drop schema → safe
    tbl.compact(spark, targetFileBytes = 1)
    Ingestion.run(spark, tbl, day2,
      pcfg.copy(mode = IngestMode.Incremental), ts("2026-02-01 00:00:00"))
    val out = tbl.read(spark)
    assert(out.count() == 30)
    assert(out.filter(col("extra").isNotNull).count() == 10)
    assert(out.filter(col("p") =!= 0 && col("extra").isNotNull).count() == 0,
      "pre-drop values must NOT resurrect")
  }

  test("evolveSchema mergeMoR: carried files null-fill; compact folds to evolved schema") {
    val root = Files.createTempDirectory("graft-evo-mor-").toString
    val tbl = SnapshotTable.at(root)
    tbl.createOrReplace(
      (1 to 30).map(i => (i.toLong, ts("2026-01-01 00:00:00"))).toDF("id", "upd"))
    val v1Files = tbl.currentManifest.files.map(_.path).toSet
    val changes = Seq(
      (5L, ts("2026-02-01 00:00:00"), "U", "n5"),
      (99L, ts("2026-02-01 00:00:00"), "I", "n99"))
      .toDF("id", "upd", "op", "note")
    tbl.mergeMoR(spark, changes, Seq("id"), keepDeletes = false,
      evolveSchema = true)
    val m2 = tbl.currentManifest
    assert(m2.schemaDdl.contains("note"))
    assert(v1Files.subsetOf(m2.files.map(_.path).toSet),
      "MoR evolution must carry every base file")
    def check(): Unit = {
      val out = tbl.read(spark)
      assert(out.count() == 31)
      assert(out.filter(col("note").isNotNull).count() == 2)
      assert(out.filter(col("id") === 5L).select("note").head.getString(0) == "n5")
      assert(out.filter(col("id") === 2L).select("note").head.get(0) == null)
    }
    check()
    tbl.compact(spark) // folds the equality delete under the evolved schema
    assert(tbl.currentManifest.deleteFiles.isEmpty)
    check()
  }
}
