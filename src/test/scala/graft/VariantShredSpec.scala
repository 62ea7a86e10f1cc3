package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.table.SnapshotTable

/** Iceberg v3 VARIANT with engine-declared SHREDDED scalar leaves:
  * `write.graft.variant.shred.<col> = path:type;...` materializes each
  * declared leaf as an engine-owned physical parquet column
  * (`__graft_shred_*` — the row-lineage precedent: in the files, never
  * in the declared schema) whose footer bounds drive manifest pruning
  * of `try_variant_get(col, '$.path', 'type')` predicates. Unshredded
  * binary comparison stays refused where it always was (NetDiff, the
  * oracle gate).
  */
class VariantShredSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-variant-$tag-").toString + "/t"

  test("fundamentals: variant round-trips through parquet and schema DDL") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 5, "s": "a"}"""), (2L, """{"k": 9}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    assert(df.schema("v").dataType.typeName == "variant")
    // DDL round-trip (the manifest stores schemas as DDL strings)
    val ddl = df.schema.toDDL
    assert(StructType.fromDDL(ddl)("v").dataType == df.schema("v").dataType,
      s"variant must survive the DDL round-trip: $ddl")
    val dir = Files.createTempDirectory("graft-variant-raw-").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.schema(df.schema).parquet(dir)
    val got = back.select(col("id"),
      expr("try_variant_get(v, '$.k', 'bigint')").as("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 5L, 2L -> 9L))
  }

  private def footerCols(t: SnapshotTable, rel: String): Set[String] = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(t.root.resolve(rel).toString),
        new org.apache.hadoop.conf.Configuration()))
    try {
      import scala.jdk.CollectionConverters._
      rd.getFooter.getBlocks.get(0).getColumns.asScala
        .map(_.getPath.toDotString).toSet
    } finally rd.close()
  }

  test("shred declarations materialize physical columns, prune " +
      "try_variant_get predicates, stay out of the declared schema") {
    import spark.implicits._
    val t = SnapshotTable.at(freshRoot("shred"))
    val base = (0 until 4000)
      .map(i => (i.toLong, s"""{"k": ${i % 1000}, "s": "v${i % 7}"}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    // range-cluster on the leaf value BEFORE the write (unpartitioned
    // commits keep the writer's layout) so per-file k-bounds are tight
    val clustered = base
      .withColumn("ks", expr("try_variant_get(v, '$.k', 'bigint')"))
      .repartitionByRange(8, col("ks")).drop("ks")
    t.createOrReplace(clustered, properties = Map(
      "write.graft.variant.shred.v" -> "k:bigint;s:string"))

    // physical columns in the parquet, variant group intact
    val cols = footerCols(t, t.currentManifest.files.head.path)
    assert(cols.contains("__graft_shred_v$k$bigint"), s"footer: $cols")
    assert(cols.contains("__graft_shred_v$s$string"), s"footer: $cols")
    assert(cols.exists(_.startsWith("v.")), s"variant group must ride: $cols")
    // ...but never in the declared schema or the read
    assert(t.read(spark).columns.toSeq == Seq("id", "v"))

    // extraction values round-trip
    val got = t.read(spark).select(col("id"),
      expr("try_variant_get(v, '$.k', 'bigint')").as("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 4000 && got(1234L) == 234L)

    // the whole point: manifest pruning on the shredded leaf
    val (kept, total) = t.pruneCounts(
      expr("try_variant_get(v, '$.k', 'bigint') = 7"))
    assert(total >= 8 && kept < total,
      s"shred bounds must prune the point lookup ($kept/$total)")
    // strict variant_get stays conservative (it can THROW on rows a
    // pruned file would have surfaced)
    val (keptStrict, _) = t.pruneCounts(
      expr("variant_get(v, '$.k', 'bigint') = 7"))
    assert(keptStrict == total, "strict extraction must never prune")
    // a DIFFERENT extraction type must not consult the bounds
    val (keptOtherT, _) = t.pruneCounts(
      expr("try_variant_get(v, '$.k', 'int') = 7"))
    assert(keptOtherT == total, "type-mismatched extraction must not prune")
    // an undeclared leaf must not bind anything
    val (keptOther, _) = t.pruneCounts(
      expr("try_variant_get(v, '$.nope', 'bigint') = 7"))
    assert(keptOther == total)

    // rewrites re-shred from the variant itself
    t.compact(spark)
    val cols2 = footerCols(t, t.currentManifest.files.head.path)
    assert(cols2.contains("__graft_shred_v$k$bigint"),
      s"compaction must re-materialize the shreds: $cols2")
    assert(t.read(spark).count() == 4000L)
  }

  test("chunked manifests prune on shred bounds via rollups; SQL reads " +
      "serve variant tables and WHERE-prune the shredded leaf") {
    import graft.table.ManifestJson
    import spark.implicits._
    val savedSize = ManifestJson.ChunkSize
    val savedThr = ManifestJson.ChunkThreshold
    try {
      ManifestJson.ChunkSize = 8
      ManifestJson.ChunkThreshold = 8
      val t = SnapshotTable.at(freshRoot("chunked"))
      // 25 partitions over a chunk threshold of 8 → chunked manifest;
      // p = k DIV 4 correlates the partition with the shredded leaf, so
      // each partition's files hold a TIGHT k range and the chunk
      // rollups (per-column fold of member entry stats, shred names
      // included) can exclude whole documents for a point lookup
      val clustered = (0 until 3200)
        .map(i => (i.toLong, (i / 32) / 4, s"""{"k": ${i / 32}}"""))
        .toDF("id", "p", "j")
        .select(col("id"), col("p"), parse_json(col("j")).as("v"))
      t.createOrReplace(clustered, Seq("p"), properties = Map(
        "write.graft.variant.shred.v" -> "k:bigint"))
      t.currentManifest.files match {
        case fl: graft.table.FileList =>
          assert(fl.chunks.nonEmpty, "fixture must be chunked")
        case _ => fail("fixture must be chunked")
      }
      val (kept, total) = t.pruneCounts(
        expr("try_variant_get(v, '$.k', 'bigint') = 7"))
      assert(kept < total,
        s"chunked shred bounds must prune ($kept/$total)")
      // SQL surface: the relation rule serves the variant schema, and a
      // WHERE on the shredded leaf returns the exact rows
      val n = spark.sql(
        s"SELECT id FROM graft.`${t.root}` " +
          "WHERE try_variant_get(v, '$.k', 'bigint') = 7")
        .collect().map(_.getLong(0)).toSet
      assert(n == (7 * 32 until 8 * 32).map(_.toLong).toSet, s"got $n")
      assert(spark.sql(s"SELECT count(*) FROM graft.`${t.root}`")
        .head.getLong(0) == 3200L)
    } finally {
      ManifestJson.ChunkSize = savedSize
      ManifestJson.ChunkThreshold = savedThr
    }
  }

  test("the DIRECT writers shred too: MoR merge appends and positional-" +
      "update replacements carry the physical columns") {
    import spark.implicits._
    def vdf(rows: Seq[(Long, String, String)]) = rows.toDF("id", "j", "op")
      .select(col("id"), parse_json(col("j")).as("v"), col("op"))
    val t = SnapshotTable.at(freshRoot("direct"))
    t.createOrReplace(
      vdf((0L until 20L).map(i => (i, s"""{"k": $i}""", "I"))).drop("op"),
      properties = Map("write.graft.variant.shred.v" -> "k:bigint"))
    // MoR merge: the appended data files must carry the shred column
    // (matched rows need op 'U' — matched-'I' is the pinned no-op)
    t.mergeMoR(spark, vdf(Seq((3L, """{"k": 103}""", "U"),
      (50L, """{"k": 150}""", "I"))), Seq("id"), keepDeletes = false)
    def newestNonEmpty(tag: String) = {
      val maxSeq = t.currentManifest.files.map(_.seq).max
      t.currentManifest.files
        .find(f => f.seq == maxSeq && f.rows != 0)
        .getOrElse(fail(s"$tag: no non-empty file at seq $maxSeq"))
    }
    assert(footerCols(t, newestNonEmpty("mor").path)
      .contains("__graft_shred_v$k$bigint"), "MoR appends must shred")
    // positional update: replacement rows must carry it too
    t.updateWherePositional(spark,
      Seq("v" -> expr("parse_json('{\"k\": 999}')")), col("id") === 7L)
    assert(footerCols(t, newestNonEmpty("upd").path)
      .contains("__graft_shred_v$k$bigint"),
      "positional-update replacements must shred")
    // and the table still reads coherently
    val got = t.read(spark).select(col("id"),
      expr("try_variant_get(v, '$.k', 'bigint')").as("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 103L && got(50L) == 150L && got(7L) == 999L &&
      got(5L) == 5L, s"got $got")
  }

  test("malformed declarations and non-variant columns refuse loudly") {
    import spark.implicits._
    val df = Seq((1L, """{"k":1}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    def mk(p: (String, String)*) = SnapshotTable.at(freshRoot("bad"))
      .createOrReplace(df, properties = p.toMap)
    intercept[IllegalArgumentException](
      mk("write.graft.variant.shred.v" -> "k")) // no type
    intercept[IllegalArgumentException](
      mk("write.graft.variant.shred.v" -> "a[0]:bigint")) // array step
    intercept[IllegalArgumentException](
      mk("write.graft.variant.shred.v" -> "k:array<int>")) // non-scalar
    // '$' encoding keeps dotted paths and underscored names APART —
    // a.b vs a_b coexist (a '.'→'_' sanitization would have let a
    // predicate consult the wrong leaf's bounds)
    SnapshotTable.at(freshRoot("nocollide")).createOrReplace(df,
      properties = Map(
        "write.graft.variant.shred.v" -> "a.b:bigint;a_b:bigint"))
    // ...but a '$' in a COLUMN name can still collide two columns'
    // physical spellings — refused globally
    val df2 = Seq((1L, """{"k":1}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"),
        parse_json(col("j")).as("v$x"))
    intercept[IllegalArgumentException](
      SnapshotTable.at(freshRoot("collide")).createOrReplace(df2,
        properties = Map(
          "write.graft.variant.shred.v" -> "x.k:bigint",
          "write.graft.variant.shred.v$x" -> "k:bigint")))
    intercept[IllegalArgumentException](
      mk("write.graft.variant.shred.id" -> "k:bigint")) // not a variant
    // DDL-time validation: SET TBLPROPERTIES refuses a malformed value
    // immediately, not at the next write
    val t = SnapshotTable.at(freshRoot("ddl"))
    t.createOrReplace(df, properties = Map(
      "write.graft.variant.shred.v" -> "k:bigint"))
    intercept[IllegalArgumentException](
      t.setProperties(Map("write.graft.variant.shred.v" -> "k")))
    intercept[Exception](
      t.setProperties(Map("write.graft.variant.shred.v" -> "k:nosuch")))
  }

  test("review r14 hardening: type re-declaration never wrong-prunes, " +
      "camelCase paths bind, user __graft_shred_* columns survive, " +
      "case-duplicate keys refuse") {
    import spark.implicits._
    // 1) re-declaring a leaf's TYPE mints a NEW physical name: old
    // files' string-extraction bounds (lexicographic — ['10','9']
    // would wrongly exclude bigint 7) can never be consulted under
    // the new type; results stay exact, pruning merely conservative
    val t = SnapshotTable.at(freshRoot("retype"))
    val mk = (ks: Seq[Long]) => ks.map(k => (k, s"""{"k": $k}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    t.createOrReplace(mk(Seq(7L, 9L, 10L)).repartition(3, col("id")),
      properties = Map("write.graft.variant.shred.v" -> "k:string"))
    t.setProperties(Map("write.graft.variant.shred.v" -> "k:bigint"))
    val (kept, total) = t.pruneCounts(
      expr("try_variant_get(v, '$.k', 'bigint') = 7"))
    assert(kept == total,
      s"old-type bounds must not serve the new type ($kept/$total)")
    assert(t.read(spark)
      .filter(expr("try_variant_get(v, '$.k', 'bigint') = 7"))
      .count() == 1L, "the row must still be found")
    // ...and the next write prunes under the new type
    t.compact(spark)
    val t2 = SnapshotTable.at(freshRoot("retype2"))
    t2.createOrReplace(mk(0L until 400L)
        .withColumn("ks", expr("try_variant_get(v, '$.k', 'bigint')"))
        .repartitionByRange(8, col("ks")).drop("ks"),
      properties = Map("write.graft.variant.shred.v" -> "k:bigint"))
    val (k2, tot2) = t2.pruneCounts(
      expr("try_variant_get(v, '$.k', 'bigint') = 7"))
    assert(k2 < tot2, "the re-declared type prunes on fresh files")

    // 2) camelCase paths bind (variant paths are case-sensitive; a
    // lowercased lookup silently never pruned them)
    val cc = SnapshotTable.at(freshRoot("camel"))
    cc.createOrReplace(
      (0 until 400).map(i => (i.toLong, s"""{"userId": ${i / 50}}"""))
        .toDF("id", "j")
        .select(col("id"), parse_json(col("j")).as("v"))
        .repartitionByRange(8, col("id")),
      properties = Map("write.graft.variant.shred.v" -> "userId:bigint"))
    val (kc, tc) = cc.pruneCounts(
      expr("try_variant_get(v, '$.userId', 'bigint') = 7"))
    assert(kc < tc, s"camelCase leaf must prune ($kc/$tc)")
    // a case-mismatched path is a DIFFERENT leaf: never binds
    val (kx, _) = cc.pruneCounts(
      expr("try_variant_get(v, '$.userid', 'bigint') = 7"))
    assert(kx == tc, "case-mismatched path must not consult the bounds")

    // 3) a USER column that happens to share the prefix is ordinary
    // data — stripped-by-prefix would silently lose it (review #3)
    val u = SnapshotTable.at(freshRoot("usercol"))
    u.createOrReplace(
      Seq((1L, """{"k":1}""", "mine")).toDF("id", "j", "__graft_shred_note")
        .select(col("id"), parse_json(col("j")).as("v"),
          col("__graft_shred_note")),
      properties = Map("write.graft.variant.shred.v" -> "k:bigint"))
    assert(u.read(spark).columns.toSet ==
      Set("id", "v", "__graft_shred_note"),
      "user columns sharing the prefix must survive")
    assert(u.read(spark).select("__graft_shred_note")
      .head.getString(0) == "mine")

    // 4) two keys differing only in column case must refuse, not
    // silently drop one declaration set
    intercept[IllegalArgumentException](
      SnapshotTable.at(freshRoot("dupkey")).createOrReplace(
        Seq((1L, """{"k":1}""")).toDF("id", "j")
          .select(col("id"), parse_json(col("j")).as("v")),
        properties = Map(
          "write.graft.variant.shred.v" -> "a:bigint",
          "write.graft.variant.shred.V" -> "b:string")))
  }

  test("shred keys travel with RENAME and die with DROP — the default-" +
      "value key discipline") {
    import spark.implicits._
    val t = SnapshotTable.at(freshRoot("keys"))
    val df = Seq((1L, """{"k": 3}"""), (2L, """{"k": 8}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("v"))
    t.createOrReplace(df, properties = Map(
      "write.graft.variant.shred.v" -> "k:bigint"))
    // rename MOVES the declaration: the next write shreds under the new
    // physical spelling
    t.renameColumn("v", "payload")
    assert(t.currentManifest.properties
      .get("write.graft.variant.shred.payload").contains("k:bigint"))
    assert(!t.currentManifest.properties.keys
      .exists(_.equalsIgnoreCase("write.graft.variant.shred.v")))
    t.append(spark, Seq((3L, """{"k": 5}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload")))
    val newest = t.currentManifest.files.maxBy(_.seq)
    assert(footerCols(t, newest.path).contains("__graft_shred_payload$k$bigint"),
      "post-rename writes must shred under the new spelling")
    // drop REMOVES it: a re-added same-name NON-variant column must not
    // hit a stale declaration (the materializer refuses non-variant)
    t.dropColumns(Seq("payload"))
    assert(!t.currentManifest.properties.keys
      .exists(_.toLowerCase.startsWith("write.graft.variant.shred.")))
    t.compact(spark) // fold carried files so the name can return
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("payload",
      org.apache.spark.sql.types.LongType)))
    t.append(spark, Seq((4L, 9L)).toDF("id", "payload")) // must not throw
    assert(t.read(spark).count() == 4L)
  }
}
