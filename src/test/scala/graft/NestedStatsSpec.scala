package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Nested-leaf footer stats (Iceberg records bounds for struct fields):
  * struct leaves land in the manifest under their DOTTED path and prune
  * scalar predicates; multi-part name resolution is schema-aware and
  * DECLINES on ambiguity — the latent wrong-prune (a nested predicate
  * whose leaf name collides with a top-level column consulting the
  * wrong bounds) is pinned here.
  */
class NestedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable() =
    SnapshotTable.at(Files.createTempDirectory("graft-nested-stats-").toString)

  test("struct leaf bounds record, prune API + SQL reads, and stay exact") {
    val t = freshTable()
    val df = (1 to 4000).map(i => (i.toLong, s"t$i")).toDF("id", "tag")
      .repartitionByRange(16, col("id"))
      .select($"id",
        struct($"id".cast("double").as("price"), $"tag").as("meta"))
    t.createOrReplace(df)
    val m = t.currentManifest
    assert(m.files.exists(_.stats.contains("meta.price")),
      "struct leaf bounds must record under the dotted footer path")
    val total = m.files.size
    assert(total >= 8)
    // API path: the leaf predicate prunes via the dotted bounds
    val (kept, _) = t.pruneCounts(col("meta.price") <= 100.0)
    assert(kept < total, s"leaf predicate must prune ($kept/$total)")
    assert(t.readWhere(spark, col("meta.price") <= 100.0).count() == 100)
    // IS NULL prunes on a null-free leaf; IS NOT NULL keeps
    assert(t.pruneCounts(col("meta.price").isNull)._1 == 0)
    assert(t.readWhere(spark, col("meta.price").isNotNull).count() == 4000)
    // STRUCTURAL proof the SQL path prunes too: delete every out-of-range
    // file from disk — the queries below can only succeed by never
    // listing them (ignoreMissingFiles is off)
    val doomed = m.files.filter(f =>
      f.stats.get("meta.price").exists(_.min.toDouble > 100.0))
    assert(doomed.nonEmpty)
    doomed.foreach(f => Files.delete(t.root.resolve(f.path)))
    assert(t.readWhere(spark, col("meta.price") <= 100.0).count() == 100)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`${t.root}` " +
      "WHERE meta.price <= 100.0").head.getLong(0) == 100,
      "unqualified nested SQL predicate must prune (wrap relaxation)")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`${t.root}` g " +
      "WHERE g.meta.price <= 100.0").head.getLong(0) == 100,
      "alias-qualified nested SQL predicate must prune")
  }

  test("leaf name colliding with a top-level column declines, never " +
      "consults the wrong bounds") {
    val t = freshTable()
    // top-level `price` holds values 100k+; the NESTED meta.price holds
    // ids — before schema-aware resolution, col(\"meta.price\") <= 100
    // consulted TOP-LEVEL price's bounds (min > 100) and pruned away
    // every matching file: a wrong empty result
    val df = (1 to 2000).map(i => (i.toLong, i + 100000.0)).toDF("id", "price")
      .repartitionByRange(8, col("id"))
      .select($"id", $"price",
        struct($"id".cast("double").as("price")).as("meta"))
    t.createOrReplace(df)
    val total = t.currentManifest.files.size
    assert(t.readWhere(spark, col("meta.price") <= 100.0).count() == 100,
      "the nested predicate must return its rows (the latent mis-prune)")
    // ambiguity declines: no pruning on the nested spelling...
    assert(t.pruneCounts(col("meta.price") <= 100.0)._1 == total)
    // ...while the unambiguous top-level column still prunes
    assert(t.pruneCounts(col("price") <= 100100.0)._1 < total)
    assert(t.readWhere(spark, col("price") <= 100100.0).count() == 100)
    // SQL: both spellings answer exactly
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`${t.root}` " +
      "WHERE meta.price <= 100.0").head.getLong(0) == 100)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`${t.root}` " +
      "WHERE price <= 100100.0").head.getLong(0) == 100)
  }

  test("array-element bounds record and array_contains prunes on them") {
    val t = freshTable()
    // ranged element values: file k holds ids (250k, 250k+250] with tag
    // arrays drawn from the same range — element bounds are selective
    val df = (1 to 4000).map(i =>
        (i.toLong, Seq(i.toLong, i.toLong + 1, i.toLong + 2), Seq(i * 1.0f)))
      .toDF("id", "tags", "emb")
      .repartitionByRange(16, col("id"))
    t.createOrReplace(df)
    val m = t.currentManifest
    assert(m.files.exists(_.stats.contains("tags.list.element")),
      "array element bounds must record under the footer's element path")
    assert(m.files.exists(_.stats.contains("emb.list.element")),
      "float element bounds record too (double-safe encoding)")
    assert(m.files.forall(f => !f.stats.contains("tags")),
      "the array container itself records nothing")
    assert(m.files.forall(f => !f.nulls.contains("tags.list.element")),
      "element NULL counts are per-element, never recorded as row-level")
    val total = m.files.size
    assert(total >= 8)
    // containment on a value only few files can hold prunes the rest
    val (kept, _) = t.pruneCounts(array_contains(col("tags"), lit(100L)))
    assert(kept < total, s"array_contains must prune ($kept/$total)")
    assert(t.readWhere(spark,
      array_contains(col("tags"), lit(100L))).count() == 3,
      "ids 98,99,100 carry tag 100")
    // out-of-range value prunes EVERYTHING; result stays exact (empty)
    assert(t.pruneCounts(array_contains(col("tags"), lit(999999L)))._1 == 0)
    assert(t.readWhere(spark,
      array_contains(col("tags"), lit(999999L))).count() == 0)
    // float elements compare in the double domain (exact widening)
    assert(t.pruneCounts(array_contains(col("emb"), lit(100.0f)))._1 < total)
    assert(t.readWhere(spark,
      array_contains(col("emb"), lit(100.0f))).count() == 1)
    // STRUCTURAL proof reads never list pruned files: delete them on disk
    val doomed = m.files.filter(f =>
      f.stats.get("tags.list.element").exists(_.min.toLong > 103L))
    assert(doomed.nonEmpty)
    doomed.foreach(f => Files.delete(t.root.resolve(f.path)))
    assert(t.readWhere(spark,
      array_contains(col("tags"), lit(100L))).count() == 3)
    // SQL spells the same prune
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`${t.root}` " +
      "WHERE array_contains(tags, 100)").head.getLong(0) == 3)
    // NOT array_contains stays conservative (keeps all files) but exact
    val t2 = freshTable()
    t2.createOrReplace((1 to 100).map(i => (i.toLong, Seq(i.toLong)))
      .toDF("id", "tags"))
    assert(t2.readWhere(spark,
      !array_contains(col("tags"), lit(5L))).count() == 99)
    // a null sought value never prunes (contains is null/false, not true)
    assert(t2.readWhere(spark, array_contains(col("tags"),
      lit(null).cast("long"))).count() == 0)
  }

  test("map key/value bounds record; map_contains_key and m[k] prune") {
    val t = freshTable()
    // file k holds keys "k<range>" and values tracking the id — both
    // map bound families are selective under range clustering (one key
    // PREFIX only: a second prefix would widen every file's key range
    // across the whole alphabet and defeat the bounds)
    val df = (1 to 4000).map { i =>
        (i.toLong, Map(f"k$i%05d" -> i.toLong, f"k$i%05dx" -> (i + 1).toLong))
      }.toDF("id", "attrs")
      .repartitionByRange(16, col("id"))
    t.createOrReplace(df)
    val m = t.currentManifest
    assert(m.files.exists(_.stats.contains("attrs.key_value.key")),
      "map key bounds must record under the footer's key path")
    assert(m.files.exists(_.stats.contains("attrs.key_value.value")),
      "map value bounds must record under the footer's value path")
    assert(m.files.forall(f => !f.nulls.contains("attrs.key_value.value")),
      "map value NULL counts are per-entry, never recorded as row-level")
    val total = m.files.size
    assert(total >= 8)
    // key containment prunes to the file(s) whose key range covers it
    val kc = map_contains_key(col("attrs"), lit("k00100"))
    assert(t.pruneCounts(kc)._1 < total)
    assert(t.readWhere(spark, kc).count() == 1)
    // absent-key shape (outside every file's key range) prunes ALL files
    assert(t.pruneCounts(map_contains_key(col("attrs"), lit("zzz")))._1 == 0)
    assert(t.readWhere(spark,
      map_contains_key(col("attrs"), lit("zzz"))).count() == 0)
    // value access m[k] = v prunes on key AND value bounds
    val va = col("attrs")("k00100") === 100L
    assert(t.pruneCounts(va)._1 < total)
    assert(t.readWhere(spark, va).count() == 1)
    // a value no file holds prunes everything; result stays exact
    assert(t.pruneCounts(col("attrs")("k00100") === 999999L)._1 == 0)
    assert(t.readWhere(spark,
      col("attrs")("k00100") === 999999L).count() == 0)
    // SQL spelling m['k'] prunes the same way — structural proof: delete
    // every file whose value range sits above 200 and keep querying low
    val doomed = m.files.filter(f =>
      f.stats.get("attrs.key_value.value").exists(_.min.toLong > 200L))
    assert(doomed.nonEmpty)
    doomed.foreach(f => Files.delete(t.root.resolve(f.path)))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`${t.root}` " +
      "WHERE attrs['k00100'] = 100").head.getLong(0) == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`${t.root}` " +
      "WHERE map_contains_key(attrs, 'k00100')").head.getLong(0) == 1)
    // struct access via extraction syntax binds the dotted leaf; a MAP
    // column with a colliding dotted spelling can never bind it (guard)
    val t2 = freshTable()
    t2.createOrReplace((1 to 2000).map(i => (i.toLong, i * 1.0))
      .toDF("id", "price")
      .repartitionByRange(8, col("id"))
      .select($"id", struct($"price").as("meta")))
    assert(t2.pruneCounts(col("meta")("price") <= 100.0)._1 <
      t2.currentManifest.files.size,
      "struct extraction spelling must prune via the dotted leaf")
    assert(t2.readWhere(spark, col("meta")("price") <= 100.0).count() == 100)
  }

  test("extraction chain through a map INSIDE a struct declines — a " +
      "colliding dotted top-level column's bounds must never prune it") {
    val t = freshTable()
    // struct meta { a: map<string,long> } holds meta.a['b'] = i (small);
    // the DOTTED top-level scalar `meta.a.b` holds 100k+ — it records
    // under the exact dot-string the chain meta['a']['b'] would join to
    // (no collision drop: the map interior records under key_value.*).
    // Binding it would prune EVERY file for `= 100` — silent wrong empty
    // result. The schema walk sees step 'a' is map-typed and declines.
    val df = (1 to 2000).map(i => (i.toLong, i + 100000L, Map("b" -> i.toLong)))
      .toDF("id", "collide", "m")
      .repartitionByRange(8, col("id"))
      .select($"id", $"collide".as("meta.a.b"), struct($"m".as("a")).as("meta"))
    t.createOrReplace(df)
    val m = t.currentManifest
    assert(m.files.exists(_.stats.contains("meta.a.b")),
      "the colliding dotted scalar must have recorded bounds for the pin " +
        "to mean anything")
    val pred = col("meta")("a")("b") === 100L
    assert(t.pruneCounts(pred)._1 == m.files.size,
      "a chain descending through a map must DECLINE (no prune) — " +
        "pruning here means it bound the colliding column's bounds")
    assert(t.readWhere(spark, pred).count() == 1)
  }

  test("a top-level column spelling a struct leaf's dotted path drops " +
      "BOTH stats keys (merged bounds would decode garbage)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("meta.price", StringType),
      StructField("meta", StructType(Seq(StructField("price", DoubleType)))),
      StructField("id", LongType)))
    val keys = graft.table.FileStats.leafTypes(schema).map(_._1)
    assert(!keys.contains("meta.price"),
      s"colliding dot-string keys must drop outright (got $keys)")
    assert(keys.contains("id"))
  }

  test("metadata DELETE declines on nested predicates; CoW stays exact") {
    val t = freshTable()
    val df = (1 to 1000).map(i => i.toLong).toDF("id")
      .repartitionByRange(8, col("id"))
      .select($"id", struct($"id".cast("double").as("price")).as("meta"))
    t.createOrReplace(df)
    t.deleteWhere(spark, col("meta.price") <= 100.0)
    assert(t.read(spark).count() == 900)
    assert(t.read(spark).filter(col("meta.price") <= 100.0).count() == 0)
  }
}
