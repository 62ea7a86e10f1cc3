package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, DoubleType, StructField}

import graft.table.SnapshotTable

/** Column RENAME and TYPE-WIDENING evolution: metadata-only commits whose
  * seq-keyed epoch chains let pre-evolution files read (and prune) under
  * the physical (name, type) they were written with.
  */
class RenameWidenSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String) = {
    val root = Files.createTempDirectory(prefix).toString
    (root, SnapshotTable.at(root))
  }

  test("rename: carried files serve values; pruning still prunes; mixed epochs") {
    val (root, t) = fresh("graft-ren-")
    val rows = (1 to 400).map(i => (i.toLong, i.toLong % 4, i * 10))
      .toDF("id", "p", "amount")
    t.createOrReplace(rows, Seq("p"), nowMs = 1000L)

    t.renameColumn("amount", "total")
    assert(t.read(spark).columns.toSeq == Seq("id", "p", "total"))
    assert(t.read(spark).agg(sum("total")).head.getLong(0) ==
      (1 to 400).map(_ * 10L).sum)

    // pruning on the RENAMED column still uses the old files' stats
    val (kept, totalFiles) = t.pruneCounts(col("total") > 3990)
    assert(totalFiles == 4 && kept == 1,
      s"stats pruning must survive the rename ($kept/$totalFiles kept)")

    // a post-rename write mixes epochs: both resolve under the new name
    t.updateWhere(spark, Seq("total" -> lit(7L)), col("id") <= 8)
    val got = t.read(spark)
    assert(got.filter(col("id") <= 8 && col("total") === 7).count() == 8)
    assert(got.filter(col("total") =!= 7).count() == 392)

    // reopen from disk: the chain survives the JSON round-trip
    assert(SnapshotTable.at(root).read(spark)
      .filter(col("total") === 7).count() == 8)
  }

  test("widen: int->bigint and float->double cast up across epochs") {
    val (_, t) = fresh("graft-widen-")
    val rows = (1 to 100)
      .map(i => (i.toLong, i, i.toFloat / 2))
      .toDF("id", "n", "x")
    t.createOrReplace(rows, Nil, nowMs = 1000L)

    t.widenColumn("n", LongType)
    t.widenColumn("x", DoubleType)
    val sch = t.read(spark).schema
    assert(sch("n").dataType == LongType && sch("x").dataType == DoubleType)
    // old files' ints/floats surface widened, values exact
    assert(t.read(spark).agg(sum("n")).head.getLong(0) == 5050L)
    assert(t.read(spark).filter(col("id") === 3).select("x")
      .head.getDouble(0) == 1.5)

    // post-widen appends land in the wide type; both epochs union
    t.append(spark, Seq((101L, 5000000000L, 0.25)).toDF("id", "n", "x"))
    assert(t.read(spark).agg(max("n")).head.getLong(0) == 5000000000L)

    // narrowing is refused loudly
    val e = intercept[IllegalArgumentException] {
      t.widenColumn("n", IntegerType)
    }
    assert(e.getMessage.contains("widen"))
  }

  test("widen: decimal precision grows at the same scale; scale changes refuse") {
    import org.apache.spark.sql.types.DecimalType
    val (_, t) = fresh("graft-widen-dec-")
    val rows = (1 to 100).map(i => (i.toLong, BigDecimal(i) / 4))
      .toDF("id", "amt")
      .select(col("id"), col("amt").cast(DecimalType(10, 2)).as("amt"))
    t.createOrReplace(rows, Nil, nowMs = 1000L)
    t.widenColumn("amt", DecimalType(20, 2))
    assert(t.read(spark).schema("amt").dataType == DecimalType(20, 2))
    // carried decimal(10,2) files surface widened, values exact
    assert(t.read(spark).agg(sum("amt")).head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("1262.50")) == 0)
    // a post-widen append can hold values the old precision could not
    t.append(spark, Seq((101L, "123456789012345678.99")).toDF("id", "amt")
      .select(col("id"), col("amt").cast(DecimalType(20, 2)).as("amt")))
    assert(t.read(spark).agg(max("amt")).head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("123456789012345678.99")) == 0)
    // scale changes and narrowing refuse — both would re-represent data
    intercept[IllegalArgumentException](t.widenColumn("amt", DecimalType(30, 4)))
    intercept[IllegalArgumentException](t.widenColumn("amt", DecimalType(10, 2)))
  }

  test("chained rename + widen; SQL spellings; refusals") {
    val (root, t) = fresh("graft-chain-")
    t.createOrReplace((1 to 50).map(i => (i.toLong, i, s"g${i % 3}"))
      .toDF("id", "n", "p"), Seq("p"), nowMs = 1000L)

    val base = spark
    base.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN n TO cnt")
    base.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN cnt TYPE BIGINT")
    base.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN cnt TO hits")
    val got = base.sql(s"SELECT sum(hits) AS s FROM graft.`$root`").head
    assert(got.getLong(0) == 1275L)
    assert(t.currentManifest.properties.keys.count(_.startsWith("graft.evolution.")) == 1)

    // partition columns cannot be renamed (path-encoded)
    val e1 = intercept[IllegalArgumentException] { t.renameColumn("p", "q") }
    assert(e1.getMessage.contains("partition column"))
    // the old name cannot be re-added while pre-rename files live
    val e2 = intercept[IllegalArgumentException] {
      t.addColumns(Seq(StructField("n", IntegerType)))
    }
    assert(e2.getMessage.toLowerCase.contains("column"))
    // ... but once every file is rewritten past the rename (selective
    // compaction may carry adequately-sized pre-rename files — the
    // z-order rewrite touches them all), it can
    t.rewriteZOrder(spark, Seq("id"))
    t.addColumns(Seq(StructField("n", IntegerType)))
    assert(t.read(spark).filter(col("n").isNull).count() == 50)
  }

  test("rename refused while equality deletes reference the column") {
    val (_, t) = fresh("graft-ren-mor-")
    t.createOrReplace((1 to 60).map(i => (i.toLong, s"v$i")).toDF("k", "s"),
      nowMs = 1000L)
    t.mergeMoR(spark,
      Seq((3L, "v3b", "U")).toDF("k", "s", "op"), Seq("k"),
      keepDeletes = false, nowMs = 2000L)
    assert(t.currentManifest.deleteFiles.nonEmpty)
    val e = intercept[IllegalArgumentException] { t.renameColumn("k", "kk") }
    assert(e.getMessage.contains("equality-delete"))
    // folding the deletes unblocks the rename
    t.compact(spark, nowMs = 3000L)
    t.renameColumn("k", "kk")
    assert(t.read(spark).filter(col("kk") === 3L).select("s")
      .head.getString(0) == "v3b")
  }
}
