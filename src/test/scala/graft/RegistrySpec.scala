package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bucket, Registry}

/** SQL surface of the custom expressions + the partition-aware compaction
  * path.
  */
class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match their DataFrame twins") {
    Registry.registerAll(spark)
    val got = spark.sql(
      """SELECT id,
        |  graft_bucket(id, 16) AS b,
        |  graft_simhash(array(id, id * 7, id * 131)) AS sh,
        |  graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  graft_vector_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
        |FROM range(100)""".stripMargin).collect()
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == Bucket.bucket(id, 16))
      assert(r.getDouble(3) == 2.0 / 4.0)
      assert(math.abs(r.getDouble(4) - 4.0) < 1e-12)
    }
    // non-literal bucket count is rejected with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bucket(id, CAST(id AS INT)) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))

    // round-2 registrations: minhash, hyperplane keys, signature overlap
    val r2 = spark.sql(
      """SELECT graft_minhash(array(1L, 2L, 3L), 8) AS mh,
        |  graft_hyperplane_keys(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 4, 3) AS hk,
        |  graft_sig_overlap(array(1L, 2L, 3L, 9L), array(1L, 5L, 3L, 9L)) AS ov
        |FROM range(1)""".stripMargin).collect().head
    assert(r2.getSeq[Long](0).size == 8)
    assert(r2.getSeq[Long](1).size == 3)
    assert(r2.getDouble(2) == 0.75)
  }

  test("partitioned compaction splits oversized partitions by target size") {
    val root = java.nio.file.Files.createTempDirectory("graft-split-p-").toString
    val tbl = graft.table.SnapshotTable.at(root)
    // one hot partition (p=0 gets ~9000 rows), one small
    val df = (1 to 10000).map(i => (i.toLong, s"payload-$i-${"x" * 50}",
      if (i % 10 == 0) 1 else 0)).toDF("id", "payload", "p")
    tbl.createOrReplace(df, partitionColumns = Seq("p"))
    val before = tbl.currentManifest.files.count(_.partition("p") == "0")
    assert(before == 1) // clustered commit: one file for the hot partition
    // compact to a target far below the hot partition's size → split
    tbl.compact(spark, targetFileBytes = 64 * 1024)
    val hot = tbl.currentManifest.files.filter(_.partition("p") == "0")
    assert(hot.size > 1, s"expected hot partition split, got ${hot.size} file(s)")
    assert(tbl.read(spark).count() == 10000)
  }

  test("partitioned commits cluster to one file per partition; compaction preserves it") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-p-").toString
    val tbl = graft.table.SnapshotTable.at(root)
    val df = (1 to 400).map(i => (i.toLong, i % 4)).toDF("id", "p")
      .repartition(8) // deliberately scattered input
    tbl.createOrReplace(df, partitionColumns = Seq("p"))
    // the commit clusters by partition value: exactly one file per value,
    // not tasks × partitions
    assert(tbl.currentManifest.files.size == 4,
      s"got ${tbl.currentManifest.files}")
    tbl.compact(spark)
    assert(tbl.currentManifest.files.size == 4)
    assert(tbl.read(spark).count() == 400)
  }
}
