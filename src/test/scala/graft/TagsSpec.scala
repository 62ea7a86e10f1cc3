package graft

import java.nio.file.Files

import graft.table.SnapshotTable

/** Named tags (Iceberg refs analog): pinned reads, SQL `@tag` suffix,
  * expiry exemption while the ref lives, reclamation after drop.
  */
class TagsSpec extends SparkSpec {

  test("tag pins a snapshot: reads, SQL suffix, expiry exemption") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-tags-").toString
    val t = SnapshotTable.at(root)
    val day = 24L * 3600 * 1000
    t.createOrReplace((1 to 10).map(i => (i.toLong, "v1")).toDF("id", "s"),
      nowMs = 1000L)
    t.tag("release-1")
    t.createOrReplace((1 to 12).map(i => (i.toLong, "v2")).toDF("id", "s"),
      nowMs = 1000L + day)
    t.createOrReplace((1 to 15).map(i => (i.toLong, "v3")).toDF("id", "s"),
      nowMs = 1000L + 2 * day)

    assert(t.tags == Map("release-1" -> 1L))
    assert(t.readTag(spark, "release-1").count() == 10)
    // SQL suffix (reserved shapes still win; tag names can't take them)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root@release-1`")
      .head.getLong(0) == 10)
    intercept[IllegalArgumentException] { t.tag("v7") } // reserved shape
    intercept[Exception] { // no DML through a tag
      spark.sql(s"DELETE FROM graft.`$root@release-1` WHERE id = 1")
    }

    // aggressive expiry spares ONLY the tagged snapshot (and current)
    val expired = t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + 10 * day)
    assert(expired == Seq(2L), s"expired: $expired")
    assert(t.readTag(spark, "release-1").count() == 10)

    // dropping the ref releases the snapshot to the age policy
    assert(t.dropTag("release-1"))
    assert(t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + 10 * day) == Seq(1L))
    intercept[IllegalArgumentException] { t.readTag(spark, "release-1") }
    assert(t.read(spark).count() == 15) // current untouched throughout
  }
}
