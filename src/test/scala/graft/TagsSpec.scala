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

  test("RETAIN ages the tag out; retention-free tags never age") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-tagret-").toString
    val t = SnapshotTable.at(root)
    val day = 24L * 3600 * 1000
    t.createOrReplace((1 to 5).map(i => (i.toLong, "v1")).toDF("id", "s"),
      nowMs = 1000L)
    t.createOrReplace((1 to 7).map(i => (i.toLong, "v2")).toDF("id", "s"),
      nowMs = 1000L + day)
    t.createOrReplace((1 to 9).map(i => (i.toLong, "v3")).toDF("id", "s"),
      nowMs = 1000L + 2 * day)
    spark.sql(s"ALTER TABLE graft.`$root` CREATE TAG aged AS OF VERSION 1 " +
      "RETAIN 7 DAYS")
    t.tag("forever", 2L) // no retention: the pre-retention behavior

    // @refs surfaces the retention
    val refRow = spark.sql(
      s"SELECT max_ref_age_ms FROM graft.`$root@refs` WHERE name = 'aged'")
      .head
    assert(refRow.getLong(0) == 7 * day)

    // before the ref ages: both tags protect their snapshots
    assert(t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + 5 * day).isEmpty)

    // past RETAIN: the aged tag drops and v1 expires in the SAME pass;
    // the retention-free tag still protects v2. Ref age runs off the
    // PINNED snapshot's timestamp (v1 committed at 1000), like Iceberg
    val expired = t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + 10 * day)
    assert(expired == Seq(1L), s"expired: $expired")
    assert(t.tags.keySet == Set("forever"))
    assert(t.readTag(spark, "forever").count() == 7)
  }
}
