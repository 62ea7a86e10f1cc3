package graft

import java.nio.file.Files

import graft.table.{CasPublish, SnapshotTable}

/** Writable branches (Iceberg branch analog, completing r5's tags):
  * write-through-branch commits advance the branch head without moving
  * main, fast-forward publishes, heads are expiry-exempt, and the CAS
  * publisher keeps branch claims invisible to main's `current` while
  * still blocking version reuse.
  */
class BranchSpec extends SparkSpec {

  test("branch write isolates main; fast-forward publishes; expiry exempts the head") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-branch-").toString
    val t = SnapshotTable.at(root)
    val day = 24L * 3600 * 1000
    t.createOrReplace((1 to 10).map(i => (i.toLong, "v1")).toDF("id", "s"),
      nowMs = 1000L)
    t.branch("audit")
    assert(t.branches == Map("audit" -> 1L))

    // two commits THROUGH the branch: head advances, main does not move
    val b = t.atBranch("audit")
    b.append(spark, Seq((11L, "b1")).toDF("id", "s"), nowMs = 1000L + day)
    b.append(spark, Seq((12L, "b2")).toDF("id", "s"), nowMs = 1000L + day)
    assert(t.currentVersion == 1L, "main must not move on branch commits")
    assert(t.read(spark).count() == 10)
    assert(b.read(spark).count() == 12)
    assert(t.branches("audit") == 3L)
    assert(t.readBranch(spark, "audit").count() == 12)
    // SQL @suffix reads the branch head (DML through it now STAGES on
    // the branch — covered by the dedicated SQL-branch-writes test)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root@audit`")
      .head.getLong(0) == 12)

    // names share the tag namespace, both directions
    intercept[IllegalArgumentException] { t.tag("audit") }
    t.tag("pin1")
    intercept[IllegalArgumentException] { t.branch("pin1") }
    t.dropTag("pin1")

    // aggressive expiry spares the branch HEAD (and main's current);
    // the branch's intermediate commit ages out normally
    val expired = t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + 10 * day)
    assert(expired == Seq(2L), s"expired: $expired")
    assert(t.readBranch(spark, "audit").count() == 12)

    // fast-forward: main jumps to the head, the branch rebases onto it
    assert(t.fastForward("audit") == 3L)
    assert(t.currentVersion == 3L && t.read(spark).count() == 12)
    assert(t.branches("audit") == 3L)

    // main and branch now advance independently again — a diverged main
    // refuses the next fast-forward
    t.append(spark, Seq((13L, "m")).toDF("id", "s"), nowMs = 1000L + day)
    t.atBranch("audit").append(spark,
      Seq((14L, "b3")).toDF("id", "s"), nowMs = 1000L + day)
    val e = intercept[IllegalArgumentException] { t.fastForward("audit") }
    assert(e.getMessage.contains("not a fast-forward"))

    // dropping the ref releases the head to the age policy
    assert(t.dropBranch("audit"))
    intercept[IllegalArgumentException] { t.readBranch(spark, "audit") }
    intercept[IllegalArgumentException] { t.atBranch("audit") }
  }

  test("CAS publisher: branch claims reserve versions but never define main") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-branch-cas-").toString
    val t = SnapshotTable.at(root, CasPublish)
    t.createOrReplace((1 to 5).map(i => (i.toLong, "v1")).toDF("id", "s"))
    t.branch("dev")
    val b = t.atBranch("dev")
    b.append(spark, Seq((6L, "b")).toDF("id", "s"))
    // the branch claimed v2 with a content-ful marker: main's current
    // must stay 1 even though v2.json exists and is claimed
    assert(t.currentVersion == 1L,
      "a branch claim must not define main's current under CAS")
    assert(b.currentVersion == 2L)
    // the claim still blocks version reuse: main's next commit skips v2
    t.append(spark, Seq((7L, "m")).toDF("id", "s"))
    assert(t.currentVersion == 3L, "main must allocate past the branch claim")
    assert(t.read(spark).count() == 6 && b.read(spark).count() == 6)
    // main rollback leaves the branch claim (and its manifest) alone
    t.rollbackTo(1L)
    assert(t.currentVersion == 1L && b.currentVersion == 2L)
    assert(b.read(spark).count() == 6)
  }

  test("SQL branch writes: @branch suffix and graft.wap.branch stage off-main") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft-branch-sql-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 20).map(i => (i.toLong, "a")).toDF("id", "s"))
    t.branch("stage")
    // explicit @branch DML: INSERT + UPDATE land on the branch head
    spark.sql(s"INSERT INTO graft.`$root@stage` VALUES (21, 'b')")
    spark.sql(s"UPDATE graft.`$root@stage` SET s = 'u' WHERE id <= 2")
    assert(t.currentVersion == 1L && t.read(spark).count() == 20,
      "main must not see staged commits")
    assert(t.atBranch("stage").read(spark).count() == 21)
    assert(t.atBranch("stage").read(spark)
      .filter(col("s") === "u").count() == 2)
    // session WAP mode: plain-identifier DML stages on the conf's branch
    spark.conf.set("graft.wap.branch", "stage")
    try {
      spark.sql(s"DELETE FROM graft.`$root` WHERE id = 21")
      assert(t.currentVersion == 1L, "WAP-mode DML must stay off main")
      assert(t.atBranch("stage").read(spark).count() == 20)
      // WAP-mode READS audit the staged state — plain, filtered, and
      // metadata count all serve the branch head (Iceberg spark.wap.branch)
      assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$root`")
        .head.getLong(0) == 20)
      assert(spark.sql(
        s"SELECT count(*) AS c FROM graft.`$root` WHERE s = 'u'")
        .head.getLong(0) == 2)
      // a nonexistent WAP branch refuses loudly, never a silent main write
      spark.conf.set("graft.wap.branch", "ghost")
      intercept[Exception](
        spark.sql(s"DELETE FROM graft.`$root` WHERE id = 1"))
      assert(t.currentVersion == 1L)
    } finally spark.conf.unset("graft.wap.branch")
    // tags stay immutable through SQL
    t.tag("pin")
    intercept[Exception](
      spark.sql(s"DELETE FROM graft.`$root@pin` WHERE id = 1"))
    // publish: main adopts the staged lineage
    t.fastForward("stage")
    assert(t.read(spark).count() == 20 &&
      t.read(spark).filter(col("s") === "u").count() == 2)
  }

  test("@ts time travel follows the MAIN lineage: branch-staged and " +
      "rollback-abandoned snapshots never serve") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-ts-lineage-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace(Seq((1L, "main-v1")).toDF("id", "s"), nowMs = 1000L)
    t.branch("wap")
    t.atBranch("wap").append(spark,
      Seq((2L, "branch-v2")).toDF("id", "s"), nowMs = 2000L)
    t.append(spark, Seq((3L, "main-v3")).toDF("id", "s"), nowMs = 3000L)
    // ts between the branch commit and main's next commit: main's state
    // at that instant was v1 — the branch snapshot's qualifying
    // timestamp must not hijack the travel
    assert(t.readAsOf(spark, 2500L).collect().map(_.getLong(0)).toSeq ==
      Seq(1L), "a branch-staged snapshot must never serve @ts")
    assert(t.readAsOf(spark, 3500L).count() == 2)
    // abandon v3, continue on a new lineage: the abandoned snapshot's
    // timestamp window must not serve either
    t.rollbackTo(1L)
    t.append(spark, Seq((4L, "main-v4")).toDF("id", "s"), nowMs = 4000L)
    assert(t.readAsOf(spark, 3500L).collect().map(_.getLong(0)).toSeq ==
      Seq(1L), "a rollback-abandoned snapshot must never serve @ts")
    assert(t.readAsOf(spark, 4000L).count() == 2)
    // predating genesis refuses loudly
    val e = intercept[IllegalArgumentException] { t.readAsOf(spark, 500L) }
    assert(e.getMessage.contains("main-lineage"))
    // @history flags lineage membership: v1/v4 are ancestors, the
    // branch-staged v2 and abandoned v3 list but flag false
    val flags = t.history(spark).collect().map(r =>
      r.getAs[Long]("version") -> r.getAs[Boolean]("is_current_ancestor"))
      .toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true),
      s"is_current_ancestor wrong: $flags")
  }

  test("Iceberg ref DDL: CREATE/DROP BRANCH|TAG [AS OF VERSION n]") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-refddl-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 10).map(i => (i.toLong, "a")).toDF("id", "s")) // v1
    t.append(spark, Seq((11L, "b")).toDF("id", "s"))                      // v2
    spark.sql(s"ALTER TABLE graft.`$root` CREATE TAG pin AS OF VERSION 1")
    spark.sql(s"ALTER TABLE graft.`$root` CREATE BRANCH dev")
    assert(t.tags == Map("pin" -> 1L))
    assert(t.branches == Map("dev" -> 2L))
    // the created refs serve reads / branch writes like API-made ones
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$root@pin`")
      .head.getLong(0) == 10L)
    spark.sql(s"INSERT INTO graft.`$root@dev` VALUES (12, 'c')")
    assert(t.atBranch("dev").read(spark).count() == 12 &&
      t.read(spark).count() == 11)
    // duplicate: loud without IF NOT EXISTS; no-op (ref unmoved) with it
    intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$root` CREATE TAG pin"))
    spark.sql(
      s"ALTER TABLE graft.`$root` CREATE TAG IF NOT EXISTS pin AS OF VERSION 2")
    assert(t.tags("pin") == 1L, "IF NOT EXISTS must never move a ref")
    // drops: loud on a missing name, silent with IF EXISTS; DROP TAG on
    // a branch name must not delete the branch (kinds are distinct refs)
    intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$root` DROP BRANCH nope"))
    spark.sql(s"ALTER TABLE graft.`$root` DROP BRANCH IF EXISTS nope")
    intercept[Exception](spark.sql(s"ALTER TABLE graft.`$root` DROP TAG dev"))
    assert(t.branches.contains("dev"), "kind-mismatched drop must not fire")
    // OR REPLACE / REPLACE move refs; REPLACE requires existence
    spark.sql(
      s"ALTER TABLE graft.`$root` CREATE OR REPLACE TAG pin AS OF VERSION 2")
    assert(t.tags("pin") == 2L, "CREATE OR REPLACE must move the ref")
    spark.sql(s"ALTER TABLE graft.`$root` REPLACE TAG pin AS OF VERSION 1")
    assert(t.tags("pin") == 1L)
    intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$root` REPLACE BRANCH ghost AS OF VERSION 1"))
    spark.sql(s"ALTER TABLE graft.`$root` REPLACE BRANCH dev AS OF VERSION 1")
    assert(t.branches("dev") == 1L, "REPLACE BRANCH must reset the head")
    spark.sql(s"ALTER TABLE graft.`$root` DROP TAG pin")
    spark.sql(s"ALTER TABLE graft.`$root` DROP BRANCH dev")
    assert(t.tags.isEmpty && t.branches.isEmpty)
  }

  test("branch snapshot retention protects lineage; RETAIN ages the ref") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-branchret-").toString
    val t = SnapshotTable.at(root)
    val day = 24L * 3600 * 1000
    t.createOrReplace((1 to 5).map(i => (i.toLong, "v1")).toDF("id", "s"),
      nowMs = 1000L)
    spark.sql(s"ALTER TABLE graft.`$root` CREATE BRANCH dev " +
      "RETAIN 30 DAYS WITH SNAPSHOT RETENTION 2 SNAPSHOTS 3 DAYS")
    // WITH SNAPSHOT RETENTION on a tag refuses at parse time
    intercept[Exception](spark.sql(s"ALTER TABLE graft.`$root` " +
      "CREATE TAG bad WITH SNAPSHOT RETENTION 2 SNAPSHOTS"))

    val b = t.atBranch("dev")
    b.append(spark, Seq((6L, "b1")).toDF("id", "s"), nowMs = 1000L + day)
    b.append(spark, Seq((7L, "b2")).toDF("id", "s"), nowMs = 1000L + 2 * day)
    b.append(spark, Seq((8L, "b3")).toDF("id", "s"), nowMs = 1000L + 3 * day)
    assert(t.branches("dev") == 4L)

    // retention settings survive every head advance (@refs surfaces them)
    val r = spark.sql(s"SELECT max_ref_age_ms, min_snapshots_to_keep, " +
      s"max_snapshot_age_ms FROM graft.`$root@refs` WHERE name = 'dev'").head
    assert(r.getLong(0) == 30 * day && r.getLong(1) == 2L &&
      r.getLong(2) == 3 * day)

    // age-based lineage protection: at day 3.5 every branch snapshot is
    // younger than 3 days (v2 is 2.5d old) — nothing expires even under
    // an aggressive policy
    assert(t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + (3.5 * day).toLong).isEmpty)

    // count-based: at day 10 only the 2 newest lineage snapshots (v3,
    // v4) are protected; v2 ages out, v1 is main's current
    val expired = t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + 10 * day)
    assert(expired == Seq(2L), s"expired: $expired")
    assert(t.readBranch(spark, "dev").count() == 8)

    // past RETAIN 30 DAYS the ref itself drops and its lineage is
    // released in the SAME pass. Branch ref age runs off the HEAD's
    // commit timestamp (day 3) — an actively-committing branch never
    // ages out from under its writers, only an ABANDONED one does
    val expired2 = t.expireSnapshots(maxAgeMs = 1, minSnapshotsToKeep = 1,
      nowMs = 1000L + 40 * day)
    assert(expired2 == Seq(3L, 4L), s"expired: $expired2")
    assert(t.branches.isEmpty)
    assert(t.read(spark).count() == 5) // main current untouched

    // the CALL procedure spellings carry the same retention args
    spark.sql(s"CALL graft.system.create_branch(table => '$root', " +
      "name => 'ops', min_snapshots_to_keep => 3, " +
      s"max_snapshot_age_ms => ${2 * day})")
    spark.sql(s"CALL graft.system.create_tag(table => '$root', " +
      s"name => 'pin', max_ref_age_ms => ${7 * day})")
    val refs = spark.sql(s"SELECT name, min_snapshots_to_keep, " +
      s"max_snapshot_age_ms, max_ref_age_ms FROM graft.`$root@refs` " +
      "WHERE name IN ('ops', 'pin')").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(refs("ops").getLong(1) == 3L && refs("ops").getLong(2) == 2 * day)
    assert(refs("pin").getLong(3) == 7 * day)
    intercept[Exception](spark.sql(
      s"CALL graft.system.create_tag(table => '$root', name => 'bad', " +
        "min_snapshots_to_keep => 2)"))
  }

  test("two-ref fast_forward: branch adopts an ancestor-descendant head") {
    val base = spark
    import base.implicits._
    val root = Files.createTempDirectory("graft-ff2-").toString
    val t = SnapshotTable.at(root)
    t.createOrReplace((1 to 5).map(i => (i.toLong, "a")).toDF("id", "s"))
    t.branch("release")                    // pinned at v1
    t.branch("dev")                        // also v1
    val dev = t.atBranch("dev")
    dev.append(spark, Seq((6L, "d1")).toDF("id", "s"))  // v2
    dev.append(spark, Seq((7L, "d2")).toDF("id", "s"))  // v3
    // release's head (v1) is an ancestor of dev's (v3): fast-forward
    spark.sql(s"CALL graft.system.fast_forward(table => '$root', " +
      "branch => 'release', to => 'dev')")
    assert(t.branches("release") == 3L &&
      t.readBranch(spark, "release").count() == 7)
    assert(t.currentVersion == 1L, "main must not move")
    // diverged refs refuse: release and a fresh fork of main share no
    // fast-forward relation once both advance
    t.branch("hotfix")                     // v1
    t.atBranch("hotfix").append(spark, Seq((8L, "h")).toDF("id", "s")) // v4
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.fast_forward(table => '$root', " +
        "branch => 'release', to => 'hotfix')"))
    assert(e.getMessage.contains("not a fast-forward") ||
      Option(e.getCause).exists(_.getMessage.contains("not a fast-forward")))
    // the 'main' spelling is the classic publish
    spark.sql(s"CALL graft.system.fast_forward(table => '$root', " +
      "branch => 'main', to => 'hotfix')")
    assert(t.currentVersion == 4L && t.read(spark).count() == 6)
    // main as the SOURCE ref (Iceberg's catch-a-branch-up-to-main):
    // main has no branch-ref file — its head is the current pointer
    t.branch("lag")                                            // at v4
    t.append(spark, Seq((9L, "m")).toDF("id", "s"))            // v5 main
    spark.sql(s"CALL graft.system.fast_forward(table => '$root', " +
      "branch => 'lag', to => 'main')")
    assert(t.branches("lag") == 5L &&
      t.readBranch(spark, "lag").count() == t.read(spark).count())
    // a branch DIVERGED from main still refuses main as source
    val e2 = intercept[Exception](spark.sql(
      s"CALL graft.system.fast_forward(table => '$root', " +
        "branch => 'release', to => 'main')"))
    assert(e2.getMessage.contains("not a fast-forward") ||
      Option(e2.getCause).exists(_.getMessage.contains("not a fast-forward")))
  }
}
