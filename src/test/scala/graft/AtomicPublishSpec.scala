package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.table.{AtomicPublish, CasPublish, FileLockPublish, SnapshotTable}

/** The pluggable commit-publish layer: the concurrency guarantees that
  * SnapshotTableSpec pins for the default FileChannel-lock publisher must
  * hold identically under the optimistic CAS publisher, plus the
  * CAS-specific behaviors (lost-race retry, cross-process claim
  * atomicity, dead-claim version skip, impl interop).
  */
class AtomicPublishSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2026-02-01 00:00:00")

  private def batch(ids: Range, upd: Timestamp, v: Double) =
    ids.map(i => (i.toLong, upd, v)).toDF("id", "updated_at", "v")

  private def withP(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("p", col("id") % 4)

  private def fresh(pub: AtomicPublish) =
    SnapshotTable.at(Files.createTempDirectory("graft-pub-").toString, pub)

  /** Forwarding publisher that fires `race` once, right before the first
    * publish attempt — deterministically simulating a concurrent
    * committer landing between this commit's plan and its publish.
    */
  private final class RaceOnce(inner: AtomicPublish, race: () => Unit)
      extends AtomicPublish {
    @volatile private var fired = false
    def name: String = inner.name + "+race"
    def current(metaDir: Path): Option[Long] = inner.current(metaDir)
    def critical[T](root: Path, metaDir: Path)(f: => T): T =
      inner.critical(root, metaDir)(f)
    def tryPublish(metaDir: Path, expected: Option[Long], v: Long,
                   staged: Path): Boolean = {
      if (!fired) { fired = true; race() }
      inner.tryPublish(metaDir, expected, v, staged)
    }
    def forceCurrent(metaDir: Path, v: Long): Unit =
      inner.forceCurrent(metaDir, v)
    def claimedVersions(metaDir: Path): Seq[Long] =
      inner.claimedVersions(metaDir)
  }

  // the SnapshotTableSpec concurrency contract, parameterized over impls
  for (pub <- Seq(FileLockPublish, CasPublish)) {
    test(s"[${pub.name}] disjoint concurrent merges both land, overlap aborts") {
      val tbl = fresh(pub)
      tbl.createOrReplace(withP(batch(1 to 100, t0, 1.0)), Seq("p"))
      val base = tbl.currentVersion
      val changesA = withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 0)
        .withColumn("op", lit("U"))
      val changesB = withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 1)
        .withColumn("op", lit("U"))
      tbl.merge(spark, changesB, Seq("id"), keepDeletes = false,
        targetTransform = t => {
          tbl.merge(spark, changesA, Seq("id"), keepDeletes = false)
          t
        })
      assert(tbl.currentVersion == base + 2, "both merges must commit")
      val out = tbl.read(spark)
      assert(out.count() == 100)
      assert(out.filter(col("p") === 0 && col("v") === 2.0).count() == 25)
      assert(out.filter(col("p") === 1 && col("v") === 2.0).count() == 25)
      val e = intercept[IllegalStateException] {
        tbl.merge(spark, changesA, Seq("id"), keepDeletes = false,
          targetTransform = t => {
            tbl.merge(spark,
              withP(batch(1 to 100, Timestamp.valueOf("2026-03-01 00:00:00"), 3.0))
                .filter(col("p") === 0).withColumn("op", lit("U")),
              Seq("id"), keepDeletes = false)
            t
          })
      }
      assert(e.getMessage.contains("concurrent commit"))
    }

    test(s"[${pub.name}] rollback, recommit, and time travel stay consistent") {
      val tbl = fresh(pub)
      tbl.createOrReplace(batch(1 to 10, t0, 1.0))
      tbl.createOrReplace(batch(1 to 20, t1, 2.0))
      assert(tbl.currentVersion == 2)
      tbl.rollbackTo(1)
      assert(tbl.currentVersion == 1)
      assert(tbl.read(spark).count() == 10)
      // rolled-over snapshot stays time-travelable; next commit goes ABOVE it
      assert(tbl.readVersion(spark, 2).count() == 20)
      tbl.createOrReplace(batch(1 to 30, t1, 3.0))
      assert(tbl.currentVersion == 3)
      assert(tbl.read(spark).count() == 30)
    }
  }

  test("cas: a lost publish race deletes the stage, rebuilds, and lands") {
    val dir = Files.createTempDirectory("graft-pub-").toString
    // competing committer uses its own handle on the same root
    val rival = SnapshotTable.at(dir, CasPublish)
    rival.createOrReplace(withP(batch(1 to 100, t0, 1.0)), Seq("p"))
    val base = rival.currentVersion
    val racePub = new RaceOnce(CasPublish, () =>
      rival.merge(spark,
        withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 1)
          .withColumn("op", lit("U")),
        Seq("id"), keepDeletes = false))
    val tbl = SnapshotTable.at(dir, racePub)
    // this merge's first tryPublish loses to the rival's commit (fired
    // right before the publish, after this merge planned) and must retry:
    // rebuild against the rival's manifest (disjoint partitions → rebase
    // carries them) and land one version later
    tbl.merge(spark,
      withP(batch(1 to 100, t1, 2.0)).filter(col("p") === 0)
        .withColumn("op", lit("U")),
      Seq("id"), keepDeletes = false)
    assert(tbl.currentVersion == base + 2, "rival's commit AND ours must land")
    val out = tbl.read(spark)
    assert(out.count() == 100)
    assert(out.filter(col("p") === 0 && col("v") === 2.0).count() == 25)
    assert(out.filter(col("p") === 1 && col("v") === 2.0).count() == 25)
    // no stage debris left behind by the lost attempt
    val stages = scala.util.Using.resource(
      Files.list(Paths.get(dir, "meta")))(s =>
      s.iterator().asScala.count(_.getFileName.toString.startsWith("_stage-")))
    assert(stages == 0, "lost publish attempts must clean their staged manifest")
  }

  test("cas: a metadata delete racing an append rebases and lands; an " +
      "append into the dropped partition aborts it") {
    val dir = Files.createTempDirectory("graft-pub-").toString
    val rival = SnapshotTable.at(dir, CasPublish)
    rival.createOrReplace(withP(batch(1 to 100, t0, 1.0)), Seq("p"))
    // rival appends to OTHER partitions right before the drop's publish:
    // the drop must rebase onto the winner's manifest — its survivors
    // include the freshly-appended files, and the commit stays metadata
    val racePub = new RaceOnce(CasPublish, () =>
      rival.append(spark,
        withP(batch(101 to 120, t0, 1.0)).filter(col("p") =!= 0)))
    val tbl = SnapshotTable.at(dir, racePub)
    tbl.deleteWhere(spark, col("p") === 0)
    assert(tbl.currentManifest.operation == "delete")
    val out = tbl.read(spark)
    assert(out.filter(col("p") === 0).count() == 0)
    assert(out.count() ==
      75L + (101 to 120).count(_ % 4 != 0),
      "the rival's appended rows must survive the rebased drop")
    // an append INTO the partition being dropped invalidates the census:
    // the rebase must refuse, never silently drop the new rows
    val racePub2 = new RaceOnce(CasPublish, () =>
      rival.append(spark,
        withP(batch(200 to 203, t0, 1.0)).filter(col("p") === 1)))
    val tbl2 = SnapshotTable.at(dir, racePub2)
    intercept[IllegalStateException] {
      tbl2.deleteWhere(spark, col("p") === 1)
    }
    assert(SnapshotTable.at(dir, CasPublish).read(spark)
      .filter(col("p") === 1).count() > 0,
      "the aborted drop must leave the rival's rows visible")
  }

  test("cas: an UNPARTITIONED metadata delete racing any concurrent " +
      "append aborts (the whole table is the touched scope)") {
    val dir = Files.createTempDirectory("graft-pub-").toString
    val rival = SnapshotTable.at(dir, CasPublish)
    rival.createOrReplace(batch(1 to 50, t0, 1.0))
    rival.append(spark, batch(51 to 100, t0, 1.0))
    // rival appends rows that MATCH the delete predicate right before
    // the drop's publish: an unpartitioned drop has no partition census
    // to scope the race — ANY concurrent file change invalidates the
    // per-file proof, same isolation as the CoW rewrite path
    val racePub = new RaceOnce(CasPublish, () =>
      rival.append(spark, batch(1 to 10, t1, 9.0)))
    val tbl = SnapshotTable.at(dir, racePub)
    val e = intercept[IllegalStateException] {
      tbl.deleteWhere(spark, col("id") <= 50)
    }
    assert(e.getMessage.contains("concurrent commit"))
    val out = SnapshotTable.at(dir, CasPublish).read(spark)
    assert(out.count() == 110, "the aborted drop must leave all rows visible")
    assert(out.filter(col("v") === 9.0).count() == 10,
      "the rival's matching rows must survive")
  }

  test("cas: exactly one of two JVMs wins a simultaneous version claim") {
    val dir = Files.createTempDirectory("graft-pub-")
    val claim = dir.resolve("meta/_claims/v7")
    Files.createDirectories(claim.getParent)
    val proc = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/java", "-cp", helperCp,
      "graft.ClaimRacer", claim.toString, "wait")
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(out.readLine() == "READY")
    proc.getOutputStream.write('\n'); proc.getOutputStream.flush()
    val mineWon =
      try { Files.createFile(claim); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    val theirs = out.readLine()
    proc.waitFor()
    assert(mineWon ^ (theirs == "WON"),
      s"claim atomicity violated: mine=$mineWon helper=$theirs")
  }

  test("cas: a foreign claim skips the version; aged dead claims are swept") {
    val tbl = fresh(CasPublish)
    tbl.createOrReplace(batch(1 to 10, t0, 1.0))
    // another process claimed v2 and crashed before installing its
    // manifest (plant the claim from a genuinely separate JVM)
    val claim = tbl.root.resolve("meta/_claims/v2")
    val proc = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/java", "-cp", helperCp,
      "graft.ClaimRacer", claim.toString)
      .redirectErrorStream(true).start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(out.readLine() == "WON"); proc.waitFor()
    // the dead claim is invisible to readers but blocks version reuse
    assert(tbl.currentVersion == 1)
    tbl.createOrReplace(batch(1 to 20, t1, 2.0))
    assert(tbl.currentVersion == 3, "claimed-but-unpublished v2 must be skipped")
    assert(tbl.read(spark).count() == 20)
    // young claim survives maintenance; aged out, it is reclaimed
    assert(!tbl.removeOrphanFiles().contains("meta/_claims/v2"))
    assert(Files.exists(claim))
    val later = System.currentTimeMillis() + 4L * 24 * 3600 * 1000
    assert(tbl.removeOrphanFiles(nowMs = later).contains("meta/_claims/v2"))
    assert(!Files.exists(claim))
  }

  test("impl interop: lock-written history continues under cas and back") {
    val dir = Files.createTempDirectory("graft-pub-").toString
    val lockT = SnapshotTable.at(dir, FileLockPublish)
    lockT.createOrReplace(batch(1 to 10, t0, 1.0))
    lockT.createOrReplace(batch(1 to 20, t1, 2.0))
    val casT = SnapshotTable.at(dir, CasPublish)
    assert(casT.currentVersion == 2)
    assert(casT.read(spark).count() == 20)
    casT.createOrReplace(batch(1 to 30, t1, 3.0))
    assert(casT.currentVersion == 3)
    // the CAS publish maintains the pointer, so a lock-impl handle (and
    // any reader without CAS awareness) sees the same current version
    val lockAgain = SnapshotTable.at(dir, FileLockPublish)
    assert(lockAgain.currentVersion == 3)
    assert(lockAgain.read(spark).count() == 30)
  }

  private def helperCp: String = {
    val testClasses = new java.io.File(ClaimRacer.getClass.getProtectionDomain
      .getCodeSource.getLocation.toURI).getAbsolutePath
    val scalaLib = new java.io.File(classOf[scala.Function0[_]]
      .getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
    testClasses + java.io.File.pathSeparator + scalaLib
  }

}
