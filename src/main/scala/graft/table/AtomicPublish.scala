package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** The commit-publish atomicity primitive of [[SnapshotTable]], extracted
  * so the storage backend's native atomic operation is a driver swap, not
  * a table-format rewrite (the reference gets commit atomicity from the
  * Glue catalog's conditional `metadata_location` update,
  * common/iceberg.py:280-289; an S3 deployment of this engine would add an
  * impl backed by that kind of catalog CAS or S3 conditional-put).
  *
  * Two shipped impls:
  *   - [[FileLockPublish]] (default): exclusive `meta/_lock` FileChannel
  *     lock around the whole build+publish critical section. Correct and
  *     contention-free on any POSIX filesystem.
  *   - [[CasPublish]]: optimistic expected-version publish. No lock is
  *     held across the manifest build; publication atomically CLAIMS the
  *     version number (`meta/_claims/v<N>`, atomic create-file — the
  *     portable filesystem analog of a catalog's conditional update) and
  *     only the claim winner installs its staged manifest. A loser's
  *     publish fails cleanly and [[SnapshotTable]] retries the build
  *     against the refreshed manifest (the same rebase path a same-JVM
  *     race takes).
  *
  * Contract notes shared by impls:
  *   - `tryPublish` must either install `staged` as `meta/v<v>.json` with
  *     `v` visible to `current` (return true) or leave the table state
  *     unchanged and delete `staged` (return false). It must never
  *     half-publish.
  *   - `current` must only ever return versions whose manifest is present
  *     and fully written.
  *   - A table must be driven by ONE impl at a time (deployment choice);
  *     on-disk layouts are forward/backward compatible so switching
  *     between runs is safe, but concurrent mixed-impl writers are not.
  */
trait AtomicPublish {
  def name: String

  /** Currently committed version visible to readers; None = no commit. */
  def current(metaDir: Path): Option[Long]

  /** Serialize the build+stage+publish section as the impl requires.
    * [[FileLockPublish]] takes the cross-process exclusive lock (builds
    * serialize; `tryPublish` then cannot lose). [[CasPublish]] serializes
    * same-JVM threads only (the per-root monitor keeps one process from
    * racing itself); cross-process conflicts surface in `tryPublish`.
    */
  def critical[T](root: Path, metaDir: Path)(f: => T): T

  /** Atomically publish the staged manifest as version `v`, conditioned on
    * the committer having planned against `expected`. True = `v` is live.
    */
  def tryPublish(metaDir: Path, expected: Option[Long], v: Long,
                 staged: Path): Boolean

  /** Point `current` at an OLDER retained version (rollback). Caller holds
    * `critical` and has validated `v` is a retained manifest version.
    */
  def forceCurrent(metaDir: Path, v: Long): Unit

  /** Version numbers some committer has ever claimed, manifest or not. A
    * claim without a manifest is a crashed publish; `nextVersion` must not
    * re-allocate it (the claim file can never be created again).
    */
  def claimedVersions(metaDir: Path): Seq[Long]
}

private[table] object PublishFiles {
  def pointer(metaDir: Path): Path = metaDir.resolve("_current")

  def readPointer(metaDir: Path): Option[Long] = {
    val p = pointer(metaDir)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
  }

  /** Write the pointer via unique temp + atomic move (readers never see a
    * partial write).
    */
  def writePointer(metaDir: Path, v: Long, tag: String): Unit = {
    val tmp = metaDir.resolve(s"_current.tmp$tag$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(metaDir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Default publisher: exclusive cross-process file lock held across the
  * whole commit critical section (see SnapshotTableSpec's two-JVM test).
  */
object FileLockPublish extends AtomicPublish {
  import PublishFiles._

  val name = "filelock"

  def current(metaDir: Path): Option[Long] = readPointer(metaDir)

  def critical[T](root: Path, metaDir: Path)(f: => T): T =
    SnapshotTable.lockFor(root).synchronized {
      Files.createDirectories(metaDir)
      val ch = java.nio.channels.FileChannel.open(metaDir.resolve("_lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try f finally lock.release()
      } finally ch.close()
    }

  def tryPublish(metaDir: Path, expected: Option[Long], v: Long,
                 staged: Path): Boolean = {
    // under the held exclusive lock the pointer cannot have moved; check
    // anyway so a misuse outside `critical` fails loudly instead of
    // silently clobbering a concurrent commit
    if (current(metaDir) != expected) { Files.deleteIfExists(staged); return false }
    // REPLACE_EXISTING: a ghost manifest (crash between manifest install
    // and pointer move) is deliberately overwritten on version reuse
    Files.move(staged, metaDir.resolve(s"v$v.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    writePointer(metaDir, v, "")
    true
  }

  def forceCurrent(metaDir: Path, v: Long): Unit =
    writePointer(metaDir, v, ".rb")

  def claimedVersions(metaDir: Path): Seq[Long] = Nil
}

/** Optimistic expected-version publisher: commit atomicity comes from the
  * atomic creation of a per-version claim marker, not a held lock — the
  * filesystem stand-in for a catalog's conditional pointer update. Builds
  * from different processes proceed concurrently; the claim decides the
  * winner and the loser rebuilds against the winner's manifest.
  */
object CasPublish extends AtomicPublish {
  import PublishFiles._

  val name = "cas"

  private def claimsDir(metaDir: Path): Path = metaDir.resolve("_claims")

  def claimedVersions(metaDir: Path): Seq[Long] = {
    val d = claimsDir(metaDir)
    if (!Files.exists(d)) Nil
    else scala.util.Using.resource(Files.list(d)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d+") => s.stripPrefix("v").toLong }
        .toSeq
    }
  }

  /** Newest MAIN-lineage claimed version whose manifest is installed; the
    * pointer file (maintained as a best-effort cache, and the source of
    * truth for tables last written by [[FileLockPublish]]) participates
    * in the max, so histories are readable across impl switches. A claim
    * whose manifest install never completed (crash) is skipped here but
    * still blocks version reuse via [[claimedVersions]]; a claim with
    * CONTENT is a BRANCH commit ([[BranchPublish]]) — it reserves its
    * version number globally but must never define main's current.
    */
  def current(metaDir: Path): Option[Long] = {
    val claimed = claimedVersions(metaDir)
      .filter { v =>
        val c = claimsDir(metaDir).resolve(s"v$v")
        Files.exists(metaDir.resolve(s"v$v.json")) &&
          (try Files.size(c) == 0L
           catch { case _: java.io.IOException => false })
      }
    (claimed ++ readPointer(metaDir)).maxOption
  }

  /** Claim `v` for a non-main (branch) lineage: atomic create with the
    * branch name as content, so [[current]] skips it while
    * [[claimedVersions]] still blocks version reuse. False = claim lost.
    */
  private[table] def claimForBranch(metaDir: Path, v: Long,
                                    branch: String): Boolean = {
    Files.createDirectories(claimsDir(metaDir))
    try {
      Files.write(claimsDir(metaDir).resolve(s"v$v"),
        branch.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: FileAlreadyExistsException => false }
  }

  def critical[T](root: Path, metaDir: Path)(f: => T): T =
    SnapshotTable.lockFor(root).synchronized {
      Files.createDirectories(metaDir)
      f
    }

  def tryPublish(metaDir: Path, expected: Option[Long], v: Long,
                 staged: Path): Boolean = {
    // cheap pre-check: racing committer already published past our base
    if (current(metaDir) != expected) { Files.deleteIfExists(staged); return false }
    Files.createDirectories(claimsDir(metaDir))
    try Files.createFile(claimsDir(metaDir).resolve(s"v$v"))
    catch {
      case _: FileAlreadyExistsException =>
        Files.deleteIfExists(staged); return false
    }
    // claim won: we are the only committer ever allowed to install v<v>.
    // REPLACE_EXISTING covers one mixed-history edge: a lock-era crash's
    // ghost manifest (written, never pointed, no claim) deliberately gets
    // overwritten on version reuse, same as under FileLockPublish.
    Files.move(staged, metaDir.resolve(s"v$v.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // best-effort pointer cache: two racing winners' pointer writes can
    // land out of order, which `current`'s max-over-claims absorbs
    writePointer(metaDir, v, s".c")
    true
  }

  /** Rollback: MAIN claims above `v` stop defining `current` by deleting
    * their markers; their manifests stay retained for time travel, and
    * version reuse is prevented by the high-water mark exactly as with
    * the lock impl. BRANCH claims (content-ful) are left alone — their
    * lineages are independent of main's rollback, and deleting one would
    * re-open its version number for reuse under a still-live ref.
    */
  def forceCurrent(metaDir: Path, v: Long): Unit = {
    claimedVersions(metaDir).filter(_ > v)
      .foreach { c =>
        val p = claimsDir(metaDir).resolve(s"v$c")
        val isMain = try Files.size(p) == 0L
                     catch { case _: java.io.IOException => false }
        if (isMain) Files.deleteIfExists(p)
      }
    writePointer(metaDir, v, ".rb")
  }
}

/** A writable branch ref: `head` is the branch's current snapshot,
  * `base` the main version the lineage last diverged from (what
  * fast-forward validates against). Persisted as `meta/_branch-<name>`
  * containing `"<head> <base>[ key=value ...]"`, written via temp +
  * atomic move. The optional trailing pairs carry Iceberg's per-ref
  * retention knobs (`RETAIN` / `WITH SNAPSHOT RETENTION`); a legacy
  * two-token file reads as the defaults — no retention, head-only
  * snapshot protection — so pre-retention refs keep their exact old
  * expiry behavior (never age, exempt head).
  */
private[table] final case class BranchRef(head: Long, base: Long,
    maxRefAgeMs: Long = -1L,
    minSnapshotsToKeep: Int = 1, maxSnapshotAgeMs: Long = -1L)

private[table] object BranchRefs {
  def file(metaDir: Path, name: String): Path =
    metaDir.resolve(s"_branch-$name")

  def read(p: Path): Option[BranchRef] =
    if (!Files.exists(p)) None
    else scala.util.Try {
      val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.split("\\s+")
      val kv = parts.drop(2).flatMap { t =>
        t.split("=", 2) match {
          case Array(k, v) => Some(k -> v.toLong)
          case _           => None
        }
      }.toMap
      BranchRef(parts(0).toLong, parts(1).toLong,
        maxRefAgeMs = kv.getOrElse("max-ref-age-ms", -1L),
        minSnapshotsToKeep =
          kv.getOrElse("min-snapshots-to-keep", 1L).toInt,
        maxSnapshotAgeMs = kv.getOrElse("max-snapshot-age-ms", -1L))
    }.toOption

  def write(p: Path, ref: BranchRef): Unit = {
    val tmp = p.resolveSibling(
      s".${p.getFileName}.tmp${java.util.UUID.randomUUID.toString.take(8)}")
    val extras = Seq(
      Option.when(ref.maxRefAgeMs >= 0)(s"max-ref-age-ms=${ref.maxRefAgeMs}"),
      Option.when(ref.minSnapshotsToKeep > 1)(
        s"min-snapshots-to-keep=${ref.minSnapshotsToKeep}"),
      Option.when(ref.maxSnapshotAgeMs >= 0)(
        s"max-snapshot-age-ms=${ref.maxSnapshotAgeMs}")).flatten
    val body = (s"${ref.head} ${ref.base}" +: extras).mkString(" ")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Publisher for commits THROUGH A BRANCH (Iceberg write-to-branch
  * analog): `current` is the branch head, publication advances the
  * branch ref and never touches main's pointer. Version numbers come
  * from the shared sequence — under [[FileLockPublish]] the held lock
  * makes allocation race-free; under [[CasPublish]] the branch claims
  * its version with a CONTENT-ful marker ([[CasPublish.claimForBranch]])
  * that blocks reuse globally while staying invisible to main's
  * `current`. Manifests land in the same `meta/` as main's (they ARE
  * retained snapshots: global version time travel, orphan protection and
  * expiry see them), only the ref differs.
  */
private[table] final class BranchPublish(inner: AtomicPublish,
                                         branch: String) extends AtomicPublish {
  val name = s"${inner.name}+branch($branch)"

  private def ref(metaDir: Path) = BranchRefs.file(metaDir, branch)

  def current(metaDir: Path): Option[Long] =
    BranchRefs.read(ref(metaDir)).map(_.head)

  def critical[T](root: Path, metaDir: Path)(f: => T): T =
    inner.critical(root, metaDir)(f)

  def claimedVersions(metaDir: Path): Seq[Long] = inner.claimedVersions(metaDir)

  def tryPublish(metaDir: Path, expected: Option[Long], v: Long,
                 staged: Path): Boolean = {
    val r = BranchRefs.read(ref(metaDir))
    if (r.map(_.head) != expected) { Files.deleteIfExists(staged); return false }
    inner match {
      case CasPublish =>
        if (!CasPublish.claimForBranch(metaDir, v, branch)) {
          Files.deleteIfExists(staged); return false
        }
      case _ => // FileLockPublish: the held exclusive lock already
                // serializes allocation and installation
    }
    Files.move(staged, metaDir.resolve(s"v$v.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // copy, not reconstruct: the ref's retention settings survive
    // every head advance
    BranchRefs.write(ref(metaDir),
      r.map(_.copy(head = v)).getOrElse(BranchRef(v, v)))
    true
  }

  def forceCurrent(metaDir: Path, v: Long): Unit = {
    val next = BranchRefs.read(ref(metaDir))
      .map(_.copy(head = v)).getOrElse(BranchRef(v, v))
    BranchRefs.write(ref(metaDir), next)
  }
}

object AtomicPublish {
  /** Deployment-level default: `-Dgraft.publish=cas` swaps every table
    * handle to the optimistic publisher without code changes.
    */
  def default: AtomicPublish =
    sys.props.get("graft.publish") match {
      case Some("cas") => CasPublish
      case _           => FileLockPublish
    }
}
