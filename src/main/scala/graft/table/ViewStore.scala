package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** VERSIONED view metadata (the Iceberg view-spec analog): a view lives
  * at a directory holding `view/v<N>.json` documents — each records the
  * defining SQL text and a timestamp — plus a `view/_current` pointer.
  * REPLACE writes a NEW version and moves the pointer; every prior
  * definition stays on disk (Iceberg keeps the version history in the
  * view metadata file the same way). The SQL is stored as TEXT and
  * re-parsed at read time in the reading session — Iceberg's SQL
  * representation semantics — so a view over graft tables resolves
  * through the same relation rules as any query.
  *
  * A path is a view or a table, never both: `create` refuses a path
  * holding a committed table manifest, and
  * [[SnapshotTable.createOrReplace]]'s publish would land table metadata
  * beside view metadata only if the caller forced the same dir — the
  * relation rule checks the table pointer FIRST, so a table always wins
  * resolution and the view surface refuses to create the ambiguity.
  */
object ViewStore {
  private def dir(root: Path): Path = root.resolve("view")
  private def pointer(root: Path): Path = dir(root).resolve("_current")
  private def doc(root: Path, v: Long): Path = dir(root).resolve(s"v$v.json")

  def exists(root: String): Boolean = Files.exists(pointer(Paths.get(root)))

  def currentVersion(root: String): Long = {
    val p = pointer(Paths.get(root))
    require(Files.exists(p), s"no view at $root")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
  }

  /** The current defining SQL text. */
  def sql(root: String): String = sqlAt(root, currentVersion(root))

  /** A specific version's defining SQL (versions are retained). */
  def sqlAt(root: String, v: Long): String = {
    val p = doc(Paths.get(root), v)
    require(Files.exists(p), s"no view version v$v at $root")
    val parsed = JsonLite.parse(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .asInstanceOf[Map[String, Any]]
    parsed("sql").asInstanceOf[String]
  }

  def versions(root: String): Seq[Long] = {
    val d = dir(Paths.get(root))
    if (!Files.exists(d)) Nil
    else scala.util.Using.resource(Files.list(d))(
      _.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.matches("v\\d+\\.json") =>
          n.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq.sorted)
  }

  /** Create or replace: returns the new current version. CREATE on an
    * existing view refuses without OR REPLACE (IF NOT EXISTS no-ops and
    * returns the existing version); a committed TABLE at the path
    * refuses always — one path, one identity.
    */
  def create(root: String, viewSql: String, orReplace: Boolean,
             ifNotExists: Boolean,
             nowMs: Long = System.currentTimeMillis()): Long = {
    val rootP = Paths.get(root)
    // the whole check+claim+publish runs inside the TABLE's publish
    // critical section (same meta/_lock a table commit at this path
    // would hold): a bare check-then-act here races a concurrent first
    // table commit — both guards pass and the table silently shadows
    // the view (r10 ADVICE). publishCommit re-checks ViewStore.exists
    // inside the same section on table BIRTH, so whoever enters first
    // wins and the loser refuses loudly. (Under CasPublish the section
    // serializes same-JVM only — cross-process stays optimistic, the
    // publisher's documented trade.)
    AtomicPublish.default.critical(rootP, rootP.resolve("meta")) {
    require(!SnapshotTable.at(root).exists,
      s"a graft TABLE exists at $root — a path is a table or a view, " +
        "never both")
    if (exists(root)) {
      if (ifNotExists) return currentVersion(root)
      require(orReplace,
        s"view $root already exists (use CREATE OR REPLACE VIEW, " +
          "IF NOT EXISTS, or DROP VIEW first)")
    }
    Files.createDirectories(dir(rootP))
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // version docs claim with O_EXCL (CREATE_NEW) so concurrent creates
    // can never truncate each other's definition — a lost race bumps to
    // the next number and both docs survive; the pointer write is the
    // publish (last writer wins, like a ref head). A crash between doc
    // and pointer leaves an unreferenced doc the next create skips past.
    var v = versions(root).lastOption.getOrElse(0L) + 1
    var written = false
    while (!written) {
      val json =
        s"""{"version":$v,"timestampMs":$nowMs,"sql":"${esc(viewSql)}"}"""
      try {
        Files.write(doc(rootP, v), json.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        written = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => v += 1
      }
    }
    publishPointer(rootP, v)
    v
    }
  }

  /** The pointer PUBLISH is atomic (tmp + ATOMIC_MOVE): a plain
    * truncating write would let a concurrent reader see a torn/empty
    * pointer mid-replace — crash or a silently stale version.
    */
  private def publishPointer(rootP: Path, v: Long): Unit = {
    val tmp = dir(rootP).resolve(s"._current-${java.util.UUID.randomUUID()}")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(rootP),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop the view (all versions). Loud when absent unless `ifExists`. */
  def drop(root: String, ifExists: Boolean): Boolean = {
    if (!exists(root)) {
      require(ifExists, s"no view at $root (use DROP VIEW IF EXISTS)")
      return false
    }
    val d = dir(Paths.get(root))
    scala.util.Using.resource(Files.walk(d))(_.iterator().asScala.toSeq)
      .sortBy(-_.getNameCount).foreach(p => Files.deleteIfExists(p))
    // best-effort: remove the root dir too when the view was its only
    // content — a pre-existing dir holding other files stays (the drop
    // itself already succeeded)
    try Files.deleteIfExists(Paths.get(root))
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
    true
  }

  /** (name, currentVersion) of every view directly under `parent` —
    * the SHOW VIEWS listing.
    */
  def list(parent: String): Seq[(String, Long)] = {
    val p = Paths.get(parent)
    if (!Files.exists(p)) return Nil
    scala.util.Using.resource(Files.list(p))(
      _.iterator().asScala.filter(Files.isDirectory(_)).toSeq)
      .filter(d => exists(d.toString))
      .map(d => (d.getFileName.toString, currentVersion(d.toString)))
      .sortBy(_._1)
  }
}
