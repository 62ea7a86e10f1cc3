package graft

/** Helper main for the cross-process publish-lock test
  * (SnapshotTableSpec): a plain second JVM — no Spark — that takes the
  * exclusive `meta/_lock` FileChannel lock, prints LOCKED, holds it for
  * args(1) ms, then releases and exits.
  */
object LockHolder {
  def main(args: Array[String]): Unit = {
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(args(0)),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock()
    println("LOCKED")
    System.out.flush()
    Thread.sleep(args(1).toLong)
    lock.release()
    ch.close()
  }
}
