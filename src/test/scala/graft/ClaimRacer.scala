package graft

/** Helper main for the cross-process CAS-publish tests
  * (AtomicPublishSpec): a plain second JVM — no Spark — that attempts to
  * atomically create the claim-marker file at args(0). With no further
  * args it claims immediately and reports; with "wait" it prints READY,
  * blocks for a GO line on stdin (so the parent can race the same
  * instant), then attempts the claim. Prints WON or LOST.
  */
object ClaimRacer {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(p.getParent)
    if (args.length > 1 && args(1) == "wait") {
      println("READY"); System.out.flush()
      new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in)).readLine()
    }
    val won =
      try { java.nio.file.Files.createFile(p); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    println(if (won) "WON" else "LOST")
    System.out.flush()
  }
}
