package graft

/** Plan-audit main: prints `explain("formatted")` for SparkEntry queries
  * (all, or a comma-separated name-prefix filter) so shuffle counts,
  * pushed filters, and codegen spans are reviewable without editing code.
  *
  * Usage: runMain graft.Explain [sfDir] [prefix,prefix,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val prefixes = if (args.length > 1) args(1).split(',').toSeq else Nil
    val spark = graft.core.GraftSession.get("graft-explain")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => prefixes.isEmpty || prefixes.exists(q._1.startsWith))
      .foreach { case (name, fn) =>
        println(s"\n==================== $name ====================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable =>
          println(s"[explain] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
