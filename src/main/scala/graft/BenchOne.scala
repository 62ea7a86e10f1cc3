package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM bench runner — the `SPARK_GRAFT_ISOLATE` mode's worker.
  * The r5/r6 bench investigations pinned the q60/q84-class
  * round-over-round swings (3-4× in-suite vs isolated) on ACCUMULATED
  * DRIVER-JVM STATE, not the queries; running lifecycle queries in a
  * fresh JVM makes their numbers reproducible across runs. Takes a
  * comma-separated `<query>:<attempts>` spec list (one Spark startup
  * amortized over a small batch of cheap queries — r12 verdict #1; the
  * heavy set still gets one child PER ATTEMPT from the parent) and
  * prints one tab-separated line per query,
  * `BENCHONE\t<name>\t<t:sec|e:msg>...` (one field per attempt), that
  * the parent [[Bench]] parses — stdout carries Spark noise, so the
  * sentinel prefix matters.
  */
object BenchOne {
  private[graft] def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private[graft] def escape(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getName)
      .takeWhile(_ != '\n').take(120).replace("\t", " ")

  def main(args: Array[String]): Unit = {
    val (specs, sfDir, cpus) = (args(0), args(1), args(2))
    val spark = session(cpus)
    specs.split(',').filter(_.nonEmpty).foreach { spec =>
      val (name, attempts) = spec.split(':') match {
        case Array(n, a) => (n, a.toInt)
        case Array(n) => (n, 1)
        case _ => throw new IllegalArgumentException(s"bad spec '$spec'")
      }
      val fn = SparkEntry.queries(name)
      // same warm-up discipline as the in-process path: codegen and
      // classloading land on the smallest sf, not the measured attempts
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val fields = (0 until attempts).map { _ =>
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(escape(e)) }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        err match {
          case None => f"t:$t%.3f"
          case Some(m) => s"e:$m"
        }
      }
      // flush per query: a killed child still hands the parent every
      // completed query's line
      println("BENCHONE\t" + name + "\t" + fields.mkString("\t"))
      System.out.flush()
    }
    spark.stop()
  }
}
