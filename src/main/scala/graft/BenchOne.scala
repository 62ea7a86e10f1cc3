package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM single-query bench runner — the `SPARK_GRAFT_ISOLATE` mode's
  * worker. The r5/r6 bench investigations pinned the q60/q84-class
  * round-over-round swings (3-4× in-suite vs isolated) on ACCUMULATED
  * DRIVER-JVM STATE, not the queries; running each lifecycle query in a
  * fresh JVM makes its number reproducible across runs. Prints one
  * tab-separated line `BENCHONE\t<t:sec|e:msg>...` (one field per
  * attempt) the parent [[Bench]] parses — stdout carries Spark noise, so
  * the sentinel prefix matters.
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
    val (name, sfDir, attempts, cpus) =
      (args(0), args(1), args(2).toInt, args(3))
    val spark = session(cpus)
    val fn = SparkEntry.queries(name)
    // same warm-up discipline as the in-process path: codegen and
    // classloading land on the smallest sf, not on the measured attempts
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
    println("BENCHONE\t" + fields.mkString("\t"))
    spark.stop()
  }
}
