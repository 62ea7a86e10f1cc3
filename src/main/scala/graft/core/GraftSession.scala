package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory carrying the confs the reference sets that still apply
  * (reference: common/spark.py:61-103 — AQE trio, dynamic partition
  * overwrite, UTC, parquet datetime rebase). Tuned for local[N] testing but
  * the same confs are what we would ship to a 1000-executor cluster; only
  * `master` and memory sizing differ there.
  */
object GraftSession {
  def builder(appName: String = "graft",
              master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      // the full SQL surface on every session — graft_* functions,
      // graft.`/path` relations (+@time-travel), MERGE/UPDATE/DELETE —
      // exactly how the reference's sessions get Iceberg
      // (spark.sql.extensions, common/spark.py:23-30)
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // reference: common/spark.py:90 "Needs to be off to work as expected"
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      // events.parquet carried TIMESTAMP(NANOS) in earlier test-data
      // generations; without this, reading that encoding throws. The
      // round-5 generator emits micros-NTZ (no flag needed), but the flag
      // stays so EVERY encoding reads identically across Verify/Bench/
      // tests/CLI — readers adapt per schema (SparkEntry.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Loan pattern mirroring the reference's ClosableSparkSession context
    * manager (common/spark.py:61-103): the session is stopped on exit
    * only if this call created it.
    */
  def withSession[T](appName: String = "graft")(f: SparkSession => T): T = {
    val preexisting = SparkSession.getDefaultSession.isDefined
    val s = get(appName)
    try f(s)
    finally if (!preexisting) s.stop()
  }
}
