package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface. The reference itself is batch-only (its
  * CDC is micro-batch-by-date-path — SURVEY.md §2.10), so these are the
  * §7.6 extensions: the same event analytics expressed as a stream with
  * watermarks, runnable over a parquet directory with
  * `Trigger.AvailableNow` (exactly how a backfill over landed CDC files
  * would run on a cluster).
  */
object EventStream {

  /** Hourly windowed counts/sums per event type, computed as a STREAM with
    * a watermark and materialized to a memory sink. `AvailableNow`
    * processes the existing files then stops — deterministic, testable,
    * and the same code path a continuous deployment would run.
    */
  def hourlyWindowed(spark: SparkSession, eventsParquet: String,
                     queryName: String): DataFrame = {
    val schema = spark.read.parquet(eventsParquet).schema
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    // the streaming file source requires a directory; the testdata is a
    // single file — stage a symlink in a temp dir (no copy)
    val srcDir = Files.createTempDirectory("graft-stream-src-")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(eventsParquet).toAbsolutePath)
    val raw = spark.readStream.schema(schema).parquet(srcDir.toString)
    // nanos-as-long parquet timestamps → microsecond TimestampType
    val withTs = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw
    }
    val stream = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Gap-based sessionization (30-min inactivity): batch formulation with
    * window functions — one shuffle on user_id, then gap-and-island. The
    * streaming twin would be `flatMapGroupsWithState`; the batch form is
    * what a backfill runs and what the oracle can verify.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
  }
}
