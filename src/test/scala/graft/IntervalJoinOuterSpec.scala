package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Stream-stream LEFT OUTER interval join: the sentinel-flushed
  * AvailableNow pass must equal the batch left join EXACTLY — unmatched
  * lefts included, even ones inside the final watermark horizon (the
  * rows a naive single-pass run leaves in state forever).
  */
class IntervalJoinOuterSpec extends SparkSpec {
  import spark.implicits._

  test("left outer interval join == batch left join, stragglers included") {
    val rnd = new scala.util.Random(11)
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // clicks every ~7 min across 12 h over 5 users; purchases for a
    // third of them inside the hour; the LAST clicks are deliberately
    // unmatched — they sit inside the final watermark horizon and only
    // flush because of the sentinel batches
    val events = (0 until 100).flatMap { i =>
      val uid = i % 5
      val cts = base + i * 7L * 60000L + rnd.nextInt(60000)
      val click = (i.toLong, uid.toLong, new Timestamp(cts), "click")
      if (i % 3 == 0 && i < 90)
        Seq(click, (1000L + i, uid.toLong,
          new Timestamp(cts + 20L * 60000L), "purchase"))
      else Seq(click)
    }.toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("value", lit(1.0))
    val dir = Files.createTempDirectory("graft-ijo-fix-").toString
    val one = s"$dir/events.parquet"
    events.coalesce(1).write.parquet(s"$dir/out")
    val part = scala.util.Using.resource(
        Files.list(java.nio.file.Paths.get(s"$dir/out"))) { st =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator())
        .asScala.find(_.getFileName.toString.endsWith(".parquet")).get
    }
    Files.move(part, java.nio.file.Paths.get(one))

    val got = EventStream.intervalJoinLeftOuter(spark, one,
        "click", "purchase", horizonMinutes = 60)
      .orderBy("left_id", "right_id").collect().toSeq
    val ev = spark.read.parquet(one)
      .select("event_id", "user_id", "ts", "event_type")
    val c = ev.filter(col("event_type") === "click").alias("l")
    val p = ev.filter(col("event_type") === "purchase").alias("r")
    val want = c.join(p,
        expr("l.user_id = r.user_id AND r.ts >= l.ts AND " +
          "r.ts <= l.ts + INTERVAL 60 MINUTES"), "left_outer")
      .select(col("l.event_id").as("left_id"),
        col("r.event_id").as("right_id"),
        col("l.user_id").as("user_id"),
        expr("(unix_micros(r.ts) - unix_micros(l.ts)) DIV 1000000")
          .as("delta_sec"))
      .orderBy("left_id", "right_id").collect().toSeq
    assert(want.exists(_.isNullAt(1)), "fixture must have unmatched lefts")
    // the last click is unmatched AND newer than (max ts - horizon):
    // exactly the straggler class the sentinel flush exists for
    assert(want.filter(_.getLong(0) == 99L).forall(_.isNullAt(1)))
    assert(got == want,
      s"stream outer join diverged: got ${got.length}, want ${want.length}")
  }
}
