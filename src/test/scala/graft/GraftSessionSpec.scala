package graft

/** GraftSession must carry every conf an entry point needs — in
  * particular `spark.sql.legacy.parquet.nanosAsLong`, without which a
  * session touching a TIMESTAMP(NANOS) events.parquet (the driver
  * generated one in earlier rounds; round 5's carries micros) throws on
  * read. Round-1 only set it in the Verify/Bench mains; it now lives in
  * the shared builder. The generator's encoding is not ours to pin, so
  * the schema assertion accepts every encoding the type-adaptive readers
  * (SparkEntry.events, EventStream) handle: nanos-as-long under the
  * flag, or a native timestamp type.
  */
class GraftSessionSpec extends SparkSpec {

  test("GraftSession-built session reads the events table") {
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    val t = ev.schema("ts").dataType
    assert(t == org.apache.spark.sql.types.LongType ||
      t == org.apache.spark.sql.types.TimestampType ||
      t == org.apache.spark.sql.types.TimestampNTZType, s"unexpected ts type $t")
    assert(ev.limit(5).count() == 5)
  }

  test("GraftSession carries the reference session confs") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode").toLowerCase == "dynamic")
  }
}
