package graft

/** GraftSession must carry every conf an entry point needs — in
  * particular `spark.sql.legacy.parquet.nanosAsLong`, without which any
  * session touching events.parquet (TIMESTAMP(NANOS)) throws on read.
  * Round-1 only set it in the Verify/Bench mains; it now lives in the
  * shared builder.
  */
class GraftSessionSpec extends SparkSpec {

  test("GraftSession-built session reads the nanos-timestamp events table") {
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    // nanos arrive as a plain long under the flag
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    assert(ev.limit(5).count() == 5)
  }

  test("GraftSession carries the reference session confs") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode").toLowerCase == "dynamic")
  }
}
