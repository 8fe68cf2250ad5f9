package graft

import org.apache.spark.sql.functions._

/** Pins the events ns→µs timestamp conversion: Spark's µs TimestampType
  * value must equal floor(raw_ns / 1000) for every row. Round-1 regression:
  * `col("ts") / 1000L` was double division and epoch nanos exceed double's
  * 2^53 integer range, putting ~12% of rows off by 1 µs.
  */
class TablesSpec extends SparkTestBase {

  test("events ts is exact floor(ns/1000) microseconds") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("ts").as("ns"))
    val conv = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val bad = raw.join(conv, "event_id")
      .where(col("us") =!= expr("ns DIV 1000"))
      .count()
    assert(bad === 0L)
  }

  test("events corpus is NOT µs-aligned (sub-µs precision is real)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nonAligned = spark.read.parquet(s"$sfDir/events.parquet")
      .where(expr("ts % 1000 != 0")).count()
    assert(nonAligned > 0L, "corpus unexpectedly µs-aligned; conversion claims need re-checking")
  }
}
