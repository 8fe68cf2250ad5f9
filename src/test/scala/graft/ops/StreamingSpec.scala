package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming batch-equivalence (SURVEY.md §5): replay the
  * events table as a file stream with Trigger.AvailableNow and assert each
  * streaming windowed aggregation equals its batch counterpart.
  */
class StreamingSpec extends SparkTestBase {

  /** events.parquet copied into its own directory (a file-stream source
    * reads whole directories), re-encoded to µs timestamps first so the
    * stream source needs no nanos handling.
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream-").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamEvents(): DataFrame =
    spark.readStream
      .schema(Tables.events(spark, sfDir).schema)
      .parquet(eventsDir)

  private def runToBatch(stream: DataFrame, name: String): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().toIndexedSeq.map(_.toSeq).toSet

  test("tumbling window: streaming equals batch") {
    val streaming = runToBatch(
      StreamingOps.tumblingCounts(streamEvents().withWatermark("ts", "2 hours")),
      "t_tumbling")
    val batch = StreamingOps.tumblingCounts(Tables.events(spark, sfDir))
    assert(canon(streaming) == canon(batch))
  }

  test("session window: streaming equals batch") {
    // Streaming runs the one legal stateful agg (session counts); the
    // per-user rollup is the batch finisher over the sink table.
    val sessions = runToBatch(
      StreamingOps.sessionCounts(streamEvents().withWatermark("ts", "2 hours")),
      "t_session")
    val streaming = StreamingOps.sessionStats(sessions)
    val batch = StreamingOps.sessionStats(
      StreamingOps.sessionCounts(Tables.events(spark, sfDir)))
    assert(canon(streaming) == canon(batch))
  }

  test("stream-stream interval join: streaming equals batch (q07 semantics)") {
    // Two watermarked streams over the same event log, joined on user
    // with a bounded time range — the streaming form of q07's interval
    // join. Inner join + append mode; the time bound is what lets the
    // engine age out join state at the watermark.
    def sides(df: DataFrame): (DataFrame, DataFrame) = (
      df.select(col("user_id").as("ua"), col("ts").as("tsa"), col("event_id").as("ea")),
      df.select(col("user_id").as("ub"), col("ts").as("tsb"), col("event_id").as("eb")))
    def joined(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b,
        col("ua") === col("ub") &&
        col("tsb") >= col("tsa") &&
        col("tsb") <= col("tsa") + expr("INTERVAL 1 HOUR") &&
        col("ea") < col("eb"))
    val (sa, sb) = sides(streamEvents())
    val q = joined(
        sa.withWatermark("tsa", "2 hours"),
        sb.withWatermark("tsb", "2 hours"))
      .writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val (ba, bb) = sides(Tables.events(spark, sfDir))
    val want = joined(ba, bb).count()
    assert(want > 0, "interval join should produce pairs")
    assert(spark.table("t_ssjoin").count() == want)
  }

  test("watermarked dedup drops exact duplicate events") {
    val dupDir = Files.createTempDirectory("graft-stream-dup-").toString
    val ev = Tables.events(spark, sfDir)
    ev.union(ev.limit(50)).write.mode("overwrite").parquet(dupDir)
    val stream = spark.readStream.schema(ev.schema).parquet(dupDir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy()
      .agg(count(lit(1)).as("n"))
    val got = runToBatch(stream, "t_dedup").collect()(0).getLong(0)
    assert(got == ev.count(), "duplicates must be dropped within watermark")
  }
}
