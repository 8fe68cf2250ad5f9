package graft.streaming

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The 100 TB streaming-state claim, tested instead of asserted (r7
  * verdict item 5): SURVEY §9 sizes sessionization state at 10^8 active
  * users — RocksDB-provider territory, where per-key state lives off-heap
  * / on-disk instead of in the HDFS-backed in-memory map. This suite
  * replays the flatMapGroupsWithState sessionizer under
  * `RocksDBStateStoreProvider` on an isolated session and asserts the
  * streaming result still converges to the batch reference — i.e. the
  * state backend is a swappable deployment knob, not a semantics change.
  */
class RocksDbStateSpec extends SparkTestBase {
  import StatefulOps._

  test("sessionization under RocksDBStateStoreProvider == batch reference") {
    // Dedicated session: the provider class is a session conf read at
    // query start; isolating it keeps the rest of the suite on the
    // default provider (same pattern as the encrypted streaming sink).
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    def eventsDs(ss: org.apache.spark.sql.SparkSession): Dataset[Event] = {
      import ss.implicits._
      Tables.events(ss, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Event]
    }

    val dir = Files.createTempDirectory("graft-rocksdb-src-").toString
    eventsDs(s).toDF().write.mode("overwrite").parquet(dir)
    val stream = s.readStream
      .schema(eventsDs(s).schema)
      .parquet(dir)
      .withWatermark("ts", "0 seconds")
      .as[Event]
    val q = closedSessions(stream).writeStream
      .format("memory").queryName("t_rocks_closed")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rocksdb-ckpt-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // The state store provider actually engaged must be RocksDB — assert
    // via the query's lastProgress state operator custom metrics (the
    // RocksDB provider reports rocksdb* metrics; the default provider
    // reports none of them).
    val progress = q.lastProgress
    val metrics = progress.stateOperators.flatMap(so =>
      scala.jdk.CollectionConverters.MapHasAsScala(so.customMetrics).asScala.keys)
    assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
      s"RocksDB provider not engaged; state metrics: ${metrics.mkString(", ")}")

    val streaming = s.table("t_rocks_closed").as[ClosedSession].collect()
      .map(c => (c.user_id, c.session_start.getTime, c.session_end.getTime,
        c.n_events, math.rint(c.total_value * 1e6)))
      .toSet

    val batchAll = allSessionsBatch(s, eventsDs(s)).collect()
    val lastPerUser = batchAll.groupBy(_.user_id)
      .view.mapValues(_.maxBy(_.session_start.getTime)).toMap
    val batchClosed = batchAll
      .filterNot(c => lastPerUser(c.user_id) == c)
      .map(c => (c.user_id, c.session_start.getTime, c.session_end.getTime,
        c.n_events, math.rint(c.total_value * 1e6)))
      .toSet

    assert(batchClosed.subsetOf(streaming),
      s"missing sessions under RocksDB: ${(batchClosed -- streaming).take(3)}")
    val extras = streaming -- batchClosed
    val lastSet = lastPerUser.values
      .map(c => (c.user_id, c.session_start.getTime, c.session_end.getTime,
        c.n_events, math.rint(c.total_value * 1e6))).toSet
    assert(extras.subsetOf(lastSet),
      s"invented sessions under RocksDB: ${extras.take(3)}")
  }
}
