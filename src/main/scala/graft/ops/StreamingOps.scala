package graft.ops

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming surface (SURVEY.md §2 Part C) over the events table.
  *
  * The window semantics are defined once as batch DataFrame queries
  * (oracle-checked below); StreamingSpec replays the same events through
  * `readStream` with `Trigger.AvailableNow` + watermarks and asserts the
  * streaming result equals the batch result — Structured Streaming's
  * batch-equivalence contract. The streaming entry points take any
  * streaming DataFrame, so production use is `readStream → op →
  * writeStream` unchanged.
  */
object StreamingOps {
  import Canon._

  /** Tumbling 1-hour counts — works on both batch and streaming inputs. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")).cast("double"), 4)
          .as("total_value"))
      .select(fmtTs(col("w.start")).as("bucket"), col("n_events"), col("total_value"))

  /** Sliding 1-hour window advancing every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(fmtTs(col("w.start")).as("bucket"), col("n_events"))

  /** 30-minute-gap session windows per user — the single stateful
    * aggregation, legal in a streaming query (chaining a second stateful
    * agg behind it trips Spark's global-watermark correctness check).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n")) // events per session

  /** Per-user session rollup. In streaming this is the batch-side finisher
    * over the sessionCounts sink (memory table / downstream job), not part
    * of the streaming query itself.
    */
  def sessionStats(sessions: DataFrame): DataFrame =
    sessions
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))

  /** The events parquet is a single row group, so the scan is ONE
    * partition and every partial aggregate downstream would run as one
    * task on one thread. Spreading by a high-cardinality key restores
    * 32-way partial aggregation — the standard move after any
    * non-splittable source (single-row-group parquet, gzip). On a real
    * cluster the source arrives as many splits and this repartition
    * would be dropped.
    */
  private def spreadEvents(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.events(s, d), col("event_id"))

  /** Q25 — tumbling-window aggregation (oracle: date_trunc buckets). */
  val q25: Q = Q(
    "q25_tumbling_window",
    (s, d) => tumblingCounts(spreadEvents(s, d)).orderBy("bucket"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
            |  count(*) AS n_events,
            |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS total_value
            |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin))

  /** Q26 — sliding-window counts. Oracle expands each event into the 4
    * epoch-aligned 15-minute slide starts whose 1-hour window covers it —
    * exactly Spark's `window(ts, '1 hour', '15 minutes')` assignment.
    */
  val q26: Q = Q(
    "q26_sliding_window",
    (s, d) => slidingCounts(spreadEvents(s, d)).orderBy("bucket"),
    Some("""SELECT strftime(to_timestamp((epoch_ms(ts) // 900000) * 900 - g.g * 900) AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS bucket,
            |  count(*) AS n_events
            |FROM events, LATERAL (SELECT unnest(range(0, 4)) AS g) g
            |GROUP BY 1 ORDER BY bucket""".stripMargin))

  /** Q27 — session windows per user (30-minute gap). Oracle via
    * gaps-and-islands: a new session starts when the gap from the previous
    * event reaches the 30-minute timeout (Spark sessions are
    * [start, last+gap) half-open, so `>=`).
    */
  val q27: Q = Q(
    "q27_session_window",
    // Spread by user_id: parallelizes the scan AND satisfies the session
    // aggregation's required distribution, so no second shuffle.
    (s, d) => sessionStats(sessionCounts(
      Tables.spread(Tables.events(s, d), col("user_id")))).orderBy("user_id"),
    Some("""WITH g AS (
            |  SELECT user_id,
            |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            |              >= INTERVAL 30 MINUTE THEN 1
            |         WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
            |         ELSE 0 END AS brk
            |  FROM events)
            |SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions, count(*) AS n_events
            |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin))

  val queries: Seq[Q] = Seq(q25, q26, q27)
}
