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

  /** The two sides of the interval self-join, disambiguated by rename —
    * shared by the registered batch query (q55) and StreamingSpec's
    * watermarked replay so both run the SAME definition.
    */
  def intervalSides(df: DataFrame): (DataFrame, DataFrame) = (
    df.select(col("user_id").as("ua"), col("ts").as("tsa"), col("event_id").as("ea")),
    df.select(col("user_id").as("ub"), col("ts").as("tsb"), col("event_id").as("eb")))

  /** Stream-stream interval join (q07's range semantics on two event
    * streams): same user, the b-event lands within [tsa, tsa + 1 hour],
    * event-id order breaks the pair symmetry. The time bound is what
    * lets a streaming run age out join state at the watermark; in batch
    * it is an ordinary equi-join on user with a range residual — both
    * sides shuffle once on the user key, state/memory O(events per user
    * per hour), never all-pairs.
    */
  def intervalJoin(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b,
      col("ua") === col("ub") &&
      col("tsb") >= col("tsa") &&
      col("tsb") <= col("tsa") + expr("INTERVAL 1 HOUR") &&
      col("ea") < col("eb"))

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

  /** Q55 — the stream-stream interval join as a registered, oracle-able
    * query (round-4 verdict #6): per-user count of within-the-hour event
    * pairs, computed by the same `intervalSides`/`intervalJoin` the
    * watermarked streaming replay runs in StreamingSpec. Registering the
    * batch form puts the join's VALUES inside the CORRECTNESS gate; the
    * spec covers the batch≡streaming equivalence on the same definition.
    */
  val q55: Q = Q(
    "q55_interval_join",
    (s, d) => {
      val (a, b) = intervalSides(spreadEvents(s, d))
      intervalJoin(a, b)
        .groupBy(col("ua").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""SELECT a.user_id, count(*) AS n_pairs
            |FROM events a JOIN events b ON a.user_id = b.user_id
            | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
            | AND a.event_id < b.event_id
            |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin))

  /** Stream-static enrichment: the event stream LEFT-joined to a static
    * dimension, then windowed per enriched key — the lookup-join every
    * streaming pipeline runs (enrich by user/account/catalog attributes).
    * Shared by the registered batch query (q62) and StreamingSpec's
    * watermarked replay. In a streaming run the static side is re-read
    * per microbatch and the stream side never shuffles for the join; the
    * join is left UNHINTED (the q52 lesson — customer scales with the
    * corpus; in batch AQE picks broadcast from measured size, and a
    * genuinely small dim gets there automatically).
    */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy(window(col("ts"), "1 hour").as("w"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")).cast("double"), 4)
          .as("total_value"))
      .select(fmtTs(col("w.start")).as("bucket"), col("segment"),
        col("n_events"), col("total_value"))

  /** Q62 — the stream-static enrichment join's batch definition under the
    * oracle gate (same registration pattern as q55): hourly event counts
    * and value totals per customer market segment.
    */
  val q62: Q = Q(
    "q62_stream_static_join",
    (s, d) => enrichedSegmentCounts(
        spreadEvents(s, d),
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")))
      .orderBy("bucket", "segment"),
    Some("""SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS bucket,
            |  coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
            |  count(*) AS n_events,
            |  round(CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE), 4) AS total_value
            |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
            |GROUP BY 1, 2 ORDER BY bucket, segment""".stripMargin))

  /** Q69 — the per-session detail table (gaps-and-islands sessionization):
    * one row per session with start/end/size/value, the declarative
    * spelling of the semantics StatefulOps implements imperatively
    * (flatMapGroupsWithState streaming / flatMapGroups batch) and q27
    * rolls up per user. StatefulOpsSpec pins all three definitions equal.
    *
    * Shape at 100 TB: ONE shuffle of events on user_id feeds both window
    * functions (lag and the running break-sum share the same
    * partitioning+ordering, so Catalyst plans a single Window node over a
    * single sort); the final per-session groupBy exchanges only the
    * map-side-combined session rows, O(sessions) ≪ O(events). Session
    * numbering is per-user (`session_seq`), so no global ordering or
    * single-partition stage exists anywhere. Gap arithmetic is integer
    * microseconds (`unix_micros` / DuckDB `epoch_us`) — no sub-second
    * truncation lottery. A session = maximal run with inter-event gap
    * < 30 min; ties on ts break by event_id (same convention as q27).
    */
  val q69: Q = Q(
    "q69_sessionize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.spread(
        Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
        col("user_id"))
      val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val prevUs = lag(us, 1).over(ord)
      val brk = when(prevUs.isNull || us - prevUs >= lit(1800000000L), 1).otherwise(0)
      e.withColumn("brk", brk)
        .withColumn("session_seq",
          sum(col("brk")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          fmtTs(min(col("ts"))).as("session_start"),
          fmtTs(max(col("ts"))).as("session_end"),
          count(lit(1)).as("n_events"),
          r4z(dsum(col("value"))).as("total_value"))
        .orderBy("user_id", "session_seq")
    },
    Some("""WITH o AS (
            |  SELECT user_id, event_id, ts, value,
            |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            |  FROM events),
            |m AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000 THEN 1 ELSE 0 END AS brk
            |  FROM o),
            |s AS (
            |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
            |  FROM m)
            |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
            |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
            |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
            |  count(*) AS n_events,
            |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) + 0 AS total_value
            |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin))

  val queries: Seq[Q] = Seq(q25, q26, q27, q55, q62, q69)
}
