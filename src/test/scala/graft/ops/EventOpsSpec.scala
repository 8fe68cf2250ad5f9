package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** Laws for the round-8 event-analytics additions on crafted streams:
  * q90's trailing-7-day RANGE frame (inclusive boundary), q92's
  * tumbling-hour dedup census, q95's last-touch attribution carry, and
  * q91's slope recovery on exactly-linear data.
  */
class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0, m: Int = 0) =
    Timestamp.valueOf(f"2024-03-$day%02d $h%02d:$m%02d:00")

  test("q90: events 7 days apart share a window (inclusive); 8 days apart do not") {
    val rows = Seq(
      // user 1: three events inside one week → peak 3
      (1L, ts(1), 1.0), (1L, ts(2), 2.0), (1L, ts(3), 4.0),
      // user 2: exactly 7*86400s apart — RANGE is inclusive → peak 2
      (2L, ts(1), 1.0), (2L, ts(8), 1.0),
      // user 3: 8 days apart → never together
      (3L, ts(1), 5.0), (3L, ts(9), 7.0)
    ).toDF("user_id", "ts", "value")
    val out = Relational.rollingPeak(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((3L, 7.0)))
    assert(out(2L)._1 == 2L, "7-day boundary must be inclusive")
    assert(out(3L) == ((1L, 7.0)), "8-day gap: windows never merge; peak value is the larger singleton")
  }

  test("q92: same (user, type, hour) collapses; an hour boundary splits") {
    val rows = Seq(
      (1L, "click", ts(1, 10, 5)), (1L, "click", ts(1, 10, 50)), // same hour → 1 kept
      (1L, "click", ts(1, 11, 1)),                               // next hour → kept
      (2L, "click", ts(1, 10, 5))                                // other user → kept
    ).toDF("user_id", "event_type", "ts")
    val r = Relational.windowDedupCensus(rows).collect().head
    assert(r.getAs[Long]("n_events") == 4 && r.getAs[Long]("n_kept") == 3)
  }

  test("q95: purchases credit the most recent prior non-purchase; carry crosses purchases") {
    val rows = Seq(
      (1L, "view", ts(1), 10L, 0.0),
      (1L, "purchase", ts(2), 11L, 5.0),  // → view
      (1L, "purchase", ts(3), 12L, 7.0),  // still → view (carry crosses the purchase)
      (2L, "purchase", ts(1), 20L, 3.0),  // no prior → none
      (2L, "click", ts(2), 21L, 0.0),
      (2L, "purchase", ts(3), 22L, 9.0)   // → click
    ).toDF("user_id", "event_type", "ts", "event_id", "value")
    val out = Relational.lastTouch(rows).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("view") == ((2L, 12.0)), "both purchases attribute to the pre-purchase view")
    assert(out("none") == ((1L, 3.0)))
    assert(out("click") == ((1L, 9.0)))
  }

  test("q103: TWAP weights by holding time and drops the open last interval") {
    val rows = Seq(
      // value 10 held 1h, then 20 held 3h, then a final observation
      // whose interval is open (no successor) and must not count
      (1L, "gauge", ts(1, 0), 10.0),
      (2L, "gauge", ts(1, 1), 20.0),
      (3L, "gauge", ts(1, 4), 99.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val r = Relational.twap(rows).collect().head
    assert(r.getAs[Long]("n_intervals") == 2)
    assert(r.getAs[Long]("span_us") == 4L * 3600L * 1000000L)
    assert(r.getAs[Double]("twap") == (10.0 * 1 + 20.0 * 3) / 4.0,
      "TWAP must weight by interval length, not observation count")
  }

  test("q104: concentration ranks cross at the exact cumulative-share boundary") {
    val ords = Seq(
      (1L, 1L, 50.0), (2L, 2L, 30.0), (3L, 3L, 10.0), (4L, 4L, 10.0)
    ).map { case (o, c, p) => (o, c, "O", p, "2024-01-01 00:00:00", "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val cust = (1L to 4L).map(c => (c, "SEG")).toDF("c_custkey", "c_mktsegment")
    val r = Relational.revenueConcentration(ords, cust).collect().head
    assert(r.getAs[Long]("n_customers") == 4)
    assert(r.getAs[Long]("rank_p50") == 1, "50 of 100 is reached by the top customer alone (inclusive ≥)")
    assert(r.getAs[Long]("rank_p80") == 2, "80 of 100 needs the top two")
    assert(r.getAs[Double]("segment_revenue") == 100.0)
  }

  test("q91: exactly-linear values recover the slope; constants give zero") {
    // value = 2.5 per day, sampled hourly over 3 days
    val lin = (0 until 72).map { h =>
      ("lin", Timestamp.valueOf(f"2024-03-01 ${0}%02d:00:00").toInstant
        .plusSeconds(h * 3600L), 2.5 * h / 24.0)
    }.map { case (t, i, v) => (t, Timestamp.from(i), v) }
    val const = (0 until 10).map(h => ("const", ts(1, h), 42.0))
    val out = Relational.trendSlope((lin ++ const).toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out("lin") - 2.5) < 1e-6, s"slope ${out("lin")} != 2.5/day")
    assert(out("const") == 0.0)
  }

  test("q114: OHLC open/close follow (ts, event_id) order, not input order") {
    val rows = Seq(
      // one 10:00 bar, deliberately out of input order; two events tie
      // on ts and must break on event_id (5 before 9)
      (9L, "px", ts(1, 10, 0), 777.0),
      (5L, "px", ts(1, 10, 0), 11.0),
      (7L, "px", ts(1, 10, 30), -3.0),
      (2L, "px", ts(1, 10, 59), 42.0),
      // a single-event 11:00 bar: open = close = high = low
      (3L, "px", ts(1, 11, 5), 6.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val out = Relational.ohlcBars(rows).collect()
      .map(r => r.getAs[String]("bar") -> r).toMap
    val b10 = out("2024-03-01 10:00:00")
    assert(b10.getAs[Long]("n_obs") == 4)
    assert(b10.getAs[Double]("open") == 11.0, "ts tie must break on event_id")
    assert(b10.getAs[Double]("close") == 42.0)
    assert(b10.getAs[Double]("high") == 777.0)
    assert(b10.getAs[Double]("low") == -3.0)
    val b11 = out("2024-03-01 11:00:00")
    assert(Seq("open", "close", "high", "low")
      .forall(c => b11.getAs[Double](c) == 6.0), "singleton bar: all four equal")
  }

  test("q117: gaps telescope (sum = last - first) and singles drop out") {
    val d = "2024-03-%02d 00:00:00"
    val ords = Seq(
      // customer 1: days 1, 4, 10 → gaps 3, 6 (sum 9 = 10 - 1)
      (101L, 1L, d.format(1)), (102L, 1L, d.format(4)), (103L, 1L, d.format(10)),
      // customer 2: two orders the SAME day → one gap of 0
      (104L, 2L, d.format(5)), (105L, 2L, d.format(5)),
      // customer 3: a single order → contributes no gap at all
      (106L, 3L, d.format(7))
    ).map { case (o, c, dt) => (o, c, "O", 1.0, dt, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val cust = (1L to 3L).map(c => (c, "SEG")).toDF("c_custkey", "c_mktsegment")
    val r = Relational.purchaseGaps(ords, cust).collect().head
    assert(r.getAs[Long]("n_gaps") == 3)
    assert(r.getAs[Long]("n_repeat_custs") == 2, "single-order customer must not count")
    assert(r.getAs[Long]("sum_gap") == 9L, "per-customer gaps must telescope")
    assert(r.getAs[Long]("min_gap") == 0L)
    assert(r.getAs[Long]("max_gap") == 6L)
  }
}
