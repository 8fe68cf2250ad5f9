package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** q85's ordered-funnel and q86's cohort-retention laws on crafted
  * event streams: strictly-after stage semantics, out-of-order
  * exclusion, cohort assignment by first week, and the per-(user,week)
  * distinct collapse.
  */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0) =
    Timestamp.valueOf(f"2024-02-$day%02d $h%02d:00:00")

  test("stages count only strictly-ordered first occurrences") {
    val rows = Seq(
      // user 1: full ordered funnel
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE click → stops at click stage
      (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      // user 3: click before signup → stops at signup stage
      (3L, "click", ts(1)), (3L, "signup", ts(2)),
      // user 4: no signup at all → counted in n_users only
      (4L, "click", ts(1)), (4L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val r = Relational.funnel(rows).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getLong(2) == 2, "users 1 and 2 clicked after signup")
    assert(r.getLong(3) == 1, "only user 1 purchased after the click")
  }

  test("simultaneous stage timestamps do not advance the funnel (strict >)") {
    val rows = Seq(
      (1L, "signup", ts(1)), (1L, "click", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val r = Relational.funnel(rows).collect().head
    assert(r.getLong(2) == 0, "same-instant click must not count as 'after'")
  }

  test("cohort week is the user's first week; repeat activity collapses per week") {
    val rows = Seq(
      (1L, "click", ts(5)),  (1L, "click", ts(6)),   // week 0 twice → one active row
      (1L, "click", ts(14)),                          // week 1 (Feb 5 vs Feb 14: Mondays Feb 5, Feb 12)
      (2L, "click", ts(14))                           // user 2's FIRST week is offset 0
    ).toDF("user_id", "event_type", "ts")
    val out = Relational.retentionCohorts(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = out.keys.map(_._1).min
    assert(out((w0, 0L)) == 1L, "user 1's doubled week-0 activity must count once")
    assert(out((w0, 1L)) == 1L)
    assert(out((w0 + 1, 0L)) == 1L, "user 2 forms its own later cohort at offset 0")
  }
}
