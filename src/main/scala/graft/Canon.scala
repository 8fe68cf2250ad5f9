package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonicalization helpers so Spark results hash-match the DuckDB oracle.
  *
  * Two sources of nondeterminism are eliminated (SURVEY.md §7 risk 6/7):
  *
  *  1. Double aggregation order. `sum(double)` accumulates in whatever order
  *     partitions arrive, so the last ulps differ run-to-run and engine-to-
  *     engine. We sum in DECIMAL(38,6) (exact, order-independent), cast the
  *     exact result to double, then round. Averages are computed as
  *     exact-sum / count in double (IEEE division is deterministic).
  *  2. Timestamp precision. Parquet stores ms/ns, Spark works in µs; all
  *     test values are µs-aligned, and outputs are formatted to second
  *     precision as strings so both engines serialize identically.
  *
  * At scale these helpers are free: decimal sums use the same partial-agg
  * (map-side combine) path as double sums; no extra shuffle, no collect.
  */
object Canon {
  private val Dec = "decimal(38,6)"

  /** Exact order-independent sum, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact sum rounded to 4 dp — the oracle convention for money/measures. */
  def rsum(c: Column): Column = round(dsum(c), 4)

  /** Exact-sum-based average rounded to 4 dp. */
  def ravg(c: Column): Column = round(dsum(c) / count(c), 4)

  /** Round a SIGNED double to 4 dp with IEEE -0.0 collapsed to +0.0.
    * Spark's round (BigDecimal HALF_UP) returns +0.0 for tiny negatives
    * while DuckDB's C-library round keeps the sign bit, and the driver's
    * compare stringifies ("-0.0" != "0.0") — caught live at sf0.1 where
    * an embedding first element rounds to zero from below (q18). The
    * `+ 0.0` maps -0.0 to +0.0 and is the identity on every other
    * value; neither engine constant-folds floating add-zero (doing so
    * would be unsound for exactly this input). Oracle-side analog:
    * `round(x, 4) + 0`. Use for any rounded column whose values can be
    * negative; plain round is fine for inherently non-negative ones.
    */
  def r4z(c: Column): Column = round(c, 4) + lit(0.0)

  /** Second-precision UTC string form of a timestamp. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Day-precision string form. */
  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
