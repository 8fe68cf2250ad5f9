package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for large joins (SURVEY.md §4 scale posture).
  *
  * Spark's AQE handles moderate skew by splitting oversized sort-merge
  * partitions, but a pathological hot key (one key = 10% of 100 TB) still
  * serializes on a single reducer chain. Salting fixes it structurally:
  * the skewed (large) side gets a uniform random-ish salt derived from a
  * row fingerprint; the small side is replicated once per salt value.
  * Join keys become (key, salt) — the hot key spreads over `salts`
  * reducers exactly.
  */
object Skew {

  /** Salted inner equi-join of `large` and `small` on `key`.
    *
    * @param salts number of ways to split each hot key (= replication
    *              factor of the small side; keep ≤ 64)
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    // Deterministic pseudo-salt from the whole row (monotonically_
    // increasing_id would break on retries; rand() breaks determinism).
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
