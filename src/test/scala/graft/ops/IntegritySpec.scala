package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Laws for q93's order-insensitive table checksum, q96's per-stratum
  * equal-frequency deciles, and q94's sorted-neighborhood candidate
  * generation.
  */
class IntegritySpec extends SparkTestBase {
  import spark.implicits._

  private def orders(rows: Seq[(Long, Long, String, Double, String, String)]): DataFrame =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp_ntz"))

  private val base = Seq(
    (1L, 10L, "O", 100.50, "2024-01-01 00:00:00", "1-URGENT"),
    (2L, 11L, "O", 200.25, "2024-01-02 00:00:00", "2-HIGH"),
    (3L, 12L, "F", 300.75, "2024-01-03 00:00:00", "3-MEDIUM"))

  test("q93: checksum is invariant under row order and partitioning") {
    val a = Relational.tableChecksum(orders(base)).collect().toSeq
    val b = Relational.tableChecksum(orders(base.reverse).repartition(7))
      .collect().toSeq
    assert(a == b, "checksum must not depend on layout or arrival order")
  }

  test("q93: a single changed cell changes the group checksum") {
    val a = Relational.tableChecksum(orders(base)).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val mutated = base.map { case r @ (k, c, s, p, d, pr) =>
      if (k == 2L) (k, c + 1, s, p, d, pr) else r }
    val b = Relational.tableChecksum(orders(mutated)).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(a("O") != b("O"), "corrupted row must move the O-group checksum")
    assert(a("F") == b("F"), "untouched group must be unchanged")
  }

  test("q96: deciles are equal-frequency (±1) and monotone in value") {
    val rows = (1L to 95L).map(i =>
      (i, i, "O", i * 10.0, "2024-01-01 00:00:00", "1-URGENT"))
    val out = Relational.decileStats(orders(rows)).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 95)
    val ns = out.map(_.getAs[Long]("n"))
    assert(ns.max - ns.min <= 1, s"bucket sizes must differ by at most 1: ${ns.toSeq}")
    val his = out.map(_.getAs[Double]("hi"))
    assert(his.sameElements(his.sorted), "bucket bounds must be monotone")
    out.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
  }

  test("q94: truncation dup in one block is caught; cross-block pairs never compare") {
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      // same 16-char prefix block, high Jaccard (truncation dup)
      (1L, common, common.length.toLong),
      (2L, common + " iota", (common + " iota").length.toLong),
      // same block as 1/2 by prefix but disjoint tail tokens → low Jaccard
      (3L, "alpha beta gamma one two three four five six seven eight nine ten", 64L),
      // identical text to doc 1 but different block prefix → never compared
      (4L, "zzz " + common, ("zzz " + common).length.toLong)
    ).toDF("doc_id", "text", "n_chars")
    val pairs = Dedup.snmCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"truncation dup missed: $pairs")
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L },
      "doc in a different block must not pair across blocks")
    assert(!pairs.contains((2L, 3L)) && !pairs.contains((3L, 2L)),
      "sub-threshold Jaccard neighbor must be filtered")
  }
}
