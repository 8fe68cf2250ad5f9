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

  test("q100: the FK audit counts a synthesized orphan exactly once") {
    val child = Seq((1L, 10L), (2L, 11L), (3L, 999L)).toDF("id", "fk")
    val parent = Seq((10L, "a"), (11L, "b")).toDF("pk", "v")
    val r = Relational.orphanCount(child, "fk", parent, "pk", "child.fk->parent")
      .collect().head
    assert(r.getString(0) == "child.fk->parent" && r.getLong(1) == 1L)
    // a clean edge audits to zero (count over an empty anti join)
    val clean = Relational.orphanCount(child.filter($"fk" =!= 999L), "fk",
      parent, "pk", "e").collect().head
    assert(clean.getLong(1) == 0L)
  }

  test("q99: hand-built baskets give exact support, confidence and lift") {
    // 4 baskets: {A,B} {A,B} {A} {B}  → n_A=3, n_B=3, n_AB=2
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    def at(u: Long, h: Int, ty: String) =
      (u, ty, Timestamp.from(t0.toInstant.plusSeconds(h * 3600L)))
    val rows = Seq(
      at(1, 0, "A"), at(1, 0, "B"), at(1, 0, "A"), // dup A collapses in-basket
      at(1, 1, "A"), at(1, 1, "B"),
      at(2, 0, "A"),
      at(2, 1, "B")
    ).toDF("user_id", "event_type", "ts")
    val r = Relational.assocRules(rows).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "A" && row.getString(1) == "B")
    assert(row.getLong(2) == 2L, "support must count baskets, not events")
    assert(row.getDouble(3) == math.rint(2.0 / 3.0 * 10000) / 10000)
    assert(row.getDouble(4) == math.rint(2.0 * 4 / 9.0 * 10000) / 10000)
  }

  test("q98: waterfall survivors are monotone and each stage bites") {
    val mk = (id: Long, text: String, lang: String, n: Long) => (id, text, lang, n)
    val good = "the cat sat on the mat and the dog ran to the park in the sun"
    val docs = Seq(
      mk(1, good, "en", 300),                 // survives all four
      mk(2, good, "en", 50),                  // fails length
      mk(3, good, "fr", 300),                 // fails lang
      mk(4, "quartz vex jump blitz nymph", "en", 300), // fails quality (no stopwords)
      mk(5, "the the the the the the spam spam spam spam", "en", 300)
        // stopword-rich (passes quality) but 2 distinct tokens in 10 →
        // fails the repetition stage
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = TextOps.filterWaterfall(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("00_total") == 5)
    val chain = Seq(out("00_total"), out("10_length"), out("20_lang_en"),
      out("30_quality"), out("40_repetition"))
    assert(chain.zip(chain.tail).forall { case (a, b) => a >= b },
      s"survivors must be monotone non-increasing: $chain")
    assert(out("10_length") == 4 && out("20_lang_en") == 3)
    assert(out("30_quality") == 2, "the stopword-free doc must fail the quality stage")
    assert(out("40_repetition") == 1, "the 2-distinct-token doc must fail repetition; only the clean doc survives")
  }

  test("q101: priority sample is deterministic and matches the integer formula") {
    import graft.Tables
    // recompute the draw independently with plain Scala integer math
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs
      .map { case (id, w) => (((id * 48271L) % 100000L + 1L) * 1000000L / w, id) }
      .sorted.take(50).map(_._2).toSet
    val got = Sampling.q101.fn(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(got == expected, "drawn set must equal the closed-form k-smallest priorities")
    // layout independence: same draw from a repartitioned source is
    // guaranteed by the key-pure priority; re-run must be identical
    val again = Sampling.q101.fn(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("q102: aligned metrics give the diagonal codes; census conserves customers") {
    val ords = (1L to 5L).flatMap { c =>
      // customer c places c orders of 100*c each, last one on day c
      (1L to c).map(i => (c * 100 + i, c, "O",
        100.0 * c, f"2024-01-${c}%02d 00:00:00", "1-URGENT"))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp_ntz"))
    val cust = (1L to 5L).map(c => (c, "SEG")).toDF("c_custkey", "c_mktsegment")
    val out = Relational.rfmSegments(ords, cust).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out.values.sum == 5L, "every customer lands in exactly one code")
    assert(out == Map(111L -> 1L, 222L -> 1L, 333L -> 1L, 444L -> 1L, 555L -> 1L),
      s"aligned recency/frequency/monetary must produce the diagonal: $out")
  }

  test("q105: skew profile finds the hot key and its exact share") {
    // key 7 appears 6 times, keys 1..4 once each → 10 rows, 5 keys
    val keyed = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 4L)).toDF("k")
    val r = Relational.keySkewProfile(keyed).collect().head
    assert(r.getAs[Long]("n_rows") == 10 && r.getAs[Long]("n_keys") == 5)
    assert(r.getAs[Long]("hot_key") == 7L && r.getAs[Long]("hot_cnt") == 6L)
    assert(r.getAs[Double]("skew_ratio") == 3.0, "max/mean = 6/(10/5)")
    assert(r.getAs[Double]("hot_share") == 0.6)
  }

  test("q106: column profile counts distincts and nulls per column exactly") {
    val t1 = Timestamp.valueOf("2024-03-01 10:00:00")
    val df = Seq(
      (1L, Option(t1), 10L, "a", Some(1.0), Some("{}")),
      (2L, Option(t1), 10L, "a", None, Some("{}")),
      (3L, Option.empty[Timestamp], 11L, "b", Some(2.0), None)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.columnProfile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("event_id") == ((3L, 0L)))
    assert(out("ts") == ((1L, 1L)), "the time axis is profiled too")
    assert(out("user_id") == ((2L, 0L)))
    assert(out("event_type") == ((2L, 0L)))
    assert(out("value") == ((2L, 1L)), "distinct skips nulls; null counted separately")
    assert(out("props") == ((1L, 1L)))
  }

  test("q107: every grain's buckets sum to the same corpus totals") {
    val rows = Relational.q107.fn(spark, sfDir).collect()
    val byGrain = rows.groupBy(_.getString(0))
    assert(byGrain.keySet == Set("1_hour", "2_day", "3_week"))
    val totals = byGrain.view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(totals.values.toSet.size == 1,
      s"hour/day/week partitions must conserve the event count: $totals")
    // buckets are truncations: week count ≤ day count ≤ hour count
    val nBuckets = byGrain.view.mapValues(_.length).toMap
    assert(nBuckets("3_week") <= nBuckets("2_day") &&
      nBuckets("2_day") <= nBuckets("1_hour"))
  }

  test("q108: survivorship is consistent with q38's clusters; keeper is the min id") {
    val surv = Dedup.q108.fn(spark, sfDir).collect()
    val clusters = Dedup.q38.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(surv.length == clusters.size, "one golden record per cluster")
    surv.foreach { r =>
      val (cid, nDocs, keeper) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(clusters(cid) == nDocs, s"cluster $cid size mismatch")
      assert(keeper == cid,
        "CC labels are component minima, so the keeper IS the cluster id")
      assert(r.getLong(3) >= keeper, "longest_id must be a member (≥ min id)")
      assert(r.getLong(4) >= 1L && r.getLong(5) > 0L)
    }
  }

  test("q109: lead-time census conserves lines and its stats are coherent") {
    val rows = Relational.q109.fn(spark, sfDir).collect()
    val nLineitem = graft.Tables.lineitem(spark, sfDir).count()
    // Every line joins its order (FK-complete corpus, q100's law), so the
    // per-priority line counts partition the fact table exactly.
    assert(rows.map(_.getLong(1)).sum == nLineitem,
      "per-priority n_lines must partition lineitem")
    rows.foreach { r =>
      val (n, nOrd, mn, mx, sum, late) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nOrd >= 1L && nOrd <= n, "orders per class bounded by lines")
      assert(mn <= mx && sum >= n * mn && sum <= n * mx,
        "day stats must be mutually consistent")
      assert(late >= 0L && late <= n, "late share bounded")
      // NOTE: the synthetic corpus draws o_orderdate and l_shipdate
      // independently, so negative lead times exist by construction;
      // the stats laws above are date-distribution-agnostic.
    }
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
