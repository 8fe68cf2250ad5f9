package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, when}

/** Laws for the corpus-statistics queries on crafted corpora where the
  * statistics are hand-computable: q115's PMI values/tie-breaks and
  * q116's exact power-law slope recovery.
  */
class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("q115: PMI of a perfectly-coupled pair is ln(N·n_ab/(df_a·df_b))") {
    // x and y co-occur in 5 of 6 docs; z is a singleton outside the
    // top-2 vocabulary and must not appear in any pair.
    val docs = ((1L to 5L).map(i => (i, "x y")) :+ (6L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.pmiCooccur(docs, vocabSize = 2, minPairs = 1L, topK = 10)
      .collect()
    assert(out.length == 1, out.mkString("; "))
    val r = out.head
    assert(r.getAs[Long]("rnk") == 1L)
    assert(r.getAs[String]("term_a") == "x" && r.getAs[String]("term_b") == "y")
    assert(r.getAs[Long]("n_ab") == 5L)
    // pmi = ln(5 * 6 / (5 * 5)) = ln(1.2), rounded to 4 dp
    assert(r.getAs[Double]("pmi") == math.rint(math.log(1.2) * 1e4) / 1e4)
  }

  test("q115: equal-PMI pairs tie-break on (term_a, term_b)") {
    // c rides with p in docs 1-5 and with q in docs 6-10: both pairs
    // score pmi = ln(10·5/(10·5)) = 0 and must rank (c,p) then (c,q).
    val docs = ((1L to 5L).map(i => (i, "p c")) ++
      (6L to 10L).map(i => (i, "q c"))).toDF("doc_id", "text")
    val out = TextOps.pmiCooccur(docs, vocabSize = 3, minPairs = 1L, topK = 10)
      .collect().map(r => (r.getAs[Long]("rnk"),
        r.getAs[String]("term_a"), r.getAs[String]("term_b"),
        r.getAs[Double]("pmi")))
    assert(out.toSeq == Seq((1L, "c", "p", 0.0), (2L, "c", "q", 0.0)),
      out.mkString("; "))
  }

  test("q118: uniform categories give ln(k); a constant column gives +0.0") {
    // lang uniform over 4 values → H = ln 4; source constant → H = 0
    // (and must be +0.0, not -0.0 — the r4z guard).
    val docs = (1L to 8L).map(i => (i, s"l${i % 4}", "s0")).toDF("doc_id", "lang", "source")
    val out = StatOps.entropyProfile(docs).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val lang = out("lang")
    assert(lang.getAs[Long]("n_categories") == 4L && lang.getAs[Long]("n_rows") == 8L)
    assert(lang.getAs[Double]("entropy") == math.rint(math.log(4.0) * 1e4) / 1e4)
    val src = out("source")
    assert(src.getAs[Long]("n_categories") == 1L)
    assert(java.lang.Double.doubleToRawLongBits(src.getAs[Double]("entropy")) == 0L,
      "constant column must yield +0.0 exactly")
  }

  test("q119: equal spends give Gini 0; a hand-computed split gives 0.25") {
    def orders(rows: Seq[(Long, Long, Double)]) = rows
      .map { case (o, c, p) => (o, c, "O", p, "2024-01-01 00:00:00", "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val cust = (1L to 2L).map(c => (c, "SEG")).toDF("c_custkey", "c_mktsegment")
    val eq = StatOps.giniBySegment(
      orders(Seq((1L, 1L, 50.0), (2L, 2L, 50.0))), cust).collect().head
    assert(eq.getAs[Double]("gini") == 0.0)
    // spends (1, 3): ranks (1, 2), G = 2·(1+6)/(2·4) − 3/2 = 0.25
    val sk = StatOps.giniBySegment(
      orders(Seq((1L, 1L, 1.0), (2L, 2L, 3.0))), cust).collect().head
    assert(sk.getAs[Double]("gini") == 0.25)
  }

  test("q120: first digit comes from the integer string, not log10") {
    val amts = Seq(123.45, 999.99, 1000.0, 85.0, 1.0, 19999.0)
      .toDF("amount")
    val out = StatOps.benfordProfile(amts).collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    assert(out == Map(1 -> 4L, 8 -> 1L, 9 -> 1L), out.toString)
  }

  test("q121: exact independence gives chi2 = 0; full coupling gives n") {
    val indep = ((1L to 1L).map(i => (i, "a", "x")) ++ Seq((2L, "a", "y"),
      (3L, "b", "x"), (4L, "b", "y"))).toDF("doc_id", "lang", "source")
    val r0 = StatOps.chi2Independence(indep).collect().head
    assert(r0.getAs[Long]("dof") == 1L)
    assert(r0.getAs[Double]("chi2") == 0.0)
    // perfectly coupled 2x2: chi2 equals n
    val dep = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"), (4L, "b", "y"))
      .toDF("doc_id", "lang", "source")
    val r1 = StatOps.chi2Independence(dep).collect().head
    assert(r1.getAs[Double]("chi2") == 4.0)
  }

  private def dayOrders(vals: Seq[Double]) = vals.zipWithIndex
    .map { case (v, i) =>
      (i.toLong + 1L, 1L, "O", v, f"2024-03-${i + 1}%02d 00:00:00", "1-URGENT")
    }
    .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("q122: a perfectly alternating series autocorrelates to exactly -1") {
    // daily [0,2,0,2,0,2]: every consecutive pair anti-moves; the exact
    // DECIMAL sums make the double algebra land on -1.0 bit-exactly.
    val r = StatOps.autocorrDaily(dayOrders(Seq(0.0, 2.0, 0.0, 2.0, 0.0, 2.0)))
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 5L)
    assert(r.getAs[Double]("autocorr") == -1.0)
  }

  test("q123: a level shift puts the changepoint at the step boundary") {
    // [0,0,10,10]: dev_k = |4*S_k - k*20| peaks at k=2 (40) -> day 2,
    // max_cusum = 40/4 = 10.
    val r = StatOps.cusumChangepoint(dayOrders(Seq(0.0, 0.0, 10.0, 10.0)))
      .collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[String]("change_day") == "2024-03-02")
    assert(r.getAs[Double]("max_cusum") == 10.0)
  }

  private def prioOrders(rows: Seq[(Int, String)]) = rows.zipWithIndex
    .map { case ((day, prio), i) =>
      (i.toLong + 1L, 1L, "O", 1.0, f"2024-03-$day%02d 00:00:00", prio)
    }
    .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("q124: a 75/25 -> 25/75 mix shift scores PSI = ln 3; identical halves 0") {
    // days 1-2 land in H1, 3-4 in H2 ((day-min)*2 <= span test)
    val shifted = prioOrders(
      Seq(1 -> "A", 1 -> "A", 2 -> "A", 2 -> "B",
        3 -> "B", 3 -> "B", 4 -> "B", 4 -> "A"))
    val r = StatOps.psiPriorityDrift(shifted).collect().head
    assert(r.getAs[Long]("n_buckets") == 2L)
    assert(r.getAs[Long]("n_h1") == 4L && r.getAs[Long]("n_h2") == 4L)
    // psi = (.75-.25)ln(3) + (.25-.75)ln(1/3) = ln 3
    assert(r.getAs[Double]("psi") == math.rint(math.log(3.0) * 1e4) / 1e4)
    val same = prioOrders(Seq(1 -> "A", 1 -> "B", 4 -> "A", 4 -> "B"))
    assert(StatOps.psiPriorityDrift(same).collect().head.getAs[Double]("psi") == 0.0)
  }

  test("q124: a bucket absent from one half is excluded, visibly") {
    val oneSided = prioOrders(Seq(1 -> "A", 1 -> "C", 4 -> "A"))
    val r = StatOps.psiPriorityDrift(oneSided).collect().head
    assert(r.getAs[Long]("n_buckets") == 1L, "C only exists in H1: must drop out")
  }

  test("q125: missing days telescope to span minus present days") {
    val r = StatOps.calendarGaps(prioOrders(
      Seq(1 -> "A", 2 -> "A", 5 -> "A", 9 -> "A"))).collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("span_days") == 9L)
    assert(r.getAs[Long]("missing_days") == 5L, "9-day span, 4 present -> 5 missing")
    assert(r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Long]("max_gap") == 3L)
    val dense = StatOps.calendarGaps(prioOrders(Seq(1 -> "A", 2 -> "A"))).collect().head
    assert(dense.getAs[Long]("missing_days") == 0L && dense.getAs[Long]("max_gap") == 0L)
  }

  test("q126: ISO weekday profile with a hand-computed seasonality index") {
    // 2024-03-04 and -11 are Mondays (rev 30, 20), -05 a Tuesday (10):
    // Monday mean 25 vs overall 20 -> 1.25; Tuesday 10 vs 20 -> 0.5.
    val r = StatOps.weekdaySeasonality(prioOrders(
      Seq(4 -> "A", 5 -> "A", 11 -> "A")).withColumn("o_totalprice",
      when(col("o_orderkey") === 1L, 30.0)
        .when(col("o_orderkey") === 2L, 10.0).otherwise(20.0)))
      .collect().map(x => x.getAs[Long]("dow") -> x).toMap
    assert(r(1L).getAs[String]("day_name") == "Monday")
    assert(r(1L).getAs[Long]("n_days") == 2L)
    assert(r(1L).getAs[Double]("seasonality_index") == 1.25)
    assert(r(2L).getAs[String]("day_name") == "Tuesday")
    assert(r(2L).getAs[Double]("seasonality_index") == 0.5)
  }

  test("q116: an exact rank^-2 corpus fits slope -2 with zero residual") {
    // tf(rank) = 144 / rank^2 at ranks 1..4: ln(tf) = ln(144) - 2·ln(rank)
    // exactly, so the least-squares slope must round to -2.0000 and the
    // intercept to ln(144).
    val counts = Seq("aa" -> 144, "bb" -> 36, "cc" -> 16, "dd" -> 9)
    val text = counts.map { case (t, n) => (t + " ") * n }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.zipfFit(docs, topV = 4).collect().head
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(r.getAs[Double]("slope") == -2.0, s"slope ${r.getAs[Double]("slope")}")
    assert(r.getAs[Double]("intercept") == math.rint(math.log(144.0) * 1e4) / 1e4,
      s"intercept ${r.getAs[Double]("intercept")}")
  }
}
