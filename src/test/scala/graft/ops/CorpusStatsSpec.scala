package graft.ops

import graft.SparkTestBase

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
