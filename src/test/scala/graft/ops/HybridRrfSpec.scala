package graft.ops

import graft.SparkTestBase

/** Reciprocal-rank fusion (q73): the fusion law on crafted rank lists and
  * structural invariants of the registered hybrid-retrieval query.
  */
class HybridRrfSpec extends SparkTestBase {

  test("rrfFuse combines ranks and coalesces missing sides to zero") {
    import spark.implicits._
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "r")
    val den = Seq((20L, 1), (40L, 2)).toDF("doc_id", "r")
    val got = Similarity.rrfFuse(lex, den)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def rr(k: Int) = 1.0 / (60 + k) // fused output is rounded to 6 dp
    assert(math.abs(got(10L) - rr(1)) < 5.1e-7)          // lexical only
    assert(math.abs(got(20L) - (rr(2) + rr(1))) < 5.1e-7) // both retrievers
    assert(math.abs(got(40L) - rr(2)) < 5.1e-7)          // dense only
    assert(got.keySet == Set(10L, 20L, 30L, 40L), "candidate union")
    // a doc ranked by both retrievers beats single-source docs of
    // comparable depth — the point of the fusion
    assert(got(20L) > got(10L))
  }

  test("q73 returns a dense top-10 with non-increasing fused scores") {
    val out = Similarity.q73.fn(spark, sfDir).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every fused score is at most the two-list maximum 2/(60+1)
    assert(scores.head <= 2.0 / 61 + 1e-9)
    assert(scores.forall(_ > 0))
  }
}
