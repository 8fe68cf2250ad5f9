package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 (q72): ranking properties on crafted documents — tf monotonicity,
  * length normalization, zero-match exclusion, idf differentiation.
  */
class Bm25Spec extends SparkTestBase {

  private def score(docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, Double] = {
    import spark.implicits._
    TextOps.bm25(docs.toDF("doc_id", "text"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("tf monotonicity and zero-match exclusion") {
    val s = score(Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler filler filler filler filler")), Seq("spark"))
    assert(!s.contains(3L), "doc without any query term must not be scored")
    assert(s(1L) > s(2L), s"higher tf must outrank: $s")
  }

  test("length normalization: same tf, shorter doc wins") {
    val s = score(Seq(
      (1L, "spark filler filler filler filler filler filler filler"),
      (2L, "spark filler")), Seq("spark"))
    assert(s(2L) > s(1L), s"shorter doc must outrank at equal tf: $s")
  }

  test("idf: a rarer term contributes more than a ubiquitous one") {
    // 'rare' appears in 1 of 4 docs; 'common' in all 4. Docs 1 and 2 have
    // identical length and tf=1 for their respective term.
    val s = score(Seq(
      (1L, "rare filler filler"),
      (2L, "common filler filler"),
      (3L, "common stuff stuff"),
      (4L, "common stuff stuff")), Seq("rare", "common"))
    assert(s(1L) > s(2L), s"rare-term doc must outrank: $s")
  }

  test("q72 registered query returns a full, strictly-ranked top-20") {
    val out = TextOps.q72.fn(spark, sfDir).collect()
    assert(out.length == 20)
    assert(out.map(_.getLong(0)).toSeq == (1L to 20L), "rnk must be dense 1..20")
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores non-increasing")
  }
}
