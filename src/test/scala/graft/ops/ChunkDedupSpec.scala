package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** q80's cross-document chunk dedup and q81's source-overlap matrix on
  * crafted inputs: shared-boilerplate detection, the within-doc-repeat
  * exclusion, the keep threshold, and the Jaccard law.
  */
class ChunkDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 4 // small chunk width keeps crafted docs readable

  private def census(rows: (Long, String)*): Map[Long, Row] =
    Dedup.chunkDedup(rows.toDF("doc_id", "text"), W)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a chunk shared across two docs is duplicated in both; unique chunks are not") {
    val boiler = "terms of service apply"
    val out = census(
      (1L, s"$boiler unique text one here"),
      (2L, s"$boiler other words entirely now"),
      (3L, "completely fresh content nothing shared"))
    // each doc: 2 chunks of width 4; the boilerplate chunk is dup in 1 and 2
    assert(out(1L).getLong(1) == 2 && out(1L).getLong(2) == 1)
    assert(out(2L).getLong(2) == 1)
    assert(out(3L).getLong(2) == 0 && out(3L).getBoolean(4))
    assert(out(1L).getDouble(3) == 0.5 && out(1L).getBoolean(4))
  }

  test("within-doc repetition alone does not mark a chunk duplicated") {
    val rep = "spam spam spam spam"
    val out = census(
      (1L, s"$rep $rep"),              // same chunk twice in ONE doc
      (2L, "other content words here"))
    assert(out(1L).getLong(2) == 0, "distinct-doc count must ignore within-doc repeats")
  }

  test("keep flag drops a doc once more than half its chunks are shared") {
    val a = "alpha beta gamma delta"
    val b = "epsilon zeta eta theta"
    val c = "iota kappa lambda mu"
    val out = census(
      (1L, s"$a $b $c"),      // 3 chunks, 2 shared with doc 2 → drop
      (2L, s"$a $b"),
      (3L, "nothing in common at all"))
    assert(out(1L).getLong(2) == 2 && !out(1L).getBoolean(4))
    assert(out(2L).getLong(2) == 2 && !out(2L).getBoolean(4))
  }

  test("source overlap reproduces the Jaccard of hand-built vocabularies") {
    val df = Seq(
      ("sA", "a b c"),
      ("sB", "b c d"),   // |A∩B|=2, |A∪B|=4 → 0.5
      ("sC", "x y z"))   // disjoint from both → no row
    .toDF("source", "text")
    val out = TextOps.sourceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("sA", "sB")) == (2L, 0.5))
    assert(!out.contains(("sA", "sC")) && !out.contains(("sB", "sC")),
      "disjoint vocabularies must produce no overlap row")
  }
}
