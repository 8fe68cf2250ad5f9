package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** q76's reference-LM familiarity scoring on crafted documents: bigram
  * counting, OOV detection against the reference slice, the mean-
  * frequency score, and the integer keep threshold.
  */
class LmFamiliaritySpec extends SparkTestBase {
  import spark.implicits._

  private def score(rows: (Long, String, String)*): Map[Long, Row] =
    TextOps.lmFamiliarity(rows.toDF("doc_id", "source", "text"), refSource = "ref")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("reference docs score their own bigram frequencies; clones are fully in-vocab") {
    val out = score(
      (1L, "ref", "a b a b"),   // bigrams: "a b"×2, "b a"×1
      (2L, "src", "a b a b"),   // clone of the reference → 0 OOV
      (3L, "src", "x y x y"))   // alien → all OOV
    // doc1: 3 bigrams, counts from ref slice: "a b"→2 (twice), "b a"→1 → mean (2+2+1)/3
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 0)
    assert(out(1L).getDouble(3) == math.rint(5.0 / 3 * 1e4) / 1e4)
    assert(out(2L).getLong(2) == 0 && out(2L).getBoolean(4))
    assert(out(3L).getLong(2) == 3 && out(3L).getDouble(3) == 0.0 && !out(3L).getBoolean(4))
  }

  test("keep threshold is exactly 'at most half OOV', decided in integers") {
    val out = score(
      (1L, "ref", "a b c"),
      (10L, "src", "a b x q b c"),  // 5 bigrams: "a b"✓, "b x"✗, "x q"✗, "q b"✗, "b c"✓ → 3/5 OOV
      (11L, "src", "a b x q"))      // 3 bigrams: 1 in-vocab, 2 OOV → 2·2 > 3 → drop
    assert(!out(10L).getBoolean(4), "3 of 5 OOV must drop")
    assert(!out(11L).getBoolean(4))
    val half = score((1L, "ref", "a b c"), (12L, "src", "a b x a b c"))
    // "a b"✓ "b x"✗ "x a"✗ "a b"✓ "b c"✓ → 2 of 5 OOV → keep
    assert(half(12L).getLong(2) == 2 && half(12L).getBoolean(4))
  }

  test("single-token and empty docs produce no bigram rows") {
    val out = score((1L, "ref", "a b"), (2L, "src", "solo"))
    assert(!out.contains(2L))
  }
}
