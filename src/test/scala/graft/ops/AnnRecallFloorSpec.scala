package graft.ops

import graft.SparkTestBase

/** ENFORCED recall floors for every approximate ANN path, at the bench
  * scale factor (sf0.1) where the sealed numbers were measured — r7
  * verdict item 3: the bench's `ann_recall` diag line RECORDS recall each
  * run, but nothing failed when a refactor regressed it (r5 shipped
  * q23e at 0.54 and q23f at 0.40 silently). These floors sit a margin
  * under the measured values (0.70 / 0.78 / 0.74 / 0.96), so plane-seed
  * or centroid-seed luck can't flake the suite while a genuine de-tune —
  * fewer tables, a dropped Lloyd step, a shrunken refine pool — fails it.
  *
  * (PipelineOpsSpec keeps its sf0.001 behavioral tests; this suite is the
  * regression gate at the scale the recalls are quoted at.)
  */
class AnnRecallFloorSpec extends SparkTestBase {

  private val benchSf = "/root/testdata/sf0.1"

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactTopk: Set[(Long, Long)] =
    topkSet(Similarity.q23.fn(spark, benchSf))

  private def recallVsExact(approx: Set[(Long, Long)]): Double =
    (exactTopk & approx).size.toDouble / exactTopk.size

  test("q23c multi-table LSH top-k recall >= 0.65 at sf0.1") {
    val r = recallVsExact(topkSet(Similarity.q23c.fn(spark, benchSf)))
    info(f"q23c recall $r%.3f (sealed 0.70)")
    assert(r >= 0.65, f"q23c LSH recall regressed to $r%.3f (floor 0.65, sealed 0.70)")
  }

  test("q23d banded-LSH threshold-pairs recall >= 0.72 at sf0.1") {
    val exactPairs = Similarity.q23b.fn(spark, benchSf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Similarity.q23d.fn(spark, benchSf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "fixture degenerate: no exact near-dup pairs")
    assert(lshPairs.subsetOf(exactPairs), "q23d must stay exactly verified (no false positives)")
    val r = (exactPairs & lshPairs).size.toDouble / exactPairs.size
    info(f"q23d recall $r%.3f (sealed 0.78)")
    assert(r >= 0.72, f"q23d pair recall regressed to $r%.3f (floor 0.72, sealed 0.78)")
  }

  test("q23e IVF top-k recall >= 0.68 at sf0.1") {
    val r = recallVsExact(topkSet(Similarity.q23e.fn(spark, benchSf)))
    info(f"q23e recall $r%.3f (sealed 0.74)")
    assert(r >= 0.68, f"q23e IVF recall regressed to $r%.3f (floor 0.68, sealed 0.74)")
  }

  test("q23f PQ top-k recall >= 0.90 at sf0.1") {
    val r = recallVsExact(topkSet(Similarity.q23f.fn(spark, benchSf)))
    info(f"q23f recall $r%.3f (sealed 0.96)")
    assert(r >= 0.90, f"q23f PQ recall regressed to $r%.3f (floor 0.90, sealed 0.96)")
  }
}
