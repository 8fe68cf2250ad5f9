package graft.ops

import graft.SparkTestBase

/** q84's centroid-drift law on crafted snapshots: exact distances for
  * hand-built centroids, zero drift for identical snapshots, and
  * per-label independence.
  */
class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def drift(rows: (Int, Boolean, Seq[Float])*): Map[Int, Double] = {
    val df = rows.toDF("label", "old_snap", "embedding")
    Similarity.embeddingDrift(df)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
  }

  test("hand-built centroids: drift is the exact L2 distance") {
    // label 0: old centroid (1,0), new centroid (0,1) → drift √2
    val out = drift(
      (0, true, Seq(1f, 0f)), (0, true, Seq(1f, 0f)),
      (0, false, Seq(0f, 1f)), (0, false, Seq(0f, 1f)))
    assert(out(0) == math.rint(math.sqrt(2.0) * 1e4) / 1e4)
  }

  test("identical snapshots drift zero; labels are independent") {
    val out = drift(
      (1, true, Seq(3f, 4f)), (1, false, Seq(3f, 4f)),
      (2, true, Seq(0f, 0f)), (2, false, Seq(3f, 4f)))
    assert(out(1) == 0.0)
    assert(out(2) == 5.0, "label 2's drift must be its own centroid distance")
  }

  test("centroid is the mean, not the sum: doubling a snapshot's size changes nothing") {
    val base = Seq((3, true, Seq(2f, 2f)), (3, false, Seq(4f, 2f)))
    val doubled = base ++ Seq((3, true, Seq(2f, 2f)), (3, false, Seq(4f, 2f)))
    assert(drift(base: _*)(3) == drift(doubled: _*)(3))
  }
}
