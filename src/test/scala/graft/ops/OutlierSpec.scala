package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** q82's z-score anomaly census on a crafted distribution with a known
  * mean/σ: the profile numbers, the 3σ boundary, and the max-z report.
  */
class OutlierSpec extends SparkTestBase {
  import spark.implicits._

  private def census(rows: (String, Double)*): Map[String, Row] = {
    val df = rows.toDF("event_type", "value")
    Relational.valueOutliers(df, df)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("known distribution: mean/sigma exact, only the 3-sigma crosser flags") {
    // 8 values at ±1 around 10 → mean 10, σ = 1; one 13.5 value (z=3.5
    // once recomputed with it included shifts the profile — so craft
    // symmetric tails instead): use ±1 ×8 plus ±4 ×1 → mean 10,
    // σ² = (8·1 + 2·16)/10 = 4 → σ = 2; z(14) = 2 → no outlier at 3σ.
    val base = Seq.fill(4)(Seq("a" -> 9.0, "a" -> 11.0)).flatten ++
      Seq("a" -> 6.0, "a" -> 14.0)
    val out = census(base: _*)
    val r = out("a")
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 2.0)
    assert(r.getLong(4) == 0L, "2σ tails must not flag at the 3σ threshold")
    assert(r.getDouble(5) == 2.0)
  }

  test("a genuine 3-sigma crosser is counted and dominates max_abs_z") {
    // 100 zeros and one spike: mean = s/101, σ from exact moments; the
    // spike's z must exceed 3 and be the max.
    val rows = Seq.fill(100)("b" -> 0.0) :+ ("b" -> 50.0)
    val out = census(rows: _*)
    val r = out("b")
    assert(r.getLong(4) == 1L, s"spike not flagged: $r")
    assert(r.getDouble(5) > 3.0)
  }

  test("groups are profiled independently") {
    val rows = Seq.fill(10)("c" -> 1000.0) ++ Seq.fill(10)("d" -> 0.001)
    val out = census(rows: _*)
    assert(out("c").getLong(4) == 0L && out("d").getLong(4) == 0L,
      "constant groups have no outliers regardless of the other group's scale")
    assert(out("c").getDouble(5) == 0.0,
      "sigma=0 must report zero deviation, not an ANSI divide fault")
  }
}
