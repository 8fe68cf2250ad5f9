package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (q70 helpers): code values, saturation census
  * and the reconstruction-error bound on crafted vectors, plus corpus
  * invariants of the registered query.
  */
class QuantizeSpec extends SparkTestBase {
  import Similarity._

  test("crafted vectors quantize to the expected int8 codes") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, -0.5, 0.25, 0.0)),
      (2L, Seq(0.0, 0.0, 254.0, -127.0))
    ).toDF("id", "e")
      .withColumn("scale", quantScale(col("e")))
      .withColumn("q", quantVec(col("e"), col("scale")))
      .withColumn("mse", quantMse(col("e"), col("scale")))
      .withColumn("n_sat", quantSaturated(col("e"), col("scale")))
    val rows = df.orderBy("id").collect()

    val r1 = rows(0)
    assert(math.abs(r1.getDouble(2) - 1.0 / 127.0) < 1e-15)
    // -0.5/scale = -63.5 rounds HALF_UP (away from zero) to -64
    assert(r1.getSeq[Double](3) == Seq(127.0, -64.0, 32.0, 0.0))
    assert(r1.getLong(5) == 1L)

    val r2 = rows(1)
    assert(r2.getDouble(2) == 2.0)
    assert(r2.getSeq[Double](3) == Seq(0.0, 0.0, 127.0, -64.0))
    assert(r2.getLong(5) == 1L)

    // per-element |error| <= scale/2, so mse <= (scale/2)^2
    rows.foreach { r =>
      val bound = math.pow(r.getDouble(2) / 2.0, 2)
      assert(r.getDouble(4) <= bound + 1e-18,
        s"mse ${r.getDouble(4)} exceeds bound $bound")
    }
  }

  test("int8-quantized cosine top-10 keeps recall >= 0.9 vs exact") {
    // The operational claim behind q70: serving ANN from the 4×-smaller
    // int8 corpus must not meaningfully change the neighbors. Top-10 by
    // cosine over dequantized vectors vs exact, 20 probes, mean recall.
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("scale", quantScale(col("e")))
      .withColumn("dq", transform(quantVec(col("e"), col("scale")), q => q * col("scale")))
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("pid"), col("e").as("pe"), col("dq").as("pdq"))
    val w = (c: String) => Window.partitionBy("pid").orderBy(col(c).desc, col("vec_id").asc)
    val joined = emb.join(broadcast(probes), col("vec_id") =!= col("pid"))
    def top10(scoreCol: org.apache.spark.sql.Column, byCol: String) =
      joined.withColumn(byCol, scoreCol)
        .withColumn("rnk", row_number().over(w(byCol)))
        .filter(col("rnk") <= 10)
        .select(col("pid"), col("vec_id"))
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = top10(cosine(col("e"), col("pe")), "s_exact")
    val quant = top10(cosine(col("dq"), col("pdq")), "s_quant")
    val recalls = exact.keys.map(p => (exact(p) & quant(p)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"quantized recall degraded to $mean")
  }

  test("q70 corpus census invariants") {
    val out = Similarity.q70.fn(spark, sfDir).collect()
    assert(out.length == 10) // one row per label
    val total = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == total, "every vector is audited")
    out.foreach { r =>
      // the max-|x| element of every vector saturates, so n_sat >= n_vecs
      assert(r.getLong(4) >= r.getLong(1), s"label ${r.getInt(0)}: too few saturations")
      assert(r.getDouble(2) > 0.0, "reconstruction error must be nonzero")
      assert(r.getDouble(3) > 0.0)
    }
  }
}
