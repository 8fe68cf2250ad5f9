package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement for the r14 verdict item 1 decision: where the
  * composed serve's recall budget actually goes after IVFADC residual
  * encoding. Prints, for the q134 probe set at the bench SF:
  *
  *   - the ROUTING CEILING at several nprobe values — exact cosine
  *     top-k restricted to the routed lists: no encoding can beat this,
  *     whatever the quantizer does;
  *   - the composed serve's measured recall (residual encoding, the
  *     shipping path) against exact truth.
  *
  * If the serve sits at the ceiling, the remaining lever is nprobe (a
  * scan-cost knob), not the encoding. Numbers recorded in BASELINE.md.
  */
object RecallMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.tune(spark)
    import graft.ops.{AnnIndex, IvfPq, Similarity}
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)

    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(Similarity.q23.fn(spark, sfDir))

    val dir = IvfPq.build(spark, sfDir)
    val cents = spark.read.parquet(s"$dir/ivf_centroids")
      .collect().toIndexedSeq
      .map(r => (r.getInt(r.fieldIndex("cid")), r.getSeq[Double](r.fieldIndex("ce"))))
    val probes = AnnIndex.defaultProbes(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toIndexedSeq

    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }

    val lists = spark.read.parquet(s"$dir/ivfpq_lists")
      .select(col("cid"), col("vec_id"), col("e")).cache()
    lists.count(): Unit

    for (np <- Seq(4, 6, 8, 10, 12)) {
      import spark.implicits._
      val routed = probes.flatMap { case (pid, pe) =>
        cents.map { case (cid, ce) => (-cos(pe, ce), cid) }
          .sorted.take(np).map { case (_, cid) => (pid, pe, cid) }
      }.toDF("probe_id", "pe", "cid")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy(col("c").desc, col("vec_id").asc)
      val ceil = topkSet(lists.join(broadcast(routed), Seq("cid"))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("c", GraftFunctions.cosineSim(col("e"), col("pe")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= AnnIndex.TopK)
        .select(col("probe_id"), col("vec_id").as("nbr_id")))
      val r = (exact & ceil).size.toDouble / exact.size
      println(f"[recall-measure] routing ceiling nprobe=$np%2d: $r%.3f")
    }

    val served = topkSet(IvfPq.probe(spark, sfDir))
    val r = (exact & served).size.toDouble / exact.size
    println(f"[recall-measure] composed residual serve (nprobe=${AnnIndex.Nprobe}): $r%.3f")
    println(s"[recall-measure] sf=$sfDir probes=${probes.size} k=${AnnIndex.K}")
    spark.stop()
  }
}
