package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for the r13 verdict item 6 decision: does the
  * opt-in static cid pruning of the DISTRIBUTED composed serve pay, and
  * where? Prints pruned-vs-unpruned walls for (a) a selective mid-size
  * frame (few distinct probe targets — the only regime where the routed
  * set is a strict subset of the lists) and (b) the q132 reindex-scale
  * frame (5× corpus — routes everywhere). Numbers recorded in
  * BASELINE.md §C15; the default stays OFF per that measurement.
  */
object PruneMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.tune(spark)
    import graft.ops.{AnnIndex, IvfPq}
    val dir = IvfPq.build(spark, sfDir)
    val base = AnnIndex.corpus(spark, sfDir).select(col("vec_id"), col("e"))
    // (a) selective: 10k rows, 2 distinct targets -> <= 2*nprobe lists.
    val sel = base.filter(col("vec_id") < 2)
      .crossJoin(broadcast(spark.range(5000L).toDF("r")))
      .select((col("r") * lit(1000L) + col("vec_id")).as("pid"), col("e").as("pe"))
    // (b) broad: the q132 shape.
    val broad = base.crossJoin(broadcast(spark.range(5L).toDF("r")))
      .select(((col("r") + 1) * lit(10000000L) + col("vec_id")).as("pid"),
        col("e").as("pe"))
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prune-measure] $tag: $dt%.2f s")
      dt
    }
    // warm both plans once
    Seq(true, false).foreach { p =>
      IvfPq.probeDistributedSegments(spark, Seq(dir), sel, staticCidPrune = p)
        .write.format("noop").mode("overwrite").save()
    }
    val selOff = (1 to 3).map(_ => time("selective  prune=off")(
      IvfPq.probeDistributedSegments(spark, Seq(dir), sel))).min
    val selOn = (1 to 3).map(_ => time("selective  prune=on ")(
      IvfPq.probeDistributedSegments(spark, Seq(dir), sel, staticCidPrune = true))).min
    val broadOff = time("broad(5xc) prune=off")(
      IvfPq.probeDistributedSegments(spark, Seq(dir), broad))
    val broadOn = time("broad(5xc) prune=on ")(
      IvfPq.probeDistributedSegments(spark, Seq(dir), broad, staticCidPrune = true))
    println(f"[prune-measure] RESULT selective off=$selOff%.2f on=$selOn%.2f " +
      f"broad off=$broadOff%.2f on=$broadOn%.2f sf=$sfDir")
    spark.stop()
  }
}
