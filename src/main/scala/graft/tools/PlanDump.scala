package graft.tools

import graft.{Graft, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Batch plan capture for the optimization-round evidence files: write
  * `.explain("formatted")` output for a list of registered queries into
  * `<outDir>/<query>_<suffix>.txt`, one SparkSession for the whole list
  * (per-query `runMain graft.Explain` pays a JVM+session start each).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [sfDir] [q1,q2,…]
  * (no query list = every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", cpus)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.tune(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir)): Unit
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
