package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <queryName> [sfDir] [mode]` —
  * prints the query's explain output without executing it. Used to check
  * pushdown, codegen spans, join strategies, and where expensive
  * expressions landed after optimization.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.tune(spark)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain(mode)
    spark.stop()
  }
}
