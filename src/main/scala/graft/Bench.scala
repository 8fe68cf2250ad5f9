package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (BASELINE.md §B): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology: queries run in sorted name order after a scan warmup (JVM
  * + codegen + file-listing costs land on the warmup, not the first
  * query). Each query is forced through the `noop` sink so the full
  * result set is computed (a bare count() would let Catalyst prune the
  * query's own projections).
  */
object Bench {

  private object Diag {
    import scala.jdk.CollectionConverters._
    import java.lang.management.ManagementFactory
    def compileMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def gcMs: Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime.max(0L)).sum
  }

  private def newSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Parallelism floor under AQE: coalescing is byte-based and the
      // dedup/similarity joins EXPAND rows 10-1000x after the exchange, so
      // coalescing their tiny inputs to 1-2 partitions serializes the
      // heavy join on one thread (measured: identical plans swinging
      // 5s..110s run-to-run). On a real cluster the same floor is
      // spark.default.parallelism-sized; data volume alone cannot reveal
      // generator/join fanout.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", cpus)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Remove leftover shuffle dirs from SIGKILL'd prior runs: the tmpfs
    * local dir (build.sbt) is exclusively ours and runs are serial, so a
    * startup sweep cannot race a live JVM's files.
    */
  private[graft] def sweepLocalDirs(): Unit =
    sys.props.get("spark.local.dir").filter(_.startsWith("/dev/shm/")).foreach { root =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty).foreach(rm)
    }

  def main(args: Array[String]): Unit = {
    sweepLocalDirs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated filter for local bisection (driver unset).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Measurement isolation: a fresh SparkContext every few queries.
    // Running all 42 queries in one context shows progressive 10-40x
    // degradation in the later queries (accumulated broadcast blocks,
    // codegen classes, shuffle state — run-dependent), which measures the
    // harness, not the query. Context restart bounds the contamination;
    // each group gets a small scan warmup so per-query timings still
    // exclude session startup.
    val groupSize = 4
    val results = names.grouped(groupSize).flatMap { group =>
      SparkSession.getActiveSession.foreach(_.stop())
      val spark = newSession(cpus)
      Tables.all.foreach { t =>
        try {
          val df = if (t == "events") Tables.events(spark, sfDir)
                   else Tables.load(spark, sfDir, t)
          df.count()
        } catch { case _: Throwable => () }
      }
      group.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val comp0 = Diag.compileMs
        val gc0 = Diag.gcMs
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // Where did the wall time go? JIT-compile and GC deltas expose the
        // run-dependent JVM-level stalls that plan inspection can't.
        System.err.println(f"[bench-diag] $name wall=$dt%.1fs " +
          f"jit=${(Diag.compileMs - comp0) / 1000.0}%.1fs gc=${(Diag.gcMs - gc0) / 1000.0}%.1fs")
        // Drop persisted tables between queries — a leftover cache from a
        // dedup query measurably contaminates its successors.
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        name -> (if (ok) dt else -1.0)
      }
    }.toSeq
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
