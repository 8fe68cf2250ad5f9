package graft.ops

import graft.SparkTestBase

/** The materialized-index serve paths (q110/q111/q112) at bench scale:
  * the probe-only queries must deliver the SAME recall floors as their
  * inline-build counterparts (q23e IVF 0.68, q23f PQ 0.90 — the
  * AnnRecallFloorSpec gates), from artifacts on disk, without re-running
  * any training. Also pins the serve-path plan shape: the IVF probe's
  * list scan is statically partition-pruned to the probed cids, and the
  * PQ probe's corpus-sided input is the compressed codes table, not the
  * embeddings.
  */
class AnnIndexSpec extends SparkTestBase {

  private val benchSf = "/root/testdata/sf0.1"

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactTopk: Set[(Long, Long)] =
    topkSet(Similarity.q23.fn(spark, benchSf))

  test("q110 build is idempotent-by-marker; probes adopt a forced rebuild") {
    val dir = AnnIndex.build(spark, sfDir, force = true)
    val marker = new java.io.File(dir, "_SUCCESS")
    assert(marker.exists(), "build must leave a _SUCCESS marker")
    val stamp = marker.lastModified()
    // Unforced build must adopt the existing artifacts, not rebuild.
    assert(AnnIndex.build(spark, sfDir) === dir)
    assert(marker.lastModified() === stamp,
      "unforced build re-ran the trainer instead of adopting the marker")
    // The probe runs against the adopted index and returns the full
    // top-k surface (10 probes × 5 neighbors at every SF).
    assert(AnnIndex.ivfProbe(spark, sfDir).count() === 50L)
    assert(AnnIndex.pqProbe(spark, sfDir).count() === 50L)
  }

  test("q111 IVF probe-only recall >= 0.68 at sf0.1 (q23e's floor)") {
    val r = {
      val approx = topkSet(AnnIndex.ivfProbe(spark, benchSf))
      (exactTopk & approx).size.toDouble / exactTopk.size
    }
    info(f"q111 recall $r%.3f")
    assert(r >= 0.68, f"served-IVF recall regressed to $r%.3f (floor 0.68)")
  }

  test("q112 PQ probe-only recall >= 0.90 at sf0.1 (q23f's floor)") {
    val r = {
      val approx = topkSet(AnnIndex.pqProbe(spark, benchSf))
      (exactTopk & approx).size.toDouble / exactTopk.size
    }
    info(f"q112 recall $r%.3f")
    assert(r >= 0.90, f"served-PQ recall regressed to $r%.3f (floor 0.90)")
  }

  test("q111 plan: list scan is partition-pruned to the probed cids") {
    AnnIndex.build(spark, sfDir)
    val plan = AnnIndex.ivfProbe(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"),
      s"IVF probe scan lost its static cid partition pruning:\n$plan")
    // Probe-only: no kmeans stage — the plan reads the persisted lists,
    // never the raw embeddings corpus for candidates.
    assert(plan.contains("ivf_assignments"),
      s"IVF probe must scan the persisted inverted lists:\n$plan")
  }

  test("q112 plan: corpus-sided input is the compressed codes table") {
    AnnIndex.build(spark, sfDir)
    val plan = AnnIndex.pqProbe(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("pq_codes"),
      s"PQ probe must scan the persisted codes:\n$plan")
  }

  test("q113 append freezes the base: no artifact retrained, delta idempotent") {
    val (baseDir, _) = AnnIndex.appendDelta(spark, sfDir)
    def trainedBytes: Map[String, Long] =
      Seq("ivf_centroids", "pq_codebook").flatMap { a =>
        Option(new java.io.File(s"$baseDir/$a").listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(f => s"$a/${f.getName}" -> f.length())
      }.toMap
    val before = trainedBytes
    // A second append must neither retrain (trained artifact files
    // byte-identical) nor grow the appended index (delta overwritten,
    // base untouched) — the run-idempotence q113's bench line relies on.
    val census1 = AnnIndex.q113.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val census2 = AnnIndex.q113.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trainedBytes === before, "append retrained a base artifact")
    assert(census1 === census2, "append is not idempotent across runs")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(census1("ivf_assignments") === n && census1("pq_codes") === n,
      s"appended index must cover the corpus exactly: $census1 vs $n")
  }

  test("q113 appended-index IVF recall matches the full-build floor at sf0.1") {
    val approx = topkSet(AnnIndex.ivfProbeAppended(spark, benchSf))
    val r = (exactTopk & approx).size.toDouble / exactTopk.size
    info(f"appended-index recall $r%.3f")
    assert(r >= 0.68, f"appended-index IVF recall regressed to $r%.3f (floor 0.68)")
  }
}
