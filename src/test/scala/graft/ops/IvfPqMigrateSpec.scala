package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** f3→f4 format migration ([[IvfPq.migrateFromF3]]): one join + one
  * partitioned write, no retraining, artifact-exact against both the f3
  * source and a fresh f4 build, and the migrated index is a first-class
  * f4 citizen (serve paths + LSM lifecycle compose).
  */
class IvfPqMigrateSpec extends SparkTestBase {

  private def freshRoot(name: String): String = {
    val base = new java.io.File(
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
      else sys.props("java.io.tmpdir"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(base)
    base.toString
  }

  private def frame(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, (0 until 64).map(j => math.cos(i * 11 + j * 5)), (i % 10).toInt))
      .toDF("vec_id", "e", "label")
  }

  private val listCols = Seq("cid", "vec_id", "label", "codes", "qnorm", "e")

  private def setEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("migration preserves every row, code and trained table exactly; lifecycle composes on the migrated base") {
    val root = freshRoot("graft-ivfpq-migrate")
    val emb = frame(0L until 300L)
    val f3 = AnnIndex.buildFrom(spark, emb, s"$root/f3")
    val mig = IvfPq.migrateFromF3(spark, f3, s"$root/f4")
    assert(AnnIndex.resolveVersion(s"$root/f4").contains(mig))

    // 1. Artifact-exact vs the SOURCE: the migrated list table is the
    //    join of f3's own assignments and codes — nothing re-derived.
    val lists = spark.read.parquet(s"$mig/ivfpq_lists")
      .select(listCols.map(col): _*)
    val expected = spark.read.parquet(s"$f3/ivf_assignments")
      .select(col("cid"), col("vec_id"), col("label"), col("e"))
      .join(spark.read.parquet(s"$f3/pq_codes")
        .select(col("vec_id"), col("codes"), col("qnorm")), Seq("vec_id"))
      .select(listCols.map(col): _*)
    assert(setEqual(lists, expected),
      "migrated lists diverge from the f3 assignments ⋈ codes join")
    Seq("ivf_centroids", "pq_codebook").foreach { a =>
      assert(setEqual(spark.read.parquet(s"$mig/$a"), spark.read.parquet(s"$f3/$a")),
        s"migrated $a diverges from the f3 copy")
    }

    // 2. Artifact-exact vs a FRESH f4 build of the same frame IN THE
    //    RAW SPACE (f3 codes are raw-vector codes, and the one-pass
    //    migration must not re-encode — the migrated artifact carries
    //    no _PQ_MODE marker, so serve paths score it raw): the shared
    //    deterministic trainers + the ONE pqEncode implementation mean
    //    migration and a raw-mode fresh build land the same bytes-level
    //    content — the formats cannot silently diverge.
    assert(!new java.io.File(s"$mig/_PQ_MODE").exists(),
      "a migrated index must stay in the raw encoding space (no marker)")
    val fresh = IvfPq.buildFrom(spark, emb, s"$root/fresh", residual = false)
    assert(setEqual(lists,
      spark.read.parquet(s"$fresh/ivfpq_lists").select(listCols.map(col): _*)),
      "migrated index diverges from a fresh f4 build of the same frame")

    // 3. The migrated index serves — collected and distributed paths
    //    agree on it like on any f4 artifact.
    val probes = frame(Seq(42L, 99L))
      .select((col("vec_id") + 1000000L).as("pid"), col("e").as("pe"))
    def served(df: DataFrame): Seq[(Long, Long, Long, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq.sorted
    val coll = served(IvfPq.probeSegments(spark, Seq(mig), probes))
    assert(coll.size == 2 * AnnIndex.TopK.toInt)
    assert(coll == served(IvfPq.probeDistributedSegments(spark, Seq(mig), probes)),
      "distributed serve diverged from the collected serve on a migrated index")

    // 4. The LSM lifecycle composes on a migrated base: append a delta
    //    segment (encoded against the MIGRATED trained tables), tombstone
    //    a base vector by its real recorded cid, masked-serve, compact.
    val seg = IvfPq.appendSegment(spark, mig, frame(300L until 320L), s"$root/seg")
    val ts = spark.read.parquet(s"$mig/ivfpq_lists")
      .filter(col("vec_id") === 3L).select(col("vec_id"), col("cid"))
    val masked = IvfPq.probeSegments(spark, Seq(mig, seg), probes,
      tss = Seq(ts -> Int.MaxValue)).collect()
    assert(masked.nonEmpty)
    assert(!masked.exists(_.getLong(1) == 3L), "tombstoned id served from a migrated base")
    val folded = IvfPq.compactSegments(spark, mig, Seq(seg),
      Seq(ts -> Int.MaxValue), s"$root/fold")
    assert(spark.read.parquet(s"$folded/ivfpq_lists").count() == 300 + 20 - 1)
  }

  test("migration refuses an f3 index whose artifacts disagree on membership") {
    val root = freshRoot("graft-ivfpq-migrate-bad")
    val f3 = AnnIndex.buildFrom(spark, frame(0L until 100L), s"$root/f3")
    // Corrupt a WRITABLE COPY of the f3 index (the real one is an
    // immutable published version): drop some code rows.
    val bad = s"$root/f3-bad"
    graft.io.Afs.copyTree(f3, bad)
    val pruned = spark.read.parquet(s"$bad/pq_codes").filter(col("vec_id") < 90L)
      .localCheckpoint(true)
    pruned.write.mode("overwrite").parquet(s"$bad/pq_codes")
    val e = intercept[IllegalArgumentException] {
      IvfPq.migrateFromF3(spark, bad, s"$root/f4")
    }
    assert(e.getMessage.contains("inconsistent"),
      s"migration failed for the wrong reason: $e")
  }

  test("migration refuses duplicated vec_ids even when row counts match") {
    val root = freshRoot("graft-ivfpq-migrate-dup")
    val f3 = AnnIndex.buildFrom(spark, frame(0L until 100L), s"$root/f3")
    val bad = s"$root/f3-bad"
    graft.io.Afs.copyTree(f3, bad)
    // Duplicate one code row AND drop another: total row counts still
    // match, so a count-based check would pass — the join would fan out
    // id 1 and silently lose id 2 (the review-r13 scenario).
    val codes = spark.read.parquet(s"$bad/pq_codes").localCheckpoint(true)
    val mangled = codes.filter(col("vec_id") =!= 2L)
      .unionAll(codes.filter(col("vec_id") === 1L))
      .localCheckpoint(true)
    assert(mangled.count() == codes.count(), "fixture must keep counts equal")
    mangled.write.mode("overwrite").parquet(s"$bad/pq_codes")
    val e = intercept[IllegalArgumentException] {
      IvfPq.migrateFromF3(spark, bad, s"$root/f4")
    }
    assert(e.getMessage.contains("missing or duplicated"),
      s"migration failed for the wrong reason: $e")
  }
}
