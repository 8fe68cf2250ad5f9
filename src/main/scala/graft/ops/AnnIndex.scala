package graft.ops

import graft.{Q, Tables}
import graft.functions.GraftFunctions
import graft.io.Afs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized ANN index — format f3 (build-once / probe-many, r8
  * verdict item 3).
  *
  * '''QUARANTINE NOTICE (r14, r13 verdict item 2):''' the registry
  * converged on the composed f4 format ([[IvfPq]]). From this module
  * only q110 (the f3 BUILD — the artifact [[IvfPq.migrateFromF3]]
  * consumes) stays registered; the f3 serve and lifecycle paths below
  * are retained as the spec-pinned REFERENCE implementations
  * (AnnIndexSpec / AnnLifecycleSoakSpec / AnnRetrainSpec pin recall
  * floors, plan shapes, LSM semantics and publication races on them)
  * and as migration support. They are not bench-priced and must not
  * grow features — new serve/lifecycle work lands on [[IvfPq]]. The
  * format-agnostic cores (publication protocol, trainers, assignment,
  * routing, fold, ingest loop, serving state) remain shared and live.
  *
  * q23e/q23f demonstrate the IVF and PQ *algorithms* but re-pay the full
  * index build (Lloyd passes, codebook training, corpus encoding) on
  * every probe batch. At 100 TB an index is an ARTIFACT: built once,
  * persisted, probed many times — the same amortization lesson as the
  * reference's KEK cache (write_encrypted_parquet.py:74, its only
  * performance optimization). This module persists:
  *
  *   - `ivf_centroids`  (cid, ce)            — O(k·dim), the routing table
  *   - `ivf_assignments`(vec_id, e) BY cid   — the inverted lists, laid
  *     out so PARTITION PRUNING *is* list selection: a probe of nprobe
  *     lists physically reads nprobe/k of the corpus files, exactly how
  *     a disk-resident IVF serves (and how Hive-partitioned parquet
  *     prunes on a cluster).
  *   - `pq_codebook`    (m, code, ce)        — O(M·K·sub) doubles
  *   - `pq_codes`       (vec_id, codes, qnorm, label) — M small codes
  *     per vector plus the inline filterable attribute, the
  *     32x-compressed corpus representation that is the only thing the
  *     PQ serve path scans (label rides along for the same reason it
  *     rides in the lists: a filtered probe pre-filters INSIDE the
  *     codes scan, never via a corpus join).
  *
  * Serve paths (probe-only — NO training, NO corpus-wide kmeans):
  *   - IVF: probe routing against the collected O(k·dim) centroid table
  *     happens driver-side; the candidate scan is a static
  *     partition-pruned read of the probed lists.
  *   - PQ: asymmetric-distance (ADC) scoring — each probe precomputes an
  *     M×K lookup table of subvector dot products (driver-side,
  *     O(M·K·sub) per probe); candidate score is then M array lookups
  *     per corpus row via one scan of the codes table, broadcast-joined
  *     against the probes. Nothing corpus-sized ever shuffles or lands
  *     on the driver; the exact-refine pool (256/probe) re-ranks against
  *     true embeddings as in q23f.
  *
  * Staleness: artifacts are keyed by `Tables.datasetTag` (file
  * size/mtime hash), the Layout/Sources fixture rule — a regenerated
  * corpus invalidates the index. q110 *forces* a rebuild so the bench
  * line prices the build honestly; the probe queries adopt a fresh
  * index if present and build one only when missing.
  */
object AnnIndex {

  // IVF sizing: q23e's measured rationale (16 lists, 4 Lloyd steps —
  // BASELINE §C7). At 100 TB, k grows ∝ sqrt(n), nprobe stays the
  // recall/cost knob. Nprobe moved 6 → 8 in r15 WITH the IVFADC
  // residual encoding (tools.RecallMeasure, sf0.1): residual codes
  // saturate the routing ceiling exactly (serve 0.740 = ceiling(6)
  // 0.740, where raw codes lost ~0.02 to quantization), so past r15 the
  // recall knob is routing, not encoding — ceiling(8) measured 0.840,
  // and the composed serve lands on it. The price is the knob's honest
  // one: candidate volume 8/16 of the routed codes instead of 6/16.
  val K = 16
  val Nprobe = 8
  val LloydSteps = 4
  val TopK = 5

  // PQ sizing: q23f's measured rationale (M=8 subspaces × 8 dims, K=64
  // codes, refine pool 256).
  val Mpq = 8
  val Kpq = 64
  val Sub = 8
  val Pool = 256

  private def dbl(c: Column): Column = c.cast("array<double>")

  /** The embeddings corpus in index form: (vec_id, e: array<double>,
    * label). The label rides into the inverted lists as an inline
    * FILTERABLE ATTRIBUTE (the [[IvfPq.probeSegments]] `attrFilter`
    * rule): a predicate on it
    * evaluates during the pruned list scan itself — pre-filtering — so
    * a filtered probe never joins back to the corpus.
    */
  private[graft] def corpus(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.embeddings(s, d)
      .select(col("vec_id"), dbl(col("embedding")).as("e"), col("label")),
      col("vec_id"))

  // ---- shared IVF trainer (extracted from q23e; q23e delegates here) --

  /** (−cos, cid) entries vs every centroid literal: struct ordering gives
    * highest similarity first, ties to the smallest cid — the same
    * tie-break as a (sim DESC, cid ASC) window rank.
    */
  private[ops] def centroidEntries(vec: Column, cents: Seq[(Int, Seq[Double])]): Seq[Column] =
    cents.map { case (cid, ce) =>
      struct((-GraftFunctions.cosineSim(vec, typedLit(ce))).as("negsim"), lit(cid).as("cid"))
    }

  private[ops] def nearestCentroid(vec: Column, cents: Seq[(Int, Seq[Double])]): Column =
    least(centroidEntries(vec, cents): _*).getField("cid")

  /** k-threshold for the assignment strategy (r10 verdict item 2). At or
    * below, assignment is ONE literal argmin expression ([[nearestCentroid]]
    * — no join, no exchange, inlined into the scan stage: the cheapest
    * possible plan at the bench's K=16). Beyond it the routing table
    * becomes a broadcast DataFrame and assignment is a broadcast-join +
    * partial-agg argmin ([[joinAssignCids]], the pqAssign shape): a
    * literal `least(...)` over tens of thousands of array literals blows
    * codegen/constant-pool limits long before data does, while the join
    * broadcasts the O(k·dim) routing table once per job — which is what
    * makes SURVEY §9's k=sqrt(n)≈32k "routing table broadcast, loaded
    * once per serve job" posture true in code.
    */
  val LiteralAssignMaxK = 128

  /** Append a `cid` column — each row's nearest centroid by cosine, ties
    * to the smallest cid — preserving every existing column, choosing the
    * strategy by k (see [[LiteralAssignMaxK]]). Both paths compute the
    * identical (−cos, cid) ordering with the same codegen'd kernel, so
    * assignment is bit-identical between them (pinned by AnnAssignSpec).
    * Rows must carry a unique `vec_id` and the vector in `e` (the
    * segment-write schema). The single assignment entry point for every
    * site that labels vectors with lists: build, delta append, streamed
    * micro-batches, tombstone cid resolution, Lloyd iterations.
    */
  private[ops] def assignCids(df: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame =
    if (cents.size <= LiteralAssignMaxK)
      df.withColumn("cid", nearestCentroid(col("e"), cents))
    else joinAssignCids(df, cents)

  /** High-k assignment: broadcast-nested-loop against the O(k·dim)
    * routing-table frame, argmin via map-side-partial `min_by`. The
    * k-fold row expansion is consumed by the partial aggregate inside
    * the same stage — only n rows cross the exchange, each carrying its
    * vector once (the `first` partials fold map-side too), so shuffle
    * bytes match a plain repartition of the input regardless of k.
    */
  private[ops] def joinAssignCids(df: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val centDf = cents.toDF("cent_cid", "ce")
    // The argmin groups by a per-ROW ordinal, not vec_id: the literal
    // path is a pure projection and so preserves duplicate vec_ids —
    // this path must behave identically on ANY input (r11 ADVICE: a
    // vec_id-keyed groupBy silently collapsed duplicates only above the
    // k threshold). The ordinal is assigned below the broadcast join in
    // the same stage, so each input row expands to k copies sharing one
    // ordinal; shuffle bytes are unchanged (same row count, one long
    // added per row).
    //
    // EXECUTOR-LOSS CAVEAT (r12 ADVICE): monotonically_increasing_id is
    // nondeterministic across recomputation — if a shuffle-fetch failure
    // forces this map stage to PARTIALLY recompute and `df`'s own lineage
    // contains a shuffle whose row order is not stable, recomputed
    // partitions can hand out different ordinals than the surviving map
    // outputs did, duplicating/dropping rows in the aggregate (the known
    // Spark non-deterministic-expression caveat; deterministic inputs —
    // file scans, as every production caller here supplies — recompute
    // identically and are safe). Callers feeding a shuffle-bearing frame
    // at genuine cluster scale should localCheckpoint() it first; keying
    // by a content hash instead is NOT equivalent (it would merge
    // genuinely duplicate rows, the r11 bug this ordinal exists to fix).
    val cols = df.columns.toSeq
    df.withColumn("__ord", monotonically_increasing_id())
      .crossJoin(broadcast(centDf))
      .groupBy(col("__ord"))
      .agg(
        min_by(col("cent_cid"),
          struct((-GraftFunctions.cosineSim(col("e"), col("ce"))).as("negsim"),
            col("cent_cid").as("cid"))).as("cid"),
        cols.map(c => first(col(c)).as(c)): _*)
      .select(cols.map(col) :+ col("cid"): _*)
  }

  /** Seeded k-means over a persisted corpus frame: seeds are the k
    * corpus vectors with the smallest vec_id hash (stable across runs
    * and executors), refined by `steps` Lloyd iterations — element-wise
    * mean per cluster (posexplode → per-dimension avg → re-assemble),
    * each step one corpus pass + an O(k·dim) driver collect, the MLlib
    * k-means iteration shape. Empty clusters keep their previous
    * centroid, so the result always has exactly k rows.
    */
  private[ops] def trainIvf(emb: DataFrame, k: Int, steps: Int): Seq[(Int, Seq[Double])] = {
    val seeds: Seq[(Int, Seq[Double])] = emb
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(k)
      .select(col("e"))
      .collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Double](0)) }
    require(seeds.nonEmpty, "cannot train an IVF index over an empty corpus")
    (1 to steps).foldLeft(seeds) { (cents, _) =>
      val means = assignCids(emb.select(col("vec_id"), col("e")), cents)
        .select(col("cid"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(avg(col("v")).as("m"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("ce"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cents.map { case (cid, ce) => (cid, means.getOrElse(cid, ce)) }
    }
  }

  // ---- shared PQ trainer (extracted from q23f; q23f delegates here) ---

  /** The corpus exploded into (vec_id, m, sv) subvector slices. */
  private[ops] def pqSliced(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("e"),
      explode(array((0 until Mpq).map(m =>
        struct(lit(m).as("m"), slice(col("e"), m * Sub + 1, Sub).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  /** Broadcast-equi-join code assignment (q23f's shape — the only shape
    * that survives realistic K): argmin_k ||x − c_k||² =
    * argmin_k (||c_k||² − 2·x·c_k), ties to the smallest code.
    */
  private[ops] def pqAssign(sliced: DataFrame, cb: DataFrame): DataFrame =
    sliced.join(broadcast(cb), Seq("m"))
      .withColumn("d2", col("c2") - lit(2.0) * GraftFunctions.dotProduct(col("sv"), col("ce")))
      .groupBy("vec_id", "m")
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))

  /** Seeded per-subspace codebooks with one Lloyd refinement across all
    * subspaces in one pass (q23f's trainer, verbatim): K seed vectors by
    * smallest vec_id hash, per-(m, code, dim) means, empty codes keep
    * their seed centroid. Returns (m, code, ce, c2).
    */
  private[ops] def trainPqCodebook(s: SparkSession, emb: DataFrame,
      sliced: DataFrame): DataFrame = {
    val seedRows: IndexedSeq[Seq[Double]] = emb
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(Kpq)
      .select(col("e")).collect().toIndexedSeq.map(_.getSeq[Double](0))
    require(seedRows.nonEmpty, "cannot train a PQ codebook over an empty corpus")
    def cbDf(cents: Seq[(Int, Int, Seq[Double])]): DataFrame = {
      import s.implicits._
      cents.toDF("m", "code", "ce")
        .withColumn("c2", GraftFunctions.dotProduct(col("ce"), col("ce")))
    }
    val seedCb = cbDf(for {
      m <- 0 until Mpq; (v, k) <- seedRows.zipWithIndex
    } yield (m, k, v.slice(m * Sub, m * Sub + Sub)))
    val refined: Map[(Int, Int), Seq[Double]] = pqAssign(sliced, seedCb)
      .join(sliced, Seq("vec_id", "m"))
      .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy("m", "code", "pos").agg(avg(col("v")).as("mu"))
      .groupBy("m", "code")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
        x => x.getField("mu")).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    // The codebook always carries all Kpq codes (the ADC LUT indexes
    // every one); on a corpus smaller than Kpq the seed rows wrap, so
    // rebuilding a shrunken index (post-delete maintain/retrain) still
    // produces a complete codebook instead of indexing out of bounds.
    cbDf(for {
      m <- 0 until Mpq; k <- 0 until Kpq
    } yield (m, k, refined.getOrElse((m, k),
      seedRows(k % seedRows.size).slice(m * Sub, m * Sub + Sub))))
  }

  // ---- persisted index ------------------------------------------------

  /** Index FORMAT level: part of the on-disk root, so a code change to
    * the artifact schema (f2: inverted lists carry the inline `label`
    * attribute; f3: pq_codes carry it too; f5: composed `ivfpq_lists`
    * encode RESIDUALS — [[pqEncodeResidual]] — so pre-residual fixtures,
    * whose codes/codebook/qnorm live in the raw-vector space, must never
    * be adopted; "f4" is skipped as a level name because it already
    * names the composed ARTIFACT format throughout the docs) can never
    * adopt a fixture written by the previous format —
    * `Tables.datasetTag` keys on the DATA, not the code.
    * Bumping the level orphans the old root; [[shmDir]] sweeps stale
    * format dirs so /dev/shm never accumulates across bumps.
    */
  val FormatLevel = "f5"

  /** Root for persisted index artifacts. Overridable for cluster
    * deployments (`-Dgraft.ann.root=hdfs://…/ann` or an `s3a://` URI —
    * the whole artifact layer speaks [[graft.io.Afs]], the Hadoop
    * FileSystem seam); the default is the sandbox-local tmpfs root the
    * bench uses.
    */
  private def annRootBase: String =
    sys.props.get("graft.ann.root").getOrElse {
      val shm = "/dev/shm/graft-annindex"
      try { Afs.mkdirs(shm); if (Afs.exists(shm)) shm else fallbackRoot }
      catch { case _: java.io.IOException => fallbackRoot }
    }

  private def fallbackRoot: String =
    s"${sys.props("java.io.tmpdir")}/graft-annindex"

  /** Stale-format sweep: runs ONCE per JVM (a format can only change
    * with the code, so re-sweeping per call buys nothing), and only
    * under this repo's serial-JVM discipline — a sweep is a delete of
    * dirs a DIFFERENT FormatLevel build owns, so two concurrently
    * running builds at different levels must never share the root
    * (the same rule Bench.sweepLocalDirs already imposes).
    */
  private lazy val sweptStaleFormats: String = {
    val base = annRootBase
    Afs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName != FormatLevel)
      .foreach(st => Afs.delete(st.getPath.toString))
    s"$base/$FormatLevel"
  }

  private[ops] def shmDir(suffix: String): String = s"$sweptStaleFormats/$suffix"

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // ---- versioned publication (r9 ADVICE, medium) ----------------------
  //
  // A rebuild used to overwrite the live serving directory in place:
  // q110's forced rebuild deleted the _SUCCESS marker and rewrote
  // ivf_assignments/pq_codes under the SAME path a concurrent probe
  // (another thread, or another JVM sharing the dataset-tagged dir)
  // might be mid-scan on — the marker only guarded adoption decisions,
  // not in-flight readers. Indexes are now immutable VERSION dirs under
  // the dataset-tagged root, with a CURRENT pointer file flipped by an
  // atomic rename: a reader resolves CURRENT once and scans an
  // immutable dir; a builder writes v{N+1} beside it and flips the
  // pointer only after the version's own _SUCCESS lands. Versions older
  // than the previous one are retired (the previous survives one more
  // publish so an in-flight reader that resolved just before the flip
  // finishes against intact files). This is the pointer-flip discipline
  // every serving system with atomic index swaps uses (and the same
  // move Layout.compact makes for table fixtures).

  private def vname(n: Int): String = f"v$n%06d"

  private def isComplete(root: String, v: Int): Boolean =
    Afs.exists(s"$root/${vname(v)}/_SUCCESS")

  /** Retirement age floor: a version older than the predecessor is
    * deleted only once its `_SUCCESS` is at least this old (r11 verdict
    * item 4 — two quick flips, e.g. [[IvfPq.maintain]]'s
    * fold-then-retrain,
    * used to retire the version a reader resolved just before the FIRST
    * flip; the grace bounds every reader whose scan finishes inside it,
    * the Iceberg snapshot-expiration discipline). The price is
    * transient storage — up to one grace window of retirable versions
    * per root (at the bench's sf0.1 a version is a few MB of tmpfs; at
    * 100 TB the roots live on cluster storage where a few extra index
    * copies are noise next to the corpus). Specs pinning the
    * deterministic retire-after-two lifecycle set it to 0.
    */
  private[ops] var RetireGraceMs: Long =
    sys.props.get("graft.ann.retire.grace.ms").map(_.toLong).getOrElse(10 * 60 * 1000L)

  /** Abandoned-claim GC floor — effectively the maximum supported build
    * duration: the "signs of life" measured below are the claim
    * marker's mtime (fixed at claim time) and the version dir's
    * top-level mtime (updated only when a DIRECT child lands, i.e.
    * early), so a build running longer than this is treated as
    * abandoned and swept. 7 days is far beyond any plausible build; the
    * cost of carrying a truly dead claim that long is one skipped
    * version number and a few stray files — numbering and publication
    * around it work fine — so the floor errs heavily toward never
    * deleting a live writer's work (r11 ADVICE, medium: the old
    * below-predecessor sweep could delete another writer's in-flight
    * claim, whose later writes then recreated the dir as a corrupt
    * published version).
    */
  private[ops] var ClaimGcMs: Long =
    sys.props.get("graft.ann.claim.gc.ms").map(_.toLong).getOrElse(7L * 24 * 60 * 60 * 1000L)

  /** Resolve the root to a complete version dir: the CURRENT pointer
    * when it names one, else the newest `_SUCCESS`-marked version in a
    * listing. The fallback is what makes the pointer safe on backends
    * without atomic replace-rename (HDFS delete+rename hole, object
    * stores — [[graft.io.Afs]]): mid-flip or stale pointers degrade to
    * one extra listing, never to a missing or incomplete index.
    */
  private def currentVersion(root: String): Option[String] =
    try {
      val cur = s"$root/CURRENT"
      // The pointer read gets its OWN failure scope: a corrupt or
      // partially-visible pointer (mid-flip on a backend without atomic
      // replace-rename, checksum mismatch on a torn local write) must
      // degrade to the listing fallback below, not abort resolution.
      val fromPointer =
        try {
          if (!Afs.exists(cur)) None
          else {
            val name = Afs.readString(cur).trim
            if (name.matches("v\\d+") && Afs.exists(s"$root/$name/_SUCCESS"))
              Some(s"$root/$name")
            else None
          }
        } catch { case _: java.io.IOException => None }
      fromPointer.orElse(
        versionsOf(root).filter(isComplete(root, _)).maxOption
          .map(v => s"$root/${vname(v)}"))
    } catch { case _: java.io.IOException => None }

  /** Every version number present under `root` — complete dirs,
    * in-flight dirs, and bare claims. Total over arbitrary root
    * listings: an entry whose digit run exceeds Int range (junk no
    * publish ever wrote) is ignored rather than thrown on — resolution
    * and publication must degrade, not crash, on foreign debris.
    */
  private def versionsOf(root: String): Seq[Int] =
    Afs.listNames(root).flatMap { n =>
      val digits =
        if (n.matches("v\\d+")) Some(n.drop(1))
        else if (n.matches("v\\d+\\._CLAIM")) Some(n.drop(1).takeWhile(_.isDigit))
        else None
      digits.filter(_.length <= 9).map(_.toInt)
    }.distinct

  /** Consecutive lost claims after which a claim loop fails loudly —
    * see the bounded loop in [[publishVersion]].
    */
  private[ops] val ClaimAttemptCap = 1000

  /** Write a fresh immutable version via `write(versionDir)`, mark it
    * complete, flip CURRENT to it, retire complete versions older than
    * the predecessor once past the retirement grace. Returns the
    * published version dir.
    *
    * Version ALLOCATION is atomic: the number is claimed by
    * create-exclusive of a `v{N}._CLAIM` marker (the portable exclusive
    * primitive — [[graft.io.Afs.createExclusive]]), so two concurrent
    * writers racing the same root can never build into the same version
    * dir: the loser claims the next number, and the CURRENT flip stays
    * last-writer-wins. RETIREMENT only ever touches versions that
    * carry `_SUCCESS` (a claimed-but-unfinished build is invisible to
    * it, however old the publish racing past it is); abandoned claims
    * are garbage-collected separately behind [[ClaimGcMs]].
    */
  private[ops] def publishVersion(root: String)(write: String => Unit): String = {
    Afs.mkdirs(root)
    // Snapshot BEFORE claiming: the retirement below must reason about
    // the pre-publish state (re-listing after this publish's own
    // _SUCCESS lands would make the new version its own "predecessor"
    // and retire the real one under in-flight readers).
    val before: Seq[Int] = versionsOf(root)
    var next = (before :+ 0).max + 1
    // Bounded claim loop (r12 ADVICE): createExclusive's non-local arm
    // classifies connector "already exists" errors as a lost claim; a
    // persistent unrelated error matching that sniff must fail loudly
    // after a bounded number of consecutive losses, not spin forever
    // incrementing version numbers. 1000 consecutive lost claims cannot
    // happen under real contention (each loser re-claims a HIGHER number
    // than any winner took), only under a broken filesystem.
    var attempts = 0
    while (!Afs.createExclusive(s"$root/${vname(next)}._CLAIM")) {
      next += 1; attempts += 1
      if (attempts >= ClaimAttemptCap) throw new java.io.IOException(
        s"claim loop lost $attempts consecutive versions under $root — " +
          "filesystem reports every claim path as already existing")
    }
    val vdir = s"$root/${vname(next)}"
    Afs.mkdirs(vdir)
    write(vdir)
    Afs.touch(s"$vdir/_SUCCESS")
    val tmp = s"$root/.CURRENT.$next.tmp"
    Afs.writeString(tmp, vname(next))
    Afs.renameOver(tmp, s"$root/CURRENT")
    val now = System.currentTimeMillis()
    // Retire below the true predecessor — the highest COMPLETE version
    // before this publish (under concurrent writers the number right
    // below `next` can be another writer's unfinished claim, and
    // `next - 1` would retire the version in-flight readers still
    // hold) — and only versions whose _SUCCESS has aged past the grace,
    // so back-to-back flips cannot delete a dir a reader resolved
    // moments ago.
    val completeBefore = before.filter(isComplete(root, _))
    completeBefore.sorted.lastOption.foreach { prev =>
      completeBefore.filter(_ < prev)
        .filter(v => Afs.mtime(s"$root/${vname(v)}/_SUCCESS")
          .forall(t => now - t >= RetireGraceMs))
        .foreach { v =>
          Afs.delete(s"$root/${vname(v)}")
          Afs.delete(s"$root/${vname(v)}._CLAIM")
        }
    }
    // GC abandoned claims: no _SUCCESS and neither the claim marker nor
    // the dir's top-level mtime younger than the claim-GC floor (=== the
    // max supported build duration — see ClaimGcMs). Never this
    // publish's own.
    before.filterNot(isComplete(root, _)).filterNot(_ == next).foreach { v =>
      val life = Seq(Afs.mtime(s"$root/${vname(v)}._CLAIM"),
        Afs.mtime(s"$root/${vname(v)}")).flatten
      if (life.nonEmpty && life.forall(t => now - t >= ClaimGcMs)) {
        Afs.delete(s"$root/${vname(v)}")
        Afs.delete(s"$root/${vname(v)}._CLAIM")
      }
    }
    vdir
  }

  /** Train + write all four artifacts for `embFrame` under `dir` (an
    * unpublished version dir — [[publishVersion]] owns marker and
    * pointer, so a killed build can never become adoptable).
    */
  private def writeIndex(s: SparkSession, embFrame: DataFrame, dir: String): Unit = {
    val emb = embFrame.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // IVF: routing table + inverted lists. The lists carry the
      // vectors (the inverted-FILE structure): a probe reads only
      // its pruned cid partitions and scores in place — no
      // corpus-sized join at serve time.
      val centroids = trainIvf(emb, K, LloydSteps)
      val centDf = {
        import s.implicits._
        centroids.toDF("cid", "ce")
      }
      centDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/ivf_centroids")
      // Cluster by the partition column BEFORE the partitioned
      // write: without it every write task emits a file into every
      // cid dir (tasks × k small files — the classic partitioned-
      // sink small-files defect; measured 78.8 s task-time vs
      // 16.1 s CPU on the r9 seal's q110 line). One exchange on
      // cid, one file per list — the layout a 100 TB inverted file
      // wants, since a probe reads whole lists.
      assignCids(emb, centroids)
        .select(col("cid"), col("vec_id"), col("label"), col("e"))
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid")
        .parquet(s"$dir/ivf_assignments")
      // PQ: codebook + codes. Codes are stored m-ordered in one
      // array (pos = m), plus the reconstructed-vector norm the ADC
      // cosine needs — O(M) ints + 1 double per vector, the
      // compressed corpus.
      val sliced = pqSliced(emb)
      val cb = trainPqCodebook(s, emb, sliced)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cb.coalesce(1).write.mode("overwrite").parquet(s"$dir/pq_codebook")
      encodePq(emb, cb).write.mode("overwrite").parquet(s"$dir/pq_codes")
      cb.unpersist(): Unit
    } finally emb.unpersist(): Unit
  }

  /** (vec_id, codes, qnorm, label) for a source (vec_id, e, label)
    * frame against a codebook. The label join runs on the groupBy's own
    * vec_id hash partitioning (only the narrow id→label side moves), so
    * denormalizing the attribute into the codes costs one small-side
    * shuffle at WRITE time and buys filtered PQ probes a pure pushed
    * predicate at serve time (the f4 filtered serve).
    */
  private def encodePq(src: DataFrame, cb: DataFrame): DataFrame =
    pqEncode(src, cb)
      .join(src.select(col("vec_id"), col("label")), Seq("vec_id"))

  /** The shared ADC encoding — (vec_id, codes, qnorm) for a (vec_id, e,
    * …) frame against a codebook frame. [[encodePq]] (f3) adds the label
    * join; [[IvfPq.writeLists]] (f4) joins it with the assignment side,
    * which already carries label. ONE implementation so the two formats'
    * codes can never silently diverge (review r13).
    */
  private[ops] def pqEncode(src: DataFrame, cb: DataFrame): DataFrame =
    pqAssign(pqSliced(src), cb)
      .join(broadcast(cb.select(col("m"), col("code"), col("ce"))), Seq("m", "code"))
      .groupBy("vec_id")
      .agg(
        transform(array_sort(collect_list(struct(col("m"), col("code")))),
          x => x.getField("code")).as("codes"),
        sqrt(sum(GraftFunctions.dotProduct(col("ce"), col("ce")))).as("qnorm"))

  /** The per-row residual frame an IVFADC build trains on: (vec_id,
    * e := e − centroid(cid)) for an assigned (vec_id, e, cid, …) frame.
    * The broadcast side is the O(k·dim) routing table — the same table
    * every assignment join already broadcasts.
    */
  private[ops] def residualFrame(assigned: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val s = assigned.sparkSession
    import s.implicits._
    assigned.join(broadcast(cents.toDF("cid", "cv")), Seq("cid"))
      .select(col("vec_id"),
        zip_with(col("e"), col("cv"), (a, b) => a - b).as("e"))
  }

  /** RESIDUAL ADC encoding — the IVFADC discipline (the public IVF+PQ
    * design: Jégou/Douze/Schmid, "Product Quantization for Nearest
    * Neighbor Search", §IV): quantize `e − centroid(cid)` instead of the
    * raw vector, which concentrates the codebook's entire budget on
    * within-list variance (the between-list variance is already carried
    * by the cid itself). Input is an assigned (vec_id, e, cid) frame;
    * `cb` must have been trained on [[residualFrame]] output. Returns
    * (vec_id, codes, qnorm) where `qnorm` is the norm of the FULL
    * reconstruction `centroid(cid) + decode(codes)` — the value the ADC
    * cosine divides by, exactly as the raw encoding stores the norm of
    * its own reconstruction. Serve-side, the quantized dot product
    * decomposes as dot(p, centroid(cid)) + Σ_m lut[m][code_m]: the first
    * term is the per-(probe, routed-list) bias [[IvfPq]]'s serve paths
    * add, the second is the unchanged LUT scan over the residual
    * codebook.
    */
  private[ops] def pqEncodeResidual(src: DataFrame,
      cents: Seq[(Int, Seq[Double])], cb: DataFrame): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    // Slice residual AND centroid per subspace in one pass: `sv` is the
    // residual slice the argmin quantizes, `cs` the centroid slice the
    // reconstruction adds back for qnorm.
    val sliced = src.join(broadcast(cents.toDF("cid", "cv")), Seq("cid"))
      .select(col("vec_id"),
        explode(array((0 until Mpq).map { m =>
          struct(lit(m).as("m"),
            zip_with(slice(col("e"), m * Sub + 1, Sub),
              slice(col("cv"), m * Sub + 1, Sub), (a, b) => a - b).as("sv"),
            slice(col("cv"), m * Sub + 1, Sub).as("cs"))
        }: _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"),
        col("s.cs").as("cs"))
    // pqAssign's argmin + tie-break, carrying the winning code's centroid
    // and the row's centroid slice through to the reconstruction.
    sliced.join(broadcast(cb), Seq("m"))
      .withColumn("d2",
        col("c2") - lit(2.0) * GraftFunctions.dotProduct(col("sv"), col("ce")))
      .groupBy("vec_id", "m")
      .agg(
        min_by(struct(col("code"), col("ce")),
          struct(col("d2"), col("code"))).as("best"),
        first(col("cs")).as("cs"))
      .withColumn("rv", zip_with(col("cs"), col("best.ce"), (a, b) => a + b))
      .groupBy("vec_id")
      .agg(
        transform(array_sort(collect_list(
            struct(col("m"), col("best.code").as("code")))),
          x => x.getField("code")).as("codes"),
        sqrt(sum(GraftFunctions.dotProduct(col("rv"), col("rv")))).as("qnorm"))
  }

  /** Build (or adopt) the index for this dataset, returning the CURRENT
    * complete version dir. Synchronized via computeIfAbsent per JVM (the
    * Layout/Multimodal fixture rule); `force` drops the cache entry and
    * publishes a fresh version so q110 re-prices the build — concurrent
    * probes keep serving the prior version until the pointer flips.
    */
  def build(s: SparkSession, d: String, force: Boolean = false): String = {
    GraftFunctions.register(s)
    val tag = Tables.datasetTag(d)
    if (force) built.remove(tag): Unit
    built.computeIfAbsent(tag, tag => {
      val root = shmDir(tag)
      val existing = if (force) None else currentVersion(root)
      existing.getOrElse(
        publishVersion(root)(vdir => writeIndex(s, corpus(s, d), vdir)))
    })
  }

  // ---- explicit-frame entry points (lifecycle soak / spec surface) ----
  //
  // The registered queries run against the dataset-keyed fixtures above;
  // the lifecycle soak (AnnLifecycleSoakSpec) instead drives RANDOM
  // op sequences over explicit frames and roots, so each published
  // artifact kind gets an explicit-frame constructor. All of them go
  // through publishVersion — the soak exercises the exact pointer-flip
  // publication the production paths use.

  /** Build a full index for an explicit embeddings frame (vec_id, e,
    * label) under `root`, returning the published version dir.
    */
  private[ops] def buildFrom(s: SparkSession, emb: DataFrame, root: String): String = {
    GraftFunctions.register(s)
    publishVersion(root)(vdir => writeIndex(s, emb, vdir))
  }

  private[ops] def readCentroids(s: SparkSession, dir: String,
      readOpts: Map[String, String] = Map.empty): Seq[(Int, Seq[Double])] =
    s.read.options(readOpts).parquet(s"$dir/ivf_centroids")
      .collect().toIndexedSeq
      .map(r => (r.getInt(r.fieldIndex("cid")),
        r.getSeq[Double](r.fieldIndex("ce"))))

  private def cosineScala(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Hard cap on an external probe batch: the serve paths materialize
    * the probes driver-side (routing / ADC LUTs are O(probes·dim) and
    * O(probes·M·K)), so the collect must be bounded BY CONSTRUCTION —
    * a caller with more probes splits into batches (each batch is one
    * routed, pruned scan; batches stream through the same index).
    */
  val MaxProbes = 1024

  /** The registered queries' probe set — the q23e/q23f convention
    * (vec_id < 10, from the corpus itself). q111/q112 instantiate the
    * parameterized serve paths with this frame.
    */
  def defaultProbes(s: SparkSession, d: String): DataFrame =
    corpus(s, d).filter(col("vec_id") < 10).select("vec_id", "e")

  /** Collect an external (id, vector) probe frame driver-side: the
    * first column must cast to long, the second to array<double> —
    * any (id, embedding) frame serves, not just corpus slices (r9
    * verdict item 2). Collects at most MaxProbes + 1 rows (the limit
    * rides into the plan — an oversized probe frame can never flood
    * the driver) and fails fast when the cap is exceeded.
    */
  /** Normalize any (id, vector, …) frame to (pid: long, pe:
    * array<double>) — the single owner of the probe-frame contract,
    * shared by the single-batch collect and the batched driver.
    */
  private def normalizeProbes(probes: DataFrame): DataFrame = {
    val cols = probes.columns
    require(cols.length >= 2,
      s"probe frame needs (id, vector) columns, got ${cols.mkString(",")}")
    probes.select(col(cols(0)).cast("long").as("pid"), dbl(col(cols(1))).as("pe"))
  }

  private[ops] def collectProbes(probes: DataFrame): Seq[(Long, Seq[Double])] = {
    val rows = normalizeProbes(probes)
      .limit(MaxProbes + 1)
      .collect().toIndexedSeq
    require(rows.length <= MaxProbes,
      s"probe batch exceeds MaxProbes=$MaxProbes — split into batches")
    rows.map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
  }

  /** Probe→list routing, k-thresholded like assignment ([[assignCids]]):
    * at ≤ [[LiteralAssignMaxK]] the (−cos, cid) top-nprobe runs
    * driver-side — O(probes·k·dim) over inputs both bounded by
    * construction, no Spark job, the cheapest path at the bench's K=16.
    * Beyond it the SAME ordering evaluates distributed (probes ×
    * broadcast routing table, per-probe rank ≤ nprobe): the flop-heavy
    * O(probes·k·dim) scan scales out with k — at §9's k=√n≈32k a
    * driver-side route would be minutes of single-threaded cosine per
    * batch — while the driver keeps only the routing RESULT, ≤
    * MaxProbes·nprobe (pid, cid) rows. Both paths use the same
    * tie-break (highest cos, then smallest cid); [[AnnAssignSpec]] pins
    * them identical. Entries lead with the probe's ORDINAL in the
    * collected batch: downstream ranking partitions on it, so duplicate
    * probe ids route AND rank per-row on every serve path, collected and
    * distributed alike (r12 ADVICE — the collected windows used to key
    * on probe_id and merge duplicates where the distributed path did
    * not).
    */
  private[ops] def routeProbes(s: SparkSession, probes: Seq[(Long, Seq[Double])],
      cents: Seq[(Int, Seq[Double])], nprobe: Int): Seq[(Int, Long, Seq[Double], Int)] =
    if (cents.size <= LiteralAssignMaxK) routeDriver(probes, cents, nprobe)
    else routeJoin(s, probes, cents, nprobe)

  private[ops] def routeDriver(probes: Seq[(Long, Seq[Double])],
      cents: Seq[(Int, Seq[Double])], nprobe: Int): Seq[(Int, Long, Seq[Double], Int)] =
    probes.zipWithIndex.flatMap { case ((pid, pe), ord) =>
      cents.map { case (cid, ce) => (-cosineScala(pe, ce), cid) }
        .sorted.take(nprobe)
        .map { case (_, cid) => (ord, pid, pe, cid) }
    }

  private[ops] def routeJoin(s: SparkSession, probes: Seq[(Long, Seq[Double])],
      cents: Seq[(Int, Seq[Double])], nprobe: Int): Seq[(Int, Long, Seq[Double], Int)] = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(s)
    // Route by probe ORDINAL, not id: a frame with duplicate pids must
    // route per-row exactly as routeDriver does (a pid-keyed window
    // would merge the duplicates' centroid rankings and return
    // nprobe rows for the pair instead of nprobe each).
    val w = Window.partitionBy("idx")
      .orderBy((-GraftFunctions.cosineSim(col("pe"), col("ce"))).asc, col("cid").asc)
    probes.zipWithIndex.map { case ((_, pe), i) => (i, pe) }.toDF("idx", "pe")
      .crossJoin(broadcast(cents.toDF("cid", "ce")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= nprobe)
      .select("idx", "cid")
      .collect().toIndexedSeq
      .sortBy(r => (r.getInt(0), r.getInt(1)))
      .map { r =>
        val ord = r.getInt(0)
        val (pid, pe) = probes(ord); (ord, pid, pe, r.getInt(1))
      }
  }

  /** Union one artifact kind across segment roots (base first, oldest
    * to newest) under the LSM boundary rule: a tombstone masks exactly
    * the segments at index < its boundary (left-anti on vec_id),
    * followed by the canonical re-select — a using-column join reorders
    * the key FIRST and the roots union POSITIONALLY, so without it
    * masked and unmasked segments would swap columns against each other
    * (the r10 composition bug). `prep` runs per segment BEFORE the mask
    * and the select, so cid pruning / attribute pre-filters reach each
    * segment's parquet scan. The single owner of the read-side masking
    * idiom behind the f4 serve paths ([[foldPartitionedArtifact]]'s
    * write-side fold keeps its own `anti` because its mask set also
    * feeds touched-list resolution).
    */
  private[ops] def maskedUnion(s: SparkSession, roots: Seq[String], sub: String,
      sel: Seq[Column], tss: Seq[(DataFrame, Int)],
      prep: DataFrame => DataFrame = identity,
      readOpts: Map[String, String] = Map.empty): DataFrame =
    roots.zipWithIndex.map { case (p, i) =>
      val seg = prep(s.read.options(readOpts).parquet(s"$p/$sub")).select(sel: _*)
      val m = tss.filter(_._2 > i).map(_._1.select(col("vec_id")))
        .reduceOption(_ unionAll _)
      m.fold(seg)(mm => seg.join(mm, Seq("vec_id"), "left_anti").select(sel: _*))
    }.reduce(_ unionAll _)



  /** Normalized probe frame with the per-ROW serve ordinal appended —
    * the distributed serve paths' input shape. The ordinal is
    * [[monotonically_increasing_id]]: nondeterministic, so downstream
    * code must keep it in ONE linear pipeline (never recompute it on
    * two sides of a join) unless the frame is localCheckpoint'ed first.
    */
  private[ops] def probesWithOrdinal(probeDf: DataFrame): DataFrame =
    normalizeProbes(probeDf)
      .withColumn("__pord", monotonically_increasing_id())

  /** Distributed routing, shared by the f3 and f4 end-to-end-DataFrame
    * serve paths: `probes` (pid, pe, __pord — [[probesWithOrdinal]]'s
    * shape) becomes one routed row per (probe row × probed list),
    * k-thresholded like every other assignment site.
    */
  private[ops] def routeDistributed(s: SparkSession, probes: DataFrame,
      cents: Seq[(Int, Seq[Double])], nprobe: Int): DataFrame =
    if (cents.size <= LiteralAssignMaxK) {
      val entries = array(centroidEntries(col("pe"), cents): _*)
      probes.withColumn("cid",
        explode(transform(slice(array_sort(entries), 1, nprobe),
          e => e.getField("cid"))))
    } else {
      // ONE linear pipeline — no self-join: the ordinal is
      // nondeterministic (monotonically_increasing_id), so it must
      // never be recomputed on two sides of a join (a shuffle-bearing
      // probe source re-evaluates with different per-partition order
      // and a probe's vector would join ANOTHER probe's routed list).
      // The joinAssignCids executor-loss caveat applies here too: a
      // partial stage recompute after shuffle-fetch failure can
      // re-deal ordinals when the probe frame's own lineage holds an
      // order-unstable shuffle — localCheckpoint such frames on a
      // real cluster; deterministic (file-scan) probe sources are safe.
      // scan → expand vs the broadcast routing table → per-ordinal
      // aggregate: collect the k (negsim, cid) entries, sort, slice
      // nprobe (the routeDriver ordering and tie-break), explode. The
      // map-side partial collect_list means the exchange carries each
      // probe's k narrow structs plus its vector once — vectors never
      // ride the k-fold expansion.
      val centDf = { import s.implicits._; cents.toDF("rcid", "ce") }
      probes
        .crossJoin(broadcast(centDf))
        .withColumn("negsim", -GraftFunctions.cosineSim(col("pe"), col("ce")))
        .groupBy(col("__pord"))
        .agg(first(col("pid")).as("pid"), first(col("pe")).as("pe"),
          slice(array_sort(collect_list(struct(col("negsim"), col("rcid")))),
            1, nprobe).as("routed"))
        .withColumn("cid",
          explode(transform(col("routed"), e => e.getField("rcid"))))
        .select("__pord", "pid", "pe", "cid")
    }

  /** Filtered probes WIDEN the probe set (2×, capped at K): a selective
    * predicate thins every probed list, so holding nprobe constant
    * starves the candidate pool at exactly the selectivities filtering
    * targets — the standard IVF filtered-search compensation. Scan cost
    * stays BELOW an unfiltered probe's: 2× the partitions, each
    * row-group-skipped to the matching ~10%.
    */
  val FilteredNprobe: Int = math.min(K, Nprobe * 2)

  /** The collected O(M·K·sub) ADC codebook — bounded by construction,
    * loaded ONCE per serve call site (the batched driver reuses it
    * across every batch instead of re-collecting per batch).
    */
  private[ops] def readCodebook(s: SparkSession, cbDir: String,
      readOpts: Map[String, String] = Map.empty): Map[(Int, Int), Seq[Double]] =
    s.read.options(readOpts).parquet(s"$cbDir/pq_codebook")
      .select(col("m"), col("code"), col("ce"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap

  // ---- lifecycle slices (shared by the f4 lifecycle queries) ----------

  /** The 90/10 ingest split the append lifecycle exercises: the base
    * index is trained on vec_id % 10 != 0; the "newly arrived" batch is
    * the other 10%.
    */
  private[ops] def baseSlice(df: DataFrame): DataFrame = df.filter(pmod(col("vec_id"), lit(10)) =!= 0)
  private[ops] def batchSlice(df: DataFrame): DataFrame = df.filter(pmod(col("vec_id"), lit(10)) === 0)

  // ---- LSM fold core (shared with the f4 lifecycle) -------------------

  /** Masks applying to a segment's recency position, anti-joined out
    * with the canonical column order RE-SELECTED after the using-column
    * join (it reorders the key first, and segment frames union
    * positionally — the r10 composition bug). Shared by both formats'
    * folds and the read-side [[maskedUnion]]'s write-side twin.
    */
  private[ops] def lsmAnti(tss: Seq[(DataFrame, Int)])(
      df: DataFrame, segIdx: Int, sel: Seq[Column]): DataFrame =
    tss.filter(_._2 > segIdx).map(_._1.select(col("vec_id")))
      .reduceOption(_ unionAll _)
      .fold(df)(m => df.join(m, Seq("vec_id"), "left_anti").select(sel: _*))

  /** Fold ONE cid-partitioned artifact across base + segments under the
    * LSM recency-boundary rule — the shared core behind
    * [[IvfPq.compactSegments]] and every f4 fold, so a fix to the fold
    * discipline lands once (review
    * r13): touched lists = segments' cids ∪ tombstones' recorded cids
    * (bounded ≤K collects); touched merge base+segments with masks
    * anti-joined out through ONE exchange on cid; untouched base lists
    * carry over file-level (object-store copy, never a scan) — correct
    * because a tombstoned vector's list is touched by construction.
    * Returns the touched set.
    */
  private[ops] def foldPartitionedArtifact(s: SparkSession, baseDir: String,
      segDirs: Seq[String], tss: Seq[(DataFrame, Int)], sub: String,
      colNames: Seq[String], sortInPartitions: Boolean, vdir: String,
      readOpts: Map[String, String] = Map.empty,
      writeOpts: Map[String, String] = Map.empty): Set[Int] = {
    val cols = colNames.map(col)
    val anti = lsmAnti(tss) _
    val segLists = segDirs.zipWithIndex
      .map { case (p, i) =>
        anti(s.read.options(readOpts).parquet(s"$p/$sub").select(cols: _*), i + 1, cols)
      }
      .reduceOption(_ unionAll _)
    val touched: Set[Int] =
      (segLists.toSeq.flatMap(_.select("cid").distinct().collect().map(_.getInt(0))) ++
        tss.flatMap(_._1.select("cid").distinct().collect().map(_.getInt(0)))).toSet
    val baseLists = anti(
      s.read.options(readOpts).parquet(s"$baseDir/$sub")
        .filter(col("cid").isin(touched.toSeq.sorted: _*))
        .select(cols: _*), 0, cols)
    val merged = segLists.fold(baseLists)(baseLists.unionAll)
      .repartition(col("cid"))
    (if (sortInPartitions) merged.sortWithinPartitions("vec_id") else merged)
      .write.mode("overwrite").partitionBy("cid").options(writeOpts)
      .parquet(s"$vdir/$sub")
    // Untouched lists: file-level carry-over into the merged layout (on
    // an object store a server-side copy; never a scan).
    Afs.listStatus(s"$baseDir/$sub")
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cid="))
      .filter(st => !touched.contains(st.getPath.getName.stripPrefix("cid=").toInt))
      .foreach(st => Afs.copyTree(st.getPath.toString,
        s"$vdir/$sub/${st.getPath.getName}"))
    touched
  }

  // ---- tombstone segments (the f4 delete queries' write side) ----------

  /** The deterministic delete set the lifecycle queries exercise: 10%
    * of the corpus, split across BOTH segments — vec_id % 20 == 3 lives
    * in the base (odd), vec_id % 20 == 10 lives in the append delta
    * (multiple of 10) — so deletion is exercised against every segment
    * kind, not just the base.
    */
  private[ops] def deleteSlice(df: DataFrame): DataFrame =
    df.filter(pmod(col("vec_id"), lit(20)).isin(3, 10))

  /** Publish a tombstone segment for `victims` (vec_id, e, …) under
    * `outRoot`: each victim's cid is resolved from its STORED embedding
    * against `baseDir`'s centroids — assignment is deterministic, so
    * this lands the tombstone on exactly the list holding the copy it
    * masks, without scanning any list.
    */
  private[ops] def tombstonesFor(s: SparkSession, baseDir: String,
      victims: DataFrame, outRoot: String): String = {
    val cents = readCentroids(s, baseDir)
    publishVersion(outRoot) { vdir =>
      assignCids(victims.select(col("vec_id"), col("e")), cents)
        .select(col("vec_id"), col("cid"))
        .coalesce(1).write.mode("overwrite").parquet(s"$vdir/tombstones")
    }
  }

  // ---- retrain trigger (r10 verdict item 5) ---------------------------

  /** List-size-weighted mean RELATIVE centroid drift above which a
    * rebuild is recommended. Calibration (AnnRetrainSpec): a live
    * corpus equal to the training corpus measures ~0.03 (one Lloyd
    * step of residual motion); a structurally drifted corpus (clusters
    * re-centered between the trained centroids) measures >0.5.
    */
  val RetrainDriftThreshold = 0.25

  /** The retrain decision and its evidence: per-cid (live count,
    * relative drift), the weighted mean, and the recommendation.
    */
  final case class RetrainReport(
      perCid: Seq[(Int, Long, Double)],
      meanRelDrift: Double,
      recommend: Boolean)

  /** Retrain signal: compaction deliberately never retrains, so after
    * heavy upsert churn the live corpus drifts away from the centroids
    * the index was trained on and recall decays with no signal. This
    * check runs the q84 drift monitor ([[Similarity.embeddingDrift]])
    * between the INDEX'S routing table (side A: the stored per-cid
    * centroids) and the CURRENT live corpus's per-cid means under the
    * same frozen assignment (side B) — per-cid L2 drift, normalized by
    * the stored centroid's norm and weighted by live list size. Cost:
    * one assignment pass over the live frame + an O(k·dim) aggregate;
    * corpus bytes cross no exchange (q84's plan). Run it between index
    * versions (e.g. after each compaction); when it fires, rebuild via
    * [[build]]`(force = true)` / [[buildFrom]] — AnnRetrainSpec pins
    * degraded-recall-then-recovery around this trigger, and BASELINE.md
    * §C12 prices rebuild vs degraded serving.
    */
  def retrainCheck(s: SparkSession, indexDir: String, live: DataFrame): RetrainReport =
    retrainCheckAssigned(s, indexDir,
      assignCids(live.select(col("vec_id"), col("e")),
        readCentroids(s, indexDir)))

  /** The check over a frame that ALREADY carries its `cid` — the stored
    * inverted lists are exactly such a frame, so a caller holding them
    * ([[IvfPq.maintain]]) skips the re-assignment pass entirely: the monitor
    * reduces to one O(k·dim) aggregate over data it just wrote.
    */
  private[ops] def retrainCheckAssigned(s: SparkSession, indexDir: String,
      preAssigned: DataFrame,
      readOpts: Map[String, String] = Map.empty): RetrainReport = {
    GraftFunctions.register(s)
    val cents = readCentroids(s, indexDir, readOpts)
    val norms = cents.map { case (cid, ce) =>
      cid -> math.sqrt(ce.map(x => x * x).sum)
    }.toMap
    val centDf = {
      import s.implicits._
      cents.toDF("label", "embedding")
        .select(col("label"), lit(true).as("old_snap"), col("embedding"))
    }
    val assigned = preAssigned.select(col("cid"), col("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = assigned.groupBy("cid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val drift = Similarity.embeddingDrift(centDf.unionAll(
          assigned.select(col("cid").as("label"), lit(false).as("old_snap"),
            col("e").as("embedding"))))
        .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
      // cids with no live vectors have no side-B centroid and carry no
      // weight; every populated cid contributes its relative drift.
      val per = drift.toSeq.sortBy(_._1).map { case (cid, d) =>
        (cid, counts.getOrElse(cid, 0L), d / math.max(norms(cid), 1e-12))
      }
      val w = per.map(_._2).sum.toDouble
      val mean = if (w == 0) 0.0
                 else per.map { case (_, n, rd) => n * rd }.sum / w
      RetrainReport(per, mean, mean > RetrainDriftThreshold)
    } finally assigned.unpersist(): Unit
  }

  /** An [[IvfPq.maintain]] outcome: the published CURRENT dir, the drift
    * evidence the decision used, and whether a retrain actually ran.
    */
  final case class MaintainResult(
      dir: String, report: RetrainReport, retrained: Boolean)

  // ---- continuous ingest core (Structured Streaming micro-batches) ----

  /** Source files the ingest stream is split into — with
    * `maxFilesPerTrigger = 1` each file is one micro-batch, so the
    * lifecycle test exercises SEVERAL checkpointed batches, not a
    * single degenerate one.
    */
  val StreamFiles = 3

  /** The checkpointed ingest loop behind
    * [[IvfPq.streamIngestWithMaintain]] — extracted in r13 so the
    * streaming discipline (checkpoint-replay
    * idempotence, `_COMPLETE` markers, no-data-batch suppression,
    * serial-thread auto-maintain, manifest-composed reader views) lands
    * once and cannot drift between the formats (review r13).
    * `writeSegment(session, batch, artifactBase, segDir)` writes one
    * format-specific delta segment encoded against `artifactBase`'s
    * trained tables; `maintainStep(session, servingBase, unfoldedSegs,
    * maintRoot, alreadyFoldedNames)` folds when the threshold fires.
    * `afterBatch(session, batchId)` runs LAST for each committed
    * non-empty batch, on the stream thread (so it can never race a
    * segment writer or a fold) — the hook mid-stream operations like
    * tombstone enqueues ([[IvfPq.enqueueTombstones]]) use to compose
    * deterministically with the ingest loop.
    */
  private[ops] def streamIngestCore(s: SparkSession, baseDir: String,
      src: DataFrame, root: String, nFiles: Int, autoMaintainEvery: Int,
      writeSegment: (SparkSession, DataFrame, String, String) => Unit,
      maintainStep: (SparkSession, String, Seq[String], String, Seq[String]) => Unit,
      afterBatch: (SparkSession, Long) => Unit = (_, _) => ())
      : Seq[String] = {
    GraftFunctions.register(s)
    val srcDir = s"$root/src"
    val segRoot = s"$root/segments"
    if (!Afs.exists(s"$srcDir/_SUCCESS")) {
      src.repartition(nFiles)
        .write.mode("overwrite").parquet(srcDir)
    }
    val schema = s.read.parquet(srcDir).schema
    // Dedicated session clone: streaming state (listeners, SQL conf
    // snapshots) stays off the caller's session, the q24f rule.
    val s2 = s.newSession()
    GraftFunctions.register(s2)
    s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        val seg = s"$segRoot/b$id"
        // Checkpoint-replay atomicity: a crash AFTER this batch's
        // _COMPLETE landed but BEFORE the checkpoint committed its
        // offset replays the batch — the rewrite must first re-mark
        // the segment incomplete, or a concurrent reader honoring the
        // only-complete-segments rule would scan it mid-overwrite.
        Afs.delete(s"$seg/_COMPLETE")
        GraftFunctions.register(batch.sparkSession)
        val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // A no-data micro-batch (the source can emit one around
          // stream start/restart) must produce NO segment: an empty
          // partitionBy write emits zero files, and a marked-complete
          // fileless segment would fail every later reader (found by
          // the lifecycle soak — AnnLifecycleSoakSpec).
          if (!b.isEmpty) {
            // Under auto-maintain the trained artifacts to assign/encode
            // against are the CURRENT SERVING BASE's, re-resolved per
            // batch — a fold's retrain publishes NEW centroids and a NEW
            // codebook, and a later batch encoded against the original
            // base would silently mix two centroid/codebook spaces in
            // the served state (review r13). The invariant: a retrain
            // happens only inside a fold, a fold consumes every unfolded
            // segment, so every unfolded segment is always encoded in
            // the current fold-base's space. Without auto-maintain the
            // base is frozen and the once-read artifacts stand.
            val artifactBase =
              if (autoMaintainEvery > 0)
                servingStateOf(baseDir, segRoot, s"$root/maint")._1
              else baseDir
            writeSegment(batch.sparkSession, b.toDF(), artifactBase, seg)
            Afs.touch(s"$seg/_COMPLETE")
            if (autoMaintainEvery > 0) {
              // Fold threshold check AFTER the batch commits: the fold
              // runs on this same stream thread (AvailableNow is
              // serial), so it never races a segment writer.
              val (curBase, unfolded, already) =
                servingStateOf(baseDir, segRoot, s"$root/maint")
              if (unfolded.size >= autoMaintainEvery)
                maintainStep(batch.sparkSession, curBase, unfolded,
                  s"$root/maint", already)
            }
            afterBatch(batch.sparkSession, id)
          }
        } finally b.unpersist(): Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    completeSegments(segRoot)
  }

  /** Complete segment dirs under an ingest root, in NUMERIC batch order,
    * not lexicographic ("b10" < "b2" as strings): segment order is LSM
    * recency order, which tombstone boundaries depend on for any caller
    * composing these roots.
    */
  private def completeSegments(segRoot: String): Seq[String] =
    Afs.listStatus(segRoot)
      .filter(st => st.isDirectory && Afs.exists(s"${st.getPath}/_COMPLETE"))
      .sortBy(_.getPath.getName.stripPrefix("b").toLong)
      .map(_.getPath.toString).toIndexedSeq

  /** The reader view of an auto-maintained ingest root: (serving base,
    * not-yet-folded complete segments, folded segment names). The base
    * is the CURRENT fold under `maintRoot` when one exists (its
    * `_SEGMENTS` manifest — written before the fold's `_SUCCESS`, so
    * atomic with the version — says which segments it already contains),
    * else the frozen build base. Consistent under any fold/ingest
    * interleaving: the fold is immutable once resolved, its manifest is
    * part of it, and segments only ever get ADDED to the listing.
    */
  private[ops] def servingStateOf(baseDir: String, segRoot: String,
      maintRoot: String): (String, Seq[String], Seq[String]) = {
    val segs = completeSegments(segRoot)
    currentVersion(maintRoot) match {
      case Some(fold) =>
        // The manifest read FAILS LOUD: defaulting a transient IO error
        // to "fold contains nothing" would make the reader union the
        // fold with segments it already contains — silent duplicate
        // serving (review r13). The manifest is written before the
        // fold's _SUCCESS, so a resolvable fold always has one.
        val already =
          Afs.readString(s"$fold/_SEGMENTS").split("\n").toSeq.filter(_.nonEmpty)
        val name = (p: String) => new org.apache.hadoop.fs.Path(p).getName
        (fold, segs.filterNot(p => already.contains(name(p))), already)
      case None => (baseDir, segs, Nil)
    }
  }

  /** The CURRENT complete version for this dataset, resolved from disk
    * exactly as a foreign JVM would (no builder cache) — the spec's
    * concurrent-reader hook.
    */
  private[ops] def currentServing(d: String): Option[String] =
    currentVersion(shmDir(Tables.datasetTag(d)))

  /** CURRENT resolution for an EXPLICIT root, from disk exactly as a
    * foreign JVM would — the race specs' hook (maintain/publish vs a
    * live reader loop).
    */
  private[ops] def resolveVersion(root: String): Option[String] =
    currentVersion(root)

  /** Q110 — index build, FORCED (the bench line prices the build every
    * run; probe queries adopt the result). Returns per-artifact row
    * counts read back from the written parquet — a conservation check
    * the DuckDB oracle can express: every corpus vector must appear in
    * the assignments and the codes, and the routing/codebook tables are
    * exactly their configured sizes.
    */
  val q110: Q = Q(
    "q110_ann_index_build",
    (s, d) => {
      val dir = build(s, d, force = true)
      import s.implicits._
      Seq("ivf_assignments", "ivf_centroids", "pq_codebook", "pq_codes")
        .map(a => (a, s.read.parquet(s"$dir/$a").count()))
        .toDF("artifact", "n_rows")
        .orderBy("artifact")
    },
    Some(s"""SELECT 'ivf_assignments' AS artifact, count(*) AS n_rows FROM embeddings
            |UNION ALL SELECT 'ivf_centroids', CAST($K AS BIGINT)
            |UNION ALL SELECT 'pq_codebook', CAST(${Mpq * Kpq} AS BIGINT)
            |UNION ALL SELECT 'pq_codes', count(*) FROM embeddings
            |ORDER BY artifact""".stripMargin))

  /** Registered: ONLY the f3 build (q110) — it is the migration source
    * [[IvfPq.migrateFromF3]] converts (and q111 prices serving the
    * conversion's output). Every other ANN registry line converged on
    * the composed f4 format in r14 (r13 verdict item 2) and the f3
    * serve/LSM quarantine was DELETED in r15 (r14 verdict item 5):
    * this file now carries only what q110, the migration path, and the
    * f4 lifecycle share — trainers, encoders, version publication, the
    * fold core, probe routing/collection, the ingest loop, and the
    * retrain monitor. Their spec pins moved to the f4 twins
    * (IvfPqSpec/IvfPqStreamSpec/AnnRetrainSpec/AnnLifecycleSoakSpec).
    * New work lands on IvfPq.
    */
  val queries: Seq[Q] = Seq(q110)
}
