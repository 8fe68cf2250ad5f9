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

  // IVF sizing: q23e's measured rationale (16 lists × 6 probed, 4 Lloyd
  // steps — BASELINE §C7). At 100 TB, k grows ∝ sqrt(n), nprobe stays
  // the recall/cost knob.
  val K = 16
  val Nprobe = 6
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
    * FILTERABLE ATTRIBUTE (see [[ivfProbeFiltered]]): a predicate on it
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
    * attribute; f3: pq_codes carry it too) can never adopt a fixture
    * written by the previous format — `Tables.datasetTag` keys on the DATA, not the code.
    * Bumping the level orphans the old root; [[shmDir]] sweeps stale
    * format dirs so /dev/shm never accumulates across bumps.
    */
  val FormatLevel = "f3"

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
    * item 4 — two quick flips, e.g. [[maintain]]'s fold-then-retrain,
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
    * predicate at serve time ([[pqProbeFiltered]]).
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

  /** Adopt an existing index for this dataset or build one (probe-query
    * entry point — a serve path must not fail just because it probed
    * before the first build ran in this JVM).
    */
  private def ensure(s: SparkSession, d: String): String = build(s, d, force = false)

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

  /** Publish one delta segment for an explicit batch against the frozen
    * index at `baseDir`.
    */
  private[ops] def appendSegment(s: SparkSession, baseDir: String,
      batch: DataFrame, root: String): String = {
    GraftFunctions.register(s)
    publishVersion(root)(writeDeltaSegment(s, baseDir, batch, _))
  }

  /** Publish a compacted fold of explicit segments and (tombstone,
    * recency boundary) masks — the general LSM fold behind every
    * compaction flavor.
    */
  private[ops] def compactAll(s: SparkSession, baseDir: String,
      deltaDirs: Seq[String], tss: Seq[(DataFrame, Int)],
      outRoot: String): String = {
    GraftFunctions.register(s)
    publishVersion(outRoot)(compactInto(s, baseDir, deltaDirs, tss, _))
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

  /** Shared IVF serve core: route each collected probe against the
    * centroid table driver-side, then ONE statically partition-pruned
    * scan of the probed inverted lists across the given segment roots,
    * scored in place and top-k'd per probe. Tombstone frames (vec_id, …)
    * mask deleted vectors BEFORE ranking (left-anti joins the optimizer
    * broadcasts — tombstone sets are delete-sized, never corpus-sized),
    * so a deleted vector can neither appear in results nor displace a
    * live one from the top-k. The LSM sequencing rule: a tombstone masks
    * only segments OLDER than itself — each tombstone carries its own
    * recency boundary `(frame, maskRoots)`: it masks exactly the roots
    * at index < maskRoots (roots are listed base-first, oldest to
    * newest). A delete masks everything (`Int.MaxValue`); an upsert's
    * tombstone must NOT mask the newer segment carrying the replacement
    * copy of the same vec_id, so its boundary sits just below that
    * segment. N tombstones with N distinct boundaries compose (the
    * interleaved delete/upsert histories the lifecycle soak generates).
    */
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
    * idiom, shared by [[ivfServe]] and [[pqProbeSegments]]
    * ([[compactInto]]'s write-side fold keeps its own `anti` because
    * its mask set also feeds touched-list resolution).
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

  private def ivfServe(s: SparkSession, listRoots: Seq[String],
      cents: Seq[(Int, Seq[Double])],
      probes: Seq[(Long, Seq[Double])],
      tombstones: Seq[(DataFrame, Int)] = Nil,
      attrFilter: Option[Column] = None,
      nprobe: Int = Nprobe): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val routed: Seq[(Int, Long, Seq[Double], Int)] = routeProbes(s, probes, cents, nprobe)
    val neededCids = routed.map(_._4).distinct.sorted
    val probeDf = {
      import s.implicits._
      routed.toDF("__ord", "probe_id", "pe", "cid")
    }
    // Segments are separate partitioned roots — load each and union
    // (Spark rejects conflicting partition roots in one load); the cid
    // partition filter prunes each segment's directories independently,
    // and the attribute pre-filter rides the raw scan (pushed into the
    // parquet read of the pruned lists — never a post-top-k cut, which
    // would return fewer than k, nor a corpus join).
    val lists = maskedUnion(s, listRoots, "ivf_assignments",
      Seq(col("cid"), col("vec_id"), col("e")), tombstones,
      prep = df => df.filter(col("cid").isin(neededCids: _*))
        .filter(attrFilter.getOrElse(lit(true))))
    // Rank per probe ROW (__ord), not per probe id: duplicate pids in a
    // batch each get their own full top-k, identical to the distributed
    // path's per-ordinal ranking (r12 ADVICE).
    val wT = Window.partitionBy("__ord").orderBy(col("cos").desc, col("vec_id").asc)
    lists.join(broadcast(probeDf), Seq("cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", GraftFunctions.cosineSim(col("e"), col("pe")))
      .withColumn("rnk", row_number().over(wT).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("probe_id"), col("vec_id").as("nbr_id"), col("rnk"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("probe_id", "rnk")
  }

  /** Q111 serve path: probe routing driver-side against the persisted
    * routing table (same (−cos, cid) tie-break as the trainer), then ONE
    * statically partition-pruned scan of the probed inverted lists,
    * scored in place with the codegen'd cosine kernel. Reads
    * nprobe-of-K partitions — the explain carries the cid-IN partition
    * filter (pinned by AnnIndexSpec).
    */
  def ivfProbe(s: SparkSession, d: String): DataFrame =
    ivfProbe(s, d, defaultProbes(s, d))

  /** Parameterized IVF serve (r9 verdict item 2): any (id, vector)
    * probe frame against this dataset's persisted index.
    */
  def ivfProbe(s: SparkSession, d: String, probeDf: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    ivfServe(s, Seq(dir), readCentroids(s, dir), collectProbes(probeDf))
  }

  /** Bound on how many MaxProbes-sized batches [[ivfProbeBatched]] puts
    * into ONE union plan: beyond it the plan would balloon (64+ union
    * branches), so larger frames switch to the internal spill loop —
    * each batch re-planned independently at constant plan size, results
    * landing in a spill dir returned as one scan (r10 verdict item 4).
    * The call serves any probe-frame size either way.
    */
  val MaxBatches = 64

  private val probeSpillSeq = new java.util.concurrent.atomic.AtomicLong()
  private val streamRunSeq = new java.util.concurrent.atomic.AtomicLong()

  /** One sweep per (JVM, spill key): prior RUNS' leftovers go, but dirs
    * written by prior calls in THIS JVM survive — a lazily-evaluated
    * over-cap result frame stays readable after later over-cap calls
    * (r11 ADVICE: the per-call sweep silently emptied any earlier
    * call's returned DataFrame the moment a new over-cap call ran).
    * Per-call dirs are tiny (top-k rows per probe), so within-JVM
    * accumulation is bounded by the run itself; the startup sweep is
    * the same discipline as Bench.sweepLocalDirs.
    */
  private val sweptSpillKeys = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def spillRoot(spillKey: String): String =
    sweptSpillKeys.computeIfAbsent(spillKey, k => {
      val base = shmDir(k)
      Afs.listStatus(base).foreach(st => Afs.delete(st.getPath.toString))
      base
    })

  /** Probe frames LARGER than MaxProbes, served by batching — the
    * "split into batches" contract of [[collectProbes]] made
    * executable: the frame is cut into ⌈n/MaxProbes⌉ driver-bounded
    * batches (each collect is ≤ MaxProbes rows by construction), each
    * batch routes and prunes independently. Up to [[MaxBatches]]
    * batches the per-batch results union into one plan; beyond that the
    * call loops internally — one independently planned job per batch
    * into a spill dir, returned as a single scan — so ANY probe-frame
    * size serves with constant plan size. Per-batch work is identical
    * to [[ivfProbe]]; nothing about the index or the scans changes.
    */
  def ivfProbeBatched(s: SparkSession, d: String, probeDf: DataFrame): DataFrame =
    ivfProbeBatched(s, d, probeDf, None)

  /** Filtered × batched — the remaining cell of the serve matrix: any
    * probe-frame size against a metadata predicate, each batch served
    * under q130's widened-nprobe pre-filter.
    */
  def ivfProbeBatched(s: SparkSession, d: String, probeDf: DataFrame,
      attrFilter: Option[Column]): DataFrame = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    val cents = readCentroids(s, dir)
    probeBatched(s, probeDf, "probe_spill", MaxBatches)(ps =>
      ivfServe(s, Seq(dir), cents, ps, attrFilter = attrFilter,
        nprobe = if (attrFilter.isDefined) FilteredNprobe else Nprobe))
  }

  /** PQ twin of [[ivfProbeBatched]]: any probe-frame size against the
    * persisted codes, through the same rank-sliced batching driver.
    */
  def pqProbeBatched(s: SparkSession, d: String, probeDf: DataFrame): DataFrame =
    pqProbeBatchedCap(s, d, probeDf, MaxBatches)

  /** Filtered × batched on the PQ side: the lossless codes-scan
    * pre-filter ([[pqProbeFiltered]]) per batch, any frame size.
    */
  def pqProbeBatched(s: SparkSession, d: String, probeDf: DataFrame,
      attrFilter: Option[Column]): DataFrame =
    pqProbeBatchedCap(s, d, probeDf, MaxBatches, attrFilter)

  /** Spec hook: the same call with a lowered union-plan cap, so the
    * spill loop is exercisable without a 65k-probe fixture (the
    * production-scale spill path is pinned on the IVF side at 67k).
    */
  private[ops] def pqProbeBatchedCap(s: SparkSession, d: String,
      probeDf: DataFrame, unionCap: Int,
      attrFilter: Option[Column] = None): DataFrame = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    val cb = readCodebook(s, dir)
    val codes = s.read.parquet(s"$dir/pq_codes")
    val filtered = attrFilter.fold(codes)(codes.filter)
    probeBatched(s, probeDf, "pq_probe_spill", unionCap)(ps =>
      pqServe(s, corpus(s, d), cb, filtered, ps))
  }

  /** Shared batching driver behind both probe families. EXACT batch
    * slicing by rank (an id-modulo split could overfill a batch on a
    * skewed id space and trip the per-batch cap): one window pass over
    * the probe frame — probe-sized, never corpus-sized — gives each
    * batch at most MaxProbes rows by construction. Up to `unionCap`
    * batches union into one plan; beyond that, the internal spill loop
    * (r10 verdict item 4): each batch is re-planned and executed
    * INDEPENDENTLY — plan size constant no matter how many batches —
    * its top-k rows landing in a spill dir returned as ONE scan. Each
    * call spills into its own dir; PRIOR RUNS' leftovers are swept once
    * per JVM at first use ([[spillRoot]]), never per call — so over-cap
    * result frames from earlier calls in this JVM stay readable however
    * lazily a caller consumes them.
    */
  private def probeBatched(s: SparkSession, probeDf: DataFrame,
      spillKey: String, unionCap: Int)(
      serveOne: Seq[(Long, Seq[Double])] => DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("pid")
    val keyed = normalizeProbes(probeDf)
      .withColumn("batch", ((row_number().over(w) - 1) / MaxProbes).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = keyed.count()
      val batches = math.max(((n + MaxProbes - 1) / MaxProbes).toInt, 1)
      def serveBatch(b: Int): DataFrame =
        serveOne(collectProbes(keyed.filter(col("batch") === b).select("pid", "pe")))
      if (batches <= unionCap)
        (0 until batches).map(serveBatch).reduce(_ unionAll _)
          .orderBy("probe_id", "rnk")
      else {
        val out = s"${spillRoot(spillKey)}/call-${probeSpillSeq.incrementAndGet()}"
        (0 until batches).foreach { b =>
          serveBatch(b).write
            .mode(if (b == 0) "overwrite" else "append").parquet(out)
        }
        s.read.parquet(out).orderBy("probe_id", "rnk")
      }
    } finally keyed.unpersist(): Unit
  }

  /** FULLY-DISTRIBUTED IVF serve (r11 verdict item 3): the probe frame
    * stays a DataFrame end-to-end — routing, candidate generation and
    * ranking are all one lazy plan with NO driver materialization of
    * probes at any size, removing [[probeBatched]]'s serial per-batch
    * driver round-trips from the scale path (a 10⁷-probe reindex-scoring
    * job is one Spark job here, vs 10⁴ sequential collects there).
    *
    * Routing is k-thresholded like every other assignment site:
    *
    *   - at k ≤ [[LiteralAssignMaxK]] the per-probe top-nprobe lists are
    *     ONE array expression over the centroid literals
    *     (sort the (−cos, cid) structs, slice nprobe, explode) — no
    *     join, no exchange, evaluated inside the probe scan stage with
    *     the same tie-break as [[routeDriver]];
    *   - beyond it the probes cross the broadcast routing-table frame
    *     and a per-ordinal aggregate collects, sorts and slices the
    *     top-nprobe (negsim, cid) entries — ONE linear pipeline (the
    *     ordinal is nondeterministic, so it is never recomputed across
    *     a self-join), with map-side partial aggregation so the
    *     exchange carries each probe's k narrow structs plus its
    *     vector once, never the k-fold expansion.
    *
    * Candidates are ONE scan of the inverted lists joined to the routed
    * probes on cid. Unlike the batched path there is no STATIC cid
    * pruning (the probed set is not known at plan time) — the honest
    * trade-off between the two serve shapes: a probe frame large enough
    * to need this path touches essentially every list anyway, so there
    * is nothing to prune, while a small or selective batch should keep
    * using [[ivfProbe]]/[[ivfProbeBatched]], whose collected routing
    * buys a pruned scan. Join parallelism is ∝ the number of probed
    * lists, i.e. ∝ k — at the bench's K=16 the demo-scale constant, at
    * §9's k=√n≈32k genuinely wide. Ranking partitions by probe ordinal
    * (probe-count-wide). Per-probe results are identical to
    * [[ivfProbe]]/[[ivfProbeBatched]] (pinned by AnnIndexSpec at 10k+
    * probes); duplicate probe ids serve per-row, like [[routeJoin]].
    */
  def ivfProbeDistributed(s: SparkSession, d: String, probeDf: DataFrame,
      attrFilter: Option[Column] = None): DataFrame = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    ivfDistributedCore(s, Seq(dir), readCentroids(s, dir), probeDf, Nil, attrFilter)
  }

  /** Distributed serve over an LSM state — segment roots (base first)
    * with per-tombstone recency boundaries, the [[ivfProbeSegments]]
    * composition on the end-to-end-DataFrame path: every cell of the
    * serve matrix (filtered × masked × multi-segment) is available at
    * reindex scale with zero probe materialization.
    */
  private[graft] def ivfProbeDistributedSegments(s: SparkSession,
      roots: Seq[String], probeDf: DataFrame,
      tss: Seq[(String, Int)] = Nil,
      attrFilter: Option[Column] = None): DataFrame = {
    GraftFunctions.register(s)
    ivfDistributedCore(s, roots, readCentroids(s, roots.head), probeDf,
      tss.map { case (p, b) => s.read.parquet(s"$p/tombstones") -> b },
      attrFilter)
  }

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

  private def ivfDistributedCore(s: SparkSession, roots: Seq[String],
      cents: Seq[(Int, Seq[Double])], probeDf: DataFrame,
      tss: Seq[(DataFrame, Int)], attrFilter: Option[Column]): DataFrame = {
    val nprobe = if (attrFilter.isDefined) FilteredNprobe else Nprobe
    import org.apache.spark.sql.expressions.Window
    val probes = probesWithOrdinal(probeDf)
    val routed: DataFrame = routeDistributed(s, probes, cents, nprobe)
    val lists = maskedUnion(s, roots, "ivf_assignments",
      Seq(col("cid"), col("vec_id"), col("e")), tss,
      prep = df => df.filter(attrFilter.getOrElse(lit(true))))
    val wT = Window.partitionBy("__pord").orderBy(col("cos").desc, col("vec_id").asc)
    lists.join(routed, Seq("cid"))
      .filter(col("vec_id") =!= col("pid"))
      .withColumn("cos", GraftFunctions.cosineSim(col("e"), col("pe")))
      .withColumn("rnk", row_number().over(wT).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("pid").as("probe_id"), col("vec_id").as("nbr_id"), col("rnk"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Metadata-FILTERED IVF serve: top-k among only the vectors matching
    * `attrFilter` (a predicate over the inline list attributes —
    * currently `label`). This is PRE-filtering, the production
    * vector-search shape: the attribute was denormalized into the
    * inverted lists at WRITE time precisely so the predicate evaluates
    * inside the pruned list scan — no corpus join, no post-top-k cut
    * that could return fewer than k, and parquet row-group stats skip
    * non-matching chunks. Post-filtering (top-k first, filter after)
    * under-fills results at exactly the selectivities where filtering
    * matters; a serve-time join back to the corpus re-introduces the
    * corpus-sized input the index exists to avoid.
    */
  /** Filtered probes WIDEN the probe set (2×, capped at K): a selective
    * predicate thins every probed list, so holding nprobe constant
    * starves the candidate pool at exactly the selectivities filtering
    * targets — the standard IVF filtered-search compensation. Scan cost
    * stays BELOW an unfiltered probe's: 2× the partitions, each
    * row-group-skipped to the matching ~10%.
    */
  val FilteredNprobe: Int = math.min(K, Nprobe * 2)

  def ivfProbeFiltered(s: SparkSession, d: String, attrFilter: Column,
      probeDf: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    ivfServe(s, Seq(dir), readCentroids(s, dir), collectProbes(probeDf),
      attrFilter = Some(attrFilter), nprobe = FilteredNprobe)
  }

  def ivfProbeFiltered(s: SparkSession, d: String, attrFilter: Column): DataFrame =
    ivfProbeFiltered(s, d, attrFilter, defaultProbes(s, d))

  /** Q112 serve path: ADC over the persisted codes. Each probe's M×K
    * lookup table of subvector dot products is precomputed driver-side
    * (O(M·K·sub) per probe) and shipped flat; a corpus row's quantized
    * dot product is then M array lookups — one scan of the codes table
    * broadcast-joined with the probes, no training, no reconstruction
    * join. The 256-per-probe pool re-ranks exactly against the true
    * embeddings (q23f's refine discipline).
    */
  def pqProbe(s: SparkSession, d: String): DataFrame =
    pqProbe(s, d, defaultProbes(s, d))

  /** Parameterized PQ serve (r9 verdict item 2): any (id, vector) probe
    * frame, ADC-scored against this dataset's persisted codes.
    */
  def pqProbe(s: SparkSession, d: String, probeDf: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    pqServe(s, corpus(s, d), readCodebook(s, dir),
      s.read.parquet(s"$dir/pq_codes"), collectProbes(probeDf))
  }

  /** Metadata-FILTERED PQ serve — [[ivfProbeFiltered]]'s twin over the
    * codes table. Unlike IVF (where a filter thins the probed lists, so
    * nprobe widens 2× to compensate), PQ pre-filtering is LOSSLESS: ADC
    * scans every codes row anyway, so filtering the scan first means the
    * refine pool is exactly the top-[[Pool]] *matching* candidates — no
    * starvation at any selectivity, no compensation knob, and recall vs
    * the filter-restricted exact truth equals unfiltered PQ recall
    * (quantization error is the only approximation either way). The
    * predicate evaluates on the inline `label` column written into
    * `pq_codes` at index time, so it pushes into the parquet scan
    * (row-group stats skip non-matching chunks) — no corpus join, no
    * post-top-k cut that could return fewer than k.
    */
  def pqProbeFiltered(s: SparkSession, d: String, attrFilter: Column,
      probeDf: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    pqServe(s, corpus(s, d), readCodebook(s, dir),
      s.read.parquet(s"$dir/pq_codes").filter(attrFilter),
      collectProbes(probeDf))
  }

  def pqProbeFiltered(s: SparkSession, d: String, attrFilter: Column): DataFrame =
    pqProbeFiltered(s, d, attrFilter, defaultProbes(s, d))

  /** Shared PQ serve core over an explicit codes frame (the segment
    * composition / tombstone masking happens in the caller): ADC LUTs
    * driver-side, M-lookup scoring over the codes, exact refine against
    * `emb` — the caller supplies the true-embedding source (the dataset
    * corpus for the registered queries; the segments' own stored
    * vectors for lifecycle serving, so upserted ids refine against
    * their replacement embeddings, never a stale corpus row).
    */
  /** The collected O(M·K·sub) ADC codebook — bounded by construction,
    * loaded ONCE per serve call site (the batched driver reuses it
    * across every batch instead of re-collecting per batch).
    */
  private[ops] def readCodebook(s: SparkSession, cbDir: String,
      readOpts: Map[String, String] = Map.empty): Map[(Int, Int), Seq[Double]] =
    s.read.options(readOpts).parquet(s"$cbDir/pq_codebook")
      .select(col("m"), col("code"), col("ce"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap

  private def pqServe(s: SparkSession, emb: DataFrame,
      cb: Map[(Int, Int), Seq[Double]],
      codes: DataFrame, probes: Seq[(Long, Seq[Double])]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Flat LUT per probe: lut[m*K + code] = dot(pe_m, centroid(m, code)).
    // Rows lead with the probe's batch ordinal so ranking below is per
    // probe ROW — duplicate pids rank independently (r12 ADVICE).
    val probeLut: Seq[(Int, Long, Seq[Double], Seq[Double], Double)] =
      probes.zipWithIndex.map { case ((pid, pe), ord) =>
        val lut = for (m <- 0 until Mpq; code <- 0 until Kpq) yield {
          val ce = cb((m, code)); val off = m * Sub
          var acc = 0.0; var i = 0
          while (i < Sub) { acc += pe(off + i) * ce(i); i += 1 }
          acc
        }
        val pnorm = math.sqrt(pe.map(x => x * x).sum)
        (ord, pid, pe, lut, pnorm)
      }
    val lutDf = {
      import s.implicits._
      probeLut.toDF("__ord", "probe_id", "pe", "lut", "pnorm")
    }
    // qdot = Σ_m lut[m*K + codes[m]] — the codegen'd ADC kernel
    // ([[graft.functions.AdcDotExpr]]); qcos against the stored
    // reconstructed norm ranks the pool.
    val scored = codes.join(broadcast(lutDf), col("vec_id") =!= col("probe_id"))
      .withColumn("qdot", GraftFunctions.adcDot(col("lut"), col("codes"), Kpq))
      .withColumn("qcos", col("qdot") / (col("pnorm") * col("qnorm")))
    val wPool = Window.partitionBy("__ord").orderBy(col("qcos").desc, col("vec_id").asc)
    val pool = scored
      .withColumn("prank", row_number().over(wPool))
      .filter(col("prank") <= Pool)
      .select(col("__ord"), col("probe_id"), col("vec_id"), col("pe"))
    val wT = Window.partitionBy("__ord").orderBy(col("cos").desc, col("vec_id").asc)
    // Unhinted exact-refine join (q23f's r8 discipline): the corpus side
    // carries accurate scan stats — broadcast at bench scale, shuffled
    // fallback beyond the threshold.
    pool
      .join(emb, Seq("vec_id"))
      .withColumn("cos", GraftFunctions.cosineSim(col("e"), col("pe")))
      .withColumn("rnk", row_number().over(wT).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("probe_id"), col("vec_id").as("nbr_id"), col("rnk"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("probe_id", "rnk")
  }

  // ---- incremental append (base + delta segments) ---------------------

  /** The 90/10 ingest split the append lifecycle exercises: the base
    * index is trained on vec_id % 10 != 0; the "newly arrived" batch is
    * the other 10%.
    */
  private[ops] def baseSlice(df: DataFrame): DataFrame = df.filter(pmod(col("vec_id"), lit(10)) =!= 0)
  private[ops] def batchSlice(df: DataFrame): DataFrame = df.filter(pmod(col("vec_id"), lit(10)) === 0)

  /** The base index over the 90% slice — a one-time dataset-keyed
    * fixture (markered like build()): the append query must price the
    * APPEND, not a rebuild.
    */
  private def ensureAppendBase(s: SparkSession, d: String): String = {
    GraftFunctions.register(s)
    val key = Tables.datasetTag(d) + "/append_base"
    built.computeIfAbsent(key, key => {
      val root = shmDir(key)
      currentVersion(root).getOrElse(
        publishVersion(root)(vdir => writeIndex(s, baseSlice(corpus(s, d)), vdir)))
    })
  }

  /** Append the batch as a DELTA SEGMENT against the FROZEN base index:
    * assignment against the existing centroids and encoding against the
    * existing codebook are pure scan-stage argmins — no Lloyd, no
    * training, one pass over the batch only (the LSM-style lifecycle a
    * serving index runs between rebuild/compactions; SURVEY §9). The
    * delta lands in its own artifact dir (overwrite — idempotent per
    * run, base never mutated); readers union base + delta, and
    * partition pruning applies to both segments' cid dirs.
    */
  /** Write one delta segment under `vdir`: assignment against the base
    * index's centroids and encoding against its codebook — pure
    * scan-stage argmins over the batch, nothing retrains. The shared
    * write body behind [[appendDelta]] and [[upsert]].
    */
  private def writeDeltaSegment(s: SparkSession, baseDir: String,
      batch: DataFrame, vdir: String): Unit = {
    val cents = readCentroids(s, baseDir)
    val cb = s.read.parquet(s"$baseDir/pq_codebook")
    assignCids(batch, cents)
      .select(col("cid"), col("vec_id"), col("label"), col("e"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$vdir/ivf_assignments")
    encodePq(batch, cb)
      .write.mode("overwrite").parquet(s"$vdir/pq_codes")
  }

  def appendDelta(s: SparkSession, d: String): (String, String) = {
    val baseDir = ensureAppendBase(s, d)
    val deltaRoot = shmDir(Tables.datasetTag(d) + "/append_delta")
    val batch = batchSlice(corpus(s, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Delta segments publish through the same pointer-flip discipline
    // as full builds: the append re-runs per q113 invocation and a
    // probe adopting the delta mid-rewrite must never see a partial
    // segment.
    val deltaDir = try
      publishVersion(deltaRoot)(writeDeltaSegment(s, baseDir, batch.toDF(), _))
    finally { batch.unpersist(): Unit }
    (baseDir, deltaDir)
  }

  /** IVF serve over the appended (base ∪ delta) index — q111's routing
    * and pruning, with the list scan reading both segments.
    */
  def ivfProbeAppended(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val (baseDir, deltaDir) = appendDelta(s, d)
    ivfServe(s, Seq(baseDir, deltaDir), readCentroids(s, baseDir),
      collectProbes(defaultProbes(s, d)))
  }

  // ---- delta compaction (r9 verdict item 3) ---------------------------

  /** Fold the delta segment into the base index (the LSM compaction the
    * append lifecycle needs: repeated appends accumulate segments and
    * files per inverted list, shrinking the pruning benefit). The work
    * is bounded by the DELTA, not the corpus:
    *
    *   - touched lists (the delta's cids — a bounded ≤K driver collect)
    *     are merged base+delta and rewritten through ONE exchange on
    *     cid, restoring one file per list;
    *   - UNTOUCHED base lists are carried over as raw file copies — no
    *     scan, no shuffle (at 100 TB: a pure object-store copy/link);
    *   - centroids and codebook copy unchanged (nothing retrains);
    *   - pq_codes segments concatenate file-level (the codes table is
    *     not cid-pruned; merging its parquet files needs no scan).
    *
    * Publishes an immutable compacted version under its own root via
    * the pointer-flip discipline; base and delta stay untouched, so
    * q113's append pricing and in-flight readers are unaffected.
    */
  def compact(s: SparkSession, d: String): String = {
    val (baseDir, deltaDir) = appendDelta(s, d)
    val root = shmDir(Tables.datasetTag(d) + "/append_compacted")
    publishVersion(root)(compactInto(s, baseDir, Seq(deltaDir), Nil, _))
  }

  /** Fold ANY number of delta segments (q113 appends, q128 streamed
    * micro-batch segments, upsert replacement segments) and ANY number
    * of tombstone frames into one physical index under `vdir` — the
    * shared compaction core behind [[compact]], [[compactWithDeletes]],
    * [[compactUpsert]] and [[compactSegmentRoots]]:
    *
    *   - touched lists = every delta's cids ∪ the tombstones' recorded
    *     cids (bounded ≤K collects); merged base+deltas, tombstones
    *     anti-joined out, ONE exchange on cid, one file per list;
    *   - untouched base lists carry over file-level (correct because a
    *     tombstoned vector's list is touched by construction — the
    *     tombstone recorded its victim's cid at write time);
    *   - codes: without tombstones a pure file-level concat (prefix per
    *     segment — no scan); with tombstones one anti-join filter pass
    *     over the 32×-compressed table;
    *   - trained artifacts copy unchanged from the base;
    *   - the LSM sequencing rule rides through: each tombstone carries
    *     its own recency boundary `(frame, maskBelow)` and masks exactly
    *     the segments at index < maskBelow, where the base is segment 0
    *     and delta i (oldest first) is segment i+1. A delete is the
    *     newest write and masks everything (`Int.MaxValue`); an upsert's
    *     tombstone is older than its replacement segment and must not
    *     mask it. Arbitrary interleavings of the two compose — the
    *     histories the lifecycle soak generates.
    */
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
    * LSM recency-boundary rule — the shared core behind [[compactInto]]
    * (f3 `ivf_assignments`) and [[IvfPq.compactSegments]] (f4
    * `ivfpq_lists`), so a fix to the fold discipline lands once (review
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

  private def compactInto(s: SparkSession, baseDir: String,
      deltaDirs: Seq[String], tss: Seq[(DataFrame, Int)],
      vdir: String): Unit = {
    foldPartitionedArtifact(s, baseDir, deltaDirs, tss, "ivf_assignments",
      Seq("cid", "vec_id", "label", "e"), sortInPartitions = false, vdir): Unit
    val anti = lsmAnti(tss) _
    Afs.copyTree(s"$baseDir/ivf_centroids", s"$vdir/ivf_centroids")
    Afs.copyTree(s"$baseDir/pq_codebook", s"$vdir/pq_codebook")
    if (tss.nonEmpty) {
      val codeCols = Seq(col("vec_id"), col("codes"), col("qnorm"), col("label"))
      val baseCodes = anti(
        s.read.parquet(s"$baseDir/pq_codes").select(codeCols: _*), 0, codeCols)
      val deltaCodes = deltaDirs.zipWithIndex
        .map { case (p, i) =>
          anti(s.read.parquet(s"$p/pq_codes").select(codeCols: _*), i + 1, codeCols)
        }
        .reduceOption(_ unionAll _)
      deltaCodes.fold(baseCodes)(baseCodes.unionAll)
        .write.mode("overwrite").parquet(s"$vdir/pq_codes")
    } else {
        val codesOut = s"$vdir/pq_codes"
        Afs.mkdirs(codesOut)
        (("base" -> s"$baseDir/pq_codes") +:
          deltaDirs.zipWithIndex.map { case (p, i) => s"d$i" -> s"$p/pq_codes" })
          .foreach { case (pfx, src) =>
            Afs.listStatus(src)
              .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
              .foreach(st => Afs.copyFile(st.getPath.toString,
                s"$codesOut/$pfx-${st.getPath.getName}"))
          }
    }
  }

  /** Compact explicit segment roots (the streamed-ingest read side)
    * into a pointer-flipped version under `outRoot` — proves q128's
    * accumulated micro-batch segments fold through the SAME compaction
    * the append lifecycle uses.
    */
  private[ops] def compactSegmentRoots(s: SparkSession, baseDir: String,
      segDirs: Seq[String], outRoot: String): String =
    publishVersion(outRoot)(compactInto(s, baseDir, segDirs, Nil, _))

  /** IVF serve over the COMPACTED index — one segment root again (spec
    * use: recall must hold and the scan must read a single root).
    */
  def ivfProbeCompacted(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val dir = compactedOrCompact(s, d)
    ivfServe(s, Seq(dir), readCentroids(s, dir),
      collectProbes(defaultProbes(s, d)))
  }

  private def compactedOrCompact(s: SparkSession, d: String): String = {
    val root = shmDir(Tables.datasetTag(d) + "/append_compacted")
    currentVersion(root).getOrElse(compact(s, d))
  }

  // ---- deletes (tombstone segments) ------------------------------------

  /** The deterministic delete set the lifecycle queries exercise: 10%
    * of the corpus, split across BOTH segments — vec_id % 20 == 3 lives
    * in the base (odd), vec_id % 20 == 10 lives in the append delta
    * (multiple of 10) — so deletion is exercised against every segment
    * kind, not just the base.
    */
  private[ops] def deleteSlice(df: DataFrame): DataFrame =
    df.filter(pmod(col("vec_id"), lit(20)).isin(3, 10))

  /** Record deletes as a TOMBSTONE SEGMENT — the LSM delete discipline:
    * a delete is a WRITE, nothing in the index mutates. Each tombstone
    * row carries (vec_id, cid), the cid resolved against the base
    * centroids at delete time, so compaction later knows exactly which
    * inverted lists are dirtied WITHOUT scanning any of them (the
    * distinct-cid collect is bounded by K). Published via the same
    * pointer-flip discipline as every other segment: a reader adopting
    * tombstones mid-rewrite never sees a partial set. Serve paths mask
    * against the tombstones ([[ivfProbeLive]]); [[compactWithDeletes]]
    * makes the drop physical.
    */
  def writeTombstones(s: SparkSession, d: String): (String, String, String) = {
    val (baseDir, deltaDir) = appendDelta(s, d)
    val root = shmDir(Tables.datasetTag(d) + "/tombstones")
    (baseDir, deltaDir, tombstonesFor(s, baseDir, deleteSlice(corpus(s, d)), root))
  }

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

  /** IVF serve over the LIVE view (base ∪ delta) minus tombstones — the
    * pre-compaction read path: deleted vectors are masked before
    * ranking, so they never appear as neighbors nor displace live ones.
    */
  def ivfProbeLive(s: SparkSession, d: String): DataFrame =
    ivfProbeLive(s, d, defaultProbes(s, d))

  def ivfProbeLive(s: SparkSession, d: String, probeDf: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val (baseDir, deltaDir, tsDir) = writeTombstones(s, d)
    ivfServe(s, Seq(baseDir, deltaDir), readCentroids(s, baseDir),
      collectProbes(probeDf),
      tombstones = Seq(s.read.parquet(s"$tsDir/tombstones") -> Int.MaxValue))
  }

  /** PQ serve over the LIVE view: the codes scan unions base + delta
    * segments and the tombstone mask is a left-anti join applied BEFORE
    * ADC scoring — a deleted vector never enters the candidate pool, so
    * it can't reach the exact-refine stage either.
    */
  def pqProbeLive(s: SparkSession, d: String): DataFrame =
    pqProbeLive(s, d, defaultProbes(s, d))

  def pqProbeLive(s: SparkSession, d: String, probeDf: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val (baseDir, deltaDir, tsDir) = writeTombstones(s, d)
    val codes = s.read.parquet(s"$baseDir/pq_codes", s"$deltaDir/pq_codes")
      .join(s.read.parquet(s"$tsDir/tombstones").select(col("vec_id")),
        Seq("vec_id"), "left_anti")
    pqServe(s, corpus(s, d), readCodebook(s, baseDir), codes,
      collectProbes(probeDf))
  }

  /** PQ serve across explicit segment roots (base first, oldest to
    * newest) with per-tombstone recency boundaries — the PQ twin of
    * [[ivfProbeSegments]]. Both the codes scan and the exact-refine
    * embedding source are built from the segments themselves under the
    * same masks, so the refine stage sees exactly the live copies.
    */
  private[ops] def pqProbeSegments(s: SparkSession, d: String,
      roots: Seq[String], probeDf: DataFrame = null,
      tss: Seq[(String, Int)] = Nil,
      attrFilter: Option[Column] = None): DataFrame = {
    GraftFunctions.register(s)
    val probes = Option(probeDf).getOrElse(defaultProbes(s, d))
    val tsFrames = tss.map { case (p, b) =>
      s.read.parquet(s"$p/tombstones") -> b
    }
    // The attribute filter applies inside each segment's codes scan
    // exactly as in the single-root path (lossless for ADC —
    // [[pqProbeFiltered]]).
    val codes = maskedUnion(s, roots, "pq_codes",
      Seq(col("vec_id"), col("codes"), col("qnorm")), tsFrames,
      prep = df => df.filter(attrFilter.getOrElse(lit(true))))
    pqServe(s,
      maskedUnion(s, roots, "ivf_assignments",
        Seq(col("vec_id"), col("e")), tsFrames),
      readCodebook(s, roots.head),
      codes,
      collectProbes(probes))
  }

  /** UPSERT = delete(old) + append(new), composed from the existing
    * segment kinds — the LSM update discipline: a tombstone masks the
    * stored copy (cid resolved from the OLD embedding's deterministic
    * assignment, fetched from the updates' `old_e` column), and the new
    * embedding lands as a delta segment assigned against the frozen
    * index. A live probe then sees EXACTLY ONE copy per vec_id — the
    * new one — because the tombstone masks only segments OLDER than the
    * replacement (the LSM sequencing rule; serve and compaction both
    * honor the boundary). Nothing retrains. `updates` columns:
    * (vec_id, e [new], label, old_e [stored]). Returns
    * (indexDir, segmentDir, tombstoneDir) for the serve/compact paths.
    */
  def upsert(s: SparkSession, d: String, updates: DataFrame,
      root: String): (String, String, String) = {
    GraftFunctions.register(s)
    val dir = ensure(s, d)
    val tsDir = tombstonesFor(s, dir,
      updates.select(col("vec_id"), col("old_e").as("e")), s"$root/tombstones")
    val segDir = publishVersion(s"$root/segment")(
      writeDeltaSegment(s, dir, updates.select("vec_id", "e", "label"), _))
    (dir, segDir, tsDir)
  }

  /** Fold an upsert (replacement segment + its tombstones) into one
    * physical index: the tombstone drops the OLD copies only
    * (`tsMaskDeltas = false` — the replacement segment is newer than
    * its tombstone), so the fold conserves the corpus exactly: one old
    * copy out, one new copy in, per upserted id.
    */
  private[ops] def compactUpsert(s: SparkSession, baseDir: String,
      segDir: String, tsDir: String, outRoot: String): String = {
    val ts = s.read.parquet(s"$tsDir/tombstones")
    publishVersion(outRoot)(
      // Boundary 1: the upsert's tombstone masks only the base (segment
      // 0) — its replacement segment is newer and must survive the fold.
      compactInto(s, baseDir, Seq(segDir), Seq(ts -> 1), _))
  }

  /** Delete-aware compaction: fold delta AND tombstones into a fresh
    * physical index. Work is bounded by what the writes dirtied, never
    * by the corpus:
    *
    *   - touched lists = delta cids ∪ tombstone cids (two bounded ≤K
    *     driver collects — the tombstone segment RECORDED its cids at
    *     delete time precisely so no list scan is needed here);
    *     they are merged base+delta, anti-joined against the tombstones
    *     and rewritten through ONE exchange on cid (a uniform delete
    *     touches every list — the honest worst case; a localized delete
    *     rewrites only its lists);
    *   - untouched base lists carry over as raw file copies (no scan —
    *     at 100 TB an object-store copy/link), correct BECAUSE every
    *     tombstoned vector's list is touched by construction;
    *   - pq_codes are rewritten through one anti-join filter pass — the
    *     codes table is the 32×-compressed corpus (n·(M+8) bytes), so
    *     its rewrite is the cheap path even at 10^9 vectors, and a
    *     physical drop beats carrying a read-side mask forever;
    *   - centroids and codebook copy unchanged (nothing retrains;
    *     deletion never warrants re-clustering until a full rebuild).
    *
    * Publishes an immutable version under its own root; base, delta and
    * tombstones stay untouched for in-flight readers.
    */
  def compactWithDeletes(s: SparkSession, d: String): String = {
    val (baseDir, deltaDir, tsDir) = writeTombstones(s, d)
    val ts = s.read.parquet(s"$tsDir/tombstones")
    val root = shmDir(Tables.datasetTag(d) + "/delete_compacted")
    publishVersion(root)(compactInto(s, baseDir, Seq(deltaDir), Seq(ts -> Int.MaxValue), _))
  }

  /** IVF serve over the delete-compacted index: ONE segment root, NO
    * tombstone mask — the drop is physical, which is exactly what the
    * spec asserts (no deleted id can appear because none is stored).
    */
  def ivfProbeDeleteCompacted(s: SparkSession, d: String): DataFrame =
    ivfProbeDeleteCompacted(s, d, defaultProbes(s, d))

  def ivfProbeDeleteCompacted(s: SparkSession, d: String,
      probeDf: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    val root = shmDir(Tables.datasetTag(d) + "/delete_compacted")
    val dir = currentVersion(root).getOrElse(compactWithDeletes(s, d))
    ivfServe(s, Seq(dir), readCentroids(s, dir), collectProbes(probeDf))
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
    * ([[maintain]]) skips the re-assignment pass entirely: the monitor
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

  /** A [[maintain]] outcome: the published CURRENT dir, the drift
    * evidence the decision used, and whether a retrain actually ran.
    */
  final case class MaintainResult(
      dir: String, report: RetrainReport, retrained: Boolean)

  /** One SELF-DECIDING maintenance pass over a served LSM state — the
    * composed lifecycle the trigger exists for:
    *
    *   1. fold base + delta segments + tombstones into a fresh physical
    *      root ([[compactInto]] — delta-bounded work) and PUBLISH it:
    *      readers get the folded index immediately, whatever the drift
    *      verdict turns out to be;
    *   2. run the drift monitor over the fold's own stored assignments
    *      ([[retrainCheckAssigned]] — no re-assignment pass, one
    *      O(k·dim) aggregate over rows step 1 just wrote);
    *   3. when it fires, retrain from the folded live set and publish
    *      the rebuild behind the same CURRENT pointer (second flip —
    *      the predecessor fold survives one publish for in-flight
    *      readers, the [[publishVersion]] rule).
    *
    * The undrifted steady state therefore pays compaction + one
    * aggregate and NEVER retrains; churn that moved the centroids pays
    * the rebuild exactly when BASELINE §C12's pricing says it is worth
    * it. Inputs stay untouched either way.
    */
  private[ops] def maintain(s: SparkSession, baseDir: String,
      deltaDirs: Seq[String], tss: Seq[(DataFrame, Int)],
      outRoot: String): MaintainResult = {
    GraftFunctions.register(s)
    val folded = publishVersion(outRoot)(compactInto(s, baseDir, deltaDirs, tss, _))
    val lists = s.read.parquet(s"$folded/ivf_assignments")
    val rep = retrainCheckAssigned(s, folded, lists)
    if (!rep.recommend) MaintainResult(folded, rep, retrained = false)
    else MaintainResult(
      publishVersion(outRoot)(writeIndex(s,
        lists.select(col("vec_id"), col("e"), col("label")), _)),
      rep, retrained = true)
  }

  // ---- continuous ingest (Structured Streaming micro-batch deltas) ----

  /** Source files the ingest stream is split into — with
    * `maxFilesPerTrigger = 1` each file is one micro-batch, so the
    * lifecycle test exercises SEVERAL checkpointed batches, not a
    * single degenerate one.
    */
  val StreamFiles = 3

  /** Continuous ingest: the "newly arriving" 10% slice replayed through
    * a checkpointed Structured Streaming job, each micro-batch landing
    * as its OWN delta segment against the FROZEN base index via
    * `foreachBatch` — q113's append discipline made continuous:
    *
    *   - assignment against the base centroids and encoding against the
    *     base codebook are pure scan-stage argmins over the BATCH only
    *     (no Lloyd, no training, nothing corpus-sized moves);
    *   - each segment write is keyed by batchId and `overwrite` — the
    *     canonical idempotent foreachBatch sink, so checkpoint replay
    *     after a crash rewrites the same segment instead of duplicating
    *     it, and a finished checkpoint makes re-runs no-ops;
    *   - a `_COMPLETE` marker lands after BOTH artifacts: readers union
    *     only complete segments, so a probe during ingest sees each
    *     segment atomically (the streaming analogue of the version
    *     pointer flip);
    *   - segments accumulate until [[compact]] folds them — the full
    *     LSM serving lifecycle: build → serve → stream-ingest → compact.
    *
    * Returns (baseDir, complete segment dirs). Idempotent per `root`:
    * the checkpoint remembers processed files across invocations.
    */
  private[ops] def streamIngestInto(s: SparkSession, d: String,
      root: String): (String, Seq[String]) = {
    GraftFunctions.register(s)
    val baseDir = ensureAppendBase(s, d)
    (baseDir, streamIngestFrames(s, baseDir, batchSlice(corpus(s, d)), root))
  }

  /** The ingest core over an EXPLICIT source frame: split into `nFiles`
    * source files, stream each as one checkpointed micro-batch into its
    * own delta segment against the frozen index at `baseDir`. Returns
    * the complete segment dirs in batch (LSM recency) order. The soak's
    * stream op and [[streamIngestInto]] share this body.
    *
    * `autoMaintainEvery` > 0 wires [[maintain]] INTO the ingest loop
    * (r12 verdict item 5): after each committed micro-batch, once that
    * many not-yet-folded segments have accumulated, the loop folds them
    * (current fold ∨ base, plus the unfolded segments) into a fresh
    * version under `root/maint` behind the usual CURRENT pointer —
    * including the drift check and its conditional retrain. Each fold
    * version carries a `_SEGMENTS` manifest (written BEFORE its
    * `_SUCCESS`, so it is atomic with the version) naming every segment
    * it contains; [[servingStateOf]] composes the reader view from it.
    * A reader is consistent under any interleaving: it resolves ONE
    * immutable fold, reads THAT fold's manifest, and unions the complete
    * segments the manifest excludes — newer segments only ever ADD.
    * Folding runs between micro-batches on the single stream thread, so
    * it never races a segment writer; retirement grace protects readers
    * holding the previous fold, as everywhere else.
    */
  private[ops] def streamIngestFrames(s: SparkSession, baseDir: String,
      src: DataFrame, root: String, nFiles: Int = StreamFiles,
      autoMaintainEvery: Int = 0): Seq[String] = {
    GraftFunctions.register(s)
    // Trained tables cached per artifact base: re-read only when a fold's
    // retrain actually moved the serving base (the once-read f3 behavior,
    // keyed so auto-maintain re-resolution stays cheap).
    val centsCache =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Seq[Double])]]()
    streamIngestCore(s, baseDir, src, root, nFiles, autoMaintainEvery,
      writeSegment = (ss, df, artifactBase, seg) => {
        val batchCents =
          centsCache.computeIfAbsent(artifactBase, b => readCentroids(ss, b))
        assignCids(df, batchCents)
          .select(col("cid"), col("vec_id"), col("label"), col("e"))
          .repartition(col("cid"))
          .write.mode("overwrite").partitionBy("cid")
          .parquet(s"$seg/ivf_assignments")
        val cb = ss.read.parquet(s"$artifactBase/pq_codebook")
        encodePq(df, cb)
          .write.mode("overwrite").parquet(s"$seg/pq_codes")
      },
      maintainStep = (ss, curBase, unfolded, maintRoot, already) =>
        maintainWithManifest(ss, curBase, unfolded, maintRoot, already): Unit)
  }

  /** The FORMAT-AGNOSTIC checkpointed ingest loop behind
    * [[streamIngestFrames]] (f3) and [[IvfPq.streamIngestWithMaintain]]
    * (f4) — extracted so the streaming discipline (checkpoint-replay
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

  /** [[maintain]] plus a `_SEGMENTS` manifest stamped into every version
    * it publishes (fold and conditional retrain alike), landing BEFORE
    * the version's `_SUCCESS` — the auto-maintain bookkeeping the ingest
    * loop and [[servingStateOf]] share.
    */
  private[ops] def maintainWithManifest(s: SparkSession, baseDir: String,
      segDirs: Seq[String], outRoot: String,
      alreadyFolded: Seq[String]): MaintainResult = {
    GraftFunctions.register(s)
    val name = (p: String) => new org.apache.hadoop.fs.Path(p).getName
    val manifest = (alreadyFolded ++ segDirs.map(name)).mkString("\n")
    def stamp(vdir: String): Unit = Afs.writeString(s"$vdir/_SEGMENTS", manifest)
    val folded = publishVersion(outRoot) { v =>
      compactInto(s, baseDir, segDirs, Nil, v); stamp(v)
    }
    val lists = s.read.parquet(s"$folded/ivf_assignments")
    val rep = retrainCheckAssigned(s, folded, lists)
    if (!rep.recommend) MaintainResult(folded, rep, retrained = false)
    else MaintainResult(
      publishVersion(outRoot) { v =>
        writeIndex(s, lists.select(col("vec_id"), col("e"), col("label")), v)
        stamp(v)
      },
      rep, retrained = true)
  }

  /** Continuous ingest WITH the maintenance loop wired in: stream `src`
    * as micro-batch segments against the frozen `baseDir`, auto-folding
    * every `every` unfolded segments (see [[streamIngestFrames]]).
    * Returns the post-stream reader view: (serving base — the latest
    * fold, or `baseDir` if none fired — and the unfolded segments to
    * union with it).
    */
  private[ops] def streamIngestWithMaintain(s: SparkSession, baseDir: String,
      src: DataFrame, root: String, nFiles: Int,
      every: Int): (String, Seq[String]) = {
    streamIngestFrames(s, baseDir, src, root, nFiles, autoMaintainEvery = every): Unit
    val (b, unfolded, _) = servingStateOf(baseDir, s"$root/segments", s"$root/maint")
    (b, unfolded)
  }

  /** IVF serve across explicit segment roots (base first, oldest to
    * newest), with any number of (tombstone dir, recency boundary)
    * masks and an optional probe frame — the spec/soak read path over
    * streamed / deleted / upserted, not-yet-compacted indexes.
    */
  private[ops] def ivfProbeSegments(s: SparkSession, d: String,
      roots: Seq[String], probeDf: DataFrame = null,
      tss: Seq[(String, Int)] = Nil, nprobe: Int = Nprobe,
      attrFilter: Option[Column] = None): DataFrame = {
    GraftFunctions.register(s)
    val probes = Option(probeDf).getOrElse(defaultProbes(s, d))
    ivfServe(s, roots, readCentroids(s, roots.head), collectProbes(probes),
      tombstones = tss.map { case (p, b) =>
        s.read.parquet(s"$p/tombstones") -> b
      },
      attrFilter = attrFilter,
      // Filtered serving composes with the LSM state under the same
      // widening rule as the single-root path (q130's rationale) —
      // widening only: a caller's explicit wider nprobe wins.
      nprobe = if (attrFilter.isDefined) math.max(nprobe, FilteredNprobe)
               else nprobe)
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

  /** Q111 — IVF serve from the persisted index (no Lloyd, no training:
    * routing table collect + pruned list scan only). Approximate →
    * rows-only driver check; AnnIndexSpec pins recall at q23e's floor
    * and pins the partition-pruned scan shape.
    */
  val q111: Q = Q("q111_ann_ivf_probe", (s, d) => ivfProbe(s, d), None)

  /** Q112 — PQ serve from the persisted index (ADC scoring + exact
    * refine; the corpus-sided input is the compressed codes table).
    * Approximate → rows-only driver check; AnnIndexSpec pins recall at
    * q23f's floor.
    */
  val q112: Q = Q("q112_ann_pq_probe", (s, d) => pqProbe(s, d), None)

  /** Q113 — incremental index append: the 10% batch is assigned against
    * the FROZEN base index (no Lloyd, one batch pass) into a delta
    * segment; the census reads back the appended index and is oracled
    * on conservation — base + delta must cover the corpus exactly, and
    * the trained artifacts keep their configured sizes (nothing
    * retrained, nothing dropped). The bench line prices the APPEND:
    * the base is a one-time fixture, the delta rebuilds every run.
    */
  val q113: Q = Q(
    "q113_ann_index_append",
    (s, d) => {
      val (baseDir, deltaDir) = appendDelta(s, d)
      // Absent-artifact (= empty segment) reads count 0; any OTHER
      // failure — corrupt segment, IO error — must propagate, not
      // surface later as an inscrutable conservation-count mismatch.
      def n(path: String): Long =
        try s.read.parquet(path).count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      import s.implicits._
      Seq(
        ("ivf_assignments",
          n(s"$baseDir/ivf_assignments") + n(s"$deltaDir/ivf_assignments")),
        ("ivf_centroids", n(s"$baseDir/ivf_centroids")),
        ("pq_codebook", n(s"$baseDir/pq_codebook")),
        ("pq_codes", n(s"$baseDir/pq_codes") + n(s"$deltaDir/pq_codes")))
        .toDF("artifact", "n_rows")
        .orderBy("artifact")
    },
    Some(s"""SELECT 'ivf_assignments' AS artifact, count(*) AS n_rows FROM embeddings
            |UNION ALL SELECT 'ivf_centroids', CAST($K AS BIGINT)
            |UNION ALL SELECT 'pq_codebook', CAST(${Mpq * Kpq} AS BIGINT)
            |UNION ALL SELECT 'pq_codes', count(*) FROM embeddings
            |ORDER BY artifact""".stripMargin))

  /** Q127 — delta compaction: fold the append delta back into the base
    * (one exchange over delta + touched lists, raw carry-over for the
    * rest — see [[compact]]), then census the compacted index. Oracled
    * on the same conservation law as q110/q113: compaction must neither
    * drop nor duplicate a vector, and the trained artifacts keep their
    * configured sizes (nothing retrains). The bench line prices the
    * COMPACTION: base and delta are fixtures by the time it runs, the
    * merge re-runs every invocation.
    */
  val q127: Q = Q(
    "q127_ann_index_compact",
    (s, d) => {
      val dir = compact(s, d)
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

  /** Q128 — continuous ingest: the 10% slice streamed through a
    * checkpointed foreachBatch job in [[StreamFiles]] micro-batches,
    * each landing as its own delta segment against the frozen base
    * (see [[streamIngestInto]]); the census covers base + all streamed
    * segments and is oracled on the same conservation law as
    * q113/q127 — streaming ingest must neither drop nor duplicate a
    * vector, and nothing retrains. The bench line prices the INGEST:
    * each invocation streams into a fresh run root (fresh checkpoint),
    * deleted after the eager census so /dev/shm never accumulates.
    */
  val q128: Q = Q(
    "q128_ann_stream_ingest",
    (s, d) => {
      val base = shmDir(Tables.datasetTag(d) + "/stream_runs")
      Afs.mkdirs(base)
      // Unique run root by claim marker — the same exclusive-create
      // primitive version allocation uses (portable where
      // createTempDirectory is local-only).
      var n = streamRunSeq.incrementAndGet()
      var attempts = 0
      while (!Afs.createExclusive(s"$base/run-$n._CLAIM")) {
        n = streamRunSeq.incrementAndGet(); attempts += 1
        // Same bounded-loop rule as publishVersion's claim loop.
        if (attempts >= ClaimAttemptCap) throw new java.io.IOException(
          s"stream-run claim loop lost $attempts consecutive claims under $base")
      }
      val root = s"$base/run-$n"
      val rows = try {
        val (baseDir, segs) = streamIngestInto(s, d, root)
        // Same narrowing as q113's census: only an absent artifact
        // (AnalysisException) counts as empty; real failures propagate.
        def n(p: String): Long =
          try s.read.parquet(p).count()
          catch { case _: org.apache.spark.sql.AnalysisException => 0L }
        Seq(
          ("ivf_assignments",
            n(s"$baseDir/ivf_assignments") + segs.map(g => n(s"$g/ivf_assignments")).sum),
          ("ivf_centroids", n(s"$baseDir/ivf_centroids")),
          ("pq_codebook", n(s"$baseDir/pq_codebook")),
          ("pq_codes",
            n(s"$baseDir/pq_codes") + segs.map(g => n(s"$g/pq_codes")).sum))
      } finally { Afs.delete(root); Afs.delete(s"$root._CLAIM") }
      import s.implicits._
      rows.toDF("artifact", "n_rows").orderBy("artifact")
    },
    Some(s"""SELECT 'ivf_assignments' AS artifact, count(*) AS n_rows FROM embeddings
            |UNION ALL SELECT 'ivf_centroids', CAST($K AS BIGINT)
            |UNION ALL SELECT 'pq_codebook', CAST(${Mpq * Kpq} AS BIGINT)
            |UNION ALL SELECT 'pq_codes', count(*) FROM embeddings
            |ORDER BY artifact""".stripMargin))

  /** Q129 — tombstone deletes + delete-aware compaction: 10% of the
    * corpus (split across base AND delta segments) is deleted via a
    * tombstone segment (see [[writeTombstones]] — a delete is a write;
    * the segment records each victim's cid so compaction knows its
    * dirty lists without scanning any), then [[compactWithDeletes]]
    * makes the drop physical. The census reads the compacted index and
    * the oracle is EXACT: every surviving vector and no deleted one, in
    * both the lists and the codes; trained artifacts keep their
    * configured sizes (deletion never retrains). The bench line prices
    * tombstone write + delete-compaction; base and delta are fixtures.
    */
  val q129: Q = Q(
    "q129_ann_index_delete",
    (s, d) => {
      val dir = compactWithDeletes(s, d)
      import s.implicits._
      Seq("ivf_assignments", "ivf_centroids", "pq_codebook", "pq_codes")
        .map(a => (a, s.read.parquet(s"$dir/$a").count()))
        .toDF("artifact", "n_rows")
        .orderBy("artifact")
    },
    Some(s"""SELECT 'ivf_assignments' AS artifact, count(*) AS n_rows
            |  FROM embeddings WHERE vec_id % 20 NOT IN (3, 10)
            |UNION ALL SELECT 'ivf_centroids', CAST($K AS BIGINT)
            |UNION ALL SELECT 'pq_codebook', CAST(${Mpq * Kpq} AS BIGINT)
            |UNION ALL SELECT 'pq_codes', count(*)
            |  FROM embeddings WHERE vec_id % 20 NOT IN (3, 10)
            |ORDER BY artifact""".stripMargin))

  /** Q130 — metadata-filtered ANN serve: top-k among vectors with
    * `label = 7` only (~10% selectivity), pre-filtered inside the
    * pruned list scan (see [[ivfProbeFiltered]]). Approximate →
    * rows-only driver check; AnnIndexSpec pins that every neighbor
    * matches the predicate, that the surface stays full (k results per
    * probe — post-filtering would under-fill), the recall floor vs the
    * label-restricted exact truth, and the filter's pushdown into the
    * list scan.
    */
  val q130: Q = Q(
    "q130_ann_filtered_probe",
    (s, d) => ivfProbeFiltered(s, d, col("label") === 7),
    None)

  /** Q131 — the PQ twin of q130: top-k among `label = 7` vectors only,
    * pre-filtered inside the codes scan via the inline attribute (see
    * [[pqProbeFiltered]] — lossless for PQ, so no nprobe-style widening
    * exists or is needed). Approximate → rows-only driver check;
    * AnnIndexSpec pins predicate purity, full surface, the recall floor
    * vs the label-restricted exact truth, and the filter's pushdown
    * into the codes scan.
    */
  val q131: Q = Q(
    "q131_ann_pq_filtered_probe",
    (s, d) => pqProbeFiltered(s, d, col("label") === 7),
    None)

  /** Q132 — the fully-distributed serve path priced as a registered
    * query: a probe frame of 5 re-keyed corpus copies (LARGER than
    * [[MaxProbes]] — the reindex-scoring shape the path exists for)
    * served through [[ivfProbeDistributed]] as one lazy plan, probes
    * never materialized on the driver (tiny/selective batches keep the
    * pruned collected path). Approximate → rows-only driver check;
    * AnnIndexSpec pins result equality with the batched path at 10k
    * probes and the no-LocalTableScan plan.
    */
  val q132: Q = Q(
    "q132_ann_distributed_probe",
    (s, d) => {
      val reps = 5
      val probes = corpus(s, d)
        .crossJoin(broadcast(s.range(reps).toDF("r")))
        .select(((col("r") + 1) * lit(10000000L) + col("vec_id")).as("pid"),
          col("e").as("pe"))
      ivfProbeDistributed(s, d, probes)
    },
    None)

  /** Registered: ONLY the f3 build (q110) — it is the migration source
    * [[IvfPq.migrateFromF3]] converts (and q111 prices serving the
    * conversion's output). Every other ANN registry line converged on
    * the composed f4 format in r14 (r13 verdict item 2): the q111–q132
    * names are now registered by [[IvfPq.queries]] against the at-scale
    * artifact. The f3 Q vals above and the f3 serve/lifecycle code in
    * this file are QUARANTINED, not deleted: they are the
    * spec-pinned reference implementations (AnnIndexSpec,
    * AnnLifecycleSoakSpec, AnnRetrainSpec pin recall floors, plan
    * shapes, LSM semantics and race behavior on them) and the
    * migration-support surface — they are no longer priced by the
    * bench and must not grow new features; new work lands on IvfPq.
    */
  val queries: Seq[Q] = Seq(q110)
}
