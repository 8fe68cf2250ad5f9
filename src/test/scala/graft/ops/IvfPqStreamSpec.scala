package graft.ops

import graft.SparkTestBase
import graft.kms.TestKmsServer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest on the composed f4 artifact
  * ([[IvfPq.streamIngestWithMaintain]] through the shared
  * [[AnnIndex.streamIngestCore]]): q128's checkpointed micro-batch
  * discipline landing composed delta segments, auto-maintain folding
  * them behind the CURRENT pointer with `_SEGMENTS` manifests, a
  * concurrent reader staying consistent across every fold — and the
  * whole loop composing with encryption (the last index write path).
  */
class IvfPqStreamSpec extends SparkTestBase {

  private val Dim = 64

  private def vec(id: Long): Seq[Double] =
    (0 until Dim).map(j => math.sin(id * 29.0 + j * 13.0))

  private def frame(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, vec(id), (id % 10).toInt)).toDF("vec_id", "e", "label")
  }

  private def freshRoot(name: String): String = {
    val f = new java.io.File(
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
      else sys.props("java.io.tmpdir"), name)
    def rm(g: java.io.File): Unit = {
      if (g.isDirectory) Option(g.listFiles()).getOrElse(Array.empty).foreach(rm)
      g.delete(): Unit
    }
    rm(f)
    f.toString
  }

  test("f4 stream-ingest: serve continuity across auto-fired folds, conservation and manifest at the end") {
    import spark.implicits._
    val root = freshRoot("graft-ivfpq-stream")
    val baseIds = 0L until 64L
    val ingestIds = 1000L until 1024L
    val universe = (baseIds ++ ingestIds).toSet
    val baseDir = IvfPq.buildFrom(spark, frame(baseIds), s"$root/base")
    val segRoot = s"$root/ingest/segments"
    val maintRoot = s"$root/ingest/maint"

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong()
    @volatile var stop = false
    val probeId = 7L
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val (b, unfolded, _) = AnnIndex.servingStateOf(baseDir, segRoot, maintRoot)
          val probes = Seq((probeId + 1000000L, vec(probeId))).toDF("pid", "pe")
          val res = IvfPq.probeSegments(spark, b +: unfolded, probes).collect()
          reads.incrementAndGet(): Unit
          if (res.length != AnnIndex.TopK)
            failures.add(s"surface ${res.length} rows (base=$b segs=${unfolded.size})"): Unit
          val top = res.find(_.getLong(2) == 1L)
          if (!top.exists(r => r.getLong(1) == probeId && r.getDouble(3) == 1.0))
            failures.add(s"top-1 lost self: ${top.map(r => (r.getLong(1), r.getDouble(3)))}"): Unit
          val nbrs = res.map(_.getLong(1))
          if (nbrs.distinct.length != nbrs.length)
            failures.add(s"duplicate neighbors: ${nbrs.mkString(",")}"): Unit
          nbrs.filterNot(universe).foreach(g => failures.add(s"ghost neighbor $g"): Unit)
        } catch {
          case e: Throwable => failures.add(s"reader threw: $e"): Unit
        }
      }
    })
    reader.start()
    val (finalBase, unfolded) = try {
      IvfPq.streamIngestWithMaintain(spark, baseDir, frame(ingestIds),
        s"$root/ingest", nFiles = 4, every = 2)
    } finally { stop = true; reader.join(30000) }
    assert(failures.isEmpty, s"reader violations: ${failures.toArray.take(5).mkString(" | ")}")
    assert(reads.get() >= 3, s"reader only completed ${reads.get()} polls — fixture too fast")

    val fold = AnnIndex.resolveVersion(maintRoot)
    assert(fold.isDefined, "no auto-maintain fold fired at every=2 over 4 batches")
    assert(unfolded.isEmpty, s"expected all segments folded, left: $unfolded")
    val got = spark.read.parquet(s"$finalBase/ivfpq_lists")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size, "fold duplicated ids")
    assert(got.toSet == universe,
      s"fold lost=${(universe -- got.toSet).take(5)} ghosts=${(got.toSet -- universe).take(5)}")
    val manifest = graft.io.Afs.readString(s"${fold.get}/_SEGMENTS")
      .split("\n").filter(_.nonEmpty)
    assert(manifest.length == 4, s"manifest: ${manifest.mkString(",")}")
  }

  test("deletes compose into the streaming ingest loop: masked before the fold, physical after, newer copies survive") {
    import spark.implicits._
    val root = freshRoot("graft-ivfpq-stream-del")
    val ingestRoot = s"$root/ingest"
    val baseIds = 0L until 64L
    val ingestIds = 1000L until 1024L
    val baseDir = IvfPq.buildFrom(spark, frame(baseIds), s"$root/base")

    val baseVictim = 7L
    @volatile var landedVictim = -1L   // an ingest id already landed when the delete fires
    @volatile var futureVictim = -1L   // an ingest id NOT yet landed — its copy is NEWER than the tombstone
    val hookErrors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val afterBatch = (ss: org.apache.spark.sql.SparkSession, id: Long) =>
      try {
        if (id == 1L) {
          // b0 and b1 are committed; enqueue a delete for one base id,
          // one landed ingest id, and one id that will only arrive in a
          // LATER batch (the tombstone must not mask that newer copy —
          // the LSM freshness rule).
          // Segments are separate partitioned roots — load each and
          // union (Spark rejects conflicting partition roots in one
          // load, the maskedUnion rule).
          val landed = Seq("b0", "b1")
            .map(b => ss.read.parquet(s"$ingestRoot/segments/$b/ivfpq_lists")
              .select("vec_id"))
            .reduce(_ unionAll _).collect().map(_.getLong(0)).toSet
          landedVictim = ingestIds.find(landed).get
          futureVictim = ingestIds.find(i => !landed(i)).get
          IvfPq.enqueueTombstones(ss, baseDir, ingestRoot,
            frame(Seq(baseVictim, landedVictim, futureVictim))): Unit
          // BEFORE any fold: the serve path must already mask the
          // victims (a delete is visible the moment its tombstone's
          // _COMPLETE lands).
          Seq(baseVictim, landedVictim).foreach { v =>
            val res = IvfPq.probeServing(ss, baseDir, ingestRoot,
              Seq((v + 1000000L, vec(v))).toDF("pid", "pe")).collect()
            if (res.exists(_.getLong(1) == v))
              hookErrors.add(s"victim $v served after its tombstone landed"): Unit
          }
        }
      } catch { case e: Throwable => hookErrors.add(s"hook threw: $e"): Unit }

    val (finalBase, unfolded) = IvfPq.streamIngestWithMaintain(spark, baseDir,
      frame(ingestIds), ingestRoot, nFiles = 4, every = 3,
      afterBatch = afterBatch)
    assert(hookErrors.isEmpty, s"in-stream violations: ${hookErrors.toArray.mkString(" | ")}")
    assert(landedVictim > 0 && futureVictim > 0, "hook never fired at batch 1")

    // The threshold fold consumed the tombstone: it is recorded in the
    // manifest (no longer pending) and the drop is PHYSICAL in the fold.
    val fold = AnnIndex.resolveVersion(s"$ingestRoot/maint")
    assert(fold.isDefined, "no fold fired at every=3 over 4 batches")
    val manifest = graft.io.Afs.readString(s"${fold.get}/_SEGMENTS")
      .split("\n").filter(_.nonEmpty)
    assert(manifest.exists(_.startsWith("ts:")),
      s"fold did not record the consumed tombstone: ${manifest.mkString(",")}")
    val (_, _, pending) = IvfPq.servingView(spark, baseDir, ingestRoot)
    assert(pending.isEmpty, "tombstone still pending after the fold consumed it")

    // Final live view: no ghost (deleted ids gone), no dup, and the
    // future victim's copy SURVIVED its own older tombstone (it landed
    // in a segment newer than the boundary).
    val served = (Seq(finalBase) ++ unfolded)
      .map(p => spark.read.parquet(s"$p/ivfpq_lists").select("vec_id"))
      .reduce(_ unionAll _).collect().map(_.getLong(0)).toSeq
    assert(served.size == served.distinct.size, "duplicate ids in the live view")
    val expect = (baseIds.toSet - baseVictim) ++ (ingestIds.toSet - landedVictim)
    assert(served.toSet == expect,
      s"lost=${(expect -- served.toSet).take(5)} ghosts=${(served.toSet -- expect).take(5)}")
    assert(served.contains(futureVictim),
      "the tombstone masked a NEWER copy of its victim — recency boundary broken")
    // And the serve path agrees: the deleted base id is gone, its probe
    // still gets a full surface.
    val res = IvfPq.probeServing(spark, baseDir, ingestRoot,
      Seq((baseVictim + 1000000L, vec(baseVictim))).toDF("pid", "pe")).collect()
    assert(res.length == AnnIndex.TopK)
    assert(!res.exists(_.getLong(1) == baseVictim), "deleted id served post-fold")
  }

  test("encrypted f4 stream-ingest: segments and folds land encrypted, serve under the token, denial gates") {
    import spark.implicits._
    val kms = TestKmsServer.shared
    val root = freshRoot("graft-ivfpq-stream-enc")
    val crypto = Some(IvfPq.IndexCrypto(kms.url, Some("INTERNAL")))
    val baseIds = 0L until 64L
    val ingestIds = 1000L until 1024L
    val universe = (baseIds ++ ingestIds).toSet
    val baseDir = IvfPq.buildFromEncrypted(spark, frame(baseIds),
      s"$root/base", kms.url)
    // A mid-stream DELETE rides the encrypted loop too: the tombstone's
    // stored victim embedding must land encrypted (the
    // `ivfpq_tombstones` policy) and the fold must consume it under the
    // token.
    val victim = 5L
    val (finalBase, unfolded) = IvfPq.streamIngestWithMaintain(spark, baseDir,
      frame(ingestIds), s"$root/ingest", nFiles = 4, every = 2, crypto,
      afterBatch = (ss, id) =>
        if (id == 0L)
          IvfPq.enqueueTombstones(ss, baseDir, s"$root/ingest",
            frame(Seq(victim)), crypto): Unit)
    assert(unfolded.isEmpty, s"expected all segments folded, left: $unfolded")
    // The tombstone itself is genuinely encrypted: a bare reader cannot
    // materialize the stored victim embedding.
    val tsDirs = graft.io.Afs.listNames(s"$root/ingest/tsq")
      .filter(_.startsWith("t")).filterNot(_.endsWith("._CLAIM"))
    assert(tsDirs.nonEmpty, "no tombstone segment landed")
    intercept[Throwable] {
      spark.read.parquet(s"$root/ingest/tsq/${tsDirs.head}/tombstones")
        .select("e").collect()
    }
    // Every landed artifact is genuinely encrypted: a bare reader cannot
    // materialize the protected columns of the fold (nor of a segment).
    intercept[Throwable] {
      spark.read.parquet(s"$finalBase/ivfpq_lists").select("e", "codes").collect()
    }
    // Conservation under the token — the enqueued victim is physically
    // gone (the fold consumed its encrypted tombstone), everything else
    // exactly once.
    val expect = universe - victim
    val readOpts = graft.crypto.EncryptionPolicy.readConfMap(kms.url, Some("INTERNAL"))
    val got = spark.read.options(readOpts).parquet(s"$finalBase/ivfpq_lists")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size, "encrypted fold duplicated ids")
    assert(got.toSet == expect,
      s"encrypted fold lost=${(expect -- got.toSet).take(5)} " +
        s"ghosts=${(got.toSet -- expect).take(5)}")
    // Serve under the token: a streamed id is findable and top-1-exact.
    val probes = Seq((1007L + 1000000L, vec(1007L))).toDF("pid", "pe")
    val res = IvfPq.probeEncrypted(spark, Seq(finalBase), probes,
      kms.url, Some("INTERNAL")).collect()
    assert(res.length == AnnIndex.TopK)
    val top = res.find(_.getLong(2) == 1L).get
    assert(top.getLong(1) == 1007L && top.getDouble(3) == 1.0,
      s"streamed-in vector lost from the encrypted fold: " +
        s"(${top.getLong(1)}, ${top.getDouble(3)})")
    // Denial still gates the streamed state.
    val e = intercept[Throwable] {
      IvfPq.probeEncrypted(spark, Seq(finalBase), probes,
        kms.url, Some("PUBLIC")).collect()
    }
    assert(e != null)
  }
}
