package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Auto-maintain wired into the ingest loop (r12 verdict item 5): the
  * stream folds its own segments every N batches behind the usual
  * CURRENT pointer, and a CONCURRENT reader composing the serving view
  * via [[AnnIndex.servingStateOf]] stays consistent across every
  * auto-fired fold — full surface, fresh top-1, no ghost, no duplicate,
  * no exception — while batches land and folds flip under it.
  */
class StreamMaintainSpec extends SparkTestBase {

  private val Dim = 64

  private def vec(id: Long): Seq[Double] =
    (0 until Dim).map(j => math.sin(id * 31.0 + j * 17.0))

  private def frame(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, vec(id), (id % 10).toInt)).toDF("vec_id", "e", "label")
  }

  private def freshRoot(name: String): java.io.File = {
    val f = new java.io.File(
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
      else sys.props("java.io.tmpdir"), name)
    def rm(g: java.io.File): Unit = {
      if (g.isDirectory) Option(g.listFiles()).getOrElse(Array.empty).foreach(rm)
      g.delete(): Unit
    }
    rm(f)
    f
  }

  test("serve continuity across auto-fired folds; conservation at the end") {
    import spark.implicits._
    val root = freshRoot("graft-stream-maintain")
    val baseIds = 0L until 64L
    val ingestIds = 1000L until 1024L
    val universe = (baseIds ++ ingestIds).toSet
    val baseDir = AnnIndex.buildFrom(spark, frame(baseIds), s"$root/base")
    val segRoot = s"$root/ingest/segments"
    val maintRoot = s"$root/ingest/maint"

    // Concurrent reader: every poll resolves ONE consistent view (fold
    // manifest + unfolded segments) and must serve correctly whatever
    // instant it sampled.
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong()
    @volatile var stop = false
    val probeId = 7L
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val (b, unfolded, _) = AnnIndex.servingStateOf(baseDir, segRoot, maintRoot)
          val probes = Seq((probeId + 1000000L, vec(probeId))).toDF("pid", "pe")
          val res = AnnIndex.ivfProbeSegments(spark, sfDir, b +: unfolded, probes)
            .collect()
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
      AnnIndex.streamIngestWithMaintain(spark, baseDir, frame(ingestIds),
        s"$root/ingest", nFiles = 4, every = 2)
    } finally { stop = true; reader.join(30000) }
    assert(failures.isEmpty, s"reader violations: ${failures.toArray.take(5).mkString(" | ")}")
    assert(reads.get() >= 3, s"reader only completed ${reads.get()} polls — fixture too fast")

    // At least one fold fired and is CURRENT.
    val fold = AnnIndex.resolveVersion(maintRoot)
    assert(fold.isDefined, "no auto-maintain fold fired at every=2 over 4 batches")
    // 4 non-empty batches at every=2: both folds fired, nothing unfolded.
    assert(unfolded.isEmpty, s"expected all segments folded, left: $unfolded")
    // Conservation: the final serving state holds exactly base + ingested.
    val got = spark.read.parquet(s"$finalBase/ivf_assignments")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size, "fold duplicated ids")
    assert(got.toSet == universe,
      s"fold lost=${(universe -- got.toSet).take(5)} ghosts=${(got.toSet -- universe).take(5)}")
    // The second fold's manifest covers all four segments.
    val manifest = graft.io.Afs.readString(s"${fold.get}/_SEGMENTS")
      .split("\n").filter(_.nonEmpty)
    assert(manifest.length == 4, s"manifest: ${manifest.mkString(",")}")
  }
}
