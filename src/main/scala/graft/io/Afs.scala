package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FileUtil, Path}

/** Artifact filesystem: every index/rotation artifact operation —
  * version claims, `_SUCCESS`/`_COMPLETE` markers, CURRENT pointer
  * flips, retirement sweeps, segment listings, rotation swaps — speaks
  * the `org.apache.hadoop.fs.FileSystem` API through this object, so
  * the artifact layer runs against any filesystem a Spark cluster
  * mounts: `file://` in this sandbox, `hdfs://` / `s3a://` at 100 TB
  * (r11 verdict item 2 — the protocols were sound but hardwired to
  * `java.io.File`, which cannot name a cluster path at all).
  *
  * Atomicity contract by backend, and how each gap is covered:
  *
  *   - '''exclusive create''' ([[createExclusive]]) — the claim
  *     primitive. Atomic on HDFS (namenode-arbitrated) and on the local
  *     FS; on object stores create-no-overwrite is best-effort
  *     (S3 conditional PUTs close it where supported). Two writers
  *     racing a claim on a non-atomic store can both "win", but each
  *     then writes its OWN version dir contents idempotently and the
  *     marker discipline below keeps readers off anything incomplete.
  *   - '''rename''' ([[renameOver]]) — atomic replace on POSIX local
  *     rename(2); on HDFS an existing destination forces delete+rename
  *     (a hole readers can observe); on object stores rename is
  *     copy+delete (never atomic). Consumers therefore never TRUST a
  *     pointer alone: [[graft.ops.AnnIndex]] resolves CURRENT and falls
  *     back to the newest `_SUCCESS`-marked version dir when the
  *     pointer is mid-flip or stale — markers, not renames, are the
  *     commit protocol, which is exactly what survives an object store.
  *   - '''visibility of a closed file''' (markers) — atomic on every
  *     backend (a PUT appears whole or not at all), which is why every
  *     adoption decision keys on a marker landing after the payload.
  */
object Afs {

  /** The Hadoop conf artifact IO resolves schemes/credentials with: the
    * active Spark session's (cluster deployments configure fs.* there),
    * else one cached bare default (parsing the XML resources per file
    * op would tax pre-session tooling for nothing).
    */
  private lazy val fallbackConf = new Configuration()

  def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(fallbackConf)

  private def fsOf(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(p: String): Boolean = { val pp = new Path(p); fsOf(pp).exists(pp) }

  def mkdirs(p: String): Unit = { val pp = new Path(p); fsOf(pp).mkdirs(pp): Unit }

  /** Recursive delete; absent paths are a no-op. */
  def delete(p: String): Unit = {
    val pp = new Path(p)
    fsOf(pp).delete(pp, true): Unit
  }

  /** Create-exclusive of an empty marker file — the atomic claim
    * primitive (see the object Scaladoc for per-backend guarantees).
    * Returns false when the path already exists; any other IO failure
    * propagates (a claim loop must not spin past a dead filesystem).
    *
    * Per-backend strongest primitive: `RawLocalFileSystem.create(f,
    * overwrite=false)` is exists-check-then-open — NOT atomic — so on
    * the local backend the claim goes through NIO's `createFile`
    * (CREATE_NEW = O_EXCL, a single atomic syscall; the seam exists to
    * pick the strongest primitive each backend offers, and this is the
    * local one). HDFS gets the namenode-atomic `create(…, false)`;
    * object stores are best-effort there, bounded by the marker
    * discipline (a doubly-won claim wastes one build, never corrupts —
    * both writers produce the same content idempotently and `_SUCCESS`
    * lands last either way).
    */
  def createExclusive(p: String): Boolean = {
    val pp = new Path(p)
    val f = fsOf(pp)
    // Dispatch on the filesystem's SCHEME, not its class (r13, found by
    // the concurrent-maintain race): with Hive's jars on the classpath
    // the default `file://` filesystem is ProxyLocalFileSystem — a
    // FilterFileSystem wrapper whose create(…, false) delegates to
    // RawLocal's exists-check-then-open — so an exact-class whitelist
    // (the r12 fix) silently routed local claims through the NON-atomic
    // generic arm (a 2-thread barrier hammer double-wins ~half its
    // rounds). Anything mounted under scheme `file` is the kernel FS,
    // where NIO's CREATE_NEW (O_EXCL) is the strongest primitive
    // whatever wrapper class serves it. Altered-semantics test/vendor
    // filesystems (the fault-injecting store) register their OWN scheme
    // and keep the generic arm.
    val isLocal = Option(f.getUri).flatMap(u => Option(u.getScheme)).contains("file")
    if (isLocal) {
      try { java.nio.file.Files.createFile(
        java.nio.file.Paths.get(pp.toUri.getPath)): Unit; true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { f.create(pp, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.contains("already exists") => false
      }
    }
  }

  /** Create (or truncate) an empty marker file — `_SUCCESS`/`_COMPLETE`
    * commit markers, which every backend publishes atomically.
    */
  def touch(p: String): Unit = {
    val pp = new Path(p)
    fsOf(pp).create(pp, true).close()
  }

  def writeString(p: String, s: String): Unit = {
    val pp = new Path(p)
    val out = fsOf(pp).create(pp, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(p: String): String = {
    val pp = new Path(p)
    val in = fsOf(pp).open(pp)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Rename onto a possibly-existing destination. POSIX local rename
    * replaces atomically; HDFS refuses an existing destination, so the
    * fallback deletes it first (a hole covered by the callers' marker /
    * listing fallbacks — object Scaladoc). Fails loudly if the rename
    * itself cannot complete.
    */
  def renameOver(src: String, dst: String): Unit = {
    val sp = new Path(src); val dp = new Path(dst)
    val f = fsOf(sp)
    if (!f.rename(sp, dp)) {
      f.delete(dp, false): Unit
      require(f.rename(sp, dp), s"rename $src -> $dst failed")
    }
  }

  /** Plain no-replace rename (rotation swaps): false when the
    * filesystem refuses (e.g. existing destination).
    */
  def rename(src: String, dst: String): Boolean = {
    val sp = new Path(src)
    fsOf(sp).rename(sp, new Path(dst))
  }

  /** Names of the direct children of `p` (empty when absent). */
  def listNames(p: String): Seq[String] = listStatus(p).map(_.getPath.getName)

  def listStatus(p: String): Seq[FileStatus] = {
    val pp = new Path(p)
    val f = fsOf(pp)
    if (!f.exists(pp)) Seq.empty else f.listStatus(pp).toSeq
  }

  def mtime(p: String): Option[Long] = {
    val pp = new Path(p)
    val f = fsOf(pp)
    if (f.exists(pp)) Some(f.getFileStatus(pp).getModificationTime) else None
  }

  /** Recursive copy (no source delete, overwrite) — the compaction
    * carry-over path; on an object store this is the server-side copy a
    * 100 TB fold wants instead of a scan.
    */
  def copyTree(src: String, dst: String): Unit = {
    val sp = new Path(src); val dp = new Path(dst)
    val sf = fsOf(sp)
    if (sf.exists(sp))
      FileUtil.copy(sf, sp, fsOf(dp), dp, false, true, conf): Unit
  }

  /** Copy one file (overwrite). */
  def copyFile(src: String, dst: String): Unit = copyTree(src, dst)
}
