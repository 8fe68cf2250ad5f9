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
}
