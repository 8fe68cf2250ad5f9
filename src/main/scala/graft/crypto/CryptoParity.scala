package graft.crypto

import java.nio.file.Files

import graft.{Q, Tables}
import graft.io.EncryptedParquet
import graft.kms.TestKmsServer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet Modular Encryption parity surface (SURVEY.md Part A / Q24):
  * encrypted write → KMS-gated read roundtrips, runnable inside the
  * driver's correctness gate. Each query is eager (write + read + collect
  * happen inside the function, crypto conf bracketed) so the returned
  * DataFrame is plain and later verify writes stay unencrypted.
  *
  * DuckDB cannot read PME files, so the oracle compares against the same
  * rows read from the plaintext source table (SURVEY.md §2 Q24).
  */
object CryptoParity {

  /** Policy for the nation table: one column per privilege tier plus a
    * plaintext key column — the reference's policy shape
    * (write_encrypted_parquet.py:75-79) on the oracle corpus.
    */
  private val nationPolicy = EncryptionPolicy(columnKeys = Map(
    PrivilegeLevel.Internal     -> Seq("n_regionkey"),
    PrivilegeLevel.Confidential -> Seq("n_name")))

  private def roundtrip(s: SparkSession, d: String,
      token: Option[String], columns: Seq[String]): DataFrame = {
    val kms = new TestKmsServer().start()
    try {
      val dir = Files.createTempDirectory("graft-q24-").toString
      val src = Tables.nation(s, d)
      EncryptedParquet.write(src, dir, nationPolicy, kms.url)
      val back = EncryptedParquet.readCollected(s, dir, kms.url, token, columns)
      back.orderBy("n_nationkey")
    } finally kms.stop()
  }

  /** Q24 — full roundtrip at RESTRICTED: every column decrypts. */
  val q24: Q = Q(
    "q24_encrypted_roundtrip",
    (s, d) => roundtrip(s, d, Some("RESTRICTED"),
      Seq("n_nationkey", "n_name", "n_regionkey")),
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"))

  /** Q24b — privilege-scoped projection: INTERNAL token can read the
    * plaintext key and the INTERNAL column, never touching the
    * CONFIDENTIAL one (privilege is checked per projected column,
    * read_encrypted_parquet.py:43 / README.md:30-31).
    */
  val q24b: Q = Q(
    "q24b_encrypted_projection",
    (s, d) => roundtrip(s, d, Some("INTERNAL"), Seq("n_nationkey", "n_regionkey")),
    Some("SELECT n_nationkey, n_regionkey FROM nation ORDER BY n_nationkey"))

  /** Q24c — tokenless read of plaintext column under plaintext footer:
    * only the PUBLIC footer-signing KEK is unwrapped, which requires no
    * privilege (README.md:126-127).
    */
  val q24c: Q = Q(
    "q24c_encrypted_plaintext_col",
    (s, d) => roundtrip(s, d, None, Seq("n_nationkey")),
    Some("SELECT n_nationkey FROM nation ORDER BY n_nationkey"))

  val queries: Seq[Q] = Seq(q24, q24b, q24c)
}
