package graft.io

import graft.crypto.EncryptionPolicy
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Encrypted parquet write/read over Spark's native parquet source —
  * the reference's A2/A4 operators (write_encrypted_parquet.py:21-28,91;
  * read_encrypted_parquet.py:28-43) as two library calls.
  *
  * Crypto config travels through the session's Hadoop configuration:
  * parquet-mr's PropertiesDrivenCryptoFactory + our HttpKmsClient are
  * instantiated from those strings inside each task, so the same code
  * works on a 1000-executor cluster — each executor resolves its own KMS
  * connection, KEK-cached per JVM for the configured TTL.
  *
  * The Hadoop conf is session-global, so encrypted IO is bracketed: conf
  * set → job run → crypto keys cleared, keeping later plaintext writes
  * from silently inheriting the policy. Physical layout matches the
  * reference: zstd compression (write_encrypted_parquet.py:23-24; level
  * via parquet.compression.codec.zstd.level) and v2 data pages.
  *
  * CONCURRENCY: because the conf is shared by every job on the session,
  * encrypted reads/writes must not run concurrently with other jobs on
  * the same session — a parallel plaintext write started inside the
  * bracket would inherit (or lose) the crypto conf mid-job. Sequential
  * use (one action at a time, the driver/bench/verify pattern) is safe;
  * concurrent pipelines should use separate SparkSessions
  * (`spark.newSession()` still shares the Hadoop conf — use distinct
  * SparkContexts, or serialize crypto jobs).
  */
object EncryptedParquet {

  /** Write `df` encrypted under `policy`. Wrapping needs no privilege
    * (kms_server.py:135-139 — wrap is unauthenticated), so no token.
    */
  def write(df: DataFrame, path: String, policy: EncryptionPolicy,
      kmsUrl: String, mode: String = "overwrite",
      zstdLevel: Int = 19, pageV2: Boolean = true): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // Save/restore the physical-layout keys too: they're not crypto
    // properties, but leaving them set would make every later plaintext
    // write on this session silently inherit zstd-19 + v2 pages.
    val layoutKeys = Seq("parquet.compression.codec.zstd.level", "parquet.writer.version")
    val saved = layoutKeys.map(k => k -> Option(conf.get(k)))
    EncryptionPolicy.applyWriteConf(conf, policy, kmsUrl, accessToken = None)
    conf.setInt("parquet.compression.codec.zstd.level", zstdLevel)
    if (pageV2) conf.set("parquet.writer.version", "v2")
    try df.write.mode(mode).option("compression", "zstd").parquet(path)
    finally {
      EncryptionPolicy.clear(conf)
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }

  /** Read an encrypted dataset with the given privilege token. Column
    * decryption (and therefore authorization) happens only for columns the
    * query actually projects — select() before an action keeps privilege
    * checks per-column, like the reference's scanner(columns=...)
    * (read_encrypted_parquet.py:43). Insufficient privilege surfaces as a
    * KeyAccessDeniedException-caused job failure at action time.
    *
    * NOTE: the decryption conf stays on the session (needed lazily at scan
    * time). Call `endRead(spark)` after the consuming action, or use
    * `readCollected` for an eagerly-materialized bracketed read.
    */
  def read(spark: SparkSession, path: String, kmsUrl: String,
      accessToken: Option[String]): DataFrame = {
    EncryptionPolicy.applyReadConf(
      spark.sparkContext.hadoopConfiguration, kmsUrl, accessToken)
    spark.read.parquet(path)
  }

  def endRead(spark: SparkSession): Unit =
    EncryptionPolicy.clear(spark.sparkContext.hadoopConfiguration)

  /** Bracketed eager read: project, collect, clear crypto conf, return a
    * local DataFrame. For tests/demos — not for 100 TB scans (those keep
    * the conf for the job's lifetime instead).
    */
  def readCollected(spark: SparkSession, path: String, kmsUrl: String,
      accessToken: Option[String], columns: Seq[String] = Nil): DataFrame = {
    val df0 = read(spark, path, kmsUrl, accessToken)
    try {
      val df = if (columns.isEmpty) df0 else df0.select(columns.map(df0.col): _*)
      val rows = df.collect().toIndexedSeq
      spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        df.schema)
    } finally endRead(spark)
  }
}
