package graft.crypto

import graft.SparkTestBase
import graft.io.EncryptedParquet
import graft.kms.TestKmsServer
import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll

/** Cross-implementation interop (SURVEY.md §7 risk 5): the fixture at
  * src/test/resources/interop/people_pme.parquet was written by PyArrow's
  * parquet encryption (tools/make_interop_fixture.py) with the reference
  * demo's exact writer config — AES_GCM_V1, double wrapping, internal key
  * material, plaintext footer, the demo column→KEK policy and fixture
  * KEKs. If Spark + parquet-mr + HttpKmsClient can read it at each
  * privilege level, the two PME implementations are byte-compatible end
  * to end (key-material JSON, RFC 3394 wrapping, GCM framing).
  */
class InteropSpec extends SparkTestBase with BeforeAndAfterAll {

  private var kms: TestKmsServer = _
  private lazy val fixture =
    getClass.getResource("/interop/people_pme.parquet").getPath

  override def beforeAll(): Unit = {
    super.beforeAll()
    kms = new TestKmsServer().start()
  }

  override def afterAll(): Unit = {
    kms.stop()
    super.afterAll()
  }

  test("RESTRICTED token reads every column of the PyArrow-written file") {
    val rows = EncryptedParquet.readCollected(
        spark, fixture, kms.url, Some("RESTRICTED"))
      .orderBy("id").collect().toSeq
    val expected = Fixtures.peopleRows.map(r => Row(r.toSeq: _*))
    assert(rows === expected)
  }

  test("INTERNAL token reads plaintext + INTERNAL columns only") {
    val got = EncryptedParquet.readCollected(
        spark, fixture, kms.url, Some("INTERNAL"),
        columns = Seq("id", "date_of_birth"))
      .orderBy("id").collect().toSeq
    val expected = Fixtures.peopleRows.map(r => Row(r.getLong(0), r.getDate(1)))
    assert(got === expected)
  }

  test("INTERNAL token cannot decrypt a CONFIDENTIAL column") {
    val e = intercept[Exception] {
      EncryptedParquet.readCollected(
        spark, fixture, kms.url, Some("INTERNAL"),
        columns = Seq("id", "first_name")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists {
      case _: org.apache.parquet.crypto.KeyAccessDeniedException => true
      case s: SparkException => s.getMessage.contains("denied")
      case t => t.getMessage != null && t.getMessage.contains("denied")
    }, s"expected key-access denial, got $e")
  }

  test("tokenless read of the plaintext-footer file reaches unencrypted columns") {
    val got = EncryptedParquet.readCollected(
        spark, fixture, kms.url, None, columns = Seq("id"))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L, 3L))
  }
}
