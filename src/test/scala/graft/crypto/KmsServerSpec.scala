package graft.crypto

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import graft.kms.TestKmsServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Wire-protocol spec for the test KMS — the reference's implicit manual
  * test matrix (README.md:82-94) made explicit: wrap/unwrap endpoints,
  * the authorization lattice truth table, and request validation.
  */
class KmsServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var kms: TestKmsServer = _
  private val http = HttpClient.newHttpClient()
  // The README walkthrough's sample key (README.md:84-88).
  private val sampleKey = "rlCLtKLrH/b9GZbuZaneQB6yU6vp8tlC1R2LINMYYrM="

  override def beforeAll(): Unit = kms = new TestKmsServer().start()
  override def afterAll(): Unit = kms.stop()

  private def post(path: String, body: String,
      token: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder()
      .uri(URI.create(s"${kms.url}/api/v1/$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => b.header("x-api-key", t))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def keyOf(resp: HttpResponse[String]): String = {
    val m = """"key"\s*:\s*"([^"]+)"""".r
    m.findFirstMatchIn(resp.body()).get.group(1)
  }

  test("wrap requires no authorization and roundtrips through unwrap") {
    for (level <- PrivilegeLevel.all) {
      val w = post(s"wrap/${level.name}", s"""{"key":"$sampleKey"}""")
      assert(w.statusCode() == 200, s"wrap ${level.name}: ${w.body()}")
      val wrapped = keyOf(w)
      assert(wrapped != sampleKey)
      val u = post(s"unwrap/${level.name}", s"""{"key":"$wrapped"}""",
        token = Some("RESTRICTED"))
      assert(u.statusCode() == 200)
      assert(keyOf(u) == sampleKey, s"roundtrip mismatch at ${level.name}")
    }
  }

  test("authorization lattice matches the reference truth table") {
    // FIXTURES.md §2: rows = KEK, cols = token (None + 4 levels).
    val tokens = Seq(None, Some("PUBLIC"), Some("INTERNAL"),
      Some("CONFIDENTIAL"), Some("RESTRICTED"))
    val expected = Map(
      "PUBLIC"       -> Seq(true, true, true, true, true),
      "INTERNAL"     -> Seq(false, false, true, true, true),
      "CONFIDENTIAL" -> Seq(false, false, false, true, true),
      "RESTRICTED"   -> Seq(false, false, false, false, true))
    for (kek <- PrivilegeLevel.all) {
      val wrapped = keyOf(post(s"wrap/${kek.name}", s"""{"key":"$sampleKey"}"""))
      tokens.zip(expected(kek.name)).foreach { case (tok, allowed) =>
        val r = post(s"unwrap/${kek.name}", s"""{"key":"$wrapped"}""", tok)
        val want = if (allowed) 200 else 403
        assert(r.statusCode() == want,
          s"kek=${kek.name} token=$tok got ${r.statusCode()} want $want")
      }
    }
  }

  test("unknown token name carries no privilege") {
    val wrapped = keyOf(post("wrap/INTERNAL", s"""{"key":"$sampleKey"}"""))
    val r = post("unwrap/INTERNAL", s"""{"key":"$wrapped"}""", Some("GODMODE"))
    assert(r.statusCode() == 403)
  }

  test("validation: bad base64 is 422") {
    assert(post("wrap/PUBLIC", """{"key":"!!!not-base64!!!"}""").statusCode() == 422)
  }

  test("validation: wrap key below 16 bytes or non-multiple-of-8 is 422") {
    val tiny = Base64.getEncoder.encodeToString(Array.fill[Byte](8)(1))
    assert(post("wrap/PUBLIC", s"""{"key":"$tiny"}""").statusCode() == 422)
    val ragged = Base64.getEncoder.encodeToString(Array.fill[Byte](20)(1))
    assert(post("wrap/PUBLIC", s"""{"key":"$ragged"}""").statusCode() == 422)
  }

  test("validation: unwrap below 24 bytes is 422") {
    val sixteen = Base64.getEncoder.encodeToString(Array.fill[Byte](16)(1))
    val r = post("unwrap/PUBLIC", s"""{"key":"$sixteen"}""")
    assert(r.statusCode() == 422)
  }

  test("tampered wrapped key fails unwrap with 422") {
    val wrapped = keyOf(post("wrap/RESTRICTED", s"""{"key":"$sampleKey"}"""))
    val bytes = Base64.getDecoder.decode(wrapped)
    bytes(0) = (bytes(0) ^ 0x55).toByte
    val tampered = Base64.getEncoder.encodeToString(bytes)
    val r = post("unwrap/RESTRICTED", s"""{"key":"$tampered"}""", Some("RESTRICTED"))
    assert(r.statusCode() == 422)
  }

  test("strict body: unknown fields rejected") {
    val r = post("wrap/PUBLIC", s"""{"key":"$sampleKey","extra":1}""")
    assert(r.statusCode() == 422)
  }

  test("unknown wrapping key id is 422, unknown route 404") {
    assert(post("wrap/NOPE", s"""{"key":"$sampleKey"}""").statusCode() == 422)
    assert(post("frob/PUBLIC", s"""{"key":"$sampleKey"}""").statusCode() == 404)
  }
}
