package graft.crypto

import java.io.FileInputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.KeyStore
import java.security.cert.CertificateFactory
import java.time.Duration
import java.util.Base64

import javax.net.ssl.{SSLContext, TrustManagerFactory}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.ParquetCryptoRuntimeException
import org.apache.parquet.crypto.keytools.KmsClient

/** HTTP(S) KMS client for parquet-mr's key tools, speaking the reference's
  * wire protocol (kms_client.py:20-54): base URL + /api/v1/,
  * POST wrap/{kekId} and unwrap/{kekId} with {"key": "<base64>"},
  * x-api-key header iff an access token is set, 5 s timeout
  * (kms_client.py:35).
  *
  * TLS: an https KMS URL is verified against, in order, the PEM CA bundle
  * named by the `parquet.encryption.kms.ssl.cert.file` Hadoop property,
  * the `SSL_CERT_FILE` environment variable (the reference's client honors
  * exactly this variable, kms_client.py:30-37), or the JVM's default
  * truststore.
  *
  * parquet-mr instantiates this class by reflection from
  * `parquet.encryption.kms.client.class` inside executor tasks, so all
  * state must come from the Hadoop conf / initialize() args — no closures
  * (SURVEY.md §7 risk 1). One instance per (KMS instance, token) is cached
  * by KeyToolkit; with double wrapping the KMS sees O(privilege levels)
  * calls per executor per cache-TTL, not O(rows).
  */
final class HttpKmsClient extends KmsClient {

  private var baseUrl: String = _
  private var token: Option[String] = None
  private var http: HttpClient = _
  private val mapper = new ObjectMapper()

  override def initialize(
      configuration: Configuration,
      kmsInstanceId: String,
      kmsInstanceUrl: String,
      accessToken: String): Unit = {
    if (kmsInstanceUrl == null || kmsInstanceUrl == KmsClient.KMS_INSTANCE_URL_DEFAULT)
      throw new ParquetCryptoRuntimeException(
        "HttpKmsClient requires parquet.encryption.kms.instance.url")
    baseUrl = kmsInstanceUrl.stripSuffix("/") + "/api/v1/"
    // KEY_ACCESS_TOKEN_DEFAULT ("DEFAULT") means "no token" — mirrors the
    // reference's KMS_ACCESS_TOKEN = None (read_encrypted_parquet.py:14).
    token = Option(accessToken).filter(_ != KmsClient.KEY_ACCESS_TOKEN_DEFAULT)
    http = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(5))
      .sslContext(HttpKmsClient.resolveSslContext(configuration))
      .build()
  }

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String =
    post("wrap", masterKeyIdentifier, Base64.getEncoder.encodeToString(keyBytes))

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] =
    Base64.getDecoder.decode(post("unwrap", masterKeyIdentifier, wrappedKey))

  private def post(op: String, kekId: String, keyB64: String): String = {
    val body = s"""{"key":"${keyB64}"}"""
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl$op/$kekId"))
      .timeout(Duration.ofSeconds(5))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    token.foreach(t => builder.header("x-api-key", t))
    val resp =
      try http.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw new ParquetCryptoRuntimeException(s"KMS $op/$kekId failed: $e", e)
      }
    resp.statusCode() match {
      case 200 =>
        val node = mapper.readTree(resp.body())
        if (node == null || node.get("key") == null || !node.get("key").isTextual)
          throw new ParquetCryptoRuntimeException(
            s"KMS $op/$kekId: malformed response ${resp.body()}")
        node.get("key").asText()
      case 403 =>
        // Privilege failure is a read-time error, not null masking
        // (SURVEY.md §3.2 step 4).
        throw new KeyAccessDeniedException(
          s"KMS denied $op of $kekId for token ${token.getOrElse("<none>")}")
      case code =>
        throw new ParquetCryptoRuntimeException(
          s"KMS $op/$kekId: HTTP $code ${resp.body()}")
    }
  }
}

object HttpKmsClient {

  /** PEM CA bundle trusted for https KMS endpoints; falls back to the
    * SSL_CERT_FILE env var, then the JVM default truststore.
    */
  val SslCertFileProperty = "parquet.encryption.kms.ssl.cert.file"

  private[crypto] def resolveSslContext(conf: Configuration): SSLContext = {
    val pem = Option(conf).flatMap(c => Option(c.get(SslCertFileProperty)))
      .orElse(sys.env.get("SSL_CERT_FILE"))
      .filter(_.nonEmpty)
    pem match {
      case None       => SSLContext.getDefault
      case Some(path) => sslContextFromPem(path)
    }
  }

  /** Trust-only SSLContext from a PEM file of one or more CA certs —
    * the JVM analogue of the reference's
    * `ssl.create_default_context(cafile=SSL_CERT_FILE)`.
    */
  def sslContextFromPem(path: String): SSLContext = {
    val cf = CertificateFactory.getInstance("X.509")
    val in = new FileInputStream(path)
    val certs =
      try cf.generateCertificates(in)
      finally in.close()
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    val it = certs.iterator()
    var i = 0
    while (it.hasNext) {
      ks.setCertificateEntry(s"kms-ca-$i", it.next())
      i += 1
    }
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }
}
