package graft.ingest

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpsConfigurator, HttpsParameters, HttpsServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Path}

/** The DKS mutual-TLS seam (round-8 verdict gap #3): the key-service
  * client against an in-process HTTPS server that REQUIRES client
  * certificates — the reference deployment posture
  * (HttpKeyService.kt:44-50; truststores.sh provisions the
  * keystore/truststore pair this spec generates with the JDK's own
  * keytool). Pins both directions: a client presenting its certificate
  * completes the E2/E3 round trips (batch key, decrypt, cache, 400 →
  * fatal) over TLS; a certificate-less client is rejected at the
  * handshake and surfaces a retried-then-thrown failure, never a
  * silent fallback to plaintext. */
class TlsSeamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var dir: Path = _
  private var server: HttpsServer = _
  private var url: String = _
  private val pw = "changeit"
  private val decryptCalls = new java.util.concurrent.atomic.AtomicInteger(0)

  private def keytool(args: String*): Unit = {
    val bin = s"${System.getProperty("java.home")}/bin/keytool"
    val p = new ProcessBuilder((bin +: args): _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"keytool ${args.head} failed:\n$out")
  }

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-tls")
    def ks(n: String) = dir.resolve(n).toString
    // two identities + crossed truststores — the truststores.sh shape
    for (side <- Seq("server", "client")) {
      keytool("-genkeypair", "-alias", side, "-keyalg", "RSA", "-keysize", "2048",
        "-validity", "1", "-dname", s"CN=localhost,OU=$side", "-keystore", ks(s"$side.p12"),
        "-storetype", "PKCS12", "-storepass", pw, "-keypass", pw,
        "-ext", "SAN=dns:localhost,ip:127.0.0.1")
      keytool("-exportcert", "-alias", side, "-keystore", ks(s"$side.p12"),
        "-storepass", pw, "-file", ks(s"$side.crt"))
    }
    keytool("-importcert", "-noprompt", "-alias", "server", "-file", ks("server.crt"),
      "-keystore", ks("client-trust.p12"), "-storetype", "PKCS12", "-storepass", pw)
    keytool("-importcert", "-noprompt", "-alias", "client", "-file", ks("client.crt"),
      "-keystore", ks("server-trust.p12"), "-storetype", "PKCS12", "-storepass", pw)

    // in-process DKS double: server identity + trust in the client's
    // cert, client auth REQUIRED — same SSLContext loader as the client
    val serverCtx = HttpKeyService.sslContext(
      keystore = Some((ks("server.p12"), pw)),
      truststore = Some((ks("server-trust.p12"), pw)))
    server = HttpsServer.create(new java.net.InetSocketAddress("localhost", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(serverCtx) {
      override def configure(params: HttpsParameters): Unit = {
        val ssl = serverCtx.getDefaultSSLParameters
        ssl.setNeedClientAuth(true)
        params.setSSLParameters(ssl)
      }
    })
    server.createContext("/datakey", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        def respond(code: Int, body: String): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.sendResponseHeaders(code, bytes.length)
          ex.getResponseBody.write(bytes); ex.close()
        }
        val query = Option(ex.getRequestURI.getQuery).getOrElse("")
        if (ex.getRequestURI.getPath.endsWith("/actions/decrypt")) {
          decryptCalls.incrementAndGet()
          if (query.contains("keyId=bad")) respond(400, "no")
          else respond(200, """{"plaintextDataKey": "tls-plain-key"}""")
        } else respond(200,
          """{"dataKeyEncryptionKeyId": "tk", "plaintextDataKey": "tp", "ciphertextDataKey": "tc"}""")
      }
    })
    server.start()
    url = s"https://localhost:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  private def tlsConfig = HttpKeyService.TlsConfig(
    keystorePath = dir.resolve("client.p12").toString,
    keystorePassword = pw,
    truststorePath = dir.resolve("client-trust.p12").toString,
    truststorePassword = pw)

  test("mutual TLS: certificated client completes batch key, decrypt, cache, and 400-fatal over HTTPS") {
    val svc = HttpKeyService(url, Retry.Policy.immediate, tls = Some(tlsConfig))
    assert(svc.batchDataKey() == graft.core.Envelope.DataKeyResult("tk", "tp", "tc"))
    assert(svc.decryptKey("good-tls", "enc-tls-1") == "tls-plain-key")
    val before = decryptCalls.get()
    assert(svc.decryptKey("good-tls", "enc-tls-1") == "tls-plain-key") // JVM cache
    assert(decryptCalls.get() == before)
    intercept[Retry.FatalException](svc.decryptKey("bad", "enc-tls-2"))
  }

  test("mutual TLS: a certificate-less client is rejected at the handshake (no plaintext fallback)") {
    // trust-only context: accepts the server but presents NO identity —
    // the server demands one, so the exchange must FAIL (TLS 1.3 may
    // complete the handshake and kill the connection on first read;
    // either way the request never succeeds)
    val ctx = HttpKeyService.sslContext(keystore = None,
      truststore = Some((dir.resolve("client-trust.p12").toString, pw)))
    val client = java.net.http.HttpClient.newBuilder().sslContext(ctx).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$url/datakey")).GET().build()
    intercept[java.io.IOException] {
      client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    }
  }
}
