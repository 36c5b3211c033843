package graft.ingest

import graft.core.Envelope.DataKeyResult
import graft.core.{JObj, JStr, Json}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** E2/E3 — HTTP data-key service client (reference
  * HttpKeyService.kt:30-121):
  *
  *   GET  <url>/datakey                         → fresh batch key JSON
  *   POST <url>/datakey/actions/decrypt?keyId=… (body = encryptedKey)
  *                                              → plaintext key
  *
  * HTTP 400 on decrypt is a hard [[Retry.FatalException]] (a bad key
  * will never start working — HttpKeyService.kt:62-66); anything else
  * retries under the DKS policy (5 attempts, 1 s ×2 backoff).
  * Decrypted keys cache per JVM keyed `encryptedKey/keyId`, so on an
  * executor every task of a stage reuses one DKS round-trip per file
  * key — the reference's cache, at executor scope.
  *
  * Instances are created lazily inside `mapPartitions` (the class holds
  * no client state across serialization) — never call this from a SQL
  * expression.
  */
final case class HttpKeyService(baseUrl: String,
                                policy: Retry.Policy = Retry.Policy.dks,
                                timeoutMs: Long = 10000L) extends KeyService {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()

  override def decryptKey(keyId: String, encryptedKey: String): String = {
    val cacheKey = s"$encryptedKey/$keyId"
    HttpKeyService.cache.computeIfAbsent(cacheKey, _ =>
      Retry.withRetry(policy, s"DKS decrypt $keyId") {
        val uri = URI.create(s"$baseUrl/datakey/actions/decrypt?keyId=${java.net.URLEncoder.encode(keyId, "UTF-8")}")
        val req = HttpRequest.newBuilder(uri)
          .timeout(Duration.ofMillis(timeoutMs))
          .POST(HttpRequest.BodyPublishers.ofString(encryptedKey, StandardCharsets.UTF_8))
          .build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case 200 | 201 =>
            str(Json.parseObject(resp.body()), "plaintextDataKey")
          case 400 =>
            throw new Retry.FatalException(s"DKS rejected key $keyId (HTTP 400)")
          case other =>
            throw new RuntimeException(s"DKS decrypt returned HTTP $other")
        }
      })
  }

  override def batchDataKey(): DataKeyResult =
    Retry.withRetry(policy, "DKS batch key") {
      val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/datakey"))
        .timeout(Duration.ofMillis(timeoutMs)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200 && resp.statusCode() != 201)
        throw new RuntimeException(s"DKS datakey returned HTTP ${resp.statusCode()}")
      val o = Json.parseObject(resp.body())
      DataKeyResult(str(o, "dataKeyEncryptionKeyId"), str(o, "plaintextDataKey"), str(o, "ciphertextDataKey"))
    }

  private def str(o: JObj, k: String): String = o.get(k) match {
    case Some(JStr(s)) => s
    case _ => throw new RuntimeException(s"DKS response missing '$k'")
  }
}

object HttpKeyService {
  /** per-executor (per-JVM) decrypt cache — HttpKeyService.kt:39-41 */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
}
