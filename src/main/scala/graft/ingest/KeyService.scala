package graft.ingest

import graft.core.Envelope.DataKeyResult
import java.util.Base64

/** E2/E3 — data-key service boundary.
  *
  * The reference calls an external HTTPS Data Key Service: decrypt the
  * per-file key once per file (cached) and mint one fresh batch key per
  * file (HttpKeyService.kt:30-121, DataKeyProcessor.kt:16-28). That
  * service is deployment infrastructure, so the engine depends only on
  * this trait; production wires an HTTP implementation inside
  * `mapPartitions` (never a SQL UDF — side effects), tests use the
  * deterministic stub below.
  *
  * Scale note: implementations must be cheap under executor-side reuse —
  * the decrypt cache is per-JVM (one executor = one cache), exactly like
  * the reference's in-memory cache keyed `encryptedKey/keyId`.
  */
trait KeyService extends Serializable {
  /** E2 — decrypt a file's encrypted data key. */
  def decryptKey(keyId: String, encryptedKey: String): String
  /** E3 — mint a fresh data key for re-encryption (once per file). */
  def batchDataKey(): DataKeyResult
}

/** Deterministic local stub mirroring the reference integration stack's
  * fake DKS, whose "encryption" is byte reversal
  * (UCHistoricDataImporterSpec.kt:251-258): decryptKey reverses the
  * base64-decoded bytes; batchDataKey derives a stable key from a seed
  * so replayed tasks mint identical keys. */
final case class StubKeyService(seed: String = "graft-test") extends KeyService {

  override def decryptKey(keyId: String, encryptedKey: String): String = {
    val cacheKey = s"$encryptedKey/$keyId"
    StubKeyService.cache.computeIfAbsent(cacheKey, _ =>
      Base64.getEncoder.encodeToString(Base64.getDecoder.decode(encryptedKey).reverse))
  }

  override def batchDataKey(): DataKeyResult = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val keyBytes = md.digest(seed.getBytes("UTF-8")) // 16 bytes -> AES-128
    val plaintext = Base64.getEncoder.encodeToString(keyBytes)
    val ciphertext = Base64.getEncoder.encodeToString(keyBytes.reverse)
    DataKeyResult("stub:1,2", plaintext, ciphertext)
  }
}

object StubKeyService {
  /** per-executor (per-JVM) decrypt cache, like HttpKeyService.kt:39-41 */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
}
