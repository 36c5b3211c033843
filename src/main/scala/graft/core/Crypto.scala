package graft.core

import java.io.InputStream
import java.security.Key
import java.util.Base64
import java.util.zip.GZIPInputStream
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, CipherInputStream}

/** E4/E5/E6 — AES/CTR/NoPadding stream decrypt, gzip decompress, and
  * per-record re-encrypt (reference AESCipherService.kt:29-55,
  * DecryptionProcessor.kt:26-44, DecompressionProcessor.kt:14-29).
  * Plain JCE (the algorithm is standard; the reference's BouncyCastle
  * registration adds nothing for AES-CTR).
  */
object Crypto {

  val Algorithm = "AES/CTR/NoPadding"

  def aesKey(base64Key: String): Key =
    new SecretKeySpec(Base64.getDecoder.decode(base64Key), "AES")

  // E6 runs once per RECORD: Cipher.getInstance walks the synchronized
  // JCE provider list and the key decode allocates, both pure overhead
  // when repeated millions of times per task. A Cipher is re-init-able
  // (new key/IV per init) but not thread-safe → one per thread; the key
  // is constant per file → memoize the last decode per thread.
  private val encryptCipher: ThreadLocal[Cipher] =
    ThreadLocal.withInitial(() => Cipher.getInstance(Algorithm))
  private val lastKey: ThreadLocal[(String, Key)] =
    ThreadLocal.withInitial(() => ("", null))

  private def cachedKey(base64Key: String): Key = {
    val (b64, k) = lastKey.get()
    if (k != null && b64 == base64Key) k
    else { val fresh = aesKey(base64Key); lastKey.set((base64Key, fresh)); fresh }
  }

  /** E4 — lazy decrypting wrapper over a raw input stream. */
  def decryptingStream(in: InputStream, key: Key, ivBase64: String): InputStream = {
    val cipher = Cipher.getInstance(Algorithm)
    cipher.init(Cipher.DECRYPT_MODE, key, new IvParameterSpec(Base64.getDecoder.decode(ivBase64)))
    new CipherInputStream(in, cipher)
  }

  /** E5 — gzip decompression over the decrypted stream. */
  def decompressingStream(in: InputStream): InputStream = new GZIPInputStream(in)

  /** E4∘E5 composed, as the reference's
    * decompressingDecryptingStream. */
  def decompressingDecryptingStream(in: InputStream, keyBase64: String, ivBase64: String): InputStream =
    decompressingStream(decryptingStream(in, aesKey(keyBase64), ivBase64))

  /** E6 — encrypt one record with the batch data key and a fresh 16-byte
    * IV from `ivSource` (SecureRandom in production; injectable for
    * deterministic tests). Returns base64 (iv, ciphertext). */
  def encrypt(keyBase64: String, plaintext: Array[Byte], ivSource: () => Array[Byte]): Envelope.EncryptionResult = {
    val iv = ivSource()
    require(iv.length == 16, s"AES-CTR IV must be 16 bytes, got ${iv.length}")
    val cipher = encryptCipher.get()
    cipher.init(Cipher.ENCRYPT_MODE, cachedKey(keyBase64), new IvParameterSpec(iv))
    val ct = cipher.doFinal(plaintext)
    Envelope.EncryptionResult(
      Base64.getEncoder.encodeToString(iv),
      Base64.getEncoder.encodeToString(ct))
  }

  def secureRandomIvSource(): () => Array[Byte] = {
    val rng = new java.security.SecureRandom()
    () => { val iv = new Array[Byte](16); rng.nextBytes(iv); iv }
  }

  /** Decrypt base64 ciphertext (test-side check that cells decrypt back
    * to the transformed record — UCHistoricDataImporterSpec.kt:84-127). */
  def decrypt(keyBase64: String, ivBase64: String, ciphertextBase64: String): Array[Byte] = {
    val cipher = Cipher.getInstance(Algorithm)
    cipher.init(Cipher.DECRYPT_MODE, aesKey(keyBase64), new IvParameterSpec(Base64.getDecoder.decode(ivBase64)))
    cipher.doFinal(Base64.getDecoder.decode(ciphertextBase64))
  }
}
